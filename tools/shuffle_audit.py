#!/usr/bin/env python
"""Per-query shuffle/spill audit: measured evidence for the plan-shape
claims in SCALE.md / PLANS.md.

Runs each bench HEADLINE query once (noop sink, full physical
execution) at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) and attributes
the completed stages' metrics — input bytes, shuffle write, shuffle
read, memory/disk spill, task count — to that query via the Spark UI
REST API (stage-id delta per query). Shuffle write is the number that
must stay sublinear in input for an operator to survive 100 TB: an
operator whose shuffle ≈ its input is moving the dataset; one whose
shuffle is KBs is moving aggregates.

    python tools/shuffle_audit.py > SHUFFLE_AUDIT.md
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

_UI_PORT = int(os.environ.get("SPARK_GRAFT_AUDIT_PORT", "4049"))


def _stages(app_id: str) -> dict[int, dict]:
    url = f"http://127.0.0.1:{_UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        data = json.load(r)
    return {s["stageId"]: s for s in data}


def _mb(n: float) -> str:
    return f"{n / 1e6:,.1f}"


def main() -> int:
    from bench import HEADLINE
    from mapreduce_word2vec_spark.plans import catalog
    from mapreduce_word2vec_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="shuffle-audit",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(_UI_PORT)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    qs = catalog.all_queries()

    names = [n for n in HEADLINE if n in qs]
    # Non-headline operators whose scale story is about shuffle volume.
    names += [
        n
        for n in (
            "join_bloom_semi",
            "agg_countmin_words",
            "source_dpp_prune",
            "w2v_skipgram_pairs",
            "agg_bitmap_distinct",
            "events_attribution_last_touch",
        )
        if n not in names
    ]

    print("# SHUFFLE_AUDIT — measured bytes per headline query")
    print()
    print(f"sf_dir=`{sf_dir}`, one run per query (noop sink), stage metrics")
    print("attributed by stage-id delta via the UI REST API. Regenerate with")
    print("`python tools/shuffle_audit.py > SHUFFLE_AUDIT.md`. input_rows is")
    print("used instead of input bytes: the local-fs FileSystem statistics")
    print("under-report parquet bytesRead, while record counts are exact.")
    print()
    print("**Reading it:** `shuffle_w` is what the operator chose to move;")
    print("`input_rows` is what it had to read. A scale-safe aggregation")
    print("shows shuffle ≪ input (map-side partials); a join shows shuffle")
    print("bounded by its key+payload columns, not the table; spill must be")
    print("0 at this scale or the memory sizing is wrong.")
    print()
    print("| query | tasks | input_rows | shuffle_w_MB | shuffle_r_MB | spill_MB |")
    print("|---|---:|---:|---:|---:|---:|")

    seen: set[int] = set()
    for name in names:
        df = qs[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        stages = _stages(app_id)
        new = [s for sid, s in stages.items() if sid not in seen]
        seen.update(stages)
        tasks = sum(s.get("numCompleteTasks", 0) for s in new)
        inp = sum(s.get("inputRecords", 0) for s in new)
        sw = sum(s.get("shuffleWriteBytes", 0) for s in new)
        sr = sum(s.get("shuffleReadBytes", 0) for s in new)
        spill = sum(
            s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0) for s in new
        )
        print(
            f"| {name} | {tasks} | {inp:,} | {_mb(sw)} | {_mb(sr)} | {_mb(spill)} |",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
