#!/usr/bin/env python
"""Solo per-query profiler for the round-9 optimization pass.

For each named headline query (default: all), runs one untimed warm-up
then N timed reps, splitting each rep into DataFrame CONSTRUCTION time
(Python plan building + any eager persists/counts inside the operator)
and EXECUTION time (noop sink). Prints a table; medians.

    python tools/profile_solo.py [name ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

N_REPS = int(os.environ.get("PROFILE_REPS", "5"))


def main() -> int:
    names = sys.argv[1:] or None

    import bench
    from mapreduce_word2vec_spark.plans import catalog
    from mapreduce_word2vec_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="profile-solo-r09",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = catalog.queries()

    rows = []
    for name in names or bench.HEADLINE:
        fn = qs[name]
        # warm-up
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cons, execs = [], []
        for _ in range(N_REPS):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            execs.append(t2 - t1)
        c = statistics.median(cons)
        e = statistics.median(execs)
        rows.append((name, c, e, c + e))
        print(
            f"{name:32s} construct {c:6.3f}s  exec {e:6.3f}s  total {c+e:6.3f}s",
            flush=True,
        )
    rows.sort(key=lambda r: -r[3])
    print("\n== sorted by total ==")
    for name, c, e, t in rows:
        print(f"{name:32s} construct {c:6.3f}s  exec {e:6.3f}s  total {t:6.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
