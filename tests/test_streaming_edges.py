"""Edge-case contracts for the streaming/events queries on CRAFTED
corpora — cases the synthetic fixtures never produce but real data
will (the round-5 review findings):

* ``events_survival_km`` when every remaining subject fails — the
  product-limit factor is exactly 0 and neither engine may evaluate
  ln(0) (Spark F.log(0) is NULL and the window sum would silently
  skip the factor; DuckDB ln(0) raises).
* ``events_changepoint_cusum`` when the corpus has no purchases —
  Spark's ``sequence(1, 0)`` yields ``[1, 0]`` (default step -1), so
  an unguarded explode emits two spurious rows where the oracle's
  unnest over an empty list emits none.

Each test builds an sf-dir-shaped tmp corpus (crafted events.parquet,
other tables symlinked from sf0.001) and runs the REGISTERED query
against its REGISTERED oracle through the same compare harness the
local gate uses, so the edge stays pinned at driver strictness.
"""

from __future__ import annotations

import datetime
import os

import pytest

from mapreduce_word2vec_spark.oracle import compare, duckdb_connection
from mapreduce_word2vec_spark.plans import catalog
from tests.conftest import SF_SMOKE

_T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _crafted_sf_dir(tmp_path, spark, rows):
    """sf-dir with crafted events rows; every other table symlinks to
    the smoke fixture so duckdb_connection can bind all views."""
    d = tmp_path / "sf_edge"
    d.mkdir()
    for t in os.listdir(SF_SMOKE):
        if t != "events.parquet":
            os.symlink(os.path.join(SF_SMOKE, t), d / t)
    # Single parquet FILE (not a Spark part-file directory): DuckDB's
    # view binds the plain path, exactly like the real testdata.
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(pa.Table.from_pandas(df, schema=schema), d / "events.parquet")
    return str(d)


def _run(spark, sf_dir, name):
    q = catalog.all_queries()[name]
    res = compare(name, q.fn(spark, sf_dir), q.oracle, duckdb_connection(sf_dir))
    assert res.match, res
    return q.fn(spark, sf_dir)


def test_survival_km_all_failed_edge(tmp_path, spark):
    """Every user errors inside the 72h window → the last failure hour
    consumes all remaining at-risk subjects; survival must be exactly
    0.0 there and the oracle must not crash on ln(0)."""
    rows = []
    eid = 0
    for u, err_hours in enumerate((1, 5, 5)):
        rows.append((eid, _T0, u, "signup", 1.0, "{}"))
        eid += 1
        rows.append(
            (eid, _T0 + datetime.timedelta(hours=err_hours, minutes=1), u,
             "error", 1.0, "{}")
        )
        eid += 1
    sf = _crafted_sf_dir(tmp_path, spark, rows)
    out = _run(spark, sf, "events_survival_km").orderBy("duration_hours").collect()
    assert out[-1]["n_failed"] == out[-1]["n_at_risk"]
    assert out[-1]["survival"] == 0.0
    # earlier rows keep the ordinary product-limit value
    assert out[0]["survival"] == pytest.approx(2.0 / 3.0, abs=1e-6)


def test_changepoint_cusum_no_purchases_edge(tmp_path, spark):
    """No purchase rows → both engines must emit ZERO rows (the
    sequence(1, 0) == [1, 0] trap)."""
    rows = [
        (0, _T0, 0, "click", 1.0, "{}"),
        (1, _T0 + datetime.timedelta(hours=1), 1, "error", 2.0, "{}"),
    ]
    sf = _crafted_sf_dir(tmp_path, spark, rows)
    out = _run(spark, sf, "events_changepoint_cusum")
    assert out.count() == 0


def _crafted_docs_dir(tmp_path, rows):
    """sf-dir with crafted documents rows (the events twin above)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf_docs_edge"
    d.mkdir()
    for t in os.listdir(SF_SMOKE):
        if t != "documents.parquet":
            os.symlink(os.path.join(SF_SMOKE, t), d / t)
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int32()),
        ]
    )
    pq.write_table(pa.Table.from_pandas(df, schema=schema), d / "documents.parquet")
    return str(d)


def test_multimodal_degenerate_payloads(tmp_path, spark):
    """Empty and sub-4-char payloads — the review-confirmed class
    where DuckDB's split('', '') == [''] (a phantom NUL byte) diverged
    from the Python kernels: the decode histogram must be all-zero for
    an empty payload, the pHash must be 0, and scene cuts must not
    fire on empty padding frames."""
    rows = [
        (0, "", "en", "src0", 0),
        (1, "ab", "en", "src0", 2),
        (2, "abc", "en", "src0", 3),
        (3, "abc", "en", "src0", 3),
        (4, "a decent length document body for contrast here", "en", "src0", 48),
    ]
    sf = _crafted_docs_dir(tmp_path, rows)
    for name in (
        "multimodal_decode",
        "multimodal_dedup_phash",
        "multimodal_scene_cuts",
        "multimodal_frames",
    ):
        _run(spark, sf, name)


def test_cep_dfa_equals_lazy_regex_on_fuzzed_symbol_strings():
    """The batch CEP rewrite replaced regexp_count over the per-user
    symbol string with an O(1)-state DFA scan (operators/ordered_fold
    carries it over the sorted stream). Pin the equivalence the
    rewrite's correctness rests on: for ANY symbol string, the DFA's
    match count equals non-overlapping leftmost matching of the lazy
    pattern v[^e]*?c[^e]*?p — the semantics regexp_count (engine) and
    regexp_extract_all (oracle) both implement. 20k fuzzed strings
    plus the adversarial greedy-vs-lazy shapes."""
    import random
    import re

    from mapreduce_word2vec_spark.plans.streaming_queries import (
        _cep_init,
        _cep_step,
    )
    from mapreduce_word2vec_spark.streaming.windows import CEP_PATTERN

    rx = re.compile(CEP_PATTERN)

    def dfa_count(s: str) -> int:
        st = _cep_init()
        for ch in s:
            st = _cep_step(st, ch)
        assert st[1] == len(s)
        return st[2]

    cases = [
        "",
        "p",
        "vcp",
        "vcpcp",      # lazy: 1 match, suffix has no v
        "vcpvcp",     # lazy: 2; greedy would glue them into 1
        "vcvep",      # e between the 2nd v's c-path: 0
        "vvecp",      # e before any c: 0
        "vscp",       # s is consumed by [^e]*?: 1
        "vcpp",       # second p unmatched: 1
        "vvcpcpp",    # leftmost v anchors; then cpp has no v: 1
        "vcecp",      # e kills the open match; no v after: 0
        "vcevcp",     # reset then full match: 1
    ]
    rng = random.Random(0xCE9)
    for n in (1, 2, 3, 5, 8, 13, 40):
        for _ in range(20_000 // (7 * n) + 50):
            cases.append(
                "".join(rng.choice("vcspe") for _ in range(n))
            )
    for s in cases:
        assert dfa_count(s) == len(rx.findall(s)), s


def test_ordered_fold_null_keys_form_one_group(spark):
    """NULL keys must fold as ONE group (groupBy semantics), not one
    group per row: Spark→pandas renders a nullable bigint key as
    float64 NaN, and NaN != NaN would otherwise re-open the group on
    every null row (ADVICE r7). The fold normalizes null-likes and
    hands ``emit`` a None key."""
    from mapreduce_word2vec_spark.operators.ordered_fold import (
        per_key_ordered_fold,
    )

    # Defined in-test so cloudpickle ships them by value (the tests
    # package is not importable on executor Python workers).
    def _nf_init():
        return 0

    def _nf_step(st, v):
        return st + int(v)

    def _nf_emit(key, st):
        return (None if key is None else int(key), st)

    rows = [(1, 10, 1), (None, 20, 1), (1, 30, 1), (None, 40, 1), (2, 50, 1), (None, 60, 1)]
    df = spark.createDataFrame(rows, "user_id bigint, us bigint, v bigint")
    out = per_key_ordered_fold(
        df,
        key_col="user_id",
        order_cols=("us",),
        val_cols=("v",),
        out_schema="user_id bigint, n bigint",
        out_cols=("user_id", "n"),
        init=_nf_init,
        step=_nf_step,
        emit=_nf_emit,
    )
    got = {r["user_id"]: r["n"] for r in out.collect()}
    assert got == {1: 2, 2: 1, None: 3}, got


def test_ordered_fold_rejects_float_keys(spark):
    """Float/double key_col must be rejected at call time: a genuine
    NaN KEY would be conflated with the NULL normalization, and Spark
    sorts NULL (first) and NaN (last) to opposite ends, so both
    present would emit two non-contiguous None-keyed groups
    (ADVICE r8). Integer/string/date keys stay accepted."""
    import pytest

    from mapreduce_word2vec_spark.operators.ordered_fold import (
        per_key_ordered_fold,
    )

    df = spark.createDataFrame(
        [(1.0, 10, 1)], "k double, us bigint, v bigint"
    )
    with pytest.raises(TypeError, match="float/double keys are forbidden"):
        per_key_ordered_fold(
            df,
            key_col="k",
            order_cols=("us",),
            val_cols=("v",),
            out_schema="k double, n bigint",
            out_cols=("k", "n"),
            init=lambda: 0,
            step=lambda st, v: st + 1,
            emit=lambda key, st: (key, st),
        )
