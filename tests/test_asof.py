"""As-of join operator (operators/asof.py) — semantics the oracle
query can't isolate: forward direction, tolerance, equal-timestamp
inclusivity, multi-column keys, and the no-match null path."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mapreduce_word2vec_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),
            (1, _ts("2024-01-01 12:00:00"), "b"),
            (2, _ts("2024-01-01 11:00:00"), "c"),
            (3, _ts("2024-01-01 09:00:00"), "d"),  # key with no right rows
        ],
        "k int, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 10.0),
            (1, _ts("2024-01-01 12:00:00"), 20.0),  # equal-ts vs left "b"
            (2, _ts("2024-01-01 11:30:00"), 30.0),  # after left "c"
        ],
        "k int, t timestamp, price double",
    )
    return left, right


def test_backward_inclusive(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_time="t", right_time="t")
    rows = {r["tag"]: r for r in out.collect()}
    assert rows["a"]["price"] == 10.0
    assert rows["b"]["price"] == 20.0  # equal timestamp matches (inclusive)
    assert rows["b"]["t_right"] == _ts("2024-01-01 12:00:00")
    assert rows["c"]["price"] is None  # only later right rows for key 2
    assert rows["d"]["price"] is None  # key absent from right
    assert out.count() == left.count()  # left join: row preserved per left row


def test_forward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_time="t", right_time="t",
                    direction="forward")
    rows = {r["tag"]: r for r in out.collect()}
    assert rows["a"]["price"] == 20.0  # next right at/after 10:00 is 12:00
    assert rows["b"]["price"] == 20.0  # inclusive on equal ts
    assert rows["c"]["price"] == 30.0
    assert rows["d"]["price"] is None


def test_tolerance_nulls_out_stale_matches(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_time="t", right_time="t",
                    tolerance_seconds=1800)
    rows = {r["tag"]: r for r in out.collect()}
    assert rows["a"]["price"] == 10.0  # 30 min gap: within tolerance
    assert rows["b"]["price"] == 20.0  # 0 gap
    # Without tolerance "b" would also see 09:30 row for earlier lefts —
    # covered above; nothing for c/d either way.
    out_tight = asof_join(left, right, on="k", left_time="t", right_time="t",
                          tolerance_seconds=60)
    rows_t = {r["tag"]: r for r in out_tight.collect()}
    assert rows_t["a"]["price"] is None  # 30 min > 60 s → stale, nulled
    assert rows_t["a"]["t_right"] is None
    assert rows_t["b"]["price"] == 20.0


def test_tolerance_subsecond_precision(spark):
    """Tolerance honors fractional seconds: unix_timestamp-based
    comparison truncated to whole seconds, so a 0.8 s gap looked like
    0 s and a 0.5 s tolerance was impossible to express."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:01.300000"), "x")],
        "k int, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00.500000"), 7.0)],
        "k int, t timestamp, price double",
    )
    # Gap is exactly 0.8 s. A 0.5 s tolerance must null the match
    # (second-truncation made the gap appear as 1 - 0 = 1 s or 0 s
    # depending on rounding); a 1.0 s tolerance must keep it.
    tight = asof_join(left, right, on="k", left_time="t", right_time="t",
                      tolerance_seconds=0.5).collect()[0]
    assert tight["price"] is None
    loose = asof_join(left, right, on="k", left_time="t", right_time="t",
                      tolerance_seconds=1.0).collect()[0]
    assert loose["price"] == 7.0


def test_multi_key_and_plan_shape(spark):
    left, right = _frames(spark)
    left2 = left.withColumn("g", F.lit("x"))
    right2 = right.withColumn("g", F.lit("x"))
    out = asof_join(left2, right2, on=["k", "g"], left_time="t", right_time="t")
    assert out.count() == 4
    # Single exchange on the key — the union-window formulation must not
    # introduce a join (no BroadcastHashJoin/SortMergeJoin in the plan).
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_fuzz_against_pandas_merge_asof(spark):
    """Randomized parity vs pandas.merge_asof — the definitional
    reference for as-of semantics — across both directions and
    with/without tolerance, on frames with no-match keys, equal
    timestamps, and sub-second gaps. Right (key, time) pairs are
    unique per the operator's contract."""
    import random

    import pandas as pd

    rng = random.Random(1234)
    for trial in range(8):
        n_keys = rng.randint(1, 4)
        left_rows = []
        right_rows = []
        seen_right = set()
        for i in range(rng.randint(5, 40)):
            k = rng.randint(1, n_keys)
            t = dt.datetime(2024, 1, 1) + dt.timedelta(
                seconds=rng.randint(0, 3600), milliseconds=rng.choice([0, 250, 500])
            )
            left_rows.append((k, t, i))
        for i in range(rng.randint(0, 30)):
            k = rng.randint(1, n_keys + 1)  # may include keys left lacks
            t = dt.datetime(2024, 1, 1) + dt.timedelta(
                seconds=rng.randint(0, 3600), milliseconds=rng.choice([0, 250, 500])
            )
            if (k, t) in seen_right:
                continue
            seen_right.add((k, t))
            right_rows.append((k, t, float(i)))
        if not right_rows:
            right_rows = [(1, dt.datetime(2024, 1, 1), 0.0)]
        left = spark.createDataFrame(left_rows, "k int, t timestamp, lid int")
        right = spark.createDataFrame(right_rows, "k int, t timestamp, price double")
        for direction in ("backward", "forward"):
            for tol, exact in ((None, True), (600.0, True), (None, False)):
                got = {
                    r["lid"]: (r["price"], r["t_right"])
                    for r in asof_join(
                        left,
                        right,
                        on="k",
                        left_time="t",
                        right_time="t",
                        right_cols=["price"],
                        direction=direction,
                        tolerance_seconds=tol,
                        allow_exact_matches=exact,
                    ).collect()
                }
                lpdf = pd.DataFrame(left_rows, columns=["k", "t", "lid"]).sort_values(
                    "t", kind="stable"
                )
                rpdf = pd.DataFrame(
                    right_rows, columns=["k", "t", "price"]
                ).sort_values("t", kind="stable")
                want_pdf = pd.merge_asof(
                    lpdf,
                    rpdf.rename(columns={"t": "t_right"}),
                    left_on="t",
                    right_on="t_right",
                    by="k",
                    direction=direction,
                    tolerance=(
                        pd.Timedelta(seconds=tol) if tol is not None else None
                    ),
                    allow_exact_matches=exact,
                )
                assert len(got) == len(left_rows), (trial, direction, tol)
                for _, row in want_pdf.iterrows():
                    g_price, g_t = got[row["lid"]]
                    if pd.isna(row["price"]):
                        assert g_price is None and g_t is None, (
                            trial, direction, tol, row["lid"], g_price, g_t,
                        )
                    else:
                        assert g_price == row["price"] and g_t == row[
                            "t_right"
                        ].to_pydatetime(), (trial, direction, tol, row["lid"])
