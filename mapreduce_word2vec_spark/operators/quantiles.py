"""Scale-safe EXACT quantiles.

Spark's exact ``percentile`` aggregate buffers every value of a group
in task memory (``PercentileBase.update`` keeps an OpenHashMap of all
values) — it OOM'd the round-7 sf10 probe on a 60M-row group and is
fatal on any unbounded group at 100 TB. The sketch (``approx_
percentile``) is the right production default, but several catalog
queries' CONTRACT is the exact interpolated quantile (oracle:
DuckDB ``quantile_cont``/``median``), so this operator computes the
exact value with bounded state instead:

one distributed sort per value column — ``row_number`` plus a
whole-partition ``count`` sharing the same shuffle+sort — then
continuous-rank interpolation at rank ``1 + q*(n-1)`` assembled from
the two bracketing rows (``v_lo*(1-frac) + v_hi*frac``, algebraically
the percentile/quantile_cont definition). Constant memory per task,
sort spills to disk, output is one row per group.

Rule enforced by tests/test_plans.py: the exact ``Percentile``
aggregate must not appear in any catalog plan over an unbounded group
— sketch it or sort it (this operator).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    group_col: str | list[str],
    value_col: str,
    qs: dict[str, float],
) -> DataFrame:
    """Exact interpolated quantiles of ``value_col`` per group.

    ``group_col`` may be one column name or a list (composite key).
    Returns one row per group: the group column(s) plus a double
    column per ``qs`` key. NULL values are excluded, matching
    ``percentile`` / ``quantile_cont`` semantics. Multiple quantiles
    of the SAME value column share the single sort.
    """
    group_cols = [group_col] if isinstance(group_col, str) else list(group_col)
    base = df.select(*group_cols, value_col).where(F.col(value_col).isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    ranked = base.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(Window.partitionBy(*group_cols))
    )
    v, rn = F.col(value_col).cast("double"), F.col("_rn")
    aggs = []
    for name, q in qs.items():
        r = F.lit(1.0) + F.lit(float(q)) * (F.col("_n") - F.lit(1)).cast("double")
        lo, hi, frac = F.floor(r), F.ceil(r), r - F.floor(r)
        aggs.append(
            F.sum(
                F.when(rn == lo, v * (F.lit(1.0) - frac))
                .when(rn == hi, v * frac)
                .otherwise(F.lit(0.0))
                + F.when((rn == lo) & (lo == hi), v * frac).otherwise(F.lit(0.0))
            ).alias(name)
        )
    return ranked.groupBy(*group_cols).agg(*aggs)


def exact_quantiles_global(
    df: DataFrame,
    value_col: str,
    qs: dict[str, float],
    accuracy: int = 10000,
) -> DataFrame:
    """Exact interpolated quantiles of ``value_col`` over the WHOLE
    frame, scale-safely.

    The grouped path can't be used here: ``Window.partitionBy()`` with
    no keys moves every row to one task (the `WindowExec: No Partition
    Defined` anti-pattern — a single-task sort of the dataset). This
    is the classic two-phase global selection instead:

    1. One aggregate pass: ``n`` plus a GK sketch bound per target
       quantile — ``approx_percentile`` at ``accuracy`` guarantees the
       true rank lies within ``n/accuracy``, so the sketch values at
       ``q ∓ 1/accuracy`` bracket the true quantile VALUE.
    2. One filter pass: rows inside the bracket, reduced to distinct
       (value, count) pairs — at most ~2n/accuracy distinct values
       plus tie runs, which COLLAPSE under the groupBy (a tie run is
       one pair however many rows it spans). The driver walks the
       sorted pairs (plus the count of rows below the bracket) to the
       bracketing ranks ``floor/ceil(1 + q*(n-1))`` and interpolates.

    Driver-side state is O(distinct values in the bracket), bounded by
    ~2n/accuracy — ~200k pairs at 1e9 rows — never O(n). Matches
    percentile/quantile_cont semantics (NULLs excluded, continuous
    interpolation). Returns a 1-row DataFrame with a double column per
    ``qs`` key (built on the driver; the heavy work is the two
    distributed passes above).
    """
    base = df.select(F.col(value_col).cast("double").alias("v")).where(
        F.col(value_col).isNotNull()
    )
    n = base.count()
    spark = df.sparkSession
    names = list(qs)
    if n == 0:
        return spark.createDataFrame([{name: None for name in names}])
    # PER-QUANTILE brackets (a single merged band for e.g. {p50, p99}
    # would span half the data and defeat the bound). The probe offset
    # must exceed the sketch's OWN rank error (n/accuracy) by enough
    # ranks to cover BOTH bracketing ranks floor/ceil(1 + q*(n-1)):
    # eps = 2/accuracy + 3/n puts the lower probe's rank at most
    # qn - n/accuracy - 3 (strictly below floor) and the upper at
    # least qn + n/accuracy + 3 (strictly above ceil), for any n.
    # (First cut used eps = 1/accuracy; at n=79 both probes collapsed
    # onto the same rank and the bracket missed the lower value —
    # caught by the sf0.01 gate on events_time_to_convert.)
    eps = 2.0 / accuracy + 3.0 / n
    lo_hi = []
    for name in names:
        q = qs[name]
        lo_hi += [max(0.0, q - eps), min(1.0, q + eps)]
    bounds = base.agg(
        F.percentile_approx("v", F.lit(lo_hi), F.lit(accuracy)).alias("b")
    ).collect()[0]["b"]
    band = {name: (bounds[2 * i], bounds[2 * i + 1]) for i, name in enumerate(names)}

    # One pass: rows below each bracket (rank offsets) — conditional
    # sums share the scan.
    offs = base.agg(
        *[
            F.sum(F.when(F.col("v") < F.lit(band[name][0]), 1).otherwise(0))
            .cast("bigint")
            .alias(name)
            for name in names
        ]
    ).collect()[0]
    # One pass: distinct (value, count) pairs inside the union of
    # brackets — tie runs collapse to one pair regardless of length.
    pred = None
    for lo_v, hi_v in band.values():
        c = (F.col("v") >= F.lit(lo_v)) & (F.col("v") <= F.lit(hi_v))
        pred = c if pred is None else (pred | c)
    pairs = base.where(pred).groupBy("v").count().orderBy("v").collect()

    def value_at(rank: int, name: str) -> float:
        lo_v, hi_v = band[name]
        cum = offs[name]
        if rank <= cum:  # bracket starts above the needed rank
            raise RuntimeError(
                f"quantile bracket for {name!r} missed rank {rank} "
                f"(bracket starts at rank {cum + 1}) — eps derivation violated"
            )
        for p in pairs:
            if p["v"] < lo_v or p["v"] > hi_v:
                continue
            cum += p["count"]
            if rank <= cum:
                return p["v"]
        raise RuntimeError(
            f"quantile bracket for {name!r} ends at rank {cum} < {rank} "
            "— eps derivation violated"
        )

    out = {}
    for name in names:
        r = 1.0 + qs[name] * (n - 1)
        lo_r, hi_r = int(math.floor(r)), int(math.ceil(r))
        v_lo = value_at(lo_r, name)
        v_hi = v_lo if hi_r == lo_r else value_at(hi_r, name)
        out[name] = v_lo + (r - lo_r) * (v_hi - v_lo)
    return spark.createDataFrame([out])
