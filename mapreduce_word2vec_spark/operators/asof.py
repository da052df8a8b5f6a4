"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks
natively (pandas has ``merge_asof``; DuckDB has ``ASOF JOIN``).

For each left row, pick the single right row with the same key and the
largest right time <= left time (``direction="backward"``, inclusive) or
smallest right time >= left time (``direction="forward"``).

Implementation is the scalable union-then-window formulation, NOT a
range join: tag both sides, union on (key, time), and carry the most
recent right-side payload forward with ``last(..., ignorenulls=True)``
over a (key)-partitioned window. One shuffle on the key, O(n log n) per
partition, and — unlike an inequality join — no candidate-pair
explosion, so it survives a 100 TB fact table as long as the key is not
pathologically skewed (pre-salt or split hot keys upstream if it is).

The reference implements no joins at all (SURVEY §2.A "Not
implemented"); this is declared target-engine breadth for event-stream
enrichment (trade-to-quote, event-to-last-purchase, sensor alignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the matched right
    row's ``right_cols`` (renamed with ``suffix`` on collision) and the
    matched right time as ``{right_time}{suffix}``; nulls if no match.

    ``allow_exact_matches=False`` makes the time comparison strict
    (pandas merge_asof semantics): a right row AT the left timestamp
    is invisible — the lookup a leakage-free feature join needs when
    the feature was computed FROM the event it would otherwise match.
    Implementation cost is zero: only the equal-timestamp sort order
    of the two tagged sides flips.

    ``right`` must have at most one row per (key, time) — the match is
    otherwise ambiguous; dedup upstream to keep the result
    deterministic.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_time]

    matched_time = right_time + suffix
    payload = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }

    # Tag and align both sides on (keys…, _t, _side, payload…).
    l_tagged = left.select(
        *keys,
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in keys],
        *[F.lit(None).cast(right.schema[c].dataType).alias(out) for c, out in payload.items()],
        F.lit(None).cast("timestamp").alias(matched_time),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_time).cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        *[F.col(c).alias(out) for c, out in payload.items()],
        F.col(right_time).cast("timestamp").alias(matched_time),
    )

    # Backward inclusive: right rows at an equal timestamp are visible
    # to the left row, so they must sort first → _side ascending (right
    # is 0). Strict: the left row sorts first → _side descending, and
    # the equal-timestamp right row is no longer carried. The window
    # never crosses a key boundary (partitionBy keys).
    side_order = F.col("_side").asc() if allow_exact_matches else F.col("_side").desc()
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").asc(), side_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").desc(), side_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    unioned = l_tagged.unionByName(r_tagged)
    carried = unioned.select(
        "*",
        *[
            F.last(out, ignorenulls=True).over(w).alias("_m_" + out)
            for out in payload.values()
        ],
        F.last(matched_time, ignorenulls=True).over(w).alias("_m_t"),
    )

    out_rows = carried.where(F.col("_side") == 1)
    within = F.lit(True)
    if tolerance_seconds is not None:
        # Compare at full timestamp precision: casting timestamp to
        # double yields fractional epoch seconds (microsecond-exact),
        # whereas unix_timestamp() truncates to whole seconds — which
        # would misclassify sub-second gaps and ignore fractional
        # tolerances (the parameter is a float).
        gap = F.abs(F.col("_t").cast("double") - F.col("_m_t").cast("double"))
        within = gap <= F.lit(float(tolerance_seconds))

    result = out_rows.select(
        *keys,
        F.col("_t").alias(left_time),
        *[c for c in left.columns if c not in keys and c != left_time],
        *[
            F.when(within, F.col("_m_" + out)).alias(out)
            for out in payload.values()
        ],
        F.when(within, F.col("_m_t")).alias(matched_time),
    )
    return result
