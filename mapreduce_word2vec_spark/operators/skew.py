"""Skew-mitigation operators (SURVEY §4 / 100 TB design notes).

Two standard patterns, expressed so Catalyst still owns the physical
plan:

* :func:`salted_agg` — two-phase aggregation over a salted key for
  skewed groupBys. With K salt buckets a hot key's partial state is
  built on K tasks instead of one; the final merge handles K rows per
  key. Correct for any algebraic aggregate given its merge expression.
* :func:`salted_join` — replicate the small side K ways and salt the
  skewed fact side, turning one hot join partition into K. (AQE's
  skew-join split handles sort-merge cases automatically — this is
  the explicit form for when the optimizer can't, e.g. aggregations
  or forced shuffle-hash plans.)

Both are semantically transparent: results equal the unsalted
equivalents (oracle-checked via plans.catalog / property tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[Column, Column, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` is a list of (partial_agg_expr, merge_agg_expr_builder,
    name) triples where the partial expr aggregates raw rows and the
    merge expr (a Column over the partial column name) combines
    per-salt partials — e.g. ``(F.count("*"), F.sum("n"), "n")`` or
    ``(F.sum("value"), F.sum("sum_value"), "sum_value")``.
    """
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[p.alias(name) for p, _m, name in aggs]
    )
    return partial.groupBy(*keys).agg(*[m.alias(name) for _p, m, name in aggs])


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the fact side, explode the dim side
    across all salt values, join on (key, salt). Output columns =
    fact ⋈ dim minus the helper columns."""
    f = fact.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = f.join(d, (F.col(fact_key) == F.col(dim_key)) & (f["_salt"] == d["_salt"]), how)
    return joined.drop("_salt")
