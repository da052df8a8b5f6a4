"""MERGE / upsert / SCD2 emulation (no Delta/Iceberg in this
environment — the pattern is the anti-join + union formulation those
table formats execute underneath).

* :func:`merge_upsert` — MERGE WHEN MATCHED THEN UPDATE (source wins)
  WHEN NOT MATCHED THEN INSERT, as ``target ⟕anti source ∪ source``.
* :func:`scd2_apply` — slowly-changing-dimension type 2: close out
  changed rows (set ``valid_to``) and append new versions.

Both are deterministic DataFrame programs; at scale the anti-join
shuffles on the merge key exactly once and the union is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str | list[str],
    small_source: bool = False,
) -> DataFrame:
    """Rows of ``target`` whose key is absent from ``source``, plus
    every row of ``source`` (update-else-insert; source wins).
    Requires identical schemas (use ``unionByName`` semantics).

    ``small_source=True`` broadcasts the distinct source keys so the
    anti-join never shuffles the (huge) target — the right plan for the
    common small-batch-into-big-table merge. Leave False when the
    source rivals the target in size (shuffled anti-join is then
    correct) or when source stats are known and AQE can decide."""
    keys = [key] if isinstance(key, str) else key
    src_keys = source.select(*keys).distinct()
    if small_source:
        src_keys = F.broadcast(src_keys)
    untouched = target.join(src_keys, keys, "left_anti")
    return untouched.unionByName(source)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked_cols: list[str],
    effective_col: str = "valid_from",
    end_col: str = "valid_to",
    batch_time: str = "9999-01-01 00:00:00",
) -> DataFrame:
    """Type-2 SCD: for keys whose tracked columns changed, close the
    current row (``valid_to`` = batch time) and append the new
    version (``valid_from`` = batch time, open-ended)."""
    current = dim.where(F.col(end_col).isNull())
    joined = current.alias("d").join(updates.alias("u"), key, "inner")
    change_cond = F.lit(False)
    for c in tracked_cols:
        change_cond = change_cond | (F.col(f"d.{c}") != F.col(f"u.{c}"))
    changed_keys = (
        joined.where(change_cond).select(F.col(f"d.{key}").alias(key)).distinct()
    )

    marked = dim.join(
        changed_keys.withColumn("_chg", F.lit(True)), key, "left"
    )
    keep = marked.where(
        ~(F.col(end_col).isNull() & F.col("_chg").isNotNull())
    ).drop("_chg")
    closed = (
        marked.where(F.col(end_col).isNull() & F.col("_chg").isNotNull())
        .drop("_chg")
        .withColumn(end_col, F.lit(batch_time).cast("timestamp"))
    )
    new_rows = (
        updates.join(changed_keys, key, "left_semi")
        .withColumn(effective_col, F.lit(batch_time).cast("timestamp"))
        .withColumn(end_col, F.lit(None).cast("timestamp"))
    )
    return keep.unionByName(closed).unionByName(new_rows)
