"""Sinks (SURVEY §2.B "Sinks" row).

The reference's sink is ``TextOutputFormat`` with a ``","`` key/value
separator (``MapRedWord2Vec.scala:251,272,276``), producing lines
``word,token,count,[v1,...,v100]`` plus a ``_SUCCESS`` marker.
Spark's file sinks write the same ``_SUCCESS`` marker; the
reference-format line is produced by
:func:`mapreduce_word2vec_spark.operators.word2vec.format_reference_output`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = False) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_reference_csv(df: DataFrame, path: str, sort: bool = True) -> None:
    """Reference output parity (A17+A18).

    The reference's single default reducer makes its output globally
    sorted lexicographically by key (MR sort-based shuffle; no custom
    comparator in ``MapRedWord2Vec.scala:245-284``). ``sort=True``
    reproduces that. At 100 TB a global sort is one range-partitioned
    shuffle (Spark samples ranges) — acceptable as an opt-in parity
    feature, not a default.
    """
    if sort and "word" in df.columns:
        df = df.orderBy("word")
    df.write.mode("overwrite").option("header", False).csv(path)
