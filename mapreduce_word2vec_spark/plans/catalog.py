"""Central query catalog.

Every operator the engine claims (SURVEY §2.B) is registered here as a
named query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus,
where SQL-expressible, an equivalent ANSI-SQL oracle string that DuckDB
runs on the same parquet tables. The driver hash-compares the two at
sf0.01 (``CORRECTNESS_r{N}.json``); queries without an oracle get a
rows-only check and are covered by golden/property tests instead.

Column-name contract: every computed column is aliased identically in
the Spark code and the oracle SQL — the driver sorts columns by name
before hashing.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


_REGISTRY: dict[str, Query] = {}

# Modules that register queries on import (order = SURVEY §7 build order).
_QUERY_MODULES = (
    "mapreduce_word2vec_spark.plans.text_queries",
    "mapreduce_word2vec_spark.plans.relational",
    "mapreduce_word2vec_spark.plans.embedding_queries",
    "mapreduce_word2vec_spark.plans.similarity_queries",
    "mapreduce_word2vec_spark.plans.dedup_queries",
    "mapreduce_word2vec_spark.plans.streaming_queries",
    "mapreduce_word2vec_spark.plans.multimodal_queries",
    "mapreduce_word2vec_spark.plans.udf_queries",
    "mapreduce_word2vec_spark.plans.source_queries",
)

_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str, _fn: QueryFn = fn) -> DataFrame:
            # Ship this package to executor Python workers so queries
            # using pandas UDFs work from any driver cwd/deployment.
            from mapreduce_word2vec_spark.runtime import ensure_workers_can_import

            ensure_workers_can_import(spark)
            # Timestamp results must be comparable against a TZ-naive
            # oracle regardless of how the caller built its session.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return _fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = Query(name, wrapped, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _load() -> None:
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _loaded = True


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
