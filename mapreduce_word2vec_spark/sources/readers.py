"""Sources (SURVEY §2.B "Sources" row).

The reference's only source is a text-file scan
(``MapRedWord2Vec.scala:271,275`` — ``TextInputFormat`` over a
directory of ``.txt`` files, one record per line). Spark-first
equivalent: ``spark.read.text``; the byte-offset key is never used by
the reference logic (``MapRedWord2Vec.scala:99-118``) so it has no
column here. ``input_file_name()`` recovers per-file lineage, which is
what the reference's "one model per split" parity mode partitions by.

Parquet / CSV / JSON scans are the engine's native columnar sources;
Catalyst pushes filters and prunes columns into them (verify with
``df.explain`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_text_corpus(spark: SparkSession, path: str, with_file: bool = False) -> DataFrame:
    """Text scan: one row per line (reference A1).

    ``with_file=True`` adds the source file path — the reference's unit
    of parallelism (one mapper per split ≈ per file) for parity mode.
    """
    df = spark.read.text(path)
    if with_file:
        df = df.withColumn("file", F.input_file_name())
    return df


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    if columns:
        df = df.select(*columns)
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    reader = spark.read.options(header=header, **options)
    if schema is not None:
        reader = reader.schema(schema)
    elif "inferSchema" not in options:
        # Schema inference is a convenience DEFAULT for interactive use
        # (it costs an extra full scan; production callers pass a
        # schema) — a caller's explicit inferSchema=False (all-string
        # columns, e.g. to keep leading zeros) must not be overridden.
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options
) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


# (path -> scan partition count) probe cache for parallelize_scan:
# getNumPartitions costs one driver-side planning pass, paid once per
# table per process. NOTE (r9 advice): keyed by path only — if the file
# at a path were rewritten at a different file count mid-process the
# stale probe would mis-decide. Unreachable in the driver/bench
# harnesses (testdata is read-only); long-lived sessions that rewrite
# tables should clear this dict alongside release_tracked().
_SCAN_PARTS: dict[str, int] = {}


def parallelize_scan(
    df: DataFrame, spark: SparkSession, path: str, key: str | None = None
) -> DataFrame:
    """Scale-adaptive compute distribution for CPU-heavy narrow
    pipelines (optimization guide §2.5 "repartition immediately after
    the read" / §6 input splits).

    A small corpus arrives as ONE parquet file with ONE row group, so
    the scan is a single task and every per-row regex/HOF pass downstream
    of it runs on one core no matter the cluster size. When the scan
    yields fewer partitions than half the session's parallelism,
    round-robin repartition to ``defaultParallelism`` so the expensive
    map work fans out. Round-robin (not hash) keeps the plan's
    ``Exchange hashpartitioning`` count — the shape the 100 TB plan
    contracts assert — unchanged, and column pruning still pushes
    through a keyless repartition.

    At production scale the condition is false by construction (a
    100 TB table scans as thousands of partitions) and this is an
    identity: no shuffle is ever added where the scan already
    parallelizes. Opt-IN per call site: only pipelines whose per-row
    compute dominates their scan cost ask for it; model-training
    inputs (Word2Vec gradient order) never do."""
    target = spark.sparkContext.defaultParallelism
    parts = _SCAN_PARTS.get(path)
    if parts is None:
        parts = df.rdd.getNumPartitions()
        _SCAN_PARTS[path] = parts
    if parts * 2 <= target:
        # key given → hash distribute (no pre-repartition local sort;
        # the key must be a column the query reads anyway or pruning
        # widens). keyless → round-robin, fully pruning-transparent.
        if key is not None:
            return df.repartition(target, F.col(key))
        return df.repartition(target)
    return df


# Scan PLAN reuse (r10, optimization guide §5 "the driver should do
# almost no data work" / §6 file-listing reuse): ``spark.read.parquet``
# costs ~0.15-0.35 s of serial driver work PER CALL on the bench rig
# (DataSource resolution, file listing, parquet footer/schema read —
# all py4j round trips), and every catalog query pays it once per table
# it reads, inside the timed region. The DataFrame it returns is an
# immutable logical plan, so one plan per (session, path, variant) can
# be shared by every consumer — exactly what a production app does by
# resolving a catalog table once. This caches ONLY the unexecuted plan
# object: no rows, no results — every action still scans the parquet
# files, and a release_tracked()/unpersist cycle never touches it.
# Keyed WEAKLY on the session so a restarted session rebuilds plans.
from weakref import WeakKeyDictionary

_SCAN_PLANS: "WeakKeyDictionary[SparkSession, dict[tuple, DataFrame]]" = (
    WeakKeyDictionary()
)


def read_testdata(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    parallelize: bool | str = False,
) -> DataFrame:
    """Load one of the driver's synthetic tables (TESTDATA.md).

    ``events.ts`` has shipped in two physical encodings across driver
    testdata generations: parquet TIMESTAMP(NANOS) (which Spark's
    reader rejects — we read it as a long via the legacy conf and
    convert with integer division; double division would lose
    precision at ~1.7e18 ns) and plain TIMESTAMP(MICROS) (read
    natively). We branch on the decoded type so both generations
    work. Sub-microsecond digits are truncated in the nanos case —
    queries must therefore never emit the raw ``ts`` value when an
    external nanosecond-capable oracle is the comparator; emit
    derived/bucketed values instead.
    """
    if table not in TESTDATA_TABLES:
        raise ValueError(f"unknown table {table!r}; expected one of {TESTDATA_TABLES}")
    cache = _SCAN_PLANS.setdefault(spark, {})
    cache_key = (sf_dir, table, parallelize)
    cached = cache.get(cache_key)
    if cached is not None:
        return cached
    if table == "events":
        # DELIBERATELY session-sticky (no restore): DataFrames are
        # lazy, so the conf must still hold when the plan EXECUTES —
        # a set-and-restore around the read definition would corrupt
        # later runs. Side effect: any other TIMESTAMP(NANOS) parquet
        # read in the same session also decodes as long.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # Micros parquet decodes as TIMESTAMP_NTZ; cast to the
            # session-local timestamp type every downstream consumer
            # (and the nanos branch above) produces. The session
            # timezone is pinned to UTC, so the cast relabels without
            # shifting values — and the DuckDB oracle's naive
            # timestamps keep comparing equal.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        if parallelize:
            key = parallelize if isinstance(parallelize, str) else None
            df = parallelize_scan(df, spark, f"{sf_dir}/{table}.parquet", key=key)
        cache[cache_key] = df
        return df
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if parallelize:
        key = parallelize if isinstance(parallelize, str) else None
        df = parallelize_scan(df, spark, f"{sf_dir}/{table}.parquet", key=key)
    cache[cache_key] = df
    return df


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view for spark.sql use."""
    for table in TESTDATA_TABLES:
        read_testdata(spark, sf_dir, table).createOrReplaceTempView(table)
