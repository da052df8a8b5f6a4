"""Local DuckDB-oracle harness mirroring the driver's t2 check.

Runs a registered query's Spark DataFrame and its oracle SQL on the
same parquet tables, canonicalizes both (columns sorted by name, rows
sorted, floats rounded), and diffs. Used by the test suite and for
interactive iteration; the driver runs its own equivalent.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import DataFrame, SparkSession

from mapreduce_word2vec_spark.sources.readers import TESTDATA_TABLES

ROUND_DIGITS = 6


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    # Numeric canon is TYPE-SENSITIVE: the driver's value hash
    # distinguishes 5 (BIGINT) from 5.0 (DOUBLE), and Python's
    # ``5 == 5.0`` let exactly that slip through in round 1
    # (scalar_math: DuckDB ceil(double)->double vs Spark ceil->bigint
    # hashed differently while pytest passed). Tagging the kind makes
    # the local gate as strict as the driver's.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("f", round(v, ROUND_DIGITS))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, list):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def canonicalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


@dataclass
class OracleResult:
    name: str
    spark_rows: int
    oracle_rows: int
    match: bool
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.match else "MISMATCH"
        extra = f" ({'; '.join(self.mismatches[:3])})" if self.mismatches else ""
        return f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}{extra}"


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare(
    name: str,
    spark_df: DataFrame,
    sql: str,
    con: duckdb.DuckDBPyConnection,
    max_report: int = 5,
) -> OracleResult:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    o_cols = list(rel.columns)
    o_rows = rel.fetchall()

    mismatches: list[str] = []
    if sorted(s_cols) != sorted(o_cols):
        mismatches.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return OracleResult(name, len(s_rows), len(o_rows), False, mismatches)

    sc = canonicalize(s_cols, s_rows)
    oc = canonicalize(o_cols, o_rows)
    if len(sc) != len(oc):
        mismatches.append(f"row count {len(sc)} vs {len(oc)}")
    for i, (a, b) in enumerate(zip(sc, oc)):
        if a != b:
            mismatches.append(f"row {i}: spark={a!r} oracle={b!r}")
            if len(mismatches) >= max_report:
                break
    return OracleResult(name, len(s_rows), len(o_rows), not mismatches, mismatches)


def check_all(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[OracleResult]:
    from mapreduce_word2vec_spark.plans import catalog

    qs = catalog.all_queries()
    con = duckdb_connection(sf_dir)
    results = []
    for name, q in qs.items():
        if names and name not in names:
            continue
        if q.oracle is None:
            continue
        try:
            results.append(compare(name, q.fn(spark, sf_dir), q.oracle, con))
        except Exception as e:  # pragma: no cover - debugging aid
            results.append(OracleResult(name, -1, -1, False, [f"{type(e).__name__}: {e}"]))
    return results
