#!/usr/bin/env python
"""Order-insensitive aggregate-checksum gate for quadratic-output
contracts at probe scale.

The full oracle gate (tools/oracle_gate.py) materializes BOTH engines'
results through Arrow to hash every cell — the right bar at driver
scale, but for contracts whose OUTPUT is corpus-quadratic (candidate
pair lists at sf10 reach tens of millions of rows) the harness collect
dominates by hours while proving nothing the aggregate view doesn't.
This tool applies the standing checksum-parity treatment (the r6
dedup_simhash / r7 join_range precedent, BASELINE.md rows) as a
reusable gate: run the catalog plan AND the registered DuckDB oracle,
reduce each to ONE row of order-insensitive per-column checksums, and
compare those.

Per column, by type (identical derivation on both engines):
  - integral/bool:    SUM(CAST(c AS DECIMAL(38,0))), COUNT(c)
  - float/decimal:    SUM(c) (relative tolerance 1e-8 — reduction-order
                      ULP noise at 1e7+-row sums), COUNT(c)
  - string:           SUM(big-endian uint64 of md5(c) bytes 9..16),
                      COUNT(c)   [Spark conv(substr(md5,17,16),16,10)
                      == DuckDB ('0x'||substr(md5,17,16))::UBIGINT]
  - date:             SUM(days since 1970-01-01), COUNT(c)
  - timestamp:        SUM(epoch seconds as double), COUNT(c)
  - array<numeric>:   SUM(element sum), COUNT(c)
plus COUNT(*). Integer/count checksums must match exactly; float sums
within relative tolerance. Detection power: any dropped/duplicated/
reordered-across-rows value moves a sum; the md5 sum catches any
string cell edit. (A crafted pair of offsetting edits could cancel —
acceptable for the probe tier; driver-scale gates keep full hashing.)

--selftest runs both directions at the given sf dir on a small name:
checksums must MATCH the untouched oracle and MISMATCH a perturbed
one (one row's value nudged), proving the gate can fail.

Usage: python tools/checksum_gate.py SF_DIR NAME [NAME ...]
       python tools/checksum_gate.py SF_DIR --selftest NAME
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

REL_TOL = 1e-8


def _spark_checksum_exprs(df):
    """(label, spark Column) checksum terms for every column of df."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    terms = [("count_star", F.count(F.lit(1)))]
    for f in df.schema.fields:
        c, t = f.name, f.dataType
        n = F.count(F.col(c))
        if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            terms.append((f"sum_{c}", F.sum(F.col(c).cast("decimal(38,0)"))))
        elif isinstance(t, T.BooleanType):
            terms.append((f"sum_{c}", F.sum(F.col(c).cast("decimal(38,0)"))))
        elif isinstance(t, (T.FloatType, T.DoubleType, T.DecimalType)):
            terms.append((f"fsum_{c}", F.sum(F.col(c).cast("double"))))
        elif isinstance(t, T.StringType):
            h = F.expr(
                f"sum(cast(conv(substr(md5(`{c}`), 17, 16), 16, 10) as decimal(38,0)))"
            )
            terms.append((f"md5sum_{c}", h))
        elif isinstance(t, T.DateType):
            terms.append((f"sum_{c}", F.sum(F.datediff(F.col(c), F.lit("1970-01-01")))))
        elif isinstance(t, T.TimestampType):
            terms.append((f"fsum_{c}", F.sum(F.col(c).cast("double"))))
        elif isinstance(t, T.ArrayType) and isinstance(
            t.elementType, (T.FloatType, T.DoubleType, T.IntegerType, T.LongType)
        ):
            terms.append(
                (
                    f"fsum_{c}",
                    F.sum(F.expr(f"aggregate(`{c}`, 0D, (a, x) -> a + cast(x as double))")),
                )
            )
        else:
            # opaque (binary/struct/map): count-only — recorded so the
            # log shows the column was NOT value-checked (no silent cap)
            terms.append((f"OPAQUE_{c}", F.lit(None).cast("long")))
        terms.append((f"cnt_{c}", n))
    return terms


def _duck_checksum_sql(oracle_sql: str, df_schema) -> str:
    """DuckDB SELECT computing the same checksum terms over the oracle."""
    from pyspark.sql import types as T

    sel = ["count(*) AS count_star"]
    for f in df_schema.fields:
        c, t = f.name, f.dataType
        q = f'"{c}"'
        if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType)):
            sel.append(f"sum(CAST({q} AS DECIMAL(38,0))) AS sum_{c}")
        elif isinstance(t, (T.FloatType, T.DoubleType, T.DecimalType)):
            sel.append(f"sum(CAST({q} AS DOUBLE)) AS fsum_{c}")
        elif isinstance(t, T.StringType):
            sel.append(
                f"sum(CAST(('0x' || substr(md5({q}), 17, 16)) AS UBIGINT)::HUGEINT)"
                f" AS md5sum_{c}"
            )
        elif isinstance(t, T.DateType):
            sel.append(f"sum(date_diff('day', DATE '1970-01-01', {q})) AS sum_{c}")
        elif isinstance(t, T.TimestampType):
            sel.append(f"sum(epoch({q})) AS fsum_{c}")
        elif isinstance(t, T.ArrayType):
            sel.append(f"sum(list_aggregate({q}, 'sum')) AS fsum_{c}")
        else:
            sel.append(f"NULL AS OPAQUE_{c}")
        sel.append(f"count({q}) AS cnt_{c}")
    return f"WITH __q AS ({oracle_sql}) SELECT {', '.join(sel)} FROM __q"


def _compare(labels, svals, dvals) -> list[str]:
    diffs = []
    for lab, sv, dv in zip(labels, svals, dvals):
        if lab.startswith("OPAQUE_"):
            continue
        if sv is None and dv is None:
            continue
        if sv is None or dv is None:
            diffs.append(f"{lab}: spark={sv} oracle={dv}")
            continue
        if lab.startswith("fsum_"):
            a, b = float(sv), float(dv)
            if a == b:
                continue
            denom = max(abs(a), abs(b), 1.0)
            if abs(a - b) / denom > REL_TOL:
                diffs.append(f"{lab}: spark={a!r} oracle={b!r} rel={abs(a-b)/denom:.3g}")
        else:
            if int(sv) != int(dv):
                diffs.append(f"{lab}: spark={sv} oracle={dv}")
    return diffs


def run_one(name, q, spark, con, sf_dir) -> tuple[bool, str]:
    df = q.fn(spark, sf_dir)
    terms = _spark_checksum_exprs(df)
    labels = [lab for lab, _ in terms]
    srow = df.agg(*[col.alias(lab) for lab, col in terms]).collect()[0]
    svals = [srow[lab] for lab in labels]
    drow = con.execute(_duck_checksum_sql(q.oracle, df.schema)).fetchone()
    diffs = _compare(labels, svals, list(drow))
    opaque = [lab[7:] for lab in labels if lab.startswith("OPAQUE_")]
    note = f" (count-only cols: {','.join(opaque)})" if opaque else ""
    if diffs:
        return False, f"[CHECKSUM-MISMATCH] {name}: " + "; ".join(diffs[:6])
    return True, (
        f"[OK-CHECKSUM] {name}: count_star={svals[0]} "
        f"{len(labels) - 1} checksum terms equal{note}"
    )


def main() -> int:
    sf_dir = sys.argv[1]
    argv = sys.argv[2:]
    selftest = "--selftest" in argv
    names = [a for a in argv if not a.startswith("--")]

    from mapreduce_word2vec_spark.oracle import duckdb_connection
    from mapreduce_word2vec_spark.plans import catalog
    from mapreduce_word2vec_spark.session import get_spark

    spark = get_spark(
        app_name="checksum-gate",
        master="local[16]",
        shuffle_partitions=16,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # one query per invocation is the intended shape for probe
            # runs, but bound dead-shuffle retention anyway (iterative
            # plans at sf10 spill tens of GB; see GATE_SF10_r09 notes)
            "spark.cleaner.periodicGC.interval": "3min",
        },
    )
    con = duckdb_connection(sf_dir)
    import os

    memlimit = os.environ.get("ORACLE_GATE_DUCKDB_MEM")
    if memlimit:
        import atexit
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(prefix="duckdb_cksum_spill_")
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
        con.execute(f"SET memory_limit='{memlimit}'")
        con.execute(f"SET temp_directory='{tmp}'")
        print(f"# duckdb memory_limit={memlimit} temp_directory={tmp}")

    allq = catalog.all_queries()
    failures = 0
    for name in names:
        if name not in allq or allq[name].oracle is None:
            print(f"[ERROR] {name}: not an oracle-backed catalog name", flush=True)
            failures += 1
            continue
        q = allq[name]
        t0 = time.time()
        if selftest:
            ok, msg = run_one(name, q, spark, con, sf_dir)
            print(f"{msg}  ({time.time() - t0:.1f}s)", flush=True)
            if not ok:
                failures += 1
                continue
            # direction 2: the gate must FAIL against a perturbed oracle
            # (first output column of one row nudged via an injected CTE)
            df = q.fn(spark, sf_dir)
            import copy

            first = df.schema.fields[0].name
            from pyspark.sql import types as T

            if isinstance(df.schema.fields[0].dataType, T.StringType):
                mut = f"CASE WHEN rowid_ = 1 THEN \"{first}\" || '_x' ELSE \"{first}\" END"
            else:
                mut = f'CASE WHEN rowid_ = 1 THEN "{first}" + 1 ELSE "{first}" END'
            cols = ", ".join(
                f'"{f.name}"' if f.name != first else f'{mut} AS "{first}"'
                for f in df.schema.fields
            )
            mut_oracle = (
                f"WITH __orig AS ({q.oracle}), "
                f"__num AS (SELECT *, row_number() OVER () AS rowid_ FROM __orig) "
                f"SELECT {cols} FROM __num"
            )
            qm = copy.copy(q)
            object.__setattr__(qm, "oracle", mut_oracle) if hasattr(
                type(q), "__dataclass_fields__"
            ) else setattr(qm, "oracle", mut_oracle)
            ok2, msg2 = run_one(name + "(perturbed-oracle)", qm, spark, con, sf_dir)
            if ok2:
                print(f"[SELFTEST-FAIL] {name}: perturbed oracle NOT detected", flush=True)
                failures += 1
            else:
                print(f"[SELFTEST-OK] {name}: perturbation detected as expected", flush=True)
        else:
            try:
                ok, msg = run_one(name, q, spark, con, sf_dir)
            except Exception as e:
                ok, msg = False, f"[ERROR] {name}: {type(e).__name__}: {str(e)[:300]}"
            print(f"{msg}  ({time.time() - t0:.1f}s)", flush=True)
            if not ok:
                failures += 1
    print(f"\n{failures} failure(s)", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
