#!/usr/bin/env python
"""Deterministic synthetic-table generator for scale probes ABOVE the
driver-provided maximum (TESTDATA.md stops at sf0.1).

Reproduces the driver tables' schemas and measured generative
structure at an arbitrary scale factor so the full oracle gate can be
run at e.g. sf1 (10x the bench scale) — the round-6 scale-probe
directive. Every distribution below was measured from
/root/testdata/sf0.1 (2026-08-15):

- region/nation: fixed dims, copied verbatim from the source sf dir.
- customer/supplier: ``Customer#%09d`` names, nationkey ~ U{0..24},
  acctbal ~ U(-1000, 10000) rounded to cents, segment ~ U{5 values}.
- part: name = "<adj> <noun>" over 8x8 word lists, brand Brand#1-25,
  type ~ U{6}, size ~ U{1..50}, retailprice = 900 + (key % 1000)/10
  (exact functional dependence verified).
- orders: custkey ~ U{customers}, status ~ U{F,O,P}, totalprice ~
  U(1000, 500000), orderdate midnight-aligned ~ U{1995-01-01 ..
  2001-08-01}, priority ~ U{5}.
- lineitem: orderkey ~ U{orders} (lines-per-order is therefore
  Poisson(4), matching the measured histogram), linenumber ~ U{1..7}
  (independent — duplicates within an order exist in the source),
  quantity integer-valued U{1..50}, extendedprice ~ U(900, 105000),
  discount ~ {0.00..0.10}, tax ~ {0.00..0.08}, shipdate
  midnight-aligned ~ U{1995-01-02 .. 2001-11-04} (uncorrelated with
  orderdate in the source: measured deltas span -2399..+2496 days).
- events: ts ~ U over Jan 2024 sorted ascending with event_id the
  rank, user_id ~ U{15000*sf users}, type ~ U{5}, value ~ Exp(mean
  50) rounded to cents, props = '{"k": N}' with N ~ U{0..99}.
- documents: words ~ U{30-word vocab}, length ~ U{10..100}; ~5% of
  docs are near-duplicates of a base doc with each word replaced by
  the 'dup' token w.p. 1/54 (measured: 250 near-dup docs / 255 'dup'
  tokens per 5000 docs, Jaccard 0.79-1.0 to their partner); ~0.16%
  exact duplicate pairs; source = f"src{doc_id % 20}" (exact
  functional dependence verified); lang ~ {en .41, zh/fr/es .15,
  de .14}.
- embeddings: unit-normalized 64-d float32 around 10 label centroids
  (measured norms exactly 1.0, labels roughly balanced); count =
  max(500, 20000*sf) (matches sf0.01 -> 500, sf0.1 -> 2000).

Usage: python tools/gen_scale.py SF OUT_DIR [--source /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PART_ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
PART_NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PART_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
DOC_VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]

DAY_US = 86_400_000_000


def _ts_days(rng, n, start: str, end: str) -> pa.Array:
    """Midnight-aligned uniform timestamps in [start, end] (inclusive)."""
    lo = np.datetime64(start, "D").astype(np.int64)
    hi = np.datetime64(end, "D").astype(np.int64)
    days = rng.integers(lo, hi + 1, n)
    return pa.array(days * DAY_US, type=pa.timestamp("us"))


def _write(out: Path, name: str, table: pa.Table) -> None:
    pq.write_table(table, out / f"{name}.parquet")
    print(f"  {name}: {table.num_rows} rows", flush=True)


def generate(sf: float, out: Path, source: Path) -> None:
    out.mkdir(parents=True, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_line = int(6_000_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_user = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = max(500, int(20_000 * sf))

    # Fixed dims: identical at every sf — copy from the driver's data.
    for dim in ("region", "nation"):
        _write(out, dim, pq.read_table(source / f"{dim}.parquet"))

    rng = np.random.default_rng(42)
    k = np.arange(n_cust, dtype=np.int64)
    _write(out, "customer", pa.table({
        "c_custkey": k,
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    rng = np.random.default_rng(43)
    _write(out, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    rng = np.random.default_rng(44)
    pk = np.arange(n_part, dtype=np.int64)
    adj = np.array(PART_ADJS)[rng.integers(0, 8, n_part)]
    noun = np.array(PART_NOUNS)[rng.integers(0, 8, n_part)]
    _write(out, "part", pa.table({
        "p_partkey": pk,
        "p_name": pa.array([f"{a} {b}" for a, b in zip(adj, noun)]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PART_TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + (pk % 1000) * 0.1, 2),
    }))

    rng = np.random.default_rng(45)
    _write(out, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_days(rng, n_ord, "1995-01-01", "2001-08-01"),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    rng = np.random.default_rng(46)
    _write(out, "lineitem", pa.table({
        "l_orderkey": rng.integers(0, n_ord, n_line),
        "l_partkey": rng.integers(0, n_part, n_line),
        "l_suppkey": rng.integers(0, n_supp, n_line),
        "l_linenumber": rng.integers(1, 8, n_line).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_line).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_line), 2),
        "l_discount": rng.integers(0, 11, n_line) / 100.0,
        "l_tax": rng.integers(0, 9, n_line) / 100.0,
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_line)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_line)]),
        "l_shipdate": _ts_days(rng, n_line, "1995-01-02", "2001-11-04"),
    }))

    rng = np.random.default_rng(47)
    lo = np.datetime64("2024-01-01", "us").astype(np.int64)
    hi = np.datetime64("2024-01-31", "us").astype(np.int64)
    ts = np.sort(rng.integers(lo, hi, n_evt))
    _write(out, "events", pa.table({
        "event_id": np.arange(n_evt, dtype=np.int64),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": rng.integers(0, n_user, n_evt),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]),
        "value": np.round(rng.exponential(50.0, n_evt), 2),
        "props": pa.array([f'{{"k": {i}}}' for i in rng.integers(0, 100, n_evt)]),
    }))

    rng = np.random.default_rng(48)
    n_near = int(round(n_doc * 0.05))
    n_exact = int(round(n_doc * 0.0016))
    n_base = n_doc - n_near - n_exact
    vocab = np.array(DOC_VOCAB)
    lengths = rng.integers(10, 101, n_base)
    docs = [vocab[rng.integers(0, len(vocab), ln)].tolist() for ln in lengths]
    for i in rng.integers(0, n_base, n_near):  # near-dups: ~1 'dup' token each
        words = list(docs[i])
        mask = rng.random(len(words)) < (1.0 / 54.0)
        docs.append(["dup" if m else w for w, m in zip(words, mask)])
    for i in rng.integers(0, n_base, n_exact):  # exact duplicate pairs
        docs.append(list(docs[i]))
    order = rng.permutation(n_doc)
    texts = [" ".join(docs[i]) for i in order]
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(LANGS, n_doc, p=LANG_P)),
        "source": pa.array([f"src{i % 20}" for i in range(n_doc)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    rng = np.random.default_rng(49)
    centroids = rng.normal(size=(10, 64))
    labels = rng.integers(0, 10, n_emb)
    vecs = centroids[labels] + rng.normal(scale=0.6, size=(n_emb, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": labels.astype(np.int32),
    }))

    (out / "GENERATED.json").write_text(json.dumps({
        "sf": sf, "seed_base": 42, "generator": "tools/gen_scale.py",
        "rows": {"customer": n_cust, "supplier": n_supp, "part": n_part,
                 "orders": n_ord, "lineitem": n_line, "events": n_evt,
                 "documents": n_doc, "embeddings": n_emb},
    }, indent=1) + "\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf", type=float)
    ap.add_argument("out", type=Path)
    ap.add_argument("--source", type=Path, default=Path("/root/testdata/sf0.1"))
    a = ap.parse_args()
    print(f"generating sf{a.sf} into {a.out}", flush=True)
    generate(a.sf, a.out, a.source)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
