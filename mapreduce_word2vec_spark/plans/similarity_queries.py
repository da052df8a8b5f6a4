"""Similarity-search queries over ``embeddings`` (SURVEY §2.B
"Similarity search"; the reference's missing cosine feature,
feedback.md:5).

Oracle cosine uses the same formula shape as the Spark expressions
(sequential dot / (norm_a * norm_b) in double) and both sides round
to 6 dp, so rank boundaries and values agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_word2vec_spark.plans.catalog import register
from mapreduce_word2vec_spark.sources.readers import read_testdata

_SQL_DOT = (
    "list_sum(list_transform(range(1, len(qe) + 1), "
    "i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)))"
)
_SQL_NORM_Q = "sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_SQL_NORM_C = "sqrt(list_sum(list_transform(ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


@register(
    "knn_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
         s AS (
           SELECT query_id, neighbor_id,
                  {_SQL_DOT} / ({_SQL_NORM_Q} * {_SQL_NORM_C}) AS cos
           FROM q, c WHERE query_id <> neighbor_id
         ),
         r AS (
           SELECT query_id, neighbor_id, cos,
                  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
           FROM s
         )
    SELECT query_id, neighbor_id, round(cos, 6) AS cos FROM r WHERE rn <= 5
    """,
)
def knn_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors vec_id < 10."""
    from mapreduce_word2vec_spark.operators.similarity import knn_bruteforce

    emb = read_testdata(spark, sf_dir, "embeddings")
    out = knn_bruteforce(emb, emb.where(F.col("vec_id") < 10), k=5)
    return out.withColumn("cos", F.round("cos", 6))


@register(
    "knn_sign_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
             + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
             + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
             + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM b WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS ce, bucket FROM b),
    s AS (
      SELECT query_id, neighbor_id,
             {_SQL_DOT} / ({_SQL_NORM_Q} * {_SQL_NORM_C}) AS cos
      FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id
    ),
    r AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
      FROM s
    )
    SELECT query_id, neighbor_id, round(cos, 6) AS cos FROM r WHERE rn <= 5
    """,
)
def knn_sign_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bucket LSH top-5: deterministic approximate variant —
    same result contract as brute force but only within-bucket pairs."""
    from mapreduce_word2vec_spark.operators.similarity import knn_sign_lsh

    emb = read_testdata(spark, sf_dir, "embeddings")
    out = knn_sign_lsh(emb, emb.where(F.col("vec_id") < 10), k=5, n_bits=4)
    return out.withColumn("cos", F.round("cos", 6))


@register("knn_bruteforce_blas")
def knn_bruteforce_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLAS/mapInPandas top-5 — the 100 TB path. Same contract as
    knn_bruteforce; equality is asserted by a property test (float
    summation order differs, so no hash oracle)."""
    from mapreduce_word2vec_spark.operators.similarity import knn_bruteforce_numpy

    emb = read_testdata(spark, sf_dir, "embeddings")
    out = knn_bruteforce_numpy(emb, emb.where(F.col("vec_id") < 10), k=5)
    return out.withColumn("cos", F.round("cos", 6))


@register("brp_lsh_pairs")
def brp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH self-join (Euclidean < 1.2 —
    ~1st percentile of pairwise distance on the synthetic embeddings).
    Random projections → rows-only check + recall property test."""
    from mapreduce_word2vec_spark.operators.similarity import brp_lsh_neighbors

    emb = read_testdata(spark, sf_dir, "embeddings")
    return brp_lsh_neighbors(emb, threshold=1.2).withColumn("dist", F.round("dist", 6))


_SQL_CENTROID = """
    cent AS (
      SELECT label,
             list(avg_v ORDER BY i) AS ce
      FROM (
        SELECT label, i, avg(v) AS avg_v
        FROM (
          SELECT label,
                 unnest(range(1, len(embedding) + 1)) AS i,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings
        ) GROUP BY label, i
      ) GROUP BY label
    )
"""


@register(
    "knn_ivf_probe",
    oracle=f"""
    WITH {_SQL_CENTROID},
    q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
    qc AS (
      SELECT query_id, qe, label AS probe_label,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY list_sum(list_transform(range(1, len(qe) + 1),
                                 i -> CAST(qe[i] AS DOUBLE) * ce[i]))
                        / (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                           * sqrt(list_sum(list_transform(ce, x -> x * x)))) DESC,
                        label
             ) AS rn
      FROM q CROSS JOIN cent
    ),
    c AS (SELECT vec_id AS neighbor_id, embedding AS ce2, label FROM embeddings),
    s AS (
      SELECT query_id, neighbor_id,
             list_sum(list_transform(range(1, len(qe) + 1),
                      i -> CAST(qe[i] AS DOUBLE) * CAST(ce2[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(ce2, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
      FROM qc JOIN c ON qc.probe_label = c.label
      WHERE qc.rn = 1 AND qc.query_id <> c.neighbor_id
    ),
    r AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
      FROM s
    )
    SELECT query_id, neighbor_id, round(cos, 6) AS cos FROM r WHERE rn <= 5
    """,
)
def knn_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse quantizer = per-label centroids (label
    plays the cluster id — deterministic, so oracle-able, unlike a
    trained k-means); each query probes its nearest centroid's
    inverted list only. At scale the inverted lists are partitions
    co-located by cluster id, so a probe touches 1/K of the corpus."""
    from pyspark.sql import Window
    from mapreduce_word2vec_spark.functions.vectors import dot_expr, norm_expr

    emb = read_testdata(spark, sf_dir, "embeddings")

    # centroids: element-wise mean per label (posexplode → avg → pack)
    pos = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    cent = (
        pos.groupBy("label", "pos")
        .agg(F.avg("v").alias("mv"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mv"))).alias("pv"))
        .select(
            F.col("label").alias("probe_label"),
            F.transform("pv", lambda s: s.getField("mv")).alias("ce"),
        )
    )

    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        norm_expr("embedding").alias("qn"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("cent_cos"), "probe_label"
    )
    probed = (
        q.crossJoin(F.broadcast(cent))
        .withColumn(
            "cent_cos",
            dot_expr("qe", "ce") / (F.col("qn") * norm_expr("ce")),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") == 1)
        .select("query_id", "qe", "qn", "probe_label")
    )

    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce2"),
        norm_expr("embedding").alias("cn"),
        F.col("label").alias("probe_label"),
    )
    scored = (
        c.join(F.broadcast(probed), "probe_label")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot_expr("qe", "ce2") / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
        .withColumn("cos", F.round("cos", 6))
    )


@register(
    "emb_kmeans_iter",
    oracle="""
    WITH idx AS (SELECT unnest(range(1, 65)) AS i),
    seeds AS (
      SELECT label, i, avg(CAST(embedding[i] AS DOUBLE)) AS mv
      FROM embeddings CROSS JOIN idx
      GROUP BY label, i
    ),
    cent AS (SELECT label AS cid, list(mv ORDER BY i) AS ce FROM seeds GROUP BY label),
    assign AS (
      SELECT vec_id, embedding, cid,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY list_sum(list_transform(range(1, len(embedding) + 1),
                 i -> (CAST(embedding[i] AS DOUBLE) - ce[i])
                      * (CAST(embedding[i] AS DOUBLE) - ce[i]))) ASC, cid
             ) AS rn
      FROM embeddings CROSS JOIN cent
    )
    SELECT cid AS cluster_id, CAST(i - 1 AS INT) AS pos,
           round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS mean_val,
           count(*) AS n_members
    FROM assign CROSS JOIN idx
    WHERE rn = 1
    GROUP BY cid, i
    """,
)
def emb_kmeans_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of k-means over the embedding corpus —
    the coarse-quantizer training step IVF indexes are built from
    (knn_ivf_probe consumes the result): seed centroids = per-label
    means (deterministic → oracle-able), every vector assigned to its
    nearest seed by squared euclidean (sequential HOF fold, matching
    the oracle's list_sum order), then means recomputed per cluster.
    Scale shape: centroids BROADCAST (k rows — always tiny), the
    corpus is never shuffled for assignment; recomputation is one
    partial-aggregated exchange of (cluster, pos, sum) triples. Full
    training = loop this operator with the recomputed centroids, an
    iterative DataFrame algorithm like operators/graph.py connected
    components."""
    from pyspark.sql import Window

    emb = read_testdata(spark, sf_dir, "embeddings")
    pos = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    )
    cent = (
        pos.groupBy("label", "pos")
        .agg(F.avg("v").alias("mv"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mv"))).alias("pv"))
        .select(
            F.col("label").alias("cid"),
            F.transform("pv", lambda s: s.getField("mv")).alias("ce"),
        )
    )
    sqd = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("ce"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("sqd"), F.asc("cid"))
    assigned = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("sqd", sqd)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("cid").alias("cluster_id"), "embedding")
    )
    return (
        assigned.select(
            "cluster_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
        )
        .groupBy("cluster_id", "pos")
        .agg(
            F.round(F.avg("v"), 6).alias("mean_val"),
            F.count("*").alias("n_members"),
        )
    )
