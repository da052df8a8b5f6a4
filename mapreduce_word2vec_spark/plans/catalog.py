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

# The driver's CORRECTNESS check covers only the FIRST 50 registrations
# (CORRECTNESS_r01.json is exactly the first 50 in catalog order), so
# registration order is verification budget. Round 1 spent the window
# on text+relational; this list rotates the window for round 2 onto the
# 50 oracle-backed queries that have no driver row yet — one green row
# per §2.B family representative (relational gaps, embedding,
# similarity, dedup, streaming, multimodal, UDF, sources) plus the
# re-checks for this round's fixes (scalar_math, events_retention,
# dedup_embedding_cosine). Everything not listed keeps its original
# registration order behind these; queries verified in an earlier
# round stay registered (and pytest-gated) but yield their slot.
_PRIORITY = (
    # relational queries with no round-1 driver row + the scalar_math fix
    "scalar_math",
    "join_right_outer",
    "agg_percentile",
    "sort_nulls_ordering",
    "array_functions",
    "map_functions",
    "scalar_misc",
    "pivot_status",
    "subquery_in_exists",
    "merge_upsert",
    "udtf_split_priority",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_volume",
    "q19_disjunctive",
    # embedding ops
    "emb_label_mean",
    "emb_normalize",
    "emb_quantize",
    # similarity search
    "knn_bruteforce",
    "knn_sign_lsh",
    "knn_ivf_probe",
    # dedup / corpus safety
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "dedup_survivors",
    "dedup_ngram_spans",
    "doc_redact_pii",
    "doc_contamination",
    # streaming (batch-mode oracles)
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_dedup_first",
    "stream_interval_join",
    "stream_cumulative",
    "events_funnel",
    "events_retention",
    # multimodal
    "multimodal_meta",
    "multimodal_decode",
    # UDF surface
    "udf_scalar_pandas",
    "udf_grouped_agg",
    "udf_grouped_map",
    # source round-trips
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "source_text_lines",
    # deterministic stratified sampling (new this round)
    "sample_stratified_hash",
)

# Round-3 rotation plan: once CORRECTNESS_r02 lands green for the
# window above, swap the verified names out and promote the round-2
# additions that have oracles but no driver row yet, e.g.:
#   hybrid_search_rrf, dedup_semantic_clustered, emb_pq_quantize,
#   knn_pq_adc, doc_top_terms_per_source, doc_inverted_index,
#   corpus_report, diff_snapshots, agg_mad, agg_mode,
#   events_compact_last, events_anomaly_zscore,
#   events_latency_percentiles, multimodal_audio_windows,
#   multimodal_resize, source_orc_roundtrip, source_schema_evolution,
#   graph_triangles, q12_priority_delay, q21_late_suppliers,
#   merge_scd2, join_range, sample_mixture_epochs,
#   select_token_budget, incr_agg_merge, emb_kmeans_iter,
#   graph_pagerank, agg_hll_sketch, doc_chunking, doc_packing,
#   doc_unigram_logprob, doc_bigram_logprob, events_resample_ffill,
#   source_partitioned_roundtrip, q7/q8/q13/q15/q17/q22,
#   dedup_lsh_eval, knn_ivf_pq, multimodal_dedup_phash,
#   skew_salted_join, corpus_report, graph_triangles,
#   q2_min_cost_supplier, q9_product_type_profit, q11_important_stock,
#   q16_supplier_part_counts, q20_promotion_suppliers,
#   doc_gopher_filter, doc_contamination_fuzzy, select_dsir_weights,
#   doc_perplexity_bucket, dedup_containment, sample_source_cap,
#   doc_char_entropy, stream_topk_trending, emb_matryoshka_truncate,
#   knn_matryoshka_cascade, sample_temperature, source_csv_malformed,
#   pipeline_pretrain_mix, doc_pmi_collocations, corpus_zipf_slope,
#   udf_map_in_arrow, multimodal_shard_layout, join_asof_forward,
#   window_distinct_cumulative, events_session_funnel,
#   doc_keywords_topk, emb_dim_variance, basket_part_lift,
#   customer_rfm_segments, orders_cohort_ltv, emb_power_iteration,
#   events_gap_distribution, doc_ngram_novelty, merge_delete_apply,
#   emb_anisotropy, doc_length_histogram, events_json_key_agg,
#   window_moving_median, dedup_split_leakage,
#   supplier_concentration_hhi, events_disorder, orders_backlog_curve,
#   dedup_cluster_sizes, customer_order_streaks,
#   events_markov_transitions, customer_pareto_deciles, events_dau_wau,
#   multimodal_payload_hash_dedup, corpus_vocab_stats,
#   events_error_bursts, orders_mom_growth, events_time_to_convert,
#   agg_approx_topk_words.
# Keep one green sentinel per family in the window so regressions in
# already-verified families still surface.


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str, _fn: QueryFn = fn) -> DataFrame:
            # Ship this package to executor Python workers so queries
            # using pandas UDFs work from any driver cwd/deployment.
            from mapreduce_word2vec_spark.runtime import (
                ensure_workers_can_import,
                release_tracked,
            )

            ensure_workers_can_import(spark)
            # Release the PREVIOUS query's operator-level caches
            # (shingle/signature tables): their lifetime ends when a
            # new catalog query starts, so repeated catalog/bench runs
            # in one session don't accumulate cached tables until LRU
            # eviction pressure hits unrelated queries.
            release_tracked()
            # Timestamp results must be comparable against a TZ-naive
            # oracle regardless of how the caller built its session;
            # likewise the engine's documented classic-SQL semantics
            # (permissive casts, null on bad index) must hold even if
            # the caller's session left Spark 4's ANSI default on.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.ansi.enabled", "false")
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
    ordered = {n: _REGISTRY[n] for n in _PRIORITY if n in _REGISTRY}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
