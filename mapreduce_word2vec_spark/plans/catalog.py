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
    module: str = ""  # defining plans module (family, for coverage tests)


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

# The driver's CORRECTNESS check covers only the FIRST 50
# registrations, so registration order is verification budget. Rounds
# 1-8 verified 367 distinct queries driver-green (r8 window: 50/50,
# sixth consecutive all-green window). This round-9 window executes
# the rotation plan recorded in round 8: every r8-green name yields
# its slot; the window is the next 47 never-driver-tested names in
# the planned order (all oracle-backed — the 6 remaining rows-only
# names sit in the round-10 close-out) plus three green sentinels,
# rotated this round onto the three families with no row among the
# 47 (similarity, sources, udf; r6 used text/dedup/source, r7 used
# relational/similarity/streaming, r8 used embedding/multimodal/udf)
# so sentinel coverage itself keeps sweeping the catalog. Queries
# verified in an earlier round stay registered (and pytest-gated) but
# yield their slot.
_PRIORITY = (
    # --- next never-driver-tested names, planned order (47) ---
    "agg_approx_topk_words",
    "fuzzy_name_pairs",
    "unpivot_lineitem",
    "subquery_scalar",
    "skew_salted_agg",
    "skew_salted_join",
    "merge_delete_apply",
    "diff_snapshots",
    "agg_mode",
    "window_distinct_cumulative",
    "window_moving_median",
    "basket_part_lift",
    "customer_rfm_segments",
    "orders_cohort_ltv",
    "supplier_concentration_hhi",
    "orders_backlog_curve",
    "customer_order_streaks",
    "customer_pareto_deciles",
    "orders_mom_growth",
    "emb_norm_stats",
    "emb_dim_variance",
    "emb_power_iteration",
    "emb_anisotropy",
    "emb_kmeans_iter",
    "dedup_lsh_eval",
    "doc_ngram_novelty",
    "dedup_cluster_sizes",
    "events_resample_ffill",
    "events_compact_last",
    "events_anomaly_zscore",
    "incr_agg_merge",
    "events_latency_percentiles",
    "events_session_funnel",
    "events_gap_distribution",
    "events_json_key_agg",
    "events_disorder",
    "events_markov_transitions",
    "events_error_bursts",
    "events_time_to_convert",
    "multimodal_audio_windows",
    "multimodal_resize",
    "multimodal_shard_layout",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    # --- green sentinels (regression tripwires, rotated each round so
    # sentinel coverage itself sweeps families: r6 used doc_wordcount/
    # dedup_exact/source_csv_roundtrip, r7 used q1_pricing_summary/
    # knn_bruteforce/stream_tumbling, r8 used emb_drift_psi/
    # multimodal_tar_index/udtf_split_priority) ---
    "knn_bruteforce",
    "source_csv_roundtrip",
    "udf_scalar_pandas",
)

# Round-10 rotation plan: once CORRECTNESS_r09 lands green, swap the
# verified names out and promote the FINAL 15 backlog names (the only
# catalog names never driver-tested after r9: 9 oracle-backed + 6
# rows-only; see ROWS_ONLY.md for each rows-only name's driver-green
# value-checked contract twin):
# q22_prospect_customers, agg_mad, q12_priority_delay,
# q21_late_suppliers, ref_pipeline_documents, w2v_synonyms,
# doc_embedding_knn, emb_pairwise_cos_histogram, knn_bruteforce_blas,
# brp_lsh_pairs, dedup_mllib_minhash, events_ohlc_bars,
# events_time_weighted_avg, events_heatmap_dow_hour, multimodal_frames
# — that leaves 35 window slots: fill with green sentinels sweeping
# every family (the full catalog will then be driver-green, and from
# r11 the window becomes a pure rotating regression tripwire).
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
        _REGISTRY[name] = Query(
            name, wrapped, oracle, (fn.__doc__ or "").strip(), fn.__module__
        )
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
