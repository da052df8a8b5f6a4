"""Physical-plan shape assertions — the scale contract (SURVEY §4).

These tests pin the plan properties that keep the engine viable at
100 TB: filters reach the parquet scan, column pruning holds, small
dims broadcast, global top-k avoids a full sort, and aggregations are
partial+final. A regression here is a performance bug even when
results stay correct."""

from __future__ import annotations

from mapreduce_word2vec_spark.plans import catalog
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = catalog.queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_partial_agg(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "partial_sum" in plan
    # column pruning: o_comment-like unused columns must not be read
    assert "l_orderkey" not in plan.split("FileScan")[1].split("ReadSchema")[0]


def test_q5_broadcasts_all_dimensions(spark):
    plan = _plan(spark, "q5_local_supplier")
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan
    # region filter reaches its scan
    assert "EqualTo(r_name,ASIA)" in plan


def test_sort_limit_is_top_k_not_global_sort(spark):
    plan = _plan(spark, "sort_limit")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_q3_top10_via_take_ordered(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "TakeOrderedAndProject(limit=10" in plan


def test_wordcount_single_exchange(spark):
    plan = _plan(spark, "doc_wordcount")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan


def test_semi_anti_join_operators(spark):
    assert "LeftSemi" in _plan(spark, "join_semi")
    assert "LeftAnti" in _plan(spark, "join_anti")


def test_asof_join_is_single_shuffle_no_join(spark):
    """The as-of join must stay union+window: one hash exchange on the
    key, zero join operators (a range-join formulation would explode)."""
    plan = _plan(spark, "join_asof")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_q14_broadcasts_part_and_pushes_shipdate(spark):
    plan = _plan(spark, "q14_promo_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_q19_stays_hash_join_on_partkey(spark):
    """Catalyst must extract the common equi-condition from the OR of
    conjunctions — a nested-loop/cartesian plan here is a scale bug."""
    plan = _plan(spark, "q19_disjunctive")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_merge_upsert_broadcast_anti_join(spark):
    """Small-batch MERGE must never shuffle the target table."""
    plan = _plan(spark, "merge_upsert")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_unpivot_is_narrow(spark):
    assert "Exchange" not in _plan(spark, "unpivot_lineitem")


def test_split_assignment_is_narrow(spark):
    """Hash-mod sampling/splits must be shuffle-free scans."""
    assert "Exchange" not in _plan(spark, "split_train_val_test")
    assert "Exchange" not in _plan(spark, "sample_hash_mod")


def test_curation_pipeline_single_shuffle(spark):
    """Whole curation pass = one exchange (the fingerprint dedup
    window); the text column must not survive past the first project."""
    plan = _plan(spark, "pipeline_curation")
    assert plan.count("Exchange hashpartitioning") == 1


def test_fuzzy_pairs_no_cartesian(spark):
    plan = _plan(spark, "fuzzy_name_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_spans_partial_aggregation(spark):
    """Singleton spans must die map-side (partial count before the
    exchange) — at corpus scale the shuffle carries only span counts,
    and the HAVING filter runs post-merge."""
    plan = _plan(spark, "dedup_ngram_spans")
    assert "partial_count" in plan
    assert plan.count("Exchange hashpartitioning") == 1
