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
