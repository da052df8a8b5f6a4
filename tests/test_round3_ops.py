"""Semantic invariants of the round-3 session operators — properties
the hash oracles can't express (idempotence, monotonicity,
conservation)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreduce_word2vec_spark.plans import catalog
from tests.conftest import SF_SMOKE


def _q(spark, name):
    return catalog.queries()[name](spark, SF_SMOKE)


def test_url_canonicalization_conserves_documents(spark):
    out = _q(spark, "dedup_url_canonical")
    agg = out.agg(
        F.sum("n_docs").alias("docs"), F.sum("n_raw_variants").alias("variants")
    ).head()
    n_docs = (
        catalog.queries()["doc_wordcount"]  # any docs-backed query's source
        and spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    )
    assert agg["docs"] == n_docs  # every document lands in exactly one group
    assert agg["variants"] <= agg["docs"]
    # survivor belongs to its group's id range
    bad = out.where(F.col("survivor_doc") < 0).count()
    assert bad == 0


def test_paragraph_dedup_conservation(spark):
    out = _q(spark, "dedup_paragraphs")
    row = out.agg(
        F.sum("n_paras").alias("total"), F.sum("n_kept").alias("kept")
    ).head()
    assert 0 < row["kept"] <= row["total"]
    # kept_frac consistent with counts
    bad = out.where(
        F.abs(F.col("kept_frac") - F.col("n_kept") / F.col("n_paras")) > 1e-6
    ).count()
    assert bad == 0


def test_survival_km_monotone(spark):
    rows = _q(spark, "events_survival_km").orderBy("duration_hours").collect()
    surv = [r["survival"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))  # non-increasing
    risk = [r["n_at_risk"] for r in rows]
    assert all(a >= b for a, b in zip(risk, risk[1:]))
    assert rows[0]["n_at_risk"] == sum(r["n_failed"] + r["n_censored"] for r in rows)


def test_rate_limit_bounds(spark):
    out = _q(spark, "events_rate_limit_audit")
    assert out.where(F.col("n_rejected") > F.col("n_events")).count() == 0
    assert out.where(
        (F.col("tokens_left") < 0) | (F.col("tokens_left") > 10.0)
    ).count() == 0


def test_neyman_allocation_spends_budget(spark):
    rows = _q(spark, "sample_stratified_neyman").collect()
    total_alloc = sum(r["alloc_n"] for r in rows)
    # floor(x + .5) rounding drifts at most 1 per stratum
    assert abs(total_alloc - 1000) <= len(rows)
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["n_pop"]


def test_pair_batches_capacity_and_conservation(spark):
    out = _q(spark, "multimodal_pair_batches")
    assert out.where(F.col("n_pairs") > 16).count() == 0
    total = out.agg(F.sum("n_pairs")).head()[0]
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert total == emb
    # the audit flag is consistent with the label counts
    assert out.where(
        F.col("has_false_negative") != (F.col("n_pairs") > F.col("n_labels"))
    ).count() == 0


def test_class_balancing_is_balanced(spark):
    rows = _q(spark, "sample_class_balanced").collect()
    kept = {r["n_kept"] for r in rows}
    assert len(kept) == 1  # every class downsampled to the same size
    assert kept.pop() == min(r["n_pop"] for r in rows)


def test_window_funnel_depth_consistent_with_timestamps(spark):
    out = _q(spark, "events_window_funnel")
    bad = out.where(
        ((F.col("funnel_depth") >= 1) != F.col("t_view_us").isNotNull())
        | ((F.col("funnel_depth") >= 2) != F.col("t_click_us").isNotNull())
        | ((F.col("funnel_depth") == 3) != F.col("t_purchase_us").isNotNull())
    ).count()
    assert bad == 0


def test_bpe_fertility_mean_at_least_one(spark):
    rows = _q(spark, "tokenizer_bpe_fertility").collect()
    occ = sum(r["n_occurrences"] for r in rows)
    weighted = sum(r["n_subwords"] * r["n_occurrences"] for r in rows)
    assert weighted >= occ  # >= 1 subword per occurrence


def test_benford_chi2_terms_nonnegative_and_shares_sum(spark):
    rows = _q(spark, "orders_benford").collect()
    assert all(r["chi2_term"] >= 0 for r in rows)
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-4


def test_psi_drift_nonnegative(spark):
    rows = _q(spark, "emb_drift_psi").collect()
    # PSI is a symmetrized KL — strictly nonnegative
    assert all(r["psi"] >= -1e-9 for r in rows)
    assert len(rows) == 8


def test_compaction_groups_cover_all_files(spark):
    out = _q(spark, "layout_compaction_plan")
    import duckdb

    n_dates = duckdb.sql(
        f"select count(distinct l_shipdate) from '{SF_SMOKE}/lineitem.parquet'"
    ).fetchone()[0]
    assert out.agg(F.sum("n_files")).head()[0] == n_dates


def test_id_gaps_match_naive_global_lead(spark):
    """The binned two-level scheme equals the naive global lead()."""
    from pyspark.sql import Window

    got = {
        (r["gap_start"], r["gap_end"])
        for r in _q(spark, "orders_id_gaps").collect()
    }
    keys = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
    )
    w = Window.orderBy("k")
    naive = {
        (r["k"] + 1, r["nxt"] - 1)
        for r in keys.select("k", F.lead("k").over(w).alias("nxt"))
        .where(F.col("nxt") > F.col("k") + 1)
        .collect()
    }
    assert got == naive
