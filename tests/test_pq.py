"""Product quantization (pq_train / pq_encode / pq_adc_scores /
pq_search): codebook shapes and determinism contract, encode
correctness against a local argmin replay, ADC ranking staying pure
JVM, and end-to-end recall vs the exact top-k."""
from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from qcache_spark.operators import similarity as sim

SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))


@pytest.fixture(scope="module")
def books(emb):
    return sim.pq_train(emb, m=4, n_codes=16, iters=1)


def test_pq_train_shapes(books):
    assert len(books) == 4
    assert all(len(b) == 16 for b in books)
    assert all(len(c) == 16 for b in books for c in b)  # dsub = 64/4


def test_pq_train_rejects_indivisible_dim(emb):
    with pytest.raises(ValueError):
        sim.pq_train(emb, m=5)  # 64 % 5 != 0


def test_pq_encode_matches_local_argmin(emb, books):
    got = {
        r["vec_id"]: list(r["codes"])
        for r in sim.pq_encode(emb, books).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    ids = [r[0] for r in rows]
    for s in range(4):
        C = np.asarray(books[s], dtype=np.float64)
        Xs = X[:, s * 16 : (s + 1) * 16]
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (Xs @ C.T)
        want = np.argmin(d2, axis=1)
        for i, vid in enumerate(ids):
            assert got[vid][s] == want[i], (vid, s)


def test_pq_encode_stores_exact_norm(emb, books):
    got = {r["vec_id"]: r["norm"] for r in sim.pq_encode(emb, books).collect()}
    for r in emb.select("vec_id", "embedding").limit(50).collect():
        v = np.asarray(list(r[1]), dtype=np.float64)
        assert got[r[0]] == pytest.approx(float(np.linalg.norm(v)), rel=1e-12)


def test_pq_adc_ranking_is_pure_jvm(spark, emb, books):
    # Materialize codes to parquet so the encode UDF is out of the
    # ranking lineage entirely, then assert the ADC scoring plan has
    # no Python stage and never reads the float column.
    path = tempfile.mkdtemp(prefix="qcache_spark_pq_codes_")
    try:
        sim.pq_encode(emb, books).write.mode("overwrite").parquet(path)
        codes = spark.read.parquet(path)
        qvec = list(
            emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
        )
        scored = sim.pq_adc_scores(codes, books, qvec)
        plan = scored._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "embedding" not in plan  # ranking reads codes + norm only
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_pq_search_recall_vs_exact(emb, books):
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    codes = sim.pq_encode(emb, books)
    ann = sim.pq_search(codes, emb, books, qvec, k=10, rerank=40)
    exact = sim.cosine_topk(emb, qvec, k=10)
    r = sim.recall_at_k(ann, exact)
    assert r >= 0.6, r
    # rerank stage re-scores exactly: every returned cosine must equal
    # the exact cosine for that id
    exact_all = {
        row["vec_id"]: row["cosine"]
        for row in sim.cosine_topk(emb, qvec, k=500).collect()
    }
    for row in ann.collect():
        assert row["cosine"] == pytest.approx(exact_all[row["vec_id"]], abs=1e-12)
