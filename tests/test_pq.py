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


def test_ivfpq_rejects_both_storages(emb):
    with pytest.raises(ValueError):
        sim.IVFIndex(emb, n_centroids=8, iters=1, store_int8=True, store_pq=True)


def test_ivfpq_search_lifecycle(spark, emb, tmp_path):
    """store_pq=True (IVF + PQ, the FAISS IVFPQ composition): the
    index persists m code ids + the exact norm beside the float
    vectors; search ranks the probed clusters' candidates from the
    CODES ONLY via the broadcast LUT, then exact-reranks the
    shortlist. Full-width rerank must equal the float index's top-k;
    appends encode with the PERSISTED codebooks; refit re-trains
    them."""
    fpath = str(tmp_path / "ivf_f32")
    ppath = str(tmp_path / "ivf_pq")
    params = dict(n_centroids=8, iters=1)
    sim.IVFIndex(emb, **params).write(spark, fpath)
    sim.IVFIndex(emb, store_pq=True, **params).write(spark, ppath)
    fidx = sim.IVFIndex.load(spark, fpath)
    pidx = sim.IVFIndex.load(spark, ppath)
    assert pidx.store_pq is True
    assert len(pidx.pq_codebooks) == 4 and len(pidx.pq_codebooks[0]) == 16
    qvec = list(emb.select("embedding").first()[0])
    n_all = emb.count()

    exact = [
        (r[0], round(r[1], 6))
        for r in fidx.search(qvec, k=10, n_probe=8).collect()
    ]
    # full-width rerank == exact
    assert [
        (r[0], round(r[1], 6))
        for r in pidx.search(qvec, k=10, n_probe=8, rerank=n_all).collect()
    ] == exact
    # default shortlist width: m=4 x 16-code books are a much coarser
    # approximation than SQ8's per-value codes, so the default-width
    # recall bar sits lower (7/10 measured for this query; widening
    # `rerank` is the recall knob, full width is exact per above)
    got = {r[0] for r in pidx.search(qvec, k=10, n_probe=8).collect()}
    assert len(got & {i for i, _ in exact}) >= 6

    # ranking scan reads codes + norm, never the float column
    plan = (
        pidx._live_assigned()
        .select("vec_id", "_pcodes", "_pnorm")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re
    m = re.search(r"ReadSchema: [^\n]*", plan)
    assert m and "embedding" not in m.group(0), m.group(0)

    # append: batch encoded with the persisted codebooks; search parity
    half = emb.filter(F.col("vec_id") % 2 == 0)
    apath = str(tmp_path / "ivf_pq_app")
    sim.IVFIndex(half, store_pq=True, **params).write(spark, apath)
    aidx = sim.IVFIndex.load(spark, apath)
    aidx.append(emb.filter(F.col("vec_id") % 2 == 1))
    assert "_pcodes" in aidx.assigned.columns
    full = aidx.search(qvec, k=10, n_probe=8, rerank=n_all)
    assert [(r[0], round(r[1], 6)) for r in full.collect()] == exact

    # refit: codebooks re-trained on the live corpus; search parity
    # with a fresh all-vector build (6-dp cosines, the q125 contract)
    report = aidx.refit()
    assert report["vectors"] == n_all
    assert aidx.pq_codebooks is not None
    assert [
        (r[0], round(r[1], 6))
        for r in aidx.search(qvec, k=10, n_probe=8, rerank=n_all).collect()
    ] == exact


def test_ivfpq_load_expect_mismatch(spark, emb, tmp_path):
    path = str(tmp_path / "ivf_pq_expect")
    sim.IVFIndex(emb, n_centroids=8, iters=1, store_pq=True).write(spark, path)
    with pytest.raises(sim.IVFIndexMismatch):
        sim.IVFIndex.load(spark, path, expect={"store_pq": False})
    idx = sim.IVFIndex.load(spark, path, expect={"store_pq": True, "pq_m": 4})
    assert idx.pq_m == 4 and idx.pq_codes == 16
