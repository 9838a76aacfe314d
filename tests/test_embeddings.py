"""Embedding-operator tests: PCA end-to-end from the distributed
Gramian, int8 quantization vs an independent numpy reference, and the
plan shapes that make both scale."""

from __future__ import annotations

import numpy as np
import pytest

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.embeddings import (
    q_embed_int8_quantize,
    q_embed_pca_gramian,
)

SF = "/root/testdata/sf0.001"


def _load_embeddings(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    M = np.vstack([np.asarray(r.embedding, np.float64) for r in rows])
    return ids, M


def test_gramian_matches_numpy(spark):
    _, M = _load_embeddings(spark)
    Q = np.floor(M * 1e6 + 0.5).astype(np.int64)
    expected = Q.T @ Q
    got = np.zeros_like(expected)
    for r in q_embed_pca_gramian(spark, SF).collect():
        got[r.dim_i, r.dim_j] = r.gram
        got[r.dim_j, r.dim_i] = r.gram
    np.testing.assert_array_equal(got, expected)


def test_gramian_partitioning_invariance(spark):
    """int64 addition is associative: the Gramian must be bit-identical
    under any repartitioning (the float version would not be)."""
    base = {(r.dim_i, r.dim_j): r.gram for r in q_embed_pca_gramian(spark, SF).collect()}
    import aws_glue_pyspark_incrementality_and_parallelism_spark.operators.embeddings as mod
    from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import load_table

    orig = mod.load_table
    try:
        mod.load_table = lambda sp, sf, t: orig(sp, sf, t).repartition(13)
        other = {
            (r.dim_i, r.dim_j): r.gram for r in q_embed_pca_gramian(spark, SF).collect()
        }
    finally:
        mod.load_table = orig
    assert base == other


def test_pca_from_gramian_invariants(spark):
    """The driver-side step the query feeds: eigh of the d×d Gramian.
    Checks the decomposition reconstructs G, the eigenbasis is
    orthonormal, and the top-8 subspace captures a sane share of total
    variance (trace)."""
    rows = q_embed_pca_gramian(spark, SF).collect()
    d = max(r.dim_j for r in rows) + 1
    G = np.zeros((d, d))
    for r in rows:
        G[r.dim_i, r.dim_j] = G[r.dim_j, r.dim_i] = float(r.gram)
    w, V = np.linalg.eigh(G)
    w, V = w[::-1], V[:, ::-1]
    assert (w >= -1e-3 * abs(w).max()).all()  # PSD up to fp noise
    np.testing.assert_allclose(V @ V.T, np.eye(d), atol=1e-9)
    np.testing.assert_allclose((V * w) @ V.T, G, rtol=1e-9)
    assert 0.0 < w[:8].sum() / w.sum() <= 1.0 + 1e-12
    # projecting the data onto the FULL basis preserves total variance
    _, M = _load_embeddings(spark)
    Q = np.floor(M * 1e6 + 0.5).astype(np.int64).astype(np.float64)
    proj = Q @ V
    np.testing.assert_allclose((proj**2).sum(), np.trace(G), rtol=1e-9)


def test_int8_quantize_matches_numpy(spark):
    ids, M = _load_embeddings(spark)
    Q = np.floor(M * 1e6 + 0.5).astype(np.int64)
    got = {r.vec_id: r for r in q_embed_int8_quantize(spark, SF).collect()}
    assert set(got) == set(ids.tolist())
    for vid, qv in zip(ids, Q):
        amax = int(np.abs(qv).max(initial=0))
        if amax == 0:
            qi = np.zeros_like(qv)
        else:
            mag = (2 * np.abs(qv) * 127 + amax) // (2 * amax)
            qi = np.sign(qv) * mag
        r = got[int(vid)]
        assert r.amax_micro == amax
        assert r.sum_q == int(qi.sum())
        assert r.sum_abs_q == int(np.abs(qi).sum())
        assert r.max_abs_err_scaled == int(np.abs(qv * 127 - qi * amax).max())
        assert r.within_int8
        # the error bound symmetric quantization promises: ≤ amax/2
        # in scaled units (half a quantization step)
        assert r.max_abs_err_scaled <= amax / 2 + 1


def test_int8_quantize_zero_vector_edge(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [0.4, -0.4, 0.0, 0.2])],
        "vec_id long, embedding array<float>",
    )
    import aws_glue_pyspark_incrementality_and_parallelism_spark.operators.embeddings as mod

    orig = mod.load_table
    try:
        mod.load_table = lambda sp, sf, t: df
        rows = {r.vec_id: r for r in q_embed_int8_quantize(spark, SF).collect()}
    finally:
        mod.load_table = orig
    assert rows[1].amax_micro == 0
    assert rows[1].sum_q == 0 and rows[1].max_abs_err_scaled == 0
    assert rows[1].within_int8
    # vec 2: amax=400000, q = [127, -127, 0, 64] (0.2 -> 63.5 rounds half-away to 64)
    assert rows[2].sum_q == 127 - 127 + 0 + 64


def test_int8_quantize_plan_is_scan_side(spark):
    """No Exchange, no Python worker: the quantization must compile to
    a projection over the parquet scan."""
    plan = q_embed_int8_quantize(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython / mapInPandas
    assert "Scan parquet" in plan or "FileScan" in plan


def test_gramian_shuffle_is_dimension_bounded(spark):
    """The only Exchange in the Gramian plan carries (dim_i, dim_j)
    partials — d(d+1)/2 rows per partition — never row-count-sized
    data: the scan-side mapInPandas is the map-side combine."""
    plan = q_embed_pca_gramian(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1
    # partial aggregation below the exchange
    assert "partial_sum" in plan or "Partial" in plan


def test_pq_codes_compress_and_recall(spark):
    """PQ: every vector compresses to M_SUB codes in [0, K_CODES);
    ADC+rerank recall vs exact brute force clears the driver floor
    with margin (measured 0.58-0.64 at sf0.001/0.01)."""
    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.pq import (
        K_CODES,
        M_SUB,
        PQ_RECALL_FLOOR,
        encode_codes,
        pq_adc_topk_pairs,
        train_codebooks,
    )
    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.similarity import (
        q_sim_brute_force_topk,
    )
    from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import load_table

    from .conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    books = train_codebooks(spark, SF_SMALL)
    assert books.shape == (M_SUB, K_CODES, 64 // M_SUB)

    codes = encode_codes(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes[:50]:
        assert len(r["codes"]) == M_SUB
        assert all(0 <= c < K_CODES for c in r["codes"])

    exact = {(r["query_id"], r["vec_id"]) for r in q_sim_brute_force_topk(spark, SF_SMALL).collect()}
    ann = {(r["query_id"], r["vec_id"]) for r in pq_adc_topk_pairs(spark, SF_SMALL).collect()}
    recall = len(exact & ann) / len(exact)
    assert recall >= PQ_RECALL_FLOOR + 0.1, recall
