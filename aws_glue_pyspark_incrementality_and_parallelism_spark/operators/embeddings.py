"""Embedding-matrix operators for training-data pipelines (SURVEY §2.8 E3+).

Two pipeline stages ANN/dedup don't cover:

- ``embed_pca_gramian`` — the distributed half of PCA: the d×d Gramian
  (sum of per-vector outer products) computed as one int64 GEMM per
  partition, so only O(#partitions · d²) tiny rows ever shuffle. The
  eigendecomposition of a 64×64 matrix is driver-side control-plane
  (pytest covers that step); the O(n·d²) work is what needs a cluster.
- ``embed_int8_quantize`` — symmetric per-vector int8 quantization
  (the storage format vector stores ship) with exact integer error
  accounting, entirely in JVM-side array HOFs: no Python worker, no
  shuffle, one linear scan.

Cross-engine exactness uses the repo-wide micro-unit rule: quantize via
``floor(double(x)·1e6 + 0.5)`` (the one float→int rule Spark and DuckDB
compute identically), then pure int64 algebra on both engines.

Reference parity note: the reference ETL (`glue_rds_to_redshift.py`)
has no vector operations; this module belongs to the driver-mandated
LLM-pipeline extension (BASELINE.json:6).

100 TB design: the Gramian's shuffle volume is independent of row
count — each task reduces its slice to one d×d partial locally (the
same map-side-combine shape Spark's own ``Summarizer`` uses), and the
final groupBy moves #partitions·d(d+1)/2 rows. Quantization is
embarrassingly parallel and pushes down to a projection over the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..session import pickle_module_by_value
from ..sources.io import load_table


#: The module's two exactness-critical expressions, defined ONCE: every
#: operator that quantizes embeddings or folds an int64 dot product uses
#: these — a scale change in one place changes all of them together.
MICROQUANT_EXPR = (
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)"
    " AS BIGINT))"
)


def microquant() -> F.Column:
    """Micro-unit quantization of the ``embedding`` column (the
    floor(x*1e6+0.5) rule both engines compute identically)."""
    return F.expr(MICROQUANT_EXPR)


def int_dot(a: str, b: str, ndims: int) -> F.Column:
    """Exact int64 dot product of two quantized array columns over the
    first ``ndims`` dimensions."""
    return F.expr(
        f"aggregate(sequence(0, {ndims - 1}), CAST(0 AS BIGINT),"
        f" (acc, i) -> acc + element_at({a}, i + 1) * element_at({b}, i + 1))"
    )


@query(
    "embed_pca_gramian",
    oracle="""
    WITH q AS (
      SELECT list_transform(
               embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             ) AS qv
      FROM embeddings
    ),
    pairs AS (
      SELECT CAST(i AS INT) AS dim_i, CAST(j AS INT) AS dim_j
      FROM range(0, 64) t1(i), range(0, 64) t2(j)
      WHERE i <= j
    )
    SELECT dim_i, dim_j,
           CAST(SUM(qv[dim_i + 1] * qv[dim_j + 1]) AS BIGINT) AS gram
    FROM q, pairs
    GROUP BY dim_i, dim_j
    """,
)
def q_embed_pca_gramian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed exact Gramian G = Σ_v q(v)·q(v)ᵀ over micro-unit
    quantized embeddings: each partition reduces to ONE int64 d×d
    partial inside mapInPandas (a single numpy GEMM over the whole
    partition — the map-side combine), then a groupBy sums the
    #partitions·2080 upper-triangle rows. PCA's covariance eigenbasis
    follows driver-side from this d×d result (see
    ``tests/test_embeddings.py`` for the eigh step and its invariants);
    the oracle recomputes every cell with the identical integer algebra.

    Why exact integers: Spark's distributed float summation order is
    nondeterministic and diverges from DuckDB's serial sum in the last
    ulp; int64 addition is associative, so the Gramian is bit-exact at
    any partitioning and any SF. Overflow headroom: |q| ≲ 4e6 ⇒ a cell
    needs ~5e8 rows per PARTITION to approach int64 range."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull()).select("embedding")

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.vstack([np.asarray(v, np.float64) for v in pdf["embedding"]])
            Q = np.floor(M * 1e6 + 0.5).astype(np.int64)
            g = Q.T @ Q  # int64 GEMM: exact
            acc = g if acc is None else acc + g
        if acc is None:
            return
        iu = np.triu_indices(acc.shape[0])
        yield pd.DataFrame(
            {"dim_i": iu[0].astype("int32"), "dim_j": iu[1].astype("int32"),
             "partial": acc[iu]}
        )

    partials = emb.mapInPandas(_partial, schema="dim_i int, dim_j int, partial long")
    return partials.groupBy("dim_i", "dim_j").agg(F.sum("partial").alias("gram"))


@query(
    "embed_int8_quantize",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(
               embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             ) AS qv
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    a AS (
      SELECT vec_id, qv,
             COALESCE(list_max(list_transform(qv, v -> abs(v))), 0) AS amax
      FROM q
    ),
    t AS (
      SELECT vec_id, qv, amax,
             list_transform(qv, v -> CASE
               WHEN amax = 0 THEN 0
               WHEN v >= 0 THEN (2 * v * 127 + amax) // (2 * amax)
               ELSE -((2 * (-v) * 127 + amax) // (2 * amax)) END) AS qi
      FROM a
    )
    SELECT vec_id,
           CAST(amax AS BIGINT) AS amax_micro,
           CAST(list_sum(qi) AS BIGINT) AS sum_q,
           CAST(list_sum(list_transform(qi, v -> abs(v))) AS BIGINT) AS sum_abs_q,
           CAST(list_max(
             list_transform(range(1, len(qv) + 1),
                            i -> abs(qv[i] * 127 - qi[i] * amax))
           ) AS BIGINT) AS max_abs_err_scaled,
           list_max(list_transform(qi, v -> abs(v))) <= 127 AS within_int8
    FROM t
    """,
)
def q_embed_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization q_i = round(127·x_i / max|x|) with
    round-half-away-from-zero done in EXACT integer arithmetic
    ((2·v·127 + amax) DIV (2·amax), sign-split because engines disagree
    on negative integer division), entirely in JVM array HOFs —
    transform / aggregate-free max / zip_with — so the hot path is
    whole-stage codegen over the scan with zero Python and zero
    shuffle. Emits the per-vector scale, quantized-sum fingerprints,
    and the worst absolute dequantization error in exact scaled units
    (|q_micro·127 − q_i·amax|, i.e. error × 127×10⁶); ``within_int8``
    pins that symmetric quantization can never leave [-127, 127]."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull()).select("vec_id", "embedding")
    qv = microquant()
    step = emb.select("vec_id", qv.alias("qv")).select(
        "vec_id",
        "qv",
        F.coalesce(
            F.array_max(F.expr("transform(qv, v -> abs(v))")), F.lit(0).cast("long")
        ).alias("amax"),
    )
    step = step.withColumn(
        "qi",
        F.expr(
            """transform(qv, v -> CASE
                 WHEN amax = 0 THEN 0L
                 WHEN v >= 0 THEN (2 * v * 127 + amax) DIV (2 * amax)
                 ELSE -((2 * (-v) * 127 + amax) DIV (2 * amax)) END)"""
        ),
    )
    return step.select(
        "vec_id",
        F.col("amax").alias("amax_micro"),
        F.expr("aggregate(qi, 0L, (acc, v) -> acc + v)").alias("sum_q"),
        F.expr("aggregate(qi, 0L, (acc, v) -> acc + abs(v))").alias("sum_abs_q"),
        F.array_max(
            F.expr("zip_with(qv, qi, (v, w) -> abs(v * 127 - w * amax))")
        ).alias("max_abs_err_scaled"),
        (F.array_max(F.expr("transform(qi, v -> abs(v))")) <= F.lit(127)).alias(
            "within_int8"
        ),
    )


# The Gramian partials run inside mapInPandas workers: ship by value so
# executors never need the package on their own sys.path.
pickle_module_by_value(__name__)


@query(
    "embed_random_projection",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               [CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                FOR x IN embedding] AS qv
        FROM embeddings WHERE vec_id < 100 AND embedding IS NOT NULL
    ), proj AS (
        SELECT vec_id,
               [list_sum([qv[i + 1] *
                          (1 - 2 * (CAST(('0x' || substr(md5(i || ':' || j), 1, 2))
                                         AS INTEGER) % 2))
                          FOR i IN range(0, 64)])
                FOR j IN range(0, 16)] AS yv,
               qv
        FROM q
    )
    SELECT vec_id, array_to_string(yv, ',') AS projected_micro,
           CAST(list_sum([y * y FOR y IN yv]) // 64 AS BIGINT) AS y_norm2_scaled,
           CAST(list_sum([v * v FOR v IN qv]) AS BIGINT) AS x_norm2
    FROM proj
    ORDER BY vec_id
    """,
)
def q_embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection 64 → 16 dims with a
    deterministic ±1 (Rademacher) matrix derived from md5(i:j) parity —
    the cheap dimensionality reduction that preserves pairwise
    distances within (1±ε) and needs NO trained state.

    Exactness: vectors quantize to micro-units first, the projection
    matrix entries are ±1, so every projected coordinate is an exact
    int64 dot product both engines reproduce bit-for-bit (the md5
    parity IS the matrix — nothing is stored or shipped). The emitted
    ``y_norm2_scaled`` = |y|²/d pairs with ``x_norm2`` to exhibit the
    JL norm-preservation ratio E[|y|²/d] = |x|².

    Scale shape: pure per-row map work (array HOFs, zero shuffle,
    bounded ground-truth slice here); at 100 TB the same expression
    runs as a projection over the scan — the hash-derived matrix means
    no broadcast grows with either dimension.
    """
    emb = (
        load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
        .filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            microquant().alias("qv"),
        )
    )
    proj = emb.select(
        "vec_id",
        "qv",
        F.expr(
            """
            transform(sequence(0, 15), j ->
                aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, i) ->
                    acc + element_at(qv, i + 1) *
                    (1 - 2 * (CAST(conv(substring(md5(concat(CAST(i AS STRING), ':',
                                                             CAST(j AS STRING))), 1, 2),
                                        16, 10) AS INT) % 2))))
            """
        ).alias("yv"),
    )
    return proj.select(
        "vec_id",
        # CSV-join the 16 exact projections: output columns stay scalar so
        # any downstream pandas canonicalizer can sort/hash every cell.
        F.array_join(
            F.transform(F.col("yv"), lambda y: y.cast("string")), ","
        ).alias("projected_micro"),
        F.expr(
            "CAST(aggregate(yv, CAST(0 AS BIGINT), (acc, y) -> acc + y * y) div 64"
            " AS BIGINT)"
        ).alias("y_norm2_scaled"),
        F.expr("CAST(aggregate(qv, CAST(0 AS BIGINT), (acc, v) -> acc + v * v) AS BIGINT)").alias(
            "x_norm2"
        ),
    ).orderBy("vec_id")


@query(
    "embed_matryoshka_recall",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               [CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                FOR x IN embedding] AS qv
        FROM embeddings WHERE embedding IS NOT NULL
    ), queries AS (
        SELECT vec_id AS qid, qv FROM q WHERE vec_id < 20
    ), pairs AS (
        SELECT queries.qid, q.vec_id AS cid,
               list_sum([queries.qv[i + 1] * q.qv[i + 1] FOR i IN range(0, 64)])
                   AS dot_full,
               list_sum([queries.qv[i + 1] * q.qv[i + 1] FOR i IN range(0, 16)])
                   AS dot_16
        FROM queries, q
        WHERE q.vec_id <> queries.qid
    ), best_full AS (
        SELECT qid, cid AS top_full
        FROM (SELECT qid, cid,
                     ROW_NUMBER() OVER (PARTITION BY qid
                                        ORDER BY dot_full DESC, cid) AS rn
              FROM pairs)
        WHERE rn = 1
    ), best_16 AS (
        SELECT qid, cid AS top_16
        FROM (SELECT qid, cid,
                     ROW_NUMBER() OVER (PARTITION BY qid
                                        ORDER BY dot_16 DESC, cid) AS rn
              FROM pairs)
        WHERE rn = 1
    )
    SELECT f.qid, f.top_full, s.top_16,
           f.top_full = s.top_16 AS truncation_preserved_top1
    FROM best_full f JOIN best_16 s USING (qid)
    ORDER BY f.qid
    """,
)
def q_embed_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation audit: for each query vector, the
    exact top-1 neighbor under the FULL 64-dim dot product vs under the
    first-16-dims truncation — the measurement that decides whether a
    cheap prefix embedding can serve first-stage retrieval.

    Everything is exact: micro-quantized int64 dot products (the
    blocked-GEMM quantization rule), total-ordered argmax (score desc,
    candidate id). Unlike the ANN operators' recall-floor booleans,
    BOTH rankings here are deterministic, so the oracle adjudicates
    the per-query agreement outcomes themselves. Scale shape: query
    side (bounded) broadcasts against the corpus scan; per-pair cost
    is one fused array fold; the argmax is a per-query partial top-1,
    and at production scale the truncated pass is exactly the IVF/PQ
    first stage this audit green-lights.
    """
    q = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        microquant().alias("qv"),
    )
    queries = q.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("quv")
    )
    pairs = (
        q.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            int_dot("quv", "qv", 64).alias("dot_full"),
            int_dot("quv", "qv", 16).alias("dot_16"),
        )
    )
    from pyspark.sql.window import Window

    def top1(score: str, out: str):
        w = Window.partitionBy("qid").orderBy(F.desc(score), F.asc("cid"))
        return (
            pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("qid", F.col("cid").alias(out))
        )

    best_full = top1("dot_full", "top_full")
    best_16 = top1("dot_16", "top_16")
    return (
        best_full.join(best_16, "qid")
        .select(
            "qid",
            "top_full",
            "top_16",
            (F.col("top_full") == F.col("top_16")).alias("truncation_preserved_top1"),
        )
        .orderBy("qid")
    )


@query(
    "sample_hard_negatives",
    oracle="""
    WITH q AS (
        SELECT vec_id, label,
               [CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                FOR x IN embedding] AS qv
        FROM embeddings
    ), queries AS (
        SELECT vec_id AS qid, label AS qlabel, qv AS quv FROM q WHERE vec_id < 20
    ), scored AS (
        SELECT queries.qid, q.vec_id AS cid, q.label AS clabel,
               list_sum([queries.quv[i + 1] * q.qv[i + 1] FOR i IN range(0, 64)])
                   AS dot
        FROM queries, q
        WHERE q.vec_id <> queries.qid AND q.label <> queries.qlabel
    )
    SELECT qid, cid AS negative_id, clabel AS negative_label,
           CAST(dot AS BIGINT) AS dot_micro2, CAST(rnk AS INT) AS rnk
    FROM (
        SELECT qid, cid, clabel, dot,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS rnk
        FROM scored
    )
    WHERE rnk <= 3
    ORDER BY qid, rnk
    """,
)
def q_sample_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training: for
    each query vector, the top-3 most-similar candidates whose LABEL
    differs — the examples that sharpen an embedding model's decision
    boundary (random negatives are too easy to carry gradient).

    Exactness: micro-quantized int64 dot products, total-ordered
    per-query rank (dot desc, candidate id) — the mined triplets are
    fully deterministic, so the oracle adjudicates the actual mining
    output, not a summary. Scale shape: bounded query side broadcasts
    against the corpus scan; label filter prunes before scoring;
    per-query top-3 is a WindowGroupLimit partial, and at production
    scale the candidate generation upgrades to the IVF/PQ first stage
    with this exact pass as the rerank.
    """
    q = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        "label",
        microquant().alias("qv"),
    )
    queries = q.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("qv").alias("quv"),
    )
    scored = (
        q.crossJoin(F.broadcast(queries))
        .filter((F.col("vec_id") != F.col("qid")) & (F.col("label") != F.col("qlabel")))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            F.col("label").alias("clabel"),
            int_dot("quv", "qv", 64).alias("dot"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "qid",
            F.col("cid").alias("negative_id"),
            F.col("clabel").alias("negative_label"),
            F.col("dot").cast("bigint").alias("dot_micro2"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("qid", "rnk")
    )
