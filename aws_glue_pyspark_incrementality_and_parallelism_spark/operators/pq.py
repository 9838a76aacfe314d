"""Product quantization (PQ) — compressed-domain ANN search.

The missing piece between this engine's IVF (cell pruning,
similarity.py:364) and a 100 TB vector corpus: IVF bounds how many
vectors a query LOOKS at; PQ bounds how many bytes each look costs.
Vectors are split into M_SUB subspaces, each subvector quantized to one
of K_CODES learned codewords, so a 64-dim float32 vector (256 B)
becomes M_SUB code bytes (32× compression here; Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — the Faiss
IVF-PQ design). Search runs in the compressed domain via ADC
(asymmetric distance computation): the query precomputes a (M_SUB ×
K_CODES) table of exact subspace distances, and each corpus vector's
approximate distance is M_SUB table lookups — no decompression.

Spark topology (the part that matters at scale):

* **Training is O(sample), driver-side** — codebooks are learned from a
  bounded deterministic sample (standard practice: Faiss trains on
  ~100k vectors regardless of corpus size), then BROADCAST.
* **Encoding is one Arrow pass** — mapInPandas argmin per subspace; no
  shuffle, output is 8 bytes/vector.
* **ADC scan is compressed-domain** — the query tables (N_QUERIES ×
  M_SUB × K_CODES floats) broadcast; each partition scans only the
  code table and emits a per-partition shortlist, so the shuffle
  carries O(partitions × queries × shortlist) rows, never the corpus.
* **Exact rerank** touches only the global shortlist — the same
  candidates-then-exact shape as IVF/LSH.

Vectors are L2-normalized before training/encoding so ADC's L2 ranking
matches the brute-force COSINE ranking the driver surface compares
against (cosine ≡ monotone of L2 on the unit sphere).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.io import load_table
from .similarity import (
    N_QUERIES,
    TOP_K,
    _ann_recall_summary,
    _ANN_SUMMARY_ORACLE,
    _cosine_pandas_udf,
)

M_SUB = 8  # subspaces over the 64-dim embeddings
SUB_DIM = 8
K_CODES = 16
TRAIN_SAMPLE = 256  # vec_id bound for the driver-side training sample
LLOYD_ITERS = 2
PQ_SHORTLIST = 40  # ADC candidates per query fed to exact rerank
#: Recall floor for the driver surface — the test embeddings are
#: near-orthogonal (PQ's worst case: subspace distances carry little
#: signal), so the floor sits far below the measured constant
#: (pytest asserts the raw value).
PQ_RECALL_FLOOR = 0.3


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    norms[norms == 0.0] = 1.0
    return mat / norms


def train_codebooks(spark: SparkSession, sf_dir: str, rows: list | None = None) -> np.ndarray:
    """Learn (M_SUB, K_CODES, SUB_DIM) codebooks from the bounded
    sample ``vec_id < TRAIN_SAMPLE`` with deterministic Lloyd
    iterations (init = first K_CODES sample subvectors; ties take the
    lowest code via argmin; empty cells keep their codeword).

    ``rows`` (r10): pre-collected, vec_id-ascending sample rows with an
    ``embedding`` field — lets ``pq_adc_topk_pairs`` share ONE
    control-plane collect between training and the query vectors
    instead of two scheduler round-trips over the same id range."""
    if rows is None:
        rows = (
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("embedding").isNotNull())
            .filter(F.col("vec_id") < TRAIN_SAMPLE)
            .orderBy("vec_id")
            .select("embedding")
            .collect()
        )  # control-plane: ≤ TRAIN_SAMPLE rows regardless of corpus size
    if not rows:
        # empty corpus: zero codebooks keep every downstream stage
        # empty without crashing (no-new-data incremental case)
        return np.zeros((M_SUB, K_CODES, SUB_DIM), dtype=np.float64)
    sample = _normalize(np.array([r["embedding"] for r in rows], dtype=np.float64))
    sub = sample.reshape(len(sample), M_SUB, SUB_DIM)
    books = np.stack([sub[:K_CODES, j, :].copy() for j in range(M_SUB)])
    for _ in range(LLOYD_ITERS):
        for j in range(M_SUB):
            x = sub[:, j, :]  # (n, SUB_DIM)
            d2 = ((x[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(K_CODES):
                members = x[assign == c]
                if len(members):
                    books[j][c] = members.mean(axis=0)
    return books


def encode_codes(emb: DataFrame, books: np.ndarray) -> DataFrame:
    """Compress each embedding to its M_SUB nearest-codeword ids — one
    Arrow pass, codebooks in the task closure (tiny), no shuffle."""
    schema = "vec_id long, codes array<int>"
    # bind everything the worker needs as LOCALS: executor pythons do
    # not have this repo on sys.path, so closures must not reference
    # module globals (cloudpickle would re-import this module there)
    m_sub, sub_dim = M_SUB, SUB_DIM
    bks = books

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
            norms[norms == 0.0] = 1.0
            mat = mat / norms
            sub = mat.reshape(len(mat), m_sub, sub_dim)
            codes = np.empty((len(mat), m_sub), dtype=np.int64)
            for j in range(m_sub):
                d2 = ((sub[:, j, :, None] - bks[j].T[None, :, :]) ** 2).sum(axis=1)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "codes": list(codes)}
            )

    return emb.select("vec_id", "embedding").mapInPandas(_encode, schema)


def pq_adc_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC search + exact rerank: compressed-domain shortlist per
    partition → global shortlist → exact cosine top-k."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    # ONE control-plane collect (r10): the training sample id range
    # covers the query id range (TRAIN_SAMPLE > N_QUERIES), so collect
    # it once and slice — training and query extraction were two
    # separate jobs over the same rows.
    sample_rows = (
        emb.filter(F.col("vec_id") < max(TRAIN_SAMPLE, N_QUERIES))
        .orderBy("vec_id")
        .collect()
    )  # control-plane: ≤ max(TRAIN_SAMPLE, N_QUERIES) rows at any corpus size
    books = train_codebooks(
        spark, sf_dir, rows=[r for r in sample_rows if r["vec_id"] < TRAIN_SAMPLE]
    )
    codes = encode_codes(emb, books)

    qrows = [r for r in sample_rows if r["vec_id"] < N_QUERIES]
    if not qrows:
        # empty corpus ⇒ no query vectors: the ADC top-k is empty by
        # definition (no-new-data incremental case must not crash);
        # schema matches the reranked output below
        return spark.createDataFrame(
            [], "query_id long, vec_id long, cosine double, rn int"
        )
    qids = np.array([r["vec_id"] for r in qrows])
    qmat = _normalize(np.array([r["embedding"] for r in qrows], dtype=np.float64))
    qsub = qmat.reshape(len(qmat), M_SUB, SUB_DIM)
    # (n_q, M_SUB, K_CODES) exact subspace distance tables
    tables = np.stack(
        [((qsub[:, j, :, None] - books[j].T[None, :, :]) ** 2).sum(axis=1) for j in range(M_SUB)],
        axis=1,
    )

    schema = "query_id long, vec_id long, adist double"
    # locals only in the closure — see encode_codes
    m_sub, shortlist_n = M_SUB, PQ_SHORTLIST
    tbls, qid_arr = tables, qids

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            cd = np.vstack(pdf["codes"].to_numpy())  # (n, m_sub)
            vids = pdf["vec_id"].to_numpy()
            # adist[q, i] = sum_j tbls[q, j, cd[i, j]]
            adist = np.zeros((len(qid_arr), len(cd)))
            for j in range(m_sub):
                adist += tbls[:, j, :][:, cd[:, j]]
            k = min(shortlist_n, len(cd))
            out_q, out_v, out_d = [], [], []
            for qi in range(len(qid_arr)):
                idx = np.argpartition(adist[qi], k - 1)[:k]
                out_q.extend([qid_arr[qi]] * k)
                out_v.extend(vids[idx])
                out_d.extend(adist[qi][idx])
            yield pd.DataFrame({"query_id": out_q, "vec_id": out_v, "adist": out_d})

    shortlist_local = codes.mapInPandas(_scan, schema)
    w_short = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    shortlist = (
        shortlist_local.withColumn("srn", F.row_number().over(w_short))
        .filter(F.col("srn") <= PQ_SHORTLIST)
        .select("query_id", "vec_id")
    )

    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    cos_udf = _cosine_pandas_udf()
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        shortlist.join(emb, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cos_udf(F.col("qe"), F.col("embedding")), 4))
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", "cosine", "rn")
    )


@query("sim_pq_adc_topk", oracle=_ANN_SUMMARY_ORACLE)
def q_sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC ANN with the deterministic driver surface: run the
    compressed-domain search AND the exact brute force in one job, emit
    (n_exact, recall_ok). Same approx-operator oracle pattern as
    sim_ivf_topk / sim_lsh_topk; pytest asserts the raw recall and the
    32× code compression."""
    from .similarity import q_sim_brute_force_topk

    exact = q_sim_brute_force_topk(spark, sf_dir)
    ann = pq_adc_topk_pairs(spark, sf_dir)
    return _ann_recall_summary(exact, ann, PQ_RECALL_FLOOR)
