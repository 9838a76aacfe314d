"""Exact-substring duplication spans — suffix-array-style corpus dedup.

"Deduplicating Training Data Makes Language Models Better" (Lee et
al., 2022) removes EXACT substrings of >= L tokens that recur across
the corpus — the strongest dedup signal there is (MinHash/SimHash
approximate it).  The reference implementation builds a suffix array;
the distributed rewrite here gets the identical answer relationally:

1. explode every document into its L-char grams with positions (a
   narrow per-row projection — no shuffle),
2. one keyed aggregate finds grams occurring in >= 2 distinct
   documents (the only corpus-scale shuffle; at 100 TB you'd group on
   ``xxhash64(gram)`` to move 8-byte keys instead of L-char strings —
   grouping the raw gram here keeps the oracle collision-free),
3. a semi-join marks each document's duplicated positions,
4. per-document interval merging (running-max window over positions,
   gaps-and-islands on coverage) reconstructs the MAXIMAL duplicated
   spans and their exact character coverage — two window passes, both
   partitioned by doc_id.

Output is the per-document duplication census a corpus-cleaning
pipeline cuts on: span count, covered chars, micro-unit coverage
fraction.  Every value is an exact integer; the oracle replays the
same algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import query
from ..session import fan_out_compute
from ..sources.io import load_table

#: Minimum duplicated-substring length, in characters.
SPAN_L = 20


@query(
    "dedup_exact_substring_spans",
    oracle=f"""
    WITH g AS MATERIALIZED (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             substr(text, CAST(i AS INT), {SPAN_L}) AS gram
      FROM documents, UNNEST(range(1, length(text) - {SPAN_L - 2})) AS t(i)
      WHERE length(text) >= {SPAN_L}
    ),
    dupg AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    dup_pos AS MATERIALIZED (
      SELECT g.doc_id, g.pos FROM g SEMI JOIN dupg ON g.gram = dupg.gram
    ),
    isl AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN cm IS NULL OR pos > cm THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS isl_id
      FROM (
        SELECT doc_id, pos,
               MAX(pos + {SPAN_L - 1}) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cm
        FROM dup_pos
      )
    ),
    spans AS (
      SELECT doc_id, isl_id,
             MAX(pos) + {SPAN_L - 1} - MIN(pos) + 1 AS covered
      FROM isl GROUP BY doc_id, isl_id
    ),
    per_doc AS (
      SELECT s.doc_id, COUNT(*) AS n_spans,
             CAST(SUM(s.covered) AS BIGINT) AS covered_chars,
             (SELECT COUNT(*) FROM dup_pos p WHERE p.doc_id = s.doc_id)
               AS n_dup_grams
      FROM spans s GROUP BY s.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_dup_grams, 0) AS n_dup_grams,
           COALESCE(p.n_spans, 0) AS n_spans,
           COALESCE(p.covered_chars, 0) AS covered_chars,
           CAST(CAST(COALESCE(p.covered_chars, 0) * 1000000 AS HUGEINT)
                // CAST(length(d.text) AS HUGEINT) AS BIGINT) AS dup_fraction_micro
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    ORDER BY d.doc_id
    """,
)
def q_dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document exact-duplicate span census (module docstring has
    the full algorithm): maximal runs of {SPAN_L}-char grams that recur
    in >= 2 distinct documents, with exact covered-char counts and a
    micro-unit coverage fraction — the cut signal for suffix-array-style
    corpus dedup, computed relationally.

    Plan shape (optimization round 9 — guide §2.3/§2.4): the gram
    relation is by far the widest intermediate (~|corpus chars| rows of
    {SPAN_L}-char strings), so it must be produced ONCE and shuffled as
    few times as possible. The original formulation (countDistinct
    aggregate + left-semi join back, separate per-doc gram-count
    branch) executed the explode pipeline FOUR times and shuffled the
    gram relation for the aggregate AND the join; here the
    cross-document test is a window over the gram partition —
    ``min(doc_id) ≠ max(doc_id)`` is exactly ``COUNT(DISTINCT doc_id)
    ≥ 2`` — so one exchange on ``gram`` replaces the
    aggregate+semi-join pair, and the per-doc gram count rides the
    existing islands aggregation (count per island, summed per doc)
    instead of re-running the pipeline. Result: 4 gram pipelines → 1,
    and the gram bytes cross the network once."""
    docs = load_table(spark, sf_dir, "documents")
    # r9 (guide §2.5): the single-row-group scan runs the whole gram
    # posexplode (the ~|corpus chars|-row blow-up) on ONE task; hash
    # fan-out on doc_id spreads it across the cluster for a shuffle of
    # the pre-explode doc rows. No-op at real-table scan parallelism.
    grams = (
        # Filter BEFORE the fan-out (ADVICE r9): rows shorter than SPAN_L
        # produce no grams, so shuffling them into the fan-out exchange
        # is pure waste; the pushed length predicate also reaches the scan.
        fan_out_compute(docs.filter(F.length("text") >= SPAN_L), "doc_id")
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, length(text) - {SPAN_L - 1}),"
                    f" i -> substring(text, i, {SPAN_L}))"
                )
            ).alias("p0", "gram"),
        )
        .select("doc_id", (F.col("p0") + 1).cast("bigint").alias("pos"), "gram")
    )
    # A gram recurs across >= 2 distinct docs ⟺ the min and max doc_id
    # over its partition differ — one whole-partition window, no
    # distinct-aggregate expansion, no join back.
    wg = Window.partitionBy("gram")
    dup_pos = (
        grams.withColumn(
            "is_dup", F.min("doc_id").over(wg) != F.max("doc_id").over(wg)
        )
        .filter(F.col("is_dup"))
        .select("doc_id", "pos")
    )

    w = Window.partitionBy("doc_id").orderBy("pos")
    cm = (
        F.max(F.col("pos") + F.lit(SPAN_L - 1))
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
    )
    isl = dup_pos.withColumn(
        "isl_id",
        F.sum(
            F.when(cm.isNull() | (F.col("pos") > cm), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # Two-level aggregate, both satisfied by the islands windows' doc_id
    # partitioning (no further exchange): per island the span length and
    # its member-gram count, per doc the span census. Summing the
    # island member counts IS the old per-doc dup-gram count.
    spans = isl.groupBy("doc_id", "isl_id").agg(
        (F.max("pos") + F.lit(SPAN_L - 1) - F.min("pos") + 1).alias("covered"),
        F.count("*").alias("n_in_isl"),
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum("covered").cast("bigint").alias("covered_chars"),
        F.sum("n_in_isl").cast("bigint").alias("n_dup_grams"),
    )

    return (
        docs.select("doc_id", F.length("text").alias("tlen"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("covered_chars", F.lit(0)).alias("covered_chars"),
            F.expr(
                "coalesce(covered_chars, 0) * cast(1000000 as bigint) div tlen"
            ).alias("dup_fraction_micro"),
        )
        .orderBy("doc_id")
    )
