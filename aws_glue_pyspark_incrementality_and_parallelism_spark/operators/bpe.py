"""BPE tokenizer *training* — learn merge rules from the corpus.

``text_token_count_bpe`` (text.py) APPLIES a fixed BPE-ish tokenizer;
this module learns one: the Sennrich byte-pair-encoding training loop
(the algorithm behind GPT-2/LLaMA tokenizers, minus byte fallback):

1. collapse the corpus to word frequencies — the ONLY corpus-scale
   pass (one shuffle); every later step is O(vocabulary), which is why
   BPE training is tractable at 100 TB: 270k running tokens here (and
   trillions in production) collapse to a per-word weighted state,
2. represent each distinct word as a symbol sequence,
3. per iteration: count adjacent symbol pairs weighted by word
   frequency (one keyed aggregate over the sequence relation), pick
   the argmax pair (count DESC, then lexicographic tie-break — a
   1-row control-plane collect, the k-means-centroid pattern: the
   merge table IS the trained model, O(k) driver state),
4. apply the merge greedily left-to-right and repeat.

Greedy left-to-right application is made engine-portable without any
sequential scan: a merge chain can only overlap itself when the pair
is a doubled symbol (``(x,y)`` matching at ``i`` and ``i+1`` forces
``y = x``), so maximal runs of consecutive matches merge at even
offsets within the run — exactly greedy semantics, computed with two
window passes (gaps-and-islands run grouping + run-local parity).
Both engines execute the IDENTICAL algebra; the oracle replays the
full k-iteration loop as chained CTEs, so the learned merge table is
adjudicated rule-for-rule with exact integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import query
from ..sources.io import load_table

#: Number of merge rules to learn.
BPE_MERGES = 5


def _bpe_oracle(k: int) -> str:
    """Chained-CTE DuckDB replay of the k-iteration training loop."""
    parts = [
        """
    WITH words AS MATERIALIZED (
      SELECT w, COUNT(*) AS f FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        FROM documents
      ) GROUP BY w
    ),
    seq0 AS MATERIALIZED (
      SELECT w, f, CAST(i AS BIGINT) AS pos, substr(w, CAST(i AS INT), 1) AS sym
      FROM words, UNNEST(range(1, length(w) + 1)) AS t(i)
    )"""
    ]
    for i in range(k):
        parts.append(f"""
    pairs{i} AS MATERIALIZED (
      SELECT x, y, CAST(SUM(f) AS BIGINT) AS cnt FROM (
        SELECT sym AS x, lead(sym) OVER (PARTITION BY w ORDER BY pos) AS y, f
        FROM seq{i}
      ) WHERE y IS NOT NULL GROUP BY x, y
    ),
    best{i} AS MATERIALIZED (
      SELECT x, y, cnt FROM pairs{i} ORDER BY cnt DESC, x, y LIMIT 1
    ),
    mk{i} AS MATERIALIZED (
      SELECT w, f, pos, sym,
             COALESCE(sym = (SELECT x FROM best{i})
               AND lead(sym) OVER (PARTITION BY w ORDER BY pos)
                   = (SELECT y FROM best{i}), FALSE) AS is_match
      FROM seq{i}
    ),
    mrg{i} AS MATERIALIZED (
      SELECT w, pos,
             (ROW_NUMBER() OVER (PARTITION BY w, island ORDER BY pos) - 1) % 2 = 0
               AS do_merge
      FROM (
        SELECT w, pos, pos - ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos)
                 AS island
        FROM mk{i} WHERE is_match
      )
    ),
    seq{i + 1} AS MATERIALIZED (
      SELECT w, f, ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) AS pos, sym
      FROM (
        SELECT s.w, s.f, s.pos,
               CASE WHEN COALESCE(d.do_merge, FALSE)
                    THEN s.sym || (SELECT y FROM best{i}) ELSE s.sym END AS sym
        FROM mk{i} s
        LEFT JOIN mrg{i} d ON s.w = d.w AND s.pos = d.pos
        LEFT JOIN mrg{i} c ON s.w = c.w AND s.pos = c.pos + 1 AND c.do_merge
        WHERE c.pos IS NULL
      )
    )""")
    unions = "\n      UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS it, x AS left_sym, y AS right_sym,"
        f" x || y AS merged, cnt AS pair_count FROM best{i}"
        for i in range(k)
    )
    return (
        ",\n".join(parts)
        + f"""
    SELECT m.it, m.left_sym, m.right_sym, m.merged, m.pair_count, s.final_symbols
    FROM ({unions}) m
    CROSS JOIN (SELECT CAST(SUM(f) AS BIGINT) AS final_symbols FROM seq{k}) s
    ORDER BY m.it
    """
    )


def _apply_merge(seq: DataFrame, x: str, y: str) -> DataFrame:
    """Greedy left-to-right merge of pair (x, y) via run-parity windows."""
    w_pos = Window.partitionBy("w").orderBy("pos")
    mk = seq.withColumn(
        "is_match",
        F.coalesce(
            (F.col("sym") == F.lit(x)) & (F.lead("sym").over(w_pos) == F.lit(y)),
            F.lit(False),
        ),
    )
    matches = mk.filter("is_match").withColumn(
        "island", F.col("pos") - F.row_number().over(w_pos)
    )
    w_isl = Window.partitionBy("w", "island").orderBy("pos")
    mrg = matches.select(
        "w",
        "pos",
        (((F.row_number().over(w_isl) - 1) % 2) == 0).alias("do_merge"),
    )
    consumed = mrg.filter("do_merge").select(
        "w", (F.col("pos") + 1).alias("pos"), F.lit(True).alias("consumed")
    )
    merged = (
        mk.select("w", "f", "pos", "sym")
        .join(mrg, ["w", "pos"], "left")
        .join(consumed, ["w", "pos"], "left")
        .filter(F.col("consumed").isNull())
        .select(
            "w",
            "f",
            "pos",
            F.when(F.coalesce("do_merge", F.lit(False)), F.concat("sym", F.lit(y)))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )
    return merged.select(
        "w", "f", F.row_number().over(w_pos).alias("pos"), "sym"
    )


@query("text_bpe_train_merges", oracle=_bpe_oracle(BPE_MERGES))
def q_text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn BPE_MERGES merge rules from ``documents`` (module docstring
    has the full algorithm + portability argument). Output: the learned
    merge table — (iteration, left, right, merged symbol, weighted pair
    count) — plus the corpus-weighted symbol count after all merges,
    appended as a broadcast 1-row aggregate (compression evidence)."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )
    seq = words.select(
        "w",
        "f",
        F.posexplode(
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        ).alias("p0", "sym"),
    ).select("w", "f", (F.col("p0") + 1).cast("bigint").alias("pos"), "sym")
    # The sequence relation is the loop invariant; after the word-freq
    # collapse it is O(vocabulary), so caching it is control-plane-sized.
    seq = seq.persist()

    merges: list[tuple[int, str, str, int]] = []
    for it in range(1, BPE_MERGES + 1):
        w_pos = Window.partitionBy("w").orderBy("pos")
        pairs = (
            seq.select("f", F.col("sym").alias("x"), F.lead("sym").over(w_pos).alias("y"))
            .filter(F.col("y").isNotNull())
            .groupBy("x", "y")
            .agg(F.sum("f").cast("bigint").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "x", "y").limit(1).collect()
        if not top:  # corpus exhausted (or empty input): no pairs left
            break
        best = top[0]
        merges.append((it, best["x"], best["y"], int(best["cnt"])))
        # Each persisted invariant is O(vocabulary) rows; the next
        # iteration's collect materializes it, so no eager count() —
        # and no unpersist churn for KBs of state.
        seq = _apply_merge(seq, best["x"], best["y"]).persist()

    merge_df = spark.createDataFrame(
        [(it, x, y, x + y, cnt) for it, x, y, cnt in merges],
        "it bigint, left_sym string, right_sym string, merged string, pair_count bigint",
    )
    final = seq.agg(F.sum("f").cast("bigint").alias("final_symbols"))
    return merge_df.crossJoin(F.broadcast(final)).orderBy("it")
