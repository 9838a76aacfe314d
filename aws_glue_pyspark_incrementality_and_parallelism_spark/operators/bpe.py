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

Greedy left-to-right application is engine-portable two ways, both
pinned equivalent: per-word, as one ``aggregate`` lambda over the
symbol array (the engine's hot path — a word fits in a cell, so the
"sequential" scan is per-row JVM work, zero shuffles); and relationally
(``_apply_merge``), exploiting that a merge chain can only overlap
itself when the pair is a doubled symbol (``(x,y)`` matching at ``i``
and ``i+1`` forces ``y = x``), so maximal runs of consecutive matches
merge at even offsets within the run — the same greedy semantics via
gaps-and-islands + run-local parity windows. The oracle replays the
relational form as chained CTEs, so the learned merge table is
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


def _apply_merge_syms(x: str, y: str) -> F.Column:
    """Greedy left-to-right merge of pair (x, y) over a ``syms``
    array<string> column — the ZERO-SHUFFLE twin of :func:`_apply_merge`
    (same semantics, pinned equivalent in tests/test_bpe.py).

    The row-per-symbol representation needs ~6 shuffles per merge
    iteration (three windows + two joins + renumber) over a relation
    that is only O(vocabulary) after the word-frequency collapse —
    pure scheduler overhead at any scale. With one array per word the
    greedy merge is a single ``aggregate`` over the symbol indices:
    carry (out, skip) through the word, emit x||y and skip the consumed
    symbol on a match. Lookahead uses try_element_at so the word end is
    NULL (never an ANSI out-of-bounds)."""
    init = F.expr("named_struct('out', cast(array() as array<string>), 'skip', false)")

    def step(acc: F.Column, i: F.Column) -> F.Column:
        cur = F.element_at(F.col("syms"), i)
        nxt = F.try_element_at(F.col("syms"), i + F.lit(1))
        is_match = (cur == F.lit(x)) & (nxt == F.lit(y))
        return (
            F.when(
                acc["skip"],
                F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
            )
            .when(
                is_match,
                F.struct(
                    F.array_append(acc["out"], F.lit(x + y)).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.array_append(acc["out"], cur).alias("out"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    # words are non-empty by construction ([a-z]+ match), so
    # sequence(1, size) is always ascending
    return F.aggregate(
        F.sequence(F.lit(1), F.size("syms")), init, step, lambda acc: acc["out"]
    )


#: Adjacent-pair extraction from a ``syms`` array: ('x','y') structs.
_PAIR_STRUCTS = (
    "zip_with(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1),"
    " (a, b) -> named_struct('x', a, 'y', b))"
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
    # One array<string> row per distinct word: the loop invariant is
    # O(vocabulary) and each merge iteration becomes a pure projection
    # (zero shuffles) + ONE keyed aggregate for the pair counts — the
    # row-per-symbol version paid ~6 shuffles per iteration in windows/
    # joins/renumbering over KB-sized state (12.6 s -> this shape at
    # sf0.1 is scheduler-bound no more).
    seq = words.select(
        "f",
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("syms"),
    ).persist()

    merges: list[tuple[int, str, str, int]] = []
    for it in range(1, BPE_MERGES + 1):
        pairs = (
            seq.select("f", F.explode(F.expr(_PAIR_STRUCTS)).alias("p"))
            .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
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
        seq = seq.select(
            "f", _apply_merge_syms(best["x"], best["y"]).alias("syms")
        ).persist()

    merge_df = spark.createDataFrame(
        [(it, x, y, x + y, cnt) for it, x, y, cnt in merges],
        "it bigint, left_sym string, right_sym string, merged string, pair_count bigint",
    )
    final = seq.agg(
        F.sum(F.col("f") * F.size("syms")).cast("bigint").alias("final_symbols")
    )
    return merge_df.crossJoin(F.broadcast(final)).orderBy("it")
