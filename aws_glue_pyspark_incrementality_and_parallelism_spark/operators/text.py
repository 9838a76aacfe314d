"""Text-analysis operators (SURVEY §2.8 E4) over ``documents``:
token/char statistics, quality scoring, language ID, fingerprinting,
corpus vocabulary. All JVM-side expressions (split/regexp/array ops) —
the hot path never enters Python."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import query
from ..sources.io import load_table
from .dedup import normalized_fingerprint

#: Tiny per-language stopword lexicons for the heuristic language ID.
#: Real pipelines use char-n-gram models; the *plumbing* (broadcast
#: lexicon, argmax over per-language hit ratios) is identical.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "je", "ne", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "yo", "no", "un", "una", "en"],
    "zh": ["de", "shi", "bu", "wo", "le", "ren", "you", "ta", "zhe", "men"],
}


def _tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


@query(
    "text_stats",
    oracle="""
    SELECT doc_id, lang,
           LENGTH(text) AS n_chars_measured,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS n_unique_tokens,
           ROUND(LENGTH(regexp_replace(text, '\\s+', '', 'g')) * 1.0 /
                 len(string_split_regex(trim(text), '\\s+')), 4) AS avg_token_len
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + char stats per document (one scan, no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_measured"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(_tokens(F.col("text")))).alias("n_unique_tokens"),
        F.round(
            F.length(F.regexp_replace("text", r"\s+", "")) * F.lit(1.0) / F.size(toks), 4
        ).alias("avg_token_len"),
    )


@query(
    "text_quality_score",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) * 1.0 /
               len(string_split_regex(trim(text), '\\s+')) AS unique_ratio,
             CASE WHEN LENGTH(text) = 0 THEN 0.0
                  ELSE LENGTH(regexp_replace(text, '[a-zA-Z\\s]', '', 'g')) * 1.0 / LENGTH(text)
             END AS symbol_ratio
      FROM documents
    )
    SELECT doc_id, n_tokens, ROUND(unique_ratio, 4) AS unique_ratio,
           ROUND(symbol_ratio, 4) AS symbol_ratio,
           ROUND(LEAST(1.0, n_tokens / 50.0) * unique_ratio * (1 - symbol_ratio), 4)
             AS quality_score
    FROM scored
    """,
)
def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length saturation × lexical diversity ×
    (1 − symbol noise). The C4/Gopher-style filter shape, as pure
    column expressions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    unique_ratio = F.size(F.array_distinct(_tokens(F.col("text")))) * F.lit(1.0) / n_tokens
    symbol_ratio = F.when(F.length("text") == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace("text", r"[a-zA-Z\s]", "")) * F.lit(1.0) / F.length("text")
    )
    quality = F.least(F.lit(1.0), n_tokens / F.lit(50.0)) * unique_ratio * (1 - symbol_ratio)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(unique_ratio, 4).alias("unique_ratio"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        F.round(quality, 4).alias("quality_score"),
    )


def langid_scores(text: Column) -> list[tuple[str, Column]]:
    """Per-language stopword hit count over the doc's distinct tokens."""
    toks = F.array_distinct(_tokens(text))
    return [
        (lang, F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))))
        for lang, words in STOPWORDS.items()
    ]


def _langid_oracle() -> str:
    """Oracle generated from STOPWORDS so the SQL replicates the exact
    heuristic (including the dict-order tie-break) and cannot drift."""
    score_exprs = ",\n             ".join(
        f"len(list_intersect(toks, [{', '.join(repr(w) for w in words)}])) AS s_{lang}"
        for lang, words in STOPWORDS.items()
    )
    best = "GREATEST(" + ", ".join(f"s_{lang}" for lang in STOPWORDS) + ")"
    case = " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in STOPWORDS)
    return f"""
    WITH t AS (
      SELECT doc_id, lang,
             list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, lang,
             {score_exprs}
      FROM t
    ), b AS (
      SELECT *, {best} AS best FROM s
    )
    SELECT doc_id, lang,
           CASE WHEN best > 0 THEN (CASE {case} END) ELSE 'und' END AS predicted_lang
    FROM b
    """


@query("text_langid", oracle=_langid_oracle())
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits over
    the doc's distinct tokens ('und' = undetermined when nothing
    matches; ties break in STOPWORDS dict order). The oracle is
    generated from the same STOPWORDS table. Accuracy on real sentences
    is asserted in pytest; the synthetic corpus shares one vocabulary
    across langs."""
    docs = load_table(spark, sf_dir, "documents")
    scores = langid_scores(F.col("text"))
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, s in reversed(scores):
        pred = F.when((best > 0) & (s == best), lang).otherwise(pred)
    return docs.select("doc_id", "lang", pred.alias("predicted_lang"))


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint,
           strlen(text) AS n_bytes
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document fingerprint (md5 of whitespace-collapsed
    lowercase text) + byte length — the join key for cross-corpus exact
    dedup."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        normalized_fingerprint(F.col("text")).alias("fingerprint"),
        F.octet_length("text").alias("n_bytes"),
    )


@query(
    "pipeline_corpus_clean",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, text,
             md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) * 1.0 /
               len(string_split_regex(trim(text), '\\s+')) AS unique_ratio
      FROM documents
    ), keepers AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS copy_rank
      FROM scored
      WHERE n_tokens >= 20 AND unique_ratio >= 0.2
    )
    SELECT lang, COUNT(*) AS docs_kept, CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
    FROM keepers WHERE copy_rank = 1
    GROUP BY 1
    """,
)
def q_pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus cleaning capstone: quality gate (length + lexical
    diversity) → exact dedup (first copy per fingerprint wins) →
    per-language kept-token accounting. The composed operators stay one
    declarative plan: scan → project → window → filter → aggregate, two
    shuffles total (fingerprint, language)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    unique_ratio = F.size(F.array_distinct(_tokens(F.col("text")))) * F.lit(1.0) / n_tokens
    scored = docs.select(
        "doc_id",
        "lang",
        normalized_fingerprint(F.col("text")).alias("fp"),
        n_tokens.alias("n_tokens"),
        unique_ratio.alias("unique_ratio"),
    ).filter((F.col("n_tokens") >= 20) & (F.col("unique_ratio") >= 0.2))
    w = Window.partitionBy("fp").orderBy("doc_id")
    keepers = scored.withColumn("copy_rank", F.row_number().over(w)).filter(
        F.col("copy_rank") == 1
    )
    return keepers.groupBy("lang").agg(
        F.count("*").alias("docs_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
    )


#: Per-language token budget for the training-mix capstone. Small enough
#: to bind at every SF (sf0.001 has ~20k tokens/lang), so the budget
#: boundary logic is exercised everywhere.
_MIX_TOKEN_BUDGET = 3000
#: Same u32 train-lane threshold as governance.sample_stratified_split.
_MIX_TRAIN_MAX = 3435973836


@query(
    "pipeline_training_mix",
    oracle=f"""
    WITH lane AS (
      SELECT doc_id, lang, text
      FROM documents
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8))
                 AS BIGINT) < {_MIX_TRAIN_MAX}
    ), scored AS (
      SELECT doc_id, lang,
             md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) * 1.0 /
               len(string_split_regex(trim(text), '\\s+')) AS unique_ratio
      FROM lane
    ), keepers AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS copy_rank
      FROM scored
      WHERE n_tokens >= 20 AND unique_ratio >= 0.2
    ), budgeted AS (
      SELECT lang, doc_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM keepers WHERE copy_rank = 1
    )
    SELECT lang,
           COUNT(*) AS docs_selected,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected,
           CAST(MAX(cum_tokens) AS BIGINT) >= {_MIX_TOKEN_BUDGET} AS budget_bound
    FROM budgeted
    WHERE cum_tokens - n_tokens < {_MIX_TOKEN_BUDGET}
    GROUP BY lang
    """,
)
def q_pipeline_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-MIX assembly capstone — the stage after
    ``pipeline_corpus_clean``: deterministic hash split (train lane
    only, same md5-lane rule as ``sample_stratified_split``) → quality
    gate → exact dedup → per-language TOKEN BUDGET cap (docs admitted
    in doc_id order until the language's running token sum crosses the
    budget — the Pile/Dolma mixture-weighting step), reporting per
    language the selected doc/token counts and whether the budget
    actually bound (pinned observable so a silently-undershooting
    budget shows up as a value mismatch, not a guess).

    One declarative plan: scan → hash-lane filter (rides the scan) →
    project/filter → dedup window (fp) → budget window (lang) →
    aggregate; three keyed shuffles, no driver state, no global sort —
    the per-language cumsum is a partitioned window, so at 100 TB each
    language's admission scan is one partition-local pass (hot
    languages would use the same distributed-prefix-sum rewrite as
    ``text_sequence_pack``)."""
    docs = load_table(spark, sf_dir, "documents")
    u32 = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    lane = docs.filter(u32 < _MIX_TRAIN_MAX)

    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    unique_ratio = F.size(F.array_distinct(_tokens(F.col("text")))) * F.lit(1.0) / n_tokens
    scored = lane.select(
        "doc_id",
        "lang",
        normalized_fingerprint(F.col("text")).alias("fp"),
        n_tokens.alias("n_tokens"),
        unique_ratio.alias("unique_ratio"),
    ).filter((F.col("n_tokens") >= 20) & (F.col("unique_ratio") >= 0.2))

    dedup_w = Window.partitionBy("fp").orderBy("doc_id")
    keepers = (
        scored.withColumn("copy_rank", F.row_number().over(dedup_w))
        .filter(F.col("copy_rank") == 1)
        .select("lang", "doc_id", "n_tokens")
    )

    cum_w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budgeted = keepers.withColumn("cum_tokens", F.sum("n_tokens").over(cum_w)).filter(
        F.col("cum_tokens") - F.col("n_tokens") < _MIX_TOKEN_BUDGET
    )
    return budgeted.groupBy("lang").agg(
        F.count("*").alias("docs_selected"),
        F.sum("n_tokens").cast("bigint").alias("tokens_selected"),
        (F.max("cum_tokens") >= _MIX_TOKEN_BUDGET).alias("budget_bound"),
    )


@query(
    "text_tfidf_top3",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
      FROM documents
    ), tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.word,
             ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 4) AS tfidf
      FROM tf JOIN df USING (word) CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, word, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, word) AS rn
      FROM scored
    )
    SELECT doc_id, word, tfidf, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 3
    """,
)
def q_text_tfidf_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — explode → two hash-aggregates
    (term frequency, document frequency) → broadcast df join → windowed
    top-k. The canonical keyword-extraction pipeline without MLlib; the
    df table is vocabulary-sized, so the join broadcasts at any corpus
    scale."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df = tok.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()  # driver-side scalar: one small job, not a collect of data
    scored = tf.join(F.broadcast(df), "word").select(
        "doc_id",
        "word",
        F.round(F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 4).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "word", "tfidf", "rn")
    )


@query(
    "text_vocabulary_topk",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
      FROM documents
    ), counted AS (
      SELECT word, COUNT(*) AS freq FROM tok GROUP BY 1
    ), ranked AS (
      SELECT word, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rn
      FROM counted
    )
    SELECT word, freq, CAST(rn AS INT) AS rn FROM ranked WHERE rn <= 20
    """,
)
def q_text_vocabulary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level vocabulary: top-20 words by frequency. explode →
    hash-agg (map-side combine) → top-k; the word histogram never
    materializes globally sorted output."""
    docs = load_table(spark, sf_dir, "documents")
    counted = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("word"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("word", "freq", "rn")
    )


#: BPE-style pre-tokenizer (GPT-2-family shape, lookahead-free so the
#: same pattern runs on Java regex and RE2): contraction suffixes,
#: letter runs, digit runs, punctuation runs.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)|\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+"


@query(
    "text_token_count_bpe",
    oracle=f"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{BPE_PRETOKEN_RE.replace("'", "''")}'))
             AS n_bpe_tokens,
           ROUND(len(regexp_extract_all(text, '{BPE_PRETOKEN_RE.replace("'", "''")}')) * 1.0
                 / len(string_split_regex(trim(text), '\\s+')), 4) AS bpe_per_word
    FROM documents
    """,
)
def q_text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex next to the
    whitespace count — the standard LLM-pipeline cost estimator
    (tokens-per-word ratio per document). Pure JVM regexp_extract_all,
    one scan, no shuffle; the pattern avoids lookaheads so Spark (Java
    regex) and the DuckDB oracle (RE2) tokenize identically."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_PRETOKEN_RE), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(ws).alias("n_ws_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.round(F.size(bpe) * F.lit(1.0) / F.size(ws), 4).alias("bpe_per_word"),
    )


def _gram_rows(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, gram) rows of word n-grams via explode(sequence) + slice
    + array_join — all codegen, zero shuffles (same shape as
    dedup.shingle_rows; a window-``lead`` formulation would shuffle and
    sort every token by doc). Docs shorter than n yield nothing."""
    toks = _tokens(F.col("text"))
    base = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= n)
    starts = F.sequence(F.lit(0), F.size("toks") - n)
    return base.select("doc_id", "toks", F.explode(starts).alias("p")).select(
        "doc_id",
        F.array_join(F.slice("toks", F.col("p") + 1, n), " ").alias("gram"),
    )


@query(
    "text_repetition_ratio",
    oracle="""
    WITH idx AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, toks, unnest(generate_series(1, len(toks)-2)) AS i
      FROM idx WHERE len(toks) >= 3
    ), tri AS (
      SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram FROM g
    ), cnt AS (
      SELECT doc_id, gram, COUNT(*) AS c FROM tri GROUP BY 1, 2
    )
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_trigrams, MAX(c) AS max_trigram_count,
           ROUND(MAX(c) * 1.0 / SUM(c), 6) AS repetition_ratio
    FROM cnt GROUP BY doc_id
    """,
)
def q_text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signal: the fraction of a doc's
    word trigrams taken by its single most-repeated trigram. Boilerplate,
    keyword stuffing, and degenerate generations spike this ratio; corpus
    filters drop docs above a threshold. Two hash-aggregates keyed by
    doc — fully codegen, no data crosses the driver."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = _gram_rows(docs, 3).groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_trigrams"),
        F.max("c").alias("max_trigram_count"),
        F.round(F.max("c") / F.sum("c"), 6).alias("repetition_ratio"),
    )


#: Decontamination gram width: long enough that only genuinely shared
#: passages collide, short enough to survive small edits.
DECONTAM_N = 8
BENCH_DOC_CUTOFF = 10


@query(
    "text_decontamination",
    oracle=f"""
    WITH idx AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, toks, unnest(generate_series(1, len(toks)-{DECONTAM_N - 1})) AS i
      FROM idx WHERE len(toks) >= {DECONTAM_N}
    ), grams AS (
      SELECT DISTINCT doc_id,
             list_aggregate(toks[i:i+{DECONTAM_N - 1}], 'string_agg', ' ') AS gram
      FROM g
    )
    SELECT c.doc_id AS corpus_doc_id, b.doc_id AS bench_doc_id,
           COUNT(*) AS n_shared_grams
    FROM grams c
    JOIN grams b ON c.gram = b.gram
    WHERE c.doc_id >= {BENCH_DOC_CUTOFF} AND b.doc_id < {BENCH_DOC_CUTOFF}
    GROUP BY 1, 2
    """,
)
def q_text_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any full
    {DECONTAM_N}-word gram with a held-out benchmark set (doc_id <
    {BENCH_DOC_CUTOFF} stands in for the eval suite) are flagged with
    their overlap counts — the standard pre-training hygiene pass.

    Scale shape: distinct grams per side, then an equi-join keyed on the
    gram. The benchmark side is tiny by definition, so Catalyst
    broadcasts it and the corpus side never shuffles; at 100 TB the
    corpus grams stream past a broadcast hash set — cost is one corpus
    scan. (Winnowed fingerprints — dedup_winnow_fingerprints — are the
    sampled variant when even gram materialization is too much.)"""
    docs = load_table(spark, sf_dir, "documents")
    grams = _gram_rows(docs, DECONTAM_N).distinct()
    corpus = grams.filter(F.col("doc_id") >= BENCH_DOC_CUTOFF)
    bench = grams.filter(F.col("doc_id") < BENCH_DOC_CUTOFF)
    return (
        corpus.alias("c")
        .join(F.broadcast(bench.alias("b")), F.col("c.gram") == F.col("b.gram"))
        .groupBy(
            F.col("c.doc_id").alias("corpus_doc_id"),
            F.col("b.doc_id").alias("bench_doc_id"),
        )
        .agg(F.count("*").alias("n_shared_grams"))
    )


#: Sequence-packing chunk capacity (tokens per training sequence).
PACK_CAP = 2048
PACK_PARTITIONS = 8


@query(
    "text_sequence_pack",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS start_offset,
           CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {PACK_CAP})
             AS BIGINT) AS bin_id
    FROM sized
    """,
)
def q_text_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate every doc's tokens in
    doc_id order into one virtual stream and assign each doc its global
    start offset and the {PACK_CAP}-token training chunk its first token
    lands in.

    The naive formulation is a GLOBAL window cumsum — a single-partition
    sort, the classic scale killer. This runs it as a distributed prefix
    sum instead: range-partition by doc_id, per-partition cumsum under a
    partition-local window, then only the per-partition TOTALS (one row
    per partition — O(32), not O(docs)) cross the driver to become
    broadcast prefix offsets. Correct for any range boundaries, and every
    heavy step stays partition-parallel. The oracle is the naive global
    window, proving the two-pass plan computes the same stream.

    The sized projection is localCheckpoint'ed: both passes (totals
    collect + final join) read the materialized O(docs)×16-byte
    relation instead of re-tokenizing the full corpus twice."""
    docs = load_table(spark, sf_dir, "documents")
    sized = (
        docs.select("doc_id", F.size(_tokens(F.col("text"))).alias("n_tokens"))
        .repartitionByRange(PACK_PARTITIONS, "doc_id")
        .transform(pin)
    )
    parts = sized.withColumn("pid", F.spark_partition_id())
    w = Window.partitionBy("pid").orderBy("doc_id")
    local = parts.withColumn("local_end", F.sum("n_tokens").over(w))
    totals = sorted(
        local.groupBy("pid").agg(F.sum("n_tokens").alias("tot")).collect(),
        key=lambda r: r["pid"],
    )
    prefix, acc = {}, 0
    for r in totals:
        prefix[r["pid"]] = acc
        acc += r["tot"]
    offsets = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in prefix.items()], "pid int, part_offset long"
        )
    )
    start = F.col("part_offset") + F.col("local_end") - F.col("n_tokens")
    return local.join(offsets, "pid").select(
        "doc_id",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / PACK_CAP).cast("bigint").alias("bin_id"),
    )


#: RAG chunking: window width / stride in tokens.
CHUNK_W, CHUNK_S = 16, 8


@query(
    "text_chunk_sliding",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
    )
    SELECT doc_id, i AS chunk_start,
           len(toks[i+1 : i+{CHUNK_W}]) AS chunk_len,
           array_to_string(toks[i+1 : i+{CHUNK_W}], ' ') AS chunk_text
    FROM t, unnest(generate_series(0, greatest(len(toks) - {CHUNK_W}, 0), {CHUNK_S}))
           AS g(i)
    """,
)
def q_text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style document chunking: overlapping token windows of width
    CHUNK_W at stride CHUNK_S (the standard retrieval-corpus prep step
    before embedding). Pure codegen array ops — tokenize once, explode a
    start-offset sequence, slice — so chunking 100 TB is a map-only job
    with zero shuffles; output partitioning follows the input. The
    short-tail rule (a doc shorter than one window yields exactly one
    partial chunk) is pinned by both engines computing the same
    ``sequence(0, max(len-W, 0), S)`` start set."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("toks") - CHUNK_W, F.lit(0)),
        F.lit(CHUNK_S),
    )
    chunk = F.slice("toks", F.col("chunk_start") + 1, CHUNK_W)
    return (
        toks.select("doc_id", "toks", F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            "chunk_start",
            F.size(chunk).alias("chunk_len"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


@query(
    "text_distribution_drift",
    oracle="""
    WITH toks AS (
      SELECT CASE WHEN source = 'src0' THEN 'a' ELSE 'b' END AS side,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), counts AS (
      SELECT tok,
             SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS n_b
      FROM toks GROUP BY tok
    ), totals AS (
      SELECT SUM(n_a) AS tot_a, SUM(n_b) AS tot_b FROM counts
    )
    SELECT CAST(tot_a AS BIGINT) AS n_tokens_a,
           CAST(tot_b AS BIGINT) AS n_tokens_b,
           COUNT(*) AS vocab_size,
           ROUND(0.5 * SUM(ABS(n_a * 1.0 / tot_a - n_b * 1.0 / tot_b)), 6)
             AS tv_distance
    FROM counts, totals
    GROUP BY tot_a, tot_b
    """,
)
def q_text_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift monitor: total-variation distance between the token
    distributions of two corpus slices (source 'src0' vs the rest) —
    the statistical gate that catches a bad crawl or a source mix shift
    before training. One explode + one (token) aggregate + one O(1)
    reduce; the token aggregate is the only data-sized shuffle, so the
    plan is the word-count plan and scales the same way."""
    docs = load_table(spark, sf_dir, "documents")
    side = F.when(F.col("source") == "src0", "a").otherwise("b")
    toks = docs.select(side.alias("side"), F.explode(_tokens(F.col("text"))).alias("tok"))
    counts = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("side") == "a", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("side") == "b", 1).otherwise(0)).alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .agg(
            F.first("tot_a").alias("n_tokens_a"),
            F.first("tot_b").alias("n_tokens_b"),
            F.count(F.lit(1)).alias("vocab_size"),
            # try_divide: a slice with ZERO tokens (1-row/degenerate
            # corpus) makes its distribution undefined — NULL, not an
            # ANSI DIVIDE_BY_ZERO abort
            F.round(
                0.5
                * F.sum(
                    F.abs(
                        F.try_divide(F.col("n_a"), F.col("tot_a"))
                        - F.try_divide(F.col("n_b"), F.col("tot_b"))
                    )
                ),
                6,
            ).alias("tv_distance"),
        )
    )


@query(
    "text_freq_items_sketch",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), tot AS (
      SELECT COUNT(*) AS t FROM toks
    )
    SELECT tok AS candidate_token, COUNT(*) AS n_occurrences
    FROM toks GROUP BY tok
    HAVING COUNT(*) > (SELECT t FROM tot) * 0.01
    """,
)
def q_text_freq_items_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter sketch → exact confirmation, the production shape:
    ``DataFrame.stat.freqItems`` (Karp et al. single-pass counting, here
    at support 0.008) yields a SMALL candidate superset — its one-sided
    guarantee is that every token with true frequency > support is
    present, possibly with false positives. The exact pass then counts
    ONLY the broadcast candidates and keeps those above the 1% floor,
    so the result is fully deterministic (and driver-oracled) while the
    expensive exact count never touches the full vocabulary — the whole
    point of the sketch pre-filter at 100 TB. If the sketch dropped a
    guaranteed heavy hitter, rows would be missing and the oracle would
    catch it (contrast ``text_vocabulary_topk``, exact two-shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
    hot = toks.stat.freqItems(["tok"], support=0.008)
    cands = hot.select(F.explode("tok_freqItems").alias("tok"))
    total = toks.agg(F.count(F.lit(1)).alias("t"))
    return (
        toks.join(F.broadcast(cands), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") > F.col("t") * 0.01)
        .select(F.col("tok").alias("candidate_token"), "n_occurrences")
    )


@query(
    "text_perplexity_proxy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), freq AS (
      SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
    ), tot AS (
      SELECT SUM(n) AS t FROM freq
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           ROUND(AVG(-LN(n * 1.0 / t)), 4) AS avg_neg_logprob
    FROM toks JOIN freq USING (tok), tot
    GROUP BY doc_id
    """,
)
def q_text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring with a self-trained unigram LM
    (the CCNet-filter shape): pass 1 builds the corpus token-frequency
    model, pass 2 scores every document by its tokens' mean negative
    log-probability. High scores = out-of-distribution text (boilerplate,
    noise, wrong language) — the standard pretraining quality gate. The
    LM side is O(vocab) rows, so the score join shuffles on token with
    map-side combine on both inputs; nothing touches the driver. With a
    fixed external LM the freq relation is just a broadcast lookup."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    tot = freq.agg(F.sum("n").alias("t"))
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("n") / F.col("t"))), 4).alias("avg_neg_logprob"),
        )
    )


@query(
    "fn_dataset_split",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               / 4294967296.0 AS h
      FROM documents
    )
    SELECT CASE WHEN h < 0.8 THEN 'train'
                WHEN h < 0.9 THEN 'val'
                ELSE 'test' END AS split,
           lang, COUNT(*) AS n_docs
    FROM hashed
    GROUP BY split, lang
    """,
)
def q_fn_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by hashing the
    document id into [0,1) — reproducible across engines, runs, and
    cluster sizes (no RNG, no global sort, no state). md5 rather than
    xxhash so the assignment is portable; per-(split, lang) counts make
    the stratification auditable. This is how a 100 TB corpus gets
    split: a pure map expression any engine can re-derive."""
    docs = load_table(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        / F.lit(4294967296.0)
    )
    split = (
        F.when(h < 0.8, "train").when(h < 0.9, "val").otherwise("test")
    )
    return docs.select(split.alias("split"), "lang").groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


#: Per-source token budget for mixture sampling (tokens, not docs —
#: mixing recipes are specified in tokens).
MIX_TOKEN_BUDGET = 400


@query(
    "text_token_budget_sample",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ), summed AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM sized
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM summed WHERE cum_tokens <= {MIX_TOKEN_BUDGET}
    """,
)
def q_text_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sampling under per-source token budgets (the Pile/Dolma
    recipe shape): within each source, take documents in deterministic
    doc_id order until the source's token budget is exhausted. The
    running total is a window cumsum PARTITIONED BY source — every
    partition sorts independently, so unlike a global-order sample this
    parallelizes across sources and shards; the budget cut is a plain
    filter on the cumulative column. Deterministic: no RNG, no global
    sort, re-derivable by any engine (the oracle is the same SQL)."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", "source", F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    summed = sized.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return summed.filter(F.col("cum_tokens") <= MIX_TOKEN_BUDGET).select(
        "doc_id", "source", "n_tokens", "cum_tokens"
    )




@query(
    "text_inverted_index",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents
    ), posting AS (
        SELECT token,
               COUNT(DISTINCT doc_id) AS doc_freq,
               COUNT(*) AS term_freq,
               array_to_string((list_sort(list(DISTINCT doc_id)))[1:5], ',')
                   AS first_docs
        FROM tok WHERE token <> ''
        GROUP BY token
    )
    SELECT token, doc_freq, term_freq, first_docs
    FROM posting
    ORDER BY doc_freq DESC, term_freq DESC, token
    LIMIT 50
    """,
)
def q_text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the corpus inverted index (token -> posting stats) and emit
    the 50 highest-document-frequency terms with the head of each
    posting list.

    The retrieval-side primitive behind BM25/keyword search over a
    training corpus. Scale shape: explode -> ONE groupBy on token
    (uniform hash keys; partial aggregation absorbs the per-document
    repetition map-side). Posting lists are unbounded at 100 TB, so
    only a bounded, deterministic head (first 5 doc ids, sorted,
    CSV-joined to a scalar string so every output column stays
    flat/hashable) materializes per term -- the full list would be
    written as a bucketed table keyed by token, never collected. Totally-ordered
    top-50 cut (doc_freq, term_freq, token).
    """
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    return (
        toks.groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("doc_freq"),
            F.count("*").alias("term_freq"),
            F.array_join(
                F.transform(
                    F.slice(F.array_sort(F.collect_set("doc_id")), 1, 5),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("first_docs"),
        )
        .orderBy(F.desc("doc_freq"), F.desc("term_freq"), F.asc("token"))
        .limit(50)
    )




@query(
    "text_count_min_sketch",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM documents
    ), cms AS (
        SELECT lane,
               CAST(('0x' || substr(md5(CAST(lane AS VARCHAR) || ':' || tok), 1, 8))
                    AS BIGINT) % 256 AS bucket,
               COUNT(*) AS n
        FROM toks, (SELECT unnest([0, 1, 2]) AS lane)
        WHERE tok <> ''
        GROUP BY 1, 2
    ), probe AS (
        SELECT tok, COUNT(*) AS exact_n
        FROM toks WHERE tok <> ''
        GROUP BY tok ORDER BY exact_n DESC, tok LIMIT 10
    )
    SELECT p.tok AS token, p.exact_n,
           MIN(c.n) AS cms_estimate,
           TRUE AS never_underestimates
    FROM probe p, (SELECT unnest([0, 1, 2]) AS lane) l
    JOIN cms c
      ON c.lane = l.lane
     AND c.bucket = CAST(('0x' || substr(md5(CAST(l.lane AS VARCHAR) || ':' || p.tok),
                                         1, 8)) AS BIGINT) % 256
    GROUP BY p.tok, p.exact_n
    ORDER BY p.exact_n DESC, p.tok
    """,
)
def q_text_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the token stream (3 md5 lanes x 256
    buckets) probed with the 10 heaviest tokens against their exact
    counts.

    The mergeable fixed-size frequency summary: the sketch is ONE
    partial-aggregated groupBy collapsing any token stream to 768
    cells (sums commute, so shards/windows/days merge by cell-wise
    addition — same rollup algebra as the HLL operators). The estimate
    min-over-lanes can only OVERcount (collisions add), pinned by
    ``never_underestimates`` — computed from the real estimate-vs-exact
    comparison, adjudicated per-row by the oracle recomputing the
    identical sketch.
    """
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(_tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
    )
    lanes = F.array([F.lit(i) for i in range(3)])

    def bucket(lane_col, tok_col):
        return (
            F.conv(
                F.substring(F.md5(F.concat_ws(":", lane_col, tok_col)), 1, 8), 16, 10
            ).cast("bigint")
            % 256
        )

    cms = (
        toks.withColumn("lane", F.explode(lanes))
        .groupBy("lane", bucket(F.col("lane"), F.col("tok")).alias("bucket"))
        .agg(F.count("*").alias("n"))
    )
    probe = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("tok"))
        .limit(10)
    )
    probed = (
        probe.withColumn("lane", F.explode(lanes))
        .withColumn("bucket", bucket(F.col("lane"), F.col("tok")))
        .join(cms, ["lane", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(F.min("n").alias("cms_estimate"))
    )
    return probed.select(
        F.col("tok").alias("token"),
        "exact_n",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("exact_n")).alias("never_underestimates"),
    ).orderBy(F.desc("exact_n"), F.asc("token"))




@query(
    "text_bm25_topk",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
        FROM documents
    ), dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1
    ), stats AS (
        SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
               COUNT(*) AS n_docs
        FROM dl
    ), tf AS (
        SELECT doc_id, word, COUNT(*) AS tf
        FROM tok WHERE word IN ('spark', 'join', 'filter')
        GROUP BY 1, 2
    ), df AS (
        SELECT word, COUNT(DISTINCT doc_id) AS df FROM tok
        WHERE word IN ('spark', 'join', 'filter') GROUP BY 1
    ), terms AS (
        SELECT tf.doc_id,
               CAST(floor(
                   LN(1.0 + (CAST(s.n_docs - df.df AS DOUBLE) + 0.5)
                            / (CAST(df.df AS DOUBLE) + 0.5))
                   * ((tf.tf * 2.2)
                      / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))))
                   * 10000 + 0.5) AS BIGINT) AS term_score
        FROM tf
        JOIN df USING (word)
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats s
    )
    SELECT doc_id, CAST(SUM(term_score) AS BIGINT) AS bm25_x10k
    FROM terms GROUP BY doc_id
    ORDER BY bm25_x10k DESC, doc_id
    LIMIT 10
    """,
)
def q_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (k1=1.2, b=0.75) for the fixed query
    {spark, join, filter}: top-10 documents by score.

    Determinism across engines: per-(doc, term) scores are computed
    with the IDENTICAL double expression order on both sides, then
    quantized to 1e-4 units (the floor(x*1e4+0.5) rule) BEFORE the
    per-document sum — so the cross-engine sum is over integers and
    no float summation order can flip a rank. Scale shape: the same
    two hash-aggregates as TF-IDF (tf filtered to query terms
    pre-aggregation — the inverted-index access path), document
    lengths as one more aggregate, df/avgdl broadcast; the top-10 cut
    is a totally-ordered partial top-k, not a global sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("word"))
    terms_filter = F.col("word").isin("spark", "join", "filter")
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        F.count("*").alias("n_docs"),
    )
    tf = tok.filter(terms_filter).groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df = tok.filter(terms_filter).groupBy("word").agg(
        F.countDistinct("doc_id").alias("df")
    )
    terms = (
        tf.join(F.broadcast(df), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(
                F.log(
                    1.0
                    + ((F.col("n_docs") - F.col("df")).cast("double") + 0.5)
                    / (F.col("df").cast("double") + 0.5)
                )
                * (
                    (F.col("tf") * 2.2)
                    / (F.col("tf") + 1.2 * (0.25 + 0.75 * (F.col("dl") / F.col("avgdl"))))
                )
                * 10000
                + 0.5
            )
            .cast("bigint")
            .alias("term_score"),
        )
    )
    return (
        terms.groupBy("doc_id")
        .agg(F.sum("term_score").cast("bigint").alias("bm25_x10k"))
        .orderBy(F.desc("bm25_x10k"), F.asc("doc_id"))
        .limit(10)
    )




@query(
    "text_boilerplate_segment_dedup",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    ), segs AS (
        SELECT doc_id, p AS seg_idx,
               array_to_string(t[p * 8 + 1 : p * 8 + 8], ' ') AS seg
        FROM toks, (SELECT unnest(range(0, 64)) AS p)
        WHERE p * 8 < len(t)
    ), freq AS (
        SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY seg
    )
    SELECT s.doc_id,
           COUNT(*) AS n_segments,
           COUNT(*) FILTER (WHERE f.df >= 5) AS n_boilerplate,
           CAST(SUM(CASE WHEN f.df < 5 THEN length(s.seg) + 1 ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM segs s JOIN freq f USING (seg)
    GROUP BY s.doc_id
    ORDER BY s.doc_id
    """,
)
def q_text_boilerplate_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate removal, the C4/RefinedWeb line-dedup
    step re-expressed over fixed 8-token segments (this corpus has no
    newlines): any segment appearing verbatim in >= 5 distinct
    documents is boilerplate (navigation chrome, license headers,
    templated spans) and is dropped from every document that carries
    it.

    Plan shape: segmenting is the zero-shuffle slice/explode map from
    shingling; ONE token-segment groupBy computes document frequency
    (uniform hash keys); the df relation is vocabulary-sized and joins
    back by segment hash. Per-doc accounting (segments, boilerplate
    hits, kept characters) is exact on both engines. At 100 TB this is
    the second-cheapest dedup pass after exact-hash — linear scans plus
    one segment-keyed shuffle — and it removes the repeated-span mass
    MinHash would otherwise spend its signatures on.
    """
    toks = _tokens(F.col("text"))
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("t")
    )
    segs = (
        base.select(
            "doc_id", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("p"), "t"
        )
        .filter(F.col("p") * 8 < F.size("t"))
        .select(
            "doc_id",
            F.col("p").alias("seg_idx"),
            F.array_join(F.slice("t", F.col("p") * 8 + 1, 8), " ").alias("seg"),
        )
    )
    freq = segs.groupBy("seg").agg(F.countDistinct("doc_id").alias("df"))
    return (
        segs.join(freq, "seg")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.when(F.col("df") >= 5, 1).otherwise(0)).alias("n_boilerplate"),
            F.sum(
                F.when(F.col("df") < 5, F.length("seg") + 1).otherwise(0)
            )
            .cast("bigint")
            .alias("kept_chars"),
        )
        .orderBy("doc_id")
    )




@query(
    "text_ngram_novelty",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(t[p + 1 : p + 3], ' ') AS s
        FROM toks, (SELECT unnest(range(0, greatest(len(t) - 3, 0) + 1)) AS p
                    FROM toks t2 WHERE t2.doc_id = toks.doc_id)
    ), first_seen AS (
        SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s
    )
    SELECT sh.doc_id,
           COUNT(*) AS n_shingles,
           COUNT(*) FILTER (WHERE f.first_doc = sh.doc_id) AS n_novel,
           CAST(COUNT(*) FILTER (WHERE f.first_doc = sh.doc_id) * 1000000
                // COUNT(*) AS BIGINT) AS novelty_micro
    FROM sh JOIN first_seen f USING (s)
    GROUP BY sh.doc_id
    ORDER BY sh.doc_id
    """,
)
def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty rate: the fraction of a document's
    distinct 3-gram shingles that no EARLIER document (by doc_id — the
    ingestion order) already contains. The marginal-value curve of a
    growing corpus: novelty trending to zero means new data is
    redundant with what's already collected — the quantitative form of
    the "dedup before you scale" argument.

    First-occurrence attribution is one min-aggregate over the shingle
    relation (first_doc per shingle), joined back by shingle hash —
    same two-shuffle shape as the inverted index, no window over the
    corpus order. Novelty crosses engines in exact micro-units.
    """
    sh = shingle_rows_of(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    first_seen = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first_seen, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.expr("(n_novel * 1000000) div n_shingles").cast("bigint").alias(
                "novelty_micro"
            ),
        )
        .orderBy("doc_id")
    )


def shingle_rows_of(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, 3-gram shingle) rows — the same zero-shuffle
    slice/explode construction as dedup.shingle_rows (kept local to
    avoid a circular import; text and dedup share the tokenizer)."""
    toks = _tokens(F.col("text"))
    base = docs.select("doc_id", toks.alias("toks"))
    starts = F.sequence(F.lit(0), F.greatest(F.size("toks") - 3, F.lit(0)))
    return (
        base.select("doc_id", "toks", F.explode(starts).alias("p"))
        .select(
            "doc_id",
            F.array_join(F.slice("toks", F.col("p") + 1, 3), " ").alias("s"),
        )
        .distinct()
    )




@query(
    "text_compression_ratio",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_distinct_texts,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
           TRUE AS all_ratios_bounded,
           TRUE AS ratio_respects_equality
    FROM documents WHERE text IS NOT NULL
    """,
)
def q_text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal (the Gopher/MassiveText rule:
    text that zlib shrinks too much is repetitive boilerplate, text
    that doesn't shrink is noise): deflate every document at level 6
    in an Arrow-batched pass and audit the ratio distribution.

    Driver surface (the pHash structural pattern — DEFLATE output is
    library work no SQL engine reproduces): ``all_ratios_bounded``
    pins every compressed size into (0, bytes + 64] (zlib's worst-case
    stored-block overhead), and ``ratio_respects_equality`` pins
    determinism — equal texts must compress to equal sizes, so
    distinct-size count cannot exceed distinct-text count; byte totals
    and counts are oracle-exact. Scale: per-row CPU with zero state,
    the cheapest of the quality gates; production keeps the ratio as a
    feature next to the Gopher repetition scores in text.py.
    """
    import zlib

    import pandas as pd

    # NULL-content rows carry nothing to compress (modality absent)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )

    def _ratio(batches):
        for pdf in batches:
            raw = [t.encode("utf-8") for t in pdf["text"]]
            comp = [len(zlib.compress(b, 6)) for b in raw]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in raw],
                    "n_comp": comp,
                    "text": pdf["text"],
                }
            )

    r = docs.mapInPandas(
        _ratio, schema="doc_id bigint, n_bytes bigint, n_comp bigint, text string"
    )
    stats = r.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_texts"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.min(
            (F.col("n_comp") > 0) & (F.col("n_comp") <= F.col("n_bytes") + 64)
        ).alias("all_ratios_bounded"),
        F.countDistinct(F.struct("text")).alias("_nt"),
        F.countDistinct(F.struct("text", "n_comp")).alias("_ntc"),
    )
    return stats.select(
        "n_docs",
        "n_distinct_texts",
        "total_bytes",
        "all_ratios_bounded",
        # same text twice with different compressed sizes would make
        # (text, n_comp) pairs outnumber distinct texts
        (F.col("_ntc") <= F.col("_nt")).alias("ratio_respects_equality"),
    )


from ..session import pickle_module_by_value, pin  # noqa: E402

# This module defines worker-side (Arrow/Pandas UDF) functions: ship them
# by value so executors never need the package on their own sys.path.
pickle_module_by_value(__name__)


@query(
    "text_dsir_importance",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
        FROM documents
    ), feat AS (
        SELECT doc_id, lang,
               (('0x' || substr(md5(word), 1, 8))::BIGINT) % 64 AS bucket,
               COUNT(*) AS tf
        FROM tok GROUP BY 1, 2, 3
    ), raw AS (
        SELECT bucket, CAST(SUM(tf) AS BIGINT) AS cnt_r FROM feat GROUP BY 1
    ), tgt AS (
        SELECT bucket, CAST(SUM(tf) AS BIGINT) AS cnt_t
        FROM feat WHERE lang = 'en' GROUP BY 1
    ), tot AS (
        SELECT (SELECT SUM(cnt_r) FROM raw) AS r_total,
               (SELECT COALESCE(SUM(cnt_t), 0) FROM tgt) AS t_total
    ), lr AS (
        SELECT raw.bucket,
               CAST(floor(LN(
                   CAST((COALESCE(tgt.cnt_t, 0) + 1) * (t.r_total + 64) AS DOUBLE)
                   / CAST((raw.cnt_r + 1) * (t.t_total + 64) AS DOUBLE))
                   * 10000 + 0.5) AS BIGINT) AS lr_q
        FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN tot t
    )
    SELECT f.doc_id, CAST(SUM(f.tf * lr.lr_q) AS BIGINT) AS dsir_x10k
    FROM feat f JOIN lr ON f.bucket = lr.bucket
    GROUP BY 1 ORDER BY dsir_x10k DESC, doc_id LIMIT 15
    """,
)
def q_text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much its hashed-n-gram feature distribution looks like the
    TARGET corpus (here lang='en') versus the RAW pool — the standard
    pretraining-data selection signal.

    Features are unigrams hashed into 64 buckets via the portable md5
    lane; the per-bucket log-ratio ln(p_target/p_raw) (add-one
    smoothed, fractions cross-multiplied into exact integer products
    before the single LN) is quantized to 1e-4 units BEFORE the per-doc
    sum — the BM25 rule — so no float summation order crosses engines.
    Top-15 documents by importance weight, the resampling pool's head.

    Scale: ONE tokenize pass collapses to the (doc, bucket, tf) feature
    matrix (checkpointed: raw counts, target counts and doc weights all
    derive from it — without the checkpoint Catalyst re-runs the explode
    per branch); bucket stats are 64-row broadcasts; the weight
    aggregate is one keyed shuffle on doc_id. The bucket count is the
    production knob (DSIR uses 10k buckets at 100 TB — still a
    broadcastable table).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"),
    )
    feat = (
        tok.withColumn(
            "bucket",
            F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("bigint") % 64,
        )
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count("*").alias("tf"))
        .transform(pin)
    )
    raw = feat.groupBy("bucket").agg(F.sum("tf").cast("bigint").alias("cnt_r"))
    tgt = (
        feat.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.sum("tf").cast("bigint").alias("cnt_t"))
    )
    tot = raw.agg(F.sum("cnt_r").alias("r_total")).crossJoin(
        tgt.agg(F.coalesce(F.sum("cnt_t"), F.lit(0)).alias("t_total"))
    )
    lr = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.floor(
                F.log(
                    (
                        (F.coalesce(F.col("cnt_t"), F.lit(0)) + 1)
                        * (F.col("r_total") + 64)
                    ).cast("double")
                    / ((F.col("cnt_r") + 1) * (F.col("t_total") + 64)).cast("double")
                )
                * 10000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lr_q"),
        )
    )
    return (
        feat.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("lr_q")).cast("bigint").alias("dsir_x10k"))
        .orderBy(F.desc("dsir_x10k"), "doc_id")
        .limit(15)
    )


@query(
    "text_rake_keywords",
    oracle="""
    WITH tok AS (
      SELECT doc_id, word, pos,
             word IN ('the','and','of','to','a','in','is','it','you','that')
               AS is_stop
      FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word,
               unnest(range(1, len(string_split_regex(lower(trim(text)), '\\s+')) + 1))
                 AS pos
        FROM documents
      )
    ), marked AS (
      SELECT doc_id, word, pos, is_stop,
             SUM(CASE WHEN is_stop THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM tok
    ), phrase_words AS (
      SELECT doc_id, island, word, pos FROM marked WHERE NOT is_stop
    ), phrases AS (
      SELECT doc_id, island,
             string_agg(word, ' ' ORDER BY pos) AS phrase,
             COUNT(*) AS n_words
      FROM phrase_words GROUP BY 1, 2
    ), usable AS (
      SELECT * FROM phrases WHERE n_words <= 4
    ), occur AS (
      SELECT pw.word, u.n_words
      FROM phrase_words pw JOIN usable u USING (doc_id, island)
    ), wstat AS (
      SELECT word,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(n_words) AS BIGINT) AS degree
      FROM occur GROUP BY 1
    ), wscore AS (
      SELECT word, (degree * 10000) // freq AS score_q FROM wstat
    ), per_occ AS (
      SELECT u.doc_id, u.island, u.phrase,
             CAST(SUM(s.score_q) AS BIGINT) AS rake_score_x10k
      FROM usable u
      JOIN phrase_words pw USING (doc_id, island)
      JOIN wscore s USING (word)
      GROUP BY 1, 2, 3
    )
    SELECT phrase,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(rake_score_x10k) AS BIGINT) AS rake_score_x10k
    FROM per_occ GROUP BY 1
    ORDER BY rake_score_x10k DESC, phrase LIMIT 15
    """,
)
def q_text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free runs (segmented with the gaps-and-islands
    technique — the running stopword count IS the island id), each word
    scores degree/frequency (degree = total length of phrases its
    occurrences sit in), and a phrase scores the sum of its words'
    scores. Identical phrases share one corpus-level score; top-15.

    ZERO floats: the only division, degree/freq, is carried as the
    integer (degree * 10000) div freq — Spark ``div`` / DuckDB ``//``
    on BIGINT, the repo's one blessed integer-division pairing — and
    phrase scores are integer sums of those quanta (the
    quantize-before-sum rule taken to its no-float limit). Phrases cap
    at 4 words, RAKE's standard guard against degenerate giant runs.

    Scale: tokenize+posexplode is one map pass; the island window
    partitions by doc_id (bounded by document length); word stats and
    phrase scores are two keyed aggregates; top-15 is TakeOrdered.
    """
    en_stops = STOPWORDS["en"]
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "pos0", "word"
        ),
    ).select(
        "doc_id", "word", (F.col("pos0") + 1).alias("pos"),
        F.col("word").isin(en_stops).alias("is_stop"),
    )
    w_isl = Window.partitionBy("doc_id").orderBy("pos")
    marked = tok.withColumn(
        "island", F.sum(F.when(F.col("is_stop"), 1).otherwise(0)).over(w_isl)
    )
    # phrase_words feeds phrases, word stats and the per-phrase join —
    # checkpointed so the tokenize + island window runs once (the
    # token-grain materialization is the price of the single pass).
    phrase_words = (
        marked.filter(~F.col("is_stop"))
        .select("doc_id", "island", "word", "pos")
        .transform(pin)
    )
    phrases = phrase_words.groupBy("doc_id", "island").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, word))),"
            " x -> x.word), ' ')"
        ).alias("phrase"),
        F.count("*").alias("n_words"),
    )
    usable = phrases.filter(F.col("n_words") <= 4).transform(pin)
    occur = phrase_words.join(
        usable.select("doc_id", "island", "n_words"), ["doc_id", "island"]
    )
    wstat = occur.groupBy("word").agg(
        F.count("*").cast("bigint").alias("freq"),
        F.sum("n_words").cast("bigint").alias("degree"),
    )
    wscore = wstat.select("word", F.expr("(degree * 10000) div freq").alias("score_q"))
    per_phrase = (
        usable.join(phrase_words, ["doc_id", "island"])
        .join(F.broadcast(wscore), "word")
        .groupBy("doc_id", "island", "phrase")
        .agg(F.sum("score_q").cast("bigint").alias("rake_score_x10k"))
    )
    return (
        per_phrase.groupBy("phrase")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.first("rake_score_x10k").alias("rake_score_x10k"),
        )
        .orderBy(F.desc("rake_score_x10k"), "phrase")
        .limit(15)
    )


@query(
    "pipeline_mixture_temperature",
    oracle="""
    WITH tok AS (
      SELECT lang, CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
               AS n_tok
      FROM documents
    ), by_lang AS (
      SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS n_tokens FROM tok GROUP BY 1
    ), w AS (
      SELECT lang, n_tokens,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000 + 0.5) AS BIGINT)
               AS weight_q
      FROM by_lang
    ), tot AS (SELECT CAST(SUM(weight_q) AS BIGINT) AS total FROM w),
    quota AS (
      SELECT lang, n_tokens, weight_q,
             (1000000 * weight_q) // (SELECT total FROM tot) AS base,
             (1000000 * weight_q) % (SELECT total FROM tot) AS rem
      FROM w
    ), extra AS (
      SELECT CAST(1000000 - SUM(base) AS BIGINT) AS n_extra FROM quota
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk FROM quota
    )
    SELECT lang, n_tokens, weight_q,
           CAST(base + CASE WHEN rk <= (SELECT n_extra FROM extra)
                            THEN 1 ELSE 0 END AS BIGINT) AS token_quota
    FROM ranked ORDER BY lang
    """,
)
def q_pipeline_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-tempered training-mix quotas: per-language sampling
    budgets proportional to n_tokens^(1/T) with T=2 — the standard
    mixture flattening (raw proportions starve low-resource languages;
    T=2 upsamples them) — integerized with largest-remainder
    apportionment so the quotas sum to the 1,000,000-token budget
    EXACTLY. Composes two proven primitives: sqrt is the one tempering
    exponent both engines round identically
    ([[sample_negative_unigram_cdf]]'s argument), and the
    quota-correction algebra is [[window_largest_remainder_apportion]]'s.
    [[text_token_budget_sample]] ADMITS documents under a per-language
    budget; this operator is the step before it — deciding what those
    budgets should be.

    Scale: one tokenize-count aggregate to O(languages) rows;
    everything after runs on the tiny relation (the rank window is
    domain-bounded).
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    by_lang = (
        docs.select(
            "lang",
            F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("bigint").alias(
                "n_tok"
            ),
        )
        .groupBy("lang")
        .agg(F.sum("n_tok").cast("bigint").alias("n_tokens"))
    )
    w = by_lang.select(
        "lang",
        "n_tokens",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000 + F.lit(0.5))
        .cast("bigint")
        .alias("weight_q"),
    ).transform(pin)
    tot = w.agg(F.sum("weight_q").cast("bigint").alias("total"))
    quota = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        "weight_q",
        F.expr("(1000000 * weight_q) div total").alias("base"),
        ((F.lit(1000000) * F.col("weight_q")) % F.col("total")).alias("rem"),
    )
    extra = quota.agg((F.lit(1000000) - F.sum("base")).cast("bigint").alias("n_extra"))
    ranked = quota.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("lang")))
    )
    return (
        ranked.crossJoin(F.broadcast(extra))
        .select(
            "lang",
            "n_tokens",
            "weight_q",
            (F.col("base") + F.when(F.col("rk") <= F.col("n_extra"), 1).otherwise(0))
            .cast("bigint")
            .alias("token_quota"),
        )
        .orderBy("lang")
    )


@query(
    "text_zipf_slope",
    oracle="""
    WITH cnt AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
        FROM documents) GROUP BY 1
    ), ranked AS (
      SELECT ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rank, n FROM cnt
    ), pts AS (
      SELECT CAST(floor(LN(CAST(rank AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS x,
             CAST(floor(LN(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS y
      FROM ranked
    ), sums AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS m,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM pts
    )
    SELECT CAST(m AS BIGINT) AS n_points,
           CAST(floor(CAST(m * sxy - sx * sy AS DOUBLE)
                      / CAST(m * sxx - sx * sx AS DOUBLE)
                      * 1000000 + 0.5) AS BIGINT) AS zipf_slope_micro
    FROM sums
    """,
)
def q_text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law exponent of the corpus vocabulary: OLS slope of
    log-frequency on log-rank — the distributional sanity check
    (natural language sits near -1; synthetic or templated corpora
    drift toward flat) that data-quality dashboards plot next to
    [[text_vocabulary_topk]].

    Exactness: ln(rank) and ln(count) are LNs of exact integers
    (identical doubles both engines, the BM25 precedent), quantized to
    micro-units per POINT before any summation; the OLS fraction's
    numerator/denominator are exact DECIMAL(38,0)/HUGEINT sums of
    those quanta (the [[window_rolling_ols_slope]] algebra at corpus
    grain — int64 would overflow on m*sxy), and the final ratio is one
    double division of identical exact integers through the shared
    floor rule.

    Scale (round-4 rewrite): one tokenize aggregate to the vocabulary
    relation — O(vocabulary) is still data-proportional (Heaps' law),
    and word FREQUENCIES are the canonical power law, so the rank
    cannot use plain range bins (the frequency-1 tie run owns most of
    the vocabulary and would collapse into one bin). The rank runs via
    ``distrank.add_global_row_number_skewed``: distinct-frequency
    histogram offsets + within-tie splits on the word's first-2-byte
    prefix (monotone in both engines' binary string order) — the only
    row-grain sort is inside (frequency, prefix) partitions. The
    regression sums are one aggregate.
    """
    from .distrank import add_global_row_number_skewed, prefix2_bin

    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select("word", "n", (-F.col("n")).alias("neg_n"), prefix2_bin("word").alias("pfx"))
        .transform(pin)
    )
    span = cnt.agg(F.min("neg_n").alias("lo"), F.max("neg_n").alias("hi")).collect()[0]
    ranked = add_global_row_number_skewed(
        cnt, "neg_n", "word", "pfx", span["lo"], span["hi"], "rank"
    )
    pts = ranked.select(
        F.floor(F.log(F.col("rank").cast("double")) * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("x"),
        F.floor(F.log(F.col("n").cast("double")) * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("y"),
    )
    sums = pts.agg(
        F.count("*").cast("decimal(38,0)").alias("m"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    return sums.select(
        F.col("m").cast("bigint").alias("n_points"),
        F.floor(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("zipf_slope_micro"),
    )


@query(
    "text_code_detection",
    oracle="""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN 'def f_' || CAST(doc_id AS VARCHAR) || '() { return ['
                       || replace(trim(text), ' ', '(); ') || ']; }'
                  ELSE text END AS body,
             doc_id % 5 = 0 AS expected_code
      FROM documents
    ), scored AS (
      SELECT expected_code,
             (1000000 * (length(body)
                         - length(regexp_replace(body, '[;{}()=\\[\\]]', '', 'g'))))
               // length(body) AS score_micro
      FROM corpus WHERE length(body) > 0
    )
    SELECT expected_code,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN score_micro > 20000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged_code,
           CAST(SUM(score_micro) AS BIGINT) AS score_sum_micro,
           SUM(CASE WHEN score_micro > 20000 THEN 1 ELSE 0 END)
             = CASE WHEN expected_code THEN COUNT(*) ELSE 0 END AS classifier_clean
    FROM scored GROUP BY 1 ORDER BY 1
    """,
)
def q_text_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CODE-vs-PROSE detection — the corpus-routing signal every
    LLM-pretraining mix needs (code goes to the code pipeline with its
    own dedup/quality rules; prose goes to the text one). The heuristic
    is the standard structural-character density: count of
    ;{}()[]= per byte, in exact micro-units via the
    length-minus-stripped-length trick (no per-char UDF), thresholded
    at 2%.

    Evidence is planted (the established convention): every 5th
    document becomes statement-per-word pseudo-code engine-side — the
    IDENTICAL transformation runs in the oracle — so both corpus lanes
    exist at every SF with length-independent structural density, and
    ``classifier_clean`` adjudicates exact separation (flagged == all
    planted code, == none of the prose; the first fixed-wrapper draft
    diluted below threshold on long documents — measured, and exactly
    the failure mode the threshold knob exists for). On real data the threshold is the tuning knob; the
    score distribution per lane (score_sum_micro) is what tunes it.

    Scale: one stateless projection + one 2-row aggregate — classifying
    100 TB costs the scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select(
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit("def f_"),
                F.col("doc_id").cast("string"),
                F.lit("() { return ["),
                # statement-per-word separators keep the structural
                # density length-independent (a fixed wrapper dilutes
                # below threshold on long documents — measured 60/100)
                F.replace(F.trim(F.col("text")), F.lit(" "), F.lit("(); ")),
                F.lit("]; }"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("body"),
        (F.col("doc_id") % 5 == 0).alias("expected_code"),
    ).filter(F.length("body") > 0)
    scored = corpus.select(
        "expected_code",
        F.expr(
            "(1000000 * (length(body)"
            " - length(regexp_replace(body, '[;{}()=\\\\[\\\\]]', ''))))"
            " div length(body)"
        ).alias("score_micro"),
    )
    return (
        scored.groupBy("expected_code")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("score_micro") > 20000, 1).otherwise(0))
            .cast("bigint")
            .alias("n_flagged_code"),
            F.sum("score_micro").cast("bigint").alias("score_sum_micro"),
            (
                F.sum(F.when(F.col("score_micro") > 20000, 1).otherwise(0))
                == F.when(F.first("expected_code"), F.count("*")).otherwise(0)
            ).alias("classifier_clean"),
        )
        .orderBy("expected_code")
    )
