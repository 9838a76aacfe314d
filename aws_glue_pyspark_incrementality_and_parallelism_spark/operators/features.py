"""Feature-engineering operators: the tabular-ML preprocessing a
training-data pipeline runs right before examples leave the lake.

Three canonical transforms, each expressed as pure DataFrame algebra
(no UDFs — every computation is a JVM-side aggregate or hash):

* **Leave-one-out target encoding** — replace a categorical with the
  mean of the target over all OTHER rows of the same category. The
  standard high-cardinality encoder (one groupBy, then a broadcast
  map-back); LOO rather than plain mean so the encoding of a row never
  leaks its own label.
* **Feature hashing (the hashing trick)** — project an unbounded token
  vocabulary into a fixed number of buckets with a hash, trading
  collisions for a bounded, vocabulary-free feature space. One explode
  + one groupBy; no vocabulary table to build, ship, or version — the
  property that makes it the default at 100 TB.
* **Systematic sampling** — every k-th row of a keyed total order.
  Computed WITHOUT a global one-partition window: deterministic
  key-range bins give each row a bin-local rank (parallel window per
  bin) plus a bin-offset prefix sum (O(bins) driver state) — the same
  distributed-rank technique as text.py's sequence packing.

Reference parity: none of this exists in the reference (its ML story
ends at a Redshift load, glue_rds_to_redshift.py:66); LLM-pipeline
extension mandate (BASELINE.json:6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import query
from ..session import pin
from ..sources.io import load_table

HASH_BUCKETS = 64
SAMPLE_EVERY = 97
RANK_BINS = 16


@query(
    "feat_target_encoding_loo",
    oracle="""
    WITH lab AS (
        SELECT o_orderpriority AS category,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ), stats AS (
        SELECT category, COUNT(*) AS n_cat, SUM(y) AS sum_y
        FROM lab GROUP BY category
    )
    SELECT l.category, l.y,
           COUNT(*) AS n_rows,
           CAST((s.sum_y - l.y) * 1000000 // (s.n_cat - 1) AS BIGINT)
               AS loo_encoding_micro
    FROM lab l JOIN stats s USING (category)
    GROUP BY l.category, l.y, s.sum_y, s.n_cat
    ORDER BY l.category, l.y
    """,
)
def q_feat_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of ``o_orderpriority`` against the
    binary target ``o_orderstatus = 'F'`` (order fully shipped).

    For a binary target the LOO encoding takes exactly two values per
    category — (sum−1)/(n−1) for positive rows, sum/(n−1) for negative
    — so the verification surface groups to 2 rows per category with
    the encoding emitted in exact micro-units (integer floor-division
    on both engines; no float division crosses the comparison).

    Scale shape: one partial-aggregated groupBy over the fact table,
    then the per-(category, y) encoding is computed INSIDE the
    aggregate domain — the per-row map-back (a broadcast join of the
    tiny stats table, category cardinality rows) is how the encoded
    column would attach in the real pipeline.
    """
    lab = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("category"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    stats = lab.groupBy("category").agg(
        F.count("*").alias("n_cat"), F.sum("y").alias("sum_y")
    )
    return (
        lab.join(F.broadcast(stats), "category")
        .groupBy("category", "y", "sum_y", "n_cat")
        .agg(F.count("*").alias("n_rows"))
        .select(
            "category",
            "y",
            "n_rows",
            # integer DIV on both engines: no float quotient crosses the
            # compare; a single-member category has no leave-one-out
            # peers — encoding undefined (NULL), not a div-by-zero abort
            F.expr(
                "CASE WHEN n_cat > 1 "
                "THEN ((sum_y - y) * 1000000) div (n_cat - 1) END"
            )
            .cast("bigint")
            .alias("loo_encoding_micro"),
        )
        .orderBy("category", "y")
    )


@query(
    "feat_hashing_trick",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(lower(p_type), ' ')) AS token
        FROM part
    )
    SELECT CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 64 AS bucket,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT token) AS n_distinct_tokens
    FROM tok WHERE token <> ''
    GROUP BY 1 ORDER BY 1
    """,
)
def q_feat_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash ``p_type`` tokens into a fixed 64-bucket feature space and
    profile the bucket histogram (total and distinct tokens per bucket
    — the collision profile the trick trades for boundedness).

    The bucket hash is the repo's portable md5→u32 lane (same
    construction as governance.py's split lanes) so DuckDB computes the
    identical bucket for every token. No vocabulary state anywhere:
    the plan is explode → partial-agg groupBy — vocabulary growth
    changes nothing about the shape, which is why feature hashing is
    the 100 TB default over index-based encoders.
    """
    tok = (
        load_table(spark, sf_dir, "part")
        .select(F.explode(F.split(F.lower(F.col("p_type")), " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("bigint")
        % HASH_BUCKETS
    )
    return (
        tok.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("token").alias("n_distinct_tokens"),
        )
        .orderBy("bucket")
    )


@query(
    "sample_systematic_every_k",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM (
        SELECT o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
        FROM orders
    )
    WHERE (rn - 1) % 97 = 0
    """,
)
def q_sample_systematic_every_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 97th order in orderkey rank — systematic sampling over a
    total order, computed scale-safe.

    ``Window.orderBy`` with no partition key funnels the whole table
    through ONE task; instead the global rank is assembled from
    deterministic key-range bins: ``bin = o_orderkey // ceil((max+1)/16)``
    (one tiny max-aggregate), a bin-local ``row_number`` (parallel — 16
    independent window partitions), and each bin's starting offset from
    the O(bins) running count of earlier bins (window over the 16-row
    bin-size aggregate; only bin counts cross stages, never rows).
    Identical technique to text.py's distributed prefix-sum packing;
    the oracle states the intent directly with the single-order window.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    if max_key is None:  # empty relation (a no-new-rows incremental run)
        max_key = 0
    bin_width = max_key // RANK_BINS + 1
    binned = orders.withColumn("bin", (F.col("o_orderkey") / bin_width).cast("bigint"))

    bin_sizes = binned.groupBy("bin").agg(F.count("*").alias("n"))
    offsets = bin_sizes.select(
        "bin",
        (
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).alias("offset"),
    )

    local = binned.withColumn(
        "rn_local", F.row_number().over(Window.partitionBy("bin").orderBy("o_orderkey"))
    )
    return (
        local.join(F.broadcast(offsets), "bin")
        .withColumn("rn", F.col("rn_local") + F.col("offset"))
        .filter((F.col("rn") - 1) % SAMPLE_EVERY == 0)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "sample_balanced_classes",
    oracle="""
    WITH lane AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':bal'), 1, 8))
                  AS BIGINT) AS u
      FROM documents
    ), before AS (
      SELECT lang, COUNT(*) AS n_before FROM documents GROUP BY lang
    ), tgt AS (
      SELECT MIN(n_before) AS target FROM before
    ), ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rn
      FROM lane
    )
    SELECT r.lang,
           b.n_before,
           COUNT(*) AS n_kept,
           CAST(SUM(r.doc_id) AS BIGINT) AS kept_id_sum
    FROM ranked r
    JOIN before b USING (lang), tgt
    WHERE r.rn <= tgt.target
    GROUP BY r.lang, b.n_before
    """,
)
def q_sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling — the training-mix primitive for a
    skewed label column (here ``lang``): every class is cut to the
    MINORITY class's size by keeping, per class, the rows with the
    smallest deterministic md5 lane (a reproducible uniform draw, so
    reruns and backfills select the identical subset — the property
    that makes the resulting training set versionable without storing
    row lists). The kept-id checksum lets a downstream job verify it
    reconstructed the same subset.

    Plan: one domain-bounded class census (broadcast back as a scalar
    target), then a per-class ROW_NUMBER over the hash lane. The
    window is a per-class sort: at 100 TB this becomes the partial
    top-K aggregate (per-partition K-heaps merged in the reduce — the
    `sort_limit_topk` plan family) since target ≪ class size; the
    lane itself needs no shuffle. All counters exact integers."""
    docs = load_table(spark, sf_dir, "documents")
    lane = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":bal"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    tagged = docs.select("doc_id", "lang", lane.alias("u"))
    before = docs.groupBy("lang").agg(F.count("*").alias("n_before"))
    target = before.agg(F.min("n_before").alias("target"))
    ranked = tagged.withColumn(
        "rn", F.row_number().over(Window.partitionBy("lang").orderBy("u", "doc_id"))
    )
    return (
        ranked.crossJoin(F.broadcast(target))
        .filter(F.col("rn") <= F.col("target"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"), F.sum("doc_id").alias("kept_id_sum"))
        .join(F.broadcast(before), "lang")
        .select("lang", "n_before", "n_kept", "kept_id_sum")
    )


@query(
    "sample_negative_unigram_cdf",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
      FROM documents
    ), cnt AS (
      SELECT word, COUNT(*) AS n FROM tok GROUP BY 1
    ), vocab AS (
      SELECT word, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS w_q
      FROM cnt ORDER BY n DESC, word LIMIT 50
    ), cdf AS (
      SELECT word, w_q,
             SUM(w_q) OVER (ORDER BY w_q DESC, word) AS hi,
             SUM(w_q) OVER (ORDER BY w_q DESC, word) - w_q AS lo
      FROM vocab
    ), tot AS (SELECT CAST(SUM(w_q) AS BIGINT) AS total FROM vocab),
    draws AS (
      SELECT (('0x' || substr(md5('neg' || CAST(i AS VARCHAR)), 1, 8))::BIGINT)
               % (SELECT total FROM tot) AS u
      FROM range(0, 1000) t(i)
    ), hits AS (
      SELECT c.word, COUNT(*) AS n_drawn
      FROM draws d JOIN cdf c ON d.u >= c.lo AND d.u < c.hi
      GROUP BY 1
    )
    SELECT c.word, c.w_q,
           CAST(COALESCE(h.n_drawn, 0) AS BIGINT) AS n_drawn
    FROM cdf c LEFT JOIN hits h ON c.word = h.word
    ORDER BY c.word
    """,
)
def q_sample_negative_unigram_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative sampling from a tempered unigram distribution (the
    word2vec/contrastive-training noise distribution): 1000 draws from
    the top-50 vocabulary weighted by count^0.5, via inverse-CDF range
    lookup. Tempering flattens the head so frequent words don't
    monopolize the negatives; 0.5 (not word2vec's 0.75) is deliberate —
    sqrt is IEEE-correctly-rounded so both engines quantize identical
    weights, while pow(x, 0.75) carries a cross-engine last-ulp hazard
    the repo's exactness rules exclude.

    Draw i maps to u = md5('neg'||i) % total, then to the vocabulary
    row whose cumulative range [lo, hi) contains u — reproducible,
    growth-stable draws, zero RNG state. The full 50-row vocabulary is
    emitted with zero-draw rows materialized (grid completion), so the
    oracle adjudicates the whole CDF, not just the hit set.

    Scale: the vocabulary CDF is O(vocab) and broadcasts; draws resolve
    via broadcast range probe (at a 100k-word vocabulary the probe
    becomes a bucketized range join — the join_interval_binned
    technique — never a shuffle of the draw stream).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    )
    cnt = tok.groupBy("word").agg(F.count("*").alias("n"))
    # vocab feeds the CDF (used twice) and the total — checkpointed so
    # the corpus tokenize + top-k runs once, not three times.
    vocab = (
        cnt.orderBy(F.desc("n"), "word")
        .limit(50)
        .select(
            "word",
            "n",
            F.floor(F.sqrt(F.col("n").cast("double")) * 1000 + F.lit(0.5))
            .cast("bigint")
            .alias("w_q"),
        )
        .transform(pin)
    )
    w = Window.orderBy(F.desc("w_q"), F.asc("word"))
    cdf = vocab.select(
        "word",
        "w_q",
        F.sum("w_q").over(w).alias("hi"),
        (F.sum("w_q").over(w) - F.col("w_q")).alias("lo"),
    )
    tot = vocab.agg(F.sum("w_q").cast("bigint").alias("total"))
    draws = (
        spark.range(1000)
        .crossJoin(F.broadcast(tot))
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("neg"), F.col("id").cast("string"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("total")
            ).alias("u")
        )
    )
    hits = (
        draws.crossJoin(F.broadcast(cdf))
        .filter((F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi")))
        .groupBy("word")
        .agg(F.count("*").alias("n_drawn"))
    )
    return (
        cdf.join(hits, "word", "left")
        .select(
            "word",
            "w_q",
            F.coalesce(F.col("n_drawn"), F.lit(0)).cast("bigint").alias("n_drawn"),
        )
        .orderBy("word")
    )
