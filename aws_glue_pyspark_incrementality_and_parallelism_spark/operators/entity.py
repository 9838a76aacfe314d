"""Entity resolution (record linkage): multi-pass blocking + edit-distance
verification + transitive closure, assigning every part row a canonical
entity id.

The reference joins rows only on exact keys (glue_rds_to_redshift.py:
51-56); entity resolution is the fuzzy counterpart every catalog /
customer-360 pipeline needs when the same real-world thing arrives
spelled slightly differently. The classic shape (Fellegi-Sunter via
blocking, cf. Dedoop / Magellan): candidate generation by cheap blocking
keys, expensive pairwise verification only inside blocks, then
connected components so matches compose transitively.

Scale design — collapse-then-match: exact-duplicate strings are
collapsed FIRST (one hash aggregate to a distinct-name table with a
min-key representative), and the quadratic fuzzy machinery runs over
distinct names only. Fact-table growth adds rows to exact cliques, not
candidates to the fuzzy join: at 100 TB the verification join is sized
by the name vocabulary (here 64; in a real catalog maybe 10^7), while
the per-row work is two hash aggregates and two broadcast-able mapping
joins. This is the same collapse the oracle proves equivalent: an exact
clique is fully connected at distance 0, so closing over one
representative per name closes the whole clique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.io import load_table
from .dedup import connected_components

#: Max edit distance for two distinct names to be the same entity, and
#: the free length-delta prefilter it implies (|len a − len b| ≤ LEV_MAX
#: is necessary for levenshtein ≤ LEV_MAX, and much cheaper to test).
LEV_MAX = 2


@query(
    "er_fuzzy_parts",
    oracle=f"""
    WITH RECURSIVE names AS (
      SELECT p_partkey, lower(trim(p_name)) AS nm FROM part
    ), reps AS (
      SELECT nm, MIN(p_partkey) AS rep FROM names GROUP BY nm
    ), keys AS (
      SELECT rep, nm, (string_split(nm, ' '))[1] AS blk FROM reps
      UNION
      SELECT rep, nm, (string_split(nm, ' '))[-1] AS blk FROM reps
    ), cand AS (
      SELECT DISTINCT a.rep AS ra, a.nm AS na, b.rep AS rb, b.nm AS nb
      FROM keys a JOIN keys b ON a.blk = b.blk AND a.rep < b.rep
    ), pairs AS (
      SELECT ra, rb FROM cand
      WHERE abs(length(na) - length(nb)) <= {LEV_MAX}
        AND levenshtein(na, nb) <= {LEV_MAX}
    ), sym AS (
      SELECT ra, rb FROM pairs UNION SELECT rb, ra FROM pairs
    ), reach(src, dst) AS (
      SELECT rep, rep FROM reps
      UNION
      SELECT r.src, s.rb FROM reach r JOIN sym s ON r.dst = s.ra
    ), comp AS (
      SELECT src AS rep, MIN(dst) AS entity_id FROM reach GROUP BY src
    )
    SELECT n.p_partkey, c.entity_id
    FROM names n
    JOIN reps p ON n.nm = p.nm
    JOIN comp c ON p.rep = c.rep
    """,
)
def q_er_fuzzy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve part rows to entities: normalized names within edit
    distance ``LEV_MAX`` (typo tolerance) are the same entity, and
    matches compose transitively (A~B, B~C ⇒ one entity). Returns every
    part row with its entity id (the minimum partkey in the entity).

    Pipeline: (1) normalize + collapse exact duplicates to a
    distinct-name table with min-partkey representatives (one hash
    aggregate — the ONLY full-fact-table shuffle); (2) two-pass
    blocking on first and last token, so a typo in either token still
    lands the pair in one shared block (single-pass blocking loses any
    pair whose block token is the one misspelled); (3) within-block
    self-join, length-delta prefilter, then JVM-codegen ``levenshtein``
    — the quadratic step, sized by vocabulary not corpus; (4)
    min-label-propagation connected components over the match graph
    (``dedup.connected_components``: pointer-jumping, checkpointed
    loop); (5) two mapping joins back to rows — both broadcast-able,
    since the distinct-name and component tables are vocabulary-sized.

    The DuckDB oracle expresses the same semantics declaratively
    (recursive-CTE closure over the identical blocked candidate set),
    which doubles as the equivalence proof for the collapse: per-name
    representatives close exactly like full exact cliques."""
    part = load_table(spark, sf_dir, "part")
    names = part.select(
        "p_partkey", F.lower(F.trim(F.col("p_name"))).alias("nm")
    )
    reps = names.groupBy("nm").agg(F.min("p_partkey").alias("rep"))

    toks = F.split(F.col("nm"), " ")
    keys = (
        reps.select("rep", "nm", F.element_at(toks, 1).alias("blk"))
        .union(reps.select("rep", "nm", F.element_at(toks, -1).alias("blk")))
        .distinct()
    )
    a, b = keys.alias("a"), keys.alias("b")
    cand = (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.rep") < F.col("b.rep")))
        .select(
            F.col("a.rep").alias("ra"),
            F.col("a.nm").alias("na"),
            F.col("b.rep").alias("rb"),
            F.col("b.nm").alias("nb"),
        )
        .distinct()
    )
    pairs = cand.filter(
        (F.abs(F.length("na") - F.length("nb")) <= LEV_MAX)
        & (F.levenshtein("na", "nb") <= LEV_MAX)
    ).select(F.col("ra").alias("doc_a"), F.col("rb").alias("doc_b"))

    comps = connected_components(
        pairs, reps.select(F.col("rep").alias("doc_id"))
    ).select(F.col("doc_id").alias("rep"), F.col("comp").alias("entity_id"))

    return (
        names.join(F.broadcast(reps), "nm")
        .join(F.broadcast(comps), "rep")
        .select("p_partkey", "entity_id")
    )


@query(
    "fn_trigram_similarity_topk",
    oracle="""
    WITH names AS (
        SELECT DISTINCT p_name FROM part
    ), grams AS (
        SELECT p_name,
               list_distinct([substr(g, p + 1, 3)
                              FOR p IN range(0, len(g) - 2)]) AS tg
        FROM (SELECT p_name, '  ' || lower(p_name) || ' ' AS g FROM names)
    ), probe AS (
        SELECT p_name AS qname, tg AS qtg FROM grams
        ORDER BY p_name LIMIT 10
    ), pairs AS (
        SELECT probe.qname, grams.p_name AS cname,
               len(list_intersect(probe.qtg, grams.tg)) AS common,
               len(probe.qtg) + len(grams.tg)
                   - len(list_intersect(probe.qtg, grams.tg)) AS unioned
        FROM probe, grams
        WHERE grams.p_name <> probe.qname
    )
    SELECT qname, cname,
           CAST(common * 1000000 // unioned AS BIGINT) AS trigram_sim_micro,
           CAST(rnk AS INT) AS rnk
    FROM (
        SELECT qname, cname, common, unioned,
               ROW_NUMBER() OVER (PARTITION BY qname
                                  ORDER BY common * 1000000 // unioned DESC,
                                           cname) AS rnk
        FROM pairs WHERE common > 0
    )
    WHERE rnk <= 3
    ORDER BY qname, rnk
    """,
)
def q_fn_trigram_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pg_trgm-style fuzzy search: top-3 most-similar part names per
    probe name by trigram-set Jaccard (names padded ``'  name '`` per
    the pg_trgm convention so prefixes weigh in).

    Exactness: trigram sets are exact string operations, similarity is
    integer-div micro-units, ranks totally ordered (sim desc, name).
    Scale shape: this bounded ground-truth form cross-joins a 10-name
    probe against the name vocabulary (broadcast); the production form
    is the inverted-index self-join of ``dedup_ngram_jaccard`` — only
    names SHARING a trigram meet — with this exact scorer as the
    verify step. The trigram alphabet bounds posting-list width, which
    is why trigram indexes scale where raw edit distance cannot.
    """
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    padded = F.concat(F.lit("  "), F.lower(F.col("p_name")), F.lit(" "))
    grams = (
        names.withColumn("g", padded)
        .select(
            "p_name",
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, length(g) - 3),"
                    " p -> substring(g, p + 1, 3))"
                )
            ).alias("tg"),
        )
    )
    probe = (
        grams.orderBy("p_name")
        .limit(10)
        .select(F.col("p_name").alias("qname"), F.col("tg").alias("qtg"))
    )
    pairs = (
        grams.crossJoin(F.broadcast(probe))
        .filter(F.col("p_name") != F.col("qname"))
        .select(
            "qname",
            F.col("p_name").alias("cname"),
            F.size(F.array_intersect("qtg", "tg")).alias("common"),
            (
                F.size("qtg") + F.size("tg") - F.size(F.array_intersect("qtg", "tg"))
            ).alias("unioned"),
        )
        .filter(F.col("common") > 0)
        .withColumn("sim", F.expr("(common * 1000000) div unioned"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qname").orderBy(F.desc("sim"), F.asc("cname"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "qname",
            "cname",
            F.col("sim").cast("bigint").alias("trigram_sim_micro"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("qname", "rnk")
    )
