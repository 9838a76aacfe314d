"""Skew-aware aggregation — two-phase (salted) grouped sums.

A groupBy on a low-cardinality or Zipf-distributed key sends every row
for a hot key to one reducer. Salting splits each key into
``salt_buckets`` sub-groups (phase 1, map-side parallel), then merges
the partial sums per real key (phase 2, tiny input). Works for any
associative aggregate; exact for decimal sums.

AQE's skew-join handling covers *joins*; salting covers *aggregations*
(and pre-AQE engines). Both live in this engine: AQE is on by default in
session.build_spark, and this operator is the explicit fallback.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.io import load_table


def salted_decimal_sum(
    df: DataFrame,
    key_cols: list[str],
    value: Column,
    alias: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase sum of a decimal expression grouped by ``key_cols``.

    The salt is a deterministic hash of the whole row's value column
    (any spreader works — it only needs to split hot keys), so results
    are reproducible run-to-run. Decimal addition is associative and
    exact, so the two-phase result is bit-identical to a direct groupBy.
    """
    salt = F.pmod(F.xxhash64(value.cast("string"), *[F.col(c) for c in key_cols]), F.lit(salt_buckets))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_partial").alias(alias))


@query(
    "agg_salted_skew",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM lineitem
    GROUP BY 1
    """,
)
def q_agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase sum over a 3-value key (maximal skew: every row
    hits one of 3 reducers in the naive plan). The oracle is the plain
    GROUP BY — salting must be result-invariant."""
    l = load_table(spark, sf_dir, "lineitem")
    out = salted_decimal_sum(
        l,
        ["l_returnflag"],
        F.col("l_extendedprice").cast("decimal(18,2)"),
        alias="total_price_dec",
        salt_buckets=16,
    )
    return out.select("l_returnflag", F.col("total_price_dec").cast("double").alias("total_price"))


@query(
    "join_salted_skew",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join: the events fact concentrates its 10k rows on
    ~150 user keys (hot keys by construction), so a plain shuffle join
    keys every hot user's rows to one reducer. The salt splits each fact
    key into SALT sub-keys (deterministic hash of the row id) and
    replicates the dimension once per salt value, so each hot key fans
    across SALT reducers.

    AQE's skew-join split is the first choice when sizes are observable
    at runtime; explicit salting is the fallback for deterministic
    topologies (e.g. when the join feeds a co-partitioned aggregate).
    The oracle is the unsalted join — salting must be result-invariant."""
    SALT = 8
    e = load_table(spark, sf_dir, "events").withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT)).cast("int")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    salts = spark.range(SALT).select(F.col("id").cast("int").alias("_salt"))
    c_rep = c.crossJoin(salts)
    return (
        e.join(c_rep, (e.user_id == c_rep.c_custkey) & (e._salt == c_rep._salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )
