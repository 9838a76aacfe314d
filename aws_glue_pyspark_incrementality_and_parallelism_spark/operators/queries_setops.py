"""Set-operation queries (SURVEY §2.7 breadth): union/intersect/except,
distinct, sampling-free subset semantics matching ANSI."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.io import load_table


@query(
    "setop_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def q_setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union — no shuffle, just concatenated partitions)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — nations with both rich customers
    and any supplier."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — nations with customers but no supplier."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "setop_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_setop_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — hash aggregation on all columns (map-side combine)."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "setop_intersect_all",
    oracle="""
    SELECT l_orderkey AS k FROM lineitem WHERE l_quantity > 45
    INTERSECT ALL
    SELECT o_orderkey AS k FROM orders
    """,
)
def q_setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicity = min of the sides)."""
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select(F.col("l_orderkey").alias("k"))
    )
    o = load_table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    return l.intersectAll(o)


@query(
    "setop_except_all",
    oracle="""
    SELECT l_orderkey AS k FROM lineitem
    EXCEPT ALL
    SELECT l_orderkey AS k FROM lineitem WHERE l_linenumber > 1
    """,
)
def q_setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicity subtraction)."""
    a = load_table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    b = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") > 1)
        .select(F.col("l_orderkey").alias("k"))
    )
    return a.exceptAll(b)


@query(
    "setop_union_by_name_evolution",
    oracle="""
    SELECT c_custkey AS entity_id, c_acctbal AS balance, NULL AS src_priority
    FROM customer WHERE c_custkey < 100
    UNION ALL
    SELECT o_orderkey AS entity_id, NULL AS balance, o_orderpriority AS src_priority
    FROM orders WHERE o_orderkey < 100
    """,
)
def q_setop_union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns — schema-evolution union
    (each side's missing columns null-filled), the pattern for unioning
    old- and new-schema partitions of an evolving table."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 100)
        .select(
            F.col("c_custkey").alias("entity_id"),
            F.col("c_acctbal").alias("balance"),
        )
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 100)
        .select(
            F.col("o_orderkey").alias("entity_id"),
            F.col("o_orderpriority").alias("src_priority"),
        )
    )
    return c.unionByName(o, allowMissingColumns=True)


@query(
    "setop_unpivot_melt",
    oracle="""
    SELECT c_custkey, metric, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT c_custkey,
             CAST(c_acctbal AS DOUBLE) AS acctbal,
             CAST(c_nationkey AS DOUBLE) AS nationkey
      FROM customer
    )
    UNPIVOT (val FOR metric IN (acctbal, nationkey))
    """,
)
def q_setop_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt — wide-to-long reshaping via DataFrame.unpivot
    (Spark's built-in; expands to a generator, no shuffle, no UDF).
    Oracle is DuckDB's UNPIVOT. Both engines drop NULL measures by
    default; these columns are non-null so row counts are 2× input."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return c.unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@query(
    "setop_symmetric_difference",
    oracle="""
    WITH a AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    ), b AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    )
    SELECT o_custkey,
           CASE WHEN o_custkey IN (SELECT o_custkey FROM a)
                THEN 'early_only' ELSE 'late_only' END AS side
    FROM (
      (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
      UNION ALL
      (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a)
    )
    """,
)
def q_setop_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference — the one set operator the setop family
    lacked: customers active ONLY before 1996 or ONLY from 1996 on
    (churned ∪ newly-acquired), tagged by side. Composed as
    (A EXCEPT B) UNION ALL (B EXCEPT A) — the two EXCEPT branches are
    disjoint by construction, so UNION ALL is safe and skips a
    distinct; each branch is a hash anti-join on the shared key.

    Scale: both inputs collapse to distinct key sets first (one
    aggregate each), so the anti-joins run at key grain; at 100 TB the
    date predicate partition-prunes each side's scan.
    """
    o = load_table(spark, sf_dir, "orders")
    boundary = F.lit("1996-01-01 00:00:00").cast("timestamp")
    a = o.filter(F.col("o_orderdate") < boundary).select("o_custkey").distinct()
    b = o.filter(F.col("o_orderdate") >= boundary).select("o_custkey").distinct()
    early_only = a.exceptAll(b).withColumn("side", F.lit("early_only"))
    late_only = b.exceptAll(a).withColumn("side", F.lit("late_only"))
    return early_only.unionByName(late_only)
