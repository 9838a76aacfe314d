"""TPC-H-shaped queries, part 2 — the subquery-heavy shapes (Q2, Q11,
Q15, Q16, Q17, Q20, Q21, Q22). The testdata schema has no partsupp table
and lineitem carries only l_shipdate, so the partsupp-based shapes are
re-anchored on lineitem as the part↔supplier link and "late" is defined
against o_orderdate; each keeps the original query's plan structure
(correlated scalar min/avg, HAVING over a scalar subquery, NOT IN,
EXISTS + NOT EXISTS self-joins).

Comparison discipline: every aggregate the filter boundary depends on is
computed in exact decimal on BOTH sides, and avg-threshold predicates are
written multiplicatively (5·q·n < Σq instead of q < 0.2·Σq/n) so no
engine-specific decimal-division scale can flip a boundary row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.io import load_table


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    SELECT p.p_partkey, s.s_name, n.n_name AS nation_name,
           l.l_extendedprice AS min_price
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
      AND l.l_extendedprice = (
        SELECT MIN(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey)
    """,
)
def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: cheapest supplier per part via a correlated scalar MIN
    subquery (partsupp→lineitem re-anchor). Decorrelated the way engines
    execute it: per-part MIN aggregate joined back on (partkey, price).
    Price equality is double=double over the SAME parquet values on both
    sides, so it is exact."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    min_price = l.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("l_extendedprice").alias("mp_price")
    )
    return (
        F.broadcast(p)
        .join(l, F.col("p_partkey") == l.l_partkey)
        .join(
            min_price,
            (F.col("p_partkey") == F.col("mp_partkey"))
            & (F.col("l_extendedprice") == F.col("mp_price")),
        )
        .join(s, s.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "s_name",
            F.col("n_name").alias("nation_name"),
            F.col("l_extendedprice").alias("min_price"),
        )
    )


@query(
    "tpch_q11_value_concentration",
    oracle="""
    WITH sv AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS supp_value
      FROM lineitem GROUP BY 1
    )
    SELECT l_suppkey AS supp_key, CAST(supp_value AS DOUBLE) AS supp_value
    FROM sv
    WHERE supp_value * 1000 > (SELECT SUM(supp_value) FROM sv)
    """,
)
def q_tpch_q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: suppliers holding more than 1/1000 of total shipped
    value — a HAVING over an uncorrelated scalar subquery. The global
    total rides a broadcast single-row cross join (never a collect), and
    the threshold is the multiplicative exact-decimal form value·1000 >
    total."""
    l = load_table(spark, sf_dir, "lineitem")
    sv = l.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("supp_value")
    )
    total = sv.agg(F.sum("supp_value").alias("total_value"))
    return (
        sv.crossJoin(F.broadcast(total))
        .filter(F.col("supp_value") * 1000 > F.col("total_value"))
        .select(
            F.col("l_suppkey").alias("supp_key"),
            F.col("supp_value").cast("double").alias("supp_value"),
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the supplier(s) with maximum quarterly revenue — a
    scalar MAX subquery over a derived revenue view, matched by exact
    decimal equality (no double summation nondeterminism can split the
    tie)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = l.groupBy("l_suppkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
        .alias("total_revenue")
    )
    best = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, s.s_suppkey == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
    )


@query(
    "tpch_q16_supplier_diversity",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 10, 15, 20)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per part attribute with a
    NOT IN exclusion list (negative-balance suppliers standing in for
    the original's complaint filter). NOT IN over a non-null key is a
    broadcast anti join; COUNT(DISTINCT) expands to the two-phase
    distinct aggregate."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 5, 10, 15, 20))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size"))
        .join(l, F.col("p_partkey") == l.l_partkey)
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             COUNT(*) AS n_lines
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#2'
      AND 5 * CAST(l.l_quantity AS DECIMAL(18,2)) * pq.n_lines < pq.sum_qty
    GROUP BY ALL
    """,
)
def q_tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue lost to small-quantity orders — the correlated
    per-part AVG threshold, decorrelated into a per-part aggregate join.
    The avg comparison is the exact multiplicative form 5·q·n < Σq
    (0.2·avg) so no decimal-division scale difference can flip a row.
    The brand gate is semi-joined into the per-part aggregate's input,
    so the aggregate only ever sees Brand#2 lines (~1/25 of lineitem),
    not the whole fact table — same rows, 25× less aggregated."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2").select(
        "p_partkey"
    )
    l = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select(F.col("p_partkey").alias("gate_partkey"))),
        F.col("l_partkey") == F.col("gate_partkey"),
        "left_semi",
    )
    pq = l.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count("*").alias("n_lines"),
    )
    return (
        F.broadcast(p)
        .join(l, F.col("p_partkey") == l.l_partkey)
        .join(pq, F.col("pq_partkey") == l.l_partkey)
        .filter(
            F.lit(5) * F.col("l_quantity").cast("decimal(18,2)") * F.col("n_lines")
            < F.col("sum_qty")
        )
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0)
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "tpch_q20_excess_shippers",
    oracle="""
    WITH part_supp AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    part_tot AS (
      SELECT l_partkey, SUM(qty) AS tot FROM part_supp GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT ps.l_suppkey
      FROM part_supp ps
      JOIN part_tot pt ON ps.l_partkey = pt.l_partkey
      JOIN part p ON p.p_partkey = ps.l_partkey
      WHERE p.p_name LIKE 'red%' AND 8 * ps.qty > pt.tot)
    """,
)
def q_tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who shipped more than an eighth of some red
    part's total volume — a nested IN chain (part gate → per-(part,
    supplier) aggregate vs per-part total) collapsing to a semi join
    into supplier. Exact-decimal share comparison; the 1/8 threshold is
    ~10× a supplier's expected uniform share in the testdata, mirroring
    the original's excess-stock selectivity."""
    l = load_table(spark, sf_dir, "lineitem")
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty")
    )
    pt = ps.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(F.sum("qty").alias("tot"))
    red = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    dominant = (
        ps.join(pt, F.col("l_partkey") == F.col("pt_partkey"))
        .join(F.broadcast(red), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .filter(F.lit(8) * F.col("qty") > F.col("tot"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return s.join(
        dominant, s.s_suppkey == dominant.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "tpch_q21_sole_late_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1
    """,
)
def q_tpch_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers solely responsible for late multi-supplier
    orders. "Late" = shipped >60 days after order date (the testdata has
    no receipt/commit dates). EXISTS → semi join on (same order, other
    supplier); NOT EXISTS → anti join against the late-lines set
    itself."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    other = l.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    sole = (
        late.join(
            other,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "tpch_q22_dormant_customers",
    oracle="""
    WITH pos AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum, COUNT(*) AS bal_n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey AS cntry, COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, pos
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.bal_n > pos.bal_sum
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1998-09-01')
    GROUP BY 1
    """,
)
def q_tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: rich-but-dormant customers per nation — an
    above-average balance gate (scalar subquery, multiplicative exact
    form bal·n > Σbal) and a NOT EXISTS anti join to recent orders
    (every testdata customer has SOME order, so dormancy is "nothing
    since 1998-09"; the date filter pushes into the orders scan before
    the anti join)."""
    c = load_table(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("bal_sum"),
        F.count("*").alias("bal_n"),
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-09-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(F.col("c_acctbal").cast("decimal(18,2)") * F.col("bal_n") > F.col("bal_sum"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
        )
    )
