"""Spatial operators: grid-bucketed nearest-neighbor join.

The reference joins on exact keys only (glue_rds_to_redshift.py:51-56);
a spatial join is the continuous-key analogue every logistics /
geo-enrichment pipeline needs ("nearest warehouse to each customer").
Spark has no native spatial join — the naive formulation is a cross
join with a distance predicate, which Catalyst plans as
BroadcastNestedLoopJoin (quadratic, the same trap ``join_interval_binned``
engineers away for time ranges). The standard scale design, implemented
here, is grid blocking: bucket both sides into fixed cells, probe the
3×3 cell neighborhood with an EQUI-join (shuffle- or broadcast-
hash-joinable), refine with the exact distance, then reduce to the
nearest match.

Everything is exact integer arithmetic (micro-degree coordinates,
squared distances in int64) — no trig, no floats — so the DuckDB oracle
is bit-for-bit and the cross-engine float-divergence class documented
in ROUND3_NOTES can't reappear. Haversine refinement at real-Earth
scale swaps only the refine expression; the blocking algebra is
identical.

Cell-width choice is THE tuning knob at 100 TB: cell ≈ search radius R
guarantees any match within R lies in the 3×3 neighborhood (proved by
the triangle |Δlat| ≤ R ⇒ adjacent cell), while candidates per probe
stay at the per-cell point density × 9. A skewed hot cell (one city
holding half the suppliers) is the usual skew problem — salt the hot
cells or recursively split them (quadtree), exactly as ``skew.py`` does
for hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.io import load_table

#: Coordinate domain: [0, 10°) in micro-degrees, both axes — a
#: city-cluster-scale box so every SF's supplier density yields matches.
_DOMAIN = 10_000_000
#: Grid cell width = search radius, in micro-degrees (1°).
_CELL = 1_000_000
#: Squared search radius (int64; 1e12 ≪ 2^63).
_R2 = _CELL * _CELL
#: Fine-grid width for the hierarchical phase-0 probe (1/8°). At
#: production scale this is THE density knob: pick FINE ≈ the expected
#: nearest-neighbor distance (≈ 1/sqrt(π·density)) so the fine block
#: holds O(10) candidates regardless of corpus density — the same
#: role LSH_BUCKET_CAP plays for hot MinHash bands.
_FINE = _CELL // 8


def _u32_sql(salt: str, key: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{salt}:' || CAST({key} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {_DOMAIN}"
    )


def _u32_col(salt: str, key: str):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(key).cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % _DOMAIN
    )


@query(
    "geo_grid_nn_join",
    oracle=f"""
    WITH cu AS (
      SELECT c_custkey,
             {_u32_sql('lat', 'c_custkey')} AS clat,
             {_u32_sql('lon', 'c_custkey')} AS clon
      FROM customer
    ), su AS (
      SELECT s_suppkey,
             {_u32_sql('lat', 's_suppkey')} AS slat,
             {_u32_sql('lon', 's_suppkey')} AS slon
      FROM supplier
    ), cand AS (
      SELECT c.c_custkey,
             s.s_suppkey,
             (c.clat - s.slat) * (c.clat - s.slat)
               + (c.clon - s.slon) * (c.clon - s.slon) AS dist2
      FROM cu c JOIN su s
        ON (s.slat // {_CELL}) BETWEEN (c.clat // {_CELL}) - 1
                                   AND (c.clat // {_CELL}) + 1
       AND (s.slon // {_CELL}) BETWEEN (c.clon // {_CELL}) - 1
                                   AND (c.clon // {_CELL}) + 1
    ), within AS (
      SELECT * FROM cand WHERE dist2 <= {_R2}
    ), best AS (
      SELECT c_custkey, MIN(dist2) AS dist2 FROM within GROUP BY c_custkey
    )
    SELECT b.c_custkey, MIN(w.s_suppkey) AS nearest_suppkey, b.dist2
    FROM best b JOIN within w
      ON w.c_custkey = b.c_custkey AND w.dist2 = b.dist2
    GROUP BY b.c_custkey, b.dist2
    """,
)
def q_geo_grid_nn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-supplier-within-radius for every customer, by grid
    blocking: deterministic integer micro-degree coordinates (md5-lane
    derived, the repo's portable-hash convention), 1°-cell bucketing,
    3×3-neighborhood EQUI-join probe, exact int64 squared-distance
    refine, then nearest (ties broken by min suppkey — deterministic on
    both engines without relying on either's arg-min tie behavior).

    Two-phase, density-adaptive: phase 1 probes the OWN cell only and
    keeps every customer whose nearest own-cell supplier is strictly
    inside its boundary margin (provably the global nearest — see the
    inline proof); only the undecided boundary band pays the 3×3 probe
    in phase 2. All joins are hash equi-joins on (cell_x, cell_y) —
    broadcast here since suppliers are dim-sized, shuffle-hash with
    cell co-partitioning when both sides are facts. No nested-loop
    join anywhere in the plan — pinned in tests/test_plans.py."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        _u32_col("lat", "c_custkey").alias("clat"),
        _u32_col("lon", "c_custkey").alias("clon"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _u32_col("lat", "s_suppkey").alias("slat"),
        _u32_col("lon", "s_suppkey").alias("slon"),
    )
    keyed_supp = supp.select(
        "s_suppkey",
        "slat",
        "slon",
        F.expr(f"slat DIV {_CELL}").alias("px"),
        F.expr(f"slon DIV {_CELL}").alias("py"),
    )
    d2 = (F.col("clat") - F.col("slat")) * (F.col("clat") - F.col("slat")) + (
        F.col("clon") - F.col("slon")
    ) * (F.col("clon") - F.col("slon"))

    def nearest(within: DataFrame) -> DataFrame:
        # ONE partial-aggregating shuffle: min over (dist2, suppkey)
        # structs is lexicographic, i.e. exactly "min distance, ties by
        # min suppkey" — the oracle's min-then-min in a single pass,
        # with map-side combine shrinking each partition to one row
        # per customer before anything shuffles.
        best = within.groupBy("c_custkey").agg(
            F.min(F.struct("dist2", "s_suppkey")).alias("b")
        )
        return best.select(
            "c_custkey",
            F.col("b.s_suppkey").alias("nearest_suppkey"),
            F.col("b.dist2").alias("dist2"),
        )

    # Phase 0 — hierarchical FINE-grid probe with a decidability bound.
    # Probe the 3×3 block of 1/8°-cells around the customer's own fine
    # cell; a customer whose in-block nearest is STRICTLY closer than
    # its distance to the block's outer boundary cannot be beaten — or
    # tied, hence strict — by any supplier outside the block (every
    # outside point is ≥ that margin away). The block margin simplifies
    # to FINE + (distance to own fine cell's nearest edge), and block
    # candidates number 9·FINE²·density — density-bounded by the FINE
    # knob, while the nearest distance shrinks as 1/sqrt(density), so
    # the decided fraction RISES with density. This is the fix for the
    # probe-measured density wall: a single-level grid read 33× at 10×
    # density and 406× at 100×; hierarchical probing is ~linear
    # (measured — see SCALE_PROBE.md).
    fine_supp = supp.select(
        "s_suppkey",
        "slat",
        "slon",
        F.expr(f"slat DIV {_FINE}").alias("fx"),
        F.expr(f"slon DIV {_FINE}").alias("fy"),
    )
    lat_f = F.col("clat") % _FINE
    lon_f = F.col("clon") % _FINE
    block_margin = _FINE + F.least(lat_f, _FINE - lat_f, lon_f, _FINE - lon_f)
    cust_m = cust.withColumn("m2", block_margin * block_margin)
    fine_probes = (
        cust_m.withColumn("dx", F.expr("explode(array(-1L, 0L, 1L))"))
        .withColumn("dy", F.expr("explode(array(-1L, 0L, 1L))"))
        .select(
            "c_custkey",
            "clat",
            "clon",
            (F.expr(f"clat DIV {_FINE}") + F.col("dx")).alias("fx"),
            (F.expr(f"clon DIV {_FINE}") + F.col("dy")).alias("fy"),
        )
    )
    in_block = (
        fine_probes.join(F.broadcast(fine_supp), ["fx", "fy"])
        .select("c_custkey", "s_suppkey", d2.alias("dist2"))
    )
    # customer-grain ⋈ customer-grain: co-partitioned key join (AQE
    # picks broadcast at dim scale; at fact scale it stays shuffle-hash
    # on the shared c_custkey partitioning).
    decided = nearest(in_block).join(
        cust_m.select("c_custkey", "m2"), "c_custkey"
    ).filter(F.col("dist2") < F.col("m2"))

    # Phase 1 — full 3×3 COARSE (1°) neighborhood probe, only for
    # customers the fine bound could not decide (sparse neighborhoods:
    # empty fine block, or nearest not strictly inside the margin).
    undecided = cust_m.join(decided.select("c_custkey"), "c_custkey", "left_anti")
    probes = (
        undecided.withColumn("dx", F.expr("explode(array(-1L, 0L, 1L))"))
        .withColumn("dy", F.expr("explode(array(-1L, 0L, 1L))"))
        .select(
            "c_custkey",
            "clat",
            "clon",
            (F.expr(f"clat DIV {_CELL}") + F.col("dx")).alias("px"),
            (F.expr(f"clon DIV {_CELL}") + F.col("dy")).alias("py"),
        )
    )
    within = (
        probes.join(F.broadcast(keyed_supp), ["px", "py"])
        .select("c_custkey", "s_suppkey", d2.alias("dist2"))
        .filter(F.col("dist2") <= _R2)
    )
    return (
        decided.select("c_custkey", "nearest_suppkey", "dist2")
        .unionByName(nearest(within).select("c_custkey", "nearest_suppkey", "dist2"))
    )
