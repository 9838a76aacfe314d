"""Known-answer pins for the statistics/robustness operator batch.

Registry parity proves Spark==DuckDB; these prove both equal the MATH —
hand-computed answers on tiny frames, so a same-wrong-answer-on-both-
engines bug cannot hide behind the oracle.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_hampel_flags_single_spike(spark):
    """Series 10,10,10,10,1000,10,...: the spike deviates from the
    rolling median (10) by >> 3*MAD, neighbors do not."""
    from pyspark.sql.window import Window

    rows = [(1, i, 1000 if i == 5 else 10) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "user_id int, seq int, y long")
    w = Window.partitionBy("user_id").orderBy("seq")
    f = w.rowsBetween(-4, 0)
    med = df.select(
        "seq",
        "y",
        F.row_number().over(w).alias("rn"),
        F.array_sort(F.collect_list("y").over(f)).alias("frame"),
    ).withColumn("med5", F.element_at("frame", 3))
    mad = med.withColumn(
        "mad5",
        F.element_at(F.array_sort(F.expr("transform(frame, v -> abs(v - med5))")), 3),
    )
    out = {
        r["seq"]: (r["med5"], r["mad5"])
        for r in mad.filter(F.col("rn") >= 5).collect()
    }
    # at seq=5 the frame is [10,10,10,10,1000]: median 10, MAD 0
    assert out[5] == (10, 0)
    # flag rule |y - med| > 3*MAD -> 990 > 0: spike flagged
    assert abs(1000 - out[5][0]) > 3 * out[5][1]
    # at seq=8 frame [10,10,10,1000->gone? frame=[5..8]+... ] median stays 10
    assert out[8][0] == 10


def test_chi_square_known_answer(spark):
    """2x2 table O=[[10,20],[30,40]]: chi2 = 100/63 exactly (= n*sum
    (O*n-row*col)^2/(row*col*n^2)); check the micro-unit pipeline."""
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20 + [("b", "x")] * 30 + [("b", "y")] * 40
    )
    df = spark.createDataFrame(rows, "cohort string, et string")
    obs = df.groupBy("cohort", "et").agg(F.count("*").alias("o"))
    margins = obs.groupBy("cohort").agg(F.sum("o").alias("row_n"))
    cols = obs.groupBy("et").agg(F.sum("o").alias("col_n"))
    tot = obs.agg(F.sum("o").alias("n"))
    grid = (
        margins.crossJoin(cols)
        .join(obs, ["cohort", "et"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
    )
    total = (
        grid.crossJoin(tot)
        .select(
            F.expr(
                "CAST((CAST(o AS DECIMAL(38,0)) * n - CAST(row_n AS DECIMAL(38,0)) * col_n)"
                " * (CAST(o AS DECIMAL(38,0)) * n - CAST(row_n AS DECIMAL(38,0)) * col_n)"
                " * 1000000 div (CAST(row_n AS DECIMAL(38,0)) * col_n * n) AS BIGINT)"
            ).alias("t")
        )
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    # chi2 = sum over cells (O-E)^2/E with E = {12,18,24,36}... compute directly
    expected = 0.0
    E = {("a", "x"): 16.0, ("a", "y"): 14.0, ("b", "x"): 24.0, ("b", "y"): 21.0}
    O = {("a", "x"): 10, ("a", "y"): 20, ("b", "x"): 30, ("b", "y"): 40}
    n = 100
    E = {k: (30 if k[0] == "a" else 70) * (40 if k[1] == "x" else 60) / n for k in O}
    expected = sum((O[k] - E[k]) ** 2 / E[k] for k in O)
    # per-cell integer floor before the sum: within 4 ulps of 1e-6 each
    assert abs(total / 1e6 - expected) < 4e-6


def test_nelson_aalen_hand_computed(spark):
    """Durations [2,2,3+,5] (3 censored): hazards 2/4 at t=2, 1/1 at
    t=5; cumulative 500000, 1500000 micro."""
    from pyspark.sql.window import Window

    spans = spark.createDataFrame(
        [(2, 1), (2, 1), (3, 0), (5, 1)], "duration int, observed int"
    )
    per_day = spans.groupBy("duration").agg(
        F.count("*").alias("n_here"), F.sum("observed").alias("d_events")
    )
    w_desc = Window.orderBy(F.desc("duration")).rowsBetween(Window.unboundedPreceding, 0)
    risk = per_day.select(
        "duration",
        "d_events",
        F.sum("n_here").over(w_desc).alias("n_at_risk"),
    ).filter(F.col("d_events") > 0)
    hazard = risk.select(
        "duration",
        F.expr("(d_events * 1000000) div n_at_risk").alias("h"),
    )
    w_asc = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    got = {
        r["duration"]: r["cum"]
        for r in hazard.withColumn("cum", F.sum("h").over(w_asc)).collect()
    }
    assert got == {2: 500000, 5: 1500000}


def test_poisson_bootstrap_weight_distribution():
    """The md5-lane inverse-CDF thresholds reproduce Poisson(1) pmf."""
    th = [1580030168, 3160060337, 3950075421, 4213413783, 4279248373, 4292415291]
    probs = []
    prev = 0
    for t in th:
        probs.append((t - prev) / 2**32)
        prev = t
    for k, p in enumerate(probs):
        assert abs(p - math.exp(-1) / math.factorial(k)) < 1e-6, (k, p)
    # mean and variance of the truncated-at-6 distribution stay ~1
    probs.append(1 - prev / 2**32)  # w=6 tail bucket
    mean = sum(k * p for k, p in enumerate(probs))
    var = sum(k * k * p for k, p in enumerate(probs)) - mean**2
    assert abs(mean - 1) < 1e-3 and abs(var - 1) < 5e-3


def test_poisson_bootstrap_hex_compare_assumptions(spark):
    """The bootstrap's codegen inverse-CDF compares 8-hex-char md5 lane
    substrings against format(threshold,'08x') STRING literals, which is
    only equivalent to the u32 comparison if (a) Spark's md5 emits
    fixed-width 32-char LOWERCASE hex and (b) string comparison is
    binary (code-point) — a session collation or an uppercase digest
    would silently flip comparisons. Pin both with a known digest, and
    pin the string-vs-numeric equivalence on lane values that straddle
    a real threshold."""
    import hashlib

    row = spark.sql("SELECT md5('0:1') AS h").collect()[0]
    assert row["h"] == hashlib.md5(b"0:1").hexdigest()  # known digest
    assert len(row["h"]) == 32 and row["h"] == row["h"].lower()

    th = 3160060337  # the w<2 threshold
    cases = [th - 1, th, th + 1, 0, 2**32 - 1]
    got = spark.sql(
        "SELECT "
        + ", ".join(
            f"CAST(format_string('%08x', {u}L) < '{format(th, '08x')}' AS INT)"
            f" AS c{i}"
            for i, u in enumerate(cases)
        )
    ).collect()[0]
    for i, u in enumerate(cases):
        assert got[f"c{i}"] == int(u < th), (u, th)


def test_silence_trim_known_answer(spark):
    """Samples [0,0,9000,0,-9000,0] with threshold 8192: lead 2,
    trail 1, kept 3."""
    import numpy as np

    smp = np.array([0, 0, 9000, 0, -9000, 0], dtype=np.int64)
    loud = np.flatnonzero(np.abs(smp) > 8192)
    assert int(loud[0]) == 2
    assert int(len(smp) - 1 - loud[-1]) == 1
    assert int(loud[-1] - loud[0] + 1) == 3
