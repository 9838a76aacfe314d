"""Known-answer pins for BPE merge training.

Registry parity proves Spark==DuckDB run the same algebra; these prove
the algebra IS greedy byte-pair encoding — run-parity application is
checked against hand-walked greedy merges, including the overlapping
doubled-symbol chains that make greedy nontrivial.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.bpe import (
    _apply_merge,
)


def _seq(spark, word: str):
    rows = [(word, 1, i + 1, c) for i, c in enumerate(word)]
    return spark.createDataFrame(rows, "w string, f long, pos long, sym string")


def _symbols(df, word: str) -> list[str]:
    return [
        r["sym"]
        for r in df.filter(F.col("w") == word).orderBy("pos").collect()
    ]


def test_merge_non_overlapping_pair(spark):
    """(a,b) in 'ababab' matches at 1,3,5 — disjoint, all merge."""
    out = _apply_merge(_seq(spark, "ababab"), "a", "b")
    assert _symbols(out, "ababab") == ["ab", "ab", "ab"]


def test_merge_doubled_symbol_even_run(spark):
    """(a,a) in 'aaaa': greedy merges positions 1 and 3 → aa|aa."""
    out = _apply_merge(_seq(spark, "aaaa"), "a", "a")
    assert _symbols(out, "aaaa") == ["aa", "aa"]


def test_merge_doubled_symbol_odd_run(spark):
    """(a,a) in 'aaa': greedy merges position 1 only → aa|a."""
    out = _apply_merge(_seq(spark, "aaa"), "a", "a")
    assert _symbols(out, "aaa") == ["aa", "a"]


def test_merge_no_match_is_identity(spark):
    out = _apply_merge(_seq(spark, "xyz"), "a", "b")
    assert _symbols(out, "xyz") == ["x", "y", "z"]


def test_merge_positions_renumber_densely(spark):
    """After merging, pos is 1..n with no gaps (next iteration's lead()
    adjacency depends on dense positions)."""
    out = _apply_merge(_seq(spark, "aabaa"), "a", "a")
    rows = out.filter(F.col("w") == "aabaa").orderBy("pos").collect()
    assert [r["pos"] for r in rows] == [1, 2, 3]
    assert [r["sym"] for r in rows] == ["aa", "b", "aa"]


def test_two_iterations_build_longer_symbol(spark):
    """Merging (a,b) then (ab,c) turns 'abc' into one symbol — the
    hierarchical vocabulary growth BPE exists for."""
    step1 = _apply_merge(_seq(spark, "abcabc"), "a", "b")
    step2 = _apply_merge(step1, "ab", "c")
    assert _symbols(step2, "abcabc") == ["abc", "abc"]


def _syms_arr(spark, word: str, x: str, y: str) -> list[str]:
    """Apply the array-representation merge twin to one word."""
    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.bpe import (
        _apply_merge_syms,
    )

    df = spark.createDataFrame([(list(word),)], "syms array<string>")
    return df.select(_apply_merge_syms(x, y).alias("out")).collect()[0]["out"]


def test_array_merge_twin_matches_row_merge(spark):
    """The zero-shuffle array twin must implement the SAME greedy
    left-to-right semantics the row-based (oracle-replayed) form pins —
    including the overlapping doubled-symbol runs."""
    cases = [
        ("ababab", "a", "b"),
        ("aaaa", "a", "a"),
        ("aaa", "a", "a"),
        ("xyz", "a", "b"),
        ("aabaa", "a", "a"),
        ("a", "a", "a"),
    ]
    for word, x, y in cases:
        row = _symbols(_apply_merge(_seq(spark, word), x, y), word)
        arr = _syms_arr(spark, word, x, y)
        assert arr == row, (word, x, y, arr, row)


def test_array_merge_twin_chains(spark):
    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.bpe import (
        _apply_merge_syms,
    )

    df = spark.createDataFrame([(list("abcabc"),)], "syms array<string>")
    step1 = df.select(_apply_merge_syms("a", "b").alias("syms"))
    step2 = step1.select(_apply_merge_syms("ab", "c").alias("syms"))
    assert step2.collect()[0]["syms"] == ["abc", "abc"]
