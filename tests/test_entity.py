"""Behavioral pins for entity resolution beyond the DuckDB parity check
(which test_parity_all already runs for er_fuzzy_parts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.entity import q_er_fuzzy_parts
from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import load_table

from .conftest import SF_SMALL


def test_er_merges_typo_named_parts_and_respects_cliques(spark):
    ents = q_er_fuzzy_parts(spark, SF_SMALL)
    part = load_table(spark, SF_SMALL, "part").select(
        "p_partkey", F.lower(F.trim("p_name")).alias("nm")
    )
    named = {
        (r.nm, r.p_partkey): r.entity_id
        for r in part.join(ents, "p_partkey").collect()
    }

    by_name = {}
    for (nm, _), ent in named.items():
        by_name.setdefault(nm, set()).add(ent)

    # Exact clique: every row of one name resolves to ONE entity.
    assert all(len(v) == 1 for v in by_name.values()), {
        k: v for k, v in by_name.items() if len(v) > 1
    }

    # Edit-distance merge: 'cold X' and 'old X' (levenshtein 1, shared
    # last-token block) must co-resolve whenever both names exist.
    merged_any = False
    for nm, ents_set in by_name.items():
        if nm.startswith("cold ") and ("old " + nm[5:]) in by_name:
            assert ents_set == by_name["old " + nm[5:]], nm
            merged_any = True
    assert merged_any  # fixture vocabulary contains cold/old pairs

    # Distant names stay apart: entity count is > 1 (ER didn't collapse
    # the catalog into one blob) and < name count (some merge happened).
    n_entities = len({e for v in by_name.values() for e in v})
    assert 1 < n_entities < len(by_name)
