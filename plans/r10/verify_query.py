"""Round-10 optimization equivalence gate: verify named queries against
their DuckDB oracles with the driver-strict comparison, at one or more
SF dirs, in a fresh subprocess session.

Usage:
    python plans/r10/verify_query.py <name>[,<name>...] [sf_dir ...]

Defaults to sf0.001 + sf0.01 + sf0.1. Prints one PASS/FAIL line per
(query, sf) and exits nonzero on any failure.
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.abspath(os.path.join(_HERE, "..", ".."))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators import multimodal  # noqa: E402
from aws_glue_pyspark_incrementality_and_parallelism_spark.plans.catalog import REGISTRY  # noqa: E402
from aws_glue_pyspark_incrementality_and_parallelism_spark.session import build_spark  # noqa: E402
from tests.oracle import driver_canonicalize, duckdb_rows, normalize  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dirs = sys.argv[2:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = build_spark(app_name="r10-verify")
    spark.sparkContext.setLogLevel("ERROR")
    failed = []
    for sf_dir in sf_dirs:
        for name in names:
            spec = REGISTRY[name]
            sdf = spec.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            multimodal.release_decode_caches()
            if spec.oracle is None:
                print(f"SKIP (no oracle) {name} @ {sf_dir} rows={len(s_rows)}")
                continue
            o_cols, o_rows = duckdb_rows(spec.oracle, sf_dir)
            ok = (
                sorted(s_cols) == sorted(o_cols)
                and len(s_rows) == len(o_rows)
                and normalize(s_cols, s_rows) == normalize(o_cols, o_rows)
            )
            driver_canonicalize(s_cols, s_rows)
            driver_canonicalize(o_cols, o_rows)
            print(f"{'PASS' if ok else 'FAIL'} {name} @ {sf_dir} rows={len(s_rows)}")
            if not ok:
                failed.append((name, sf_dir))
    spark.stop()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
