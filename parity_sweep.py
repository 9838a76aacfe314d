"""Driver-style correctness sweep: run every registry query at a given SF,
compare against its DuckDB oracle with the driver's strict normalization,
and time both sides per query.

Usage: python parity_sweep.py [sf_dir]  (default /root/testdata/sf0.01)
Writes SWEEP_DETAIL.json and prints one summary JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators import multimodal
from aws_glue_pyspark_incrementality_and_parallelism_spark.plans import catalog
from aws_glue_pyspark_incrementality_and_parallelism_spark.plans.catalog import REGISTRY
from aws_glue_pyspark_incrementality_and_parallelism_spark.session import build_spark
from tests.oracle import driver_canonicalize, duckdb_rows, normalize


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_spark(app_name="parity-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    # walk the same explicit priority order the driver sees
    for name in catalog.all_queries():
        spec = REGISTRY[name]
        row = {"oracle": spec.oracle is not None}
        t0 = time.monotonic()
        try:
            sdf = spec.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            row["spark_sec"] = round(time.monotonic() - t0, 3)
            row["rows"] = len(s_rows)
        except Exception as e:  # noqa: BLE001
            row["error"] = f"spark: {type(e).__name__}: {e}"[:300]
            results[name] = row
            print(json.dumps({"q": name, **row}), flush=True)
            continue
        if spec.oracle is not None:
            t1 = time.monotonic()
            try:
                o_cols, o_rows = duckdb_rows(spec.oracle, sf_dir)
                row["oracle_sec"] = round(time.monotonic() - t1, 3)
                ok_cols = sorted(s_cols) == sorted(o_cols)
                ok_rows = len(s_rows) == len(o_rows)
                ok_vals = ok_cols and ok_rows and (
                    normalize(s_cols, s_rows) == normalize(o_cols, o_rows)
                )
                # The driver's pandas sort+hash dies on non-scalar cells even
                # when values match — reproduce that failure mode here.
                driver_canonicalize(s_cols, s_rows)
                driver_canonicalize(o_cols, o_rows)
                row.update(cols_match=ok_cols, count_match=ok_rows, value_match=ok_vals)
            except Exception as e:  # noqa: BLE001
                row["error"] = f"oracle: {type(e).__name__}: {e}"[:300]
        results[name] = row
        print(json.dumps({"q": name, **row}), flush=True)
        # drop any attempted-decode caches this query persisted — a
        # 368-query sweep must not accumulate per-query cached lanes
        multimodal.release_decode_caches()
    spark.stop()

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "SWEEP_DETAIL.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1, sort_keys=True)
    n_oracle = sum(1 for r in results.values() if r["oracle"])
    n_pass = sum(1 for r in results.values() if r.get("value_match"))
    n_err = sum(1 for r in results.values() if "error" in r)
    total = sum(r.get("spark_sec", 0) + r.get("oracle_sec", 0) for r in results.values())
    print(json.dumps({
        "summary": True, "sf_dir": sf_dir, "queries": len(results),
        "oracled": n_oracle, "value_pass": n_pass, "errors": n_err,
        "total_sec": round(total, 1),
    }))


if __name__ == "__main__":
    main()
