"""Registry-wide physical-plan audit: the machine-checkable version of
the per-query plan reads the round verdicts perform by hand.

For every registry query (at $SPARK_GRAFT_SF_DIR, default sf0.001 —
plan SHAPE, not timing, so the smallest SF suffices), record from the
executed/physical plan:

- n_exchanges     — shuffle Exchange nodes (hashpartitioning/range);
                    every one is a full network pass at 100 TB
- n_broadcasts    — BroadcastExchange nodes (small sides kept off the
                    shuffle path)
- n_python        — Python boundary nodes (ArrowEvalPython /
                    BatchEvalPython / MapInPandas / FlatMapGroupsInPandas
                    / FlatMapCoGroupsInPandas / MapInArrow); row-at-a-time
                    BatchEvalPython is flagged separately — the repo
                    policy is ZERO
- n_codegen       — WholeStageCodegen spans (wider = more of the plan
                    fused JVM-side); ADVISORY under AQE: the pre-execution
                    plan is wrapped in AdaptiveSparkPlan and not yet
                    codegen-annotated, so this column reads 0 for most
                    queries — the exchange/python/pushdown columns are the
                    load-bearing ones
- pushed_filters  — whether any scan carries PushedFilters: [non-empty]
- global_sort     — EVERY Sort node with the global flag set, counted
                    unconditionally (round-7 ADVICE: the regex does not
                    walk the tree, so it cannot tell a presentation sort
                    from one feeding a top-k node). Read it together
                    with the companion n_topk_nodes column: a top-k
                    plan's GOOD shape is TakeOrderedAndProject /
                    WindowGroupLimit with NO global Sort at all, so a
                    query with n_global_sorts > 0 deserves a manual
                    look whether or not it also has top-k nodes — a
                    full global sort of a fact table is the node to
                    hunt, a global sort of a few-thousand-row final
                    result is fine

Writes PLAN_AUDIT.json and prints one summary line. Queries whose
operators intentionally materialize intermediates (maintenance_*,
stream_*, incremental_* with sinks, source_* writers) execute side
effects during plan construction; they are audited on their FINAL
returned DataFrame like everything else.

Usage: python plan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators import multimodal
from aws_glue_pyspark_incrementality_and_parallelism_spark.plans.catalog import REGISTRY
from aws_glue_pyspark_incrementality_and_parallelism_spark.session import build_spark

PY_NODES = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandasWithState",
)


def audit_plan(df) -> dict:
    jvm = df.sparkSession._jvm
    qe = df._jdf.queryExecution()
    formatted = qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    simple = qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    # Formatted mode lists one detail block per node: "(N) NodeName\n...".
    # Parse node names (strip codegen suffixes like "[codegen id : 3]").
    blocks = re.findall(r"^\((\d+)\) ([A-Za-z]+)", formatted, re.M)
    names = [n for _, n in blocks]
    n_broadcast = sum(1 for n in names if n == "BroadcastExchange")
    n_exchange = sum(1 for n in names if n == "Exchange")  # shuffle exchanges
    py_counts = {p: sum(1 for n in names if n == p) for p in PY_NODES}
    n_python = sum(py_counts.values())
    # WholeStageCodegen spans only annotate the simple-mode string: *(k)
    n_codegen = len(set(re.findall(r"\*\((\d+)\)", simple)))
    pushed = bool(re.search(r"PushedFilters: \[(?!\])", formatted))
    # Global sorts: formatted detail block "(N) Sort\nInput ...\n
    # Arguments: [keys...], true, 0" — the boolean is the global flag. A
    # global Sort on a final small result is fine; on a fact table it is
    # the node to hunt. Top-k nodes are counted separately (they are the
    # GOOD pattern: no global sort materialized).
    global_sorts = len(
        re.findall(r"^\(\d+\) Sort(?:\s.*)?\n(?:.*\n)?Arguments: \[.*\], true, 0", formatted, re.M)
    )
    topk = sum(1 for n in names if n in ("TakeOrderedAndProject", "WindowGroupLimit"))
    return {
        "n_exchanges": n_exchange,
        "n_broadcasts": n_broadcast,
        "n_python": n_python,
        "row_at_a_time_python": py_counts["BatchEvalPython"],
        "n_codegen_spans": n_codegen,
        "pushed_filters": pushed,
        "n_global_sorts": global_sorts,
        "n_topk_nodes": topk,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for name in REGISTRY:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            results[name] = audit_plan(df)
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        multimodal.release_decode_caches()
    spark.stop()

    with open(os.path.join(_REPO_ROOT, "PLAN_AUDIT.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1, sort_keys=True)

    ok = {k: v for k, v in results.items() if "error" not in v}
    summary = {
        "plan_audit": True,
        "queries": len(results),
        "errors": len(results) - len(ok),
        "row_at_a_time_python_total": sum(v["row_at_a_time_python"] for v in ok.values()),
        "max_exchanges": max((v["n_exchanges"], k) for k, v in ok.items()),
        "global_sort_queries": sum(1 for v in ok.values() if v["n_global_sorts"] > 0),
        "python_boundary_queries": sum(1 for v in ok.values() if v["n_python"] > 0),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
