"""Round-10 optimization profiler: time a list of queries in ONE fresh
subprocess session (warm run + min-of-N repeats, noop sink per guide
§1.4) and dump each query's .explain("formatted") to
plans/r10/<name>_<tag>.txt.

Usage:
    python plans/r10/profile_query.py <tag> <name>[,<name>...] [repeats]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
Prints one JSON line: {"tag":..., "times": {name: sec}, ...}
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.abspath(os.path.join(_HERE, "..", ".."))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators import multimodal  # noqa: E402
from aws_glue_pyspark_incrementality_and_parallelism_spark.plans import catalog  # noqa: E402
from aws_glue_pyspark_incrementality_and_parallelism_spark.session import build_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark(app_name=f"profile-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    allruns: dict[str, list[float]] = {}
    for name in names:
        fn = catalog.REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"{name} [{tag}]")
        # plan dump (pre-execution, AQE initial plan)
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        with open(os.path.join(_HERE, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        # warm
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        multimodal.release_decode_caches()
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
            multimodal.release_decode_caches()
        times[name] = min(runs)
        allruns[name] = runs
        spark.sparkContext.setJobDescription(None)
    print("PROFILE_JSON:" + json.dumps(
        {"tag": tag, "sf_dir": sf_dir, "times": times, "runs": allruns}
    ))
    spark.stop()


if __name__ == "__main__":
    main()
