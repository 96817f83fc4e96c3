"""Extra measurement harness for the optimization round (guide §1.4).

NOT the frozen driver bench — this times individual declared queries in
isolation with the noop sink, labels jobs, and can dump
``explain("formatted")`` plans to plans/r06/.

Usage:
  python bench_extra.py time  <sf_dir> <repeats> [query ...]   # all if none
  python bench_extra.py plans <sf_dir> <tag> [query ...]       # dump plans
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _make_spark():
    from bench import _make_spark as mk

    return mk(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))


def cmd_time(sf_dir: str, repeats: int, names: list[str]) -> None:
    import __spark_entry__ as entry

    spark = _make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = names or list(qs)
    # warmup: one tiny query so JVM/codegen costs aren't billed to the first
    spark.range(1000).selectExpr("sum(id)").collect()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        samples = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            gc.collect()
        out[name] = samples
        print(f"{name}: {samples} min={min(samples)}", flush=True)
    print(json.dumps({n: min(v) for n, v in out.items()}))
    spark.stop()


def cmd_plans(sf_dir: str, tag: str, names: list[str]) -> None:
    import __spark_entry__ as entry

    spark = _make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = names or list(qs)
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            mode_jvm = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = df._jdf.queryExecution().explainString(mode_jvm)
        except Exception as e:  # plan capture must not abort the sweep
            plan = f"ERROR: {e}"
        path = f"plans/r06/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "time":
        cmd_time(sys.argv[2], int(sys.argv[3]), sys.argv[4:])
    elif mode == "plans":
        cmd_plans(sys.argv[2], sys.argv[3], sys.argv[4:])
    else:
        raise SystemExit(f"unknown mode {mode}")
