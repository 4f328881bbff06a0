"""Extra benchmarks for the optimization rounds (bench.py is FROZEN).

Per-query timing with bench.py's exact methodology (one warmup execution,
then min of QUERY_REPEATS timed runs with caches cleared between), over an
arbitrary subset of the registered queries, plus optional plan capture.

Usage:
  python bench_extra.py                        # all queries
  python bench_extra.py doc_dup_clusters,...   # subset
  OAAS_PLANS_DIR=plans/r06 python bench_extra.py q1,...  # also dump plans

Prints one JSON line {"queries": {name: sec}, "sf": ..., "cpus": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
QUERY_REPEATS = int(os.environ.get("OAAS_BENCH_QUERY_REPEATS", "2"))
PLANS_DIR = os.environ.get("OAAS_PLANS_DIR")
PLANS_SUFFIX = os.environ.get("OAAS_PLANS_SUFFIX", "")


def main() -> None:
    from otel_arrow_adapter_spark.session import get_spark
    import __spark_entry__ as entrymod

    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    spark = get_spark(app_name="oaas-bench-extra", cores=CPUS, shuffle_partitions=CPUS)

    qtimes: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if PLANS_DIR:
            os.makedirs(PLANS_DIR, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"{PLANS_DIR}/{name}{PLANS_SUFFIX}.txt", "w") as f:
                f.write(plan)
        fn(spark, SF_DIR).count()
        spark.catalog.clearCache()
        best = None
        for _ in range(QUERY_REPEATS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
            spark.catalog.clearCache()
        qtimes[name] = round(best, 3)
        print(f"  {name}: {qtimes[name]}", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": qtimes, "sf": SF_DIR, "cpus": CPUS}))


if __name__ == "__main__":
    main()
