"""BENCH harness: end-to-end pipeline throughput + per-query timings.

Prints ONE JSON line:
  {"metric": ..., "value": <sec>, "unit": "sec", "queries": {...}, "sf": ...,
   "turns": N, "throughput_full_turns_per_sec": ..., "scaling_efficiency": ...}

The scaling pair (local[8] vs local[32] on the same input) is the sandbox
stand-in for the north rule's N vs 4N executor requirement. Each pipeline
measurement runs in a FRESH subprocess (clean JVM — long-lived sessions
accumulate GC/shuffle state that contaminates timings); JVM startup is
excluded by timing inside the child. Evidence lands in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WORK = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/oaas_bench")
N_CONVS = int(os.environ.get("OAAS_BENCH_CONVS", "400000"))
MEAN_TURNS = int(os.environ.get("OAAS_BENCH_TURNS", "25"))

_CHILD = r"""
import sys, time, shutil, os, json
sys.path.insert(0, {repo!r})
from otel_arrow_adapter_spark.session import get_spark
from otel_arrow_adapter_spark.datagen import synthesize_tool_catalog
from otel_arrow_adapter_spark.plans import run_pipeline

cores, in_path, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = get_spark(app_name=f"oaas-bench-{{cores}}", cores=cores, shuffle_partitions=cores)
cat = synthesize_tool_catalog(spark, n_tools=45)
t = spark.read.parquet(in_path)
if os.path.exists(out_dir):
    shutil.rmtree(out_dir)
t0 = time.perf_counter()
run_pipeline(spark, t, cat, out_dir, run_id="bench")
print(json.dumps({{"sec": time.perf_counter() - t0}}))
"""


def pipeline_in_subprocess(cores: int, in_path: str, out_dir: str) -> float:
    repo = os.path.dirname(os.path.abspath(__file__))
    code = _CHILD.format(repo=repo)
    r = subprocess.run(
        [sys.executable, "-c", code, str(cores), in_path, out_dir],
        capture_output=True, text=True, check=True,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])["sec"]


def main() -> None:
    from otel_arrow_adapter_spark.session import get_spark
    from otel_arrow_adapter_spark.datagen import synthesize_transcripts
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="oaas-bench", cores=CPUS, shuffle_partitions=CPUS)

    in_path = f"{WORK}/transcripts_{N_CONVS}x{MEAN_TURNS}"
    if not os.path.exists(f"{in_path}/_SUCCESS"):
        synthesize_transcripts(
            spark, n_convs=N_CONVS, mean_turns=MEAN_TURNS, seed=42, partitions=64
        ).write.mode("overwrite").option("compression", "zstd").parquet(in_path)
    n_turns = spark.read.parquet(in_path).count()

    qtimes: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        qtimes[name] = round(time.perf_counter() - t0, 3)
    spark.stop()

    quarter = max(CPUS // 4, 1)
    # two interleaved runs per config, take min: the sandbox VM has CPU
    # burst-throttling that can make one cold run 5-10x slower; min is the
    # robust estimator for "what the hardware can do"
    t_full = min(
        pipeline_in_subprocess(CPUS, in_path, f"{WORK}/out_full") for _ in range(2)
    )
    t_quarter = min(
        pipeline_in_subprocess(quarter, in_path, f"{WORK}/out_quarter") for _ in range(2)
    )
    tp_full, tp_quarter = n_turns / t_full, n_turns / t_quarter
    efficiency = (tp_full / tp_quarter) / 4

    result = {
        "metric": "end_to_end_pipeline_sec",
        "value": round(t_full, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "turns": n_turns,
        "cores_full": CPUS,
        "cores_quarter": quarter,
        "throughput_full_turns_per_sec": round(tp_full, 1),
        "throughput_quarter_turns_per_sec": round(tp_quarter, 1),
        "scaling_efficiency": round(efficiency, 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — measured scaling evidence (north rule)\n\n"
            f"Input: {n_turns:,} synthetic transcript turns (seed=42, power-law skew), "
            "pipeline = parse -> enrich -> route -> fan-out sinks -> counts; each\n"
            "measurement in a fresh JVM (startup excluded).\n\n"
            "| parallelism | wall sec | turns/sec |\n|---|---|---|\n"
            f"| local[{quarter}] (N) | {t_quarter:.1f} | {tp_quarter:,.0f} |\n"
            f"| local[{CPUS}] (4N) | {t_full:.1f} | {tp_full:,.0f} |\n\n"
            f"**Scaling efficiency (N -> 4N): {efficiency:.3f}** (target >= 0.8)\n\n"
            f"Per-query timings at {SF_DIR}: see BENCH_r*.json.\n"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
