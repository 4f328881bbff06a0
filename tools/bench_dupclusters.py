"""Interleaved A/B timing of dup_clusters variants on the same pairs input.

Old = per-step convergence check (HEAD); New = double-step with self-loop
_prev carried through the propagation shuffle (working tree). Shared pairs
input built once from the sf0.1 doc near-dup chain; variants alternate
A,B,A,B,A,B and we report min + all samples per variant.
"""
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from otel_arrow_adapter_spark.functions.dedup import (  # noqa: E402
    _free_local_checkpoint,
    doc_shingles,
    dup_clusters,
    jaccard_pairs,
    lsh_candidates,
    minhash_signature,
)
from otel_arrow_adapter_spark.caching import owned_result  # noqa: E402


def dup_clusters_old(pairs, a_col="doc_a", b_col="doc_b", id_name="doc_id", max_iters=20):
    sym = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")).unionByName(
        pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    nodes = sym.select(F.col("src").alias("doc_id")).distinct()
    edges = (
        sym.unionByName(nodes.select(F.col("doc_id").alias("src"), F.col("doc_id").alias("dst")))
        .distinct()
        .persist()
    )
    labels = nodes.withColumn("label", F.col("doc_id")).localCheckpoint(eager=True)
    for _ in range(max_iters):
        nxt = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        changed = (
            nxt.alias("n")
            .join(labels.alias("p"), "doc_id")
            .where(F.col("n.label") != F.col("p.label"))
            .count()
        )
        _free_local_checkpoint(labels)
        labels = nxt
        if changed == 0:
            break
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    out = labels.join(F.broadcast(sizes), "label").select(
        F.col("doc_id").alias(id_name),
        F.col("label").alias("cluster_id"),
        "cluster_size",
        (F.col("doc_id") == F.col("label")).alias("is_rep"),
    )
    out = owned_result(out, edges)
    _free_local_checkpoint(labels)
    return out


def main():
    sf_dir = "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("bench_dupclusters")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    dp = e._docs_plus(spark, sf_dir)
    sh = doc_shingles(dp).persist()
    cand = lsh_candidates(minhash_signature(dp, num_hashes=8, shingles=sh), num_hashes=8, bands=4)
    pairs = jaccard_pairs(dp, threshold=0.5, candidates=cand, shingles=sh).persist()
    n_pairs = pairs.count()
    sh.unpersist()
    cand.unpersist()
    print(f"pairs={n_pairs}", flush=True)

    samples = {"old": [], "new": []}
    rows = {}
    for i in range(3):
        for name, fn in (("old", dup_clusters_old), ("new", dup_clusters)):
            t0 = time.monotonic()
            out = fn(pairs)
            rows[name] = out.count()
            dt = time.monotonic() - t0
            out.unpersist()
            samples[name].append(round(dt, 3))
            print(f"iter{i} {name}: {dt:.3f}s rows={rows[name]}", flush=True)
    assert rows["old"] == rows["new"], rows
    print({k: {"min": min(v), "all": v} for k, v in samples.items()}, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
