"""S2/S6/S8 sources: columnar readers with Iceberg gated behind availability.

The production source is an Iceberg table partitioned by
(bucket(conv_id), days(ts)) — partition pruning + min/max stats play the
role of the reference's per-stream schema state (SURVEY.md §2.1 S5). The
sandbox image has no Iceberg runtime jar, so reads fall back to parquet;
the call sites are format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided testdata table (parquet)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Read a transcripts table: Iceberg identifier if configured, else a
    parquet path. S6 file-receiver analog (replay source)."""
    if "/" not in path and iceberg_available(spark):
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)
