"""R4: schema identity + schema-change stream retirement.

The reference computes a canonical schema string of sorted fields
(/root/reference/pkg/arrow/schema.go:66-98) and hashes it into a schema
id; when a batch's schema id changes, the producer CLOSES the old IPC
stream and opens a new one — the old stream is retired, never mutated
(producer.go:337-366; the consumer mirrors per-schema readers,
consumer.go:166-189).

File-based Spark analog: each schema identity writes under its own
``schema_id=<id>`` stream directory. A schema change simply starts a new
directory; retired directories are never touched again, and the reader
unions all directories by name (missing columns -> null — the same
sparse-optional semantics the adaptive actual-schema gives the
reference). No rewrite, no migration job, no coordination: exactly the
append-only stream-retirement contract at 100 TB.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession


def canonical_schema_id(df: DataFrame) -> str:
    """Schema identity: sha-256 (truncated) of the canonical SORTED field
    list ``name:type:nullable`` — two DataFrames share an id iff their
    schemas are equal up to field order (schema.go:66-98 sorts fields the
    same way before hashing)."""
    fields = sorted(
        f"{f.name}:{f.dataType.simpleString()}:{f.nullable}" for f in df.schema.fields
    )
    return hashlib.sha256("|".join(fields).encode()).hexdigest()[:16]


def write_versioned(df: DataFrame, out_dir: str, subdir: str = "versioned", stats=None) -> str:
    """Append a batch under its schema's own stream directory and return
    the schema id. A batch with a NEW schema lands in a new directory
    (stream opened); prior directories are retired untouched.

    ``stats`` (plans.stats.ProducerStats) counts each NEW stream directory
    as ``schema_updates_performed`` + ``stream_producers_created`` (the
    producer closes the old IPC stream and opens a new one on schema
    change, producer.go:337-366; counters at stats.go:30-40)."""
    sid = canonical_schema_id(df)
    dest = f"{out_dir}/{subdir}/schema_id={sid}"
    if stats is not None:
        # existence via the Hadoop FS resolved from the path's scheme, so
        # URI out_dirs (file://, hdfs://, s3a://) count stream openings the
        # same way bare local paths do
        spark = df.sparkSession
        p = spark._jvm.org.apache.hadoop.fs.Path(dest)
        if not p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p):
            stats.inc("schema_updates_performed")
            stats.inc("stream_producers_created")
    (
        df.write.mode("append")
        .option("compression", "zstd")
        .parquet(dest)
    )
    return sid


def read_versioned(spark: SparkSession, out_dir: str, subdir: str = "versioned") -> DataFrame:
    """Union every schema stream by name (missing columns null) — the
    consumer's per-schema readers merged into one relation.

    Streams are listed via the Hadoop FS resolved from the path's scheme
    (same as ``write_versioned``'s existence check and the quarantine
    deletes in plans/pipeline.py), not a local ``glob.glob`` — with a
    ``file://``/``hdfs://`` out_dir the local glob saw no matches and
    raised FileNotFoundError on streams that exist."""
    jvm = spark._jvm
    pattern = jvm.org.apache.hadoop.fs.Path(f"{out_dir}/{subdir}/schema_id=*")
    fs = pattern.getFileSystem(spark._jsc.hadoopConfiguration())
    statuses = fs.globStatus(pattern) or []
    dirs = sorted(st.getPath().toString() for st in statuses)
    if not dirs:
        raise FileNotFoundError(f"no schema streams under {out_dir}/{subdir}")
    out = None
    for d in dirs:
        part = spark.read.parquet(d)
        out = part if out is None else out.unionByName(part, allowMissingColumns=True)
    return out
