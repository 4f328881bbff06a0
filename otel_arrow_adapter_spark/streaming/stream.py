"""Structured Streaming variant of the pipeline.

The reference's transport is a long-lived gRPC stream of batches with acks
(SURVEY.md §2.9); the Spark-native equivalent is Structured Streaming:
micro-batch = BatchArrowRecords, checkpoint = ack, watermark = the
reference's pacing/replay timer (file_reader.go replay source ~ file
streaming source here).

Streaming constraints shape the operator choices: surrogate IDs use the
content-hash mode (pure projection — dense_rank needs a global window,
which streaming forbids), and per-sink counts become a watermarked windowed
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.enrich import enrich_with_catalog
from ..operators.normalize import assign_surrogate_ids
from ..operators.parse import parse_turns
from ..operators.route import label_sinks

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def read_transcript_stream(spark: SparkSession, input_path: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_path)
    )


def build_stream(stream: DataFrame, catalog: DataFrame | None = None) -> DataFrame:
    """parse -> hash surrogate ids -> enrich -> label: all projections +
    one broadcast join — fully streaming-compatible."""
    parsed = parse_turns(stream)
    parsed = assign_surrogate_ids(parsed, mode="hash")
    if catalog is not None:
        parsed = enrich_with_catalog(parsed, catalog)
    return label_sinks(parsed)


def windowed_sink_counts(labeled: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """A4 streaming form: per (event-time window, sink) counts with late-data
    tolerance via watermark."""
    return (
        labeled.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "sink")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.approx_count_distinct("conv_id").alias("n_convs"))
        .select(
            F.col("window.start").alias("window_start"),
            "sink",
            "n_rows",
            "n_convs",
        )
    )


def start_routed_stream(
    labeled: DataFrame, out_dir: str, checkpoint: str, trigger_sec: int = 5
):
    """Fan-out sink write with exactly-once checkpointing — the ack analog.
    Dynamic partitionBy(sink) works in streaming parquet sinks."""
    return (
        labeled.writeStream.format("parquet")
        .option("path", f"{out_dir}/routed")
        .option("checkpointLocation", checkpoint)
        .partitionBy("sink")
        .trigger(processingTime=f"{trigger_sec} seconds")
        .outputMode("append")
        .start()
    )
