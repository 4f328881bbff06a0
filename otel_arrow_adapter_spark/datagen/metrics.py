"""Deterministic nested-metrics generator (the pmetric.Metrics analog).

One row per metric with its data points nested, mirroring the source shape
the reference's producer walks (ResourceMetrics ⊃ ScopeMetrics ⊃ Metric ⊃
{NumberDP, HistogramDP, SummaryDP} ⊃ Exemplar,
/root/reference/pkg/otel/metrics/arrow/optimizer.go:73-101). Seeded
hash-of-id pseudo-randomness keeps generation a pure column expression
(no driver loop, no Python RNG) like datagen/transcripts.py; optional
fields drop out deterministically (the reference's randomly-missing-fields
fuzz, /root/reference/pkg/datagen/logs.go:116-147).

Array-valued children are CONSTRUCTED in canonical order (strictly
increasing leading sort field), so a decode that re-assembles them with
sort_array reproduces the input bit-for-bit — the vPath-equality analog of
assert.Equiv (/root/reference/pkg/otel/assert/equiv.go:107-157).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Metric type tags (reference MetricType u8, metrics.go:41; values follow
# the pmetric enum order loosely: gauge/sum collapse to "number" here).
MT_NUMBER, MT_HISTOGRAM, MT_SUMMARY = 1, 2, 3

_EPOCH = 1_704_067_200_000_000  # 2024-01-01 UTC, µs


def _exemplars(h: Column, d: Column, base_ts: Column) -> Column:
    """0-2 exemplars per dp, ts strictly increasing."""
    n = F.pmod(h + d, F.lit(3))
    e = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.struct(
            (base_ts + i + 1).alias("ts_us"),
            F.when(F.pmod(h + i, F.lit(2)) == 0, F.pmod(h + i, F.lit(500))).alias("int_value"),
            F.when(F.pmod(h + i, F.lit(2)) == 1, F.pmod(h + i, F.lit(500)) / 8.0).alias(
                "double_value"
            ),
            F.format_string("%016x", F.pmod(h + i, F.lit(0xFFFF)) + 1).alias("span_hex"),
            F.format_string("%032x", F.pmod(h + i, F.lit(0xFFFFF)) + 1).alias("trace_hex"),
        ),
    )
    return F.when(n > 0, e).otherwise(F.array().cast(e_type()))


def e_type() -> str:
    return (
        "array<struct<ts_us:bigint,int_value:bigint,double_value:double,"
        "span_hex:string,trace_hex:string>>"
    )


def a_type() -> str:
    return "array<struct<key:string,str:string>>"


def _attrs(h: Column, d: Column) -> Column:
    """0-2 string attrs per dp, keys in sorted order ('dc' < 'host')."""
    dc = F.struct(F.lit("dc").alias("key"), F.format_string("dc-%d", F.pmod(h + d, F.lit(3))).alias("str"))
    host = F.struct(
        F.lit("host").alias("key"), F.format_string("h-%d", F.pmod(h + d, F.lit(7))).alias("str")
    )
    return F.filter(
        F.array(
            F.when(F.pmod(h + d, F.lit(4)) != 0, dc),
            F.when(F.pmod(h + d, F.lit(5)) != 0, host),
        ),
        lambda x: x.isNotNull(),
    )


def synthesize_metrics_nested(
    spark: SparkSession, n_metrics: int = 300, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Nested metrics table: (gen_id, res_id, scope_id, metric_type, name,
    description, unit, aggregation_temporality, is_monotonic, number_dps,
    hist_dps, summary_dps) — exactly one dp family non-empty per row."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    m = (
        spark.range(0, n_metrics, 1, partitions)
        .withColumn("h", F.abs(F.xxhash64("id", F.lit(seed))))
        .withColumn("metric_type", (F.pmod(F.col("h"), F.lit(3)) + 1).cast("tinyint"))
        .withColumn("n_dps", (F.pmod(F.col("h"), F.lit(4)) + 1).cast("int"))
    )
    h = F.col("h")
    base = F.lit(_EPOCH) + F.col("id") * 1_000_000

    def dp_seq(builder):
        return F.transform(F.sequence(F.lit(0), F.col("n_dps") - 1), builder)

    number_dps = dp_seq(
        lambda d: F.struct(
            (base + d * 1000 - 5).alias("start_ts_us"),
            (base + d * 1000).alias("ts_us"),
            F.when(F.pmod(h + d, F.lit(2)) == 0, F.pmod(h + d, F.lit(100_000))).alias("int_value"),
            F.when(F.pmod(h + d, F.lit(2)) == 1, F.pmod(h + d, F.lit(100_000)) / 7.0).alias(
                "double_value"
            ),
            _exemplars(h, d, base + d * 1000).alias("exemplars"),
            _attrs(h, d).alias("attrs"),
        )
    )
    hist_dps = dp_seq(
        lambda d: F.struct(
            (base + d * 1000 - 5).alias("start_ts_us"),
            (base + d * 1000).alias("ts_us"),
            (F.pmod(h + d, F.lit(50)) + 1).alias("count"),
            (F.pmod(h + d, F.lit(10_000)) / 3.0).alias("sum"),
            F.array(*[F.pmod(h + d + i, F.lit(20)) for i in range(4)]).alias("bucket_counts"),
            F.array(F.lit(10.0), F.lit(100.0), F.lit(1000.0)).alias("explicit_bounds"),
            (F.pmod(h + d, F.lit(10)) * 1.0).alias("min"),
            (F.pmod(h + d, F.lit(10)) * 100.0 + 1).alias("max"),
            _exemplars(h, d, base + d * 1000).alias("exemplars"),
            _attrs(h, d).alias("attrs"),
        )
    )
    summary_dps = dp_seq(
        lambda d: F.struct(
            (base + d * 1000 - 5).alias("start_ts_us"),
            (base + d * 1000).alias("ts_us"),
            (F.pmod(h + d, F.lit(50)) + 1).alias("count"),
            (F.pmod(h + d, F.lit(10_000)) / 3.0).alias("sum"),
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("quantile"),
                        (F.pmod(h + d, F.lit(1000)) * q).alias("value"),
                    )
                    for q in (0.5, 0.9, 0.99)
                ]
            ).alias("quantile_values"),
            _attrs(h, d).alias("attrs"),
        )
    )

    def only_for(t: int, col: Column) -> Column:
        return F.when(F.col("metric_type") == t, col).otherwise(
            F.slice(col, 1, 0)  # empty array of the SAME type
        )

    return m.select(
        F.col("id").alias("gen_id"),
        F.pmod(h, F.lit(5)).alias("res_id"),
        F.pmod(h, F.lit(3)).alias("scope_id"),
        "metric_type",
        F.format_string("metric_%d", F.pmod(F.col("id"), F.lit(20))).alias("name"),
        F.when(F.pmod(h, F.lit(3)) != 0, F.format_string("desc %d", F.pmod(h, F.lit(9)))).alias(
            "description"
        ),
        F.element_at(F.array(F.lit("ms"), F.lit("count"), F.lit("%")), (F.pmod(h, F.lit(3)) + 1).cast("int")).alias("unit"),
        (F.pmod(h, F.lit(2)) + 1).cast("int").alias("aggregation_temporality"),
        (F.pmod(h, F.lit(2)) == 0).alias("is_monotonic"),
        only_for(MT_NUMBER, number_dps).alias("number_dps"),
        only_for(MT_HISTOGRAM, hist_dps).alias("hist_dps"),
        only_for(MT_SUMMARY, summary_dps).alias("summary_dps"),
    )
