"""Metrics data-point star schema: encode / decode / rollups (O5, J3, A2).

The reference splits each metrics batch into a main METRICS record plus a
family of related records keyed by surrogate ids — NumberDP, HistogramDP,
SummaryDP, per-DP exemplars and attrs (registry:
/root/reference/pkg/otel/common/arrow/related_data.go:108-211; schemas:
metrics.go:33-47, number_data_point.go:36-47, histogram_dp.go:50-66,
summary_dp.go:36, exemplar.go:36-44). This module re-expresses that split
as pure DataFrame transforms:

- ``encode_metrics``: nested metrics -> {record_name: flat DataFrame}.
  IDs are NOT batch-order counters (meaningless under distributed
  execution): the metric id derives from a (hash-bucket, in-bucket rank)
  pair and every child id from (parent_id << 16 | position) — unique,
  deterministic, and assigned without any global window.
- ``decode_metrics``: the inverse — group children, re-nest, reproduce the
  input (round-trip contract, validation_process.md:23-32). Child arrays
  are re-assembled with sort_array; the generator emits them in canonical
  order, so equality is exact (assert.Equiv analog).
- ``histogram_rollup`` / ``summary_rollup`` / ``top_exemplars``: the
  HistogramDP / SummaryDP / Exemplar *computations* over raw number points
  (bucket counts with explicit bounds as array columns, exact quantile
  summaries, max-value exemplar with trace linkage) — what a metrics
  pipeline computes at 100 TB; all map-side-combinable single-shuffle aggs.

Sorts (O5): DP_SORT_KEYS per record, applied by ``write_metrics_records``
within partitions before the parquet write (the reference's
sort-for-compression, number_data_point.go:93-113 strategies; default =
by (parent_id, ts) — the ByTimestampParentID family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# O5 default sort-for-compression keys per related record.
DP_SORT_KEYS = {
    "metrics": ["res_id", "scope_id", "metric_type", "name"],
    "number_dp": ["parent_id", "ts_us"],
    "hist_dp": ["parent_id", "ts_us"],
    "exp_hist_dp": ["parent_id", "ts_us"],
    "summary_dp": ["parent_id", "ts_us"],
    "number_dp_exemplar": ["parent_id", "ts_us"],
    "hist_dp_exemplar": ["parent_id", "ts_us"],
    "exp_hist_dp_exemplar": ["parent_id", "ts_us"],
    "number_dp_attrs": ["key", "str", "parent_id"],
    "hist_dp_attrs": ["key", "str", "parent_id"],
    "exp_hist_dp_attrs": ["key", "str", "parent_id"],
    "summary_dp_attrs": ["key", "str", "parent_id"],
}


def assign_row_ids(
    df: DataFrame, key_cols: tuple[str, ...], id_name: str = "id", n_buckets: int = 64
) -> DataFrame:
    """Deterministic unique row ids WITHOUT a global window.

    The reference's ids are per-batch row counters (u16/u32 appended in
    walk order, metrics.go:42); a distributed table has no batch order, so
    id = (key-hash bucket << 32) | row_number-within-bucket. key_cols must
    be row-unique for determinism across runs."""
    b = F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("long")
    w = Window.partitionBy("_idb").orderBy(*key_cols)
    return (
        df.withColumn("_idb", b)
        .withColumn(id_name, F.shiftleft(F.col("_idb"), 32) + F.row_number().over(w))
        .drop("_idb")
    )


def _child_id(parent: Column, pos: Column) -> Column:
    # parent id occupies <= 38 bits (64 buckets << 32 + rank); 16 bits of
    # position below it keeps the child id unique in a long. ONLY valid for
    # first-level children (parent = a main-record id) — chaining the shift
    # again would push the bucket bits past bit 63 and collide; grandchildren
    # use _grandchild_id.
    return F.shiftleft(parent, 16) + pos


def _grandchild_id(parent: Column, pos: Column) -> Column:
    """Grandchild (exemplar) ids: the dp parent id already uses ~54 bits, so
    a second 16-bit shift would overflow the signed long and drop the bucket
    bits — exemplars of metrics in different buckets with equal in-bucket
    rank/positions would collide. Derive from a 64-bit hash of (parent_id,
    pos) instead; uniqueness is asserted by test_exemplar_ids_unique."""
    return F.xxhash64(parent, pos)


def _explode_dps(nested: DataFrame, family: str) -> DataFrame:
    return nested.select(
        F.col("id").alias("parent_id"), F.posexplode(family).alias("_pos", "dp")
    ).withColumn("id", _child_id(F.col("parent_id"), F.col("_pos")))


def _exemplar_record(dps: DataFrame) -> DataFrame:
    return dps.select(
        F.col("id").alias("parent_id"), F.posexplode("dp.exemplars").alias("_pos", "ex")
    ).select(
        _grandchild_id(F.col("parent_id"), F.col("_pos")).alias("id"),
        "parent_id",
        F.col("ex.ts_us").alias("ts_us"),
        F.col("ex.int_value").alias("int_value"),
        F.col("ex.double_value").alias("double_value"),
        F.unhex(F.col("ex.span_hex")).alias("span_id"),
        F.unhex(F.col("ex.trace_hex")).alias("trace_id"),
    )


def _attrs_record(dps: DataFrame) -> DataFrame:
    """Per-DP attrs melt — same long shape as the main attrs record
    (parent_id, key, type tag, str), attributes_16.go:41-51."""
    return dps.select(F.col("id").alias("parent_id"), F.explode("dp.attrs").alias("a")).select(
        "parent_id",
        F.col("a.key").alias("key"),
        F.lit(1).cast("tinyint").alias("type"),
        F.col("a.str").alias("str"),
    )


def encode_metrics(nested: DataFrame, id_key: tuple[str, ...] = ("gen_id",)) -> dict[str, DataFrame]:
    """Nested metrics -> star schema of flat related records."""
    m = assign_row_ids(nested, id_key)
    records: dict[str, DataFrame] = {}
    records["metrics"] = m.select(
        "id",
        "res_id",
        "scope_id",
        "metric_type",
        "name",
        "description",
        "unit",
        "aggregation_temporality",
        "is_monotonic",
        *id_key,
    )

    ndp = _explode_dps(m, "number_dps")
    records["number_dp"] = ndp.select(
        "id",
        "parent_id",
        F.col("dp.start_ts_us").alias("start_ts_us"),
        F.col("dp.ts_us").alias("ts_us"),
        F.col("dp.int_value").alias("int_value"),
        F.col("dp.double_value").alias("double_value"),
    )
    records["number_dp_exemplar"] = _exemplar_record(ndp)
    records["number_dp_attrs"] = _attrs_record(ndp)

    hdp = _explode_dps(m, "hist_dps")
    records["hist_dp"] = hdp.select(
        "id",
        "parent_id",
        F.col("dp.start_ts_us").alias("start_ts_us"),
        F.col("dp.ts_us").alias("ts_us"),
        F.col("dp.count").alias("count"),
        F.col("dp.sum").alias("sum"),
        F.col("dp.bucket_counts").alias("bucket_counts"),
        F.col("dp.explicit_bounds").alias("explicit_bounds"),
        F.col("dp.min").alias("min"),
        F.col("dp.max").alias("max"),
    )
    records["hist_dp_exemplar"] = _exemplar_record(hdp)
    records["hist_dp_attrs"] = _attrs_record(hdp)

    edp = _explode_dps(m, "exp_hist_dps")
    records["exp_hist_dp"] = edp.select(
        "id",
        "parent_id",
        F.col("dp.start_ts_us").alias("start_ts_us"),
        F.col("dp.ts_us").alias("ts_us"),
        F.col("dp.count").alias("count"),
        F.col("dp.sum").alias("sum"),
        F.col("dp.scale").alias("scale"),
        F.col("dp.zero_count").alias("zero_count"),
        F.col("dp.positive_offset").alias("positive_offset"),
        F.col("dp.positive_bucket_counts").alias("positive_bucket_counts"),
        F.col("dp.negative_offset").alias("negative_offset"),
        F.col("dp.negative_bucket_counts").alias("negative_bucket_counts"),
        F.col("dp.min").alias("min"),
        F.col("dp.max").alias("max"),
    )
    records["exp_hist_dp_exemplar"] = _exemplar_record(edp)
    records["exp_hist_dp_attrs"] = _attrs_record(edp)

    sdp = _explode_dps(m, "summary_dps")
    records["summary_dp"] = sdp.select(
        "id",
        "parent_id",
        F.col("dp.start_ts_us").alias("start_ts_us"),
        F.col("dp.ts_us").alias("ts_us"),
        F.col("dp.count").alias("count"),
        F.col("dp.sum").alias("sum"),
        F.col("dp.quantile_values").alias("quantile_values"),
    )
    records["summary_dp_attrs"] = _attrs_record(sdp)
    return records


def _nest_children(dps: DataFrame, exemplars: DataFrame | None, attrs: DataFrame) -> DataFrame:
    """Re-attach exemplars/attrs arrays to their dp rows (J3 parent wiring,
    left joins on surrogate keys — the decode-side index lookup,
    /root/reference/pkg/otel/metrics/otlp/related_data.go:84-156)."""
    out = dps
    if exemplars is not None:
        ex = exemplars.groupBy("parent_id").agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "ts_us",
                        "int_value",
                        "double_value",
                        F.lower(F.hex("span_id")).alias("span_hex"),
                        F.lower(F.hex("trace_id")).alias("trace_hex"),
                    )
                )
            ).alias("exemplars")
        )
        out = out.join(ex, out["id"] == ex["parent_id"], "left").drop(ex["parent_id"])
        out = out.withColumn(
            "exemplars",
            F.coalesce(
                "exemplars",
                F.array().cast(
                    "array<struct<ts_us:bigint,int_value:bigint,double_value:double,"
                    "span_hex:string,trace_hex:string>>"
                ),
            ),
        )
    at = attrs.groupBy("parent_id").agg(
        F.sort_array(F.collect_list(F.struct("key", "str"))).alias("attrs")
    )
    out = out.join(at, out["id"] == at["parent_id"], "left").drop(at["parent_id"])
    return out.withColumn(
        "attrs", F.coalesce("attrs", F.array().cast("array<struct<key:string,str:string>>"))
    )


def decode_metrics(records: dict[str, DataFrame]) -> DataFrame:
    """Star schema -> nested metrics (inverse of encode_metrics)."""
    ndp = _nest_children(
        records["number_dp"], records["number_dp_exemplar"], records["number_dp_attrs"]
    )
    number = ndp.groupBy("parent_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "start_ts_us", "ts_us", "int_value", "double_value", "exemplars", "attrs"
                )
            )
        ).alias("number_dps")
    )
    hdp = _nest_children(
        records["hist_dp"], records["hist_dp_exemplar"], records["hist_dp_attrs"]
    )
    hist = hdp.groupBy("parent_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "start_ts_us",
                    "ts_us",
                    "count",
                    "sum",
                    "bucket_counts",
                    "explicit_bounds",
                    "min",
                    "max",
                    "exemplars",
                    "attrs",
                )
            )
        ).alias("hist_dps")
    )
    edp = _nest_children(
        records["exp_hist_dp"], records["exp_hist_dp_exemplar"], records["exp_hist_dp_attrs"]
    )
    exp_hist = edp.groupBy("parent_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "start_ts_us",
                    "ts_us",
                    "count",
                    "sum",
                    "scale",
                    "zero_count",
                    "positive_offset",
                    "positive_bucket_counts",
                    "negative_offset",
                    "negative_bucket_counts",
                    "min",
                    "max",
                    "exemplars",
                    "attrs",
                )
            )
        ).alias("exp_hist_dps")
    )
    sdp = _nest_children(records["summary_dp"], None, records["summary_dp_attrs"])
    summ = sdp.groupBy("parent_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct("start_ts_us", "ts_us", "count", "sum", "quantile_values", "attrs")
            )
        ).alias("summary_dps")
    )
    m = records["metrics"]
    out = m
    for child, cname in (
        (number, "number_dps"),
        (hist, "hist_dps"),
        (exp_hist, "exp_hist_dps"),
        (summ, "summary_dps"),
    ):
        out = out.join(child, out["id"] == child["parent_id"], "left").drop("parent_id")
    # absent family -> empty array (matches the generator's empty arrays)
    ndp_t = (
        "array<struct<start_ts_us:bigint,ts_us:bigint,int_value:bigint,double_value:double,"
        "exemplars:array<struct<ts_us:bigint,int_value:bigint,double_value:double,"
        "span_hex:string,trace_hex:string>>,attrs:array<struct<key:string,str:string>>>>"
    )
    hdp_t = (
        "array<struct<start_ts_us:bigint,ts_us:bigint,count:bigint,sum:double,"
        "bucket_counts:array<bigint>,explicit_bounds:array<double>,min:double,max:double,"
        "exemplars:array<struct<ts_us:bigint,int_value:bigint,double_value:double,"
        "span_hex:string,trace_hex:string>>,attrs:array<struct<key:string,str:string>>>>"
    )
    edp_t = (
        "array<struct<start_ts_us:bigint,ts_us:bigint,count:bigint,sum:double,"
        "scale:int,zero_count:bigint,positive_offset:int,"
        "positive_bucket_counts:array<bigint>,negative_offset:int,"
        "negative_bucket_counts:array<bigint>,min:double,max:double,"
        "exemplars:array<struct<ts_us:bigint,int_value:bigint,double_value:double,"
        "span_hex:string,trace_hex:string>>,attrs:array<struct<key:string,str:string>>>>"
    )
    sdp_t = (
        "array<struct<start_ts_us:bigint,ts_us:bigint,count:bigint,sum:double,"
        "quantile_values:array<struct<quantile:double,value:double>>,"
        "attrs:array<struct<key:string,str:string>>>>"
    )
    return (
        out.withColumn("number_dps", F.coalesce("number_dps", F.array().cast(ndp_t)))
        .withColumn("hist_dps", F.coalesce("hist_dps", F.array().cast(hdp_t)))
        .withColumn("exp_hist_dps", F.coalesce("exp_hist_dps", F.array().cast(edp_t)))
        .withColumn("summary_dps", F.coalesce("summary_dps", F.array().cast(sdp_t)))
    )


def write_metrics_records(records: dict[str, DataFrame], out_dir: str, mode: str = "overwrite") -> None:
    """One sorted zstd parquet table per related record (S3 analog); each
    record sorted by its O5 keys before the write."""
    for name, df in records.items():
        keys = [k for k in DP_SORT_KEYS.get(name, []) if k in df.columns]
        (
            df.sortWithinPartitions(*keys)
            .write.mode(mode)
            .option("compression", "zstd")
            .parquet(f"{out_dir}/metrics_records/{name}")
        )


# ---------------------------------------------------------------------------
# Rollups over raw number points (the DP computations at pipeline scale)
# ---------------------------------------------------------------------------

def histogram_rollup(
    points: DataFrame,
    bounds: list[float],
    value_col: str = "metric_value",
    keys: tuple[str, ...] = ("metric_name", "metric_unit"),
) -> DataFrame:
    """Aggregate raw points into HistogramDP rows: count, sum, min, max,
    bucket_counts (array<long>, len(bounds)+1) with OTLP bucket semantics
    (bucket i counts bounds[i-1] < v <= bounds[i]; last = overflow).
    Shape: one map-side-combined groupBy — no window, no second shuffle."""
    v = F.col(value_col)
    in_bucket = []
    for i, b in enumerate(bounds):
        lo = F.lit(bounds[i - 1]) if i > 0 else None
        cond = (v <= F.lit(b)) if lo is None else ((v > lo) & (v <= F.lit(b)))
        in_bucket.append(F.sum(F.when(cond, 1).otherwise(0)).cast("long"))
    in_bucket.append(F.sum(F.when(v > F.lit(bounds[-1]), 1).otherwise(0)).cast("long"))
    return points.groupBy(*keys).agg(
        F.count(v).cast("long").alias("count"),
        F.sum(v).cast("double").alias("sum"),
        F.min(v).cast("double").alias("min"),
        F.max(v).cast("double").alias("max"),
        F.array(*in_bucket).alias("bucket_counts"),
        F.array(*[F.lit(float(b)) for b in bounds]).alias("explicit_bounds"),
    )


def exp2_lower_bound(i: int, scale: int) -> int:
    """Smallest integer >= 2^(i / 2^scale), computed EXACTLY.

    Positive scales: nested integer square roots —
    floor(sqrt(floor(sqrt(x)))) == floor(x^(1/4)) (and so on), so ``scale``
    isqrt passes over 2^i give floor(2^(i/2^scale)) with no floating point
    anywhere; the boundary is an integer iff 2^scale divides i
    (2^fraction is irrational). Negative scales (OTLP allows down to -10:
    each bucket spans 2^|scale| octaves) are plain integer powers,
    2^(i * 2^|scale|). Shared by the Spark rollup AND the generated DuckDB
    oracle SQL — both engines only ever compare integers, so nonzero
    scales stay engine-portable (libm log2 would disagree in the last ulp
    at exact powers)."""
    import math

    if scale < 0:
        return 1 << (i * (1 << -scale))
    r = 1 << i
    for _ in range(scale):
        r = math.isqrt(r)
    return r if i % (1 << scale) == 0 else r + 1


def exp_histogram_rollup(
    points: DataFrame,
    max_buckets: int = 18,
    value_col: str = "metric_value",
    keys: tuple[str, ...] = ("metric_name", "metric_unit"),
    scale: int = 0,
    trim: bool = True,
) -> DataFrame:
    """ExpHistogramDP rollup (ehistogram_dp.go:47-64 shape; int32 ``scale``
    field at ehistogram_dp.go:57,81) with the reference's NEGATIVE bucket
    family (``ExpHistogramNegative``, ehistogram_dp.go:60,84,254): base-2
    exponential buckets at any integer scale (base = 2^(2^-scale); scale 0
    = power-of-two buckets, scale 1 = sqrt(2)-steps, scale -1 = 4x steps —
    negative scales down to OTLP's -10 are plain integer powers).

    Bucket index i counts |v| in [2^(i/2^scale), 2^((i+1)/2^scale)) —
    lower-inclusive, mirrored for negatives. NOTE this is a deliberate,
    documented divergence from OTLP/the reference, which use the
    UPPER-inclusive convention (base^i, base^(i+1)]: lower-inclusive keeps
    exact power-of-two values in the intuitively-named bucket in the
    integer domain this operator contracts to (a value of 8 lands in
    [8,16) here vs (4,8] there); offsets, trimming, downscaling and
    merging are convention-independent. Boundaries are computed with EXPLICIT
    integer boundary comparisons (``exp2_lower_bound``): engine-portable
    (no libm log2, no string/base conversion — F.conv stringifies doubles
    with fractions or scientific notation and silently mis-buckets them,
    and to_base rendering varies across DuckDB versions). The value is
    floored to a long first, making the integral-domain contract explicit
    for non-integer inputs. zero_count counts v == 0 ONLY (OTLP semantics;
    negatives go to the mirrored buckets, never "zero"). sum/min/max are
    BIGINT end-to-end so the oracle hashes identically on any engine
    version. One map-side-combined groupBy, no window.

    To cover the same value range as (max_buckets=B, scale=0), pass
    max_buckets=B*2^scale at the finer scale — then ``merge_exp_histograms``
    can downscale it losslessly onto the coarser family.

    ``trim=True`` (default) emits the OTLP sparse-bucket transport shape
    the reference carries on every ExpHistogramDP
    (ehistogram_dp.go:58-62 — positive/negative DataPointBuckets with
    ``offset``): positive_offset/negative_offset = first non-empty bucket
    index, bucket arrays trimmed of leading AND trailing zeros. Real
    producers emit sparse arrays at large offsets (ns latencies start
    around index ~30 at scale 0), so without trimming the transport wastes
    a count slot per empty leading bucket. ``trim=False`` keeps the dense
    offset-0 arrays (index i = bucket [2^(i/2^s), ...))."""
    v = F.floor(F.col(value_col)).cast("long")
    pos, neg = [], []
    for i in range(max_buckets - 1):
        lo, hi = exp2_lower_bound(i, scale), exp2_lower_bound(i + 1, scale)
        pos.append(F.sum(F.when((v >= lo) & (v < hi), 1).otherwise(0)).cast("long"))
        neg.append(F.sum(F.when((v <= -lo) & (v > -hi), 1).otherwise(0)).cast("long"))
    top = exp2_lower_bound(max_buckets - 1, scale)
    pos.append(F.sum(F.when(v >= top, 1).otherwise(0)).cast("long"))
    neg.append(F.sum(F.when(v <= -top, 1).otherwise(0)).cast("long"))
    dense = points.groupBy(*keys).agg(
        F.count(v).cast("long").alias("count"),
        F.sum(v).cast("long").alias("sum"),
        F.lit(scale).cast("int").alias("scale"),
        F.sum(F.when(v == 0, 1).otherwise(0)).cast("long").alias("zero_count"),
        F.array(*pos).alias("_pos_dense"),
        F.array(*neg).alias("_neg_dense"),
        F.min(v).cast("long").alias("min"),
        F.max(v).cast("long").alias("max"),
    )
    if trim:
        pos_off, pos_arr = trim_exp_buckets(F.col("_pos_dense"))
        neg_off, neg_arr = trim_exp_buckets(F.col("_neg_dense"))
    else:
        pos_off, pos_arr = F.lit(0).cast("int"), F.col("_pos_dense")
        neg_off, neg_arr = F.lit(0).cast("int"), F.col("_neg_dense")
    return dense.select(
        *keys,
        "count",
        "sum",
        "scale",
        "zero_count",
        pos_off.alias("positive_offset"),
        pos_arr.alias("positive_bucket_counts"),
        neg_off.alias("negative_offset"),
        neg_arr.alias("negative_bucket_counts"),
        "min",
        "max",
    )


def exp_histogram_rollup_pair(
    points: DataFrame,
    gate: Column,
    true_spec: tuple[int, int],
    false_spec: tuple[int, int],
    value_col: str = "metric_value",
    keys: tuple[str, ...] = ("metric_name", "metric_unit"),
) -> DataFrame:
    """One-pass fusion of two ``exp_histogram_rollup`` calls over a boolean
    partition of ``points``: rows where ``gate`` holds roll up with
    ``true_spec = (max_buckets, scale)``, the rest with ``false_spec`` —
    exactly ``rollup(points.where(gate), *true_spec).unionByName(
    rollup(points.where(~gate), *false_spec))`` but with ONE scan of the
    fact instead of two. The collector fan-in shape
    ``merge_exp_histograms`` consumes: at real scale the input is a
    corpus-sized fact table and the second scan this removes is a second
    pass over the corpus.

    Mechanism: the gate joins the grouping key (so the aggregate stays
    exactly as wide as one fine-scale rollup — a single gated pass with
    both families' conditional aggregates was MEASURED SLOWER than two
    scans: ~116 agg columns of WHEN chains lose whole-stage-codegen
    economics), every group aggregates at the FINE spec, and the coarse
    family is derived from the fine dense arrays by the same lossless
    ``downscale_exp_buckets`` fold ``merge_exp_histograms`` uses — exact
    because the coarse boundaries are a subset of the fine ones, which is
    what ``false_spec`` must satisfy (same covered value range:
    ``max_buckets_t = max_buckets_f * 2^(scale_t - scale_f)``).

    Returns the union eagerly ``localCheckpoint``-ed (the caller owns it,
    same contract as the frames fed to ``merge_exp_histograms`` before);
    the intermediate per-(key, gate) fine aggregate is freed here.
    Row-presence semantics match the two-call form: a family row exists
    iff its subset contains at least one input row."""
    from otel_arrow_adapter_spark.caching import free_local_checkpoint

    (mb_t, sc_t), (mb_f, sc_f) = true_spec, false_spec
    factor = 1 << (sc_t - sc_f)
    if sc_t < sc_f or mb_t != mb_f * factor:
        raise ValueError(
            f"false_spec {false_spec} is not a lossless downscale of "
            f"true_spec {true_spec}: need max_buckets_t = max_buckets_f * "
            f"2^(scale_t - scale_f)"
        )
    dense = exp_histogram_rollup(
        points.withColumn("_gate", gate),
        max_buckets=mb_t,
        value_col=value_col,
        keys=(*keys, "_gate"),
        scale=sc_t,
        trim=False,
    ).localCheckpoint(eager=True)

    def family(is_true: bool) -> DataFrame:
        pos, neg = F.col("positive_bucket_counts"), F.col("negative_bucket_counts")
        if not is_true:
            pos = downscale_exp_buckets(pos, F.lit(factor))
            neg = downscale_exp_buckets(neg, F.lit(factor))
        pos_off, pos_arr = trim_exp_buckets(pos)
        neg_off, neg_arr = trim_exp_buckets(neg)
        return dense.where(F.col("_gate") == is_true).select(
            *keys,
            "count",
            "sum",
            F.lit(sc_t if is_true else sc_f).cast("int").alias("scale"),
            "zero_count",
            pos_off.alias("positive_offset"),
            pos_arr.alias("positive_bucket_counts"),
            neg_off.alias("negative_offset"),
            neg_arr.alias("negative_bucket_counts"),
            "min",
            "max",
        )

    both = family(True).unionByName(family(False)).localCheckpoint(eager=True)
    free_local_checkpoint(dense)
    return both


def trim_exp_buckets(counts: Column) -> tuple[Column, Column]:
    """Dense offset-0 bucket array -> (offset, sparse array): offset =
    0-based index of the first non-zero count, array trimmed of leading
    and trailing zeros (all-zero -> offset 0 + empty array). Pure column
    expressions; array_position returns 0 when nothing matches — the same
    convention DuckDB's list_position uses, so the generated oracle SQL
    mirrors this exactly."""
    nz = F.transform(counts, lambda c: c != 0)
    first = F.array_position(nz, F.lit(True))  # 1-based, 0 if all zero
    last = F.size(nz) - F.array_position(F.reverse(nz), F.lit(True)) + 1
    offset = F.when(first == 0, F.lit(0)).otherwise(first - 1).cast("int")
    trimmed = F.when(
        first == 0, F.array().cast("array<long>")
    ).otherwise(F.slice(counts, first, last - first + 1))
    return offset, trimmed


def downscale_exp_buckets(counts: Column, factor: Column) -> Column:
    """Collapse an offset-0 exponential bucket array from scale s to scale
    s' = s - log2(factor): each run of ``factor`` adjacent fine buckets
    sums into one coarse bucket (exact — the coarse boundaries are a
    subset of the fine ones). Pure column expressions; a ragged tail
    (including the fine overflow bucket) folds into the last coarse bucket,
    preserving its ">= top boundary" overflow meaning."""
    n_out = F.ceil(F.size(counts) / factor).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_out - 1),
        lambda j: F.aggregate(
            F.slice(counts, j * factor + 1, factor),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )


def merge_exp_histograms(
    rollups: DataFrame,
    keys: tuple[str, ...] = ("metric_name", "metric_unit"),
) -> DataFrame:
    """Merge ExpHistogramDP rows with HETEROGENEOUS scales — the aggregate
    a collector fan-in needs when sources report at different resolutions
    (the reference transports per-point int32 scale, ehistogram_dp.go:57;
    OTLP merge semantics: downscale the finer histogram until bases match,
    then add buckets).

    Per group: target scale = min(scale). Every bucket is addressed by its
    ABSOLUTE index (row offset + array position), downscaled to the target
    scale with an arithmetic right shift — floor((off+i)/2^(s-target)),
    correct for NEGATIVE offsets too (values in (0,1) at positive scales,
    or .pb captures whose producers emit them) — then summed at (key, idx)
    grain via one map-side-combined groupBy; never a whole-array reduce on
    the driver. The merged arrays are rebuilt sparse: group offset = first
    non-empty coarse index, interior gaps zero-filled through a
    map_from_entries lookup over sequence(min_idx, max_idx) — all JVM-side
    column expressions. Offset alignment means rows need NOT cover the
    same value range. Scalar fields merge as sum/min/max; the min-scale
    dimension join is broadcast (one row per key group)."""
    gmin = rollups.groupBy(*keys).agg(F.min("scale").alias("_target_scale"))
    j = rollups.join(F.broadcast(gmin), list(keys)).withColumn(
        "_shift", F.col("scale") - F.col("_target_scale")
    )
    scalars = j.groupBy(*keys).agg(
        F.sum("count").cast("long").alias("count"),
        F.sum("sum").cast("long").alias("sum"),
        F.min("scale").cast("int").alias("scale"),
        F.sum("zero_count").cast("long").alias("zero_count"),
        F.min("min").cast("long").alias("min"),
        F.max("max").cast("long").alias("max"),
    )

    def _ewise(side: str) -> DataFrame:
        # absolute fine index = offset + position; arithmetic shiftright =
        # floor division by 2^shift (exact for negative indices, unlike
        # integer '/' which truncates toward zero)
        per_idx = (
            j.select(
                *keys,
                "_shift",
                F.coalesce(F.col(f"{side}_offset"), F.lit(0)).alias("_off"),
                F.posexplode_outer(f"{side}_bucket_counts").alias("_i", "_c"),
            )
            .where(F.col("_c").isNotNull() & (F.col("_c") != 0))
            .select(
                *keys,
                F.expr("shiftright(_off + _i, _shift)").alias("_idx"),
                F.col("_c"),
            )
            .groupBy(*keys, "_idx")
            .agg(F.sum("_c").alias("_c"))
        )
        g = per_idx.groupBy(*keys).agg(
            F.min("_idx").alias("_lo"),
            F.max("_idx").alias("_hi"),
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("_idx", "_c")))
            ).alias("_m"),
        )
        # zero-fill interior gaps: look up each absolute index in the
        # (idx -> count) map, 0 where absent
        return g.select(
            *keys,
            F.col("_lo").cast("int").alias(f"{side}_offset"),
            F.expr(
                "transform(sequence(_lo, _hi), "
                "i -> coalesce(try_element_at(_m, i), 0L))"
            ).alias(f"{side}_bucket_counts"),
        )

    out = (
        scalars.join(_ewise("positive"), list(keys), "left")
        .join(_ewise("negative"), list(keys), "left")
    )
    empty = F.array().cast("array<long>")
    return out.select(
        *keys,
        "count",
        "sum",
        "scale",
        "zero_count",
        F.coalesce("positive_offset", F.lit(0)).alias("positive_offset"),
        F.coalesce("positive_bucket_counts", empty).alias("positive_bucket_counts"),
        F.coalesce("negative_offset", F.lit(0)).alias("negative_offset"),
        F.coalesce("negative_bucket_counts", empty).alias("negative_bucket_counts"),
        "min",
        "max",
    )


def exp_hist_quantiles(
    eh: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    keys: tuple[str, ...] = ("metric_name", "metric_unit"),
    scale: int = 0,
    max_buckets: int = 18,
) -> DataFrame:
    """Mergeable quantile estimation from exponential-histogram rollups —
    the DDSketch-style scale path for percentiles. Exact percentile needs a
    full per-group sort of raw values; here each group is already reduced
    to O(max_buckets) counts (``exp_histogram_rollup`` and
    ``merge_exp_histograms`` are each one map-side-combined shuffle), so
    quantiles over 10^12 rows cost a window over O(groups x buckets) slot
    rows. The [est_lo, est_hi] bracket is exact — the rank-q value provably
    lies in it — with relative width 2^(2^-scale) (scale 0 = a 2x bracket);
    the overflow bucket reports its lower edge with the next power as the
    nominal hi, so size max_buckets to the data domain.

    Consumes the rollup's sparse transport shape (offset + trimmed arrays,
    negative family mirrored). Slot order is true value order: negative
    buckets by descending absolute index, then zero_count, then positives
    ascending. rank = max(ceil(q*count), 1); the answer is the first slot
    whose running count reaches it (min_by over a per-group cumulative
    window — partitioned, never global). Bucket edges are the same
    exact-integer ``exp2_lower_bound`` literals the rollup compared
    against, so a DuckDB oracle replays the estimates bit-for-bit."""
    bounds = [exp2_lower_bound(i, scale) for i in range(max_buckets + 1)]
    barr = F.array(*[F.lit(b).cast("long") for b in bounds])
    ks = list(keys)

    # ONE slot array per group row (negatives + zero + positives), so the
    # rollup lineage is scanned once — a 3-way union of per-side explodes
    # would re-evaluate it three times. HOF lambdas are interpreted, but
    # they run over O(max_buckets) elements per GROUP, not per input row.
    def side(name: str, sign: int):
        off = F.col(f"{name}_offset")

        def slot(c, i):
            j = off + i  # absolute bucket index
            lo = F.try_element_at(barr, (j + 1).cast("int"))
            hi = F.try_element_at(barr, (j + 2).cast("int"))
            if sign > 0:
                ordc, est_lo, est_hi = (j + 1).cast("long"), lo, hi
            else:  # bucket j holds v in [-hi, -lo] (integer domain)
                ordc, est_lo, est_hi = (-j - 1).cast("long"), -hi, -lo
            return F.struct(
                ordc.alias("ord"),
                c.alias("cnt"),
                est_lo.alias("est_lo"),
                est_hi.alias("est_hi"),
            )

        return F.transform(F.col(f"{name}_bucket_counts"), slot)

    zero_slot = F.array(
        F.struct(
            F.lit(0).cast("long").alias("ord"),
            F.col("zero_count").alias("cnt"),
            F.lit(0).cast("long").alias("est_lo"),
            F.lit(0).cast("long").alias("est_hi"),
        )
    )
    slots = (
        eh.select(
            *ks,
            "count",
            F.explode(
                F.concat(side("negative", -1), zero_slot, side("positive", 1))
            ).alias("_s"),
        )
        .select(*ks, "count", "_s.*")
        .where(F.col("cnt") > 0)
    )
    w = Window.partitionBy(*ks).orderBy("ord")
    slots = slots.withColumn("cum", F.sum("cnt").over(w))
    expanded = slots.withColumn(
        "q", F.explode(F.array(*[F.lit(float(x)) for x in qs]))
    )
    rank = F.greatest(F.ceil(F.col("q") * F.col("count")), F.lit(1))
    return (
        expanded.where(F.col("cum") >= rank)
        .groupBy(*ks, "q")
        .agg(
            F.min_by("est_lo", "ord").alias("est_lo"),
            F.min_by("est_hi", "ord").alias("est_hi"),
        )
    )


def summary_rollup(
    points: DataFrame,
    quantiles: list[float] = (0.5, 0.9, 0.99),
    value_col: str = "metric_value",
    keys: tuple[str, ...] = ("metric_name", "metric_unit"),
) -> DataFrame:
    """SummaryDP rows: count, sum + exact quantile values (summary_dp.go:36
    shape). Exact percentile so the DuckDB oracle matches bit-for-bit;
    percentile_approx is the drop-in at 10^12 rows."""
    v = F.col(value_col)
    pct = F.percentile(v, F.array(*[F.lit(q) for q in quantiles]))
    return points.groupBy(*keys).agg(
        F.count(v).cast("long").alias("count"),
        F.sum(v).cast("double").alias("sum"),
        *[
            F.round(pct.getItem(i), 6).alias(f"q{str(q).replace('.', '_')}")
            for i, q in enumerate(quantiles)
        ],
    )


def top_exemplars(
    points: DataFrame,
    value_col: str = "metric_value",
    keys: tuple[str, ...] = ("metric_name", "metric_unit"),
    link_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    k: int = 1,
) -> DataFrame:
    """Exemplar selection: the k max-value points per metric with their
    source linkage (exemplar.go:36-44 carries span/trace ids; the transcript
    analog links back to (conv_id, turn_idx)). Window partitioned by the
    metric keys — parallel across metrics, never a global sort."""
    w = Window.partitionBy(*keys).orderBy(
        F.desc(value_col), *[F.asc(c) for c in link_cols]
    )
    return (
        points.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(*keys, F.col(value_col).alias("exemplar_value"), *link_cols, F.col("_rn").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Multivariate metrics (the reference's flagship compression case:
# docs/benchmarks.md:73 — x7.97 vs OTLP because K values per (resource,
# timestamp) share ONE attrs/timestamp row instead of repeating them)
# ---------------------------------------------------------------------------

def encode_multivariate(wide: DataFrame, value_cols: list[str] | None = None) -> dict[str, DataFrame]:
    """Multivariate star schema: ONE main row per (resource, ts) carrying
    all K metric values as columns, plus ONE attrs row per resource —
    nothing repeated per value. The write path sorts by (res_id, ts_us)
    (delta-friendly timestamps, dictionary-friendly ids)."""
    if value_cols is None:
        value_cols = [c for c in wide.columns if c.startswith("v_")]
    main = wide.select("res_id", "ts_us", *value_cols)
    attrs = wide.select("res_id", "host", "dc").distinct()
    return {"metrics_mv": main, "mv_resource_attrs": attrs}


def explode_univariate(wide: DataFrame, value_cols: list[str] | None = None) -> DataFrame:
    """The univariate layout of the same data: one row per metric value
    with the attrs AND timestamp repeated — what the OTLP univariate model
    stores and exactly what the multivariate encode saves. Used as the
    measured baseline for the compression-factor row in BENCH/BASELINE.md."""
    if value_cols is None:
        value_cols = [c for c in wide.columns if c.startswith("v_")]
    ms = F.array(
        *[
            F.struct(F.lit(c).alias("name"), F.col(c).alias("value"))
            for c in value_cols
        ]
    )
    return wide.select(
        "res_id", "host", "dc", "ts_us", F.explode(ms).alias("m")
    ).select(
        "res_id",
        "host",
        "dc",
        "ts_us",
        F.col("m.name").alias("metric_name"),
        F.col("m.value").alias("value"),
    )


def write_multivariate_layouts(wide: DataFrame, out_dir: str) -> None:
    """Write three encodings of the same stream so bench records measured
    compression factors:

    - ``mv/``   multivariate star, sorted zstd parquet (ours)
    - ``uni/``  univariate long layout, sorted zstd parquet (columnar
      baseline — parquet dictionaries already amortize the repeats)
    - ``uni_json/`` univariate zstd JSON lines — the row-oriented baseline
      (the reference's x7.97 is Arrow vs OTLP *protobuf*+zstd, a
      row-oriented wire format; OTLP-JSON is its file-exporter analog,
      collector fileexporter / S7)."""
    recs = encode_multivariate(wide)
    recs["metrics_mv"].sortWithinPartitions("res_id", "ts_us").write.mode(
        "overwrite"
    ).option("compression", "zstd").parquet(f"{out_dir}/mv/metrics_mv")
    recs["mv_resource_attrs"].sortWithinPartitions("res_id").write.mode(
        "overwrite"
    ).option("compression", "zstd").parquet(f"{out_dir}/mv/resource_attrs")
    uni = explode_univariate(wide).sortWithinPartitions("metric_name", "res_id", "ts_us")
    uni.write.mode("overwrite").option("compression", "zstd").parquet(
        f"{out_dir}/uni/number_dp"
    )
    # gzip: Spark's text writer has no zstd without native hadoop; gzip is
    # within ~10% of zstd on JSON text and keeps the baseline honest
    uni.write.mode("overwrite").option("compression", "gzip").json(
        f"{out_dir}/uni_json/number_dp"
    )


# ---------------------------------------------------------------------------
# Temporality conversion (the collector's cumulativetodelta processor
# family; aggregation_temporality is carried by the star schema above)
# ---------------------------------------------------------------------------

def cumulative_to_delta(
    points: DataFrame,
    series_cols: tuple[str, ...] = ("metric_name", "metric_unit", "conv_id"),
    order_cols: tuple[str, ...] = ("turn_idx",),
    value_col: str = "metric_value",
    out_col: str = "delta",
) -> DataFrame:
    """OTLP cumulative -> delta temporality: per-series lag difference.
    First point of a series keeps its value (delta from the implicit 0);
    a counter RESET (value < previous) restarts the series (delta =
    value) — the standard collector semantics. Window partitions by the
    series key, so state is per-series and the transform parallelizes
    across series (never a global window)."""
    w = Window.partitionBy(*series_cols).orderBy(*order_cols)
    prev = F.lag(value_col).over(w)
    delta = (
        F.when(prev.isNull(), F.col(value_col))
        .when(F.col(value_col) < prev, F.col(value_col))
        .otherwise(F.col(value_col) - prev)
    )
    return points.withColumn(out_col, delta)


def delta_to_cumulative(
    points: DataFrame,
    series_cols: tuple[str, ...] = ("metric_name", "metric_unit", "conv_id"),
    order_cols: tuple[str, ...] = ("turn_idx",),
    value_col: str = "delta",
    out_col: str = "value",
) -> DataFrame:
    """Inverse for reset-free series: running sum per series (W2's
    running-reconstruction idiom). cumulative_to_delta ∘ this == id on
    nondecreasing inputs (pytest-gated); resets are inherently lossy."""
    w = Window.partitionBy(*series_cols).orderBy(*order_cols)
    return points.withColumn(
        out_col,
        F.sum(value_col).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
