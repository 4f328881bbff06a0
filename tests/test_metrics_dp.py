"""Metrics data-point star schema: encode -> related records -> decode ==
identity (the reference's metrics round-trip validation,
/root/reference/pkg/otel/metrics/validation_test.go), plus rollup unit
checks with known answers."""

import pyspark.sql.functions as F
import pytest

from otel_arrow_adapter_spark.datagen.metrics import synthesize_metrics_nested
from otel_arrow_adapter_spark.operators.metrics_dp import (
    assign_row_ids,
    decode_metrics,
    encode_metrics,
    histogram_rollup,
    summary_rollup,
    top_exemplars,
    write_metrics_records,
)

RECORD_NAMES = {
    "metrics",
    "number_dp",
    "hist_dp",
    "exp_hist_dp",
    "summary_dp",
    "number_dp_exemplar",
    "hist_dp_exemplar",
    "exp_hist_dp_exemplar",
    "number_dp_attrs",
    "hist_dp_attrs",
    "exp_hist_dp_attrs",
    "summary_dp_attrs",
}


@pytest.fixture(scope="module")
def nested(spark):
    return synthesize_metrics_nested(spark, n_metrics=120, seed=7).cache()


@pytest.fixture(scope="module")
def records(nested):
    return {k: v.cache() for k, v in encode_metrics(nested).items()}


def _canon(df, cols):
    """vPath-style canonical form: sorted JSON of sorted columns."""
    j = F.to_json(F.struct(*[F.col(c) for c in sorted(cols)]))
    return sorted(r[0] for r in df.select(j).collect())


def test_encode_produces_all_related_records(records):
    assert set(records) == RECORD_NAMES
    assert records["metrics"].count() == 120
    # every metric has exactly one non-empty dp family
    n_parents = (
        records["number_dp"].select("parent_id").distinct().count()
        + records["hist_dp"].select("parent_id").distinct().count()
        + records["exp_hist_dp"].select("parent_id").distinct().count()
        + records["summary_dp"].select("parent_id").distinct().count()
    )
    assert n_parents == 120


def test_child_ids_wire_to_parents(records):
    """J3: every related record's parent_id must resolve (no orphans)."""
    for child, parent in [
        ("number_dp", "metrics"),
        ("hist_dp", "metrics"),
        ("exp_hist_dp", "metrics"),
        ("summary_dp", "metrics"),
        ("number_dp_exemplar", "number_dp"),
        ("hist_dp_exemplar", "hist_dp"),
        ("exp_hist_dp_exemplar", "exp_hist_dp"),
        ("number_dp_attrs", "number_dp"),
        ("hist_dp_attrs", "hist_dp"),
        ("exp_hist_dp_attrs", "exp_hist_dp"),
        ("summary_dp_attrs", "summary_dp"),
    ]:
        orphans = (
            records[child]
            .join(records[parent].select(F.col("id").alias("parent_id")), "parent_id", "left_anti")
            .count()
        )
        assert orphans == 0, f"{child} has {orphans} orphan parent ids"


def test_metrics_roundtrip(nested, records):
    decoded = decode_metrics(records)
    cols = nested.columns  # gen_id + metric fields + 3 dp arrays
    assert _canon(nested, cols) == _canon(decoded, cols)


def test_assign_row_ids_unique_deterministic(spark, nested):
    a = assign_row_ids(nested, ("gen_id",))
    assert a.select("id").distinct().count() == a.count()
    b = {r["gen_id"]: r["id"] for r in assign_row_ids(nested, ("gen_id",)).collect()}
    for r in a.collect():
        assert b[r["gen_id"]] == r["id"]


def test_write_metrics_records_sorted(spark, records, tmp_path):
    write_metrics_records(records, str(tmp_path))
    back = spark.read.parquet(f"{tmp_path}/metrics_records/number_dp")
    assert back.count() == records["number_dp"].count()


def test_histogram_rollup_known_answer(spark):
    df = spark.createDataFrame(
        [("m", "ms", v) for v in [1, 50, 51, 500, 501, 7000]],
        "metric_name string, metric_unit string, metric_value long",
    )
    row = histogram_rollup(df, bounds=[50.0, 500.0, 5000.0]).collect()[0]
    # OTLP semantics: (-inf,50], (50,500], (500,5000], (5000,inf)
    assert row["bucket_counts"] == [2, 2, 1, 1]
    assert row["count"] == 6 and row["min"] == 1.0 and row["max"] == 7000.0
    assert row["sum"] == float(1 + 50 + 51 + 500 + 501 + 7000)


def test_summary_rollup_exact_quantiles(spark):
    df = spark.createDataFrame(
        [("m", "ms", v) for v in range(1, 101)],
        "metric_name string, metric_unit string, metric_value long",
    )
    row = summary_rollup(df, quantiles=[0.5, 0.99]).collect()[0]
    assert row["count"] == 100 and row["q0_5"] == 50.5
    assert row["q0_99"] == pytest.approx(99.01)


def test_top_exemplars_linkage(spark):
    df = spark.createDataFrame(
        [("m", "ms", 5, "c1", 0), ("m", "ms", 9, "c2", 1), ("m", "ms", 9, "c0", 2)],
        "metric_name string, metric_unit string, metric_value long, conv_id string, turn_idx int",
    )
    rows = top_exemplars(df, k=2).orderBy("rank").collect()
    assert (rows[0]["exemplar_value"], rows[0]["conv_id"]) == (9, "c0")  # tie -> conv_id asc
    assert (rows[1]["exemplar_value"], rows[1]["conv_id"]) == (9, "c2")


def test_exp_histogram_rollup_known_answer(spark):
    from otel_arrow_adapter_spark.operators.metrics_dp import exp_histogram_rollup

    vals = [0, 1, 2, 3, 4, 8, 1 << 17, -1, -3, -(1 << 17)]
    df = spark.createDataFrame(
        [("m", "ms", v) for v in vals],
        "metric_name string, metric_unit string, metric_value long",
    )
    row = exp_histogram_rollup(df, max_buckets=18).collect()[0]
    # base-2 lower-inclusive buckets: 1->[1,2) idx0; 2,3->idx1; 4->idx2;
    # 8->idx3; 2^17 -> overflow bucket (idx >= 17); 0 -> zero_count ONLY;
    # negatives land in the mirrored family: -1->idx0, -3->idx1, -2^17->idx17
    assert row["zero_count"] == 1 and row["count"] == 10
    assert row["positive_bucket_counts"][:4] == [1, 2, 1, 1]
    assert row["positive_bucket_counts"][17] == 1
    assert row["negative_bucket_counts"][:2] == [1, 1]
    assert row["negative_bucket_counts"][17] == 1
    assert (
        sum(row["positive_bucket_counts"])
        + sum(row["negative_bucket_counts"])
        + row["zero_count"]
        == row["count"]
    )
    assert row["scale"] == 0 and row["min"] == -(1 << 17) and row["max"] == (1 << 17)
    assert row["sum"] == sum(vals)


def test_exp_histogram_rollup_pair_matches_two_calls(spark):
    """The one-pass gated fusion must be row-identical to the two separate
    rollups it replaces (including row-presence: a key whose subset is
    empty on one side yields no family row, and a gate that is all-true
    for a key yields only the true-side row)."""
    from pyspark.sql import functions as F

    from otel_arrow_adapter_spark.operators.metrics_dp import (
        exp_histogram_rollup,
        exp_histogram_rollup_pair,
    )

    vals = [0, 1, 2, 3, 4, 8, 1 << 17, -1, -3, -(1 << 17), 7, 100]
    rows = [("m", "ms", i, v) for i, v in enumerate(vals)]
    # key "n" has ONLY even-idx rows -> no coarse family row may appear
    rows += [("n", "s", 0, 5), ("n", "s", 2, 9)]
    df = spark.createDataFrame(
        rows,
        "metric_name string, metric_unit string, turn_idx int, metric_value long",
    )
    gate = F.col("turn_idx") % 2 == 0
    fused = exp_histogram_rollup_pair(df, gate, (36, 1), (18, 0))
    fine = exp_histogram_rollup(df.where(gate), max_buckets=36, scale=1)
    coarse = exp_histogram_rollup(df.where(~gate), max_buckets=18, scale=0)
    ref = fine.unionByName(coarse)
    key = ["metric_name", "metric_unit", "scale"]
    got = {tuple(r[k] for k in key): r.asDict() for r in fused.collect()}
    want = {tuple(r[k] for k in key): r.asDict() for r in ref.collect()}
    assert got == want
    fused.unpersist()


def test_exp_histogram_rollup_floors_doubles(spark):
    """Non-integral values are floored before bucketing (the explicit
    integral-domain contract — F.conv-based bucketing silently mis-bucketed
    doubles via fraction/scientific-notation stringification)."""
    from otel_arrow_adapter_spark.operators.metrics_dp import exp_histogram_rollup

    df = spark.createDataFrame(
        [("m", "ms", v) for v in [1.9, 2.5, 0.4, -0.5]],
        "metric_name string, metric_unit string, metric_value double",
    )
    row = exp_histogram_rollup(df, max_buckets=4).collect()[0]
    # floor: 1.9->1 (idx0), 2.5->2 (idx1), 0.4->0 (zero), -0.5->-1 (neg idx0)
    assert row["positive_bucket_counts"][:2] == [1, 1]
    assert row["negative_bucket_counts"][0] == 1
    assert row["zero_count"] == 1


def test_exemplar_ids_unique(records):
    """Grandchild (exemplar) ids must be unique WITHIN each record — the
    chained-shift scheme dropped the parent's bucket bits past bit 63, so
    exemplars of metrics in different buckets with equal in-bucket
    rank/positions collided (and went negative)."""
    for rec in ("number_dp_exemplar", "hist_dp_exemplar", "exp_hist_dp_exemplar"):
        df = records[rec]
        assert df.select("id").distinct().count() == df.count(), rec


def test_multivariate_layouts_equivalent(spark):
    """The wide (multivariate) and long (univariate) layouts carry the same
    data: per-variable sums agree, the star split has the right grains."""
    from otel_arrow_adapter_spark.datagen.metrics import synthesize_metrics_multivariate
    from otel_arrow_adapter_spark.operators.metrics_dp import (
        encode_multivariate,
        explode_univariate,
    )

    wide = synthesize_metrics_multivariate(spark, n_resources=5, n_ts=10, n_vars=3)
    uni = explode_univariate(wide)
    assert uni.count() == 5 * 10 * 3
    recs = encode_multivariate(wide)
    assert recs["metrics_mv"].count() == 50
    assert recs["mv_resource_attrs"].count() == 5
    wide_sums = wide.agg(*[F.sum(f"v_{j}").alias(f"v_{j}") for j in range(3)]).collect()[0]
    uni_sums = {
        r["metric_name"]: r["s"]
        for r in uni.groupBy("metric_name").agg(F.sum("value").alias("s")).collect()
    }
    assert all(uni_sums[f"v_{j}"] == wide_sums[f"v_{j}"] for j in range(3))


def test_temporality_roundtrip_and_resets(spark):
    """cumulative->delta->cumulative == id on reset-free series; resets
    restart the series with delta = value (collector semantics)."""
    from otel_arrow_adapter_spark.operators.metrics_dp import (
        cumulative_to_delta,
        delta_to_cumulative,
    )

    rows = [("m", "ms", "c1", i, v) for i, v in enumerate([3, 7, 7, 15])] + [
        ("m", "ms", "c2", i, v) for i, v in enumerate([10, 12, 4, 9])  # reset at 4
    ]
    df = spark.createDataFrame(
        rows, "metric_name string, metric_unit string, conv_id string, turn_idx int, metric_value long"
    )
    d = cumulative_to_delta(df)
    got = {(r.conv_id, r.turn_idx): r.delta for r in d.collect()}
    assert [got[("c1", i)] for i in range(4)] == [3, 4, 0, 8]
    assert [got[("c2", i)] for i in range(4)] == [10, 2, 4, 5]  # reset restarts
    # reset-free series round-trips exactly
    c1 = d.where(F.col("conv_id") == "c1")
    back = delta_to_cumulative(c1)
    assert {(r.turn_idx, r.value) for r in back.collect()} == {(0, 3), (1, 7), (2, 7), (3, 15)}


def test_exp2_lower_bound_exact():
    """Boundary helper: exact ceil(2^(i/2^s)) with no floating point."""
    from otel_arrow_adapter_spark.operators.metrics_dp import exp2_lower_bound

    # scale 0: plain powers of two
    assert [exp2_lower_bound(i, 0) for i in range(5)] == [1, 2, 4, 8, 16]
    # scale 1: 1, ceil(sqrt2)=2, 2, ceil(2*sqrt2)=3, 4, ceil(4*sqrt2)=6, 8
    assert [exp2_lower_bound(i, 1) for i in range(7)] == [1, 2, 2, 3, 4, 6, 8]
    # scale 2: boundaries 2^(i/4); ceil: 1,2,2,2,2,3,3,4,4
    assert [exp2_lower_bound(i, 2) for i in range(9)] == [1, 2, 2, 2, 2, 3, 3, 4, 4]
    # exactness far beyond double precision: i=240, scale=1 -> 2^120
    assert exp2_lower_bound(240, 1) == 1 << 120


def test_exp_histogram_rollup_scale1_known_answer(spark):
    from otel_arrow_adapter_spark.operators.metrics_dp import exp_histogram_rollup

    vals = [1, 2, 3, 4, 5, 6, -3]
    df = spark.createDataFrame(
        [("m", "ms", v) for v in vals],
        "metric_name string, metric_unit string, metric_value long",
    )
    row = exp_histogram_rollup(df, max_buckets=8, scale=1).collect()[0]
    # scale-1 lower bounds (integer ceil): [1,2,2,3,4,6,8] ->
    # 1->idx0; [sqrt2,2) has no integers -> idx1 = 0; 2->idx2; 3->idx3;
    # 4,5->idx4 [4,6); 6->idx5 [6,8); -3 mirrors to neg idx3
    assert row["scale"] == 1
    # trailing zeros trimmed; the negative family is sparse: one count at
    # absolute index 3, carried as offset=3 + a single-element array
    assert row["positive_offset"] == 0
    assert row["positive_bucket_counts"] == [1, 0, 1, 1, 2, 1]
    assert row["negative_offset"] == 3
    assert row["negative_bucket_counts"] == [1]


def test_merge_exp_histograms_two_scales_equals_direct_rollup(spark):
    """The downscale-and-merge invariant: rollup half the points at scale 1
    (double the buckets), half at scale 0, merge -> EXACTLY the direct
    scale-0 rollup over all points (coarse boundaries are a subset of fine
    ones, so downscaling is lossless)."""
    from otel_arrow_adapter_spark.operators.metrics_dp import (
        exp_histogram_rollup,
        merge_exp_histograms,
    )

    vals = [0, 1, 2, 3, 5, 9, 17, 100, 1000, -1, -7, -300, 4096, 1 << 17]
    df = spark.createDataFrame(
        [("m", "ms", i, v) for i, v in enumerate(vals)],
        "metric_name string, metric_unit string, i int, metric_value long",
    )
    fine = exp_histogram_rollup(df.where("i % 2 = 0"), max_buckets=36, scale=1)
    coarse = exp_histogram_rollup(df.where("i % 2 = 1"), max_buckets=18, scale=0)
    merged = merge_exp_histograms(fine.unionByName(coarse)).collect()[0]
    direct = exp_histogram_rollup(df, max_buckets=18, scale=0).collect()[0]
    for f in [
        "count", "sum", "scale", "zero_count",
        "positive_offset", "positive_bucket_counts",
        "negative_offset", "negative_bucket_counts", "min", "max",
    ]:
        assert merged[f] == direct[f], (f, merged[f], direct[f])


def test_downscale_exp_buckets_column(spark):
    import pyspark.sql.functions as F

    from otel_arrow_adapter_spark.operators.metrics_dp import downscale_exp_buckets

    df = spark.createDataFrame([([1, 2, 3, 4, 5],)], "c array<bigint>")
    out = df.select(
        downscale_exp_buckets(F.col("c"), F.lit(2)).alias("d2"),
        downscale_exp_buckets(F.col("c"), F.lit(1)).alias("d1"),
    ).collect()[0]
    assert out["d2"] == [3, 7, 5]  # ragged tail folds into the last bucket
    assert out["d1"] == [1, 2, 3, 4, 5]  # factor 1 = identity


def test_exp_histogram_negative_scale_and_merge(spark):
    """OTLP negative scales (each bucket spans 2^|s| octaves): boundaries
    are exact integer powers, and merging a scale-0 histogram into a
    scale=-1 group downscales 2 octave-buckets per coarse bucket."""
    from otel_arrow_adapter_spark.operators.metrics_dp import (
        exp2_lower_bound,
        exp_histogram_rollup,
        merge_exp_histograms,
    )

    assert [exp2_lower_bound(i, -1) for i in range(4)] == [1, 4, 16, 64]
    assert [exp2_lower_bound(i, -2) for i in range(3)] == [1, 16, 256]

    vals = [1, 2, 3, 4, 5, 15, 16, 100, 1000, -2, -20]
    df = spark.createDataFrame(
        [("m", "ms", i, v) for i, v in enumerate(vals)],
        "metric_name string, metric_unit string, i int, metric_value long",
    )
    row = exp_histogram_rollup(df, max_buckets=9, scale=-1).collect()[0]
    # [1,4): 1,2,3 -> idx0; [4,16): 4,5,15 -> idx1; [16,64): 16 -> idx2;
    # [64,256): 100 -> idx3; [256,1024): 1000? 1000 >= 256 and < 1024 -> idx4
    assert row["scale"] == -1
    assert row["positive_bucket_counts"][:5] == [3, 3, 1, 1, 1]
    assert row["negative_bucket_counts"][:3] == [1, 0, 1]  # -2 idx0, -20 idx2 [16,64)

    # heterogeneous merge down to scale -1
    fine = exp_histogram_rollup(df.where("i % 2 = 0"), max_buckets=18, scale=0)
    coarse = exp_histogram_rollup(df.where("i % 2 = 1"), max_buckets=9, scale=-1)
    merged = merge_exp_histograms(fine.unionByName(coarse)).collect()[0]
    direct = exp_histogram_rollup(df, max_buckets=9, scale=-1).collect()[0]
    for f in ["count", "sum", "scale", "zero_count",
              "positive_offset", "positive_bucket_counts",
              "negative_offset", "negative_bucket_counts", "min", "max"]:
        assert merged[f] == direct[f], (f, merged[f], direct[f])


def test_exp_histogram_sparse_high_offset(spark):
    """ns-latency shape (VERDICT r4 §missing #1): values around 2^30 with
    scale 0 must come back as a SHORT array at a large offset, not 30
    leading zero slots."""
    from otel_arrow_adapter_spark.operators.metrics_dp import exp_histogram_rollup

    vals = [1 << 30, (1 << 30) + 5, 1 << 32]
    df = spark.createDataFrame(
        [("lat", "ns", v) for v in vals],
        "metric_name string, metric_unit string, metric_value long",
    )
    row = exp_histogram_rollup(df, max_buckets=40).collect()[0]
    assert row["positive_offset"] == 30
    assert row["positive_bucket_counts"] == [2, 0, 1]
    assert row["negative_offset"] == 0
    assert row["negative_bucket_counts"] == []


def test_merge_exp_histograms_aligns_offsets(spark):
    """Offset alignment (VERDICT r4 next-round #4): merging rows with
    DIFFERENT (scale, offset) — including a negative offset, as .pb
    captures from sub-unit-value producers carry — sums buckets at the
    right absolute indices, with interior gaps zero-filled."""
    from otel_arrow_adapter_spark.operators.metrics_dp import merge_exp_histograms

    mk = lambda scale, off, counts, n: (  # noqa: E731
        "m", "ms", n, 0, scale, 0, off, counts, 0, [], 0, 0,
    )
    df = spark.createDataFrame(
        [
            # scale 1, fine absolute idx 8..9 -> coarse idx 4 (both)
            mk(1, 8, [1, 2], 3),
            # scale 0 already coarse, idx 2 and (gap) idx 6
            mk(0, 2, [5, 0, 0, 0, 7], 12),
            # scale 1, NEGATIVE offset: fine idx -3 -> floor(-3/2) = -2
            mk(1, -3, [4], 4),
        ],
        "metric_name string, metric_unit string, count long, sum long, "
        "scale int, zero_count long, positive_offset int, "
        "positive_bucket_counts array<long>, negative_offset int, "
        "negative_bucket_counts array<long>, min long, max long",
    )
    row = merge_exp_histograms(df).collect()[0]
    assert row["scale"] == 0
    assert row["positive_offset"] == -2
    # absolute coarse indices: -2:4, 2:5, 4:3, 6:7 -> spans -2..6
    assert row["positive_bucket_counts"] == [4, 0, 0, 0, 5, 0, 3, 0, 7]
    assert row["count"] == 19
    assert row["negative_offset"] == 0 and row["negative_bucket_counts"] == []


def test_exp_hist_quantiles_bracket_and_merge(spark):
    """Sketch quantiles: (a) every [est_lo, est_hi] bracket contains the
    exact rank-q value and spans at most 2x (scale 0); (b) quantiles from
    two per-source rollups MERGED equal quantiles from one direct rollup —
    the mergeability that makes this the 10^12-row percentile path; (c)
    negative values order before zero before positives."""
    import math

    from otel_arrow_adapter_spark.operators.metrics_dp import (
        exp_hist_quantiles,
        exp_histogram_rollup,
        merge_exp_histograms,
    )

    vals = [-9, -2, 0, 0, 1, 3, 3, 7, 20, 150, 1000]
    df = spark.createDataFrame(
        [("lat", "ms", v, i) for i, v in enumerate(vals)],
        "metric_name string, metric_unit string, metric_value long, i int",
    )
    qs = (0.1, 0.5, 0.9, 1.0)
    direct = exp_histogram_rollup(df, max_buckets=12)
    got = {
        r["q"]: (r["est_lo"], r["est_hi"])
        for r in exp_hist_quantiles(direct, qs, max_buckets=12).collect()
    }
    sv = sorted(vals)
    for q in qs:
        rank = max(math.ceil(q * len(vals)), 1)
        exact = sv[rank - 1]
        lo, hi = got[q]
        assert lo <= exact <= hi, (q, exact, got[q])
        if exact != 0:
            assert abs(hi) <= 2 * abs(lo) and abs(lo) >= 1  # 2x bracket
    # q=0.1 -> rank ceil(1.1)=2 -> value -2, negative bucket j=1 = [-4,-2];
    # q=0.5 -> rank 6 -> value 3, positive bucket j=1 = [2,4]
    assert got[0.1] == (-4, -2)
    assert got[0.5] == (2, 4)
    # mergeability: split sources, rollup each half, merge, same estimates
    half = exp_histogram_rollup(
        df.withColumn("metric_unit", F.col("metric_unit")),
        max_buckets=12,
        keys=("metric_name", "metric_unit"),
    )
    parts = df.withColumn("src", F.col("i") % 2)
    per_src = exp_histogram_rollup(
        parts, max_buckets=12, keys=("metric_name", "metric_unit", "src")
    ).drop("src")
    merged = merge_exp_histograms(per_src)
    got_m = {
        r["q"]: (r["est_lo"], r["est_hi"])
        for r in exp_hist_quantiles(merged, qs, max_buckets=12).collect()
    }
    assert got_m == got
    assert half.count() == 1
