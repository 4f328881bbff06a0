"""Dictionary/delta encoding property tests — analog of the reference's
dictionary lifecycle tests (pkg/otel/arrow_record/logs_dict_test.go:35-189)
and the delta-decode mirror (pkg/otel/common/otlp/attributes.go:385-443).
Oracle: encode . decode == identity; width ladder matches cardinality."""

import pyspark.sql.functions as F
import pytest

from otel_arrow_adapter_spark.operators import (
    delta_decode_parent_ids,
    delta_encode_parent_ids,
    dict_decode_column,
    dict_encode_column,
    melt_attributes,
    parse_turns,
)
from otel_arrow_adapter_spark.operators.encode import with_encode_order, _index_type
from otel_arrow_adapter_spark.operators.normalize import assign_surrogate_ids


@pytest.fixture(scope="module")
def attrs(spark, transcripts):
    parsed = assign_surrogate_ids(parse_turns(transcripts))
    a = melt_attributes(parsed)
    # surrogate parent id: stable long per (conv_id, turn_idx)
    return a.withColumn(
        "parent_id",
        (F.xxhash64("conv_id") % 100000) * 1000 + F.col("turn_idx"),
    ).cache()


def test_delta_group_roundtrip(spark, attrs):
    enc = delta_encode_parent_ids(with_encode_order(attrs))
    # group starts carry raw parent ids; non-starts carry deltas >= 0
    assert enc.where(~F.col("group_start") & (F.col("parent_id_delta") < 0)).count() == 0
    dec = delta_decode_parent_ids(enc.drop("parent_id"))
    a = attrs.select("key", "type", "str", "int", "double", "bool", "parent_id")
    b = dec.select("key", "type", "str", "int", "double", "bool", "parent_id")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_delta_sorted_runs_compress(spark):
    """FIXTURES F5 'sorted-runs': dense parents per (key,value) group ->
    all non-start deltas exactly 1 (maxDelta invariant, builder/uint.go:261-265)."""
    df = spark.range(0, 1000).select(
        F.lit("k").alias("key"),
        F.lit(1).cast("tinyint").alias("type"),
        F.lit("v").alias("str"),
        F.lit(None).cast("long").alias("int"),
        F.lit(None).cast("double").alias("double"),
        F.lit(None).cast("boolean").alias("bool"),
        F.col("id").alias("parent_id"),
    )
    enc = delta_encode_parent_ids(with_encode_order(df))
    deltas = enc.where(~F.col("group_start")).select("parent_id_delta").distinct().collect()
    assert [r[0] for r in deltas] == [1]


@pytest.mark.parametrize(
    "card,expected",
    [(10, "smallint"), (256, "smallint"), (257, "int"), (70000, "bigint"), (200000, None)],
)
def test_index_width_ladder(card, expected):
    """u8 -> u16 -> u32 widening + overflow fallback
    (transform/dictionary.go:154-176) decided from cardinality."""
    assert _index_type(card, max_card=100000) == expected


def test_dict_roundtrip_low_card(spark, transcripts):
    enc, dict_df, itype = dict_encode_column(transcripts, "role")
    assert itype == "smallint"  # 4 roles fit the u8 analog
    dec = dict_decode_column(enc, dict_df, "role")
    a = transcripts.select("conv_id", "turn_idx", "role")
    b = dec.select("conv_id", "turn_idx", "role")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_dict_overflow_fallback(spark):
    """F5 'overflow': cardinality above the limit -> plain values
    (dictionary.go:189-216)."""
    df = spark.range(0, 5000).select(F.concat(F.lit("v"), F.col("id")).alias("val"))
    enc, dict_df, itype = dict_encode_column(df, "val", max_card=1000)
    assert dict_df is None and itype is None
    assert enc.columns == ["val"]


def test_dict_widen(spark):
    """F5 'widen': ~70k distinct -> bigint (u32 analog) index."""
    df = spark.range(0, 70000).select(F.concat(F.lit("v"), F.col("id")).alias("val"))
    enc, dict_df, itype = dict_encode_column(df, "val", max_card=1 << 20)
    assert itype == "bigint"
    assert dict_df.count() == 70000


def test_delta_group_roundtrip_bucketed(spark, attrs):
    """Scale path: window state scoped per (key, enc_bucket) — the analog of
    the reference's per-batch accumulator reset (attributes.go:266-269).
    encode . decode == identity must hold under bucketing, and the scopes
    must actually fan out beyond one-per-key."""
    enc = delta_encode_parent_ids(with_encode_order(attrs, n_buckets=8), n_buckets=8)
    assert enc.where(~F.col("group_start") & (F.col("parent_id_delta") < 0)).count() == 0
    dec = delta_decode_parent_ids(enc.drop("parent_id"))
    cols = ["key", "type", "str", "int", "double", "bool", "parent_id"]
    a, b = attrs.select(*cols), dec.select(*cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    n_scopes = enc.select("key", "enc_bucket").distinct().count()
    n_keys = enc.select("key").distinct().count()
    assert n_scopes > n_keys


def test_delta_group_roundtrip_property(spark):
    """Property form of encode∘decode == id (hypothesis): arbitrary
    (key, value, parent_id) multisets — duplicate rows, null values,
    colliding parents, bucketed state scopes — must all round-trip
    exactly. The reference's validation tests generate random inputs the
    same way (pkg/datagen seeded entropy, validation_test.go:53-124)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    row = st.tuples(
        st.sampled_from(["k1", "k2", "k3"]),
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        st.integers(min_value=0, max_value=1_000_000),
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(row, min_size=1, max_size=50))
    def check(rows):
        df = spark.createDataFrame(
            [(k, 1, v, p) for k, v, p in rows],
            "key string, type tinyint, str string, parent_id long",
        )
        for n_buckets in (0, 4):
            enc = delta_encode_parent_ids(
                with_encode_order(df, n_buckets=n_buckets), n_buckets=n_buckets
            )
            dec = delta_decode_parent_ids(enc.drop("parent_id"))
            a = df.select("key", "type", "str", "parent_id")
            b = dec.select("key", "type", "str", "parent_id")
            assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    check()
