"""Arrow-UDF parse == JVM expression parse (the reference's cross-protocol
result-equality discipline, /root/reference/pkg/benchmark/profiler.go:278-295:
two physical paths, identical results, or the run is invalid)."""

from pyspark.sql import functions as F

from otel_arrow_adapter_spark.operators.parse import parse_turns
from otel_arrow_adapter_spark.operators.parse_arrow import parse_turns_arrow


def _assert_same(a, b):
    assert a.columns == b.columns
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_arrow_parse_equals_sql_parse_events(spark, transcripts):
    _assert_same(parse_turns(transcripts).drop("body"), parse_turns_arrow(transcripts).drop("body"))


def test_arrow_parse_equals_sql_parse_synth(spark, synth_transcripts):
    _assert_same(
        parse_turns(synth_transcripts).drop("body"),
        parse_turns_arrow(synth_transcripts).drop("body"),
    )


def test_arrow_parse_body_struct(spark, transcripts):
    got = (
        parse_turns_arrow(transcripts)
        .where(F.col("signal_type") == "log")
        .select("body.body_type", "body.str", "msg")
        .limit(50)
        .collect()
    )
    assert got
    for r in got:
        assert r["body_type"] == 1
        assert r["str"] == r["msg"]


def test_arrow_parse_malformed_values_quarantine_not_crash(spark):
    rows = [
        ("c-0", 0, "user", None, "ts_us=notanint level=INFO"),
        ("c-0", 1, "user", None, "name=cpu value=xyz unit=ms"),
        ("c-0", 2, "user", None, "span=0123456789abcdef parent=zzz dur_ms=abc"),
        ("c-0", 3, "user", None, ""),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, text string"
    ).withColumn("ts", F.current_timestamp())
    out = {r["turn_idx"]: r for r in parse_turns_arrow(df).collect()}
    assert out[0]["signal_type"] == "quarantine"  # bad ts_us fails the anchor
    assert out[1]["signal_type"] == "metric" and out[1]["metric_value"] is None
    assert out[2]["signal_type"] == "trace"
    assert out[2]["parent_hex"] is None and out[2]["dur_ms"] is None
    assert out[3]["signal_type"] == "quarantine"
