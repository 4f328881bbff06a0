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


def test_parse_paths_agree_on_malformed_values(spark):
    """ADVICE r1: the JVM tokenizer must gate field values with the same
    grammar the oracles/Arrow path use — 'parent=zzz', 'unit=MS', lowercase
    levels, partial-prefix values must parse identically on both paths."""
    rows = [
        ("c-0", 0, "u", None, 'ts_us=1 level=info msg="m" code=7 retry=true'),   # lowercase level
        ("c-1", 1, "u", None, 'ts_us=2 level=INFOX msg="m" code=9x retry=truex'),  # prefix values
        ("c-2", 2, "u", None, "name=cpu value=-12x unit=MS"),                     # bad unit, prefix value
        ("c-3", 3, "u", None, "span=0123456789abcdef parent=zzz dur_ms=5"),       # bad parent
        ("c-4", 4, "u", None, "span=0123456789abcdef parent=0123456789 dur_ms=5"),  # long parent
        ("c-5", 5, "u", None, 'ts_us=3 level= msg="" code='),                     # empty values
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, text string"
    ).withColumn("ts", F.current_timestamp())
    _assert_same(parse_turns(df).drop("body"), parse_turns_arrow(df).drop("body"))
    got = {r["turn_idx"]: r for r in parse_turns(df).collect()}
    # spot-check the oracle semantics (regexp_extract prefix matching)
    assert got[0]["severity_text"] is None and got[0]["code"] == 7
    assert got[1]["severity_text"] == "INFOX" and got[1]["severity_number"] is None
    assert got[1]["code"] == 9
    assert got[1]["retry"] is True  # ' retry=(true|false)' matches the prefix
    assert got[2]["metric_value"] == -12 and got[2]["metric_unit"] is None
    assert got[3]["parent_hex"] is None and got[3]["dur_ms"] == 5
    assert got[4]["parent_hex"] == "01234567"
    assert got[5]["severity_text"] is None and got[5]["code"] is None
