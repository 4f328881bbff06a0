"""Grok fallback parse: macro expansion + vectorized pandas extraction must
match the JVM tokenizer parse on the log grammar (cross-path equality, the
profiler.go:278-295 discipline)."""

import pytest
from pyspark.sql import functions as F

from otel_arrow_adapter_spark.functions.grok import compile_grok, grok_match, grok_parse
from otel_arrow_adapter_spark.operators.parse import parse_turns

LOG_PAT = (
    r'ts_us=%{POSINT:log_ts_us} level=%{LOGLEVEL:severity_text}'
    r'(?: msg="%{DATA:msg}")?(?: code=%{POSINT:code})?(?: retry=%{BOOL:retry})?$'
)


def test_compile_grok_expands_macros():
    regex, fields = compile_grok(r"name=%{IDENT:name} value=%{INT:value}")
    assert fields == ["name", "value"]
    assert "(?P<name>[a-z_]+)" in regex and "(?P<value>[+-]?[0-9]+)" in regex


def test_compile_grok_rejects_unknown_and_duplicate():
    with pytest.raises(ValueError):
        compile_grok(r"%{NOPE:x}")
    with pytest.raises(ValueError):
        compile_grok(r"%{INT:x} %{INT:x}")
    with pytest.raises(ValueError):
        compile_grok(r"no captures at all")


def test_grok_parse_matches_jvm_parse(spark, transcripts):
    logs = transcripts.where(F.col("text").rlike(r"^ts_us=[0-9]+ level="))
    grokked = grok_parse(logs, LOG_PAT).select(
        "conv_id",
        "turn_idx",
        F.col("log_ts_us").try_cast("long").alias("log_ts_us"),
        "severity_text",
        "msg",
        F.col("code").try_cast("long").alias("code"),
        (F.col("retry") == "true").alias("retry"),
    )
    jvm = (
        parse_turns(transcripts)
        .where(F.col("signal_type") == "log")
        .select("conv_id", "turn_idx", "log_ts_us", "severity_text", "msg", "code", "retry")
    )
    assert grokked.exceptAll(jvm).count() == 0
    assert jvm.exceptAll(grokked).count() == 0


def test_grok_match_prefilter(spark):
    df = spark.createDataFrame(
        [("ts_us=5 level=INFO",), ("nope",)], "text string"
    )
    got = df.select(grok_match(r"ts_us=%{POSINT:t} level=%{LOGLEVEL:l}", F.col("text")).alias("m"))
    assert [r.m for r in got.collect()] == [True, False]
