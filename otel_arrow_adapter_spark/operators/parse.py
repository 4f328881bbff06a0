"""P1-P6 + R1 classifier: vectorized parse of turn text into OTEL-style columns.

Reference behavior being re-expressed (not ported):
- flatten + per-record typed columns: /root/reference/pkg/otel/logs/arrow/logs.go:38-62
  (LogsSchema: time ns, observed ns, trace/span id, severity number/text, body union)
- non-default suppression: AppendNonEmpty/AppendNonZero
  /root/reference/pkg/otel/common/schema/builder/string.go:78-105 — here
  ``nullif``/``when`` so defaults become nulls (Parquet then elides them).
- body union encoding (type tag + per-type column):
  /root/reference/pkg/otel/logs/arrow/logs.go:289-400.
- ID validation (16/8 byte checks, error-not-crash):
  /root/reference/pkg/otel/logs/otlp/logs.go:145-154 — malformed rows are
  routed to quarantine instead of raising.

Everything is built-in column expressions (JVM, whole-stage codegen): the
grammar is regular, so regexp_extract beats any UDF. A pandas-UDF grok
fallback lives in functions/grok.py for grammars that need real Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Regexes shared with the DuckDB oracles in __spark_entry__.py — keep RE2-safe
# (no lookbehind) so both engines accept them.
RE_LOG_TS = r"ts_us=([0-9]+)"
RE_LOG_LEVEL = r" level=([A-Z]+)"
RE_LOG_MSG = r' msg="([^"]*)"'
RE_LOG_CODE = r" code=([0-9]+)"
RE_LOG_RETRY = r" retry=(true|false)"
RE_METRIC_NAME = r"^name=([a-z_]+)"
RE_METRIC_VALUE = r" value=(-?[0-9]+)"
RE_METRIC_UNIT = r" unit=([a-z%]+)"
RE_TRACE_SPAN = r"^span=([0-9a-f]{16})"
RE_TRACE_PARENT = r" parent=([0-9a-f]{8})"
RE_TRACE_DUR = r" dur_ms=([0-9]+)"

# OTLP severity numbers (public OTel spec).
SEVERITY_NUMBER = {"TRACE": 1, "DEBUG": 5, "INFO": 9, "WARN": 13, "ERROR": 17, "FATAL": 21}

# Body union type tags — analog of the AnyValue discriminant
# (/root/reference/pkg/otel/common/arrow/attributes_16.go:131-196).
BODY_STR, BODY_INT, BODY_DOUBLE, BODY_BOOL, BODY_BYTES, BODY_SER = 1, 2, 3, 4, 5, 6


def _x(col: Column, pattern: str) -> Column:
    """regexp_extract with '' -> null (P6 non-default suppression)."""
    return F.nullif(F.regexp_extract(col, pattern, 1), F.lit(""))


def classify_signal(text: Column) -> Column:
    """R1 analog: payload-type dispatch by grammar shape.

    Reference dispatches decoded payloads by a type enum
    (/root/reference/pkg/otel/metrics/otlp/related_data.go:101-156); our
    payloads are text lines, so the type is recovered from the grammar.
    """
    return (
        F.when(text.rlike(r"^ts_us=[0-9]+ level="), F.lit("log"))
        .when(text.rlike(r"^name=[a-z_]+ value="), F.lit("metric"))
        .when(text.rlike(r"^span=[0-9a-f]{16} parent="), F.lit("trace"))
        .otherwise(F.lit("quarantine"))
    )


def parse_turns(df: DataFrame) -> DataFrame:
    """transcripts -> parsed, typed columns + signal_type.

    Input: (conv_id, turn_idx, role, text, tool, ts). Output adds:
    signal_type, log_* / metric_* / trace_* typed fields, severity,
    body struct (type tag + str), and keeps ``text`` verbatim for the
    per-turn equality contract.
    """
    t = F.col("text")
    sev_text = _x(t, RE_LOG_LEVEL)
    sev_num = F.element_at(
        F.create_map(*[y for k, v in SEVERITY_NUMBER.items() for y in (F.lit(k), F.lit(v))]),
        sev_text,
    )
    msg = _x(t, RE_LOG_MSG)

    return df.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
        "text",
        classify_signal(t).alias("signal_type"),
        # log fields
        _x(t, RE_LOG_TS).cast("long").alias("log_ts_us"),
        sev_text.alias("severity_text"),
        sev_num.cast("int").alias("severity_number"),
        msg.alias("msg"),
        _x(t, RE_LOG_CODE).cast("long").alias("code"),
        (_x(t, RE_LOG_RETRY) == "true").alias("retry"),
        # metric fields
        _x(t, RE_METRIC_NAME).alias("metric_name"),
        _x(t, RE_METRIC_VALUE).cast("long").alias("metric_value"),
        _x(t, RE_METRIC_UNIT).alias("metric_unit"),
        # trace fields (hex-string ids; binary form is unhex(span_hex) — the
        # 16-char id is 8 bytes, validated like logs.go:145-154)
        _x(t, RE_TRACE_SPAN).alias("span_hex"),
        _x(t, RE_TRACE_PARENT).alias("parent_hex"),
        _x(t, RE_TRACE_DUR).cast("long").alias("dur_ms"),
        # body union (always str-typed for text payloads; tag kept for parity
        # with the reference's 7-way union)
        F.struct(
            F.lit(BODY_STR).cast("tinyint").alias("body_type"),
            msg.alias("str"),
        ).alias("body"),
    )
