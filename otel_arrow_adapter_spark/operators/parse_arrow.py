"""P1-P6 hot path: the parse as a vectorized Arrow UDF (mapInArrow + RE2).

Identical semantics to ``operators.parse.parse_turns`` (property-tested for
equality), different physical strategy: per-batch pyarrow.compute kernels —
RE2 ``extract_regex`` with named groups, one anchored pattern per signal —
running in Python worker processes. Two reasons this is the 100 TB path:

1. RE2 is allocation-free and ~an order of magnitude faster than JVM
   ``java.util.regex`` on this grammar; the whole parse is 3 anchored
   extract passes instead of a per-field scan.
2. Worker processes don't share a heap. The JVM expression parse burns ~50%
   extra CPU at 32 local threads (allocation-rate contention: measured
   ~300 CPU-s at 8 threads vs ~450 CPU-s at 32 for the same input);
   separate Python workers have no shared allocator to contend on, so
   throughput scales with cores — the north rule's ≥0.8 N→4N criterion.

This is the same trade the reference makes by keeping its per-row work
inside columnar Arrow builders (/root/reference/pkg/otel/arrow_record/
producer.go:328-422): batch-at-a-time columnar compute, row-at-a-time never.

Batch unit: ``spark.sql.execution.arrow.maxRecordsPerBatch`` — the analog of
the reference's OTLP batch (SURVEY.md §1.5).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame

from .parse import BODY_STR, SEVERITY_NUMBER

# Classification patterns — EXACTLY the three anchored rlikes in
# parse.classify_signal, so both implementations quarantine identically.
CLASSIFY_LOG = r"^ts_us=[0-9]+ level="
CLASSIFY_METRIC = r"^name=[a-z_]+ value="
CLASSIFY_TRACE = r"^span=[0-9a-f]{16} parent="

# Per-field extraction patterns: the ORACLE regexes (parse.RE_*) verbatim,
# one named group each, applied INDEPENDENTLY. A sequential
# all-fields-in-one-pattern form was tried first and diverged from the
# oracles on out-of-grammar values (a malformed level made the trailing
# optional groups non-participating, nulling fields the oracle still
# extracts); independent extraction has exactly regexp_extract semantics.
FIELD_PATTERNS = {
    "ts_us": r"ts_us=(?P<v>[0-9]+)",
    "level": r" level=(?P<v>[A-Z]+)",
    "msg": r' msg="(?P<v>[^"]*)"',
    "code": r" code=(?P<v>[0-9]+)",
    "retry": r" retry=(?P<v>true|false)",
    "name": r"^name=(?P<v>[a-z_]+)",
    "value": r" value=(?P<v>-?[0-9]+)",
    "unit": r" unit=(?P<v>[a-z%]+)",
    "span": r"^span=(?P<v>[0-9a-f]{16})",
    "parent": r" parent=(?P<v>[0-9a-f]{8})",
    "dur_ms": r" dur_ms=(?P<v>[0-9]+)",
}

# Spark DDL for the parse output (mapInArrow needs the schema up front).
# ``ts`` keeps the input's timestamp flavor (fixtures are TIMESTAMP_NTZ, the
# synthetic generator emits tz-aware TIMESTAMP), as does turn_idx's width.
_ADDED_DDL = (
    "signal_type string, log_ts_us long, severity_text string, "
    "severity_number int, msg string, code long, retry boolean, "
    "metric_name string, metric_value long, metric_unit string, "
    "span_hex string, parent_hex string, dur_ms long, "
    "body struct<body_type: tinyint, str: string, int: bigint, double: double, "
    "bool: boolean, bytes: binary, ser: string>"
)


def _make_map_batches(sev_map: dict[str, int], body_str_tag: int):
    """Build the batch fn as a CLOSURE over plain-value constants so
    cloudpickle ships it by value: the grading driver runs without
    --py-files, so Python workers can't ``import otel_arrow_adapter_spark``."""
    classify_log, classify_metric, classify_trace = CLASSIFY_LOG, CLASSIFY_METRIC, CLASSIFY_TRACE
    field_pats = dict(FIELD_PATTERNS)
    sev_keys = list(sev_map)
    sev_vals = [sev_map[k] for k in sev_keys]

    def map_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        sev_keys_arr = pa.array(sev_keys)
        sev_vals_arr = pa.array(sev_vals, pa.int32())
        null_str = pa.scalar(None, pa.string())

        for batch in it:
            text = batch.column("text")
            is_log = pc.fill_null(pc.match_substring_regex(text, classify_log), False)
            is_metric = pc.fill_null(pc.match_substring_regex(text, classify_metric), False)
            is_trace = pc.fill_null(pc.match_substring_regex(text, classify_trace), False)

            def f(field, mask):
                # independent per-field extract (oracle semantics), gated by
                # the row's signal (when_sig analog); non-match -> null and
                # '' -> null (P6 non-default suppression)
                col = pc.struct_field(pc.extract_regex(text, field_pats[field]), "v")
                empty = pc.fill_null(pc.equal(col, ""), False)
                col = pc.if_else(empty, null_str, col)
                return pc.if_else(mask, col, null_str)

            signal = pc.if_else(
                is_log,
                pa.scalar("log"),
                pc.if_else(
                    is_metric,
                    pa.scalar("metric"),
                    pc.if_else(is_trace, pa.scalar("trace"), pa.scalar("quarantine")),
                ),
            )

            sev_text = f("level", is_log)
            sev_num = pc.take(sev_vals_arr, pc.index_in(sev_text, sev_keys_arr))
            msg = f("msg", is_log)

            n = len(text)
            body = pa.StructArray.from_arrays(
                [
                    pa.array(np.full(n, body_str_tag, dtype=np.int8)),
                    msg,
                    pa.nulls(n, pa.int64()),
                    pa.nulls(n, pa.float64()),
                    pa.nulls(n, pa.bool_()),
                    pa.nulls(n, pa.binary()),
                    pa.nulls(n, pa.string()),
                ],
                names=["body_type", "str", "int", "double", "bool", "bytes", "ser"],
            )

            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("conv_id"),
                    batch.column("turn_idx"),
                    batch.column("role"),
                    batch.column("tool"),
                    batch.column("ts"),
                    text,
                    signal,
                    pc.cast(f("ts_us", is_log), pa.int64()),
                    sev_text,
                    sev_num,
                    msg,
                    pc.cast(f("code", is_log), pa.int64()),
                    pc.equal(f("retry", is_log), "true"),
                    f("name", is_metric),
                    pc.cast(f("value", is_metric), pa.int64()),
                    f("unit", is_metric),
                    f("span", is_trace),
                    f("parent", is_trace),
                    pc.cast(f("dur_ms", is_trace), pa.int64()),
                    body,
                ],
                names=[
                    "conv_id", "turn_idx", "role", "tool", "ts", "text",
                    "signal_type", "log_ts_us", "severity_text", "severity_number",
                    "msg", "code", "retry", "metric_name", "metric_value",
                    "metric_unit", "span_hex", "parent_hex", "dur_ms", "body",
                ],
            )

    return map_batches


def parse_turns_arrow(df: DataFrame) -> DataFrame:
    """Drop-in replacement for ``parse.parse_turns`` (same columns/semantics),
    executed as a vectorized Arrow UDF."""
    cols = ["conv_id", "turn_idx", "role", "tool", "ts", "text"]
    narrowed = df.select(*cols)
    in_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in narrowed.schema.fields)
    fn = _make_map_batches(SEVERITY_NUMBER, BODY_STR)
    return narrowed.mapInArrow(fn, f"{in_ddl}, {_ADDED_DDL}")
