"""OTLP-JSON capture format (S7/S8): ExportLogsServiceRequest in protojson
encoding — the reference's dataset loaders accept OTLP JSON alongside .pb
(pkg/benchmark/dataset/real_logs_dataset.go loads whole requests; the JSON
form is the public protojson rendering of the same messages).

Layout choice: ONE REQUEST PER LINE, sharded at resource grain (each line
is a complete ExportLogsServiceRequest holding a single resourceLogs
entry). The reference stores one request per file; the line-sharded form
carries identical information while keeping the writer distributed (no
driver collect) and the reader a splittable text scan.

Pure Spark SQL end-to-end: ``to_json`` / ``from_json`` / explode — ZERO
Python in the data path. The .pb sibling (otlp_pb.py) needs mapInPandas
only because protobuf wire framing isn't a SQL codec; protojson is, so
this path stays inside whole-stage codegen'd operators and the JVM's
Jackson codec.

protojson conventions for the fields used: int64 (timeUnixNano) renders as
a JSON STRING; trace/span ids as hex strings (OTLP JSON spec); AnyValue as
``{"stringValue": ...}``; absent optional fields are omitted (Spark's
``to_json`` drops nulls by default, matching protojson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# from_json schema for one ExportLogsServiceRequest (string-typed AnyValue)
OTLP_JSON_LOG_SCHEMA = (
    "resourceLogs array<struct<"
    "resource:struct<attributes:array<struct<key:string,value:struct<stringValue:string>>>>,"
    "scopeLogs:array<struct<"
    "scope:struct<name:string,version:string>,"
    "logRecords:array<struct<"
    "timeUnixNano:string,severityNumber:int,severityText:string,"
    "body:struct<stringValue:string>,"
    "attributes:array<struct<key:string,value:struct<stringValue:string>>>,"
    "traceId:string,spanId:string>>>>>>"
)


def _kv_array(m):
    """map<string,string> -> protojson KeyValue array (sorted by key so the
    rendered JSON is deterministic across runs/engines)."""
    return F.transform(
        F.array_sort(F.map_entries(m)),
        lambda e: F.struct(
            e["key"].alias("key"),
            F.struct(e["value"].alias("stringValue")).alias("value"),
        ),
    )


def write_otlp_json_logs(
    df: DataFrame,
    path: str,
    res_col: str = "res_idx",
    scope_col: str | None = "scope_name",
    attrs_col: str | None = "attrs",
    res_attrs_col: str | None = None,
) -> None:
    """Flat log rows -> OTLP-JSON capture (one request line per resource).

    Expected flat columns (nullable unless noted): ``res_col`` (grouping
    key, required), ``time_unix_nano`` long, ``severity_number`` int,
    ``severity_text``, ``body`` string, optional ``attrs_col``
    map<string,string>, optional ``trace_id``/``span_id`` hex strings.
    Two grouping shuffles (records->scope, scope->resource) on dimension
    grain; the final ``.text()`` write uses Spark's commit protocol, so
    task retries are idempotent (no manual file naming needed)."""
    cols = set(df.columns)
    rec = F.struct(
        F.col("time_unix_nano").cast("string").alias("timeUnixNano"),
        *( [F.col("severity_number").cast("int").alias("severityNumber")]
           if "severity_number" in cols else [] ),
        *( [F.col("severity_text").alias("severityText")]
           if "severity_text" in cols else [] ),
        F.struct(F.col("body").alias("stringValue")).alias("body"),
        *( [_kv_array(F.col(attrs_col)).alias("attributes")]
           if attrs_col and attrs_col in cols else [] ),
        *( [F.col("trace_id").alias("traceId")] if "trace_id" in cols else [] ),
        *( [F.col("span_id").alias("spanId")] if "span_id" in cols else [] ),
    )
    scope = (
        F.coalesce(F.col(scope_col), F.lit(""))
        if scope_col and scope_col in cols
        else F.lit("")
    )
    has_res_attrs = bool(res_attrs_col) and res_attrs_col in cols
    ra = (
        F.col(res_attrs_col)
        if has_res_attrs
        else F.lit(None).cast("map<string,string>")
    )
    per_scope = (
        df.select(
            F.col(res_col).alias("_res"), scope.alias("_scope"),
            rec.alias("_r"), ra.alias("_ra"),
        )
        .groupBy("_res", "_scope")
        .agg(F.collect_list("_r").alias("_records"), F.first("_ra").alias("_ra"))
    )
    sl = F.struct(
        F.struct(F.col("_scope").alias("name")).alias("scope"),
        F.col("_records").alias("logRecords"),
    )
    per_res = per_scope.groupBy("_res").agg(
        F.collect_list(sl).alias("_scopes"), F.first("_ra").alias("_ra")
    )
    empty_kv = F.array().cast(
        "array<struct<key:string,value:struct<stringValue:string>>>"
    )
    resource = F.struct(
        F.coalesce(_kv_array(F.col("_ra")), empty_kv).alias("attributes")
    )
    request = F.struct(
        F.array(
            F.struct(resource.alias("resource"), F.col("_scopes").alias("scopeLogs"))
        ).alias("resourceLogs")
    )
    per_res.select(F.to_json(request).alias("value")).write.mode("overwrite").text(path)


def read_otlp_json_logs(spark: SparkSession, path: str) -> DataFrame:
    """OTLP-JSON capture -> flat log rows (same surface as read_pb_logs:
    attr key/values as maps, error-not-crash). A line that fails to parse
    as a request yields one quarantine row with ``res_idx = -1`` and the
    offending line's prefix in ``body`` — the reader counterpart of
    logs.go:145-154, like the .pb reader."""
    txt = spark.read.text(path).select(
        F.input_file_name().alias("path"), F.col("value")
    )
    parsed = txt.select(
        "path", "value", F.from_json("value", OTLP_JSON_LOG_SCHEMA).alias("r")
    )
    bad = parsed.where(
        F.col("r").isNull() | F.col("r.resourceLogs").isNull()
    ).select(
        "path",
        F.lit(-1).alias("res_idx"),
        F.lit(None).cast("string").alias("scope_name"),
        F.lit(None).cast("long").alias("time_unix_nano"),
        F.lit(None).cast("int").alias("severity_number"),
        F.lit(None).cast("string").alias("severity_text"),
        F.concat(F.lit("__decode_error__: "), F.substring("value", 1, 80)).alias("body"),
        F.lit(None).cast("map<string,string>").alias("attrs"),
        F.lit(None).cast("map<string,string>").alias("res_attrs"),
        F.lit(None).cast("string").alias("trace_id"),
        F.lit(None).cast("string").alias("span_id"),
    )
    kvmap = lambda a: F.map_from_entries(  # noqa: E731
        F.transform(a, lambda e: F.struct(e["key"], e["value"]["stringValue"]))
    )
    good = (
        parsed.where(F.col("r.resourceLogs").isNotNull())
        .select("path", F.posexplode("r.resourceLogs").alias("res_idx", "_rl"))
        .select(
            "path",
            "res_idx",
            kvmap(F.col("_rl.resource.attributes")).alias("res_attrs"),
            F.explode_outer("_rl.scopeLogs").alias("_sl"),
        )
        .select(
            "path",
            "res_idx",
            "res_attrs",
            F.col("_sl.scope.name").alias("scope_name"),
            F.explode_outer("_sl.logRecords").alias("_lr"),
        )
        .select(
            "path",
            "res_idx",
            "scope_name",
            F.col("_lr.timeUnixNano").cast("long").alias("time_unix_nano"),
            F.col("_lr.severityNumber").alias("severity_number"),
            F.col("_lr.severityText").alias("severity_text"),
            F.col("_lr.body.stringValue").alias("body"),
            kvmap(F.col("_lr.attributes")).alias("attrs"),
            "res_attrs",
            F.col("_lr.traceId").alias("trace_id"),
            F.col("_lr.spanId").alias("span_id"),
        )
    )
    return good.unionByName(bad.select(*good.columns))
