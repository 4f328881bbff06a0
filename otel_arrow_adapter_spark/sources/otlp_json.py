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


# from_json schema for one ExportTraceServiceRequest. protojson notes:
# int64 nanos as strings, ids as hex strings, enums accepted numerically
# (we render SpanKind / StatusCode as ints — protojson parsers accept
# both name and number; numbers keep the schema closed over int columns).
OTLP_JSON_SPAN_SCHEMA = (
    "resourceSpans array<struct<"
    "resource:struct<attributes:array<struct<key:string,value:struct<stringValue:string>>>>,"
    "scopeSpans:array<struct<"
    "scope:struct<name:string,version:string>,"
    "spans:array<struct<"
    "traceId:string,spanId:string,parentSpanId:string,name:string,kind:int,"
    "startTimeUnixNano:string,endTimeUnixNano:string,"
    "status:struct<code:int>,"
    "attributes:array<struct<key:string,value:struct<stringValue:string>>>,"
    "events:array<struct<timeUnixNano:string,name:string>>,"
    "links:array<struct<traceId:string,spanId:string>>"
    ">>>>>>"
)


def write_otlp_json_spans(
    df: DataFrame,
    path: str,
    res_col: str = "res_idx",
    scope_col: str | None = "scope_name",
) -> None:
    """Flat span rows -> OTLP-JSON trace capture (one
    ExportTraceServiceRequest line per resource) — the protojson sibling
    of otlp_pb.encode_export_trace_request, zero Python in the data path.

    Expected flat columns (same surface read_pb_spans emits): ``res_col``
    required; ``trace_id``/``span_id``/``parent_span_id`` hex strings,
    ``name``, ``kind`` int, ``start/end_time_unix_nano`` long,
    ``status_code`` int, optional ``attrs`` map<string,string>, optional
    ``events`` array<struct<time_unix_nano,name>>, optional ``links``
    array<struct<trace_id,span_id>>. Per-row nulls are OMITTED from the
    JSON (to_json drops nulls = protojson absent-field convention)."""
    cols = set(df.columns)
    span_fields = [
        F.col("trace_id").alias("traceId"),
        F.col("span_id").alias("spanId"),
    ]
    if "parent_span_id" in cols:
        span_fields.append(F.col("parent_span_id").alias("parentSpanId"))
    span_fields.append(F.col("name").alias("name"))
    if "kind" in cols:
        span_fields.append(F.col("kind").cast("int").alias("kind"))
    span_fields.append(
        F.col("start_time_unix_nano").cast("string").alias("startTimeUnixNano")
    )
    if "end_time_unix_nano" in cols:
        span_fields.append(
            F.col("end_time_unix_nano").cast("string").alias("endTimeUnixNano")
        )
    if "status_code" in cols:
        span_fields.append(
            F.when(
                F.col("status_code").isNotNull(),
                F.struct(F.col("status_code").cast("int").alias("code")),
            ).alias("status")
        )
    if "attrs" in cols:
        span_fields.append(_kv_array(F.col("attrs")).alias("attributes"))
    if "events" in cols:
        span_fields.append(
            F.transform(
                "events",
                lambda e: F.struct(
                    e["time_unix_nano"].cast("string").alias("timeUnixNano"),
                    e["name"].alias("name"),
                ),
            ).alias("events")
        )
    if "links" in cols:
        span_fields.append(
            F.transform(
                "links",
                lambda l: F.struct(
                    l["trace_id"].alias("traceId"), l["span_id"].alias("spanId")
                ),
            ).alias("links")
        )
    scope = (
        F.coalesce(F.col(scope_col), F.lit(""))
        if scope_col and scope_col in cols
        else F.lit("")
    )
    per_scope = (
        df.select(
            F.col(res_col).alias("_res"), scope.alias("_scope"),
            F.struct(*span_fields).alias("_s"),
        )
        .groupBy("_res", "_scope")
        .agg(F.collect_list("_s").alias("_spans"))
    )
    sl = F.struct(
        F.struct(F.col("_scope").alias("name")).alias("scope"),
        F.col("_spans").alias("spans"),
    )
    per_res = per_scope.groupBy("_res").agg(F.collect_list(sl).alias("_scopes"))
    request = F.struct(
        F.array(
            F.struct(
                F.struct(
                    F.array().cast(
                        "array<struct<key:string,value:struct<stringValue:string>>>"
                    ).alias("attributes")
                ).alias("resource"),
                F.col("_scopes").alias("scopeSpans"),
            )
        ).alias("resourceSpans")
    )
    per_res.select(F.to_json(request).alias("value")).write.mode("overwrite").text(path)


def read_otlp_json_spans(spark: SparkSession, path: str) -> DataFrame:
    """OTLP-JSON trace capture -> flat span rows, SAME surface as
    read_pb_spans (incl. the n_attrs/n_events/n_links convenience counts);
    malformed lines quarantine as one res_idx=-1 row each."""
    txt = spark.read.text(path).select(
        F.input_file_name().alias("path"), F.col("value")
    )
    parsed = txt.select(
        "path", "value", F.from_json("value", OTLP_JSON_SPAN_SCHEMA).alias("r")
    )
    empty_events = F.array().cast("array<struct<time_unix_nano:long,name:string>>")
    empty_links = F.array().cast("array<struct<trace_id:string,span_id:string>>")
    bad = parsed.where(
        F.col("r").isNull() | F.col("r.resourceSpans").isNull()
    ).select(
        "path",
        F.lit(-1).alias("res_idx"),
        F.lit(None).cast("string").alias("scope_name"),
        F.lit(None).cast("string").alias("trace_id"),
        F.lit(None).cast("string").alias("span_id"),
        F.lit(None).cast("string").alias("parent_span_id"),
        F.concat(F.lit("__decode_error__: "), F.substring("value", 1, 80)).alias("name"),
        F.lit(None).cast("int").alias("kind"),
        F.lit(None).cast("long").alias("start_time_unix_nano"),
        F.lit(None).cast("long").alias("end_time_unix_nano"),
        F.lit(None).cast("int").alias("status_code"),
        F.lit(0).alias("n_attrs"),
        F.lit(0).alias("n_events"),
        F.lit(0).alias("n_links"),
        F.lit(None).cast("map<string,string>").alias("attrs"),
        empty_events.alias("events"),
        empty_links.alias("links"),
    )
    kvmap = lambda a: F.map_from_entries(  # noqa: E731
        F.transform(a, lambda e: F.struct(e["key"], e["value"]["stringValue"]))
    )
    good = (
        parsed.where(F.col("r.resourceSpans").isNotNull())
        .select("path", F.posexplode("r.resourceSpans").alias("res_idx", "_rs"))
        .select(
            "path", "res_idx", F.explode_outer("_rs.scopeSpans").alias("_ss")
        )
        .select(
            "path",
            "res_idx",
            F.col("_ss.scope.name").alias("scope_name"),
            F.explode_outer("_ss.spans").alias("_sp"),
        )
        .select(
            "path",
            "res_idx",
            "scope_name",
            F.col("_sp.traceId").alias("trace_id"),
            F.col("_sp.spanId").alias("span_id"),
            F.col("_sp.parentSpanId").alias("parent_span_id"),
            F.col("_sp.name").alias("name"),
            F.col("_sp.kind").alias("kind"),
            F.col("_sp.startTimeUnixNano").cast("long").alias("start_time_unix_nano"),
            F.col("_sp.endTimeUnixNano").cast("long").alias("end_time_unix_nano"),
            F.col("_sp.status.code").alias("status_code"),
            F.coalesce(F.size("_sp.attributes"), F.lit(0)).alias("n_attrs"),
            F.coalesce(F.size("_sp.events"), F.lit(0)).alias("n_events"),
            F.coalesce(F.size("_sp.links"), F.lit(0)).alias("n_links"),
            kvmap(F.col("_sp.attributes")).alias("attrs"),
            F.coalesce(
                F.transform(
                    "_sp.events",
                    lambda e: F.struct(
                        e["timeUnixNano"].cast("long").alias("time_unix_nano"),
                        e["name"].alias("name"),
                    ),
                ),
                empty_events,
            ).alias("events"),
            F.coalesce(
                F.transform(
                    "_sp.links",
                    lambda l: F.struct(
                        l["traceId"].alias("trace_id"), l["spanId"].alias("span_id")
                    ),
                ),
                empty_links,
            ).alias("links"),
        )
    )
    return good.unionByName(bad.select(*good.columns))


# from_json schema for one ExportMetricsServiceRequest — all five data
# families (gauge / sum / histogram / exponentialHistogram / summary).
# protojson: uint64/int64 scalars (timeUnixNano, count, zeroCount, asInt,
# bucketCounts elements) render as JSON STRINGS; doubles as numbers;
# enums numerically.
_KV = "array<struct<key:string,value:struct<stringValue:string>>>"
_NUM_DP = (
    "struct<startTimeUnixNano:string,timeUnixNano:string,"
    f"asDouble:double,asInt:string,attributes:{_KV}>"
)
_HIST_DP = (
    "struct<startTimeUnixNano:string,timeUnixNano:string,count:string,"
    f"sum:double,bucketCounts:array<string>,explicitBounds:array<double>,attributes:{_KV}>"
)
_EXP_DP = (
    "struct<startTimeUnixNano:string,timeUnixNano:string,count:string,"
    "sum:double,scale:int,zeroCount:string,"
    "positive:struct<offset:int,bucketCounts:array<string>>,"
    "negative:struct<offset:int,bucketCounts:array<string>>,"
    f"attributes:{_KV}>"
)
_SUM_DP = (
    "struct<startTimeUnixNano:string,timeUnixNano:string,count:string,"
    "sum:double,quantileValues:array<struct<quantile:double,value:double>>,"
    f"attributes:{_KV}>"
)
OTLP_JSON_METRIC_SCHEMA = (
    "resourceMetrics array<struct<"
    f"resource:struct<attributes:{_KV}>,"
    "scopeMetrics:array<struct<"
    "scope:struct<name:string,version:string>,"
    "metrics:array<struct<"
    "name:string,unit:string,"
    f"gauge:struct<dataPoints:array<{_NUM_DP}>>,"
    f"sum:struct<aggregationTemporality:int,isMonotonic:boolean,dataPoints:array<{_NUM_DP}>>,"
    f"histogram:struct<aggregationTemporality:int,dataPoints:array<{_HIST_DP}>>,"
    f"exponentialHistogram:struct<aggregationTemporality:int,dataPoints:array<{_EXP_DP}>>,"
    f"summary:struct<dataPoints:array<{_SUM_DP}>>"
    ">>>>>>"
)

# full flat metric-DP column set (the read_pb_metrics surface, minus
# path/res_idx/scope_name/metric identity); the writer null-fills absent
# ones so callers pass only what their family uses
_METRIC_DP_COLS: dict[str, str] = {
    "temporality": "int",
    "is_monotonic": "boolean",
    "start_time_unix_nano": "long",
    "time_unix_nano": "long",
    "value_double": "double",
    "value_int": "long",
    "count": "long",
    "sum": "double",
    "bucket_counts": "string",
    "explicit_bounds": "string",
    "scale": "int",
    "zero_count": "long",
    "positive_offset": "int",
    "positive_bucket_counts": "string",
    "negative_offset": "int",
    "negative_bucket_counts": "string",
    "quantiles": "string",
    "attrs": "map<string,string>",
}


def _csv_strings(col):
    """'1,0,2' -> ['1','0','2'] (protojson uint64 list = string elements);
    null/empty -> null (field omitted)."""
    return F.split(F.nullif(col, F.lit("")), ",")


def write_otlp_json_metrics(
    df: DataFrame,
    path: str,
    res_col: str = "res_idx",
    scope_col: str | None = "scope_name",
) -> None:
    """Flat metric-DP rows -> OTLP-JSON metrics capture (one
    ExportMetricsServiceRequest line per resource), all five families —
    the protojson sibling of otlp_pb.encode_export_metrics_request, zero
    Python. Input = the read_pb_metrics flat surface: ``metric_type`` in
    {gauge,sum,histogram,exponential_histogram,summary} picks the oneof;
    bucket lists arrive as the same CSV strings the .pb reader emits.
    DPs group into metrics by (resource, name, unit, type, temporality,
    monotonicity), metrics into one request line per resource."""
    cols = set(df.columns)
    for c, t in _METRIC_DP_COLS.items():
        if c not in cols:
            df = df.withColumn(c, F.lit(None).cast(t))
    scope = (
        F.coalesce(F.col(scope_col), F.lit(""))
        if scope_col and scope_col in cols
        else F.lit("")
    )
    dp = F.struct(
        F.col("start_time_unix_nano").cast("string").alias("startTimeUnixNano"),
        F.col("time_unix_nano").cast("string").alias("timeUnixNano"),
        F.col("value_double").alias("asDouble"),
        F.col("value_int").cast("string").alias("asInt"),
        F.col("count").cast("string").alias("count"),
        F.col("sum").alias("sum"),
        _csv_strings(F.col("bucket_counts")).alias("bucketCounts"),
        F.transform(
            F.split(F.nullif(F.col("explicit_bounds"), F.lit("")), ","),
            lambda b: b.cast("double"),
        ).alias("explicitBounds"),
        F.col("scale").alias("scale"),
        F.col("zero_count").cast("string").alias("zeroCount"),
        F.when(
            F.col("positive_offset").isNotNull()
            | F.col("positive_bucket_counts").isNotNull(),
            F.struct(
                F.col("positive_offset").alias("offset"),
                _csv_strings(F.col("positive_bucket_counts")).alias("bucketCounts"),
            ),
        ).alias("positive"),
        F.when(
            F.col("negative_offset").isNotNull()
            | F.col("negative_bucket_counts").isNotNull(),
            F.struct(
                F.col("negative_offset").alias("offset"),
                _csv_strings(F.col("negative_bucket_counts")).alias("bucketCounts"),
            ),
        ).alias("negative"),
        F.transform(
            F.split(F.nullif(F.col("quantiles"), F.lit("")), ","),
            lambda q: F.struct(
                F.split(q, ":")[0].cast("double").alias("quantile"),
                F.split(q, ":")[1].cast("double").alias("value"),
            ),
        ).alias("quantileValues"),
        _kv_array(F.col("attrs")).alias("attributes"),
    )
    per_metric = (
        df.select(
            F.col(res_col).alias("_res"),
            scope.alias("_scope"),
            F.col("metric_name").alias("_name"),
            F.coalesce(F.col("metric_unit"), F.lit("")).alias("_unit"),
            F.col("metric_type").alias("_type"),
            F.col("temporality").alias("_temp"),
            F.col("is_monotonic").alias("_mono"),
            dp.alias("_dp"),
        )
        .groupBy("_res", "_scope", "_name", "_unit", "_type", "_temp", "_mono")
        .agg(F.collect_list("_dp").alias("_dps"))
    )
    t = F.col("_type")
    metric = F.struct(
        F.col("_name").alias("name"),
        F.col("_unit").alias("unit"),
        F.when(t == "gauge", F.struct(F.col("_dps").alias("dataPoints"))).alias("gauge"),
        F.when(
            t == "sum",
            F.struct(
                F.col("_temp").alias("aggregationTemporality"),
                F.col("_mono").alias("isMonotonic"),
                F.col("_dps").alias("dataPoints"),
            ),
        ).alias("sum"),
        F.when(
            t == "histogram",
            F.struct(
                F.col("_temp").alias("aggregationTemporality"),
                F.col("_dps").alias("dataPoints"),
            ),
        ).alias("histogram"),
        F.when(
            t == "exponential_histogram",
            F.struct(
                F.col("_temp").alias("aggregationTemporality"),
                F.col("_dps").alias("dataPoints"),
            ),
        ).alias("exponentialHistogram"),
        F.when(t == "summary", F.struct(F.col("_dps").alias("dataPoints"))).alias(
            "summary"
        ),
    )
    per_scope = per_metric.groupBy("_res", "_scope").agg(
        F.collect_list(metric).alias("_metrics")
    )
    sm = F.struct(
        F.struct(F.col("_scope").alias("name")).alias("scope"),
        F.col("_metrics").alias("metrics"),
    )
    per_res = per_scope.groupBy("_res").agg(F.collect_list(sm).alias("_scopes"))
    request = F.struct(
        F.array(
            F.struct(
                F.struct(F.array().cast(_KV).alias("attributes")).alias("resource"),
                F.col("_scopes").alias("scopeMetrics"),
            )
        ).alias("resourceMetrics")
    )
    per_res.select(F.to_json(request).alias("value")).write.mode("overwrite").text(path)


def read_otlp_json_metrics(spark: SparkSession, path: str) -> DataFrame:
    """OTLP-JSON metrics capture -> flat DP rows, SAME surface as
    read_pb_metrics (bucket lists as CSV strings, quantiles as 'q:v'
    pairs, attrs as a map); malformed lines quarantine as res_idx=-1."""
    txt = spark.read.text(path).select(
        F.input_file_name().alias("path"), F.col("value")
    )
    parsed = txt.select(
        "path", "value", F.from_json("value", OTLP_JSON_METRIC_SCHEMA).alias("r")
    )
    kvmap = lambda a: F.map_from_entries(  # noqa: E731
        F.transform(a, lambda e: F.struct(e["key"], e["value"]["stringValue"]))
    )

    def flat(mtype, d, **f):
        """Uniform flat-DP struct; per-family fields via kwargs, rest null."""
        def g(name, typ):
            e = f.get(name)
            return (e if e is not None else F.lit(None).cast(typ)).alias(name)

        return F.struct(
            F.lit(mtype).alias("metric_type"),
            g("temporality", "int"),
            g("is_monotonic", "boolean"),
            d["startTimeUnixNano"].cast("long").alias("start_time_unix_nano"),
            d["timeUnixNano"].cast("long").alias("time_unix_nano"),
            g("value_double", "double"),
            g("value_int", "long"),
            g("count", "long"),
            g("sum", "double"),
            g("bucket_counts", "string"),
            g("explicit_bounds", "string"),
            g("scale", "int"),
            g("zero_count", "long"),
            g("positive_offset", "int"),
            g("positive_bucket_counts", "string"),
            g("negative_offset", "int"),
            g("negative_bucket_counts", "string"),
            g("quantiles", "string"),
            F.coalesce(F.size(d["attributes"]), F.lit(0)).alias("n_attrs"),
            kvmap(d["attributes"]).alias("attrs"),
        )

    m = F.col("_m")
    empty = "array<struct<metric_type:string,temporality:int,is_monotonic:boolean," \
        "start_time_unix_nano:long,time_unix_nano:long,value_double:double," \
        "value_int:long,count:long,sum:double,bucket_counts:string," \
        "explicit_bounds:string,scale:int,zero_count:long,positive_offset:int," \
        "positive_bucket_counts:string,negative_offset:int," \
        "negative_bucket_counts:string,quantiles:string,n_attrs:int," \
        "attrs:map<string,string>>>"
    fams = [
        F.transform(
            m["gauge"]["dataPoints"],
            lambda d: flat("gauge", d, value_double=d["asDouble"],
                           value_int=d["asInt"].cast("long")),
        ),
        F.transform(
            m["sum"]["dataPoints"],
            lambda d: flat("sum", d, value_double=d["asDouble"],
                           value_int=d["asInt"].cast("long"),
                           temporality=m["sum"]["aggregationTemporality"],
                           is_monotonic=m["sum"]["isMonotonic"]),
        ),
        F.transform(
            m["histogram"]["dataPoints"],
            lambda d: flat("histogram", d,
                           temporality=m["histogram"]["aggregationTemporality"],
                           count=d["count"].cast("long"), sum=d["sum"],
                           bucket_counts=F.array_join(d["bucketCounts"], ","),
                           explicit_bounds=F.array_join(
                               F.transform(d["explicitBounds"],
                                           lambda b: b.cast("string")), ",")),
        ),
        F.transform(
            m["exponentialHistogram"]["dataPoints"],
            lambda d: flat("exponential_histogram", d,
                           temporality=m["exponentialHistogram"]["aggregationTemporality"],
                           count=d["count"].cast("long"), sum=d["sum"],
                           scale=d["scale"], zero_count=d["zeroCount"].cast("long"),
                           positive_offset=d["positive"]["offset"],
                           positive_bucket_counts=F.array_join(
                               d["positive"]["bucketCounts"], ","),
                           negative_offset=d["negative"]["offset"],
                           negative_bucket_counts=F.array_join(
                               d["negative"]["bucketCounts"], ",")),
        ),
        F.transform(
            m["summary"]["dataPoints"],
            lambda d: flat("summary", d,
                           count=d["count"].cast("long"), sum=d["sum"],
                           quantiles=F.array_join(
                               F.transform(
                                   d["quantileValues"],
                                   lambda q: F.concat_ws(
                                       ":", q["quantile"].cast("string"),
                                       q["value"].cast("string"))), ",")),
        ),
    ]
    dps = F.concat(*[F.coalesce(fam, F.array().cast(empty)) for fam in fams])
    good = (
        parsed.where(F.col("r.resourceMetrics").isNotNull())
        .select("path", F.posexplode("r.resourceMetrics").alias("res_idx", "_rm"))
        .select("path", "res_idx", F.explode_outer("_rm.scopeMetrics").alias("_sm"))
        .select(
            "path", "res_idx",
            F.col("_sm.scope.name").alias("scope_name"),
            F.explode_outer("_sm.metrics").alias("_m"),
        )
        .select(
            "path", "res_idx", "scope_name",
            F.col("_m.name").alias("metric_name"),
            F.col("_m.unit").alias("metric_unit"),
            F.explode_outer(dps).alias("_dp"),
        )
        .select("path", "res_idx", "scope_name", "metric_name", "metric_unit", "_dp.*")
    )
    bad = parsed.where(
        F.col("r").isNull() | F.col("r.resourceMetrics").isNull()
    ).select(
        "path",
        F.lit(-1).alias("res_idx"),
        F.lit(None).cast("string").alias("scope_name"),
        F.concat(
            F.lit("__decode_error__: "), F.substring("value", 1, 80)
        ).alias("metric_name"),
        F.lit(None).cast("string").alias("metric_unit"),
        F.explode(
            F.array(F.lit(None).cast(empty.replace("array<", "", 1)[:-1]))
        ).alias("_dp"),
    ).select("path", "res_idx", "scope_name", "metric_name", "metric_unit", "_dp.*")
    return good.unionByName(bad.select(*good.columns))
