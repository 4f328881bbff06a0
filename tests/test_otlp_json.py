"""OTLP-JSON capture codec (protojson rendering via to_json/from_json —
zero Python in the data path; the .pb sibling is tested in test_otlp_pb)."""

import pyspark.sql.functions as F

from otel_arrow_adapter_spark.sources.otlp_json import (
    read_otlp_json_logs,
    write_otlp_json_logs,
)


def test_otlp_json_roundtrip_values(spark, tmp_path):
    """Flat rows -> line-sharded ExportLogsServiceRequest -> flat rows:
    severity, body, timestamps (int64-as-string per protojson), record AND
    resource attr key/values, trace/span hex ids all survive."""
    out = str(tmp_path / "cap")
    df = spark.createDataFrame(
        [
            (0, "scope-a", 1_700_000_000_000_000_001, 9, "INFO", "hello",
             {"tool": "t1", "k": "v"}, {"svc": "a"}, "0" * 32, "0102030405060708"),
            (0, "scope-a", 1_700_000_000_000_000_002, 17, "ERROR", None,
             None, {"svc": "a"}, None, None),
            (1, None, None, None, None, "orphan", {"tool": "t2"},
             None, None, None),
        ],
        "res_idx int, scope_name string, time_unix_nano long, "
        "severity_number int, severity_text string, body string, "
        "attrs map<string,string>, res_attrs map<string,string>, "
        "trace_id string, span_id string",
    )
    write_otlp_json_logs(df, out, res_attrs_col="res_attrs")
    rows = {r.time_unix_nano: r for r in read_otlp_json_logs(spark, out).collect()}
    assert len(rows) == 3
    r1 = rows[1_700_000_000_000_000_001]
    assert r1.severity_text == "INFO" and r1.severity_number == 9
    assert r1.body == "hello"
    assert dict(r1.attrs) == {"tool": "t1", "k": "v"}
    assert r1.trace_id == "0" * 32 and r1.span_id == "0102030405060708"
    r2 = rows[1_700_000_000_000_000_002]
    assert r2.severity_text == "ERROR" and r2.body is None and r2.attrs is None
    r3 = rows[None]
    assert r3.body == "orphan" and dict(r3.attrs) == {"tool": "t2"}
    assert r3.scope_name == ""  # null scope normalizes to the empty scope
    # line-sharded: one request line per resource group
    assert spark.read.text(out).count() == 2


def test_otlp_json_malformed_line_quarantines(spark, tmp_path):
    """A garbage line yields ONE quarantine row (res_idx=-1, error in body)
    without dropping the remaining requests — error-not-crash, matching
    the .pb reader's contract."""
    out = str(tmp_path / "cap2")
    df = spark.createDataFrame(
        [(0, 1, 9, "INFO", "ok", None)],
        "res_idx int, time_unix_nano long, severity_number int, "
        "severity_text string, body string, attrs map<string,string>",
    )
    write_otlp_json_logs(df, out)
    with open(f"{out}/garbage.txt", "w") as f:
        f.write("this is not json\n")
    rows = read_otlp_json_logs(spark, out).collect()
    good = [r for r in rows if r.res_idx >= 0]
    bad = [r for r in rows if r.res_idx == -1]
    assert len(good) == 1 and good[0].body == "ok"
    assert len(bad) == 1 and bad[0].body.startswith("__decode_error__")


def test_otlp_json_plan_has_no_python(spark, tmp_path):
    """The decode plan is pure JVM: no BatchEvalPython / ArrowEvalPython /
    mapInPandas stages anywhere (the whole point vs the .pb wire codec)."""
    out = str(tmp_path / "cap3")
    df = spark.createDataFrame(
        [(0, 1, 9, "INFO", "x", None)],
        "res_idx int, time_unix_nano long, severity_number int, "
        "severity_text string, body string, attrs map<string,string>",
    )
    write_otlp_json_logs(df, out)
    plan = read_otlp_json_logs(spark, out)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "FlatMapGroupsInPandas" not in plan
