"""S8: OTLP .pb dataset loader (pure-Python wire format + Spark binaryFile
-> mapInPandas plumbing). Round-trip against our own capture writer, plus
error-not-crash on malformed frames."""

import pytest


SAMPLE = [
    {
        "res_idx": 0,
        "scope_name": "svc.a",
        "time_unix_nano": 1_700_000_000_000_000_000,
        "observed_time_unix_nano": 1_700_000_000_000_000_500,
        "severity_number": 9,
        "severity_text": "INFO",
        "body": "hello world",
        "attrs": {"k1": "v1", "k2": "v2"},
        "res_attrs": {"host": "h0"},
        "trace_id": "0102030405060708090a0b0c0d0e0f10",
        "span_id": "0102030405060708",
    },
    {
        "res_idx": 0,
        "scope_name": "svc.a",
        "severity_number": 17,
        "severity_text": "ERROR",
        "body": "boom",
        "attrs": {},
        "res_attrs": {"host": "h0"},
    },
    {"res_idx": 1, "body": "other resource", "attrs": {"x": "1"}},
]


def test_pb_roundtrip_pure_python():
    from otel_arrow_adapter_spark.sources import (
        decode_export_logs_request,
        encode_export_logs_request,
    )

    rows = decode_export_logs_request(encode_export_logs_request(SAMPLE))
    assert len(rows) == 3
    r0 = next(r for r in rows if r["severity_text"] == "INFO")
    assert r0["body"] == "hello world"
    assert r0["time_unix_nano"] == 1_700_000_000_000_000_000
    assert r0["observed_time_unix_nano"] == 1_700_000_000_000_000_500
    assert r0["trace_id"] == "0102030405060708090a0b0c0d0e0f10"
    assert r0["span_id"] == "0102030405060708"
    assert r0["n_attrs"] == 2 and r0["n_res_attrs"] == 1
    assert r0["scope_name"] == "svc.a"
    r2 = next(r for r in rows if r["res_idx"] == 1)
    assert r2["body"] == "other resource" and r2["n_attrs"] == 1


def test_pb_writer_validates_ids():
    from otel_arrow_adapter_spark.sources import encode_export_logs_request

    with pytest.raises(ValueError, match="trace_id"):
        encode_export_logs_request([{"res_idx": 0, "trace_id": "0102"}])
    with pytest.raises(ValueError, match="span_id"):
        encode_export_logs_request([{"res_idx": 0, "span_id": "01"}])


def test_pb_spark_reader(spark, tmp_path):
    from otel_arrow_adapter_spark.sources import (
        encode_export_logs_request,
        read_pb_logs,
    )

    d = tmp_path / "captures"
    d.mkdir()
    (d / "a.pb").write_bytes(encode_export_logs_request(SAMPLE))
    (d / "b.pb").write_bytes(encode_export_logs_request(SAMPLE[:1]))
    (d / "bad.pb").write_bytes(b"\xff\xff\xff\xff\xff\xff")  # malformed
    (d / "ignored.txt").write_bytes(b"not a capture")

    df = read_pb_logs(spark, str(d))
    rows = df.collect()
    good = [r for r in rows if r["res_idx"] >= 0]
    bad = [r for r in rows if r["res_idx"] == -1]
    assert len(good) == 4  # 3 from a.pb + 1 from b.pb
    assert len(bad) == 1 and "__decode_error__" in bad[0]["body"]
    assert bad[0]["path"].endswith("bad.pb")
    # typed columns survive the Arrow transfer
    infos = [r for r in good if r["severity_text"] == "INFO"]
    assert len(infos) == 2
    assert all(r["time_unix_nano"] == 1_700_000_000_000_000_000 for r in infos)
