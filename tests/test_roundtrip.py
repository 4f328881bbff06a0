"""Round-trip equivalence — the backbone contract of the reference
(docs/validation_process.md:23-32, assert.Equiv pkg/otel/assert/equiv.go):
route(parse(x)) unioned back must equal x on (conv_id, turn_idx, text),
order-insensitively, and per-turn text must match under stable ordering."""

import pyspark.sql.functions as F
import pytest

from otel_arrow_adapter_spark.operators import reconstruct_turns
from otel_arrow_adapter_spark.operators.normalize import stable_turn_order
from otel_arrow_adapter_spark.plans import pipeline_sinks, run_pipeline


def _roundtrip_diff(original, reconstructed):
    a = original.select("conv_id", "turn_idx", "text")
    b = reconstructed.select("conv_id", "turn_idx", "text")
    return a.exceptAll(b).count() + b.exceptAll(a).count()


@pytest.mark.parametrize("source", ["events", "synth"])
def test_route_roundtrip(spark, transcripts, synth_transcripts, small_catalog, tmp_path, source):
    t = transcripts if source == "events" else synth_transcripts
    out = str(tmp_path / f"out_{source}")
    counts = run_pipeline(spark, t, small_catalog, out, run_id=f"t-{source}")
    sinks = pipeline_sinks(spark, out)
    rt = reconstruct_turns(sinks)
    assert _roundtrip_diff(t, rt) == 0
    # per-sink counts partition the input exactly
    total = {r["sink"]: r["n_rows"] for r in counts.collect()}
    assert sum(total.values()) == t.count()
    assert min(total.values()) > 0  # every sink exercised


def test_per_turn_text_equality_under_stable_order(spark, transcripts, small_catalog, tmp_path):
    """north_rule invariant: per-turn text equality under
    Window.partitionBy(conv_id).orderBy(turn_idx)."""
    out = str(tmp_path / "out_order")
    run_pipeline(spark, transcripts, small_catalog, out, run_id="t-order")
    sinks = pipeline_sinks(spark, out)
    rt = stable_turn_order(reconstruct_turns(sinks)).select("conv_id", "turn_order", "text")
    orig = stable_turn_order(transcripts).select("conv_id", "turn_order", "text")
    joined = orig.alias("o").join(rt.alias("r"), ["conv_id", "turn_order"], "full")
    mismatches = joined.where(
        ~F.col("o.text").eqNullSafe(F.col("r.text"))
    ).count()
    assert mismatches == 0


def test_resumable_buckets_no_loss_no_dupes(spark, transcripts, small_catalog, tmp_path):
    """F4 protocol: bucketed run, simulated restart -> same result, done
    buckets skipped."""
    out = str(tmp_path / "out_resume")
    run_pipeline(spark, transcripts, small_catalog, out, run_id="r1", n_buckets=4)
    sinks = pipeline_sinks(spark, out)
    assert _roundtrip_diff(transcripts, reconstruct_turns(sinks)) == 0
    # restart: everything already done -> ledger skip, output unchanged
    from otel_arrow_adapter_spark.plans.ledger import Ledger

    led = Ledger(f"{out}/_ledger")
    assert len(led.done_keys()) == 4
    run_pipeline(spark, transcripts, small_catalog, out, run_id="r2", n_buckets=4, resume=True)
    sinks2 = pipeline_sinks(spark, out)
    assert _roundtrip_diff(transcripts, reconstruct_turns(sinks2)) == 0


def test_corrupt_rows_quarantined_not_crashed(spark, small_catalog, tmp_path):
    """Chaos analog of MixUpArrowRecords (pkg/otel/common/test_utils.go:28):
    garbage text must land in quarantine, never raise."""
    df = spark.createDataFrame(
        [
            ("c", 0, "user", "", None, None),
            ("c", 1, "user", "span=zz parent=yy dur_ms=x", None, None),
            ("c", 2, "user", "ts_us=notanumber level=!", None, None),
            ("c", 3, "user", "name= value=", None, None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = str(tmp_path / "out_chaos")
    counts = run_pipeline(spark, df, small_catalog, out, run_id="chaos")
    total = {r["sink"]: r["n_rows"] for r in counts.collect()}
    assert total["quarantine"] == 4
