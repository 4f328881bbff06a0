"""Conversation-grain training-data operators (functions/conversations.py)."""

from pyspark.sql import functions as F

from otel_arrow_adapter_spark.functions.conversations import (
    conv_dedup,
    conv_fingerprints,
    sft_pairs,
)

TURN_SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _turns(spark, rows):
    return spark.createDataFrame(rows, TURN_SCHEMA)


def test_sft_pairs_adjacent_only(spark):
    t = _turns(
        spark,
        [
            ("c1", 0, "user", "hello there"),
            ("c1", 1, "assistant", "hi back"),
            ("c1", 2, "user", "run the tool"),
            ("c1", 3, "tool", "tool output 42"),
            ("c1", 4, "assistant", "done"),  # NOT adjacent to turn 2
            ("c2", 0, "assistant", "unprompted"),
            ("c2", 1, "user", "trailing user turn"),  # no completion
        ],
    )
    got = {r.prompt_turn_idx: r for r in sft_pairs(t).collect()}
    assert set(got) == {0}
    p = got[0]
    assert p.conv_id == "c1"
    assert p.prompt == "hello there" and p.completion == "hi back"
    assert p.n_prompt_tokens == 2 and p.n_completion_tokens == 2


def test_sft_pairs_no_python_in_plan(spark):
    t = _turns(spark, [("c1", 0, "user", "a"), ("c1", 1, "assistant", "b")])
    plan = sft_pairs(t)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "FlatMapGroupsInPandas" not in plan


def test_conv_dedup_groups_template_duplicates(spark):
    # c1/c2: identical up to digits -> one group, rep = min conv_id.
    # c3: same texts as c1 but turns SWAPPED -> different fingerprint
    # (position is encoded inside each hashed term).
    # c4: genuinely different text -> its own group.
    t = _turns(
        spark,
        [
            ("c1", 0, "user", "request id=123"),
            ("c1", 1, "assistant", "served in 45 ms"),
            ("c2", 0, "user", "request id=999"),
            ("c2", 1, "assistant", "served in 7 ms"),
            ("c3", 0, "user", "served in 45 ms"),
            ("c3", 1, "assistant", "request id=123"),
            ("c4", 0, "user", "totally different"),
            ("c4", 1, "assistant", "yes"),
        ],
    )
    groups = conv_dedup(t).collect()
    by_rep = {g.rep_conv_id: g for g in groups}
    assert by_rep["c1"].n_convs == 2  # c1+c2 collapsed
    assert by_rep["c3"].n_convs == 1  # order matters
    assert by_rep["c4"].n_convs == 1
    assert all(g.n_turns == 2 for g in groups)
    # fingerprint is order-insensitive to ROW arrival but faithful to
    # turn_idx: recomputing on a reversed-row frame gives identical fps
    rev = t.orderBy(F.desc("turn_idx"), F.desc("conv_id"))
    fps_a = {r.conv_id: r._fp_sum for r in conv_fingerprints(t).collect()}
    fps_b = {r.conv_id: r._fp_sum for r in conv_fingerprints(rev).collect()}
    assert fps_a == fps_b


def test_conv_dedup_map_side_combines(spark):
    t = _turns(spark, [("c1", 0, "user", "x")])
    plan = conv_dedup(t)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    # partial aggregation must run below the conv_id exchange
    assert "partial_sum" in plan


def test_conv_quality_known_answer(spark):
    from otel_arrow_adapter_spark.functions.conversations import conv_quality

    rows = [
        # perfect dialogue: 4 turns, full alternation
        ("c1", 0, "user", "hi there"), ("c1", 1, "assistant", "hello"),
        ("c1", 2, "user", "thanks a lot"), ("c1", 3, "assistant", "sure"),
        # wall of same-role turns: alternation 0
        ("c2", 0, "user", "a"), ("c2", 1, "user", "b"), ("c2", 2, "user", "c"),
        # single turn: below min_turns, alternation defined as 1.0
        ("c3", 0, "assistant", "orphan"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    out = {r["conv_id"]: r for r in conv_quality(df).collect()}
    assert out["c1"]["keep"] and out["c1"]["alternation_rate"] == 1.0
    assert out["c1"]["n_tokens"] == 2 + 1 + 3 + 1
    assert not out["c2"]["keep"] and out["c2"]["alternation_rate"] == 0.0
    assert out["c2"]["n_user"] == 3 and out["c2"]["n_assistant"] == 0
    assert not out["c3"]["keep"] and out["c3"]["alternation_rate"] == 1.0
