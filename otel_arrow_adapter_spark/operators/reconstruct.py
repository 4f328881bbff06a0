"""J1-J3 + W2: decode side — rebuild turns from the star-schema sinks.

The reference decodes by (1) building per-payload attribute stores keyed by
parent_id (/root/reference/pkg/otel/common/otlp/attributes.go:133-226),
(2) walking the main record and looking attrs up by surrogate key
(pkg/otel/logs/otlp/logs.go:230-238). Spark form: the store is a grouped
aggregation to a map column; the lookup is an equi-join on the surrogate
key — Catalyst picks broadcast vs sort-merge by size.

Round-trip contract: ``reconstruct_turns(sinks) == original transcripts``
on (conv_id, turn_idx, text) under stable turn ordering — the analog of
assert.Equiv's order-insensitive vPath set comparison
(pkg/otel/assert/equiv.go:107-157).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attrs_store(attrs: DataFrame, parent_cols: tuple[str, ...] = ("conv_id", "turn_idx")) -> DataFrame:
    """J1: long attrs -> one row per parent with map<key, string-rendered value>.

    Values are rendered to strings through the same type dispatch the
    reference uses when rebuilding pcommon.Map (attributes.go:158-208) —
    exactly one value column is non-null per row (union invariant).
    """
    value = F.coalesce(
        F.col("str"),
        F.col("int").cast("string"),
        F.col("double").cast("string"),
        F.col("bool").cast("string"),
    )
    return (
        attrs.groupBy(*parent_cols)
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct(F.col("key"), value.alias("value"))))
            ).alias("attrs")
        )
    )


def join_attrs(main: DataFrame, store: DataFrame, parent_cols: tuple[str, ...] = ("conv_id", "turn_idx")) -> DataFrame:
    """J2: main ⋈ attrs store on the surrogate key (left join — parents
    without attributes keep an empty map, like the reference's store miss
    returning an empty pcommon.Map)."""
    out = main.join(store, on=list(parent_cols), how="left")
    return out.withColumn(
        "attrs", F.coalesce(F.col("attrs"), F.map_from_arrays(F.array(), F.array()))
    )


def reconstruct_turns(sinks: dict[str, DataFrame]) -> DataFrame:
    """Union the routed sinks back into (conv_id, turn_idx, role, text, tool, ts).

    This is the inverse of route_signals: every input row landed in exactly
    one sink carrying its verbatim columns, so the union is the original
    relation (set-equal; ordering restored by (conv_id, turn_idx))."""
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    parts = [df.select(*cols) for df in sinks.values()]
    return reduce(lambda a, b: a.unionByName(b), parts)
