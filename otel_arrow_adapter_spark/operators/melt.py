"""P3/P4: attribute melt — map-shaped attributes -> long KV table.

Reference shape: one row per (parent, key, value) with a u8 type tag and one
nullable column per value type
(/root/reference/pkg/otel/common/arrow/attributes_16.go:41-51, accumulate at
attributes.go:229-256). We produce the same long table from the parsed typed
columns with a single ``explode`` of a per-row struct array — no shuffle, no
UDF; empty keys and null values are skipped exactly like the accumulator
skips them (attributes.go:237-239).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# AnyValue discriminant (attributes_16.go:131-196 enumerates 7 cases; we use
# 6 — no nested-map case survives the flat grammar, `ser` covers it).
ATTR_STR, ATTR_INT, ATTR_DOUBLE, ATTR_BOOL, ATTR_BYTES, ATTR_SER = 1, 2, 3, 4, 5, 6

def _null(t: str) -> Column:
    return F.lit(None).cast(t)


def _attr(key: str, type_tag: int, str_v: Column, int_v: Column, dbl_v: Column, bool_v: Column) -> Column:
    return F.struct(
        F.lit(key).alias("key"),
        F.lit(type_tag).cast("tinyint").alias("type"),
        str_v.cast("string").alias("str"),
        int_v.cast("long").alias("int"),
        dbl_v.cast("double").alias("double"),
        bool_v.cast("boolean").alias("bool"),
    )


def str_attr(key: str, v: Column) -> Column:
    return _attr(key, ATTR_STR, v, _null("long"), _null("double"), _null("boolean"))


def int_attr(key: str, v: Column) -> Column:
    return _attr(key, ATTR_INT, _null("string"), v, _null("double"), _null("boolean"))


def double_attr(key: str, v: Column) -> Column:
    return _attr(key, ATTR_DOUBLE, _null("string"), _null("long"), v, _null("boolean"))


def bool_attr(key: str, v: Column) -> Column:
    return _attr(key, ATTR_BOOL, _null("string"), _null("long"), _null("double"), v)


def default_attrs():
    """Default attribute set melted from parsed turns. The value expression
    must already be typed; rows whose value is null are dropped (non-default
    suppression, P6)."""
    return [
        ("tool", "str", F.col("tool")),
        ("level", "str", F.col("severity_text")),
        ("code", "int", F.col("code")),
        ("retry", "bool", F.col("retry")),
        ("unit", "str", F.col("metric_unit")),
        ("dur_ms", "int", F.col("dur_ms")),
    ]

_BUILDERS = {"str": str_attr, "int": int_attr, "double": double_attr, "bool": bool_attr}
_VALUE_COL = {"str": "str", "int": "int", "double": "double", "bool": "bool"}


def melt_attributes(parsed: DataFrame, parent_cols: tuple[str, ...] = ("conv_id", "turn_idx"), attrs=None) -> DataFrame:
    """parsed turns -> long attrs table (parent, key, type, str, int, double, bool).

    One explode, null values filtered by checking the type-appropriate value
    column — keeps the whole melt inside whole-stage codegen.
    """
    if attrs is None:
        attrs = default_attrs()
    entries = F.array(*[_BUILDERS[t](k, v) for k, t, v in attrs])
    non_null = F.filter(
        entries,
        lambda a: F.coalesce(
            a["str"].isNotNull(),
            F.lit(False),
        )
        | a["int"].isNotNull()
        | a["double"].isNotNull()
        | a["bool"].isNotNull(),
    )
    return parsed.select(
        *parent_cols, F.explode(non_null).alias("a")
    ).select(
        *parent_cols,
        F.col("a.key").alias("key"),
        F.col("a.type").alias("type"),
        F.col("a.str").alias("str"),
        F.col("a.int").alias("int"),
        F.col("a.double").alias("double"),
        F.col("a.bool").alias("bool"),
    )
