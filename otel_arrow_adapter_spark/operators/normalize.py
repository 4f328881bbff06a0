"""P2 + W4: resource/scope surrogate IDs and stable turn ordering.

The reference assigns a canonical small-int ID per distinct
(resource, schemaUrl) / (scope, schemaUrl) by first-seen map lookup during a
single pass (/root/reference/pkg/otel/logs/arrow/optimizer.go:83-99, hashes
in pkg/otel/common/otlp/ids.go). Two Spark-native strategies:

- ``mode="dense"``: distinct over the (tiny) dimension -> dense_rank on the
  distinct set -> broadcast-join back. Deterministic small ints (ordered by
  value, not first-seen — first-seen order is batch-order-dependent and
  meaningless under distributed execution). Scale note: dense_rank runs over
  the *distinct* values only (~50 tools x 4 roles), so the single-partition
  window is O(dims), never O(rows).
- ``mode="hash"``: xxhash64 content hash, the ids.go approach — no shuffle
  at all, ideal at 10^12 rows; IDs are stable but not dense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked_dim(
    df: DataFrame,
    cols: tuple[str, ...],
    id_name: str,
    id_type: str = "long",
    start: int = 1,
) -> DataFrame:
    """Global dense rank over a DISTINCT dimension, windowless.

    collect_list(struct) -> sort_array -> posexplode: one reduce of an
    O(dims) array instead of a single-partition window (Spark strips
    foldable partition keys, so a window here always funnels through one
    task AND warns). Struct comparison sorts null fields first — matching
    the oracles' ``ORDER BY ... ASC NULLS FIRST``. Only for
    dictionary-small inputs: the sorted array lives in one task."""
    dim = df.select(*cols).distinct()
    arr = F.sort_array(F.collect_list(F.struct(*cols)))
    return (
        dim.agg(arr.alias("_vals"))
        .select(F.posexplode("_vals").alias("_pos", "_s"))
        .select(
            *[F.col(f"_s.{c}").alias(c) for c in cols],
            (F.col("_pos") + F.lit(start)).cast(id_type).alias(id_name),
        )
    )


def assign_surrogate_ids(
    df: DataFrame,
    resource_cols: tuple[str, ...] = ("tool",),
    scope_cols: tuple[str, ...] = ("role",),
    mode: str = "dense",
) -> DataFrame:
    """Add res_id / scope_id surrogate key columns."""
    if mode == "hash":
        return df.withColumn(
            "res_id", F.xxhash64(*[F.coalesce(F.col(c), F.lit("")) for c in resource_cols])
        ).withColumn(
            "scope_id", F.xxhash64(*[F.coalesce(F.col(c), F.lit("")) for c in scope_cols])
        )

    out = df
    for id_name, cols in (("res_id", resource_cols), ("scope_id", scope_cols)):
        dim = ranked_dim(df, cols, id_name)
        # null-safe join keys: the null dim value IS a resource (the
        # reference hashes the empty resource to a real ID, ids.go) — a
        # plain equi-join would leave its rows without a surrogate.
        dim = dim.select(
            *[F.col(c).alias(f"__dim_{c}") for c in cols], id_name
        )
        cond = None
        for c in cols:
            e = F.col(c).eqNullSafe(F.col(f"__dim_{c}"))
            cond = e if cond is None else cond & e
        out = out.join(F.broadcast(dim), on=cond, how="left").drop(
            *[f"__dim_{c}" for c in cols]
        )
    return out


def stable_turn_order(df: DataFrame) -> DataFrame:
    """W4: total order within a conversation — row_number over
    (conv_id, turn_idx). Salting upstream shuffles never breaks this order
    because the window re-sorts within each conv_id partition."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("turn_order", F.row_number().over(w))


def change_detect_ids(df: DataFrame, order_cols: tuple[str, ...], group_col: str, out_col: str) -> DataFrame:
    """W3: first-seen change detection -> running group id.

    Reference idiom: ``if resLogsID != prev { resID++ }``
    (/root/reference/pkg/otel/logs/arrow/logs.go:230-247). Spark form:
    flag := group != lag(group); id := running sum of flags. Scoped per
    conv_id so the window parallelizes across conversations.
    """
    w = Window.partitionBy("conv_id").orderBy(*order_cols)
    changed = (
        F.when(F.lag(group_col).over(w).isNull(), F.lit(1))
        .when(F.col(group_col).eqNullSafe(F.lag(group_col).over(w)), F.lit(0))
        .otherwise(F.lit(1))
    )
    return df.withColumn(
        out_col,
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
