"""Mergeable frequency sketches.

Completes the repo's sketch family — approx_count_distinct (HLL) in the
schema analyzer covers DISTINCT counts, the exponential-histogram
quantile sketch (events_latency_quantiles_sketch) covers QUANTILES, and
the count-min sketch here covers point FREQUENCIES (Cormode/Muthukrishnan
2005): heavy-hitter tracking over token/URL/tool streams where the exact
(key -> count) table is too wide to keep.

Engine-portable hashing: bucket = md5-uint48("r:" || key) % width — the
same first-12-hex-chars idiom as shard_shuffle / stratified_sample, so
the DuckDB oracle computes byte-identical cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, row: int, width: int) -> Column:
    h = F.md5(F.concat(F.lit(f"{row}:"), key))
    return F.pmod(
        F.conv(F.substring(h, 1, 12), 16, 10).cast("long"), F.lit(width)
    ).cast("int")


def count_min_sketch(
    items: DataFrame, key_col: str = "key", depth: int = 4, width: int = 256
) -> DataFrame:
    """Build a depth x width CMS over a key stream: (row, col, c).

    Scale shape: one narrow explode to ``depth`` cells per item, then ONE
    map-side-combined groupBy over at most depth*width cells — the reduce
    input is O(depth*width) per partition regardless of stream size, and
    sketches built over any partitioning of the data MERGE EXACTLY by
    (row, col) sum (how per-day sketches roll up to a month). Estimates
    are one-sided: est >= true, with err <= 2N/width at probability
    1 - (1/2)^depth."""
    cells = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                _bucket(F.col(key_col), r, width).alias("col"),
            )
            for r in range(depth)
        ]
    )
    return (
        items.where(F.col(key_col).isNotNull())  # null keys are untracked
        .select(F.explode(cells).alias("e"))
        .groupBy(F.col("e.row").alias("row"), F.col("e.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each key from the sketch: min over its depth cells.

    The sketch is depth*width rows — BROADCAST; lookup is one broadcast
    join + a groupBy(key) min, never a rescan of the original stream."""
    cells = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                _bucket(F.col(key_col), r, width).alias("col"),
            )
            for r in range(depth)
        ]
    )
    probed = keys.where(F.col(key_col).isNotNull()).select(
        key_col, F.explode(cells).alias("e")
    ).select(
        key_col, F.col("e.row").alias("row"), F.col("e.col").alias("col")
    )
    return (
        probed.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_n"))
    )
