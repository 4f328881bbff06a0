"""Engine-portable seeded pseudo-randomness for the nested generators.

The reference's generators are seeded RNG streams
(/root/reference/pkg/datagen/logs.go:39-66); our generators derive every
field from a hash of (row id, seed) so generation stays a pure column
expression. That hash must be REPLAYABLE BY THE ORACLE: xxhash64 is
Spark-only, so any generator seeded with it can never be DuckDB-checked
(the round-3 rows-only queries). md5 is the portable idiom already used by
weighted_split/span_links — both engines produce identical digests for
identical strings.

``seed_hash`` yields a 60-bit non-negative long (15 hex chars < 2^63), so
all downstream pmod arithmetic is overflow- and sign-safe in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def seed_hash(col: Column, seed: int) -> Column:
    """Spark side: non-negative 60-bit long from md5(f"{col}:{seed}")."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", col.cast("string"), F.lit(str(seed)))), 1, 15),
        16,
        10,
    ).cast("long")


def seed_hash_sql(expr: str, seed: int) -> str:
    """DuckDB side: the identical value for the identical input expression."""
    return (
        f"CAST(CAST('0x' || substr(md5(CAST({expr} AS VARCHAR) || ':{seed}'), 1, 15)"
        " AS UBIGINT) AS BIGINT)"
    )
