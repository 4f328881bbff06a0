"""J4: broadcast-lookup enrichment (tool -> service/resource metadata).

The reference's decode side resolves surrogate keys against small in-memory
stores (/root/reference/pkg/otel/common/otlp/attributes.go:133-226); our
enrichment analog is a null-safe broadcast left join against the tool
catalog. Unknown tools are *flagged*, not dropped — the quarantine decision
is the router's (error-not-crash discipline of
pkg/otel/logs/otlp/logs.go:145-154).

Scale: the catalog is O(100) rows — always broadcast; zero shuffle on the
fact side regardless of fact size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_catalog(df: DataFrame, catalog: DataFrame) -> DataFrame:
    """Left-join catalog on ``tool``; adds service_name, resource_attrs,
    tool_known (false = tool present but not in catalog)."""
    cat = catalog.withColumn("tool_known", F.lit(True))
    out = df.join(F.broadcast(cat), on="tool", how="left")
    return out.withColumn(
        "tool_known",
        F.when(F.col("tool").isNull(), F.lit(None).cast("boolean")).otherwise(
            F.coalesce(F.col("tool_known"), F.lit(False))
        ),
    )
