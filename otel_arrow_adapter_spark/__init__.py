"""otel_arrow_adapter_spark — a PySpark-native telemetry batch pipeline.

Brand-new implementation (not a port) with the capabilities of the
f5/otel-arrow-adapter reference (Go): parse -> normalize/dedup -> sort ->
star-schema split -> dictionary/delta encode -> route to sinks -> decode ->
re-join -> reconstruct, with round-trip equivalence as the correctness
contract (reference: docs/validation_process.md:23-32).

Architecture is idiomatic Spark: DataFrame/SQL plans optimized by Catalyst,
window functions for the running-state encodings, broadcast joins for
enrichment, partitioned+sorted columnar sinks, and vectorized pandas/Arrow
UDFs only where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"
