"""A1 full analog: ProducerStats event counters.

The reference's producer keeps uint64 counters for batches produced per
signal, stream producers created/closed, schema updates performed, and
dictionary index-type changes / overflows
(/root/reference/pkg/otel/stats/stats.go:26-61).  The repo's ledger already
records per-bucket row counts; this adds the EVENT counters a user needs to
observe encoder health: dictionary overflow fallbacks (dict_encode_column),
index-type widenings across batches, and schema-change stream openings
(schema_evo.write_versioned).

Driver-side is correct here for the same reason the ledger is: these are
O(events) counters (a handful per job), not per-row data.  The encode/
write helpers take an optional ``stats`` argument, so library callers that
don't care pay nothing.
"""

from __future__ import annotations

from collections import Counter


class ProducerStats:
    """Mutable counter set; ``as_dict`` snapshots, ``get_and_reset``
    mirrors stats.go's GetAndReset."""

    def __init__(self) -> None:
        self._counters: Counter[str] = Counter()
        self._index_types: dict[str, str] = {}

    def inc(self, name: str, n: int = 1) -> None:
        self._counters[name] += n

    def get(self, name: str) -> int:
        return self._counters.get(name, 0)

    def note_index_type(self, column: str, index_type: str) -> None:
        """Record the dictionary index type chosen for a column; counts
        ``dictionary_index_type_changed`` when it differs from the type the
        same column used last time (the u8->u16->u32 widening ladder,
        stats.go:41 DictionaryIndexTypeChanged)."""
        prev = self._index_types.get(column)
        if prev is not None and prev != index_type:
            self.inc("dictionary_index_type_changed")
        self._index_types[column] = index_type

    def as_dict(self) -> dict[str, int]:
        return dict(self._counters)

    def get_and_reset(self) -> dict[str, int]:
        out = self.as_dict()
        self._counters.clear()
        self._index_types.clear()
        return out

    def flush_to_ledger(self, ledger, partition_key: str = "producer_stats") -> None:
        """Persist the counters as a ledger metrics row (the observable
        surface a restart/monitor reads)."""
        ledger.record(partition_key, "stats", sum(self._counters.values()), self.as_dict())
