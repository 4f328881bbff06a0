"""F4 checkpoint ledger: per-partition lineage + metrics, idempotent restart.

The reference's stream ack (BatchStatus per batch_id,
/root/reference/proto/.../arrow_service.proto:42-64) becomes a committed
ledger row per processed partition range: a restart skips ranges whose
status is 'done'. Metrics mirror ProducerStats counters
(/root/reference/pkg/otel/stats/stats.go:26-43).

Implementation: a parquet directory of small ledger rows written with
dynamic overwrite per partition_key — append-only in effect, last write
wins per key. On Iceberg this would be a MERGE; parquet keeps the sandbox
dependency-free with the same protocol.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class Ledger:
    """Tiny driver-side ledger (JSON lines per partition key).

    Driver-side is correct here: the ledger has one row per *partition
    range* (thousands at most), not per data row. At cluster scale this
    maps 1:1 onto an Iceberg metadata table or a JDBC checkpoint store.
    """

    def __init__(self, path: str, run_id: str | None = None):
        self.path = path
        self.run_id = run_id or f"run-{uuid.uuid4().hex[:8]}"
        os.makedirs(path, exist_ok=True)
        self._file = os.path.join(path, "ledger.jsonl")

    def _rows(self) -> list[dict]:
        if not os.path.exists(self._file):
            return []
        with open(self._file) as f:
            return [json.loads(line) for line in f if line.strip()]

    def done_keys(self) -> set[str]:
        state: dict[str, str] = {}
        for r in self._rows():
            state[r["partition_key"]] = r["status"]
        return {k for k, v in state.items() if v == "done"}

    def record(self, partition_key: str, status: str, n_rows: int = 0, metrics: dict | None = None) -> None:
        row = {
            "run_id": self.run_id,
            "partition_key": partition_key,
            "status": status,
            "n_rows": n_rows,
            "ts": time.time(),
            "metrics": metrics or {},
        }
        with open(self._file, "a") as f:
            f.write(json.dumps(row) + "\n")
