from .pipeline import (  # noqa: F401
    build_labeled,
    counts_from_routed,
    pipeline_sinks,
    replay_quarantine,
    run_pipeline,
)
from .ledger import Ledger  # noqa: F401
from .stats import ProducerStats  # noqa: F401
