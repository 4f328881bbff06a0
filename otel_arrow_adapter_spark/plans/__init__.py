from .pipeline import build_labeled, counts_from_routed, pipeline_sinks, run_pipeline  # noqa: F401
from .ledger import Ledger  # noqa: F401
