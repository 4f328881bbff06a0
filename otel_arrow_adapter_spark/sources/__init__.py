from .otlp_pb import (  # noqa: F401
    decode_export_logs_request,
    encode_export_logs_request,
    read_pb_logs,
)
from .readers import read_table, read_transcripts  # noqa: F401
