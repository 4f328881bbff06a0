from .readers import read_table, read_transcripts  # noqa: F401
