from .transcripts import (  # noqa: F401
    TRANSCRIPTS_SQL_TEMPLATE,
    duckdb_transcripts_cte,
    synthesize_tool_catalog,
    synthesize_transcripts,
    transcripts_from_events,
)
