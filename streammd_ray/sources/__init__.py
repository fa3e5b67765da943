from .transcripts import (
    TRANSCRIPTS_SCHEMA,
    derive_transcripts,
    generate_transcripts,
    transcripts_sql,
)

__all__ = [
    "TRANSCRIPTS_SCHEMA",
    "derive_transcripts",
    "generate_transcripts",
    "transcripts_sql",
]
