from .io import read_transcripts, write_transcripts
from .transcripts import (
    TRANSCRIPTS_SCHEMA,
    derive_transcripts,
    generate_transcripts,
    transcripts_sql,
)

__all__ = [
    "read_transcripts",
    "write_transcripts",
    "TRANSCRIPTS_SCHEMA",
    "derive_transcripts",
    "generate_transcripts",
    "transcripts_sql",
]
