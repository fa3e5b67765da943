"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in streammd_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derive the transcripts
    table from events+documents, mark duplicate turns via the sharded
    partitioned Bloom filter, and return the marked Dataset
    (conv_id, turn_idx, role, text, tool, ts, is_duplicate)."""
    from streammd_ray.pipelines.mark_duplicates import mark_duplicates
    from streammd_ray.sources.transcripts import derive_transcripts

    ds = derive_transcripts("/root/testdata/sf0.001")
    res = mark_duplicates(ds, p=1e-9, num_shards=4, materialize=True)
    return res.marked


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus the
    training-data-pipeline operators (dedup family, sketches, text analysis,
    similarity/ANN, multimodal plumbing, relational aggregates)."""
    from streammd_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for every exactly-reproducible query (sketch-estimate
    queries intentionally omitted → driver's rows-only check; each has an
    oracle-checked exact twin, and sketch accuracy is covered by the pytest
    error-bound suite in tests/)."""
    from streammd_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
