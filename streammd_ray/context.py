"""Cluster-context-derived sizing knobs.

Round 2 hardcoded ``num_partitions=8`` on every ``Dataset.join`` — fine at
sf0.1 on one node, a bottleneck on a 256-node cluster where an all-to-all
join would hash into only 8 reducers (VERDICT.md round 2, "What's wrong" #4).
Partition counts are now derived from the cluster's CPU count at call time,
optionally scaled up by a caller-supplied byte estimate, so the same pipeline
code fans out proportionally wherever it runs.
"""

from __future__ import annotations

# ~256 MiB of shuffled input per join partition keeps a reducer's working
# set comfortably inside a worker heap while amortizing per-partition task
# overhead — the same order as Ray Data's default target block size.
TARGET_PARTITION_BYTES = 256 << 20


def cluster_cpus(default: int = 8) -> int:
    """Total CPUs Ray knows about; ``default`` when Ray isn't initialised
    (e.g. unit tests of pure helpers)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default)) or default
    except Exception:
        pass
    return default


def auto_num_partitions(
    *,
    per_cpu: float = 0.5,
    floor: int = 8,
    cap: int = 4096,
    bytes_hint: int | None = None,
) -> int:
    """Shuffle/join partition count sized to the cluster.

    ``per_cpu`` partitions per cluster CPU (default 0.5: Ray 2.49's hash
    shuffle spawns one aggregator ACTOR per partition up to
    ``max_hash_shuffle_aggregators``, and those actors reserve CPU alongside
    the map tasks feeding them — at one partition per core the two pools
    contend and the join runs ~50% slower; measured on this box at 32 CPUs:
    8p=3.4s, 16p=3.7s, 32p=5.1s for dedup_exact_first over 16M turns).
    Half a reducer slot per core keeps both pools fed on any cluster size.
    Raised to ``bytes_hint / TARGET_PARTITION_BYTES`` when the caller can
    estimate the shuffled bytes (partitions must also bound reducer memory),
    clamped to [floor, cap]. The floor keeps small test runs parallel enough
    to exercise the multi-partition code paths; the cap bounds scheduler
    pressure on very large clusters.
    """
    n = int(cluster_cpus() * per_cpu)
    if bytes_hint is not None:
        n = max(n, int(bytes_hint // TARGET_PARTITION_BYTES) + 1)
    n = max(floor, min(cap, n))
    _ensure_join_cpu_override(n)
    return n


def _ensure_join_cpu_override(num_partitions: int) -> None:
    """Bound the CPU a hash-join's aggregator-actor pool may RESERVE.

    Ray 2.49 sizes each join aggregator at ``min(1, (CPU/2)/partitions)`` —
    i.e. ONE pool reserves half the cluster. A DAG with two or more
    concurrently-executing joins (ngram_jaccard verify: candidate and text
    joins for both pair sides) can then reserve EVERY core for aggregators,
    starving the map tasks that feed them — a hard deadlock, reproduced
    deterministically on a fresh 4-CPU session (the pytest fixture size;
    32 idle HashShuffleAggregator actors, zero progress). Cap the
    per-partition reservation so a pool takes ~cpus/8 total, leaving ≥75%
    of the cluster for map tasks even with two pools live. Aggregators can
    still USE idle cores — the override only shrinks their reservation."""
    try:
        from ray.data.context import DataContext

        ctx = DataContext.get_current()
        per = min(1.0, (cluster_cpus() / 8.0) / max(1, num_partitions))
        cur = ctx.join_operator_actor_num_cpus_per_partition_override
        if cur is None or per < cur:
            ctx.join_operator_actor_num_cpus_per_partition_override = per
    except Exception:
        pass  # older/newer Ray without the knob: keep defaults


def drop_empty_blocks(ds, empty_schema=None):
    """Materialize ``ds`` and rebuild it from its non-empty blocks only.

    Ray 2.49's hash-aggregate finalize emits a ZERO-COLUMN empty block for
    every reducer partition that received no rows (e.g. fewer distinct group
    keys than shuffle partitions), and ``map_batches`` *skips* empty blocks
    entirely, so no downstream stage can repair their schema. Feeding such a
    block into ``Dataset.join`` fails inside acero with "No match ... for key
    field reference" because the join-key column doesn't exist in that block.
    This helper is the containment: call it on an aggregate output that will
    flow into a join. The materialize is acceptable exactly there — aggregate
    outputs are already fully materialized by the hash shuffle's finalize, so
    this adds only driver-side metadata work (block refs stay in the object
    store; no data moves).

    ``empty_schema`` (a pyarrow.Schema) types the result when EVERY block is
    empty — otherwise an empty dataset with unknown schema would reproduce
    the original failure one step later.
    """
    import pyarrow as pa
    import ray.data as rd

    m = ds.materialize()
    refs = [
        ref
        for bundle in m.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows is None or meta.num_rows > 0
    ]
    if not refs:
        if empty_schema is None:
            empty_schema = pa.schema([])
        return rd.from_arrow(empty_schema.empty_table())
    return rd.from_arrow_refs(refs)
