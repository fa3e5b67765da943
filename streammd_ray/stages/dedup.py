"""Duplicate-detection stages — the Ray-Data re-expression of the reference's
single-pass Bloom dedup (/root/reference/src/markdups.cxx:86-135, studied for
semantics only).

Three building blocks:

- :func:`add_key_columns` — stateless ``map_batches`` deriving the dedup key's
  two 64-bit hashes from the canonical key bytes. Multi-column keys use
  length-prefixed encoding (the reference is careful that ``chr1|1234`` and
  ``chr11|234`` must not collide, src/markdups.cxx:142-145; length prefixes
  generalize that discipline). Null content ⇒ null key (the "unmapped"
  analog: counted, never inserted, src/markdups.cxx:110-112).

- :class:`BloomShardActor` + :class:`BloomMarkStage` — the stateful path.
  P shard actors each own 1/P of the global Bloom filter; every key is routed
  to ``h1 mod P``, so each key always consults the same shard and the
  partitioned filter is decision-equivalent to one global filter of the same
  total (m, k) (SURVEY.md §7.0). Marking happens shard-locally during insert;
  the merged (ORed) filter is used only for global estimates, never for
  marking (SURVEY.md §4.2). First-seen-wins is arrival-order within the Ray
  stream — exactly one row per distinct key survives (actor calls serialize),
  but *which* physical row is first is nondeterministic under parallelism, so
  order-sensitive oracles must use :func:`dedup_exact_first` instead; the
  duplicate-count and metrics are deterministic.

- :func:`dedup_exact_first` — the exact, deterministic oracle path:
  hash-partitioned ``groupby`` + first-by-(conv_id, turn_idx) within each
  group. O(n) shuffle; use at test scale and wherever row-identity
  determinism matters. This is the engine's analog of the exact-dedup oracle
  the reference is validated against (Picard golden outputs,
  tests/test_picard.cxx).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import SEED_A, SEED_B, hash_pair_batch
from ..sketches.bloom import (
    BlockedBloomFilter,
    BloomFilter,
    ExactSetFilter,
    SplitBlockBloomFilter,
)

KEY_H1 = "__key_h1"
KEY_H2 = "__key_h2"

#: probe-layout registry (see _BloomShard.__init__ for the semantics);
#: "exact" trades ~16 bytes/key for p = 0 — stream-order exact marking at
#: the flagship's shuffle profile (sketches/bloom.py ExactSetFilter)
BLOOM_LAYOUTS = {
    "classic": BloomFilter,
    "blocked": BlockedBloomFilter,
    "split": SplitBlockBloomFilter,
    "exact": ExactSetFilter,
}


def resolve_layout(layout: str | None, blocked: bool = False):
    """Map (layout, legacy blocked flag) → filter class; reject conflicts
    (a caller saying blocked=True layout='split' has a bug, not a default)."""
    if layout is None:
        return BlockedBloomFilter if blocked else BloomFilter
    if layout not in BLOOM_LAYOUTS:
        raise ValueError(
            f"unknown bloom layout {layout!r}; one of {sorted(BLOOM_LAYOUTS)}"
        )
    if blocked and layout != "blocked":
        raise ValueError(f"blocked=True conflicts with layout={layout!r}")
    return BLOOM_LAYOUTS[layout]

# Arrow field-metadata key recording which (key_cols, seeds) produced the
# stored hash columns — checked on passthrough so a pipeline can't silently
# dedup pre-hashed data on the wrong key spec.
_KEY_SPEC_META = b"streammd.key_spec"


def _key_spec(key_cols: tuple[str, ...], seeds: tuple[int, int]) -> str:
    return f"cols={','.join(key_cols)};seeds={seeds[0]:x},{seeds[1]:x}"


def canonical_key(batch: pa.Table, key_cols: tuple[str, ...]) -> pa.Array:
    """Length-prefixed, collision-safe concatenation of the key columns.

    Null in the *first* (content) column ⇒ null key. Nulls in secondary
    columns encode as the 1-char sentinel '\\x00' (distinct from empty
    string's '0:').
    """
    if len(key_cols) == 1:
        return batch[key_cols[0]].combine_chunks()
    parts = []
    for i, c in enumerate(key_cols):
        col = batch[c]
        if not isinstance(col, pa.Array):
            col = col.combine_chunks()
        col = pc.cast(col, pa.string())
        ln = pc.cast(pc.utf8_length(col), pa.string())
        enc = pc.binary_join_element_wise(ln, ":", col, "")
        if i > 0:
            enc = pc.fill_null(enc, "\x00")
        parts.append(enc)
    out = pc.binary_join_element_wise(*parts, "#")
    # null iff content col null (join emits null if ANY part is null; parts>0
    # were fill_null'd, so only the first col's nulls remain)
    return out


def add_key_columns(
    ds,
    key_cols: tuple[str, ...] = ("text",),
    *,
    seeds: tuple[int, int] = (SEED_A, SEED_B),
):
    """Append the (h1, h2) dedup-key hash columns (uint64; 0 = null key).

    Batches that already carry the key columns pass through — this lets a
    pipeline run over a pre-hashed table (e.g. a payload-light derivative
    where the text column was dropped after hashing) without a separate
    code path. The passthrough is NOT blind (round-3 advice #2): when the
    stored KEY_H1 field carries a key-spec annotation, or when the requested
    key columns are still present so the hash can be spot-recomputed, a
    (key_cols, seeds) mismatch raises instead of silently deduping on the
    wrong key."""
    spec = _key_spec(key_cols, seeds)

    def _recompute(batch: pa.Table, rows: int = 4) -> None:
        head = batch.slice(0, min(rows, batch.num_rows))
        key = canonical_key(head, key_cols)
        h1, _ = hash_pair_batch(key, *seeds)
        h1 = h1.copy()
        h1[np.asarray(pc.is_null(key))] = 0
        stored = np.asarray(head[KEY_H1], dtype=np.int64).view(np.uint64)
        if not np.array_equal(h1, stored):
            raise ValueError(
                f"pre-existing {KEY_H1}/{KEY_H2} columns were hashed with a "
                f"different key spec than the requested {spec} — refusing to "
                "dedup on mismatched keys"
            )

    def derive(batch: pa.Table) -> pa.Table:
        if KEY_H1 in batch.column_names and KEY_H2 in batch.column_names:
            field = batch.field(KEY_H1)
            stored_spec = (field.metadata or {}).get(_KEY_SPEC_META)
            if stored_spec is not None:
                if stored_spec.decode() != spec:
                    raise ValueError(
                        f"pre-existing {KEY_H1} was derived with key spec "
                        f"{stored_spec.decode()!r} but this stage requested "
                        f"{spec!r} — refusing to dedup on mismatched keys"
                    )
            elif all(c in batch.column_names for c in key_cols):
                _recompute(batch)
            # else: key columns dropped upstream (payload-light table) and no
            # annotation to check — the caller owns the spec contract
            return batch
        key = canonical_key(batch, key_cols)
        h1, h2 = hash_pair_batch(key, *seeds)
        null_mask = np.asarray(pc.is_null(key))
        h1 = h1.copy()
        h1[null_mask] = 0
        # stored as int64 bit-patterns: Ray's hash-shuffle aggregations round-
        # trip int64 through Arrow cleanly, while uint64 > 2^63 falls back to
        # pickled Python objects (stages view back to uint64 for arithmetic)
        return batch.append_column(
            pa.field(KEY_H1, pa.int64(), metadata={_KEY_SPEC_META: spec}),
            pa.array(h1.view(np.int64), pa.int64()),
        ).append_column(KEY_H2, pa.array(h2.view(np.int64), pa.int64()))

    return ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Sharded Bloom actors (the scale path)
# ---------------------------------------------------------------------------


class _BloomShard:
    """One partition of the global Bloom filter + its running counters
    (the counters mirror struct counts, /root/reference/src/markdups.h:33-36)."""

    def __init__(
        self,
        p: float,
        capacity: int,
        *,
        m: int | None = None,
        k: int | None = None,
        seeds=(SEED_A, SEED_B),
        blocked: bool = False,
        layout: str | None = None,
    ):
        # layout: probe geometry of this shard's filter —
        #   "classic" (default): k probes over the whole bitset, the
        #     reference's layout (src/bloomfilter.cxx:104-120);
        #   "blocked": cache-line-blocked (BlockedBloomFilter) — all k
        #     probes in one 64-byte line;
        #   "split": split-block bit pattern (SplitBlockBloomFilter) — one
        #     bit per 64-bit lane of the line, structural k=8, the fastest
        #     kernel (~30x classic-numpy with the native path).
        # Each layout's stats() report its own honest marginal_fpr.
        # ``blocked`` is the pre-layout boolean spelling, kept for callers.
        cls = resolve_layout(layout, blocked)
        if cls is SplitBlockBloomFilter:
            k = None  # structural k=8; mem-spec callers pass k=10
        if m is not None and k is not None:
            self.bf = cls(p, m=m, k=k, seeds=seeds)
        elif m is not None:
            self.bf = cls(p, m=m, seeds=seeds)
        else:
            self.bf = cls(p, capacity, seeds=seeds)
        import collections

        self.keys_seen = 0
        self.dups = 0
        # LRU: replayed (retried-task) lookups move their entry to the back,
        # so eviction hits the coldest entries — those of long-finished tasks
        # — first, not a live task's entry in a long-lived worker
        self._cache: collections.OrderedDict = collections.OrderedDict()
        self._sealed = False

    _CACHE_MAX = 4096

    def add(
        self, h1: np.ndarray, h2: np.ndarray, batch_key: bytes | None = None
    ) -> np.ndarray:
        """Insert a routed slice; returns was_new.

        ``batch_key`` identifies the PHYSICAL batch: (Ray task id, batch
        ordinal within the task, slice content). A Ray task retry re-runs the
        same task id and replays its batches in order, so the retry hits the
        cache and does not mark its own rows as duplicates of themselves
        (SURVEY.md §7.3 "exactness under retries"). Two genuinely distinct
        batches with byte-identical content (e.g. a byte-copied input file)
        come from different tasks/ordinals and do NOT replay. The cache is
        bounded; callers must still consume the marked dataset exactly once
        (materialize or write) — full plan re-executions are not replays and
        are caught by :meth:`seal`.
        """
        if self._sealed:
            raise RuntimeError(
                "Bloom shard is sealed: the marked dataset was already "
                "consumed; a second execution of the lazy plan would "
                "re-insert every key and mark every row duplicate "
                "(consume-once contract, pipelines/mark_duplicates.py)"
            )
        if batch_key is not None and batch_key in self._cache:
            self._cache.move_to_end(batch_key)
            return self._cache[batch_key]
        was_new = self.bf.add_hashed(h1, h2)
        self.keys_seen += len(h1)
        self.dups += int((~was_new).sum())
        if batch_key is not None:
            if len(self._cache) >= self._CACHE_MAX:
                self._cache.popitem(last=False)
            self._cache[batch_key] = was_new
        return was_new

    def contains(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        return self.bf.contains_hashed(h1, h2)

    def stats(self) -> dict:
        return {
            "keys_seen": self.keys_seen,
            "dups": self.dups,
            "n_added": self.bf.n_added,
            "capacity": self.bf.n,
            "marginal_fpr": self.bf.marginal_fpr(),
            "count_estimate": self.bf.count_estimate(),
        }

    def seal(self) -> None:
        """Refuse further inserts: called once the marked dataset has been
        consumed, so a silent plan re-execution fails loudly instead of
        re-inserting every key (the consume-once contract made enforceable)."""
        self._sealed = True

    def unseal(self) -> None:
        """Re-allow inserts — used by the wave/checkpoint driver, where the
        SAME shard actors intentionally process successive waves."""
        self._sealed = False

    def state(self) -> bytes:
        return self.bf.to_bytes()

    def load(self, data: bytes, keys_seen: int = 0, dups: int = 0) -> None:
        """Restore filter + running counters (counters are snapshot alongside
        the filter by state/checkpoint.py so resumed runs report true
        keys_seen/dups, not zeros)."""
        self.bf = BloomFilter.from_bytes(data)
        self.keys_seen = keys_seen
        self.dups = dups
        self._sealed = False


def make_shard_actors(
    num_shards: int,
    *,
    p: float = 1e-6,
    total_capacity: int | None = None,
    mem: str | None = None,
    seeds=(SEED_A, SEED_B),
    num_cpus: float = 0,
    blocked: bool = False,
    layout: str | None = None,
):
    """Create the P Bloom shard actors.

    Sizing: the total memory/capacity budget is split evenly across shards;
    keys route by ``h1 mod P``, so shard i holds ~n/P keys and honors the
    configured FPR p at its share (SURVEY.md §7.3 FPR accounting). P is fixed
    for the run and recorded in lineage — state partition count must be
    deterministic, never autoscaled.

    ``num_cpus=0`` (default): the shards are short-burst RPC servers driven
    by the marking tasks, which hold the real CPU slots; a fractional
    reservation per always-resident actor deadlocks small clusters once a
    few pipelines have run in one session (reservations outlive the
    pipeline until the actors are released).
    """
    import ray

    from ..sketches.bloom import DEFAULT_MEM_K, parse_memspec

    Actor = ray.remote(num_cpus=num_cpus)(_BloomShard)
    kwargs: dict = {"seeds": seeds, "blocked": blocked, "layout": layout}
    if mem is not None:
        total_m = 8 * parse_memspec(mem)
        per_m = total_m // num_shards
        # keep pow2 addressing when the split allows it
        per_m = 1 << (per_m.bit_length() - 1)
        kwargs.update(m=per_m, k=DEFAULT_MEM_K)
        cap = 0
    else:
        cap = max(1024, int((total_capacity or 1_000_000) / num_shards))
    return [Actor.remote(p, cap, **kwargs) for _ in range(num_shards)]


class BloomMarkStage:
    """map_batches callable: route each row's key hash to its shard actor,
    gather was_new verdicts, append ``is_duplicate``.

    The per-batch work is one numpy argsort-free bucketing + P concurrent
    actor RPCs; actor handles are constructor args so the routing table is
    built once per map worker, not per batch.
    """

    def __init__(self, shards, *, mark_col: str = "is_duplicate"):
        self.shards = shards
        self.P = len(shards)
        self.mark_col = mark_col
        # batch ordinal per physical Ray task ATTEMPT: a retried task re-runs
        # under the SAME task id (possibly in the same still-alive worker
        # process), so ordinals are reset whenever a task id re-enters under a
        # new attempt number — (task_id, ordinal) then identifies a physical
        # batch across retries (the retry's first batch gets ordinal 0 again
        # and HITS the shard cache) while distinguishing genuinely distinct
        # batches with identical content
        self._task_ordinals: dict[str, list] = {}  # tid -> [attempt, next_ordinal]

    def _batch_key(self, h1_slice: np.ndarray) -> bytes:
        from .._runtime import task_identity

        tid, attempt = task_identity()
        rec = self._task_ordinals.get(tid)
        if rec is None or rec[0] != attempt:
            rec = [attempt, 0]  # first batch of this task / of a retry
        ordinal = rec[1]
        self._task_ordinals[tid] = [attempt, ordinal + 1]
        if len(self._task_ordinals) > 4096:  # bounded; never evict the live task
            for k in self._task_ordinals:
                if k != tid:
                    del self._task_ordinals[k]
                    break
        # the key deliberately EXCLUDES the attempt number: a retry must
        # produce the same key as the original so it replays from the cache
        h = hashlib.blake2b(digest_size=16)
        h.update(tid.encode())
        h.update(ordinal.to_bytes(8, "big"))
        h.update(h1_slice.tobytes())
        return h.digest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        h1 = np.asarray(batch[KEY_H1].combine_chunks(), dtype=np.int64).view(np.uint64)
        h2 = np.asarray(batch[KEY_H2].combine_chunks(), dtype=np.int64).view(np.uint64)
        n = len(h1)
        is_dup = np.zeros(n, dtype=bool)
        nonnull = h1 != 0
        if nonnull.any():
            idx = np.flatnonzero(nonnull)
            shard_of = (h1[idx] % np.uint64(self.P)).astype(np.int64)
            order = np.argsort(shard_of, kind="stable")
            idx_sorted = idx[order]
            shard_sorted = shard_of[order]
            bounds = np.searchsorted(shard_sorted, np.arange(self.P + 1))
            bkey_prefix = self._batch_key(h1[idx_sorted])
            futures, spans = [], []
            for s in range(self.P):
                lo, hi = bounds[s], bounds[s + 1]
                if lo == hi:
                    continue
                rows = idx_sorted[lo:hi]
                bkey = bkey_prefix + s.to_bytes(4, "big")
                futures.append(self.shards[s].add.remote(h1[rows], h2[rows], bkey))
                spans.append(rows)
            for rows, was_new in zip(spans, ray.get(futures)):
                is_dup[rows] = ~was_new
        return batch.append_column(self.mark_col, pa.array(is_dup))


def make_mark_fn(shards, *, mark_col: str = "is_duplicate"):
    """Task-based marking: a plain FUNCTION closing over the shard handles,
    so Ray Data runs it as stateless tasks that FUSE with the surrounding
    map_batches stages (read → derive → mark → finish → tail become ONE
    task chain — no actor pool to spawn, no extra object-store hop). The
    closure is deserialized once per worker process and the stage instance
    (with its per-task ordinal bookkeeping) persists there, so retry-replay
    semantics are identical to the actor-pool path."""
    holder: dict = {}

    def mark_fn(batch: pa.Table) -> pa.Table:
        stage = holder.get("stage")
        if stage is None:
            stage = holder["stage"] = BloomMarkStage(shards, mark_col=mark_col)
        return stage(batch)

    return mark_fn


class ConversationValidationError(ValueError):
    """A conversation violates the input invariant (the analog of the
    reference's group-arity error, src/markdups.cxx:96-103: it aborts when a
    qname group doesn't have exactly reads_per_template records)."""


def validate_conversations(ds, *, max_report: int = 5, num_partitions: int = 32):
    """Enforce the input_hint ordering invariant: within each conv_id,
    turn_idx is 0-based, contiguous and unique, and ts is non-decreasing.

    Shuffles only (conv_id, turn_idx, ts) hash-partitioned by conv_id, and
    checks every conversation of a partition with cython groupby kernels
    (cumcount/diff) — one vectorized pass per partition, no per-conversation
    Python. Raises ConversationValidationError naming offending
    conversations; returns the input dataset unchanged on success."""
    import pandas as pd_

    from .windows import partitioned_group_apply

    def check_partition(df: pd_.DataFrame) -> pd_.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
        conv = df["conv_id"]
        pos = conv.groupby(conv.values, sort=False).cumcount().to_numpy()
        bad_idx = df["turn_idx"].to_numpy() != pos
        ts_diff = (
            df["ts"].astype("int64").groupby(conv.values, sort=False).diff()
        )
        bad_ts = (ts_diff < 0).to_numpy()
        out = []
        if bad_idx.any():
            for c in pd_.unique(conv.to_numpy()[bad_idx]):
                out.append((c, "turn_idx not contiguous/unique/0-based"))
        if bad_ts.any():
            idx_bad = set(conv.to_numpy()[bad_idx])
            for c in pd_.unique(conv.to_numpy()[bad_ts]):
                if c not in idx_bad:
                    out.append((c, "ts not monotone non-decreasing"))
        return pd_.DataFrame(out, columns=["conv_id", "why"])

    offenders = partitioned_group_apply(
        ds.select_columns(["conv_id", "turn_idx", "ts"]),
        "conv_id",
        check_partition,
        num_partitions=num_partitions,
    ).take(max_report)
    if offenders:
        msg = "; ".join(f"{r['conv_id']}: {r['why']}" for r in offenders)
        raise ConversationValidationError(
            f"input violates the (conv_id, turn_idx) invariant — {msg}"
        )
    return ds


# ---------------------------------------------------------------------------
# Exact deterministic dedup (oracle path)
# ---------------------------------------------------------------------------


def dedup_exact_first(
    ds,
    key_cols: tuple[str, ...] = ("text",),
    *,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    mark_col: str = "is_duplicate",
    drop_key_cols: bool = True,
    strategy: str = "partition",
    num_partitions: int | None = None,
):
    """Exact first-seen-wins duplicate marking, deterministic under any
    partition layout: first = min(order_cols) per distinct key.

    strategy='partition' (default): ONE payload shuffle total —
    hash-partition the full rows by h1 and mark first-occurrence per
    partition with a single sort + vectorized ``duplicated`` over the whole
    partition (every row of a key meets in one partition, so the
    partition-local decision is global). Key identity is the 128-bit hash
    (collision probability ~2^-128 — the standard content-hash dedup
    assumption). Measured 3.8-4.7× faster than 'join' at 1.6M rows / 32
    CPUs (1.1-1.3 s vs 4.3-5.3 s), cell-identical output incl. dtypes
    (test-pinned). Sizing rule: each hash partition becomes ONE in-memory
    frame in its reducer, so ``num_partitions`` must bound partition bytes
    into a worker heap — pass ``auto_num_partitions(bytes_hint=...)`` when
    the payload estimate is known (at 100 TB: ~e.g. 4096-cap partitions of
    the hashed key space; raise the cap for bigger corpora).

    strategy='join': shuffle only the 128-bit key hash + an order-encoded
    rank string — ``groupby(h1,h2).Min(rank)`` then a hash join back; fully
    vectorized, no per-group Python. Payload bytes still cross the network
    once (the join's build side), plus the slim Min exchange; keeps every
    stage streaming-blocked, so no per-partition memory constraint — the
    fallback when partitions can't be memory-bounded.

    strategy='groups': ``groupby(h1)`` + per-group pandas with exact
    real-key comparison (resolves even 64-bit collisions); slower due to
    per-group overhead — the validation-scale reference implementation.

    Null-key rows are salted across groups by row identity so the null
    fraction doesn't become one giant group; they are never marked.
    """
    if num_partitions is None:
        from ..context import auto_num_partitions

        num_partitions = auto_num_partitions()

    def salt_nulls(batch: pa.Table) -> pa.Table:
        h1 = np.asarray(batch[KEY_H1].combine_chunks(), dtype=np.int64).view(np.uint64)
        if (h1 == 0).any():
            salt, _ = hash_pair_batch(
                pc.binary_join_element_wise(
                    pc.cast(batch[order_cols[0]].combine_chunks(), pa.string()),
                    pc.cast(batch[order_cols[1]].combine_chunks(), pa.string()),
                    "\x00",
                )
            )
            h1 = np.where(h1 == 0, salt | np.uint64(1), h1)
            null_flag = np.asarray(pc.is_null(canonical_key(batch, key_cols)))
        else:
            null_flag = np.zeros(len(h1), dtype=bool)
        return batch.set_column(
            batch.schema.get_field_index(KEY_H1),
            KEY_H1,
            pa.array(h1.view(np.int64), pa.int64()),
        ).append_column("__key_null", pa.array(null_flag))

    ds = add_key_columns(ds, key_cols)
    ds = ds.map_batches(salt_nulls, batch_format="pyarrow")

    key_list = list(key_cols)
    order_list = list(order_cols)

    if strategy == "join":
        # order-encoded rank whose lexicographic order == (order_cols) tuple
        # order: first col (string) + NUL + zero-filled numeric second col
        def add_rank(t: pa.Table) -> pa.Table:
            rank = pc.binary_join_element_wise(
                pc.cast(t[order_cols[0]].combine_chunks(), pa.string()),
                pc.utf8_lpad(
                    pc.cast(t[order_cols[1]].combine_chunks(), pa.string()),
                    12,
                    "0",
                ),
                "\x00",
            )
            t = t.append_column("__rank", rank)
            # pyarrow's hash join rejects null-typed payload columns (an
            # all-null block infers type null); carry them as string
            for i, f in enumerate(t.schema):
                if pa.types.is_null(f.type):
                    t = t.set_column(
                        i, f.name, pa.nulls(len(t), pa.string())
                    )
            return t

        from ray.data.aggregate import Min

        keyed = ds.map_batches(add_rank, batch_format="pyarrow", zero_copy_batch=True)
        from ..context import drop_empty_blocks

        mins = keyed.groupby([KEY_H1, KEY_H2]).aggregate(
            Min("__rank", alias_name="__min_rank")
        )
        # empty reducer partitions finalize to zero-column blocks which the
        # join below cannot key — strip them (context.drop_empty_blocks)
        mins = drop_empty_blocks(
            mins,
            empty_schema=pa.schema(
                [
                    (KEY_H1, pa.int64()),
                    (KEY_H2, pa.int64()),
                    ("__min_rank", pa.string()),
                ]
            ),
        )
        joined = keyed.join(
            mins,
            "inner",
            num_partitions=num_partitions,
            on=(KEY_H1, KEY_H2),
        )

        def mark(t: pa.Table) -> pa.Table:
            dup = pc.and_(
                pc.invert(t["__key_null"].combine_chunks()),
                pc.not_equal(
                    t["__rank"].combine_chunks(), t["__min_rank"].combine_chunks()
                ),
            )
            return t.append_column(mark_col, dup)

        out = joined.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True)
        drop = [KEY_H1, KEY_H2, "__key_null", "__rank", "__min_rank"]
        return out.drop_columns(drop)

    if strategy == "partition":
        from .windows import partitioned_group_apply

        def mark_partition(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(order_list, kind="stable")
            nn = ~df["__key_null"].to_numpy()
            dup = np.zeros(len(df), dtype=bool)
            if nn.any():
                sub = df.loc[nn, [KEY_H1, KEY_H2]]
                dup[nn] = sub.duplicated(keep="first").to_numpy()
            df[mark_col] = dup
            return df.drop(columns=[KEY_H1, KEY_H2, "__key_null"])

        return partitioned_group_apply(
            ds, KEY_H1, mark_partition, num_partitions=num_partitions
        )

    def mark_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_list, kind="stable")
        nn = ~g["__key_null"].to_numpy()
        dup = np.zeros(len(g), dtype=bool)
        if nn.any():
            sub = g.loc[nn, key_list]
            dup[nn] = sub.duplicated(keep="first").to_numpy()
        g[mark_col] = dup
        return g

    out = ds.groupby(KEY_H1).map_groups(mark_group, batch_format="pandas")
    drop = [KEY_H1, KEY_H2, "__key_null"]
    return out.drop_columns(drop)
