"""Tiny Ray runtime introspection helpers shared by the retry-aware stages.

The retry-replay machinery (BloomMarkStage cache keys, SketchTail part-file
names) needs to know not just *which* task a batch belongs to but *which
attempt* of that task: a retried task can re-execute in a still-alive worker
process, where any per-worker ordinal bookkeeping from the first attempt
survives. Keying bookkeeping by (task_id, attempt) — and resetting ordinals
when a task id re-enters under a new attempt — restores the invariant that
(task_id, ordinal) identifies a physical batch across retries.
"""

from __future__ import annotations


def task_identity() -> tuple[str, int]:
    """(task_id, attempt_number) of the currently-executing Ray task.

    Falls back to ("driver", 0) outside a task. The attempt number comes
    from the core worker (internal API, guarded): 0 for the first execution,
    incremented on retries / lineage re-execution.
    """
    tid, attempt = "driver", 0
    try:
        import ray

        tid = ray.get_runtime_context().get_task_id() or "driver"
    except Exception:
        return tid, attempt
    try:
        from ray._private.worker import global_worker

        attempt = int(global_worker.core_worker.get_current_task_attempt_number())
    except Exception:
        attempt = 0
    return tid, attempt
