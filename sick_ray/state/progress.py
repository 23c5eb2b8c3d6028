"""Live per-stage progress counters — the analogue of the reference's
``CacheSaturation`` running ratio (json-sick-csharp
``SickSharp/Format/IO/PageCachedFile.cs:80-84``: fraction of pages loaded,
readable WHILE work is in flight, not post-hoc).

One tiny named actor (``num_cpus=0``) holds {stage: rows_processed} and
optional {stage: total_rows}. Hot map_batches functions are wrapped with
:func:`counted`, which fires ONE fire-and-forget actor call per BATCH
(never per row — at batch_size=1024 that is ~0.1% call overhead), so any
observer (the CLI's poller thread, a dashboard, a test) can read
saturation mid-stage. The actor is advisory state only: losing it loses a
progress line, never data, and every update path swallows errors.
"""

from __future__ import annotations

ACTOR_NAME = "sick_ray_progress"


def _actor_cls():
    import ray

    @ray.remote(num_cpus=0)
    class ProgressActor:
        def __init__(self):
            self.rows: dict = {}
            self.totals: dict = {}

        def add(self, stage: str, n: int) -> None:
            self.rows[stage] = self.rows.get(stage, 0) + int(n)

        def set_total(self, stage: str, n: int) -> None:
            self.totals[stage] = int(n)

        def reset(self) -> None:
            self.rows.clear()
            self.totals.clear()

        def snapshot(self):
            return dict(self.rows), dict(self.totals)

    return ProgressActor


_HANDLE = None  # driver-side anchor: a named (non-detached) actor lives
                # only while its ORIGINAL creation handle does — handles
                # from ray.get_actor do NOT pin it. Overwriting this with a
                # get_actor handle (round-3 bug) dropped the creation
                # handle, Ray reaped the actor mid-run, and every worker
                # update silently no-opped. Keep the creation handle here
                # and never replace it while the session lives.


def ensure_actor():
    """Get or create the named progress actor (driver side, idempotent)."""
    import ray

    global _HANDLE
    if _HANDLE is not None:
        try:                      # still alive in the current session?
            ray.get(_HANDLE.snapshot.remote(), timeout=10)
            return _HANDLE
        except Exception:         # stale after ray.shutdown/re-init
            _HANDLE = None
    try:
        _HANDLE = _actor_cls().options(name=ACTOR_NAME).remote()
        # block until the name is REGISTERED — otherwise pipeline tasks
        # launched right after can race get_actor and every per-batch
        # update silently no-ops for the whole run
        ray.get(_HANDLE.snapshot.remote())
    except ValueError:            # lost a creation race in this process
        _HANDLE = ray.get_actor(ACTOR_NAME)
    return _HANDLE


def snapshot():
    """(rows, totals) dicts, or ({}, {}) when no actor exists."""
    import ray

    try:
        a = ray.get_actor(ACTOR_NAME)
        return ray.get(a.snapshot.remote())
    except Exception:
        return {}, {}


def set_total(stage: str, n: int) -> None:
    import ray

    try:
        ray.get_actor(ACTOR_NAME).set_total.remote(stage, n)
    except Exception:
        pass


def counted(stage: str, fn):
    """Wrap a map_batches fn: after each batch, report its row count to the
    progress actor (fire-and-forget; one cached handle per worker)."""
    cache: dict = {}

    def wrapped(batch):
        out = fn(batch)
        try:
            import ray

            a = cache.get("a")
            if a is None:
                a = ray.get_actor(ACTOR_NAME)
                cache["a"] = a
            a.add.remote(stage, batch.num_rows)
        except Exception:
            cache.pop("a", None)
        return out

    return wrapped


def format_line(rows: dict, totals: dict) -> str:
    parts = []
    for k in sorted(rows):
        v = rows[k]
        if k in totals and totals[k]:
            parts.append(f"{k}={v}/{totals[k]} ({100.0 * v / totals[k]:.0f}%)")
        else:
            parts.append(f"{k}={v}")
    return "progress: " + " ".join(parts)
