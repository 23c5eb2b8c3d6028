"""Pluggable per-process state-cache policy — the analogue of the
reference's ``ISickCacheManager`` (json-sick-csharp
``SickSharp/IO/ISickCacheManager.cs:12-53``: a policy object decides how
each opened table/file is cached, independently of the reader code).

Here the cached unit is per-worker-process STAGE STATE (MinHash
permutation tables, compiled tokenizers — see
``stages/minhash._proc_cache``'s rationale: Ray reuses worker processes
across task executions, and rebuilding numpy-heavy state per task repays
seconds of first-touch page faults). The policy governs eviction and
exposes the hit/miss/eviction counters that back a ``CacheSaturation``-
style readout (``PageCachedFile.cs:80-84``).

The cache itself is anchored on the ``sys`` module (stable per process
even under cloudpickle by-value re-materialization of this package's
modules); the policy travels inside the pickled closure, so different
stages can run different policies in the same worker process.
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass


@dataclass(frozen=True)
class CachePolicy:
    """``mode``: "lru" (bounded, default), "unbounded", or "none"
    (rebuild per call — the ISickCacheManager "no caching" strategy)."""

    mode: str = "lru"
    max_entries: int = 8

    def __post_init__(self):
        if self.mode not in ("lru", "unbounded", "none"):
            raise ValueError(f"unknown cache mode {self.mode!r}")
        if self.mode == "lru" and self.max_entries < 1:
            raise ValueError("lru policy needs max_entries >= 1")


DEFAULT_POLICY = CachePolicy()

_ANCHOR = "_sick_ray_state_cache"


def _store() -> tuple[OrderedDict, dict]:
    """(entries, stats) anchored on sys — one per worker process."""
    import sys as _sys

    store = getattr(_sys, _ANCHOR, None)
    if store is None:
        store = (OrderedDict(), {"hits": 0, "misses": 0, "evictions": 0})
        setattr(_sys, _ANCHOR, store)
    return store


def get_or_build(key, build, policy: CachePolicy = DEFAULT_POLICY):
    """Return the cached value for ``key``, building (and caching, per
    policy) on miss. LRU order is updated on hit."""
    if policy.mode == "none":
        return build()
    entries, stats = _store()
    if key in entries:
        stats["hits"] += 1
        entries.move_to_end(key)
        return entries[key]
    stats["misses"] += 1
    val = build()
    entries[key] = val
    if policy.mode == "lru":
        while len(entries) > policy.max_entries:
            entries.popitem(last=False)
            stats["evictions"] += 1
    return val


def cache_stats() -> dict:
    """Copy of this process's {hits, misses, evictions} counters."""
    _entries, stats = _store()
    return dict(stats)


def clear() -> None:
    """Drop all cached state and reset counters (tests)."""
    import sys as _sys

    if hasattr(_sys, _ANCHOR):
        delattr(_sys, _ANCHOR)
