"""Pluggable per-process state-cache policy (ISickCacheManager analogue,
state/cache.py) — pure in-process tests, no Ray session needed."""

import numpy as np
import pyarrow as pa

from sick_ray.state.cache import (
    CachePolicy, cache_stats, clear, get_or_build)


def setup_function(_fn):
    clear()


def test_lru_eviction_and_counters():
    pol = CachePolicy(mode="lru", max_entries=2)
    builds = []

    def make(k):
        return lambda: builds.append(k) or k

    assert get_or_build("a", make("a"), pol) == "a"
    assert get_or_build("b", make("b"), pol) == "b"
    assert get_or_build("a", make("a"), pol) == "a"   # hit, refreshes LRU
    assert get_or_build("c", make("c"), pol) == "c"   # evicts "b"
    assert get_or_build("b", make("b"), pol) == "b"   # rebuild
    s = cache_stats()
    assert s["hits"] == 1 and s["misses"] == 4 and s["evictions"] == 2
    assert builds == ["a", "b", "c", "b"]


def test_none_policy_rebuilds_every_call():
    pol = CachePolicy(mode="none")
    n = [0]
    for _ in range(3):
        get_or_build("k", lambda: n.__setitem__(0, n[0] + 1), pol)
    assert n[0] == 3
    assert cache_stats() == {"hits": 0, "misses": 0, "evictions": 0}


def test_unbounded_policy_never_evicts():
    pol = CachePolicy(mode="unbounded")
    for i in range(50):
        get_or_build(i, lambda i=i: i, pol)
    assert cache_stats()["evictions"] == 0
    assert get_or_build(0, lambda: "rebuilt", pol) == 0  # still cached


def test_invalid_policy_rejected():
    import pytest

    with pytest.raises(ValueError):
        CachePolicy(mode="mru")
    with pytest.raises(ValueError):
        CachePolicy(mode="lru", max_entries=0)


def test_minhash_fn_state_cached_across_calls():
    """The minhash map fn builds its MinHasher once per process and
    reuses it across batches (same output either way — the cache is a
    warmup optimization, never semantics)."""
    from sick_ray.config import DedupConfig
    from sick_ray.stages.minhash import make_minhash_fn

    cfg = DedupConfig(num_perm=16, bands=4, rows_per_band=4)
    fn = make_minhash_fn(cfg)
    batch = pa.table(
        {
            "url": pa.array(["u1", "u2"]),
            "warc_ts": pa.array([1, 2], type=pa.int64()),
            "fp64": pa.array([11, 22], type=pa.int64()),
            "text": pa.array(["the quick brown fox jumps over the lazy dog",
                              "pack my box with five dozen liquor jugs"]),
        }
    )
    out1 = fn(batch)
    base = cache_stats()
    out2 = fn(batch)
    after = cache_stats()
    assert after["hits"] == base["hits"] + 1     # second call reused state
    sig1 = out1.column("band_hash").to_pylist()
    assert sig1 == out2.column("band_hash").to_pylist()
    # a no-cache policy produces identical signatures
    fn_none = make_minhash_fn(cfg, cache_policy=CachePolicy(mode="none"))
    assert fn_none(batch).column("band_hash").to_pylist() == sig1
