"""Mergeable streaming sketches — the cardinality / heavy-hitter
operators a 100-TB pipeline uses where exact answers would shuffle the
whole key universe.

- **HyperLogLog** (Flajolet et al. 2007, with the linear-counting
  small-range correction from the original paper): per-batch register
  arrays (m = 2^p uint8 registers per group key), merged by elementwise
  max — ONLY m-byte registers ever move, never a user id. Standard
  error 1.04/sqrt(m) ≈ 0.8% at p=14.
- **Misra-Gries / SpaceSaving-style heavy hitters** (Misra & Gries 1982;
  mergeability per Agarwal et al. 2013): each batch's exact counts are
  compressed to ≤ c counters by subtracting the (c+1)-th largest count
  (the canonical MG compression), partials merge by plain summation,
  and every true count is under-estimated by at most N/(c+1) per
  compression — the final counter of any item with true count
  > N_total/(c+1) is guaranteed present.

Both sketches are deliberately paired with EXACT twins in
pipelines/queries.py (count-distinct via a distinct shuffle, top-k via
the full term shuffle) so the approximation is verifiable: pytest gates
the HLL estimate within its standard-error envelope and MG within its
deterministic N/(c+1) bound against the exact results.

All kernels are vectorized numpy over Arrow batches; no per-row Python.
"""

from __future__ import annotations

import numpy as np

from sick_ray.shuffle import mix64

__all__ = [
    "bloom_build",
    "bloom_contains",
    "bloom_params",
    "clz64",
    "hll_batch_registers",
    "hll_merge_estimate",
    "mg_compress_counts",
]


def clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (64 for x == 0)."""
    r = np.zeros(len(x), dtype=np.int64)          # floor(log2(x)) builder
    y = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = y >= (np.uint64(1) << np.uint64(s))
        r[big] += s
        y[big] >>= np.uint64(s)
    return np.where(x > 0, 63 - r, 64)


def hll_batch_registers(keys_idx: np.ndarray, n_keys: int,
                        values: np.ndarray, p: int = 14) -> np.ndarray:
    """Dense (n_keys, 2^p) uint8 HLL register matrix for one batch.

    ``keys_idx``: int group index per row (0..n_keys-1); ``values``:
    uint64 element ids (pre-hash not required — an avalanche mix is
    applied here so sequential ids spread)."""
    m = 1 << p
    h = mix64(values.astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)                          # remaining 64-p bits, MSB-aligned
    rho = np.minimum(clz64(w) + 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(n_keys * m, dtype=np.uint8)
    np.maximum.at(regs, keys_idx * m + idx, rho)
    return regs.reshape(n_keys, m)


_TWO_NEG = 2.0 ** -np.arange(65)                   # 2^-register lookup


def hll_merge_estimate(regs: np.ndarray) -> int:
    """Cardinality estimate from one merged register array (length 2^p).

    Standard HLL estimator with the original small-range correction:
    E = alpha_m * m^2 / sum(2^-M); if E <= 2.5m and empty registers
    remain, use linear counting m * ln(m / V)."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / _TWO_NEG[regs].sum()
    if e <= 2.5 * m:
        v = int((regs == 0).sum())
        if v:
            e = m * np.log(m / v)
    return int(round(e))


def mg_compress_counts(counts: np.ndarray, cap: int) -> tuple[np.ndarray, int]:
    """Misra-Gries compression of exact counts to ≤ ``cap`` counters.

    Returns (adjusted counts with zeros where dropped, subtracted offset).
    Every kept counter is the true batch count minus ``offset`` (the
    (cap+1)-th largest count, 0 when nothing is dropped) — the canonical
    decrement step, so summed partials under-count each item by at most
    the sum of per-batch offsets ≤ N_total/(cap+1)."""
    n = len(counts)
    if n <= cap:
        return counts.copy(), 0
    kth = np.partition(counts, n - cap - 1)[n - cap - 1]
    adj = counts - kth
    adj[adj < 0] = 0
    return adj, int(kth)


# ------------------------------------------------------------ Bloom filter

def bloom_params(n_keys: int, bits_per_key: int = 10) -> tuple[int, int]:
    """(m_bits rounded to a byte multiple, k hash functions) for ~1%
    false positives at 10 bits/key (k = round(m/n * ln 2))."""
    m = max(64, n_keys * bits_per_key)
    m = (m + 7) // 8 * 8
    k = max(1, int(round(m / max(n_keys, 1) * 0.6931)))
    return m, min(k, 8)


def _bloom_positions(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(keys) * k) bit positions via double hashing h1 + i*h2
    (Kirsch & Mitzenmacher 2006: two mixes suffice for k functions)."""
    u = keys.astype(np.uint64)
    h1 = mix64(u)
    h2 = mix64(u ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m)).reshape(-1).astype(np.int64)


def bloom_build(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """uint8 bitmap (m/8 bytes) with all of ``keys`` inserted —
    vectorized; partial bitmaps from disjoint key sets merge with |."""
    pos = _bloom_positions(keys, m, k)
    bits = np.zeros(m // 8, dtype=np.uint8)
    np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits


def bloom_contains(bits: np.ndarray, keys: np.ndarray, k: int) -> np.ndarray:
    """Boolean membership mask (true = POSSIBLY present — ~1% false
    positives at 10 bits/key; never false negatives)."""
    m = len(bits) * 8
    pos = _bloom_positions(keys, m, k).reshape(len(keys), k)
    hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return hit.all(axis=1)
