"""xxHash64 — pure-Python scalar + NumPy batch implementation.

The reference engine content-addresses values with a 32-bit string hash
(``CBFHash``, json-sick-scala ``izumi/sick/tools/CBFHash.scala:6-20``; C#
``KHash`` in ``SickSharp/Format/Tables/ObjTable.cs:33-44``). For a
distribution-safe engine we need a 64-bit fingerprint that is stable across
processes and nodes, so we implement xxHash64 (public algorithm spec,
https://github.com/Cyan4973/xxHash — XXH64) from scratch: no xxhash wheel is
available in this environment.

Two implementations:

- ``xxh64(data, seed)``: scalar, pure Python ints. Reference implementation,
  validated against published test vectors.
- ``xxh64_batch(buf, offsets, lengths, seed)``: NumPy-vectorized across many
  byte strings at once. The 32-byte stripe loop is sequential *within* a
  string but independent *across* strings, so the batch version iterates
  Python-side only ``max_stripes`` times while processing every active string
  per iteration with uint64 array ops (wraparound semantics match C).

``xxh64_strings`` is the convenience entry point used by map_batches stages:
it takes a pyarrow StringArray / BinaryArray (or list of str/bytes) and
returns ``np.ndarray[uint64]``.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF

P1, P2, P3, P4, P5 = U64(_P1), U64(_P2), U64(_P3), U64(_P4), U64(_P5)


# ---------------------------------------------------------------- scalar ----

def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M64


def _merge_round(h: int, acc: int) -> int:
    h ^= _round(0, acc)
    return (h * _P1 + _P4) & _M64


def xxh64(data: bytes | str, seed: int = 0) -> int:
    """Scalar xxHash64 of ``data`` (str is UTF-8 encoded). Returns uint64."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    p = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        limit = n - 32
        while p <= limit:
            v1 = _round(v1, int.from_bytes(data[p : p + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[p + 8 : p + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[p + 16 : p + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[p + 24 : p + 32], "little"))
            p += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while p + 8 <= n:
        k = _round(0, int.from_bytes(data[p : p + 8], "little"))
        h = (_rotl(h ^ k, 27) * _P1 + _P4) & _M64
        p += 8
    if p + 4 <= n:
        h = (
            _rotl(h ^ ((int.from_bytes(data[p : p + 4], "little") * _P1) & _M64), 23)
            * _P2
            + _P3
        ) & _M64
        p += 4
    while p < n:
        h = (_rotl(h ^ ((data[p] * _P5) & _M64), 11) * _P1) & _M64
        p += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ----------------------------------------------------------------- batch ----

_BYTE_W = (U64(1) << (U64(8) * np.arange(8, dtype=np.uint64))).astype(np.uint64)


def _rotl_v(x: np.ndarray, r: int) -> np.ndarray:
    r = U64(r)
    return (x << r) | (x >> (U64(64) - r))


def _round_v(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    return _rotl_v(acc + lane * P2, 31) * P1


def _words_le(buf: np.ndarray, idx: np.ndarray, nbytes: int = 8) -> np.ndarray:
    """Little-endian uint64 words read at byte positions ``idx`` of ``buf``."""
    b = buf[idx[:, None] + np.arange(nbytes)]
    return (b.astype(np.uint64) * _BYTE_W[:nbytes]).sum(axis=1, dtype=np.uint64)


def xxh64_batch(
    buf: np.ndarray, offsets: np.ndarray, lengths: np.ndarray, seed: int = 0
) -> np.ndarray:
    """Vectorized xxHash64 of many strings packed in one uint8 buffer.

    buf: uint8 array of all payloads concatenated; offsets/lengths: int64
    arrays (start, byte length per string). Returns uint64 hashes.
    """
    n = len(offsets)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    offsets = np.asarray(offsets, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    seed_u = U64(seed & _M64)

    h = np.empty(n, dtype=np.uint64)
    big = lengths >= 32
    nstripes = lengths[big] >> 5  # number of full 32B stripes per big string

    if big.any():
        bi = np.flatnonzero(big)
        s64 = seed & _M64
        v = np.empty((4, len(bi)), dtype=np.uint64)
        v[0] = U64((s64 + _P1 + _P2) & _M64)
        v[1] = U64((s64 + _P2) & _M64)
        v[2] = U64(s64)
        v[3] = U64((s64 - _P1) & _M64)
        # sort big strings by stripe count so each loop iteration slices a
        # contiguous "still active" prefix (no fancy masking cost)
        order = np.argsort(nstripes, kind="stable")[::-1]
        bi_s = bi[order]
        ns_s = nstripes[order]
        off_s = offsets[bi_s]
        max_s = int(ns_s[0])
        # active count per stripe s = how many strings have nstripes > s
        for s in range(max_s):
            m = int(np.searchsorted(-ns_s, -(s + 1), side="right"))
            base = off_s[:m] + s * 32
            for lane in range(4):
                w = _words_le(buf, base + lane * 8)
                v[lane, order[:m]] = _round_v(v[lane, order[:m]], w)
        hv = (
            _rotl_v(v[0], 1) + _rotl_v(v[1], 7) + _rotl_v(v[2], 12) + _rotl_v(v[3], 18)
        )
        for lane in range(4):
            hv = (hv ^ _round_v(np.zeros_like(v[lane]), v[lane])) * P1 + P4
        h[bi] = hv
    h[~big] = U64((seed & _M64) + _P5 & _M64)
    h += lengths.astype(np.uint64)

    # ---- tail: up to 31 remaining bytes per string ----
    tail_off = offsets.copy()
    tail_off[big] += nstripes << 5
    tail_len = lengths.copy()
    tail_len[big] -= nstripes << 5
    # up to three 8-byte words
    for k in range(3):
        m = tail_len >= (k + 1) * 8
        if m.any():
            idx = np.flatnonzero(m)
            w = _words_le(buf, tail_off[idx] + k * 8)
            k8 = _round_v(np.zeros_like(w), w)
            h[idx] = _rotl_v(h[idx] ^ k8, 27) * P1 + P4
    consumed = (tail_len >> 3) << 3
    rem = tail_len - consumed
    # one 4-byte word
    m = rem >= 4
    if m.any():
        idx = np.flatnonzero(m)
        w = _words_le(buf, tail_off[idx] + consumed[idx], nbytes=4)
        h[idx] = _rotl_v(h[idx] ^ (w * P1), 23) * P2 + P3
        consumed[idx] += 4
        rem[idx] -= 4
    # up to three single bytes
    for j in range(3):
        m = rem > j
        if m.any():
            idx = np.flatnonzero(m)
            b = buf[tail_off[idx] + consumed[idx] + j].astype(np.uint64)
            h[idx] = _rotl_v(h[idx] ^ (b * P5), 11) * P1

    h ^= h >> U64(33)
    h *= P2
    h ^= h >> U64(29)
    h *= P3
    h ^= h >> U64(32)
    return h


def xxh64_strings(arr, seed: int = 0) -> np.ndarray:
    """xxHash64 per element of a pyarrow String/Binary array (or py list).

    Null elements hash as empty string. Zero-copy path: reads the Arrow
    value buffer + offsets directly, no per-row Python objects.
    """
    import pyarrow as pa

    if isinstance(arr, (list, tuple)):
        pays = [
            (x.encode("utf-8") if isinstance(x, str) else (x or b"")) for x in arr
        ]
        if not pays:
            return np.empty(0, dtype=np.uint64)
        buf = np.frombuffer(b"".join(pays), dtype=np.uint8)
        lengths = np.fromiter((len(p) for p in pays), dtype=np.int64, count=len(pays))
        offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        return xxh64_batch(buf, offsets, lengths, seed)

    if isinstance(arr, pa.ChunkedArray):
        if arr.num_chunks == 1:
            arr = arr.chunk(0)
        else:
            arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    arr_off = arr.offset
    bufs = arr.buffers()
    raw_off = np.frombuffer(bufs[1], dtype=off_dtype)[arr_off : arr_off + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    offsets = raw_off[:-1].astype(np.int64)
    lengths = (raw_off[1:] - raw_off[:-1]).astype(np.int64)
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
        lengths = np.where(valid, lengths, 0)
    return xxh64_batch(data, offsets, lengths, seed)
