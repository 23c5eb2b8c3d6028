"""xxHash64 correctness: published vectors + scalar/batch equivalence."""

import numpy as np
import pyarrow as pa
import pytest

from sick_ray.xxh import xxh64, xxh64_batch, xxh64_strings

# Published XXH64 test vectors (xxHash reference repo / widely mirrored).
VECTORS = [
    (b"", 0, 0xEF46DB3751D8E999),
    (b"a", 0, 0xD24EC4F1A98C6E5B),
    (b"abc", 0, 0x44BC2CF5AD770999),
    (b"", 1, 0xD5AFBA1336A3BE4B),
]


@pytest.mark.parametrize("data,seed,expect", VECTORS)
def test_scalar_vectors(data, seed, expect):
    assert xxh64(data, seed) == expect


def test_scalar_str_is_utf8():
    assert xxh64("abc") == xxh64(b"abc")
    assert xxh64("héllo") == xxh64("héllo".encode("utf-8"))


def _pack(payloads):
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    lengths = np.array([len(p) for p in payloads], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    return buf, offsets, lengths


def test_batch_matches_scalar_all_lengths():
    rng = np.random.default_rng(7)
    payloads = [bytes(rng.integers(0, 256, size=n, dtype=np.uint8)) for n in range(0, 130)]
    payloads += [bytes(rng.integers(0, 256, size=n, dtype=np.uint8)) for n in (1000, 4097, 65536)]
    buf, off, lens = _pack(payloads)
    for seed in (0, 1, 0xDEADBEEF):
        got = xxh64_batch(buf, off, lens, seed)
        want = np.array([xxh64(p, seed) for p in payloads], dtype=np.uint64)
        assert (got == want).all()


def test_batch_empty():
    assert len(xxh64_batch(np.empty(0, np.uint8), np.empty(0, np.int64), np.empty(0, np.int64))) == 0


def test_strings_pyarrow_zero_copy():
    vals = ["", "a", "abc", "x" * 100, "üñïçôdé ✓" * 20, None, "tail7bytes"[:7]]
    arr = pa.array(vals, type=pa.string())
    got = xxh64_strings(arr)
    want = np.array(
        [xxh64((v or "").encode("utf-8")) for v in vals], dtype=np.uint64
    )
    assert (got == want).all()
    # sliced array (non-zero offset) must still be read correctly
    got2 = xxh64_strings(arr.slice(2, 4))
    assert (got2 == want[2:6]).all()
    # large_string path
    got3 = xxh64_strings(arr.cast(pa.large_string()))
    assert (got3 == want).all()


def test_strings_list_input():
    vals = ["abc", b"abc", None]
    got = xxh64_strings(vals)
    assert got[0] == got[1] == xxh64("abc")
    assert got[2] == xxh64(b"")
