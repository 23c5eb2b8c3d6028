"""Unit tests for the two-phase shuffle helpers + property tests."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from sick_ray.shuffle import combine_keys, first_mask, group_ids, mix64, sort_index


def test_first_mask_and_group_ids():
    ks = np.array([1, 1, 2, 2, 2, 5])
    fm = first_mask(ks)
    assert fm.tolist() == [True, False, True, False, False, True]
    assert group_ids(ks).tolist() == [0, 0, 1, 1, 1, 2]


def test_sort_index_msb_first():
    a = np.array([2, 1, 1, 2])
    b = np.array([0, 9, 1, 3])
    order = sort_index(a, b)
    assert [(a[i], b[i]) for i in order] == [(1, 1), (1, 9), (2, 0), (2, 3)]


def test_mix64_uniformity_rough():
    x = mix64(np.arange(100_000, dtype=np.uint64))
    parts = (x % np.uint64(64)).astype(np.int64)
    counts = np.bincount(parts, minlength=64)
    assert counts.min() > 100_000 / 64 * 0.9  # sequential keys spread evenly


def test_combine_keys_strings_and_ints():
    t = pa.table({"a": [1, 1, 2], "b": ["x", "y", "x"]})
    k = combine_keys(t, ["a", "b"])
    assert k[0] != k[1] and k[0] != k[2] and k[1] != k[2]
    k2 = combine_keys(t, ["a", "b"])
    assert (k == k2).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=30),
       st.integers(min_value=0, max_value=2**32 - 1))
def test_xxh_batch_property(payloads, seed):
    from sick_ray.xxh import xxh64, xxh64_batch

    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    lens = np.array([len(p) for p in payloads], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    got = xxh64_batch(buf, offs, lens, seed)
    want = [xxh64(p, seed) for p in payloads]
    assert got.tolist() == want


@settings(max_examples=20, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_suffix_array_property(data):
    from sick_ray.stages.suffix import suffix_array

    s = np.frombuffer(data, dtype=np.uint8)
    sa = suffix_array(s)
    want = sorted(range(len(data)), key=lambda i: data[i:])
    assert sa.tolist() == want


def test_semi_select_paths_agree(ray_session, monkeypatch):
    """Broadcast path, plain join path, and bloom-prefiltered join path
    must select the identical row set; the bloom pre-filter must never
    drop a true match (no false negatives)."""
    import ray.data as rd

    import sick_ray.shuffle as sh

    rng = np.random.default_rng(11)
    inp = pa.table({
        "fp": pa.array(rng.permutation(np.arange(5000)), type=pa.int64()),
        "payload": pa.array([f"p{i}" for i in range(5000)]),
    })
    keys = pa.table({"fp": pa.array(np.arange(0, 5000, 7), type=pa.int64())})
    input_ds = rd.from_arrow(inp)
    keys_ds = rd.from_arrow(keys)

    want = set(range(0, 5000, 7))

    got_bcast = sh.semi_select(input_ds, keys_ds, "fp", 4).to_pandas()
    assert set(got_bcast["fp"]) == want

    monkeypatch.setattr(sh, "BROADCAST_KEYS_LIMIT", 10)   # force join path
    got_bloom = sh.semi_select(input_ds, keys_ds, "fp", 4).to_pandas()
    assert set(got_bloom["fp"]) == want
    got_plain = sh.semi_select(
        input_ds, keys_ds, "fp", 4, bloom_prefilter=False
    ).to_pandas()
    assert set(got_plain["fp"]) == want

    # string keys: hashed into the bloom via xxh64 on both sides — this
    # is the production shape (duplicate_spans keys on url)
    inp_s = rd.from_arrow(pa.table({
        "url": pa.array([f"doc://{i}" for i in range(3000)]),
        "payload": pa.array([f"p{i}" for i in range(3000)]),
    }))
    keys_s = rd.from_arrow(pa.table({
        "url": pa.array([f"doc://{i}" for i in range(0, 3000, 5)]),
    }))
    got_s = sh.semi_select(inp_s, keys_s, "url", 4).to_pandas()
    assert set(got_s["url"]) == {f"doc://{i}" for i in range(0, 3000, 5)}


def test_attach_dim_paths_agree(ray_session, monkeypatch):
    """attach_dim broadcast (plasma lookup + searchsorted) and join paths
    must produce the identical attached table, including inner-join drops
    of unmatched fact rows; key name conflicts (key_col != on) must not
    leak the dimension key column."""
    import pandas as pd
    import ray.data as rd

    import sick_ray.shuffle as sh

    rng = np.random.default_rng(4)
    fact = pa.table({
        "k": pa.array(rng.integers(0, 120, size=2000), type=pa.int64()),
        "x": pa.array(np.arange(2000), type=pa.int64()),
    })
    dim = pa.table({
        "dk": pa.array(np.arange(0, 100), type=pa.int64()),       # 100..119 unmatched
        "name": pa.array([f"n{i % 7}" for i in range(100)]),
    })
    fact_ds, dim_ds = rd.from_arrow(fact), rd.from_arrow(dim)

    def run():
        out = sh.attach_dim(fact_ds, dim_ds, on="k", key_col="dk",
                            val_col="name", num_partitions=4).to_pandas()
        assert "dk" not in out.columns
        return out.sort_values(["x"]).reset_index(drop=True)[["k", "x", "name"]]

    got_bcast = run()
    # inner semantics: every surviving key has a dimension row
    assert (got_bcast["k"] < 100).all()
    want = {int(r.dk): r.name for r in
            dim.to_pandas().itertuples()}
    assert all(want[int(k)] == n for k, n in
               zip(got_bcast["k"], got_bcast["name"]))

    monkeypatch.setattr(sh, "BROADCAST_KEYS_LIMIT", 10)   # force join path
    got_join = run()
    pd.testing.assert_frame_equal(got_bcast, got_join)


def test_anti_select_paths_agree(ray_session, monkeypatch):
    """anti_select (the extend path's existing-fp filter at scale) must
    keep exactly the non-members on every path: broadcast set-diff,
    plain left-anti join, and the bloom-split join (a bloom MISS keeps a
    row without shuffling; bloom false positives must be re-checked by
    the join, never dropped)."""
    import ray.data as rd

    import sick_ray.shuffle as sh

    rng = np.random.default_rng(13)
    perm = rng.permutation(np.arange(5000))
    inp = pa.table({
        "fp": pa.array(perm, type=pa.int64()),
        "payload": pa.array([f"p{v}" for v in perm]),
    })
    keys = pa.table({"fp": pa.array(np.arange(0, 5000, 7), type=pa.int64())})
    input_ds = rd.from_arrow(inp).materialize()
    keys_ds = rd.from_arrow(keys)

    want = set(range(5000)) - set(range(0, 5000, 7))

    got_bcast = sh.anti_select(input_ds, keys_ds, "fp", 4).to_pandas()
    assert set(got_bcast["fp"]) == want
    # payload survives untouched on the kept rows
    assert (got_bcast["payload"] == "p" + got_bcast["fp"].astype(str)).all()

    monkeypatch.setattr(sh, "BROADCAST_KEYS_LIMIT", 10)   # force join path
    got_bloom = sh.anti_select(input_ds, keys_ds, "fp", 4).to_pandas()
    assert set(got_bloom["fp"]) == want
    got_plain = sh.anti_select(
        input_ds, keys_ds, "fp", 4, bloom_prefilter=False
    ).to_pandas()
    assert set(got_plain["fp"]) == want

    # empty key set keeps everything (and short-circuits)
    empty = rd.from_arrow(pa.table({"fp": pa.array([], type=pa.int64())}))
    got_empty = sh.anti_select(input_ds, empty, "fp", 4).to_pandas()
    assert set(got_empty["fp"]) == set(range(5000))
