"""Persistent dedup index: build on snapshot A, probe snapshot B — the
incremental cross-snapshot near-dup workflow (stages/index.py). Oracle =
exact cross-half n-gram Jaccard (the same O(n²) discipline as
test_oracle_n2.py, restricted to A×B pairs)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sick_ray.config import DedupConfig
from sick_ray.stages.index import (
    build_dedup_index,
    load_index_manifest,
    probe_dedup_index,
    segment_cross_pairs,
)


def test_segment_cross_pairs_unit():
    # buckets: [A: 2 old, 2 new], [B: 1 old, 0 new], [C: 0 old, 2 new]
    bkt = np.array([1, 1, 1, 1, 2, 3, 3])
    side = np.array([0, 0, 1, 1, 0, 1, 1])
    oi, ni, tp, tb = segment_cross_pairs(bkt, side, cap=100)
    got = sorted(zip(oi.tolist(), ni.tolist()))
    assert got == [(0, 2), (0, 3), (1, 2), (1, 3)]
    assert tp == 0 and tb == 0
    # cap truncation is counted
    oi, ni, tp, tb = segment_cross_pairs(bkt, side, cap=3)
    assert len(oi) == 3 and tp == 1 and tb == 1
    # empty
    z = np.empty(0, dtype=np.int64)
    oi, ni, tp, tb = segment_cross_pairs(z, z, cap=4)
    assert len(oi) == 0 and tp == 0 and tb == 0


@pytest.fixture(scope="module")
def halves(ray_session, tmp_path_factory):
    from sick_ray.synth import materialize_corpus

    root = materialize_corpus(400, seed=7)
    tbl = pq.read_table(os.path.join(root, "webtext.parquet"),
                        columns=["url", "text"])
    idx = np.arange(tbl.num_rows)
    a = tbl.take(pa.array(idx[idx % 2 == 0]))
    b = tbl.take(pa.array(idx[idx % 2 == 1]))
    return a, b


def _exact_cross_pairs(a: pa.Table, b: pa.Table, jmin: float):
    """(fp_a, fp_b) of every A×B pair with exact shingle Jaccard ≥ jmin."""
    from sick_ray.functions.ngram import jaccard_sorted, shingle_hash_sets
    from sick_ray.xxh import xxh64_strings

    ta = [t or "" for t in a.column("text").to_pylist()]
    tb = [t or "" for t in b.column("text").to_pylist()]
    sa = shingle_hash_sets(ta, k=5)
    sb = shingle_hash_sets(tb, k=5)
    fa = xxh64_strings(a.column("text")).view(np.int64)
    fb = xxh64_strings(b.column("text")).view(np.int64)
    out = set()
    for i in range(len(ta)):
        for j in range(len(tb)):
            la, lb = len(sa[i]), len(sb[j])
            if min(la, lb) == 0 or min(la, lb) / max(la, lb) < jmin:
                continue
            if jaccard_sorted(sa[i], sb[j]) >= jmin:
                out.add((int(fa[i]), int(fb[j])))
    return out


def test_index_build_probe_recall(halves, tmp_path):
    import ray.data as rd

    a, b = halves
    cfg = DedupConfig(minhash_concurrency=2, num_partitions=8)
    idx_dir = str(tmp_path / "idx")
    man = build_dedup_index(rd.from_arrow(a), idx_dir, cfg)
    assert man["n_docs_indexed"] > 0
    assert load_index_manifest(idx_dir)["num_perm"] == cfg.num_perm

    counters = {}
    pairs = probe_dedup_index(rd.from_arrow(b), idx_dir, cfg,
                              counters=counters).to_pandas()
    found = set(zip(pairs["u"].astype(np.int64),
                    pairs["v"].astype(np.int64)))
    want = _exact_cross_pairs(a, b, jmin=0.9)
    assert want, "fixture must contain cross-half near-dups"
    missed = want - found
    assert not missed, f"missed {len(missed)} of {len(want)} J>=0.9 pairs"
    assert counters["truncated_pairs"] == 0
    # precision floor: every verified pair must be genuinely similar
    # (est threshold 0.72 admits some sub-0.9 pairs; none should be junk)
    from sick_ray.functions.ngram import jaccard_sorted, shingle_hash_sets
    from sick_ray.xxh import xxh64_strings

    fa = xxh64_strings(a.column("text")).view(np.int64)
    fb = xxh64_strings(b.column("text")).view(np.int64)
    sa = dict(zip(fa.tolist(),
                  shingle_hash_sets([t or "" for t in a.column("text").to_pylist()], k=5)))
    sb = dict(zip(fb.tolist(),
                  shingle_hash_sets([t or "" for t in b.column("text").to_pylist()], k=5)))
    for u, v in found:
        j = jaccard_sorted(sa[u], sb[v])
        assert j >= 0.5, f"verified pair with exact J={j:.2f}"


def test_probe_partition_invariance(halves, tmp_path):
    import ray.data as rd

    a, b = halves
    cfg8 = DedupConfig(minhash_concurrency=2, num_partitions=8)
    idx_dir = str(tmp_path / "idx")
    build_dedup_index(rd.from_arrow(a), idx_dir, cfg8)
    p8 = probe_dedup_index(rd.from_arrow(b), idx_dir, cfg8).to_pandas()
    cfg3 = DedupConfig(minhash_concurrency=2, num_partitions=3)
    p3 = probe_dedup_index(rd.from_arrow(b), idx_dir, cfg3).to_pandas()
    s8 = set(zip(p8["u"], p8["v"]))
    s3 = set(zip(p3["u"], p3["v"]))
    assert s8 == s3


def test_probe_config_mismatch_raises(halves, tmp_path):
    import ray.data as rd

    a, b = halves
    cfg = DedupConfig(minhash_concurrency=2, num_partitions=8)
    idx_dir = str(tmp_path / "idx")
    build_dedup_index(rd.from_arrow(a), idx_dir, cfg)
    bad = DedupConfig(minhash_concurrency=2, num_partitions=8, shingle_k=4)
    with pytest.raises(ValueError, match="config mismatch"):
        probe_dedup_index(rd.from_arrow(b), idx_dir, bad)


def test_probe_no_dups_is_empty(ray_session, tmp_path):
    import ray.data as rd

    cfg = DedupConfig(minhash_concurrency=2, num_partitions=4)
    a = pa.table({"text": [f"alpha bravo charlie delta echo foxtrot {i} "
                           f"golf hotel india juliet kilo lima" for i in range(20)]})
    b = pa.table({"text": [f"zulu yankee xray whiskey victor uniform {i} "
                           f"tango sierra romeo quebec papa oscar" for i in range(20)]})
    idx_dir = str(tmp_path / "idx")
    build_dedup_index(rd.from_arrow(a), idx_dir, cfg)
    pairs = probe_dedup_index(rd.from_arrow(b), idx_dir, cfg).to_pandas()
    assert len(pairs) == 0


def test_extend_index_idempotent_and_probeable(halves, tmp_path):
    import ray.data as rd

    from sick_ray.stages.index import extend_dedup_index

    a, b = halves
    cfg = DedupConfig(minhash_concurrency=2, num_partitions=8)
    idx_dir = str(tmp_path / "idx")
    man0 = build_dedup_index(rd.from_arrow(a), idx_dir, cfg)

    # extending with the SAME snapshot adds nothing (content-addressed)
    again = extend_dedup_index(rd.from_arrow(a), idx_dir, cfg)
    assert again["n_docs_added"] == 0
    assert load_index_manifest(idx_dir)["n_docs_indexed"] == man0["n_docs_indexed"]

    # extend with B: only fps absent from A are appended
    from sick_ray.xxh import xxh64_strings

    fa = set(np.unique(xxh64_strings(a.column("text")).view(np.int64)).tolist())
    fb = np.unique(xxh64_strings(b.column("text")).view(np.int64))
    expect_added = int(np.sum([f not in fa for f in fb.tolist()]))
    ext = extend_dedup_index(rd.from_arrow(b), idx_dir, cfg)
    assert ext["n_docs_added"] == expect_added
    assert ext["n_docs_indexed"] == man0["n_docs_indexed"] + expect_added

    # probing B against the extended index finds every B doc as its own
    # exact match (u == v), i.e. the appended rows are really live
    pairs = probe_dedup_index(rd.from_arrow(b), idx_dir, cfg).to_pandas()
    self_matches = set(pairs.loc[pairs["u"] == pairs["v"], "u"].astype(np.int64))
    assert set(fb.tolist()) <= self_matches

    # config mismatch guard applies to extend too
    bad = DedupConfig(minhash_concurrency=2, num_partitions=8, seed=9)
    with pytest.raises(ValueError, match="config mismatch"):
        extend_dedup_index(rd.from_arrow(b), idx_dir, bad)


def test_rebuild_replaces_not_appends(halves, tmp_path):
    import ray.data as rd

    a, _ = halves
    cfg = DedupConfig(minhash_concurrency=2, num_partitions=8)
    idx_dir = str(tmp_path / "idx")
    m1 = build_dedup_index(rd.from_arrow(a), idx_dir, cfg)
    m2 = build_dedup_index(rd.from_arrow(a), idx_dir, cfg)  # rebuild
    assert m2["n_docs_indexed"] == m1["n_docs_indexed"]
    sigs = pq.read_table(os.path.join(idx_dir, "signatures"))
    assert sigs.num_rows == m1["n_docs_indexed"]  # no doubled rows


def test_build_with_renamed_text_col(ray_session, tmp_path):
    import ray.data as rd

    cfg = DedupConfig(minhash_concurrency=2, num_partitions=4)
    a = pa.table({"body": [f"one two three four five six {i} seven eight"
                           for i in range(10)]})
    idx_dir = str(tmp_path / "idx")
    man = build_dedup_index(rd.from_arrow(a), idx_dir, cfg, text_col="body")
    assert man["n_docs_indexed"] == 10
    pairs = probe_dedup_index(rd.from_arrow(a), idx_dir, cfg,
                              text_col="body").to_pandas()
    # self-probe: every doc at least matches itself
    assert (pairs["u"] == pairs["v"]).sum() == 10


def test_extend_crash_between_writes_is_self_healing(halves, tmp_path,
                                                     monkeypatch):
    """The docstring's crash-safety claim, enforced: kill extend AFTER the
    bucket append but BEFORE the signature append — a retry must still
    add the snapshot's fps (the existing-fp filter reads signatures), and
    a probe afterwards must behave as if the crash never happened
    (duplicate bucket rows dedupe in the probe's first-mask)."""
    import ray.data as rd

    import sick_ray.stages.index as idx
    from sick_ray.stages.index import extend_dedup_index

    a, b = halves
    cfg = DedupConfig(minhash_concurrency=2, num_partitions=8)
    idx_dir = str(tmp_path / "idx")
    build_dedup_index(rd.from_arrow(a), idx_dir, cfg)

    # crash injection: extend writes buckets FIRST, then signatures —
    # fail the signatures write once (buckets land, signatures don't)
    real_write = rd.Dataset.write_parquet
    state = {"fired": False}

    def flaky_write(self, path, *args, **kw):
        if "signatures" in str(path) and not state["fired"]:
            state["fired"] = True
            raise RuntimeError("injected crash before signatures write")
        return real_write(self, path, *args, **kw)

    n_before = load_index_manifest(idx_dir)["n_docs_indexed"]
    monkeypatch.setattr(rd.Dataset, "write_parquet", flaky_write)
    with pytest.raises(RuntimeError, match="injected crash"):
        extend_dedup_index(rd.from_arrow(b), idx_dir, cfg)
    monkeypatch.setattr(rd.Dataset, "write_parquet", real_write)
    assert state["fired"], "injection never reached the signatures write"

    # manifest unbumped: the index still reads as the pre-extend snapshot
    assert load_index_manifest(idx_dir)["n_docs_indexed"] == n_before

    # retry succeeds and the extended index is fully probeable
    ext = extend_dedup_index(rd.from_arrow(b), idx_dir, cfg)
    assert ext["n_docs_added"] > 0
    from sick_ray.xxh import xxh64_strings

    fb = np.unique(xxh64_strings(b.column("text")).view(np.int64))
    pairs = probe_dedup_index(rd.from_arrow(b), idx_dir, cfg).to_pandas()
    self_matches = set(pairs.loc[pairs["u"] == pairs["v"], "u"].astype(np.int64))
    assert set(fb.tolist()) <= self_matches


def test_add_fp_text_collision_raises(ray_session, tmp_path):
    """A corpus carrying BOTH the caller's text_col and a literal "text"
    column would end up with two "text" columns after the conform rename
    — refuse loudly instead (ADVICE r3)."""
    import ray.data as rd

    cfg = DedupConfig(minhash_concurrency=2, num_partitions=4)
    a = pa.table({
        "body": [f"one two three four five six {i}" for i in range(6)],
        "text": ["clash"] * 6,
    })
    with pytest.raises(Exception, match="text"):
        build_dedup_index(rd.from_arrow(a), str(tmp_path / "idx"), cfg,
                          text_col="body")


def test_extend_join_path_matches_broadcast(halves, tmp_path, monkeypatch):
    """Force the past-BROADCAST_SIG_LIMIT anti-join path on extend and
    assert the resulting index is identical to the broadcast path's —
    same appended fp set, same manifest count."""
    import ray.data as rd

    import sick_ray.shuffle as sh
    import sick_ray.stages.index as ix
    from sick_ray.stages.index import extend_dedup_index

    a, b = halves
    cfg = DedupConfig(minhash_concurrency=2, num_partitions=8)

    d_bcast = str(tmp_path / "idx_bcast")
    build_dedup_index(rd.from_arrow(a), d_bcast, cfg)
    m_bcast = extend_dedup_index(rd.from_arrow(b), d_bcast, cfg)

    d_join = str(tmp_path / "idx_join")
    build_dedup_index(rd.from_arrow(a), d_join, cfg)
    monkeypatch.setattr(ix, "BROADCAST_SIG_LIMIT", 0)   # force anti_select
    monkeypatch.setattr(sh, "BROADCAST_KEYS_LIMIT", 0)  # ... its join path
    m_join = extend_dedup_index(rd.from_arrow(b), d_join, cfg)

    assert m_join["n_docs_added"] == m_bcast["n_docs_added"]
    assert m_join["n_docs_indexed"] == m_bcast["n_docs_indexed"]
    fps_b = set(pq.read_table(os.path.join(d_bcast, "signatures"),
                              columns=["fp64"])["fp64"].to_pylist())
    fps_j = set(pq.read_table(os.path.join(d_join, "signatures"),
                              columns=["fp64"])["fp64"].to_pylist())
    assert fps_b == fps_j
    # extending the join-path index AGAIN with b adds nothing (idempotent
    # through the anti-join path too)
    again = extend_dedup_index(rd.from_arrow(b), d_join, cfg)
    assert again["n_docs_added"] == 0


def test_probe_salted_matches_unsalted(halves, tmp_path):
    """Grid-salting the probe's bucket shuffle (hot_bucket_threshold=1 →
    every ≥2-row bucket scatters into the g×g cell grid) must yield the
    exact same verified pair set as the unsalted probe — every old×new
    pair meets in exactly one cell."""
    import ray.data as rd

    a, b = halves
    idx_dir = str(tmp_path / "idx")
    cfg = DedupConfig(minhash_concurrency=2, num_partitions=8)
    build_dedup_index(rd.from_arrow(a), idx_dir, cfg)

    base = probe_dedup_index(rd.from_arrow(b), idx_dir, cfg).to_pandas()
    hot_cfg = DedupConfig(minhash_concurrency=2, num_partitions=8,
                          hot_bucket_threshold=1)
    salted = probe_dedup_index(rd.from_arrow(b), idx_dir, hot_cfg).to_pandas()
    assert set(zip(base["u"], base["v"])) == set(zip(salted["u"], salted["v"]))
