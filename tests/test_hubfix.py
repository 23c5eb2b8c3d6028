"""Hub-failure regression (ADVICE r1): with hub-spoke star emission, two
near-duplicates in a bucket were never linked when the bucket's first
member was dissimilar to both. All-pairs emission (shuffle.segment_pairs)
must link them; oversized buckets fall back to star+chain with COUNTED
truncation surfaced into the stage manifest."""

import json
import os

import numpy as np
import pyarrow as pa

from sick_ray.config import DedupConfig
from sick_ray.shuffle import segment_pairs


# ------------------------------------------------------------ segment_pairs

def test_segment_pairs_all_pairs_small_groups():
    keys = np.array([1, 1, 1, 2, 2, 3])
    i, j, tp, tg = segment_pairs(keys, cap=100)
    got = set(zip(i.tolist(), j.tolist()))
    assert got == {(0, 1), (0, 2), (1, 2), (3, 4)}
    assert tp == 0 and tg == 0


def test_segment_pairs_big_group_star_chain():
    keys = np.zeros(10, dtype=np.int64)  # C(10,2)=45 > cap=10
    i, j, tp, tg = segment_pairs(keys, cap=10)
    got = set(zip(i.tolist(), j.tolist()))
    star = {(0, k) for k in range(1, 10)}
    chain = {(k, k + 1) for k in range(1, 9)}
    assert got == star | chain
    assert tp == 45 - 17 and tg == 1


def test_segment_pairs_empty():
    i, j, tp, tg = segment_pairs(np.empty(0, dtype=np.int64), cap=10)
    assert len(i) == 0 and len(j) == 0 and tp == 0 and tg == 0


# --------------------------------------------------------------- simhash hub

def test_simhash_hub_failure_fixed(ray_session):
    """ids 1,2 differ by 1 bit; the bucket's min id (0) differs from both
    by ~10 bits in the only non-shared block → star emission found zero
    edges; all-pairs must find (1, 2)."""
    import ray.data as rd

    from sick_ray.functions.simhash import simhash_edges

    u_sig = np.uint64(0)
    v_sig = np.uint64(1)                    # hamming(u, v) = 1
    hub_sig = np.uint64(0b1111111111)       # 10 bits, all in block 0
    tbl = pa.table(
        {
            "fp64": pa.array([0, 1, 2], type=pa.int64()),
            "simhash": pa.array(
                np.array([hub_sig, u_sig, v_sig]).view(np.int64), type=pa.int64()
            ),
        }
    )
    edges = simhash_edges(rd.from_arrow(tbl), max_hamming=3).to_pandas()
    pairs = {(min(a, b), max(a, b)) for a, b in zip(edges["u"], edges["v"])}
    assert (1, 2) in pairs
    assert not any(0 in p for p in pairs)   # hub similar to neither


# ------------------------------------------------------------ LSH minhash hub

def test_lsh_hub_failure_fixed(ray_session):
    """Signatures constructed so A and B share band 0 with hub H (same
    bucket), est-Jaccard(A,B)=0.92 ≥ threshold but est(H,·)≈0.06 — star
    edges (H,A),(H,B) both failed verification and (A,B) was lost."""
    import ray
    import ray.data as rd

    from sick_ray.stages.lsh import (
        build_sig_lookup,
        candidate_edges,
        distinct_edges,
        verify_edges_broadcast,
    )
    from sick_ray.stages.minhash import band_hashes

    cfg = DedupConfig(num_partitions=4)
    sig_a = np.full(128, 5, dtype=np.uint32)
    sig_b = sig_a.copy()
    sig_b[-10:] = 77                        # est J = 118/128 ≈ 0.92
    sig_h = np.full(128, 9, dtype=np.uint32)
    sig_h[:8] = 5                           # band 0 identical → same bucket
    sigs = np.stack([sig_h, sig_a, sig_b])  # H gets min fp64 → bucket first
    bh = band_hashes(sigs, cfg.bands, cfg.rows_per_band)
    tbl = pa.table(
        {
            "fp64": pa.array([10, 20, 30], type=pa.int64()),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1), type=pa.uint32()), 128
            ),
            "band_hash": pa.FixedSizeListArray.from_arrays(
                pa.array(bh.reshape(-1).view(np.int64), type=pa.int64()), cfg.bands
            ),
        }
    )
    ds = rd.from_arrow(tbl)
    edges = distinct_edges(candidate_edges(ds, cfg), cfg)
    ref = ray.put(build_sig_lookup(tbl.select(["fp64", "sig"]), cfg.num_perm))
    verified = verify_edges_broadcast(edges, ref, cfg.verify_threshold).to_pandas()
    pairs = {(min(a, b), max(a, b)) for a, b in zip(verified["u"], verified["v"])}
    assert (20, 30) in pairs
    assert not any(10 in p for p in pairs)


# ------------------------------------------------------------- cap counters

def test_truncation_counters_in_manifest(ray_session, tmp_path):
    """A mega-bucket corpus with a tiny cap must surface nonzero
    truncated_pairs/truncated_buckets counters in the edges manifest."""
    import ray.data as rd

    from sick_ray.pipelines.dedup import run_dedup

    n = 40
    rows = [(f"https://t/{i}", "alpha beta gamma delta epsilon zeta eta theta " * 6)
            for i in range(n)]
    ts = [1735689600_000_000 + i * 1_000_000 for i in range(n)]
    tbl = pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array([None] * n, type=pa.binary()),
            "text": pa.array([f"unique{i} " + r[1] for i, r in enumerate(rows)]),
            "lang": pa.array(["en"] * n),
        }
    )
    cfg = DedupConfig(
        minhash_concurrency=1, num_partitions=4, max_pairs_per_bucket=3,
        hot_bucket_threshold=10_000_000,  # no salting: keep one mega-bucket
    )
    out = str(tmp_path / "ckpt")
    run_dedup(rd.from_arrow(tbl), cfg, out_dir=out)
    man = json.load(open(os.path.join(out, "edges", "_MANIFEST.json")))
    assert man["counters"]["truncated_pairs"] > 0
    assert man["counters"]["truncated_buckets"] > 0
