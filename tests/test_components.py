"""Distributed connected components (alternating large-star/small-star):
the scale path must label identically to the driver union-find with NO
per-node driver state, across partitionings, on adversarial graph shapes."""

import numpy as np
import pyarrow as pa
import pytest

from sick_ray.config import DedupConfig
from sick_ray.stages.components import connected_components, star_components


def _labels_map(ds):
    df = ds.to_pandas()
    if len(df) == 0:
        return {}
    return dict(zip(df["fp64"], df["cluster_id"]))


def _edges_ds(pairs, blocks=7):
    import ray.data as rd

    u = pa.array([p[0] for p in pairs], type=pa.int64())
    v = pa.array([p[1] for p in pairs], type=pa.int64())
    return rd.from_arrow(pa.table({"u": u, "v": v})).repartition(blocks)


def _expected(pairs):
    """Brute-force min-label components."""
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {n: find(n) for n in parent if find(n) != n}


CFG_STAR = DedupConfig(driver_uf_max_edges=0, single_task_cc_max_edges=0,
                       num_partitions=8, minhash_concurrency=1)
CFG_TASK = DedupConfig(driver_uf_max_edges=0, num_partitions=8,
                       minhash_concurrency=1)   # routes to the one-task tier
CFG_DRIVER = DedupConfig(num_partitions=8, minhash_concurrency=1)


def test_star_chain_multishard(ray_session):
    # worst case for label propagation: one long chain spread over blocks
    pairs = [(i + 1, i) for i in range(200)] + [(1000 + i, 1001 + i) for i in range(50)]
    got = _labels_map(connected_components(_edges_ds(pairs), CFG_STAR))
    assert got == _expected(pairs)


def test_star_matches_driver_random(ray_session):
    rng = np.random.default_rng(7)
    # clustered random graph: 40 clusters with random internal edges
    pairs = []
    for c in range(40):
        members = rng.integers(0, 1 << 40, size=rng.integers(2, 12))
        for m in members[1:]:
            other = members[rng.integers(0, len(members))]
            if m != other:
                pairs.append((int(m), int(other)))
    star = _labels_map(connected_components(_edges_ds(pairs, blocks=13), CFG_STAR))
    driver = _labels_map(connected_components(_edges_ds(pairs, blocks=3), CFG_DRIVER))
    assert star == driver == _expected(pairs)


def test_star_self_loops_and_dups(ray_session):
    pairs = [(5, 5), (1, 2), (2, 1), (1, 2), (9, 9)]
    got = _labels_map(connected_components(_edges_ds(pairs, blocks=2), CFG_STAR))
    assert got == {2: 1}


def test_star_empty(ray_session):
    got = _labels_map(connected_components(_edges_ds([], blocks=1), CFG_STAR))
    assert got == {}


@pytest.mark.parametrize("blocks", [1, 5, 17])
def test_star_partition_invariance(ray_session, blocks):
    pairs = [(i % 37, (i * 7) % 37 + 100) for i in range(300)]
    got = _labels_map(star_components(_edges_ds(pairs, blocks=blocks), CFG_STAR))
    assert got == _expected(pairs)


def test_pipeline_forced_star_path(ray_session, small_corpus):
    """End-to-end dedup with driver_uf_max_edges=0 must produce identical
    clusters to the default driver-fold path."""
    import os

    from sick_ray.pipelines.dedup import run_dedup

    path = os.path.join(small_corpus, "webtext.parquet")
    a = run_dedup(path, CFG_DRIVER).clusters.to_pandas()
    b = run_dedup(path, CFG_STAR).clusters.to_pandas()
    ma = dict(zip(a["url"], a["cluster_id"]))
    mb = dict(zip(b["url"], b["cluster_id"]))
    assert ma == mb


def test_single_task_tier_matches_driver_and_star(ray_session):
    """The middle tier (one vectorized remote task) must agree exactly
    with both the driver union-find and the star rounds."""
    rng = np.random.default_rng(11)
    pairs = []
    for c in range(60):
        members = rng.integers(0, 1 << 40, size=rng.integers(2, 9))
        for m in members[1:]:
            other = members[rng.integers(0, len(members))]
            if m != other:
                pairs.append((int(m), int(other)))
    pairs += [(i + 1, i) for i in range(300)]        # one long chain
    task = _labels_map(connected_components(_edges_ds(pairs, blocks=9), CFG_TASK))
    star = _labels_map(connected_components(_edges_ds(pairs, blocks=4), CFG_STAR))
    driver = _labels_map(connected_components(_edges_ds(pairs, blocks=2), CFG_DRIVER))
    assert task == star == driver == _expected(pairs)


def test_single_task_tier_edge_cases(ray_session):
    assert _labels_map(connected_components(_edges_ds([], blocks=1), CFG_TASK)) == {}
    got = _labels_map(connected_components(
        _edges_ds([(5, 5), (1, 2), (2, 1), (9, 9)], blocks=2), CFG_TASK))
    assert got == {2: 1}
