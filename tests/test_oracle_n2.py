"""Full O(n²) Jaccard oracle (SURVEY §5.2): EVERY pair — planted or not —
with J≥0.9 must co-cluster; every co-clustered pair must be genuinely
similar. Complements the planted-pair recall test (which only checks
pairs the generator knows about)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tiny(ray_session):
    from sick_ray.synth import materialize_corpus

    return materialize_corpus(400, seed=7)


def test_full_pairwise_oracle(tiny):
    import ray.data as rd

    from sick_ray.config import DedupConfig
    from sick_ray.functions.ngram import jaccard_sorted, shingle_hash_sets
    from sick_ray.pipelines.dedup import run_dedup

    web = pq.read_table(os.path.join(tiny, "webtext.parquet"))
    urls = web.column("url").to_pylist()
    texts = [t or "" for t in web.column("text").to_pylist()]
    sets = shingle_hash_sets(texts, k=5)

    cfg = DedupConfig(minhash_concurrency=2, num_partitions=8)
    res = run_dedup(rd.read_parquet(os.path.join(tiny, "webtext.parquet")), cfg)
    df = res.clusters.to_pandas()
    cmap = dict(zip(df["url"], df["cluster_id"]))

    n = len(urls)
    missed, n_high = 0, 0
    merged_dissimilar, n_merged = 0, 0
    for i in range(n):
        for j in range(i + 1, n):
            same = cmap[urls[i]] == cmap[urls[j]]
            if same:
                n_merged += 1
            jac = None
            if same or len(sets[i]) and len(sets[j]):
                # only compute J when needed (same cluster, or possibly high)
                if same:
                    jac = jaccard_sorted(sets[i], sets[j])
                    if jac < 0.5:
                        merged_dissimilar += 1
                else:
                    # quick upper bound to skip obviously-distant pairs
                    if min(len(sets[i]), len(sets[j])) * 1.0 / max(
                        1, max(len(sets[i]), len(sets[j]))
                    ) < 0.9:
                        continue
                    jac = jaccard_sorted(sets[i], sets[j])
            if jac is not None and jac >= 0.9:
                n_high += 1
                if not same:
                    missed += 1
    assert n_high > 0
    recall = 1 - missed / n_high
    assert recall >= 0.99, f"O(n²) oracle recall {recall:.4f} ({missed}/{n_high} missed)"
    assert merged_dissimilar == 0, (
        f"{merged_dissimilar}/{n_merged} co-clustered pairs have J<0.5"
    )
