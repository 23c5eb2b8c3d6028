"""Checkpoint manifests: resume skips completed stages; results identical.
Determinism: different partitioning / parallelism settings → same output."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest


def _clusters_map(res):
    df = res.clusters.to_pandas()
    return dict(zip(df["url"], df["cluster_id"]))


@pytest.fixture(scope="module")
def corpus_path(small_corpus):
    return os.path.join(small_corpus, "webtext.parquet")


def test_resume_from_manifests(ray_session, corpus_path, tmp_path_factory):
    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.dedup import run_dedup

    out = str(tmp_path_factory.mktemp("ckpt"))
    cfg = DedupConfig(minhash_concurrency=2, num_partitions=8)
    r1 = run_dedup(corpus_path, cfg, out_dir=out)
    m1 = _clusters_map(r1)
    assert all(not e["resumed"] for e in r1.runner_log)
    # manifests exist with per-part lineage
    for stage in ("meta", "canonical", "edges", "clusters"):
        man = json.load(open(os.path.join(out, stage, "_MANIFEST.json")))
        assert man["status"] == "complete"
        assert man["total_rows"] > 0
        assert all("rows" in p and "bytes" in p for p in man["parts"])

    r2 = run_dedup(corpus_path, cfg, out_dir=out)
    assert all(e["resumed"] for e in r2.runner_log), r2.runner_log
    assert _clusters_map(r2) == m1

    # a stage with a broken manifest re-runs (and still matches)
    os.unlink(os.path.join(out, "edges", "_MANIFEST.json"))
    r3 = run_dedup(corpus_path, cfg, out_dir=out)
    resumed = {e["stage"]: e["resumed"] for e in r3.runner_log}
    assert resumed["meta"] and resumed["canonical"]
    assert not resumed["edges"]
    assert _clusters_map(r3) == m1


def test_config_change_invalidates_checkpoint(ray_session, corpus_path, tmp_path_factory):
    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.dedup import run_dedup

    out = str(tmp_path_factory.mktemp("ckpt2"))
    cfg1 = DedupConfig(minhash_concurrency=2, num_partitions=8)
    run_dedup(corpus_path, cfg1, out_dir=out)
    cfg2 = DedupConfig(
        minhash_concurrency=2, num_partitions=8, hot_bucket_threshold=32
    )
    r = run_dedup(corpus_path, cfg2, out_dir=out)
    assert all(not e["resumed"] for e in r.runner_log)


def test_determinism_across_partitioning(ray_session, corpus_path):
    """The reorderability property (reference README.md:155-166): block
    order and partition count must not change results."""
    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.dedup import run_dedup

    a = run_dedup(
        corpus_path,
        DedupConfig(minhash_concurrency=1, num_partitions=4),
    )
    b = run_dedup(
        corpus_path,
        DedupConfig(minhash_concurrency=3, num_partitions=23),
    )
    assert _clusters_map(a) == _clusters_map(b)
    fa = a.fingerprints.to_pandas().sort_values("url").reset_index(drop=True)
    fb = b.fingerprints.to_pandas().sort_values("url").reset_index(drop=True)
    assert (fa["fp64"].to_numpy() == fb["fp64"].to_numpy()).all()
