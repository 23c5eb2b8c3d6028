"""Force the Dataset.join verification path (the >300k-doc scale path)
and check it produces the same clusters as the broadcast path."""

import os

import pytest


def test_join_verify_matches_broadcast(ray_session, small_corpus, monkeypatch):
    import ray.data as rd

    import sick_ray.pipelines.dedup as dd
    from sick_ray.config import DedupConfig

    web = os.path.join(small_corpus, "webtext.parquet")
    cfg = DedupConfig(minhash_concurrency=2, num_partitions=8)
    r_bcast = dd.run_dedup(rd.read_parquet(web), cfg)
    monkeypatch.setattr(dd, "BROADCAST_SIG_LIMIT", 0)   # force join path
    r_join = dd.run_dedup(rd.read_parquet(web), cfg)
    a = r_bcast.clusters.to_pandas()
    b = r_join.clusters.to_pandas()
    assert dict(zip(a["url"], a["cluster_id"])) == dict(zip(b["url"], b["cluster_id"]))
