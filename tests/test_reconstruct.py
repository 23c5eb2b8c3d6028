"""Deduped-corpus writer: byte-identical text pass-through, canonical-only."""

import os

import pyarrow.parquet as pq


def test_write_deduped_corpus(ray_session, small_corpus, tmp_path):
    import ray.data as rd

    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.dedup import run_dedup, write_deduped_corpus

    web_path = os.path.join(small_corpus, "webtext.parquet")
    cfg = DedupConfig(minhash_concurrency=2, num_partitions=8)
    res = run_dedup(rd.read_parquet(web_path), cfg)
    out = str(tmp_path / "deduped")
    n_kept, _ = write_deduped_corpus(web_path, res.clusters, out)

    cl = res.clusters.to_pandas()
    assert n_kept == int(cl["is_canonical"].sum()) == cl["cluster_id"].nunique()

    kept = pq.read_table(out).to_pandas()
    src = pq.read_table(web_path).to_pandas()
    src_text = dict(zip(src["url"], src["text"]))
    # byte-identical text per url (the per-row invariant, post-dedup)
    for u, t in zip(kept["url"], kept["text"]):
        orig = src_text[u]
        if orig is not None:
            assert t == orig and t.encode("utf-8") == orig.encode("utf-8")
    # exactly the canonical urls survived
    assert set(kept["url"]) == set(cl[cl["is_canonical"]]["url"])
    # manifest committed
    assert os.path.exists(os.path.join(out, "_MANIFEST.json"))
