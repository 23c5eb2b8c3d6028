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

    # --- lazy filtered reconstruct (the resolveFull analogue,
    # CirceTraverser.scala:190-231): a url SUBSET reconstructs
    # byte-identically without a full corpus pass (url predicate pushed
    # into the parquet read) ---
    want_urls = sorted(cl[cl["is_canonical"]]["url"])[:5]
    out2 = str(tmp_path / "deduped_subset")
    n_sub, _ = write_deduped_corpus(web_path, res.clusters, out2,
                                    urls=want_urls)
    assert n_sub == len(want_urls)
    sub = pq.read_table(out2).to_pandas()
    assert sorted(sub["url"]) == want_urls
    for u, t in zip(sub["url"], sub["text"]):
        assert t.encode("utf-8") == src_text[u].encode("utf-8")
    # a non-canonical url must NOT resurface via the subset path
    non_canon = cl[~cl["is_canonical"]]["url"]
    if len(non_canon):
        out3 = str(tmp_path / "deduped_noncanon")
        n_nc, _ = write_deduped_corpus(web_path, res.clusters, out3,
                                       urls=[non_canon.iloc[0]])
        assert n_nc == 0
