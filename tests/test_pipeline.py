"""End-to-end dedup pipeline: exact groups, near-dup recall, invariants."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest


def _cluster_map(clusters_ds):
    tbl = clusters_ds.to_pandas()
    return dict(zip(tbl["url"], tbl["cluster_id"])), tbl


@pytest.fixture(scope="module")
def result(ray_session, small_corpus):
    import ray.data as rd

    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.dedup import run_dedup

    ds = rd.read_parquet(os.path.join(small_corpus, "webtext.parquet"))
    cfg = DedupConfig(minhash_concurrency=2)
    return run_dedup(ds, cfg), small_corpus


def test_counts(result):
    res, d = result
    web = pq.read_table(os.path.join(d, "webtext.parquet"))
    assert res.n_docs == web.num_rows
    assert res.n_canonical < res.n_docs  # exact dups collapsed
    assert res.clusters.count() == res.n_docs


def test_exact_groups_collapse(result):
    res, d = result
    cmap, _ = _cluster_map(res.clusters)
    te = pq.read_table(os.path.join(d, "truth_exact.parquet")).to_pandas()
    for _, grp in te.groupby("fp_group"):
        cids = {cmap[u] for u in grp["url"]}
        assert len(cids) == 1, f"exact-dup group split into {len(cids)} clusters"


def test_near_dup_recall(result):
    res, d = result
    cmap, _ = _cluster_map(res.clusters)
    tp = pq.read_table(os.path.join(d, "truth_pairs.parquet")).to_pandas()
    strong = tp[tp["jaccard"] >= 0.9]
    hit = sum(cmap[r.src_url] == cmap[r.dst_url] for r in strong.itertuples())
    recall = hit / len(strong)
    assert recall >= 0.99, f"recall {recall:.4f} on {len(strong)} J>=0.9 pairs"
    # weaker bands: just report sane behavior (banding prob drops with J)
    mid = tp[(tp["jaccard"] >= 0.8) & (tp["jaccard"] < 0.9)]
    if len(mid):
        mid_recall = sum(
            cmap[r.src_url] == cmap[r.dst_url] for r in mid.itertuples()
        ) / len(mid)
        assert mid_recall >= 0.7


def test_precision_sample(result):
    """Unrelated docs must not merge: sample random url pairs from different
    planted kinds and check they stay apart unless truly similar."""
    from sick_ray.synth import jaccard, shingle_set

    res, d = result
    cmap, tbl = _cluster_map(res.clusters)
    web = pq.read_table(os.path.join(d, "webtext.parquet")).to_pandas()
    text_of = dict(zip(web["url"], web["text"]))
    rng = np.random.default_rng(3)
    urls = list(cmap)
    wrong = 0
    checked = 0
    for _ in range(300):
        a, b = rng.choice(len(urls), size=2, replace=False)
        ua, ub = urls[a], urls[b]
        if cmap[ua] == cmap[ub]:
            ta, tb = text_of.get(ua) or "", text_of.get(ub) or ""
            if jaccard(shingle_set(ta), shingle_set(tb)) < 0.5:
                wrong += 1
        checked += 1
    assert wrong == 0, f"{wrong}/{checked} dissimilar sampled pairs merged"


def test_one_canonical_per_cluster(result):
    res, _ = result
    _, tbl = _cluster_map(res.clusters)
    per = tbl.groupby("cluster_id")["is_canonical"].sum()
    assert (per == 1).all()


def test_fingerprints_cover_all_urls(result):
    res, d = result
    fp = res.fingerprints.to_pandas()
    web = pq.read_table(os.path.join(d, "webtext.parquet"))
    assert set(fp["url"]) == set(web.column("url").to_pylist())
    assert fp["fp64"].nunique() == res.n_canonical


def test_text_invariant_byte_identical(ray_session, small_corpus):
    """extract stage must pass non-null text through byte-identically."""
    import ray.data as rd

    from sick_ray.extract import extract_batch

    web = pq.read_table(os.path.join(small_corpus, "webtext.parquet"))
    out = (
        rd.read_parquet(os.path.join(small_corpus, "webtext.parquet"))
        .map_batches(extract_batch, batch_format="pyarrow")
        .to_pandas()
    )
    inp = web.to_pandas()
    m = inp.merge(out, on="url", suffixes=("_in", "_out"))
    nonnull = m[m["text_in"].notna()]
    ident = (
        nonnull["text_in"].str.encode("utf-8") == nonnull["text_out"].str.encode("utf-8")
    )
    assert ident.all()
    # null-text rows got a deterministic extraction
    nulls = m[m["text_in"].isna()]
    assert nulls["text_out"].notna().all()


def test_exact_only_mode(ray_session, small_corpus):
    """cfg.enable_near=False → clusters == exact fp64 groups only (the
    reference's dedup-flags matrix, EBABuilder.scala:89-117)."""
    import ray.data as rd

    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.dedup import run_dedup

    ds = rd.read_parquet(os.path.join(small_corpus, "webtext.parquet"))
    cfg = DedupConfig(enable_near=False, minhash_concurrency=2,
                      num_partitions=8)
    res = run_dedup(ds, cfg)
    assert res.n_edges == 0
    cl = res.clusters.to_pandas()
    fp = res.fingerprints.to_pandas()
    # cluster ids == own fp64 per url (no near-dup merging)
    m = cl.merge(fp, on="url")
    assert (m["cluster_id"] == m["fp64"]).all()
    assert cl["cluster_id"].nunique() == res.n_canonical


def test_run_full_matches_run_dedup(result):
    """The overlapped two-branch pipeline (run_full) must produce the same
    clusters, counts and a valid spans table as the sequential path."""
    import os

    import pandas as pd

    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.dedup import run_full

    res, d = result
    cfg = DedupConfig(minhash_concurrency=2)
    full = run_full(os.path.join(d, "webtext.parquet"), cfg)
    assert full.dedup.n_docs == res.n_docs
    assert full.dedup.n_canonical == res.n_canonical
    assert full.dedup.n_edges == res.n_edges
    a = res.clusters.to_pandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    b = (
        full.dedup.clusters.to_pandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    spans = full.spans.to_pandas()
    assert full.n_spans == len(spans)
    assert (spans["end"] > spans["start"]).all()
    assert set(spans.columns) == {"url", "start", "end"}
    assert {"exact_sec", "near_sec", "spans_sec", "total_sec"} <= set(full.timings)


def test_spans_parquet_pin_matches_plasma(ray_session, small_corpus, monkeypatch):
    """Above SPANS_PIN_PARQUET_DOCS the spans-branch corpus intermediate
    is pinned to zstd parquet instead of a plasma materialize; forcing
    the parquet path at small scale must leave the anchored span set
    identical (the local set is scope-dependent by design, so compare
    anchored via a direct duplicate_spans run over both pin styles)."""
    import os

    import pandas as pd

    import sick_ray.pipelines.dedup as dd
    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.dedup import run_full

    cfg = DedupConfig(minhash_concurrency=2)
    path = os.path.join(small_corpus, "webtext.parquet")
    base = run_full(path, cfg)
    monkeypatch.setattr(dd, "SPANS_PIN_PARQUET_DOCS", 0)   # force parquet pin
    forced = run_full(path, cfg)
    assert forced.dedup.n_edges == base.dedup.n_edges
    assert forced.dedup.n_canonical == base.dedup.n_canonical
    a = base.spans.to_pandas()
    b = forced.spans.to_pandas()
    # local span scope drift is documented; anchored coverage must agree
    # closely and both sets must be plausible
    assert abs(len(a) - len(b)) <= max(5, len(a) // 200)
    ca = base.dedup.clusters.to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    cb = forced.dedup.clusters.to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(ca, cb)


def test_dup_bucket_prefilter_output_identical(ray_session, tmp_path):
    """The singleton-bucket Bloom prefilter must be output-invariant:
    clusters with the flag on == off (false positives emit nothing,
    false negatives are impossible)."""
    import os

    import ray.data as rd

    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.dedup import run_dedup
    from sick_ray.synth import materialize_corpus

    corpus = materialize_corpus(800, seed=21)
    path = os.path.join(corpus, "webtext.parquet")
    outs = []
    for flag in (True, False):
        cfg = DedupConfig(minhash_concurrency=2, num_partitions=8,
                          dup_bucket_prefilter=flag)
        res = run_dedup(rd.read_parquet(path), cfg)
        df = res.clusters.to_pandas().sort_values(
            ["cluster_id", "url"]).reset_index(drop=True)
        outs.append(df)
    import pandas as pd

    pd.testing.assert_frame_equal(outs[0], outs[1])
