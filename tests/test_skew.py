"""Hot-bucket salting: connectivity preserved, identical clusters with and
without salting, on a corpus engineered to produce LSH mega-buckets."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def boiler_corpus():
    """300 docs sharing a dominant boilerplate block (mega-bucket bait) +
    100 unrelated docs."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(3000)]
    header = " ".join(vocab[i] for i in rng.integers(0, 3000, 220))
    rows = []
    for i in range(300):
        body = " ".join(vocab[j] for j in rng.integers(0, 3000, 8))
        rows.append((f"https://b/{i}", header + " " + body))
    for i in range(100):
        rows.append(
            (f"https://u/{i}", " ".join(vocab[j] for j in rng.integers(0, 3000, 250)))
        )
    ts = [1735689600_000_000 + i * 1_000_000 for i in range(len(rows))]
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array([None] * len(rows), type=pa.binary()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
        }
    )


def _run(tbl, **cfg_kw):
    import ray.data as rd

    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.dedup import run_dedup

    cfg = DedupConfig(minhash_concurrency=2, num_partitions=8, **cfg_kw)
    res = run_dedup(rd.from_arrow(tbl), cfg)
    df = res.clusters.to_pandas()
    return dict(zip(df["url"], df["cluster_id"])), res


def test_salting_preserves_clusters(ray_session, boiler_corpus):
    # aggressive salting: every bucket >8 members gets split 16 ways
    salted, res_s = _run(boiler_corpus, hot_bucket_threshold=8, salt_fanout=16)
    unsalted, res_u = _run(boiler_corpus, hot_bucket_threshold=10_000_000)
    assert salted == unsalted, "salting changed cluster assignments"
    # the boilerplate docs really did form one big cluster
    boiler_clusters = {salted[u] for u in salted if u.startswith("https://b/")}
    assert len(boiler_clusters) == 1
    # unrelated docs did not get pulled in
    unrelated = {salted[u] for u in salted if u.startswith("https://u/")}
    assert len(unrelated) == 100
    assert not (unrelated & boiler_clusters)


def test_hot_buckets_detected(ray_session, boiler_corpus):
    import ray.data as rd

    from sick_ray.config import DedupConfig
    from sick_ray.extract import extract_batch
    from sick_ray.stages.exact import add_fingerprints, exact_dedup
    from sick_ray.stages.lsh import explode_bands, hot_buckets
    from sick_ray.stages.minhash import MinHasher

    cfg = DedupConfig(minhash_concurrency=2, num_partitions=8, hot_bucket_threshold=8)
    meta = (
        rd.from_arrow(boiler_corpus)
        .map_batches(extract_batch, batch_format="pyarrow")
        .map_batches(add_fingerprints, batch_format="pyarrow")
        .map_batches(MinHasher, fn_constructor_args=(cfg,), batch_format="pyarrow",
                     concurrency=(1, 2))
    )
    canonical = exact_dedup(meta, cfg)
    band_rows = canonical.select_columns(["fp64", "band_hash"]).map_batches(
        explode_bands, batch_format="pyarrow"
    )
    hot = hot_buckets(band_rows, cfg)
    # 300 near-identical boilerplate docs share most band buckets → hot
    assert len(hot) >= 8, f"expected mega-buckets, found {len(hot)}"
