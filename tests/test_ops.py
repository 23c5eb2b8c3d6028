"""Operator-level tests: simhash, ANN (brute + LSH recall), multimodal
plumbing, text functions, winnowing fingerprints."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_simhash_tracks_similarity():
    from sick_ray.functions.simhash import simhash_batch

    base = " ".join(f"w{i}" for i in range(300))
    near = " ".join(f"w{i}" for i in range(299)) + " zzz"
    far = " ".join(f"q{i}" for i in range(300))
    s = simhash_batch([base, near, far])
    ham = lambda a, b: bin(int(a) ^ int(b)).count("1")
    assert ham(s[0], s[1]) <= 6
    assert ham(s[0], s[2]) >= 20
    # determinism
    s2 = simhash_batch([base, near, far])
    assert (s == s2).all()


def test_simhash_edges_pipeline(ray_session):
    import ray.data as rd

    from sick_ray.config import DedupConfig
    from sick_ray.functions.simhash import add_simhash, simhash_edges

    texts = []
    for g in range(20):
        base = " ".join(f"g{g}w{i}" for i in range(200))
        texts.append(base)
        texts.append(base.replace(f"g{g}w5 ", f"g{g}x5 "))   # near-dup pair
    tbl = pa.table({"fp64": pa.array(np.arange(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    ds = rd.from_arrow(tbl).map_batches(add_simhash, batch_format="pyarrow")
    edges = simhash_edges(ds, DedupConfig(num_partitions=4), max_hamming=6).to_pandas()
    pairs = {tuple(sorted((u, v))) for u, v in zip(edges["u"], edges["v"])}
    want = {(2 * g, 2 * g + 1) for g in range(20)}
    found = len(want & pairs)
    assert found >= 18, f"simhash found {found}/20 planted pairs"


def _planted_embeddings(n=400, dim=32, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim))
    q = m[7] + 0.01 * rng.standard_normal(dim)   # query ~ vector 7
    return m, q


def test_knn_bruteforce_exact(ray_session):
    import ray.data as rd

    from sick_ray.stages.ann import knn_bruteforce

    m, q = _planted_embeddings()
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(m)), type=pa.int64()),
        "embedding": pa.array(list(m.astype(np.float32))),
    })
    out = knn_bruteforce(rd.from_arrow(tbl), q, k=5).to_pandas()
    assert out.iloc[0]["vec_id"] == 7
    # matches a numpy oracle exactly
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    cos = mn @ qn
    want = np.argsort(-cos)[:5]
    assert list(out["vec_id"]) == list(want)


def test_knn_lsh_recall(ray_session):
    """Clustered embeddings (the realistic regime): query near a cluster
    center; its members are the true top-k and collide with the query in
    the hyperplane buckets with high probability."""
    import ray.data as rd

    from sick_ray.config import AnnConfig
    from sick_ray.stages.ann import knn_bruteforce, knn_lsh

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((50, 32)) * 3
    m = np.vstack([c + 0.3 * rng.standard_normal((10, 32)) for c in centers])
    q = centers[11] + 0.1 * rng.standard_normal(32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(m)), type=pa.int64()),
        "embedding": pa.array(list(m.astype(np.float32))),
    })
    ds = rd.from_arrow(tbl)
    exact = set(knn_bruteforce(ds, q, k=10).to_pandas()["vec_id"])
    approx = set(
        knn_lsh(ds, q, k=10, cfg=AnnConfig(n_planes=8, n_tables=16)).to_pandas()["vec_id"]
    )
    recall = len(exact & approx) / 10
    assert recall >= 0.8, f"LSH knn recall {recall}"


def test_vidb_roundtrip():
    from sick_ray.stages.multimodal import (decode_bmp, decode_vidb,
                                            encode_bmp, encode_vidb)

    rng = np.random.default_rng(3)
    frames = [encode_bmp(rng.integers(0, 256, (9, 11, 3)).astype(np.uint8))
              for _ in range(5)]
    rate, back = decode_vidb(encode_vidb(frames, rate=30))
    assert rate == 30 and back == frames
    assert (decode_bmp(back[2]) == decode_bmp(frames[2])).all()
    with pytest.raises(ValueError):
        decode_vidb(b"nope")
    with pytest.raises(ValueError):
        decode_vidb(encode_vidb(frames)[:20])


def test_frame_sampler_real(ray_session):
    """Real frame sampling: evenly spaced indices, per-frame decode,
    BOTH error-isolation levels, deterministic across parallelism."""
    import ray.data as rd

    from sick_ray.stages.multimodal import sample_frames, synth_media_video

    media = synth_media_video(120, seed=13)
    out = sample_frames(rd.from_arrow(media), n_frames=4, concurrency=2,
                        batch_size=16).to_pandas()
    assert "payload" not in out.columns            # wide column dropped
    ok = out[out["decode_err"].isna()]
    assert len(ok) > 300
    # evenly spaced deterministic indices: frame == (j * total) // k
    for mid, g in ok.groupby("media_id"):
        tot = int(g["total_frames"].iloc[0])
        k = min(4, tot)
        expect = sorted({(j * tot) // k for j in range(k)})
        assert sorted(g["frame"]) == expect or len(g) < k  # frame-level fails drop rows
    # container-level corruption: frame == -1 rows exist
    bad_container = out[(out["frame"] == -1) & out["decode_err"].notna()]
    assert len(bad_container) >= 1
    # frame-level corruption: a video with BOTH good and failed frames
    per_vid = out.groupby("media_id")["decode_err"].agg(
        lambda s: (s.isna().any(), s.notna().any()))
    assert any(a and b for a, b in per_vid)
    # deterministic across batching/concurrency
    out2 = sample_frames(rd.from_arrow(media), n_frames=4, concurrency=1,
                         batch_size=120).to_pandas()
    cols = ["media_id", "frame", "total_frames", "thumb_xxh", "pix_mean"]
    a = out[cols].sort_values(["media_id", "frame"]).reset_index(drop=True)
    b = out2[cols].sort_values(["media_id", "frame"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_lang_id_accuracy():
    from sick_ray.functions.text import LangId

    li = LangId()
    assert li.classify("the cat sat on the mat and it was a good day for all") == "en"
    assert li.classify("der hund ist mit der katze auf ein haus und nicht allein") == "de"
    assert li.classify("le chat est dans la maison avec le chien et pas seul") == "fr"
    assert li.classify("这是一个中文句子 测试语言识别") == "zh"
    assert li.classify("") == "und"


def test_winnow_fingerprint_robust_to_local_edit():
    from sick_ray.functions.text import add_winnow_fingerprint

    base = " ".join(f"tok{i}" for i in range(400))
    edited = base.replace("tok200", "EDITED")
    tbl = pa.table({"text": pa.array([base, edited])})
    out = add_winnow_fingerprint(tbl)
    fp = out.column("winnow_fp").to_pylist()
    shared = len(set(fp[0]) & set(fp[1]))
    assert shared >= 4, f"winnow fps share only {shared}/8 mins"


def test_knn_ivf_recall(ray_session):
    """IVF probe of nprobe/n_centroids lists must recover the true top-k
    in the clustered regime (query's cluster maps to a probed list)."""
    import ray.data as rd

    from sick_ray.stages.ann import knn_bruteforce, knn_ivf

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((20, 32)) * 3
    m = np.vstack([c + 0.3 * rng.standard_normal((25, 32)) for c in centers])
    q = centers[4] + 0.1 * rng.standard_normal(32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(m)), type=pa.int64()),
        "embedding": pa.array(list(m.astype(np.float32))),
    })
    ds = rd.from_arrow(tbl)
    exact = set(knn_bruteforce(ds, q, k=10).to_pandas()["vec_id"])
    approx = set(
        knn_ivf(ds, q, k=10, n_centroids=16, nprobe=4).to_pandas()["vec_id"]
    )
    recall = len(exact & approx) / 10
    assert recall >= 0.8, f"IVF knn recall {recall}"


def test_ivf_scanned_fraction(ray_session):
    """IVF must actually prune: vectors outside probed lists are never
    scored (scanned fraction ~ nprobe/n_centroids, not 1)."""
    import ray.data as rd

    from sick_ray.stages.ann import ivf_assign, train_centroids

    rng = np.random.default_rng(3)
    m = rng.standard_normal((500, 16))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(500), type=pa.int64()),
        "embedding": pa.array(list(m.astype(np.float32))),
    })
    ds = rd.from_arrow(tbl)
    import ray

    cent = train_centroids(ds, 8)
    assigned = ivf_assign(ds, ray.put(cent)).to_pandas()
    counts = assigned["list_id"].value_counts()
    assert len(counts) >= 4                      # lists actually populated
    assert counts.max() < 500                    # not everything in one list


def test_bmp_roundtrip_exact():
    """encode_bmp → decode_bmp is pixel-exact (the codec IS the oracle)."""
    from sick_ray.stages.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(2)
    for h, w in [(1, 1), (5, 7), (32, 17), (48, 48)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_wav_roundtrip_exact():
    from sick_ray.stages.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32767, size=1234, dtype=np.int16)
    rate, got = decode_wav(encode_wav(s, rate=8000))
    assert rate == 8000
    assert np.array_equal(got, s)


def test_media_decode_real(ray_session):
    """Real decode stages over a deterministic media table, with corrupt
    payloads isolated per row instead of failing the batch."""
    import ray.data as rd

    from sick_ray.stages.multimodal import decode_media, synth_media_real

    media = rd.from_arrow(synth_media_real(100, seed=7))
    imgs, wavs = decode_media(media, concurrency=2)
    idf = imgs.to_pandas()
    wdf = wavs.to_pandas()
    assert len(idf) + len(wdf) == 100
    ok_i = idf[idf["decode_err"].isna()]
    ok_w = wdf[wdf["decode_err"].isna()]
    assert len(ok_i) > 40 and len(ok_w) > 40
    assert (ok_i["width"] > 0).all() and (ok_i["pix_mean"] >= 0).all()
    assert (ok_w["sample_rate"] == 16000).all()
    assert (ok_w["duration_s"] > 0).all()
    # corrupt rows surfaced, not dropped or fatal
    assert (idf["decode_err"].notna().sum() + wdf["decode_err"].notna().sum()) >= 1


def test_ngram_capped_df_counts_skips(ray_session):
    """The df-capped inverted index (the 100-TB path) must DROP hot
    shingle groups with a counted shortfall and emit a subset of the
    exact query's pairs — never silently."""
    import json

    from sick_ray.pipelines.queries import (
        q_ngram_allpairs_capped, q_ngram_allpairs_jaccard)

    sf = "/root/testdata/sf0.001"
    full = q_ngram_allpairs_jaccard(sf).to_pandas()
    counters: dict = {}
    import tempfile

    with tempfile.TemporaryDirectory() as mdir:
        capped = q_ngram_allpairs_capped(
            sf, df_cap=1, out_dir=mdir, counters_out=counters
        ).to_pandas()
        on_disk = json.load(open(f"{mdir}/_MANIFEST.json"))
    assert on_disk == counters
    assert counters["skipped_shingles"] > 0
    assert counters["skipped_pairs"] > 0
    # capped pairs ⊆ exact pairs (intersections only shrink under the cap)
    if len(capped):
        mrg = capped.merge(full, on=["u", "v"], how="left", indicator=True)
        assert (mrg["_merge"] == "both").all()
    assert len(capped) <= len(full)

    # oracle parity at a cap that BITES with non-empty output (df_cap=1
    # provably emits nothing: kept shingles live in exactly one doc). The
    # driver's df_cap=32 oracle runs at sf0.01 where the cap is a no-op,
    # so check the capped SQL semantics here where it isn't.
    import duckdb

    from sick_ray.pipelines.queries import SQL_NGRAM_ALLPAIRS_CAPPED

    capped2 = q_ngram_allpairs_capped(sf, df_cap=2).to_pandas()
    assert len(capped2) > 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    sql2 = SQL_NGRAM_ALLPAIRS_CAPPED.replace("count(*) <= 32", "count(*) <= 2")
    ora = con.execute(sql2).df()
    cols = ["u", "v", "inter", "size_u", "size_v"]
    eng_s = capped2[cols].sort_values(["u", "v"]).reset_index(drop=True)
    ora_s = ora[cols].sort_values(["u", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        eng_s.astype("int64"), ora_s.astype("int64")
    )


def test_kmeans_lloyd_matches_local_reference(ray_session):
    """Distributed Lloyd must reproduce a single-process numpy Lloyd with
    the same deterministic init: identical assignments, allclose
    centroids (float summation ORDER differs across blocks, so exact
    bit-equality of centroids is not required — assignments are the
    integer-stable contract)."""
    import ray.data as rd

    from sick_ray.stages.ann import _emb_matrix, _normalize, kmeans_lloyd

    emb = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
    k, iters = 8, 5
    assigns, cent = kmeans_lloyd(emb, k=k, iters=iters)
    got = assigns.to_pandas().sort_values("vec_id")

    # local reference: same init (k lowest vec_ids), same update rule
    tbl = pa.concat_tables(
        list(emb.iter_batches(batch_size=10**6, batch_format="pyarrow"))
    )
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    m_sorted = _normalize(_emb_matrix(tbl.column("embedding").combine_chunks()))[order]
    c = m_sorted[:k].astype(np.float64).copy()
    for _ in range(iters):
        a = np.argmax(m_sorted @ c.T, axis=1)
        for ci in range(k):
            v = m_sorted[a == ci].sum(axis=0)
            n = np.linalg.norm(v)
            if n > 0:
                c[ci] = v / n
    ref_a = np.argmax(m_sorted @ c.T, axis=1)
    assert (got["cluster"].to_numpy() == ref_a).all()
    assert np.allclose(cent, c, atol=1e-8)
    assert len(np.unique(ref_a)) > 1          # the clustering is non-trivial


def test_kmeans_lloyd_large_k_incluster_combine(ray_session):
    """The large-k regime (k*d > KMEANS_DRIVER_FOLD_MAX_CELLS) routes the
    per-iteration partials through the in-cluster (c, j) combine; the
    driver fold then sees exactly k*d rows instead of n_blocks*k*d
    (VERDICT r4 item 3). Assignments must still match a single-process
    Lloyd exactly at k=1024."""
    import ray.data as rd

    from sick_ray.stages.ann import (KMEANS_DRIVER_FOLD_MAX_CELLS,
                                     _normalize, kmeans_lloyd)

    n, d, k, iters = 4096, 16, 1024, 3
    assert k * d > KMEANS_DRIVER_FOLD_MAX_CELLS  # combine path engaged
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1)), d),
    })
    emb = rd.from_arrow(tbl).repartition(13)

    assigns, cent = kmeans_lloyd(emb, k=k, iters=iters, num_partitions=6)
    got = assigns.to_pandas().sort_values("vec_id")

    # local reference: same init (k lowest vec_ids), same update rule
    m = _normalize(vecs)
    c = m[:k].astype(np.float64).copy()
    for _ in range(iters):
        a = np.argmax(m @ c.T, axis=1)
        o = np.argsort(a, kind="stable")
        a_s = a[o]
        fm = np.ones(n, dtype=bool)
        fm[1:] = a_s[1:] != a_s[:-1]
        starts = np.flatnonzero(fm)
        sums = np.add.reduceat(m[o], starts, axis=0)
        for lab, v in zip(a_s[starts], sums):
            nrm = np.linalg.norm(v)
            if nrm > 0:
                c[lab] = v / nrm
    ref_a = np.argmax(m @ c.T, axis=1)
    assert (got["cluster"].to_numpy() == ref_a).all()
    assert np.allclose(cent, c, atol=1e-8)
    assert len(np.unique(ref_a)) > 64          # genuinely many clusters


def test_fold_cj_partial_combine():
    """_fold_cj sums (s, n) per (c, j) group regardless of row order."""
    from sick_ray.stages.ann import _fold_cj

    t = pa.table({
        "c": pa.array([2, 0, 2, 0, 1], type=pa.int64()),
        "j": pa.array([1, 0, 1, 0, 3], type=pa.int64()),
        "s": pa.array([1.5, 2.0, 0.5, 3.0, 7.0], type=pa.float64()),
        "n": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
    })
    out = _fold_cj(t).to_pydict()
    assert out == {"c": [0, 1, 2], "j": [0, 3, 1],
                   "s": [5.0, 7.0, 2.0], "n": [6, 5, 4]}


def test_quality_classifier_learns_and_matches_reference(ray_session):
    """Distributed logistic GD must reproduce a single-process numpy GD
    (same init/update/features) AND actually learn: accuracy well above
    both class priors (rejects the all-majority degenerate model)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from sick_ray.stages.classify import doc_features_labels, train_logreg_quality

    sf = "/root/testdata/sf0.01"
    docs = rd.read_parquet(sf + "/documents.parquet",
                           columns=["doc_id", "text"])
    scored, w = train_logreg_quality(docs)
    got = scored.to_pandas().sort_values("doc_id").reset_index(drop=True)

    tbl = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"])
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    X, y = doc_features_labels(tbl)
    X, y = X[order], y[order]
    w_ref = np.zeros(4)
    for _ in range(25):
        p = 1.0 / (1.0 + np.exp(-(X @ w_ref)))
        w_ref = w_ref - 2.0 * ((p - y) @ X) / len(y)
    assert np.allclose(w, w_ref, atol=1e-9)
    assert (got["label"].to_numpy() == y.astype(np.int64)).all()
    assert (got["pred"].to_numpy() == (X @ w_ref >= 0).astype(np.int64)).all()
    acc = float((got["pred"] == got["label"]).mean())
    prior = max(float(got["label"].mean()), 1 - float(got["label"].mean()))
    assert acc > 0.9 and acc > prior + 0.05, (acc, prior)
    assert 0 < int(got["pred"].sum()) < len(got)   # not degenerate


def test_semdedup_matches_local_reference(ray_session):
    """semdedup must reproduce a single-process numpy reference: cluster
    with the same Lloyd, then inside each cluster drop any vector with
    cosine >= tau to a lower-vec_id member (kept or not — the
    deterministic keep-lowest-id rule). Also partition-invariant."""
    import ray.data as rd

    from sick_ray.stages.ann import _emb_matrix, _normalize, semdedup

    sf = "/root/testdata/sf0.01"
    tau = 0.3
    emb = rd.read_parquet(sf + "/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    got = (semdedup(emb, k=8, iters=5, tau=tau, num_partitions=4)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    got2 = (semdedup(emb, k=8, iters=5, tau=tau, num_partitions=11)
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)   # partition invariance

    tbl = pa.concat_tables(
        list(emb.iter_batches(batch_size=10**6, batch_format="pyarrow"))
    )
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids_s = ids[order]
    m = _normalize(_emb_matrix(tbl.column("embedding").combine_chunks()))[order]
    k, iters = 8, 5
    c = m[:k].astype(np.float64).copy()
    for _ in range(iters):
        a = np.argmax(m @ c.T, axis=1)
        for ci in range(k):
            v = m[a == ci].sum(axis=0)
            n = np.linalg.norm(v)
            if n > 0:
                c[ci] = v / n
    a = np.argmax(m @ c.T, axis=1)
    keep = np.ones(len(ids_s), dtype=bool)
    sims = m @ m.T
    for i in range(1, len(ids_s)):
        lower = (a[:i] == a[i]) & (sims[i, :i] >= tau)
        keep[i] = not lower.any()
    assert (got["vec_id"].to_numpy() == ids_s).all()
    assert (got["cluster"].to_numpy() == a).all()
    assert (got["keep"].to_numpy() == keep).all()
    assert 0 < keep.sum() < len(keep)          # the prune actually bites


def test_sketch_goldens_sf01(ray_session):
    """The independent-scalar sketch goldens (make_sketch_golden.py) must
    match the engine at sf0.1 too — the static driver oracle only pins
    sf0.01 (the spans-golden discipline, tests/test_suffix.py)."""
    import pyarrow.parquet as pq_

    from sick_ray.pipelines.queries import (SKETCH_HLL_GOLDEN,
                                            SKETCH_PQ_GOLDEN,
                                            q_events_user_hll,
                                            q_price_quantiles_sketch)

    sf = "/root/testdata/sf0.1"
    g = pq_.read_table(SKETCH_HLL_GOLDEN).to_pandas()
    g = g[g["sf"] == "sf0.1"].drop(columns=["sf"])
    eng = q_events_user_hll(sf).to_pandas()
    pd.testing.assert_frame_equal(
        eng.sort_values("event_type").reset_index(drop=True),
        g.sort_values("event_type").reset_index(drop=True),
    )
    g2 = pq_.read_table(SKETCH_PQ_GOLDEN).to_pandas()
    g2 = g2[g2["sf"] == "sf0.1"].drop(columns=["sf"])
    eng2 = q_price_quantiles_sketch(sf).to_pandas()
    pd.testing.assert_frame_equal(
        eng2.sort_values("l_returnflag").reset_index(drop=True),
        g2.sort_values("l_returnflag").reset_index(drop=True),
    )


def test_hll_within_error_envelope(ray_session):
    """HLL distinct-user estimates within 3 sigma (~2.5% at p=14) of the
    exact twin, per event type."""
    from sick_ray.pipelines.queries import q_events_distinct_users, q_events_user_hll

    sf = "/root/testdata/sf0.01"
    exact = q_events_distinct_users(sf).to_pandas().set_index("event_type")
    hll = q_events_user_hll(sf).to_pandas().set_index("event_type")
    assert set(exact.index) == set(hll.index)
    rel = (hll["approx_users"] - exact["n_users"]).abs() / exact["n_users"]
    assert float(rel.max()) < 0.025, rel.to_dict()


def test_mg_top_terms_bound(ray_session):
    """Misra-Gries: with the default cap the tiny synth vocabulary never
    triggers compression (result == exact top-20); with a cap that BITES
    every kept counter under-estimates by at most N_tokens/(cap+1) and
    the heavy terms survive."""
    from sick_ray.pipelines.queries import q_top_terms, q_top_terms_mg

    sf = "/root/testdata/sf0.001"
    exact = q_top_terms(sf).to_pandas()
    mg = q_top_terms_mg(sf).to_pandas()
    pd.testing.assert_frame_equal(
        mg.reset_index(drop=True), exact.reset_index(drop=True),
        check_dtype=False,
    )
    # force compression: cap=8 counters per batch
    small = q_top_terms_mg(sf, cap=8).to_pandas().set_index("token")
    ex = exact.set_index("token")
    # the TRUE corpus token count makes the N/(cap+1) bound exact, not lax
    import duckdb

    n_tokens = duckdb.sql(
        "SELECT sum(len(regexp_extract_all(lower(text), '[0-9a-z]+'))) "
        f"FROM read_parquet('{sf}/documents.parquet')"
    ).fetchone()[0]
    present = [t for t in ex.index[:5] if t in small.index]
    assert len(present) >= 3, "heavy terms lost under compression"
    for t in present:
        assert small.loc[t, "n"] <= ex.loc[t, "n"]          # under-estimates
        assert ex.loc[t, "n"] - small.loc[t, "n"] <= n_tokens / 9


def test_quantile_sketch_rank_error(ray_session):
    """Bottom-k quantile sketch: the estimated quantile's TRUE CDF
    position must sit within ~3 sigma of the target rank (sigma =
    sqrt(p(1-p)/k)); also the default-k estimate at this scale is
    sample-of-everything (k >= group sizes) and equals the exact twin."""
    import duckdb

    from sick_ray.pipelines.queries import (
        q_price_quantiles,
        q_price_quantiles_sketch,
    )

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')"
    )
    est = q_price_quantiles_sketch(sf, k=1024).to_pandas().set_index("l_returnflag")
    for flag, row in est.iterrows():
        for q, nm in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95")):
            cdf = con.execute(
                "SELECT avg(CASE WHEN l_extendedprice <= ? THEN 1.0 ELSE 0 END) "
                "FROM lineitem WHERE l_returnflag = ?",
                [float(row[nm]), flag],
            ).fetchone()[0]
            sigma = (q * (1 - q) / 1024) ** 0.5
            assert abs(cdf - q) < 3.5 * sigma + 0.01, (flag, nm, cdf, q)

    # k large enough to hold every group: sketch == exact
    big = q_price_quantiles_sketch(sf, k=60000).to_pandas().sort_values(
        "l_returnflag").reset_index(drop=True)
    exact = q_price_quantiles(sf).to_pandas().sort_values(
        "l_returnflag").reset_index(drop=True)
    pd.testing.assert_frame_equal(big, exact, check_dtype=False)


# ------------------------------------------------------ perceptual dHash

def test_dhash56_matches_scalar_reference():
    """Vectorized packbits dHash == an independent scalar bit loop."""
    from sick_ray.stages.multimodal import dhash56

    rng = np.random.default_rng(3)
    thumbs = rng.integers(0, 256, size=(32, 64), dtype=np.uint8)
    got = dhash56(thumbs).view(np.uint64)
    for i, t in enumerate(thumbs):
        h, bit = 0, 0
        for r in range(8):
            for c in range(7):
                if t[r * 8 + c + 1] > t[r * 8 + c]:
                    h |= 1 << bit
                bit += 1
        assert int(got[i]) == h


def test_phash_near_dup_exact_vs_bruteforce(ray_session):
    """Engine band-LSH output == the full O(n²) hamming-≤3 pair set
    (banding is lossless at this threshold), and planted near-dups are
    found."""
    import ray.data as rd

    from sick_ray.stages.multimodal import (
        ImageDecoder,
        dhash56,
        phash_near_dup,
        synth_media_dups,
    )

    media = synth_media_dups(240, seed=11)
    counters = {}
    got = phash_near_dup(rd.from_arrow(media), num_partitions=8,
                         concurrency=2, counters=counters).to_pandas()
    got_set = set(zip(got["u"], got["v"], got["dist"]))

    # brute force from the engine's own decode path
    dec = ImageDecoder()(media)
    ok = np.array([e is None for e in dec.column("decode_err").to_pylist()])
    ids = dec.column("media_id").to_numpy(zero_copy_only=False)[ok]
    th = dec.column("thumb").combine_chunks().flatten().to_numpy(
        zero_copy_only=False).reshape(-1, 64)[ok]
    ph = dhash56(th).view(np.uint64)
    want = set()
    for i in range(len(ids)):
        x = ph[i] ^ ph[i + 1:]
        d = np.zeros(len(x), dtype=np.int64)
        xx = x.copy()
        while xx.any():
            d += (xx & np.uint64(1)).astype(np.int64)
            xx >>= np.uint64(1)
        for j in np.flatnonzero(d <= 3):
            want.add((int(ids[i]), int(ids[i + 1 + j]), int(d[j])))
    assert got_set == want
    assert len(want) > 50, "fixture must plant a meaningful dup set"
    assert counters["truncated_pairs"] == 0


def test_ahash56_matches_scalar_reference():
    """Vectorized cumsum ahash == an independent pure-int scalar loop."""
    from sick_ray.stages.multimodal import ahash56

    rng = np.random.default_rng(5)
    for _ in range(8):
        s = rng.integers(-30000, 30000,
                         size=int(rng.integers(60, 3000))).astype(np.int16)
        sq = [int(x) * int(x) for x in s.tolist()]
        n = len(sq)
        bounds = [(i * n) // 57 for i in range(58)]
        total = sum(sq)
        h = 0
        for i in range(56):
            e = sum(sq[bounds[i]:bounds[i + 1]])
            if e * n > total * (bounds[i + 1] - bounds[i]):
                h |= 1 << i
        assert ahash56(s) == h


def test_ahash_near_dup_exact_vs_bruteforce(ray_session):
    import ray.data as rd

    from sick_ray.stages.multimodal import (
        AudioHasher,
        ahash_near_dup,
        synth_audio_dups,
    )

    media = synth_audio_dups(200, seed=13)
    counters = {}
    got = ahash_near_dup(rd.from_arrow(media), num_partitions=8,
                         concurrency=2, counters=counters).to_pandas()
    got_set = set(zip(got["u"], got["v"], got["dist"]))

    hashed = AudioHasher()(media)
    ids = hashed.column("media_id").to_numpy(zero_copy_only=False)
    ph = hashed.column("phash").to_numpy(zero_copy_only=False).view(np.uint64)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(int(ph[i] ^ ph[j])).count("1")
            if d <= 3:
                want.add((int(ids[i]), int(ids[j]), d))
    assert got_set == want
    assert len(want) > 40, "fixture must plant a meaningful dup set"
    assert counters["truncated_pairs"] == 0
