"""Stage 3: suffix array, window hashes, planted-span detection."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from sick_ray.config import DedupConfig
from sick_ray.stages.suffix import suffix_array, window_hashes


def test_suffix_array_matches_naive():
    rng = np.random.default_rng(5)
    for n in (1, 2, 7, 50, 300):
        s = rng.integers(0, 4, size=n).astype(np.uint8)  # small alphabet
        sa = suffix_array(s)
        b = bytes(s)
        want = sorted(range(n), key=lambda i: b[i:])
        assert sa.tolist() == want


def test_window_hash_position_independent():
    rng = np.random.default_rng(6)
    s = rng.integers(0, 256, size=500).astype(np.uint8)
    # plant an identical 64-byte window at two offsets
    s[100:164] = s[300:364]
    h = window_hashes(s, 64)
    assert h[100] == h[300]
    # and differing windows differ
    assert h[0] != h[100] or bytes(s[0:64]) == bytes(s[100:164])


def _byte_offset(text: str, char_off: int) -> int:
    return len(text[:char_off].encode("utf-8"))


@pytest.fixture(scope="module")
def spans_result(ray_session, small_corpus):
    import ray.data as rd

    from sick_ray.stages.suffix import duplicate_spans

    docs = rd.read_parquet(os.path.join(small_corpus, "webtext.parquet"))
    cfg = DedupConfig()
    spans = duplicate_spans(docs, cfg).to_pandas()
    return spans, small_corpus


def test_planted_spans_detected(spans_result):
    spans, d = spans_result
    truth = pq.read_table(os.path.join(d, "truth_spans.parquet")).to_pandas()
    web = pq.read_table(os.path.join(d, "webtext.parquet")).to_pandas()
    text_of = dict(zip(web["url"], web["text"]))
    by_url = {u: g for u, g in spans.groupby("url")}
    found = 0
    for r in truth.itertuples():
        t = text_of[r.url]
        bs, be = _byte_offset(t, r.start), _byte_offset(t, r.end)
        g = by_url.get(r.url)
        if g is None:
            continue
        inter = np.minimum(g["end"], be) - np.maximum(g["start"], bs)
        if (inter > 128).any():
            found += 1
    recall = found / len(truth)
    assert recall >= 0.95, f"span recall {recall:.3f} ({found}/{len(truth)})"


def test_exact_dup_texts_marked_as_spans(spans_result):
    """Byte-identical docs (>=256B) should be flagged near-fully duplicated."""
    spans, d = spans_result
    te = pq.read_table(os.path.join(d, "truth_exact.parquet")).to_pandas()
    web = pq.read_table(os.path.join(d, "webtext.parquet")).to_pandas()
    text_of = dict(zip(web["url"], web["text"]))
    big = [u for u in te["url"] if len((text_of.get(u) or "").encode()) >= 512]
    by_url = {u: g for u, g in spans.groupby("url")}
    covered = 0
    for u in big:
        g = by_url.get(u)
        if g is None:
            continue
        n = len(text_of[u].encode())
        cov = (g["end"] - g["start"]).sum()
        if cov >= 0.5 * n:
            covered += 1
    assert covered / max(1, len(big)) >= 0.9


def test_anchored_spans_match_scalar_golden_sf01(ray_session):
    """The deterministic anchored pass vs the independent scalar golden
    at sf0.1 (the oracle covers sf0.01; this is the at-scale twin), plus
    partition invariance of the same output."""
    import pandas as pd
    import pyarrow.parquet as pq

    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.queries import _docs_as_webtext
    from sick_ray.stages.suffix import duplicate_spans

    import duckdb
    import pytest

    from sick_ray.pipelines.queries import spans_golden_sql

    golden = duckdb.sql(
        spans_golden_sql("/root/testdata/sf0.1")
    ).df().sort_values(["url", "start"]).reset_index(drop=True)
    # the selector refuses scales without a golden (wrong-golden compares
    # must fail loudly, not spuriously)
    with pytest.raises(ValueError, match="no doc_spans_anchored golden"):
        spans_golden_sql("/root/testdata/sf9.9")

    outs = []
    for parts in (16, 5):
        cfg = DedupConfig(num_partitions=parts, minhash_concurrency=2)
        got = duplicate_spans(
            _docs_as_webtext("/root/testdata/sf0.1"), cfg,
            include_local=False,
        ).to_pandas().sort_values(["url", "start"]).reset_index(drop=True)
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], golden, check_dtype=False)
    pd.testing.assert_frame_equal(outs[0], outs[1], check_dtype=False)


def test_colocate_local_pass_deterministic(ray_session, small_corpus):
    """local_pass="colocate": identical span SETS (not just counts) at
    any input partitioning — the conformance mode VERDICT r4 item 7
    asked for. The production default ("scope") documents ~0.1% local
    span drift under Ray task bundling; colocate removes it by paying a
    deterministic full-text co-location shuffle."""
    import os as _os

    import ray.data as rd

    from sick_ray.stages.suffix import duplicate_spans

    path = _os.path.join(small_corpus, "webtext.parquet")
    cfg = DedupConfig()
    outs = []
    for nparts in (3, 17):
        docs = rd.read_parquet(path).repartition(nparts)
        spans = duplicate_spans(docs, cfg, local_pass="colocate").to_pandas()
        outs.append(spans.sort_values(["url", "start", "end"])
                    .reset_index(drop=True))
    assert len(outs[0]) > 0
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # and the colocate set covers at least the anchored (global) set's
    # BYTES (row counts can shrink: local spans merge overlapping global
    # spans into fewer, longer rows)
    anchored = duplicate_spans(
        rd.read_parquet(path), cfg, include_local=False).to_pandas()
    cov = lambda df: int((df["end"] - df["start"]).sum())  # noqa: E731
    assert cov(outs[0]) >= cov(anchored)
