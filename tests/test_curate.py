"""Unit tests for the training-data curation kernels (functions/curate.py).

Oracle parity for the five curation queries is covered by
test_oracle_parity.py (they are enumerated from __ray_entry__); these
tests pin the kernel math itself against brute-force Python on edge
cases the sf corpus doesn't exercise (empty docs, sub-k-token docs,
planted repetition / contamination).
"""

import numpy as np
import pyarrow as pa
import pytest

from sick_ray.functions.curate import (
    EMAIL_RE,
    PHONE_RE,
    _per_doc_run_stats,
    add_repetition_stats,
    hash_sample_mask,
    ngram_hashes,
    redact_pii,
)
from sick_ray.stages.minhash import tokenize_hashes_col


def _brute_stats(texts, k=5):
    """Reference implementation: per-doc token/n-gram stats in Python."""
    import re

    out = []
    for t in texts:
        toks = re.findall(r"[0-9a-z]+", (t or "").lower())
        grams = [tuple(toks[i : i + k]) for i in range(max(len(toks) - k + 1, 0))]
        from collections import Counter

        tc = Counter(toks)
        out.append(
            {
                "n_tokens": len(toks),
                "top_token_n": max(tc.values()) if tc else 0,
                "n_5grams": len(grams),
                "n_distinct_5grams": len(set(grams)),
            }
        )
    return out


TEXTS = [
    "the cat sat on the mat the cat sat on the mat",   # heavy repetition
    "one two three four",                               # < 5 tokens → 0 grams
    "",                                                 # empty
    None,                                               # null
    "a a a a a a a a a a",                              # single token repeated
    "alpha beta gamma delta epsilon zeta eta theta",    # all distinct
]


def test_repetition_stats_match_bruteforce():
    batch = pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
    got = add_repetition_stats(batch).to_pydict()
    want = _brute_stats(TEXTS)
    for i, w in enumerate(want):
        for key, val in w.items():
            assert got[key][i] == val, (i, key, got[key][i], val)
    # the all-repeated doc: 10 tokens of 'a', 6 5-grams all identical
    i = 4
    assert got["top_token_ppm"][i] == 1_000_000
    assert got["dup_5gram_ppm"][i] == int(np.floor(5 * 1e6 / 6))
    assert got["gopher_keep"][i] == 0
    assert got["gopher_keep"][5] == 1


def test_per_doc_run_stats_scatter():
    # doc 1 empty; doc 0 has keys [7,7,3]; doc 2 has [5]
    keys = np.array([7, 7, 3, 5], dtype=np.int64)
    doc = np.array([0, 0, 0, 2], dtype=np.int64)
    total, distinct, top = _per_doc_run_stats(keys, doc, 3)
    assert total.tolist() == [3, 0, 1]
    assert distinct.tolist() == [2, 0, 1]
    assert top.tolist() == [2, 0, 1]


def test_ngram_hashes_respect_doc_boundaries():
    texts = ["w x y z q", "w x y z q"]
    col = pa.array(texts, type=pa.string())
    th, offs = tokenize_hashes_col(col)
    g, gdoc = ngram_hashes(th, offs, 5)
    # each doc has exactly one 5-gram; identical text → identical hash
    assert len(g) == 2 and gdoc.tolist() == [0, 1]
    assert g[0] == g[1]
    # k=3: 3 per doc, none spanning the boundary
    g3, gdoc3 = ngram_hashes(th, offs, 3)
    assert gdoc3.tolist() == [0, 0, 0, 1, 1, 1]


def test_hash_sample_deterministic_and_partitioning_invariant():
    ids = np.arange(100_000, dtype=np.int64)
    m1 = hash_sample_mask(ids, 10, 3)
    # membership must not depend on how rows are batched
    m2 = np.concatenate(
        [hash_sample_mask(ids[i : i + 7777], 10, 3)
         for i in range(0, len(ids), 7777)]
    )
    assert np.array_equal(m1, m2)
    # ~10% with slack; all residues together cover everything exactly once
    assert 0.08 < m1.mean() < 0.12
    all_m = sum(
        hash_sample_mask(ids, 10, r).astype(int) for r in range(10)
    )
    assert np.array_equal(all_m, np.ones(len(ids), dtype=int))


def test_redact_pii_masks_and_counts():
    batch = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "mail a.b-c%d+e@sub.domain.org and f@g.io today",
                "call 555-0199 or 800-1234 x9",
                "clean text, no pii here 12-34",
            ],
        }
    )
    out = redact_pii(batch).to_pydict()
    assert out["n_emails"] == [2, 0, 0]
    assert out["n_phones"] == [0, 2, 0]
    assert out["redacted"][0] == "mail <EMAIL> and <EMAIL> today"
    assert out["redacted"][1] == "call <PHONE> or <PHONE> x9"
    assert out["redacted"][2] == "clean text, no pii here 12-34"


def test_contamination_prober_planted(ray_session):
    import ray

    from sick_ray.functions.curate import make_contamination_prober

    bench_text = "zebra yak xenon walrus vole urchin tapir snail"
    texts = [
        "prefix " + bench_text + " suffix",     # contains the 8-gram
        "zebra yak xenon walrus vole urchin tapir",  # only 7 shared tokens
        "totally unrelated words here spread over many tokens now",
    ]
    col = pa.array([bench_text], type=pa.string())
    th, offs = tokenize_hashes_col(col)
    g, _ = ngram_hashes(th, offs, 8)
    bench_ref = ray.put(np.sort(np.unique(g.view(np.int64))))
    probe = make_contamination_prober(bench_ref, k=8)
    out = probe(pa.table({"doc_id": [0, 1, 2], "text": texts})).to_pydict()
    assert out["contaminated"] == [1, 0, 0]


def test_email_phone_patterns_are_re2_safe():
    import re

    # compiles under Python re too (no RE2-only syntax sneaking in)
    re.compile(EMAIL_RE)
    re.compile(PHONE_RE)
