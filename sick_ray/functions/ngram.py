"""N-gram Jaccard utilities — exact similarity for verification and small
candidate sets.

This is the oracle-side companion of the MinHash estimate: exact Jaccard
over word k-shingles (`synth.shingle_set` semantics, hashed). Pairwise
verification is vectorized over sorted shingle-hash arrays (merge-style
intersection counting), used to (a) verify candidate pairs exactly instead
of by signature when the caller wants precision, and (b) compute the
recall oracle on planted pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sick_ray.stages.minhash import shingle_hashes, tokenize_hashes


def shingle_hash_sets(texts: list[str], k: int = 5, seed: int = 0) -> list[np.ndarray]:
    """Sorted unique shingle-hash array per text."""
    th, toff = tokenize_hashes(texts, seed=seed)
    sh, soff = shingle_hashes(th, toff, k)
    return [
        np.unique(sh[soff[i] : soff[i + 1]]) for i in range(len(texts))
    ]


def jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted unique uint64 arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def make_joined_verifier(cfg, threshold: float):
    """map_batches fn over JOINED candidate edges (u, v, text_u, text_v):
    keep pairs whose exact k-shingle Jaccard ≥ threshold. The texts arrive
    by a distributed hash join of the (small) edge set against the corpus
    — no driver-side text materialization (round-1 scale killer)."""

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(["u", "v"])
        tu = batch.column("text_u").to_pylist()
        tv = batch.column("text_v").to_pylist()
        sets = shingle_hash_sets(
            [t or "" for t in tu] + [t or "" for t in tv],
            k=cfg.shingle_k, seed=cfg.seed,
        )
        n = len(tu)
        keep = [jaccard_sorted(sets[i], sets[n + i]) >= threshold for i in range(n)]
        return batch.filter(pa.array(keep)).select(["u", "v"])

    return verify


