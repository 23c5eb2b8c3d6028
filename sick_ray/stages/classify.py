"""Trained quality classifier: distributed logistic regression over
per-document text features — the supervised twin of ``kmeans_lloyd``'s
iterative-refinement pattern (fasttext-style quality filtering in GPT-3 /
LLaMA data pipelines: train a linear model against a labeled reference,
then score the whole corpus).

Execution shape (100 TB): full-batch gradient descent, one streaming
pass per iteration. The weight vector (d+1 floats) is broadcast once per
iteration via ``ray.put``; every batch computes its feature matrix from
the zero-copy tokenizer, emits a d+1-float gradient partial, and the
driver folds those tiny partials — O(d) driver state, NO shuffle, the
corpus never moves. Scoring is one more stateless ``map_batches`` pass.

Determinism: features and labels are exact (integer counts and IEEE
int/int divisions, identical in DuckDB SQL), so the oracle can retrain
the SAME 25-iteration GD in a recursive CTE and compare integer CLASS
predictions. Weights depend on float summation order (blocks vs SQL), so
like the kmeans oracle the comparison is valid only when every doc's
final |z| margin exceeds the ~1e-13 weight drift — measured and noted in
the query docstring. (SQL trap found while building the oracle: the
recursive CTE's weight columns take their type from the ANCHOR row, so
bare ``0.0`` literals make them DECIMAL(2,1) and silently round every
iteration — the anchor must CAST to DOUBLE.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sick_ray.functions.curate import _doc_index, _per_doc_run_stats
from sick_ray.stages.minhash import tokenize_hashes_col

N_FEATURES = 4  # bias, n_tokens/100, distinct_ratio, top_token_ratio


def doc_features_labels(batch: pa.Table, text_col: str = "text"):
    """(X float64 (n, 4), y float64 (n,)) from a documents batch.

    Features: [1, n_tokens/100, n_distinct/n_tokens, top_count/n_tokens]
    (0 where n_tokens == 0). Label: lexical-diversity rule
    ``n_distinct * 2 >= n_tokens`` (distinct ratio >= 0.5 — the corpus
    median, so classes are balanced and learning is observable) — an
    integer comparison, so engine and SQL labels agree exactly. Swap the
    label for a real reference-corpus flag in production; the training
    machinery is label-agnostic.
    """
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    th, offs = tokenize_hashes_col(col)
    total, distinct, top = _per_doc_run_stats(th, _doc_index(offs), n)
    safe = np.maximum(total, 1).astype(np.float64)
    X = np.column_stack([
        np.ones(n, dtype=np.float64),
        total / 100.0,
        np.where(total > 0, distinct / safe, 0.0),
        np.where(total > 0, top / safe, 0.0),
    ])
    y = (distinct * 2 >= total).astype(np.float64)
    return X, y


def train_logreg_quality(docs_ds, iters: int = 25, lr: float = 2.0,
                         id_col: str = "doc_id", text_col: str = "text"):
    """Train the logistic quality classifier on the full corpus and score
    it: returns ``(Dataset (doc_id, label:int64, pred:int64), w (4,))``.

    Update rule (must stay in lockstep with SQL_QUALITY_CLASSIFIER's
    recursive CTE): ``w -= lr * sum((sigmoid(Xw) - y) * X) / n_docs``,
    w0 = 0, ``iters`` full-batch iterations.
    """
    import pandas as pd
    import ray

    # Featurize ONCE: the corpus is tokenized a single time into a tiny
    # (doc_id, x0..x3, y) table (~40 B/doc) that all GD iterations and
    # the final scoring pass stream over — never re-read the text. Same
    # floats, so the SQL oracle is unaffected.
    def featurize(batch: pa.Table) -> pa.Table:
        X, y = doc_features_labels(batch, text_col)
        cols = {id_col: batch.column(id_col)}
        for j in range(N_FEATURES):
            cols[f"x{j}"] = pa.array(X[:, j], type=pa.float64())
        cols["y"] = pa.array(y, type=pa.float64())
        return pa.table(cols)

    feats = docs_ds.map_batches(featurize, batch_format="pyarrow").materialize()

    def xy(batch: pa.Table):
        X = np.column_stack([
            batch.column(f"x{j}").to_numpy(zero_copy_only=False)
            for j in range(N_FEATURES)
        ])
        return X, batch.column("y").to_numpy(zero_copy_only=False)

    w = np.zeros(N_FEATURES, dtype=np.float64)

    for _ in range(iters):
        wref = ray.put(w)

        def gpart(batch: pa.Table) -> pa.Table:
            X, y = xy(batch)
            z = X @ ray.get(wref)
            p = 1.0 / (1.0 + np.exp(-z))
            g = (p - y) @ X
            return pa.table({
                "j": pa.array(np.arange(N_FEATURES, dtype=np.int64)),
                "g": pa.array(g, type=pa.float64()),
                "n": pa.array(np.full(N_FEATURES, len(y), dtype=np.int64)),
            })

        parts = feats.map_batches(gpart, batch_format="pyarrow").to_pandas()
        agg = parts.groupby("j", as_index=True).agg(
            g=("g", "sum"), n=("n", "sum")).sort_index()
        n_docs = int(agg["n"].iloc[0])
        w = w - lr * agg["g"].to_numpy() / n_docs

    wref = ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        X, y = xy(batch)
        z = X @ ray.get(wref)
        return pa.table({
            id_col: batch.column(id_col),
            "label": pa.array(y.astype(np.int64)),
            "pred": pa.array((z >= 0).astype(np.int64)),
        })

    return feats.map_batches(score, batch_format="pyarrow"), w
