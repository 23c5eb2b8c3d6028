"""Similarity search over an embedding column (``list<float>``).

- ``knn_bruteforce``: exact cosine top-k. The query matrix is broadcast
  once (``ray.put``); every batch does one float32 matmul against it and
  emits only its per-batch top-k rows; the driver merges the tiny partials.
  This is the baseline and the verification oracle for the ANN variants.
- ``knn_lsh``: random-hyperplane LSH (Charikar): bucket by sign-pattern
  over ``n_planes`` hyperplanes × ``n_tables`` tables, score only bucket
  collisions — the scale path (candidates ≪ n per query).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from sick_ray.shuffle import grouped_apply, mix64, segment_pairs, sort_index

from sick_ray.config import AnnConfig


def _emb_matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        width = col.type.list_size
        return col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), width)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    offs = np.asarray(col.offsets)
    width = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return flat.reshape(len(col), width)


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def knn_bruteforce(emb_ds, queries: np.ndarray, k: int = 10,
                   id_col: str = "vec_id", emb_col: str = "embedding"):
    """Exact cosine top-k of every query against the dataset.

    Returns pa.Table (query_id:int64, vec_id:int64, cosine:float64, rank:
    int64), rank 0 = best, ties broken by vec_id (deterministic).
    """
    import ray

    qn = _normalize(np.atleast_2d(np.asarray(queries)))
    q_ref = ray.put(qn)

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        m = _normalize(_emb_matrix(batch.column(emb_col)))
        scores = q @ m.T                                   # (nq, nb)
        nq, nb = scores.shape
        kk = min(k, nb)
        part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        rows = {
            "query_id": np.repeat(np.arange(nq, dtype=np.int64), kk),
            "vec_id": ids[part.reshape(-1)].astype(np.int64),
            "cosine": np.take_along_axis(scores, part, axis=1).reshape(-1),
        }
        return pa.table(rows)

    partials = emb_ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    # driver merge of the small per-batch top-k sets
    out = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(len(g), dtype=np.int64))
        out.append(g)
    import pandas as pd

    merged = pd.concat(out, ignore_index=True) if out else partials.assign(rank=[])
    merged["cosine"] = merged["cosine"].round(6)
    return pa.Table.from_pandas(merged[["query_id", "vec_id", "cosine", "rank"]],
                                preserve_index=False)


class HyperplaneHasher:
    """Shared LSH state: ``n_tables`` × ``n_planes`` random hyperplanes
    (seeded). Built once per actor / broadcast once."""

    def __init__(self, dim: int, cfg: AnnConfig):
        rng = np.random.default_rng(cfg.seed + 0xA11)
        self.planes = rng.standard_normal((cfg.n_tables, cfg.n_planes, dim))
        self.cfg = cfg

    def bucket_keys(self, m: np.ndarray) -> np.ndarray:
        """(n, n_tables) int64 bucket keys (table id mixed into the key)."""
        n = m.shape[0]
        keys = np.empty((n, self.planes.shape[0]), dtype=np.int64)
        for t in range(self.planes.shape[0]):
            bits = (m @ self.planes[t].T) > 0                 # (n, n_planes)
            val = np.zeros(n, dtype=np.uint64)
            for j in range(bits.shape[1]):
                val = (val << np.uint64(1)) | bits[:, j].astype(np.uint64)
            keys[:, t] = mix64(val * np.uint64(0x9E3779B185EBCA87) + np.uint64(t)).view(
                np.int64
            )
        return keys


def embedding_near_dup_edges(emb_ds, threshold: float = 0.95,
                             cfg: AnnConfig | None = None,
                             id_col: str = "vec_id", emb_col: str = "embedding",
                             num_partitions: int = 32):
    """Embedding-cosine near-duplicate candidate edges (u, v, cosine).

    Hyperplane-LSH bucket shuffle (same family as knn_lsh) → per-partition
    star candidates per bucket → exact cosine verify ≥ threshold. The
    embedding payload rides the bucket rows once per table; for very wide
    embeddings lower cfg.n_tables or pre-reduce dimensionality upstream.
    """
    import pyarrow.compute as pc  # noqa: F401  (kept for parity with callers)

    cfg = cfg or AnnConfig()
    state = {}

    def bucket_rows(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch.column(emb_col)))
        if "h" not in state:
            state["h"] = HyperplaneHasher(m.shape[1], cfg)
        keys = state["h"].bucket_keys(m)                     # (n, T)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n, T = keys.shape
        emb_fixed = np.ascontiguousarray(m, dtype=np.float32)
        dim = emb_fixed.shape[1]
        reps = pa.FixedSizeListArray.from_arrays(
            pa.array(np.tile(emb_fixed, (T, 1)).reshape(-1), type=pa.float32()), dim
        )
        return pa.table(
            {
                "bkt": pa.array(keys.T.reshape(-1), type=pa.int64()),
                "id": pa.array(np.tile(ids, T), type=pa.int64()),
                "emb": reps,
            }
        )

    def emit(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {"u": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64())}
            )
        bkt = part.column("bkt").to_numpy(zero_copy_only=False)
        ids = part.column("id").to_numpy(zero_copy_only=False)
        emb_col_ = part.column("emb")
        if isinstance(emb_col_, pa.ChunkedArray):
            emb_col_ = emb_col_.combine_chunks()
        dim = emb_col_.type.list_size
        m = emb_col_.flatten().to_numpy(zero_copy_only=False).reshape(len(part), dim)
        order = sort_index(bkt, ids)
        bk, idn = bkt[order], ids[order]
        # ALL within-bucket pairs (hub-spoke stars dropped true near-dup
        # pairs when the hub was dissimilar to both — ADVICE.md r1)
        i_idx, j_idx, _, _ = segment_pairs(bk, cap=65536)
        ui = order[i_idx]
        vi = order[j_idx]
        cos = np.einsum("ij,ij->i", m[ui].astype(np.float64), m[vi].astype(np.float64))
        keep = (cos >= threshold) & (ids[ui] != ids[vi])
        return pa.table(
            {
                "u": pa.array(np.minimum(ids[ui][keep], ids[vi][keep]), type=pa.int64()),
                "v": pa.array(np.maximum(ids[ui][keep], ids[vi][keep]), type=pa.int64()),
                "cosine": pa.array(np.round(cos[keep], 6), type=pa.float64()),
            }
        )

    rows = emb_ds.map_batches(bucket_rows, batch_format="pyarrow")
    return grouped_apply(rows, ["bkt"], emit, num_partitions=num_partitions)


def knn_lsh(emb_ds, queries: np.ndarray, k: int = 10, cfg: AnnConfig | None = None,
            id_col: str = "vec_id", emb_col: str = "embedding"):
    """Approximate cosine top-k: score only vectors sharing ≥1 hyperplane-LSH
    bucket with the query (any of n_tables). Same output schema as
    knn_bruteforce; recall measured against it in tests."""
    import ray

    cfg = cfg or AnnConfig()
    qm = _normalize(np.atleast_2d(np.asarray(queries)))
    dim = qm.shape[1]
    hasher = HyperplaneHasher(dim, cfg)
    qkeys = hasher.bucket_keys(qm)                           # (nq, T)
    state_ref = ray.put((qm, qkeys, hasher.planes))

    def partial(batch: pa.Table) -> pa.Table:
        q, qk, planes = ray.get(state_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        m = _normalize(_emb_matrix(batch.column(emb_col)))
        h = HyperplaneHasher.__new__(HyperplaneHasher)
        h.planes = planes
        keys = h.bucket_keys(m)                              # (nb, T)
        # candidates: any table key matches any query's key for that table.
        # Vectorized run expansion: sort batch keys per table, locate each
        # query's run by searchsorted(left/right), expand via repeat/cumsum.
        nq = q.shape[0]
        out_q, out_v = [], []
        for t in range(keys.shape[1]):
            kt = keys[:, t]
            order = np.argsort(kt)
            ks = kt[order]
            lo = np.searchsorted(ks, qk[:, t], side="left")
            cnt = np.searchsorted(ks, qk[:, t], side="right") - lo
            total = int(cnt.sum())
            if not total:
                continue
            off = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            out_q.append(np.repeat(np.arange(nq), cnt))
            out_v.append(order[np.repeat(lo, cnt) + off])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        qi = np.concatenate(out_q)
        vi = np.concatenate(out_v)
        pair = np.unique(qi * (1 << 32) + vi)
        qi, vi = pair >> 32, pair & ((1 << 32) - 1)
        cos = np.einsum("ij,ij->i", q[qi], m[vi])
        return pa.table(
            {
                "query_id": pa.array(qi.astype(np.int64)),
                "vec_id": pa.array(ids[vi].astype(np.int64)),
                "cosine": pa.array(cos, type=pa.float64()),
            }
        )

    partials = emb_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    import pandas as pd

    out = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(len(g), dtype=np.int64))
        out.append(g)
    merged = pd.concat(out, ignore_index=True) if out else partials.assign(rank=[])
    merged["cosine"] = merged["cosine"].round(6)
    return pa.Table.from_pandas(merged[["query_id", "vec_id", "cosine", "rank"]],
                                preserve_index=False)


# ------------------------------------------------------------------- IVF ----

def train_centroids(emb_ds, n_centroids: int, emb_col: str = "embedding",
                    sample_rows: int = 20_000, iters: int = 8, seed: int = 0):
    """IVF coarse quantizer: k-means on a bounded sample.

    The sample (first ``sample_rows`` rows — deterministic) is the ONLY
    data pulled to the driver; Lloyd iterations run on that bounded matrix.
    At 100 TB the sample bound (not the corpus) governs driver memory, and
    the trained centroid matrix (n_centroids × dim floats) is the broadcast
    state every assignment task reads from the object store.
    """
    sample = pa.concat_tables(
        list(
            emb_ds.limit(sample_rows).iter_batches(
                batch_size=sample_rows, batch_format="pyarrow"
            )
        )
    )
    m = _normalize(_emb_matrix(sample.column(emb_col)))
    rng = np.random.default_rng(seed + 0x1F)
    idx = rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)
    cent = m[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)           # cosine on unit vecs
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_assign(emb_ds, centroids_ref, id_col: str = "vec_id",
               emb_col: str = "embedding"):
    """Append the nearest-centroid list id per vector (one matmul per
    batch against the broadcast centroid matrix)."""
    import ray

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(centroids_ref)
        m = _normalize(_emb_matrix(batch.column(emb_col)))
        lid = np.argmax(m @ cent.T, axis=1).astype(np.int64)
        return batch.append_column("list_id", pa.array(lid, type=pa.int64()))

    return emb_ds.map_batches(assign, batch_format="pyarrow")


def knn_ivf(emb_ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
            nprobe: int = 4, id_col: str = "vec_id", emb_col: str = "embedding",
            seed: int = 0):
    """IVF approximate kNN — the scale path for corpus-side pruning.

    Train a coarse quantizer on a bounded sample, assign every vector to
    its nearest centroid (inverted lists), then score ONLY vectors whose
    list is among each query's ``nprobe`` closest centroids: per batch one
    boolean membership mask + one matmul over the surviving rows. Scanned
    fraction ≈ nprobe / n_centroids of the corpus vs. brute force. Same
    output schema as knn_bruteforce; recall vs. brute is gated in tests.
    """
    import pandas as pd
    import ray

    qm = _normalize(np.atleast_2d(np.asarray(queries)))
    cent = train_centroids(emb_ds, n_centroids, emb_col=emb_col, seed=seed)
    cent_ref = ray.put(cent)
    # per query: the nprobe nearest centroid ids
    qsims = qm @ cent.T
    probe = np.argsort(-qsims, axis=1)[:, :nprobe]            # (nq, nprobe)
    state_ref = ray.put((qm, probe))

    assigned = ivf_assign(emb_ds, cent_ref, id_col=id_col, emb_col=emb_col)

    def partial(batch: pa.Table) -> pa.Table:
        q, pr = ray.get(state_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        lid = batch.column("list_id").to_numpy(zero_copy_only=False)
        m = _normalize(_emb_matrix(batch.column(emb_col)))
        out_q, out_v, out_c = [], [], []
        for qi in range(q.shape[0]):
            mask = np.isin(lid, pr[qi])
            if not mask.any():
                continue
            cos = m[mask] @ q[qi]
            kk = min(k, len(cos))
            top = np.argpartition(-cos, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_v.append(ids[mask][top].astype(np.int64))
            out_c.append(cos[top])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cosine": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )

    partials = assigned.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(len(g), dtype=np.int64))
        out.append(g)
    merged = pd.concat(out, ignore_index=True) if out else partials.assign(rank=[])
    merged["cosine"] = merged["cosine"].round(6)
    return pa.Table.from_pandas(merged[["query_id", "vec_id", "cosine", "rank"]],
                                preserve_index=False)
