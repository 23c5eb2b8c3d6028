"""Blocked distributed cross join — exact all-pairs similarity without any
driver-side or broadcast O(n) structure.

The classic "R² blocking" shape: every vector is assigned a block
``b = mix(id) % B`` and replicated to the B unordered block-pair groups
``{(min(b,t), max(b,t)) : t < B}``; a hash-partitioned grouped_apply then
computes each block pair's full cross product exactly once, vectorized as
one float64 matmul per pair. Replication factor is B (≈ √cluster at scale,
the standard trade: n·B shuffled rows buy n²/B-free exact coverage), and
the number of groups is B(B+1)/2 — small by construction, so the per-group
Python loop inside a partition is O(B²), never O(n).

This is the exact-verification counterpart of the LSH candidate path
(stages/ann.embedding_near_dup_edges) and its DuckDB-oracle: identical
output schema (u, v, cosine) at recall 1.0 by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sick_ray.shuffle import U64, first_mask, grouped_apply, mix64, sort_index
from sick_ray.stages.ann import _emb_matrix, _normalize


def _replicate(n_blocks: int, id_col: str, emb_col: str):
    B = n_blocks

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_emb_matrix(batch.column(emb_col))).astype(np.float32)
        n, dim = m.shape
        blk = (mix64(ids.view(np.uint64)) % U64(B)).astype(np.int64)
        t = np.tile(np.arange(B, dtype=np.int64), n)
        b_rep = np.repeat(blk, B)
        lo = np.minimum(b_rep, t)
        hi = np.maximum(b_rep, t)
        gkey = lo * B + hi
        emb_rep = pa.FixedSizeListArray.from_arrays(
            pa.array(np.repeat(m, B, axis=0).reshape(-1), type=pa.float32()), dim
        )
        return pa.table(
            {
                "gkey": pa.array(gkey, type=pa.int64()),
                "blk": pa.array(b_rep, type=pa.int64()),
                "id": pa.array(np.repeat(ids, B), type=pa.int64()),
                "emb": emb_rep,
            }
        )

    return emit


def _pair_scores(n_blocks: int, threshold: float):
    B = n_blocks

    def score(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "u": pa.array([], type=pa.int64()),
                "v": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
        if part.num_rows == 0:
            return empty
        gkey = part.column("gkey").to_numpy(zero_copy_only=False)
        blk = part.column("blk").to_numpy(zero_copy_only=False)
        ids = part.column("id").to_numpy(zero_copy_only=False)
        emb_col = part.column("emb")
        if isinstance(emb_col, pa.ChunkedArray):
            emb_col = emb_col.combine_chunks()
        dim = emb_col.type.list_size
        m = emb_col.flatten().to_numpy(zero_copy_only=False).reshape(len(part), dim)
        order = sort_index(gkey, blk, ids)
        g_s = gkey[order]
        starts = np.flatnonzero(first_mask(g_s))
        ends = np.append(starts[1:], len(g_s))
        out_u, out_v, out_c = [], [], []
        # ≤ B(B+1)/2 groups per partition — bounded loop, not O(n)
        for s, e in zip(starts, ends):
            rows = order[s:e]
            g = int(g_s[s])
            lo, hi = g // B, g % B
            # drop duplicate ids within each side (same vector can arrive
            # in several input batches)
            if lo == hi:
                ii = rows[blk[rows] == lo]
                uid, uniq = np.unique(ids[ii], return_index=True)
                ii = ii[uniq]
                if len(ii) < 2:
                    continue
                mm = m[ii].astype(np.float64)
                cos = mm @ mm.T
                iu, iv = np.triu_indices(len(ii), k=1)
                cu, cv, cc = uid[iu], uid[iv], cos[iu, iv]
            else:
                ai = rows[blk[rows] == lo]
                bi = rows[blk[rows] == hi]
                aid, au = np.unique(ids[ai], return_index=True)
                bid, bu = np.unique(ids[bi], return_index=True)
                ai, bi = ai[au], bi[bu]
                if len(ai) == 0 or len(bi) == 0:
                    continue
                cos = m[ai].astype(np.float64) @ m[bi].astype(np.float64).T
                iu, iv = np.meshgrid(np.arange(len(ai)), np.arange(len(bi)),
                                     indexing="ij")
                cu = aid[iu.ravel()]
                cv = bid[iv.ravel()]
                cc = cos.ravel()
            keep = cc >= threshold
            if keep.any():
                uu, vv = cu[keep], cv[keep]
                out_u.append(np.minimum(uu, vv))
                out_v.append(np.maximum(uu, vv))
                out_c.append(cc[keep])
        if not out_u:
            return empty
        return pa.table(
            {
                "u": pa.array(np.concatenate(out_u), type=pa.int64()),
                "v": pa.array(np.concatenate(out_v), type=pa.int64()),
                "cosine": pa.array(np.round(np.concatenate(out_c), 4),
                                   type=pa.float64()),
            }
        )

    return score


def all_pairs_cosine(emb_ds, threshold: float, n_blocks: int = 4,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     num_partitions: int = 32):
    """Exact all-pairs cosine ≥ threshold → Dataset (u, v, cosine), u < v,
    each unordered pair exactly once."""
    rows = emb_ds.map_batches(
        _replicate(n_blocks, id_col, emb_col), batch_format="pyarrow"
    )
    return grouped_apply(
        rows, ["gkey"], _pair_scores(n_blocks, threshold),
        num_partitions=num_partitions,
    )
