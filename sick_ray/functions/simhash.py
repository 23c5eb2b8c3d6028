"""SimHash near-dup detection (Charikar 2002) — the bit-sketch alternative
to MinHash: 64-bit signature whose Hamming distance tracks cosine
similarity of the token multiset.

Vectorized per batch: token hashes (shared tokenizer/xxh64 path with the
MinHash stage) → per-doc signed bit sums via ``np.add.reduceat`` → sign →
packed uint64. Candidate generation uses the standard 4×16-bit block LSH:
two docs within Hamming distance 3 share at least one of 4 exact 16-bit
blocks (pigeonhole), so a hash-partitioned groupby per block surfaces all
candidates; exact Hamming verification then filters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sick_ray.config import DedupConfig
from sick_ray.shuffle import grouped_apply, mix64, segment_pairs, sort_index
from sick_ray.stages.minhash import tokenize_hashes, tokenize_hashes_col

U64 = np.uint64
N_BLOCKS = 4
BLOCK_BITS = 16


def simhash_batch(texts, seed: int = 0) -> np.ndarray:
    """64-bit simhash per text (uint64 array). ``texts``: list[str] or
    Arrow string column (zero-copy tokenizer path)."""
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        th, offsets = tokenize_hashes_col(texts, seed=seed)
    else:
        th, offsets = tokenize_hashes(texts, seed=seed)
    n = len(texts)
    sig = np.zeros(n, dtype=np.uint64)
    if len(th) == 0:
        return sig
    counts = offsets[1:] - offsets[:-1]
    nonempty = np.flatnonzero(counts > 0)
    starts = offsets[nonempty]
    # per-bit ±1 sums, chunked over bit groups to bound memory
    acc = np.zeros((len(nonempty), 64), dtype=np.int64)
    for b0 in range(0, 64, 16):
        bits = (th[:, None] >> np.arange(b0, b0 + 16, dtype=np.uint64)) & U64(1)
        pm = bits.astype(np.int64) * 2 - 1
        acc[:, b0 : b0 + 16] = np.add.reduceat(pm, starts, axis=0)
    bits_set = (acc > 0).astype(np.uint64)
    val = (bits_set << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    sig[nonempty] = val
    return sig


def add_simhash(batch: pa.Table) -> pa.Table:
    sig = simhash_batch(batch.column("text"))
    return batch.append_column("simhash", pa.array(sig.view(np.int64), type=pa.int64()))


def explode_blocks(batch: pa.Table, id_col: str = "fp64") -> pa.Table:
    """(id, simhash) → 4 rows (block bucket key, id, simhash)."""
    sig = batch.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    n = len(sig)
    keys = []
    for blk in range(N_BLOCKS):
        block = (sig >> U64(blk * BLOCK_BITS)) & U64((1 << BLOCK_BITS) - 1)
        keys.append(mix64(block * U64(0x9E3779B185EBCA87) + U64(blk)).view(np.int64))
    return pa.table(
        {
            "bkt": pa.array(np.concatenate(keys), type=pa.int64()),
            "id": pa.array(np.tile(ids, N_BLOCKS), type=pa.int64()),
            "simhash": pa.array(np.tile(sig.view(np.int64), N_BLOCKS), type=pa.int64()),
        }
    )


def make_simhash_edges(max_hamming: int, cap: int = 65536):
    """Per-partition: for each block bucket, ALL within-bucket pairs
    (shuffle.segment_pairs — hub-spoke stars dropped true pairs whenever
    the bucket's first member was within max_hamming of neither, breaking
    the pigeonhole completeness guarantee; ADVICE.md r1) verified by exact
    Hamming distance ≤ max_hamming."""

    def emit(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {"u": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64()),
                 "kind": pa.array([], type=pa.int8())}
            )
        bkt = part.column("bkt").to_numpy(zero_copy_only=False)
        ids = part.column("id").to_numpy(zero_copy_only=False)
        sig = part.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        order = sort_index(bkt, ids)
        bk, idn, sg = bkt[order], ids[order], sig[order]
        i_idx, j_idx, tp, tg = segment_pairs(bk, cap)
        u, v = idn[i_idx], idn[j_idx]
        x = sg[i_idx] ^ sg[j_idx]
        # popcount via uint8 lookup
        lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)
        ham = lut[x.view(np.uint8).reshape(-1, 8)].sum(axis=1)
        keep = (ham <= max_hamming) & (u != v)
        out_u = [u[keep]]
        out_v = [v[keep]]
        out_k = [np.zeros(int(keep.sum()), dtype=np.int8)]
        if tp or tg:
            # counter row: oversized buckets degraded to star+chain — the
            # shortfall is COUNTED, never silent (kind=2, u=pairs, v=groups)
            out_u.append(np.array([tp], dtype=np.int64))
            out_v.append(np.array([tg], dtype=np.int64))
            out_k.append(np.full(1, 2, dtype=np.int8))
        return pa.table(
            {"u": pa.array(np.concatenate(out_u), type=pa.int64()),
             "v": pa.array(np.concatenate(out_v), type=pa.int64()),
             "kind": pa.array(np.concatenate(out_k), type=pa.int8())}
        )

    return emit


def simhash_edges(ds, cfg: DedupConfig | None = None, max_hamming: int = 3,
                  id_col: str = "fp64", counters: dict | None = None):
    """Dataset with (id_col, simhash) → candidate duplicate edges (u, v).

    ``counters``: optional dict filled with truncated_pairs /
    truncated_groups from the capped per-bucket emitter."""
    cfg = cfg or DedupConfig()
    blocks = ds.map_batches(
        lambda b: explode_blocks(b, id_col), batch_format="pyarrow"
    )
    raw = grouped_apply(
        blocks, ["bkt"], make_simhash_edges(max_hamming), num_partitions=cfg.num_partitions
    )
    from sick_ray.shuffle import collect_counter_rows, kind_filter

    raw = collect_counter_rows(raw, counters, "truncated_pairs", "truncated_groups")
    return raw.map_batches(kind_filter(0), batch_format="pyarrow").select_columns(["u", "v"])
