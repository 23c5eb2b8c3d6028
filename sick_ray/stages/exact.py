"""Stage 1 — exact dedup via content fingerprints.

The distribution-safe re-architecture of the reference's hash-consing: sick
interns every value through a driver-local reverse map ``value -> index``
(json-sick-scala ``izumi/sick/eba/builder/DeduplicatingRefTableBuilder.scala:17-26``,
C# ``SickSharp/Encoder/Bijection.cs:133-146``). A shared mutable map cannot
scale across nodes, so we content-address instead: ``fp64 =
xxh64(text_bytes)`` computed in a zero-copy Arrow ``map_batches``, then a
hash shuffle (``groupby('fp64')``) with a commutative keep-first reduction
(min ``(warc_ts, url)``) — identical results at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from sick_ray.shuffle import first_mask, grouped_apply
from sick_ray.config import DedupConfig

from sick_ray.xxh import xxh64_strings

FP_SEED = 0


def add_fingerprints(batch: pa.Table) -> pa.Table:
    """map_batches fn: append ``fp64:uint64`` (xxh64 of utf-8 text bytes)
    and ``n_bytes:int64`` columns. Zero-copy read of the Arrow buffers."""
    text = batch.column("text")
    fp = xxh64_strings(text, seed=FP_SEED)
    nb = pc.binary_length(text.cast(pa.large_binary()))  # bytes, not codepoints
    # int64 bit-view: Ray Data shuffle keys must avoid uint64 (values above
    # int64 max fall back to python objects inside Ray's aggregate); final
    # outputs re-interpret back to uint64
    batch = batch.append_column("fp64", pa.array(fp.view(np.int64), type=pa.int64()))
    batch = batch.append_column("n_bytes", nb.cast(pa.int64()))
    return batch


def _keep_first_partition(part: pa.Table) -> pa.Table:
    """Vectorized keep-first over ALL fp64 groups in one hash partition:
    canonical row per fp64 = min (warc_ts, url). Commutative + associative
    with explicit tie-break, so Ray's unordered block execution cannot
    change the result (SURVEY.md §4.2 "ordering"). The multi-key sort is
    Arrow's C++ kernel — no Python object arrays on this reduce path."""
    if part.num_rows <= 1:
        return part
    fp = part.column("fp64").to_numpy(zero_copy_only=False)
    order = pc.sort_indices(
        part,
        sort_keys=[("fp64", "ascending"), ("warc_ts", "ascending"),
                   ("url", "ascending")],
    ).to_numpy(zero_copy_only=False)
    keep = order[first_mask(fp[order])]
    return part.take(pa.array(np.sort(keep)))


def exact_dedup(docs, cfg=None):
    """``docs`` Dataset (url, warc_ts, lang, fp64, n_bytes, sig, ...) →
    canonical Dataset with exactly one row per distinct fp64.

    Two-phase hash aggregate (see sick_ray.shuffle): per-batch partial
    distinct map-side, then one whole-partition vectorized keep-first —
    never a per-key Python call."""
    cfg = cfg or DedupConfig()
    return grouped_apply(
        docs,
        ["fp64"],
        _keep_first_partition,
        num_partitions=cfg.num_partitions,
        partial=partial_distinct,
    )


def partial_distinct(batch: pa.Table) -> pa.Table:
    """Pre-shuffle combiner: drop duplicate fp64 rows *within a batch*
    (keeping the min (warc_ts, url) row) before the wide groupby — the
    partial-aggregation pattern that keeps the shuffle small when exact-dup
    groups co-occur inside a block."""
    fp = batch.column("fp64").to_numpy(zero_copy_only=False)
    if len(np.unique(fp)) == batch.num_rows:
        return batch
    return _keep_first_partition(batch)
