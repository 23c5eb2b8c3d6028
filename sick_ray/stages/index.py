"""Persistent MinHash/LSH dedup index — build once, probe incrementally.

The production monthly-snapshot workflow: an already-ingested corpus is
frozen into a narrow on-disk index (signatures + LSH band buckets +
config-identity manifest); each later crawl computes its OWN signatures
and probes the frozen buckets for cross-snapshot near-duplicates without
ever re-reading or re-shuffling the old corpus. This is the direct
analogue of the reference's freeze-then-reopen lifecycle — the encoder
writes the content-addressed tables once and ``SickReader`` re-opens them
for queries (json-sick-scala ``EBAWriter.scala:19-61`` /
``SickSharp/Format/SickReader.cs:121-157``) — re-expressed as parquet
tables a Ray Data pipeline reads back.

Scale shape:
- the index is ~0.5% of corpus bytes (520 B sigs + 16 B/band-row per
  distinct doc); text never enters it
- probing shuffles only (bkt, fp64, side) 17 B rows — the union of new
  band rows with the frozen bucket table, hash-partitioned on bkt
- per-bucket old×new cross pairs are capped with COUNTED truncation
  (the engine-wide no-silent-caps rule)
- signature verification broadcasts the union signature table below
  BROADCAST_SIG_LIMIT docs and falls back to the two-hash-join scale
  path above it (same switch as pipelines/dedup.py)
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa

from sick_ray.config import DedupConfig
from sick_ray.shuffle import first_mask, grouped_apply, sort_index
from sick_ray.stages.lsh import (
    explode_bands,
    make_sig_lookup_ref,
    verify_edges_broadcast,
    verify_edges_join,
)
from sick_ray.stages.minhash import make_minhash_fn
from sick_ray.xxh import xxh64_strings

INDEX_VERSION = 1
BROADCAST_SIG_LIMIT = 20_000_000


def _sig_identity(cfg: DedupConfig) -> dict:
    """The knobs that change signature/bucket bytes — a probe with any of
    these differing from the build config compares incompatible sketches."""
    return {
        "index_version": INDEX_VERSION,
        "shingle_k": cfg.shingle_k,
        "num_perm": cfg.num_perm,
        "seed": cfg.seed,
        "bands": cfg.bands,
        "rows_per_band": cfg.rows_per_band,
    }


def _add_fp(batch: pa.Table, text_col: str) -> pa.Table:
    """fp64 content hash + conform the text column name to "text" (the
    MinHasher contract) when the caller's corpus names it differently."""
    fp = xxh64_strings(batch.column(text_col)).view(np.int64)
    out = batch.append_column("fp64", pa.array(fp, type=pa.int64()))
    if text_col != "text":
        if "text" in out.column_names:
            # renaming would produce two "text" columns and undefined
            # downstream select/minhash behavior — refuse loudly
            raise ValueError(
                f'corpus has both text_col="{text_col}" and a "text" column;'
                ' drop or rename one before indexing'
            )
        out = out.rename_columns(
            ["text" if c == text_col else c for c in out.column_names]
        )
    return out


def _pack_sig_blobs(batch: pa.Table) -> pa.Table:
    """(fp64, sig, band_hash) with fixed_size_list columns → fixed-size
    BINARY twins for the scale-path anti join (Arrow's hash join rejects
    list-typed non-key payloads; lsh.verify_edges_join's to_blob trick)."""
    from sick_ray.stages.minhash import fsl_to_numpy

    out = {"fp64": batch.column("fp64")}
    for name in ("sig", "band_hash"):
        col = batch.column(name)
        width = col.type.list_size
        mat = np.ascontiguousarray(fsl_to_numpy(col, width))
        nbytes = mat.dtype.itemsize * width
        out[name + "_b"] = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(nbytes), batch.num_rows, [None, pa.py_buffer(mat.data)]
        )
    return pa.table(out)


def _unpack_sig_blobs(cfg: DedupConfig):
    """Inverse of :func:`_pack_sig_blobs` (zero-copy buffer views)."""
    def unblob(col, np_dt, pa_dt, width):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        w = col.type.byte_width
        vals = np.frombuffer(col.buffers()[1], dtype=np_dt,
                             count=len(col) * width, offset=col.offset * w)
        return pa.FixedSizeListArray.from_arrays(
            pa.array(vals, type=pa_dt), width
        )

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "fp64": batch.column("fp64"),
            "sig": unblob(batch.column("sig_b"), np.uint32, pa.uint32(),
                          cfg.num_perm),
            "band_hash": unblob(batch.column("band_hash_b"), np.int64,
                                pa.int64(), cfg.bands),
        })

    return f


def _distinct_sigs(part: pa.Table) -> pa.Table:
    """Keep one (sig, band_hash) row per fp64 — identical text produces an
    identical signature, so any representative is exact."""
    fp = part.column("fp64").to_numpy(zero_copy_only=False)
    order = sort_index(fp)
    keep = order[first_mask(fp[order])]
    return part.take(pa.array(np.sort(keep)))


def snapshot_sigs(docs_ds, cfg: DedupConfig, text_col: str = "text"):
    """Distinct-by-fp64 (fp64, sig, band_hash) rows of a snapshot — the
    shared front half of build/probe/extend. Returned MATERIALIZED so a
    probe-then-extend composition computes MinHash once, not per step."""
    def add_fp(batch: pa.Table) -> pa.Table:
        return _add_fp(batch, text_col)

    sigs = (
        docs_ds.map_batches(add_fp, batch_format="pyarrow")
        .map_batches(make_minhash_fn(cfg), batch_format="pyarrow",
                     batch_size=cfg.batch_size)
        .select_columns(["fp64", "sig", "band_hash"])
    )
    return grouped_apply(
        sigs, ["fp64"], _distinct_sigs, num_partitions=cfg.num_partitions
    ).materialize()


def build_dedup_index(docs_ds, index_dir: str, cfg: DedupConfig,
                      text_col: str = "text") -> dict:
    """Freeze ``docs_ds`` (any dataset with a ``text_col``) into a dedup
    index under ``index_dir``: ``signatures/`` (fp64, sig), ``buckets/``
    (bkt, fp64), ``_INDEX.json``. Returns counters. Exact-duplicate texts
    collapse to one index row (content-addressed, like the reference's
    hash-consed value tables).

    Rebuilding into an existing index dir replaces it: the stale manifest
    goes first, then stale parts — a crash mid-build must leave the dir
    unreadable (no manifest), never a mix of old and new rows
    (write_parquet APPENDS uniquely-named files; the --curate CLI uses
    the same clear-then-commit convention)."""
    stale_manifest = os.path.join(index_dir, "_INDEX.json")
    if os.path.exists(stale_manifest):
        os.unlink(stale_manifest)
    for sub in ("signatures", "buckets"):
        for f in glob.glob(os.path.join(index_dir, sub, "*.parquet")):
            os.unlink(f)

    # dedupe by content fingerprint: ~656 B/row shuffle (sig+bands), the
    # wide text column never moves
    distinct = snapshot_sigs(docs_ds, cfg, text_col)
    n_distinct = distinct.count()
    distinct.select_columns(["fp64", "sig"]).write_parquet(
        os.path.join(index_dir, "signatures")
    )
    buckets = distinct.select_columns(["fp64", "band_hash"]).map_batches(
        explode_bands, batch_format="pyarrow"
    )
    buckets.write_parquet(os.path.join(index_dir, "buckets"))
    manifest = {
        **_sig_identity(cfg),
        "n_docs_indexed": n_distinct,
    }
    tmp = os.path.join(index_dir, "_INDEX.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, "_INDEX.json"))
    return manifest


def load_index_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "_INDEX.json")) as f:
        return json.load(f)


def segment_cross_pairs(sorted_bkt: np.ndarray, side: np.ndarray, cap: int):
    """Old×new index pairs per bucket over rows sorted by (bkt, side),
    vectorized across ALL buckets at once (the cross-side analogue of
    shuffle.segment_pairs). ``side`` is 0 for index (old) rows, 1 for
    probe (new) rows. Buckets emitting more than ``cap`` pairs are
    truncated deterministically (row-major over the sorted order) and the
    shortfall is returned — counted, never silent.

    Returns (old_idx, new_idx, truncated_pairs, truncated_buckets)."""
    n = len(sorted_bkt)
    z = np.empty(0, dtype=np.int64)
    if n == 0:
        return z, z, 0, 0
    fm = first_mask(sorted_bkt)
    starts = np.flatnonzero(fm)
    sizes = np.diff(np.append(starts, n))
    # per-bucket old count = rows with side==0 (sorted: old before new)
    old_counts = np.add.reduceat((side == 0).astype(np.int64), starts)
    new_counts = sizes - old_counts
    pairs = old_counts * new_counts
    emit = np.minimum(pairs, cap)
    total = int(emit.sum())
    if total == 0:
        return z, z, int((pairs - emit).sum()), int((pairs > emit).sum())
    seg = np.repeat(np.arange(len(starts)), emit)
    base = np.concatenate([[0], np.cumsum(emit)[:-1]])
    j = np.arange(total, dtype=np.int64) - np.repeat(base, emit)
    b_seg = np.repeat(new_counts, emit)
    old_local = j // b_seg
    new_local = j - old_local * b_seg
    old_idx = np.repeat(starts, emit) + old_local
    new_idx = np.repeat(starts + old_counts, emit) + new_local
    return (old_idx, new_idx,
            int((pairs - emit).sum()), int((pairs > emit).sum()))


def _make_cross_emitter(cap: int):
    def emit(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {
                    "u": pa.array([], type=pa.int64()),
                    "v": pa.array([], type=pa.int64()),
                    "kind": pa.array([], type=pa.int8()),
                }
            )
        bkt = part.column("bkt").to_numpy(zero_copy_only=False)
        side = part.column("side").to_numpy(zero_copy_only=False)
        fp = part.column("fp64").to_numpy(zero_copy_only=False)
        order = sort_index(bkt, side, fp)
        bs, ss, fs = bkt[order], side[order], fp[order]
        # drop duplicate (bkt, side, fp) rows (a doc can hit the same
        # bucket via several bands)
        keep = first_mask(bs) | (fs != np.concatenate([[~fs[0]], fs[:-1]])) \
            | (ss != np.concatenate([[-1], ss[:-1]]))
        bs, ss, fs = bs[keep], ss[keep], fs[keep]
        oi, ni, tp, tb = segment_cross_pairs(bs, ss, cap)
        out_u = [fs[oi]]
        out_v = [fs[ni]]
        out_k = [np.zeros(len(oi), dtype=np.int8)]
        if tp or tb:
            out_u.append(np.array([tp], dtype=np.int64))
            out_v.append(np.array([tb], dtype=np.int64))
            out_k.append(np.full(1, 2, dtype=np.int8))
        return pa.table(
            {
                "u": pa.array(np.concatenate(out_u), type=pa.int64()),
                "v": pa.array(np.concatenate(out_v), type=pa.int64()),
                "kind": pa.array(np.concatenate(out_k), type=pa.int8()),
            }
        )

    return emit


def _make_grid_salter(hot_sorted: np.ndarray, g: int):
    """Skew scatter for the probe's old×new bucket shuffle: rows of a HOT
    bucket (boilerplate band values — count pre-pass over narrow rows,
    same detection as lsh.candidate_edges) are replicated into a g×g cell
    grid — old (side 0) rows to the g cells of grid-row ``h(fp)%g``, new
    (side 1) rows to the g cells of grid-column ``h(fp)%g`` — so every
    old×new pair still meets in EXACTLY one cell while each cell holds
    ~1/g of each side (the classic skewed-join grid). The pair cap then
    applies per cell (still counted, never silent); replication factor on
    hot rows is g; cold rows pass through untouched. A 2⁻⁶⁴ salted-key
    collision with a real bucket merely adds candidate pairs, which the
    signature verify step filters — the same false-positive contract as
    LSH banding itself."""
    from sick_ray.shuffle import U64, mix64
    from sick_ray.stages.lsh import _POLY

    def salt(batch: pa.Table) -> pa.Table:
        bkt = batch.column("bkt").to_numpy(zero_copy_only=False)
        if len(hot_sorted) == 0 or batch.num_rows == 0:
            return batch
        pos = np.clip(np.searchsorted(hot_sorted, bkt), 0,
                      len(hot_sorted) - 1)
        hot = hot_sorted[pos] == bkt
        if not hot.any():
            return batch
        cold_tbl = batch.filter(pa.array(~hot))
        fp = batch.column("fp64").to_numpy(zero_copy_only=False)
        side = batch.column("side").to_numpy(zero_copy_only=False)
        hb = np.repeat(bkt[hot], g).view(np.uint64)
        hf = np.repeat(fp[hot], g)
        hs = np.repeat(side[hot], g)
        k = np.tile(np.arange(g, dtype=np.uint64), int(hot.sum()))
        h = hf.view(np.uint64) % U64(g)
        row = np.where(hs == 0, h, k)
        col = np.where(hs == 0, k, h)
        cell = row * U64(g) + col
        sbkt = mix64(hb * _POLY + cell + U64(1)).view(np.int64)
        hot_tbl = pa.table({
            "bkt": pa.array(sbkt, type=pa.int64()),
            "fp64": pa.array(hf, type=pa.int64()),
            "side": pa.array(hs, type=pa.int8()),
        }).select(cold_tbl.column_names)
        return pa.concat_tables([cold_tbl, hot_tbl])

    return salt


def _distinct_uv(part: pa.Table) -> pa.Table:
    if part.num_rows == 0:
        return part
    u = part.column("u").to_numpy(zero_copy_only=False)
    v = part.column("v").to_numpy(zero_copy_only=False)
    order = sort_index(u, v)
    us, vs = u[order], v[order]
    keep = first_mask(us) | (vs != np.concatenate([[~vs[0]], vs[:-1]]))
    return pa.table(
        {
            "u": pa.array(us[keep], type=pa.int64()),
            "v": pa.array(vs[keep], type=pa.int64()),
        }
    )


def probe_dedup_index(new_docs_ds, index_dir: str, cfg: DedupConfig,
                      threshold: float | None = None,
                      text_col: str = "text",
                      counters: dict | None = None,
                      new_sigs=None):
    """Probe ``new_docs_ds`` against a frozen index: returns the verified
    near-dup pair Dataset (old_fp64, new_fp64) at estimated Jaccard ≥
    ``threshold`` (default cfg.verify_threshold). Raises ValueError on a
    config-identity mismatch with the index manifest. Pass ``new_sigs``
    (a :func:`snapshot_sigs` result) to share one MinHash pass with a
    following :func:`extend_dedup_index`."""
    import ray.data as rd

    from sick_ray.shuffle import collect_counter_rows, kind_filter

    manifest = load_index_manifest(index_dir)
    want = _sig_identity(cfg)
    got = {k: manifest.get(k) for k in want}
    if got != want:
        raise ValueError(
            f"index config mismatch: index built with {got}, probe uses {want}"
        )
    threshold = cfg.verify_threshold if threshold is None else threshold
    if new_sigs is None:
        new_sigs = snapshot_sigs(new_docs_ds, cfg, text_col)

    def tag(side_val: int):
        def f(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array(np.full(batch.num_rows, side_val, dtype=np.int8))
            )

        return f

    old_buckets = rd.read_parquet(os.path.join(index_dir, "buckets")) \
        .map_batches(tag(0), batch_format="pyarrow")
    new_buckets = new_sigs.select_columns(["fp64", "band_hash"]) \
        .map_batches(explode_bands, batch_format="pyarrow") \
        .map_batches(tag(1), batch_format="pyarrow")
    # materialized ONCE: 17 B/row narrow rows consumed by the count
    # pre-pass and again by the pair shuffle (lazy would re-read the
    # bucket parquet and re-explode per consumer)
    band_rows = old_buckets.union(new_buckets).materialize()

    # ONE count pre-pass, shared by skew detection AND the singleton-
    # bucket Bloom prefilter (same machinery as lsh.candidate_edges):
    # singleton buckets — the majority in a mostly-novel crawl — can
    # never emit an old×new pair, so they drop map-side before the sort;
    # hot/boilerplate buckets grid-scatter so no single partition task
    # holds a whole skewed bucket (each old×new pair still meets in
    # exactly one g×g cell)
    from sick_ray.stages.lsh import dup_bucket_index, make_bloom_prefilter

    hot, bloom_ref, bloom_k, _n_dup, _est_pairs, _est_rows = (
        dup_bucket_index(band_rows, cfg))
    if bloom_ref is not None and cfg.dup_bucket_prefilter:
        band_rows = band_rows.map_batches(
            make_bloom_prefilter(bloom_ref, bloom_k), batch_format="pyarrow"
        )
    if len(hot):
        g = max(2, int(np.sqrt(cfg.salt_fanout)))
        band_rows = band_rows.map_batches(_make_grid_salter(hot, g),
                                          batch_format="pyarrow")

    raw = grouped_apply(
        band_rows, ["bkt"], _make_cross_emitter(cfg.max_pairs_per_bucket),
        num_partitions=cfg.num_partitions,
    )
    raw = collect_counter_rows(raw, counters, "truncated_pairs",
                               "truncated_buckets")
    pairs = raw.map_batches(kind_filter(0), batch_format="pyarrow") \
        .select_columns(["u", "v"])
    pairs = grouped_apply(pairs, ["u", "v"], _distinct_uv,
                          num_partitions=cfg.num_partitions)

    old_sigs = rd.read_parquet(os.path.join(index_dir, "signatures"))
    n_total = manifest["n_docs_indexed"] + new_sigs.count()
    sig_union = old_sigs.union(new_sigs.select_columns(["fp64", "sig"]))
    if n_total <= BROADCAST_SIG_LIMIT:
        lookup = make_sig_lookup_ref(sig_union.materialize(), cfg.num_perm)
        return verify_edges_broadcast(pairs, lookup, threshold)
    return verify_edges_join(pairs, sig_union, threshold,
                             cfg.num_partitions)


def extend_dedup_index(new_docs_ds, index_dir: str, cfg: DedupConfig,
                       text_col: str = "text", new_sigs=None) -> dict:
    """Merge a new snapshot INTO a frozen index — the third lifecycle step
    (freeze → probe → extend), so next month's crawl probes old+new
    without any rebuild. New docs whose fp64 already exists in the index
    are skipped (the signatures table stays distinct-by-fp64, the
    content-addressed invariant); genuinely new rows are appended as new
    parquet files in the existing ``signatures/``/``buckets/`` dirs and
    the manifest count is bumped atomically. Pass ``new_sigs`` (a
    :func:`snapshot_sigs` result) to share one MinHash pass with a
    preceding :func:`probe_dedup_index`.

    Crash safety: buckets are appended BEFORE signatures. The existing-fp
    filter reads the SIGNATURES side, so a crash between the two writes
    leaves orphan bucket rows that a retry simply re-appends (duplicate
    bucket rows are deduped by the probe's (bkt, side, fp) first-mask) —
    the reverse order would make the retry skip the half-committed fps
    and leave them invisible to every future probe.

    The existing-fp filter broadcasts the index's fp64 column (8 B/doc —
    ~160 MB at the BROADCAST_SIG_LIMIT) while the index is small enough,
    and switches to shuffle.anti_select's Bloom-prefiltered left-anti
    join on fp64 above it (same size gate as probe's verify step)."""
    import ray
    import ray.data as rd

    from sick_ray.shuffle import anti_select, assemble_blocks, unique_fp64

    manifest = load_index_manifest(index_dir)
    want = _sig_identity(cfg)
    got = {k: manifest.get(k) for k in want}
    if got != want:
        raise ValueError(
            f"index config mismatch: index built with {got}, extend uses {want}"
        )
    if new_sigs is None:
        new_sigs = snapshot_sigs(new_docs_ds, cfg, text_col)

    if manifest["n_docs_indexed"] <= BROADCAST_SIG_LIMIT:
        old_fps = rd.read_parquet(os.path.join(index_dir, "signatures"),
                                  columns=["fp64"]).materialize()
        fp_ref = assemble_blocks(old_fps, ["fp64"], unique_fp64,
                                 empty=np.empty(0, dtype=np.int64))

        def drop_existing(batch: pa.Table) -> pa.Table:
            old = ray.get(fp_ref)
            if batch.num_rows == 0 or len(old) == 0:
                return batch
            fp = batch.column("fp64").to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(old, fp), len(old) - 1)
            return batch.filter(pa.array(old[pos] != fp))

        fresh = new_sigs.map_batches(drop_existing,
                                     batch_format="pyarrow").materialize()
    else:
        # index too large to hold as one array in any worker: Bloom-split
        # anti join (anti_select consumes its input twice → materialize).
        # sig/band_hash ride the join packed as fixed-size binary — Arrow's
        # hash join rejects list-typed non-key payloads (same trick as
        # lsh.verify_edges_join)
        packed = new_sigs.map_batches(
            _pack_sig_blobs, batch_format="pyarrow"
        ).materialize()
        fresh = anti_select(
            packed,
            rd.read_parquet(os.path.join(index_dir, "signatures"),
                            columns=["fp64"]),
            on="fp64",
            num_partitions=cfg.num_partitions,
            n_keys_hint=manifest["n_docs_indexed"],
        ).map_batches(_unpack_sig_blobs(cfg),
                      batch_format="pyarrow").materialize()
    n_added = fresh.count()
    if n_added:
        fresh.select_columns(["fp64", "band_hash"]).map_batches(
            explode_bands, batch_format="pyarrow"
        ).write_parquet(os.path.join(index_dir, "buckets"))
        fresh.select_columns(["fp64", "sig"]).write_parquet(
            os.path.join(index_dir, "signatures"))
    # RECOUNT from the signatures table rather than incrementing: a crash
    # after the signatures append but before the manifest replace would
    # make a retry add 0 rows and an increment would then undercount
    # forever; the table itself is the source of truth (rows are distinct
    # by the fp64 invariant, so row count == doc count)
    manifest["n_docs_indexed"] = rd.read_parquet(
        os.path.join(index_dir, "signatures"), columns=["fp64"]
    ).count()
    tmp = os.path.join(index_dir, "_INDEX.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, "_INDEX.json"))
    return {**manifest, "n_docs_added": n_added}
