"""Stage 2b — LSH banding, hot-bucket salting, candidate edges.

The reference's object lookup probes a hash-bucket skip index: keys sorted
by a 32-bit hash, 128 buckets over the hash range, probe = bucket + short
linear scan (Scala ``eba/reader/incremental/OneObjTable.scala:44-107``, C#
``SickCursor.Object.cs:168-250``). The LSH band bucket is the distributed
analogue: ``bkt = mix(band, band_hash)`` is the key of a hash-partitioned
shuffle, and the within-partition candidate generation is the "short
linear scan" — vectorized across every bucket of the partition at once
(see sick_ray.shuffle for why per-group calls are banned).

Skew (north_rule): boilerplate-heavy pages hash thousands of docs into one
bucket. Buckets above ``hot_bucket_threshold`` (found by a two-phase count
pre-pass over narrow rows) are salted into ``salt_fanout`` sub-buckets
keyed by fp64, bounding group size; each sub-bucket emits its candidate
pairs plus one representative row, and a second tiny pass links the
representatives of each hot bucket — full connectivity, bounded
partitions. The wide ``html``/``text`` payloads never enter any of these
shuffles.

Candidate emission is ALL within-bucket pairs up to
``max_pairs_per_bucket`` (all-pairs is what keeps signature verification
recall-safe; see make_pair_emitter); oversized buckets degrade to
star + chain edges with the shortfall surfaced as manifest counters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from sick_ray.stages.minhash import fsl_to_numpy

from sick_ray.config import DedupConfig
from sick_ray.functions.sketch import bloom_build, bloom_contains, bloom_params
from sick_ray.stages.components import star_partitions
from sick_ray.shuffle import (
    U64,
    collect_counter_rows,
    first_mask,
    kind_filter,
    grouped_apply,
    join_partitions,
    mix64,
    segment_pairs,
    sort_index,
)

_POLY = U64(0x9E3779B185EBCA87)


def explode_bands(batch: pa.Table) -> pa.Table:
    """(fp64, band_hash: fixed_size_list<int64, B>) → long format
    (bkt:int64 bucket key, fp64:int64). 16 B/row — nothing wide."""
    n = batch.num_rows
    bh_col = batch.column("band_hash")
    if isinstance(bh_col, pa.ChunkedArray):
        bh_col = bh_col.combine_chunks()
    bands = bh_col.type.list_size
    flat = bh_col.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
    band_idx = np.tile(np.arange(bands, dtype=np.uint64), n)
    bkt = mix64(flat * _POLY + band_idx).view(np.int64)
    fp = batch.column("fp64").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "bkt": pa.array(bkt, type=pa.int64()),
            "fp64": pa.array(np.repeat(fp, bands), type=pa.int64()),
        }
    )


# ------------------------------------------------------- hot bucket counts

def _partial_counts(batch: pa.Table) -> pa.Table:
    bkt = batch.column("bkt").to_numpy(zero_copy_only=False)
    ks = np.sort(bkt)
    fm = first_mask(ks)
    starts = np.flatnonzero(fm)
    cnt = np.diff(np.append(starts, len(ks)))
    return pa.table(
        {"bkt": pa.array(ks[fm], type=pa.int64()), "cnt": pa.array(cnt, type=pa.int64())}
    )


def make_count_reducer(threshold: int):
    def reduce_counts(part: pa.Table) -> pa.Table:
        bkt = part.column("bkt").to_numpy(zero_copy_only=False)
        cnt = part.column("cnt").to_numpy(zero_copy_only=False)
        order = np.argsort(bkt, kind="stable")
        ks, cs = bkt[order], cnt[order]
        fm = first_mask(ks)
        starts = np.flatnonzero(fm)
        sums = np.add.reduceat(cs, starts) if len(cs) else cs
        keep = sums > threshold
        return pa.table(
            {
                "bkt": pa.array(ks[fm][keep], type=pa.int64()),
                "cnt": pa.array(sums[keep], type=pa.int64()),
            }
        )

    return reduce_counts


def hot_buckets(band_rows, cfg: DedupConfig) -> np.ndarray:
    """Two-phase count pre-pass → sorted int64 array of hot bucket keys."""
    hot = grouped_apply(
        band_rows,
        ["bkt"],
        make_count_reducer(cfg.hot_bucket_threshold),
        num_partitions=cfg.num_partitions,
        partial=_partial_counts,
    ).to_pandas()
    if "bkt" not in hot.columns:              # empty result loses its schema
        return np.empty(0, dtype=np.int64)
    return np.sort(hot["bkt"].to_numpy().astype(np.int64))


def dup_bucket_index(band_rows, cfg: DedupConfig):
    """One count pre-pass shared by skew detection AND the singleton
    prefilter: returns (hot_sorted, bloom_ref, bloom_k, n_dup_buckets,
    est_pairs — an exact upper bound on emitted candidate-pair rows used
    to size the downstream narrow-edge shuffles by data volume).

    ``bloom_ref`` is the in-cluster-assembled Bloom bitmap of every
    bucket with ≥2 members — the only buckets that can emit a pair.
    In a mostly-unique corpus the pair shuffle's input is dominated by
    singleton buckets (one band row per doc per band that matches
    nothing); dropping them map-side against the broadcast Bloom removes
    that traffic before the expensive sort. Bloom false positives pass a
    singleton through — it lands alone in its bucket and emits nothing,
    so the output is bit-identical; false negatives are impossible.
    ``bloom_ref`` is None when there are no dup buckets."""
    from sick_ray.shuffle import assemble_blocks

    # band rows are 16 B — size the count shuffle by THEIR volume, not
    # the corpus partition count (same finding as star_partitions)
    count_parts = star_partitions(band_rows.count(), cfg)
    dup_counts = grouped_apply(
        band_rows,
        ["bkt"],
        make_count_reducer(1),                 # keep count >= 2
        num_partitions=count_parts,
        partial=_partial_counts,
    ).materialize()
    n_dup = dup_counts.count()

    # exact upper bound on emitted pair rows (per-bucket all-pairs capped
    # at max_pairs_per_bucket) — one tiny fold over the already-small
    # dup-bucket table; used to size the downstream distinct-edges
    # shuffle by DATA VOLUME instead of the corpus-wide partition count
    cap = cfg.max_pairs_per_bucket

    def _pair_bound(batch: pa.Table) -> pa.Table:
        c = batch.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        b = int(np.minimum(c * (c - 1) // 2, cap).sum() + len(c))
        return pa.table({"b": pa.array([b], type=pa.int64()),
                         "rows": pa.array([int(c.sum())], type=pa.int64())})

    est_pairs = 0
    est_dup_rows = 0                 # band rows surviving the Bloom filter
    for b in dup_counts.map_batches(
        _pair_bound, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        est_pairs += int(b.column("b")[0].as_py())
        est_dup_rows += int(b.column("rows")[0].as_py())

    hot_tbl = dup_counts.map_batches(
        _hot_filter_fn(cfg.hot_bucket_threshold), batch_format="pyarrow"
    ).to_pandas()
    hot = (np.sort(hot_tbl["bkt"].to_numpy().astype(np.int64))
           if "bkt" in hot_tbl.columns and len(hot_tbl)
           else np.empty(0, dtype=np.int64))
    if n_dup == 0:
        return hot, None, 0, 0, 0, 0
    m, k = bloom_params(n_dup)

    def finalize_bloom(tbl: pa.Table):
        return bloom_build(
            tbl.column("bkt").combine_chunks().to_numpy(zero_copy_only=False),
            m, k,
        )

    bloom_ref = assemble_blocks(dup_counts, ["bkt"], finalize_bloom,
                                empty=None)
    return hot, bloom_ref, k, n_dup, est_pairs, est_dup_rows


def _hot_filter_fn(threshold: int):
    def f(batch: pa.Table) -> pa.Table:
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(cnt > threshold))

    return f


def make_bloom_prefilter(bloom_ref, k: int):
    """Map-side singleton-bucket dropper: keep band rows whose bkt is in
    the dup-bucket Bloom (zero-copy plasma read per task)."""
    def flt(batch: pa.Table) -> pa.Table:
        import ray

        bits = ray.get(bloom_ref)
        if bits is None or batch.num_rows == 0:
            return batch.slice(0, 0)
        bkt = batch.column("bkt").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(bloom_contains(bits, bkt, k)))

    return flt


def make_salter(hot_sorted: np.ndarray, fanout: int):
    """Append sbkt (salted bucket id): cold rows keep bkt; hot-bucket rows
    scatter into ``fanout`` sub-buckets keyed by fp64."""

    def add_salt(batch: pa.Table) -> pa.Table:
        bkt = batch.column("bkt").to_numpy(zero_copy_only=False)
        fp = batch.column("fp64").to_numpy(zero_copy_only=False)
        sbkt = bkt.copy()
        hot = np.zeros(len(bkt), dtype=bool)
        if len(hot_sorted):
            pos = np.searchsorted(hot_sorted, bkt)
            pos = np.clip(pos, 0, len(hot_sorted) - 1)
            hot = hot_sorted[pos] == bkt
            if hot.any():
                salt = (fp[hot].view(np.uint64) % U64(fanout)) + U64(1)
                sbkt[hot] = mix64(bkt[hot].view(np.uint64) * _POLY + salt).view(np.int64)
        return pa.table(
            {
                "bkt": batch.column("bkt"),
                "sbkt": pa.array(sbkt, type=pa.int64()),
                "fp64": batch.column("fp64"),
                "hot": pa.array(hot),
            }
        )

    return add_salt


# ----------------------------------------------------------- edge emission

def make_pair_emitter(cfg: DedupConfig, verify_ref=None,
                      verify_threshold: float | None = None):
    """Per-partition vectorized candidate-pair builder over ALL buckets at
    once (shuffle.segment_pairs): every within-bucket pair is emitted up to
    ``max_pairs_per_bucket``; oversized buckets fall back to star + chain
    edges with the shortfall counted. All-pairs (not hub-spoke stars) is
    what makes signature verification recall-safe — with star edges two
    similar members were never compared when the bucket's first member was
    dissimilar to both (round-1 hub failure, ADVICE.md).

    ``verify_ref``: optional broadcast signature lookup — when set, each
    emitted pair is signature-verified INLINE (est Jaccard ≥
    ``verify_threshold``) before it ever leaves the emitter, so the
    downstream distinct-edges shuffle and the raw materialization carry
    only verified pairs. verify∘distinct == distinct∘verify (a per-pair
    predicate), so the final edge set is identical to the staged order;
    truncation counters stay pre-verify (they describe emission caps).

    Input rows: (bkt, sbkt, fp64, hot). Output: (u, v, bkt, kind) where
    kind 0 = candidate edge, 1 = sub-bucket representative (hot only),
    2 = counter row (u = truncated pairs, v = truncated buckets).
    """
    cap = cfg.max_pairs_per_bucket

    def emit(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {
                    "u": pa.array([], type=pa.int64()),
                    "v": pa.array([], type=pa.int64()),
                    "bkt": pa.array([], type=pa.int64()),
                    "kind": pa.array([], type=pa.int8()),
                }
            )
        sbkt = part.column("sbkt").to_numpy(zero_copy_only=False)
        fp = part.column("fp64").to_numpy(zero_copy_only=False)
        bkt = part.column("bkt").to_numpy(zero_copy_only=False)
        hot = part.column("hot").to_numpy(zero_copy_only=False)
        order = sort_index(sbkt, fp)
        sb, f, bk, ht = sbkt[order], fp[order], bkt[order], hot[order]
        # drop duplicate (sbkt, fp) rows
        fm_pair = first_mask(sb) | np.concatenate([[True], f[1:] != f[:-1]])
        sb, f, bk, ht = sb[fm_pair], f[fm_pair], bk[fm_pair], ht[fm_pair]
        i_idx, j_idx, trunc_pairs, trunc_buckets = segment_pairs(sb, cap)
        u = f[i_idx]
        v = f[j_idx]
        e_bkt = bk[i_idx]
        if verify_ref is not None and len(u):
            import ray

            fp_s, mat = ray.get(verify_ref)       # zero-copy plasma view
            if len(fp_s):
                hi = len(fp_s) - 1
                iu = np.minimum(np.searchsorted(fp_s, u), hi)
                iv = np.minimum(np.searchsorted(fp_s, v), hi)
                ok = (fp_s[iu] == u) & (fp_s[iv] == v)
                est = (mat[iu] == mat[iv]).mean(axis=1)
                ok &= est >= verify_threshold
            else:
                ok = np.zeros(len(u), dtype=bool)
            u, v, e_bkt = u[ok], v[ok], e_bkt[ok]
        # representatives: first row of each HOT sub-bucket
        fm = first_mask(sb)
        rep = fm & ht
        out_u = [u, f[rep]]
        out_v = [v, f[rep]]
        out_b = [e_bkt, bk[rep]]
        out_k = [np.zeros(len(u), dtype=np.int8), np.ones(int(rep.sum()), dtype=np.int8)]
        if trunc_pairs or trunc_buckets:
            out_u.append(np.array([trunc_pairs], dtype=np.int64))
            out_v.append(np.array([trunc_buckets], dtype=np.int64))
            out_b.append(np.zeros(1, dtype=np.int64))
            out_k.append(np.full(1, 2, dtype=np.int8))
        return pa.table(
            {
                "u": pa.array(np.concatenate(out_u), type=pa.int64()),
                "v": pa.array(np.concatenate(out_v), type=pa.int64()),
                "bkt": pa.array(np.concatenate(out_b), type=pa.int64()),
                "kind": pa.array(np.concatenate(out_k), type=pa.int8()),
            }
        )

    return emit


def _link_reps_partition(part: pa.Table) -> pa.Table:
    """Chain the sub-bucket representatives of each hot bucket."""
    bkt = part.column("bkt").to_numpy(zero_copy_only=False)
    fp = part.column("u").to_numpy(zero_copy_only=False)
    order = sort_index(bkt, fp)
    bk, f = bkt[order], fp[order]
    fm = first_mask(bk)
    gid = np.cumsum(fm) - 1
    firsts = f[fm]
    is_edge = ~fm
    return pa.table(
        {
            "u": pa.array(firsts[gid[is_edge]], type=pa.int64()),
            "v": pa.array(f[is_edge], type=pa.int64()),
        }
    )


def _distinct_pairs_partition(part: pa.Table) -> pa.Table:
    u = part.column("u").to_numpy(zero_copy_only=False)
    v = part.column("v").to_numpy(zero_copy_only=False)
    order = sort_index(u, v)
    us, vs = u[order], v[order]
    keep = np.ones(len(us), dtype=bool)
    if len(us) > 1:
        keep[1:] = (us[1:] != us[:-1]) | (vs[1:] != vs[:-1])
    return pa.table(
        {"u": pa.array(us[keep], type=pa.int64()), "v": pa.array(vs[keep], type=pa.int64())}
    )


def candidate_edges(sig_ds, cfg: DedupConfig, counters: dict | None = None,
                    verify_ref=None, verify_threshold: float | None = None,
                    walls: dict | None = None):
    """Signatures Dataset (fp64, band_hash, …) → candidate edge Dataset
    (u:int64, v:int64). One narrow-row shuffle for the count pre-pass, one
    for the bucket groups, one tiny one for hot-bucket representatives.

    The band-rows table (16 B/row) is materialized once and reused by the
    pre-pass and the bucket shuffle so the upstream minhash chain is not
    recomputed.

    ``verify_ref``/``verify_threshold``: when the caller is in the
    broadcast-verify regime, pass the signature lookup here to FUSE
    verification into pair emission (see make_pair_emitter) — candidate
    pairs below the threshold die inside the emitter instead of riding
    the raw materialization + distinct shuffle and only then being
    filtered; hot-bucket representative chain edges are verified by the
    same broadcast filter on their own (tiny) table. Edge set identical
    to the staged order.

    ``counters``: optional dict filled in place with the skew-cap metrics
    (truncated_pairs / truncated_buckets / hot_buckets) — no silent caps:
    callers surface these into the stage manifest."""
    import time as _time

    walls = walls if walls is not None else {}
    t = _time.time()
    band_rows = sig_ds.map_batches(explode_bands, batch_format="pyarrow", batch_size=None).materialize()
    walls["bands_sec"] = round(_time.time() - t, 2)
    t = _time.time()
    if cfg.dup_bucket_prefilter:
        # one count pre-pass feeds BOTH skew detection and the
        # singleton-bucket Bloom prefilter: only ≥2-member buckets can
        # emit a pair, so dropping singleton band rows map-side removes
        # the bulk of the sort-shuffle input on mostly-unique corpora
        # (output bit-identical — see dup_bucket_index)
        hot, bloom_ref, bloom_k, n_dup, est_pairs, est_dup_rows = (
            dup_bucket_index(band_rows, cfg))
        if counters is not None:
            counters["dup_buckets"] = int(n_dup)
            counters["est_pairs"] = int(est_pairs)
        if bloom_ref is not None:
            band_rows = band_rows.map_batches(
                make_bloom_prefilter(bloom_ref, bloom_k),
                batch_format="pyarrow", batch_size=None,
            )
        else:
            band_rows = band_rows.limit(0)
    else:
        hot = hot_buckets(band_rows, cfg)
    walls["prepass_sec"] = round(_time.time() - t, 2)
    t = _time.time()
    salted = band_rows.map_batches(make_salter(hot, cfg.salt_fanout), batch_format="pyarrow")
    # post-Bloom the pairs shuffle input is only the dup-bucket band rows
    # (~32 B/row salted) — size it by that volume; without the prefilter
    # fall back to the corpus partition count
    pair_parts = (star_partitions(est_dup_rows * 2, cfg)
                  if cfg.dup_bucket_prefilter else cfg.num_partitions)
    raw = grouped_apply(
        salted, ["sbkt"],
        make_pair_emitter(cfg, verify_ref, verify_threshold),
        num_partitions=pair_parts,
    ).materialize()
    walls["pairs_sec"] = round(_time.time() - t, 2)
    raw = collect_counter_rows(raw, counters, "truncated_pairs", "truncated_buckets")
    if counters is not None:
        counters["hot_buckets"] = int(len(hot))
    edges = raw.map_batches(kind_filter(0), batch_format="pyarrow").select_columns(["u", "v"])
    reps = raw.map_batches(kind_filter(1), batch_format="pyarrow")
    # reps are bounded by hot_buckets x salt_fanout — a tiny table; a
    # corpus-width shuffle on it is pure overhead
    rep_parts = star_partitions(len(hot) * cfg.salt_fanout, cfg)
    rep_edges = grouped_apply(
        reps, ["bkt"], _link_reps_partition, num_partitions=rep_parts
    )
    if verify_ref is not None:
        rep_edges = verify_edges_broadcast(rep_edges, verify_ref,
                                           verify_threshold)
    return edges.union(rep_edges)


def distinct_edges(edges_ds, cfg: DedupConfig | None = None,
                   n_rows_hint: int | None = None):
    """Drop duplicate (u, v) rows (same pair surfaced by several bands).

    ``n_rows_hint`` (e.g. the pre-pass pair bound from candidate_edges'
    ``counters["est_pairs"]``) sizes the shuffle by edge-table volume —
    16 B/row edge tables are usually orders of magnitude smaller than
    the corpus that cfg.num_partitions was sized for, and running the
    distinct sort at corpus width is pure scheduling overhead (measured
    126 s of the 8M/32-CPU near phase at 512 partitions)."""
    from sick_ray.stages.components import star_partitions

    cfg = cfg or DedupConfig()
    parts = (star_partitions(n_rows_hint, cfg)
             if n_rows_hint is not None else cfg.num_partitions)
    return grouped_apply(
        edges_ds,
        ["u", "v"],
        _distinct_pairs_partition,
        num_partitions=parts,
        partial=_distinct_pairs_partition,
    )


# ------------------------------------------------------------- verification

def build_sig_lookup(sig_table: pa.Table, num_perm: int):
    """(fp_sorted: int64 array, matrix sorted to match) — a binary-search
    lookup that stays zero-copy through the object store: both members are
    plain contiguous ndarrays, so worker tasks ``ray.get`` them as
    read-only views of the plasma buffer (no per-worker deserialization —
    the round-1 dict index was re-built in every worker process)."""
    fp = sig_table.column("fp64").to_numpy(zero_copy_only=False)
    mat = fsl_to_numpy(sig_table.column("sig"), num_perm)
    order = np.argsort(fp, kind="stable")
    return fp[order], np.ascontiguousarray(mat[order])


def assemble_sig_lookup(num_perm: int, *blocks):
    """Remote-task body: concat materialized (fp64, sig) blocks → sorted
    lookup. Run via ``ray.remote`` on block refs so the signature table is
    assembled IN the cluster — nothing ever streams through the driver.
    Empty blocks can be schemaless (no columns) and are skipped."""
    good = [b for b in blocks if b.num_rows and "fp64" in b.column_names]
    if not good:
        return (np.empty(0, dtype=np.int64),
                np.empty((0, num_perm), dtype=np.uint32))
    tbl = pa.concat_tables([b.select(["fp64", "sig"]) for b in good])
    return build_sig_lookup(tbl, num_perm)


def make_sig_lookup_ref(sig_ds, num_perm: int):
    """Materialized (fp64, sig) Dataset → ObjectRef of the sorted lookup,
    built by a Ray task from the dataset's own block refs (zero driver
    traffic). The returned ref is the broadcast handle for
    :func:`verify_edges_broadcast`; scale bound = per-node object store
    (~520 B/doc), NOT driver heap."""
    import ray

    blocks = sig_ds.to_arrow_refs()
    build = ray.remote(num_cpus=1)(assemble_sig_lookup)
    return build.remote(num_perm, *blocks)


def verify_edges_broadcast(edges_ds, sig_lookup_ref, threshold: float):
    """Filter candidate edges by estimated Jaccard (fraction of equal
    signature components). ``sig_lookup_ref`` → (sorted fp64, sig matrix);
    tasks read it zero-copy from plasma and probe by searchsorted — no
    per-row Python, no per-worker index rebuild."""
    import ray

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        fp_s, mat = ray.get(sig_lookup_ref)
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        # guarded probe: an endpoint missing from the lookup must drop the
        # edge, not index out of bounds / compare a wrong row (a bare
        # searchsorted did both; the old dict failed loudly with KeyError)
        hi = max(len(fp_s) - 1, 0)
        iu = np.minimum(np.searchsorted(fp_s, u), hi)
        iv = np.minimum(np.searchsorted(fp_s, v), hi)
        if len(fp_s) == 0:
            return batch.slice(0, 0)
        found = (fp_s[iu] == u) & (fp_s[iv] == v)
        est = (mat[iu] == mat[iv]).mean(axis=1)
        return batch.filter(pa.array(found & (est >= threshold)))

    return edges_ds.map_batches(verify, batch_format="pyarrow")


def verify_edges_join(edges_ds, sig_ds, threshold: float, num_partitions: int):
    """Scale path: two hash joins (edges ⋈ sigs on u, then on v) instead of
    a driver-side broadcast. The signature rides the join as a binary blob
    (Arrow's hash join does not support list-typed payloads)."""

    def to_blob(batch: pa.Table) -> pa.Table:
        width = batch.column("sig").type.list_size
        mat = np.ascontiguousarray(fsl_to_numpy(batch.column("sig"), width))
        nbytes = mat.dtype.itemsize * width
        # zero-copy: wrap the contiguous signature matrix as a
        # fixed_size_binary column directly from its buffer (round 1 sliced
        # python bytes per row — exactly on the scale path where n is big)
        sigb = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(nbytes), len(batch), [None, pa.py_buffer(mat.data)]
        )
        return pa.table({"fp64": batch.column("fp64"), "sigb": sigb})

    su = sig_ds.select_columns(["fp64", "sig"]).map_batches(to_blob, batch_format="pyarrow")
    j1 = edges_ds.join(
        su, join_type="inner", num_partitions=join_partitions(num_partitions),
        on=("u",), right_on=("fp64",), right_suffix="_su",
    )
    j2 = j1.join(
        su, join_type="inner", num_partitions=join_partitions(num_partitions),
        on=("v",), right_on=("fp64",), left_suffix="_l", right_suffix="_sv",
    )

    def flt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(["u", "v"])
        names = batch.column_names
        s1 = next(c for c in names if c.startswith("sigb") and not c.endswith("_sv"))
        s2 = next(c for c in names if c.startswith("sigb") and c.endswith("_sv"))

        def mat(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_fixed_size_binary(col.type):
                # zero-copy read of the packed data buffer
                w = col.type.byte_width
                off = col.offset * w
                buf = np.frombuffer(col.buffers()[1], dtype=np.uint32,
                                    count=len(col) * w // 4, offset=off)
                return buf.reshape(len(col), -1)
            blobs = col.to_pylist()
            return np.frombuffer(b"".join(blobs), dtype=np.uint32).reshape(len(blobs), -1)

        a = mat(batch.column(s1))
        b = mat(batch.column(s2))
        est = (a == b).mean(axis=1)
        return batch.select(["u", "v"]).filter(pa.array(est >= threshold))

    return j2.map_batches(flt, batch_format="pyarrow")
