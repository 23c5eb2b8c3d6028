"""Stage 3 — substring-level dedup: partition-local suffix arrays + a
global content-anchored fingerprint pass.

The reference deduplicates whole identical subtrees only (hash-consing,
``Bijection.cs:47-67`` structural equality); it has no substring-level
notion. At web scale the standard requirement (north_rule) is finding
verbatim duplicated spans ≥ ``min_span`` bytes.

Two complementary passes:

1. **Partition-local window-hash pass** (intra-partition): each
   ``map_batches`` batch reads its docs' UTF-8 bytes zero-copy, computes a
   position-independent 64-bit polynomial hash of every L-byte window and
   groups equal hashes (one argsort) — position i is duplicated iff
   another position shares its window (other doc, or ≥ L away; collision
   odds ~2⁻⁶⁴ per pair, the same assumption the round-1 suffix-array
   formulation made). Runs of duplicated positions merge into maximal
   spans per doc, fully vectorized. ``suffix_array`` (prefix doubling)
   stays as the exact reference kernel.

2. **Global anchored-fingerprint pass** (cross-partition): alignment-
   independent anchors are chosen by content (winnowing-style: positions
   where a q-gram rolling hash ≡ 0 mod stride), the L-byte window hash at
   each anchor is emitted as a narrow ``(whash, uhash, start)`` row (24 B), and a
   ``groupby(whash)`` shuffle surfaces windows occurring in ≥2 docs (or
   ≥ L apart in one doc). Because anchors are content-defined, two copies
   of a span share anchors regardless of their byte offsets — this is what
   "merges across partition boundaries": no partition co-location is
   needed to detect a cross-partition duplicate.

Span offsets are BYTE offsets into the UTF-8 encoding of ``text``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from sick_ray.shuffle import (assemble_blocks, first_mask, grouped_apply,
                              join_partitions, sort_index)
from sick_ray.stages.minhash import _string_col_buffers
from sick_ray.xxh import xxh64_strings

from sick_ray.config import DedupConfig

U64 = np.uint64
_C = U64(0x100000001B3)          # odd multiplier (FNV prime)
_CINV = U64(pow(0x100000001B3, -1, 1 << 64))
_QGRAM = 16                       # anchor q-gram width


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of uint8 array ``s`` by sparse prefix doubling (numpy).

    Rank convention: ``rank[i]`` = SA slot of the first member of suffix
    i's equivalence class. After the initial byte sort, every doubling
    round touches ONLY suffixes whose class still has ≥2 members — for
    web text most suffixes become unique within a few rounds, so per-round
    memory traffic collapses (this kernel is bandwidth-bound; see
    SA_BATCH_DOCS). Sorting the tied subset globally by
    ``rank*(n+1) + rank[i+k]+1`` is safe because rank dominates the key:
    each tied run re-sorts in place within its own SA slot range.
    """
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    base = np.int64(n + 1)
    sa = np.argsort(s)
    sv = s[sa].astype(np.int64)
    new_cls = np.ones(n, dtype=bool)
    new_cls[1:] = sv[1:] != sv[:-1]
    slot = np.arange(n)
    # rank[i] = first slot of i's class
    first_slot = slot[new_cls][np.cumsum(new_cls) - 1]
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = first_slot
    k = 1
    while True:
        # tied slots: classes of size >= 2
        r_sa = rank[sa]
        cls_first = np.ones(n, dtype=bool)
        cls_first[1:] = r_sa[1:] != r_sa[:-1]
        cls_size = np.diff(np.append(np.flatnonzero(cls_first), n))
        tied_cls = cls_size >= 2
        if not tied_cls.any():
            return sa
        tied_rows = np.repeat(tied_cls, cls_size)          # mask over slots
        tslots = np.flatnonzero(tied_rows)
        idx = sa[tslots]                                    # suffix positions
        key2 = np.zeros(len(idx), dtype=np.int64)
        m = idx + k < n
        key2[m] = rank[idx[m] + k] + 1
        combined = rank[idx] * base + key2
        order = np.argsort(combined, kind="stable")
        idx_s = idx[order]
        cs = combined[order]
        sa[tslots] = idx_s
        # new class firsts among the re-sorted tied slots
        nf = np.ones(len(cs), dtype=bool)
        nf[1:] = cs[1:] != cs[:-1]
        first_of = tslots[nf][np.cumsum(nf) - 1]            # new first slot per row
        rank[idx_s] = first_of
        k <<= 1


def window_hashes(s: np.ndarray, L: int) -> np.ndarray:
    """H[i] = position-independent polynomial hash of s[i:i+L] for all i
    with i+L<=n, via prefix sums in uint64 wraparound arithmetic."""
    n = len(s)
    if n < L:
        return np.empty(0, dtype=np.uint64)
    pw = np.empty(n + 1, dtype=np.uint64)
    pw[0] = 1
    pw[1:] = _C
    np.cumprod(pw, out=pw)                     # pw[i] = C^i
    pwin = np.empty(n, dtype=np.uint64)
    pwin[0] = 1
    pwin[1:] = _CINV
    np.cumprod(pwin, out=pwin)                 # pwin[i] = C^-i
    q = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(s.astype(np.uint64) * pwin, out=q[1:])
    # H[i] = C^(i+L-1) * (Q[i+L] - Q[i]) == C^(L-1) * window-poly
    i = np.arange(n - L + 1)
    return pw[i + L - 1] * (q[i + L] - q[i])


def _concat_docs(texts: list[str]):
    payloads = [t.encode("utf-8") if t else b"" for t in texts]
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
    ends = np.cumsum(lens)
    starts = ends - lens
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    return buf, starts, ends


def _concat_docs_col(col):
    """Zero-copy (buf, starts, ends) straight from an Arrow string column's
    own UTF-8 buffers — documents are already stored concatenated, so no
    Python encode/join pass ever touches the text."""
    if getattr(col, "null_count", 0):
        import pyarrow.compute as pc

        col = pc.fill_null(col, "")
    buf, offs = _string_col_buffers(col)
    return buf, offs[:-1], offs[1:]


def make_sa_span_finder(cfg: DedupConfig):
    """map_batches fn: partition-local duplicated-span finder.

    Emits (uhash:int64, start:int64, end:int64) byte-offset spans of text
    duplicated (≥ min_span bytes) elsewhere in the same batch.

    Detection is by grouping equal L-byte window hashes (position-
    independent polynomial, :func:`window_hashes`): position i is
    duplicated iff some other position j in the batch has the same
    L-window (j in another doc, or ≥ L away in the same doc). This is the
    same relation the round-1 suffix-array formulation computed via
    SA-adjacent prefix checks — equal-hash groups ARE the contiguous SA
    ranges — but one argsort of the hash array replaces prefix-doubling
    (measured ~40× cheaper on this bandwidth-bound kernel, and group-wise
    checking is strictly ≥ the pairwise-adjacent check's recall).
    :func:`suffix_array` remains as the exact reference implementation
    (unit-tested against naive sorting; see test_suffix.py).
    """
    L = cfg.min_span

    def find(batch: pa.Table) -> pa.Table:
        uhashes = xxh64_strings(batch.column("url")).view(np.int64)
        buf, starts, ends = _concat_docs_col(batch.column("text"))
        n = len(buf)
        empty = pa.table(
            {
                "uhash": pa.array([], type=pa.int64()),
                "start": pa.array([], type=pa.int64()),
                "end": pa.array([], type=pa.int64()),
            }
        )
        if n < L:
            return empty
        H = window_hashes(buf, L)
        # windows fully inside one doc only
        i_all = np.arange(n - L + 1)
        doc_of_w = np.searchsorted(ends, i_all, side="right")
        ps = i_all[i_all + L <= ends[doc_of_w]]
        if len(ps) == 0:
            return empty
        h = H[ps]
        order = np.argsort(h, kind="stable")     # pos ascending within groups
        hs, pss = h[order], ps[order]
        fm = first_mask(hs)
        gid = np.cumsum(fm) - 1
        gstarts = np.flatnonzero(fm)
        d = np.searchsorted(ends, pss, side="right")
        multi_doc = (
            np.maximum.reduceat(d, gstarts) != np.minimum.reduceat(d, gstarts)
        )
        minp = np.minimum.reduceat(pss, gstarts)
        maxp = np.maximum.reduceat(pss, gstarts)
        keep = multi_doc[gid] | (pss - minp[gid] >= L) | (maxp[gid] - pss >= L)
        dup_pos = np.sort(pss[keep])
        if len(dup_pos) == 0:
            return empty
        # vectorized per-doc run merge: consecutive duplicated window starts
        # (gap <= 1) in the same doc collapse to one maximal span
        d_of = np.searchsorted(ends, dup_pos, side="right")
        new_run = np.ones(len(dup_pos), dtype=bool)
        new_run[1:] = (np.diff(dup_pos) > 1) | (d_of[1:] != d_of[:-1])
        run_starts = np.flatnonzero(new_run)
        run_ends = np.append(run_starts[1:], len(dup_pos)) - 1
        s_pos = dup_pos[run_starts]
        e_pos = dup_pos[run_ends] + L
        docs_idx = d_of[run_starts]
        out_s = s_pos - starts[docs_idx]
        out_e = np.minimum(e_pos, ends[docs_idx]) - starts[docs_idx]
        return pa.table(
            {
                "uhash": pa.array(uhashes[docs_idx], type=pa.int64()),
                "start": pa.array(out_s, type=pa.int64()),
                "end": pa.array(out_e, type=pa.int64()),
            }
        )

    return find


def _global_window(cfg: DedupConfig) -> int:
    """Window width for the global pass: half of min_span, so a shared
    region of exactly min_span bytes still contains fully-interior windows
    at content-defined anchors in both copies."""
    return max(32, cfg.min_span // 2)


def make_anchor_emitter(cfg: DedupConfig):
    """map_batches fn: emit (whash:int64, uhash:int64, start:int64) rows at
    content-defined anchor positions (winnowing-style).

    Rows carry the xxh64 of the url, not the url string — the whash shuffle
    then moves 24 B/row instead of ~60 B; urls are re-attached to the final
    (small) merged-span table from a broadcast uhash→url map."""
    L = _global_window(cfg)
    stride = cfg.span_stride

    def emit(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "whash": pa.array([], type=pa.int64()),
                "uhash": pa.array([], type=pa.int64()),
                "start": pa.array([], type=pa.int64()),
            }
        )
        uhashes = xxh64_strings(batch.column("url")).view(np.int64)
        # one zero-copy buffer + ONE rolling-hash pass per batch; anchors
        # whose full window stays inside its doc are exactly the anchors the
        # per-doc formulation would pick (position-independent hash)
        buf, starts, ends = _concat_docs_col(batch.column("text"))
        n = len(buf)
        if n < L:
            return empty
        qh = window_hashes(buf, _QGRAM)
        anchors = np.flatnonzero(qh % U64(stride) == 0)
        if len(anchors) == 0:
            return empty
        doc_of = np.searchsorted(ends, anchors, side="right")
        ok = anchors + L <= ends[doc_of]
        anchors, doc_of = anchors[ok], doc_of[ok]
        if len(anchors) == 0:
            return empty
        wh = window_hashes(buf, L)
        return pa.table(
            {
                "whash": pa.array(wh[anchors].view(np.int64), type=pa.int64()),
                "uhash": pa.array(uhashes[doc_of], type=pa.int64()),
                "start": pa.array(anchors - starts[doc_of], type=pa.int64()),
            }
        )

    return emit


def make_anchor_survivors(cfg: DedupConfig):
    """Per-partition vectorized filter over ALL whash groups at once: keep
    anchor rows whose window occurs in ≥2 docs (or ≥W apart in one doc) —
    each survivor is a duplicated span seed (uhash, start)."""
    W = _global_window(cfg)

    def survivors(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part.select(["uhash", "start"])
        wh = part.column("whash").to_numpy(zero_copy_only=False)
        st = part.column("start").to_numpy(zero_copy_only=False)
        uh = part.column("uhash").to_numpy(zero_copy_only=False)
        order = sort_index(wh, uh, st)
        w_s, u_s, s_s = wh[order], uh[order], st[order]
        fm = first_mask(w_s)
        gid = np.cumsum(fm) - 1
        starts = np.flatnonzero(fm)
        # per-group: #distinct docs, start spread
        url_chg = np.zeros(len(w_s), dtype=np.int64)
        url_chg[1:] = (u_s[1:] != u_s[:-1]) & ~fm[1:]
        n_urls = np.add.reduceat(url_chg, starts) + 1
        smin = np.minimum.reduceat(s_s, starts)
        smax = np.maximum.reduceat(s_s, starts)
        keep_grp = (n_urls >= 2) | (smax - smin >= W)
        keep = keep_grp[gid]
        idx = order[keep]
        return part.take(pa.array(np.sort(idx))).select(["uhash", "start"])

    return survivors


def _merge_url_spans_partition(part: pa.Table) -> pa.Table:
    """Vectorized overlapping-interval merge for ALL docs in a partition."""
    if part.num_rows == 0:
        return part
    uh = part.column("uhash").to_numpy(zero_copy_only=False)
    s = part.column("start").to_numpy(zero_copy_only=False)
    e = part.column("end").to_numpy(zero_copy_only=False)
    order = sort_index(uh, s, e)
    u_s, s_s, e_s = uh[order], s[order], e[order]
    fm = first_mask(u_s)
    gid = np.cumsum(fm) - 1
    # segmented running-max of end via per-group offsets (doc spans < 2^41)
    OFF = np.int64(1) << np.int64(41)
    base = gid * OFF
    cummax = np.maximum.accumulate(e_s + base)
    prev_end = np.empty_like(cummax)
    prev_end[0] = np.iinfo(np.int64).min
    prev_end[1:] = cummax[:-1]
    new_span = fm | ((s_s + base) > prev_end)
    span_starts = np.flatnonzero(new_span)
    out_s = s_s[span_starts]
    out_e = np.maximum.reduceat(e_s, span_starts)
    return pa.table(
        {
            "uhash": pa.array(u_s[span_starts], type=pa.int64()),
            "start": pa.array(out_s, type=pa.int64()),
            "end": pa.array(out_e, type=pa.int64()),
        }
    )


# local-pass batch size (docs per hash-group scan). The round-1 suffix-array
# cache cliff (0.8 MB → 0.9 s but 2.6 MB → 6 s) is gone with the argsort
# finder; larger batches widen the local dedup scope and amortize task
# overhead. ~2 MB of text per call keeps per-task allocations ~30 MB.
SA_BATCH_DOCS = 1024

# anchor-pass batch size. window_hashes allocates ~40 B of transient
# uint64 prefix arrays per text byte and emit calls it twice (~80 B/byte);
# with batch_size=None a whole block (hundreds of MB of text at the 8M-doc
# regime) became ONE batch → tens of GB per task, and the full object
# store throttled the stage to ~3 concurrent tasks on an 8-CPU session
# (measured: the anchor chain dominated the 8M wall). ~8k docs ≈ 16 MB
# text caps the transient at ~1.3 GB per task and restores wide,
# uniform parallelism.
ANCHOR_BATCH_DOCS = 8192

# above this many docs the uhash→url re-attach switches from a
# plasma-assembled broadcast lookup to a distributed hash join
BROADCAST_URLMAP_LIMIT = 2_000_000


def _finalize_url_lookup(tbl):
    """assemble_blocks finalize: (sorted uhash array, urls in that order)."""
    uh = tbl.column("uhash").to_numpy(zero_copy_only=False)
    urls = tbl.column("url").to_numpy(zero_copy_only=False)
    order = np.argsort(uh, kind="stable")
    return np.ascontiguousarray(uh[order]), urls[order]


def duplicate_spans(docs_ds, cfg: DedupConfig | None = None,
                    n_docs_hint: int | None = None,
                    url_list: list[str] | None = None,
                    include_local: bool = True,
                    local_pass: str = "scope",
                    corpus_bytes_hint: int | None = None,
                    walls: dict | None = None):
    """Dataset (url, text, ...) → Dataset (url, start, end) of duplicated
    spans ≥ cfg.min_span bytes. Partition-local suffix arrays + the global
    anchored groupby, merged per doc; spans travel as narrow (uhash,
    start, end) rows and urls are re-attached only to the final table.

    The url re-attach NEVER pulls the url universe to the driver: at
    broadcastable sizes (≤ BROADCAST_URLMAP_LIMIT urls, sized by
    ``n_docs_hint`` or a Dataset count) a Ray task assembles a sorted
    uhash→url lookup from the url map's own block refs (plasma
    broadcast); above the limit it is a distributed hash join.
    ``url_list``: a caller-supplied bounded url universe skips both.

    NOTE: ``docs_ds`` is consumed by up to three sub-pipelines (local
    pass, anchor pass, url map); a LAZY input re-executes its upstream per
    consumer — materialize expensive inputs (e.g. a join output) first.

    DETERMINISM: the global anchored pass is fully deterministic (anchors
    are content-defined). The local pass detects duplicates within
    whatever docs share one task batch, and Ray's task bundling varies
    between runs — so the total span count can drift ~0.1% run-to-run.
    Making it exact would require a deterministic full-text co-location
    shuffle, which this stage exists to avoid; the drift only affects
    which *local-only* (sub-anchor-stride) duplicates are caught.
    ``include_local=False`` skips the local pass entirely: the output is
    then exactly the anchored-span set — fully deterministic and
    conformance-checkable against an independent scalar implementation
    (scripts/make_spans_golden.py; the doc_spans_anchored oracle).

    ``local_pass="colocate"``: a DETERMINISTIC local pass for tests and
    golden regeneration — full-text rows are hash-shuffled on
    xxh64(url) into ``cfg.num_partitions`` groups, sorted by uhash
    within each group, and scanned in fixed SA_BATCH_DOCS chunks, so
    the local dedup scope is a pure function of the corpus and the
    config (identical spans at ANY parallelism / input partitioning).
    This buys exactness with the full-text co-location shuffle the
    production default ("scope") exists to avoid — at 100 TB that
    shuffle moves the entire corpus once, so it stays a
    conformance-mode option, not the default."""
    import ray

    cfg = cfg or DedupConfig()
    if local_pass not in ("scope", "colocate"):
        raise ValueError(f"unknown local_pass mode {local_pass!r}")
    # size the two anchor-row sorts by DATA VOLUME: anchor density is
    # ~1/span_stride per byte and rows are 24 B, so the sort input is
    # usually far smaller than the corpus cfg.num_partitions was sized
    # for — corpus-width partition counts on a few-GB narrow table are
    # pure scheduling overhead (same finding as components.star_partitions)
    if corpus_bytes_hint:
        from sick_ray.stages.components import STAR_PARTITION_BYTES

        est_rows = corpus_bytes_hint // max(cfg.span_stride, 1)
        sort_parts = int(min(cfg.num_partitions,
                             max(8, est_rows * 24 // STAR_PARTITION_BYTES + 1)))
    else:
        sort_parts = cfg.num_partitions
    docs = docs_ds.select_columns(["url", "text"])
    # the SA consumer needs enough blocks to parallelize its CPU-heavy
    # tasks; only repartition (a full-text shuffle) when the source reads
    # as too few blocks — parquet row-group splitting usually suffices
    min_blocks = max(cfg.num_partitions, 16)
    try:
        enough = docs_ds.num_blocks() >= min_blocks
    except Exception:
        # lazy datasets can't report block counts; parquet reads split by
        # row group and joins emit num_partitions blocks, so trust upstream
        # rather than paying a full-text repartition shuffle
        enough = True
    import time as _time

    walls = walls if walls is not None else {}
    t = _time.time()
    local = None
    if include_local and local_pass == "colocate":
        finder = make_sa_span_finder(cfg)

        def add_uhash(batch: pa.Table) -> pa.Table:
            uh = xxh64_strings(batch.column("url")).view(np.int64)
            return batch.append_column("uhash", pa.array(uh, type=pa.int64()))

        def colocated_finder(part: pa.Table) -> pa.Table:
            uh = part.column("uhash").to_numpy(zero_copy_only=False)
            part = part.take(pa.array(np.argsort(uh, kind="stable")))
            part = part.drop_columns(["uhash"])
            outs = [finder(part.slice(i, SA_BATCH_DOCS))
                    for i in range(0, max(part.num_rows, 1), SA_BATCH_DOCS)]
            return pa.concat_tables(outs)

        local = grouped_apply(
            docs.map_batches(add_uhash, batch_format="pyarrow"),
            ["uhash"], colocated_finder, num_partitions=cfg.num_partitions,
        ).materialize()
    elif include_local:
        sa_docs = docs if enough else docs.repartition(min_blocks)
        # materialize the (small) SA output before the union: the SA pass
        # is memory-bandwidth-bound and measurably degrades every
        # concurrent shuffle stage on a shared memory controller — run it
        # to completion first, then let the anchor chain stream alone
        # (sf0.1: 204 s interleaved → ~70 s staged)
        local = sa_docs.map_batches(
            make_sa_span_finder(cfg), batch_format="pyarrow",
            batch_size=SA_BATCH_DOCS
        ).materialize()
    walls["local_sec"] = round(_time.time() - t, 2)
    t = _time.time()
    anchors = docs.map_batches(make_anchor_emitter(cfg), batch_format="pyarrow",
                               batch_size=ANCHOR_BATCH_DOCS)
    # STAGED, not fused: a single streaming execution containing BOTH the
    # whash sort and the downstream uhash merge sort scales badly — the
    # executor splits the CPU pool across the chained AllToAll stages and
    # each runs far below cluster width (measured at 400k docs / 8 CPUs:
    # fused chain 184 s vs the same stages run to completion one at a
    # time 64 s, and fused 4→8 CPU scaling collapses to 1.35× vs 1.96×
    # staged). Each sort is a barrier anyway; materializing its (narrow)
    # output just makes the barrier explicit and gives every stage the
    # whole cluster.
    seeds = grouped_apply(
        anchors, ["whash"], make_anchor_survivors(cfg), num_partitions=sort_parts
    ).materialize()
    walls["anchors_sec"] = round(_time.time() - t, 2)

    def seed_to_span(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "uhash": batch.column("uhash"),
                "start": batch.column("start"),
                "end": pa.array(
                    batch.column("start").to_numpy(zero_copy_only=False)
                    + _global_window(cfg),
                    type=pa.int64(),
                ),
            }
        )

    global_spans = seeds.map_batches(seed_to_span, batch_format="pyarrow")
    all_spans = (local.union(global_spans) if local is not None
                 else global_spans)
    # map-side partial merge: overlapping seed windows of one doc collapse
    # inside each batch BEFORE the shuffle (idempotent — same fn reduces the
    # partition), cutting the shuffled row count by ~an order of magnitude
    merged = grouped_apply(
        all_spans, ["uhash"], _merge_url_spans_partition,
        num_partitions=sort_parts, partial=_merge_url_spans_partition,
    )

    # re-attach urls to the final (small) span table
    def url_pairs(batch: pa.Table) -> pa.Table:
        uh = xxh64_strings(batch.column("url")).view(np.int64)
        return pa.table({"uhash": pa.array(uh, type=pa.int64()), "url": batch.column("url")})

    if url_list is not None and len(url_list) <= BROADCAST_URLMAP_LIMIT:
        # caller handed us an explicitly bounded url universe — broadcast it
        uh = xxh64_strings(list(url_list)).view(np.int64)
        order = np.argsort(uh, kind="stable")
        ref = ray.put((uh[order], np.asarray(list(url_list), dtype=object)[order]))
    else:
        # size the url universe WITHOUT a driver pull: the caller's hint,
        # else a Dataset count (metadata-cheap on the materialized inputs
        # every hot caller passes; executes the upstream once when lazy)
        n_urls = n_docs_hint
        if n_urls is None:
            try:
                n_urls = docs.count()
            except Exception:
                n_urls = None
        if n_urls is not None and n_urls <= BROADCAST_URLMAP_LIMIT:
            # DEFAULT at broadcastable sizes: a Ray TASK assembles the
            # sorted (uhash → url) lookup from the url-map dataset's own
            # block refs and every attach task reads it from plasma — zero
            # driver traffic (round-2's to_pandas default pulled the url
            # universe to the driver; round-3's join default was ~2×
            # slower than the whole spans compute in this Ray version)
            url_map_ds = docs.select_columns(["url"]).map_batches(
                url_pairs, batch_format="pyarrow"
            ).materialize()

            ref = assemble_blocks(
                url_map_ds, ["uhash", "url"], _finalize_url_lookup,
                empty=(np.empty(0, dtype=np.int64),
                       np.empty(0, dtype=object)),
            )
        else:
            # 100-TB path: distributed hash join of the (small) merged
            # span table against the url map
            url_map_ds = docs.select_columns(["url"]).map_batches(
                url_pairs, batch_format="pyarrow"
            )
            return merged.join(
                url_map_ds, join_type="inner",
                num_partitions=join_partitions(cfg.num_partitions),
                on=("uhash",), right_on=("uhash",),
            ).select_columns(["url", "start", "end"])

    def attach(batch: pa.Table) -> pa.Table:
        uh_s, urls_s = ray.get(ref)
        uh = batch.column("uhash").to_numpy(zero_copy_only=False)
        # guarded probe (a miss must drop the span, not alias another url)
        pos = np.minimum(np.searchsorted(uh_s, uh), max(len(uh_s) - 1, 0))
        found = uh_s[pos] == uh if len(uh_s) else np.zeros(len(uh), dtype=bool)
        return pa.table(
            {
                "url": pa.array(urls_s[pos][found], type=pa.string()),
                "start": batch.column("start").filter(pa.array(found)),
                "end": batch.column("end").filter(pa.array(found)),
            }
        )

    return merged.map_batches(attach, batch_format="pyarrow")
