"""Training-data curation kernels: repetition-based quality filtering
(Gopher-style), deterministic hash sampling, PII redaction, and n-gram
benchmark decontamination.

All are vectorized ``map_batches`` callables over Arrow batches — token
work rides the same zero-copy byte-path tokenizer the dedup stages use
(``tokenize_hashes_col``), n-gram statistics are one lexsort + run-length
pass per batch, and redaction is RE2 via ``pyarrow.compute`` (the same
regex engine DuckDB uses, so the oracles are byte-exact).

Repetition thresholds follow the published Gopher quality rules (Rae et
al. 2021, "Scaling Language Models", table A1): drop documents whose most
frequent token or whose duplicated n-grams cover too much of the text.
The exact metric definitions here are chosen to be SQL-expressible so the
DuckDB oracle can recompute them from the token lists.

Scale notes (100 TB): every kernel is per-document and stateless — no
shuffle anywhere. Decontamination assembles the (small) benchmark
shingle-hash set in-cluster into one broadcast array and probes it per
batch with ``searchsorted``; the corpus side never leaves its blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sick_ray.shuffle import first_mask
from sick_ray.stages.minhash import tokenize_hashes_col

# 64-bit multiplicative mix for rolling n-gram hashes over token hashes
# (odd constant from splitmix64's increment; any odd 64-bit works)
_NGRAM_K = np.uint64(0x9E3779B97F4A7C15)


def _doc_index(offsets: np.ndarray) -> np.ndarray:
    """Doc index per flat token from the [n+1] token-offset array."""
    return np.repeat(
        np.arange(len(offsets) - 1, dtype=np.int64), np.diff(offsets)
    )


def ngram_hashes(th: np.ndarray, offsets: np.ndarray, k: int):
    """Rolling k-gram hashes over each doc's token-hash run.

    Returns ``(g, gdoc)``: one uint64 hash per in-doc k-gram position and
    its doc index. Docs with fewer than k tokens emit nothing. One
    vectorized polynomial pass — no per-doc Python.
    """
    n_tok = len(th)
    if n_tok < k:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    tdoc = _doc_index(offsets)
    m = n_tok - k + 1
    g = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        g = g * _NGRAM_K + th[j : j + m]
    valid = tdoc[: m] == tdoc[k - 1 :]          # k-gram stays inside one doc
    return g[valid], tdoc[:m][valid]


def _per_doc_run_stats(keys: np.ndarray, doc: np.ndarray, n_docs: int):
    """(count, distinct, max-multiplicity) of ``keys`` grouped per doc.

    One lexsort by (doc, key) then run-length math; scatters into dense
    [n_docs] arrays so empty docs read as zeros.
    """
    total = np.zeros(n_docs, dtype=np.int64)
    distinct = np.zeros(n_docs, dtype=np.int64)
    top = np.zeros(n_docs, dtype=np.int64)
    if not len(keys):
        return total, distinct, top
    order = np.lexsort((keys, doc))
    ks, ds = keys[order], doc[order]
    run_fm = first_mask(ds) | first_mask(ks)
    run_starts = np.flatnonzero(run_fm)
    run_len = np.diff(np.append(run_starts, len(ks)))
    run_doc = ds[run_starts]
    doc_fm = first_mask(run_doc)
    doc_starts = np.flatnonzero(doc_fm)
    docs_present = run_doc[doc_starts]
    total[docs_present] = np.add.reduceat(run_len, doc_starts)
    distinct[docs_present] = np.diff(
        np.append(doc_starts, len(run_doc))
    )
    top[docs_present] = np.maximum.reduceat(run_len, doc_starts)
    return total, distinct, top


def add_repetition_stats(
    batch: pa.Table,
    ngram_k: int = 5,
    top_token_max_ppm: int = 200_000,
    dup_ngram_max_ppm: int = 300_000,
) -> pa.Table:
    """Gopher-style repetition metrics per document.

    Emits ``n_tokens``, ``top_token_n`` (multiplicity of the most frequent
    token), ``n_5grams``/``n_distinct_5grams``, the two fractions as EXACT
    parts-per-million integers (``floor(x * 1e6 / max(denom, 1))`` in
    float64 — the identical IEEE expression the SQL oracle computes, so no
    round-half-even vs half-away drift), and ``gopher_keep`` — 1 when the
    doc passes both repetition caps (top-word 20%, dup-n-gram 30% —
    the Gopher table A1 values).
    """
    col = batch.column("text")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    th, offs = tokenize_hashes_col(col)
    h = th.view(np.int64)
    tdoc = _doc_index(offs)
    n_tokens, _, top_n = _per_doc_run_stats(h, tdoc, n)
    g, gdoc = ngram_hashes(th, offs, ngram_k)
    n_g, n_gd, _ = _per_doc_run_stats(g.view(np.int64), gdoc, n)

    tok_div = np.maximum(n_tokens, 1).astype(np.float64)
    g_div = np.maximum(n_g, 1).astype(np.float64)
    top_ppm = np.floor(top_n * 1e6 / tok_div).astype(np.int64)
    dup_ppm = np.floor((n_g - n_gd) * 1e6 / g_div).astype(np.int64)
    keep = (top_ppm <= top_token_max_ppm) & (dup_ppm <= dup_ngram_max_ppm)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "top_token_n": pa.array(top_n, type=pa.int64()),
            "n_5grams": pa.array(n_g, type=pa.int64()),
            "n_distinct_5grams": pa.array(n_gd, type=pa.int64()),
            "top_token_ppm": pa.array(top_ppm, type=pa.int64()),
            "dup_5gram_ppm": pa.array(dup_ppm, type=pa.int64()),
            "gopher_keep": pa.array(keep.astype(np.int64), type=pa.int64()),
        }
    )


# --------------------------------------------------------------- sampling

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(1) << np.uint64(32)


def hash_sample_mask(ids: np.ndarray, buckets: int, residue: int) -> np.ndarray:
    """Deterministic multiplicative-hash sample: keep rows whose
    ``(id * 2654435761) mod 2^32 mod buckets == residue``. Knuth's
    multiplicative scheme — SQL-expressible with INT128 (DuckDB HUGEINT)
    arithmetic, so the same sample is reproducible by any engine; plain
    BIGINT overflows at id ≥ ~3.47e9. The uint64 product here wraps mod
    2^64, which is exact: 2^32 divides 2^64, so the result equals
    (id * K) mod 2^32 for every non-negative id. Stateless per row; at
    100 TB this is a pure map with no coordination."""
    v = ids.astype(np.uint64) * _KNUTH % _MOD32
    return (v % np.uint64(buckets)) == np.uint64(residue)


# ------------------------------------------------------------- PII redact

# RE2-safe patterns (no backrefs/lookaround) — identical semantics in
# pyarrow.compute (RE2) and DuckDB regexp_* (RE2)
EMAIL_RE = r"[0-9A-Za-z._%+\-]+@[0-9A-Za-z.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b[0-9]{3}-[0-9]{4}\b"


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Count and mask email addresses and phone-like numbers.

    Emails are replaced first (their local part can contain digits that
    would otherwise half-match the phone pattern), then phones — the
    oracle applies the same order.
    """
    text = batch.column(text_col)
    n_emails = pc.count_substring_regex(text, EMAIL_RE).cast(pa.int64())
    red = pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>")
    n_phones = pc.count_substring_regex(red, PHONE_RE).cast(pa.int64())
    red = pc.replace_substring_regex(red, PHONE_RE, "<PHONE>")
    out = batch.drop_columns([text_col])
    out = out.append_column("n_emails", n_emails)
    out = out.append_column("n_phones", n_phones)
    out = out.append_column("redacted", red)
    return out


# -------------------------------------------------------- decontamination

def shingle_hash_table(
    ds, k: int = 8, id_filter_mod: int | None = None, id_filter_res: int = 0
):
    """Distinct k-gram shingle hashes of (a subset of) a documents
    Dataset, as a Dataset of uint64-as-int64 rows. Used to build the
    benchmark side of decontamination."""
    def emit(batch: pa.Table) -> pa.Table:
        b = batch
        if id_filter_mod is not None:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            b = b.filter(pa.array(ids % id_filter_mod == id_filter_res))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        th, offs = tokenize_hashes_col(col)
        g, _ = ngram_hashes(th, offs, k)
        return pa.table({"g": pa.array(np.unique(g.view(np.int64)),
                                       type=pa.int64())})

    return ds.map_batches(emit, batch_format="pyarrow")


def finalize_shingle_set(tbl: pa.Table) -> np.ndarray:
    """assemble_blocks finalize: unique-sorted ``g`` column — the broadcast
    probe array (assembled in-cluster; the driver never touches it)."""
    return np.unique(tbl.column("g").to_numpy(zero_copy_only=False))


def make_contamination_prober(bench_ref, k: int = 8):
    """Per-batch prober: flags docs sharing any k-token shingle with the
    broadcast benchmark set. ``bench_ref`` is an ObjectRef of the sorted
    int64 hash array — typically the return ref of an in-cluster
    ``assemble_blocks(…, finalize_shingle_set)`` task (zero driver
    traffic), though any
    ref (e.g. ``ray.put`` in tests) works; ``ray.get`` inside the task
    reads it zero-copy from plasma."""

    def probe(batch: pa.Table) -> pa.Table:
        import ray

        bench_sorted = ray.get(bench_ref)
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        th, offs = tokenize_hashes_col(col)
        g, gdoc = ngram_hashes(th, offs, k)
        hit = np.zeros(len(col), dtype=bool)
        if len(g):
            gs = g.view(np.int64)
            pos = np.clip(
                np.searchsorted(bench_sorted, gs), 0,
                max(len(bench_sorted) - 1, 0),
            )
            ok = (
                bench_sorted[pos] == gs
                if len(bench_sorted)
                else np.zeros(len(gs), dtype=bool)
            )
            np.logical_or.at(hit, gdoc[ok], True)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "contaminated": pa.array(hit.astype(np.int64),
                                         type=pa.int64()),
            }
        )

    return probe


# ------------------------------------------------------ chunk-level dedup

def chunk_hashes(th: np.ndarray, offsets: np.ndarray, size: int):
    """Non-overlapping ``size``-token chunk hashes per doc (the last chunk
    of a doc may be shorter). The chunk hash is the order-sensitive
    polynomial ``sum(th[j] * K^(L-1-j'))`` over the chunk's token hashes
    (uint64 wrap), so hash equality ⇔ exact token-sequence equality
    (modulo 2^-64 collisions — the same standing assumption as fp64).

    Returns ``(ch uint64, cdoc int64, cidx int64, cstarts int64)``: one
    hash per chunk, its doc index, its 0-based chunk index within the
    doc, and the chunk's first-token position in the flat token array.
    Zero-token docs emit no chunks. One vectorized pass — no per-doc
    Python.
    """
    n_tok = len(th)
    if n_tok == 0:
        z = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=np.uint64), z, z, z
    tdoc = _doc_index(offsets)
    pos_in_doc = np.arange(n_tok, dtype=np.int64) - offsets[tdoc]
    is_start = (pos_in_doc % size) == 0          # doc starts reset pos to 0
    cstarts = np.flatnonzero(is_start)
    clen = np.diff(np.append(cstarts, n_tok))
    c_of_tok = np.cumsum(is_start) - 1
    pos_in_chunk = np.arange(n_tok, dtype=np.int64) - cstarts[c_of_tok]
    # K^e per token, e = chunk_len - 1 - pos_in_chunk (≤ size - 1);
    # cumprod on the uint64 ARRAY wraps mod 2^64 silently (scalar ops warn)
    pows = np.concatenate(
        [np.ones(1, dtype=np.uint64),
         np.cumprod(np.full(size - 1, _NGRAM_K, dtype=np.uint64))]
    ) if size > 1 else np.ones(1, dtype=np.uint64)
    contrib = th * pows[clen[c_of_tok] - 1 - pos_in_chunk]
    ch = np.add.reduceat(contrib, cstarts)
    return ch, tdoc[cstarts], pos_in_doc[cstarts] // size, cstarts


def join_tokens_by_doc(low: np.ndarray, t_start: np.ndarray,
                       t_end: np.ndarray, tok_mask: np.ndarray,
                       tdoc: np.ndarray, n_docs: int) -> pa.Array:
    """Per doc, the masked tokens (byte spans into the lowercased buffer
    ``low``) joined by single spaces → ``pa.StringArray[n_docs]``. Docs
    with no masked token come out as ''. One vectorized ragged-copy pass
    over the output buffer — no per-doc Python. ``tdoc`` must be in doc
    order (tokenize_hashes_col emits it that way)."""
    kt = np.flatnonzero(tok_mask)
    if len(kt) == 0:
        return pa.array([""] * n_docs, type=pa.large_string())
    ks, kd = t_start[kt], tdoc[kt]
    lens = (t_end[kt] - ks).astype(np.int64)
    last = np.ones(len(kt), dtype=bool)
    last[:-1] = kd[1:] != kd[:-1]
    out_len = lens + (~last)          # +1 space unless last kept in its doc
    dst_start = np.cumsum(out_len) - out_len
    dst = np.full(int(out_len.sum()), 0x20, dtype=np.uint8)
    ragged = (np.arange(int(lens.sum()), dtype=np.int64)
              - np.repeat(np.cumsum(lens) - lens, lens))
    dst[np.repeat(dst_start, lens) + ragged] = low[np.repeat(ks, lens) + ragged]
    doc_len = np.zeros(n_docs, dtype=np.int64)
    np.add.at(doc_len, kd, out_len)
    # int64 offsets (large_string): int32 offsets silently wrap past 2 GiB
    # of kept text in one batch — plausible for long web documents
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    offsets[1:] = doc_len.cumsum()
    # py_buffer over the ndarrays directly (buffer protocol, keeps them
    # alive) — .tobytes() would duplicate both buffers per call
    return pa.Array.from_buffers(
        pa.large_string(), n_docs,
        [None, pa.py_buffer(offsets), pa.py_buffer(dst)],
    )


def _pack_doc_chunk_key(ids: np.ndarray, cidx: np.ndarray) -> np.ndarray:
    """Pack (doc id, chunk idx) into one uint64 key: 40 id bits (1e12
    docs — the 100-TB range) | 24 idx bits (16M chunks = 268M tokens per
    doc). Out-of-range inputs raise LOUDLY — a wrapped key would silently
    alias two different chunks and corrupt the dedup (review-confirmed
    with doc_id = 2^32 before this guard existed)."""
    if len(ids) and (int(ids.max()) >= 1 << 40 or int(ids.min()) < 0):
        raise ValueError(
            "chunk_dedup id column must be in [0, 2^40); got "
            f"[{ids.min()}, {ids.max()}] — remap ids before deduping"
        )
    if len(cidx) and int(cidx.max()) >= 1 << 24:
        raise ValueError(
            f"doc has {cidx.max() + 1} chunks (>= 2^24); raise chunk size"
        )
    return (ids.astype(np.uint64) << np.uint64(24)) | cidx.astype(np.uint64)


def chunk_dedup(ds, chunk: int = 16, id_col: str = "doc_id",
                text_col: str = "text", num_partitions: int = 64):
    """Chunk-level exact dedup core (the C4/MassiveText repeated-passage
    remover): split every doc into non-overlapping ``chunk``-token
    chunks, keep only each distinct chunk's FIRST corpus occurrence
    (min (id, chunk_idx)), and emit the doc rebuilt from its surviving
    chunks — ``(id_col, n_chunks, n_kept, text_kept)``.

    Ray shape (100 TB): stage A ships only 16 B (chunk_hash, packed
    id/idx key) rows into one hash shuffle whose reduce is a segment
    min — corpus text never moves. The winner key set (≤ one row per
    distinct chunk) is assembled in-cluster (assemble_blocks) and probed
    per batch with a guarded searchsorted; above ~2M winners swap the
    broadcast for a hash join on ``id_col`` (the BROADCAST_KEYS_LIMIT
    convention). Reassembly slices kept tokens zero-copy from the
    tokenizer's own lowercased buffer (join_tokens_by_doc), so the
    output text is the lowercase space-joined token stream — byte-equal
    to SQL's array_to_string over regexp_extract_all(lower(text)).

    NOTE: ``ds`` is consumed TWICE (winner pass + rebuild pass); a LAZY
    input re-executes its upstream map chain once per consumer. For
    cheap vectorized chains (parquet read, filters, redaction) that
    re-execution streams and is cheaper than materializing a
    corpus-sized intermediate into the object store; materialize
    expensive inputs (a join output, a model-scoring stage) first."""
    import ray

    from sick_ray.shuffle import assemble_blocks, grouped_apply

    def chunk_rows(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        th, offs = tokenize_hashes_col(col)
        ch, cdoc, cidx, _ = chunk_hashes(th, offs, chunk)
        did = batch.column(id_col).to_numpy(zero_copy_only=False)
        key = _pack_doc_chunk_key(did[cdoc], cidx)
        return pa.table(
            {"ch": pa.array(ch.view(np.int64)),
             "key": pa.array(key.view(np.int64))}
        )

    def first_per_chunk(part: pa.Table) -> pa.Table:
        ch = part.column("ch").to_numpy(zero_copy_only=False)
        key = part.column("key").to_numpy(zero_copy_only=False)
        # uint64 view: the packed key must compare UNSIGNED (an int64
        # view would order ids ≥ 2^31 before id 0)
        order = np.lexsort((key.view(np.uint64), ch))
        ch_s, key_s = ch[order], key[order]
        fm = first_mask(ch_s)
        return pa.table({"key": pa.array(key_s[fm], type=pa.int64())})

    # materialize: assemble_blocks reads the block refs AND Ray probes
    # the schema — an unmaterialized plan re-executes per consumer
    winners = grouped_apply(
        ds.map_batches(chunk_rows, batch_format="pyarrow"),
        ["ch"], first_per_chunk, num_partitions=num_partitions,
    ).materialize()

    def finalize_keys(tbl: pa.Table) -> np.ndarray:
        return np.sort(
            tbl.column("key").to_numpy(zero_copy_only=False).view(np.uint64)
        )

    win_ref = assemble_blocks(
        winners, ["key"], finalize_keys, empty=np.empty(0, dtype=np.uint64)
    )

    def rebuild(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        did = batch.column(id_col).to_numpy(zero_copy_only=False)
        th, offs, t_start, t_end, low = tokenize_hashes_col(
            col, return_spans=True
        )
        ch, cdoc, cidx, cstarts = chunk_hashes(th, offs, chunk)
        keys = _pack_doc_chunk_key(did[cdoc], cidx)
        w = ray.get(win_ref)
        pos = np.searchsorted(w, keys)
        np.clip(pos, 0, max(len(w) - 1, 0), out=pos)
        kept_chunk = (w[pos] == keys) if len(w) else np.zeros(len(keys), bool)
        n_chunks = np.zeros(n, dtype=np.int64)
        np.add.at(n_chunks, cdoc, 1)
        n_kept = np.zeros(n, dtype=np.int64)
        np.add.at(n_kept, cdoc[kept_chunk], 1)
        # kept tokens: a token is kept iff its chunk won
        clen = np.diff(np.append(cstarts, len(th)))
        tok_kept = np.repeat(kept_chunk, clen)
        if t_start is not None:
            text_kept = join_tokens_by_doc(
                low, t_start, t_end, tok_kept, _doc_index(offs), n
            )
        else:
            # non-ASCII fallback: recover tokens with the exact tokenizer
            import re as _re

            out, t_i = [], 0
            for t in col.to_pylist():
                toks = _re.findall(r"[^\W_]+", (t or "").lower())
                kept = [tok for tok in toks if tok_kept[(t_i := t_i + 1) - 1]]
                out.append(" ".join(kept))
            # large_string to match the fast path — mixed-schema blocks
            # (ASCII batches fast, non-ASCII batches fallback) must unify
            text_kept = pa.array(out, type=pa.large_string())
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_chunks": pa.array(n_chunks, type=pa.int64()),
                "n_kept": pa.array(n_kept, type=pa.int64()),
                "text_kept": text_kept,
            }
        )

    return ds.map_batches(rebuild, batch_format="pyarrow")


def slice_token_strings(low: np.ndarray, starts: np.ndarray,
                        ends: np.ndarray) -> pa.Array:
    """One string per (start, end) byte span of the lowercased buffer
    ``low`` → ``pa.large_string`` array, assembled with a single
    vectorized ragged copy (the per-element ``.tobytes().decode()`` loop
    this replaces was 10^5+ Python calls per map task)."""
    n = len(starts)
    if n == 0:
        return pa.array([], type=pa.large_string())
    lens = (ends - starts).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    offsets[1:] = lens.cumsum()
    ragged = (np.arange(int(lens.sum()), dtype=np.int64)
              - np.repeat(offsets[:-1], lens))
    dst = low[np.repeat(starts.astype(np.int64), lens) + ragged]
    return pa.Array.from_buffers(
        pa.large_string(), n,
        [None, pa.py_buffer(offsets), pa.py_buffer(dst)],
    )


def weighted_sample_mask(ids: np.ndarray, rate_permille: np.ndarray) -> np.ndarray:
    """Per-row weighted sample: keep rows whose
    ``(id * 2654435761) mod 2^32 mod 1000 < rate_permille`` — the
    data-mixing primitive (per-source keep rates). Same Knuth
    multiplicative hash and INT128-SQL-expressibility as
    :func:`hash_sample_mask`; membership is engine-reproducible and
    independent of sharding. ``rate_permille``: int array aligned with
    ``ids`` (0 = drop all, 1000 = keep all)."""
    v = ids.astype(np.uint64) * _KNUTH % _MOD32
    return (v % np.uint64(1000)).astype(np.int64) < rate_permille


def _keep_first_n(run_first: np.ndarray, n: int) -> np.ndarray:
    """Boolean mask keeping the first ``n`` positions of each run, where
    ``run_first`` marks run starts over a run-sorted array."""
    starts = np.flatnonzero(run_first)
    lens = np.diff(np.append(starts, len(run_first)))
    rank = np.arange(len(run_first), dtype=np.int64) - np.repeat(starts, lens)
    return rank < n


def cap_per_source(ds, cap: int = 10, id_col: str = "doc_id",
                   key_col: str = "source", num_partitions: int = 16):
    """Hot-source capping (the RefinedWeb/C4 per-domain limit): keep at
    most ``cap`` docs per ``key_col``, deterministically the lowest
    ``id_col`` values, and flag every row — Dataset (id_col, key_col,
    keep:bool).

    Ray shape (100 TB): each batch pre-truncates to its own first-N per
    source (dictionary-encode the key, one int lexsort), so the shuffle
    moves at most cap rows per source per batch; the grouped reduce
    repeats the same keep-first-N, and the winner id set (≤ cap ×
    n_sources rows) is assembled in-cluster and probed per batch with a
    guarded searchsorted — the corpus itself never shuffles. A key
    universe above the broadcast limit would swap the probe for a hash
    join on ``id_col`` (the BROADCAST_KEYS_LIMIT convention); source
    cardinality is bounded in practice (domains, not documents)."""
    import ray

    from sick_ray.shuffle import assemble_blocks, grouped_apply

    def first_n_rows(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = pc.dictionary_encode(col).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes))
        keep = _keep_first_n(first_mask(codes[order]), cap)
        sel = order[keep]
        return pa.table({
            key_col: col.take(pa.array(sel)),
            id_col: pa.array(ids[sel], type=pa.int64()),
        })

    winners = grouped_apply(
        ds.select_columns([id_col, key_col]).map_batches(
            first_n_rows, batch_format="pyarrow"),
        [key_col], first_n_rows, num_partitions=num_partitions,
    ).materialize()

    def finalize_ids(tbl: pa.Table) -> np.ndarray:
        return np.sort(tbl.column(id_col).to_numpy(zero_copy_only=False))

    win_ref = assemble_blocks(
        winners, [id_col], finalize_ids, empty=np.empty(0, dtype=np.int64)
    )

    def flag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        w = ray.get(win_ref)
        pos = np.searchsorted(w, ids)
        np.clip(pos, 0, max(len(w) - 1, 0), out=pos)
        keep = (w[pos] == ids) if len(w) else np.zeros(len(ids), bool)
        return pa.table({
            id_col: batch.column(id_col),
            key_col: batch.column(key_col),
            "keep": pa.array(keep),
        })

    return ds.select_columns([id_col, key_col]).map_batches(
        flag, batch_format="pyarrow")


def novelty_stats(ds, k: int = 8, id_col: str = "doc_id",
                  text_col: str = "text", num_partitions: int = 64):
    """Per-doc n-gram novelty: of each doc's DISTINCT ``k``-gram
    shingles, how many does it OWN (owner = lowest doc_id containing the
    shingle corpus-wide)? Dataset (doc_id, n_shingles, n_novel,
    novel_ppm) with novel_ppm = n_novel·10⁶ // n_shingles — the standard
    dedup-effectiveness / memorization-risk diagnostic. Docs with fewer
    than ``k`` tokens emit nothing.

    Ray shape (100 TB): the map side emits one 16 B (shingle_hash,
    doc_id) row per distinct in-doc shingle (a doc lives in exactly one
    batch, so per-batch distinct IS global distinct); the shingle-keyed
    shuffle computes each shingle's owner with a run min and folds
    per-doc (total, novel) partials INSIDE the same reduce, so the
    second (doc-keyed) shuffle moves at most one 24 B row per doc per
    partition. Shingles are 64-bit rolling hashes of token hashes — a
    hash collision merging two distinct text shingles would undercount
    by 1 (probability ~n²/2⁶⁴; the SQL oracle compares exact strings)."""
    from sick_ray.shuffle import grouped_apply

    def shingle_rows(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        th, offs = tokenize_hashes_col(col)
        g, gdoc = ngram_hashes(th, offs, k)
        did = batch.column(id_col).to_numpy(zero_copy_only=False)[gdoc]
        order = np.lexsort((g, did))
        g_s, d_s = g[order], did[order]
        fm = first_mask(d_s) | first_mask(g_s)
        return pa.table({
            "sh": pa.array(g_s[fm].view(np.int64)),
            id_col: pa.array(d_s[fm], type=pa.int64()),
        })

    def owner_partials(part: pa.Table) -> pa.Table:
        sh = part.column("sh").to_numpy(zero_copy_only=False)
        did = part.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((did, sh))
        sh_s, d_s = sh[order], did[order]
        fm = first_mask(sh_s)
        starts = np.flatnonzero(fm)
        lens = np.diff(np.append(starts, len(sh_s)))
        # rows are (sh, doc)-sorted, so each run's FIRST doc is its owner
        is_owner = np.zeros(len(sh_s), dtype=np.int64)
        is_owner[starts] = 1
        o2 = np.argsort(d_s, kind="stable")
        dd, io = d_s[o2], is_owner[o2]
        dstarts = np.flatnonzero(first_mask(dd))
        total = np.diff(np.append(dstarts, len(dd)))
        novel = np.add.reduceat(io, dstarts) if len(dd) else np.empty(0, np.int64)
        return pa.table({
            id_col: pa.array(dd[dstarts], type=pa.int64()),
            "total": pa.array(total, type=pa.int64()),
            "novel": pa.array(novel, type=pa.int64()),
        })

    def combine(part: pa.Table) -> pa.Table:
        did = part.column(id_col).to_numpy(zero_copy_only=False)
        tot = part.column("total").to_numpy(zero_copy_only=False)
        nov = part.column("novel").to_numpy(zero_copy_only=False)
        order = np.argsort(did, kind="stable")
        dd = did[order]
        starts = np.flatnonzero(first_mask(dd))
        t = np.add.reduceat(tot[order], starts)
        v = np.add.reduceat(nov[order], starts)
        return pa.table({
            id_col: pa.array(dd[starts], type=pa.int64()),
            "n_shingles": pa.array(t, type=pa.int64()),
            "n_novel": pa.array(v, type=pa.int64()),
            "novel_ppm": pa.array(v * 1_000_000 // t, type=pa.int64()),
        })

    rows = ds.select_columns([id_col, text_col]).map_batches(
        shingle_rows, batch_format="pyarrow")
    # STAGED sorts: never chain two sort shuffles in one streaming
    # execution (measured 3x regression fused; see tfidf/duplicate_spans)
    partials = grouped_apply(rows, ["sh"], owner_partials,
                             num_partitions=num_partitions).materialize()
    return grouped_apply(partials, [id_col], combine,
                         num_partitions=num_partitions)


def source_overlap(ds, k: int = 8, key_col: str = "source",
                   text_col: str = "text", num_partitions: int = 64,
                   pair_cap: int = 1 << 20):
    """Cross-source n-gram leakage matrix: for every unordered source
    pair, how many DISTINCT ``k``-gram shingles appear in both — the
    corpus-overlap / contamination diagnostic run before mixing corpora.
    Dataset (src_a, src_b, n_shared) with src_a < src_b.

    Ray shape (100 TB): the map side emits per-batch-distinct
    (shingle_hash, source) rows; the shingle-keyed shuffle deduplicates
    globally, emits each group's source pairs via the counted-cap
    ``segment_pairs`` emitter (a shingle in g sources yields C(g,2)
    pairs — the same doc-frequency blowup the n-gram index caps), and
    pre-aggregates pair counts INSIDE the partition, so the final
    (src_a, src_b)-keyed shuffle moves at most one row per pair per
    partition. Source codes are per-partition ranks of the SORTED
    source strings, so code order == lexicographic order and src_a <
    src_b matches SQL string comparison. 64-bit shingle-hash collisions
    merge two string shingles (~n²/2⁶⁴; the oracle uses exact strings).
    """
    from sick_ray.shuffle import grouped_apply, segment_pairs

    def shingle_src_rows(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        th, offs = tokenize_hashes_col(col)
        g, gdoc = ngram_hashes(th, offs, k)
        src = np.asarray(batch.column(key_col).to_pylist(), dtype=object)
        uniq, inv = np.unique(src, return_inverse=True)
        code = inv[gdoc]
        order = np.lexsort((code, g))
        g_s, c_s = g[order], code[order]
        fm = first_mask(g_s) | first_mask(c_s)
        return pa.table({
            "g": pa.array(g_s[fm].view(np.int64)),
            key_col: pa.array(uniq[c_s[fm]], type=pa.string()),
        })

    def pair_partials(part: pa.Table) -> pa.Table:
        g = part.column("g").to_numpy(zero_copy_only=False)
        src = np.asarray(part.column(key_col).to_pylist(), dtype=object)
        uniq, inv = np.unique(src, return_inverse=True)
        order = np.lexsort((inv, g))
        g_s, c_s = g[order], inv[order]
        # global distinct (a (g, source) pair may arrive from many batches)
        fm = first_mask(g_s) | first_mask(c_s)
        g_s, c_s = g_s[fm], c_s[fm]
        ii, jj, tp, tg = segment_pairs(g_s, pair_cap)
        if tp:
            # counting semantics: a truncated group UNDERCOUNTS, it does
            # not just lose recall — refuse loudly rather than degrade.
            # pair_cap must be ≥ C(n_sources, 2); sources are domains, so
            # this binds only at ≥ ~1449 distinct sources sharing ONE
            # shingle under the default cap.
            raise ValueError(
                f"source_overlap: {tg} shingle groups exceed pair_cap="
                f"{pair_cap} (C(n_sources,2) pairs needed for exact "
                "counts); raise pair_cap")
        if not len(ii):
            return pa.table({
                "src_a": pa.array([], type=pa.string()),
                "src_b": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            })
        # within a g run codes ascend, so c[ii] < c[jj] == lexicographic
        key = c_s[ii].astype(np.int64) * len(uniq) + c_s[jj]
        pk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "src_a": pa.array(uniq[pk // len(uniq)], type=pa.string()),
            "src_b": pa.array(uniq[pk % len(uniq)], type=pa.string()),
            "n": pa.array(cnt, type=pa.int64()),
        })

    def combine(part: pa.Table) -> pa.Table:
        a = np.asarray(part.column("src_a").to_pylist(), dtype=object)
        b = np.asarray(part.column("src_b").to_pylist(), dtype=object)
        n = part.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a_s, b_s, n_s = a[order], b[order], n[order]
        fm = first_mask(a_s) | first_mask(b_s)
        starts = np.flatnonzero(fm)
        sums = np.add.reduceat(n_s, starts) if len(n_s) else np.empty(0, np.int64)
        return pa.table({
            "src_a": pa.array(a_s[starts], type=pa.string()),
            "src_b": pa.array(b_s[starts], type=pa.string()),
            "n_shared": pa.array(sums, type=pa.int64()),
        })

    rows = ds.select_columns([key_col, text_col]).map_batches(
        shingle_src_rows, batch_format="pyarrow")
    # STAGED sorts (the two-sort rule); the pair partials are tiny, so
    # the materialize is O(n_pairs x partitions), not corpus-sized
    partials = grouped_apply(rows, ["g"], pair_partials,
                             num_partitions=num_partitions).materialize()
    return grouped_apply(partials, ["src_a", "src_b"], combine,
                         num_partitions=max(4, num_partitions // 8))


def dsir_scores(ds, target_mod: int = 50, target_res: int = 0,
                id_col: str = "doc_id", text_col: str = "text",
                num_partitions: int = 64):
    """DSIR-style importance scores (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score each corpus
    doc by how target-like its unigram distribution is. This variant is
    a deterministic INTEGER ratio — per-term score
    ``(target_count · 10⁹) // corpus_count`` summed over the doc's token
    occurrences, divided by n_tokens — instead of the paper's hashed
    log-likelihood ratio, so a SQL oracle reproduces it exactly (same
    reason gopher/tfidf use exact-ppm integers). The target set here is
    ``doc_id % target_mod == target_res`` (the decontamination
    convention); swap for a real reference corpus in production.

    Dataset (doc_id, n_tokens, dsir_score) over NON-target docs; docs
    with zero tokens are absent (no occurrences to join).

    Ray shape (100 TB): map emits per-batch per-term (hash, t, s) count
    partials (16-24 B rows); ONE term-keyed shuffle sums them and keeps
    only terms with target_count > 0 (everything else scores 0 and never
    needs to ship); that score table is assembled in-cluster and probed
    per batch with a guarded searchsorted — the corpus text never
    shuffles. Above a ~2M-term score table swap the broadcast for a join
    on the token stream (BROADCAST_KEYS_LIMIT convention). Integer
    bound: target_count·10⁹ needs HUGEINT above ~9.2e9 occurrences of
    one term in the target (the sample_docs overflow convention).
    """
    import ray

    from sick_ray.shuffle import assemble_blocks, grouped_apply

    def count_rows(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        th, offs = tokenize_hashes_col(col)
        tdoc = _doc_index(offs)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        is_t = (ids % target_mod == target_res)[tdoc]
        h = th.view(np.int64)
        order = np.lexsort((is_t, h))
        h_s, t_s = h[order], is_t[order]
        fm = first_mask(h_s) | first_mask(t_s)
        starts = np.flatnonzero(fm)
        lens = np.diff(np.append(starts, len(h_s)))
        return pa.table({
            "h": pa.array(h_s[starts]),
            "t": pa.array(np.where(t_s[starts], lens, 0), type=pa.int64()),
            "s": pa.array(np.where(t_s[starts], 0, lens), type=pa.int64()),
        })

    def term_scores(part: pa.Table) -> pa.Table:
        h = part.column("h").to_numpy(zero_copy_only=False)
        t = part.column("t").to_numpy(zero_copy_only=False)
        s = part.column("s").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h_s = h[order]
        starts = np.flatnonzero(first_mask(h_s))
        tt = np.add.reduceat(t[order], starts) if len(h_s) else np.empty(0, np.int64)
        ss = np.add.reduceat(s[order], starts) if len(h_s) else np.empty(0, np.int64)
        keep = tt > 0                 # zero-score terms never ship
        sc = tt[keep] * 1_000_000_000 // np.maximum(ss[keep], 1)
        sc[ss[keep] == 0] = 0         # target-only terms never probed
        return pa.table({
            "h": pa.array(h_s[starts][keep]),
            "sc": pa.array(sc, type=pa.int64()),
        })

    counts = ds.select_columns([id_col, text_col]).map_batches(
        count_rows, batch_format="pyarrow")
    scores = grouped_apply(counts, ["h"], term_scores,
                           num_partitions=num_partitions).materialize()

    def finalize_scores(tbl: pa.Table):
        h = tbl.column("h").to_numpy(zero_copy_only=False)
        sc = tbl.column("sc").to_numpy(zero_copy_only=False)
        o = np.argsort(h, kind="stable")
        return np.ascontiguousarray(h[o]), np.ascontiguousarray(sc[o])

    score_ref = assemble_blocks(
        scores, ["h", "sc"], finalize_scores,
        empty=(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)),
    )

    def probe(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        nt_doc = ids % target_mod != target_res
        b = batch.filter(pa.array(nt_doc))
        if b.num_rows == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "dsir_score": pa.array([], type=pa.int64()),
            })
        col = b.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        th, offs = tokenize_hashes_col(col)
        h = th.view(np.int64)
        hs, sc = ray.get(score_ref)
        if len(hs):
            pos = np.searchsorted(hs, h)
            np.clip(pos, 0, len(hs) - 1, out=pos)
            tok_sc = np.where(hs[pos] == h, sc[pos], 0)
        else:
            # empty target (or no term with target_count > 0): every
            # occurrence scores 0 — sc[pos] on an empty table would raise
            tok_sc = np.zeros(len(h), dtype=np.int64)
        n_docs = b.num_rows
        n_tok = np.diff(offs)
        tot = np.zeros(n_docs, dtype=np.int64)
        np.add.at(tot, _doc_index(offs), tok_sc)
        keep = n_tok > 0              # zero-token docs have no occurrences
        bids = b.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(bids[keep], type=pa.int64()),
            "n_tokens": pa.array(n_tok[keep], type=pa.int64()),
            "dsir_score": pa.array(tot[keep] // n_tok[keep], type=pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pyarrow")
