"""Stage 2a — MinHash signatures as a stateful actor-pool map_batches.

The reference's load-once shared state is its page cache
(``SickSharp/Format/IO/PageCachedFile.cs:20-296``): built once, reused by
every lookup. Our analogue is a MinHash actor: the permutation coefficients
and compiled tokenizer are built once per actor in ``__init__`` and reused
across batches (``ds.map_batches(MinHasher, concurrency=N, batch_size=B)``).

Hash family: multiply-shift ``h_i(x) = ((a_i * x + b_i) mod 2^64) >> 32``
with odd random ``a_i`` (Dietzfelbinger et al., universal multiply-shift
hashing) — exact uint64 wraparound arithmetic, fully NumPy-vectorizable,
no Mersenne-prime modular reduction needed. Signatures are 128 x uint32.

Per-batch work is vectorized end to end: one regex pass per doc for tokens
(C-speed), one packed xxh64 batch call for all token hashes, a sliding-window
polynomial fold for shingle hashes, and ``np.minimum.reduceat`` over doc
segments for the signature matrix (chunked over permutations to bound peak
memory). A ``for row in batch`` loop never touches shingles.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from sick_ray.config import DedupConfig
from sick_ray.xxh import xxh64_batch

U64 = np.uint64
_MIX1 = U64(0xFF51AFD7ED558CCD)
_MIX2 = U64(0xC4CEB9FE1A85EC53)
_POLY = U64(0x9E3779B185EBCA87)  # odd
_EMPTY_SENTINEL = np.uint32(0xFFFFFFFF)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche (public domain finalizer)."""
    x = x ^ (x >> U64(33))
    x = x * _MIX1
    x = x ^ (x >> U64(33))
    x = x * _MIX2
    return x ^ (x >> U64(33))


_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

# byte-level lowercase + word-char tables for the ASCII fast path: the
# tokenizer [^\W_]+ on lowercased ASCII text is exactly "maximal runs of
# [0-9a-z] after A-Z→a-z", so pure byte ops reproduce the regex bit-exactly
_LOWER_LUT = np.arange(256, dtype=np.uint8)
_LOWER_LUT[65:91] += 32
_WORD_LUT = np.zeros(256, dtype=bool)
_WORD_LUT[ord("0"):ord("9") + 1] = True
_WORD_LUT[ord("a"):ord("z") + 1] = True


def _regex_token_hashes(texts: list[str], seed: int):
    """Per-doc regex path (exact Unicode semantics) — the non-ASCII
    fallback. Returns (token_hashes uint64 flat, counts int64 per doc)."""
    tok_lists = [_TOKEN_RE.findall(t.lower()) if t else [] for t in texts]
    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64), counts
    payload = "\x00".join(w for toks in tok_lists for w in toks).encode("utf-8")
    buf = np.frombuffer(payload, dtype=np.uint8)
    seps = np.flatnonzero(buf == 0)
    starts = np.zeros(total, dtype=np.int64)
    starts[1:] = seps + 1
    ends = np.empty(total, dtype=np.int64)
    ends[:-1] = seps
    ends[-1] = len(buf)
    th = xxh64_batch(buf, starts, ends - starts, seed)
    return th, counts


def _string_col_buffers(col):
    """(utf8 byte buffer uint8, per-doc byte offsets int64[n+1]) zero-copy
    from an Arrow string column (nulls read as empty)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type):
        odt = np.int64
    else:
        odt = np.int32
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=odt)[col.offset: col.offset + len(col) + 1]
    offs = offs.astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    # restrict to this column's byte range (sliced arrays share buffers)
    data = data[offs[0]: offs[-1] if len(offs) else 0]
    offs = offs - (offs[0] if len(offs) else 0)
    return data, offs


def tokenize_hashes_col(col, seed: int = 0, return_spans: bool = False):
    """All docs' token hashes packed flat, zero-copy from an Arrow string
    column. Returns (token_hashes uint64, doc_offsets int64[n+1]).

    ASCII docs take the vectorized byte path (lowercase LUT + run masks +
    one packed xxh64 batch over the column's own buffer — no Python per
    doc); docs containing non-ASCII bytes fall back to the exact Unicode
    regex per doc and are merged back in doc order. Round 1 measured the
    per-doc regex at ~60% of the minhash stage's CPU.

    ``return_spans=True`` additionally returns ``(t_start, t_end, low)`` —
    per-token byte ranges into the lowercased buffer — so callers needing
    token STRINGS (e.g. word count) can slice representatives from the
    buffer the hashes were computed over instead of re-tokenizing in
    Python. Spans are only available on the all-ASCII fast path; when any
    doc fell back to the regex path the spans triple is ``(None, None,
    None)`` and the caller must recover strings itself.
    """
    if getattr(col, "null_count", 0):
        import pyarrow.compute as pc

        col = pc.fill_null(col, "")
    n = len(col)
    buf, offs = _string_col_buffers(col)
    doc_lo, doc_hi = offs[:-1], offs[1:]
    # non-ASCII docs → regex fallback
    ascii_doc = np.ones(n, dtype=bool)
    na_pos = np.flatnonzero(buf >= 0x80)
    if len(na_pos):
        ascii_doc[np.unique(np.searchsorted(doc_hi, na_pos, side="right"))] = False
    low = _LOWER_LUT[buf]
    wc = _WORD_LUT[low]
    # token starts/ends: word-char runs, force-split at doc boundaries
    start_m = wc.copy()
    start_m[1:] &= ~wc[:-1]
    end_m = wc.copy()
    end_m[:-1] &= ~wc[1:]
    bnd = doc_lo[(doc_lo > 0) & (doc_lo < len(buf))]
    start_m[bnd] = wc[bnd]
    end_m[bnd - 1] = wc[bnd - 1]
    t_start = np.flatnonzero(start_m)
    t_end = np.flatnonzero(end_m) + 1
    t_doc = np.searchsorted(doc_hi, t_start, side="right")
    keep = ascii_doc[t_doc]
    t_start, t_end, t_doc = t_start[keep], t_end[keep], t_doc[keep]
    counts = np.zeros(n, dtype=np.int64)
    np.add.at(counts, t_doc, 1)
    th_a = xxh64_batch(low, t_start, t_end - t_start, seed)
    if ascii_doc.all():
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        if return_spans:
            return th_a, offsets, t_start, t_end, low
        return th_a, offsets
    # merge regex-tokenized non-ASCII docs back in doc order
    na_idx = np.flatnonzero(~ascii_doc)
    th_r, counts_r = _regex_token_hashes(
        [col[int(i)].as_py() for i in na_idx], seed
    )
    counts[na_idx] = counts_r
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    out = np.empty(int(offsets[-1]), dtype=np.uint64)
    if len(t_start):
        first_tok = np.searchsorted(t_doc, t_doc, side="left")
        out[offsets[t_doc] + (np.arange(len(t_doc)) - first_tok)] = th_a
    if len(th_r):
        roff = np.zeros(len(na_idx) + 1, dtype=np.int64)
        np.cumsum(counts_r, out=roff[1:])
        r_tok_doc = np.repeat(na_idx, counts_r)
        within = np.arange(len(th_r)) - np.repeat(roff[:-1], counts_r)
        out[offsets[r_tok_doc] + within] = th_r
    if return_spans:
        return out, offsets, None, None, None
    return out, offsets


def tokenize_hashes(texts: list[str], seed: int = 0):
    """List-of-str convenience wrapper over :func:`tokenize_hashes_col`."""
    return tokenize_hashes_col(
        pa.array(["" if t is None else t for t in texts], type=pa.string()), seed
    )


def shingle_hashes(token_hashes: np.ndarray, doc_offsets: np.ndarray, k: int):
    """Per-doc k-shingle hashes from the flat token-hash array.

    Returns (shingle_hashes uint64 flat, shingle_offsets int64[n+1]).
    Docs with 0 < n_tok < k get ONE shingle over all their tokens (matches
    the oracle's semantics in synth.shingle_set); empty docs get none.
    """
    n_docs = len(doc_offsets) - 1
    counts = doc_offsets[1:] - doc_offsets[:-1]
    T = len(token_hashes)
    if T == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(n_docs + 1, dtype=np.int64)
    # windows over the concatenated array; mask cross-doc windows after
    if T >= k:
        w = np.lib.stride_tricks.sliding_window_view(token_hashes, k)  # (T-k+1, k)
        acc = w[:, 0].copy()
        for j in range(1, k):
            acc = acc * _POLY + w[:, j]
        acc = _mix64(acc)
    else:
        acc = np.empty(0, dtype=np.uint64)
    doc_of = np.repeat(np.arange(n_docs), counts)  # doc id per token position
    out_counts = np.where(counts >= k, np.maximum(counts - k + 1, 0), np.minimum(counts, 1))
    out_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(out_counts, out=out_offsets[1:])
    out = np.empty(int(out_offsets[-1]), dtype=np.uint64)
    # full windows: window at flat pos i belongs to doc_of[i] iff doc_of[i]==doc_of[i+k-1]
    if T >= k:
        valid = doc_of[: T - k + 1] == doc_of[k - 1 :]
        vpos = np.flatnonzero(valid)
        # windows are emitted in flat order == grouped by doc already
        big = counts >= k
        out_idx = np.concatenate(
            [np.arange(out_offsets[d], out_offsets[d + 1]) for d in np.flatnonzero(big)]
        ) if big.any() else np.empty(0, dtype=np.int64)
        out[out_idx] = acc[vpos]
    # short docs: single shingle = fold of all tokens (vectorized over docs)
    short = np.flatnonzero((counts > 0) & (counts < k))
    if len(short) > 0:
        acc_s = token_hashes[doc_offsets[short]].copy()
        for j in range(1, k - 1):
            m = counts[short] > j
            idx = short[m]
            acc_s[m] = acc_s[m] * _POLY + token_hashes[doc_offsets[idx] + j]
        out[out_offsets[short]] = _mix64(acc_s)
    return out, out_offsets


def minhash_signatures(
    sh: np.ndarray, sh_offsets: np.ndarray, a: np.ndarray, b: np.ndarray,
    scratch: np.ndarray | None = None,
) -> np.ndarray:
    """(n_docs, num_perm) uint32 signature matrix.

    One reusable 1-D scratch buffer + in-place ufuncs per permutation:
    fresh large allocations are avoided deliberately — first-touch page
    faults dominate the cost of the (T × perms) broadcast formulation in
    sandboxed/microVM environments (measured ~50× the arithmetic cost).
    Pass a persistent ``scratch`` (actor state) to amortize across batches.
    """
    n_docs = len(sh_offsets) - 1
    num_perm = len(a)
    sig = np.full((n_docs, num_perm), _EMPTY_SENTINEL, dtype=np.uint32)
    if len(sh) == 0:
        return sig
    counts = sh_offsets[1:] - sh_offsets[:-1]
    nonempty = np.flatnonzero(counts > 0)
    starts = sh_offsets[nonempty]
    T = len(sh)
    if scratch is None or len(scratch) < T:
        scratch = np.empty(T, dtype=np.uint64)
    buf = scratch[:T]
    col = np.empty(len(nonempty), dtype=np.uint64)
    for j in range(num_perm):
        np.multiply(sh, a[j], out=buf)
        np.add(buf, b[j], out=buf)
        np.right_shift(buf, U64(32), out=buf)
        np.minimum.reduceat(buf, starts, out=col)
        sig[nonempty, j] = col.astype(np.uint32)
    return sig


def band_hashes(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(n_docs, bands) uint64: polynomial fold + avalanche per band."""
    n = sig.shape[0]
    s = sig.reshape(n, bands, rows).astype(np.uint64)
    acc = s[:, :, 0].copy()
    for j in range(1, rows):
        acc = acc * _POLY + s[:, :, j]
    return _mix64(acc)


class MinHasher:
    """Actor-pool callable: text → MinHash signature + per-band LSH hashes.

    State built once per actor (__init__): permutation coefficients and the
    compiled tokenizer. Use as
    ``ds.map_batches(MinHasher, fn_constructor_args=(cfg,),
    batch_format="pyarrow", batch_size=cfg.batch_size,
    concurrency=cfg.minhash_concurrency)``.
    """

    def __init__(self, cfg: DedupConfig | None = None):
        cfg = cfg or DedupConfig()
        self.cfg = cfg
        rng = np.random.default_rng(cfg.seed + 0x5EED5EED)
        self.a = (rng.integers(0, 1 << 63, size=cfg.num_perm, dtype=np.uint64) << U64(1)) | U64(1)
        self.b = rng.integers(0, 1 << 63, size=cfg.num_perm, dtype=np.uint64)
        self._scratch = np.empty(0, dtype=np.uint64)   # grown lazily, reused

    def signatures(self, texts) -> np.ndarray:
        """``texts``: list[str] or Arrow string column (zero-copy path)."""
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            th, toff = tokenize_hashes_col(texts, seed=self.cfg.seed)
        else:
            th, toff = tokenize_hashes(texts, seed=self.cfg.seed)
        sh, soff = shingle_hashes(th, toff, self.cfg.shingle_k)
        if len(sh) > len(self._scratch):
            self._scratch = np.empty(int(len(sh) * 1.25), dtype=np.uint64)
        return minhash_signatures(sh, soff, self.a, self.b, self._scratch)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Append sig + band_hash, drop the wide text/html columns — the
        output is the narrow derived table that feeds every shuffle. The
        text column goes to the tokenizer as its Arrow buffers (no
        to_pylist round-trip)."""
        sig = self.signatures(batch.column("text"))
        bh = band_hashes(sig, self.cfg.bands, self.cfg.rows_per_band)
        out = batch.drop_columns(
            [c for c in ("text", "html") if c in batch.column_names]
        )
        out = out.append_column(
            "sig",
            pa.FixedSizeListArray.from_arrays(
                pa.array(sig.reshape(-1), type=pa.uint32()), self.cfg.num_perm
            ),
        )
        out = out.append_column(
            "band_hash",
            pa.FixedSizeListArray.from_arrays(
                # int64 bit-view: shuffle-key columns stay int64 (see exact.py)
                pa.array(bh.reshape(-1).view(np.int64), type=pa.int64()),
                self.cfg.bands,
            ),
        )
        return out


# --- per-process state cache for the task-based minhash path -------------
#
# The MinHasher state (256 random uint64 + a scratch buffer) is cheap to
# rebuild, so an actor pool buys nothing for it — and costs a lot here:
# Ray REUSES worker processes across task executions but spawns fresh
# processes for every actor pool, and in this sandbox each fresh process
# pays seconds of first-touch page-fault warmup on the numpy kernels
# (measured: first tokenize+hash call 3-9 s, steady-state 0.15 s). Running
# minhash as plain tasks with a process-level cache keeps workers warm
# across stages AND bench passes; reserve actor pools for genuinely
# expensive state (models — see functions/text.py::LangId).
#
# The cache lives on the `sys` module: sick_ray is registered for
# cloudpickle by-value serialization (see __ray_entry__), so this module's
# own globals may be re-materialized per deserialized closure — sys is
# imported by reference and is stable per process. The mechanism (and its
# pluggable eviction policy, the ISickCacheManager analogue) lives in
# sick_ray/state/cache.py.


def make_minhash_fn(cfg: DedupConfig, cache_policy=None):
    """Task-based map_batches fn with per-worker-process cached state —
    the default minhash execution path (see _proc_cache note). Eviction
    and counters are governed by a pluggable ``state.cache.CachePolicy``
    (the ISickCacheManager analogue)."""

    # key by FIELD VALUES, not the cfg object: by-value cloudpickle
    # re-creates the DedupConfig class per closure, and dataclass __eq__
    # requires identical classes — an object key would never hit
    import dataclasses as _dc

    from sick_ray.state.cache import DEFAULT_POLICY, get_or_build

    policy = cache_policy or DEFAULT_POLICY
    key = ("minhash",) + tuple(sorted(_dc.asdict(cfg).items()))

    def minhash_batch(batch: pa.Table) -> pa.Table:
        return get_or_build(key, lambda: MinHasher(cfg), policy)(batch)

    return minhash_batch


def fsl_to_numpy(col, width: int) -> np.ndarray:
    """FixedSizeList column → (n, width) ndarray, zero-copy via flatten."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), width)
