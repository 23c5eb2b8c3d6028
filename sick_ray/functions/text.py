"""Text-analysis batch functions: token counts, quality scoring,
language ID, winnowing document fingerprints.

All are vectorized ``map_batches`` callables over Arrow batches (Arrow
compute / NumPy; the only per-row Python is C-speed regex findall where a
kernel doesn't exist). Language ID is a stateful stage (stopword tables +
compiled regexes built once per actor) — the reference's load-once-state
pattern (``PageCachedFile.cs``), expressed as an actor-pool callable class.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from sick_ray.shuffle import first_mask
from sick_ray.stages.suffix import _concat_docs_col, window_hashes

TOKEN_PATTERN = r"[0-9A-Za-z]+"          # ASCII alnum runs (oracle-parity safe)

# GPT-2-style pre-tokenizer, adapted to RE2 (no lookaround: the original's
# trailing-space lookahead is dropped, so runs of spaces count as one token
# and a token's leading space binds to it — the BPE-ish approximation the
# brief asks for, NOT a byte-pair vocabulary). RE2 on both sides: pyarrow
# count_substring_regex and DuckDB regexp_extract_all count identically.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
WS_PATTERN = r"\S+"                      # whitespace-separated tokens


def add_token_count_bpe(batch: pa.Table) -> pa.Table:
    """Whitespace + BPE-ish token counts per doc — the two quick
    pretraining-cost estimators (words vs subword-ish units)."""
    text = batch.column("text")
    ws = pc.count_substring_regex(text, WS_PATTERN)
    bpe = pc.count_substring_regex(text, BPE_PATTERN)
    out = batch.append_column("ws_tokens", ws.cast(pa.int64()))
    return out.append_column("bpe_tokens", bpe.cast(pa.int64()))


def add_token_count(batch: pa.Table) -> pa.Table:
    """token_count = number of ASCII-alnum token matches (RE2, same
    semantics as DuckDB ``len(regexp_extract_all(text, '[0-9A-Za-z]+'))``)."""
    text = batch.column("text")
    cnt = pc.count_substring_regex(text, TOKEN_PATTERN)
    return batch.append_column("token_count", cnt.cast(pa.int64()))


def add_text_stats(batch: pa.Table) -> pa.Table:
    """Vectorized quality raw features: n_chars, n_bytes, digit/punct/upper
    counts, token stats."""
    text = batch.column("text")
    out = batch
    out = out.append_column("n_chars_c", pc.utf8_length(text).cast(pa.int64()))
    out = out.append_column(
        "n_bytes_c", pc.binary_length(text.cast(pa.large_binary())).cast(pa.int64())
    )
    out = out.append_column(
        "n_digits", pc.count_substring_regex(text, r"[0-9]").cast(pa.int64())
    )
    out = out.append_column(
        "n_punct", pc.count_substring_regex(text, r"[!-/:-@\[-`{-~]").cast(pa.int64())
    )
    out = out.append_column(
        "n_tokens", pc.count_substring_regex(text, TOKEN_PATTERN).cast(pa.int64())
    )
    return out


def add_quality_score(batch: pa.Table) -> pa.Table:
    """Deterministic [0,1] quality heuristic from the raw features
    (length band, punct/digit ratios, mean token length band)."""
    b = add_text_stats(batch)
    n_chars = b.column("n_chars_c").to_numpy(zero_copy_only=False).astype(np.float64)
    n_digits = b.column("n_digits").to_numpy(zero_copy_only=False).astype(np.float64)
    n_punct = b.column("n_punct").to_numpy(zero_copy_only=False).astype(np.float64)
    n_tokens = b.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
    denom = np.maximum(n_chars, 1.0)
    digit_ratio = n_digits / denom
    punct_ratio = n_punct / denom
    mean_tok = np.where(n_tokens > 0, (n_chars - n_tokens + 1) / np.maximum(n_tokens, 1), 0.0)
    len_score = np.clip(np.log1p(n_chars) / np.log(2000.0), 0.0, 1.0)
    tok_score = np.clip(1.0 - np.abs(mean_tok - 5.0) / 10.0, 0.0, 1.0)
    noise_pen = np.clip(1.0 - 2.0 * (digit_ratio + punct_ratio), 0.0, 1.0)
    score = np.round(0.4 * len_score + 0.3 * tok_score + 0.3 * noise_pen, 6)
    return batch.append_column("quality", pa.array(score, type=pa.float64()))


_STOPWORDS = {
    "en": {"the", "of", "and", "a", "to", "in", "is", "was", "for", "on", "that",
           "with", "as", "it", "by", "at", "this", "be", "are", "or", "an"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein",
           "eine", "nicht", "als", "auch", "im", "den", "des", "zu"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans",
           "que", "qui", "sur", "avec", "pas", "du", "des", "en"},
    "es": {"el", "la", "los", "las", "y", "de", "un", "una", "es", "para", "en",
           "que", "por", "con", "no", "del", "se", "su"},
}


class LangId:
    """Actor-pool language identifier: stopword-hit scoring + CJK-range
    detection. State (token regex, stopword dicts) built once per actor."""

    def __init__(self):
        self.word = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.cjk = re.compile(r"[一-鿿぀-ヿ]")
        self.tables = {k: frozenset(v) for k, v in _STOPWORDS.items()}
        # batch path: one case-insensitive RE2 alternation per language,
        # compiled once per actor, run by Arrow's C++ regex kernel
        self.langs = sorted(_STOPWORDS)
        self.patterns = [
            r"(?i)\b(?:" + "|".join(sorted(_STOPWORDS[lang])) + r")\b"
            for lang in self.langs
        ]

    def classify(self, text: str) -> str:
        if not text:
            return "und"
        if self.cjk.search(text):
            return "zh"
        toks = [w.lower() for w in self.word.findall(text)[:400]]
        if not toks:
            return "und"
        best, best_hits = "und", 0
        for lang, stops in self.tables.items():
            hits = sum(t in stops for t in toks)
            if hits > best_hits:
                best, best_hits = lang, hits
        if best_hits * 50 < len(toks):          # <2% stopwords → undetermined
            return "und"
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized batch scoring: per-language stopword-hit counts via
        Arrow regex kernels (no per-row Python). Unlike :meth:`classify`
        it scores the whole document rather than the first 400 tokens —
        same ratio test, immaterial for the ranking."""
        text = pc.fill_null(batch.column("text"), "")
        n = batch.num_rows
        ntok = pc.count_substring_regex(text, r"\pL+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        hits = np.empty((len(self.langs), n), dtype=np.int64)
        for j, pat in enumerate(self.patterns):
            hits[j] = pc.count_substring_regex(text, pat).to_numpy(
                zero_copy_only=False)
        best_j = hits.argmax(axis=0)
        best_hits = hits[best_j, np.arange(n)]
        preds = np.array(self.langs, dtype=object)[best_j]
        und = (best_hits == 0) | (best_hits * 50 < ntok) | (ntok == 0)
        preds[und] = "und"
        is_cjk = pc.greater(
            pc.count_substring_regex(text, r"[一-鿿぀-ヿ]"), 0
        ).to_numpy(zero_copy_only=False)
        preds[is_cjk] = "zh"
        return batch.append_column("lang_pred", pa.array(preds, type=pa.string()))


def add_winnow_fingerprint(batch: pa.Table, n_mins: int = 8, window: int = 64,
                           stride: int = 16) -> pa.Table:
    """Winnowing-style doc fingerprint: the ``n_mins`` smallest anchored
    rolling-window hashes per doc (robust to local edits, unlike fp64).

    Fully vectorized across the batch: ONE rolling-hash pass over the
    column's own Arrow buffer, per-doc strided anchor indices built by
    repeat/cumsum, and the per-doc smallest-k via one (doc, hash) sort +
    position-in-group mask — no ``for doc`` loop (round-1 hot spot)."""
    n = batch.num_rows
    SENT = np.uint64(0xFFFFFFFFFFFFFFFF)
    fp = np.full(n * n_mins, SENT, dtype=np.uint64).reshape(n, n_mins)
    buf, starts, ends = _concat_docs_col(batch.column("text"))
    lens = ends - starts
    long = lens >= window
    if long.any() and len(buf) >= window:
        wh = window_hashes(buf, window)
        li = np.flatnonzero(long)
        cnt = (lens[li] - window) // stride + 1
        # flat strided anchor positions for all long docs at once
        doc_rep = np.repeat(li, cnt)
        base = np.repeat(starts[li], cnt)
        off = (np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt)) * stride
        h = wh[base + off]
        order = np.lexsort((h, doc_rep))
        d_s, h_s = doc_rep[order], h[order]
        # drop duplicate (doc, hash) pairs, then take first n_mins per doc
        keep = first_mask(d_s) | np.concatenate([[True], h_s[1:] != h_s[:-1]])
        d_s, h_s = d_s[keep], h_s[keep]
        fm = first_mask(d_s)
        pos = np.arange(len(d_s)) - np.flatnonzero(fm)[np.cumsum(fm) - 1]
        sel = pos < n_mins
        fp[d_s[sel], pos[sel]] = h_s[sel]
    # short docs (rare): whole-doc window
    for i in np.flatnonzero(~long):
        b = buf[starts[i]: ends[i]]
        h = window_hashes(b, max(1, len(b)))
        if len(h):
            fp[i, 0] = np.sort(h)[0]
    return batch.append_column(
        "winnow_fp",
        pa.FixedSizeListArray.from_arrays(
            pa.array(fp.reshape(-1).view(np.int64), type=pa.int64()), n_mins
        ),
    )
