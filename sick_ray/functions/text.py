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
from sick_ray.stages.suffix import window_hashes

TOKEN_PATTERN = r"[0-9A-Za-z]+"          # ASCII alnum runs (oracle-parity safe)


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
        preds = [self.classify(t) for t in batch.column("text").to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, type=pa.string()))


def add_winnow_fingerprint(batch: pa.Table, n_mins: int = 8, window: int = 64,
                           stride: int = 16) -> pa.Table:
    """Winnowing-style doc fingerprint: the ``n_mins`` smallest anchored
    rolling-window hashes per doc (robust to local edits, unlike fp64)."""
    out = []
    for t in batch.column("text").to_pylist():
        b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
        if len(b) < window:
            h = window_hashes(b, max(1, len(b)))
            mins = np.sort(h)[:n_mins] if len(h) else np.empty(0, dtype=np.uint64)
        else:
            wh = window_hashes(b, window)
            anchors = wh[::stride]
            mins = np.sort(np.unique(anchors))[:n_mins]
        padded = np.full(n_mins, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        padded[: len(mins)] = mins[:n_mins]
        out.append(padded.view(np.int64))
    flat = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    return batch.append_column(
        "winnow_fp",
        pa.FixedSizeListArray.from_arrays(pa.array(flat, type=pa.int64()), n_mins),
    )
