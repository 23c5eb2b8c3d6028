"""URL canonicalization — the web-corpus analogue of the reference's
value normalization before hash-consing (CirceTraverser normalizes
numbers/dates before interning; a web pipeline normalizes URLs before
url-level dedup, the first dedup pass of CCNet/RefinedWeb-style corpora).

All kernels are pure Arrow compute (RE2 regex + string concat) — zero
Python per row, so the canonicalizer runs inside ``map_batches`` at full
batch width. The rules are deliberately generic (they do not invert any
specific construction):

1. strip the fragment (``#...``)
2. drop tracking query params (``utm_*``, ``ref``, ``fbclid``, ``gclid``)
   wherever they sit in the query string: the pattern anchors each KEY to
   a ``[?&]`` boundary (so ``href=``/``xref=`` and tracking strings
   embedded in VALUES survive) and consumes a whole RUN of consecutive
   tracking params in one match (RE2's global replace scans forward from
   a match's end, so a leading-boundary pattern that ate one param per
   match would skip every other param in a run), keeping the boundary
   char via a ``\\1`` rewrite
3. drop a now-dangling trailing ``?``/``&``
4. collapse a run of trailing path slashes (before ``?`` or at end)
5. lowercase the scheme+authority (path/query stay case-sensitive per
   RFC 3986 §6.2.2.1)

The canonicalizer is idempotent (canon(canon(u)) == canon(u) — property
tested), and every rule is replicated byte-for-byte in the DuckDB oracle
(SQL_URL_DEDUP_DOCS), 'g'-flagged to match Arrow's global replace.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TRACKING = (
    r"([?&])(?:(?:utm_[a-z0-9]+|ref|fbclid|gclid)=[^&#]*(?:&|$))+"
)
# scheme://authority prefix (RFC 3986 scheme chars), rest of the url
_AUTH_RE = r"^(?P<auth>[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)(?P<rest>.*)$"


def canonicalize_urls(col) -> pa.Array:
    """Canonicalize a string column of URLs (vectorized, RE2).

    Returns a plain StringArray aligned with the input. URLs without a
    ``scheme://authority`` prefix pass through rules 1-4 and skip the
    case-folding step (nothing to lowercase).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    u = pc.replace_substring_regex(col, pattern=r"#.*$", replacement="")
    u = pc.replace_substring_regex(u, pattern=_TRACKING, replacement=r"\1")
    # [?&]+ (a RUN, not one char): '?&utm_a=1' rewrites to '?&' and a
    # single-char strip would leave a dangling '?' — breaking idempotence
    u = pc.replace_substring_regex(u, pattern=r"[?&]+$", replacement="")
    u = pc.replace_substring_regex(u, pattern=r"/+\?", replacement="?")
    u = pc.replace_substring_regex(u, pattern=r"/+$", replacement="")
    parts = pc.extract_regex(u, pattern=_AUTH_RE)
    auth = pc.struct_field(parts, "auth")
    rest = pc.struct_field(parts, "rest")
    lowered = pc.binary_join_element_wise(pc.utf8_lower(auth), rest, "")
    # no scheme://authority match → keep the rule-1-4 result unchanged
    return pc.if_else(pc.is_valid(lowered), lowered, u)


# Deterministic URL augmentation for the documents table (which carries
# no url column): both the Ray query and its DuckDB oracle derive the
# SAME raw url from doc_id, so the canonicalizer is tested end-to-end
# without external data (the pii_redact_docs precedent). Three raw
# variants per page exercise every rule; all three canonicalize to
# https://site{page%50}.example.com/p/{page}?id={page}.
_P1 = pa.array(["https://site", "https://site", "HTTPS://SITE"])
_P2 = pa.array([".example.com/p/", ".example.com/p/", ".Example.COM/p/"])
_Q1 = pa.array(["?id=", "?utm_source=feed&id=", "/?id="])
_Q2 = pa.array(["", "&ref=rss", "#frag"])


def synth_urls(doc_ids: np.ndarray) -> pa.Array:
    """Raw (pre-canonicalization) url per doc_id — page = doc_id // 3,
    variant = doc_id % 3, site = page % 50. Pure Arrow take + concat."""
    page = doc_ids // 3
    v = pa.array((doc_ids % 3).astype(np.int32))
    site_s = pc.cast(pa.array(page % 50), pa.string())
    page_s = pc.cast(pa.array(page), pa.string())
    return pc.binary_join_element_wise(
        pc.take(_P1, v), site_s, pc.take(_P2, v), page_s,
        pc.take(_Q1, v), page_s, pc.take(_Q2, v), "",
    )
