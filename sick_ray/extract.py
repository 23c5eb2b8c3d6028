"""Canonical text extraction — the per-row invariant stage.

Invariant (BASELINE.json ``input_hint``): the extracted ``text`` emitted per
``url`` must be **byte-identical** to the input ``text`` column whenever that
column is non-null. We therefore never normalize/re-encode ``text``; rows
with ``text IS NULL`` get a deterministic fallback extraction from ``html``.

This is the analogue of the reference's encode-side traversal
(json-sick-scala ``izumi/sick/sickcirce/CirceTraverser.scala:72-183``): the
one stage that looks at the raw payload; everything downstream works on
derived, narrow columns. Correspondingly this is the ONLY stage that reads
the (potentially megabytes-wide) ``html`` column, which is projected away
immediately after (SURVEY.md §7.4 "wide rows").
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_TAG = re.compile(rb"<script\b.*?</script\s*>|<style\b.*?</style\s*>|<[^>]*>", re.S | re.I)
_WS = re.compile(rb"[ \t\r\f\v]*\n[ \t\r\f\v]*|[ \t\r\f\v]{2,}")


def html_to_text(html: bytes | None) -> str:
    """Deterministic, dependency-free tag stripper for null-text rows.

    Drops script/style blocks and tags, collapses whitespace runs to a
    single separator. Not a browser-grade extractor — a stable fallback.
    """
    if not html:
        return ""
    stripped = _TAG.sub(b" ", html)
    stripped = _WS.sub(b"\n", stripped).strip()
    return stripped.decode("utf-8", errors="replace")


def extract_batch(batch: pa.Table) -> pa.Table:
    """map_batches fn: ensure a non-null ``text`` column, drop ``html``.

    Non-null ``text`` passes through untouched (byte-identical). Null rows
    are filled from ``html`` via :func:`html_to_text`.
    """
    text = batch.column("text")
    if text.null_count:
        mask = pc.is_null(text)
        idx = pc.indices_nonzero(mask).to_pylist()
        if "html" in batch.column_names:
            html = batch.column("html")
            repl = [html_to_text(html[i].as_py()) for i in idx]
        else:
            repl = [""] * len(idx)
        # patch ONLY the null slots (replace_with_mask): the non-null
        # strings keep their original Arrow buffers — no Python round-trip
        # of the whole column when one row has a null (round-1 hot spot)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
            mask = mask.combine_chunks() if isinstance(mask, pa.ChunkedArray) else mask
        filled = pc.replace_with_mask(text, mask, pa.array(repl, type=text.type))
        batch = batch.set_column(
            batch.schema.get_field_index("text"), "text", filled
        )
    if "html" in batch.column_names:
        batch = batch.drop_columns(["html"])
    return batch
