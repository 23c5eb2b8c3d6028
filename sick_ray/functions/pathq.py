"""General dotted/bracketed path queries over a JSON string column — the
engine analogue of the reference's flagship read API ``query(ref, "a.b.[0]")``
(json-sick-scala ``IncrementalEBAReader.scala:134-186``, C#
``SickReader.Query.cs:11-42`` with path parsing in ``SickPath.cs:7-63``;
semantics exercised by ``SickCursorTest.scala:13-188`` /
``SickTests.cs:34-58`` including negative array indexing).

Grammar: dot-separated field names, ``[i]`` array indexes — attached
(``a.b[0]``), standalone (``a.b.[0]``), chained (``m[0][1]``) and negative
(``[-1]`` = last, as in the reference's ``readArrayElementRef``).

Output matches DuckDB's ``json_extract_string``: strings unquoted, other
values as canonical JSON text, missing/null → NULL — so every query built
on this operator is DuckDB-oracle-checkable.

This is a parse-bound stage (one C-speed ``json.loads`` per row, walk is
O(path)); like the reference's decoder it touches the raw payload once and
everything downstream is columnar.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

_SEG = re.compile(r"^([^\[\]]*)((?:\[-?\d+\])*)$")
_IDX = re.compile(r"\[(-?\d+)\]")


def parse_path(path: str) -> list:
    """``"a.b[0].c.[-1]"`` → ``['a', 'b', 0, 'c', -1]``."""
    segments: list = []
    for part in path.split("."):
        if part == "":
            continue
        m = _SEG.match(part)
        if not m:
            raise ValueError(f"bad path segment {part!r} in {path!r}")
        name, idxs = m.group(1), m.group(2)
        if name:
            segments.append(name)
        for i in _IDX.findall(idxs):
            segments.append(int(i))
    if not segments:
        raise ValueError(f"empty path {path!r}")
    return segments


def walk(doc, segments: list):
    """Walk parsed ``segments`` through a decoded JSON value; None when any
    step is missing/out-of-range (incl. negative indexes past the front)."""
    cur = doc
    for seg in segments:
        if isinstance(seg, int):
            if not isinstance(cur, list):
                return None
            if seg < -len(cur) or seg >= len(cur):
                return None
            cur = cur[seg]
        else:
            if not isinstance(cur, dict) or seg not in cur:
                return None
            cur = cur[seg]
    return cur


def _render(val) -> str | None:
    """DuckDB json_extract_string rendering: unquoted strings, canonical
    JSON text otherwise, NULL for null/missing."""
    if val is None:
        return None
    if isinstance(val, str):
        return val
    return json.dumps(val, separators=(",", ":"))


def make_path_extractor(paths: dict[str, str], col: str, keep: list[str]):
    """map_batches fn: for each ``out_name -> path`` extract one output
    string column from the JSON ``col``; ``keep`` columns pass through.
    One json.loads per row feeds ALL requested paths.

    This is the SLOW GENERAL path — arbitrary-JSON parsing is inherently
    rowwise (one Python parse + walk per row). Shallow single-key paths
    on flat objects should use the vectorized RE2 extractor
    (queries.q_props_path), and deep paths on KNOWN-schema struct columns
    should route through ``pyarrow.compute.struct_field`` instead of ever
    parsing text; reserve this extractor for truly schemaless payloads."""
    parsed = {name: parse_path(p) for name, p in paths.items()}

    def extract(batch: pa.Table) -> pa.Table:
        docs = []
        for s in batch.column(col).to_pylist():
            if s is None:
                docs.append(None)
                continue
            try:
                docs.append(json.loads(s))
            except (json.JSONDecodeError, TypeError):
                docs.append(None)
        cols = {k: batch.column(k) for k in keep}
        for name, segs in parsed.items():
            cols[name] = pa.array(
                [_render(walk(d, segs)) if d is not None else None for d in docs],
                type=pa.string(),
            )
        return pa.table(cols)

    return extract


def select_path(ds, path: str, col: str, out_col: str = "value",
                keep: list[str] | None = None):
    """Dataset → Dataset with ``out_col`` = path query result per row."""
    return ds.map_batches(
        make_path_extractor({out_col: path}, col, keep or []),
        batch_format="pyarrow",
    )
