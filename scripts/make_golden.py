"""Golden-table generator: INDEPENDENT scalar second implementations of the
engine's deterministic per-doc functions (simhash, winnowing fingerprint),
materialized as a parquet table the DuckDB oracles join against.

This is the reference's cross-implementation conformance discipline
(json-sick-csharp/SickSharp.Test/SickTests.cs:202-204: each side reads the
other's binaries; the format itself is the oracle): the engine computes
these columns with vectorized Arrow/NumPy kernels; this script recomputes
them with deliberately different, per-row scalar code (pure-Python Horner
loops, the scalar xxh64 path, Python's re tokenizer) and only shared
CONSTANTS are imported. Rows are keyed by (doc_id, md5(text)) so one golden
file serves every scale factor (texts differ per sf for the same doc_id;
DuckDB joins on md5(text) at query time).

Run: python scripts/make_golden.py   (rewrites tests/golden/text_golden.parquet)
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sick_ray.stages.suffix import _C  # shared constant, not shared code
from sick_ray.xxh import xxh64  # scalar path (the batch path is independent)

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
OUT = "/root/repo/tests/golden/text_golden.parquet"

_TOKEN_RE = re.compile(r"[^\W_]+")
MASK = (1 << 64) - 1
SENT = (1 << 64) - 1  # winnow sentinel (engine: 0xFFFFFFFFFFFFFFFF)


def simhash_scalar(text: str | None) -> int:
    """Charikar simhash, one token at a time (engine: functions/simhash.py
    vectorized reduceat path)."""
    toks = _TOKEN_RE.findall((text or "").lower())
    if not toks:
        return 0
    acc = [0] * 64
    for t in toks:
        h = xxh64(t.encode("utf-8"))
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(64):
        if acc[b] > 0:
            sig |= 1 << b
    return sig


def _poly(window: bytes) -> int:
    """Horner form of the engine's position-independent window hash
    (suffix.window_hashes computes the same value via prefix sums)."""
    h = 0
    c = int(_C)
    for byte in window:
        h = (h * c + byte) & MASK
    return h


def winnow_scalar(text: str | None, n_mins: int = 8, window: int = 64,
                  stride: int = 16) -> list[int]:
    """Winnowing fingerprint: n smallest distinct anchored window hashes
    (engine: functions/text.add_winnow_fingerprint, one vectorized pass)."""
    b = (text or "").encode("utf-8")
    fp = [SENT] * n_mins
    if len(b) >= window:
        hs = set()
        for p in range(0, len(b) - window + 1, stride):
            hs.add(_poly(b[p:p + window]))
        for i, h in enumerate(sorted(hs)[:n_mins]):
            fp[i] = h
    elif len(b) >= 1:
        fp[0] = _poly(b)
    return fp


def _to_i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def main() -> None:
    rows: dict[tuple[int, str], dict] = {}
    for sf in SF_DIRS:
        docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        for did, text in zip(
            docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
        ):
            md5 = hashlib.md5((text or "").encode("utf-8")).hexdigest()
            key = (int(did), md5)
            if key in rows:
                continue
            w = winnow_scalar(text)
            rows[key] = {
                "doc_id": int(did),
                "text_md5": md5,
                "simhash": _to_i64(simhash_scalar(text)),
                **{f"w{i}": _to_i64(w[i]) for i in range(8)},
            }
        print(f"{sf}: {docs.num_rows} docs, {len(rows)} golden rows total")
    cols = ["doc_id", "text_md5", "simhash"] + [f"w{i}" for i in range(8)]
    table = pa.table(
        {
            c: pa.array(
                [r[c] for r in rows.values()],
                type=pa.string() if c == "text_md5" else pa.int64(),
            )
            for c in cols
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {table.num_rows} rows -> {OUT}")


if __name__ == "__main__":
    main()
