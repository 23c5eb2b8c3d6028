"""Golden-table generator for the persistent-dedup-index conformance
oracle (``snapshot_near_dup_docs``): an INDEPENDENT per-row scalar second
implementation of the whole signature pipeline — tokenize → k-shingle →
MinHash(128) → 16-band hashes → fp64 content hash — materialized per doc
so DuckDB can replay bucket collision + signature-estimate verification
in SQL (the make_golden.py / make_media_golden.py discipline).

Deliberately different code: Python's ``re`` tokenizer, the scalar xxh64
path (the engine's hot path is the packed batch kernel), pure-Python-int
Horner folds and avalanche mixing (the engine uses NumPy uint64 ufuncs +
``np.minimum.reduceat``). Only shared CONSTANTS are imported; the
permutation coefficients are config (seeded rng), regenerated here the
same way ``MinHasher.__init__`` does.

Rows keyed by (doc_id, md5(text)) so ONE golden file serves every scale
factor (same convention as text_golden.parquet).

Run: python scripts/make_snapidx_golden.py
  (rewrites tests/golden/minhash_golden.parquet)
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sick_ray.config import DedupConfig
from sick_ray.xxh import xxh64  # scalar path (the batch path is independent)

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
OUT = "/root/repo/tests/golden/minhash_golden.parquet"

_TOKEN_RE = re.compile(r"[^\W_]+")
MASK = (1 << 64) - 1
POLY = 0x9E3779B185EBCA87
MIX1 = 0xFF51AFD7ED558CCD
MIX2 = 0xC4CEB9FE1A85EC53
EMPTY_SENTINEL = 0xFFFFFFFF


def mix64(x: int) -> int:
    x ^= x >> 33
    x = (x * MIX1) & MASK
    x ^= x >> 33
    x = (x * MIX2) & MASK
    return x ^ (x >> 33)


def shingles_scalar(text: str | None, k: int, seed: int) -> list[int]:
    """Per-doc k-shingle hashes: token xxh64s folded Horner-style + mixed
    (engine: minhash.shingle_hashes sliding-window vector path). Docs with
    0 < n_tok < k get ONE shingle over all their tokens."""
    toks = _TOKEN_RE.findall((text or "").lower())
    th = [xxh64(t.encode("utf-8"), seed) for t in toks]
    if not th:
        return []
    if len(th) < k:
        acc = th[0]
        for h in th[1:]:
            acc = (acc * POLY + h) & MASK
        return [mix64(acc)]
    out = []
    for i in range(len(th) - k + 1):
        acc = th[i]
        for j in range(1, k):
            acc = (acc * POLY + th[i + j]) & MASK
        out.append(mix64(acc))
    return out


def sig_scalar(sh: list[int], a: list[int], b: list[int]) -> list[int]:
    """MinHash signature: multiply-shift min per permutation (engine:
    minhash.minhash_signatures in-place ufunc loop)."""
    if not sh:
        return [EMPTY_SENTINEL] * len(a)
    return [
        min(((aj * s + bj) & MASK) >> 32 for s in sh)
        for aj, bj in zip(a, b)
    ]


def bands_scalar(sig: list[int], bands: int, rows: int) -> list[int]:
    """Per-band Horner fold + avalanche (engine: minhash.band_hashes)."""
    out = []
    for bi in range(bands):
        acc = sig[bi * rows]
        for j in range(1, rows):
            acc = (acc * POLY + sig[bi * rows + j]) & MASK
        out.append(mix64(acc))
    return out


def _to_i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def main() -> None:
    cfg = DedupConfig()
    # permutation coefficients are CONFIG (seeded rng), same derivation as
    # MinHasher.__init__ — regenerated, not imported from engine state
    rng = np.random.default_rng(cfg.seed + 0x5EED5EED)
    a = [int(x) for x in
         ((rng.integers(0, 1 << 63, size=cfg.num_perm, dtype=np.uint64)
           << np.uint64(1)) | np.uint64(1))]
    b = [int(x) for x in
         rng.integers(0, 1 << 63, size=cfg.num_perm, dtype=np.uint64)]

    rows: dict[tuple[int, str], dict] = {}
    for sf in SF_DIRS:
        docs = pq.read_table(f"{sf}/documents.parquet",
                             columns=["doc_id", "text"])
        for did, text in zip(docs.column("doc_id").to_pylist(),
                             docs.column("text").to_pylist()):
            md5 = hashlib.md5((text or "").encode("utf-8")).hexdigest()
            key = (int(did), md5)
            if key in rows:
                continue
            sh = shingles_scalar(text, cfg.shingle_k, cfg.seed)
            sig = sig_scalar(sh, a, b)
            rows[key] = {
                "doc_id": int(did),
                "text_md5": md5,
                "fp64": _to_i64(xxh64((text or "").encode("utf-8"))),
                "sig": [int(s) for s in sig],
                "bands": [_to_i64(h) for h in
                          bands_scalar(sig, cfg.bands, cfg.rows_per_band)],
            }
        print(f"{sf}: {docs.num_rows} docs, {len(rows)} golden rows total")
    vals = list(rows.values())
    table = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in vals], type=pa.int64()),
        "text_md5": pa.array([r["text_md5"] for r in vals], type=pa.string()),
        "fp64": pa.array([r["fp64"] for r in vals], type=pa.int64()),
        "sig": pa.array([r["sig"] for r in vals],
                        type=pa.list_(pa.int64())),
        "bands": pa.array([r["bands"] for r in vals],
                          type=pa.list_(pa.int64())),
    })
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {table.num_rows} rows -> {OUT}")


if __name__ == "__main__":
    main()
