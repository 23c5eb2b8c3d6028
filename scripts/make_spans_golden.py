"""Anchored-spans golden-table generator: an INDEPENDENT scalar second
implementation of the engine's deterministic anchored substring-dedup
pass (stages/suffix.py with include_local=False), materialized as the
parquet tables the ``doc_spans_anchored`` DuckDB oracle reads.

Same conformance discipline as make_golden.py / make_media_golden.py:
the engine computes window hashes via vectorized modular prefix sums
(C^i / C^-i cumprods) over one concatenated buffer; this script uses a
textbook per-doc Horner ROLLING hash with plain python ints mod 2^64 —
deliberately different code computing the same published polynomial
hash H(w) = sum_j w[j] * C^(L-1-j) (mod 2^64), C = the FNV64 prime.

Pipeline mirrored exactly (DedupConfig defaults: min_span=256 → window
L=128, span_stride=24, q-gram 16):
1. anchors: positions p with qgram_hash(doc[p:p+16]) % 24 == 0 and
   p + 128 <= len(doc)  (content-defined — position-independent hash)
2. seeds: anchors whose 128-byte window hash occurs in ≥2 docs, or ≥128
   apart within one doc
3. spans: [p, p+128) per seed, merged per doc (touching spans merge)

Spans are CORPUS-dependent (cross-doc matches), so one golden file per
scale factor. Run: PYTHONPATH=/root/repo python scripts/make_spans_golden.py
"""

from __future__ import annotations

import os
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq

C = 0x100000001B3
MASK = (1 << 64) - 1
QGRAM = 16
L = 128        # max(32, min_span // 2)
STRIDE = 24    # DedupConfig.span_stride
OUT = {
    "sf0.01": "/root/repo/tests/golden/spans_anchored_sf001.parquet",
    "sf0.1": "/root/repo/tests/golden/spans_anchored_sf01.parquet",
}


def rolling_hashes(data: bytes, width: int) -> list:
    """H[p] = sum_j data[p+j] * C^(width-1-j) mod 2^64 for every p with
    p + width <= len(data) — textbook rolling update, python ints."""
    n = len(data)
    if n < width:
        return []
    top = pow(C, width - 1, 1 << 64)
    h = 0
    for j in range(width):
        h = (h * C + data[j]) & MASK
    out = [h]
    for p in range(1, n - width + 1):
        h = ((h - data[p - 1] * top) * C + data[p + width - 1]) & MASK
        out.append(h)
    return out


def anchored_spans(docs: list) -> list:
    """[(url, text)] → [(url, start, end)] — steps 1-3 above."""
    groups = defaultdict(list)   # whash -> [(url, start)]
    for url, text in docs:
        data = (text or "").encode("utf-8")
        if len(data) < L:
            continue
        qh = rolling_hashes(data, QGRAM)
        wh = rolling_hashes(data, L)
        for p, h in enumerate(qh):
            if h % STRIDE == 0 and p + L <= len(data):
                groups[wh[p]].append((url, p))
    spans = defaultdict(list)    # url -> [start]
    for rows in groups.values():
        urls = {u for u, _ in rows}
        starts = [s for _, s in rows]
        if len(urls) >= 2 or (max(starts) - min(starts) >= L):
            for u, s in rows:
                spans[u].append(s)
    out = []
    for url in sorted(spans):
        cur_s = cur_e = None
        for s in sorted(spans[url]):
            e = s + L
            if cur_s is None:
                cur_s, cur_e = s, e
            elif s > cur_e:              # engine merges touching spans
                out.append((url, cur_s, cur_e))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_s is not None:
            out.append((url, cur_s, cur_e))
    return out


def main() -> None:
    for sf, out_path in OUT.items():
        path = f"/root/testdata/{sf}/documents.parquet"
        tbl = pq.read_table(path, columns=["doc_id", "text"])
        docs = [(f"doc://{d}", t) for d, t in
                zip(tbl.column("doc_id").to_pylist(),
                    tbl.column("text").to_pylist())]
        rows = anchored_spans(docs)
        golden = pa.table(
            {
                "url": pa.array([r[0] for r in rows], type=pa.string()),
                "start": pa.array([r[1] for r in rows], type=pa.int64()),
                "end": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
        pq.write_table(golden, out_path, compression="zstd")
        print(f"{sf}: wrote {golden.num_rows} anchored spans -> {out_path}")


if __name__ == "__main__":
    main()
