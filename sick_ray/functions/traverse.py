"""Arbitrary nested-JSON traversal + subtree hash-consing — the direct
analogue of the reference's encode-side flatten.

``CirceTraverser.traverse`` (json-sick-scala
``sickcirce/CirceTraverser.scala:72-183``) walks ANY JSON value bottom-up,
interning every subtree through a value→index bijection so identical
subtrees are stored once. The distribution-safe re-expression: walk each
document bottom-up computing a 64-bit content hash per subtree (structural
hashing — children hashes fold into the parent, object keys sorted so key
order never changes identity, matching the reference's structural equality
``Bijection.cs:47-67``), emit one narrow row per subtree, and let a hash
shuffle group identical subtrees corpus-wide. ``subtree_stats`` is then
exactly sick's dedup effect measured on data: distinct subtrees vs total.

Kinds mirror the reference's type tags (``EBACodecs.scala``): null, bool,
int (all integral widths — the reference's byte/short/int/long narrowing
collapses here into one logical kind with the VALUE preserved), float,
str, arr, obj.
"""

from __future__ import annotations

import json
from decimal import Decimal

import numpy as np
import pyarrow as pa

from sick_ray.shuffle import first_mask, grouped_apply, sort_index
from sick_ray.xxh import xxh64

_KINDS = ("null", "bool", "int", "float", "str", "arr", "obj", "dec")


def _h(payload: bytes) -> int:
    return xxh64(payload) & 0x7FFFFFFFFFFFFFFF  # int64-safe


def subtree_rows(doc, path: str = "$"):
    """Yield (path, kind, vhash, depth) bottom-up for every subtree of a
    decoded JSON value. vhash is structural: equal subtrees (anywhere, any
    doc) get equal hashes; object key order is canonicalized."""
    out = []

    def walk(v, p, depth):
        if v is None:
            h = _h(b"\x00null")
            out.append((p, "null", h, depth))
        elif isinstance(v, bool):
            h = _h(b"\x01" + (b"t" if v else b"f"))
            out.append((p, "bool", h, depth))
        elif isinstance(v, int):
            h = _h(b"\x02" + str(v).encode())
            out.append((p, "int", h, depth))
        elif isinstance(v, float):
            h = _h(b"\x03" + repr(v).encode())
            out.append((p, "float", h, depth))
        elif isinstance(v, Decimal):
            # exact-decimal mode (avoid_big_decimals=False): identity is
            # the (unscaled, scale) pair like the reference's BigDecimal
            # codec (EBACodecs.scala:367-400) — "1.0" and "1" DIFFER; the
            # JSON source text fixes the scale, so str(v) is canonical
            h = _h(b"\x07" + str(v).encode())
            out.append((p, "dec", h, depth))
        elif isinstance(v, str):
            h = _h(b"\x04" + v.encode("utf-8"))
            out.append((p, "str", h, depth))
        elif isinstance(v, list):
            ch = [walk(x, f"{p}[{i}]", depth + 1) for i, x in enumerate(v)]
            acc = b"\x05" + b"".join(c.to_bytes(8, "little") for c in ch)
            h = _h(acc)
            out.append((p, "arr", h, depth))
        elif isinstance(v, dict):
            items = sorted(v.items())
            ch = [(k, walk(x, f"{p}.{k}", depth + 1)) for k, x in items]
            acc = b"\x06" + b"".join(
                _h(k.encode()).to_bytes(8, "little") + c.to_bytes(8, "little")
                for k, c in ch
            )
            h = _h(acc)
            out.append((p, "obj", h, depth))
        else:
            raise TypeError(f"unsupported JSON value {type(v)}")
        return h

    walk(doc, path, 0)
    return out


def make_traverser(col: str, id_col: str, avoid_big_decimals: bool = True):
    """map_batches fn: JSON string column → one row per subtree
    (id, path, kind, vhash, depth). Parse-bound like the reference's
    decoder; everything downstream is columnar.

    ``avoid_big_decimals`` is the reference's traversal flag
    (CirceTraverser.scala:121-152): True (default) parses JSON decimals
    as float64 — the lossy fast path, where ``0.1000`` and ``0.1``
    intern to the SAME subtree; False parses them as exact ``Decimal``
    with (unscaled, scale) identity — 100-digit values stay distinct and
    scale is significant, at Python-Decimal parse cost."""
    parse_float = None if avoid_big_decimals else Decimal

    def traverse(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        docs = batch.column(col).to_pylist()
        o_id, o_path, o_kind, o_hash, o_depth = [], [], [], [], []
        for i, s in zip(ids, docs):
            if s is None:
                continue
            try:
                v = json.loads(s, parse_float=parse_float)
            except (json.JSONDecodeError, TypeError):
                continue
            for p, k, h, d in subtree_rows(v):
                o_id.append(i)
                o_path.append(p)
                o_kind.append(k)
                o_hash.append(h)
                o_depth.append(d)
        return pa.table(
            {
                "id": pa.array(o_id, type=pa.int64()),
                "path": pa.array(o_path, type=pa.string()),
                "kind": pa.array(o_kind, type=pa.string()),
                "vhash": pa.array(o_hash, type=pa.int64()),
                "depth": pa.array(o_depth, type=pa.int64()),
            }
        )

    return traverse


def subtree_stats(ds, col: str, id_col: str, num_partitions: int = 32,
                  avoid_big_decimals: bool = True):
    """Corpus-wide structural-sharing stats per kind: total subtree
    occurrences vs distinct subtrees — the measured effect of sick's
    hash-consing (``EBAStructure.summary`` analogue). Returns a Dataset
    (kind, n_total, n_distinct)."""
    rows = ds.map_batches(
        make_traverser(col, id_col, avoid_big_decimals=avoid_big_decimals),
        batch_format="pyarrow",
    )

    def partial(batch: pa.Table) -> pa.Table:
        # pre-aggregate within batch: (kind, vhash) → count
        kind = batch.column("kind").to_numpy(zero_copy_only=False)
        vh = batch.column("vhash").to_numpy(zero_copy_only=False)
        # map kind string → small int (7 kinds)
        lut = {k: i for i, k in enumerate(_KINDS)}
        kid = np.fromiter((lut[k] for k in kind), dtype=np.int64, count=len(kind))
        key = kid * (np.int64(1) << np.int64(56)) + (vh & ((np.int64(1) << np.int64(56)) - 1))
        order = np.argsort(key, kind="stable")
        ks = key[order]
        fm = first_mask(ks)
        starts = np.flatnonzero(fm)
        cnt = np.diff(np.append(starts, len(ks)))
        return pa.table(
            {
                "kid": pa.array(kid[order][fm], type=pa.int64()),
                "vhash": pa.array(vh[order][fm], type=pa.int64()),
                "n": pa.array(cnt, type=pa.int64()),
            }
        )

    def reduce(part: pa.Table) -> pa.Table:
        kid = part.column("kid").to_numpy(zero_copy_only=False)
        vh = part.column("vhash").to_numpy(zero_copy_only=False)
        n = part.column("n").to_numpy(zero_copy_only=False)
        order = sort_index(kid, vh)
        k_s, v_s, n_s = kid[order], vh[order], n[order]
        grp = first_mask(k_s) | np.concatenate([[True], v_s[1:] != v_s[:-1]])
        starts = np.flatnonzero(grp)
        tot = np.add.reduceat(n_s, starts)
        gk = k_s[grp]
        # per kind: total + distinct
        k_fm = first_mask(gk)
        k_starts = np.flatnonzero(k_fm)
        n_tot = np.add.reduceat(tot, k_starts)
        n_dis = np.diff(np.append(k_starts, len(gk)))
        return pa.table(
            {
                "kind": pa.array([_KINDS[i] for i in gk[k_fm]], type=pa.string()),
                "n_total": pa.array(n_tot, type=pa.int64()),
                "n_distinct": pa.array(n_dis, type=pa.int64()),
            }
        )

    # partial maps (kind → kid) before the shuffle, so the hash keys are
    # the narrow (kid, vhash) pair; each distinct subtree lands in exactly
    # one partition, so per-partition distinct counts sum correctly
    parts = grouped_apply(
        rows, ["kid", "vhash"], reduce, num_partitions=num_partitions, partial=partial
    )

    def combine(df):
        g = df.groupby("kind", as_index=False).agg(
            n_total=("n_total", "sum"), n_distinct=("n_distinct", "sum")
        )
        return g

    out = combine(parts.to_pandas())
    out["n_total"] = out["n_total"].astype("int64")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("kind").reset_index(drop=True),
                                preserve_index=False)
