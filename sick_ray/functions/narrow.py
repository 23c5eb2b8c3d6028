"""Numeric narrowing + exact decimal arithmetic — the analogue of the
reference's lossless width selection.

``CirceTraverser.traverse`` stores every JSON number in the smallest
lossless representation (byte → short → int → long → BigInt, float →
double → BigDecimal; json-sick-scala ``CirceTraverser.scala:101-156``,
codecs ``EBACodecs.scala:367-400``). Distributed re-expression: widths are
a GLOBAL property of a column, so a cheap min/max aggregate (vectorized
per-batch partials, tiny driver combine) picks the width once, and a
schema-stable ``map_batches`` cast applies it everywhere — per-batch
narrowing would fork the Dataset schema.

Decimal: :func:`decimal_sum` emits Arrow ``decimal128(38, s)`` totals from
overflow-safe integer-unit accumulation (32-bit half-sums recombined with
unbounded Python ints), and :func:`decimal_sum_exact` handles arbitrary-
precision string/decimal inputs (100-digit fixtures) entirely in Python
``Decimal`` — byte-exact money totals, no float rounding anywhere.
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_INT_STEPS = [
    (np.iinfo(np.int8), pa.int8(), 1),
    (np.iinfo(np.int16), pa.int16(), 2),
    (np.iinfo(np.int32), pa.int32(), 4),
    (np.iinfo(np.int64), pa.int64(), 8),
]


def minimal_int_type(lo: int, hi: int):
    """Smallest signed Arrow int type holding [lo, hi] (reference's
    byte/short/int/long ladder)."""
    for info, typ, width in _INT_STEPS:
        if lo >= info.min and hi <= info.max:
            return typ, width
    return pa.int64(), 8


def column_ranges(ds, cols: list[str]):
    """Global (min, max) per integer column: per-batch vectorized partials,
    driver combine of one row per batch — no shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            v = batch.column(c).to_numpy(zero_copy_only=False)
            out[f"{c}__min"] = pa.array([int(v.min()) if len(v) else 0], type=pa.int64())
            out[f"{c}__max"] = pa.array([int(v.max()) if len(v) else 0], type=pa.int64())
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return {
        c: (int(parts[f"{c}__min"].min()), int(parts[f"{c}__max"].max()))
        for c in cols
    }


def narrow_types(ds, cols: list[str]) -> dict:
    """col → (arrow type, byte width) chosen from the global value range."""
    ranges = column_ranges(ds, cols)
    return {c: minimal_int_type(lo, hi) for c, (lo, hi) in ranges.items()}


def apply_narrowing(ds, types: dict):
    """Schema-stable cast of each column to its chosen narrow type."""

    def cast(batch: pa.Table) -> pa.Table:
        for c, (typ, _w) in types.items():
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(i, c, pc.cast(batch.column(c), typ))
        return batch

    return ds.map_batches(cast, batch_format="pyarrow")


def decimal_sum(ds, col: str, group_col: str, precision: int = 38,
                scale: int = 2):
    """Exact decimal group totals → pa.Table (group_col,
    total: decimal128(precision, scale)).

    Values are quantized to ``scale`` as int64 units inside each batch,
    then summed OVERFLOW-SAFELY: each unit is split into signed-high /
    unsigned-low 32-bit halves, each half summed per group in int64 (a
    batch would need 2^31 rows to overflow a half), and the driver
    recombines the tiny partials with unbounded Python ints — so the
    TOTAL is exact up to decimal128's 38 digits even when it exceeds
    int64 units (round 2 capped at ≈9.2e16). No float ever touches the
    accumulation (the reference's BigDecimal exactness,
    EBACodecs.scala:367-400). Per-VALUE magnitude is still bounded by the
    float64 input column (2^53 units); for arbitrary-precision inputs use
    :func:`decimal_sum_exact`."""
    q = Decimal(1).scaleb(-scale)
    mult = 10 ** scale

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        units = np.rint(v * mult).astype(np.int64)
        u_hi = units >> 32                       # signed high half
        u_lo = units & 0xFFFFFFFF                # unsigned low half
        t = pa.table(
            {
                group_col: batch.column(group_col),
                "hi": pa.array(u_hi, type=pa.int64()),
                "lo": pa.array(u_lo, type=pa.int64()),
            }
        )
        # Arrow's native hash aggregation — no pandas frame per batch
        g = t.group_by(group_col).aggregate([("hi", "sum"), ("lo", "sum")])
        return pa.table(
            {
                group_col: g.column(group_col),
                "hi": g.column("hi_sum"),
                "lo": g.column("lo_sum"),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby(group_col, as_index=False)[["hi", "lo"]]
        .agg(lambda s: sum(int(x) for x in s))   # unbounded Python ints
        .sort_values(group_col)
    )
    totals = [
        (Decimal((int(hi) << 32) + int(lo)) * q).quantize(q)
        for hi, lo in zip(out["hi"], out["lo"])
    ]
    return pa.table(
        {
            group_col: pa.array(out[group_col].tolist()),
            "total": pa.array(totals, type=pa.decimal128(precision, scale)),
        }
    )


def decimal_sum_exact(ds, col: str, group_col: str, scale: int = 2):
    """Arbitrary-precision decimal group totals for string- or
    decimal-typed columns (the reference's 100-digit BigDecimal fixtures,
    BigDecimalTests.cs:12-40): each batch parses its values with Python
    ``Decimal`` (exact, bounded rows per task), emits per-group partial
    sums as canonical strings, and the driver combines the tiny partials
    with ``Decimal`` again. Returns (group_col, total:string) — totals
    beyond decimal128's 38 digits can't be an Arrow decimal column."""

    from decimal import localcontext

    PREC = 1000  # arithmetic precision; default context is only 28 digits

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        keys = batch.column(group_col).to_pylist()
        acc: dict = {}
        with localcontext() as ctx:
            ctx.prec = PREC
            for k, v in zip(keys, vals):
                if v is None:
                    continue
                acc[k] = acc.get(k, Decimal(0)) + Decimal(str(v))
        ks = sorted(acc)
        return pa.table(
            {
                group_col: pa.array(ks),
                "t": pa.array([str(acc[k]) for k in ks], type=pa.string()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    q = Decimal(1).scaleb(-scale)
    acc: dict = {}
    with localcontext() as ctx:
        ctx.prec = PREC
        for k, t in zip(parts[group_col], parts["t"]):
            acc[k] = acc.get(k, Decimal(0)) + Decimal(t)
        ks = sorted(acc)
        totals = [str(acc[k].quantize(q)) for k in ks]
    return pa.table(
        {
            group_col: pa.array(ks),
            "total": pa.array(totals, type=pa.string()),
        }
    )
