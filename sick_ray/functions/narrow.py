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

Decimal: Arrow ``decimal128`` columns + exact per-batch sums combined with
Python ``Decimal`` on the driver give byte-exact money totals (the
BigDecimal path) with no float rounding anywhere.
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


def decimal_sum(ds, col: str, group_col: str, precision: int = 18,
                scale: int = 2):
    """Exact decimal group totals: values are quantized to ``scale`` as
    decimal128 inside each batch, summed exactly per group (integer
    arithmetic on the unscaled values), partials combined on the driver
    with Python Decimal. Returns pa.Table (group_col, total:string) —
    totals rendered as canonical decimal strings (no float ever touches
    the sum, matching the reference's BigDecimal exactness)."""
    q = Decimal(1).scaleb(-scale)
    mult = 10 ** scale

    def partial(batch: pa.Table) -> pa.Table:
        # exact path: quantize to scaled int64 ("cents"), sum per group
        # vectorized — integer arithmetic, no float accumulation
        v = batch.column(col).to_numpy(zero_copy_only=False)
        units = np.rint(v * mult).astype(np.int64)
        keys = batch.column(group_col)
        import pandas as pd

        df = pd.DataFrame({group_col: keys.to_pandas(), "u": units})
        g = df.groupby(group_col, as_index=False)["u"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby(group_col, as_index=False)["u"].sum().sort_values(group_col)
    totals = [str((Decimal(int(u)) * q).quantize(q)) for u in out["u"]]
    return pa.table(
        {
            group_col: pa.array(out[group_col].tolist()),
            "total": pa.array(totals, type=pa.string()),
        }
    )
