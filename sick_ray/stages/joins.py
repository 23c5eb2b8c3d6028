"""Keyed temporal joins Ray Data lacks natively: as-of join and keyed
range join.

Both are built from the engine's one shuffle primitive — a tagged union of
the two sides hash-partitioned by the join key (``shuffle.grouped_apply``)
— plus a fully vectorized per-partition merge. Every row of one key lands
in exactly one partition, so the merge needs no cross-partition state; the
partitioning assumption is the same one the reference's bucket probe
relies on (SickDict KHash lookups, ``SickSharp/Format/SickDict.cs``; see
SURVEY.md §2.4).

The per-partition kernel avoids any per-row Python: keys are densified
with one ``np.unique``, (key, time) pairs collapse to a single sortable
``code * SPAN + rel_time`` int64 composite (SPAN sized so no group's range
can bleed into a neighbor), and matches come from ``np.searchsorted`` over
the composite array — O((n+m) log (n+m)) per partition, all in numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sick_ray.shuffle import grouped_apply


def _ts_int64(col) -> np.ndarray:
    arr = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype("datetime64[us]").astype(np.int64)
    return arr.astype(np.int64)


def _arrow_schema(ds) -> pa.Schema:
    """Dataset schema as pyarrow regardless of block format (pandas-block
    datasets report a PandasBlockSchema of numpy dtypes)."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, dt in zip(base.names, base.types):
        fields.append((name, dt if isinstance(dt, pa.DataType) else pa.from_numpy_dtype(dt)))
    return pa.schema(fields)


def _tagged_union(left_ds, right_ds, by: str, on: str,
                  left_cols: list[str], right_cols: list[str]):
    """Union both sides under one schema: (k, t, side, <left…>, <right…>)
    with the other side's payload columns null — the one shape
    ``grouped_apply``'s hash shuffle needs."""

    # pad types must match across sides; capture from each schema
    lschema = _arrow_schema(left_ds)
    rschema = _arrow_schema(right_ds)
    pad_types = {f"l_{c}": lschema.field(c).type for c in left_cols}
    pad_types.update({f"r_{c}": rschema.field(c).type for c in right_cols})

    def tag(side: int):
        own_prefix = "l_" if side == 1 else "r_"
        own_cols = left_cols if side == 1 else right_cols

        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {
                "k": batch.column(by),
                "t": batch.column(on),
                "side": pa.array(np.full(n, side, dtype=np.int8)),
            }
            # identical column ORDER on both sides — union requires it
            for c in left_cols:
                name = f"l_{c}"
                cols[name] = (
                    batch.column(c) if own_prefix == "l_" and c in own_cols
                    else pa.nulls(n, type=pad_types[name])
                )
            for c in right_cols:
                name = f"r_{c}"
                cols[name] = (
                    batch.column(c) if own_prefix == "r_" and c in own_cols
                    else pa.nulls(n, type=pad_types[name])
                )
            return pa.table(cols)

        return f

    tagged_l = left_ds.map_batches(tag(1), batch_format="pyarrow")
    tagged_r = right_ds.map_batches(tag(0), batch_format="pyarrow")
    # a schema'd empty Arrow seed: an entirely-empty side otherwise emits
    # schemaless empty blocks (map_batches UDFs never run on them) and the
    # final dataset would lose its column schema
    import ray.data as rd

    seed_schema = pa.schema(
        [("k", lschema.field(by).type), ("t", lschema.field(on).type),
         ("side", pa.int8())]
        + [(f"l_{c}", pad_types[f"l_{c}"]) for c in left_cols]
        + [(f"r_{c}", pad_types[f"r_{c}"]) for c in right_cols]
    )
    seed = rd.from_arrow(seed_schema.empty_table())
    return tagged_l.union(tagged_r, seed)


def _densify(k_l: np.ndarray, k_r: np.ndarray):
    uniq = np.unique(np.concatenate([k_l, k_r]))
    return np.searchsorted(uniq, k_l), np.searchsorted(uniq, k_r)


def _col_rank(col) -> np.ndarray:
    """Deterministic dense rank of a column's values (for tie-breaking),
    independent of row order within the partition."""
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype == object:
        arr = np.asarray([str(x) for x in arr])
    _, inv = np.unique(arr, return_inverse=True)
    return inv


def _check_span(n_codes: int, span: np.int64):
    # composite = code * span + rel must stay inside int64
    if int(n_codes) * int(span) >= (1 << 62):
        raise ValueError(
            f"composite key overflow: {n_codes} keys x {span} us time range "
            "per partition — raise num_partitions or coarsen the time unit"
        )


def asof_join(left_ds, right_ds, by: str, on: str,
              left_cols: list[str], right_cols: list[str],
              num_partitions: int = 16):
    """For each left row, the right row with the same ``by`` key and the
    greatest ``on`` value ≤ the left's (backward, inclusive — DuckDB
    ``ASOF JOIN`` semantics, inner: unmatched left rows are dropped).
    Ties on identical right ``on`` values resolve to the row latest in
    (t, payload-sort) order. Returns columns ``l_<left_cols>``,
    ``r_<right_cols>`` plus ``k`` and both times as ``t`` / ``r_t``.
    """

    def merge(part: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("k", part.schema.field("k").type), ("t", part.schema.field("t").type)]
            + [(f"l_{c}", part.schema.field(f"l_{c}").type) for c in left_cols]
            + [("r_t", part.schema.field("t").type)]
            + [(f"r_{c}", part.schema.field(f"r_{c}").type) for c in right_cols]
        )
        if part.num_rows == 0:
            return out_schema.empty_table()
        side = part.column("side").to_numpy(zero_copy_only=False)
        is_l = side == 1
        lt = part.filter(pa.array(is_l))
        rt = part.filter(pa.array(~is_l))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        k_l = lt.column("k").to_numpy(zero_copy_only=False)
        k_r = rt.column("k").to_numpy(zero_copy_only=False)
        t_l = _ts_int64(lt.column("t"))
        t_r = _ts_int64(rt.column("t"))
        c_l, c_r = _densify(k_l, k_r)
        tmin = min(t_l.min(), t_r.min())
        span = np.int64(max(t_l.max(), t_r.max()) - tmin + 2)
        _check_span(max(c_l.max(), c_r.max()) + 1, span)
        comp_l = c_l * span + (t_l - tmin)
        comp_r = c_r * span + (t_r - tmin)
        # deterministic tie-break on equal right-side (key, ts): rank every
        # payload column and lexsort them under comp_r, so the row picked
        # by searchsorted(side="right")-1 is the greatest in (t,
        # payload-sort) order — a bare stable argsort resolves ties by Ray
        # block arrival order, which varies run to run
        ranks = tuple(
            _col_rank(rt.column(f"r_{c}")) for c in reversed(right_cols)
        )
        r_order = np.lexsort(ranks + (comp_r,))
        pos = np.searchsorted(comp_r[r_order], comp_l, side="right") - 1
        valid = pos >= 0
        safe = np.maximum(pos, 0)
        hit = r_order[safe]
        valid &= c_r[hit] == c_l
        lt_keep = lt.filter(pa.array(valid))
        rt_match = rt.take(pa.array(hit[valid]))
        cols = {"k": lt_keep.column("k"), "t": lt_keep.column("t")}
        for c in left_cols:
            cols[f"l_{c}"] = lt_keep.column(f"l_{c}")
        cols["r_t"] = rt_match.column("t")
        for c in right_cols:
            cols[f"r_{c}"] = rt_match.column(f"r_{c}")
        return pa.table(cols, schema=out_schema)

    tagged = _tagged_union(left_ds, right_ds, by, on, left_cols, right_cols)
    return grouped_apply(tagged, ["k"], merge, num_partitions=num_partitions)


def range_join_agg(left_ds, right_ds, by: str, on: str,
                   value_col: str, window_us: int,
                   left_cols: list[str],
                   num_partitions: int = 16):
    """Keyed interval join + aggregate: for each left row, COUNT and SUM of
    right rows with the same ``by`` key and time in ``[t - window, t)``
    (strictly before). One left output row per input row (LEFT-join
    semantics: zero count / 0.0 sum when nothing is in range). The
    interval probe is two ``searchsorted`` calls against the composite
    key; SUM comes from a prefix-sum of the time-sorted right values.
    """

    def merge(part: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [(f"l_{c}", part.schema.field(f"l_{c}").type) for c in left_cols]
            + [("n_in_range", pa.int64()), ("sum_in_range", pa.float64())]
        )
        if part.num_rows == 0:
            return out_schema.empty_table()
        side = part.column("side").to_numpy(zero_copy_only=False)
        is_l = side == 1
        lt = part.filter(pa.array(is_l))
        rt = part.filter(pa.array(~is_l))
        if lt.num_rows == 0:
            return out_schema.empty_table()
        k_l = lt.column("k").to_numpy(zero_copy_only=False)
        t_l = _ts_int64(lt.column("t"))
        n_l = lt.num_rows
        if rt.num_rows == 0:
            counts = np.zeros(n_l, dtype=np.int64)
            sums = np.zeros(n_l)
        else:
            k_r = rt.column("k").to_numpy(zero_copy_only=False)
            t_r = _ts_int64(rt.column("t"))
            v_r = rt.column(f"r_{value_col}").to_numpy(zero_copy_only=False)
            c_l, c_r = _densify(k_l, k_r)
            tmin = min(t_l.min(), t_r.min())
            # SPAN covers the window reach-back so a probe's lower bound
            # can never cross into the previous group's composite range
            span = np.int64(max(t_l.max(), t_r.max()) - tmin + window_us + 2)
            _check_span(max(c_l.max(), c_r.max()) + 1, span)
            comp_l = c_l * span + (t_l - tmin)
            comp_r = c_r * span + (t_r - tmin)
            r_order = np.argsort(comp_r, kind="stable")
            comp_r_s = comp_r[r_order]
            csum = np.zeros(len(comp_r_s) + 1)
            np.cumsum(v_r[r_order], out=csum[1:])
            lo = np.searchsorted(comp_r_s, comp_l - window_us, side="left")
            hi = np.searchsorted(comp_r_s, comp_l, side="left")
            counts = (hi - lo).astype(np.int64)
            sums = csum[hi] - csum[lo]
        cols = {f"l_{c}": lt.column(f"l_{c}") for c in left_cols}
        cols["n_in_range"] = pa.array(counts, type=pa.int64())
        cols["sum_in_range"] = pa.array(sums, type=pa.float64())
        return pa.table(cols, schema=out_schema)

    tagged = _tagged_union(left_ds, right_ds, by, on, left_cols, [value_col])
    return grouped_apply(tagged, ["k"], merge, num_partitions=num_partitions)
