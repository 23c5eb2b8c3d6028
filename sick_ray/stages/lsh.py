"""Stage 2b — LSH banding, hot-bucket salting, candidate edges.

The reference's object lookup probes a hash-bucket skip index: keys sorted
by a 32-bit hash, 128 buckets over the hash range, probe = bucket + short
linear scan (Scala ``eba/reader/incremental/OneObjTable.scala:44-107``, C#
``SickCursor.Object.cs:168-250``). The LSH band bucket is the distributed
analogue: ``(band, band_hash)`` is the bucket key of a groupby shuffle, and
the within-group candidate generation is the "short linear scan".

Skew (north_rule): boilerplate-heavy pages hash thousands of docs into one
bucket. We salt hot buckets into ``salt_fanout`` sub-buckets keyed by
``fp64 % fanout`` (bounding any group's size), emit star edges inside each
sub-bucket, and re-link the sub-buckets through a second, tiny groupby over
per-sub-bucket representatives — connectivity of the original bucket is
preserved while no group exceeds ``max(bucket_threshold, n/fanout)`` rows.
Hot buckets are found by a cheap count pre-pass (a groupby over two narrow
uint columns; the ``html``/``text`` payloads never enter any shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sick_ray.config import DedupConfig

KIND_EDGE = 0
KIND_REP = 1


def explode_bands(batch: pa.Table) -> pa.Table:
    """(fp64, band_hash: fixed_size_list<uint64, B>) → long format
    (band:int32, band_hash:uint64, fp64:uint64). Narrow rows only."""
    n = batch.num_rows
    bh_col = batch.column("band_hash")
    if isinstance(bh_col, pa.ChunkedArray):
        bh_col = bh_col.combine_chunks()
    bands = bh_col.type.list_size
    flat = bh_col.flatten().to_numpy(zero_copy_only=False)
    fp = batch.column("fp64").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(flat, type=pa.int64()),
            "fp64": pa.array(np.repeat(fp, bands), type=pa.int64()),
        }
    )


def hot_buckets(band_rows, threshold: int):
    """Count pre-pass: buckets with > threshold members. Returns a small
    pandas DataFrame (band, band_hash, count) — broadcast via make_salter."""
    counts = band_rows.groupby(["band", "band_hash"]).count()

    def flt(batch: pa.Table) -> pa.Table:
        cname = next(c for c in batch.column_names if c not in ("band", "band_hash"))
        return batch.filter(pc.greater(batch.column(cname), threshold))

    return counts.map_batches(flt, batch_format="pyarrow").to_pandas()


def make_salter(hot_df, fanout: int):
    """Vectorized salt assigner. hot_df: (band, band_hash, ...) hot keys."""
    per_band: dict[int, np.ndarray] = {}
    if hot_df is not None and len(hot_df):
        for band, grp in hot_df.groupby("band"):
            per_band[int(band)] = np.sort(grp["band_hash"].to_numpy().astype(np.int64))

    def add_salt(batch: pa.Table) -> pa.Table:
        band = batch.column("band").to_numpy(zero_copy_only=False)
        bh = batch.column("band_hash").to_numpy(zero_copy_only=False)
        fp = batch.column("fp64").to_numpy(zero_copy_only=False)
        salt = np.zeros(len(band), dtype=np.int32)
        for b, hot_sorted in per_band.items():
            m = band == b
            if not m.any():
                continue
            pos = np.searchsorted(hot_sorted, bh[m])
            pos = np.clip(pos, 0, len(hot_sorted) - 1)
            is_hot = hot_sorted[pos] == bh[m]
            s = np.zeros(int(m.sum()), dtype=np.int32)
            s[is_hot] = 1 + ((fp[m][is_hot] & np.int64(0x7FFFFFFFFFFFFFFF)) % fanout).astype(np.int32)
            salt[m] = s
        return batch.append_column("salt", pa.array(salt, type=pa.int32()))

    return add_salt


def make_edge_emitter(cfg: DedupConfig):
    """map_groups fn over (band, band_hash, salt): star edges + reps.

    Star edges (min-member ↔ each other member) connect the whole group with
    |group|-1 edges — all-pairs would be quadratic in a boilerplate bucket.
    Salted groups (salt>0) additionally emit one KIND_REP row carrying their
    min member, so a second groupby over (band, band_hash) can re-link the
    sub-buckets of a salted hot bucket.
    """
    cap = cfg.max_pairs_per_bucket

    def emit(group: pa.Table) -> pa.Table:
        fp = np.unique(group.column("fp64").to_numpy(zero_copy_only=False))
        band = group.column("band")[0].as_py()
        bh = group.column("band_hash")[0].as_py()
        salt = group.column("salt")[0].as_py() if "salt" in group.column_names else 0
        out_u, out_v, out_k = [], [], []
        if len(fp) > 1:
            mn = fp[0]
            others = fp[1 : 1 + cap]
            out_u.append(np.full(len(others), mn, dtype=np.int64))
            out_v.append(others)
            out_k.append(np.zeros(len(others), dtype=np.int8))
        if salt and len(fp) > 0:
            out_u.append(np.array([fp[0]], dtype=np.int64))
            out_v.append(np.array([fp[0]], dtype=np.int64))
            out_k.append(np.array([KIND_REP], dtype=np.int8))
        if not out_u:
            return pa.table(
                {
                    "band": pa.array([], type=pa.int32()),
                    "band_hash": pa.array([], type=pa.int64()),
                    "u": pa.array([], type=pa.int64()),
                    "v": pa.array([], type=pa.int64()),
                    "kind": pa.array([], type=pa.int8()),
                }
            )
        u = np.concatenate(out_u)
        n = len(u)
        return pa.table(
            {
                "band": pa.array(np.full(n, band, dtype=np.int32)),
                "band_hash": pa.array(np.full(n, bh, dtype=np.int64)),
                "u": pa.array(u, type=pa.int64()),
                "v": pa.array(np.concatenate(out_v), type=pa.int64()),
                "kind": pa.array(np.concatenate(out_k), type=pa.int8()),
            }
        )

    return emit


def link_reps(group: pa.Table) -> pa.Table:
    """Second-phase map_groups over (band, band_hash) of KIND_REP rows:
    chain the sub-bucket representatives of one salted hot bucket."""
    fp = np.unique(group.column("u").to_numpy(zero_copy_only=False))
    if len(fp) <= 1:
        return pa.table({"u": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64())})
    return pa.table(
        {
            "u": pa.array(np.full(len(fp) - 1, fp[0], dtype=np.int64)),
            "v": pa.array(fp[1:], type=pa.int64()),
        }
    )


def _kind_filter(kind: int):
    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("kind"), kind))

    return f


def candidate_edges(sig_ds, cfg: DedupConfig):
    """Signatures Dataset (fp64, sig, band_hash) → candidate edge Dataset
    (u:uint64, v:uint64), salting hot buckets. Two groupby shuffles over
    narrow uint columns + one tiny groupby over reps.

    The band-rows table (20 B/row) is materialized once and reused for the
    count pre-pass and the bucket groupby so the upstream minhash chain is
    not recomputed.
    """
    band_rows = sig_ds.map_batches(
        explode_bands, batch_format="pyarrow"
    ).materialize()
    hot = hot_buckets(band_rows, cfg.hot_bucket_threshold)
    salted = band_rows.map_batches(
        make_salter(hot, cfg.salt_fanout), batch_format="pyarrow"
    )
    raw = salted.groupby(["band", "band_hash", "salt"]).map_groups(
        make_edge_emitter(cfg), batch_format="pyarrow"
    ).materialize()
    edges = raw.map_batches(_kind_filter(KIND_EDGE), batch_format="pyarrow").select_columns(["u", "v"])
    reps = raw.map_batches(_kind_filter(KIND_REP), batch_format="pyarrow")
    rep_edges = reps.groupby(["band", "band_hash"]).map_groups(
        link_reps, batch_format="pyarrow"
    ).select_columns(["u", "v"])
    return edges.union(rep_edges)


def distinct_edges(edges_ds):
    """Drop duplicate (u, v) rows (same pair surfaced by several bands)."""
    return edges_ds.groupby(["u", "v"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# ------------------------------------------------------------- verification

def build_sig_lookup(sig_table: pa.Table, num_perm: int):
    """(index: {fp64→row}, matrix: (n, num_perm) uint32) for broadcast."""
    from sick_ray.stages.minhash import fsl_to_numpy

    fp = sig_table.column("fp64").to_numpy(zero_copy_only=False)
    mat = fsl_to_numpy(sig_table.column("sig"), num_perm)
    return {int(f): i for i, f in enumerate(fp)}, np.ascontiguousarray(mat)


def verify_edges_broadcast(edges_ds, sig_lookup_ref, threshold: float):
    """Filter candidate edges by estimated Jaccard (= fraction of equal
    signature components). ``sig_lookup_ref`` = ray.put(build_sig_lookup(...))
    — the broadcast-small-side pattern: ray.put once on the driver, every
    task reads it from the (shared) object store, never re-shipped per
    batch."""
    import ray

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        index, mat = ray.get(sig_lookup_ref)
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        iu = np.fromiter((index[int(x)] for x in u), dtype=np.int64, count=len(u))
        iv = np.fromiter((index[int(x)] for x in v), dtype=np.int64, count=len(v))
        est = (mat[iu] == mat[iv]).mean(axis=1)
        return batch.filter(pa.array(est >= threshold))

    return edges_ds.map_batches(verify, batch_format="pyarrow")


def verify_edges_join(edges_ds, sig_ds, threshold: float, num_partitions: int):
    """Scale path: two hash joins (edges ⋈ sigs on u, then on v) instead of
    a driver-side broadcast. Signature payload is 128×uint32 per row."""
    su = sig_ds.select_columns(["fp64", "sig"])
    j1 = edges_ds.join(
        su, join_type="inner", num_partitions=num_partitions,
        on=("u",), right_on=("fp64",), right_suffix="_su",
    )
    j2 = j1.join(
        su, join_type="inner", num_partitions=num_partitions,
        on=("v",), right_on=("fp64",), left_suffix="_l", right_suffix="_sv",
    )

    def flt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(["u", "v"])
        from sick_ray.stages.minhash import fsl_to_numpy

        names = batch.column_names
        s1 = next(c for c in names if c.startswith("sig") and not c.endswith("_sv"))
        s2 = next(c for c in names if c.startswith("sig") and c.endswith("_sv"))
        width = batch.column(s1).type.list_size
        a = fsl_to_numpy(batch.column(s1), width)
        b = fsl_to_numpy(batch.column(s2), width)
        est = (a == b).mean(axis=1)
        return batch.select(["u", "v"]).filter(pa.array(est >= threshold))

    return j2.map_batches(flt, batch_format="pyarrow")
