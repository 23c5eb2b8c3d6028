"""Hash-partitioned grouped execution — the engine's workhorse shuffle.

Ray Data's ``groupby(key).map_groups(fn)`` invokes Python once per key and
its built-in aggregates degrade badly at high key cardinality (measured in
this environment: ~86 µs/group ⇒ 173 s for a 1M-group Min). Every wide step
in this engine therefore uses the classic two-phase pattern instead — the
same shape that scales on a multi-node cluster:

1. **map side**: an optional per-batch *partial* reduction (vectorized
   NumPy: lexsort + first-mask / reduceat), then a ``part = mix(key) % P``
   column (uniform via an avalanche mix, so skewed key values still spread).
2. **shuffle**: ``groupby("part")`` with only P groups — per-group Python
   overhead is O(P), not O(#keys); data movement is Ray's regular shuffle.
3. **reduce side**: the caller's ``fn`` receives one whole hash partition
   as a single Arrow table and processes *all* its groups vectorized.

Partition count ``P`` bounds reduce-side memory at ~|data|/P per task:
size it so a partition fits a worker heap (on a real cluster, P scales
with node count; shuffles stay all-to-all but every message is narrow).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from sick_ray.xxh import xxh64_strings

U64 = np.uint64
_MIX1 = U64(0xFF51AFD7ED558CCD)
_MIX2 = U64(0xC4CEB9FE1A85EC53)
_POLY = U64(0x9E3779B185EBCA87)

DEFAULT_PARTITIONS = 64


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 (wraparound)."""
    x = x ^ (x >> U64(33))
    x = x * _MIX1
    x = x ^ (x >> U64(33))
    x = x * _MIX2
    return x ^ (x >> U64(33))


def combine_keys(table: pa.Table, key_cols: list[str]) -> np.ndarray:
    """Hash-combine one or more key columns (int or string) into uint64."""
    acc = None
    for c in key_cols:
        col = table.column(c)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type) or pa.types.is_binary(col.type):
            v = xxh64_strings(col)
        else:
            v = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        acc = mix64(v) if acc is None else mix64(acc * _POLY + v)
    return acc


def _add_part(key_cols: list[str], num_partitions: int):
    def f(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("part", pa.array([], type=pa.int32()))
        part = (combine_keys(batch, key_cols) % U64(num_partitions)).astype(np.int32)
        return batch.append_column("part", pa.array(part))

    return f


def grouped_apply(
    ds,
    key_cols: list[str],
    fn,
    num_partitions: int = DEFAULT_PARTITIONS,
    partial=None,
):
    """Apply ``fn(partition_table) -> table`` with all rows of any key
    co-located in exactly one invocation. ``fn`` must handle *many* groups
    per call (vectorize: sort by key + segment ops). ``partial`` is an
    optional per-batch map-side pre-reduction (must be idempotent and
    key-preserving)."""
    # batch_size=None → one call per block: our partition fns are fully
    # vectorized, and small default batches fragment the shuffle input into
    # hundreds of tiny blocks (measured 5x slowdown of the sort shuffle)
    if partial is not None:
        ds = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(_add_part(key_cols, num_partitions), batch_format="pyarrow", batch_size=None)

    def apply(part_tbl: pa.Table) -> pa.Table:
        return fn(part_tbl.drop_columns(["part"]))

    return ds.groupby("part").map_groups(apply, batch_format="pyarrow")


# ------------------------------------------------------- vectorized helpers

def sort_index(*cols) -> np.ndarray:
    """np.lexsort with most-significant key FIRST (readable order)."""
    return np.lexsort(tuple(reversed(cols)))


def first_mask(sorted_keys: np.ndarray) -> np.ndarray:
    """Boolean mask of first row of each group in a key-sorted array."""
    m = np.ones(len(sorted_keys), dtype=bool)
    if len(sorted_keys) > 1:
        m[1:] = sorted_keys[1:] != sorted_keys[:-1]
    return m


def group_ids(sorted_keys: np.ndarray) -> np.ndarray:
    """0-based contiguous group id per row of a key-sorted array."""
    fm = first_mask(sorted_keys)
    return np.cumsum(fm) - 1


def join_partitions(requested: int) -> int:
    """Cap a Dataset.join partition count at the cluster's CPU slots.

    Ray's hash join spawns ``num_partitions`` aggregator actors; when that
    exceeds the available CPU slots on a small session the actors thrash /
    stall behind the map tasks (measured: a 16-partition join on a 4-CPU
    session ran >8 min; 4 partitions took seconds). On a real cluster the
    cap is the total CPU count, so scale paths keep their parallelism."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", requested))
    except Exception:
        cpus = requested
    return max(2, min(requested, cpus))


# keys at or below this count are broadcast (ray.put once, read per task);
# larger key sets switch to a distributed left-semi join so no O(corpus)
# structure ever lands on the driver
BROADCAST_KEYS_LIMIT = 2_000_000


def semi_select(input_ds, keys_ds, on: str, num_partitions: int,
                n_keys_hint: int | None = None,
                bloom_prefilter: bool = True):
    """Keep input rows whose ``on`` value appears in ``keys_ds`` —
    broadcast filter under BROADCAST_KEYS_LIMIT keys (the wide payload
    never moves), LEFT SEMI hash join above it (nothing driver-sized).

    ``bloom_prefilter``: on the join path, an in-cluster Bloom bitmap
    over the keys (10 bits/key ≈ 1% false positives, Kirsch-Mitzenmacher
    double hashing) filters the wide input BEFORE the shuffle — at low
    selectivity the join then moves ~1% of the corpus instead of all of
    it; exactness comes from the left-semi join over the survivors
    (Bloom has no false negatives). Integer keys hash directly; string
    keys hash via xxh64 on both sides; other key types fall back to the
    plain join."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    if n_keys_hint is None:
        # materialize BEFORE counting: count() on a lazy pipeline executes
        # it and discards the blocks, and both downstream paths consume
        # keys_ds again (bloom build / broadcast assembly / join)
        keys_ds = keys_ds.materialize()
        n_keys = keys_ds.count()
    else:
        n_keys = n_keys_hint
    if n_keys > BROADCAST_KEYS_LIMIT:
        key_type = None
        try:
            key_type = keys_ds.schema().base_schema.field(on).type
        except Exception:
            pass
        hashable = key_type is not None and (
            pa.types.is_integer(key_type) or pa.types.is_string(key_type)
            or pa.types.is_large_string(key_type)
        )
        if bloom_prefilter and hashable:
            from sick_ray.functions.sketch import (
                bloom_build,
                bloom_contains,
                bloom_params,
            )
            from sick_ray.xxh import xxh64_strings

            m, k = bloom_params(n_keys)
            is_str = not pa.types.is_integer(key_type)
            # consumed by the bloom build AND the join: a lazy keys
            # pipeline would otherwise re-execute per consumer (no-op when
            # the hint-less path above already materialized)
            keys_ds = keys_ds.materialize()

            def key_ints(col) -> "np.ndarray":
                if is_str:
                    return xxh64_strings(col).view("int64")
                return col.to_numpy(zero_copy_only=False)

            # built IN-cluster from the key dataset's own block refs (one
            # task; at real 100-TB key counts this becomes a tree of
            # per-block partial bitmaps OR-combined — bitmaps merge by |)
            def finalize_bloom(tbl: pa.Table):
                return bloom_build(key_ints(tbl.column(on).combine_chunks()),
                                   m, k)

            bits_ref = assemble_blocks(
                keys_ds, [on], finalize_bloom, empty=None
            )

            def prefilter(batch: pa.Table) -> pa.Table:
                bits = ray.get(bits_ref)
                if bits is None:
                    return batch.slice(0, 0)
                vals = key_ints(batch.column(on).combine_chunks())
                return batch.filter(pa.array(bloom_contains(bits, vals, k)))

            input_ds = input_ds.map_batches(prefilter, batch_format="pyarrow")
        return input_ds.join(
            keys_ds,
            join_type="left_semi",
            num_partitions=join_partitions(num_partitions),
            on=(on,),
        )

    # assemble the key set IN the cluster from the dataset's own block refs
    # (plasma broadcast, zero driver traffic — the labels-attach pattern
    # from dedup.py; round 2 streamed the keys through the driver instead)
    def finalize_keys(tbl: pa.Table):
        return tbl.column(on).combine_chunks()

    ref = assemble_blocks(keys_ds, [on], finalize_keys, empty=None)

    def flt(batch: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        if vs is None:
            return batch.slice(0, 0)
        return batch.filter(pc.is_in(batch.column(on), value_set=vs))

    return input_ds.map_batches(flt, batch_format="pyarrow")


def anti_select(input_ds, keys_ds, on: str, num_partitions: int,
                n_keys_hint: int | None = None,
                bloom_prefilter: bool = True):
    """Keep input rows whose ``on`` value does NOT appear in ``keys_ds`` —
    the anti-join twin of :func:`semi_select`. Broadcast set-difference
    filter under BROADCAST_KEYS_LIMIT keys; LEFT ANTI hash join above it.

    ``bloom_prefilter`` (join path): a Bloom MISS proves the key is absent
    from ``keys_ds`` (no false negatives), so rows missing the in-cluster
    bitmap are kept WITHOUT ever shuffling; only the in-bloom minority
    (true members + ~1% false positives) rides the exact left-anti join.
    In the fresh-crawl case — most probe rows genuinely new — the join
    moves a few percent of the input instead of all of it. The split
    consumes ``input_ds`` twice, so pass a MATERIALIZED input (a lazy
    pipeline would re-execute per consumer). Join-path payload columns
    must be hash-join-compatible — pack list-typed payloads to
    fixed-size binary first (index._pack_sig_blobs is the pattern)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    if n_keys_hint is None:
        keys_ds = keys_ds.materialize()
        n_keys = keys_ds.count()
    else:
        n_keys = n_keys_hint
    if n_keys == 0:
        return input_ds

    if n_keys > BROADCAST_KEYS_LIMIT:
        key_type = None
        try:
            key_type = keys_ds.schema().base_schema.field(on).type
        except Exception:
            pass
        hashable = key_type is not None and (
            pa.types.is_integer(key_type) or pa.types.is_string(key_type)
            or pa.types.is_large_string(key_type)
        )
        if bloom_prefilter and hashable:
            from sick_ray.functions.sketch import (
                bloom_build,
                bloom_contains,
                bloom_params,
            )
            from sick_ray.xxh import xxh64_strings

            m, k = bloom_params(n_keys)
            is_str = not pa.types.is_integer(key_type)
            keys_ds = keys_ds.materialize()

            def key_ints(col) -> "np.ndarray":
                if is_str:
                    return xxh64_strings(col).view("int64")
                return col.to_numpy(zero_copy_only=False)

            def finalize_bloom(tbl: pa.Table):
                return bloom_build(key_ints(tbl.column(on).combine_chunks()),
                                   m, k)

            bits_ref = assemble_blocks(
                keys_ds, [on], finalize_bloom, empty=None
            )

            def split(want_hit: bool):
                def f(batch: pa.Table) -> pa.Table:
                    bits = ray.get(bits_ref)
                    if bits is None:
                        # no keys → every row is a miss
                        return batch.slice(0, 0) if want_hit else batch
                    vals = key_ints(batch.column(on).combine_chunks())
                    hit = bloom_contains(bits, vals, k)
                    return batch.filter(pa.array(hit if want_hit else ~hit))

                return f

            definite_new = input_ds.map_batches(split(False),
                                                batch_format="pyarrow")
            maybe = input_ds.map_batches(split(True),
                                         batch_format="pyarrow").join(
                keys_ds,
                join_type="left_anti",
                num_partitions=join_partitions(num_partitions),
                on=(on,),
            )
            return definite_new.union(maybe)
        return input_ds.join(
            keys_ds,
            join_type="left_anti",
            num_partitions=join_partitions(num_partitions),
            on=(on,),
        )

    def finalize_keys(tbl: pa.Table):
        return tbl.column(on).combine_chunks()

    ref = assemble_blocks(keys_ds, [on], finalize_keys, empty=None)

    def flt(batch: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        if vs is None:
            return batch
        return batch.filter(
            pc.invert(pc.is_in(batch.column(on), value_set=vs))
        )

    return input_ds.map_batches(flt, batch_format="pyarrow")


def finalize_dim_lookup(key_col: str, val_col: str, tbl: pa.Table):
    """assemble_blocks finalize for :func:`attach_dim`: (sorted int64 keys,
    matching value array) — binary-searchable in every probe task."""
    keys = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    vals = tbl.column(val_col).combine_chunks().take(pa.array(order))
    return keys[order], vals


def attach_dim(input_ds, dim_ds, on: str, key_col: str, val_col: str,
               num_partitions: int, out_col: str | None = None,
               n_dim_hint: int | None = None):
    """Attach one dimension attribute to a fact Dataset by integer key —
    INNER-join semantics (fact rows with no dimension match are dropped).

    Below ``BROADCAST_KEYS_LIMIT`` dimension rows the lookup is assembled
    IN the cluster from the dimension dataset's own block refs (plasma
    broadcast — the driver never touches a row) and probed per batch with
    a vectorized searchsorted; above it the attach falls back to a
    distributed ``Dataset.join`` so no O(dimension) structure ever lands
    in a single object. The same size switch as :func:`semi_select` /
    suffix.py's url map — dimension tables scale too (TPC-H scales
    customer with SF; a pickled driver dict and a per-row ``Series.map``
    probe do not)."""
    import functools

    import ray

    out_col = out_col or val_col
    dim_ds = dim_ds.materialize()
    n_dim = dim_ds.count() if n_dim_hint is None else n_dim_hint

    if n_dim > BROADCAST_KEYS_LIMIT:
        joined = input_ds.join(
            dim_ds.select_columns([key_col, val_col]),
            join_type="inner",
            num_partitions=join_partitions(num_partitions),
            on=(on,),
            right_on=(key_col,),
        )

        def conform(batch: pa.Table) -> pa.Table:
            if val_col != out_col:
                batch = batch.rename_columns(
                    [out_col if c == val_col else c for c in batch.column_names]
                )
            drop = [c for c in (key_col,) if c in batch.column_names and c != on]
            return batch.drop_columns(drop) if drop else batch

        return joined.map_batches(conform, batch_format="pyarrow")

    ref = assemble_blocks(
        dim_ds, [key_col, val_col],
        functools.partial(finalize_dim_lookup, key_col, val_col),
        empty=None,
    )

    def attach(batch: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        if lk is None:
            # an EMPTY dimension side makes every inner-attach vacuous —
            # that's an upstream bug (wrong column, wrong filter), not a
            # result; fail loudly rather than silently emit zero rows
            raise ValueError(
                f"attach_dim: dimension side has no rows with columns "
                f"({key_col}, {val_col})"
            )
        keys, vals = lk
        if batch.num_rows == 0:
            return batch.append_column(out_col, vals.slice(0, 0))
        k = batch.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        hi = len(keys) - 1
        pos = np.minimum(np.searchsorted(keys, k), hi)
        found = keys[pos] == k
        kept = batch.filter(pa.array(found))
        return kept.append_column(out_col, vals.take(pa.array(pos[found])))

    return input_ds.map_batches(attach, batch_format="pyarrow")


def segment_pairs(sorted_keys: np.ndarray, cap: int):
    """Within-group index pairs over a key-sorted array, vectorized across
    ALL groups at once.

    Groups whose all-pairs count C(g,2) is ≤ ``cap`` emit every pair —
    required for recall: hub-spoke (star) emission drops true near-dup
    pairs whenever the bucket's first member is dissimilar to both (the
    round-1 hub failure). Groups above the cap fall back to star + chain
    edges (2g−3 rows, connectivity-preserving) and the shortfall is
    COUNTED, never silent.

    Returns (i_idx, j_idx, truncated_pairs, truncated_groups) where i_idx/
    j_idx index into the sorted array and i < j within each group.
    """
    n = len(sorted_keys)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, 0, 0
    fm = first_mask(sorted_keys)
    gid = np.cumsum(fm) - 1
    starts = np.flatnonzero(fm)
    sizes = np.diff(np.append(starts, n))
    g_row = sizes[gid]
    pos = np.arange(n) - starts[gid]
    pairs_per_group = sizes * (sizes - 1) // 2
    big = pairs_per_group > cap
    big_row = big[gid]
    # small groups: all pairs
    rep = np.where(big_row, 0, g_row - 1 - pos)
    total = int(rep.sum())
    i_idx = np.repeat(np.arange(n), rep)
    run_starts = np.cumsum(rep) - rep
    j_idx = np.arange(total) - run_starts[i_idx] + i_idx + 1
    trunc_pairs = 0
    trunc_groups = int(big.sum())
    if trunc_groups:
        bs, bz = starts[big], sizes[big]
        # star: first member ↔ every other member
        cnt = bz - 1
        su = np.repeat(bs, cnt)
        off = np.cumsum(cnt) - cnt
        sv = np.arange(int(cnt.sum())) - np.repeat(off, cnt) + su + 1
        # chain: adjacent members (excluding the (first, second) star edge)
        cntc = bz - 2
        cu0 = np.repeat(bs + 1, cntc)
        offc = np.cumsum(cntc) - cntc
        cu = np.arange(int(cntc.sum())) - np.repeat(offc, cntc) + cu0
        i_idx = np.concatenate([i_idx, su, cu])
        j_idx = np.concatenate([j_idx, sv, cu + 1])
        trunc_pairs = int((pairs_per_group[big] - (2 * bz - 3)).sum())
    return i_idx, j_idx, trunc_pairs, trunc_groups


def kind_filter(kind: int):
    """map_batches fn: keep rows of a kind-tagged stream (0 = data rows,
    1 = representative rows, 2 = counter sentinels)."""
    import pyarrow.compute as pc

    def f(batch):
        return batch.filter(pc.equal(batch.column("kind"), kind))

    return f


def collect_counter_rows(raw, counters: dict | None, u_key: str, v_key: str):
    """Sum the kind=2 sentinel rows of a tagged pair stream into
    ``counters`` — the shared "counted, never silent" collector behind
    every capped emitter (LSH, SimHash, embedding buckets, capped n-gram).
    Sentinel rows carry (shortfall_a, shortfall_b) in their (u, v) slots;
    they are summed into ``counters[u_key]`` / ``counters[v_key]``.

    No-op passthrough when ``counters`` is None (the stream is consumed
    once, lazily). Otherwise the dataset is materialized (idempotent on an
    already-materialized dataset) so the counter read does not recompute
    the upstream shuffle, and the materialized dataset is returned for the
    caller's kind=0/1 filters."""
    if counters is None:
        return raw
    raw = raw.materialize()
    cnt = raw.map_batches(kind_filter(2), batch_format="pyarrow").to_pandas()
    counters[u_key] = int(cnt["u"].sum()) if len(cnt) else 0
    counters[v_key] = int(cnt["v"].sum()) if len(cnt) else 0
    return raw


def unique_fp64(tbl: pa.Table) -> "np.ndarray":
    """Shared assemble_blocks finalize: unique-sorted int64 ``fp64``
    column — the broadcast probe array of every fingerprint-membership
    filter (snapshot dedup, index extend). Module-level for foreign-cwd
    driver picklability (see assemble_blocks)."""
    return np.unique(tbl.column("fp64").to_numpy(zero_copy_only=False))


def assemble_blocks(ds, columns: list[str], finalize, empty):
    """One in-cluster Ray task concatenates ``columns`` of ``ds``'s
    (materialized) blocks and returns ``finalize(table)`` — the shared
    plasma-broadcast lookup-assembly pattern (the labels-attach design
    from pipelines/dedup.py): downstream tasks ``ray.get`` the returned
    ref as a zero-copy plasma read and the driver never touches a row.

    Blocks with no rows or missing columns (schema-less empty blocks are
    routine after map_groups) are dropped; when nothing remains the task
    returns ``empty`` — callers pick their own sentinel so probe sites
    fail loudly or short-circuit explicitly, never on a shape mismatch.

    ``finalize`` must be picklable (module-level function or a closure
    over module-level refs — never containing a function-local
    ``from sick_ray...`` import, which breaks under a foreign-cwd driver).
    Returns the ObjectRef of the finalized lookup."""
    import ray

    def body(*blocks):
        good = [b for b in blocks if b.num_rows
                and all(c in b.column_names for c in columns)]
        if not good:
            return empty
        return finalize(pa.concat_tables([b.select(columns) for b in good]))

    return ray.remote(num_cpus=1)(body).remote(*ds.to_arrow_refs())
