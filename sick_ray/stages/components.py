"""Stage 2c — connected components over candidate edges.

Cluster id = min fp64 of the component's members: content-addressed and
therefore stable across runs, partitionings and cluster sizes — the
distribution-safe analogue of the reference's dense insertion-ordered
indexes (``DeduplicatingRefTableBuilder.scala:36-42`` assigns indexes in
insertion order, which only works single-process).

Two execution paths, both returning a ``Dataset`` of (fp64, cluster_id):

- **driver fold** (edges below ``cfg.driver_uf_max_edges``): stream edge
  batches to the driver (`iter_batches`, narrow int64 pairs) and fold them
  into a union-find with path-halving + min-root union. The fold is
  order-independent, so Ray's unordered blocks are safe. Fast, but driver
  memory is O(duplicate nodes) — only used under the configured bound.
- **alternating star rounds** (scale path): the Kiveris et al. 2014
  ("Connected Components in MapReduce and Beyond", see PAPERS.md)
  large-star/small-star algorithm expressed as grouped_apply shuffles over
  the edges Dataset. Each round is two hash-partitioned vectorized passes;
  the edge list monotonically contracts toward a star forest
  (member → component-min) in O(log² n) rounds. NO per-node state ever
  lands on the driver — per round the driver sees only an (edge-count,
  checksum) pair for the fixpoint test. This is the path a 10¹²-doc run
  takes; every message is a 16-byte (u, v) row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sick_ray.shuffle import U64, first_mask, grouped_apply, mix64, sort_index

_POLY = U64(0x9E3779B185EBCA87)

EMPTY_EDGES = pa.table(
    {"u": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64())}
)

# hard safety bound; alternating-star converges in O(log² n) rounds
# (~≤40 even at 2^64 nodes), so hitting this indicates a bug, not scale
MAX_STAR_ROUNDS = 64

# target bytes per star-round shuffle partition. The edge table is 16 B/row
# and usually ORDERS OF MAGNITUDE smaller than the corpus the pipeline's
# num_partitions was sized for (8M docs → 512 corpus partitions but only
# ~283 MB of edges); running ~20 round-shuffles at 512 partitions each is
# pure scheduling overhead (measured: components 223 s of the 8M/32-CPU
# near phase). Sizing rounds by edge bytes keeps partitions dense; at
# 10^12-edge scale the cap cfg.num_partitions still applies.
STAR_PARTITION_BYTES = 64 << 20


def star_partitions(n_edges: int, cfg) -> int:
    """Edge-count-aware partition count for the star-round shuffles."""
    want = (n_edges * 16) // STAR_PARTITION_BYTES + 1
    return int(min(cfg.num_partitions, max(8, want)))


class UnionFind:
    """Min-root union-find over int64 node ids (python ints internally)."""

    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        r = p.get(x, x)
        while r != p.get(r, r):
            p[r] = p.get(p[r], p[r])  # path halving
            r = p[r]
        if r != x:
            p[x] = r
        return r

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra  # attach larger root under smaller → min root

    def add_pairs(self, us: np.ndarray, vs: np.ndarray) -> None:
        for a, b in zip(us.tolist(), vs.tolist()):
            self.union(a, b)

    def labels(self) -> tuple[np.ndarray, np.ndarray]:
        nodes = list(self.parent.keys())
        roots = [self.find(n) for n in nodes]
        return (
            np.array(nodes, dtype=np.int64),
            np.array(roots, dtype=np.int64),
        )


# ----------------------------------------------------- alternating star path

def _dedup_pairs(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Drop duplicate (u, v) rows — keeps shuffle volume minimal."""
    if len(u) == 0:
        return u, v
    order = sort_index(u, v)
    us, vs = u[order], v[order]
    keep = np.ones(len(us), dtype=bool)
    keep[1:] = (us[1:] != us[:-1]) | (vs[1:] != vs[:-1])
    return us[keep], vs[keep]


def _pairs_table(u: np.ndarray, v: np.ndarray) -> pa.Table:
    return pa.table(
        {"u": pa.array(u, type=pa.int64()), "v": pa.array(v, type=pa.int64())}
    )


def _emit_both_directions(batch: pa.Table) -> pa.Table:
    """Map-side prep for large-star: each undirected edge as (u,v) and
    (v,u), deduped within the batch."""
    u = batch.column("u").to_numpy(zero_copy_only=False)
    v = batch.column("v").to_numpy(zero_copy_only=False)
    uu = np.concatenate([u, v])
    vv = np.concatenate([v, u])
    keep = uu != vv
    return _pairs_table(*_dedup_pairs(uu[keep], vv[keep]))


def _large_star_partition(part: pa.Table) -> pa.Table:
    """All groups of one hash partition at once: for every node u with
    neighborhood N(u), m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u),
    v > u. Strictly-greater neighbors re-hang under the local min."""
    if part.num_rows == 0:
        return EMPTY_EDGES
    u = part.column("u").to_numpy(zero_copy_only=False)
    v = part.column("v").to_numpy(zero_copy_only=False)
    order = sort_index(u, v)
    us, vs = u[order], v[order]
    fm = first_mask(us)
    gid = np.cumsum(fm) - 1
    m = np.minimum(vs[fm], us[fm])        # min over (sorted) N(u) ∪ {u}
    sel = vs > us
    return _pairs_table(*_dedup_pairs(vs[sel], m[gid[sel]]))


def _orient_max_min(batch: pa.Table) -> pa.Table:
    """Map-side prep for small-star: orient every edge (max, min)."""
    u = batch.column("u").to_numpy(zero_copy_only=False)
    v = batch.column("v").to_numpy(zero_copy_only=False)
    hi = np.maximum(u, v)
    lo = np.minimum(u, v)
    keep = hi != lo
    return _pairs_table(*_dedup_pairs(hi[keep], lo[keep]))


def _small_star_partition(part: pa.Table) -> pa.Table:
    """Input rows oriented (u=max, v=min): per node u, m = min neighbor;
    emit (v, m) for each lesser neighbor v ≠ m plus (u, m)."""
    if part.num_rows == 0:
        return EMPTY_EDGES
    u = part.column("u").to_numpy(zero_copy_only=False)
    v = part.column("v").to_numpy(zero_copy_only=False)
    order = sort_index(u, v)
    us, vs = u[order], v[order]
    fm = first_mask(us)
    gid = np.cumsum(fm) - 1
    m = vs[fm]                            # min neighbor (all neighbors < u)
    mg = m[gid]
    sel = vs != mg                        # lesser neighbors re-hang under m
    out_u = np.concatenate([vs[sel], us[fm]])
    out_v = np.concatenate([mg[sel], m])
    return _pairs_table(*_dedup_pairs(out_u, out_v))


def _stats_partial(batch: pa.Table) -> pa.Table:
    """One (n, acc) row per block: count + order-independent checksum
    partial, computed where the block lives. The per-edge hash sum is
    commutative, so folding block partials in any order gives the same
    result as a single pass."""
    u = batch.column("u").to_numpy(zero_copy_only=False).view(U64)
    v = batch.column("v").to_numpy(zero_copy_only=False).view(U64)
    with np.errstate(over="ignore"):
        acc = mix64(u * _POLY + v).sum(dtype=U64)
    return pa.table(
        {
            "n": pa.array([len(u)], type=pa.int64()),
            "acc": pa.array([int(acc)], type=pa.uint64()),
        }
    )


def _edge_stats(edges_ds) -> tuple[int, int]:
    """(count, order-independent checksum) for the fixpoint test.

    Distributed: each block emits a single (n, acc) partial via
    ``map_batches`` and only those O(blocks) 16-byte rows reach the driver
    — never the edge table itself (at 10^12 edges the full table is
    terabytes/round; the partials are kilobytes)."""
    parts = edges_ds.map_batches(
        _stats_partial, batch_format="pyarrow", batch_size=None
    )
    n = 0
    acc = U64(0)
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        n += int(np.sum(b.column("n").to_numpy(zero_copy_only=False)))
        with np.errstate(over="ignore"):
            acc += b.column("acc").to_numpy(zero_copy_only=False).sum(dtype=U64)
    return n, int(acc)


def star_components(edges_ds, cfg, n_edges_hint: int | None = None):
    """Distributed alternating-star connected components. Returns a Dataset
    (fp64, cluster_id) labeling every non-root node with its component min;
    roots (cluster_id == own fp64) are implicit, as are singletons."""
    n_parts = (star_partitions(n_edges_hint, cfg)
               if n_edges_hint is not None else cfg.num_partitions)
    cur = edges_ds
    prev_stats = None
    for _ in range(MAX_STAR_ROUNDS):
        # staged, not fused: chaining the large-star sort into the
        # small-star sort in one streaming execution splits the CPU pool
        # across the chain (same pathology measured in the spans stage:
        # fused two-sort DAG ran 2.9x slower than staged at 8 CPUs and
        # its CPU-scaling collapsed). The round's edge table is narrow —
        # the extra materialize is one plasma write.
        ls = grouped_apply(
            cur.map_batches(_emit_both_directions, batch_format="pyarrow", batch_size=None),
            ["u"],
            _large_star_partition,
            num_partitions=n_parts,
        ).materialize()
        ss = grouped_apply(
            ls.map_batches(_orient_max_min, batch_format="pyarrow", batch_size=None),
            ["u"],
            _small_star_partition,
            num_partitions=n_parts,
        ).materialize()
        stats = _edge_stats(ss)
        cur = ss
        if stats == prev_stats:
            break
        prev_stats = stats
    else:
        raise RuntimeError("alternating-star failed to converge (bug)")
    # fixpoint: every edge is (member, component-min)
    return cur.map_batches(
        lambda b: pa.table({"fp64": b.column("u"), "cluster_id": b.column("v")}),
        batch_format="pyarrow",
        batch_size=None,
    )


# middle tier: up to this many edges the whole graph is labeled by ONE
# vectorized remote task (~16 B/edge + ~3 int64 arrays over unique nodes —
# ≤ a few GB task heap at the bound). ~20 star-round shuffles on a
# few-hundred-MB table are pure scheduling overhead (measured: 180 s of
# the 8M/32-CPU near phase for 283 MB of edges vs seconds in one task);
# the alternating-star path takes over beyond the bound, where the edge
# table genuinely exceeds a single worker.
SINGLE_TASK_CC_MAX_EDGES = 64_000_000


def _cc_label_kernel(u: np.ndarray, v: np.ndarray):
    """Vectorized min-label propagation + pointer jumping to fixpoint.

    Invariant: label[i] is always the index (into the sorted unique node
    array) of a node in i's component, monotonically non-increasing and
    bounded by the component-min index — so the fixpoint IS the
    component min (same cluster-id convention as the star and driver
    paths). O(E) numpy work per round, O(log n) rounds."""
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui = inv[: len(u)].astype(np.int64)
    vi = inv[len(u):].astype(np.int64)
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = label
        m = np.minimum(label[ui], label[vi])
        label = label.copy()
        np.minimum.at(label, ui, m)
        np.minimum.at(label, vi, m)
        label = np.minimum(label, label[label])     # pointer jumping
        if np.array_equal(label, before):
            break
    roots = nodes[label]
    keep = roots != nodes                           # roots implicit
    return nodes[keep], roots[keep]


def single_task_components(edges_ds):
    """Label the whole edge graph in one cluster-side Ray task reading the
    edges Dataset's own block refs (zero driver traffic)."""
    import ray
    import ray.data as rd

    @ray.remote(num_cpus=2)
    def cc_task(*blocks):
        good = [b for b in blocks if b.num_rows and "u" in b.column_names]
        if not good:
            return pa.table({"fp64": pa.array([], type=pa.int64()),
                             "cluster_id": pa.array([], type=pa.int64())})
        u = np.concatenate(
            [b.column("u").to_numpy(zero_copy_only=False) for b in good])
        v = np.concatenate(
            [b.column("v").to_numpy(zero_copy_only=False) for b in good])
        nodes, roots = _cc_label_kernel(u, v)
        return pa.table({"fp64": pa.array(nodes, type=pa.int64()),
                         "cluster_id": pa.array(roots, type=pa.int64())})

    return rd.from_arrow_refs([cc_task.remote(*edges_ds.to_arrow_refs())])


def connected_components(edges_ds, cfg):
    """Edges Dataset (u, v) → labels Dataset (fp64, cluster_id). Only nodes
    that appear in at least one edge are labeled (roots label themselves —
    emitted explicitly by the driver path, implicitly absent from the star
    path; downstream treats missing as cluster_id = own fp64).

    Three tiers by edge count: driver union-find (tiny), one vectorized
    remote task (fits a worker heap — SINGLE_TASK_CC_MAX_EDGES), and the
    alternating-star shuffle rounds (the 10^12-edge scale path)."""
    import ray.data as rd

    n_edges = edges_ds.count()
    if n_edges > cfg.driver_uf_max_edges:
        bound = getattr(cfg, "single_task_cc_max_edges",
                        SINGLE_TASK_CC_MAX_EDGES)
        if n_edges <= bound:
            return single_task_components(edges_ds)
        return star_components(edges_ds, cfg, n_edges_hint=n_edges)
    uf = UnionFind()
    for batch in edges_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        uf.add_pairs(
            batch.column("u").to_numpy(zero_copy_only=False),
            batch.column("v").to_numpy(zero_copy_only=False),
        )
    nodes, roots = uf.labels()
    keep = nodes != roots                 # match star path: roots implicit
    return rd.from_arrow(
        pa.table(
            {
                "fp64": pa.array(nodes[keep], type=pa.int64()),
                "cluster_id": pa.array(roots[keep], type=pa.int64()),
            }
        )
    )
