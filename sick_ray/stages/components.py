"""Stage 2c — connected components over candidate edges.

Cluster id = min fp64 of the component's members: content-addressed and
therefore stable across runs, partitionings and cluster sizes — the
distribution-safe analogue of the reference's dense insertion-ordered
indexes (``DeduplicatingRefTableBuilder.scala:36-42`` assigns indexes in
insertion order, which only works single-process).

Two execution paths:

- **driver fold** (edges below ``cfg.driver_uf_max_edges``): stream edge
  batches to the driver (`iter_batches`, narrow uint64 pairs) and fold them
  into a union-find with path-halving + min-root union. The fold is
  order-independent, so Ray's unordered blocks are safe.
- **sharded actors** (scale path): K ``UFShard`` actors, each unioning the
  edges routed to ``shard = min(u, v) % K``; every shard then emits its
  contracted ``(node, local_root)`` mapping, and the driver folds only the
  contracted pairs (one per distinct node per shard — far smaller than the
  edge list when clusters are large). This is the two-level contraction
  pattern from distributed union-find literature (BTS, ICDE 2024 — see
  PAPERS.md); actors hold only state re-buildable from the edges table, so
  a lost actor is repopulated by replaying its shard's edges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


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


def _uf_shard_cls():
    import ray

    @ray.remote(num_cpus=1)
    class UFShard:
        def __init__(self):
            self.uf = UnionFind()

        def add_edges(self, us: np.ndarray, vs: np.ndarray) -> int:
            self.uf.add_pairs(us, vs)
            return len(us)

        def contracted(self):
            return self.uf.labels()

    return UFShard


def connected_components(edges_ds, cfg) -> pa.Table:
    """Edges Dataset (u, v) → labels Table (fp64, cluster_id). Only nodes
    that appear in at least one edge are labeled; singletons keep their own
    fp64 as cluster id downstream."""
    n_edges = edges_ds.count()
    if n_edges <= cfg.driver_uf_max_edges:
        uf = UnionFind()
        for batch in edges_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            uf.add_pairs(
                batch.column("u").to_numpy(zero_copy_only=False),
                batch.column("v").to_numpy(zero_copy_only=False),
            )
        nodes, roots = uf.labels()
    else:
        import ray

        K = cfg.uf_shards
        Shard = _uf_shard_cls()
        shards = [Shard.remote() for _ in range(K)]
        pending = []
        for batch in edges_ds.iter_batches(batch_size=262144, batch_format="pyarrow"):
            u = batch.column("u").to_numpy(zero_copy_only=False)
            v = batch.column("v").to_numpy(zero_copy_only=False)
            sh = np.minimum(u, v) % K  # numpy int64 mod is non-negative
            for k in range(K):
                m = sh == k
                if m.any():
                    pending.append(shards[k].add_edges.remote(u[m], v[m]))
            if len(pending) > 4 * K:          # backpressure
                ready, pending = ray.wait(pending, num_returns=len(pending) - 2 * K)
                pending = list(pending)
        ray.get(pending)
        uf = UnionFind()                       # fold contracted mappings
        for nodes_k, roots_k in ray.get([s.contracted.remote() for s in shards]):
            uf.add_pairs(nodes_k, roots_k)
        for s in shards:
            ray.kill(s)
        nodes, roots = uf.labels()
    return pa.table(
        {
            "fp64": pa.array(nodes, type=pa.int64()),
            "cluster_id": pa.array(roots, type=pa.int64()),
        }
    )
