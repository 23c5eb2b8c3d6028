"""Dump the hyperplane-LSH planes for the embedding_near_dup query config
to a golden parquet so DuckDB can recompute the engine's bucket semantics.

The planes are DETERMINISTIC config, not data: ``HyperplaneHasher``
derives them from ``default_rng(cfg.seed + 0xA11)`` alone, so this
golden is scale-independent (unlike the spans goldens) — the oracle SQL
recomputes buckets + exact cosine from the raw embeddings table at ANY
sf. Regenerate only if AnnConfig seed / the query's (n_planes, n_tables)
/ the embedding dim change.

Layout: one row per (t, j, i) = (table, plane, 1-based dim) with the
float64 weight ``w`` — 1-based ``i`` to match DuckDB
``generate_subscripts(list, 1)``.
"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sick_ray.config import AnnConfig
from sick_ray.stages.ann import HyperplaneHasher

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "lsh_planes_t16_p4_d64.parquet")


def main() -> None:
    cfg = AnnConfig(n_planes=4, n_tables=16)   # q_embedding_near_dup's config
    dim = 64                                    # embeddings table width
    h = HyperplaneHasher(dim, cfg)
    T, P, D = h.planes.shape
    t = np.repeat(np.arange(T, dtype=np.int32), P * D)
    j = np.tile(np.repeat(np.arange(P, dtype=np.int32), D), T)
    i = np.tile(np.arange(1, D + 1, dtype=np.int32), T * P)
    tbl = pa.table({
        "t": pa.array(t), "j": pa.array(j), "i": pa.array(i),
        "w": pa.array(h.planes.reshape(-1), type=pa.float64()),
    })
    pq.write_table(tbl, os.path.abspath(OUT))
    print(f"wrote {tbl.num_rows} plane weights -> {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
