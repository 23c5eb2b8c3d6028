"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

No function here (nor anything they call) invokes ray.init/shutdown —
the driver owns the Ray session.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The driver owns the Ray session and may have initialised it from a cwd
# where `sick_ray` is not importable — Ray workers only inherit the driver's
# CWD on sys.path, not its sys.path. Registering the package for by-value
# cloudpickle serialization makes every map function / actor class
# self-contained: workers never need to import `sick_ray` at all (all
# sick_ray-internal imports are module-level, so the pickled closures carry
# their dependencies).
import sick_ray  # noqa: E402


def _register_by_value() -> None:
    import importlib
    import pkgutil

    from ray import cloudpickle

    cloudpickle.register_pickle_by_value(sick_ray)
    for m in pkgutil.walk_packages(sick_ray.__path__, prefix="sick_ray."):
        cloudpickle.register_pickle_by_value(importlib.import_module(m.name))


_register_by_value()


def entry() -> Any:
    """Flagship 3-stage dedup pipeline over the sf0.001 documents corpus
    (adapted to the webtext shape). Returns the clusters Dataset
    (url, warc_ts, cluster_id:uint64, is_canonical:bool)."""
    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.dedup import run_dedup
    from sick_ray.pipelines.queries import _docs_as_webtext

    cfg = DedupConfig(num_partitions=8, minhash_concurrency=2)
    res = run_dedup(_docs_as_webtext("/root/testdata/sf0.001"), cfg)
    return res.clusters


def queries() -> dict[str, Callable[[str], Any]]:
    from sick_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sick_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
