"""10x-regime headline bench (VERDICT r3 item 8): the full 3-stage dedup
pipeline at 8,000,000 synthetic webtext docs — 10x the 800k scaling
regime — at 8 and 32 CPUs, one fresh process per level, reporting
per-stage wall, object-store spill bytes, and the fixed-cost share
relative to the 800k regime.

Usage:
    python scripts/bench_10x.py                    # parent: both levels
    python scripts/bench_10x.py --child NCPU NDOCS # one measured run

The parent writes BENCH/scaling_r4_8m.json. Corpus generation is cached
under /tmp/sick_ray_synth (one-time ~tens of minutes at 8M).
"""

import json
import os
import shutil
import subprocess
import sys
import time

os.environ.setdefault("MALLOC_MMAP_MAX_", "0")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("GRAFT_10X_DOCS", 8_000_000))
# data-layout: 10x the docs of the 800k regime (num_partitions=64) at a
# constant-ish per-partition size -> 10x the partitions, rounded to 512
N_PARTITIONS = int(os.environ.get("GRAFT_10X_PARTITIONS", 512))


def spill_stats() -> dict:
    """Object-store spill counters — parsed from the session's
    debug_state.txt (refreshed periodically by the raylet) plus the last
    raylet.out spill message; memory_summary() needs grpc, absent here."""
    out = {}
    try:
        import ray

        sdir = ray._private.worker.global_worker.node.get_session_dir_path()
        dbg = os.path.join(sdir, "logs", "debug_state.txt")
        wanted = ("num bytes currently spilled", "cumulative spill requests",
                  "cumulative restore requests", "num bytes pending spill")
        with open(dbg, errors="ignore") as f:
            for line in f:
                ls = line.strip().lstrip("- ")
                for w in wanted:
                    if ls.startswith(w):
                        out[w.replace(" ", "_")] = int(ls.split(":")[1])
        raylet = os.path.join(sdir, "logs", "raylet.out")
        last = None
        if os.path.exists(raylet):
            with open(raylet, errors="ignore") as f:
                for line in f:
                    if "Spilled " in line:
                        last = line.strip()
        if last:
            out["raylet_last_spill"] = last[-220:]
    except Exception as ex:  # stats are best-effort diagnostics
        out["error"] = repr(ex)[:200]
    return out


def child(ncpu: int, n_docs: int, temp_dir: str | None = None) -> None:
    import ray
    import ray.data as rd
    from ray.data import DataContext

    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.dedup import run_full
    from sick_ray.synth import materialize_corpus

    corpus_dir = materialize_corpus(n_docs, seed=42)
    web_path = os.path.join(corpus_dir, "webtext.parquet")

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR", _temp_dir=temp_dir)
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    # warm-up (untimed): spawn the worker pool + page-cache the parquet
    rd.read_parquet(web_path).map_batches(
        lambda b: b.select([b.column_names[0]]), batch_format="pyarrow"
    ).materialize()

    cfg = DedupConfig(
        minhash_concurrency=max(2, ncpu // 2),
        num_partitions=N_PARTITIONS,
        serial_branches=os.environ.get("GRAFT_10X_SERIAL") == "1",
    )
    near_only = os.environ.get("GRAFT_10X_NEAR_ONLY") == "1"
    t0 = time.time()
    if near_only:
        # dedup phase only (exact + LSH + components + attach): the
        # regime for spill quotas that cannot hold the overlapped spans
        # branch's text volume on top — still exercises every edge-path
        # change (prepass, fused verify, distinct, components tiers)
        from sick_ray.pipelines.dedup import run_dedup

        class _FullShim:   # reuse the reporting below
            pass

        dres = run_dedup(web_path, cfg)
        n_cluster_rows = dres.clusters.count()
        full = _FullShim()
        full.dedup = dres
        full.n_spans = -1
        full.timings = {"exact_sec": -1, "near_sec": -1,
                        "n_cluster_rows": n_cluster_rows,
                        "spans_sec": -1}
    else:
        full = run_full(web_path, cfg)
    wall = time.time() - t0

    # dup-pair recall vs the planted truth (north-rule >=0.99 at J>=0.9):
    # only the truth-pair urls' cluster rows leave the cluster (semi_select
    # broadcast), never the full 8M-row membership table
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sick_ray.shuffle import semi_select

    tp = pq.read_table(
        os.path.join(corpus_dir, "truth_pairs.parquet")).to_pandas()
    url_keys = pa.table({"url": pa.array(
        sorted(set(tp["src_url"]) | set(tp["dst_url"])))})
    cdf = semi_select(
        full.dedup.clusters, rd.from_arrow(url_keys), on="url",
        num_partitions=N_PARTITIONS,
    ).to_pandas()
    cmap = dict(zip(cdf["url"], cdf["cluster_id"]))
    strong = tp[tp["jaccard"] >= 0.9]
    hit = sum(cmap.get(r.src_url) == cmap.get(r.dst_url)
              and cmap.get(r.src_url) is not None
              for r in strong.itertuples())
    recall = hit / max(1, len(strong))

    print(json.dumps({
        "num_cpus": ncpu,
        "mode": "near_only" if near_only else "full",
        "n_docs": n_docs,
        "num_partitions": N_PARTITIONS,
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "exact_sec": round(full.timings["exact_sec"], 1),
        "near_sec": round(full.timings["near_sec"], 1),
        "near_walls": full.timings.get("near_walls", {}),
        "spans_sec": round(full.timings["spans_sec"], 1),
        "spans_walls": full.timings.get("spans_walls", {}),
        "n_edges": full.dedup.n_edges,
        "n_canonical": full.dedup.n_canonical,
        "n_cluster_rows": full.timings["n_cluster_rows"],
        "n_spans": full.n_spans,
        "recall_j09": round(recall, 5),
        "n_truth_pairs_j09": int(len(strong)),
        "spill": spill_stats(),
    }))
    ray.shutdown()


def parent() -> None:
    # generate/cache in a throwaway process so generation memory churn
    # never pollutes the measured sessions
    subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "from sick_ray.synth import materialize_corpus; "
         "materialize_corpus(%d, seed=42)" % (REPO, N_DOCS)],
        check=True,
    )
    runs = {}
    for ncpu in (8, 32):
        # each child gets its own Ray temp root so (a) stale spill files
        # from the previous level never eat this level's disk headroom
        # (measured: 27 GB of stale spill pushed the whash sort over the
        # 95% disk ceiling -> OutOfDiskError) and (b) we never touch the
        # machine-global /tmp/ray, which may belong to a live session of
        # another process
        temp_dir = f"/tmp/sick_ray_bench10x_ray_{ncpu}"
        shutil.rmtree(temp_dir, ignore_errors=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(ncpu), str(N_DOCS), temp_dir],
            capture_output=True, text=True,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise RuntimeError(f"child at {ncpu} cpus exited {proc.returncode}")
        runs[ncpu] = json.loads(proc.stdout.strip().splitlines()[-1])
        print(json.dumps(runs[ncpu]), flush=True)
        shutil.rmtree(temp_dir, ignore_errors=True)  # free spill disk

    eff_8_32 = (runs[8]["wall_sec"] / runs[32]["wall_sec"]) / 4
    out = {
        "metric": "10x-regime headline (8M docs, fresh processes)",
        "runs": {str(k): v for k, v in runs.items()},
        "scaling_efficiency_8_32": round(eff_8_32, 3),
    }
    dst = os.path.join(
        REPO, "BENCH", os.environ.get("GRAFT_10X_OUT", "scaling_r5_8m.json"))
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(
            int(sys.argv[i + 1]),
            int(sys.argv[i + 2]),
            sys.argv[i + 3] if len(sys.argv) > i + 3 else None,
        )
    else:
        parent()
