"""CLI entry — the `ray job submit` surface.

    python -m sick_ray.pipelines <input_parquet> <out_dir> \
        [--spans] [--num-cpus N] [--partitions P]

Runs the 3-stage dedup pipeline with checkpoint manifests under
``out_dir`` (resume: re-running with the same input+config skips completed
stages), writes clusters/fingerprints/spans parquet + manifests, and
prints a one-line JSON summary. On a real cluster, submit with
``ray job submit -- python -m sick_ray.pipelines s3://... /out`` — the
code is identical; only ray.init's target changes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    os.environ.setdefault("MALLOC_MMAP_MAX_", "0")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    p = argparse.ArgumentParser(prog="sick_ray.pipelines")
    p.add_argument("input", help="input webtext parquet file/dir")
    p.add_argument("out_dir", help="checkpoint + output directory")
    p.add_argument("--spans", action="store_true", help="also run substring dedup")
    p.add_argument(
        "--curate", action="store_true",
        help="run the curation composition instead of dedup: Gopher "
             "repetition filter → PII redaction → chunk-level exact dedup; "
             "input needs an int64 id column (--id-col) and a text column",
    )
    p.add_argument("--id-col", default="doc_id",
                   help="int64 id column for --curate (default doc_id)")
    p.add_argument(
        "--build-index", action="store_true",
        help="freeze the input corpus into a persistent MinHash/LSH dedup "
             "index under out_dir (signatures + band buckets + manifest) "
             "instead of running the pipeline",
    )
    p.add_argument(
        "--probe-index", metavar="INDEX_DIR", default=None,
        help="probe the input (a NEW crawl) against a frozen index; "
             "verified near-dup pairs go to out_dir/near_dup_pairs",
    )
    p.add_argument(
        "--extend-index", action="store_true",
        help="after probing (or standalone with out_dir = index dir), "
             "merge the input snapshot into the index so the next crawl "
             "probes old+new",
    )
    p.add_argument(
        "--query", metavar="NAME", default=None,
        help="run a single operator from the query surface over the "
             "table directory given as `input` (any pipelines.queries "
             "QUERIES key; result parquet → out_dir/NAME). Makes every "
             "operator reachable via `ray job submit`.",
    )
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--partitions", type=int, default=64)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.dedup import run_dedup, run_full

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    cfg = DedupConfig(
        minhash_concurrency=max(2, ncpu // 2),
        num_partitions=args.partitions,
    )

    # live per-stage progress (CacheSaturation analogue): a daemon thread
    # polls the named counter actor and prints a line to stderr WHILE
    # stages run — the stdout JSON summary stays machine-readable
    import threading

    from sick_ray.state import progress

    progress.ensure_actor()
    stop_poll = threading.Event()

    def _poll():
        last = ""
        while not stop_poll.wait(2.0):
            rows, totals = progress.snapshot()
            if rows:
                line = progress.format_line(rows, totals)
                if line != last:
                    print(line, file=sys.stderr, flush=True)
                    last = line

    threading.Thread(target=_poll, daemon=True).start()
    t0 = time.time()
    if args.query:
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from sick_ray.pipelines.queries import QUERIES

        if args.query not in QUERIES:
            print(json.dumps({"error": f"unknown query {args.query!r}",
                              "available": sorted(QUERIES)}))
            return 2
        res = QUERIES[args.query](args.input)
        if isinstance(res, pd.DataFrame):
            res = rd.from_pandas(res)
        elif isinstance(res, pa.Table):
            res = rd.from_arrow(res)
        res = res.materialize()
        from sick_ray.sources.readers import replace_parquet

        out = os.path.join(args.out_dir, args.query)
        replace_parquet(res, out)
        stop_poll.set()
        print(json.dumps({"query": args.query, "n_rows": res.count(),
                          "out": out,
                          "wall_sec": round(time.time() - t0, 2)}))
        ray.shutdown()
        return 0
    if args.build_index or args.probe_index or args.extend_index:
        # incremental cross-snapshot workflow (stages/index.py): freeze a
        # corpus once, probe later crawls against it without re-reading
        # it, then merge the probed snapshot in for the next cycle
        import ray.data as rd

        from sick_ray.stages.index import (
            build_dedup_index,
            extend_dedup_index,
            probe_dedup_index,
            snapshot_sigs,
        )

        docs = rd.read_parquet(args.input)
        if args.build_index:
            man = build_dedup_index(docs, args.out_dir, cfg)
            summary = {**man, "wall_sec": round(time.time() - t0, 2)}
        else:
            idx_dir = args.probe_index or args.out_dir
            summary = {}
            # one MinHash pass shared by probe AND extend
            sigs = snapshot_sigs(docs, cfg)
            if args.probe_index:
                counters: dict = {}
                pairs = probe_dedup_index(docs, idx_dir, cfg,
                                          counters=counters,
                                          new_sigs=sigs).materialize()
                from sick_ray.sources.readers import replace_parquet

                replace_parquet(pairs,
                                os.path.join(args.out_dir, "near_dup_pairs"))
                summary = {"n_pairs": pairs.count(), **counters}
            if args.extend_index:
                summary.update(
                    extend_dedup_index(docs, idx_dir, cfg, new_sigs=sigs))
            summary["wall_sec"] = round(time.time() - t0, 2)
        stop_poll.set()
        print(json.dumps(summary))
        ray.shutdown()
        return 0
    if args.curate:
        # curation composition (no checkpointed stages — one streaming
        # chain; the manifest records the finished output for skip-if-done
        # orchestration at a higher level)
        import pyarrow.compute as pc
        import ray.data as rd

        from sick_ray.functions.curate import (
            add_repetition_stats,
            chunk_dedup,
            redact_pii,
        )

        docs = rd.read_parquet(args.input, columns=[args.id_col, "text"])

        def gopher_filter(b):
            stats = add_repetition_stats(
                b.rename_columns([  # kernel expects doc_id naming
                    "doc_id" if c == args.id_col else c
                    for c in b.column_names
                ])
            )
            return b.filter(pc.equal(stats.column("gopher_keep"), 1))

        def redacted_to_text(b):
            import pyarrow as pa

            return pa.table({args.id_col: b.column(args.id_col),
                             "text": b.column("redacted")})

        chain = (
            docs.map_batches(gopher_filter, batch_format="pyarrow")
            .map_batches(redact_pii, batch_format="pyarrow")
            .map_batches(redacted_to_text, batch_format="pyarrow")
        )
        curated = chunk_dedup(chain, id_col=args.id_col,
                              num_partitions=args.partitions).materialize()
        out = os.path.join(args.out_dir, "curated")
        os.makedirs(out, exist_ok=True)
        # clear the stale MANIFEST first, then stale parts: if this run
        # crashes between the unlinks and commit_manifest, the directory
        # must read as INCOMPLETE — a surviving old manifest over a
        # destroyed part set would satisfy skip-if-done checks with empty
        # data (the constant 'cli' input_fp encodes nothing to catch it)
        mpath = os.path.join(out, "_MANIFEST.json")
        if os.path.exists(mpath):
            os.unlink(mpath)
        from sick_ray.sources.readers import replace_parquet

        replace_parquet(curated, out)
        from ray.data.aggregate import Sum

        from sick_ray.state.manifest import commit_manifest

        commit_manifest(out, "curated", "cli")
        # Sum over an empty dataset yields None — an all-filtered input
        # must still print the JSON summary, not TypeError
        agg = curated.aggregate(Sum("n_chunks"), Sum("n_kept")) or {}
        summary = {
            "n_docs_in": docs.count(),
            "n_docs_kept": curated.count(),
            "n_chunks": int(agg.get("sum(n_chunks)") or 0),
            "n_chunks_kept": int(agg.get("sum(n_kept)") or 0),
            "wall_sec": round(time.time() - t0, 2),
        }
        stop_poll.set()
        print(json.dumps(summary))
        ray.shutdown()
        return 0
    if args.spans:
        # near-dup and substring-spans branches overlap after the exact
        # phase (two concurrent streaming executions — see run_full)
        full = run_full(args.input, cfg, out_dir=args.out_dir)
        res = full.dedup
        n = full.timings["n_cluster_rows"]
    else:
        res = run_dedup(args.input, cfg, out_dir=args.out_dir)
        n = res.clusters.count()
    summary = {
        "n_docs": res.n_docs,
        "n_canonical": res.n_canonical,
        "n_edges": res.n_edges,
        "n_clusters_rows": n,
        "resumed_stages": [e["stage"] for e in res.runner_log if e.get("resumed")],
        "wall_sec": round(time.time() - t0, 2),
    }
    if args.spans:
        spans_dir = os.path.join(args.out_dir, "spans")
        os.makedirs(spans_dir, exist_ok=True)
        full.spans.write_parquet(spans_dir)
        from sick_ray.state.manifest import commit_manifest

        commit_manifest(spans_dir, "spans", "cli")
        summary["n_spans"] = full.n_spans
        summary["branch_timings"] = full.timings
    stop_poll.set()
    rows, totals = progress.snapshot()
    if rows:
        print(progress.format_line(rows, totals), file=sys.stderr, flush=True)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
