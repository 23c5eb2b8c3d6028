"""End-to-end 3-stage dedup pipeline (SURVEY.md §3.4).

Data flow (no wide column ever enters a shuffle):

  read_parquet(webtext)
    → map_batches(extract)                 # html/text → canonical text
    → map_batches(add_fingerprints)        # + fp64 (xxh64), n_bytes
    → map_batches(MinHasher actor pool)    # + sig(128×u32) + band_hash(16×u64),
                                           #   text/html DROPPED here
  = meta (narrow derived table; the analogue of sick's per-type value
    tables) — checkpointed/materialized once, consumed by:
    (a) fingerprints output (url, fp64, n_bytes)
    (b) exact dedup: groupby(fp64) keep-first  → canonical
        → LSH banding → salted bucket groupby → star edges
        → signature verify → connected components → labels
    (c) cluster attach-back on fp64 + canonical flagging

Exact dups are minhashed too (vectorized, cheap) precisely so the full-text
column never needs to be shuffled — the only all-to-all exchanges move
~700 B/doc of derived state.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa
from sick_ray.shuffle import first_mask, grouped_apply, join_partitions

from sick_ray.config import DedupConfig
from sick_ray.extract import extract_batch
from sick_ray.stages.components import connected_components
from sick_ray.stages.exact import add_fingerprints, exact_dedup
from sick_ray.stages.lsh import (
    candidate_edges,
    distinct_edges,
    make_sig_lookup_ref,
    verify_edges_broadcast,
    verify_edges_join,
)
from sick_ray.stages.minhash import make_minhash_fn
from sick_ray.state.manifest import StageRunner, input_signature, stage_fingerprint
from sick_ray.state import progress

# above this many canonical docs the verify stage switches from a broadcast
# signature lookup to a two-sided hash join. The lookup is assembled by a
# Ray task from block refs and read zero-copy from plasma (driver never
# touches it), so the bound is per-NODE object store: ~520 B/doc → ~10 GB
# at this limit, comfortably inside a production node's store.
BROADCAST_SIG_LIMIT = 20_000_000

# above this many canonical docs the spans branch pins its semi-selected
# full-text corpus to zstd parquet (storage layer) instead of a plasma
# materialize — see spans_branch in run_full for the rationale
SPANS_PIN_PARQUET_DOCS = 1_000_000


@dataclasses.dataclass
class DedupResult:
    fingerprints: "object"   # Dataset (url, fp64, n_bytes)
    clusters: "object"       # Dataset (url, warc_ts, cluster_id, is_canonical)
    canonical: "object"      # Dataset, one meta row per distinct fp64
    labels: "object"         # Dataset (fp64, cluster_id), non-root dup nodes
    n_docs: int
    n_canonical: int
    n_edges: int
    runner_log: list


def _flag_canonical_partition(part: pa.Table) -> pa.Table:
    """Vectorized over all clusters of a hash partition: mark the min
    (warc_ts, url) member of each cluster canonical. The multi-key sort is
    Arrow's C++ kernel — url bytes never become Python objects."""
    import pyarrow.compute as pc

    n = part.num_rows
    if n == 0:
        return part.append_column("is_canonical", pa.array([], type=pa.bool_()))
    order = pc.sort_indices(
        part,
        sort_keys=[("cluster_id", "ascending"), ("warc_ts", "ascending"),
                   ("url", "ascending")],
    ).to_numpy(zero_copy_only=False)
    cid = part.column("cluster_id").to_numpy(zero_copy_only=False)
    flags = np.zeros(n, dtype=bool)
    flags[order[first_mask(cid[order])]] = True
    return part.append_column("is_canonical", pa.array(flags))


def _to_uint64(col):
    """Batch fn re-interpreting an int64 bit-view column as uint64 for the
    published schema (FIXTURES.md §3); applied only after all shuffles."""

    def f(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False).view(np.uint64)
        return batch.set_column(
            batch.schema.get_field_index(col), col, pa.array(vals, type=pa.uint64())
        )

    return f


def _prepare(input_ds, cfg, out_dir):
    import ray.data as rd

    cfg = cfg or DedupConfig()
    if isinstance(input_ds, str):
        # content identity (file list + sizes + mtimes), not just the path:
        # an edited input at the same path must invalidate checkpoints
        input_sig = input_signature(input_ds)
        input_ds = rd.read_parquet(input_ds)
    else:
        input_sig = f"<dataset:{id(input_ds)}>"
    runner = StageRunner(out_dir)
    cfg_fp = stage_fingerprint(dataclasses.asdict(cfg), input_sig)
    # live progress counters (CacheSaturation analogue) — advisory only.
    # Reset per RUN (blocking, so no stale rows race the first batch):
    # the named actor outlives a pipeline invocation, and without the
    # reset a second run in the same session reports >100% saturation.
    # Counters are per-session-singleton by design — two pipelines running
    # concurrently in one Ray session interleave their counts.
    try:
        import ray

        if ray.is_initialized():
            ray.get(progress.ensure_actor().reset.remote())
    except Exception:
        pass
    return input_ds, cfg, runner, cfg_fp


def _exact_phase(input_ds, cfg, runner, cfg_fp, out_dir):
    """Stage 1: extract → fingerprints → MinHash meta → exact dedup.
    Returns (meta, fingerprints, canonical, n_docs, n_canonical)."""

    def compute_meta():
        ds = input_ds.map_batches(
            progress.counted("extract", extract_batch), batch_format="pyarrow"
        )
        ds = ds.map_batches(add_fingerprints, batch_format="pyarrow")
        if not cfg.enable_near:     # exact-only mode (sick's dedup flags)
            return ds.map_batches(
                lambda b: b.drop_columns(
                    [c for c in ("text", "html") if c in b.column_names]
                ),
                batch_format="pyarrow",
            )
        # task-based with per-process cached state: worker processes are
        # reused across stages/passes (actors are respawned per execution
        # and repay the numpy warmup every time — see minhash._proc_cache),
        # and task parallelism scales with the CPU count instead of a
        # fixed pool size
        return ds.map_batches(
            progress.counted("minhash", make_minhash_fn(cfg)),
            batch_format="pyarrow", batch_size=cfg.batch_size,
        )

    meta = runner.run("meta", cfg_fp, compute_meta)
    if out_dir is None:
        meta = meta.materialize()

    n_docs = meta.count()
    # saturation denominators for the later stages (CacheSaturation ratio)
    progress.set_total("attach", n_docs)
    progress.set_total("minhash", n_docs)
    progress.set_total("extract", n_docs)

    canonical = runner.run("canonical", cfg_fp, lambda: exact_dedup(meta, cfg))
    if out_dir is None:
        canonical = canonical.materialize()
    n_canonical = canonical.count()
    # the FULL meta (sig 512 B/doc + band_hash 128 B/doc) exists only to
    # feed exact_dedup; everything downstream (fingerprints output,
    # cluster attach-back) needs four narrow columns (~100 B/doc). Swap
    # the standing plasma pin for the narrow projection and release the
    # wide table — at 16M docs that frees ~12 GB of object store /
    # spill the moment the exact phase ends (canonical keeps its own
    # sig copy for LSH + verification).
    meta_narrow = meta.select_columns(["url", "warc_ts", "fp64", "n_bytes"])
    if out_dir is None:
        meta_narrow = meta_narrow.materialize()
    fingerprints = meta_narrow.select_columns(["url", "fp64", "n_bytes"])
    del meta
    return meta_narrow, fingerprints, canonical, n_docs, n_canonical


def _near_phase(meta, canonical, n_canonical, cfg, runner, cfg_fp, out_dir,
                walls: dict | None = None):
    """Stage 2: LSH banding → verified edges → connected components →
    cluster attach-back. Returns (edges, labels, clusters, n_edges).
    ``walls``: optional dict filled with per-sub-stage wall seconds
    (bands/prepass/pairs from candidate_edges, distinct, components) —
    the 10×-regime profiling hook (bench_10x.py)."""
    import time as _time

    import ray
    import ray.data as rd

    walls = walls if walls is not None else {}
    edge_counters: dict = {}

    def compute_edges():
        if not cfg.enable_near:
            return rd.from_arrow(
                pa.table({"u": pa.array([], type=pa.int64()),
                          "v": pa.array([], type=pa.int64())})
            )
        sig_ds = canonical.select_columns(["fp64", "sig", "band_hash"])
        # broadcast regime: FUSE signature verification into pair emission
        # (candidate_edges verify_ref) so the distinct shuffle and the raw
        # pair materialization only ever carry verified pairs — one fewer
        # full pass over the edge table, same final set (verify∘distinct
        # commutes). Join regime keeps the staged order: the two-hash-join
        # verify needs the distinct table as its probe side.
        use_bcast = (cfg.verify == "signature"
                     and n_canonical <= BROADCAST_SIG_LIMIT)
        ref = (make_sig_lookup_ref(
                   canonical.select_columns(["fp64", "sig"]), cfg.num_perm)
               if use_bcast else None)
        edges = candidate_edges(
            sig_ds, cfg, counters=edge_counters,
            verify_ref=ref,
            verify_threshold=cfg.verify_threshold if use_bcast else None,
            walls=walls,
        )
        edges = distinct_edges(edges, cfg,
                               n_rows_hint=edge_counters.get("est_pairs"))
        if cfg.verify == "signature" and not use_bcast:
            edges = verify_edges_join(
                edges,
                canonical.select_columns(["fp64", "sig"]),
                cfg.verify_threshold,
                cfg.num_partitions,
            )
        return edges

    t = _time.time()
    edges = runner.run(
        "edges", cfg_fp, compute_edges, counters_fn=lambda: dict(edge_counters)
    )
    if out_dir is None:
        edges = edges.materialize()
    n_edges = edges.count()
    # distinct shuffle + (join-regime) verify: everything after the pair
    # materialization inside compute_edges
    walls["distinct_sec"] = round(
        _time.time() - t
        - sum(walls.get(k, 0) for k in ("bands_sec", "prepass_sec", "pairs_sec")),
        2,
    )

    t = _time.time()
    labels = connected_components(edges, cfg).materialize()
    walls["components_sec"] = round(_time.time() - t, 2)

    # ---- attach back: every url gets cluster_id = label(fp64) or own fp ----
    # Small/medium runs broadcast the label pairs as a sorted-array lookup
    # assembled by a Ray task from the labels Dataset's own block refs
    # (zero driver traffic, zero-copy plasma reads per task); above
    # BROADCAST_SIG_LIMIT canonical docs the attach is a distributed
    # left-outer hash join — no O(dup-nodes) structure anywhere central.
    narrow = meta.select_columns(["url", "warc_ts", "fp64"])
    if n_canonical <= BROADCAST_SIG_LIMIT:
        def assemble_labels(*blocks):
            # empty blocks can be schemaless — skip them
            blocks = [
                b for b in blocks if b.num_rows and "fp64" in b.column_names
            ]
            if not blocks:
                return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
            tbl = pa.concat_tables([b.select(["fp64", "cluster_id"]) for b in blocks])
            nodes = tbl.column("fp64").to_numpy(zero_copy_only=False)
            roots = tbl.column("cluster_id").to_numpy(zero_copy_only=False)
            order = np.argsort(nodes, kind="stable")
            return np.ascontiguousarray(nodes[order]), np.ascontiguousarray(roots[order])

        labels_ref = ray.remote(num_cpus=1)(assemble_labels).remote(
            *labels.to_arrow_refs()
        )

        def attach(batch: pa.Table) -> pa.Table:
            nodes_s, roots_s = ray.get(labels_ref)
            fp = batch.column("fp64").to_numpy(zero_copy_only=False)
            cid = fp.copy()
            if len(nodes_s):
                pos = np.searchsorted(nodes_s, fp)
                pos = np.clip(pos, 0, len(nodes_s) - 1)
                hit = nodes_s[pos] == fp
                cid[hit] = roots_s[pos[hit]]
            return pa.table(
                {
                    "url": batch.column("url"),
                    "warc_ts": batch.column("warc_ts"),
                    "cluster_id": pa.array(cid, type=pa.int64()),
                }
            )

        assigned = narrow.map_batches(
            progress.counted("attach", attach), batch_format="pyarrow"
        )
    else:
        joined = narrow.join(
            labels,
            join_type="left_outer",
            num_partitions=join_partitions(cfg.num_partitions),
            on=("fp64",),
            right_suffix="_lbl",
        )

        def finish(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            cid_col = next(
                c for c in batch.column_names if c.startswith("cluster_id")
            )
            cid = pc.coalesce(batch.column(cid_col), batch.column("fp64"))
            return pa.table(
                {
                    "url": batch.column("url"),
                    "warc_ts": batch.column("warc_ts"),
                    "cluster_id": cid.cast(pa.int64()),
                }
            )

        assigned = joined.map_batches(
            progress.counted("attach", finish), batch_format="pyarrow"
        )

    def compute_clusters():
        flagged = grouped_apply(
            assigned,
            ["cluster_id"],
            _flag_canonical_partition,
            num_partitions=cfg.num_partitions,
        )
        # warc_ts stays in the output: (url, warc_ts) is the corpus row key
        # (recrawls share a url — ADVICE r1), so downstream consumers can
        # select exactly the canonical ROW, not every row bearing its url
        out = flagged.select_columns(["url", "warc_ts", "cluster_id", "is_canonical"])
        # shuffles are done — re-interpret the int64 bit-views as uint64 for
        # the published schema (FIXTURES.md §3)
        return out.map_batches(_to_uint64("cluster_id"), batch_format="pyarrow")

    clusters = runner.run("clusters", cfg_fp, compute_clusters)
    return edges, labels, clusters, n_edges


def run_dedup(
    input_ds,
    cfg: DedupConfig | None = None,
    out_dir: str | None = None,
) -> DedupResult:
    """``input_ds``: Dataset or parquet path with the webtext schema
    (url, warc_ts, html, text, lang). ``out_dir``: enable checkpoint
    manifests + resume under this directory."""
    input_ds, cfg, runner, cfg_fp = _prepare(input_ds, cfg, out_dir)
    meta, fingerprints, canonical, n_docs, n_canonical = _exact_phase(
        input_ds, cfg, runner, cfg_fp, out_dir
    )
    _, labels, clusters, n_edges = _near_phase(
        meta, canonical, n_canonical, cfg, runner, cfg_fp, out_dir
    )
    fingerprints = fingerprints.map_batches(_to_uint64("fp64"), batch_format="pyarrow")
    return DedupResult(
        fingerprints=fingerprints,
        clusters=clusters,
        canonical=canonical,
        labels=labels,
        n_docs=n_docs,
        n_canonical=n_canonical,
        n_edges=n_edges,
        runner_log=runner.log,
    )


@dataclasses.dataclass
class FullResult:
    dedup: DedupResult
    spans: "object"          # materialized Dataset (url, start, end)
    n_spans: int
    timings: dict            # per-branch wall seconds


def run_full(
    input_ds,
    cfg: DedupConfig | None = None,
    out_dir: str | None = None,
    spans_input=None,
) -> FullResult:
    """All three dedup stages with the independent branches OVERLAPPED.

    After the exact phase (stage 1), the near-dup branch (LSH → components
    → clusters) and the substring-spans branch (stage 3, which consumes
    only the exact-deduped canonical keys + raw text) have no data
    dependency on each other — so they run CONCURRENTLY, each branch a
    separate Ray Data streaming execution sharing the cluster. On a
    multi-node cluster this is how the stages would be scheduled anyway;
    sequential barriers between independent DAGs waste the whole fleet
    during each branch's stragglers.

    ``spans_input``: optional (url, text) Dataset/path for the spans
    branch; defaults to re-reading ``input_ds`` with column pruning when
    it is a path.
    """
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    import ray.data as rd

    from sick_ray.shuffle import semi_select
    from sick_ray.stages.suffix import duplicate_spans

    raw_path = input_ds if isinstance(input_ds, str) else None
    input_ds, cfg, runner, cfg_fp = _prepare(input_ds, cfg, out_dir)

    t0 = _time.time()
    meta, fingerprints, canonical, n_docs, n_canonical = _exact_phase(
        input_ds, cfg, runner, cfg_fp, out_dir
    )
    exact_sec = _time.time() - t0

    def near_branch():
        t = _time.time()
        near_walls: dict = {}
        _, labels, clusters, n_edges = _near_phase(
            meta, canonical, n_canonical, cfg, runner, cfg_fp, out_dir,
            walls=near_walls,
        )
        n_cluster_rows = clusters.count()
        return labels, clusters, n_edges, n_cluster_rows, _time.time() - t, near_walls

    def spans_branch():
        t = _time.time()
        spans_walls: dict = {}
        if spans_input is not None:
            docs = spans_input
            if isinstance(docs, str):
                docs = rd.read_parquet(docs, columns=["url", "text"])
        elif raw_path is not None:
            # prune at the read: the spans branch needs only (url, text)
            docs = rd.read_parquet(raw_path, columns=["url", "text"])
        else:
            docs = input_ds.select_columns(["url", "text"])
        canon_keys = canonical.select_columns(["url"]).materialize()
        # duplicate_spans fans out to three consumers, each of which would
        # re-execute a lazy semi-join input — the intermediate must be
        # pinned. HOW it is pinned is a scale decision: plasma
        # materialize keeps the FULL-TEXT corpus live in the object store
        # for the whole spans phase (uncompressed Arrow — at 8M docs that
        # is ~16 GB of standing spill, and the measured peak-disk driver
        # of the 32-CPU 10× run); above SPANS_PIN_PARQUET_DOCS the
        # corpus-sized intermediate goes to zstd parquet instead and the
        # three consumers re-read it from storage — the layout a
        # 100-TB run has no choice about (a 10^12-doc corpus never fits
        # the object store; intermediates of corpus size belong to the
        # storage layer, plasma holds only derived narrow state).
        canon_docs_sel = semi_select(
            docs, canon_keys, on="url",
            num_partitions=cfg.num_partitions, n_keys_hint=n_canonical,
        )
        spans_tmp = None
        t_pin = _time.time()
        if n_canonical > SPANS_PIN_PARQUET_DOCS:
            import os as _os
            import shutil as _shutil
            import tempfile as _tempfile

            # reap pins orphaned by crashed/killed runs (the finally
            # below cannot run under SIGKILL) — they silently eat the
            # spill-disk quota. Dir names embed the owning pid; a pin
            # whose owner is gone is garbage.
            tmp_root = _tempfile.gettempdir()
            for d in _os.listdir(tmp_root):
                if d.startswith("sick_ray_spanscorpus_"):
                    try:
                        pid = int(d.split("_")[3])
                        _os.kill(pid, 0)            # raises if dead
                    except (IndexError, ValueError, ProcessLookupError):
                        _shutil.rmtree(_os.path.join(tmp_root, d),
                                       ignore_errors=True)
                    except PermissionError:
                        pass                        # alive, other user
            spans_tmp = _tempfile.mkdtemp(
                prefix=f"sick_ray_spanscorpus_{_os.getpid()}_")
            # zstd, not snappy: snappy's faster encode was measured a net
            # LOSS here — its ~2x larger pin file raised peak disk enough
            # to break the spill quota at the 10x regime (OutOfDisk),
            # while zstd's 54 s encode cost is fully overlapped by the
            # near branch. Ratio beats speed for a corpus-sized pin.
            canon_docs_sel.write_parquet(spans_tmp, compression="zstd")
            canon_docs = rd.read_parquet(spans_tmp, columns=["url", "text"])
        else:
            canon_docs = canon_docs_sel.materialize()
        spans_walls["pin_sec"] = round(_time.time() - t_pin, 2)
        # canonical text volume (cheap aggregate over the materialized
        # narrow table) sizes the spans sorts by data, not corpus width
        corpus_bytes = int(canonical.sum("n_bytes") or 0)
        try:
            spans = duplicate_spans(
                canon_docs, cfg, n_docs_hint=n_canonical,
                corpus_bytes_hint=corpus_bytes, walls=spans_walls,
            ).materialize()
        finally:
            if spans_tmp is not None:
                _shutil.rmtree(spans_tmp, ignore_errors=True)
        return spans, spans.count(), _time.time() - t, spans_walls

    if cfg.serial_branches:
        # bounded-spill-disk mode: branches run one at a time so the
        # peak of concurrently-live intermediates is max(branch), not sum
        (labels, clusters, n_edges, n_cluster_rows, near_sec,
         near_walls) = near_branch()
        spans, n_spans, spans_sec, spans_walls = spans_branch()
    else:
        # two driver threads, each driving its own streaming execution;
        # Ray's scheduler multiplexes the branches over the shared CPU pool
        with ThreadPoolExecutor(max_workers=2) as pool:
            near_f = pool.submit(near_branch)
            spans_f = pool.submit(spans_branch)
            (labels, clusters, n_edges, n_cluster_rows, near_sec,
             near_walls) = near_f.result()
            spans, n_spans, spans_sec, spans_walls = spans_f.result()

    fingerprints = fingerprints.map_batches(_to_uint64("fp64"), batch_format="pyarrow")
    dedup = DedupResult(
        fingerprints=fingerprints,
        clusters=clusters,
        canonical=canonical,
        labels=labels,
        n_docs=n_docs,
        n_canonical=n_canonical,
        n_edges=n_edges,
        runner_log=runner.log,
    )
    return FullResult(
        dedup=dedup,
        spans=spans,
        n_spans=n_spans,
        timings={
            "exact_sec": round(exact_sec, 3),
            "near_sec": round(near_sec, 3),
            "spans_sec": round(spans_sec, 3),
            "total_sec": round(_time.time() - t0, 3),
            "n_cluster_rows": n_cluster_rows,
            "near_walls": near_walls,
            "spans_walls": spans_walls,
        },
    )


def write_deduped_corpus(input_ds, clusters_ds, out_dir: str,
                         urls: list[str] | None = None):
    """Emit the deduplicated corpus: the cluster-canonical row per cluster,
    with ``text`` passed through byte-identically — the engine's analogue
    of the reference's ``reconstruct`` (refs → JSON round-trip,
    json-sick-scala ``sickcirce/CirceTraverser.scala:16-58``): derived
    state maps back to the original payload without re-encoding.

    ``urls``: optional url subset — the LAZY inverse, the analogue of the
    reference's ``resolveFull`` resolving one requested subtree instead
    of the whole document (``CirceTraverser.scala:190-231``). When set,
    the url predicate is pushed INTO the parquet read (row-group pruning
    via a pyarrow dataset filter — non-matching row groups never leave
    storage) and into the cluster side before the join, so reconstructing
    k urls costs O(matching row groups), not a full corpus pass.

    ``input_ds``: the original webtext Dataset/path; ``clusters_ds``: the
    pipeline's clusters output. Canonical rows are selected by a
    distributed LEFT SEMI join on the corpus row key (url, warc_ts) — urls
    alone are not unique in web crawls (recrawls), and nothing about the
    corpus is ever collected to the driver. The wide ``text``/``html``
    payload rides only its own semi-join partition, never a broadcast.
    Returns (n_kept, out_dir).
    """
    import pyarrow.compute as pc
    import ray.data as rd

    url_set = pa.array(sorted(set(urls)), type=pa.string()) if urls is not None else None
    if isinstance(input_ds, str):
        if url_set is not None:
            input_ds = rd.read_parquet(
                input_ds, filter=pc.field("url").isin(url_set))
        else:
            input_ds = rd.read_parquet(input_ds)
    elif url_set is not None:
        input_ds = input_ds.map_batches(
            lambda b: b.filter(pc.is_in(b.column("url"), value_set=url_set)),
            batch_format="pyarrow",
        )
    canon_keys = clusters_ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("is_canonical"), True)).select(
            ["url", "warc_ts"]
        ),
        batch_format="pyarrow",
    )
    if url_set is not None:
        canon_keys = canon_keys.map_batches(
            lambda b: b.filter(pc.is_in(b.column("url"), value_set=url_set)),
            batch_format="pyarrow",
        ).materialize()
        if canon_keys.count() == 0:
            # none of the requested urls is canonical: the reconstruct is
            # legitimately empty — short-circuit BEFORE the join (Ray's
            # hash join loses the key schema when one side is entirely
            # empty blocks) and commit an explicit zero-row manifest
            import os

            from sick_ray.state.manifest import commit_manifest

            os.makedirs(out_dir, exist_ok=True)
            man = commit_manifest(out_dir, "deduped_corpus", "reconstruct")
            return man["total_rows"], out_dir
    kept = input_ds.join(
        canon_keys,
        join_type="left_semi",
        num_partitions=join_partitions(DedupConfig().num_partitions),
        on=("url", "warc_ts"),
    )
    kept.write_parquet(out_dir)
    from sick_ray.state.manifest import commit_manifest

    man = commit_manifest(out_dir, "deduped_corpus", "reconstruct")
    return man["total_rows"], out_dir
