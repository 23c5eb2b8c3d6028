"""Checkpoint manifests — per-stage lineage, counters, resume.

The reference has no checkpoint/resume (single-machine library; its closest
notion is the eager-vs-incremental reader threshold,
``IncrementalEBAReader.scala:19-26``). For a multi-hour 100 TB run the
north_rule requires per-partition lineage + metrics so any stage can resume
mid-run.

Model: each stage writes its output as a directory of parquet part files
plus ``_MANIFEST.json`` recording (a) a fingerprint of the stage's inputs +
config (resume only when it matches), (b) per-part row counts and byte
sizes (the per-partition lineage), and (c) free-form stage counters (e.g.
truncated-bucket count). Writes are atomic: parquet parts land in the final
directory only after ``write_parquet`` succeeds, and the manifest is
written last via tmp-file + rename — a crashed run leaves either no
manifest (stage re-runs) or a complete one (stage is skipped).
"""

from __future__ import annotations

import json
import os
import time

from sick_ray.xxh import xxh64

MANIFEST_NAME = "_MANIFEST.json"


def stage_fingerprint(*parts) -> str:
    """Deterministic fingerprint of stage inputs/config (hex string)."""
    blob = json.dumps([str(p) for p in parts], sort_keys=True).encode()
    return f"{xxh64(blob):016x}"


def input_signature(path: str) -> str:
    """Content identity of an input path: file list + sizes + mtimes.
    Folding this into the stage fingerprint means editing the input parquet
    in place invalidates checkpoints instead of silently resuming on stale
    data (a path string alone cannot tell the difference)."""
    entries = []
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            fp = os.path.join(path, name)
            if os.path.isfile(fp):
                st = os.stat(fp)
                entries.append((name, st.st_size, int(st.st_mtime_ns)))
    elif os.path.isfile(path):
        st = os.stat(path)
        entries.append((os.path.basename(path), st.st_size, int(st.st_mtime_ns)))
    return stage_fingerprint(path, entries)


def manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, MANIFEST_NAME)


def load_manifest(stage_dir: str) -> dict | None:
    p = manifest_path(stage_dir)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as fh:
            return json.load(fh)
    except (json.JSONDecodeError, OSError):
        return None


def is_complete(stage_dir: str, input_fp: str) -> bool:
    m = load_manifest(stage_dir)
    return bool(m) and m.get("input_fp") == input_fp and m.get("status") == "complete"


def commit_manifest(stage_dir: str, stage: str, input_fp: str, counters: dict | None = None) -> dict:
    """Scan the stage dir's parquet parts, record lineage, commit atomically."""
    import pyarrow.parquet as pq

    parts = []
    for name in sorted(os.listdir(stage_dir)):
        if not name.endswith(".parquet"):
            continue
        fpath = os.path.join(stage_dir, name)
        md = pq.read_metadata(fpath)
        parts.append(
            {
                "file": name,
                "rows": md.num_rows,
                "bytes": os.path.getsize(fpath),
                "row_groups": md.num_row_groups,
            }
        )
    man = {
        "stage": stage,
        "status": "complete",
        "input_fp": input_fp,
        "created_at": time.time(),
        "total_rows": sum(p["rows"] for p in parts),
        "parts": parts,
        "counters": counters or {},
    }
    tmp = manifest_path(stage_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(man, fh, indent=1)
    os.replace(tmp, manifest_path(stage_dir))
    return man


class StageRunner:
    """Run-or-resume wrapper around stage functions.

    ``runner.run("edges", input_fp, compute_fn)``: if ``out_root`` is unset,
    just computes (no checkpointing). Otherwise, if a complete manifest with
    a matching input fingerprint exists, returns ``ray.data.read_parquet``
    of the stage dir (resume); else computes, writes parquet + manifest,
    and returns a reader over the materialized output (so downstream stages
    consume the checkpoint, not a recompute).
    """

    def __init__(self, out_root: str | None):
        self.out_root = out_root
        self.log: list[dict] = []

    def run(self, stage: str, input_fp: str, compute, counters_fn=None):
        import ray.data as rd

        if self.out_root is None:
            return compute()
        stage_dir = os.path.join(self.out_root, stage)
        if is_complete(stage_dir, input_fp):
            self.log.append({"stage": stage, "resumed": True})
            return rd.read_parquet(stage_dir)
        t0 = time.time()
        ds = compute()
        os.makedirs(stage_dir, exist_ok=True)
        # clear stale parts from a failed previous attempt
        for name in os.listdir(stage_dir):
            if name.endswith(".parquet"):
                os.unlink(os.path.join(stage_dir, name))
        ds.write_parquet(stage_dir)
        counters = counters_fn() if counters_fn else {}
        counters["wall_sec"] = round(time.time() - t0, 3)
        man = commit_manifest(stage_dir, stage, input_fp, counters)
        self.log.append({"stage": stage, "resumed": False, "rows": man["total_rows"]})
        return rd.read_parquet(stage_dir)
