"""Sources & sinks — the engine's reader/writer surface.

Reference parity (SURVEY.md §2.1): sick's readers are an eager whole-file
parser (``EagerEBAReader.readEBAStructure``, json-sick-scala
``eba/reader/EagerEBAReader.scala:21-64``) and a lazy seek-based one
(``IncrementalEBAReader.open``, ``eba/reader/IncrementalEBAReader.scala:19-100``);
its writer streams 10 tables + header (``EBAWriter.scala:19-120``). In the
Ray engine those roles map onto Parquet: eager read = ``read_parquet``
loading blocks, incremental read = column pruning + row-group/predicate
pushdown, the EBA header = the Parquet footer, and the three
table-write strategies collapse into ``write_parquet`` row-group sizing.
"""

from __future__ import annotations

import pyarrow as pa

WEBTEXT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

WEBTEXT_COLUMNS = [f.name for f in WEBTEXT_SCHEMA]


def read_webtext(path: str, columns: list[str] | None = None, lang: str | None = None):
    """Column-pruned, predicate-pushdown read of a webtext parquet layout.

    ``columns`` restricts I/O to the named columns (the incremental-reader
    analogue: only requested data leaves storage); ``lang`` pushes an
    equality filter into the parquet scan (row-group pruning)."""
    import pyarrow.compute as pc
    import ray.data as rd

    kwargs = {}
    if columns is not None:
        unknown = set(columns) - set(WEBTEXT_COLUMNS)
        if unknown:
            raise ValueError(f"unknown webtext columns: {sorted(unknown)}")
        kwargs["columns"] = columns
    if lang is not None:
        kwargs["filter"] = pc.field("lang") == lang
    return rd.read_parquet(path, **kwargs)


def read_jsonl_webtext(path: str):
    """JSONL → webtext shape: missing columns null-filled, extras dropped,
    types cast to the canonical schema."""
    import ray.data as rd

    def conform(batch: pa.Table) -> pa.Table:
        cols = {}
        n = batch.num_rows
        for field in WEBTEXT_SCHEMA:
            if field.name in batch.column_names:
                cols[field.name] = batch.column(field.name).cast(field.type)
            else:
                cols[field.name] = pa.nulls(n, type=field.type)
        return pa.table(cols)

    return rd.read_json(path).map_batches(conform, batch_format="pyarrow")


def validate_webtext(ds) -> None:
    """Schema gate: raise if the dataset is missing required columns."""
    names = set(ds.schema().names)
    missing = {"url", "text"} - names
    if missing:
        raise ValueError(f"webtext input missing required columns: {sorted(missing)}")


def write_stage(ds, out_dir: str, stage: str, input_fp: str = "adhoc",
                min_rows_per_file: int | None = None,
                compression: str | None = None) -> dict:
    """Resumable sink: parquet part files + a committed manifest with
    per-part lineage (rows/bytes) — see sick_ray.state.manifest.
    ``compression``: parquet codec, e.g. "zstd" (the reference's test-only
    zstd path, EBAReaderWriterTest.scala:99-103). Returns the manifest."""
    import os

    from sick_ray.state.manifest import commit_manifest

    stage_dir = os.path.join(out_dir, stage)
    os.makedirs(stage_dir, exist_ok=True)
    for name in os.listdir(stage_dir):
        if name.endswith(".parquet"):
            os.unlink(os.path.join(stage_dir, name))
    kwargs = {}
    if min_rows_per_file is not None:
        kwargs["min_rows_per_file"] = min_rows_per_file
    if compression is not None:
        kwargs["compression"] = compression
    ds.write_parquet(stage_dir, **kwargs)
    return commit_manifest(stage_dir, stage, input_fp)


def replace_parquet(ds, out_dir: str) -> None:
    """Clear-then-write: remove stale ``*.parquet`` parts, then write.

    ``Dataset.write_parquet`` APPENDS uniquely-named files, so a retried
    run would otherwise double the output — the retry-must-not-append
    convention used by the CLI output dirs (--curate, --probe-index,
    --query) lives here once."""
    import glob
    import os

    os.makedirs(out_dir, exist_ok=True)
    for f in glob.glob(os.path.join(out_dir, "*.parquet")):
        os.unlink(f)
    ds.write_parquet(out_dir)
