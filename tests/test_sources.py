"""Reader/sink surface: pruning, pushdown, jsonl conformance, write_stage."""

import json
import os

import pyarrow as pa
import pytest


def test_read_webtext_pruned(ray_session, small_corpus):
    from sick_ray.sources.readers import read_webtext

    p = os.path.join(small_corpus, "webtext.parquet")
    ds = read_webtext(p, columns=["url", "text"])
    assert set(ds.schema().names) == {"url", "text"}
    with pytest.raises(ValueError):
        read_webtext(p, columns=["nope"])


def test_read_webtext_lang_pushdown(ray_session, small_corpus):
    import pyarrow.parquet as pq

    from sick_ray.sources.readers import read_webtext

    p = os.path.join(small_corpus, "webtext.parquet")
    n_de = read_webtext(p, lang="de").count()
    want = sum(1 for v in pq.read_table(p, columns=["lang"]).column("lang").to_pylist() if v == "de")
    assert n_de == want > 0


def test_read_jsonl_conform(ray_session, tmp_path):
    from sick_ray.sources.readers import WEBTEXT_COLUMNS, read_jsonl_webtext

    p = tmp_path / "w.jsonl"
    rows = [
        {"url": "u1", "text": "hello world", "lang": "en", "extra": 1},
        {"url": "u2", "text": "zweite zeile", "lang": "de", "extra": 2},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ds = read_jsonl_webtext(str(p))
    df = ds.to_pandas()
    assert list(df.columns) == WEBTEXT_COLUMNS
    assert df["html"].isna().all()
    assert set(df["url"]) == {"u1", "u2"}


def test_write_stage_manifest(ray_session, tmp_path):
    import ray.data as rd

    from sick_ray.sources.readers import write_stage
    from sick_ray.state.manifest import load_manifest

    ds = rd.from_arrow(pa.table({"a": list(range(100))}))
    man = write_stage(ds, str(tmp_path), "mystage", input_fp="fp1")
    assert man["total_rows"] == 100
    on_disk = load_manifest(os.path.join(str(tmp_path), "mystage"))
    assert on_disk["input_fp"] == "fp1"
    assert on_disk["status"] == "complete"
    assert sum(p["rows"] for p in on_disk["parts"]) == 100


def test_write_stage_zstd(ray_session, tmp_path):
    """zstd-compressed stage output (the reference's test-only zstd path,
    EBAReaderWriterTest.scala:99-103) round-trips."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from sick_ray.sources.readers import write_stage

    ds = rd.from_arrow(pa.table({"a": list(range(1000)), "t": ["x" * 50] * 1000}))
    man = write_stage(ds, str(tmp_path), "z", input_fp="fp", compression="zstd")
    assert man["total_rows"] == 1000
    f = [n for n in os.listdir(tmp_path / "z") if n.endswith(".parquet")][0]
    md = pq.ParquetFile(str(tmp_path / "z" / f)).metadata
    assert md.row_group(0).column(0).compression.lower() == "zstd"


def test_replace_parquet_no_append(ray_session, tmp_path):
    """Retried writes must REPLACE, not append (write_parquet appends
    uniquely-named files) — the convention behind every CLI output dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from sick_ray.sources.readers import replace_parquet

    out = str(tmp_path / "out")
    ds = rd.from_arrow(pa.table({"x": list(range(100))}))
    replace_parquet(ds, out)
    replace_parquet(ds, out)
    assert pq.read_table(out).num_rows == 100
