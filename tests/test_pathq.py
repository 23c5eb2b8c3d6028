"""Path-query engine parity with the reference's cursor queries
(SickPath.cs:7-63, SickCursorTest.scala:13-188): dotted chains, attached
and standalone brackets, chained and negative indexes, missing paths."""

import pyarrow as pa
import pytest

from sick_ray.functions.pathq import make_path_extractor, parse_path, select_path, walk


def test_parse_path_forms():
    assert parse_path("a.b.c") == ["a", "b", "c"]
    assert parse_path("a.b[0]") == ["a", "b", 0]
    assert parse_path("a.b.[0]") == ["a", "b", 0]
    assert parse_path("a[-1].c") == ["a", -1, "c"]
    assert parse_path("m[0][1]") == ["m", 0, 1]
    assert parse_path("[2].x") == [2, "x"]


def test_parse_path_rejects():
    with pytest.raises(ValueError):
        parse_path("")
    with pytest.raises(ValueError):
        parse_path("a.b[x]")


DOC = {
    "a": {"b": [10, {"c": "deep"}, 30]},
    "arr": [1, 2, 3],
    "s": "str",
    "n": None,
    "f": True,
}


@pytest.mark.parametrize(
    "path,expect",
    [
        ("a.b.[0]", 10),
        ("a.b[1].c", "deep"),
        ("a.b.[-1]", 30),
        ("arr[-3]", 1),
        ("arr[-4]", None),      # past the front (reference: out of range)
        ("arr[3]", None),
        ("s", "str"),
        ("n", None),
        ("f", True),
        ("a.nope", None),
        ("s.x", None),          # index into scalar
        ("a.b.c", None),        # field on array
    ],
)
def test_walk(path, expect):
    assert walk(DOC, parse_path(path)) == expect


def test_select_path_dataset(ray_session):
    import ray.data as rd

    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3], type=pa.int64()),
            "j": pa.array(
                ['{"x":{"y":[5,6,7]}}', '{"x":{"y":[]}}', None],
                type=pa.string(),
            ),
        }
    )
    out = select_path(
        rd.from_arrow(tbl), "x.y.[-1]", col="j", out_col="v", keep=["id"]
    ).to_pandas()
    got = dict(zip(out["id"], out["v"]))
    assert got[1] == "7"
    assert got[2] is None
    assert got[3] is None


def test_render_matches_duckdb(ray_session):
    """Rendering parity with json_extract_string: strings unquoted, other
    values canonical JSON text, null/missing NULL."""
    import duckdb

    rows = [
        '{"v":"plain"}',
        '{"v":69}',
        '{"v":69.5}',
        '{"v":true}',
        '{"v":null}',
        '{"v":{"x":1}}',
        '{"v":[1,"a"]}',
        "{}",
    ]
    extractor = make_path_extractor({"out": "v"}, col="j", keep=[])
    got = extractor(pa.table({"j": pa.array(rows)})).column("out").to_pylist()
    con = duckdb.connect()
    want = [
        con.execute("SELECT json_extract_string(?, '$.v')", [r]).fetchone()[0]
        for r in rows
    ]
    assert got == want
