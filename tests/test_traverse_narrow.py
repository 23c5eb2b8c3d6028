"""Nested-JSON traversal (hash-consing analogue) + numeric narrowing."""

import numpy as np
import pyarrow as pa

from sick_ray.functions.narrow import minimal_int_type
from sick_ray.functions.traverse import subtree_rows


def test_identical_subtrees_share_hash():
    a = subtree_rows({"x": {"a": 1, "b": [1, 2]}, "y": 3})
    b = subtree_rows({"q": {"b": [1, 2], "a": 1}})  # key order differs
    ha = {p: h for p, k, h, d in a}
    hb = {p: h for p, k, h, d in b}
    # the {a:1,b:[1,2]} subtree is structurally identical in both docs
    assert ha["$.x"] == hb["$.q"]
    # and the [1,2] arrays too
    assert ha["$.x.b"] == hb["$.q.b"]
    # different values differ
    assert ha["$.y"] != ha["$.x.a"]


def test_subtree_kinds_and_depth():
    rows = subtree_rows({"s": "t", "n": None, "f": 1.5, "b": True, "l": [0]})
    kinds = {p: k for p, k, h, d in rows}
    assert kinds["$"] == "obj"
    assert kinds["$.s"] == "str"
    assert kinds["$.n"] == "null"
    assert kinds["$.f"] == "float"
    assert kinds["$.b"] == "bool"
    assert kinds["$.l"] == "arr"
    assert kinds["$.l[0]"] == "int"
    depth = {p: d for p, k, h, d in rows}
    assert depth["$"] == 0 and depth["$.l[0]"] == 2


def test_int_vs_float_vs_bool_distinct():
    h1 = subtree_rows(1)[0][2]
    hf = subtree_rows(1.0)[0][2]
    hb = subtree_rows(True)[0][2]
    assert len({h1, hf, hb}) == 3


def test_minimal_int_type_ladder():
    assert minimal_int_type(0, 100)[1] == 1
    assert minimal_int_type(-129, 0)[1] == 2
    assert minimal_int_type(0, 40_000)[1] == 4
    assert minimal_int_type(0, 2**40)[1] == 8
    assert minimal_int_type(-(2**31) - 1, 0)[1] == 8


def test_apply_narrowing_roundtrip(ray_session):
    import ray.data as rd

    from sick_ray.functions.narrow import apply_narrowing, narrow_types

    tbl = pa.table(
        {
            "small": pa.array([1, 2, 100], type=pa.int64()),
            "big": pa.array([0, 2**40, 5], type=pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl)
    types = narrow_types(ds, ["small", "big"])
    assert types["small"][1] == 1 and types["big"][1] == 8
    out = apply_narrowing(ds, types).to_pandas()
    assert out["small"].tolist() == [1, 2, 100]
    assert out["small"].dtype == np.int8


def test_decimal_sum_exact(ray_session):
    import ray.data as rd

    from sick_ray.functions.narrow import decimal_sum

    # 0.1 + 0.2 + ... floats that don't sum exactly in binary
    vals = [0.1] * 10 + [0.2] * 5
    keys = ["a"] * 10 + ["b"] * 5
    tbl = pa.table({"g": pa.array(keys), "v": pa.array(vals, type=pa.float64())})
    out = decimal_sum(rd.from_arrow(tbl).repartition(3), "v", "g")
    assert pa.types.is_decimal(out.schema.field("total").type)
    got = {k: str(v) for k, v in
           zip(out.column("g").to_pylist(), out.column("total").to_pylist())}
    assert got == {"a": "1.00", "b": "1.00"}  # exact, not 0.9999999999999999


def test_decimal_sum_overflows_int64_units(ray_session):
    """Totals beyond int64 scaled units (round-2 cap ≈9.2e16 currency
    units) must stay exact — the 32-bit half-sum recombination path."""
    import ray.data as rd

    from sick_ray.functions.narrow import decimal_sum

    # 2000 × 9e15.00 → total 1.8e19, units 1.8e21 ≫ 2^63
    n = 2000
    tbl = pa.table(
        {"g": pa.array(["x"] * n), "v": pa.array([9e15] * n, type=pa.float64())}
    )
    out = decimal_sum(rd.from_arrow(tbl).repartition(7), "v", "g")
    (total,) = out.column("total").to_pylist()
    assert str(total) == "18000000000000000000.00"  # 2000 × 9e15, > 2^63 units


def test_decimal_sum_exact_100_digit_values(ray_session):
    """Arbitrary-precision string inputs (the reference's BigDecimal
    fixtures, BigDecimalTests.cs:12-40 / samples/generated-big.json)."""
    from decimal import Decimal

    import ray.data as rd

    from sick_ray.functions.narrow import decimal_sum_exact

    big = "9" * 100 + ".25"            # 100-digit integer part
    tiny = "0.01"
    tbl = pa.table(
        {
            "g": pa.array(["a", "a", "b"]),
            "v": pa.array([big, tiny, "-" + big], type=pa.string()),
        }
    )
    out = decimal_sum_exact(rd.from_arrow(tbl).repartition(2), "v", "g")
    got = dict(zip(out.column("g").to_pylist(), out.column("total").to_pylist()))
    assert got["a"] == "9" * 100 + ".26"       # exact at 100 digits
    assert got["b"] == "-" + big


def test_avoid_big_decimals_toggle():
    """The reference's avoidBigDecimals traversal flag
    (CirceTraverser.scala:121-152): lossy mode interns float-equal
    decimals together; exact mode keeps (unscaled, scale) identity —
    trailing zeros and 100-digit precision are significant."""
    from sick_ray.functions.traverse import subtree_rows
    import json as _json
    from decimal import Decimal

    def vhash(doc_text, avoid):
        v = _json.loads(doc_text, parse_float=None if avoid else Decimal)
        return subtree_rows(v)[-1][2]  # root subtree hash

    # lossy fast path: 0.1000 == 0.1 as float64 → SAME subtree
    assert vhash('{"x": 0.1000}', True) == vhash('{"x": 0.1}', True)
    # exact mode: scale is part of BigDecimal identity → DIFFERENT
    assert vhash('{"x": 0.1000}', False) != vhash('{"x": 0.1}', False)
    # two 40-digit decimals that collide as float64 stay distinct exactly
    a = '{"x": 1.0000000000000000000000000000000000000001}'
    b = '{"x": 1.0000000000000000000000000000000000000002}'
    assert vhash(a, True) == vhash(b, True)      # both round to 1.0
    assert vhash(a, False) != vhash(b, False)    # exact precision kept
    # kind tag: exact decimals are their own kind, like the reference's
    # BigDecimal codec — never conflated with float
    v = _json.loads('{"x": 0.5}', parse_float=Decimal)
    kinds = {k for (_p, k, _h, _d) in subtree_rows(v)}
    assert "dec" in kinds and "float" not in kinds
