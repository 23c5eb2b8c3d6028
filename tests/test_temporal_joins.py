"""asof_join / range_join_agg (stages/joins.py) vs a naive pandas oracle,
including ties at equal timestamps, keys present on only one side, and
empty sides."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sick_ray.stages.joins import asof_join, range_join_agg

WINDOW = 1_000  # µs


def _mk(seed: int, n_l: int, n_r: int):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "lid": np.arange(n_l, dtype=np.int64),
            "key": rng.integers(0, 8, n_l).astype(np.int64),
            "ts": rng.integers(0, 5_000, n_l).astype(np.int64),
            "lval": np.round(rng.random(n_l), 3),
        }
    )
    right = pd.DataFrame(
        {
            "key": rng.integers(0, 10, n_r).astype(np.int64),  # some keys unseen on left
            "ts": rng.integers(0, 5_000, n_r).astype(np.int64),
            "rval": np.round(rng.random(n_r), 3),
        }
    )
    # force exact-timestamp collisions (asof inclusive boundary)
    if n_l and n_r:
        right.loc[0, ["key", "ts"]] = left.loc[0, ["key", "ts"]].values
    # right side deduped on (key, ts) so the asof match is unambiguous
    right = right.drop_duplicates(["key", "ts"]).reset_index(drop=True)
    return left, right


def _naive_asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, lr in left.iterrows():
        cand = right[(right["key"] == lr["key"]) & (right["ts"] <= lr["ts"])]
        if len(cand):
            best = cand.loc[cand["ts"].idxmax()]
            rows.append((lr["lid"], best["ts"], best["rval"]))
    return pd.DataFrame(rows, columns=["lid", "r_ts", "rval"]).astype(
        {"lid": np.int64, "r_ts": np.int64}
    )


def _naive_range(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, lr in left.iterrows():
        cand = right[
            (right["key"] == lr["key"])
            & (right["ts"] >= lr["ts"] - WINDOW)
            & (right["ts"] < lr["ts"])
        ]
        rows.append((lr["lid"], len(cand), round(cand["rval"].sum(), 6)))
    return pd.DataFrame(rows, columns=["lid", "n", "s"]).astype(
        {"lid": np.int64, "n": np.int64}
    )


@pytest.mark.parametrize("seed,n_l,n_r", [(1, 200, 300), (2, 50, 5), (3, 7, 0)])
def test_asof_join_matches_naive(ray_session, seed, n_l, n_r):
    import ray.data as rd

    left, right = _mk(seed, n_l, n_r)
    out = asof_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        by="key", on="ts",
        left_cols=["lid", "lval"], right_cols=["rval"],
        num_partitions=4,
    ).to_pandas()
    if out.empty:
        # Ray's to_pandas drops the schema when zero blocks survive; the
        # operator's Dataset.schema() still carries it
        assert _naive_asof(left, right).empty
        return
    got = (
        out[["l_lid", "r_t", "r_rval"]]
        .rename(columns={"l_lid": "lid", "r_t": "r_ts", "r_rval": "rval"})
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = _naive_asof(left, right).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("seed,n_l,n_r", [(4, 200, 300), (5, 40, 40)])
def test_range_join_agg_matches_naive(ray_session, seed, n_l, n_r):
    import ray.data as rd

    left, right = _mk(seed, n_l, n_r)
    out = range_join_agg(
        rd.from_pandas(left),
        rd.from_pandas(right),
        by="key", on="ts", value_col="rval", window_us=WINDOW,
        left_cols=["lid"], num_partitions=4,
    ).to_pandas()
    got = (
        out.rename(columns={"l_lid": "lid", "n_in_range": "n", "sum_in_range": "s"})
        .sort_values("lid")
        .reset_index(drop=True)
    )
    got["s"] = got["s"].round(6)
    want = _naive_range(left, right).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_range_join_self_excludes_own_row(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "lid": np.arange(3, dtype=np.int64),
            "key": np.zeros(3, dtype=np.int64),
            "ts": np.array([0, 10, 10], dtype=np.int64),
            "rval": np.ones(3),
        }
    )
    out = range_join_agg(
        rd.from_pandas(df), rd.from_pandas(df),
        by="key", on="ts", value_col="rval", window_us=100,
        left_cols=["lid"], num_partitions=2,
    ).to_pandas().sort_values("l_lid")
    # ts=10 rows: only the ts=0 row is strictly before (equal ts excluded)
    assert out["n_in_range"].tolist() == [0, 1, 1]
