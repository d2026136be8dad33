"""Bucketed layouts: zero-shuffle join equals hash_join, left-join null
fill, layout-compatibility guard."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from core_ray.functions import bucketed_join, hash_join, write_bucketed


def _frames(seed=31, n=4000):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 200, n).astype("int64"),
            "lv": rng.normal(size=n),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 300, 1000).astype("int64"),
            "rv": np.arange(1000, dtype="int64"),
        }
    )
    return left, right


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_bucketed_join_equals_hash_join(tmp_path):
    left, right = _frames()
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(ray.data.from_pandas(left).repartition(5), ld, "k", 8)
    write_bucketed(ray.data.from_pandas(right).repartition(3), rd, "k", 8)
    got = _sorted(bucketed_join(ld, rd, how="inner").to_pandas())
    want = _sorted(
        hash_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            how="inner",
            broadcast_threshold_bytes=0,
        ).to_pandas()[got.columns.tolist()]
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])


def test_bucketed_left_join_null_fill(tmp_path):
    # INT right payload: unmatched rows must be real nulls and every output
    # block must keep the int64 schema (no float64 NaN promotion divergence)
    left = pd.DataFrame({"k": np.array([1, 2, 3], dtype="int64"),
                         "lv": [1.0, 2.0, 3.0]})
    right = pd.DataFrame({"k": np.array([2], dtype="int64"),
                          "rv": np.array([9], dtype="int64")})
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(ray.data.from_pandas(left), ld, "k", 4)
    write_bucketed(ray.data.from_pandas(right), rd, "k", 4)
    ds = bucketed_join(ld, rd, how="left")
    import pyarrow as pa

    for b in ds.iter_batches(batch_format="pyarrow"):
        assert b.schema.field("rv").type == pa.int64()
    out = _sorted(ds.to_pandas())
    assert len(out) == 3
    assert out.loc[out["k"] == 2, "rv"].iloc[0] == 9
    assert out.loc[out["k"] != 2, "rv"].isna().all()


def test_bucketed_join_rejects_right_outer(tmp_path):
    left, right = _frames(n=100)
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(ray.data.from_pandas(left), ld, "k", 4)
    write_bucketed(ray.data.from_pandas(right.rename(columns={"rv": "x"})), rd, "k", 4)
    with pytest.raises(ValueError, match="inner.*left"):
        bucketed_join(ld, rd, how="right")


def test_incompatible_layouts_raise(tmp_path):
    left, right = _frames(n=100)
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(ray.data.from_pandas(left), ld, "k", 8)
    write_bucketed(ray.data.from_pandas(right), rd, "k", 16)
    with pytest.raises(ValueError, match="incompatible"):
        bucketed_join(ld, rd)


def test_column_collision_raises(tmp_path):
    left, _ = _frames(n=100)
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(ray.data.from_pandas(left), ld, "k", 4)
    write_bucketed(ray.data.from_pandas(left), rd, "k", 4)  # same cols
    with pytest.raises(ValueError, match="collision"):
        bucketed_join(ld, rd)
