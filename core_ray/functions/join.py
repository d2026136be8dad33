"""Partitioned hash join — the large-x-large join path (ray_guide "Both
sides large"): add ``bucket = hash(key) % B`` to both sides, co-group by
bucket, and join pairwise inside each bucket task.  Used when the build side
is too big to broadcast (the broadcast path lives in
``pipelines/relational.py``).

Skew note: a hot key inflates one bucket; mitigate by raising ``num_buckets``
or pre-salting the probe side — documented, not automatic."""

from __future__ import annotations

import pandas as pd

import ray.data


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    how: str = "inner",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Join two Datasets on one key column via bucket co-grouping.

    Both sides are tagged with a side marker and a deterministic key-hash
    bucket, unioned (ONE shuffle co-locates both sides), and merged per
    bucket with a pandas join."""

    lcols = [c for c in left.schema().names]
    rcols = [c for c in right.schema().names]
    overlap = (set(lcols) & set(rcols)) - {on}
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")

    all_cols = lcols + [c for c in rcols if c not in lcols]

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            # conform to one schema so the unioned blocks shuffle cleanly
            for c in all_cols:
                if c not in df.columns:
                    df[c] = pd.NA
            df = df[all_cols]
            df["_side"] = side
            df["_bucket"] = (
                pd.util.hash_pandas_object(df[on], index=False) % num_buckets
            ).astype("int64")
            return df

        return fn

    tagged = left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["_side"] == "l"][lcols]
        rf = g[g["_side"] == "r"][rcols]
        return lf.merge(rf, on=on, how=how)

    return tagged.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")
