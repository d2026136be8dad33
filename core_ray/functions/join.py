"""Partitioned hash join — the large-x-large join path (ray_guide "Both
sides large"): add ``bucket = hash(key) % B`` to both sides, co-group by
bucket, and join pairwise inside each bucket task.  Used when the build side
is too big to broadcast (the broadcast path lives in
``pipelines/relational.py``).

Arrow-native shuffle: each side is conformed to the union schema with typed
null columns and tagged with (side, bucket) IN ARROW — payload columns never
round-trip through pandas until the single per-bucket merge (pandas' C join
kernel), which runs once per bucket, not once per batch.

Skew note: a hot key inflates one bucket; mitigate by raising ``num_buckets``
or pre-salting the probe side — documented, not automatic."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    how: str = "inner",
    num_buckets: int = 32,
    broadcast_threshold_bytes: int = 64 << 20,
) -> ray.data.Dataset:
    """Join two Datasets on one key column.

    When the build (right) side is provably small — its metadata size is
    under ``broadcast_threshold_bytes`` — it is broadcast once via
    ``ray.put`` and merged inside ``map_batches`` with NO shuffle (the
    autoBroadcastJoinThreshold rule every SQL engine applies; driver memory
    stays bounded by the threshold).  Otherwise both sides are tagged with a
    side marker and a deterministic key-hash bucket, unioned (ONE shuffle
    co-locates both sides), and merged per bucket with a pandas join."""
    lschema, rschema = left.schema(), right.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    overlap = (set(lcols) & set(rcols)) - {on}
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    if how in ("inner", "left"):
        try:
            rsize = right.size_bytes()
        except Exception:
            rsize = None
        if rsize is not None and 0 < rsize <= broadcast_threshold_bytes:
            rt = right.to_pandas()

            import ray as _ray

            ref = _ray.put(rt)

            def bj(df: pd.DataFrame) -> pd.DataFrame:
                return df.merge(_ray.get(ref), on=on, how=how)

            return left.map_batches(bj, batch_format="pandas")

    def _arrow_types(schema) -> dict:
        base = getattr(schema, "base_schema", None)
        if isinstance(base, pa.Schema):
            return {f.name: f.type for f in base}
        out = {}
        for n, t in zip(schema.names, schema.types):
            if isinstance(t, pa.DataType):
                out[n] = t
            else:
                try:  # pandas-block schema carries numpy dtypes
                    out[n] = pa.from_numpy_dtype(np.dtype(t))
                except (TypeError, pa.ArrowNotImplementedError):
                    out[n] = pa.string()
        return out

    types = _arrow_types(lschema)
    types.update(_arrow_types(rschema))
    all_cols = lcols + [c for c in rcols if c not in lcols]

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {}
            for c in all_cols:
                cols[c] = (
                    t[c] if c in t.column_names else pa.nulls(n, types[c])
                )
            out = pa.table(cols)
            key_np = t[on].to_numpy(zero_copy_only=False)
            h = (
                pd.util.hash_pandas_object(pd.Series(key_np), index=False).to_numpy()
                % num_buckets
            ).astype(np.int64)
            out = out.append_column("_side", pa.array(np.full(n, side, dtype=np.int8)))
            return out.append_column("_bucket", pa.array(h))

        return fn

    tagged = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # split sides IN ARROW so each side drops the other's null-padded
        # columns before the pandas conversion (an int column with union
        # nulls would otherwise come back float64)
        lf = t.filter(pc.equal(t["_side"], 0)).select(lcols).to_pandas()
        rf = t.filter(pc.equal(t["_side"], 1)).select(rcols).to_pandas()
        return pa.Table.from_pandas(lf.merge(rf, on=on, how=how), preserve_index=False)

    return tagged.groupby("_bucket").map_groups(join_bucket, batch_format="pyarrow")
