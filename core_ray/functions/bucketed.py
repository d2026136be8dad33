"""Persisted bucket layout: hash-partition a table by key ONCE, reuse the
co-location for every later join/groupby — the "pick ONE partitioning key
and reuse it across stages" rule made concrete.

``write_bucketed`` writes ``bucket=<b>/`` dirs plus a ``_bucket_meta.json``
recording (key, num_buckets, hash_kind).  ``bucketed_join`` joins two
layouts with the SAME meta with ZERO shuffle: bucket b of the left can only
match bucket b of the right, so the work plan is a Dataset OF BUCKET IDS
and each task reads its two bucket dirs and runs one local pandas join —
repeated joins against a 100-TB fact table stop paying the all-to-all
exchange every query.

The bucket hash is ``pd.util.hash_pandas_object`` — the same kind used by
`hash_join`/`asof_join`, so a layout written here co-locates with their
in-flight tagging too.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .temporal import _bucket_of  # the ONE bucket hash all layouts share

_META = "_bucket_meta.json"
_HASH_KIND = "pandas_hash_v1"


def write_bucketed(
    ds: ray.data.Dataset, out_dir: str, key: str, num_buckets: int = 32
) -> dict:
    """Write ``ds`` hash-bucketed by ``key``.  One shuffle now, zero for
    every co-located operation later."""

    def tag(t: pa.Table) -> pa.Table:
        b = _bucket_of(pd.Series(t[key].to_numpy(zero_copy_only=False)), num_buckets)
        return t.append_column("bucket", pa.array(b))

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    meta = {"key": key, "num_buckets": num_buckets, "hash_kind": _HASH_KIND}
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f)
    return meta


def read_bucket_meta(d: str) -> dict:
    with open(os.path.join(d, _META)) as f:
        return json.load(f)


def _bucket_files(d: str, b: int) -> list[str]:
    p = os.path.join(d, f"bucket={b}")
    if not os.path.isdir(p):
        return []
    return sorted(
        os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
    )


def bucketed_join(
    left_dir: str,
    right_dir: str,
    how: str = "inner",
    num_cpus: float = 1.0,
) -> ray.data.Dataset:
    """Zero-shuffle join of two :func:`write_bucketed` layouts sharing
    (key, num_buckets, hash_kind).  The driver plan is just the bucket-id
    list; each task streams its two bucket dirs and runs pandas' C join.

    Skew note: a hot key concentrates one bucket's task; re-bucket with a
    larger ``num_buckets`` (one shuffle) if a bucket outgrows task memory.

    ``how`` is inner or left; for a right join swap the arguments, for full
    outer compose left + an anti-joined right (kept explicit rather than
    silently mishandling buckets absent on one side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    lm, rm = read_bucket_meta(left_dir), read_bucket_meta(right_dir)
    if (
        lm["key"] != rm["key"]
        or lm["num_buckets"] != rm["num_buckets"]
        or lm["hash_kind"] != rm["hash_kind"]
    ):
        raise ValueError(f"incompatible bucket layouts: {lm} vs {rm}")
    key, nb = lm["key"], lm["num_buckets"]

    import pyarrow.parquet as pq

    def _any_schema(d: str) -> pa.Schema:
        for b in range(nb):
            files = _bucket_files(d, b)
            if files:
                return pq.read_schema(files[0])
        raise ValueError(f"no bucket files under {d}")

    ls, rs = _any_schema(left_dir), _any_schema(right_dir)
    overlap = (set(ls.names) & set(rs.names)) - {key}
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    out_fields = list(ls) + [f for f in rs if f.name != key]
    out_schema = pa.schema(out_fields)
    empty = pa.table({f.name: pa.nulls(0, f.type) for f in out_fields})
    r_null_cols = {f.name: f.type for f in rs if f.name != key}

    def fn(batch: pa.Table) -> pa.Table:
        outs = []
        for b in batch["b"].to_pylist():
            lf = _bucket_files(left_dir, b)
            rf = _bucket_files(right_dir, b)
            if not lf or (how == "inner" and not rf):
                continue
            lt = pa.concat_tables([pq.read_table(f) for f in lf])
            if rf:
                rt = pa.concat_tables([pq.read_table(f) for f in rf])
                if how == "left":
                    # ArrowDtype keeps int payloads nullable through the
                    # merge: unmatched rows get real nulls, not float NaN
                    m = lt.to_pandas(types_mapper=pd.ArrowDtype).merge(
                        rt.to_pandas(types_mapper=pd.ArrowDtype), on=key, how="left"
                    )
                else:
                    m = lt.to_pandas().merge(rt.to_pandas(), on=key, how="inner")  # per-batch
                if not len(m):
                    continue
                t = pa.Table.from_pandas(m, preserve_index=False)
            else:  # left join, absent right bucket: null right columns IN ARROW
                t = lt
                for c, ty in r_null_cols.items():
                    t = t.append_column(c, pa.nulls(len(t), ty))
            outs.append(t.select(out_schema.names).cast(out_schema))
        return pa.concat_tables(outs) if outs else empty

    plan = ray.data.from_items([{"b": b} for b in range(nb)]).repartition(nb)
    return plan.map_batches(fn, batch_format="pyarrow", num_cpus=num_cpus)
