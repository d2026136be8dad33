"""Output-stage sub-operators (reference ``_time_series_query_builder.py``):
pivot (``:385-427``), unpivot (``:837-855``), UoM metadata join (``:430-462``),
JSON output (``:465-490``), limit/offset pagination (``:465-490``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .common import grouped_map


def pivot(
    ds: ray.data.Dataset, tags: list[str], value_col: str = "Value"
) -> ray.data.Dataset:
    """Long (TagName, EventTime, Value) -> wide (EventTime, <tag>...), FIRST
    value per (EventTime, tag) like the reference's ``PIVOT (FIRST(Value))``.
    The tag list is known up front (reference requires it too)."""

    from .common import _arrow_add_bucket

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pivot_table per BUCKET of EventTimes — a per-group
        # Python row builder pays ~0.4ms per timestamp at high cardinality
        g = g.drop(columns=["_bucket"]).sort_values(
            ["EventTime", "TagName", value_col], kind="mergesort"
        )
        w = g.pivot_table(
            index="EventTime", columns="TagName", values=value_col, aggfunc="first"
        ).reset_index()
        for t in tags:
            if t not in w.columns:
                w[t] = None
        return w[["EventTime"] + list(tags)]

    return (
        ds.map_batches(_arrow_add_bucket(["EventTime"], 64), batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def unpivot(
    ds: ray.data.Dataset,
    value_cols: list[str],
    id_cols: list[str],
    var_name: str = "Aggregation",
    value_name: str = "Value",
) -> ray.data.Dataset:
    """Wide -> long rows, dropping NULL cells (reference UNPIVOT)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = df.melt(
            id_vars=id_cols, value_vars=value_cols, var_name=var_name, value_name=value_name
        )
        return out[out[value_name].notna()].reset_index(drop=True)

    return ds.map_batches(fn, batch_format="pandas")


def uom_join(
    ds: ray.data.Dataset, metadata: dict[str, str | None], tag_col: str = "TagName"
) -> ray.data.Dataset:
    """Append UoM by broadcast lookup (reference LEFT OUTER JOIN metadata —
    metadata is small, so it ships once via ray.put, no shuffle)."""
    ref = ray.put(dict(metadata))

    def fn(batch: pa.Table) -> pa.Table:
        meta = ray.get(ref)
        tags = batch[tag_col].to_numpy(zero_copy_only=False)
        uom = pa.array([meta.get(t) for t in tags.tolist()], pa.string())
        return batch.append_column("UoM", uom)

    return ds.map_batches(fn, batch_format="pyarrow")


def metadata_table(
    meta: dict[str, dict], tags: list[str] | None = None
) -> ray.data.Dataset:
    """Standalone metadata query (reference ``queries/metadata.py``:
    ``SELECT * FROM ..._metadata [WHERE TagName IN (...)]``): the metadata
    registry as a first-class Dataset with TagName/UoM/Step/Description."""
    names = sorted(meta) if tags is None else [t for t in sorted(meta) if t in set(tags)]
    rows = [meta[t] for t in names]
    t = pa.table(
        {
            "TagName": pa.array(names, pa.string()),
            "UoM": pa.array([r.get("UoM") for r in rows], pa.string()),
            "Step": pa.array([bool(r.get("Step", False)) for r in rows], pa.bool_()),
            "Description": pa.array([r.get("Description") for r in rows], pa.string()),
        }
    )
    return ray.data.from_arrow(t)


def to_json_rows(ds: ray.data.Dataset, ns_precision: bool = False) -> ray.data.Dataset:
    """One compact JSON string per PCDM row with fixed formatting
    (timestamps ``%Y-%m-%dT%H:%M:%S.%f``, values ``%.2f`` — stable across
    engines, unlike generic float repr).

    ``ns_precision``: the reference's 9-digit-fraction + offset format
    (``yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX``,
    ``_time_series_query_builder.py:470-477`` / ``api/v1/common.py:210``
    ``date_unit="ns"``); storage is µs so the three extra digits are zeros
    and the UTC offset prints as ``Z``."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["EventTime"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        if ns_precision:
            ts = ts + "000Z"
        vals = df["Value"].map(lambda v: "%.2f" % v)
        payload = (
            '{"TagName":"' + df["TagName"].astype(str)
            + '","t":"' + ts
            + '","v":"' + vals + '"}'
        )
        return pd.DataFrame({"payload": payload})

    return ds.map_batches(fn, batch_format="pandas")


def paginate(
    ds: ray.data.Dataset, sort_cols: list[str], limit: int, offset: int = 0
) -> pd.DataFrame:
    """ORDER BY + LIMIT/OFFSET (reference output stage), deep-offset safe.

    The sorted output's blocks stream back as ref bundles IN ORDER with row
    counts in their metadata, so the page is located with a driver-side
    prefix scan over COUNTS ONLY and exactly the overlapping blocks are
    fetched and sliced — the driver never materializes the ``offset`` rows
    before the page (the old ``sort().limit(offset+limit).to_pandas()``
    shipped all of them for every deep page)."""
    import pyarrow as pa

    from ray.data.block import BlockAccessor

    need_lo, need_hi = offset, offset + limit
    pieces: list[pd.DataFrame] = []
    pos = 0
    it = ds.sort(sort_cols).iter_internal_ref_bundles()
    for bundle in it:
        for block_ref, meta in bundle.blocks:
            n = meta.num_rows
            if n is None:  # metadata gap: count requires the block
                n = BlockAccessor.for_block(ray.get(block_ref)).num_rows()
            lo, hi = pos, pos + n
            if hi > need_lo and lo < need_hi and n:
                acc = BlockAccessor.for_block(ray.get(block_ref))
                a = max(need_lo - lo, 0)
                b = min(need_hi - lo, n)
                sliced = BlockAccessor.for_block(acc.slice(a, b, copy=False))
                pieces.append(sliced.to_pandas())  # bounded: page slice
            pos = hi
            if pos >= need_hi:
                break
        if pos >= need_hi:
            break
    if not pieces:
        schema = ds.schema()
        empty = pa.schema(
            list(zip(schema.names, schema.types))
        ).empty_table()
        return empty.to_pandas()  # bounded: typed empty page
    return pd.concat(pieces, ignore_index=True)
