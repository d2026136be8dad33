"""Per-batch parsers/normalizers — the "normalize" half of the reference's
normalize-then-merge ingestion (SURVEY.md §2.4).

``json_to_pcdm`` is the canonical configurable parser replacing the
reference's per-vendor transformer zoo
(``transformers/spark/opc_publisher_opcua_json_to_pcdm.py:32,125-170`` and
siblings): JSON decode, optional array explode, dotted-path field extraction,
multi-format timestamp coalesce, ValueType inference by float-castability,
status/changetype defaults.  One config per vendor instead of one class per
vendor.
"""

from __future__ import annotations

import json

from ._json import loads as _loads
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def binary_to_string(ds: ray.data.Dataset, column: str, encoding: str = "utf-8") -> ray.data.Dataset:
    """Cast a binary column to string (reference ``BinaryToStringTransformer``,
    ``transformers/spark/binary_to_string.py:21``)."""

    def fn(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index(column)
        return batch.set_column(i, column, pc.cast(batch[column], pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


@dataclass
class JsonToPcdmConfig:
    """Field mapping for one vendor's JSON payload."""

    json_column: str = "body"
    explode_path: str | None = None  # path to a list of readings; None = row is one reading
    tag_path: str = "TagName"
    time_path: str = "EventTime"
    value_path: str = "Value"
    status_path: str | None = None
    default_status: str = "Good"
    default_change_type: str = "upsert"
    # timestamp formats tried in order (reference coalesces several)
    time_formats: tuple = ("%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S")
    extra_defaults: dict = field(default_factory=dict)


def _get_path(obj, path: str):
    cur = obj
    for part in path.split("."):
        if cur is None:
            return None
        if isinstance(cur, dict):
            cur = cur.get(part)
        else:
            return None
    return cur


def _parse_time(val, formats) -> np.datetime64 | None:
    if val is None:
        return None
    if isinstance(val, (int, float)):
        # epoch seconds or ms heuristic
        v = float(val)
        if v > 1e12:
            return np.datetime64(int(v * 1000), "us")  # ms epoch
        return np.datetime64(int(v * 1_000_000), "us")  # s epoch
    s = str(val).rstrip("Z")
    for fmt in formats:
        try:
            import datetime as _dt

            return np.datetime64(_dt.datetime.strptime(s, fmt), "us")
        except ValueError:
            continue
    try:
        return np.datetime64(s, "us")
    except ValueError:
        return None


def json_to_pcdm(ds: ray.data.Dataset, cfg: JsonToPcdmConfig) -> ray.data.Dataset:
    """Vendor JSON -> 6-column PCDM CDC rows (TagName, EventTime, Status,
    Value:string, ValueType, ChangeType).  ValueType inferred per value by
    float-castability (reference ``opc_publisher_opcua_json_to_pcdm.py``)."""

    def infer_value_type(v) -> str:
        if isinstance(v, bool):
            return "string"
        if isinstance(v, int):
            return "integer"
        if isinstance(v, float):
            return "float"
        try:
            f = float(v)
            return "integer" if float(int(f)) == f and "." not in str(v) else "float"
        except (TypeError, ValueError):
            return "string"

    def fn(batch: pa.Table) -> pa.Table:
        tags, times, statuses, values, vtypes, ctypes = [], [], [], [], [], []
        for raw in batch[cfg.json_column].to_pylist():
            if raw is None:
                continue
            if isinstance(raw, (bytes, bytearray)):
                raw = raw.decode("utf-8", errors="replace")
            try:
                obj = _loads(raw) if isinstance(raw, str) else raw
            except json.JSONDecodeError:
                continue
            readings = _get_path(obj, cfg.explode_path) if cfg.explode_path else [obj]
            if not isinstance(readings, list):
                readings = [readings]
            for r in readings:
                if not isinstance(r, dict):
                    continue
                tag = _get_path(r, cfg.tag_path)
                t = _parse_time(_get_path(r, cfg.time_path), cfg.time_formats)
                if tag is None or t is None:
                    continue
                v = _get_path(r, cfg.value_path)
                st = (
                    _get_path(r, cfg.status_path) if cfg.status_path else None
                ) or cfg.default_status
                tags.append(str(tag))
                times.append(t)
                statuses.append(str(st))
                values.append("" if v is None else str(v))
                vtypes.append(infer_value_type(v))
                ctypes.append(cfg.default_change_type)
        return pa.table(
            {
                "TagName": pa.array(tags, pa.string()),
                "EventTime": pa.array(times, pa.timestamp("us")),
                "Status": pa.array(statuses, pa.string()),
                "Value": pa.array(values, pa.string()),
                "ValueType": pa.array(vtypes, pa.string()),
                "ChangeType": pa.array(ctypes, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def pcdm_to_json(ds: ray.data.Dataset, wrap_key: str = "payload") -> ray.data.Dataset:
    """PCDM rows -> one JSON string per row (reference
    ``PCDMToHoneywellAPMTransformer`` direction; 9-digit-fraction timestamps
    like the reference's to_json output stage).

    Vectorized per COLUMN instead of per row-dict: keys are the (sorted)
    schema so the object skeleton is concatenated with pandas string
    kernels.  Per-dtype value rendering reproduces the old per-row
    ``json.dumps(itertuples()._asdict(), sort_keys=True, default=str)``
    BYTES exactly (byte-parity test in test_vendors) — itertuples hands
    back PYTHON ints/bools/floats, so ints and bools render bare and
    floats keep stdlib repr including the ``NaN``/``Infinity`` literals."""

    def fn(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()  # per-batch
        pieces = []
        for k in sorted(df.columns):
            s = df[k]
            if pd.api.types.is_datetime64_any_dtype(s):
                sv = '"' + s.dt.strftime("%Y-%m-%dT%H:%M:%S.%f") + '000Z"'
                sv = sv.where(s.notna(), '"NaT"')  # default=str on NaT
            elif pd.api.types.is_bool_dtype(s):
                sv = s.map({True: "true", False: "false"})
            elif pd.api.types.is_float_dtype(s):
                # stdlib float repr incl. NaN/Infinity literals
                sv = s.map(lambda v: json.dumps(float(v)))
            elif pd.api.types.is_integer_dtype(s):
                sv = s.astype(str)
            else:
                sv = s.map(
                    lambda v: "null" if v is None else json.dumps(str(v))
                )
            pieces.append(json.dumps(k) + ": " + sv)
        payload = pieces[0]
        for p in pieces[1:]:
            payload = payload + ", " + p
        payload = "{" + payload + "}"
        return pa.table({wrap_key: pa.array(payload.to_numpy(), pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def wide_to_mdm(
    ds: ray.data.Dataset,
    value_columns: list[str],
    timestamp_column: str,
    series_prefix: str = "",
) -> ray.data.Dataset:
    """Wide load columns -> long MDM usage rows (reference
    ``BaseRawToMDMTransformer._get_transformed_df``,
    ``transformers/spark/base_raw_to_mdm.py:129-151``): melt each value column
    into (Uid, SeriesId, Timestamp, IntervalTimestamp, Value)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ts = pc.cast(batch[timestamp_column], pa.timestamp("us"))
        uids, sids, tss, vals = [], [], [], []
        for col in value_columns:
            v = pc.cast(batch[col], pa.float64())
            sid = f"{series_prefix}{col}"
            uids.append(pa.array([sid] * n, pa.string()))
            sids.append(pa.array([sid] * n, pa.string()))
            tss.append(ts)
            vals.append(v)
        return pa.table(
            {
                "Uid": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in uids]),
                "SeriesId": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in sids]),
                "Timestamp": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in tss]),
                "IntervalTimestamp": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in tss]),
                "Value": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in vals]),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
