"""Monitoring operators (reference ``data_quality/monitoring/spark/*`` —
SURVEY.md §2.7): emit findings datasets rather than modify data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..ops.common import TS, round4
from .manipulation import _runs


def check_value_ranges(
    ds: ray.data.Dataset, lo: float, hi: float
) -> ray.data.Dataset:
    """Rows whose Value falls outside [lo, hi] (reference
    ``CheckValueRanges`` logs them; here they ARE the output)."""

    def filt(batch: pa.Table) -> pa.Table:
        v = batch[TS.VALUE].to_numpy()
        out = batch.filter(pa.array((v < lo) | (v > hi)))
        return pa.table(
            {
                TS.TAG: out[TS.TAG],
                "EventTime": pc.cast(out[TS.TS_US], pa.timestamp("us")),
                TS.VALUE: out[TS.VALUE],
            }
        )

    return ds.map_batches(filt, batch_format="pyarrow")


def flatline_detection(ds: ray.data.Dataset, tolerance: int = 3) -> ray.data.Dataset:
    """Per-tag runs of null-or-zero values of length >= tolerance (reference
    ``FlatlineDetection``): one finding row per run."""

    def per_tag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([TS.TS_US, TS.VALUE], kind="mergesort").reset_index(drop=True)
        v = g[TS.VALUE].to_numpy()
        ts = g[TS.TS_US].to_numpy()
        flat = np.isnan(v) | (v == 0)
        starts, ends = _runs(flat)
        rows = [
            (g[TS.TAG].iloc[0], ts[s], ts[e - 1], int(e - s))
            for s, e in zip(starts, ends)
            if e - s >= tolerance
        ]
        out = pd.DataFrame(rows, columns=["TagName", "start_us", "end_us", "run_length"])
        out["RunStart"] = out["start_us"].astype("datetime64[us]")
        out["RunEnd"] = out["end_us"].astype("datetime64[us]")
        return out[["TagName", "RunStart", "RunEnd", "run_length"]].astype(
            {"run_length": "int64"}
        )

    from ..ops.common import grouped_map

    return grouped_map(ds, [TS.TAG], per_tag)


def identify_missing_intervals(
    ds: ray.data.Dataset, interval_us: int, tolerance_us: int = 0
) -> ray.data.Dataset:
    """Per-tag gaps between consecutive events larger than
    ``interval + tolerance`` (reference ``IdentifyMissingDataInterval``)."""

    def per_tag(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g[TS.TS_US].to_numpy())
        gaps = np.diff(ts)
        bad = np.nonzero(gaps > interval_us + tolerance_us)[0]
        return pd.DataFrame(
            {
                "TagName": g[TS.TAG].iloc[0],
                "GapStart": ts[bad].astype("datetime64[us]"),
                "GapEnd": ts[bad + 1].astype("datetime64[us]"),
                "gap_seconds": round4(gaps[bad] / 1e6),
            }
        )

    from ..ops.common import grouped_map

    return grouped_map(ds, [TS.TAG], per_tag)


def moving_average(ds: ray.data.Dataset, window: int = 5) -> ray.data.Dataset:
    """Per-tag rolling mean over the previous ``window`` rows including the
    current one (reference ``MovingAverage``: ``rowsBetween(-(w-1), 0)``)."""

    def per_tag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([TS.TS_US, TS.VALUE], kind="mergesort").reset_index(drop=True)
        ma = g[TS.VALUE].rolling(window=window, min_periods=1).mean()
        return pd.DataFrame(
            {
                "TagName": g[TS.TAG],
                "EventTime": g[TS.TS_US].astype("datetime64[us]"),
                "Value": round4(ma.to_numpy()),
            }
        )

    from ..ops.common import grouped_map

    return grouped_map(ds, [TS.TAG], per_tag)
