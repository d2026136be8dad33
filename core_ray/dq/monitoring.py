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
    ds: ray.data.Dataset,
    lo: float | None = None,
    hi: float | None = None,
    tag_ranges: dict[str, dict] | None = None,
) -> ray.data.Dataset:
    """Rows whose Value falls outside the expected range (reference
    ``CheckValueRanges`` logs them; here they ARE the output).

    Either a global ``[lo, hi]`` or per-tag ``tag_ranges`` — a dict of
    ``{tag: {"min": m, "max": M, "inclusive_bounds": bool}}`` exactly like
    the reference (``check_value_ranges.py:42-47,171-179``): inclusive bounds
    flag ``Value < min OR Value > max``; exclusive bounds flag
    ``Value <= min OR Value >= max``; tags absent from the dict are ignored.
    The per-tag lookup is three vectorized ``Series.map`` calls per batch —
    no per-row Python."""
    if tag_ranges is not None:
        import pandas as pd

        min_map = {t: float(r.get("min", -np.inf)) for t, r in tag_ranges.items()}
        max_map = {t: float(r.get("max", np.inf)) for t, r in tag_ranges.items()}
        inc_map = {
            t: bool(r.get("inclusive_bounds", True)) for t, r in tag_ranges.items()
        }

        def mask_of(batch: pa.Table) -> np.ndarray:
            s = pd.Series(batch[TS.TAG].to_numpy(zero_copy_only=False))
            v = batch[TS.VALUE].to_numpy()
            known = s.isin(min_map).to_numpy()
            mn = s.map(min_map).to_numpy(dtype=np.float64, na_value=np.nan)
            mx = s.map(max_map).to_numpy(dtype=np.float64, na_value=np.nan)
            inc = s.map(inc_map).to_numpy(dtype=np.float64, na_value=1.0) == 1.0
            with np.errstate(invalid="ignore"):
                out = np.where(inc, (v < mn) | (v > mx), (v <= mn) | (v >= mx))
            return known & out

    else:

        def mask_of(batch: pa.Table) -> np.ndarray:
            v = batch[TS.VALUE].to_numpy()
            return (v < lo) | (v > hi)

    def filt(batch: pa.Table) -> pa.Table:
        out = batch.filter(pa.array(mask_of(batch)))
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
