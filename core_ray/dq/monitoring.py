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


def cusum_detection(
    ds: ray.data.Dataset,
    threshold_sigmas: int = 4,
    exact_decimals: int = 4,
) -> ray.data.Dataset:
    """Two-sided CUSUM drift detection per tag (Page 1954, the classic
    control-chart sibling of :func:`check_value_ranges`): cumulative sums
    of deviations from the TAG MEAN, reset at zero —
    ``s+_t = max(0, s+_{t-1} + (x_t - mu))`` and the mirrored ``s-`` —
    with an alarm when either exceeds ``threshold_sigmas * sigma``.

    Exactness: the recurrence is computed WITHOUT any loop or recursion —
    ``max(0, prev + d)`` over a stream equals ``cumsum(d) - running_min
    (cumsum(d))`` — on integers scaled by ``n`` (deviation*n = x_int*n -
    S), so both sides of the oracle are pure window functions on exact
    ints; sigma^2 uses the exact population form ``(n*Sxx - S^2) / n^2``.
    Floats appear only in the final literal op order.

    Output per row: ``(TagName, EventTime, Value, cusum_pos, cusum_neg,
    alarm)`` with the cusums de-scaled to value units (4 dp).

    Exact-parity envelope (same rule as ``linear_regression``): the
    de-scaled cusum cast to DOUBLE must stay < 2^53 — i.e.
    ``n * max|deviation| * 10^exact_decimals`` per tag — or the SQL
    HUGEINT->DOUBLE cast stops being correctly rounded.
    """
    scale = 10 ** exact_decimals

    def per_tag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([TS.TS_US, TS.VALUE], kind="mergesort").reset_index(drop=True)
        v = g[TS.VALUE].to_numpy().astype(np.float64)
        vi = np.round(round4(v) * scale).astype(np.int64)
        n = len(vi)
        S = int(vi.sum())
        d = vi * n - S  # deviation x n, exact ints
        c = np.cumsum(d)
        s_pos = c - np.minimum.accumulate(np.concatenate(([0], c)))[1:]
        s_neg = np.maximum.accumulate(np.concatenate(([0], c)))[1:] - c
        # population sigma^2 * n^2 * scale^2 as an exact int
        sxx = int((vi.astype(object) * vi.astype(object)).sum())
        var_num = n * sxx - S * S  # = n^2 * var * scale^2
        # literal float op order (shared with the oracle): de-scale by n,
        # compare against threshold * sqrt(var_num / n^2)... all x n here:
        # alarm iff s > T * n * sigma  <=>  s^2 > T^2 * var_num (exact ints)
        t2 = threshold_sigmas * threshold_sigmas
        alarm = (
            (s_pos.astype(object) * s_pos.astype(object) > t2 * var_num)
            | (s_neg.astype(object) * s_neg.astype(object) > t2 * var_num)
        ).astype(bool)
        denom = float(n * scale)
        return pd.DataFrame(
            {
                "TagName": g[TS.TAG],
                "EventTime": g[TS.TS_US].astype("datetime64[us]"),
                "Value": g[TS.VALUE],
                "cusum_pos": round4(s_pos.astype(np.float64) / denom),
                "cusum_neg": round4(s_neg.astype(np.float64) / denom),
                "alarm": alarm,
            }
        )

    from ..ops.common import grouped_map

    return grouped_map(ds, [TS.TAG], per_tag)
