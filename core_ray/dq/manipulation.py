"""Data-manipulation operators (reference
``data_quality/data_manipulation/spark/*`` — SURVEY.md §2.6).

All operate on the canonical normalized shape (TagName, ts_us, Status, Value)
produced by ``core_ray.ops.common.normalize``.

Scale patterns:
- stats-then-filter operators (k-sigma, normalization) are TWO-PASS: partial
  moments per batch → tiny merged stats table → broadcast via ``ray.put`` →
  vectorized filter/transform ``map_batches`` (reference computes the same
  stats with a Spark aggregate);
- ordered per-tag operators (interval filtering, flatline, imputation,
  smoothing) are ``groupby(TagName).map_groups`` over time-sorted groups —
  the reference's ``IntervalFiltering`` even does a driver-side collect()
  (``interval_filtering.py:89``); here the scan is distributed per key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..ops.common import TS, round4

CANON = [TS.TAG, TS.TS_US, TS.STATUS, TS.VALUE]


def _finalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[CANON].copy()
    out["EventTime"] = out[TS.TS_US].astype("datetime64[us]")
    return out[[TS.TAG, "EventTime", TS.STATUS, TS.VALUE]]


def duplicate_detection(ds: ray.data.Dataset, keys: list[str] | None = None) -> ray.data.Dataset:
    """Drop duplicate rows by key columns (reference ``DuplicateDetection`` =
    ``dropDuplicates``): hash-shuffle on the key, keep the first row (ties by
    full row sort for determinism)."""
    keys = keys or [TS.TAG, TS.TS_US]
    from ..ops.common import bucketed_distinct

    out = bucketed_distinct(ds, keys, CANON)
    return out.map_batches(_finalize, batch_format="pandas")


def interval_filtering(ds: ray.data.Dataset, interval_us: int) -> ray.data.Dataset:
    """Keep rows >= interval apart per tag (greedy forward scan, reference
    ``IntervalFiltering``). Inherently sequential per key — the last-emitted
    timestamp is carried through the scan."""

    def per_tag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([TS.TS_US, TS.VALUE], kind="mergesort")
        ts = g[TS.TS_US].to_numpy(dtype=np.int64)
        n = len(ts)
        if n == 0:
            return _finalize(g)
        keep = np.zeros(n, dtype=bool)
        if interval_us <= 0:  # degenerate keep-all: the jump scan would
            keep[:] = True    # never advance past equal timestamps
            return _finalize(g)
        # #emitted is bounded by span/interval + 1.  When that bound is far
        # below n (a hot tag being heavily downsampled — the op's primary
        # use), jump emit-to-emit with one searchsorted per EMIT (O(k log n))
        # instead of a Python compare per ROW; otherwise the linear scan's
        # ~100ns/row is already optimal for a near-keep-all pass.
        bound = (int(ts[-1]) - int(ts[0])) // interval_us + 1
        if bound * 16 < n:
            i = 0
            while i < n:
                keep[i] = True
                i = int(np.searchsorted(ts, ts[i] + interval_us, side="left"))
        else:
            last = None
            for i, t in enumerate(ts.tolist()):
                if last is None or t - last >= interval_us:
                    keep[i] = True
                    last = t
        return _finalize(g[keep])

    from ..ops.common import grouped_map

    return grouped_map(ds, [TS.TAG], per_tag)


def _tag_stats(ds: ray.data.Dataset) -> dict:
    """Per-tag (count, mean, sample std) via per-batch moment partials."""

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    TS.TAG: pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                    "sq": pa.array([], pa.float64()),
                }
            )
        t = batch.append_column("v2", pa.array(np.square(batch[TS.VALUE].to_numpy())))
        out = t.group_by([TS.TAG], use_threads=False).aggregate(
            [("Value", "count"), ("Value", "sum"), ("v2", "sum")]
        )
        return out.rename_columns([TS.TAG, "cnt", "s", "sq"])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()  # bounded: per-tag moment partials
    agg = parts.groupby(TS.TAG).agg(cnt=("cnt", "sum"), s=("s", "sum"), sq=("sq", "sum"))
    stats = {}
    for tag, r in agg.iterrows():
        n, s, sq = int(r["cnt"]), float(r["s"]), float(r["sq"])
        mean = s / n
        var = max((sq - n * mean * mean) / (n - 1), 0.0) if n > 1 else 0.0
        stats[tag] = {"n": n, "mean": mean, "std": float(np.sqrt(var))}
    return stats


def k_sigma_anomaly_filter(ds: ray.data.Dataset, k: float = 3.0) -> ray.data.Dataset:
    """Keep rows within k sample-standard-deviations of the per-tag mean
    (reference ``KSigmaAnomalyDetection``)."""
    stats_ref = ray.put(_tag_stats(ds))

    def filt(batch: pa.Table) -> pa.Table:
        stats = ray.get(stats_ref)
        tags = batch[TS.TAG].to_numpy(zero_copy_only=False)
        v = batch[TS.VALUE].to_numpy()
        mean = np.array([stats[t]["mean"] for t in tags.tolist()])
        std = np.array([stats[t]["std"] for t in tags.tolist()])
        keep = np.abs(v - mean) <= k * std
        out = batch.filter(pa.array(keep))
        return pa.table(
            {
                TS.TAG: out[TS.TAG],
                "EventTime": pc.cast(out[TS.TS_US], pa.timestamp("us")),
                TS.STATUS: out[TS.STATUS],
                TS.VALUE: out[TS.VALUE],
            }
        )

    return ds.map_batches(filt, batch_format="pyarrow")


def mad_anomaly_filter(ds: ray.data.Dataset, k: float = 3.0) -> ray.data.Dataset:
    """Keep rows within ``k`` median-absolute-deviations of the per-tag
    MEDIAN — the robust (breakdown-point-0.5) sibling of
    :func:`k_sigma_anomaly_filter`: one wild spike inflates a mean/std
    enough to mask other spikes, but barely moves median/MAD.

    Exactness: medians on both sides average the two middle doubles for
    even counts (numpy's ``(lo+hi)/2`` == DuckDB ``median``'s
    interpolation, bit-identical in IEEE), and the threshold compare is
    the same ``abs(v - med) <= k * mad`` product of identical doubles.

    Shape: pass 1 shuffles only the pruned (tag, value) pairs into
    per-tag groups for the exact medians (a tag's values co-locate; this
    is the exact arm — at per-tag cardinalities beyond one worker's heap
    you'd swap in the t-digest sketch family and accept its error bound);
    pass 2 is a broadcast-stats vectorized filter scan, no second
    shuffle."""

    def med_mad(g: pa.Table) -> pa.Table:
        if isinstance(g, pd.DataFrame):
            g = pa.Table.from_pandas(g, preserve_index=False)
        v = g[TS.VALUE].to_numpy(zero_copy_only=False)
        med = float(np.median(v))
        mad = float(np.median(np.abs(v - med)))
        return pa.table(
            {
                TS.TAG: pa.array([g[TS.TAG][0].as_py()], pa.string()),
                "med": pa.array([med], pa.float64()),
                "mad": pa.array([mad], pa.float64()),
            }
        )

    stats = (
        ds.select_columns([TS.TAG, TS.VALUE])
        .groupby(TS.TAG)
        .map_groups(med_mad, batch_format="pyarrow")
        .to_pandas()  # bounded: one row per tag
    )
    stats_ref = ray.put(
        {r[TS.TAG]: (r["med"], r["mad"]) for r in stats.to_dict("records")}
    )

    def filt(batch: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        tags = batch[TS.TAG].to_numpy(zero_copy_only=False)
        v = batch[TS.VALUE].to_numpy()
        med = np.array([st[t][0] for t in tags.tolist()])
        mad = np.array([st[t][1] for t in tags.tolist()])
        keep = np.abs(v - med) <= k * mad
        out = batch.filter(pa.array(keep))
        return pa.table(
            {
                TS.TAG: out[TS.TAG],
                "EventTime": pc.cast(out[TS.TS_US], pa.timestamp("us")),
                TS.STATUS: out[TS.STATUS],
                TS.VALUE: out[TS.VALUE],
            }
        )

    return ds.map_batches(filt, batch_format="pyarrow")


def out_of_range_filter(
    ds: ray.data.Dataset,
    lo: float,
    hi: float,
    tag_ranges: dict[str, tuple[float, float]] | None = None,
) -> ray.data.Dataset:
    """Delete rows outside [lo, hi] (per-tag override via ``tag_ranges``;
    reference ``OutOfRangeValueFilter``)."""
    ranges_ref = ray.put(tag_ranges or {})

    def filt(batch: pa.Table) -> pa.Table:
        rngs = ray.get(ranges_ref)
        v = batch[TS.VALUE].to_numpy()
        lo_a = np.full(len(v), lo)
        hi_a = np.full(len(v), hi)
        if rngs:
            # dictionary-encode the tag column and take per-CODE bounds — the
            # only Python loop is over distinct tags, not rows
            enc = pc.dictionary_encode(batch[TS.TAG].combine_chunks())
            codes = enc.indices.to_numpy().astype(np.int64)
            cats = enc.dictionary.to_pylist()
            lo_by_code = np.array([rngs.get(t, (lo, hi))[0] for t in cats])
            hi_by_code = np.array([rngs.get(t, (lo, hi))[1] for t in cats])
            lo_a = lo_by_code[codes]
            hi_a = hi_by_code[codes]
        out = batch.filter(pa.array((v >= lo_a) & (v <= hi_a)))
        return pa.table(
            {
                TS.TAG: out[TS.TAG],
                "EventTime": pc.cast(out[TS.TS_US], pa.timestamp("us")),
                TS.STATUS: out[TS.STATUS],
                TS.VALUE: out[TS.VALUE],
            }
        )

    return ds.map_batches(filt, batch_format="pyarrow")


def _runs(mask: np.ndarray):
    """(start_idx, end_idx_exclusive) of each True run."""
    if len(mask) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    d = np.diff(mask.astype(np.int8))
    starts = np.nonzero(d == 1)[0] + 1
    ends = np.nonzero(d == -1)[0] + 1
    if mask[0]:
        starts = np.concatenate([[0], starts])
    if mask[-1]:
        ends = np.concatenate([ends, [len(mask)]])
    return starts.astype(np.int64), ends.astype(np.int64)


def flatline_filter(ds: ray.data.Dataset, tolerance: int = 3) -> ray.data.Dataset:
    """Remove runs of null-or-zero values longer than ``tolerance`` per tag
    (reference ``FlatlineFilter``)."""

    def per_tag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([TS.TS_US, TS.VALUE], kind="mergesort").reset_index(drop=True)
        v = g[TS.VALUE].to_numpy()
        flat = np.isnan(v) | (v == 0)
        drop = np.zeros(len(g), dtype=bool)
        starts, ends = _runs(flat)
        for s, e in zip(starts, ends):
            if e - s > tolerance:
                drop[s:e] = True
        return _finalize(g[~drop])

    from ..ops.common import grouped_map

    return grouped_map(ds, [TS.TAG], per_tag)


def missing_value_imputation(
    ds: ray.data.Dataset, tolerance_pct: float = 25.0
) -> ray.data.Dataset:
    """Per tag: infer the dominant sampling interval (mode of consecutive
    deltas), insert timestamps into gaps that exceed it by more than
    ``tolerance_pct``, and impute values (scipy ``UnivariateSpline`` when
    available, else linear interpolation — reference
    ``MissingValueImputation``, scipy spline at ``:109-124``). Imputed rows
    get Status='Imputed'."""

    def per_tag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([TS.TS_US, TS.VALUE], kind="mergesort").reset_index(drop=True)
        ts = g[TS.TS_US].to_numpy()
        if len(ts) < 3:
            return _finalize(g)
        deltas = np.diff(ts)
        # mode of rounded-to-second deltas
        vals, counts = np.unique((deltas // 1_000_000) * 1_000_000, return_counts=True)
        step = int(vals[counts.argmax()])
        if step <= 0:
            return _finalize(g)
        limit = step * (1 + tolerance_pct / 100.0)
        gaps = deltas.astype(np.float64)
        gap_idx = np.nonzero(gaps > limit)[0]
        # vectorized fill: k points per gap, evenly spread — same arithmetic
        # as the scalar form (a + gap/(k+1)*(j+1), truncated), no Python loop
        # over the (possibly millions of) inserted points
        a_arr = ts[gap_idx].astype(np.float64)
        gap_arr = gaps[gap_idx]
        k_arr = np.round(gap_arr / step).astype(np.int64) - 1
        keep = k_arr > 0
        a_arr, gap_arr, k_arr = a_arr[keep], gap_arr[keep], k_arr[keep]
        total = int(k_arr.sum())
        if total == 0:
            return _finalize(g)
        actual = gap_arr / (k_arr + 1)
        j = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(k_arr)[:-1])), k_arr
        )
        new_ts = np.repeat(a_arr, k_arr) + np.repeat(actual, k_arr) * (j + 1)
        new_ts = np.sort(new_ts.astype(np.int64))
        try:
            from scipy.interpolate import UnivariateSpline

            spl = UnivariateSpline(ts.astype(float), g[TS.VALUE].to_numpy(), s=0, k=3)
            new_v = spl(new_ts.astype(float))
        except Exception:
            new_v = np.interp(new_ts, ts, g[TS.VALUE].to_numpy())
        add = pd.DataFrame(
            {
                TS.TAG: g[TS.TAG].iloc[0],
                TS.TS_US: new_ts,
                TS.STATUS: "Imputed",
                TS.VALUE: round4(new_v),
            }
        )
        return _finalize(
            pd.concat([g[CANON], add], ignore_index=True).sort_values(
                [TS.TS_US], kind="mergesort"
            )
        )

    from ..ops.common import grouped_map

    return grouped_map(ds, [TS.TAG], per_tag)


def gaussian_smoothing(
    ds: ray.data.Dataset, sigma: float = 2.0, mode: str = "temporal"
) -> ray.data.Dataset:
    """Gaussian smoothing (reference ``GaussianSmoothing``, scipy
    ``gaussian_filter1d``): numpy convolution with reflect padding.

    ``mode="temporal"`` smooths each tag's series along the time axis (the
    reference's ``Window.partitionBy(id_col).orderBy(timestamp_col)``);
    ``mode="spatial"`` smooths ACROSS tags at each timestamp (reference
    ``gaussian_smoothing.py:138-142``: partition by timestamp, order by id)
    — the cross-sensor arm.  Both are one ``grouped_map`` shuffle on the
    partition key; the convolution itself is identical."""
    if mode not in ("temporal", "spatial"):
        raise ValueError("mode must be either 'temporal' or 'spatial'")
    radius = max(1, int(4.0 * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    kernel = np.exp(-0.5 * (x / sigma) ** 2)
    kernel /= kernel.sum()

    def smooth(v: np.ndarray) -> np.ndarray:
        padded = np.concatenate([v[radius:0:-1], v, v[-2 : -radius - 2 : -1]])
        if len(padded) < len(v) + 2 * radius:  # series shorter than radius
            padded = np.pad(v, radius, mode="reflect") if len(v) > 1 else v.repeat(
                2 * radius + 1
            )
        return np.convolve(padded, kernel, mode="valid")[: len(v)]

    order = (
        [TS.TS_US, TS.VALUE] if mode == "temporal" else [TS.TAG, TS.TS_US, TS.VALUE]
    )

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort").reset_index(drop=True)
        v = g[TS.VALUE].to_numpy(dtype=np.float64)
        if len(v) == 0:
            return _finalize(g)
        g = g.copy()
        g[TS.VALUE] = round4(smooth(v))
        return _finalize(g)

    from ..ops.common import grouped_map

    key = [TS.TAG] if mode == "temporal" else [TS.TS_US]
    return grouped_map(ds, key, per_group)


# --- normalization ---------------------------------------------------------


def normalize(ds: ray.data.Dataset, method: str = "zscore"):
    """Normalize Value per tag; returns (dataset, params) where ``params``
    allows exact reversal via :func:`denormalize` (reference
    ``NormalizationBaseClass`` stores the same parameters)."""
    if method not in ("zscore", "minmax", "mean"):
        raise ValueError("method must be zscore | minmax | mean")
    stats = _tag_stats(ds)
    if method in ("minmax", "mean"):
        # need min/max too
        def mm_partial(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table(
                    {
                        TS.TAG: pa.array([], pa.string()),
                        "mn": pa.array([], pa.float64()),
                        "mx": pa.array([], pa.float64()),
                    }
                )
            out = batch.group_by([TS.TAG], use_threads=False).aggregate(
                [("Value", "min"), ("Value", "max")]
            )
            return out.rename_columns([TS.TAG, "mn", "mx"])

        mm = (
            ds.map_batches(mm_partial, batch_format="pyarrow")
            .to_pandas()  # bounded: per-tag min/max partials
            .groupby(TS.TAG)
            .agg(mn=("mn", "min"), mx=("mx", "max"))
        )
        for tag in stats:
            stats[tag]["min"] = float(mm.loc[tag, "mn"])
            stats[tag]["max"] = float(mm.loc[tag, "mx"])
    params = {"method": method, "stats": stats}
    return (
        ds.map_batches(_norm_transform(params, invert=False), batch_format="pyarrow"),
        params,
    )


def _stats_arrays(stats: dict) -> dict:
    """Columnarize the per-tag stats dict ONCE on the driver: a pandas Index
    over the tags plus aligned float64 arrays.  Per batch the tag column is
    resolved with one vectorized ``Index.get_indexer`` call and stats are
    gathered with numpy fancy indexing — no per-row dict lookups in the map
    stage.  The ``std or 1.0`` substitution is baked into the array so the
    arithmetic is bit-identical to the scalar formulation."""
    import pandas as pd

    tags = sorted(stats)
    get = lambda t, k: float(stats[t].get(k) if stats[t].get(k) is not None else np.nan)
    return {
        "index": pd.Index(tags),
        "mean": np.array([get(t, "mean") for t in tags], dtype=np.float64),
        "std": np.array([(stats[t].get("std") or 1.0) for t in tags], dtype=np.float64),
        "min": np.array([get(t, "min") for t in tags], dtype=np.float64),
        "max": np.array([get(t, "max") for t in tags], dtype=np.float64),
    }


def _norm_transform(params: dict, invert: bool):
    method = params["method"]
    arrs_ref = ray.put(_stats_arrays(params["stats"]))

    def transform(batch: pa.Table) -> pa.Table:
        a = ray.get(arrs_ref)
        tags = batch[TS.TAG].to_numpy(zero_copy_only=False)
        v = batch[TS.VALUE].to_numpy().astype(np.float64)
        pos = a["index"].get_indexer(tags)
        if (pos < 0).any():
            # -1 would silently gather the LAST tag's stats; the per-row
            # dict lookup this replaced raised for unknown tags — keep that
            missing = sorted(set(tags[pos < 0].tolist()))[:5]
            raise KeyError(f"no stats for tag(s) {missing}")
        if method == "zscore":
            mean, std = a["mean"][pos], a["std"][pos]
            nv = v * std + mean if invert else (v - mean) / std
        elif method == "minmax":
            mn, mx = a["min"][pos], a["max"][pos]
            rng = np.where(mx > mn, mx - mn, 1.0)
            nv = v * rng + mn if invert else (v - mn) / rng
        else:  # mean
            mean, mn, mx = a["mean"][pos], a["min"][pos], a["max"][pos]
            rng = np.where(mx > mn, mx - mn, 1.0)
            nv = v * rng + mean if invert else (v - mean) / rng
        return batch.set_column(
            batch.column_names.index(TS.VALUE), TS.VALUE, pa.array(nv)
        )

    return transform


def denormalize(ds: ray.data.Dataset, params: dict) -> ray.data.Dataset:
    """Exact reversal of :func:`normalize` given its params."""
    return ds.map_batches(_norm_transform(params, invert=True), batch_format="pyarrow")
