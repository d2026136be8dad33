"""DimensionalityReduction (reference
``data_quality/data_manipulation/spark/dimensionality_reduction.py:27`` —
SURVEY.md §2.6) and IdentifyMissingDataPattern (reference
``monitoring/spark/identify_missing_data_pattern.py:39`` — §2.7)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..ops.common import TS, round4


def dimensionality_reduction(
    ds: ray.data.Dataset,
    columns: list[str],
    threshold: float = 0.95,
) -> tuple[ray.data.Dataset, list[tuple[str, str, float]]]:
    """Drop numeric columns whose absolute Pearson correlation with an
    earlier column exceeds ``threshold`` (exact duplicates included at
    corr=1.0).  Returns (reduced dataset, [(kept, dropped, corr)]).

    Two-pass: one distributed moment pass (sums, squares, cross-products per
    batch — one partial row per batch), correlation matrix on the driver,
    then a projection ``map_batches``."""
    k = len(columns)

    def moments(batch: pa.Table) -> pa.Table:
        mat = np.stack(
            [batch[c].to_numpy(zero_copy_only=False).astype(np.float64) for c in columns],
            axis=1,
        )
        out = {"n": pa.array([float(len(mat))])}
        for i, c in enumerate(columns):
            out[f"s_{c}"] = pa.array([mat[:, i].sum()])
        for i in range(k):
            for j in range(i, k):
                out[f"x_{i}_{j}"] = pa.array([(mat[:, i] * mat[:, j]).sum()])
        return pa.table(out)

    parts = ds.map_batches(moments, batch_format="pyarrow").to_pandas().sum()  # bounded: moment partials
    n = parts["n"]
    mean = np.array([parts[f"s_{c}"] for c in columns]) / n
    cov = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            cov[i, j] = cov[j, i] = parts[f"x_{i}_{j}"] / n - mean[i] * mean[j]
    sd = np.sqrt(np.clip(np.diag(cov), 1e-30, None))
    corr = cov / np.outer(sd, sd)

    dropped: list[tuple[str, str, float]] = []
    drop_set: set[str] = set()
    for j in range(k):
        if columns[j] in drop_set:
            continue
        for i in range(j):
            if columns[i] in drop_set:
                continue
            if abs(corr[i, j]) >= threshold:
                dropped.append((columns[i], columns[j], float(round4(corr[i, j]))))
                drop_set.add(columns[j])
                break

    keep = [c for c in ds.schema().names if c not in drop_set]
    reduced = ds.select_columns(keep)
    return reduced, dropped


def identify_missing_data_pattern(
    ds: ray.data.Dataset,
    pattern_us: list[int],
    period_us: int,
    tolerance_us: int,
) -> ray.data.Dataset:
    """Expected-timestamp patterns vs actual (reference
    ``IdentifyMissingDataPattern``): for each period (e.g. each minute or
    hour) the series is expected to contain an event near ``period_start +
    offset`` for every offset in ``pattern_us``; report expected timestamps
    with no actual event within ``tolerance_us``.

    Per-tag pass: the expected spine is computed from the tag's observed time
    range (no shuffle beyond the per-tag grouping)."""
    offsets = np.asarray(sorted(pattern_us), dtype=np.int64)

    def per_tag(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g[TS.TS_US].to_numpy())
        if len(ts) == 0:
            return pd.DataFrame({"TagName": [], "ExpectedTime": [], "nearest_diff_s": []})
        p0 = (ts[0] // period_us) * period_us
        p1 = (ts[-1] // period_us) * period_us
        periods = np.arange(p0, p1 + 1, period_us, dtype=np.int64)
        expected = (periods[:, None] + offsets[None, :]).ravel()
        pos = np.searchsorted(ts, expected)
        prev = np.clip(pos - 1, 0, len(ts) - 1)
        nxt = np.clip(pos, 0, len(ts) - 1)
        nearest = np.minimum(
            np.abs(expected - ts[prev]), np.abs(ts[nxt] - expected)
        )
        missing = nearest > tolerance_us
        return pd.DataFrame(
            {
                "TagName": g[TS.TAG].iloc[0],
                "ExpectedTime": expected[missing].astype("datetime64[us]"),
                "nearest_diff_s": round4(nearest[missing] / 1e6),
            }
        )

    from ..ops.common import grouped_map

    return grouped_map(ds, [TS.TAG], per_tag)
