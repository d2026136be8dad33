"""Forecasting / ML operators (reference ``forecasting/spark/*`` —
SURVEY.md §2.8), numpy-based (no MLlib):

- ``linear_regression``: per-tag OLS on (t, value) via lstsq, extend the
  series with ``horizon`` forecast points (reference ``LinearRegression``).
- ``arima_forecast``: statsmodels ARIMA when importable, else an AR(1)+trend
  fallback — the sandbox has no statsmodels, so the fallback is the tested
  path (reference ``ArimaPrediction``; import-gated per environment rules).
- ``data_binning``: k-means binning of Value per tag (reference
  ``DataBinning``), centroids from a seeded numpy k-means.
- ``knn_regressor``: predict value at requested timestamps as the mean of the
  k nearest (by time) observations (reference ``KNearestNeighbors`` shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..ops.common import TS, round4


def linear_regression(
    ds: ray.data.Dataset, horizon: int = 5, step_us: int | None = None,
    exact_decimals: int | None = None, x_unit_us: int = 1,
) -> ray.data.Dataset:
    """Fit value ~ a + b*t per tag; append ``horizon`` forecast rows with
    Status='Forecast' (step inferred from the median delta if not given).

    ``exact_decimals``: compute the closed-form OLS from EXACT integer sums
    (values as fixed-point ints, time as ``x_unit_us`` offsets, final combine
    in arbitrary-precision Python ints) so the coefficients — and therefore
    the forecasts — are bit-identical to a DuckDB formulation at any
    parallelism (lstsq's float accumulation order is not).  For exact parity
    every derived integer must stay < 2^53 (DuckDB's HUGEINT→DOUBLE cast is
    not correctly rounded above that — measured ~1% off-by-one-ulp), so pick
    ``x_unit_us`` to keep offsets small (e.g. a day for daily-resampled
    input)."""

    def per_tag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([TS.TS_US, TS.VALUE], kind="mergesort").reset_index(drop=True)
        ts = g[TS.TS_US].to_numpy().astype(np.float64)
        v = g[TS.VALUE].to_numpy().astype(np.float64)
        if len(ts) < 2:
            fut = pd.DataFrame(columns=["TagName", "EventTime", "Status", "Value"])
        elif exact_decimals is not None:
            ti = g[TS.TS_US].to_numpy()
            t0 = int(ti[0])
            x = ((ti - t0) // x_unit_us).astype(np.int64)
            scale10 = 10 ** exact_decimals
            vc = np.round(v * scale10).astype(np.int64)
            n = len(x)
            # per-element products fit int64; totals go through Python ints
            Sx, Sv = int(x.sum()), int(vc.sum())
            Sxx = sum(int(a) * int(a) for a in x)
            Sxv = sum(int(a) * int(b) for a, b in zip(x, vc))
            den = n * Sxx - Sx * Sx
            step = step_us or int(np.median(np.diff(ti)))
            fut_ts = ti[-1] + step * np.arange(1, horizon + 1)
            if den == 0:
                fut_v = np.full(horizon, (Sv / n) / scale10)
            else:
                # the exact op order the oracle mirrors: two int ratios, then
                # a + b*x, then the fixed-point descale, then round_even
                a = (Sv * Sxx - Sx * Sxv) / den
                b = (n * Sxv - Sx * Sv) / den
                fut_x = ((fut_ts - t0) // x_unit_us).astype(np.float64)
                fut_v = (a + b * fut_x) / scale10
            fut = pd.DataFrame(
                {
                    "TagName": g[TS.TAG].iloc[0],
                    "EventTime": fut_ts.astype(np.int64).astype("datetime64[us]"),
                    "Status": "Forecast",
                    "Value": round4(fut_v),
                }
            )
        else:
            t0, scale = ts[0], max(ts[-1] - ts[0], 1.0)
            x = (ts - t0) / scale
            A = np.stack([np.ones_like(x), x], axis=1)
            coef, *_ = np.linalg.lstsq(A, v, rcond=None)
            step = step_us or int(np.median(np.diff(ts)))
            fut_ts = ts[-1] + step * np.arange(1, horizon + 1)
            fut_x = (fut_ts - t0) / scale
            fut_v = coef[0] + coef[1] * fut_x
            fut = pd.DataFrame(
                {
                    "TagName": g[TS.TAG].iloc[0],
                    "EventTime": fut_ts.astype(np.int64).astype("datetime64[us]"),
                    "Status": "Forecast",
                    "Value": round4(fut_v),
                }
            )
        hist = pd.DataFrame(
            {
                "TagName": g[TS.TAG],
                "EventTime": g[TS.TS_US].astype("datetime64[us]"),
                "Status": g[TS.STATUS],
                "Value": g[TS.VALUE],
            }
        )
        return pd.concat([hist, fut], ignore_index=True)

    from ..ops.common import grouped_map

    return grouped_map(ds, [TS.TAG], per_tag)


def arima_forecast(
    ds: ray.data.Dataset, horizon: int = 5, exact_decimals: int | None = None
) -> ray.data.Dataset:
    """ARIMA per tag when statsmodels exists; otherwise a deterministic
    AR(1)-with-drift fallback. Only forecast rows are returned.

    ``exact_decimals`` (fallback path): the AR(1) moment sums are computed on
    fixed-point ints and combined in arbitrary-precision Python ints (the
    mean-centered cross/auto products expand to integer polynomials in the
    raw sums), with every term kept < 2^53 so the oracle's HUGEINT→DOUBLE
    casts are exact — same contract as ``linear_regression``."""

    def per_tag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([TS.TS_US, TS.VALUE], kind="mergesort").reset_index(drop=True)
        v = g[TS.VALUE].to_numpy().astype(np.float64)
        ts = g[TS.TS_US].to_numpy()
        if len(v) < 3:
            return pd.DataFrame(columns=["TagName", "EventTime", "Value"])
        step = int(np.median(np.diff(ts)))
        if exact_decimals is not None:
            scale10 = 10 ** exact_decimals
            vc = np.round(v * scale10).astype(np.int64)
            n = len(vc)
            Sv = int(vc.sum())
            Sv1, Sv0 = int(vc[1:].sum()), int(vc[:-1].sum())
            Svv = sum(int(a) * int(b) for a, b in zip(vc[1:], vc[:-1]))
            S00 = sum(int(a) * int(a) for a in vc[:-1])
            # n^2 * sum((v_t-mu)(v_{t-1}-mu)) and n^2 * sum((v_{t-1}-mu)^2)
            num = n * n * Svv - n * Sv * (Sv1 + Sv0) + (n - 1) * Sv * Sv
            den = n * n * S00 - 2 * n * Sv * Sv0 + (n - 1) * Sv * Sv
            phi = float(num) / float(den) if den > 0 else 0.0
            phi = min(max(phi, -0.999), 0.999)
            mu_c = float(Sv) / n
            preds_c, last_c = [], float(vc[-1])
            for _ in range(horizon):
                last_c = mu_c + phi * (last_c - mu_c)
                preds_c.append(last_c)
            preds = np.array(preds_c) / scale10
        else:
            try:
                from statsmodels.tsa.arima.model import ARIMA

                fit = ARIMA(v, order=(1, 0, 0)).fit()
                preds = np.asarray(fit.forecast(horizon))
            except Exception:
                # AR(1) with drift: v_t - mu = phi (v_{t-1} - mu)
                mu = v.mean()
                c = v - mu
                denom = float(c[:-1] @ c[:-1])
                phi = float(c[1:] @ c[:-1]) / denom if denom > 0 else 0.0
                phi = float(np.clip(phi, -0.999, 0.999))
                preds, last = [], v[-1]
                for _ in range(horizon):
                    last = mu + phi * (last - mu)
                    preds.append(last)
                preds = np.array(preds)
        fut_ts = ts[-1] + step * np.arange(1, horizon + 1)
        return pd.DataFrame(
            {
                "TagName": g[TS.TAG].iloc[0],
                "EventTime": fut_ts.astype(np.int64).astype("datetime64[us]"),
                "Value": round4(preds),
            }
        )

    from ..ops.common import grouped_map

    return grouped_map(ds, [TS.TAG], per_tag)


def arima_auto_forecast(
    ds: ray.data.Dataset,
    horizon: int = 5,
    max_p: int = 3,
    max_q: int = 2,
    seasonal: bool = False,
) -> ray.data.Dataset:
    """Auto-order ARIMA per tag (reference ``forecasting/spark/auto_arima.py:23``:
    try (p, q) combinations, keep the minimal-AIC model).

    With statsmodels present the (p, d<=1, q) grid is fit exactly; otherwise
    the deterministic fallback searches AR(p) least-squares fits for p in
    0..max_p and scores them with AIC = n*ln(rss/n) + 2(p+1) — a real order
    search, not a fixed order."""

    def per_tag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([TS.TS_US, TS.VALUE], kind="mergesort").reset_index(drop=True)
        v = g[TS.VALUE].to_numpy().astype(np.float64)
        ts = g[TS.TS_US].to_numpy()
        if len(v) < max_p + 3:
            return pd.DataFrame(columns=["TagName", "EventTime", "Value", "order"])
        step = int(np.median(np.diff(ts)))
        best = None
        try:
            from statsmodels.tsa.arima.model import ARIMA

            for p in range(max_p + 1):
                for d in (0, 1):
                    for q in range(max_q + 1):
                        if p == 0 and q == 0:
                            continue
                        try:
                            fit = ARIMA(v, order=(p, d, q)).fit()
                            if best is None or fit.aic < best[0]:
                                best = (fit.aic, (p, d, q), np.asarray(fit.forecast(horizon)))
                        except Exception:
                            continue
        except ImportError:
            for p in range(max_p + 1):
                n = len(v) - p
                if p == 0:
                    resid = v - v.mean()
                    coefs = np.array([v.mean()])
                else:
                    X = np.column_stack(
                        [np.ones(n)] + [v[p - i - 1 : len(v) - i - 1] for i in range(p)]
                    )
                    y = v[p:]
                    coefs, *_ = np.linalg.lstsq(X, y, rcond=None)
                    resid = y - X @ coefs
                rss = float(resid @ resid)
                aic = n * np.log(max(rss / n, 1e-300)) + 2 * (p + 1)
                if best is None or aic < best[0]:
                    # recursive forecast with the fitted AR(p)
                    hist = list(v)
                    preds = []
                    for _ in range(horizon):
                        if p == 0:
                            nxt = coefs[0]
                        else:
                            lags = np.array(hist[-p:][::-1])
                            nxt = coefs[0] + float(lags @ coefs[1:])
                        preds.append(nxt)
                        hist.append(nxt)
                    best = (aic, (p, 0, 0), np.array(preds))
        aic, order, preds = best
        fut_ts = ts[-1] + step * np.arange(1, horizon + 1)
        return pd.DataFrame(
            {
                "TagName": g[TS.TAG].iloc[0],
                "EventTime": fut_ts.astype(np.int64).astype("datetime64[us]"),
                "Value": round4(preds),
                "order": [f"{order[0]},{order[1]},{order[2]}"] * horizon,
            }
        )

    from ..ops.common import grouped_map

    return grouped_map(ds, [TS.TAG], per_tag)


def data_binning(
    ds: ray.data.Dataset,
    n_bins: int = 4,
    iters: int = 10,
    exact_decimals: int | None = None,
) -> ray.data.Dataset:
    """Assign each row a k-means bin of its Value per tag (seeded, 1-D).

    ``exact_decimals``: run Lloyd's iterations in EXACT integer arithmetic
    — values as fixed-point ints, centroids as (sum, count) rational pairs,
    nearest-centroid via cross-multiplied comparisons
    ``|v*n_c - S_c| * n_b  <  |v*n_b - S_b| * n_c`` (ties to the lowest
    index), init = disc-quantile seeds (rank ``max(1, ceil(j*n/(k-1)))``)
    — so the whole k-means TRACE is bit-reproducible by a chained-CTE SQL
    replay; no float appears anywhere in the exact arm.  Envelope: every
    cross product must fit int64 — ``max|v*n - S| * n < 2^63``.  Empty
    clusters carry their previous (sum, count) centroid, as in the float
    arm."""

    def _exact_assign(vi: np.ndarray, cents: list[tuple[int, int]]) -> np.ndarray:
        best = np.zeros(len(vi), dtype=np.int64)
        d_best = np.abs(vi * cents[0][1] - cents[0][0])
        n_best = np.full(len(vi), cents[0][1], dtype=np.int64)
        for c in range(1, len(cents)):
            s_c, n_c = cents[c]
            d_c = np.abs(vi * n_c - s_c)
            win = d_c * n_best < d_best * n_c  # strict: ties keep lower idx
            best[win] = c
            d_best = np.where(win, d_c, d_best)
            n_best = np.where(win, n_c, n_best)
        return best

    def per_tag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([TS.TS_US, TS.VALUE], kind="mergesort").reset_index(drop=True)
        v = g[TS.VALUE].to_numpy().astype(np.float64)
        if exact_decimals is not None:
            scale = 10 ** exact_decimals
            vi = np.round(round4(v) * scale).astype(np.int64)
            n = len(vi)
            k = min(n_bins, n)
            sv = np.sort(vi)
            if k == 1:
                cents = [(int(sv[0]), 1)]
            else:
                cents = [
                    (int(sv[max(1, -((-j * n) // (k - 1))) - 1]), 1)
                    for j in range(k)
                ]
            for _ in range(iters):
                assign = _exact_assign(vi, cents)
                new_c = []
                for c in range(k):
                    m = assign == c
                    new_c.append(
                        (int(vi[m].sum()), int(m.sum())) if m.any() else cents[c]
                    )
                cents = new_c
            assign = _exact_assign(vi, cents)
        else:
            # float arm: quantile seeds + float means (not SQL-replayable —
            # use exact_decimals for oracle parity)
            cents = np.quantile(v, np.linspace(0, 1, min(n_bins, len(v))))
            for _ in range(iters):
                assign = np.abs(v[:, None] - cents[None, :]).argmin(axis=1)
                for c in range(len(cents)):
                    m = v[assign == c]
                    if len(m):
                        cents[c] = m.mean()
            assign = np.abs(v[:, None] - cents[None, :]).argmin(axis=1)
        return pd.DataFrame(
            {
                "TagName": g[TS.TAG],
                "EventTime": g[TS.TS_US].astype("datetime64[us]"),
                "Value": g[TS.VALUE],
                "bin": assign.astype(np.int64),
            }
        )

    from ..ops.common import grouped_map

    return grouped_map(ds, [TS.TAG], per_tag)


def knn_regressor(
    ds: ray.data.Dataset, timestamps_us: list[int], k: int = 5,
    exact_decimals: int | None = None,
) -> ray.data.Dataset:
    """Predict Value at requested timestamps as the mean of the k
    time-nearest observations per tag.

    ``exact_decimals``: deterministic neighbor choice (sorted by
    ``(distance, ts)`` rather than argpartition's arbitrary tie order) and an
    exact integer-cent mean — bit-reproducible in SQL."""
    req = np.asarray(sorted(timestamps_us), dtype=np.int64)

    def per_tag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([TS.TS_US, TS.VALUE], kind="mergesort")
        ts = g[TS.TS_US].to_numpy()
        v = g[TS.VALUE].to_numpy()
        preds = []
        if exact_decimals is not None:
            scale10 = 10 ** exact_decimals
            vc = np.round(v * scale10).astype(np.int64)
            for t in req.tolist():
                d = np.abs(ts - t)
                kk = min(k, len(d))
                nn = np.lexsort((ts, d))[:kk]
                preds.append(float(int(vc[nn].sum())) / kk / scale10)
        else:
            for t in req.tolist():
                d = np.abs(ts - t)
                nn = np.argpartition(d, min(k, len(d)) - 1)[:k]
                preds.append(v[nn].mean())
        return pd.DataFrame(
            {
                "TagName": g[TS.TAG].iloc[0],
                "EventTime": req.astype("datetime64[us]"),
                "Value": round4(np.array(preds)),
            }
        )

    from ..ops.common import grouped_map

    return grouped_map(ds, [TS.TAG], per_tag)


def holt_forecast(
    ds: ray.data.Dataset,
    horizon: int = 3,
    step_us: int = 86_400_000_000,
    alpha: float = 0.5,
    beta: float = 0.25,
) -> ray.data.Dataset:
    """Holt double exponential smoothing (level + linear trend) per tag,
    emitting ``horizon`` forecast rows: ``l_t = a*x_t + (1-a)*(l+b)``,
    ``b_t = g*(l_t - l) + (1-g)*b``, forecast ``l_n + h*b_n`` — the classic
    trend sibling of the reference's Arima/LinearRegression family.

    Exactness: ``alpha``/``beta`` default to exactly-representable binary
    fractions and the recurrence is coded with the literal op order a SQL
    RECURSIVE CTE replays (one iteration per input step, all float64), so
    the 4-dp outputs are bit-reproducible.  Init: ``l_1 = a*x_1 +
    (1-a)*(x_0 + (x_1 - x_0))``, ``b`` seeded from the first difference.

    Input series should be regular (e.g. resample output); tags with < 2
    points emit nothing.  Scale: the recurrence is inherently sequential
    per SERIES — tags parallelize across the pool, like every forecaster
    here.
    """

    def per_tag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([TS.TS_US, TS.VALUE], kind="mergesort").reset_index(drop=True)
        v = g[TS.VALUE].to_numpy().astype(np.float64)
        ts = g[TS.TS_US].to_numpy()
        if len(v) < 2:
            return pd.DataFrame(
                columns=["TagName", "EventTime", "Status", "Value"]
            )
        l, b = float(v[0]), float(v[1] - v[0])
        for t in range(1, len(v)):
            # literal op order — the recursive-CTE oracle repeats these
            # exact expressions, so the doubles stay bit-identical
            l_new = alpha * v[t] + (1.0 - alpha) * (l + b)
            b = beta * (l_new - l) + (1.0 - beta) * b
            l = l_new
        fut_ts = ts[-1] + step_us * np.arange(1, horizon + 1)
        fut_v = np.array([l + h * b for h in range(1, horizon + 1)])
        return pd.DataFrame(
            {
                "TagName": g[TS.TAG].iloc[0],
                "EventTime": fut_ts.astype(np.int64).astype("datetime64[us]"),
                "Status": "Forecast",
                "Value": round4(fut_v),
            }
        )

    from ..ops.common import grouped_map

    return grouped_map(ds, [TS.TAG], per_tag)


def seasonal_decompose(
    ds: ray.data.Dataset,
    period: int = 24,
    exact_decimals: int = 4,
) -> ray.data.Dataset:
    """Classical ADDITIVE seasonal decomposition per tag (the
    statsmodels-`seasonal_decompose` shape): ``trend`` = centered moving
    average over an odd window ``w = period + 1 - (period % 2 == 0) ...``
    — here simply ``w = period | 1`` (odd) — ``seasonal`` = per-phase mean
    of the detrended series (phase = row position mod ``period``),
    ``resid`` = value - trend - seasonal.  Rows whose MA window is
    incomplete (the first/last ``w//2`` of each tag) are excluded, as in
    the classical method.

    Exactness: values scale to ``10^exact_decimals`` ints, the MA is an
    int window SUM (cumsum), the per-phase mean an int ratio — every float
    appears only in the final literal op order the SQL oracle repeats
    (``CAST(int) / denom`` then subtractions then ``round_even``), so the
    4-dp outputs are bit-reproducible at any parallelism.
    """
    w = period if period % 2 == 1 else period + 1
    h = w // 2
    scale = 10 ** exact_decimals

    def per_tag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([TS.TS_US, TS.VALUE], kind="mergesort").reset_index(drop=True)
        v = g[TS.VALUE].to_numpy().astype(np.float64)
        vi = np.round(round4(v) * scale).astype(np.int64)
        n = len(vi)
        if n < w:
            return pd.DataFrame(
                columns=["TagName", "EventTime", "Value", "trend", "seasonal", "resid"]
            )
        cs = np.concatenate(([0], np.cumsum(vi)))
        sw = cs[w:] - cs[:-w]  # window sum for centers h..n-h-1 (ints)
        centers = np.arange(h, n - h)
        phase = centers % period
        dnum = vi[centers] * w - sw  # detrended numerator (x w), int
        sum_d = np.zeros(period, np.int64)
        cnt_d = np.zeros(period, np.int64)
        np.add.at(sum_d, phase, dnum)
        np.add.at(cnt_d, phase, 1)
        # literal float op order shared with the oracle
        denom_t = float(w * scale)
        trend_u = sw.astype(np.float64) / denom_t
        seas_u = (
            sum_d[phase].astype(np.float64)
            / (cnt_d[phase].astype(np.float64) * w * scale)
        )
        vf = vi[centers].astype(np.float64) / float(scale)
        resid_u = vf - trend_u - seas_u
        return pd.DataFrame(
            {
                "TagName": g[TS.TAG].iloc[0],
                "EventTime": g[TS.TS_US].to_numpy()[centers].astype("datetime64[us]"),
                "Value": round4(vf),
                "trend": round4(trend_u),
                "seasonal": round4(seas_u),
                "resid": round4(resid_u),
            }
        )

    from ..ops.common import grouped_map

    return grouped_map(ds, [TS.TAG], per_tag)
