"""Generic keyed analytic (window) functions — the distributed form of SQL's
``fn() OVER (PARTITION BY key ORDER BY order, tiebreak)``.

Same partitioning scheme as `asof_join`/`match_pattern`: ONE Arrow-tagged
hash shuffle co-locates each key's full history in one bucket task; inside
the bucket every kernel is a pandas C groupby primitive (cumsum / cummax /
shift / rolling) over the factorized key codes — no per-row Python.

Supported specs (dicts):
  {"fn": "row_number",            "name": ...}
  {"fn": "lag"|"lead", "col": c, "n": 1, "name": ...}
  {"fn": "cumsum"|"cummax"|"cummin"|"cumcount", "col": c, "name": ...}
  {"fn": "rolling_sum"|"rolling_mean", "col": c, "n": N, "name": ...}
    (ROWS N-1 PRECEDING .. CURRENT ROW, min_periods=1 — SQL's default
     growing frame at the partition head)
  {"fn": "range_sum"|"range_count", "col": c, "range_us": R, "name": ...}
    (RANGE BETWEEN R PRECEDING AND CURRENT ROW over the order column —
     the event-time frame; rows tying on the order value all see the
     frame of that value, exactly like SQL RANGE frames)
  {"fn": "ewm_mean", "col": c, "alpha": a, "name": ...}
    (exponentially weighted mean per key in (order, tiebreak) sequence —
     pandas' C groupby-ewm kernel; no SQL analog, pinned by tests against
     the sequential recurrence)
  {"fn": "rank"|"dense_rank"|"percent_rank"|"cume_dist", "name": ...}
  {"fn": "ntile", "n": m, "name": ...}
    (the SQL rank family: ties = equal ORDER-column values; ntile splits
     the (order, tiebreak) row sequence with the first n_k % m buckets one
     row larger, exactly SQL's NTILE)

Partitioning assumption: one key's history fits in one bucket task — raise
``num_buckets`` for smaller buckets; a single pathological hot key needs the
time-sliced carry-in treatment documented in `temporal.py`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_FNS = {
    "row_number",
    "lag",
    "lead",
    "cumsum",
    "cummax",
    "cummin",
    "cumcount",
    "rolling_sum",
    "rolling_mean",
    "range_sum",
    "range_count",
    "ewm_mean",
    "rank",
    "dense_rank",
    "percent_rank",
    "cume_dist",
    "ntile",
}

# rank-family fns rank over the ORDER column (ties = equal order values,
# exactly SQL's ORDER BY semantics); the tiebreak only stabilizes row order
_RANK_FNS = {"rank", "dense_rank", "percent_rank", "cume_dist", "ntile"}


def keyed_window(
    ds: ray.data.Dataset,
    key: str,
    order: str,
    specs: list[dict],
    tiebreak: str | None = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Append analytic columns per ``specs``; input rows pass through with
    their original columns plus one new column per spec."""
    for s in specs:
        if s.get("fn") not in _FNS:
            raise ValueError(f"unknown window fn {s.get('fn')!r}")
        if "name" not in s:
            raise ValueError(f"spec needs a name: {s}")
        if (
            s["fn"] not in ("row_number", "range_count")
            and s["fn"] not in _RANK_FNS
            and "col" not in s
        ):
            raise ValueError(f"spec needs col: {s}")
        if s["fn"] == "ntile" and "n" not in s:
            raise ValueError(f"spec needs n: {s}")
        if s["fn"].startswith("range_") and "range_us" not in s:
            raise ValueError(f"spec needs range_us: {s}")
        if s["fn"] == "ewm_mean" and "alpha" not in s:
            raise ValueError(f"spec needs alpha: {s}")

    from .temporal import _bucket_of  # the shared bucket hash

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _bucket_of(
            pd.Series(t[key].to_numpy(zero_copy_only=False)), num_buckets
        )
        return t.append_column("_bucket", pa.array(b))

    sort_cols = [key, order] + ([tiebreak] if tiebreak else [])

    def compute(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_bucket"]).sort_by([(c, "ascending") for c in sort_cols])
        df = t.to_pandas()  # per-batch
        kcodes, _ = pd.factorize(df[key].to_numpy())
        g = df.groupby(kcodes, sort=False)
        ts64 = None

        def _order_us() -> np.ndarray:
            nonlocal ts64
            if ts64 is None:
                v = df[order].to_numpy()
                ts64 = (
                    v.astype("datetime64[us]").astype(np.int64)
                    if v.dtype.kind == "M"
                    else v.astype(np.int64)
                )
            return ts64

        rank_cache: dict = {}

        def _rank_arrays() -> dict:
            """Shared rank-family arrays, computed once per bucket: rows are
            (key, order, tiebreak)-sorted, so every kernel is one
            vectorized pass — run boundaries where key or order value
            changes, propagation via maximum.accumulate."""
            if rank_cache:
                return rank_cache
            n = len(df)
            rn = g.cumcount().to_numpy() + 1
            sizes = df.groupby(kcodes, sort=False)[key].transform("size").to_numpy()
            ov = df[order].to_numpy()
            run_start = np.ones(n, dtype=bool)
            if n > 1:
                run_start[1:] = (kcodes[1:] != kcodes[:-1]) | (ov[1:] != ov[:-1])
            idx = np.arange(n)
            last_start = np.maximum.accumulate(np.where(run_start, idx, -1))
            rank = rn[last_start]
            dense = (
                pd.Series(run_start.astype(np.int64)).groupby(kcodes, sort=False)
                .cumsum().to_numpy()
            )
            run_id = np.cumsum(run_start)
            run_end_rn = (
                pd.Series(rn).groupby(run_id, sort=False).transform("max").to_numpy()
            )
            rank_cache.update(
                rn=rn, sizes=sizes, rank=rank, dense=dense, run_end_rn=run_end_rn
            )
            return rank_cache

        for s in specs:
            fn, name = s["fn"], s["name"]
            if fn in _RANK_FNS:
                ra = _rank_arrays()
                if fn == "rank":
                    df[name] = ra["rank"].astype(np.int64)
                elif fn == "dense_rank":
                    df[name] = ra["dense"].astype(np.int64)
                elif fn == "percent_rank":
                    # SQL: (rank - 1) / (partition_rows - 1), 0 for n=1
                    sz, rk = ra["sizes"], ra["rank"]
                    df[name] = np.where(sz > 1, (rk - 1) / np.maximum(sz - 1, 1), 0.0)
                elif fn == "cume_dist":
                    df[name] = ra["run_end_rn"] / ra["sizes"]
                else:  # ntile: first (n_k % m) buckets get one extra row
                    m = int(s["n"])
                    rn, sz = ra["rn"], ra["sizes"]
                    rem, base = sz % m, sz // m
                    cut = rem * (base + 1)
                    df[name] = np.where(
                        rn <= cut,
                        (rn - 1) // (base + 1) + 1,
                        rem + (rn - 1 - cut) // np.maximum(base, 1) + 1,
                    ).astype(np.int64)
                continue
            if fn in ("range_sum", "range_count"):
                # SQL RANGE R PRECEDING .. CURRENT ROW, peers included: rows
                # are (key, ts)-sorted, so encode (key, ts) into one int64
                # and binary-search the frame bounds for ALL rows at once
                rng = int(s["range_us"])
                t = _order_us()
                tmin = int(t.min()) if len(t) else 0
                rel = t - tmin
                span = int(rel.max()) + 1 if len(rel) else 1
                if len(kcodes) and int(kcodes.max()) >= (1 << 62) // max(span, 1):
                    raise OverflowError(
                        "range frame: key-count x time-span too large for the "
                        "int64 composite; shrink batches or bucket the time axis"
                    )
                z = kcodes.astype(np.int64) * span + rel
                lo = np.searchsorted(z, kcodes * span + np.maximum(rel - rng, 0),
                                     side="left")
                hi = np.searchsorted(z, z, side="right")  # last peer + 1
                if fn == "range_count":
                    df[name] = (hi - lo).astype(np.int64)
                else:
                    v = df[s["col"]].to_numpy()
                    if v.dtype.kind in "iu":
                        c = np.concatenate(([0], np.cumsum(v.astype(np.int64))))
                        df[name] = (c[hi] - c[lo]).astype(np.int64)
                    else:
                        c = np.concatenate(([0.0], np.cumsum(v.astype(np.float64))))
                        df[name] = c[hi] - c[lo]
                continue
            if fn == "row_number":
                df[name] = g.cumcount().to_numpy() + 1
            elif fn in ("lag", "lead"):
                n = int(s.get("n", 1))
                df[name] = g[s["col"]].shift(n if fn == "lag" else -n).to_numpy()
            elif fn == "cumcount":
                df[name] = g[s["col"]].cumcount().to_numpy() + 1
            elif fn in ("cumsum", "cummax", "cummin"):
                df[name] = getattr(g[s["col"]], fn)().to_numpy()
            elif fn == "ewm_mean":
                a = float(s["alpha"])
                vals = g[s["col"]].ewm(alpha=a).mean().reset_index(
                    level=0, drop=True
                )
                df[name] = vals.sort_index().to_numpy()
            else:  # rolling_sum / rolling_mean
                n = int(s["n"])
                r = g[s["col"]].rolling(n, min_periods=1)
                vals = (r.sum() if fn == "rolling_sum" else r.mean()).reset_index(
                    level=0, drop=True
                )
                df[name] = vals.sort_index().to_numpy()
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(compute, batch_format="pyarrow")
    )
