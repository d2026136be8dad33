"""Temporal joins Ray Data lacks natively: as-of join and interval (range)
join, built as compositions of Arrow-tagged shuffles + per-group vectorized
kernels.

As-of join (reference analog: `interpolation_at_time`'s latest-value-at-or-
before lookup, reference
`queries/time_series/_time_series_query_builder.py` interpolation_at_time /
DuckDB `ASOF JOIN` semantics): for every left row, the right row with the
same key and the greatest ``on`` value <= the left ``on`` value.

Partitioning assumption (documented per the task contract): both sides are
hash-bucketed by the ``by`` key, so a single key's FULL history must fit in
one bucket task.  Raise ``num_buckets`` to shrink buckets; for one
pathological hot key, pre-split its history into time slices and as-of join
each slice against a slice that carries one carry-in row (the key's latest
right row before the slice start) — the same carry-in trick the interval
spine in `ops/resample.py` uses.

Interval join: point ``t`` matches interval ``[start, end]`` (inclusive,
SQL ``BETWEEN`` parity).  Scale design is the grid trick: time is cut into
fixed ``granularity_us`` cells, every interval is REPLICATED to each cell it
overlaps, every point belongs to EXACTLY ONE cell — so each matching pair
meets in exactly one cell and no post-join dedup is needed.  One shuffle
(groupby cell), vectorized outer-compare inside the cell.  Pick the
granularity near the typical interval length: replication factor is
``len/g + 1`` while cell population shrinks linearly in ``g``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_US = "us"


def _bucket_of(series: pd.Series, num_buckets: int) -> np.ndarray:
    return (
        pd.util.hash_pandas_object(series, index=False).to_numpy() % num_buckets
    ).astype(np.int64)


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    by: str,
    direction: str = "backward",
    tolerance_us: int | None = None,
    how: str = "left",
    keep_right_on: str | None = None,
    right_tiebreak: str | None = None,
    num_buckets: int = 32,
    broadcast_threshold_bytes: int = 64 << 20,
) -> ray.data.Dataset:
    """Distributed as-of join: for each left row, attach the right row with
    equal ``by`` and the nearest ``on`` in ``direction`` (backward = greatest
    right.on <= left.on, DuckDB ``ASOF JOIN`` / pandas ``merge_asof``
    semantics; equality matches).

    ONE shuffle: both sides are conformed to a union schema, tagged with
    ``hash(by) % num_buckets`` in Arrow, unioned, and co-grouped by bucket;
    the per-bucket merge is pandas' C ``merge_asof`` kernel (sort + single
    backward scan), run once per bucket, never per batch.  Payload columns
    stay Arrow until that one conversion.

    ``keep_right_on`` copies the matched right ``on`` value into the output
    under that name (pandas drops it otherwise).  ``how="inner"`` removes
    unmatched left rows — use it when downstream schemas can't take the
    nulls a left join introduces.  ``right_tiebreak`` makes the pick among
    right rows that TIE on ``(by, on)`` deterministic (the max-tiebreak row
    wins, matching a ``QUALIFY row_number() OVER (PARTITION BY by, on ORDER
    BY tiebreak DESC) = 1`` pre-dedup in SQL) — without it, ties resolve by
    input block order.

    Broadcast fast path (hash_join's autoBroadcast rule): a right side whose
    metadata size is provably under ``broadcast_threshold_bytes`` is sorted
    once, shipped via ``ray.put``, and merge_asof'd inside ``map_batches``
    with NO shuffle — the reference-curve-lookup shape (huge probe stream x
    small calibration table).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"bad direction {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"bad how {how!r}")
    lcols = list(left.schema().names)
    rcols = list(right.schema().names)
    if on not in lcols or on not in rcols or by not in lcols or by not in rcols:
        raise ValueError(f"both sides need columns {on!r} and {by!r}")
    overlap = (set(lcols) & set(rcols)) - {on, by}
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    if keep_right_on is not None and keep_right_on in lcols + rcols:
        raise ValueError(f"keep_right_on {keep_right_on!r} collides")

    def _types(ds) -> dict:
        sch = ds.schema()
        base = getattr(sch, "base_schema", None)
        if isinstance(base, pa.Schema):
            return {f.name: f.type for f in base}
        return dict(zip(sch.names, sch.types))

    types = _types(left)
    types.update(_types(right))
    all_cols = lcols + [c for c in rcols if c not in lcols]

    on_is_ts = pa.types.is_timestamp(types[on])
    tol = None
    if tolerance_us is not None:
        tol = pd.Timedelta(tolerance_us, _US) if on_is_ts else tolerance_us
    r_payload = [c for c in rcols if c not in (on, by)]

    def _prep_right(rf: pd.DataFrame) -> pd.DataFrame:
        rf = rf.sort_values(
            [on] + ([right_tiebreak] if right_tiebreak else []),
            kind="stable",
            ignore_index=True,
        )
        if keep_right_on is not None:
            rf[keep_right_on] = rf[on]
        rf["_matched"] = np.int8(1)
        return rf

    # one canonical output schema for EVERY block: merge_asof's natural
    # column order (lcols, then rf-only columns in rf order), with int
    # right-payload columns restored to nullable ints — otherwise blocks
    # with unmatched rows upcast to float64 while fully-matched and
    # empty-left blocks keep int64, and the Dataset's schemas diverge
    out_cols = lcols + r_payload + ([keep_right_on] if keep_right_on else [])

    def _target(c: str) -> pa.DataType:
        return types[c] if c in types else types[on]  # keep_right_on -> on

    def _merge(lf: pd.DataFrame, rf: pd.DataFrame) -> pa.Table:
        """lf pre-sorted by on; rf through _prep_right."""
        if lf.empty:
            return pa.table({c: pa.nulls(0, _target(c)) for c in out_cols})
        merged = pd.merge_asof(
            lf,
            rf,
            on=on,
            by=by,
            direction=direction,
            tolerance=tol,
            allow_exact_matches=True,
        )
        if how == "inner":
            merged = merged[merged["_matched"].notna()]
        arrays = {}
        for c in out_cols:
            s = merged[c]
            t = _target(c)
            if pa.types.is_integer(t) and s.dtype.kind == "f":
                s = s.astype("Int64")  # NaN -> real nulls, values integral
            arrays[c] = pa.Array.from_pandas(s, type=t)
        return pa.table(arrays)

    # threshold 0 must not probe: Dataset.size_bytes() can EXECUTE a derived
    # pipeline just to answer, which defeats the explicit shuffle opt-out
    rsize = None
    if broadcast_threshold_bytes > 0:
        try:
            rsize = right.size_bytes()
        except Exception:
            rsize = None
    if rsize is not None and 0 < rsize <= broadcast_threshold_bytes:
        import ray as _ray

        rf_b = _prep_right(right.to_pandas())  # bounded: broadcast small side
        ref = _ray.put(rf_b)

        def bcast(t: pa.Table) -> pa.Table:
            lf = t.to_pandas().sort_values(on, kind="stable", ignore_index=True)  # per-batch
            return _merge(lf, _ray.get(ref))

        return left.map_batches(bcast, batch_format="pyarrow")

    def tag(side: int, cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            out = pa.table(
                {
                    c: (t[c] if c in cols else pa.nulls(n, types[c]))
                    for c in all_cols
                }
            )
            b = _bucket_of(
                pd.Series(t[by].to_numpy(zero_copy_only=False)), num_buckets
            )
            out = out.append_column("_side", pa.array(np.full(n, side, np.int8)))
            return out.append_column("_bucket", pa.array(b))

        return fn

    tagged = left.map_batches(tag(0, lcols), batch_format="pyarrow").union(
        right.map_batches(tag(1, rcols), batch_format="pyarrow")
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        lf = (
            t.filter(pc.equal(t["_side"], 0))
            .select(lcols)
            .to_pandas()  # per-batch
            .sort_values(on, kind="stable", ignore_index=True)
        )
        rf = _prep_right(t.filter(pc.equal(t["_side"], 1)).select(rcols).to_pandas())  # per-batch
        return _merge(lf, rf)

    return tagged.groupby("_bucket").map_groups(join_bucket, batch_format="pyarrow")


def _to_us(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.timestamp(_US)).cast(pa.int64())
    return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def interval_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    point_ts: str,
    start_col: str,
    end_col: str,
    granularity_us: int,
    broadcast_threshold_bytes: int = 64 << 20,
) -> ray.data.Dataset:
    """Distributed inner interval join: point rows matched to every interval
    row with ``start <= t <= end`` (inclusive both ends, ``BETWEEN`` parity).
    No equality key required — this is the genuinely non-equi join.

    Grid scheme: cell = floor(us(t) / granularity_us).  Intervals are
    replicated to every cell they overlap (Arrow-side expansion by repeat
    indices); points carry exactly one cell, so each matching pair co-locates
    in exactly one group and the output needs NO dedup.  One ``groupby(cell)``
    shuffle total; the per-cell kernel is a vectorized outer compare bounded
    by (points-in-cell x intervals-overlapping-cell).

    Column names must not collide across the two sides (rename upstream).
    Empty-side cells short-circuit.  Inclusive-end note: an interval whose
    end lands exactly on a cell boundary is replicated into that boundary
    cell so ``t == end`` still meets it.

    Broadcast fast path: an interval side provably under
    ``broadcast_threshold_bytes`` is expanded to a sorted (cell ->
    interval-index) map once, shipped via ``ray.put``, and probed per point
    batch with two searchsorteds — NO shuffle (the maintenance-windows /
    calendar-dimension shape).
    """
    if granularity_us <= 0:
        raise ValueError("granularity_us must be positive")
    pcols = list(points.schema().names)
    icols = list(intervals.schema().names)
    overlap = set(pcols) & set(icols)
    if overlap:
        raise ValueError(f"column collision across sides: {sorted(overlap)}")

    g = granularity_us

    isize = None
    if broadcast_threshold_bytes > 0:  # same no-probe rule as asof_join
        try:
            isize = intervals.size_bytes()
        except Exception:
            isize = None
    if isize is not None and 0 < isize <= broadcast_threshold_bytes:
        import ray as _ray

        itab = pa.Table.from_pandas(intervals.to_pandas(), preserve_index=False)  # bounded: interval small side
        s_all = _to_us(itab[start_col])
        e_all = _to_us(itab[end_col])
        cs, ce = s_all // g, e_all // g
        n_cells = np.maximum(ce - cs + 1, 0)
        rep_idx = np.repeat(np.arange(len(itab), dtype=np.int64), n_cells)
        if len(rep_idx):
            starts = np.repeat(cs, n_cells)
            run_base = np.repeat(np.cumsum(n_cells) - n_cells, n_cells)
            rep_cell = starts + (np.arange(len(rep_idx)) - run_base)
            order = np.argsort(rep_cell, kind="stable")
            rep_cell, rep_idx = rep_cell[order], rep_idx[order]
        else:
            rep_cell = rep_idx
        ref = _ray.put((rep_cell, rep_idx, s_all, e_all, itab))

        def probe(t: pa.Table) -> pa.Table:
            rc, ri, s_a, e_a, it = _ray.get(ref)
            tv = _to_us(t[point_ts])
            cell = tv // g
            lo = np.searchsorted(rc, cell, "left")
            hi = np.searchsorted(rc, cell, "right")
            cnt = hi - lo
            pi = np.repeat(np.arange(len(t), dtype=np.int64), cnt)
            base = np.repeat(np.cumsum(cnt) - cnt, cnt)
            pos = np.repeat(lo, cnt) + (np.arange(len(pi)) - base)
            ii = ri[pos]
            ok = (tv[pi] >= s_a[ii]) & (tv[pi] <= e_a[ii])
            pi, ii = pi[ok], ii[ok]
            out = t.take(pa.array(pi))
            for c in icols:
                out = out.append_column(c, it[c].take(pa.array(ii)))
            return out

        return points.map_batches(probe, batch_format="pyarrow")

    def tag_points(t: pa.Table) -> pa.Table:
        cell = _to_us(t[point_ts]) // g
        return t.append_column("_cell", pa.array(cell))

    def expand_intervals(t: pa.Table) -> pa.Table:
        s = _to_us(t[start_col]) // g
        e = _to_us(t[end_col]) // g
        n_cells = np.maximum(e - s + 1, 0)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), n_cells)
        if len(idx) == 0:
            return t.take(idx).append_column("_cell", pa.array(idx))
        # per-replica cell = start_cell + offset within the run
        starts = np.repeat(s, n_cells)
        run_base = np.repeat(np.cumsum(n_cells) - n_cells, n_cells)
        cell = starts + (np.arange(len(idx)) - run_base)
        return t.take(idx).append_column("_cell", pa.array(cell))

    types = {}
    for ds, cols in ((points, pcols), (intervals, icols)):
        sch = ds.schema()
        base = getattr(sch, "base_schema", None)
        tmap = (
            {f.name: f.type for f in base}
            if isinstance(base, pa.Schema)
            else dict(zip(sch.names, sch.types))
        )
        types.update({c: tmap[c] for c in cols})
    all_cols = pcols + icols

    def conform(side: int):
        base_fn = tag_points if side == 0 else expand_intervals
        own = pcols if side == 0 else icols

        def fn(t: pa.Table) -> pa.Table:
            t = base_fn(t)
            n = len(t)
            cols = {
                c: (t[c] if c in own else pa.nulls(n, types[c])) for c in all_cols
            }
            cols["_cell"] = t["_cell"]
            out = pa.table(cols)
            return out.append_column("_side", pa.array(np.full(n, side, np.int8)))

        return fn

    tagged = points.map_batches(conform(0), batch_format="pyarrow").union(
        intervals.map_batches(conform(1), batch_format="pyarrow")
    )

    def join_cell(t: pa.Table) -> pa.Table:
        pt = t.filter(pc.equal(t["_side"], 0)).select(pcols)
        it = t.filter(pc.equal(t["_side"], 1)).select(icols)
        if len(pt) == 0 or len(it) == 0:
            return pa.table(
                {c: pa.nulls(0, types[c]) for c in all_cols}
            )
        tvals = _to_us(pt[point_ts])
        s = _to_us(it[start_col])
        e = _to_us(it[end_col])
        # outer compare, bounded by the cell population
        mask = (tvals[:, None] >= s[None, :]) & (tvals[:, None] <= e[None, :])
        pi, ii = np.nonzero(mask)
        out = pt.take(pi)
        for c in icols:
            out = out.append_column(c, it[c].take(pa.array(ii)))
        return out

    return tagged.groupby("_cell").map_groups(join_cell, batch_format="pyarrow")
