"""Shared sub-operators for the time-series queries.

Mirrors the reference's shared CTE sub-operators (SURVEY.md §2.1 "shared
sub-operators"; reference ``_time_series_query_builder.py:66-180``): raw scan +
time/tag/status filter, normalization to the PCDM column names, and the
internal int64-microsecond event-time representation used for start-aligned
window arithmetic.

Everything here is a stateless ``map_batches`` transform over zero-copy Arrow
batches — no shuffle, no materialization.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


@dataclass(frozen=True)
class SeriesSpec:
    """Maps an arbitrary table onto the PCDM event shape.

    Mirrors the reference's overridable ``tagname_column`` /
    ``timestamp_column`` / ``status_column`` / ``value_column`` parameters
    (reference ``_time_series_query_builder.py:514-528``). ``status_column=None``
    synthesizes ``'Good'`` like the reference does (``:119-122``).
    """

    tag_col: str = "TagName"
    ts_col: str = "EventTime"
    value_col: str = "Value"
    status_col: str | None = "Status"


# The default mapping for the driver's `events` test table.
EVENTS_SPEC = SeriesSpec(tag_col="event_type", ts_col="ts", value_col="value", status_col=None)


def ts_to_us(ts: str | datetime) -> int:
    """Parse a timestamp (ISO string or datetime, UTC-naive) to int64 us."""
    if isinstance(ts, str):
        ts = datetime.fromisoformat(ts)
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    epoch = datetime(1970, 1, 1)
    return int((ts - epoch).total_seconds() * 1_000_000)


class TS:
    """Internal canonical columns after ``normalize``."""

    TAG = "TagName"
    TS_US = "ts_us"  # int64 microseconds since epoch (UTC-naive)
    STATUS = "Status"
    VALUE = "Value"


def _normalize_batch(batch: pa.Table, spec: SeriesSpec) -> pa.Table:
    tag = pc.cast(batch[spec.tag_col], pa.string())
    ts = batch[spec.ts_col]
    if pa.types.is_timestamp(ts.type):
        ts_us = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
    else:
        ts_us = pc.cast(ts, pa.int64())
    value = pc.cast(batch[spec.value_col], pa.float64())
    if spec.status_col is not None and spec.status_col in batch.column_names:
        status = pc.cast(batch[spec.status_col], pa.string())
    else:
        status = pa.nulls(len(batch), pa.string()).fill_null("Good")
    return pa.table(
        {TS.TAG: tag, TS.TS_US: ts_us, TS.STATUS: status, TS.VALUE: value}
    )


def normalize(
    ds: ray.data.Dataset,
    spec: SeriesSpec = EVENTS_SPEC,
    *,
    start_us: int | None = None,
    end_us: int | None = None,
    tags: list[str] | None = None,
    include_bad: bool = True,
    case_insensitive_tags: bool = False,
) -> ray.data.Dataset:
    """Project + filter an arbitrary table to canonical (TagName, ts_us,
    Status, Value), applying the reference's raw-scan predicates
    (time range BETWEEN inclusive, tag IN-list, optional ``Status <> 'Bad'``;
    reference ``_time_series_query_builder.py:138-169``)."""
    tagset = None
    if tags is not None:
        tagset = pa.array([t.upper() for t in tags] if case_insensitive_tags else list(tags))

    def fn(batch: pa.Table) -> pa.Table:
        t = _normalize_batch(batch, spec)
        mask = None

        def _and(m, new):
            return new if m is None else pc.and_kleene(m, new)

        if start_us is not None:
            mask = _and(mask, pc.greater_equal(t[TS.TS_US], start_us))
        if end_us is not None:
            mask = _and(mask, pc.less_equal(t[TS.TS_US], end_us))
        if tagset is not None:
            col = pc.utf8_upper(t[TS.TAG]) if case_insensitive_tags else t[TS.TAG]
            mask = _and(mask, pc.is_in(col, value_set=tagset))
        if not include_bad:
            mask = _and(mask, pc.not_equal(t[TS.STATUS], "Bad"))
        return t.filter(mask) if mask is not None else t

    return ds.map_batches(fn, batch_format="pyarrow")


def read_events(
    sf_dir_or_path: str,
    spec: SeriesSpec = EVENTS_SPEC,
    *,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Read the events table with column pruning (read only what the spec
    needs — a 100 TB read that loads unused columns is wrong)."""
    path = sf_dir_or_path
    if not path.endswith(".parquet"):
        path = f"{path}/events.parquet"
    if columns is None:
        columns = [spec.tag_col, spec.ts_col, spec.value_col]
        if spec.status_col:
            columns.append(spec.status_col)
    return ray.data.read_parquet(path, columns=columns)


def us_to_timestamp_array(us: np.ndarray | pa.Array) -> pa.Array:
    arr = pa.array(np.asarray(us, dtype=np.int64)) if isinstance(us, np.ndarray) else us
    return pc.cast(arr, pa.timestamp("us"))


def parse_tz_offset_us(ts: str) -> int:
    """UTC offset (us) carried by an ISO timestamp string, 0 when naive.

    Mirrors the reference's display-timezone inference: the query's time zone
    is the ``%z`` offset of the parsed start date, defaulting to +00:00
    (``queries/_utilities_query_builder.py:40-77``)."""
    from datetime import datetime

    off = datetime.fromisoformat(ts).utcoffset()
    return 0 if off is None else int(off.total_seconds() * 1_000_000)


def display_tz_shift(batch: pa.Table, us_cols: list[str], offset_us: int) -> pa.Table:
    """ms-truncate + shift int64-us columns into the display timezone.

    Reference output stage: ``from_utc_timestamp(date_trunc('millisecond',
    ts), tz)`` (``_time_series_query_builder.py:96-101``) — storage stays
    UTC; only the displayed timestamps move."""
    for name in us_cols:
        i = batch.column_names.index(name)
        shifted = pc.add(
            pc.multiply(pc.divide(batch[name], 1000), 1000), offset_us
        )
        batch = batch.set_column(i, name, shifted)
    return batch


def apply_display_tz(
    ds: "ray.data.Dataset", start: str, display_tz: str, col: str = "EventTime"
):
    """Shared post-computation output stage: shift a finalized timestamp[us]
    column into the display timezone (ms-trunc + offset — the reference wraps
    EVERY query's output in this, ``_time_series_query_builder.py:96-101``).
    ``display_tz="infer"`` takes the offset from the query's start date."""
    import pyarrow.compute as pc

    offset = (
        parse_tz_offset_us(start)
        if display_tz == "infer"
        else parse_tz_offset_us(f"2000-01-01T00:00:00{display_tz}")
    )

    def shift(t: pa.Table) -> pa.Table:
        i = t.column_names.index(col)
        us = pc.cast(pc.cast(t[col], pa.timestamp("us")), pa.int64())
        t = t.set_column(i, col, us)
        t = display_tz_shift(t, [col], offset)
        return finalize_times(t, {col: col})

    return ds.map_batches(shift, batch_format="pyarrow")


def finalize_times(batch: pa.Table, us_cols: dict[str, str]) -> pa.Table:
    """Convert int64-us columns to timestamp[us] output columns (renamed)."""
    for src, dst in us_cols.items():
        i = batch.column_names.index(src)
        batch = batch.set_column(i, dst, pc.cast(batch[src], pa.timestamp("us")))
    return batch


def grouped_map(
    ds: ray.data.Dataset,
    key_cols: list[str],
    fn,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Scale-safe replacement for ``groupby(keys).map_groups(fn)``.

    Ray's ``map_groups`` pays ~0.2 ms of per-group overhead (one Python UDF
    invocation + block slice per group), which dominates when the key is
    high-cardinality (100k groups -> ~20 s of pure overhead, measured).  This
    helper shuffles on ``hash(keys) % num_buckets`` instead — O(num_buckets)
    Ray groups — and applies ``fn`` per original key group inside each bucket
    with a pandas groupby (C-speed grouping; the Python call per group remains
    but without Ray's per-group block machinery).

    ``fn``: DataFrame (one full key group) -> DataFrame, same contract as
    ``map_groups(batch_format="pandas")``.  Keys are hashed deterministically
    (``pd.util.hash_pandas_object`` with its fixed key), so bucket routing is
    stable across runs and parallelism levels.
    """

    add_bucket = _arrow_add_bucket(key_cols, num_buckets)
    keys = key_cols if len(key_cols) > 1 else key_cols[0]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"])
        outs = [fn(sub) for _, sub in g.groupby(keys, sort=True)]
        kept = [o for o in outs if o is not None and len(o)]
        if kept:
            return pd.concat(kept, ignore_index=True)
        # all groups filtered to nothing: reuse any produced (empty) frame for
        # a stable schema, else an empty no-column frame
        for o in outs:
            if o is not None:
                return o.iloc[0:0]
        return g.iloc[0:0][[]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def collision_grouped_map(
    ds: ray.data.Dataset,
    key_cols: list[str],
    fn,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """``grouped_map`` for candidate-pair generation: inside each bucket,
    key groups of size 1 are dropped VECTORIZED before the per-group Python
    loop.  In LSH-style workloads almost every (band, hash) key is a
    singleton — invoking ``fn`` per singleton costs ~0.4 ms each (measured
    30s for 79k singleton groups), while collisions are rare."""

    keys = key_cols if len(key_cols) > 1 else key_cols[0]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"])
        g = g[g.duplicated(key_cols, keep=False)]
        outs = [fn(sub) for _, sub in g.groupby(keys, sort=True)]
        kept = [o for o in outs if o is not None and len(o)]
        if kept:
            return pd.concat(kept, ignore_index=True)
        return fn(g.iloc[0:0])  # typed empty frame from the fn itself

    return (
        ds.map_batches(_arrow_add_bucket(key_cols, num_buckets), batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def _arrow_add_bucket(key_cols: list[str], num_buckets: int):
    """Bucket-id stage that keeps payload columns zero-copy Arrow: only the
    KEY columns are converted for hashing; the batch itself never round-trips
    through pandas (a payload-bearing row — full text, token lists — was
    measurably double-converted by the old pandas add_bucket)."""

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("_bucket", pa.array([], pa.int64()))
        kdf = t.select(key_cols).to_pandas()  # per-batch
        h = pd.util.hash_pandas_object(kdf, index=False) % num_buckets
        return t.append_column(
            "_bucket", pa.array(h.to_numpy().astype(np.int64))
        )

    return fn


def bucketed_distinct(
    ds: ray.data.Dataset,
    key_cols: list[str],
    sort_cols: list[str],
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact dedup at scale: hash-bucket shuffle on the key, then one
    vectorized sort + first-per-key filter per bucket (deterministic survivor
    = first row in ``sort_cols`` order).  Arrow end-to-end: payload columns
    are never converted to pandas; the duplicate mask is computed on the key
    columns alone."""

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_bucket"]).sort_by([(c, "ascending") for c in sort_cols])
        dup = t.select(key_cols).to_pandas().duplicated(keep="first").to_numpy()  # per-batch
        return t.filter(pa.array(~dup))

    return (
        ds.map_batches(_arrow_add_bucket(key_cols, num_buckets), batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


_round_con = None


def round4(x):
    """Canonical float rounding applied to every aggregate output: DuckDB's
    ``round_even(x, 4)``, invoked as a vectorized kernel on the whole array.

    The driver's correctness gate hashes engine output against DuckDB oracle
    output, so the engine's rounding must match DuckDB bit-for-bit.  No
    numpy reformulation does (np.round, rint-on-float64 and rint-on-longdouble
    each disagree with DuckDB on a different subset of exact-.5-product
    boundary values), so the engine simply uses the same kernel as the oracle.
    Cost is one in-process DuckDB call per (small, post-aggregation) array.
    """
    global _round_con
    arr = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
    if arr.size == 0:
        return arr
    import duckdb

    if _round_con is None:
        _round_con = duckdb.connect()
        _round_con.execute("SET threads=1")
    t = pa.table({"v": pa.array(arr.ravel())})
    _round_con.register("_round4_in", t)
    out = _round_con.execute("SELECT round_even(v, 4) AS v FROM _round4_in").fetch_arrow_table()
    _round_con.unregister("_round4_in")
    return out["v"].to_numpy(zero_copy_only=False).reshape(arr.shape)
