"""``raw`` query: filtered, optionally deduplicated slice of events.

Reference semantics: ``_raw_query`` / ``_build_raw_query``
(``_time_series_query_builder.py:66-180,493-588``): time-range + tag filter,
optional ``Status <> 'Bad'``, ``SELECT DISTINCT`` dedup, ordered by
(TagName, EventTime).

``sort`` defaults to False: a full-range global sort of the raw slice is the
most expensive stage of the cheapest query at scale, and most consumers
(aggregations, order-insensitive sinks) don't need it — opt in for display.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from .common import TS, SeriesSpec, EVENTS_SPEC, finalize_times, normalize, read_events, ts_to_us


def raw(
    source: str | ray.data.Dataset,
    *,
    start: str,
    end: str,
    tags: list[str] | None = None,
    include_bad: bool = True,
    deduplicate: bool = False,
    case_insensitive: bool = False,
    spec: SeriesSpec = EVENTS_SPEC,
    sort: bool = False,
    display_tz: str | None = None,
) -> ray.data.Dataset:
    """``display_tz``: ``"infer"`` applies the reference's display-timezone
    stage (``from_utc_timestamp(date_trunc('millisecond', ts), tz)`` with tz
    = the start date's UTC offset); an explicit ``"+HH:MM"`` offset string
    overrides.  Filtering always happens on absolute instants."""
    ds = read_events(source, spec) if isinstance(source, str) else source
    ds = normalize(
        ds,
        spec,
        start_us=ts_to_us(start),
        end_us=ts_to_us(end),
        tags=tags,
        include_bad=include_bad,
        case_insensitive_tags=case_insensitive,
    )
    if deduplicate:
        # Exact dedup = bucketed hash-shuffle on the full row key -> one
        # vectorized drop_duplicates per bucket (see common.bucketed_distinct;
        # per-group map_groups pays ~0.2 ms per distinct row at scale).
        from .common import bucketed_distinct

        keys = [TS.TAG, TS.TS_US, TS.STATUS, TS.VALUE]
        ds = bucketed_distinct(ds, keys, keys)
    if display_tz is not None:
        from .common import display_tz_shift, parse_tz_offset_us

        offset = (
            parse_tz_offset_us(start)
            if display_tz == "infer"
            else parse_tz_offset_us(f"2000-01-01T00:00:00{display_tz}")
        )
        ds = ds.map_batches(
            lambda t, off=offset: display_tz_shift(t, [TS.TS_US], off),
            batch_format="pyarrow",
        )
    ds = ds.map_batches(
        lambda t: finalize_times(t, {TS.TS_US: "EventTime"}), batch_format="pyarrow"
    )
    if sort:
        ds = ds.sort(["TagName", "EventTime"])
    return ds
