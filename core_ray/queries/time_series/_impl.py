"""Parameter-dict query layer over the time-series ops.

Mirrors the reference's ``queries/time_series/*.py`` ``get(connection,
parameters_dict)`` surface (reference ``raw.py:20``, ``resample.py:22``, ...)
re-expressed over the Ray Data operators in ``core_ray/ops``.  The parameter
names are the reference's (``tag_names``, ``start_date``, ``end_date``,
``include_bad_data``, ``time_interval_rate``/``unit``, ``agg_method``,
``fill``, ``pivot``, ``display_uom``, ``sort``, ``limit``/``offset``,
``tagname_column``/``timestamp_column``/``status_column``/``value_column``,
``metadata_source``/``metadata_tagname_column``/``metadata_uom_column``,
``step``/``window_length``, ``lower_bound``/``upper_bound``,
``timestamps``).

A "connection" in the reference is a SQL warehouse handle; in this engine the
ambient Ray session plays that role, so every ``get`` accepts and ignores a
leading connection argument for drop-in call-site compatibility.

Each query returns a lazy ``ray.data.Dataset`` unless ``limit`` is set, in
which case the (small, bounded) page materializes as a pandas DataFrame —
the reference always materializes, so a paginated result is the closest
match to its contract.
"""

from __future__ import annotations

import ray.data

from ...ops import (
    circular_average as _op_circular_average,
    circular_stddev as _op_circular_stddev,
    interpolate as _op_interpolate,
    interpolation_at_time as _op_interpolation_at_time,
    latest as _op_latest,
    metadata_table as _op_metadata_table,
    paginate as _op_paginate,
    pivot as _op_pivot,
    raw as _op_raw,
    resample as _op_resample,
    summary as _op_summary,
    time_weighted_average as _op_twa,
    uom_join as _op_uom_join,
)
from ...ops.common import SeriesSpec


def _params(connection, parameters_dict):
    """Support both ``get(params)`` and the reference's
    ``get(connection, params)`` calling conventions.  Dates are normalized
    with the reference's rules (``_utilities_query_builder.py:59``: date-only
    end_date means end-of-day, see ``queries/_dates.py``)."""
    from .._dates import parse_dates

    if parameters_dict is None and isinstance(connection, dict):
        return parse_dates(dict(connection))
    if parameters_dict is None:
        raise ValueError("parameters_dict is required")
    return parse_dates(dict(parameters_dict))


def _spec(p: dict) -> SeriesSpec:
    return SeriesSpec(
        tag_col=p.get("tagname_column") or "TagName",
        ts_col=p.get("timestamp_column") or "EventTime",
        value_col=p.get("value_column") or "Value",
        status_col=p.get("status_column", "Status"),
    )


def _source(p: dict):
    src = p.get("source")
    if src is None:
        raise ValueError("source is required (set it via the builder's .source())")
    return src


def load_metadata(p: dict) -> dict[str, dict]:
    """Resolve ``metadata_source`` to a tag -> {UoM, Step, Description} dict.

    Accepts the in-memory registry dict this engine uses natively, or a
    parquet table path (file or directory containing ``metadata.parquet``)
    with the reference's ``metadata_tagname_column``/``metadata_uom_column``
    names.  Metadata is dimension-sized: it is read once on the driver and
    broadcast via ``ray.put`` inside the ops (never shuffled)."""
    src = p.get("metadata_source")
    if src is None:
        return {}
    if isinstance(src, dict):
        return {
            t: (dict(v) if isinstance(v, dict) else {"UoM": v}) for t, v in src.items()
        }
    import pyarrow.parquet as pq

    tcol = p.get("metadata_tagname_column") or "TagName"
    ucol = p.get("metadata_uom_column") or "UoM"
    path = src if src.endswith(".parquet") else f"{src}/metadata.parquet"
    df = pq.read_table(path).to_pandas()  # bounded: metadata dimension
    out: dict[str, dict] = {}
    for _, r in df.iterrows():
        d = {"UoM": r.get(ucol)}
        if "Step" in df.columns:
            d["Step"] = bool(r["Step"])
        if "Description" in df.columns:
            d["Description"] = r["Description"]
        out[str(r[tcol])] = d
    return out


def _uom_map(p: dict) -> dict[str, str | None]:
    meta = load_metadata(p)
    if not meta and p.get("display_uom"):
        raise ValueError("display_uom True requires metadata_source to be populated")
    return {t: d.get("UoM") for t, d in meta.items()}


def _finish(
    ds: ray.data.Dataset,
    p: dict,
    *,
    sort_cols: list[str],
    pivot_value_col: str | None = None,
):
    """Shared output stages in reference order: UoM join -> pivot ->
    sort / limit+offset."""
    if p.get("display_uom"):
        ds = _op_uom_join(ds, _uom_map(p))
    if p.get("pivot"):
        if p.get("display_uom"):
            raise ValueError("pivot and display_uom cannot both be True")
        tags = p.get("tag_names") or []
        ds = _op_pivot(ds, sorted(tags), value_col=pivot_value_col or "Value")
        sort_cols = [c for c in sort_cols if c not in ("TagName",)]
    limit = p.get("limit")
    if limit is not None:
        return _op_paginate(ds, sort_cols, limit=int(limit), offset=int(p.get("offset") or 0))
    if p.get("sort", True):
        ds = ds.sort(sort_cols)
    return ds


def _interval(p: dict) -> tuple[float, str]:
    rate = p["time_interval_rate"]
    return float(rate) if "." in str(rate) else int(rate), str(p["time_interval_unit"])


def raw_get(connection=None, parameters_dict=None):
    p = _params(connection, parameters_dict)
    ds = _op_raw(
        _source(p),
        start=p["start_date"],
        end=p["end_date"],
        tags=p.get("tag_names"),
        include_bad=bool(p.get("include_bad_data", False)),
        case_insensitive=bool(p.get("case_insensitivity_tag_search", False)),
        spec=_spec(p),
        sort=False,
        display_tz=p.get("display_timezone"),
    )
    return _finish(ds, p, sort_cols=["TagName", "EventTime"])


def resample_get(connection=None, parameters_dict=None):
    p = _params(connection, parameters_dict)
    rate, unit = _interval(p)
    ds = _op_resample(
        _source(p),
        start=p["start_date"],
        end=p["end_date"],
        rate=rate,
        unit=unit,
        agg=p.get("agg_method", "avg"),
        fill=bool(p.get("fill", False)),
        tags=p.get("tag_names"),
        include_bad=bool(p.get("include_bad_data", False)),
        spec=_spec(p),
        display_tz=p.get("display_timezone"),
        # engine extension: when the stored values are fixed-point decimals,
        # compute avg in exact scaled integers (see ops/resample.py) so the
        # JSON round-trips are bit-stable at round-half-even boundaries
        exact_decimals=p.get("exact_decimals"),
    )
    return _finish(ds, p, sort_cols=["TagName", "EventTime"])


def plot_get(connection=None, parameters_dict=None):
    from ...ops import plot as _op_plot

    # include_bad_data is accepted for signature parity but has no effect BY
    # DESIGN: plot always consumes both statuses (Good -> min/max/first/last,
    # Bad -> the Exception arm), exactly like the reference's plot SQL, so
    # there is nothing for the flag to include or exclude.
    p = _params(connection, parameters_dict)
    rate, unit = _interval(p)
    ds = _op_plot(
        _source(p),
        start=p["start_date"],
        end=p["end_date"],
        rate=rate,
        unit=unit,
        tags=p.get("tag_names"),
        spec=_spec(p),
        display_tz=p.get("display_timezone"),
    )
    return _finish(ds, p, sort_cols=["TagName", "EventTime"])


def interpolate_get(connection=None, parameters_dict=None):
    p = _params(connection, parameters_dict)
    rate, unit = _interval(p)
    ds = _op_interpolate(
        _source(p),
        start=p["start_date"],
        end=p["end_date"],
        rate=rate,
        unit=unit,
        tags=p.get("tag_names"),
        include_bad=bool(p.get("include_bad_data", False)),
        spec=_spec(p),
        display_tz=p.get("display_timezone"),
    )
    return _finish(ds, p, sort_cols=["TagName", "EventTime"])


def interpolation_at_time_get(connection=None, parameters_dict=None):
    p = _params(connection, parameters_dict)
    ds = _op_interpolation_at_time(
        _source(p),
        timestamps=p["timestamps"],
        tags=p.get("tag_names"),
        include_bad=bool(p.get("include_bad_data", False)),
        window_days=int(p.get("window_length", 1)),
        spec=_spec(p),
    )
    return _finish(ds, p, sort_cols=["TagName", "EventTime"])


def time_weighted_average_get(connection=None, parameters_dict=None):
    p = _params(connection, parameters_dict)
    rate, unit = _interval(p)
    step = p.get("step", "false")
    if isinstance(step, str):
        step = {"true": True, "false": False, "metadata": "metadata"}[step.lower()]
    meta = None
    if step == "metadata":
        meta = load_metadata({**p, "metadata_source": p.get("source_metadata") or p.get("metadata_source")})
        if not meta:
            raise ValueError('step="metadata" requires source_metadata')
    ds = _op_twa(
        _source(p),
        start=p["start_date"],
        end=p["end_date"],
        rate=rate,
        unit=unit,
        step=step,
        metadata=meta,
        lookback_intervals=int(p.get("window_length", 1)),
        tags=p.get("tag_names"),
        spec=_spec(p),
    )
    return _finish(ds, p, sort_cols=["TagName", "EventTime"])


def _circular_get(kind: str):
    def get(connection=None, parameters_dict=None):
        p = _params(connection, parameters_dict)
        rate, unit = _interval(p)
        op = _op_circular_average if kind == "average" else _op_circular_stddev
        ds = op(
            _source(p),
            start=p["start_date"],
            end=p["end_date"],
            rate=rate,
            unit=unit,
            lower_bound=float(p.get("lower_bound", 0.0)),
            upper_bound=float(p.get("upper_bound", 360.0)),
            tags=p.get("tag_names"),
            include_bad=bool(p.get("include_bad_data", False)),
            spec=_spec(p),
        )
        return _finish(ds, p, sort_cols=["TagName", "EventTime"])

    return get


circular_average_get = _circular_get("average")
circular_standard_deviation_get = _circular_get("stddev")


def latest_get(connection=None, parameters_dict=None):
    p = _params(connection, parameters_dict)
    ds = _op_latest(
        _source(p),
        tags=p.get("tag_names") or None,
        spec=_spec(p),
        display_tz=p.get("display_timezone"),
    )
    return _finish(ds, p, sort_cols=["TagName"])


def summary_get(connection=None, parameters_dict=None):
    p = _params(connection, parameters_dict)
    ds = _op_summary(
        _source(p),
        start=p["start_date"],
        end=p["end_date"],
        tags=p.get("tag_names"),
        include_bad=bool(p.get("include_bad_data", False)),
        spec=_spec(p),
    )
    return _finish(ds, p, sort_cols=["TagName"])


def metadata_get(connection=None, parameters_dict=None):
    p = _params(connection, parameters_dict)
    meta = load_metadata(
        {**p, "metadata_source": p.get("metadata_source") or p.get("source")}
    )
    tags = p.get("tag_names") or None
    ds = _op_metadata_table(meta, tags=tags)
    limit = p.get("limit")
    if limit is not None:
        return _op_paginate(ds, ["TagName"], limit=int(limit), offset=int(p.get("offset") or 0))
    return ds


_GETTERS = {
    "raw": raw_get,
    "resample": resample_get,
    "plot": plot_get,
    "interpolate": interpolate_get,
    "interpolation_at_time": interpolation_at_time_get,
    "time_weighted_average": time_weighted_average_get,
    "circular_average": circular_average_get,
    "circular_standard_deviation": circular_standard_deviation_get,
    "latest": latest_get,
    "summary": summary_get,
    "metadata": metadata_get,
}


def batch_get(connection=None, request_list=None):
    """Order-preserving batch fan-out (reference ``batch.py``): each request
    is ``{"type": <query type>, "parameters_dict": {...}}``; results come
    back in request order.  Each query is an independent lazy Dataset — the
    Ray scheduler interleaves their stages."""
    if request_list is None and isinstance(connection, list):
        request_list = connection
    out = []
    for req in request_list or []:
        out.append(_GETTERS[req["type"]](None, req["parameters_dict"]))
    return out
