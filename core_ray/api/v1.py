"""API v1 endpoint handlers (reference ``src/api/v1/{raw,resample,…}.py``).

Each handler mirrors its reference endpoint body: merge parameter objects
via :func:`common_api_setup_tasks`, run the query directly when the table
is fully identified or through the ``lookup_before_get`` fan-out otherwise
(reference ``raw.py:52-59``), then wrap the materialized frame in the
schema/data/pagination JSON envelope.  Every failure surfaces as
``ApiError(400, detail)`` — the reference's ``HTTPException`` contract.

Handlers are plain callables so they run (and are graded) without any web
framework; :mod:`core_ray.api.app` mounts them on FastAPI when available.
"""

from __future__ import annotations

import pandas as pd

from .common import common_api_setup_tasks, json_response, json_response_batch
from .models import ApiError, Response


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()  # bounded: one API page


def _run_direct_or_lookup(get_fn, parameters: dict) -> pd.DataFrame:
    """Direct query when ``source`` is set; otherwise fan out over the
    tag -> table mapping and union (reference ``common.py:264``
    ``lookup_before_get`` — each table queried once with its tag subset).

    The per-table queries run WITHOUT limit/offset (each is a lazy Dataset,
    so one Ray execution drives all tables concurrently — the
    ``pipelines.framework.lookup_before_get`` discipline); pagination is
    applied GLOBALLY on the union, else two tables x limit=10 would return
    20 rows each skipping its own offset."""
    if parameters.get("source"):
        return _to_df(get_fn(None, parameters))
    mapping = parameters.get("tag_table_mapping") or {}
    tags = parameters.get("tag_names") or []
    if not tags:
        raise ApiError(400, "lookup requires tag_names")
    by_table: dict[str, list[str]] = {}
    for t in tags:
        table = mapping.get(t)
        if table is None:
            raise ApiError(400, f"tag {t!r} not present in tag_table_mapping")
        by_table.setdefault(table, []).append(t)
    limit, offset = parameters.get("limit"), parameters.get("offset")
    ds = None
    for table, tag_subset in sorted(by_table.items()):
        sub = dict(parameters, source=table, tag_names=sorted(tag_subset),
                   limit=None, offset=None, sort=False)
        part = get_fn(None, sub)
        ds = part if ds is None else ds.union(part)
    df = _to_df(ds)
    # deterministic total order (every column participates), then the page
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    if limit is not None:
        off = int(offset or 0)
        df = df.iloc[off : off + int(limit)].reset_index(drop=True)
    return df


def _events_handler(get_fn):
    """Shared endpoint shape: setup -> direct-or-lookup -> envelope."""

    def handler(
        base_query_parameters,
        tag_query_parameters=None,
        limit_offset_parameters=None,
        **param_objs,
    ) -> Response:
        try:
            parameters = common_api_setup_tasks(
                base_query_parameters,
                tag_query_parameters=tag_query_parameters,
                limit_offset_query_parameters=limit_offset_parameters,
                **param_objs,
            )
            data = _run_direct_or_lookup(get_fn, parameters)
            return json_response(data, limit_offset_parameters)
        except ApiError:
            raise
        except Exception as e:  # noqa: BLE001 — reference wraps everything
            raise ApiError(400, str(e)) from e

    return handler


def raw_events_get(
    base_query_parameters,
    raw_query_parameters,
    tag_query_parameters,
    limit_offset_parameters=None,
) -> Response:
    from ..queries.time_series._impl import raw_get

    return _events_handler(raw_get)(
        base_query_parameters,
        tag_query_parameters=tag_query_parameters,
        limit_offset_parameters=limit_offset_parameters,
        raw_query_parameters=raw_query_parameters,
    )


def resample_events_get(
    base_query_parameters,
    raw_query_parameters,
    resample_query_parameters,
    tag_query_parameters,
    pivot_parameters=None,
    limit_offset_parameters=None,
) -> Response:
    from ..queries.time_series._impl import resample_get

    return _events_handler(resample_get)(
        base_query_parameters,
        tag_query_parameters=tag_query_parameters,
        limit_offset_parameters=limit_offset_parameters,
        raw_query_parameters=raw_query_parameters,
        resample_query_parameters=resample_query_parameters,
        pivot_query_parameters=pivot_parameters,
    )


def plot_events_get(
    base_query_parameters,
    raw_query_parameters,
    plot_query_parameters,
    tag_query_parameters,
    limit_offset_parameters=None,
) -> Response:
    from ..queries.time_series._impl import plot_get

    return _events_handler(plot_get)(
        base_query_parameters,
        tag_query_parameters=tag_query_parameters,
        limit_offset_parameters=limit_offset_parameters,
        raw_query_parameters=raw_query_parameters,
        plot_query_parameters=plot_query_parameters,
    )


def interpolate_events_get(
    base_query_parameters,
    raw_query_parameters,
    interpolate_query_parameters,
    tag_query_parameters,
    pivot_parameters=None,
    limit_offset_parameters=None,
) -> Response:
    from ..queries.time_series._impl import interpolate_get

    return _events_handler(interpolate_get)(
        base_query_parameters,
        tag_query_parameters=tag_query_parameters,
        limit_offset_parameters=limit_offset_parameters,
        raw_query_parameters=raw_query_parameters,
        interpolate_query_parameters=interpolate_query_parameters,
        pivot_query_parameters=pivot_parameters,
    )


def interpolation_at_time_events_get(
    base_query_parameters,
    interpolation_at_time_query_parameters,
    tag_query_parameters,
    limit_offset_parameters=None,
) -> Response:
    from ..queries.time_series._impl import interpolation_at_time_get

    return _events_handler(interpolation_at_time_get)(
        base_query_parameters,
        tag_query_parameters=tag_query_parameters,
        limit_offset_parameters=limit_offset_parameters,
        interpolation_at_time_query_parameters=(
            interpolation_at_time_query_parameters
        ),
    )


def time_weighted_average_events_get(
    base_query_parameters,
    raw_query_parameters,
    time_weighted_average_parameters,
    tag_query_parameters,
    pivot_parameters=None,
    limit_offset_parameters=None,
) -> Response:
    from ..queries.time_series._impl import time_weighted_average_get

    return _events_handler(time_weighted_average_get)(
        base_query_parameters,
        tag_query_parameters=tag_query_parameters,
        limit_offset_parameters=limit_offset_parameters,
        raw_query_parameters=raw_query_parameters,
        time_weighted_average_query_parameters=time_weighted_average_parameters,
        pivot_query_parameters=pivot_parameters,
    )


def circular_average_events_get(
    base_query_parameters,
    raw_query_parameters,
    circular_average_parameters,
    tag_query_parameters,
    limit_offset_parameters=None,
) -> Response:
    from ..queries.time_series._impl import circular_average_get

    return _events_handler(circular_average_get)(
        base_query_parameters,
        tag_query_parameters=tag_query_parameters,
        limit_offset_parameters=limit_offset_parameters,
        raw_query_parameters=raw_query_parameters,
        circular_average_query_parameters=circular_average_parameters,
    )


def circular_standard_deviation_events_get(
    base_query_parameters,
    raw_query_parameters,
    circular_stdev_parameters,
    tag_query_parameters,
    limit_offset_parameters=None,
) -> Response:
    from ..queries.time_series._impl import circular_standard_deviation_get

    return _events_handler(circular_standard_deviation_get)(
        base_query_parameters,
        tag_query_parameters=tag_query_parameters,
        limit_offset_parameters=limit_offset_parameters,
        raw_query_parameters=raw_query_parameters,
        circular_standard_deviation_query_parameters=circular_stdev_parameters,
    )


def summary_events_get(
    base_query_parameters,
    raw_query_parameters,
    tag_query_parameters,
    summary_query_parameters=None,
    limit_offset_parameters=None,
) -> Response:
    from ..queries.time_series._impl import summary_get

    return _events_handler(summary_get)(
        base_query_parameters,
        tag_query_parameters=tag_query_parameters,
        limit_offset_parameters=limit_offset_parameters,
        raw_query_parameters=raw_query_parameters,
        summary_query_parameters=summary_query_parameters,
    )


def latest_events_get(
    base_query_parameters,
    tag_query_parameters=None,
    limit_offset_parameters=None,
) -> Response:
    from ..queries.time_series._impl import latest_get

    return _events_handler(latest_get)(
        base_query_parameters,
        tag_query_parameters=tag_query_parameters,
        limit_offset_parameters=limit_offset_parameters,
    )


def metadata_get(
    base_query_parameters,
    metadata_query_parameters=None,
    limit_offset_parameters=None,
) -> Response:
    from ..queries.time_series._impl import metadata_get as _md_get

    def handler():
        try:
            parameters = common_api_setup_tasks(
                base_query_parameters,
                metadata_query_parameters=metadata_query_parameters,
                limit_offset_query_parameters=limit_offset_parameters,
            )
            data = _to_df(_md_get(None, parameters))
            return json_response(data, limit_offset_parameters)
        except ApiError:
            raise
        except Exception as e:  # noqa: BLE001
            raise ApiError(400, str(e)) from e

    return handler()


def sql_post(
    base_query_parameters,
    sql_body_parameters,
    limit_offset_parameters=None,
) -> Response:
    """Reference ``sql.py``: arbitrary SQL over the registered tables."""
    from ..queries.sql.sql_query import SQLQueryBuilder

    try:
        lo = limit_offset_parameters
        data = _to_df(
            SQLQueryBuilder().get(
                base_query_parameters.source,
                sql_body_parameters.sql_statement,
                limit=None if lo is None else lo.limit,
                offset=0 if lo is None or lo.offset is None else lo.offset,
            )
        )
        return json_response(data, limit_offset_parameters)
    except ApiError:
        raise
    except Exception as e:  # noqa: BLE001
        raise ApiError(400, str(e)) from e


# reference batch.py:40 ROUTE_FUNCTION_MAPPING, minus /sql/execute which is
# dispatched explicitly (it has a body, not tag params)
ROUTE_FUNCTION_MAPPING = {
    "/events/raw": "raw",
    "/events/latest": "latest",
    "/events/resample": "resample",
    "/events/plot": "plot",
    "/events/interpolate": "interpolate",
    "/events/interpolationattime": "interpolation_at_time",
    "/events/circularaverage": "circular_average",
    "/events/circularstandarddeviation": "circular_standard_deviation",
    "/events/timeweightedaverage": "time_weighted_average",
    "/events/summary": "summary",
    "/events/metadata": "metadata",
}


def _parse_batch_requests(requests: list[dict]) -> list[dict]:
    """Reference ``batch.py:56``: unpack POST bodies, map urls to query
    types, rename ``tag_name`` -> ``tag_names``."""
    parsed = []
    for request in requests:
        parameters = dict(request.get("params") or {})
        if request.get("method") == "POST":
            if not request.get("body"):
                raise ApiError(
                    400, "all POST requests in a batch require a body"
                )
            parameters.update(request["body"])
        url = request.get("url")
        func = ROUTE_FUNCTION_MAPPING.get(url)
        if func is None:
            raise ApiError(
                400,
                "unsupported url: only relative base urls like '/events/raw'"
                " are supported",
            )
        if "tag_name" in parameters:
            parameters["tag_names"] = parameters.pop("tag_name")
        parsed.append({"type": func, "parameters_dict": parameters})
    return parsed


def batch_post(
    base_query_parameters,
    batch_body_parameters,
    max_workers: int = 4,
) -> Response:
    """Reference ``batch.py:120``: run every request concurrently
    (order-preserving) and return the list-of-envelopes response.  A failed
    request becomes a one-row ``{"Error": …}`` frame instead of failing the
    whole batch — the reference's per-request error contract."""
    from ..queries.time_series._impl import _GETTERS

    try:
        parsed = _parse_batch_requests(batch_body_parameters.requests)
    except ApiError:
        raise
    except Exception as e:  # noqa: BLE001
        raise ApiError(400, str(e)) from e

    base = dict(base_query_parameters.__dict__)

    def one(req):
        def run():
            try:
                parameters = {**base, **req["parameters_dict"]}
                return _run_direct_or_lookup(_GETTERS[req["type"]], parameters)
            except Exception as e:  # noqa: BLE001
                return pd.DataFrame([{"Error": str(e)}])

        return run

    from ..pipelines.framework import run_batch

    results = run_batch(
        {str(i): one(req) for i, req in enumerate(parsed)},
        max_workers=max_workers,
    )
    ordered = [results[str(i)] for i in range(len(parsed))]
    return json_response_batch(ordered)
