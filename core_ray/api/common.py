"""Shared API plumbing (reference ``api/v1/common.py``).

``common_api_setup_tasks`` merges the per-endpoint parameter objects into
one query-layer ``parameters`` dict (reference ``common.py:60-157``);
``pagination`` computes the next-offset row (``common.py:159-185``);
``json_response`` renders the ``{"schema":…,"data":…,"pagination":…}``
envelope with pandas' table-schema builder and 9-digit (``date_unit="ns"``)
ISO timestamps (``common.py:199-237``); ``json_response_batch`` the
list-of-envelopes form (``common.py:239-262``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .models import LimitOffsetQueryParams, PaginationRow, Response


def common_api_setup_tasks(
    base_query_parameters,
    metadata_query_parameters=None,
    raw_query_parameters=None,
    tag_query_parameters=None,
    resample_query_parameters=None,
    plot_query_parameters=None,
    interpolate_query_parameters=None,
    interpolation_at_time_query_parameters=None,
    time_weighted_average_query_parameters=None,
    circular_average_query_parameters=None,
    circular_standard_deviation_query_parameters=None,
    summary_query_parameters=None,
    pivot_query_parameters=None,
    limit_offset_query_parameters=None,
    sql_query_parameters=None,
) -> dict:
    """Merge every supplied parameter object's fields into one dict, with
    the reference's renames (``tag_name`` -> ``tag_names``) applied."""
    parameters = dict(base_query_parameters.__dict__)

    for obj in (
        raw_query_parameters,
        resample_query_parameters,
        plot_query_parameters,
        interpolate_query_parameters,
        interpolation_at_time_query_parameters,
        time_weighted_average_query_parameters,
        circular_average_query_parameters,
        circular_standard_deviation_query_parameters,
        summary_query_parameters,
        pivot_query_parameters,
        limit_offset_query_parameters,
        sql_query_parameters,
    ):
        if obj is not None:
            parameters.update(obj.__dict__)

    if metadata_query_parameters is not None:
        parameters.update(metadata_query_parameters.__dict__)
        tn = parameters.pop("tag_name", None)
        parameters["tag_names"] = [] if tn is None else list(tn)

    if tag_query_parameters is not None:
        parameters.update(tag_query_parameters.__dict__)
        parameters["tag_names"] = list(parameters.pop("tag_name"))

    return parameters


def pagination(
    limit_offset_parameters: LimitOffsetQueryParams | None, rows: int
) -> PaginationRow:
    """Reference next-offset rule: ``next`` is set only when the page came
    back FULL (``rows == limit``) and an offset was supplied."""
    row = PaginationRow()
    lo = limit_offset_parameters
    if lo is not None and (lo.limit is not None or lo.offset is not None):
        nxt = None
        if rows == lo.limit and lo.offset is not None:
            nxt = lo.offset + lo.limit
        row = PaginationRow(limit=lo.limit, offset=lo.offset, next=nxt)
    return row


def _table_schema_json(df: pd.DataFrame) -> str:
    import json

    from pandas.io.json import build_table_schema

    schema = build_table_schema(df, index=False, primary_key=False)
    schema.pop("pandas_version", None)
    return json.dumps(schema)


def json_response(
    data: pd.DataFrame,
    limit_offset_parameters: LimitOffsetQueryParams | None = None,
) -> Response:
    """The reference envelope, byte-shape for byte-shape: ``data`` rendered
    by pandas' JSON writer with ``orient="records"``, ISO dates at ns
    precision (9 fractional digits) and NaN -> null.  ``double_precision``
    is pinned to 15 (pandas' max) rather than the writer's default 10 —
    the default silently truncates full-precision doubles, and this surface
    feeds exact-value comparisons."""
    body = data.replace({np.nan: None}).to_json(
        orient="records", date_format="iso", date_unit="ns",
        double_precision=15,
    )
    content = (
        '{"schema":%s,"data":%s,"pagination":%s}'
        % (
            _table_schema_json(data),
            body,
            pagination(limit_offset_parameters, len(data)).to_json(),
        )
    )
    return Response(content=content)


def json_response_batch(data_list: list[pd.DataFrame]) -> Response:
    """List-of-envelopes response for the batch route: each result carries
    its own schema + records (reference ``common.py:239-262``)."""
    parts = []
    for df in data_list:
        body = df.replace({np.nan: None}).to_json(
            orient="records", date_format="iso", date_unit="ns",
            double_precision=15,
        )
        parts.append(
            '{"schema":%s,"data":%s}' % (_table_schema_json(df), body)
        )
    return Response(content='{"data":[%s]}' % ",".join(parts))
