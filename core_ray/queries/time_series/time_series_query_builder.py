"""Fluent time-series query builder — the reference's public query API.

Mirrors ``queries/time_series/time_series_query_builder.py:33-1046``
method-for-method and parameter-name-for-parameter-name: ``connect`` ->
``source``/``m_source`` -> one terminal query method.  Every terminal method
assembles the same parameter dict the reference assembles and hands it to the
matching ``get`` wrapper in ``_impl`` — so the builder is a pure facade over
the Ray Data operators; outputs are identical to calling the ops directly
(pinned by ``tests/test_query_builder.py``).

Differences from the reference, by design of this engine:

- ``connect`` takes any object (or nothing): there is no SQL warehouse —
  the ambient Ray session executes the query.  The argument is stored and
  ignored, keeping reference call sites working verbatim.
- ``source`` accepts a parquet path (file, or directory containing
  ``events.parquet``) or an existing ``ray.data.Dataset``.
- Results are lazy ``ray.data.Dataset``s (pandas only when ``limit`` is
  set); call ``.to_pandas()`` for the reference's eager DataFrame.
"""

from __future__ import annotations

from typing import Union

from . import _impl


class TimeSeriesQueryBuilder:
    def __init__(self):
        self.connection = None
        self.data_source = None
        self.tagname_column = "TagName"
        self.timestamp_column = "EventTime"
        self.status_column: Union[str, None] = "Status"
        self.value_column = "Value"
        self.metadata_source = None
        self.metadata_tagname_column = "TagName"
        self.metadata_uom_column = "UoM"

    def connect(self, connection=None):
        """Accepted for reference call-site compatibility; the Ray session is
        the execution engine, so the connection object is stored unused."""
        self.connection = connection
        return self

    def source(
        self,
        source,
        tagname_column: str = "TagName",
        timestamp_column: str = "EventTime",
        status_column: Union[str, None] = "Status",
        value_column: str = "Value",
    ):
        self.data_source = source
        self.tagname_column = tagname_column
        self.timestamp_column = timestamp_column
        self.status_column = status_column
        self.value_column = value_column
        return self

    def m_source(
        self,
        metadata_source,
        metadata_tagname_column: str = "TagName",
        metadata_uom_column: str = "UoM",
    ):
        self.metadata_source = metadata_source
        self.metadata_tagname_column = metadata_tagname_column
        self.metadata_uom_column = metadata_uom_column
        return self

    def _base(self) -> dict:
        return {
            "source": self.data_source,
            "metadata_source": self.metadata_source,
            "tagname_column": self.tagname_column,
            "timestamp_column": self.timestamp_column,
            "status_column": self.status_column,
            "value_column": self.value_column,
            "metadata_tagname_column": self.metadata_tagname_column,
            "metadata_uom_column": self.metadata_uom_column,
        }

    def raw(
        self,
        tagname_filter: list[str],
        start_date: str,
        end_date: str,
        include_bad_data: bool = False,
        display_uom: bool = False,
        sort: bool = True,
        limit: int | None = None,
        offset: int | None = None,
    ):
        return _impl.raw_get(
            self.connection,
            {
                **self._base(),
                "tag_names": tagname_filter,
                "start_date": start_date,
                "end_date": end_date,
                "include_bad_data": include_bad_data,
                "display_uom": display_uom,
                "sort": sort,
                "limit": limit,
                "offset": offset,
            },
        )

    def resample(
        self,
        tagname_filter: list[str],
        start_date: str,
        end_date: str,
        time_interval_rate: str,
        time_interval_unit: str,
        agg_method: str,
        include_bad_data: bool = False,
        fill: bool = False,
        pivot: bool = False,
        display_uom: bool = False,
        sort: bool = True,
        limit: int | None = None,
        offset: int | None = None,
    ):
        return _impl.resample_get(
            self.connection,
            {
                **self._base(),
                "tag_names": tagname_filter,
                "start_date": start_date,
                "end_date": end_date,
                "time_interval_rate": time_interval_rate,
                "time_interval_unit": time_interval_unit,
                "agg_method": agg_method,
                "include_bad_data": include_bad_data,
                "fill": fill,
                "pivot": pivot,
                "display_uom": display_uom,
                "sort": sort,
                "limit": limit,
                "offset": offset,
            },
        )

    def plot(
        self,
        tagname_filter: list[str],
        start_date: str,
        end_date: str,
        time_interval_rate: str,
        time_interval_unit: str,
        include_bad_data: bool = False,
        pivot: bool = False,
        display_uom: bool = False,
        sort: bool = True,
        limit: int | None = None,
        offset: int | None = None,
    ):
        return _impl.plot_get(
            self.connection,
            {
                **self._base(),
                "tag_names": tagname_filter,
                "start_date": start_date,
                "end_date": end_date,
                "time_interval_rate": time_interval_rate,
                "time_interval_unit": time_interval_unit,
                "include_bad_data": include_bad_data,
                "pivot": pivot,
                "display_uom": display_uom,
                "sort": sort,
                "limit": limit,
                "offset": offset,
            },
        )

    def interpolate(
        self,
        tagname_filter: list[str],
        start_date: str,
        end_date: str,
        time_interval_rate: str,
        time_interval_unit: str,
        include_bad_data: bool = False,
        pivot: bool = False,
        display_uom: bool = False,
        sort: bool = True,
        limit: int | None = None,
        offset: int | None = None,
    ):
        return _impl.interpolate_get(
            self.connection,
            {
                **self._base(),
                "tag_names": tagname_filter,
                "start_date": start_date,
                "end_date": end_date,
                "time_interval_rate": time_interval_rate,
                "time_interval_unit": time_interval_unit,
                "include_bad_data": include_bad_data,
                "pivot": pivot,
                "display_uom": display_uom,
                "sort": sort,
                "limit": limit,
                "offset": offset,
            },
        )

    def interpolation_at_time(
        self,
        tagname_filter: list[str],
        timestamp_filter: list[str],
        include_bad_data: bool = False,
        window_length: int = 1,
        pivot: bool = False,
        display_uom: bool = False,
        limit: int | None = None,
        offset: int | None = None,
    ):
        return _impl.interpolation_at_time_get(
            self.connection,
            {
                **self._base(),
                "tag_names": tagname_filter,
                "timestamps": timestamp_filter,
                "include_bad_data": include_bad_data,
                "window_length": window_length,
                "pivot": pivot,
                "display_uom": display_uom,
                "limit": limit,
                "offset": offset,
            },
        )

    def time_weighted_average(
        self,
        tagname_filter: list[str],
        start_date: str,
        end_date: str,
        time_interval_rate: str,
        time_interval_unit: str,
        step: str = "false",
        source_metadata=None,
        include_bad_data: bool = False,
        window_length: int = 1,
        pivot: bool = False,
        display_uom: bool = False,
        limit: int | None = None,
        offset: int | None = None,
    ):
        return _impl.time_weighted_average_get(
            self.connection,
            {
                **self._base(),
                "tag_names": tagname_filter,
                "start_date": start_date,
                "end_date": end_date,
                "time_interval_rate": time_interval_rate,
                "time_interval_unit": time_interval_unit,
                "step": step,
                "source_metadata": source_metadata or self.metadata_source,
                "include_bad_data": include_bad_data,
                "window_length": window_length,
                "pivot": pivot,
                "display_uom": display_uom,
                "limit": limit,
                "offset": offset,
            },
        )

    def metadata(
        self,
        tagname_filter: list[str] | None = None,
        limit: int | None = None,
        offset: int | None = None,
    ):
        return _impl.metadata_get(
            self.connection,
            {
                **self._base(),
                "tag_names": [] if tagname_filter is None else tagname_filter,
                "limit": limit,
                "offset": offset,
            },
        )

    def latest(
        self,
        tagname_filter: list[str] | None = None,
        display_uom: bool = False,
        limit: int | None = None,
        offset: int | None = None,
    ):
        return _impl.latest_get(
            self.connection,
            {
                **self._base(),
                "tag_names": [] if tagname_filter is None else tagname_filter,
                "display_uom": display_uom,
                "limit": limit,
                "offset": offset,
            },
        )

    def circular_average(
        self,
        tagname_filter: list[str],
        start_date: str,
        end_date: str,
        time_interval_rate: str,
        time_interval_unit: str,
        lower_bound: float,
        upper_bound: float,
        include_bad_data: bool = False,
        pivot: bool = False,
        display_uom: bool = False,
        limit: int | None = None,
        offset: int | None = None,
    ):
        return _impl.circular_average_get(
            self.connection,
            self._circular_params(
                tagname_filter, start_date, end_date, time_interval_rate,
                time_interval_unit, lower_bound, upper_bound, include_bad_data,
                pivot, display_uom, limit, offset,
            ),
        )

    def circular_standard_deviation(
        self,
        tagname_filter: list[str],
        start_date: str,
        end_date: str,
        time_interval_rate: str,
        time_interval_unit: str,
        lower_bound: float,
        upper_bound: float,
        include_bad_data: bool = False,
        pivot: bool = False,
        display_uom: bool = False,
        limit: int | None = None,
        offset: int | None = None,
    ):
        return _impl.circular_standard_deviation_get(
            self.connection,
            self._circular_params(
                tagname_filter, start_date, end_date, time_interval_rate,
                time_interval_unit, lower_bound, upper_bound, include_bad_data,
                pivot, display_uom, limit, offset,
            ),
        )

    def _circular_params(
        self, tagname_filter, start_date, end_date, time_interval_rate,
        time_interval_unit, lower_bound, upper_bound, include_bad_data,
        pivot, display_uom, limit, offset,
    ) -> dict:
        return {
            **self._base(),
            "tag_names": tagname_filter,
            "start_date": start_date,
            "end_date": end_date,
            "time_interval_rate": time_interval_rate,
            "time_interval_unit": time_interval_unit,
            "lower_bound": lower_bound,
            "upper_bound": upper_bound,
            "include_bad_data": include_bad_data,
            "pivot": pivot,
            "display_uom": display_uom,
            "limit": limit,
            "offset": offset,
        }

    def summary(
        self,
        tagname_filter: list[str],
        start_date: str,
        end_date: str,
        include_bad_data: bool = False,
        display_uom: bool = False,
        limit: int | None = None,
        offset: int | None = None,
    ):
        return _impl.summary_get(
            self.connection,
            {
                **self._base(),
                "tag_names": tagname_filter,
                "start_date": start_date,
                "end_date": end_date,
                "include_bad_data": include_bad_data,
                "display_uom": display_uom,
                "limit": limit,
                "offset": offset,
            },
        )
