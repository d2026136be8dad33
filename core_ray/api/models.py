"""API v1 parameter / response models (reference ``api/v1/models.py``).

The reference declares these as FastAPI ``Query(...)``-defaulted classes and
pydantic response models; here they are plain dataclasses with the same field
names and the same required/optional contract, validated in
``__post_init__`` so the handler layer gets the reference's 400-on-bad-input
behavior without any web framework.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class ApiError(Exception):
    """Handler-level error with an HTTP status — the framework-free analog
    of the reference's ``HTTPException(status_code=400, detail=...)``
    (every reference endpoint wraps its body in try/except and re-raises
    exactly this way, e.g. ``raw.py:63``)."""

    def __init__(self, status_code: int, detail: str):
        super().__init__(detail)
        self.status_code = status_code
        self.detail = detail


@dataclass
class Response:
    """Minimal HTTP response carrier (content + media type + status)."""

    content: str
    media_type: str = "application/json"
    status_code: int = 200


@dataclass
class PaginationRow:
    """Reference ``models.py:80``: echo of limit/offset plus the next
    offset when the page came back full."""

    limit: int | None = None
    offset: int | None = None
    next: int | None = None

    def to_json(self) -> str:
        import json

        return json.dumps(
            {"limit": self.limit, "offset": self.offset, "next": self.next}
        )


@dataclass
class BaseQueryParams:
    """Reference ``models.py:231`` identifies the warehouse table via
    (business_unit, region, asset, data_security_level, data_type); this
    engine's native handle is a parquet ``source`` path.  Handlers run
    directly when ``source`` is set and fall back to the
    ``lookup_before_get`` fan-out over ``tag_table_mapping`` otherwise —
    the same direct-vs-lookup split as reference ``raw.py:52-59``."""

    source: str | None = None
    business_unit: str | None = None
    region: str | None = None
    asset: str | None = None
    data_security_level: str | None = None
    data_type: str | None = None
    # tag -> owning-table map for the lookup arm (the reference resolves
    # this from a Databricks serving endpoint; here it is supplied)
    tag_table_mapping: dict[str, str] | None = None
    # source-table column mapping — the reference's tables are standardized
    # to these names; arbitrary parquet sources override them (the builder's
    # .source(..., tagname_column=...) knobs, reference
    # time_series_query_builder.py:50)
    tagname_column: str = "TagName"
    timestamp_column: str = "EventTime"
    status_column: str | None = "Status"
    value_column: str = "Value"

    def __post_init__(self):
        if self.source is None and not self.tag_table_mapping:
            raise ApiError(
                400,
                "either source or tag_table_mapping is required "
                "(no mapping endpoint in this engine)",
            )


@dataclass
class TagsQueryParams:
    """Reference ``models.py:338`` — ``tag_name`` is the API-side name,
    renamed to ``tag_names`` before hitting the query layer."""

    tag_name: list[str] = field(default_factory=list)

    def __post_init__(self):
        if isinstance(self.tag_name, str):
            self.tag_name = [self.tag_name]


@dataclass
class MetadataQueryParams:
    tag_name: list[str] | None = None

    def __post_init__(self):
        if isinstance(self.tag_name, str):
            self.tag_name = [self.tag_name]


@dataclass
class RawQueryParams:
    start_date: str = ""
    end_date: str = ""
    include_bad_data: bool = False

    def __post_init__(self):
        if not self.start_date or not self.end_date:
            raise ApiError(400, "start_date and end_date are required")


@dataclass
class ResampleQueryParams:
    time_interval_rate: str = ""
    time_interval_unit: str = ""
    agg_method: str = "avg"

    _UNITS = ("second", "minute", "day", "hour")
    _AGGS = ("first", "last", "avg", "min", "max", "count", "sum")

    def __post_init__(self):
        if not self.time_interval_rate or not self.time_interval_unit:
            raise ApiError(
                400, "time_interval_rate and time_interval_unit are required"
            )
        if self.time_interval_unit not in self._UNITS:
            raise ApiError(
                400, f"time_interval_unit must be one of {self._UNITS}"
            )
        if self.agg_method not in self._AGGS:
            raise ApiError(400, f"agg_method must be one of {self._AGGS}")


@dataclass
class PlotQueryParams:
    time_interval_rate: str = ""
    time_interval_unit: str = ""

    def __post_init__(self):
        if not self.time_interval_rate or not self.time_interval_unit:
            raise ApiError(
                400, "time_interval_rate and time_interval_unit are required"
            )


@dataclass
class InterpolateQueryParams:
    time_interval_rate: str = ""
    time_interval_unit: str = ""

    def __post_init__(self):
        if not self.time_interval_rate or not self.time_interval_unit:
            raise ApiError(
                400, "time_interval_rate and time_interval_unit are required"
            )


@dataclass
class InterpolationAtTimeQueryParams:
    timestamps: list[str] = field(default_factory=list)
    window_length: int = 1
    include_bad_data: bool = False

    def __post_init__(self):
        if not self.timestamps:
            raise ApiError(400, "timestamps is required")


@dataclass
class TimeWeightedAverageQueryParams:
    time_interval_rate: str = ""
    time_interval_unit: str = ""
    window_length: int = 1
    step: str = "metadata"

    def __post_init__(self):
        if not self.time_interval_rate or not self.time_interval_unit:
            raise ApiError(
                400, "time_interval_rate and time_interval_unit are required"
            )
        if self.step not in ("true", "false", "metadata"):
            raise ApiError(400, 'step must be "true", "false" or "metadata"')


@dataclass
class CircularAverageQueryParams:
    time_interval_rate: str = ""
    time_interval_unit: str = ""
    lower_bound: int = 0
    upper_bound: int = 0

    def __post_init__(self):
        if not self.time_interval_rate or not self.time_interval_unit:
            raise ApiError(
                400, "time_interval_rate and time_interval_unit are required"
            )
        if self.upper_bound <= self.lower_bound:
            raise ApiError(400, "upper_bound must exceed lower_bound")


@dataclass
class SummaryQueryParams:
    pass


@dataclass
class PivotQueryParams:
    pivot: bool = False


@dataclass
class LimitOffsetQueryParams:
    limit: int | None = None
    offset: int | None = None

    def __post_init__(self):
        if self.offset is not None and self.limit is None:
            raise ApiError(400, "offset requires limit")


@dataclass
class SqlBodyParams:
    sql_statement: str = ""

    def __post_init__(self):
        if not self.sql_statement:
            raise ApiError(400, "sql_statement is required")


@dataclass
class BatchBodyParams:
    """Reference ``models.py:483`` — a list of relative-url request dicts
    ``{"url": "/events/raw", "method": "GET", "params": {...},
    "body": {...}}``."""

    requests: list[dict] = field(default_factory=list)

    def __post_init__(self):
        if not self.requests:
            raise ApiError(400, "requests is required")
