"""REST API v1 serving surface (reference ``src/api/v1/``).

The handler layer (:mod:`core_ray.api.v1`) is framework-free — plain
callables taking the reference's query-parameter objects and returning a
:class:`core_ray.api.models.Response` whose ``content`` is the reference's
``{"schema": …, "data": …, "pagination": …}`` JSON envelope — so it is fully
testable (and driver-gradable) in this no-network sandbox.  The FastAPI app
itself (:mod:`core_ray.api.app`) is a thin import-gated mount of those
handlers, mirroring the reference route table.
"""

from .models import (
    ApiError,
    BaseQueryParams,
    BatchBodyParams,
    CircularAverageQueryParams,
    InterpolateQueryParams,
    InterpolationAtTimeQueryParams,
    LimitOffsetQueryParams,
    MetadataQueryParams,
    PivotQueryParams,
    PlotQueryParams,
    RawQueryParams,
    ResampleQueryParams,
    Response,
    SqlBodyParams,
    SummaryQueryParams,
    TagsQueryParams,
    TimeWeightedAverageQueryParams,
)

__all__ = [
    "ApiError",
    "BaseQueryParams",
    "BatchBodyParams",
    "CircularAverageQueryParams",
    "InterpolateQueryParams",
    "InterpolationAtTimeQueryParams",
    "LimitOffsetQueryParams",
    "MetadataQueryParams",
    "PivotQueryParams",
    "PlotQueryParams",
    "RawQueryParams",
    "ResampleQueryParams",
    "Response",
    "SqlBodyParams",
    "SummaryQueryParams",
    "TagsQueryParams",
    "TimeWeightedAverageQueryParams",
]
