"""Import-gated FastAPI mount of the v1 handlers (reference
``src/api/FastAPIApp/__init__.py`` + per-endpoint routers).

FastAPI is not installed in this sandbox, so the app factory raises a clear
ImportError when it is absent; the handler layer in :mod:`core_ray.api.v1`
is framework-free and fully functional either way.  Route table mirrors the
reference (``/api/v1/events/raw`` GET/POST, …, ``/api/v1/sql/execute`` POST,
``/api/v1/events/batch`` POST).
"""

from __future__ import annotations

from . import models, v1


def create_app(default_source: str | None = None):
    """Build the FastAPI application.  ``default_source`` supplies the
    parquet table path used when a request omits ``source`` — the sandbox
    analog of the reference's warehouse connection settings."""
    try:
        from fastapi import Body, FastAPI, HTTPException, Query
        from fastapi.responses import Response as FastAPIResponse
    except ImportError as e:  # pragma: no cover - fastapi absent in sandbox
        raise ImportError(
            "fastapi is not installed; use the framework-free handlers in "
            "core_ray.api.v1 directly (they return the same JSON envelopes)"
        ) from e

    app = FastAPI(title="core-ray API", version="v1")

    # param-model __post_init__ validation raises ApiError BEFORE _guard's
    # try/except can run (the models are constructed in the route argument
    # list), so the 400 contract needs an app-level handler too
    @app.exception_handler(models.ApiError)
    def _api_error_handler(_request, exc: models.ApiError):
        from fastapi.responses import JSONResponse

        return JSONResponse(
            status_code=exc.status_code, content={"detail": exc.detail}
        )

    def _respond(resp: models.Response):
        return FastAPIResponse(
            content=resp.content, media_type=resp.media_type,
            status_code=resp.status_code,
        )

    def _guard(fn, *a, **k):
        try:
            return _respond(fn(*a, **k))
        except models.ApiError as e:
            raise HTTPException(status_code=e.status_code, detail=e.detail)

    @app.get("/api/v1/events/raw")
    def raw_get(
        source: str | None = Query(default_source),
        start_date: str = Query(...),
        end_date: str = Query(...),
        include_bad_data: bool = Query(False),
        tag_name: list[str] = Query(...),
        limit: int | None = Query(None),
        offset: int | None = Query(None),
    ):
        return _guard(
            v1.raw_events_get,
            models.BaseQueryParams(source=source),
            models.RawQueryParams(start_date, end_date, include_bad_data),
            models.TagsQueryParams(tag_name),
            models.LimitOffsetQueryParams(limit, offset),
        )

    @app.get("/api/v1/events/resample")
    def resample_get(
        source: str | None = Query(default_source),
        start_date: str = Query(...),
        end_date: str = Query(...),
        include_bad_data: bool = Query(False),
        time_interval_rate: str = Query(...),
        time_interval_unit: str = Query(...),
        agg_method: str = Query("avg"),
        tag_name: list[str] = Query(...),
        pivot: bool = Query(False),
        limit: int | None = Query(None),
        offset: int | None = Query(None),
    ):
        return _guard(
            v1.resample_events_get,
            models.BaseQueryParams(source=source),
            models.RawQueryParams(start_date, end_date, include_bad_data),
            models.ResampleQueryParams(
                time_interval_rate, time_interval_unit, agg_method
            ),
            models.TagsQueryParams(tag_name),
            models.PivotQueryParams(pivot),
            models.LimitOffsetQueryParams(limit, offset),
        )

    @app.get("/api/v1/events/interpolate")
    def interpolate_get(
        source: str | None = Query(default_source),
        start_date: str = Query(...),
        end_date: str = Query(...),
        include_bad_data: bool = Query(False),
        time_interval_rate: str = Query(...),
        time_interval_unit: str = Query(...),
        tag_name: list[str] = Query(...),
        pivot: bool = Query(False),
        limit: int | None = Query(None),
        offset: int | None = Query(None),
    ):
        return _guard(
            v1.interpolate_events_get,
            models.BaseQueryParams(source=source),
            models.RawQueryParams(start_date, end_date, include_bad_data),
            models.InterpolateQueryParams(
                time_interval_rate, time_interval_unit
            ),
            models.TagsQueryParams(tag_name),
            models.PivotQueryParams(pivot),
            models.LimitOffsetQueryParams(limit, offset),
        )

    @app.get("/api/v1/events/plot")
    def plot_get(
        source: str | None = Query(default_source),
        start_date: str = Query(...),
        end_date: str = Query(...),
        time_interval_rate: str = Query(...),
        time_interval_unit: str = Query(...),
        tag_name: list[str] = Query(...),
        limit: int | None = Query(None),
        offset: int | None = Query(None),
    ):
        return _guard(
            v1.plot_events_get,
            models.BaseQueryParams(source=source),
            models.RawQueryParams(start_date, end_date, False),
            models.PlotQueryParams(time_interval_rate, time_interval_unit),
            models.TagsQueryParams(tag_name),
            models.LimitOffsetQueryParams(limit, offset),
        )

    @app.get("/api/v1/events/latest")
    def latest_get(
        source: str | None = Query(default_source),
        tag_name: list[str] = Query(None),
        limit: int | None = Query(None),
        offset: int | None = Query(None),
    ):
        return _guard(
            v1.latest_events_get,
            models.BaseQueryParams(source=source),
            models.TagsQueryParams(tag_name or []),
            models.LimitOffsetQueryParams(limit, offset),
        )

    @app.get("/api/v1/events/metadata")
    def metadata(
        source: str | None = Query(default_source),
        tag_name: list[str] = Query(None),
        limit: int | None = Query(None),
        offset: int | None = Query(None),
    ):
        return _guard(
            v1.metadata_get,
            models.BaseQueryParams(source=source),
            models.MetadataQueryParams(tag_name),
            models.LimitOffsetQueryParams(limit, offset),
        )

    @app.post("/api/v1/sql/execute")
    def sql_execute(
        source: str | None = Query(default_source),
        sql_statement: str = Body(..., embed=True),
        limit: int | None = Query(None),
        offset: int | None = Query(None),
    ):
        return _guard(
            v1.sql_post,
            models.BaseQueryParams(source=source),
            models.SqlBodyParams(sql_statement),
            models.LimitOffsetQueryParams(limit, offset),
        )

    @app.post("/api/v1/events/batch")
    def batch(
        source: str | None = Query(default_source),
        requests: list[dict] = Body(..., embed=True),
    ):
        return _guard(
            v1.batch_post,
            models.BaseQueryParams(source=source),
            models.BatchBodyParams(requests),
        )

    return app
