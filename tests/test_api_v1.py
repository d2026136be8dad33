"""Handler-level tests for the API v1 serving surface, mirroring the shapes
of reference ``tests/api/v1/test_raw.py`` / ``test_resample.py`` /
``test_batch.py`` (envelope structure, pagination rule, lookup fan-out,
per-request batch error isolation, 400 on bad parameters)."""

import json

import pandas as pd
import pytest

from core_ray.api import (
    ApiError,
    BaseQueryParams,
    BatchBodyParams,
    LimitOffsetQueryParams,
    RawQueryParams,
    ResampleQueryParams,
    SqlBodyParams,
    TagsQueryParams,
)
from core_ray.api.common import json_response, pagination
from core_ray.api.v1 import (
    batch_post,
    raw_events_get,
    resample_events_get,
    sql_post,
)

START = "2024-01-01 00:00:00"
END = "2024-01-31 00:00:00"
TAGS = ["click", "purchase"]


def _base(sf_dir, **kw):
    kw.setdefault("source", f"{sf_dir}/events.parquet")
    return BaseQueryParams(
        tagname_column="event_type",
        timestamp_column="ts",
        status_column=None,
        value_column="value",
        **kw,
    )


def _envelope(resp):
    assert resp.status_code == 200
    assert resp.media_type == "application/json"
    return json.loads(resp.content)


def test_raw_envelope_matches_direct_query(sf_dir):
    resp = raw_events_get(
        _base(sf_dir),
        RawQueryParams(start_date=START, end_date=END),
        TagsQueryParams(list(TAGS)),
    )
    env = _envelope(resp)
    assert set(env) == {"schema", "data", "pagination"}
    names = [f["name"] for f in env["schema"]["fields"]]
    assert names == ["TagName", "EventTime", "Status", "Value"]
    assert env["pagination"] == {"limit": None, "offset": None, "next": None}

    from core_ray.ops import raw

    direct = raw(sf_dir, start=START, end=END, tags=TAGS).to_pandas()
    assert len(env["data"]) == len(direct)
    got = pd.DataFrame(env["data"])
    # ns-ISO timestamps: 9 fractional digits, exact round-trip to storage µs
    assert got["EventTime"].str.match(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{9}$").all()
    back = pd.to_datetime(got["EventTime"]).astype("datetime64[us]")
    direct_sorted = direct.sort_values(["TagName", "EventTime"]).reset_index(drop=True)
    got = got.assign(EventTime=back).sort_values(["TagName", "EventTime"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["TagName", "EventTime", "Status", "Value"]], direct_sorted
    )


def test_raw_pagination_next_offset(sf_dir):
    lo = LimitOffsetQueryParams(limit=10, offset=5)
    resp = raw_events_get(
        _base(sf_dir),
        RawQueryParams(start_date=START, end_date=END),
        TagsQueryParams(list(TAGS)),
        limit_offset_parameters=lo,
    )
    env = _envelope(resp)
    assert len(env["data"]) == 10
    # full page + offset supplied -> next = offset + limit (reference rule)
    assert env["pagination"] == {"limit": 10, "offset": 5, "next": 15}
    # short page -> next stays None
    assert pagination(LimitOffsetQueryParams(limit=10, offset=5), 7).next is None
    # no offset -> next stays None even on a full page
    assert pagination(LimitOffsetQueryParams(limit=10), 10).next is None


def test_raw_lookup_fanout_unions_tables(sf_dir):
    src = f"{sf_dir}/events.parquet"
    resp = raw_events_get(
        _base(sf_dir, tag_table_mapping={"click": src, "purchase": src},
              source=None),
        RawQueryParams(start_date=START, end_date=END),
        TagsQueryParams(list(TAGS)),
    )
    env = _envelope(resp)
    direct = raw_events_get(
        _base(sf_dir),
        RawQueryParams(start_date=START, end_date=END),
        TagsQueryParams(list(TAGS)),
    )
    direct_env = _envelope(direct)
    key = lambda rows: sorted(
        (r["TagName"], r["EventTime"], r["Value"]) for r in rows
    )
    assert key(env["data"]) == key(direct_env["data"])


def test_resample_envelope(sf_dir):
    resp = resample_events_get(
        _base(sf_dir),
        RawQueryParams(start_date=START, end_date=END),
        ResampleQueryParams("1", "hour", "avg"),
        TagsQueryParams(list(TAGS)),
        limit_offset_parameters=LimitOffsetQueryParams(limit=5, offset=0),
    )
    env = _envelope(resp)
    assert len(env["data"]) == 5
    assert env["pagination"]["next"] == 5


def test_sql_post(sf_dir):
    resp = sql_post(
        BaseQueryParams(source=sf_dir),
        SqlBodyParams("SELECT event_type, count(*) AS n FROM events GROUP BY 1 ORDER BY 1"),
    )
    env = _envelope(resp)
    assert [f["name"] for f in env["schema"]["fields"]] == ["event_type", "n"]
    assert len(env["data"]) >= 2


def test_batch_post_order_and_error_isolation(sf_dir):
    src = f"{sf_dir}/events.parquet"
    resp = batch_post(
        _base(sf_dir),
        BatchBodyParams(
            [
                {
                    "url": "/events/raw",
                    "method": "GET",
                    "params": {
                        "start_date": START, "end_date": END,
                        "tag_name": list(TAGS), "limit": 3, "offset": 0,
                    },
                },
                {
                    "url": "/events/resample",
                    "method": "GET",
                    "params": {
                        "start_date": START, "end_date": END,
                        "tag_name": list(TAGS),
                        "time_interval_rate": "1",
                        "time_interval_unit": "hour",
                        "agg_method": "avg", "limit": 2, "offset": 0,
                    },
                },
                {
                    # bad request: missing dates -> per-request Error frame,
                    # batch itself still succeeds (reference contract)
                    "url": "/events/raw",
                    "method": "GET",
                    "params": {"tag_name": list(TAGS)},
                },
            ]
        ),
    )
    env = _envelope(resp)
    assert len(env["data"]) == 3
    assert len(env["data"][0]["data"]) == 3
    assert len(env["data"][1]["data"]) == 2
    assert "Error" in env["data"][2]["data"][0]


def test_bad_requests_raise_400(sf_dir):
    with pytest.raises(ApiError) as e:
        RawQueryParams(start_date="", end_date="")
    assert e.value.status_code == 400
    with pytest.raises(ApiError):
        ResampleQueryParams("1", "fortnight", "avg")
    with pytest.raises(ApiError):
        BaseQueryParams()  # neither source nor mapping
    with pytest.raises(ApiError):
        batch_post(
            _base(sf_dir),
            BatchBodyParams([{"url": "/nope", "method": "GET", "params": {}}]),
        )
    # unknown column in SQL -> wrapped as 400, not a raw exception
    with pytest.raises(ApiError) as e2:
        sql_post(
            _base(sf_dir),
            SqlBodyParams("SELECT nonexistent_col FROM events"),
        )
    assert e2.value.status_code == 400


def test_app_factory_import_gated():
    try:
        import fastapi  # noqa: F401

        has_fastapi = True
    except ImportError:
        has_fastapi = False
    from core_ray.api.app import create_app

    if has_fastapi:
        app = create_app()
        paths = {r.path for r in app.routes}
        assert "/api/v1/events/raw" in paths
    else:
        with pytest.raises(ImportError):
            create_app()


def test_raw_lookup_fanout_global_pagination(sf_dir):
    """limit/offset across a lookup fan-out must be applied GLOBALLY on the
    union, not once per table (2 tables x limit=10 is NOT 20 rows)."""
    src = f"{sf_dir}/events.parquet"
    lo = LimitOffsetQueryParams(limit=10, offset=5)
    env = _envelope(
        raw_events_get(
            _base(sf_dir, tag_table_mapping={"click": src, "purchase": src},
                  source=None),
            RawQueryParams(start_date=START, end_date=END),
            TagsQueryParams(list(TAGS)),
            limit_offset_parameters=lo,
        )
    )
    assert len(env["data"]) == 10
    assert env["pagination"] == {"limit": 10, "offset": 5, "next": 15}
    # and the page equals the direct path's page (same table, same order)
    direct = _envelope(
        raw_events_get(
            _base(sf_dir),
            RawQueryParams(start_date=START, end_date=END),
            TagsQueryParams(list(TAGS)),
            limit_offset_parameters=lo,
        )
    )
    key = lambda rows: [(r["TagName"], r["EventTime"], r["Value"]) for r in rows]
    assert sorted(key(env["data"])) == sorted(key(direct["data"]))


def test_interpolate_envelope_parity_with_direct_op(sf_dir):
    """Envelope records == the direct interpolate op's page (framework adds
    no semantics), EventTime rendered as the 9-digit ns-ISO string."""
    from core_ray.api import InterpolateQueryParams
    from core_ray.api.v1 import interpolate_events_get
    from core_ray.ops import interpolate

    resp = interpolate_events_get(
        _base(sf_dir),
        RawQueryParams(start_date=START, end_date=END),
        InterpolateQueryParams("1", "hour"),
        TagsQueryParams(list(TAGS)),
        limit_offset_parameters=LimitOffsetQueryParams(limit=8, offset=4),
    )
    env = _envelope(resp)
    assert env["pagination"] == {"limit": 8, "offset": 4, "next": 12}
    direct = (
        interpolate(sf_dir, start=START, end=END, rate=1, unit="hour",
                    tags=list(TAGS))
        .sort(["TagName", "EventTime"])
        .to_pandas()
        .iloc[4:12]
        .reset_index(drop=True)
    )
    got = pd.DataFrame(env["data"])
    assert list(got["TagName"]) == list(direct["TagName"])
    assert [t[:23] for t in got["EventTime"]] == [
        ts.isoformat(timespec="milliseconds") for ts in direct["EventTime"]
    ]
    assert all(t.endswith("000000") for t in got["EventTime"])


def test_plot_envelope_quadruples(sf_dir):
    """Every (tag, window) page group carries exactly the four OHLC arms."""
    from core_ray.api import PlotQueryParams
    from core_ray.api.v1 import plot_events_get

    resp = plot_events_get(
        _base(sf_dir),
        RawQueryParams(start_date=START, end_date=END),
        PlotQueryParams("6", "hour"),
        TagsQueryParams(list(TAGS)),
        limit_offset_parameters=LimitOffsetQueryParams(limit=16, offset=8),
    )
    env = _envelope(resp)
    got = pd.DataFrame(env["data"])
    assert len(got) == 16
    per = got.groupby(["TagName", "EventTime"])["Aggregation"].agg(sorted)
    assert all(list(a) == ["First", "Last", "Max", "Min"] for a in per)
