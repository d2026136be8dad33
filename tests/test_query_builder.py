"""The fluent TimeSeriesQueryBuilder facade must produce outputs identical
to calling the ops directly — every terminal method is driven over the
events fixture and compared frame-for-frame (reference
``time_series_query_builder.py`` parameter names)."""

import pandas as pd
import pytest

from core_ray.queries import TimeSeriesQueryBuilder

START = "2024-01-01 00:00:00"
END = "2024-01-31 00:00:00"
TAGS2 = ["click", "purchase"]
ALL_TAGS = ["click", "error", "purchase", "signup", "view"]
META = {
    "click": {"UoM": "degC", "Step": True},
    "error": {"UoM": "bar", "Step": True},
    "purchase": {"UoM": "kWh", "Step": False},
    "signup": {"UoM": "m3", "Step": False},
    "view": {"UoM": None, "Step": True},
}


def _b(sf_dir) -> TimeSeriesQueryBuilder:
    return (
        TimeSeriesQueryBuilder()
        .connect()
        .source(
            sf_dir + "/events.parquet",
            tagname_column="event_type",
            timestamp_column="ts",
            status_column=None,
            value_column="value",
        )
        .m_source(META)
    )


def _df(res) -> pd.DataFrame:
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _expect(op, *args, **kw) -> pd.DataFrame:
    from core_ray.ops.common import SeriesSpec

    spec = SeriesSpec(tag_col="event_type", ts_col="ts", value_col="value", status_col=None)
    return _df(op(*args, spec=spec, **kw))


def test_builder_raw_matches_direct(sf_dir):
    from core_ray.ops import raw

    got = _df(_b(sf_dir).raw(tagname_filter=TAGS2, start_date=START, end_date=END))
    want = _expect(raw, sf_dir + "/events.parquet", start=START, end=END, tags=TAGS2,
                   include_bad=False)
    pd.testing.assert_frame_equal(got, want)


def test_builder_raw_uom_and_pagination(sf_dir):
    got = _b(sf_dir).raw(
        tagname_filter=TAGS2, start_date=START, end_date=END,
        display_uom=True, limit=50, offset=10,
    )
    assert isinstance(got, pd.DataFrame)
    assert len(got) == 50
    assert set(got["UoM"].unique()) <= {"degC", "kWh"}


def test_builder_resample_matches_direct(sf_dir):
    from core_ray.ops import resample

    got = _df(_b(sf_dir).resample(
        tagname_filter=ALL_TAGS, start_date=START, end_date=END,
        time_interval_rate="1", time_interval_unit="hour", agg_method="avg",
    ))
    want = _expect(resample, sf_dir + "/events.parquet", start=START, end=END,
                   rate=1, unit="hour", agg="avg", tags=ALL_TAGS, include_bad=False)
    pd.testing.assert_frame_equal(got, want)


def test_builder_resample_pivot(sf_dir):
    got = _df(_b(sf_dir).resample(
        tagname_filter=ALL_TAGS, start_date=START, end_date=END,
        time_interval_rate="1", time_interval_unit="day", agg_method="last",
        pivot=True,
    ))
    assert list(got.columns) == ["EventTime"] + ALL_TAGS


def test_builder_interpolate_matches_direct(sf_dir):
    from core_ray.ops import interpolate

    got = _df(_b(sf_dir).interpolate(
        tagname_filter=ALL_TAGS, start_date=START, end_date=END,
        time_interval_rate="1", time_interval_unit="hour",
    ))
    want = _expect(interpolate, sf_dir + "/events.parquet", start=START, end=END,
                   rate=1, unit="hour", tags=ALL_TAGS, include_bad=False)
    pd.testing.assert_frame_equal(got, want)


def test_builder_interpolation_at_time(sf_dir):
    from core_ray.ops import interpolation_at_time

    ats = ["2024-01-05 00:00:00", "2024-01-10 12:30:00"]
    got = _df(_b(sf_dir).interpolation_at_time(tagname_filter=ALL_TAGS, timestamp_filter=ats))
    want = _expect(interpolation_at_time, sf_dir + "/events.parquet",
                   timestamps=ats, tags=ALL_TAGS, include_bad=False)
    pd.testing.assert_frame_equal(got, want)


def test_builder_twa_metadata_step(sf_dir):
    from core_ray.ops import time_weighted_average

    got = _df(_b(sf_dir).time_weighted_average(
        tagname_filter=ALL_TAGS, start_date=START, end_date=END,
        time_interval_rate="1", time_interval_unit="hour", step="metadata",
    ))
    want = _expect(time_weighted_average, sf_dir + "/events.parquet",
                   start=START, end=END, rate=1, unit="hour",
                   step="metadata", metadata=META, tags=ALL_TAGS)
    pd.testing.assert_frame_equal(got, want)


def test_builder_circular_and_summary_and_latest(sf_dir):
    from core_ray.ops import circular_average, latest, summary

    got = _df(_b(sf_dir).circular_average(
        tagname_filter=TAGS2, start_date=START, end_date=END,
        time_interval_rate="1", time_interval_unit="day",
        lower_bound=0.0, upper_bound=360.0,
    ))
    want = _expect(circular_average, sf_dir + "/events.parquet", start=START, end=END,
                   rate=1, unit="day", lower_bound=0.0, upper_bound=360.0,
                   tags=TAGS2, include_bad=False)
    pd.testing.assert_frame_equal(got, want)

    got = _df(_b(sf_dir).summary(tagname_filter=ALL_TAGS, start_date=START, end_date=END))
    want = _expect(summary, sf_dir + "/events.parquet", start=START, end=END,
                   tags=ALL_TAGS, include_bad=False)
    pd.testing.assert_frame_equal(got, want)

    got = _df(_b(sf_dir).latest())
    want = _expect(latest, sf_dir + "/events.parquet")
    pd.testing.assert_frame_equal(got, want)


def test_builder_metadata_and_display_uom_guard(sf_dir):
    got = _df(_b(sf_dir).metadata(tagname_filter=["click", "view"]))
    assert got["TagName"].tolist() == ["click", "view"]
    assert got["Step"].tolist() == [True, True]

    nb = TimeSeriesQueryBuilder().source(
        sf_dir + "/events.parquet",
        tagname_column="event_type",
        timestamp_column="ts",
        status_column=None,
        value_column="value",
    )
    with pytest.raises(ValueError, match="display_uom"):
        nb.raw(tagname_filter=TAGS2, start_date=START, end_date=END, display_uom=True)


def test_get_module_params_dict(sf_dir):
    """The parameter-dict get() wrappers accept both get(params) and the
    reference's get(connection, params)."""
    from core_ray.queries.time_series import raw as raw_mod

    p = {
        "source": sf_dir + "/events.parquet",
        "tagname_column": "event_type",
        "timestamp_column": "ts",
        "status_column": None,
        "value_column": "value",
        "tag_names": TAGS2,
        "start_date": START,
        "end_date": END,
    }
    a = _df(raw_mod.get(None, p))
    b = _df(raw_mod.get(p))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_batch_get_order_preserving(sf_dir):
    from core_ray.queries.time_series import batch

    base = {
        "source": sf_dir + "/events.parquet",
        "tagname_column": "event_type",
        "timestamp_column": "ts",
        "status_column": None,
        "value_column": "value",
        "start_date": START,
        "end_date": END,
    }
    out = batch.get([
        {"type": "raw", "parameters_dict": {**base, "tag_names": ["click"]}},
        {"type": "resample", "parameters_dict": {
            **base, "tag_names": ["click"], "time_interval_rate": "1",
            "time_interval_unit": "day", "agg_method": "count"}},
    ])
    assert len(out) == 2
    raw_df, rs_df = _df(out[0]), _df(out[1])
    assert set(raw_df["TagName"]) == {"click"}
    assert {"TagName", "EventTime", "Value"} <= set(rs_df.columns)


def test_weather_query_builder(sf_dir):
    """WeatherQueryBuilder point/grid/latest arms over the weather fixture:
    point = exact lat/lon, grid = STRICT bounds (reference SQL), raw also
    filters the forecast-run timestamp range."""
    import ray.data

    from core_ray.queries import WeatherQueryBuilder

    df = pd.DataFrame(
        {
            "Latitude": [10.0, 10.0, 20.0, 20.0, 30.0],
            "Longitude": [30.0, 30.0, 40.0, 40.0, 50.0],
            "EventTime": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-01", "2024-01-04", "2024-01-02"]
            ),
            "EnqueuedTime": pd.to_datetime(
                ["2023-12-31", "2024-01-01", "2023-12-31", "2024-01-03", "2024-01-01"]
            ),
            "TagName": ["p1_temp", "p1_temp", "p2_temp", "p2_wind", "p3_temp"],
            "Value": [1.5, 2.5, 4.5, 5.5, 6.5],
        }
    )

    def b():
        return WeatherQueryBuilder().connect().source(ray.data.from_pandas(df))

    got = b().raw_point(
        start_date="2024-01-01", end_date="2024-01-05",
        forecast_run_start_date="2023-12-30", forecast_run_end_date="2024-01-02",
        lat=10.0, lon=30.0,
    ).to_pandas()
    assert got["Value"].tolist() == [1.5, 2.5]

    # strict grid excludes the boundary cell (lat=10 is NOT > 10)
    got = b().raw_grid(
        start_date="2024-01-01", end_date="2024-01-05",
        forecast_run_start_date="2023-12-30", forecast_run_end_date="2024-01-05",
        min_lat=10.0, min_lon=30.0, max_lat=35.0, max_lon=55.0,
    ).to_pandas()
    assert sorted(got["Value"].tolist()) == [4.5, 5.5, 6.5]

    # run-timestamp window prunes the 2024-01-03 forecast run
    got = b().raw_grid(
        start_date="2024-01-01", end_date="2024-01-05",
        forecast_run_start_date="2023-12-30", forecast_run_end_date="2024-01-02",
        min_lat=10.0, min_lon=30.0, max_lat=35.0, max_lon=55.0,
    ).to_pandas()
    assert sorted(got["Value"].tolist()) == [4.5, 6.5]

    # latest per cell + measurement suffix filter
    got = b().latest_grid(min_lat=5.0, min_lon=25.0, max_lat=35.0, max_lon=55.0,
                          measurement="temp").to_pandas()
    assert sorted(got["Value"].tolist()) == [2.5, 4.5, 6.5]

    got = b().latest_point(lat=20.0, lon=40.0).to_pandas()
    assert got["Value"].tolist() == [5.5]


def test_weather_parameter_dict_wrappers(sf_dir):
    """queries.weather.raw/latest get_grid/get_point parameter-dict wrappers
    (reference queries/weather/raw.py:20,81 latest.py:20,72) return the same
    rows as the builder arms they wrap."""
    import ray.data

    from core_ray.queries.weather import latest as w_latest
    from core_ray.queries.weather import raw as w_raw

    df = pd.DataFrame(
        {
            "Latitude": [10.0, 10.0, 20.0],
            "Longitude": [30.0, 30.0, 40.0],
            "EventTime": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-01"]),
            "EnqueuedTime": pd.to_datetime(["2023-12-31", "2024-01-01", "2023-12-31"]),
            "TagName": ["p1_temp", "p1_temp", "p2_temp"],
            "Value": [1.5, 2.5, 4.5],
        }
    )
    base = {
        "source": ray.data.from_pandas(df),
        "start_date": "2024-01-01",
        "end_date": "2024-01-05",
        "forecast_run_start_date": "2023-12-30",
        "forecast_run_end_date": "2024-01-02",
    }

    got = w_raw.get_point(None, {**base, "lat": 10.0, "lon": 30.0}).to_pandas()
    assert got["Value"].tolist() == [1.5, 2.5]

    got = w_raw.get_grid(
        None, {**base, "min_lat": 5.0, "min_lon": 25.0, "max_lat": 25.0, "max_lon": 45.0}
    ).to_pandas()
    assert sorted(got["Value"].tolist()) == [1.5, 2.5, 4.5]

    got = w_latest.get_grid(
        None, {"source": ray.data.from_pandas(df), "min_lat": 5.0, "min_lon": 25.0,
               "max_lat": 25.0, "max_lon": 45.0}
    ).to_pandas()
    assert sorted(got["Value"].tolist()) == [2.5, 4.5]

    got = w_latest.get_point(
        None, {"source": ray.data.from_pandas(df), "lat": 10.0, "lon": 30.0, "limit": 5}
    )
    assert got["Value"].tolist() == [2.5]


def test_sql_query_builder(sf_dir):
    """SQLQueryBuilder.get (reference queries/sql/sql_query.py:21): plain,
    paginated, and to_json arms over the registered tables."""
    from core_ray.queries import SQLQueryBuilder

    b = SQLQueryBuilder()
    got = b.get(sf_dir, "SELECT r_regionkey FROM region ORDER BY r_regionkey").to_pandas()
    assert got["r_regionkey"].tolist() == [0, 1, 2, 3, 4]

    got = b.get(
        sf_dir, "SELECT r_regionkey FROM region ORDER BY r_regionkey", limit=2, offset=1
    ).to_pandas()
    assert got["r_regionkey"].tolist() == [1, 2]

    got = b.get(
        sf_dir,
        "SELECT r_regionkey AS k FROM region ORDER BY r_regionkey",
        to_json=True,
        limit=1,
    ).to_pandas()
    assert got["Value"].tolist() == ['{"k":0}']


def test_query_date_parsing():
    """Reference date-normalization rules (_utilities_query_builder.py:30-56):
    date-only end_date means end-of-day; bare timestamps gain +00:00;
    date+offset gets the day-bound inserted; engine-native formats pass."""
    from datetime import datetime

    from core_ray.queries._dates import parse_dates, parse_query_date

    assert parse_query_date("2024-01-05") == "2024-01-05T00:00:00+00:00"
    assert parse_query_date("2024-01-05", is_end_date=True) == "2024-01-05T23:59:59+00:00"
    assert parse_query_date("2024-01-05T10:00:00") == "2024-01-05T10:00:00+00:00"
    assert parse_query_date("2024-01-05T10:00:00+02:00") == "2024-01-05T10:00:00+02:00"
    assert parse_query_date("2024-01-05+02:00", is_end_date=True) == "2024-01-05T23:59:59+02:00"
    # midnight datetime = date-only start; non-midnight keeps its time
    assert parse_query_date(datetime(2024, 1, 5)) == "2024-01-05T00:00:00+00:00"
    assert parse_query_date(datetime(2024, 1, 5, 10, 30)) == "2024-01-05T10:30:00+00:00"
    # engine-native space-separated strings pass through untouched
    assert parse_query_date("2024-01-05 10:00:00") == "2024-01-05 10:00:00"

    p = parse_dates({"start_date": "2024-01-01", "end_date": "2024-01-05",
                     "timestamps": ["2024-01-02T01:00:00"]})
    assert p["start_date"].endswith("T00:00:00+00:00")
    assert p["end_date"].endswith("T23:59:59+00:00")
    assert p["timestamps"] == ["2024-01-02T01:00:00+00:00"]


def test_builder_end_date_is_end_of_day(sf_dir):
    """A date-only end_date through the parameter-dict layer includes rows
    later that day (the reference's T23:59:59 rule)."""
    import ray.data

    from core_ray.queries.time_series import raw as q_raw

    df = pd.DataFrame(
        {
            "TagName": ["a", "a"],
            "EventTime": pd.to_datetime(["2024-01-02 00:00:00", "2024-01-02 12:00:00"]),
            "Status": ["Good", "Good"],
            "Value": [1.0, 2.0],
        }
    )
    got = q_raw.get(
        None,
        {"source": ray.data.from_pandas(df), "tag_names": ["a"],
         "start_date": "2024-01-01", "end_date": "2024-01-02"},
    )
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert sorted(got["Value"].tolist()) == [1.0, 2.0]


def test_parse_query_date_keeps_microseconds():
    from datetime import datetime

    from core_ray.queries._dates import parse_query_date

    got = parse_query_date(datetime(2024, 1, 1, 12, 0, 0, 500000))
    assert got == "2024-01-01T12:00:00.500000"
    # zero-microsecond datetimes keep the second-precision form
    assert parse_query_date(datetime(2024, 1, 1, 12, 0, 0)) == (
        "2024-01-01T12:00:00+00:00"
    )
