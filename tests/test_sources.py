"""Sources: SQL passthrough, ISO fixture lifecycle, weather filters."""

import numpy as np
import pandas as pd

import ray.data


def test_sql_query_passthrough(sf_dir):
    from core_ray.sources import sql_query

    ds = sql_query(sf_dir, "SELECT r_name FROM region ORDER BY r_name", limit=3, offset=1)
    names = [r["r_name"] for r in ds.take_all()]
    assert len(names) == 3
    assert names == sorted(names)


def test_iso_fixture_source_lifecycle():
    from core_ray.sources import FixtureISOSource

    csv = b"Timestamp,Load_MW\n2024-01-01 00:00,100.5\n2024-01-01 01:00,\n2024-01-01 02:00,99.0\n"
    src = FixtureISOSource(csv, zone="CAISO")
    ds = src.read_batch()
    df = ds.to_pandas()
    # the NaN load row is sanitized away; prepare lower-cased + zoned
    assert len(df) == 2
    assert df["zone"].unique().tolist() == ["CAISO"]
    assert df["load_mw"].tolist() == [100.5, 99.0]


def _weather_ds():
    df = pd.DataFrame(
        {
            "lat": [10.0, 10.0, 20.0, 20.0],
            "lon": [30.0, 30.0, 40.0, 40.0],
            "forecast_time": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-01", "2024-01-03"]
            ),
            "temp": [1.0, 2.0, 3.0, 4.0],
        }
    )
    return ray.data.from_pandas(df)


def test_weather_point_and_box():
    from core_ray.sources import weather_latest, weather_raw

    point = weather_raw(_weather_ds(), point=(10.0, 30.0)).to_pandas()
    assert len(point) == 2 and set(point["lat"]) == {10.0}

    box = weather_raw(_weather_ds(), box=(15.0, 25.0, 35.0, 45.0)).to_pandas()
    assert len(box) == 2 and set(box["lat"]) == {20.0}

    latest = weather_latest(_weather_ds()).to_pandas().sort_values("lat")
    assert latest["temp"].tolist() == [2.0, 4.0]  # max forecast_time per cell
