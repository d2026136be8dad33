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


def test_polars_source_bridges_parquet(sf_dir):
    from core_ray.sources.python_sources import PolarsSource

    ds = PolarsSource(f"{sf_dir}/nation.parquet").read_batch()
    assert ds.count() == 25
    assert "n_name" in ds.schema().names


def test_mffbas_prepare_profiles():
    from core_ray.sources.python_sources import MFFBASSource

    payload = {
        "Detail_SeriesList": [
            {
                "calendar_date": "2024-01-01",
                "pFdate_version": "v1",
                "profileCategory": "E1A",
                "determinedConsumption": "SJV",
                "direction": "E17",
                "resolution": "PT15M",
                "profileStatus_quality": "D",
                "PointList": [
                    {"pos": 0, "qnt": 0.5},
                    {"pos": 1, "qnt": 0.7},
                    {"pos": 96, "qnt": 9.9},  # pos >= 96 dropped
                ],
            },
            {
                "calendar_date": "2024-01-01",
                "pFdate_version": "v1",
                "profileCategory": "E1B",
                "determinedConsumption": "SJV",
                "direction": "E18",
                "resolution": "PT15M",
                "profileStatus_quality": "D",
                "PointList": [{"pos": 0, "qnt": 1.5}],
            },
        ]
    }
    df = MFFBASSource(payload).read_batch().to_pandas()
    assert "E1A_SJV_A" in df.columns and "E1B_SJV_I" in df.columns
    import pandas as pd

    assert df.loc[df["Versienr"] == pd.Timestamp("2024-01-01 00:00"), "E1A_SJV_A"].iloc[0] == 0.5
    assert df.loc[df["Versienr"] == pd.Timestamp("2024-01-01 00:15"), "E1A_SJV_A"].iloc[0] == 0.7
    assert len(df) == 2  # pos 96 dropped
    assert df["year_created"].iloc[0] == "2024-01-01"
