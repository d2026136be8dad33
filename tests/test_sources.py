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


def test_entsoe_source_with_injected_client():
    import pandas as pd

    from core_ray.sources.python_sources import EntsoeSource

    def client(country, start, end, resolution):
        idx = pd.date_range(start, periods=3, freq="1h", tz="UTC")
        return pd.Series([50.0, 51.5, 49.25], index=idx)

    df = (
        EntsoeSource("k", "20240101", "20240102", "NL", client=client)
        .read_batch()
        .to_pandas()
        .sort_values("EventTime")
    )
    assert list(df.columns) == ["EventTime", "Price", "Name"]
    assert df["Price"].tolist() == [50.0, 51.5, 49.25]
    assert (df["Name"] == "APX").all()
    assert str(df["EventTime"].dtype).startswith("datetime64")


def test_ecmwf_extract_point_and_grid():
    import numpy as np

    from core_ray.stages.ecmwf import (
        ecmwf_extract_grid,
        ecmwf_extract_point,
        fake_grid_loader,
    )

    kw = dict(
        load_path="/tmp/nowhere",
        date_start="2024-01-01 00:00:00",
        date_end="2024-01-01 23:00:00",
        run_interval="12",
        run_frequency="H",
        variables=["10u", "2t"],
        tag_prefix="fc_",
        loader=fake_grid_loader(),
        concurrency=1,
    )
    pt = ecmwf_extract_point(lat=41.0, lon=-2.0, **kw).to_pandas()
    # 2 runs (00 and 12) x 4 forecast hours x 2 variables, one point
    assert len(pt) == 2 * 4 * 2
    # the 10u wind component is extracted under its stored name u10
    assert set(pt["TagName"].str.rsplit("_", n=1).str[-1]) == {"u10", "2t"}
    assert pt["TagName"].str.startswith("fc_41.0_-2.0_ECMWF_MARS_").all()
    assert (pt["Status"] == "Good").all() and pt["Latest"].all()
    assert (pt["EnqueuedTime"] <= pt["EventTime"]).all()

    # determinism across executions
    pt2 = ecmwf_extract_point(lat=41.0, lon=-2.0, **kw).to_pandas()
    cols = ["TagName", "EventTime"]
    assert (
        pt.sort_values(cols).reset_index(drop=True)["Value"]
        == pt2.sort_values(cols).reset_index(drop=True)["Value"]
    ).all()

    gr = ecmwf_extract_grid(
        lat_min=40.0, lat_max=44.0, lon_min=-4.0, lon_max=0.0, grid_step=2.0, **kw
    ).to_pandas()
    # 3x3 request grid snapped to the 5x5 fake grid
    assert len(gr) == 2 * 4 * 2 * 3 * 3
    assert set(np.unique(gr["Latitude"])) == {40.0, 42.0, 44.0}
