"""Per-ISO prepare/sanitize logic over CSV fixtures (reference
sources/spark/iso/{caiso,miso,ercot,pjm}_daily_load_iso.py)."""

import pandas as pd

from core_ray.sources.iso import (
    CAISODailyLoadISOSource,
    ERCOTDailyLoadISOSource,
    MISODailyLoadISOSource,
    PJMDailyLoadISOSource,
)


def test_caiso_prepare_and_label_filter():
    csv = (
        "INTERVALSTARTTIME_GMT,INTERVALENDTIME_GMT,LOAD_TYPE,OPR_DT,OPR_HR,"
        "OPR_INTERVAL,MARKET_RUN_ID,TAC_AREA_NAME,LABEL,XML_DATA_ITEM,POS,MW,"
        "EXECUTION_TYPE,GROUP\n"
        "2024-01-01T00:00:00-00:00,2024-01-01T01:00:00-00:00,1,2024-01-01,1,1,"
        "DAM,CA ISO-TAC,Demand Forecast 7-Day Ahead,SYS_FCST_7DA_MW,1,21523.0,D,1\n"
        "2024-01-01T00:00:00-00:00,2024-01-01T01:00:00-00:00,1,2024-01-01,1,1,"
        "DAM,CA ISO-TAC,Other Label,SYS_FCST_2DA_MW,2,99.0,D,1\n"
    ).encode()
    ds = CAISODailyLoadISOSource(csv).read_batch().to_pandas()
    assert len(ds) == 1  # label filter dropped the second row
    assert ds["Load"].iloc[0] == 21523.0
    assert ds["StartTime"].iloc[0] == pd.Timestamp("2024-01-01 00:00:00")
    assert ds["TacAreaName"].iloc[0] == "CA ISO-TAC"


def test_miso_prepare_hourending_and_floats():
    csv = (
        "Market Day,HourEnding,MISO MTLF (MWh),MISO ActualLoad (MWh)\n"
        "2024-01-01,1,70500,70120\n"
        "HourEnding,HourEnding,,\n"  # repeated header row -> dropped
        "2024-01-01,2,69800,\n"
    ).encode()
    # second data row has NaN MTLF? no: blank ActualLoad only; MTLF present
    df = MISODailyLoadISOSource(csv).read_batch().to_pandas()
    assert len(df) == 2
    assert df["date_time"].tolist() == [
        pd.Timestamp("2024-01-01 00:00:00"),
        pd.Timestamp("2024-01-01 01:00:00"),
    ]
    assert df["MISO MTLF (MWh)"].dtype == float


def test_ercot_actual_zone_renames():
    csv = (
        "OperDay,COAST,EAST,FAR_WEST,NORTH,NORTH_C,SOUTH_C,SOUTHERN,WEST,TOTAL,DSTFlag\n"
        "01/15/2024,101.5,55.1,44.2,33.3,22.2,11.1,9.9,8.8,286.1,N\n"
    ).encode()
    df = ERCOTDailyLoadISOSource(csv, load_type="actual").read_batch().to_pandas()
    assert df["Date"].iloc[0] == pd.Timestamp("2024-01-15")
    assert df["NorthCentral"].iloc[0] == 22.2
    assert df["SystemTotal"].iloc[0] == 286.1


def test_pjm_forecast_and_actual_mappings():
    fc = (
        "forecast_datetime_beginning_utc,forecast_datetime_ending_utc,"
        "forecast_area,forecast_load_mw\n"
        "2024-01-01 05:00,2024-01-01 06:00,RTO_COMBINED,88000\n"
    ).encode()
    df = PJMDailyLoadISOSource(fc, load_type="forecast").read_batch().to_pandas()
    assert df["zone"].iloc[0] == "RTO_COMBINED"
    assert df["load"].iloc[0] == 88000
    assert df["start_time"].iloc[0] == pd.Timestamp("2024-01-01 05:00")

    ac = (
        "datetime_beginning_utc,datetime_ending_utc,area,actual_load\n"
        "2024-01-01 05:00,2024-01-01 06:00,AEP,12345\n"
    ).encode()
    df = PJMDailyLoadISOSource(ac, load_type="actual").read_batch().to_pandas()
    assert df["zone"].iloc[0] == "AEP"
    assert df["load"].iloc[0] == 12345
