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


def test_miso_historical_pivot_and_fill():
    from core_ray.sources.iso import MISOHistoricalLoadISOSource

    csv = (
        b"MarketDay,HourEnding,LoadResource Zone,MTLF (MWh),ActualLoad (MWh)\n"
        b"MarketDay,HourEnding,LoadResource Zone,MTLF (MWh),ActualLoad (MWh)\n"  # repeated header
        b"2023-05-10,1,LRZ1,100,101\n"
        b"2023-05-10,1,MISO,500,\n"          # missing actual -> filled from MTLF
        b"2023-05-10,2,LRZ1,110,111\n"
        b"2023-05-10,2,MISO,510,511\n"
        b"2023-05-11,1,LRZ1,200,201\n"       # outside range, clamped away
        b"2023-05-11,1,MISO,600,601\n"
    )
    src = MISOHistoricalLoadISOSource([csv], "2023-05-10", "2023-05-10")
    df = src._get_data()
    assert list(df.columns) == ["Datetime", "Lrz1", "Miso"]
    assert len(df) == 2
    assert df["Miso"].tolist() == [500.0, 511.0]   # filled value first hour
    assert df["Datetime"].iloc[0].hour == 0        # HourEnding-1

    # fill_missing=False drops the NaN actual row instead
    src = MISOHistoricalLoadISOSource([csv], "2023-05-10", "2023-05-10", fill_missing=False)
    df = src._get_data()
    assert pd.isna(df["Miso"].iloc[0])             # pivot leaves a hole


def test_caiso_historical_chunks_and_concat():
    from core_ray.sources.iso import CAISOHistoricalLoadISOSource, chunked_date_ranges

    ranges = chunked_date_ranges(pd.Timestamp("2023-01-01"), pd.Timestamp("2023-03-01"), 30)
    assert len(ranges) == 2
    assert ranges[0][0] == pd.Timestamp("2023-01-01")
    assert ranges[1][1] == pd.Timestamp("2023-03-02")  # end-exclusive clamp

    row = (
        b"INTERVALSTARTTIME_GMT,INTERVALENDTIME_GMT,LOAD_TYPE,OPR_DT,OPR_HR,"
        b"OPR_INTERVAL,MARKET_RUN_ID,TAC_AREA_NAME,LABEL,XML_DATA_ITEM,POS,MW,"
        b"EXECUTION_TYPE,GROUP\n"
        b"2023-01-0%dT00:00:00-00:00,2023-01-0%dT01:00:00-00:00,1,2023-01-01,1,"
        b"0,ACTUAL,CA ISO-TAC,Total Actual Hourly Integrated Load,SYS_FCST_ACT_MW,"
        b"1,25000,ACTUAL,ALL\n"
    )
    p1 = row.replace(b"%d", b"1")
    p2 = row.replace(b"%d", b"2")
    src = CAISOHistoricalLoadISOSource([p1, p2], "2023-01-01", "2023-03-01")
    df = src._get_data()
    assert len(df) == 2
    assert df["Load"].tolist() == [25000, 25000]
    import pytest

    with pytest.raises(ValueError):
        CAISOHistoricalLoadISOSource([p1], "2023-01-01", "2023-03-01")._get_data()


def test_pjm_pricing_da_rt_and_historical():
    from core_ray.sources.iso import PJMDailyPricingISOSource, PJMHistoricalPricingISOSource

    def mk(sfx):
        return (
            f"datetime_beginning_utc,pnode_id,pnode_name,voltage,equipment,type,zone,"
            f"system_energy_price_{sfx},total_lmp_{sfx},congestion_price_{sfx},"
            f"marginal_loss_price_{sfx},version_nbr\n"
            f"2023-06-01 05:00,5021,PJM-RTO,345 KV,XF,ZONE,PJM,28.1,30.5,1.2,1.2,1\n"
            f"2023-06-03 05:00,5021,PJM-RTO,345 KV,XF,ZONE,PJM,29.1,31.5,1.3,1.1,1\n"
        ).encode()

    da = PJMDailyPricingISOSource(mk("da"), "day_ahead")._get_data()
    assert da["TotalLmp"].tolist() == [30.5, 31.5]
    rt = PJMDailyPricingISOSource(mk("rt"), "real_time")._get_data()
    assert rt["SystemEnergyPrice"].tolist() == [28.1, 29.1]
    assert list(da.columns) == list(rt.columns)

    hist = PJMHistoricalPricingISOSource([mk("da")], "2023-06-01", "2023-06-02")._get_data()
    assert len(hist) == 1  # 06-03 clamped out


def test_pjm_historical_load_clamp():
    from core_ray.sources.iso import PJMHistoricalLoadISOSource

    csv = (
        b"datetime_beginning_utc,datetime_ending_utc,area,actual_load\n"
        b"2023-06-01 00:00,2023-06-01 01:00,AE,1000\n"
        b"2023-06-05 00:00,2023-06-05 01:00,AE,1100\n"
    )
    df = PJMHistoricalLoadISOSource([csv], "2023-06-01", "2023-06-02")._get_data()
    assert df["load"].tolist() == [1000]
