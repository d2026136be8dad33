"""ISO source family (reference ``sources/spark/iso/base_iso.py:31`` +
CAISO/MISO/ERCOT/PJM subclasses — SURVEY.md §2.3).

The reference pattern is: driver-side HTTP fetch → pandas ``_prepare_data`` /
``_sanitize_data`` → Spark DataFrame.  This sandbox has no network, so the
fetch step is pluggable: ``BaseISOSource._fetch`` returns raw bytes (a real
subclass would call ``requests``; ``FixtureISOSource`` reads a local file or
literal), and the prepare/sanitize hooks transform pandas before the data
enters Ray via ``from_pandas`` — the reference lifecycle preserved 1:1
(``base_iso.py:56,136,191-213``)."""

from __future__ import annotations

import io

import pandas as pd

import ray.data

from ..pipelines.framework import SourceComponent


class BaseISOSource(SourceComponent):
    required_columns: list[str] = []

    def _fetch(self) -> bytes:
        """Raw payload (CSV bytes). Real subclasses do the HTTP call here."""
        raise NotImplementedError

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        """Rename/derive columns (subclass hook)."""
        return df

    def _sanitize_data(self, df: pd.DataFrame) -> pd.DataFrame:
        """Drop invalid rows; enforce required columns."""
        missing = [c for c in self.required_columns if c not in df.columns]
        if missing:
            raise ValueError(f"missing required columns: {missing}")
        return df.dropna(subset=self.required_columns)

    def _get_data(self) -> pd.DataFrame:
        raw = self._fetch()
        df = pd.read_csv(io.BytesIO(raw))
        return self._sanitize_data(self._prepare_data(df))

    def read_batch(self) -> ray.data.Dataset:
        return ray.data.from_pandas(self._get_data())


class CAISODailyLoadISOSource(BaseISOSource):
    """CAISO SLD_FCST daily load (reference ``caiso_daily_load_iso.py:27``):
    GMT interval columns parsed to naive datetimes, OASIS column names mapped
    to the model, rows filtered to the requested load types."""

    required_columns = ["StartTime", "EndTime", "LoadType", "Load"]
    _RENAMES = {
        "INTERVALSTARTTIME_GMT": "StartTime",
        "INTERVALENDTIME_GMT": "EndTime",
        "LOAD_TYPE": "LoadType",
        "OPR_DT": "OprDt",
        "OPR_HR": "OprHr",
        "OPR_INTERVAL": "OprInterval",
        "MARKET_RUN_ID": "MarketRunId",
        "TAC_AREA_NAME": "TacAreaName",
        "LABEL": "Label",
        "XML_DATA_ITEM": "XmlDataItem",
        "POS": "Pos",
        "MW": "Load",
        "EXECUTION_TYPE": "ExecutionType",
        "GROUP": "Group",
    }

    def __init__(self, payload: bytes, load_types: list[str] | None = None):
        self.payload = payload
        self.load_types = load_types or ["Demand Forecast 7-Day Ahead"]

    def _fetch(self) -> bytes:
        return self.payload

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        for c in ("INTERVALSTARTTIME_GMT", "INTERVALENDTIME_GMT"):
            df[c] = pd.to_datetime(df[c].astype(str).str.slice(0, 19))
        return df.rename(columns=self._RENAMES)

    def _sanitize_data(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["Label"].isin(self.load_types)]
        return super()._sanitize_data(df)


class MISODailyLoadISOSource(BaseISOSource):
    """MISO daily MTLF (reference ``miso_daily_load_iso.py``): drops repeated
    header/NaN rows, derives date_time from Market Day + HourEnding-1, casts
    the remaining columns to float."""

    required_columns = ["date_time"]

    def __init__(self, payload: bytes):
        self.payload = payload

    def _fetch(self) -> bytes:
        return self.payload

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(
            df.index[(df["HourEnding"] == "HourEnding") | df["MISO MTLF (MWh)"].isna()]
        )
        df = df.rename(columns={"Market Day": "date"})
        df["date_time"] = pd.to_datetime(df["date"]) + pd.to_timedelta(
            df["HourEnding"].astype(int) - 1, "h"
        )
        df = df.drop(["HourEnding", "date"], axis=1)
        data_cols = df.columns[df.columns != "date_time"]
        df[data_cols] = df[data_cols].astype(float)
        return df.reset_index(drop=True)


class ERCOTDailyLoadISOSource(BaseISOSource):
    """ERCOT daily load (reference ``ercot_daily_load_iso.py``): zone columns
    renamed to model names; Date parsed from OperDay/DeliveryDate depending on
    actual vs forecast."""

    required_columns = ["Date"]
    _ACTUAL_RENAMES = {
        "COAST": "Coast", "EAST": "East", "FAR_WEST": "FarWest", "NORTH": "North",
        "NORTH_C": "NorthCentral", "SOUTH_C": "SouthCentral", "SOUTHERN": "Southern",
        "WEST": "West", "TOTAL": "SystemTotal", "DSTFlag": "DstFlag",
    }

    def __init__(self, payload: bytes, load_type: str = "actual"):
        self.payload = payload
        self.load_type = load_type

    def _fetch(self) -> bytes:
        return self.payload

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.load_type == "actual":
            df["Date"] = pd.to_datetime(df["OperDay"], format="%m/%d/%Y")
            df = df.rename(columns=self._ACTUAL_RENAMES)
        else:
            df = df.rename(columns={"DSTFlag": "DstFlag"})
            df["Date"] = pd.to_datetime(df["DeliveryDate"], format="%m/%d/%Y")
        return df


class PJMDailyLoadISOSource(BaseISOSource):
    """PJM daily load (reference ``pjm_daily_load_iso.py:27``): forecast vs
    actual column sets mapped onto (start_time, end_time, zone, load)."""

    required_columns = ["start_time", "zone", "load"]

    def __init__(self, payload: bytes, load_type: str = "forecast"):
        self.payload = payload
        self.load_type = load_type

    def _fetch(self) -> bytes:
        return self.payload

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.load_type == "forecast":
            renames = {
                "forecast_datetime_beginning_utc": "start_time",
                "forecast_area": "zone",
                "forecast_datetime_ending_utc": "end_time",
                "forecast_load_mw": "load",
            }
        else:
            renames = {
                "datetime_beginning_utc": "start_time",
                "area": "zone",
                "datetime_ending_utc": "end_time",
                "actual_load": "load",
            }
        df = df.rename(columns=renames)
        for c in ("start_time", "end_time"):
            if c in df.columns:
                df[c] = pd.to_datetime(df[c])
        return df


class MISOHistoricalLoadISOSource(MISODailyLoadISOSource):
    """MISO historical daily forecast+actual load (reference
    ``miso_historical_load_iso.py:24``): repeated-header rows dropped, missing
    ActualLoad filled from the MTLF forecast (``fill_missing``), long →
    wide pivot per LoadResource Zone, LRZ column renames, then a date-range
    clamp + sort in sanitize.  The reference parses yearly Excel pulls; here
    the per-year payloads are injected (CSV bytes) — the prepare/sanitize
    semantics are preserved 1:1."""

    required_columns = ["Datetime"]
    _ZONE_RENAMES = {
        "LRZ1": "Lrz1", "LRZ2_7": "Lrz2_7", "LRZ3_5": "Lrz3_5", "LRZ4": "Lrz4",
        "LRZ6": "Lrz6", "LRZ8_9_10": "Lrz8_9_10", "MISO": "Miso",
        "DATE_TIME": "Datetime",
    }

    def __init__(self, payloads: list[bytes], start_date: str, end_date: str,
                 fill_missing: bool = True):
        self.payloads = payloads
        self.start_date = pd.Timestamp(start_date)
        self.end_date = pd.Timestamp(end_date)
        self.fill_missing = fill_missing

    def _get_data(self) -> pd.DataFrame:
        frames = [pd.read_csv(io.BytesIO(p)) for p in self.payloads]
        df = pd.concat(frames, sort=False) if frames else pd.DataFrame()
        return self._sanitize_data(self._prepare_data(df))

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["MarketDay"] != "MarketDay"]
        if self.fill_missing:
            df = df.fillna({"ActualLoad (MWh)": df["MTLF (MWh)"]})
        df = df.rename(
            columns={
                "MarketDay": "date",
                "HourEnding": "hour",
                "ActualLoad (MWh)": "load",
                "LoadResource Zone": "zone",
            }
        )
        df = df.dropna()
        df["date_time"] = pd.to_datetime(df["date"]) + pd.to_timedelta(
            df["hour"].astype(int) - 1, "h"
        )
        df = df.drop(["hour", "date"], axis=1)
        df["load"] = df["load"].astype(float)
        df = df.pivot_table(index="date_time", values="load", columns="zone").reset_index()
        df.columns = [str(c.split(" ")[0]).upper() for c in df.columns]
        return df.rename(columns=self._ZONE_RENAMES)

    def _sanitize_data(self, df: pd.DataFrame) -> pd.DataFrame:
        end = self.end_date.replace(hour=23, minute=59, second=59)
        df = df[(df["Datetime"] >= self.start_date) & (df["Datetime"] <= end)]
        df = df.sort_values("Datetime").reset_index(drop=True)
        return super(MISODailyLoadISOSource, self)._sanitize_data(df)


def chunked_date_ranges(
    start: pd.Timestamp, end: pd.Timestamp, days: int = 30
) -> list[tuple[pd.Timestamp, pd.Timestamp]]:
    """The reference's paged-pull windowing (``caiso_historical_load_iso.py``):
    [start, end] split into ``days``-sized half-open chunks, last clamped."""
    end = end + pd.Timedelta(days=1)
    out = []
    for d in pd.date_range(start, end, freq=f"{days}D", inclusive="left"):
        out.append((d, min(d + pd.Timedelta(days=days), end)))
    return out


class CAISOHistoricalLoadISOSource(CAISODailyLoadISOSource):
    """CAISO historical load (reference ``caiso_historical_load_iso.py:30``):
    same OASIS prepare as the daily source; pulls are chunked into 30-day
    ranges (``chunked_date_ranges``) and concatenated.  Per-chunk payloads
    are injected keyed by chunk index."""

    def __init__(self, payloads: list[bytes], start_date: str, end_date: str,
                 load_types: list[str] | None = None):
        super().__init__(b"", load_types or ["Total Actual Hourly Integrated Load"])
        self.payloads = payloads
        self.start_date = pd.Timestamp(start_date)
        self.end_date = pd.Timestamp(end_date)
        if self.start_date > self.end_date:
            raise ValueError("start_date must not be after end_date")

    def chunks(self) -> list[tuple[pd.Timestamp, pd.Timestamp]]:
        return chunked_date_ranges(self.start_date, self.end_date, days=30)

    def _get_data(self) -> pd.DataFrame:
        n = len(self.chunks())
        if len(self.payloads) != n:
            raise ValueError(f"expected {n} chunk payloads, got {len(self.payloads)}")
        frames = [pd.read_csv(io.BytesIO(p)) for p in self.payloads]
        df = pd.concat(frames, ignore_index=True)
        return self._sanitize_data(self._prepare_data(df))


class PJMDailyPricingISOSource(BaseISOSource):
    """PJM day-ahead / real-time hourly LMP pricing (reference
    ``pjm_daily_pricing_iso.py:29``): load_type selects the da/rt column set
    (``_prepare_data`` `:167-229`), projected onto the fixed pricing model."""

    required_columns = ["StartTime", "PnodeId", "TotalLmp"]
    _COMMON = {
        "datetime_beginning_utc": "StartTime", "pnode_id": "PnodeId",
        "pnode_name": "PnodeName", "voltage": "Voltage", "equipment": "Equipment",
        "type": "Type", "zone": "Zone", "version_nbr": "VersionNbr",
    }
    _OUT_COLS = [
        "StartTime", "PnodeId", "PnodeName", "Voltage", "Equipment", "Type",
        "Zone", "SystemEnergyPrice", "TotalLmp", "CongestionPrice",
        "MarginalLossPrice", "VersionNbr",
    ]

    def __init__(self, payload: bytes, load_type: str = "day_ahead"):
        if load_type not in ("day_ahead", "real_time"):
            raise ValueError("load_type must be day_ahead or real_time")
        self.payload = payload
        self.load_type = load_type

    def _fetch(self) -> bytes:
        return self.payload

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        sfx = "da" if self.load_type == "day_ahead" else "rt"
        renames = dict(self._COMMON)
        renames.update(
            {
                f"system_energy_price_{sfx}": "SystemEnergyPrice",
                f"total_lmp_{sfx}": "TotalLmp",
                f"congestion_price_{sfx}": "CongestionPrice",
                f"marginal_loss_price_{sfx}": "MarginalLossPrice",
            }
        )
        df = df.rename(columns=renames)[self._OUT_COLS]
        df["StartTime"] = pd.to_datetime(df["StartTime"])
        return df


class PJMHistoricalPricingISOSource(PJMDailyPricingISOSource):
    """PJM historical pricing (reference ``pjm_historical_pricing_iso.py:29``):
    daily-pricing prepare over chunked archive pulls, clamped to the
    requested [start_date, end_date] window in sanitize."""

    def __init__(self, payloads: list[bytes], start_date: str, end_date: str,
                 load_type: str = "day_ahead"):
        super().__init__(b"", load_type)
        self.payloads = payloads
        self.start_date = pd.Timestamp(start_date)
        self.end_date = pd.Timestamp(end_date)

    def _get_data(self) -> pd.DataFrame:
        frames = [pd.read_csv(io.BytesIO(p)) for p in self.payloads]
        df = pd.concat(frames, ignore_index=True)
        return self._sanitize_data(self._prepare_data(df))

    def _sanitize_data(self, df: pd.DataFrame) -> pd.DataFrame:
        end = self.end_date.replace(hour=23, minute=59, second=59)
        df = df[(df["StartTime"] >= self.start_date) & (df["StartTime"] <= end)]
        df = df.sort_values(["StartTime", "PnodeId"]).reset_index(drop=True)
        return super()._sanitize_data(df)


class PJMHistoricalLoadISOSource(PJMDailyLoadISOSource):
    """PJM historical load (reference ``pjm_historical_load_iso.py:26``):
    daily-load actual prepare over chunked pulls + window clamp."""

    def __init__(self, payloads: list[bytes], start_date: str, end_date: str):
        super().__init__(b"", load_type="actual")
        self.payloads = payloads
        self.start_date = pd.Timestamp(start_date)
        self.end_date = pd.Timestamp(end_date)

    def _get_data(self) -> pd.DataFrame:
        frames = [pd.read_csv(io.BytesIO(p)) for p in self.payloads]
        df = pd.concat(frames, ignore_index=True)
        return self._sanitize_data(self._prepare_data(df))

    def _sanitize_data(self, df: pd.DataFrame) -> pd.DataFrame:
        end = self.end_date.replace(hour=23, minute=59, second=59)
        df = df[(df["start_time"] >= self.start_date) & (df["start_time"] <= end)]
        df = df.sort_values(["start_time", "zone"]).reset_index(drop=True)
        return super()._sanitize_data(df)


class FixtureISOSource(BaseISOSource):
    """Deterministic ISO source over a CSV fixture (file path or bytes)."""

    required_columns = ["timestamp", "load_mw"]

    def __init__(self, fixture: str | bytes, zone: str = "ZONE1"):
        self.fixture = fixture
        self.zone = zone

    def _fetch(self) -> bytes:
        if isinstance(self.fixture, bytes):
            return self.fixture
        with open(self.fixture, "rb") as f:
            return f.read()

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={c: c.strip().lower() for c in df.columns})
        df["zone"] = self.zone
        df["timestamp"] = pd.to_datetime(df["timestamp"])
        return df
