"""Weather Company raw forecast → weather data model.

Reference ``transformers/spark/the_weather_company/raw_forecast_to_weather_data_model.py:86-137``:
rename the vendor's short column names to the model's long names, derive
``WeatherDay`` / ``WeatherHour`` / ``WeatherTimezoneOffset`` from the local
validity string ``FcstValidLocal`` (= ``YYYY-MM-DDTHH:MM:SS±HHMM``), stamp
``WeatherType='F'`` and a processing timestamp, blank strings → NULL, and
cast every column to the weather-model schema.

Implemented as one vectorized pandas ``map_batches`` stage (string slicing
and casting are columnar; no per-row Python).  ``processed_date`` is a
parameter instead of ``datetime.now()`` so output is deterministic and
repeatable across retries — at scale a re-executed Ray task must produce the
identical block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_RENAMES = {
    "Temp": "Temperature",
    "Dewpt": "DewPoint",
    "Rh": "Humidity",
    "Hi": "HeatIndex",
    "Wc": "WindChill",
    "Wdir": "WindDirection",
    "Wspd": "WindSpeed",
    "Clds": "CloudCover",
    "Qpf": "Precipitation",
    "DayInd": "DayOrNight",
    "Dow": "DayOfWeek",
    "Gust": "WindGust",
    "Mslp": "MslPressure",
    "Num": "ForecastDayNum",
    "Pop": "PropOfPrecip",
    "SnowQpf": "SnowAccumulation",
    "Vis": "Visibility",
}

WEATHER_DATA_MODEL = pa.schema(
    [
        ("Latitude", pa.float64()),
        ("Longitude", pa.float64()),
        ("WeatherDay", pa.string()),
        ("WeatherHour", pa.int32()),
        ("WeatherTimezoneOffset", pa.string()),
        ("WeatherType", pa.string()),
        ("ProcessedDate", pa.timestamp("us")),
        ("Temperature", pa.float64()),
        ("DewPoint", pa.float64()),
        ("Humidity", pa.float64()),
        ("HeatIndex", pa.float64()),
        ("WindChill", pa.float64()),
        ("WindDirection", pa.float64()),
        ("WindSpeed", pa.float64()),
        ("CloudCover", pa.float64()),
        ("WetBulbTemp", pa.string()),
        ("SolarIrradiance", pa.string()),
        ("Precipitation", pa.float64()),
        ("DayOrNight", pa.string()),
        ("DayOfWeek", pa.string()),
        ("WindGust", pa.int32()),
        ("MslPressure", pa.float64()),
        ("ForecastDayNum", pa.int32()),
        ("PropOfPrecip", pa.int32()),
        ("PrecipType", pa.string()),
        ("SnowAccumulation", pa.float64()),
        ("UvIndex", pa.float64()),
        ("Visibility", pa.float64()),
    ]
)


def raw_forecast_to_weather_data_model(
    ds: ray.data.Dataset, processed_date: str
) -> ray.data.Dataset:
    """Conform a raw Weather Company forecast Dataset to WEATHER_DATA_MODEL."""
    processed = np.datetime64(pd.Timestamp(processed_date).to_datetime64(), "us")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns=_RENAMES)
        valid = df["FcstValidLocal"].astype("string")
        df["WeatherDay"] = valid.str.slice(0, 10)
        df["WeatherHour"] = valid.str.slice(11, 13).astype("Int64") + 1
        df["WeatherTimezoneOffset"] = valid.str.slice(19, 24)
        df["WeatherType"] = "F"
        df["ProcessedDate"] = processed
        df["WetBulbTemp"] = pd.array([None] * len(df), dtype="string")
        df["SolarIrradiance"] = pd.array([None] * len(df), dtype="string")
        out = {}
        for field in WEATHER_DATA_MODEL:
            col = df[field.name] if field.name in df else pd.Series([None] * len(df))
            # blank strings -> NULL before the cast (reference `:128-133`)
            if col.dtype == object or str(col.dtype) == "string":
                col = col.mask(col.astype("string") == "")
                # Spark casts string->numeric implicitly (e.g. Pop '1'->1);
                # pyarrow needs the parse to happen first
                if pa.types.is_integer(field.type) or pa.types.is_floating(field.type):
                    col = pd.to_numeric(col, errors="coerce")
            out[field.name] = pa.array(col, field.type, from_pandas=True)
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pandas")
