"""Meters Data Model (MDM) typed models and schemas.

Reference parity: ``data_models/timeseries.py:21-273`` (Uom / ModelType /
SeriesType / ValueType enums and the ``MetaData`` model),
``data_models/meters/ami_meter.py:19`` (``Usage``) and
``_pipeline_utils/mdm.py:25-54`` (the usage/meta storage schemas, expressed
here as pyarrow schemas instead of Spark StructTypes).

Scalar models validate one row (pydantic); the engine-facing surface is the
vectorized one — ``usage_table`` / ``meta_table`` build Arrow tables and
``conform_mdm_usage`` casts any usage-shaped Dataset (e.g. the output of
``stages.transformers.wide_to_mdm``) onto the canonical schema.
"""

from __future__ import annotations

from enum import Enum, IntFlag, auto

import pyarrow as pa
import pyarrow.compute as pc

from pydantic import BaseModel

import ray.data


class Uom(Enum):
    """Units of measurement (reference ``timeseries.py:21-39``)."""

    W = 0
    WH = 1
    KW = 2
    KWH = 3
    MW = 4
    MWH = 5
    WEATHER = 6


class ModelType(IntFlag):
    """Producing model (reference ``timeseries.py:41-54``)."""

    Default = auto()
    AMI_USAGE = auto()
    WEATHER_AG2 = auto()
    WEATHER_ECMWF = auto()


class SeriesType(IntFlag):
    """Interval pattern / derivation of a series (reference
    ``timeseries.py:56-151``)."""

    RealTime = auto()
    Minute1 = auto()
    Minutes5 = auto()
    Minutes10 = auto()
    Minutes15 = auto()
    Minutes30 = auto()
    Hour = auto()
    Hours2 = auto()
    Hours3 = auto()
    Hours4 = auto()
    Hours5 = auto()
    Hours6 = auto()
    Hours8 = auto()
    Hours12 = auto()
    Hours24 = auto()
    Day = auto()
    Week = auto()
    Month = auto()
    Year = auto()
    Sum = auto()
    MeanFilter = auto()
    MedianFilter = auto()
    MaxFilter = auto()
    MinFilter = auto()
    Test = auto()


class ValueType(IntFlag):
    """Kind of value carried by a series (reference
    ``timeseries.py:153-206``)."""

    Counter = auto()
    Gauge = auto()
    Histogram = auto()
    Summary = auto()
    Usage = auto()
    Generation = auto()
    Prediction = auto()
    ShortTerm = auto()
    LongTerm = auto()
    Actuals = auto()
    Backcast = auto()
    Forecast = auto()
    ShortTermBackcast = ShortTerm | Backcast
    LongTermBackcast = LongTerm | Backcast
    ShortTermForecast = ShortTerm | Forecast
    LongTermForecast = LongTerm | Forecast


class Usage(BaseModel):
    """One AMI usage measurement (reference ``ami_meter.py:19-42``):
    timestamps are UTC seconds since epoch."""

    Uid: str
    SeriesId: str
    Timestamp: int
    IntervalTimestamp: int
    Value: float


class MetaData(BaseModel):
    """Sensor/meter metadata and its series association (reference
    ``timeseries.py:208-273``)."""

    Uid: str
    SeriesId: str
    SeriesParentId: str
    Name: str
    Uom: Uom
    Description: str
    TimestampStart: int
    TimestampEnd: int
    Timezone: str
    Version: str
    SeriesType: SeriesType
    ModelType: ModelType
    ValueType: ValueType
    Properties: dict


def create_usage_vo(
    uid: str, series_id: str, timestamp: int, interval_timestamp: int, value: float
) -> Usage:
    """Validated Usage constructor (reference
    ``meters/utils/CreateUsageObject.py:18-29``)."""
    return Usage(
        Uid=uid,
        SeriesId=series_id,
        Timestamp=timestamp,
        IntervalTimestamp=interval_timestamp,
        Value=value,
    )


# storage schemas (reference ``_pipeline_utils/mdm.py:25-54``); Spark
# TimestampType -> timestamp[us], MapType -> map<string,string>
MDM_USAGE_SCHEMA = pa.schema(
    [
        ("Uid", pa.string()),
        ("SeriesId", pa.string()),
        ("Timestamp", pa.timestamp("us")),
        ("IntervalTimestamp", pa.timestamp("us")),
        ("Value", pa.float64()),
    ]
)

MDM_META_SCHEMA = pa.schema(
    [
        ("Uid", pa.string()),
        ("SeriesId", pa.string()),
        ("SeriesParentId", pa.string()),
        ("Name", pa.string()),
        ("Uom", pa.string()),
        ("Description", pa.string()),
        ("TimestampStart", pa.timestamp("us")),
        ("TimestampEnd", pa.timestamp("us")),
        ("Timezone", pa.string()),
        ("Version", pa.string()),
        ("SeriesType", pa.int32()),
        ("ModelType", pa.int32()),
        ("ValueType", pa.int32()),
        ("Properties", pa.map_(pa.string(), pa.string())),
    ]
)


def usage_table(rows: list[Usage | dict]) -> pa.Table:
    """Validated Usage rows -> Arrow table on MDM_USAGE_SCHEMA (epoch-second
    ints become timestamps, like the reference's Spark write path)."""
    vos = [r if isinstance(r, Usage) else Usage(**r) for r in rows]
    return pa.table(
        {
            "Uid": pa.array([v.Uid for v in vos], pa.string()),
            "SeriesId": pa.array([v.SeriesId for v in vos], pa.string()),
            "Timestamp": pa.array(
                [v.Timestamp * 1_000_000 for v in vos], pa.timestamp("us")
            ),
            "IntervalTimestamp": pa.array(
                [v.IntervalTimestamp * 1_000_000 for v in vos], pa.timestamp("us")
            ),
            "Value": pa.array([v.Value for v in vos], pa.float64()),
        }
    )


def meta_table(rows: list[MetaData | dict]) -> pa.Table:
    """Validated MetaData rows -> Arrow table on MDM_META_SCHEMA; enums are
    stored as their integer values (Spark IntegerType columns), Uom by NAME
    string (the reference stores Uom as a string column)."""
    vos = [r if isinstance(r, MetaData) else MetaData(**r) for r in rows]
    return pa.table(
        {
            "Uid": pa.array([v.Uid for v in vos], pa.string()),
            "SeriesId": pa.array([v.SeriesId for v in vos], pa.string()),
            "SeriesParentId": pa.array([v.SeriesParentId for v in vos], pa.string()),
            "Name": pa.array([v.Name for v in vos], pa.string()),
            "Uom": pa.array([v.Uom.name for v in vos], pa.string()),
            "Description": pa.array([v.Description for v in vos], pa.string()),
            "TimestampStart": pa.array(
                [v.TimestampStart * 1_000_000 for v in vos], pa.timestamp("us")
            ),
            "TimestampEnd": pa.array(
                [v.TimestampEnd * 1_000_000 for v in vos], pa.timestamp("us")
            ),
            "Timezone": pa.array([v.Timezone for v in vos], pa.string()),
            "Version": pa.array([v.Version for v in vos], pa.string()),
            "SeriesType": pa.array([int(v.SeriesType) for v in vos], pa.int32()),
            "ModelType": pa.array([int(v.ModelType) for v in vos], pa.int32()),
            "ValueType": pa.array([int(v.ValueType) for v in vos], pa.int32()),
            "Properties": pa.array(
                [sorted(v.Properties.items()) for v in vos],
                pa.map_(pa.string(), pa.string()),
            ),
        }
    )


def conform_mdm_usage(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Cast a usage-shaped Dataset (``wide_to_mdm`` output, an ingest feed)
    onto MDM_USAGE_SCHEMA — vectorized per batch, order preserved."""

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                f.name: pc.cast(t[f.name], f.type) for f in MDM_USAGE_SCHEMA
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
