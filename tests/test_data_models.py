"""MDM typed models: validation, enum values, schema conformance, and the
wide_to_mdm -> conform_mdm_usage pipeline (reference data_models/timeseries.py
and _pipeline_utils/mdm.py)."""

import pandas as pd
import pytest

import ray.data

from core_ray.data_models import (
    MDM_META_SCHEMA,
    MDM_USAGE_SCHEMA,
    MetaData,
    ModelType,
    SeriesType,
    Uom,
    ValueType,
    conform_mdm_usage,
    create_usage_vo,
    meta_table,
    usage_table,
)


def _meta(**over) -> MetaData:
    base = dict(
        Uid="m1", SeriesId="s1", SeriesParentId="p", Name="meter one",
        Uom=Uom.KWH, Description="d", TimestampStart=1704067200,
        TimestampEnd=1706659200, Timezone="UTC", Version="1",
        SeriesType=SeriesType.Hour, ModelType=ModelType.AMI_USAGE,
        ValueType=ValueType.Usage, Properties={"a": "1"},
    )
    base.update(over)
    return MetaData(**base)


def test_usage_validation_and_schema():
    vo = create_usage_vo("m1", "s1", 1704067200, 1704067200, 2.5)
    t = usage_table([vo, {"Uid": "m2", "SeriesId": "s2", "Timestamp": 1704067260,
                          "IntervalTimestamp": 1704067200, "Value": 3.0}])
    assert t.schema.equals(MDM_USAGE_SCHEMA)
    assert t["Timestamp"][0].as_py() == pd.Timestamp("2024-01-01 00:00:00")
    with pytest.raises(Exception):
        create_usage_vo("m1", "s1", "not-a-ts", 0, 1.0)


def test_meta_enums_and_composed_flags():
    # composed IntFlag members keep reference arithmetic
    assert ValueType.ShortTermForecast == ValueType.ShortTerm | ValueType.Forecast
    assert int(SeriesType.Hour) == 64
    t = meta_table([_meta(ValueType=ValueType.ShortTermForecast)])
    assert t.schema.equals(MDM_META_SCHEMA)
    assert t["ValueType"][0].as_py() == int(ValueType.ShortTerm | ValueType.Forecast)
    assert t["Uom"][0].as_py() == "KWH"
    assert t["Properties"][0].as_py() == [("a", "1")]
    with pytest.raises(Exception):
        _meta(Uom="not-a-uom")


def test_wide_to_mdm_conforms_to_usage_schema():
    from core_ray.stages.transformers import wide_to_mdm

    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 01:00:00"]),
            "zone_a": [1.0, 2.0],
            "zone_b": [3.0, 4.0],
        }
    )
    ds = wide_to_mdm(
        ray.data.from_pandas(df), value_columns=["zone_a", "zone_b"],
        timestamp_column="ts", series_prefix="iso:",
    )
    out = conform_mdm_usage(ds)
    tbl = out.to_pandas()
    assert len(tbl) == 4
    assert sorted(tbl["SeriesId"].unique()) == ["iso:zone_a", "iso:zone_b"]
    schema = out.schema()
    names = list(schema.names)
    assert names == [f.name for f in MDM_USAGE_SCHEMA]
