"""Per-vendor JSON -> PCDM preset transformers, mirroring the reference's
vendor fixture tests (tests/.../transformers/spark/test_*_json_to_pcdm.py):
one small payload per vendor, asserted row by row."""

import numpy as np
import pandas as pd
import ray.data


def _ds(payload: str) -> ray.data.Dataset:
    return ray.data.from_items([{"body": payload}])


PCDM_COLS = ["TagName", "EventTime", "Status", "Value", "ValueType", "ChangeType"]


def test_fledge_to_pcdm():
    from core_ray.stages.vendors import fledge_opcua_to_pcdm

    body = (
        '[{"asset":"a1","readings":{"tagA":-0.913545458},'
        '"timestamp":"2024-05-03 08:45:42.509118+00:00"},'
        '{"asset":"a2","readings":{"tagB":"textval"},'
        '"timestamp":"2024-05-04 08:45:42.509118+00:00"}]'
    )
    df = fledge_opcua_to_pcdm(_ds(body)).to_pandas().sort_values("TagName")
    assert list(df.columns) == PCDM_COLS
    assert df["TagName"].tolist() == ["tagA", "tagB"]
    assert df["Value"].tolist() == ["-0.913545458", "textval"]
    assert df["ValueType"].tolist() == ["float", "string"]
    assert df["ChangeType"].unique().tolist() == ["insert"]
    assert df["EventTime"].iloc[0] == pd.Timestamp("2024-05-03 08:45:42.509118")


def test_opc_publisher_to_pcdm():
    from core_ray.stages.vendors import opc_publisher_opcua_to_pcdm

    body = (
        '[{"NodeId":"ns=2;s=T1","DisplayName":"T1",'
        '"Value":{"Value":1.0,"SourceTimestamp":"2024-04-19T16:41:55.002Z"}},'
        '{"NodeId":"ns=2;s=T2","DisplayName":"T2",'
        '"Value":{"Value":2.0,"StatusCode":{"Symbol":"BadCommunicationError","Code":3},'
        '"SourceTimestamp":"2024-04-19T16:41:55.056Z"}}]'
    )
    df = opc_publisher_opcua_to_pcdm(_ds(body)).to_pandas().sort_values("TagName")
    assert df["TagName"].tolist() == ["T1", "T2"]
    assert df["Status"].tolist() == ["Good", "BadCommunicationError"]
    assert df["ValueType"].unique().tolist() == ["float"]
    assert df["EventTime"].iloc[1] == pd.Timestamp("2024-04-19 16:41:55.056000")


def test_edgex_to_pcdm():
    from core_ray.stages.vendors import edgex_to_pcdm

    body = (
        '{"apiVersion":"v2","readings":['
        '{"resourceName":"temp","origin":1700000000000000000,'
        '"valueType":"Float32","value":"21.5"},'
        '{"resourceName":"count","origin":1700000001000000000,'
        '"valueType":"Int64","value":"3"},'
        '{"resourceName":"ok","origin":1700000002000000000,'
        '"valueType":"Bool","value":"true"}]}'
    )
    df = edgex_to_pcdm(_ds(body)).to_pandas().sort_values("TagName")
    assert df["TagName"].tolist() == ["count", "ok", "temp"]
    assert df["ValueType"].tolist() == ["integer", "bool", "float"]
    assert df["EventTime"].tolist()[2] == pd.Timestamp(1700000000000000000 // 1000, unit="us")


def test_aio_to_pcdm():
    from core_ray.stages.vendors import aio_to_pcdm

    inner = (
        '{"tag1":{"SourceTimestamp":"2024-02-01T00:00:01Z","Value":42},'
        '"tag2":{"SourceTimestamp":"2024-02-01T00:00:02Z","Value":"hello"}}'
    )
    body = '{"Payload": ' + inner + "}"
    df = aio_to_pcdm(_ds(body)).to_pandas().sort_values("TagName")
    assert df["TagName"].tolist() == ["tag1", "tag2"]
    assert df["ValueType"].tolist() == ["float", "string"]
    assert df["Value"].tolist() == ["42", "hello"]


def test_sem_to_pcdm():
    from core_ray.stages.vendors import sem_to_pcdm

    mappings = {
        0: {"TagName": "VOLT", "ValueType": "float"},
        1: {"TagName": "AMP", "ValueType": "float"},
    }
    body = (
        '{"readings":{"resourceName":["dID","d","t"],'
        '"value":["dev7","[230.1,4.5]","1700000000123456"]}}'
    )
    df = sem_to_pcdm(_ds(body), mappings).to_pandas().sort_values("TagName")
    assert df["TagName"].tolist() == ["dev7:AMP", "dev7:VOLT"]
    assert df["Value"].tolist() == ["4.5", "230.1"]
    assert df["ValueType"].unique().tolist() == ["float"]
    # epoch digits split after 10 chars: 1700000000.123456 s
    assert df["EventTime"].iloc[0] == pd.Timestamp(1700000000123456, unit="us")


def test_honeywell_apm_to_pcdm():
    from core_ray.stages.vendors import honeywell_apm_to_pcdm

    body = (
        '{"SystemTimeSeries":{"Id":"x","Samples":['
        '{"ItemName":"it1","Time":"2024-07-31T06:53:00+00:00","Value":"5.0"},'
        '{"ItemName":"it2","Time":"2024-07-31T06:53:00.205+00:00","Value":"strv"}]}}'
    )
    df = honeywell_apm_to_pcdm(_ds(body)).to_pandas().sort_values("TagName")
    assert df["TagName"].tolist() == ["it1", "it2"]
    assert df["ValueType"].tolist() == ["float", "string"]


def test_vendor_pcdm_feeds_merge_sink(tmp_path):
    """Vendor output plugs straight into the PCDM merge sink."""
    from core_ray.stages.vendors import fledge_opcua_to_pcdm
    from core_ray.state.pcdm_merge import PCDMMergeSink

    body = (
        '[{"asset":"a","readings":{"t1":1.5,"t2":"x"},'
        '"timestamp":"2024-05-03 08:45:42+00:00"}]'
    )
    pcdm = fledge_opcua_to_pcdm(_ds(body))
    sink = PCDMMergeSink(str(tmp_path / "pcdm"))
    stats = sink.apply(pcdm)
    assert stats["upserts"] == 2


def test_mirico_to_pcdm_tagnames():
    from core_ray.stages.vendors import mirico_to_pcdm

    body = (
        '{"timeStamp": "2024-11-03T16:21:16", "siteName": "siteA",'
        ' "retroName": "retro1", "gasType": "CH4",'
        ' "gasPpm": 1.91, "quality": 10}'
    )
    df = mirico_to_pcdm(_ds(body)).to_pandas().sort_values("TagName")
    assert df["TagName"].tolist() == ["SITEA_RETRO1_GASPPM_CH4", "SITEA_RETRO1_QUALITY"]
    assert df["ValueType"].unique().tolist() == ["float"]
    assert df["EventTime"].iloc[0] == pd.Timestamp("2024-11-03 16:21:16")

    pref = mirico_to_pcdm(_ds(body), tagname_field="mirico").to_pandas()
    assert pref["TagName"].str.startswith("MIRICO:").all()


def test_mirico_to_metadata():
    from core_ray.stages.vendors import mirico_to_metadata

    body = (
        '{"siteName": "siteA", "retroName": "retro1",'
        ' "retroLatitude": 51.2, "retroLongitude": 4.1, "retroAltitude": 12.0}'
    )
    df = mirico_to_metadata(_ds(body)).to_pandas()
    assert df["TagName"].tolist() == ["SITEA_RETRO1"]
    assert df["Description"].iloc[0] == "lat: 51.2, long: 4.1"


def test_opcua_to_pcdm():
    from core_ray.stages.vendors import opcua_to_pcdm

    body = (
        '{"MessageId":"12345","MessageType":"test","PublisherId":"opcua_pub",'
        '"Messages":[{"DataSetWriterId":12345,"Timestamp":"2024-05-07T09:54:31.6769914Z",'
        '"Payload":{"tag_1":{"Value":100.2}}},'
        '{"DataSetWriterId":56789,"Timestamp":"2024-05-07T09:54:31.6509972Z",'
        '"Payload":{"tag_2":{"Value":79}}}]}'
    )
    df = opcua_to_pcdm(_ds(body)).to_pandas().sort_values("TagName")
    assert df["TagName"].tolist() == ["tag_1", "tag_2"]
    assert df["Value"].tolist() == ["100.2", "79"]
    assert df["ValueType"].tolist() == ["float", "float"]
    assert df["Status"].tolist() == ["Good", "Good"]
    assert df["ChangeType"].tolist() == ["insert", "insert"]
    assert df["EventTime"].iloc[0] == pd.Timestamp("2024-05-07 09:54:31.676991")


def test_ssip_pi_json_to_pcdm():
    import json as _json

    import pyarrow as pa

    from core_ray.stages.vendors import ssip_pi_json_to_pcdm

    bodies = [
        _json.dumps(
            {"TagName": "Test1", "EventTime": "2023-04-19T16:41:55.002+00:00",
             "Quality": "Good", "Value": "1.0"}
        ),
        _json.dumps(
            {"TagName": "Test2", "EventTime": "2023-04-19T16:41:55.056+00:00",
             "Quality": "Bad", "Value": "test"}
        ),
        _json.dumps(
            {"TagName": "Test3", "EventTime": "2023-04-20T00:00:01+00:00",
             "Quality": "Good", "Value": "7"}
        ),
    ]
    props = [
        {"PointType": "Float32", "Action": "Add"},
        {"PointType": "String", "Action": "Update"},
        {"Action": "Insert"},  # PointType from broadcast metadata
    ]
    ds = ray.data.from_arrow(pa.table({"body": bodies, "properties": props}))
    df = (
        ssip_pi_json_to_pcdm(ds, metadata_point_types={"Test3": "Int32"})
        .to_pandas()
        .sort_values("TagName")
    )
    assert df["ValueType"].tolist() == ["float", "string", "integer"]
    assert df["ChangeType"].tolist() == ["insert", "update", "insert"]
    assert df["Status"].tolist() == ["Good", "Bad", "Good"]
    assert str(df["EventDate"].iloc[0]) == "2023-04-19"
    assert str(df["EventDate"].iloc[2]) == "2023-04-20"

    # integer PointType with a non-integer value demotes to string
    ds2 = ray.data.from_arrow(
        pa.table(
            {
                "body": [_json.dumps({"TagName": "T", "EventTime":
                    "2023-04-19T00:00:00+00:00", "Quality": "Good", "Value": "x"})],
                "properties": [{"PointType": "Int16", "Action": "Refresh"}],
            }
        )
    )
    df2 = ssip_pi_json_to_pcdm(ds2).to_pandas()
    assert df2["ValueType"].tolist() == ["string"]
    assert df2["ChangeType"].tolist() == ["update"]


def test_opc_publisher_ae_to_events():
    import json as _json

    from core_ray.stages.vendors import opc_publisher_ae_to_events

    t = "2023-10-19T13:08:08.503Z"
    alarm = {
        "NodeId": "ns=6;s=MyLevel.Alarm",
        "EndpointUrl": "opc.tcp://srv/OPCUA/SimulationServer",
        "DisplayName": "MyLevelAlarm",
        "Value": {
            "ConditionId": {"Value": "ns#s=MyLevel.Alarm", "SourceTimestamp": t},
            "AckedState": {"Value": "Unacknowledged", "SourceTimestamp": t},
            "AckedState/Id": {"Value": False, "SourceTimestamp": t},
            "ActiveState": {"Value": "Inactive", "SourceTimestamp": t},
            "ActiveState/Id": {"Value": False, "SourceTimestamp": t},
            "EnabledState": {"Value": "Enabled", "SourceTimestamp": t},
            "EnabledState/Id": {"Value": True, "SourceTimestamp": t},
            "EventType": {"Value": "i=9482", "SourceTimestamp": t},
            "HighHighLimit": {"Value": 90, "SourceTimestamp": t},
            "HighLimit": {"Value": 70, "SourceTimestamp": t},
            "InputNode": {"Value": None, "SourceTimestamp": t},
            "LowLimit": {"Value": 30, "SourceTimestamp": t},
            "LowLowLimit": {"Value": 10, "SourceTimestamp": t},
            "Message": {"Value": "Level exceeded", "SourceTimestamp": t},
            "Quality": {"Value": None, "SourceTimestamp": t},
            "ReceiveTime": {"Value": t, "SourceTimestamp": t},
            "Retain": {"Value": True, "SourceTimestamp": t},
            "Severity": {"Value": 500, "SourceTimestamp": t},
            "SourceName": {"Value": "MyLevel", "SourceTimestamp": t},
            "Time": {"Value": t, "SourceTimestamp": t},
        },
    }
    df = opc_publisher_ae_to_events(_ds(_json.dumps([alarm]))).to_pandas()
    assert len(df) == 1
    r = df.iloc[0]
    assert r["NodeId"] == "ns=6;s=MyLevel.Alarm"
    assert r["DisplayName"] == "MyLevelAlarm"
    assert r["AckedState/Id"] == False and r["EnabledState/Id"] == True
    assert r["HighHighLimit"] == 90.0 and r["Severity"] == 500.0
    assert r["EventTime"] == pd.Timestamp("2023-10-19 13:08:08.503")
    assert r["ReceiveTime"] == pd.Timestamp("2023-10-19 13:08:08.503")
    assert pd.isna(r["InputNode"]) and pd.isna(r["Quality"])
    assert df["EventTime"].dtype.kind == "M"


def test_raw_forecast_to_weather_data_model():
    from core_ray.stages.weather_model import (
        WEATHER_DATA_MODEL,
        raw_forecast_to_weather_data_model,
    )

    raw = pd.DataFrame(
        {
            "Latitude": [32.3667], "Longitude": [-95.3],
            "FcstValidLocal": ["2024-01-15T07:00:00-0600"],
            "Temp": [42], "Dewpt": [36], "Rh": [79], "Hi": [42], "Wc": [38],
            "Wdir": [180], "Wspd": [9], "Clds": [84], "Qpf": [0.0],
            "DayInd": ["D"], "Dow": ["Monday"], "Gust": [None], "Mslp": [1017.1],
            "Num": [1], "Pop": [""], "PrecipType": ["rain"], "SnowQpf": [0.0],
            "UvIndex": [1], "Vis": [10.0],
        }
    )
    out = raw_forecast_to_weather_data_model(
        ray.data.from_pandas(raw), processed_date="2024-01-15 12:00:00"
    )
    tbl = out.to_pandas()
    assert list(tbl.columns) == [f.name for f in WEATHER_DATA_MODEL]
    r = tbl.iloc[0]
    assert r["WeatherDay"] == "2024-01-15"
    assert r["WeatherHour"] == 8  # local hour + 1
    assert r["WeatherTimezoneOffset"] == "-0600"
    assert r["WeatherType"] == "F"
    assert r["Temperature"] == 42.0 and r["Humidity"] == 79.0
    assert pd.isna(r["PropOfPrecip"])  # blank string -> NULL before cast
    assert pd.isna(r["WindGust"])
    assert r["ProcessedDate"] == pd.Timestamp("2024-01-15 12:00:00")


def test_vendor_parse_accepts_nan_literals():
    """stdlib json accepted NaN/Infinity literals; the orjson fast path must
    fall back rather than fail the whole batch."""
    import math

    import ray.data

    from core_ray.stages.vendors import fledge_opcua_to_pcdm

    body = '[{"asset": "a", "timestamp": "2024-01-01T00:00:00Z", "readings": {"t1": NaN}}]'
    df = fledge_opcua_to_pcdm(
        ray.data.from_items([{"body": body}])
    ).to_pandas()
    assert len(df) == 1 and df["TagName"].iloc[0] == "t1"
    assert df["Value"].iloc[0] == "nan"


def test_pcdm_to_json_byte_parity_with_stdlib_dumps():
    """The vectorized writer must emit EXACTLY json.dumps(row, sort_keys=True,
    default=str) bytes for every dtype class (numpy int/bool quoted via
    default=str, floats bare incl. NaN literal, datetimes ns-ISO)."""
    import json as _json

    import numpy as np
    import pandas as pd
    import ray.data

    from core_ray.stages.transformers import pcdm_to_json

    df = pd.DataFrame(
        {
            "TagName": ["a", 'qu"ote'],
            "EventTime": pd.to_datetime(
                ["2024-01-02 03:04:05.123456", "2024-01-02 03:04:06.000001"]
            ).astype("datetime64[us]"),
            "Value": [1.5, float("nan")],
            "Count": np.array([3, 4], np.int64),
            "Flag": np.array([True, False]),
        }
    )
    got = pcdm_to_json(ray.data.from_pandas(df)).to_pandas()["payload"]
    for i, row in enumerate(df.itertuples(index=False)):
        d = row._asdict()
        for k, v in d.items():
            if isinstance(v, pd.Timestamp):
                d[k] = v.strftime("%Y-%m-%dT%H:%M:%S.%f") + "000Z"
        assert got.iloc[i] == _json.dumps(d, sort_keys=True, default=str)
