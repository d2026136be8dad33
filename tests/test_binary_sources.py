"""SSIP PI binary-file parse + AMQP header decode kernels."""

import io
import struct
from datetime import datetime, timezone

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from core_ray.stages.binary_sources import (
    decode_amqp_value,
    decode_kafka_headers_to_amqp_properties,
    ssip_pi_binary_file_to_pcdm,
)


def _pi_file_bytes(with_valuetype: bool) -> bytes:
    cols = {
        "TagName": pa.array(["PI.T1", "PI.T2"]),
        "EventTime": pa.array(
            [datetime(2024, 3, 1, 10, 0), datetime(2024, 3, 2, 11, 30)],
            pa.timestamp("us"),
        ),
        "Status": pa.array(["Good", "Good"]),
        "Value": pa.array([17, 23], pa.int32()),
    }
    if with_valuetype:
        cols["ValueType"] = pa.array(["integer", "integer"])
    buf = io.BytesIO()
    pq.write_table(pa.table(cols), buf)
    return buf.getvalue()


def test_ssip_pi_binary_file_parse():
    rows = [
        {"path": "f1.parquet", "content": _pi_file_bytes(False)},
        {"path": "f2.parquet", "content": _pi_file_bytes(True)},
        {"path": "bad.parquet", "content": b"not parquet at all"},
    ]
    ds = ray.data.from_items(rows)
    out = ssip_pi_binary_file_to_pcdm(ds).to_pandas()
    assert len(out) == 4  # corrupt file contributes zero rows
    assert list(out.columns) == [
        "EventDate", "TagName", "EventTime", "Status", "Value", "ValueType", "ChangeType"
    ]
    # int32 Value schema with no ValueType column -> 'integer' default
    assert set(out["ValueType"]) == {"integer"}
    assert set(out["ChangeType"]) == {"insert"}
    assert out["Value"].tolist() == ["17", "23", "17", "23"]
    assert str(out["EventDate"].iloc[0]) == "2024-03-01"


def test_amqp_primitives_roundtrip():
    assert decode_amqp_value(b"\x40")[1] is None
    assert decode_amqp_value(b"\x41")[1] is True
    assert decode_amqp_value(b"\x56\x00")[1] is False
    assert decode_amqp_value(b"\x52\x2a")[1] == 42  # small uint
    assert decode_amqp_value(b"\x81" + struct.pack(">q", -7))[1] == -7
    assert decode_amqp_value(b"\x70" + struct.pack(">I", 123456))[1] == 123456
    assert decode_amqp_value(b"\xa1\x05hello")[1] == "hello"
    assert decode_amqp_value(b"\xb1" + struct.pack(">I", 3) + b"abc")[1] == "abc"
    ts = decode_amqp_value(b"\x83" + struct.pack(">q", 1700000000000))[1]
    assert ts == datetime.fromtimestamp(1700000000, tz=timezone.utc)


def test_kafka_headers_to_properties():
    headers = {
        "x-opt-offset": b"\xa1\x0412345"[:6],  # str8 '1234' then '5' trimmed
        "x-opt-enqueued-time": b"\x83" + struct.pack(">q", 1700000000000),
        "x-opt-sequence-number": b"\x52\x07",
        "broken": b"\xff\x00",
    }
    props = decode_kafka_headers_to_amqp_properties(headers)
    assert props["x-opt-offset"] == "1234"
    assert props["x-opt-enqueued-time"].startswith("2023-11-14T22:13:20")
    assert props["x-opt-sequence-number"] == "7"
    assert "broken" in props  # undecodable values survive as text
