"""Binary parse kernels: SSIP PI binary-file → PCDM, AMQP header decode.

- :func:`ssip_pi_binary_file_to_pcdm` mirrors the reference's grouped-per-file
  parse (``transformers/spark/ssip_pi_binary_file_to_pcdm.py:25,131-134``):
  each row carries one file's bytes (an embedded Parquet table); it is read
  in-memory, defaulted ValueType/ChangeType columns are added and the PCDM
  shape (+EventDate) is emitted.  Corrupt files yield zero rows, like the
  reference's exception arm.
- :func:`decode_amqp_value` / :func:`decode_kafka_headers_to_amqp_properties`
  re-express the Eventhub-over-Kafka AMQP header decode
  (``sources/spark/kafka_eventhub.py:323-335``).  The decoder is written from
  the AMQP 1.0 OASIS type-encoding spec (primitive constructors only — the
  subset message annotations use).
"""

from __future__ import annotations

import struct
import uuid
from datetime import datetime, timezone

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

# --- SSIP PI binary file ----------------------------------------------------

PCDM_FILE_COLS = [
    "EventDate", "TagName", "EventTime", "Status", "Value", "ValueType", "ChangeType"
]


def _parse_one_file(content: bytes) -> pd.DataFrame:
    try:
        table = pq.read_table(pa.py_buffer(content))
    except Exception:
        return pd.DataFrame(columns=PCDM_FILE_COLS)
    df = table.to_pandas()  # per-batch (one binary file)
    if "ValueType" not in df.columns:
        vt = str(table.schema.field("Value").type)
        if vt in ("int16", "int32"):
            vt = "integer"
        df["ValueType"] = vt
    if "ChangeType" not in df.columns:
        df["ChangeType"] = "insert"
    df["EventDate"] = pd.to_datetime(df["EventTime"]).dt.date
    df["Value"] = df["Value"].astype(str)
    return df[PCDM_FILE_COLS]


def ssip_pi_binary_file_to_pcdm(
    ds: ray.data.Dataset, content_column: str = "content"
) -> ray.data.Dataset:
    """Each input row = one binary file (embedded Parquet) → PCDM rows."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        frames = [_parse_one_file(c) for c in df[content_column]]
        frames = [f for f in frames if len(f)]
        return (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(columns=PCDM_FILE_COLS)
        )

    return ds.map_batches(fn, batch_format="pandas")


# --- AMQP 1.0 primitive decode (OASIS spec subset) --------------------------

_S = {
    "B": struct.Struct(">B"), "b": struct.Struct(">b"),
    "H": struct.Struct(">H"), "h": struct.Struct(">h"),
    "I": struct.Struct(">I"), "i": struct.Struct(">i"),
    "Q": struct.Struct(">Q"), "q": struct.Struct(">q"),
    "f": struct.Struct(">f"), "d": struct.Struct(">d"),
}


def decode_amqp_value(buf: bytes):
    """Decode one AMQP 1.0 primitive-typed value; returns (rest, value)."""
    if not buf:
        raise ValueError("empty AMQP buffer")
    ctor, rest = buf[0], buf[1:]
    if ctor == 0x40:  # null
        return rest, None
    if ctor == 0x41:
        return rest, True
    if ctor == 0x42:
        return rest, False
    if ctor == 0x56:  # boolean with payload
        return rest[1:], rest[0] == 1
    if ctor == 0x43:  # uint0
        return rest, 0
    if ctor == 0x44:  # ulong0
        return rest, 0
    if ctor in (0x50, 0x52, 0x53):  # ubyte / small uint / small ulong
        return rest[1:], rest[0]
    if ctor == 0x51 or ctor in (0x54, 0x55):  # byte / small int / small long
        return rest[1:], _S["b"].unpack(rest[:1])[0]
    if ctor == 0x60:
        return rest[2:], _S["H"].unpack(rest[:2])[0]
    if ctor == 0x61:
        return rest[2:], _S["h"].unpack(rest[:2])[0]
    if ctor == 0x70:
        return rest[4:], _S["I"].unpack(rest[:4])[0]
    if ctor == 0x71:
        return rest[4:], _S["i"].unpack(rest[:4])[0]
    if ctor == 0x72:
        return rest[4:], _S["f"].unpack(rest[:4])[0]
    if ctor == 0x80:
        return rest[8:], _S["Q"].unpack(rest[:8])[0]
    if ctor == 0x81:
        return rest[8:], _S["q"].unpack(rest[:8])[0]
    if ctor == 0x82:
        return rest[8:], _S["d"].unpack(rest[:8])[0]
    if ctor == 0x83:  # timestamp: ms since epoch
        ms = _S["q"].unpack(rest[:8])[0]
        return rest[8:], datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
    if ctor == 0x98:  # uuid
        return rest[16:], uuid.UUID(bytes=rest[:16])
    if ctor in (0xA0, 0xA1, 0xA3):  # bin8 / str8-utf8 / sym8
        n = rest[0]
        data = rest[1 : 1 + n]
        return rest[1 + n :], data if ctor == 0xA0 else data.decode("utf-8")
    if ctor in (0xB0, 0xB1, 0xB3):  # bin32 / str32-utf8 / sym32
        n = _S["I"].unpack(rest[:4])[0]
        data = rest[4 : 4 + n]
        return rest[4 + n :], data if ctor == 0xB0 else data.decode("utf-8")
    raise ValueError(f"unsupported AMQP constructor 0x{ctor:02x}")


def decode_kafka_headers_to_amqp_properties(headers: dict) -> dict:
    """Kafka record headers (name → AMQP-encoded bytes) → string properties,
    the shape the Eventhub source exposes (x-opt-offset, x-opt-publisher,
    x-opt-enqueued-time, ...).  Undecodable values pass through as repr."""
    out = {}
    for name, raw in (headers or {}).items():
        if raw is None:
            out[name] = None
            continue
        try:
            _, val = decode_amqp_value(bytes(raw))
        except (ValueError, struct.error, IndexError, UnicodeDecodeError):
            val = raw
        if isinstance(val, datetime):
            out[name] = val.isoformat()
        elif isinstance(val, bytes):
            out[name] = val.decode("utf-8", "replace")
        else:
            out[name] = None if val is None else str(val)
    return out


def eventhub_headers_stage(
    ds: ray.data.Dataset, headers_column: str = "headers"
) -> ray.data.Dataset:
    """map_batches stage: adds a ``properties`` dict-as-json column decoded
    from per-row Kafka headers (reference _transform_to_eventhub_schema)."""
    import json

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["properties"] = [
            json.dumps(decode_kafka_headers_to_amqp_properties(h))
            for h in df[headers_column]
        ]
        return df

    return ds.map_batches(fn, batch_format="pandas")
