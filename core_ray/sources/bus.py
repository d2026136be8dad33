"""Message-bus wire sources: Kafka wire schema + Eventhub schema mapping.

The sandbox has no network bus, so the *log itself* is a directory layout —
``<path>/partition=<p>/segment-<first>-<last>.parquet`` — holding
offset-ordered records in the Kafka wire schema.  Everything the reference
delegates to the Spark Kafka connector (per-partition offset ranges,
``startingOffsets``/``endingOffsets``, incremental triggers) is implemented
here on top of that layout, and the Eventhub schema mapping mirrors
``sources/spark/kafka_eventhub.py:_transform_to_eventhub_schema`` (`:323-367`)
arm for arm, including the system/user property split driven by
``eventhub_system_properties`` (`kafka_eventhub.py:28-45`).

Scale design: offset predicates prune whole SEGMENT FILES from the read list
(the first/last offsets are in the file name), then a vectorized per-batch
mask trims the boundary segments — the object store never sees skipped
offsets.  Header decode is the per-batch AMQP kernel from
``stages/binary_sources.py``.
"""

from __future__ import annotations

import json
import os
import struct
from datetime import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..pipelines.framework import DestinationComponent, SourceComponent
from ..stages.binary_sources import decode_kafka_headers_to_amqp_properties

# the Eventhub/IoT-hub system property names (kafka_eventhub.py:28-45)
EVENTHUB_SYSTEM_PROPERTIES = [
    "x-opt-enqueued-time",
    "x-opt-sequence-number",
    "x-opt-offset",
    "x-opt-publisher",
    "x-opt-partition-key",
    "message-id",
    "iothub-enqueuedtime",
    "user-id",
    "iothub-connection-device-id",
    "iothub-connection-module-id",
    "iothub-connection-auth-generation-id",
    "iothub-connection-auth-method",
    "iothub-app-iothub-creation-time-utc",
    "iothub-creation-time-utc",
    "dt-dataschema",
    "dt-subject",
]

KAFKA_WIRE_SCHEMA = pa.schema(
    [
        ("key", pa.binary()),
        ("value", pa.binary()),
        ("topic", pa.string()),
        ("partition", pa.int32()),
        ("offset", pa.int64()),
        ("timestamp", pa.timestamp("us")),
        ("timestampType", pa.int32()),
        # Kafka record headers: repeated (key, bytes) entries
        ("headers", pa.list_(pa.struct([("key", pa.string()), ("value", pa.binary())]))),
    ]
)


# --- AMQP 1.0 primitive ENCODE (fixture side; OASIS spec subset) ------------


def encode_amqp_value(val) -> bytes:
    """Encode one python value as an AMQP 1.0 primitive (the subset Eventhub
    message annotations use — the inverse of ``decode_amqp_value``)."""
    if val is None:
        return b"\x40"
    if isinstance(val, bool):
        return b"\x41" if val else b"\x42"
    if isinstance(val, datetime):
        ms = int(val.timestamp() * 1000)
        return b"\x83" + struct.pack(">q", ms)
    if isinstance(val, int):
        if 0 <= val <= 255:
            return b"\x52" + struct.pack(">B", val)  # small uint
        return b"\x81" + struct.pack(">q", val)  # long
    if isinstance(val, float):
        return b"\x82" + struct.pack(">d", val)
    if isinstance(val, bytes):
        if len(val) <= 255:
            return b"\xa0" + struct.pack(">B", len(val)) + val
        return b"\xb0" + struct.pack(">I", len(val)) + val
    if isinstance(val, str):
        raw = val.encode("utf-8")
        if len(raw) <= 255:
            return b"\xa1" + struct.pack(">B", len(raw)) + raw
        return b"\xb1" + struct.pack(">I", len(raw)) + raw
    raise TypeError(f"unsupported AMQP encode type {type(val)!r}")


# --- log writer (fixture / producer side) -----------------------------------


def write_bus_log(
    path: str,
    records: list[dict],
    topic: str = "events",
    num_partitions: int = 2,
    segment_rows: int = 1000,
) -> dict[int, int]:
    """Write records into the partitioned segment layout.

    Each record: ``{key: bytes|None, value: bytes, timestamp: datetime,
    headers: {name: python value}|None, partition: int|None}``.  Records
    without an explicit partition route by key hash (keyless round-robin).
    Offsets are assigned per partition in list order — the producer contract.
    Returns {partition: next_offset} (the high-water marks).
    """
    import zlib

    parts: dict[int, list[dict]] = {p: [] for p in range(num_partitions)}
    rr = 0
    for rec in records:
        p = rec.get("partition")
        if p is None:
            k = rec.get("key")
            if k is None:
                p, rr = rr % num_partitions, rr + 1
            else:
                # deterministic across processes (Python's hash() is salted)
                p = zlib.crc32(bytes(k)) % num_partitions
        parts[int(p)].append(rec)
    high = {}
    for p, rows in parts.items():
        pdir = os.path.join(path, f"partition={p}")
        os.makedirs(pdir, exist_ok=True)
        for seg_start in range(0, len(rows), segment_rows):
            seg = rows[seg_start : seg_start + segment_rows]
            first, last = seg_start, seg_start + len(seg) - 1
            t = pa.table(
                {
                    "key": pa.array([r.get("key") for r in seg], pa.binary()),
                    "value": pa.array([r["value"] for r in seg], pa.binary()),
                    "topic": pa.array([topic] * len(seg)),
                    "partition": pa.array([p] * len(seg), pa.int32()),
                    "offset": pa.array(range(first, first + len(seg)), pa.int64()),
                    "timestamp": pa.array(
                        [r["timestamp"] for r in seg], pa.timestamp("us")
                    ),
                    "timestampType": pa.array([0] * len(seg), pa.int32()),
                    "headers": pa.array(
                        [
                            [
                                {"key": n, "value": encode_amqp_value(v)}
                                for n, v in (r.get("headers") or {}).items()
                            ]
                            for r in seg
                        ],
                        KAFKA_WIRE_SCHEMA.field("headers").type,
                    ),
                },
            )
            pq.write_table(t, os.path.join(pdir, f"segment-{first}-{last}.parquet"))
        high[p] = len(rows)
    return high


# --- wire source ------------------------------------------------------------


def _list_segments(path: str) -> dict[int, list[tuple[int, int, str]]]:
    """{partition: [(first_offset, last_offset, file), ...] sorted}."""
    out: dict[int, list[tuple[int, int, str]]] = {}
    for d in sorted(os.listdir(path)):
        if not d.startswith("partition="):
            continue
        p = int(d.split("=", 1)[1])
        segs = []
        for f in os.listdir(os.path.join(path, d)):
            if f.startswith("segment-") and f.endswith(".parquet"):
                first, last = f[len("segment-") : -len(".parquet")].split("-")
                segs.append((int(first), int(last), os.path.join(path, d, f)))
        out[p] = sorted(segs)
    return out


class KafkaFixtureSource(SourceComponent):
    """Kafka-wire-schema reader over the segment log.

    ``starting_offsets`` / ``ending_offsets``: "earliest" / "latest" or a
    {partition: offset} dict (start inclusive, end exclusive) — the Spark
    Kafka option semantics.  Segment files wholly outside the range never
    enter the read list; boundary segments are trimmed by a vectorized mask.
    """

    def __init__(
        self,
        path: str,
        starting_offsets="earliest",
        ending_offsets="latest",
        columns: list[str] | None = None,
    ):
        self.path = path
        self.starting_offsets = starting_offsets
        self.ending_offsets = ending_offsets
        self.columns = columns

    def _offset_range(self, segs) -> tuple[dict[int, int], dict[int, int]]:
        earliest = {p: (s[0][0] if s else 0) for p, s in segs.items()}
        latest = {p: (s[-1][1] + 1 if s else 0) for p, s in segs.items()}
        if self.starting_offsets == "earliest":
            start = earliest
        elif self.starting_offsets == "latest":
            start = latest
        else:
            start = {p: int(self.starting_offsets.get(p, earliest[p])) for p in segs}
        if self.ending_offsets == "latest":
            end = latest
        else:
            end = {p: int(self.ending_offsets.get(p, latest[p])) for p in segs}
        return start, end

    def read_batch(self) -> ray.data.Dataset:
        segs = _list_segments(self.path)
        start, end = self._offset_range(segs)
        files = [
            f
            for p, seg in segs.items()
            for first, last, f in seg
            if last >= start[p] and first < end[p]
        ]
        if not files:
            return ray.data.from_arrow(KAFKA_WIRE_SCHEMA.empty_table())
        # the offset trim needs partition+offset even if the caller's
        # projection omits them; read the union, project back after the trim
        read_cols = self.columns
        if read_cols is not None:
            read_cols = list(dict.fromkeys([*read_cols, "partition", "offset"]))
        ds = ray.data.read_parquet(files, columns=read_cols)
        start_arr = _dict_to_lookup(start)
        end_arr = _dict_to_lookup(end)
        keep_cols = self.columns

        def trim(batch: pa.Table) -> pa.Table:
            p = batch["partition"].to_numpy(zero_copy_only=False).astype(np.int64)
            o = batch["offset"].to_numpy(zero_copy_only=False)
            mask = (o >= start_arr[p]) & (o < end_arr[p])
            if not mask.all():
                batch = batch.filter(pa.array(mask))
            return batch.select(keep_cols) if keep_cols is not None else batch

        return ds.map_batches(trim, batch_format="pyarrow")

    def high_water_marks(self) -> dict[int, int]:
        return {p: (s[-1][1] + 1 if s else 0) for p, s in _list_segments(self.path).items()}

    def read_stream(self, max_offsets_per_trigger: int | None = None):
        """Incremental epochs: yields (epoch Dataset, next starting_offsets).
        Mirrors the connector's trigger semantics — each epoch advances the
        per-partition offsets; pass the returned dict back as
        ``starting_offsets`` to resume (the checkpoint contract)."""
        if max_offsets_per_trigger is not None and max_offsets_per_trigger <= 0:
            raise ValueError("max_offsets_per_trigger must be positive")
        segs = _list_segments(self.path)
        start, end = self._offset_range(segs)
        cur = dict(start)
        while any(cur[p] < end[p] for p in cur):
            nxt = {}
            for p in cur:
                step = end[p] - cur[p]
                if max_offsets_per_trigger is not None:
                    step = min(step, max_offsets_per_trigger)
                nxt[p] = cur[p] + step
            epoch = KafkaFixtureSource(
                self.path, dict(cur), dict(nxt), self.columns
            ).read_batch()
            yield epoch, dict(nxt)
            cur = nxt


def _dict_to_lookup(d: dict[int, int]) -> np.ndarray:
    arr = np.zeros(max(d) + 1 if d else 1, dtype=np.int64)
    for k, v in d.items():
        arr[k] = v
    return arr


# --- Eventhub schema mapping ------------------------------------------------


def kafka_to_eventhub_schema(
    ds: ray.data.Dataset, decode_headers: bool = True
) -> ray.data.Dataset:
    """Kafka wire rows → the Eventhub source schema
    (``_transform_to_eventhub_schema``, `kafka_eventhub.py:323-367`):

    body=value, partition as string, sequenceNumber=kafka offset,
    enqueuedTime=kafka timestamp, offset/publisher/partitionKey pulled from
    the AMQP-decoded ``x-opt-*`` annotations, and properties split into user
    vs system maps (emitted as sorted-key JSON strings — deterministic).
    """
    sysset = frozenset(EVENTHUB_SYSTEM_PROPERTIES)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        props = []
        for h in df["headers"]:
            entries = {e["key"]: e["value"] for e in (h if h is not None else [])}
            props.append(
                decode_kafka_headers_to_amqp_properties(entries)
                if decode_headers
                else {}
            )
        out = pd.DataFrame(
            {
                "body": df["value"].to_numpy(),
                "partition": df["partition"].astype(str).to_numpy(),
                "offset": [p.get("x-opt-offset") for p in props],
                "sequenceNumber": df["offset"].to_numpy(),
                "enqueuedTime": df["timestamp"].to_numpy(),
                "publisher": [p.get("x-opt-publisher") for p in props],
                "partitionKey": [p.get("x-opt-partition-key") for p in props],
                "properties": [
                    json.dumps({k: v for k, v in p.items() if k not in sysset}, sort_keys=True)
                    for p in props
                ],
                "systemProperties": [
                    json.dumps({k: v for k, v in p.items() if k in sysset}, sort_keys=True)
                    for p in props
                ],
            }
        )
        return out

    return ds.map_batches(fn, batch_format="pandas")


class KafkaEventhubFixtureSource(KafkaFixtureSource):
    """Eventhub-over-Kafka: wire read + AMQP header decode + schema mapping
    (the reference's ``SparkKafkaEventhubSource`` surface).  IoT Hub is the
    same wire (``sources/spark/iot_hub.py`` reads an Eventhub-compatible
    endpoint); its ``iothub-*`` system properties are already routed by the
    system/user split above."""

    def __init__(self, path: str, starting_offsets="earliest", ending_offsets="latest",
                 decode_headers: bool = True):
        super().__init__(path, starting_offsets, ending_offsets)
        self.decode_headers = decode_headers

    def read_batch(self) -> ray.data.Dataset:
        return kafka_to_eventhub_schema(super().read_batch(), self.decode_headers)


class KinesisFixtureSource(KafkaFixtureSource):
    """Kinesis wire schema over the same segment log — the reference's
    ``KINESIS_SCHEMA`` (``_pipeline_utils/spark.py:600-609``): partitionKey,
    data, stream, shardId, sequenceNumber (string), arrival timestamp.
    Partitions map to shards; offsets to sequence numbers."""

    def read_batch(self) -> ray.data.Dataset:
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "partitionKey": [
                        None if k is None else bytes(k).decode("utf-8", "replace")
                        for k in df["key"]
                    ],
                    "data": df["value"].to_numpy(),
                    "stream": df["topic"].to_numpy(),
                    "shardId": [f"shardId-{p:012d}" for p in df["partition"]],
                    "sequenceNumber": df["offset"].astype(str).to_numpy(),
                    "approximateArrivalTimestamp": df["timestamp"].to_numpy(),
                }
            )

        return super().read_batch().map_batches(fn, batch_format="pandas")


# --- wire destination --------------------------------------------------------

# standard CRC-32 table (zlib polynomial 0xEDB88320), built once
_CRC32_LUT = None


def _crc32_table() -> np.ndarray:
    global _CRC32_LUT
    if _CRC32_LUT is None:
        t = np.arange(256, dtype=np.uint32)
        for _ in range(8):
            t = np.where(t & 1, np.uint32(0xEDB88320) ^ (t >> 1), t >> 1)
        _CRC32_LUT = t
    return _CRC32_LUT


def crc32_batch(keys: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """zlib-compatible CRC-32 of a binary column, vectorized across rows:
    the LUT update runs position-by-position over the flat value buffer, so
    the Python-level loop is over MAX KEY LENGTH (bytes), never over rows."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    n = len(keys)
    bufs = keys.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32, count=n + 1, offset=keys.offset * 4).astype(
        np.int64
    )
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    starts, lens = offs[:-1], np.diff(offs)
    lut = _crc32_table()
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    for j in range(int(lens.max()) if n else 0):
        active = lens > j
        byte = data[starts[active] + j]
        c = crc[active]
        crc[active] = (c >> np.uint32(8)) ^ lut[(c ^ byte) & np.uint32(0xFF)]
    return crc ^ np.uint32(0xFFFFFFFF)


class BusLogDestination(DestinationComponent):
    """Kafka-wire WRITER side of the segment log — the file-backed analog of
    the reference's Kafka/Eventhub destination connectors (which are network
    producer glue; reference ``destinations/spark/kafka.py`` et al.).

    Producer semantics kept: keyed records route to a partition by
    zlib-CRC32(key) % num_partitions (matching ``write_bus_log``'s fixture
    producer; an explicit ``partition`` column overrides), offsets continue
    from the log's current per-partition high-water marks, and each
    partition is written by exactly ONE task (Kafka's single-writer-per-
    partition ordering contract).  Rows within a partition are ordered
    deterministically by (timestamp, value) before offset assignment, since
    a Dataset carries no total order.

    Input columns: ``value`` (binary) required; ``key`` (binary),
    ``timestamp`` (timestamp[us]), ``partition`` (int), ``headers`` (wire
    list<struct<key,value>>) optional.  Returns per-partition
    {partition: (first_offset, last_offset)} for the rows written.
    """

    def __init__(
        self,
        path: str,
        topic: str = "events",
        num_partitions: int = 2,
        segment_rows: int = 1000,
    ):
        self.path = path
        self.topic = topic
        self.num_partitions = num_partitions
        self.segment_rows = segment_rows

    def write_batch(self, ds: ray.data.Dataset):
        os.makedirs(self.path, exist_ok=True)
        hwm = {p: 0 for p in range(self.num_partitions)}
        for p, segs in _list_segments(self.path).items():
            hwm[p] = segs[-1][1] + 1 if segs else 0
        n_parts, topic, seg_rows, path = (
            self.num_partitions, self.topic, self.segment_rows, self.path,
        )

        def route(t: pa.Table) -> pa.Table:
            if "partition" in t.column_names:
                part = t["partition"].to_numpy(zero_copy_only=False).astype(np.int32)
                t = t.drop(["partition"])
            elif "key" in t.column_names and t["key"].null_count < len(t):
                part = (crc32_batch(t["key"]) % np.uint32(n_parts)).astype(np.int32)
            else:
                raise ValueError(
                    "BusLogDestination needs a key or partition column to route"
                )
            return t.append_column("_part", pa.array(part))

        def write_partition(g: pd.DataFrame) -> pd.DataFrame:
            p = int(g["_part"].iloc[0])
            g = g.drop(columns=["_part"])
            order = ["timestamp", "value"] if "timestamp" in g else ["value"]
            g = g.sort_values(order, kind="mergesort").reset_index(drop=True)
            base = hwm[p]
            n = len(g)
            keys = (
                pa.array(list(g["key"]), pa.binary())
                if "key" in g
                else pa.array([None] * n, pa.binary())
            )
            ts = (
                pa.Array.from_pandas(g["timestamp"]).cast(pa.timestamp("us"))
                if "timestamp" in g
                else pa.array([datetime(1970, 1, 1)] * n, pa.timestamp("us"))
            )
            headers = (
                pa.array(list(g["headers"]), KAFKA_WIRE_SCHEMA.field("headers").type)
                if "headers" in g
                else pa.array([[]] * n, KAFKA_WIRE_SCHEMA.field("headers").type)
            )
            pdir = os.path.join(path, f"partition={p}")
            os.makedirs(pdir, exist_ok=True)
            for s in range(0, n, seg_rows):
                e = min(s + seg_rows, n)
                first, last = base + s, base + e - 1
                t = pa.table(
                    {
                        "key": keys.slice(s, e - s),
                        "value": pa.array(list(g["value"][s:e]), pa.binary()),
                        "topic": pa.array([topic] * (e - s)),
                        "partition": pa.array([p] * (e - s), pa.int32()),
                        "offset": pa.array(range(first, last + 1), pa.int64()),
                        "timestamp": ts.slice(s, e - s),
                        "timestampType": pa.array([0] * (e - s), pa.int32()),
                        "headers": headers.slice(s, e - s),
                    }
                )
                pq.write_table(t, os.path.join(pdir, f"segment-{first}-{last}.parquet"))
            return pd.DataFrame(
                {"partition": [p], "first": [base], "last": [base + n - 1]}
            )

        summary = (
            ds.map_batches(route, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(write_partition, batch_format="pandas")
            .to_pandas()  # bounded: one row per partition
        )
        return {
            int(r["partition"]): (int(r["first"]), int(r["last"]))
            for _, r in summary.iterrows()
        }
