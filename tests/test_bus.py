"""Kafka/Eventhub wire source: segment log, offset semantics, AMQP roundtrip,
Eventhub schema mapping, streaming triggers."""

import json
from datetime import datetime, timezone

import pandas as pd


def _ts(s):
    return datetime.fromisoformat(s)


def _write_log(tmp_path, n=10):
    from core_ray.sources.bus import write_bus_log

    records = [
        {
            "key": f"k{i}".encode(),
            "value": json.dumps({"i": i}).encode(),
            "timestamp": _ts(f"2024-01-01 00:00:{i:02d}"),
            "partition": i % 2,
            "headers": {
                "x-opt-offset": str(1000 + i),
                "x-opt-publisher": "pub",
                "x-opt-enqueued-time": datetime(2024, 1, 1, tzinfo=timezone.utc),
                "custom-prop": i,
            },
        }
        for i in range(n)
    ]
    high = write_bus_log(str(tmp_path), records, num_partitions=2, segment_rows=2)
    return high


def test_amqp_encode_decode_roundtrip():
    from core_ray.sources.bus import encode_amqp_value
    from core_ray.stages.binary_sources import decode_amqp_value

    vals = [None, True, False, 0, 7, 255, 300, -5_000_000_000, 2.5, "hello",
            "x" * 300, b"\x01\x02"]
    for v in vals:
        rest, out = decode_amqp_value(encode_amqp_value(v))
        assert rest == b""
        assert out == v
    # timestamps decode tz-aware at ms precision
    t = datetime(2024, 5, 1, 12, 0, 0, 500000, tzinfo=timezone.utc)
    _, out = decode_amqp_value(encode_amqp_value(t))
    assert out == t


def test_wire_source_offset_ranges_and_pruning(tmp_path, ray_session):
    from core_ray.sources.bus import KafkaFixtureSource, _list_segments

    _write_log(tmp_path)
    segs = _list_segments(str(tmp_path))
    assert {p: len(s) for p, s in segs.items()} == {0: 3, 1: 3}

    src = KafkaFixtureSource(str(tmp_path))
    df = src.read_batch().to_pandas()
    assert len(df) == 10
    assert sorted(df["offset"][df["partition"] == 0]) == [0, 1, 2, 3, 4]
    assert src.high_water_marks() == {0: 5, 1: 5}

    # per-partition starting offsets (inclusive) + ending offsets (exclusive)
    src = KafkaFixtureSource(str(tmp_path), {0: 3, 1: 1}, {0: 5, 1: 2})
    df = src.read_batch().to_pandas()
    got = {p: sorted(g["offset"]) for p, g in df.groupby("partition")}
    assert got == {0: [3, 4], 1: [1]}

    # "latest" start reads nothing
    assert KafkaFixtureSource(str(tmp_path), "latest").read_batch().count() == 0


def test_eventhub_schema_mapping(tmp_path, ray_session):
    from core_ray.sources.bus import KafkaEventhubFixtureSource

    _write_log(tmp_path)
    df = KafkaEventhubFixtureSource(str(tmp_path)).read_batch().to_pandas()
    df = df.sort_values(["partition", "sequenceNumber"]).reset_index(drop=True)
    assert list(df.columns) == [
        "body", "partition", "offset", "sequenceNumber", "enqueuedTime",
        "publisher", "partitionKey", "properties", "systemProperties",
    ]
    row = df[(df["partition"] == "0") & (df["sequenceNumber"] == 0)].iloc[0]
    assert json.loads(row["body"]) == {"i": 0}
    assert row["offset"] == "1000"          # from x-opt-offset annotation
    assert row["publisher"] == "pub"
    assert row["partitionKey"] is None
    props = json.loads(row["properties"])
    sysprops = json.loads(row["systemProperties"])
    assert props == {"custom-prop": "0"}    # user props exclude x-opt-*
    assert set(sysprops) == {"x-opt-offset", "x-opt-publisher", "x-opt-enqueued-time"}
    assert sysprops["x-opt-enqueued-time"].startswith("2024-01-01T00:00:00")


def test_stream_triggers_resume(tmp_path, ray_session):
    from core_ray.sources.bus import KafkaFixtureSource

    _write_log(tmp_path)
    src = KafkaFixtureSource(str(tmp_path))
    seen, checkpoints = [], []
    for epoch, nxt in src.read_stream(max_offsets_per_trigger=2):
        seen.append(epoch.to_pandas())
        checkpoints.append(nxt)
    assert len(seen) == 3  # 5 offsets per partition, 2 per trigger
    all_rows = pd.concat(seen)
    assert len(all_rows) == 10
    assert checkpoints[-1] == {0: 5, 1: 5}
    # resume from a mid-stream checkpoint replays exactly the remainder
    resumed = KafkaFixtureSource(str(tmp_path), checkpoints[0]).read_batch().to_pandas()
    assert len(resumed) == 10 - len(seen[0])


def test_kinesis_schema_mapping(tmp_path, ray_session):
    from core_ray.sources.bus import KinesisFixtureSource

    _write_log(tmp_path)
    df = KinesisFixtureSource(str(tmp_path), {0: 4, 1: 4}).read_batch().to_pandas()
    df = df.sort_values(["shardId", "sequenceNumber"]).reset_index(drop=True)
    assert list(df.columns) == [
        "partitionKey", "data", "stream", "shardId", "sequenceNumber",
        "approximateArrivalTimestamp",
    ]
    assert len(df) == 2  # one remaining offset per shard
    assert df["shardId"].tolist() == ["shardId-000000000000", "shardId-000000000001"]
    assert df["sequenceNumber"].tolist() == ["4", "4"]
    assert json.loads(df["data"].iloc[0]) == {"i": 8}


def test_wire_source_projection_excluding_trim_columns(tmp_path, ray_session):
    from core_ray.sources.bus import KafkaFixtureSource

    _write_log(tmp_path)
    ds = KafkaFixtureSource(str(tmp_path), {0: 3, 1: 3}, columns=["value"]).read_batch()
    df = ds.to_pandas()
    assert list(df.columns) == ["value"]
    assert len(df) == 4  # offsets 3,4 per partition


def test_keyed_routing_deterministic(tmp_path):
    import zlib

    from core_ray.sources.bus import _list_segments, write_bus_log

    records = [
        {"key": f"k{i}".encode(), "value": b"v", "timestamp": _ts("2024-01-01 00:00:00")}
        for i in range(8)
    ]
    write_bus_log(str(tmp_path), records, num_partitions=4, segment_rows=10)
    segs = _list_segments(str(tmp_path))
    got = {p: s[-1][1] + 1 if s else 0 for p, s in segs.items()}
    want = {p: 0 for p in range(4)}
    for i in range(8):
        want[zlib.crc32(f"k{i}".encode()) % 4] += 1
    # crc32-based routing: layout reproducible across processes/runs
    assert got == want


def test_bus_log_destination_roundtrip(tmp_path, ray_session):
    """Dataset -> BusLogDestination -> KafkaFixtureSource round trip: keyed
    CRC32 routing matches the fixture producer, offsets continue across
    appends, per-partition order is deterministic."""
    import zlib

    import ray.data

    from core_ray.sources.bus import BusLogDestination, KafkaFixtureSource

    path = str(tmp_path / "log")
    rows = pd.DataFrame(
        {
            "key": [f"k{i}".encode() for i in range(20)],
            "value": [f"v{i}".encode() for i in range(20)],
            "timestamp": pd.to_datetime(
                [f"2024-01-01 00:00:{i:02d}" for i in range(20)]
            ),
        }
    )
    dest = BusLogDestination(path, topic="t", num_partitions=3, segment_rows=4)
    marks = dest.write_batch(ray.data.from_pandas(rows))

    back = KafkaFixtureSource(path).read_batch().to_pandas()
    assert len(back) == 20
    assert set(bytes(v) for v in back["value"]) == set(rows["value"])
    # routing matches the fixture producer's crc32 rule
    for _, r in back.iterrows():
        assert r["partition"] == zlib.crc32(bytes(r["key"])) % 3
    # offsets are dense per partition starting at 0
    for p, g in back.groupby("partition"):
        offs = sorted(g["offset"])
        assert offs == list(range(len(offs)))
        assert marks[p] == (0, len(offs) - 1)

    # second append continues from the high-water marks
    more = pd.DataFrame(
        {
            "key": [b"k0", b"k1"],
            "value": [b"w0", b"w1"],
            "timestamp": pd.to_datetime(["2024-01-02", "2024-01-02"]),
        }
    )
    marks2 = dest.write_batch(ray.data.from_pandas(more))
    back2 = KafkaFixtureSource(path).read_batch().to_pandas()
    assert len(back2) == 22
    for p, (first, last) in marks2.items():
        assert first == marks[p][1] + 1
    # per-partition reads stay offset-dense after the append
    for p, g in back2.groupby("partition"):
        assert sorted(g["offset"]) == list(range(len(g)))
