"""Bus → vendor parse → PCDM merge streaming ingest: drain, crash/resume
byte-identity, replay idempotence."""

import hashlib
import json
import os
from datetime import datetime


def _opcua_msg(tag, ts, val):
    return json.dumps(
        {
            "MessageId": "1",
            "MessageType": "t",
            "PublisherId": "p",
            "Messages": [
                {
                    "DataSetWriterId": 1,
                    "Timestamp": ts,
                    "Payload": {tag: {"Value": val}},
                }
            ],
        }
    ).encode()


def _write_fixture_log(path, n=12):
    from core_ray.sources.bus import write_bus_log

    records = [
        {
            "key": f"k{i}".encode(),
            "value": _opcua_msg(f"tag_{i % 3}", f"2024-05-07T09:00:{i:02d}Z", i * 1.5),
            "timestamp": datetime(2024, 5, 7, 9, 0, i),
            "partition": i % 2,
        }
        for i in range(n)
    ]
    write_bus_log(str(path), records, num_partitions=2, segment_rows=3)


def _tree_hash(root):
    h = hashlib.sha256()
    for dirpath, _, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                h.update(p.replace(root, "").encode())
                h.update(open(p, "rb").read())
    return h.hexdigest()


def test_ingest_drain_and_merge(tmp_path, ray_session):
    from core_ray.stages.vendors import opcua_to_pcdm
    from core_ray.streaming.ingest import StreamingPCDMIngest

    bus = tmp_path / "bus"
    _write_fixture_log(bus)
    job = StreamingPCDMIngest(str(bus), str(tmp_path / "out"), opcua_to_pcdm,
                              max_offsets_per_trigger=2)
    res = job.run()
    assert res["epochs_processed"] == 3  # 6 offsets per partition, 2 per trigger
    assert res["offsets"] == {0: 6, 1: 6}
    ev = job.sink.read_events("float")
    assert len(ev) == 12
    assert sorted(ev["TagName"].unique()) == ["tag_0", "tag_1", "tag_2"]
    # latest register: per tag, max EventTime wins
    latest = job.sink.read_latest()
    assert len(latest) == 3
    tag2 = latest[latest["TagName"] == "tag_2"].iloc[0]
    assert tag2["Value"] == "16.5"  # i=11


def test_ingest_crash_resume_byte_identical(tmp_path, ray_session):
    from core_ray.stages.vendors import opcua_to_pcdm
    from core_ray.streaming.ingest import StreamingPCDMIngest

    bus = tmp_path / "bus"
    _write_fixture_log(bus)

    unbroken = StreamingPCDMIngest(str(bus), str(tmp_path / "a"), opcua_to_pcdm, 2)
    unbroken.run()

    crashed = StreamingPCDMIngest(str(bus), str(tmp_path / "b"), opcua_to_pcdm, 2)
    crashed.run(max_epochs=1)  # "crash" mid-stream
    ck = crashed.load_checkpoint()
    assert ck["offsets"] == {0: 2, 1: 2}
    resumed = StreamingPCDMIngest(str(bus), str(tmp_path / "b"), opcua_to_pcdm, 2)
    res = resumed.run()
    assert res["epochs_processed"] == 2

    assert _tree_hash(str(tmp_path / "a" / "pcdm")) == _tree_hash(str(tmp_path / "b" / "pcdm"))

    # losing the checkpoint replays the WHOLE log into the already-merged
    # sink — the keyed merge converges to the identical bytes (idempotence)
    os.remove(str(tmp_path / "b" / "_checkpoint.json"))
    StreamingPCDMIngest(str(bus), str(tmp_path / "b"), opcua_to_pcdm, 2).run()
    assert _tree_hash(str(tmp_path / "b" / "pcdm")) == _tree_hash(str(tmp_path / "a" / "pcdm"))
