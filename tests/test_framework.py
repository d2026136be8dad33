"""Pipeline framework, transformer stages, PCDM merge sink (F4-style CDC
fixture covering every merge arm), ML prep, multimodal plumbing."""

import json

import numpy as np
import pandas as pd
import pytest

import ray.data


# --- pipeline framework ----------------------------------------------------


def test_pipeline_job_topo_and_threading(tmp_path):
    from core_ray.pipelines.framework import (
        DestinationComponent,
        PipelineJob,
        PipelineJobExecute,
        PipelineStep,
        SourceComponent,
        TransformerComponent,
    )

    class Src(SourceComponent):
        def read_batch(self):
            return ray.data.range(10)

    class Double(TransformerComponent):
        def transform(self, ds):
            return ds.map_batches(
                lambda df: df.assign(id=df["id"] * 2), batch_format="pandas"
            )

    class Sink(DestinationComponent):
        def write_batch(self, ds):
            return ds.sum("id")

    job = PipelineJob(
        name="t",
        steps=[
            PipelineStep("sink", Sink(), depends_on=["double"]),
            PipelineStep("double", Double(), depends_on=["src"]),
            PipelineStep("src", Src()),
        ],
    )
    res = PipelineJobExecute(job).run()
    assert res["sink"] == sum(2 * i for i in range(10))


def test_pipeline_cycle_detection():
    from core_ray.pipelines.framework import (
        PipelineJob,
        PipelineJobExecute,
        PipelineStep,
        TransformerComponent,
    )

    t = TransformerComponent()
    job = PipelineJob(
        "c", [PipelineStep("a", t, ["b"]), PipelineStep("b", t, ["a"])]
    )
    with pytest.raises(ValueError, match="cycle"):
        PipelineJobExecute(job).run()


def test_run_batch_fanout(sf_dir):
    from core_ray.pipelines.framework import run_batch

    out = run_batch(
        {
            "a": lambda: 1 + 1,
            "b": lambda: ray.data.range(5).count(),
        }
    )
    assert out == {"a": 2, "b": 5}


# --- transformers ----------------------------------------------------------


def test_json_to_pcdm_parser():
    from core_ray.stages import JsonToPcdmConfig, json_to_pcdm

    msgs = [
        json.dumps(
            {
                "Messages": [
                    {"NodeId": "tag-a", "SourceTimestamp": "2024-01-01T00:00:01.500",
                     "Value": {"Value": "42"}},
                    {"NodeId": "tag-b", "SourceTimestamp": "2024-01-01 00:00:02",
                     "Value": {"Value": 3.5}, "StatusCode": "Bad"},
                    {"NodeId": "tag-c", "SourceTimestamp": 1704067203.25,
                     "Value": {"Value": "hello"}},
                ]
            }
        ),
        "not json {{{",  # dropped
    ]
    ds = ray.data.from_pandas(pd.DataFrame({"body": msgs}))
    cfg = JsonToPcdmConfig(
        json_column="body",
        explode_path="Messages",
        tag_path="NodeId",
        time_path="SourceTimestamp",
        value_path="Value.Value",
        status_path="StatusCode",
    )
    out = json_to_pcdm(ds, cfg).to_pandas().sort_values("TagName").reset_index(drop=True)
    assert out["TagName"].tolist() == ["tag-a", "tag-b", "tag-c"]
    assert out["ValueType"].tolist() == ["integer", "float", "string"]
    assert out["Status"].tolist() == ["Good", "Bad", "Good"]
    assert out["ChangeType"].unique().tolist() == ["upsert"]
    assert out["EventTime"].iloc[0] == pd.Timestamp("2024-01-01 00:00:01.500")
    assert out["EventTime"].iloc[2] == pd.Timestamp("2024-01-01 00:00:03.250")


def test_binary_to_string_and_wide_to_mdm():
    from core_ray.stages import binary_to_string, wide_to_mdm

    df = pd.DataFrame({"b": [b"abc", b"def"]})
    out = binary_to_string(ray.data.from_pandas(df), "b").to_pandas()
    assert out["b"].tolist() == ["abc", "def"]

    wide = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
            "load_a": [1.0, 2.0],
            "load_b": [3.0, 4.0],
        }
    )
    long = wide_to_mdm(
        ray.data.from_pandas(wide), ["load_a", "load_b"], "ts", series_prefix="iso_"
    ).to_pandas()
    assert len(long) == 4
    assert sorted(long["SeriesId"].unique()) == ["iso_load_a", "iso_load_b"]
    assert long[long["SeriesId"] == "iso_load_b"]["Value"].tolist() == [3.0, 4.0]


def test_ml_prep():
    from core_ray.stages import columns_to_vector, one_hot_encoding, polynomial_features

    df = pd.DataFrame({"x": [1.0, 2.0], "y": [3.0, 4.0], "c": ["a", "b"]})
    ds = ray.data.from_pandas(df)
    v = columns_to_vector(ds, ["x", "y"]).to_pandas()
    assert list(v["features"].iloc[0]) == [1.0, 3.0]
    o = one_hot_encoding(ds, "c", categories=["a", "b"]).to_pandas()
    assert o["c_a"].tolist() == [1, 0] and o["c_b"].tolist() == [0, 1]
    p = polynomial_features(ds, ["x", "y"]).to_pandas()
    assert p["x_x_y"].tolist() == [3.0, 8.0]


def test_multimodal_decode_stub():
    from core_ray.stages import BinaryDecodeStage, decode_binary_column, frame_sample

    try:
        import PIL  # noqa: F401
    except ImportError:
        # real arm is import-gated (see test_multimodal_codecs for parity)
        with pytest.raises(ImportError):
            BinaryDecodeStage(fake=False)

    df = pd.DataFrame(
        {"media_id": [0, 0, 1], "frame_idx": [0, 10, 20], "payload": [b"aa", b"bb", b"cc"]}
    )
    out = decode_binary_column(ray.data.from_pandas(df), feature_dim=8, concurrency=1).to_pandas()
    assert len(out) == 3
    assert len(out["features"].iloc[0]) == 8
    # deterministic: same payload -> same features
    again = decode_binary_column(ray.data.from_pandas(df), feature_dim=8, concurrency=1).to_pandas()
    assert np.allclose(np.stack(out["features"]), np.stack(again["features"]))
    fs = frame_sample(ray.data.from_pandas(df), every_n=20).to_pandas()
    assert fs["frame_idx"].tolist() == [0, 20]


# --- PCDM merge sink (F4 CDC fixture: every merge arm) ---------------------


def _cdc(rows):
    df = pd.DataFrame(
        rows, columns=["TagName", "EventTime", "Status", "Value", "ValueType", "ChangeType"]
    )
    df["EventTime"] = pd.to_datetime(df["EventTime"])
    return ray.data.from_pandas(df)


def test_pcdm_merge_sink_arms(tmp_path):
    from core_ray.state import PCDMMergeSink

    sink = PCDMMergeSink(str(tmp_path / "pcdm"))
    t1, t2 = "2024-01-01 00:00:00", "2024-01-01 00:00:10"

    # batch 1: inserts (normalized to upsert) across two value types
    r = sink.apply(
        _cdc(
            [
                ("A", t1, "Good", "1.5", "float", "insert"),
                ("A", t2, "Bad", "2.5", "float", "insert"),
                ("B", t1, "Good", "7", "integer", "update"),
                ("C", t1, "Good", "hi", "string", "upsert"),
            ]
        )
    )
    assert r["upserts"] == 4 and r["deletes"] == 0
    f = sink.read_events("float")
    assert len(f) == 2 and f["Value"].tolist() == [1.5, 2.5]

    # batch 2: update-if-changed (A@t1 -> 9.9), delete (A@t2), new insert (A@t3)
    t3 = "2024-01-02 00:00:00"  # different EventDate partition
    sink.apply(
        _cdc(
            [
                ("A", t1, "Good", "9.9", "float", "upsert"),
                ("A", t2, "Good", "0", "float", "delete"),
                ("A", t3, "Good", "3.5", "float", "insert"),
            ]
        )
    )
    f = sink.read_events("float").sort_values("EventTime")
    assert f["Value"].tolist() == [9.9, 3.5]  # updated, deleted, inserted

    # idempotent replay: applying batch 2 again converges to the same state
    sink.apply(
        _cdc(
            [
                ("A", t1, "Good", "9.9", "float", "upsert"),
                ("A", t2, "Good", "0", "float", "delete"),
                ("A", t3, "Good", "3.5", "float", "insert"),
            ]
        )
    )
    f2 = sink.read_events("float").sort_values("EventTime")
    assert f2["Value"].tolist() == [9.9, 3.5]

    # latest table: A's latest is t3 (Good); Good register tracks it too
    latest = sink.read_latest().set_index("TagName")
    assert latest.loc["A", "EventTime"] == pd.Timestamp(t3)
    assert latest.loc["A", "GoodEventTime"] == pd.Timestamp(t3)

    # out-of-order: an OLDER Good event must not regress the registers
    sink.apply(_cdc([("A", t1, "Good", "1.0", "float", "upsert")]))
    latest = sink.read_latest().set_index("TagName")
    assert latest.loc["A", "EventTime"] == pd.Timestamp(t3)

    # Bad latest vs Good register: newer Bad updates EventTime but not Good*
    t4 = "2024-01-03 00:00:00"
    sink.apply(_cdc([("A", t4, "Bad", "8.8", "float", "upsert")]))
    latest = sink.read_latest().set_index("TagName")
    assert latest.loc["A", "EventTime"] == pd.Timestamp(t4)
    assert latest.loc["A", "Status"] == "Bad"
    assert latest.loc["A", "GoodEventTime"] == pd.Timestamp(t3)


# --- output sub-operators --------------------------------------------------


def test_unpivot_drops_nulls():
    from core_ray.ops import unpivot

    df = pd.DataFrame({"k": [1, 2], "Min": [1.0, None], "Max": [5.0, 6.0]})
    out = unpivot(ray.data.from_pandas(df), ["Min", "Max"], ["k"]).to_pandas()
    assert len(out) == 3  # the NULL Min cell is dropped


def test_write_partitioned_resumable(tmp_path):
    import glob

    import pyarrow.parquet as pq

    from core_ray.ops import write_partitioned_resumable

    df = pd.DataFrame(
        {"k": ["a"] * 5 + ["b"] * 3 + ["c"] * 2, "v": range(10)}
    )
    out = str(tmp_path / "parts")
    r1 = write_partitioned_resumable(ray.data.from_pandas(df), out, "k", sort_cols=["v"])
    assert r1 == {"written": 3, "skipped": 0}
    files1 = {f: open(f, "rb").read() for f in glob.glob(f"{out}/part=*/data.parquet")}
    assert len(files1) == 3
    # rerun: every partition skipped, bytes untouched
    r2 = write_partitioned_resumable(ray.data.from_pandas(df), out, "k", sort_cols=["v"])
    assert r2 == {"written": 0, "skipped": 3}
    files2 = {f: open(f, "rb").read() for f in glob.glob(f"{out}/part=*/data.parquet")}
    assert files1 == files2
    # simulate partial failure: remove one partition from the manifest
    import json as _json

    man = _json.load(open(f"{out}/_manifest.json"))
    man.pop("b")
    _json.dump(man, open(f"{out}/_manifest.json", "w"))
    r3 = write_partitioned_resumable(ray.data.from_pandas(df), out, "k", sort_cols=["v"])
    assert r3 == {"written": 1, "skipped": 2}
    total = sum(pq.read_metadata(f).num_rows for f in glob.glob(f"{out}/part=*/data.parquet"))
    assert total == 10


def test_multimodal_resize_and_audio_features():
    import numpy as np
    import ray.data

    from core_ray.stages.multimodal import audio_frame_features, resize_frames

    # 4x4 single-channel gradient frame + one corrupt row (length mismatch)
    frame = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    rows = [
        {"media_id": 0, "payload": frame.tobytes(), "height": 4, "width": 4, "channels": 1},
        {"media_id": 1, "payload": b"\x00\x01", "height": 4, "width": 4, "channels": 1},
    ]
    out = resize_frames(ray.data.from_items(rows), 2, 2).to_pandas()
    assert len(out) == 1  # corrupt row dropped
    got = np.frombuffer(out["payload"].iloc[0], dtype=np.uint8).reshape(2, 2)
    # nearest-neighbor gather picks rows/cols 0 and 2
    assert got.tolist() == [[0, 2], [8, 10]]
    assert out["height"].iloc[0] == 2 and out["width"].iloc[0] == 2

    # constant-amplitude PCM -> constant RMS envelope
    pcm = (np.ones(1024 * 4, dtype="<i2") * 16384).tobytes()
    ds = ray.data.from_items([{"media_id": 0, "payload": pcm}])
    feats = audio_frame_features(ds, frame_len=1024, n_frames=4).to_pandas()
    rms = np.asarray(feats["rms"].iloc[0])
    assert rms.shape == (4,)
    assert np.allclose(rms, 0.5)


def test_pcdm_merge_ns_strip_and_dedup_flags(tmp_path):
    import pandas as pd
    import ray.data

    from core_ray.state import PCDMMergeSink

    rows = pd.DataFrame(
        {
            "TagName": ["T1", "T1"],
            "EventTime": pd.to_datetime(
                ["2024-03-01 10:00:00.123456", "2024-03-01 10:00:00.123999"]
            ),
            "Status": ["Good", "Good"],
            "Value": ["1.0", "2.0"],
            "ValueType": ["float", "float"],
            "ChangeType": ["insert", "insert"],
        }
    )
    # remove_nanoseconds floors to ms (pcdm_to_delta.py:285-291): the two rows
    # collapse onto one key and the dedup keeps the greater Value
    sink = PCDMMergeSink(str(tmp_path / "a"), remove_nanoseconds=True)
    sink.apply(ray.data.from_pandas(rows))
    ev = sink.read_events("float")
    assert len(ev) == 1
    assert ev["EventTime"].iloc[0].microsecond == 123000
    assert ev["Value"].iloc[0] == 2.0

    # remove_duplicates=False keeps both rows (distinct keys without ns-strip)
    sink = PCDMMergeSink(str(tmp_path / "b"), remove_duplicates=False)
    sink.apply(ray.data.from_pandas(rows))
    assert len(sink.read_events("float")) == 2


def test_polars_delta_destination_modes(tmp_path):
    import pytest
    import ray.data

    from core_ray.stages.python_destinations import PolarsDeltaDestination

    ds = ray.data.from_items([{"a": 1}, {"a": 2}])
    path = str(tmp_path / "tbl")

    dest = PolarsDeltaDestination(path, mode="error")
    assert dest.write_batch(ds)["written"] == 2
    with pytest.raises(FileExistsError):
        dest.write_batch(ds)  # table now exists

    assert PolarsDeltaDestination(path, mode="ignore").write_batch(ds)["skipped"]
    assert PolarsDeltaDestination(path, mode="append").write_batch(ds)["written"] == 2
    assert PolarsDeltaDestination(path, mode="append").read_back().num_rows == 4
    PolarsDeltaDestination(path, mode="overwrite").write_batch(ds)
    assert PolarsDeltaDestination(path, mode="append").read_back().num_rows == 2


def test_pcdm_merge_append_mode(tmp_path):
    import pandas as pd
    import ray.data

    from core_ray.state import PCDMMergeSink

    rows = pd.DataFrame(
        {
            "TagName": ["T1", "T1"],
            "EventTime": pd.to_datetime(["2024-03-01 10:00:00", "2024-03-01 10:00:00"]),
            "Status": ["Good", "Good"],
            "Value": ["1.0", "2.0"],
            "ValueType": ["float", "float"],
            "ChangeType": ["insert", "insert"],
        }
    )
    # merge=False is the reference append path: no keyed dedup against the
    # existing partition, rows land regardless of ChangeType
    sink = PCDMMergeSink(str(tmp_path / "a"), merge=False, remove_duplicates=False)
    sink.apply(ray.data.from_pandas(rows))
    sink.apply(ray.data.from_pandas(rows))
    ev = sink.read_events("float")
    assert len(ev) == 4  # appended twice, no merge
    latest = sink.read_latest()
    assert latest["TagName"].tolist() == ["T1"]  # registers still maintained


def test_logging_surface_dataset_and_manifests(tmp_path):
    """DatasetLogHandler captures managed loggers' records as a queryable
    table; manifest_logs surfaces streaming epoch manifests as a Dataset."""
    import json
    import os

    from core_ray.pipelines.logging import (
        DatasetLogHandler,
        LoggerManager,
        RuntimeLogCollector,
        manifest_logs,
    )

    lm = LoggerManager()
    logger = lm.create_logger("test_run_logger")
    logger.setLevel("INFO")
    handler = RuntimeLogCollector().attach_dataset_handler_to_logger("test_run_logger")
    logger.info("stage %s started", "read")
    logger.warning("late rows: %d", 3)

    df = handler.get_logs_as_df()
    assert list(df.columns) == ["timestamp", "name", "level", "message"]
    assert df["message"].tolist() == ["stage read started", "late rows: 3"]
    assert df["level"].tolist() == ["INFO", "WARNING"]

    ds = handler.to_dataset()
    assert ds.count() == 2
    logger.removeHandler(handler)

    mdir = tmp_path / "out" / "manifests" / "part=0003"
    os.makedirs(mdir)
    (mdir / "epoch-000007.json").write_text(
        json.dumps({"rows_in": 10, "rows_emitted": 9, "tokens_emitted": 55,
                    "late_rows": 1, "dupes_dropped": 0, "watermark": 123})
    )
    logs = manifest_logs(str(tmp_path / "out")).to_pandas()
    assert logs.loc[0, "partition"] == 3
    assert logs.loc[0, "epoch"] == 7
    assert logs.loc[0, "tokens_emitted"] == 55
