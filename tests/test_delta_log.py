"""Native ``_delta_log`` reader tests: a hand-built Delta table fixture with
JSON commits, a parquet checkpoint, a remove tombstone and a partitioned
layout is read EXACTLY (live-file set, time travel, typed partition columns,
Polars fallback path)."""

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from core_ray.sources.delta_log import read_delta, snapshot


def _write_part(table, rel, df):
    path = os.path.join(table, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def _commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


_SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            {"name": "day", "type": "integer", "nullable": True, "metadata": {}},
        ],
    }
)


@pytest.fixture
def delta_table(tmp_path):
    """Versions: 0 = metaData + files a,b (day=1/day=2) · 1 = add c (day=2)
    · 2 = remove b + add d (day=1) · checkpoint at 2 · 3 = add e (day=3).
    Live set at latest: a, c, d, e."""
    table = str(tmp_path / "tbl")
    parts = {
        "day=1/a.parquet": pd.DataFrame({"id": [1, 2], "v": [1.5, 2.5]}),
        "day=2/b.parquet": pd.DataFrame({"id": [3], "v": [3.5]}),
        "day=2/c.parquet": pd.DataFrame({"id": [4], "v": [4.5]}),
        "day=1/d.parquet": pd.DataFrame({"id": [5], "v": [5.5]}),
        "day=3/e.parquet": pd.DataFrame({"id": [6], "v": [6.5]}),
    }
    for rel, df in parts.items():
        _write_part(table, rel, df)

    def add(rel):
        day = rel.split("/")[0].split("=")[1]
        return {
            "add": {
                "path": rel,
                "partitionValues": {"day": day},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        }

    _commit(
        table,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "fixture",
                    "schemaString": _SCHEMA_STRING,
                    "partitionColumns": ["day"],
                    "format": {"provider": "parquet"},
                }
            },
            add("day=1/a.parquet"),
            add("day=2/b.parquet"),
        ],
    )
    _commit(table, 1, [add("day=2/c.parquet")])
    _commit(
        table,
        2,
        [
            {"remove": {"path": "day=2/b.parquet", "dataChange": True}},
            add("day=1/d.parquet"),
        ],
    )
    # checkpoint at version 2: live adds only + metaData (remove tombstones
    # in a checkpoint are expired — the reader must not need them)
    ckpt_rows = []
    for rel in ["day=1/a.parquet", "day=2/c.parquet", "day=1/d.parquet"]:
        ckpt_rows.append(
            {
                "add": add(rel)["add"],
                "metaData": None,
            }
        )
    ckpt_rows.append(
        {
            "add": None,
            "metaData": {
                "id": "fixture",
                "schemaString": _SCHEMA_STRING,
                "partitionColumns": ["day"],
            },
        }
    )
    log = os.path.join(table, "_delta_log")
    pq.write_table(
        pa.Table.from_pylist(ckpt_rows),
        os.path.join(log, f"{2:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 2, "size": len(ckpt_rows)}, f)
    _commit(table, 3, [add("day=3/e.parquet")])
    return table


def test_snapshot_latest_uses_checkpoint_plus_tail(delta_table):
    snap = snapshot(delta_table)
    assert snap.version == 3
    assert [f["path"] for f in snap.files] == [
        "day=1/a.parquet",
        "day=1/d.parquet",
        "day=2/c.parquet",
        "day=3/e.parquet",
    ]
    assert snap.partition_columns == ["day"]


def test_snapshot_time_travel_replays_log(delta_table):
    # version 1: before the remove — b still live, d/e absent
    snap = snapshot(delta_table, version=1)
    assert [f["path"] for f in snap.files] == [
        "day=1/a.parquet",
        "day=2/b.parquet",
        "day=2/c.parquet",
    ]
    with pytest.raises(ValueError):
        snapshot(delta_table, version=99)


def test_read_delta_rows_and_typed_partitions(delta_table):
    df = (
        read_delta(delta_table)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert df["id"].tolist() == [1, 2, 4, 5, 6]
    assert df["v"].tolist() == [1.5, 2.5, 4.5, 5.5, 6.5]
    # partition column typed per schemaString (integer, not string)
    assert df["day"].tolist() == [1, 1, 2, 1, 3]
    assert str(df["day"].dtype) in ("int32", "int64")


def test_read_delta_column_pruning(delta_table):
    df = read_delta(delta_table, columns=["id", "day"]).to_pandas()
    assert sorted(df.columns) == ["day", "id"]
    assert len(df) == 5


def test_polars_source_falls_back_to_native_reader(delta_table):
    from core_ray.sources.python_sources import PolarsSource

    ds = PolarsSource(delta_table, fmt="delta").read_batch()
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert df["id"].tolist() == [1, 2, 4, 5, 6]
    assert df["day"].tolist() == [1, 1, 2, 1, 3]


def test_read_delta_null_partition_value(tmp_path):
    """A null partitionValues entry (JSON null) must sort and read as a
    typed null column, not TypeError against string keys."""
    table = str(tmp_path / "tbl")
    _write_part(table, "day=1/a.parquet", pd.DataFrame({"id": [1], "v": [1.5]}))
    _write_part(table, "nullpart/b.parquet", pd.DataFrame({"id": [2], "v": [2.5]}))
    _commit(
        table,
        0,
        [
            {
                "metaData": {
                    "id": "x",
                    "schemaString": _SCHEMA_STRING,
                    "partitionColumns": ["day"],
                }
            },
            {"add": {"path": "day=1/a.parquet",
                     "partitionValues": {"day": "1"}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
            {"add": {"path": "nullpart/b.parquet",
                     "partitionValues": {"day": None}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ],
    )
    df = read_delta(table).to_pandas().sort_values("id").reset_index(drop=True)
    assert df["id"].tolist() == [1, 2]
    assert df["day"].iloc[0] == 1
    assert pd.isna(df["day"].iloc[1])


def test_version_at_timestamp_resolution(delta_table):
    from core_ray.sources.delta_log import version_at_timestamp

    # stamp commitInfo timestamps: v0=1000, v1=2000, v2=1500 (SKEWED —
    # earlier than v1), v3=3000.  Running-max monotonicity means v2's
    # effective timestamp is 2000, so ts=1999 resolves v1, ts=2000 -> v2.
    log = os.path.join(delta_table, "_delta_log")
    for v, ts in [(0, 1000), (1, 2000), (2, 1500), (3, 3000)]:
        path = os.path.join(log, f"{v:020d}.json")
        lines = [json.dumps({"commitInfo": {"timestamp": ts}}) + "\n"]
        with open(path) as f:
            lines += f.readlines()
        with open(path, "w") as f:
            f.writelines(lines)
    assert version_at_timestamp(delta_table, 1000) == 0
    assert version_at_timestamp(delta_table, 1999) == 0  # before v1's 2000
    assert version_at_timestamp(delta_table, 2000) == 2  # v2 shadows v1
    assert version_at_timestamp(delta_table, 2999) == 2
    assert version_at_timestamp(delta_table, 10_000) == 3
    with pytest.raises(ValueError, match="predates"):
        version_at_timestamp(delta_table, 999)

    # read_delta at ts=2000 == version 2 state: a, c, d live (b removed,
    # e not yet added)
    df = (
        read_delta(delta_table, timestamp_ms=2000)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(df["id"]) == [1, 2, 4, 5]
    with pytest.raises(ValueError, match="not both"):
        read_delta(delta_table, version=1, timestamp_ms=2000)


def test_delta_writer_reader_roundtrip(tmp_path):
    """Append + append + overwrite through the native writer, read back
    through the native reader: modes, tombstones, partition typing, and
    time travel across the writer's own commits."""
    import pyarrow as pa
    import pytest

    from core_ray.sources.delta_log import read_delta, snapshot
    from core_ray.sources.delta_write import write_delta

    d = str(tmp_path / "tbl")
    t1 = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                   "p": pa.array(["a", "a", "b", "b"]),
                   "v": pa.array([1.5, 2.5, 3.5, 4.5])})
    t2 = pa.table({"k": pa.array([5, 6], pa.int64()),
                   "p": pa.array(["a", "c"]),
                   "v": pa.array([5.5, 6.5])})
    r1 = write_delta(t1, d, mode="append", partition_cols=["p"])
    assert r1["version"] == 0 and r1["rows"] == 4
    r2 = write_delta(t2, d, mode="append", partition_cols=["p"])
    assert r2["version"] == 1
    df = read_delta(d).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(df["k"]) == [1, 2, 3, 4, 5, 6]
    assert list(df["p"]) == ["a", "a", "b", "b", "a", "c"]

    # error / ignore modes
    with pytest.raises(FileExistsError):
        write_delta(t1, d, mode="error", partition_cols=["p"])
    assert write_delta(t1, d, mode="ignore")["rows"] == 0

    # overwrite tombstones everything live
    t3 = pa.table({"k": pa.array([9], pa.int64()), "p": pa.array(["z"]),
                   "v": pa.array([9.0])})
    r3 = write_delta(t3, d, mode="overwrite", partition_cols=["p"])
    assert read_delta(d).to_pandas()["k"].tolist() == [9]
    # time travel still sees the pre-overwrite state
    assert len(read_delta(d, version=1).to_pandas()) == 6
    # snapshot partition metadata came from the writer's metaData action
    snap = snapshot(d)
    assert snap.partition_columns == ["p"]


def test_delta_writer_concurrent_version_race(tmp_path):
    """Two commits prepared against the same base version: the loser's
    put-if-absent link fails and it lands on the next version."""
    import pyarrow as pa

    from core_ray.sources.delta_log import read_delta
    from core_ray.sources.delta_write import _publish_commit, write_delta

    d = str(tmp_path / "tbl")
    t = pa.table({"k": pa.array([1], pa.int64())})
    write_delta(t, d, mode="append")
    log = f"{d}/_delta_log"
    # both racers target version 1
    v_a = _publish_commit(log, [{"commitInfo": {"timestamp": 1}}], 1)
    v_b = _publish_commit(log, [{"commitInfo": {"timestamp": 2}}], 1)
    assert {v_a, v_b} == {1, 2}


def test_delta_writer_null_partition_value(tmp_path):
    import pyarrow as pa

    from core_ray.sources.delta_log import read_delta
    from core_ray.sources.delta_write import write_delta

    d = str(tmp_path / "tbl")
    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "p": pa.array(["a", None])})
    write_delta(t, d, mode="append", partition_cols=["p"])
    df = read_delta(d).to_pandas().sort_values("k")
    assert df["p"].tolist()[0] == "a"
    assert df["p"].isna().tolist() == [False, True]


def test_delta_delete_partition_pruning_and_cow(tmp_path):
    """Delete restricted by a partition filter: files of other partitions
    are never read or tombstoned (byte-identical on disk); matched files
    are tombstoned + rewritten in one version; an all-deleted file leaves
    only a tombstone; a no-match delete creates NO new version."""
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.compute as pc

    from core_ray.sources.delta_log import read_delta, snapshot
    from core_ray.sources.delta_write import delete_delta, write_delta

    d = str(tmp_path / "tbl")
    t = pa.table(
        {
            "k": pa.array(range(10), pa.int64()),
            "p": pa.array(["a"] * 5 + ["b"] * 5),
        }
    )
    write_delta(t, d, mode="append", partition_cols=["p"])
    snap0 = snapshot(d)
    b_files = [f["path"] for f in snap0.files if f["partitionValues"]["p"] == "b"]
    b_hash = {
        f: hashlib.sha256(open(os.path.join(d, f), "rb").read()).hexdigest()
        for f in b_files
    }

    res = delete_delta(
        d,
        lambda tb: pc.equal(pc.bit_wise_and(tb["k"], 1), 1),  # odd k
        partition_filter=lambda pv: pv["p"] == "a",
    )
    assert res["deleted"] == 2  # k in {1, 3} live in partition a
    df = read_delta(d).to_pandas().sort_values("k")
    assert df["k"].tolist() == [0, 2, 4, 5, 6, 7, 8, 9]
    for f, h in b_hash.items():  # partition b untouched on disk
        assert hashlib.sha256(open(os.path.join(d, f), "rb").read()).hexdigest() == h

    # all rows of partition a deleted -> tombstone only, no rewrite
    res2 = delete_delta(d, lambda tb: pc.greater_equal(tb["k"], 0),
                        partition_filter=lambda pv: pv["p"] == "a")
    assert res2["rewritten"] == 0 and res2["deleted"] == 3
    assert sorted(read_delta(d).to_pandas()["k"]) == [5, 6, 7, 8, 9]

    # no-match delete: version unchanged
    v = snapshot(d).version
    res3 = delete_delta(d, lambda tb: pc.greater(tb["k"], 99))
    assert res3["deleted"] == 0 and snapshot(d).version == v


def test_delta_writer_escapes_partition_directory(tmp_path):
    """Partition VALUES containing '/', '=', '%' or spaces must be
    percent-escaped in the hive directory component (delta-rs/Spark
    convention) while add.partitionValues keeps the raw value — a raw '/'
    would silently nest directories and change the recorded layout."""
    import glob
    import os

    import pyarrow as pa

    from core_ray.sources.delta_log import read_delta
    from core_ray.sources.delta_write import write_delta

    d = str(tmp_path / "tbl")
    vals = ["a/b", "x=y", "sp ace", "pct%20"]
    t = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                  "p": pa.array(vals)})
    write_delta(t, d, mode="append", partition_cols=["p"])
    # raw values round-trip through the log's partitionValues
    df = read_delta(d).to_pandas().sort_values("k")
    assert list(df["p"]) == vals
    # no nested a/b directory leaked out of the value
    dirs = sorted(
        os.path.basename(p) for p in glob.glob(f"{d}/p=*") if os.path.isdir(p)
    )
    assert dirs == ["p=a%2Fb", "p=pct%2520", "p=sp%20ace", "p=x%3Dy"]
