"""Stream-stream symmetric hash join: batch-join equivalence, exactly-once
crash/resume byte identity, watermark state eviction, late-row drops."""

import glob
import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_stream(d, df, n_files):
    """Split a ts-sorted frame into contiguous files (monotone stream)."""
    os.makedirs(d, exist_ok=True)
    df = df.sort_values("ts_us", kind="mergesort").reset_index(drop=True)
    step = (len(df) + n_files - 1) // n_files
    for i in range(n_files):
        part = df.iloc[i * step : (i + 1) * step]
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            os.path.join(d, f"f{i:03d}.parquet"),
        )


def _mk_streams(tmp_path, n=4000, seed=3):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "key": rng.integers(0, 50, n).astype("int64"),
            "ts_us": np.sort(rng.integers(0, 3_600_000_000, n)).astype("int64"),
            "l_id": np.arange(n, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "key": rng.integers(0, 50, n).astype("int64"),
            "ts_us": np.sort(rng.integers(0, 3_600_000_000, n)).astype("int64"),
            "r_id": np.arange(n, dtype="int64"),
        }
    )
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    _write_stream(ld, left, 6)
    _write_stream(rd, right, 6)
    return ld, rd, left, right


def _batch_oracle(left, right, lo, hi):
    m = left.rename(columns={"ts_us": "l_ts_us", "l_id": "l_l_id"}).merge(
        right.rename(columns={"ts_us": "r_ts_us", "r_id": "r_r_id"}), on="key"
    )
    d = m["r_ts_us"] - m["l_ts_us"]
    m = m[(d >= lo) & (d <= hi)]
    return (
        m.sort_values(["key", "l_ts_us", "r_ts_us", "l_l_id", "r_r_id"])
        .reset_index(drop=True)
    )


def _read_out(out_dir):
    from core_ray.streaming import read_joined

    ds = read_joined(out_dir)
    df = ds.to_pandas()
    return (
        df.sort_values(["key", "l_ts_us", "r_ts_us", "l_l_id", "r_r_id"])
        .reset_index(drop=True)[["key", "l_ts_us", "r_ts_us", "l_l_id", "r_r_id"]]
    )


def _sink_hash(out_dir):
    h = hashlib.sha256()
    for f in sorted(glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True)):
        rel = os.path.relpath(f, out_dir)
        if "state-" in os.path.basename(f):
            continue
        h.update(rel.encode())
        h.update(open(f, "rb").read())
    return h.hexdigest()


BAND = (0, 300_000_000)  # right within [0, 5 min] after left


def _cfg(ld, rd, out):
    from core_ray.streaming import JoinConfig

    return JoinConfig(
        left_dir=ld,
        right_dir=rd,
        out_dir=out,
        key_col="key",
        band_lo_us=BAND[0],
        band_hi_us=BAND[1],
        num_partitions=4,
        files_per_epoch=1,
        left_payload=["l_id"],
        right_payload=["r_id"],
    )


def test_join_matches_batch_oracle(tmp_path):
    from core_ray.streaming import StreamJoinJob

    ld, rd, left, right = _mk_streams(tmp_path)
    out = str(tmp_path / "out")
    res = StreamJoinJob(_cfg(ld, rd, out)).run(resume=False)
    got = _read_out(out)
    expect = _batch_oracle(left, right, *BAND)[got.columns.tolist()]
    pd.testing.assert_frame_equal(got, expect)
    assert res["totals"]["rows"] == len(expect)
    assert res["totals"]["late"] == 0  # monotone streams never drop rows


def test_join_crash_resume_byte_identical(tmp_path):
    from core_ray.streaming import StreamJoinJob

    ld, rd, _, _ = _mk_streams(tmp_path)
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    StreamJoinJob(_cfg(ld, rd, out_a)).run(resume=False)
    StreamJoinJob(_cfg(ld, rd, out_b)).run(resume=False, stop_after_epoch=2)
    StreamJoinJob(_cfg(ld, rd, out_b)).run(resume=True)
    assert _sink_hash(out_a) == _sink_hash(out_b)


def test_join_uneven_streams_and_exhaustion(tmp_path):
    """Right stream twice as long as left: left exhausts mid-run, its
    frontier stops constraining, and the full match set is still emitted."""
    from core_ray.streaming import StreamJoinJob

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "key": rng.integers(0, 20, 500).astype("int64"),
            "ts_us": np.sort(rng.integers(0, 1_000_000_000, 500)).astype("int64"),
            "l_id": np.arange(500, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "key": rng.integers(0, 20, 2000).astype("int64"),
            "ts_us": np.sort(rng.integers(0, 3_600_000_000, 2000)).astype("int64"),
            "r_id": np.arange(2000, dtype="int64"),
        }
    )
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    _write_stream(ld, left, 2)
    _write_stream(rd, right, 8)
    out = str(tmp_path / "out")
    StreamJoinJob(_cfg(ld, rd, out)).run(resume=False)
    got = _read_out(out)
    expect = _batch_oracle(left, right, *BAND)[got.columns.tolist()]
    pd.testing.assert_frame_equal(got, expect)


def test_join_state_bounded_by_band(tmp_path):
    """After each barrier, per-actor state holds only rows inside the band of
    the frontier — stream length does not grow state."""
    from core_ray.streaming import StreamJoinJob

    ld, rd, left, right = _mk_streams(tmp_path, n=6000)
    out = str(tmp_path / "out")
    cfg = _cfg(ld, rd, out)
    job = StreamJoinJob(cfg)
    job.run(resume=False)
    # final snapshot: state row counts from the last epoch's manifests
    import json

    state_rows = 0
    for mdir in glob.glob(os.path.join(out, "manifests", "part=*")):
        mf = sorted(os.listdir(mdir))[-1]
        c = json.load(open(os.path.join(mdir, mf)))["counters"]
        state_rows += c["state_l"] + c["state_r"]
    # the band covers 5 min of a 60-min stream: state must be well under the
    # full 12k rows (loose 50% bound; typical is ~10%)
    assert state_rows < 6000


def test_join_drops_late_rows(tmp_path):
    """A row older than the watermark at its arrival epoch is dropped and
    counted (the aggregate engine's lateness contract)."""
    from core_ray.streaming import StreamJoinJob

    # left: two files; file 2 contains a stale row far older than file 1's
    # frontier minus lateness
    left = pd.DataFrame(
        {
            "key": np.array([1, 1, 1, 1], dtype="int64"),
            "ts_us": np.array(
                [1_000_000_000, 2_000_000_000, 5_000, 3_000_000_000], dtype="int64"
            ),
            "l_id": np.arange(4, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "key": np.array([1, 1], dtype="int64"),
            "ts_us": np.array([1_000_001_000, 2_500_000_000], dtype="int64"),
            "r_id": np.arange(2, dtype="int64"),
        }
    )
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(ld), os.makedirs(rd)
    # hand-built files: late row rides in the SECOND left file
    pq.write_table(
        pa.Table.from_pandas(left.iloc[[0, 1]], preserve_index=False), f"{ld}/f0.parquet"
    )
    pq.write_table(
        pa.Table.from_pandas(left.iloc[[2, 3]], preserve_index=False), f"{ld}/f1.parquet"
    )
    pq.write_table(
        pa.Table.from_pandas(right.iloc[[0]], preserve_index=False), f"{rd}/f0.parquet"
    )
    pq.write_table(
        pa.Table.from_pandas(right.iloc[[1]], preserve_index=False), f"{rd}/f1.parquet"
    )
    out = str(tmp_path / "out")
    cfg = _cfg(ld, rd, out)
    cfg.num_partitions = 1
    res = StreamJoinJob(cfg).run(resume=False)
    assert res["totals"]["late"] == 1
    got = _read_out(out)
    assert 2 not in set(got["l_l_id"])  # the stale row joined nothing


def test_join_mid_barrier_crash_resume(tmp_path):
    """Partitions at different committed epochs after a barrier crash:
    resume must find the previous-epoch snapshot on the partitions that DID
    commit (gc keeps epoch-1 and epoch, state_actor convention)."""
    from core_ray.streaming import StreamJoinJob

    ld, rd, _, _ = _mk_streams(tmp_path, seed=19)
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    StreamJoinJob(_cfg(ld, rd, out_a)).run(resume=False)
    StreamJoinJob(_cfg(ld, rd, out_b)).run(resume=False, stop_after_epoch=2)
    p0 = os.path.join(out_b, "part=0000")
    os.remove(os.path.join(out_b, "manifests", "part=0000", "epoch-000002.json"))
    for n in os.listdir(p0):
        if "epoch-000002" in n:
            os.remove(os.path.join(p0, n))
    StreamJoinJob(_cfg(ld, rd, out_b)).run(resume=True)
    assert _sink_hash(out_a) == _sink_hash(out_b)


def _cfg_outer(ld, rd, out):
    cfg = _cfg(ld, rd, out)
    cfg.how = "left_outer"
    return cfg


def _batch_left_outer(left, right, lo, hi):
    m = left.rename(columns={"ts_us": "l_ts_us", "l_id": "l_l_id"}).merge(
        right.rename(columns={"ts_us": "r_ts_us", "r_id": "r_r_id"}),
        on="key", how="left",
    )
    d = m["r_ts_us"] - m["l_ts_us"]
    matched = m[(d >= lo) & (d <= hi)]
    # left rows with no in-band match at all -> one null-extended row each
    has = set(zip(matched["key"], matched["l_ts_us"], matched["l_l_id"]))
    un = left[~left.apply(
        lambda r: (r["key"], r["ts_us"], r["l_id"]) in has, axis=1)]
    un = un.rename(columns={"ts_us": "l_ts_us", "l_id": "l_l_id"}).copy()
    un["r_ts_us"] = np.nan
    un["r_r_id"] = np.nan
    cols = ["key", "l_ts_us", "r_ts_us", "l_l_id", "r_r_id"]
    out = pd.concat([matched[cols], un[cols]], ignore_index=True)
    return out.sort_values(cols).reset_index(drop=True)


def test_outer_join_matches_batch_left_join(tmp_path):
    from core_ray.streaming import StreamJoinJob

    ld, rd, left, right = _mk_streams(tmp_path, n=2500)
    out = str(tmp_path / "out")
    StreamJoinJob(_cfg_outer(ld, rd, out)).run(resume=False)
    got = _read_out(out).astype("float64")
    expect = _batch_left_outer(left, right, *BAND)[got.columns.tolist()].astype("float64")
    pd.testing.assert_frame_equal(got, expect)


def test_outer_join_hand_case_single_emission(tmp_path):
    """One matched left row, one never-matched left row: the unmatched row
    appears exactly once, null-extended; the matched row never gets a null
    twin."""
    from core_ray.streaming import StreamJoinJob

    left = pd.DataFrame(
        {"key": [1, 2], "ts_us": [1_000_000, 2_000_000], "l_id": [0, 1]}
    )
    right = pd.DataFrame(
        {"key": [1], "ts_us": [100_000_000], "r_id": [9]}
    )
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    _write_stream(ld, left, 2)
    _write_stream(rd, right, 2)
    out = str(tmp_path / "out")
    StreamJoinJob(_cfg_outer(ld, rd, out)).run(resume=False)
    got = _read_out(out)
    assert len(got) == 2
    m = got[got["key"] == 1].iloc[0]
    assert m["r_r_id"] == 9
    u = got[got["key"] == 2].iloc[0]
    assert pd.isna(u["r_r_id"]) and pd.isna(u["r_ts_us"])


def test_outer_join_crash_resume_byte_identical(tmp_path):
    from core_ray.streaming import StreamJoinJob

    ld, rd, _, _ = _mk_streams(tmp_path, n=2500)
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    StreamJoinJob(_cfg_outer(ld, rd, out_a)).run(resume=False)
    StreamJoinJob(_cfg_outer(ld, rd, out_b)).run(resume=False, stop_after_epoch=2)
    StreamJoinJob(_cfg_outer(ld, rd, out_b)).run(resume=True)
    assert _sink_hash(out_a) == _sink_hash(out_b)


def test_outer_join_resume_after_flush_is_noop(tmp_path):
    """A second resume=True run after a completed (flushed) run re-commits
    nothing and leaves bytes identical."""
    from core_ray.streaming import StreamJoinJob

    ld, rd, _, _ = _mk_streams(tmp_path, n=1000)
    out = str(tmp_path / "out")
    StreamJoinJob(_cfg_outer(ld, rd, out)).run(resume=False)
    h1 = _sink_hash(out)
    StreamJoinJob(_cfg_outer(ld, rd, out)).run(resume=True)
    assert _sink_hash(out) == h1


def _cfg_asof(ld, rd, out):
    cfg = _cfg(ld, rd, out)
    cfg.how = "asof"
    return cfg


def _read_asof(out_dir):
    from core_ray.streaming import read_joined

    df = read_joined(out_dir).to_pandas()
    cols = ["key", "l_ts_us", "r_ts_us", "l_l_id", "r_r_id"]
    return df.sort_values(cols).reset_index(drop=True)[cols].astype("float64")


def test_asof_join_matches_merge_asof(tmp_path):
    from core_ray.streaming import StreamJoinJob

    ld, rd, left, right = _mk_streams(tmp_path, n=3000)
    out = str(tmp_path / "out")
    StreamJoinJob(_cfg_asof(ld, rd, out)).run(resume=False)
    got = _read_asof(out)
    lf = left.sort_values("ts_us", kind="mergesort")
    rf = right.sort_values(["ts_us", "r_id"], kind="mergesort")
    exp = pd.merge_asof(lf, rf, on="ts_us", by="key", direction="backward",
                        suffixes=("", "_r"))
    exp = pd.DataFrame(
        {
            "key": exp["key"], "l_ts_us": exp["ts_us"],
            "r_ts_us": np.where(exp["r_id"].notna(),
                                 exp.get("ts_us_r", exp["ts_us"]), np.nan),
            "l_l_id": exp["l_id"], "r_r_id": exp["r_id"],
        }
    )
    # merge_asof drops the right ts column when names collide; recompute it
    # from the matched r_id instead
    rmap = right.set_index("r_id")["ts_us"]
    exp["r_ts_us"] = exp["r_r_id"].map(rmap)
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True).astype("float64")
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()])


def test_asof_join_crash_resume_byte_identical(tmp_path):
    from core_ray.streaming import StreamJoinJob

    ld, rd, _, _ = _mk_streams(tmp_path, n=2000)
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    StreamJoinJob(_cfg_asof(ld, rd, out_a)).run(resume=False)
    StreamJoinJob(_cfg_asof(ld, rd, out_b)).run(resume=False, stop_after_epoch=2)
    StreamJoinJob(_cfg_asof(ld, rd, out_b)).run(resume=True)
    assert _sink_hash(out_a) == _sink_hash(out_b)


def test_asof_right_state_keeps_latest_below_watermark(tmp_path):
    """Eviction must NOT drop the newest right row below the watermark — a
    later left still matches it (hand case: purchase long before the last
    click)."""
    from core_ray.streaming import StreamJoinJob

    left = pd.DataFrame({"key": [1, 1], "ts_us": [5_000_000, 3_000_000_000],
                         "l_id": [0, 1]})
    right = pd.DataFrame({"key": [1], "ts_us": [1_000_000], "r_id": [7]})
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    _write_stream(ld, left, 3)
    _write_stream(rd, right, 3)
    out = str(tmp_path / "out")
    StreamJoinJob(_cfg_asof(ld, rd, out)).run(resume=False)
    got = _read_asof(out)
    assert len(got) == 2
    assert got["r_r_id"].tolist() == [7.0, 7.0]  # both clicks enrich from it


def test_full_outer_join_matches_batch_full_join(tmp_path):
    from core_ray.streaming import StreamJoinJob

    ld, rd, left, right = _mk_streams(tmp_path, n=2000)
    out = str(tmp_path / "out")
    cfg = _cfg(ld, rd, out)
    cfg.how = "full_outer"
    StreamJoinJob(cfg).run(resume=False)
    got = _read_out(out).astype("float64")

    m = left.rename(columns={"ts_us": "l_ts_us", "l_id": "l_l_id"}).merge(
        right.rename(columns={"ts_us": "r_ts_us", "r_id": "r_r_id"}),
        on="key", how="outer",
    )
    d = m["r_ts_us"] - m["l_ts_us"]
    in_band = (d >= BAND[0]) & (d <= BAND[1])
    matched = m[in_band.fillna(False)]
    lkeys = set(zip(matched["key"], matched["l_ts_us"], matched["l_l_id"]))
    rkeys = set(zip(matched["key"], matched["r_ts_us"], matched["r_r_id"]))
    ul = left[~left.apply(lambda r: (r["key"], r["ts_us"], r["l_id"]) in lkeys, axis=1)]
    ur = right[~right.apply(lambda r: (r["key"], r["ts_us"], r["r_id"]) in rkeys, axis=1)]
    ul = ul.rename(columns={"ts_us": "l_ts_us", "l_id": "l_l_id"}).copy()
    ul["r_ts_us"] = np.nan
    ul["r_r_id"] = np.nan
    ur = ur.rename(columns={"ts_us": "r_ts_us", "r_id": "r_r_id"}).copy()
    ur["l_ts_us"] = np.nan
    ur["l_l_id"] = np.nan
    cols = ["key", "l_ts_us", "r_ts_us", "l_l_id", "r_r_id"]
    exp = pd.concat([matched[cols], ul[cols], ur[cols]], ignore_index=True)
    exp = exp.sort_values(cols).reset_index(drop=True).astype("float64")
    pd.testing.assert_frame_equal(got, exp)


def test_full_outer_join_crash_resume_byte_identical(tmp_path):
    from core_ray.streaming import StreamJoinJob

    ld, rd, _, _ = _mk_streams(tmp_path, n=1500)
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    cfg_a, cfg_b = _cfg(ld, rd, out_a), _cfg(ld, rd, out_b)
    cfg_a.how = cfg_b.how = "full_outer"
    StreamJoinJob(cfg_a).run(resume=False)
    StreamJoinJob(cfg_b).run(resume=False, stop_after_epoch=2)
    StreamJoinJob(cfg_b).run(resume=True)
    assert _sink_hash(out_a) == _sink_hash(out_b)


def test_join_resume_refuses_changed_shape_and_tmp_manifests(tmp_path):
    """(a) Resuming a join with a different num_partitions is refused by the
    persisted shape guard (misrouted keys would silently duplicate or drop
    matches); (b) a leftover manifest temp from a crashed commit is ignored
    by read_joined instead of double-counting the epoch's files."""
    from core_ray.streaming.join import JoinConfig, StreamJoinJob, read_joined

    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    out = str(tmp_path / "out")
    _mk_streams(tmp_path)
    cfg = dict(left_dir=ld, right_dir=rd, out_dir=out, key_col="key",
               band_lo_us=BAND[0], band_hi_us=BAND[1], num_partitions=4,
               files_per_epoch=1, left_payload=["l_id"],
               right_payload=["r_id"])
    StreamJoinJob(JoinConfig(**cfg)).run(resume=False, stop_after_epoch=1)
    with pytest.raises(ValueError, match="job shape changed"):
        StreamJoinJob(JoinConfig(**{**cfg, "num_partitions": 8})).run(
            resume=True
        )
    StreamJoinJob(JoinConfig(**cfg)).run(resume=True)
    n = read_joined(out).count()
    # plant a torn manifest temp next to a committed one: reader must skip it
    mdir = os.path.join(out, "manifests", "part=0000")
    committed = sorted(
        f for f in os.listdir(mdir)
        if f.startswith("epoch-") and f.endswith(".json")
    )[0]
    import shutil

    shutil.copy(os.path.join(mdir, committed),
                os.path.join(mdir, committed + ".tmp"))
    with open(os.path.join(mdir, "epoch-999999.json.tmp"), "w") as f:
        f.write("{ torn")  # truncated JSON must not crash the reader
    assert read_joined(out).count() == n
