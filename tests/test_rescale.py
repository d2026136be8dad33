"""Checkpoint rescaling (Flink-savepoint-style): resume a streaming job at a
different partition count with state re-routed — exactly-once preserved,
window aggregates identical to an unbroken run, crash-interrupted rescale
resumable from its journal."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from core_ray.streaming import StreamConfig, StreamingJob, rescale_checkpoint
from core_ray.synth import make_chunk, write_tokens_table

N_ROWS = 8_000
ROWS_PER_FILE = 1_000


def _cfg(in_dir, out_dir, parts):
    return StreamConfig(
        input_dir=str(in_dir), out_dir=str(out_dir),
        num_partitions=parts, window_s=60,
    )


def _rows(out_dir) -> pa.Table:
    files = sorted(glob.glob(f"{out_dir}/part=0*/rows-*.parquet"))
    return pa.concat_tables([pq.read_table(f) for f in files])


def _agg(out_dir) -> pd.DataFrame:
    files = sorted(glob.glob(f"{out_dir}/part=9999/agg-*.parquet"))
    df = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def rescale_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("rescale")
    in_dir = str(base / "in")
    write_tokens_table(in_dir, N_ROWS, rows_per_file=ROWS_PER_FILE)
    # the reference: one unbroken run at the ORIGINAL partition count
    ref_out = str(base / "ref")
    StreamingJob(_cfg(in_dir, ref_out, 4)).run(resume=False)
    return base, in_dir, ref_out


@pytest.mark.parametrize("new_parts", [7, 2])
def test_rescale_preserves_output(rescale_dirs, new_parts):
    """Stop mid-stream, rescale 4 -> Q, resume at Q: every doc exactly once,
    token arrays intact, final window aggregates equal to the unbroken run."""
    base, in_dir, ref_out = rescale_dirs
    out = str(base / f"out_{new_parts}")
    StreamingJob(_cfg(in_dir, out, 4)).run(resume=False, stop_after_epoch=3)
    res = rescale_checkpoint(out, new_parts)
    assert res["old"] == 4 and res["new"] == new_parts and res["epoch"] == 3
    StreamingJob(_cfg(in_dir, out, new_parts)).run(resume=True)

    rows = _rows(out)
    idx = np.sort(rows["doc_idx"].to_numpy())
    assert len(idx) == N_ROWS and (idx == np.arange(N_ROWS)).all()
    rows_sorted = rows.sort_by([("doc_idx", "ascending")]).combine_chunks()
    expected = make_chunk(0, N_ROWS)
    assert rows_sorted["tokens"].combine_chunks().equals(
        expected["tokens"].combine_chunks()
    )
    pd.testing.assert_frame_equal(_agg(out), _agg(ref_out))


def test_rescale_dedup_registers_reroute(tmp_path):
    """Duplicates re-sent AFTER the rescale must still be recognized: the
    seen registers route by hash(doc_idx) % Q, so a register written under
    P=4 must land on the partition the duplicate reaches under Q=6."""
    in_dir, out = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(in_dir)
    n, per = 2_400, 400
    full = make_chunk(0, n)
    for i in range(n // per):
        sl = full.slice(i * per, per)
        if i == 4:  # epoch 4 re-sends the tail of epoch 3 (inside lateness)
            sl = pa.concat_tables([full.slice(4 * per - 100, 100), sl])
        pq.write_table(sl, f"{in_dir}/f{i:03d}.parquet")

    def cfg(parts):
        return StreamConfig(input_dir=in_dir, out_dir=out,
                            num_partitions=parts, window_s=60, lateness_s=60)

    StreamingJob(cfg(4)).run(resume=False, stop_after_epoch=3)
    rescale_checkpoint(out, 6)
    res = StreamingJob(cfg(6)).run(resume=True)
    idx = np.sort(_rows(out)["doc_idx"].to_numpy())
    assert len(idx) == n and (idx == np.arange(n)).all()
    assert res["totals"]["dupes"] >= 100  # the re-sent rows were caught


def test_rescale_interrupted_then_rerun(rescale_dirs):
    """A rescale killed mid-rewrite resumes from its journal: the second
    invocation completes and the resumed job output is still exact."""
    base, in_dir, ref_out = rescale_dirs
    out = str(base / "out_crash")
    StreamingJob(_cfg(in_dir, out, 4)).run(resume=False, stop_after_epoch=3)

    from core_ray.streaming import rescale as rmod

    orig = rmod.EpochSink.write_snapshot
    calls = {"n": 0}

    def boom(self, epoch, name, table):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash mid-rescale")
        return orig(self, epoch, name, table)

    rmod.EpochSink.write_snapshot = boom
    try:
        with pytest.raises(RuntimeError):
            rescale_checkpoint(out, 5)
    finally:
        rmod.EpochSink.write_snapshot = orig
    assert os.path.exists(f"{out}/manifests/rescale.json")  # journaled
    res = rescale_checkpoint(out, 5)  # re-run completes from the journal
    assert res["new"] == 5
    assert not os.path.exists(f"{out}/manifests/rescale.json")
    StreamingJob(_cfg(in_dir, out, 5)).run(resume=True)
    idx = np.sort(_rows(out)["doc_idx"].to_numpy())
    assert len(idx) == N_ROWS and (idx == np.arange(N_ROWS)).all()
    pd.testing.assert_frame_equal(_agg(out), _agg(ref_out))


def test_rescale_guards(rescale_dirs, tmp_path):
    base, in_dir, _ = rescale_dirs
    out = str(base / "out_guard")
    StreamingJob(_cfg(in_dir, out, 4)).run(resume=False, stop_after_epoch=1)
    # same count: no-op
    assert rescale_checkpoint(out, 4)["epoch"] is None
    # un-rescaled partition change is still refused by the shape guard
    with pytest.raises(ValueError, match="job shape changed"):
        StreamingJob(_cfg(in_dir, out, 9)).run(resume=True)


@pytest.mark.parametrize("new_parts,how", [(7, "inner"), (3, "left_outer")])
def test_join_rescale_preserves_output(tmp_path, new_parts, how):
    """Stop the stream-stream join mid-run, rescale 4 -> Q (state re-routed
    by key hash), resume at Q: the joined row SET equals an unbroken run's
    (matched-flag state survives in outer mode)."""
    from core_ray.streaming import (
        JoinConfig,
        StreamJoinJob,
        read_joined,
        rescale_join_checkpoint,
    )

    rng = np.random.default_rng(5)
    nrows = 3000
    def mk(seed):
        r = np.random.default_rng(seed)
        return pd.DataFrame({
            "key": r.integers(0, 40, nrows).astype("int64"),
            "ts_us": np.sort(r.integers(0, 3_600_000_000, nrows)).astype("int64"),
            "pid": np.arange(nrows, dtype="int64"),
        })
    left, right = mk(5), mk(6)
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    for d, df_ in ((ld, left), (rd, right)):
        os.makedirs(d, exist_ok=True)
        step = (len(df_) + 5) // 6
        for i in range(6):
            pq.write_table(
                pa.Table.from_pandas(df_.iloc[i*step:(i+1)*step], preserve_index=False),
                f"{d}/f{i:03d}.parquet")

    def cfg(out, parts):
        return JoinConfig(left_dir=ld, right_dir=rd, out_dir=out,
                          key_col="key", band_lo_us=0, band_hi_us=300_000_000,
                          num_partitions=parts, files_per_epoch=1,
                          left_payload=["pid"], right_payload=["pid"],
                          how=how)

    ref_out = str(tmp_path / "ref")
    StreamJoinJob(cfg(ref_out, 4)).run(resume=False)
    out = str(tmp_path / "out")
    StreamJoinJob(cfg(out, 4)).run(resume=False, stop_after_epoch=2)
    res = rescale_join_checkpoint(out, 4, new_parts, key_col="key")
    assert res["old"] == 4 and res["new"] == new_parts
    StreamJoinJob(cfg(out, new_parts)).run(resume=True)

    def rows(d):
        df = read_joined(d).to_pandas()
        # `part` is hive-inferred from the sink layout — the one thing a
        # rescale legitimately changes
        df = df.drop(columns=[c for c in ("part",) if c in df]).astype("float64")
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(rows(out), rows(ref_out))


def test_pattern_rescale_preserves_matches(tmp_path):
    """CEP engine rescale via the generic keyed rescaler: stop mid-stream,
    re-route the 'cep' state 4 -> 6 by key hash, resume — matches equal an
    unbroken run's."""
    from core_ray.streaming import (
        PatternConfig,
        StreamPatternJob,
        read_matches,
        rescale_keyed_checkpoint,
    )

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 40, n).astype("int64"),
            "ts_us": np.sort(rng.integers(0, 3_600_000_000, n)).astype("int64"),
            "etype": rng.choice(["A", "B", "C", "D"], n),
            "event_id": np.arange(n, dtype="int64"),
        }
    )
    ind = str(tmp_path / "in")
    os.makedirs(ind)
    step = (n + 5) // 6
    for i in range(6):
        pq.write_table(pa.Table.from_pandas(df.iloc[i*step:(i+1)*step], preserve_index=False),
                       f"{ind}/f{i:03d}.parquet")

    def cfg(out, parts):
        return PatternConfig(in_dir=ind, out_dir=out, pattern=["A", "B", "C"],
                             within_us=120_000_000, num_partitions=parts,
                             files_per_epoch=1)

    ref = str(tmp_path / "ref")
    StreamPatternJob(cfg(ref, 4)).run(resume=False)
    out = str(tmp_path / "out")
    StreamPatternJob(cfg(out, 4)).run(resume=False, stop_after_epoch=2)
    res = rescale_keyed_checkpoint(out, 4, 6, snapshot_name="cep",
                                   key_col="key")
    assert res["old"] == 4 and res["new"] == 6
    StreamPatternJob(cfg(out, 6)).run(resume=True)

    def rows(d):
        m = read_matches(d).to_pandas()
        m = m.drop(columns=[c for c in ("part",) if c in m])
        return m.sort_values(list(m.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(rows(out), rows(ref))


def test_rescaled_latest_registers_fold_component_wise(tmp_path):
    """A rescale co-locates several donors' latest registers for one source
    on a single partition; restore must fold them with merge_latest
    semantics — the (ts, value) argmax and the Good-only (good_ts,
    good_value) argmax can come from DIFFERENT donor rows, so
    last-write-wins per skey silently regresses the Good register."""
    import ray

    from core_ray.streaming.sink import EpochSink
    from core_ray.streaming.state_actor import StreamPartitionActor

    out = str(tmp_path / "out")
    sink = EpochSink(out, 0)
    # donor B: (ts=80, Good, good_ts=80, good_value=9); donor A: (ts=100,
    # Bad, good_ts=3, good_value=1).  Snapshot order puts A last (the
    # rescale sorts by ws), so naive overwrite would keep good_ts=3.
    t = pa.table(
        {
            "kind": pa.array(["latest", "latest"]),
            "skey": pa.array(["web", "web"]),
            "ws": pa.array([80, 100], pa.int64()),
            "cnt": pa.array([9, 1], pa.int64()),
            "sum_n_tok": pa.array([80, 3], pa.int64()),
            "status": pa.array(["Good", "Bad"]),
            "good_value": pa.array([9, 1], pa.int64()),
            "st": pa.array([None, None], pa.int64()),
            "w": pa.array([None, None], pa.int64()),
        }
    ).replace_schema_metadata(
        {"max_ts": "100", "watermark": "0", "dedup_frontier": "100"}
    )
    sink.write_snapshot(5, "state", t)
    a = StreamPartitionActor.options(num_cpus=0).remote(
        0, out, 60_000_000, 2_000_000, 0
    )
    try:
        assert ray.get(a.load_snapshot.remote(5))
        reg = ray.get(a.flush_final.remote(6))["latest"]["web"]
        assert (reg["ts"], reg["value"], reg["status"]) == (100, 1, "Bad")
        assert (reg["good_ts"], reg["good_value"]) == (80, 9)
    finally:
        ray.kill(a)


def test_interrupted_rescale_refuses_new_target(rescale_dirs):
    """Re-running an interrupted rescale with a DIFFERENT target count must
    fail loudly: the first attempt may already have committed snapshots for
    partitions beyond the new target, which resume would then trust."""
    import json

    base, in_dir, _ = rescale_dirs
    out = str(base / "out_target_guard")
    StreamingJob(_cfg(in_dir, out, 4)).run(resume=False, stop_after_epoch=2)
    # forge an interrupted rescale: journal present, job.json untouched
    res = rescale_checkpoint(out, 6)
    assert res["new"] == 6
    jpath = f"{out}/manifests/rescale.json"
    with open(f"{out}/manifests/job.json") as f:
        shape = json.load(f)
    shape["num_partitions"] = 4  # roll back the commit point
    with open(f"{out}/manifests/job.json", "w") as f:
        json.dump(shape, f)
    with open(jpath, "w") as f:
        json.dump({"old_p": 4, "new_q": 6, "epoch": 2,
                   "meta": {"max_ts": "0", "watermark": "0",
                            "dedup_frontier": "0"}}, f)
    # backup file must exist for a resume; reuse none -> expect the guard
    with pytest.raises(ValueError, match="targets 6 partitions"):
        rescale_checkpoint(out, 3)
