"""Streaming CEP: batch-op equivalence, crash/resume byte identity,
bounded state, late-row drops, trailing-match flush."""

import glob
import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

PATTERN = ["A", "B", "C"]
WITHIN = 120_000_000  # 2 min per step


def _write_stream(d, df, n_files):
    os.makedirs(d, exist_ok=True)
    df = df.sort_values("ts_us", kind="mergesort").reset_index(drop=True)
    step = (len(df) + n_files - 1) // n_files
    for i in range(n_files):
        part = df.iloc[i * step : (i + 1) * step]
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            os.path.join(d, f"f{i:03d}.parquet"),
        )


def _mk_stream(n=6000, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "key": rng.integers(0, 40, n).astype("int64"),
            "ts_us": np.sort(rng.integers(0, 3_600_000_000, n)).astype("int64"),
            "etype": rng.choice(["A", "B", "C", "D"], n),
            "event_id": np.arange(n, dtype="int64"),
        }
    )


def _cfg(ind, out, **kw):
    from core_ray.streaming import PatternConfig

    kw.setdefault("within_us", WITHIN)
    kw.setdefault("num_partitions", 4)
    return PatternConfig(
        in_dir=ind,
        out_dir=out,
        pattern=PATTERN,
        files_per_epoch=1,
        **kw,
    )


def _batch_expect(df):
    from core_ray.functions import match_pattern

    ds = ray.data.from_pandas(df).repartition(3)
    got = match_pattern(
        ds, key="key", order_col="ts_us", type_col="etype",
        pattern=PATTERN, within_us=WITHIN, tiebreak="event_id",
    ).to_pandas()
    return got.sort_values(list(got.columns), kind="mergesort").reset_index(drop=True)


def _read_out(out):
    from core_ray.streaming import read_matches

    df = read_matches(out).to_pandas()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _sink_hash(out_dir):
    h = hashlib.sha256()
    for f in sorted(glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True)):
        if "state-" in os.path.basename(f):
            continue
        h.update(os.path.relpath(f, out_dir).encode())
        h.update(open(f, "rb").read())
    return h.hexdigest()


def test_stream_matches_batch_op(tmp_path):
    from core_ray.streaming import StreamPatternJob

    df = _mk_stream()
    ind, out = str(tmp_path / "in"), str(tmp_path / "out")
    _write_stream(ind, df, 6)
    res = StreamPatternJob(_cfg(ind, out)).run(resume=False)
    got = _read_out(out)
    expect = _batch_expect(df)[got.columns.tolist()]
    expect = expect.sort_values(list(expect.columns), kind="mergesort").reset_index(
        drop=True
    )
    assert len(expect) > 0  # the scenario actually exercises matching
    pd.testing.assert_frame_equal(got, expect)
    assert res["totals"]["rows"] == len(expect)
    assert res["totals"]["late"] == 0


def test_stream_crash_resume_byte_identical(tmp_path):
    from core_ray.streaming import StreamPatternJob

    df = _mk_stream(seed=9)
    ind = str(tmp_path / "in")
    _write_stream(ind, df, 6)
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    StreamPatternJob(_cfg(ind, out_a)).run(resume=False)
    StreamPatternJob(_cfg(ind, out_b)).run(resume=False, stop_after_epoch=2)
    StreamPatternJob(_cfg(ind, out_b)).run(resume=True)
    assert _sink_hash(out_a) == _sink_hash(out_b)


def test_stream_trailing_match_flushes(tmp_path):
    """A match whose last step is at the very end of the stream (never below
    the conservative watermark) still emits via the terminal flush barrier."""
    from core_ray.streaming import StreamPatternJob

    df = pd.DataFrame(
        {
            "key": np.array([7, 7, 7], dtype="int64"),
            "ts_us": np.array([1_000_000, 2_000_000, 3_000_000], dtype="int64"),
            "etype": ["A", "B", "C"],
            "event_id": np.arange(3, dtype="int64"),
        }
    )
    ind, out = str(tmp_path / "in"), str(tmp_path / "out")
    _write_stream(ind, df, 1)
    res = StreamPatternJob(_cfg(ind, out, lateness_s=3600)).run(resume=False)
    got = _read_out(out)
    assert res["totals"]["rows"] == 1
    assert got["event_id_1"].tolist() == [0]
    assert got["event_id_3"].tolist() == [2]


def test_stream_state_bounded_by_horizon(tmp_path):
    """Per-actor retained state stays within the (m-1)*within horizon —
    stream length does not grow state."""
    from core_ray.streaming import StreamPatternJob

    df = _mk_stream(n=12000, seed=2)
    ind, out = str(tmp_path / "in"), str(tmp_path / "out")
    _write_stream(ind, df, 8)
    StreamPatternJob(_cfg(ind, out)).run(resume=False)
    state_rows = 0
    for mdir in glob.glob(os.path.join(out, "manifests", "part=*")):
        # second-to-last manifest: the flush epoch evicts everything
        mf = sorted(os.listdir(mdir))[-2]
        c = json.load(open(os.path.join(mdir, mf)))["counters"]
        state_rows += c["state_rows"]
    # horizon is 4 min of a 60-min stream; loose 50% bound on 12k rows
    assert 0 < state_rows < 6000


def test_stream_drops_late_rows(tmp_path):
    """A stale row (far older than the frontier minus lateness) is dropped
    and counted; it neither completes nor breaks a match."""
    from core_ray.streaming import StreamPatternJob

    f1 = pd.DataFrame(
        {
            "key": np.array([1, 1, 1], dtype="int64"),
            "ts_us": np.array([1_000_000_000, 1_000_060_000_000, 1_000_120_000_000],
                              dtype="int64"),
            "etype": ["A", "B", "C"],
            "event_id": np.array([0, 1, 2], dtype="int64"),
        }
    )
    # stale D that would break A-B-C contiguity if it were admitted
    f2 = pd.DataFrame(
        {
            "key": np.array([1, 1], dtype="int64"),
            "ts_us": np.array([1_000_070_000_000, 5_000], dtype="int64"),
            "etype": ["D", "D"],
            "event_id": np.array([3, 4], dtype="int64"),
        }
    )
    ind, out = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(ind)
    pq.write_table(pa.Table.from_pandas(f1, preserve_index=False), f"{ind}/f0.parquet")
    pq.write_table(pa.Table.from_pandas(f2, preserve_index=False), f"{ind}/f1.parquet")
    # lateness 100 s: event 3 (50 s behind the frontier) is admitted and
    # breaks the not-yet-final match; event 4 (stale) is dropped + counted
    cfg = _cfg(ind, out, lateness_s=100, within_us=3_600_000_000, num_partitions=1)
    res = StreamPatternJob(cfg).run(resume=False)
    assert res["totals"]["late"] == 1  # only the ts=5_000 row
    got = _read_out(out)
    # the in-time D (event 3) DID break the contiguity: no match emitted
    assert len(got) == 0


def test_stream_mid_barrier_crash_resume(tmp_path):
    """A crash DURING the barrier leaves partitions at different committed
    epochs; resume loads min(committed) — so every partition must retain its
    previous-epoch snapshot (gc keeps epoch-1 AND epoch)."""
    import shutil

    from core_ray.streaming import StreamPatternJob

    df = _mk_stream(seed=17)
    ind = str(tmp_path / "in")
    _write_stream(ind, df, 6)
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    StreamPatternJob(_cfg(ind, out_a)).run(resume=False)
    StreamPatternJob(_cfg(ind, out_b)).run(resume=False, stop_after_epoch=2)
    # simulate partition 0 crashing before its epoch-2 commit: drop its
    # epoch-2 manifest, data files and snapshot
    p0 = os.path.join(out_b, "part=0000")
    os.remove(os.path.join(out_b, "manifests", "part=0000", "epoch-000002.json"))
    for n in os.listdir(p0):
        if "epoch-000002" in n:
            os.remove(os.path.join(p0, n))
    StreamPatternJob(_cfg(ind, out_b)).run(resume=True)
    assert _sink_hash(out_a) == _sink_hash(out_b)
