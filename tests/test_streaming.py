"""Streaming-engine correctness: exactly-once, token-array equality vs the
deterministic input, window-aggregate parity with a batch oracle, and
kill-and-resume byte-identity."""

import glob
import hashlib
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from core_ray.synth import (
    event_time_us,
    make_chunk,
    row_source,
    row_status,
    write_tokens_table,
)
from core_ray.streaming import StreamConfig, StreamingJob
from core_ray.streaming.job import T0_US

N_ROWS = 12_000
ROWS_PER_FILE = 3_000


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    in_dir = str(base / "in")
    write_tokens_table(in_dir, N_ROWS, rows_per_file=ROWS_PER_FILE)
    return base, in_dir


def _run(in_dir, out_dir, **kw):
    cfg = StreamConfig(input_dir=in_dir, out_dir=str(out_dir), num_partitions=4, window_s=60)
    return StreamingJob(cfg).run(**kw)


def _read_rows(out_dir) -> pa.Table:
    files = sorted(glob.glob(f"{out_dir}/part=0*/rows-*.parquet"))
    return pa.concat_tables([pq.read_table(f) for f in files])


def _dir_hashes(out_dir) -> dict[str, str]:
    out = {}
    for f in sorted(glob.glob(f"{out_dir}/**/*.parquet", recursive=True)):
        rel = os.path.relpath(f, out_dir)
        if rel.split(os.sep)[-1].startswith("state-"):
            continue  # snapshots are GC'd at different points; not output
        out[rel] = hashlib.sha256(open(f, "rb").read()).hexdigest()
    return out


def test_streaming_end_to_end(stream_dirs):
    base, in_dir = stream_dirs
    out_dir = base / "out_full"
    res = _run(in_dir, out_dir)
    assert res["totals"]["rows"] == N_ROWS
    assert res["totals"]["dupes"] == 0

    # exactly-once: every doc exactly once
    rows = _read_rows(out_dir)
    idx = np.sort(rows["doc_idx"].to_numpy())
    assert len(idx) == N_ROWS
    assert (idx == np.arange(N_ROWS)).all()

    # token-array equality vs the deterministic input (regenerated)
    rows_sorted = rows.sort_by([("doc_idx", "ascending")]).combine_chunks()
    expected = make_chunk(0, N_ROWS)
    assert rows_sorted["tokens"].combine_chunks().equals(
        expected["tokens"].combine_chunks()
    )
    assert rows_sorted["n_tok"].to_numpy().tolist() == expected["n_tok"].to_numpy().tolist()

    # windowed aggregate parity vs a batch oracle
    i = np.arange(N_ROWS)
    ts = event_time_us(i)
    src = row_source(i)
    ws = T0_US + ((ts - T0_US) // 60_000_000) * 60_000_000
    import pandas as pd

    oracle = (
        pd.DataFrame({"source": src, "ws": ws, "n": make_chunk(0, N_ROWS)["n_tok"].to_numpy()})
        .groupby(["source", "ws"])
        .agg(cnt=("n", "size"), sum_n_tok=("n", "sum"))
        .reset_index()
        .sort_values(["source", "ws"])
        .reset_index(drop=True)
    )
    agg_files = sorted(glob.glob(f"{out_dir}/part=9999/agg-*.parquet"))
    agg = (
        pa.concat_tables([pq.read_table(f) for f in agg_files])
        .sort_by([("source", "ascending"), ("window_start", "ascending")])
        .to_pandas()
    )
    assert len(agg) == len(oracle)
    assert (agg["source"].values == oracle["source"].values).all()
    assert (agg["window_start"].astype("int64").values == oracle["ws"].values).all()
    assert (agg["cnt"].values == oracle["cnt"].values).all()
    assert (agg["sum_n_tok"].values == oracle["sum_n_tok"].values).all()

    # latest register = argmax event time per source (tie-break by n_tok)
    latest = pq.read_table(glob.glob(f"{out_dir}/part=9999/latest-*.parquet")[0]).to_pandas()
    df = pd.DataFrame({"source": src, "ts": ts, "v": expected["n_tok"].to_numpy(),
                       "good": row_status(i) != "Bad"})
    exp_latest = df.sort_values(["ts", "v"]).groupby("source").last()
    for _, r in latest.iterrows():
        e = exp_latest.loc[r["source"]]
        assert r["EventTime"].value // 1000 == e["ts"]  # ns -> us
        assert r["Value"] == e["v"]


def test_kill_and_resume_byte_identical(stream_dirs):
    base, in_dir = stream_dirs
    full_dir, resumed_dir = base / "out_ref", base / "out_resume"
    _run(in_dir, full_dir)

    # first run "crashes" after epoch 1 (of 4)
    res1 = _run(in_dir, resumed_dir, stop_after_epoch=1)
    assert res1.get("stopped_after") == 1
    # resume picks up at the first uncommitted epoch and finishes
    res2 = _run(in_dir, resumed_dir, resume=True)
    assert res2["epochs"] == 4

    h_full, h_res = _dir_hashes(full_dir), _dir_hashes(resumed_dir)
    assert h_full == h_res, (
        "resumed output differs from unbroken run: "
        f"{set(h_full) ^ set(h_res)} or content mismatch"
    )


@pytest.mark.parametrize("kind,kw", [
    ("session", {"window_kind": "session", "gap_s": 1}),
    ("sliding", {"window_kind": "sliding", "window_s": 60, "slide_s": 30}),
])
def test_kill_and_resume_byte_identical_window_kinds(stream_dirs, kind, kw):
    """Exactly-once must hold for the session (driver-side gap-merged state
    snapshotted before the commit manifest) and sliding (row replicated to
    two windows) kinds too, not just tumbling."""
    base, in_dir = stream_dirs
    full_dir = base / f"out_ref_{kind}"
    resumed_dir = base / f"out_resume_{kind}"

    def run(out_dir, **extra):
        cfg = StreamConfig(input_dir=in_dir, out_dir=str(out_dir),
                           num_partitions=4, sink_payload_rows=False, **kw)
        return StreamingJob(cfg).run(**extra)

    run(full_dir)
    res1 = run(resumed_dir, stop_after_epoch=1)
    assert res1.get("stopped_after") == 1
    run(resumed_dir, resume=True)
    assert _dir_hashes(full_dir) == _dir_hashes(resumed_dir)


def test_resume_with_changed_job_shape_refuses(stream_dirs):
    """Key routing is hash % num_partitions: resuming with a different
    partition count would misroute keys against the snapshotted state and
    silently break exactly-once — the job must fail loudly instead."""
    base, in_dir = stream_dirs
    out_dir = base / "out_shape_guard"
    cfg = StreamConfig(input_dir=in_dir, out_dir=str(out_dir),
                       num_partitions=4, window_s=60)
    StreamingJob(cfg).run(stop_after_epoch=1)
    bad = StreamConfig(input_dir=in_dir, out_dir=str(out_dir),
                       num_partitions=8, window_s=60)
    with pytest.raises(ValueError, match="num_partitions"):
        StreamingJob(bad).run(resume=True)
    # unchanged shape resumes fine
    StreamingJob(cfg).run(resume=True)


def test_actor_late_and_duplicate_handling(stream_dirs):
    """Unit-level: duplicates are dropped, late rows land in the late side
    output, retried ingest batches are deduped."""
    import ray

    from core_ray.streaming.state_actor import StreamPartitionActor

    base, _ = stream_dirs
    out = str(base / "out_actor")
    a = StreamPartitionActor.options(num_cpus=0).remote(0, out, 60_000_000, 2_000_000, T0_US)

    def mk(idx):
        idx = np.asarray(idx, dtype=np.int64)
        t = make_chunk(0, int(idx.max()) + 1).take(pa.array(idx))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "tokens": t["tokens"],
                "n_tok": t["n_tok"],
                "source": t["source"],
                "doc_idx": pa.array(idx),
                "ts_us": pa.array(event_time_us(idx)),
                "Status": pa.array(row_status(idx)),
            }
        )

    # epoch 0: rows 0..99 except 5; batch retried twice -> counted once
    t = mk(np.array([i for i in range(100) if i != 5]))
    ray.get(a.ingest.remote(0, 0, t))
    ray.get(a.ingest.remote(0, 0, t))  # retry redelivery
    r0 = ray.get(a.end_epoch.remote(0, event_time_us(np.array([99]))[0] - 2_000_000))
    assert r0["counters"]["rows_emitted"] == 99
    assert r0["counters"]["dupes_dropped"] == 0  # same batch id, not a dupe row

    # epoch 1: cross-epoch dupe within the lateness horizon (98),
    # fresh-but-late row (5, older than the horizon so the dedup register has
    # forgotten it - the documented bounded-state contract), fresh rows
    t1 = mk(np.array([98, 5, 200, 201]))
    ray.get(a.ingest.remote(1, 1, t1))
    r1 = ray.get(a.end_epoch.remote(1, event_time_us(np.array([201]))[0] - 2_000_000))
    assert r1["counters"]["dupes_dropped"] == 1  # row 98
    assert r1["counters"]["late_rows"] == 1  # row 5: fresh, below prev watermark
    assert r1["counters"]["rows_emitted"] == 3  # 5 (late-but-kept), 200, 201

    # epoch 2: INTRA-epoch duplicate across two distinct batches -> one row
    ray.get(a.ingest.remote(2, 21, mk(np.array([300, 301]))))
    ray.get(a.ingest.remote(2, 22, mk(np.array([301, 302]))))
    r2 = ray.get(a.end_epoch.remote(2, event_time_us(np.array([302]))[0] - 2_000_000))
    assert r2["counters"]["dupes_dropped"] == 1  # second 301
    assert r2["counters"]["rows_emitted"] == 3  # 300, 301, 302
    ray.kill(a)


def _expected_sessions(n_rows, gap_us):
    i = np.arange(n_rows)
    ts = event_time_us(i)
    src = row_source(i)
    ntok = make_chunk(0, n_rows)["n_tok"].to_numpy()
    out = {}
    for s in np.unique(src):
        m = src == s
        t = ts[m]
        v = ntok[m]
        order = np.argsort(t)
        t, v = t[order], v[order]
        from core_ray.windows import session_ids

        sid = session_ids(t, gap_us)
        sess = []
        for k in np.unique(sid):
            sm = sid == k
            sess.append((int(t[sm].min()), int(t[sm].max()), int(sm.sum()), int(v[sm].sum())))
        out[str(s)] = sess
    return out


def test_streaming_session_windows(stream_dirs):
    from core_ray.streaming import StreamConfig, StreamingJob

    base, in_dir = stream_dirs
    out_dir = base / "out_sessions"
    cfg = StreamConfig(
        input_dir=in_dir, out_dir=str(out_dir), num_partitions=4,
        window_kind="session", gap_s=1,
    )
    StreamingJob(cfg).run(resume=False)
    files = sorted(glob.glob(f"{out_dir}/part=9999/sessions-*.parquet"))
    got = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    got = got.sort_values(["source", "session_start"]).reset_index(drop=True)

    exp = _expected_sessions(N_ROWS, 1_000_000)
    exp_rows = [
        (src, s, e, c, v) for src, frags in exp.items() for (s, e, c, v) in frags
    ]
    exp_df = (
        pd.DataFrame(exp_rows, columns=["source", "s", "e", "cnt", "sum_n_tok"])
        .sort_values(["source", "s"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp_df)
    assert (got["cnt"].values == exp_df["cnt"].values).all()
    assert (got["sum_n_tok"].values == exp_df["sum_n_tok"].values).all()
    assert (got["session_start"].astype("int64").values == exp_df["s"].values).all()
    assert (got["session_end"].astype("int64").values == exp_df["e"].values).all()


def test_streaming_sliding_windows(stream_dirs):
    from core_ray.streaming import StreamConfig, StreamingJob
    from core_ray.streaming.job import T0_US
    from core_ray.windows import sliding_window_starts

    base, in_dir = stream_dirs
    out_dir = base / "out_sliding"
    cfg = StreamConfig(
        input_dir=in_dir, out_dir=str(out_dir), num_partitions=4,
        window_kind="sliding", window_s=60, slide_s=30,
    )
    StreamingJob(cfg).run(resume=False)
    files = sorted(glob.glob(f"{out_dir}/part=9999/agg-*.parquet"))
    got = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    got = got.sort_values(["source", "window_start"]).reset_index(drop=True)

    i = np.arange(N_ROWS)
    ts = event_time_us(i)
    src = row_source(i)
    ntok = make_chunk(0, N_ROWS)["n_tok"].to_numpy()
    ridx, ws = sliding_window_starts(ts, T0_US, 60_000_000, 30_000_000)
    exp = (
        pd.DataFrame({"source": src[ridx], "ws": ws, "n": ntok[ridx]})
        .groupby(["source", "ws"])
        .agg(cnt=("n", "size"), sum_n_tok=("n", "sum"))
        .reset_index()
        .sort_values(["source", "ws"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["cnt"].values == exp["cnt"].values).all()
    assert (got["window_start"].astype("int64").values == exp["ws"].values).all()


def test_streaming_agg_minmax_and_skew_spread(stream_dirs):
    """The emitted window aggregate carries avg/min/max; the hot 'web' source
    (55% of rows) must spread across ALL partition actors (salted routing)."""
    import json

    from core_ray.streaming import StreamConfig, StreamingJob

    base, in_dir = stream_dirs
    out_dir = base / "out_minmax"
    cfg = StreamConfig(input_dir=in_dir, out_dir=str(out_dir), num_partitions=4, window_s=60)
    StreamingJob(cfg).run(resume=False)

    files = sorted(glob.glob(f"{out_dir}/part=9999/agg-*.parquet"))
    agg = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    i = np.arange(N_ROWS)
    ts = event_time_us(i)
    src = row_source(i)
    ntok = make_chunk(0, N_ROWS)["n_tok"].to_numpy()
    ws = T0_US + ((ts - T0_US) // 60_000_000) * 60_000_000
    exp = (
        pd.DataFrame({"source": src, "ws": ws, "n": ntok})
        .groupby(["source", "ws"])
        .agg(mn=("n", "min"), mx=("n", "max"), avg=("n", "mean"))
        .reset_index()
    )
    m = agg.merge(exp, left_on=["source", agg["window_start"].astype("int64")],
                  right_on=["source", "ws"])
    assert (m["min_n_tok"] == m["mn"]).all()
    assert (m["max_n_tok"] == m["mx"]).all()
    assert np.allclose(m["avg_n_tok"], m["avg"])

    # skew: per-partition rows_in within 2x of each other despite 55% hot key
    rows_in = []
    for p in range(4):
        mans = sorted(glob.glob(f"{out_dir}/manifests/part=000{p}/epoch-*.json"))
        rows_in.append(sum(json.load(open(f))["counters"]["rows_in"] for f in mans))
    assert min(rows_in) > 0 and max(rows_in) / min(rows_in) < 1.5, rows_in


def test_token_stats_mode_sums_every_token(stream_dirs):
    """token_stats=True (the scaling-leg mode): per-window sum_tok_values
    must equal a direct batch computation over the SAME input."""
    import numpy as np
    import pandas as pd

    from core_ray.streaming.job import T0_US
    from core_ray.synth import event_time_us, make_chunk

    base, in_dir = stream_dirs
    out_dir = base / "out_token_stats"
    cfg = StreamConfig(
        input_dir=in_dir,
        out_dir=str(out_dir),
        num_partitions=4,
        window_s=60,
        files_per_epoch=2,
        sink_payload_rows=False,
        token_stats=True,
    )
    StreamingJob(cfg).run(resume=False)

    files = sorted(glob.glob(f"{out_dir}/part=9999/agg-*.parquet"))
    agg = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    assert "sum_tok_values" in agg.columns

    # batch truth from the deterministic generator
    chunk = make_chunk(0, N_ROWS).to_pandas()
    idx = np.arange(N_ROWS)
    ts = event_time_us(idx)
    ws = T0_US + ((ts - T0_US) // 60_000_000) * 60_000_000
    tok_sums = np.array([np.asarray(t, dtype=np.int64).sum() for t in chunk["tokens"]])
    truth = (
        pd.DataFrame({"source": chunk["source"], "ws": ws, "tok": tok_sums,
                      "n_tok": chunk["n_tok"].astype(np.int64)})
        .groupby(["source", "ws"], as_index=False)
        .agg(sum_tok_values=("tok", "sum"), sum_n_tok=("n_tok", "sum"), cnt=("tok", "size"))
    )
    got = agg.copy()
    got["ws"] = got["window_start"].astype("datetime64[us]").astype(np.int64)
    merged = truth.merge(
        got[["source", "ws", "sum_tok_values", "sum_n_tok", "cnt"]],
        on=["source", "ws"],
        suffixes=("_true", "_got"),
        how="outer",
        indicator=True,
    )
    assert (merged["_merge"] == "both").all()
    assert (merged["sum_tok_values_true"] == merged["sum_tok_values_got"]).all()
    assert (merged["sum_n_tok_true"] == merged["sum_n_tok_got"]).all()
    assert (merged["cnt_true"] == merged["cnt_got"]).all()


def test_conservative_watermark_over_silent_partitions():
    """The watermark contract (ADVICE r1): a silent partition pins the
    watermark at the floor; it only advances once EVERY partition has seen
    data, and then by the slowest partition."""
    from core_ray.streaming.job import WATERMARK_FLOOR_US, conservative_watermark

    lat = 2_000_000
    assert conservative_watermark([-1, -1], lat) == WATERMARK_FLOOR_US
    assert conservative_watermark([10_000_000, -1], lat) == WATERMARK_FLOOR_US
    assert conservative_watermark([10_000_000, 7_000_000], lat) == 5_000_000
    assert conservative_watermark([], lat) == WATERMARK_FLOOR_US


def test_silent_partition_holds_windows_then_catches_up(stream_dirs):
    """End-to-end shape of the contract: with one silent partition the
    floor watermark closes no windows; once the partition receives (old!)
    data those rows are NOT late and the stream emits correctly."""
    import ray

    from core_ray.streaming.job import WATERMARK_FLOOR_US
    from core_ray.streaming.state_actor import StreamPartitionActor

    base, _ = stream_dirs
    out = str(base / "out_silent")
    mk_actor = lambda p: StreamPartitionActor.options(num_cpus=0).remote(
        p, out, 60_000_000, 2_000_000, T0_US
    )
    a, b = mk_actor(10), mk_actor(11)

    idx = np.arange(50, dtype=np.int64)
    t = make_chunk(0, 50)
    tbl = pa.table(
        {
            "doc_id": t["doc_id"],
            "tokens": t["tokens"],
            "n_tok": t["n_tok"],
            "source": t["source"],
            "doc_idx": pa.array(idx),
            "ts_us": pa.array(event_time_us(idx)),
            "Status": pa.array(row_status(idx)),
        }
    )
    # epoch 0: only actor a gets data -> driver watermark is the floor
    ray.get(a.ingest.remote(0, 0, tbl))
    maxes = ray.get([x.epoch_max_ts.remote(0) for x in (a, b)])
    from core_ray.streaming.job import conservative_watermark

    wm0 = conservative_watermark(maxes, 2_000_000)
    assert wm0 == WATERMARK_FLOOR_US
    r0 = ray.get([x.end_epoch.remote(0, wm0) for x in (a, b)])
    assert all(len(r["closed"]["ws"]) == 0 for r in r0)  # no window closes
    assert all(r["counters"]["late_rows"] == 0 for r in r0)

    # epoch 1: b finally receives OLDER rows than a's max — must not be late
    old = pa.table({c: tbl[c].take(pa.array(np.arange(5))) for c in tbl.column_names})
    ray.get(b.ingest.remote(1, 1, old))
    maxes = ray.get([x.epoch_max_ts.remote(1) for x in (a, b)])
    wm1 = conservative_watermark(maxes, 2_000_000)
    assert wm1 > WATERMARK_FLOOR_US
    r1 = ray.get([x.end_epoch.remote(1, wm1) for x in (a, b)])
    assert sum(r["counters"]["late_rows"] for r in r1) == 0
    ray.kill(a)
    ray.kill(b)


def test_dedup_horizon_reemit_contract(stream_dirs):
    """Pin the BOUNDED-DEDUP CONTRACT (state_actor docstring): a duplicate
    redelivered WITHIN the lateness horizon is dropped; the same row
    redelivered with an event time already beyond (watermark - lateness)
    finds its register evicted and re-emits."""
    import ray

    from core_ray.streaming.state_actor import StreamPartitionActor

    base, _ = stream_dirs
    out = str(base / "out_horizon")
    a = StreamPartitionActor.options(num_cpus=0).remote(0, out, 60_000_000, 2_000_000, T0_US)

    def mk(idx):
        idx = np.asarray(idx, dtype=np.int64)
        t = make_chunk(0, int(idx.max()) + 1).take(pa.array(idx))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "tokens": t["tokens"],
                "n_tok": t["n_tok"],
                "source": t["source"],
                "doc_idx": pa.array(idx),
                "ts_us": pa.array(event_time_us(idx)),
                "Status": pa.array(row_status(idx)),
            }
        )

    wm_of = lambda i: event_time_us(np.array([i]))[0] - 2_000_000

    ray.get(a.ingest.remote(0, 0, mk(np.arange(10))))
    r0 = ray.get(a.end_epoch.remote(0, wm_of(9)))
    assert r0["counters"]["rows_emitted"] == 10

    # within horizon: row 9 redelivered -> dropped
    ray.get(a.ingest.remote(1, 1, mk(np.array([9, 10]))))
    r1 = ray.get(a.end_epoch.remote(1, wm_of(10)))
    assert r1["counters"]["dupes_dropped"] == 1

    # advance the watermark far past row 3's event time, evicting its register
    ray.get(a.ingest.remote(2, 2, mk(np.array([5000]))))
    r2 = ray.get(a.end_epoch.remote(2, wm_of(5000)))
    assert r2["counters"]["rows_emitted"] == 1

    # beyond horizon: row 3 redelivered -> register gone -> re-emits (late)
    ray.get(a.ingest.remote(3, 3, mk(np.array([3]))))
    r3 = ray.get(a.end_epoch.remote(3, wm_of(5000)))
    assert r3["counters"]["dupes_dropped"] == 0
    assert r3["counters"]["rows_emitted"] == 1
    assert r3["counters"]["late_rows"] == 1
    ray.kill(a)


def test_optimize_and_vacuum_sink(stream_dirs):
    """Compaction must preserve the read result exactly (same rows, same
    order) while shrinking file count; vacuum removes tmp orphans and stale
    snapshots; both are idempotent."""
    from core_ray.ops.maintenance import optimize_sink, vacuum_sink

    base, in_dir = stream_dirs
    out_dir = str(base / "out_compact")
    _run(in_dir, out_dir)

    def canon(t):
        # dictionary-encoded columns re-unify per compacted file; compare
        # logical values in row order, not chunk layouts
        return t.to_pandas().reset_index(drop=True)

    before = canon(_read_rows(out_dir))
    n_before = len(glob.glob(f"{out_dir}/part=0*/rows-*.parquet"))

    stats = optimize_sink(out_dir, target_file_bytes=1 << 30)
    after = canon(_read_rows(out_dir))
    n_after = len(glob.glob(f"{out_dir}/part=0*/rows-*.parquet"))
    pd.testing.assert_frame_equal(after, before)  # rows AND order preserved
    assert n_after < n_before
    assert stats["files_before"] > stats["files_after"]

    # idempotent: second run finds nothing contiguous left to merge
    stats2 = optimize_sink(out_dir, target_file_bytes=1 << 30)
    assert stats2["files_before"] == 0
    pd.testing.assert_frame_equal(canon(_read_rows(out_dir)), before)

    # vacuum: plant a tmp orphan and a stale snapshot
    pdir = sorted(glob.glob(f"{out_dir}/part=0*"))[0]
    open(os.path.join(pdir, "rows-epoch-999999.parquet.tmp"), "w").close()
    snaps = sorted(glob.glob(f"{pdir}/state-*.parquet"))
    if snaps:
        stale = snaps[0].replace("-epoch-", "-epoch-").replace(
            snaps[0][-14:-8], "000000"
        )
        shutil.copy(snaps[0], stale)
    removed = vacuum_sink(out_dir)
    assert removed["tmp"] >= 1
    assert not glob.glob(f"{out_dir}/**/*.tmp", recursive=True)
    pd.testing.assert_frame_equal(canon(_read_rows(out_dir)), before)


def test_duplicate_leading_key_across_blocks_not_conflated(tmp_path):
    """Two consume blocks of ONE epoch whose routed slices share the same
    leading key must not be conflated as a Ray-task retry: the second
    block's distinct rows survive (batch ids carry a block tag), while the
    re-sent row itself is dropped once by the KEYED dedup register."""
    import pyarrow.parquet as pq_

    from core_ray.synth import make_chunk

    ind = tmp_path / "in"
    os.makedirs(ind)
    a = make_chunk(100, 100)
    b = pa.concat_tables([make_chunk(100, 1), make_chunk(300, 100)])
    pq_.write_table(a, str(ind / "f0.parquet"))
    pq_.write_table(b, str(ind / "f1.parquet"))
    out = str(tmp_path / "out")
    cfg = StreamConfig(
        input_dir=str(ind), out_dir=out, num_partitions=1,
        files_per_epoch=2, epoch_blocks=2, window_s=60,
    )
    res = StreamingJob(cfg).run(resume=False)
    got = _read_rows(out)
    ids = sorted(got["doc_idx"].to_pylist())
    assert ids == sorted(set(range(100, 200)) | set(range(300, 400)))
    assert res["totals"]["dupes"] == 1  # the re-sent doc-100, keyed dedup


def test_gc_snapshots_seven_digit_epoch(tmp_path):
    """Epoch numbers past %06d must parse from the marker, not a fixed
    slice — a misparse would delete the LIVE snapshot."""
    from core_ray.streaming.sink import EpochSink

    sink = EpochSink(str(tmp_path / "o"), 0)
    sink.write_snapshot(1_000_000, "state", pa.table({"x": pa.array([1])}))
    sink.write_snapshot(999_999, "state", pa.table({"x": pa.array([0])}))
    sink.gc_snapshots(1_000_000)
    assert sink.read_snapshot(1_000_000, "state") is not None
    assert sink.read_snapshot(999_999, "state") is None


def test_stream_static_dim_join(stream_dirs, tmp_path):
    """Stream-static INNER join (StreamConfig.dim_path): unmatched sources
    are dropped task-side before routing, matched windows report
    sum_weighted = SUM(n_tok * weight), and a mid-stream crash + resume is
    byte-identical to the unbroken run (the join is stateless, so
    exactly-once must be unaffected)."""
    import pyarrow.parquet as pq_

    base, in_dir = stream_dirs
    dim_path = str(tmp_path / "dim.parquet")
    # cover 4 of 5 sources: 'forums' rows must vanish from the aggregates
    weights = {"web": 3, "books": 7, "code": 2, "wiki": 5}
    pq_.write_table(
        pa.table(
            {"source": list(weights), "weight": list(weights.values())}
        ),
        dim_path,
    )

    def run(out, **kw):
        cfg = StreamConfig(
            input_dir=in_dir, out_dir=str(out), num_partitions=4,
            window_s=60, dim_path=dim_path, token_stats=True,
            sink_payload_rows=False,
        )
        return StreamingJob(cfg).run(**kw)

    out_full = tmp_path / "out_full"
    run(out_full, resume=False)
    out_resumed = tmp_path / "out_resumed"
    run(out_resumed, resume=False, stop_after_epoch=1)  # crash mid-stream
    run(out_resumed, resume=True)
    assert _dir_hashes(out_full) == _dir_hashes(out_resumed)

    files = sorted(glob.glob(f"{out_full}/part=9999/agg-*.parquet"))
    got = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()

    # batch oracle over the same input
    import numpy as np
    import pandas as pd

    from core_ray.synth import event_time_us, make_chunk

    src = make_chunk(0, N_ROWS).to_pandas()
    src["ev"] = event_time_us(np.arange(N_ROWS))
    src["ws"] = (src["ev"] // 60_000_000) * 60_000_000
    src["tsum"] = src["tokens"].map(lambda t: int(np.sum(t)))
    src["weight"] = src["source"].map(weights)
    assert src["weight"].isna().any()  # fixture really exercises the drop
    j = src.dropna(subset=["weight"])
    exp = (
        j.assign(wt=j["n_tok"] * j["weight"].astype(np.int64))
        .groupby(["source", "ws"], as_index=False)
        .agg(cnt=("n_tok", "size"), sum_n_tok=("n_tok", "sum"),
             sum_tok_values=("tsum", "sum"), sum_weighted=("wt", "sum"))
        .sort_values(["source", "ws"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["source", "window_start"]).reset_index(drop=True)
    assert "forums" not in set(got["source"])
    assert got["window_start"].astype("int64").tolist() == exp["ws"].tolist()
    for c in ("cnt", "sum_n_tok", "sum_tok_values", "sum_weighted"):
        assert got[c].astype("int64").tolist() == exp[c].tolist(), c


def test_update_mode_converges_to_append_windows(stream_dirs):
    """The LAST update row of every window equals the window's append-mode
    (closed) aggregate — running totals converge to the final ones; resume
    replays the same update stream byte-for-byte."""
    base, in_dir = stream_dirs
    out_u, out_a = base / "out_upd", base / "out_upd_ref"

    def run(out, **kw):
        cfg = StreamConfig(input_dir=in_dir, out_dir=str(out),
                           num_partitions=4, window_s=60,
                           sink_payload_rows=False, **kw)
        return StreamingJob(cfg).run(resume=kw.pop("resume", False))

    run(out_a)
    cfg_u = StreamConfig(input_dir=in_dir, out_dir=str(out_u),
                         num_partitions=4, window_s=60,
                         sink_payload_rows=False, output_mode="update")
    StreamingJob(cfg_u).run(resume=False)

    import pandas as pd

    upd = []
    for f in sorted(glob.glob(f"{out_u}/part=9999/updates-*.parquet")):
        ep = int(f.rsplit("epoch-", 1)[1].split(".")[0])
        df = pq.read_table(f).to_pandas()
        df["epoch"] = ep
        upd.append(df)
    upd = pd.concat(upd, ignore_index=True)
    last = upd.sort_values("epoch").groupby(
        ["source", "window_start"], as_index=False).last()

    agg = pd.concat(
        [pq.read_table(f).to_pandas()
         for f in sorted(glob.glob(f"{out_a}/part=9999/agg-*.parquet"))],
        ignore_index=True,
    )
    m = agg.merge(last, on=["source", "window_start"], suffixes=("", "_u"))
    assert len(m) == len(agg)
    for c in ("cnt", "sum_n_tok", "min_n_tok", "max_n_tok"):
        assert (m[c].to_numpy() == m[f"{c}_u"].to_numpy()).all()

    # crash/resume byte identity for the update stream too
    out_b = base / "out_upd_resume"
    cfg_b = StreamConfig(input_dir=in_dir, out_dir=str(out_b),
                         num_partitions=4, window_s=60,
                         sink_payload_rows=False, output_mode="update")
    StreamingJob(cfg_b).run(resume=False, stop_after_epoch=3)
    StreamingJob(cfg_b).run(resume=True)
    assert _dir_hashes(out_u) == _dir_hashes(out_b)


def test_update_mode_refuses_session_windows(stream_dirs):
    base, in_dir = stream_dirs
    cfg = StreamConfig(input_dir=in_dir, out_dir=str(base / "out_upd_sess"),
                       num_partitions=2, window_kind="session",
                       output_mode="update")
    with pytest.raises(Exception, match="update output mode"):
        StreamingJob(cfg).run(resume=False)


def test_spawn_actors_placement_spread(monkeypatch, tmp_path):
    """StreamConfig.placement wires a Ray scheduling strategy onto the
    partition-actor pool (multi-node: SPREAD the state stores across nodes);
    default stays None so the single-node path adds no scheduler hint."""
    from core_ray.streaming import job as jobmod

    captured = []
    real = jobmod.StreamPartitionActor

    class FakeActorClass:
        @staticmethod
        def options(**kw):
            captured.append(kw)
            return real.options(num_cpus=0)

    monkeypatch.setattr(jobmod, "StreamPartitionActor", FakeActorClass)
    cfg = jobmod.StreamConfig(
        input_dir=str(tmp_path), out_dir=str(tmp_path / "out"),
        num_partitions=3, placement="SPREAD",
    )
    actors = jobmod.spawn_actors(cfg)
    try:
        assert len(captured) == 3
        assert all(kw.get("scheduling_strategy") == "SPREAD" for kw in captured)
        captured.clear()
        cfg2 = jobmod.StreamConfig(
            input_dir=str(tmp_path), out_dir=str(tmp_path / "out2"),
            num_partitions=2,
        )
        actors += jobmod.spawn_actors(cfg2)
        assert all("scheduling_strategy" not in kw for kw in captured)
    finally:
        import ray

        for a in actors:
            ray.kill(a)
