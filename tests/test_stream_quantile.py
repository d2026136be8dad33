"""Streaming windowed-quantile registers: parity with a brute recompute,
kill-and-resume byte-identity, the job-shape guard, and ingest idempotency."""

import glob
import hashlib
import math
import os
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from core_ray.streaming import QuantileConfig, StreamQuantileJob, final_quantiles
from core_ray.synth import event_time_us, write_tokens_table

N_ROWS = 4_000
ROWS_PER_FILE = 1_000
WINDOW_US = 60_000_000


@pytest.fixture(scope="module")
def quant_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("squant")
    in_dir = str(base / "in")
    write_tokens_table(in_dir, N_ROWS, rows_per_file=ROWS_PER_FILE)
    return base, in_dir


def _brute(in_dir, qs=(500, 900, 990)):
    groups = defaultdict(list)
    for f in sorted(glob.glob(f"{in_dir}/*.parquet")):
        t = pq.read_table(f)
        idx = np.array([int(d[4:]) for d in t["doc_id"].to_pylist()])
        ws = (event_time_us(idx) // WINDOW_US) * WINDOW_US
        toks = t["tokens"].combine_chunks()
        offs = toks.offsets.to_numpy().astype(np.int64)
        vals = toks.values.to_numpy()
        for i, s in enumerate(t["source"].to_pylist()):
            groups[(s, int(ws[i]))].append(vals[offs[i]: offs[i + 1]])
    exp = []
    for (s, w), vs in sorted(groups.items()):
        arr = np.sort(np.concatenate(vs))
        n = len(arr)
        for q in qs:
            rank = max(1, math.ceil(q / 1000.0 * n))
            exp.append((s, w, q, int(arr[rank - 1])))
    return exp


def _got_tuples(df):
    return [
        (a, int(b), int(c), int(d))
        for a, b, c, d in zip(
            df["source"],
            df["window_start"].astype("datetime64[us]").astype("int64"),
            df["q_permille"], df["value"])
    ]


def _dir_hashes(out_dir):
    out = {}
    for f in sorted(glob.glob(f"{out_dir}/**/*.parquet", recursive=True)):
        rel = os.path.relpath(f, out_dir)
        if rel.split(os.sep)[-1].startswith("state-"):
            continue
        out[rel] = hashlib.sha256(open(f, "rb").read()).hexdigest()
    return out


def test_stream_quantiles_match_brute(quant_dirs):
    base, in_dir = quant_dirs
    out_dir = str(base / "out_full")
    cfg = QuantileConfig(input_dir=in_dir, out_dir=out_dir, num_partitions=4)
    StreamQuantileJob(cfg).run(resume=False)
    got = final_quantiles(out_dir, 4).to_pandas()
    assert _got_tuples(got) == _brute(in_dir)


def test_stream_quantiles_kill_resume_byte_identical(quant_dirs):
    base, in_dir = quant_dirs
    full_dir, resumed_dir = str(base / "out_ref"), str(base / "out_res")
    StreamQuantileJob(QuantileConfig(input_dir=in_dir, out_dir=full_dir,
                                     num_partitions=4)).run(resume=False)
    cfg = QuantileConfig(input_dir=in_dir, out_dir=resumed_dir,
                         num_partitions=4)
    StreamQuantileJob(cfg).run(resume=False, stop_after_epoch=1)  # crash
    StreamQuantileJob(cfg).run(resume=True)
    assert _dir_hashes(resumed_dir) == _dir_hashes(full_dir)


def test_stream_quantiles_resume_shape_guard(quant_dirs):
    base, in_dir = quant_dirs
    out_dir = str(base / "out_guard")
    cfg = QuantileConfig(input_dir=in_dir, out_dir=out_dir, num_partitions=4)
    StreamQuantileJob(cfg).run(resume=False, stop_after_epoch=0)
    bad = QuantileConfig(input_dir=in_dir, out_dir=out_dir, num_partitions=8)
    with pytest.raises(ValueError, match="shape changed"):
        StreamQuantileJob(bad).run(resume=True)


def test_quantile_actor_ingest_idempotent(tmp_path):
    from core_ray.streaming.quantile import QuantilePartitionActor

    a = QuantilePartitionActor.remote(0, str(tmp_path / "out"), (500,))
    part = pa.table({
        "source": ["web", "web"],
        "window_start": pa.array([0, 0], pa.int64()),
        "token": pa.array([5, 9], pa.int64()),
        "cnt": pa.array([3, 1], pa.int64()),
    })
    ray.get(a.ingest.remote(0, 7, part))
    ray.get(a.ingest.remote(0, 7, part))  # redelivery: must not double-count
    ray.get(a.end_epoch.remote(0))
    got = final_quantiles(str(tmp_path / "out"), 1).to_pandas()
    # histogram {5:3, 9:1}: p50 rank = ceil(0.5*4) = 2 -> value 5
    assert got["value"].tolist() == [5]
    ray.kill(a)
