"""Streaming token-frequency registers: top-k parity with a brute recount,
kill-and-resume byte-identity, idempotent re-run, ingest idempotency, and
the job-shape guard."""

import glob
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from core_ray.streaming import FreqConfig, StreamFreqJob, final_topk
from core_ray.synth import write_tokens_table

N_ROWS = 4_000
ROWS_PER_FILE = 1_000


@pytest.fixture(scope="module")
def freq_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("sfreq")
    in_dir = str(base / "in")
    write_tokens_table(in_dir, N_ROWS, rows_per_file=ROWS_PER_FILE)
    return base, in_dir


def _brute_topk(in_dir, k):
    counts = np.zeros(1, dtype=np.int64)
    for f in sorted(glob.glob(f"{in_dir}/*.parquet")):
        flat = (
            pq.read_table(f, columns=["tokens"])["tokens"]
            .combine_chunks()
            .flatten()
            .to_numpy(zero_copy_only=False)
        )
        if len(flat) == 0:
            continue
        bc = np.bincount(flat)
        if len(bc) > len(counts):
            counts = np.concatenate([counts, np.zeros(len(bc) - len(counts), np.int64)])
        counts[: len(bc)] += bc
    nz = np.flatnonzero(counts)
    order = np.lexsort((nz, -counts[nz]))[:k]
    return list(zip(nz[order].tolist(), counts[nz][order].tolist()))


def _dir_hashes(out_dir):
    out = {}
    for f in sorted(glob.glob(f"{out_dir}/**/*.parquet", recursive=True)):
        rel = os.path.relpath(f, out_dir)
        if rel.split(os.sep)[-1].startswith("state-"):
            continue
        out[rel] = hashlib.sha256(open(f, "rb").read()).hexdigest()
    return out


def test_stream_freq_matches_brute_recount(freq_dirs):
    base, in_dir = freq_dirs
    out_dir = str(base / "out_full")
    cfg = FreqConfig(input_dir=in_dir, out_dir=out_dir, num_partitions=4, k=50)
    res = StreamFreqJob(cfg).run(resume=False)
    got = final_topk(out_dir, 4, k=50).to_pandas()
    assert list(zip(got["token"], got["cnt"])) == _brute_topk(in_dir, 50)
    # lineage: every token counted exactly once
    total = sum(
        len(pq.read_table(f, columns=["tokens"])["tokens"].combine_chunks().flatten())
        for f in glob.glob(f"{in_dir}/*.parquet")
    )
    assert res["totals"]["tokens_in"] == total


def test_stream_freq_kill_and_resume_byte_identical(freq_dirs):
    base, in_dir = freq_dirs
    full_dir, resumed_dir = str(base / "out_ref"), str(base / "out_resume")
    StreamFreqJob(FreqConfig(input_dir=in_dir, out_dir=full_dir,
                             num_partitions=4, k=50)).run(resume=False)
    cfg = FreqConfig(input_dir=in_dir, out_dir=resumed_dir, num_partitions=4, k=50)
    res1 = StreamFreqJob(cfg).run(resume=False, stop_after_epoch=1)
    assert res1["last_run"] == 1
    StreamFreqJob(cfg).run(resume=True)
    assert _dir_hashes(full_dir) == _dir_hashes(resumed_dir)
    # idempotent re-run: everything committed, outputs untouched
    before = _dir_hashes(resumed_dir)
    StreamFreqJob(cfg).run(resume=True)
    assert _dir_hashes(resumed_dir) == before


def test_stream_freq_resume_shape_guard(freq_dirs):
    base, in_dir = freq_dirs
    out_dir = str(base / "out_guard")
    cfg = FreqConfig(input_dir=in_dir, out_dir=out_dir, num_partitions=4, k=50)
    StreamFreqJob(cfg).run(resume=False, stop_after_epoch=0)
    bad = FreqConfig(input_dir=in_dir, out_dir=out_dir, num_partitions=8, k=50)
    with pytest.raises(ValueError, match="job shape changed"):
        StreamFreqJob(bad).run(resume=True)


def test_freq_actor_ingest_idempotent(tmp_path):
    """Task-retry redelivery of the same (epoch, batch) must not double-count."""
    from core_ray.streaming.freq import FreqPartitionActor

    a = FreqPartitionActor.remote(0, str(tmp_path / "o"), 10)
    t = pa.table({"token": pa.array([4, 8], pa.int64()),
                  "cnt": pa.array([3, 5], pa.int64())})
    ray.get(a.ingest.remote(0, 1, t))
    ray.get(a.ingest.remote(0, 1, t))  # redelivery
    c = ray.get(a.end_epoch.remote(0))
    assert c["tokens_in"] == 8
    ray.kill(a)
