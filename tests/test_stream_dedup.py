"""Streaming exact-dedup engine: survivor parity with the batch min-id rule,
kill-and-resume byte-identity, job-shape guard, and key construction."""

import glob
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from core_ray.streaming import DedupConfig, StreamDedupJob, read_survivors
from core_ray.streaming.dedup import token_keys
from core_ray.synth import make_chunk, write_tokens_table

N_ROWS = 4_000
ROWS_PER_FILE = 1_000


@pytest.fixture(scope="module")
def dedup_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("sdedup")
    in_dir = str(base / "in")
    write_tokens_table(in_dir, N_ROWS, rows_per_file=ROWS_PER_FILE)
    # plant: 40 full copies of early rows (drop) + 40 prefix plagiarists
    # (survive) + one intra-epoch duplicate pair (min id wins)
    baset = pq.read_table(f"{in_dir}/part-00000.parquet")
    tok = baset["tokens"].combine_chunks()
    off = tok.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = tok.values.to_numpy(zero_copy_only=False)
    filler = make_chunk(50_000, 80)
    ftok = filler["tokens"].combine_chunks()
    foff = ftok.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    fvals = ftok.values.to_numpy(zero_copy_only=False)
    rows, ids = [], []
    for j in range(80):
        v = (j * 7) % ROWS_PER_FILE
        vrow = vals[off[v]:off[v + 1]]
        rows.append(vrow if j % 2 == 0 else
                    np.concatenate([vrow[:8], fvals[foff[j]:foff[j + 1]]]))
        ids.append(f"doc-{60_000 + j:08d}")
    dup = make_chunk(90_000, 1)["tokens"].combine_chunks()
    dvals = dup.values.to_numpy(zero_copy_only=False)
    rows += [dvals, dvals]
    ids += ["doc-00070000", "doc-00070001"]
    flat = np.concatenate(rows).astype(np.int32)
    offs = np.zeros(len(rows) + 1, dtype=np.int32)
    offs[1:] = np.cumsum([len(r) for r in rows]).astype(np.int32)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "tokens": pa.ListArray.from_arrays(pa.array(offs), pa.array(flat)),
                "n_tok": pa.array(np.diff(offs).astype(np.int32)),
                "source": pa.array(["copy"] * len(ids)),
            },
            schema=baset.schema,
        ),
        f"{in_dir}/z-extra.parquet",
    )
    return base, in_dir


def _batch_oracle(in_dir):
    """min doc_id per identical token array, computed directly."""
    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(f"{in_dir}/*.parquet"))]
    )
    seen = {}
    tok = t["tokens"].combine_chunks()
    off = tok.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = tok.values.to_numpy(zero_copy_only=False)
    for i, d in enumerate(t["doc_id"].to_pylist()):
        key = vals[off[i]:off[i + 1]].tobytes()
        if key not in seen or d < seen[key]:
            seen[key] = d
    return sorted(seen.values())


def _dir_hashes(out_dir):
    out = {}
    for f in sorted(glob.glob(f"{out_dir}/**/*.parquet", recursive=True)):
        rel = os.path.relpath(f, out_dir)
        if rel.split(os.sep)[-1].startswith("state-"):
            continue
        out[rel] = hashlib.sha256(open(f, "rb").read()).hexdigest()
    return out


def test_stream_dedup_matches_batch_rule(dedup_dirs):
    base, in_dir = dedup_dirs
    out_dir = str(base / "out_full")
    cfg = DedupConfig(input_dir=in_dir, out_dir=out_dir, num_partitions=4)
    res = StreamDedupJob(cfg).run(resume=False)
    surv = read_survivors(out_dir).to_pandas()
    expected = _batch_oracle(in_dir)
    assert sorted(surv["doc_id"]) == expected
    assert res["totals"]["survivors"] == len(expected)
    assert res["totals"]["dupes_dropped"] == (N_ROWS + 82) - len(expected)
    s = set(surv["doc_id"])
    # planted full copies lose, plagiarists survive, intra-epoch min wins
    assert f"doc-{60_000:08d}" not in s and f"doc-{60_001:08d}" in s
    assert "doc-00070000" in s and "doc-00070001" not in s


def test_stream_dedup_kill_and_resume_byte_identical(dedup_dirs):
    base, in_dir = dedup_dirs
    full_dir, resumed_dir = str(base / "out_ref"), str(base / "out_resume")
    StreamDedupJob(DedupConfig(input_dir=in_dir, out_dir=full_dir,
                               num_partitions=4)).run(resume=False)
    cfg = DedupConfig(input_dir=in_dir, out_dir=resumed_dir, num_partitions=4)
    res1 = StreamDedupJob(cfg).run(resume=False, stop_after_epoch=1)
    assert res1["last_run"] == 1
    StreamDedupJob(cfg).run(resume=True)
    assert _dir_hashes(full_dir) == _dir_hashes(resumed_dir)


def test_stream_dedup_resume_shape_guard(dedup_dirs):
    base, in_dir = dedup_dirs
    out_dir = str(base / "out_guard")
    cfg = DedupConfig(input_dir=in_dir, out_dir=out_dir, num_partitions=4)
    StreamDedupJob(cfg).run(resume=False, stop_after_epoch=0)
    bad = DedupConfig(input_dir=in_dir, out_dir=out_dir, num_partitions=8)
    with pytest.raises(ValueError, match="job shape changed"):
        StreamDedupJob(bad).run(resume=True)


def test_token_keys_exact_and_order_sensitive():
    tokens = pa.array(
        [[1, 2, 3], [1, 2, 3], [3, 2, 1], [1, 2], [7]],
        type=pa.list_(pa.int32()),
    )
    keys, h = token_keys(tokens)
    kb = keys.to_pylist()
    assert kb[0] == kb[1] and h[0] == h[1]  # identical sequences
    assert kb[0] != kb[2] and h[0] != h[2]  # order matters
    assert kb[0] != kb[3]  # prefix is a different key
    # sliced list arrays (non-zero starting offset) produce the same keys
    keys2, h2 = token_keys(tokens.slice(2, 3))
    assert keys2.to_pylist() == kb[2:]
    assert (h2 == h[2:]).all()
