"""Compaction crash windows and contiguity: orphan-output rollback,
committed-manifest roll-forward, middle-single-bin renames, vacuum's
two-snapshot retention."""

import glob
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from core_ray.ops.maintenance import optimize_sink, vacuum_sink
from core_ray.streaming.sink import EpochSink


def _mk_sink(base, sizes):
    """One partition with len(sizes) committed epochs; epoch e holds
    sizes[e] rows (so file sizes steer the bin planner)."""
    out = str(base / "out")
    sink = EpochSink(out, 0)
    for e, n in enumerate(sizes):
        t = pa.table({"v": pa.array(range(e * 1000, e * 1000 + n), pa.int64())})
        sink.commit_epoch(e, {"rows": t}, {"rows_emitted": n})
    return out


def _rows(out):
    files = sorted(glob.glob(f"{out}/part=0*/rows-*.parquet"))
    return pa.concat_tables([pq.read_table(f) for f in files])["v"].to_pylist()


def test_middle_single_bin_stays_contiguous(tmp_path):
    # sizes chosen so the middle epoch forms its own bin: it must be
    # RENAMED to a compact file, not skipped, or read order breaks
    out = _mk_sink(tmp_path, [100, 100, 30000, 100, 100])
    before = _rows(out)
    big = os.path.getsize(
        glob.glob(f"{out}/part=0000/rows-epoch-000002.parquet")[0]
    )
    optimize_sink(out, target_file_bytes=big - 1, parallel=False)
    assert _rows(out) == before  # same rows, same order
    names = sorted(os.listdir(f"{out}/part=0000"))
    dat = [n for n in names if n.endswith(".parquet") and not n.startswith("state-")]
    # everything before the frontier is compact-*; no epoch file sits
    # between two compacted ranges
    kinds = ["c" if "-compact-" in n else "e" for n in dat]
    assert "e" not in "".join(kinds).rstrip("e").replace("c", "")
    # idempotent
    optimize_sink(out, target_file_bytes=big - 1, parallel=False)
    assert _rows(out) == before


def test_orphan_compact_rolled_back(tmp_path):
    """Crash between the output rename and the manifest commit: the orphan
    output is removed on the next run (its sources are intact), and
    compaction completes cleanly."""
    out = _mk_sink(tmp_path, [100, 100, 100])
    before = _rows(out)
    pdir = f"{out}/part=0000"
    # plant the orphan: a compact file covering epochs 0-1 with NO manifest
    srcs = sorted(glob.glob(f"{pdir}/rows-epoch-00000[01].parquet"))
    t = pa.concat_tables([pq.read_table(p) for p in srcs])
    pq.write_table(t, f"{pdir}/rows-compact-000000-000001.parquet")
    # a glob reader would see duplicates right now; vacuum rolls it back
    removed = vacuum_sink(out)
    assert removed["orphan_compacts"] == 1
    assert _rows(out) == before
    # optimize also recovers + compacts normally
    pq.write_table(t, f"{pdir}/rows-compact-000000-000001.parquet")
    optimize_sink(out, target_file_bytes=1 << 30, parallel=False)
    assert _rows(out) == before


def test_committed_manifest_rolls_forward(tmp_path):
    """Crash between the manifest commit and source removal: the next run
    removes the surviving sources (no duplicate rows)."""
    out = _mk_sink(tmp_path, [100, 100])
    before = _rows(out)
    optimize_sink(out, target_file_bytes=1 << 30, parallel=False)
    assert _rows(out) == before
    pdir = f"{out}/part=0000"
    mdir = f"{out}/manifests/part=0000"
    man = [n for n in os.listdir(mdir) if n.startswith("compact-")][0]
    m = json.load(open(os.path.join(mdir, man)))
    # resurrect a source file (as if removal never ran)
    src = m["sources"][0]
    comp = pq.read_table(os.path.join(pdir, m["output"]))
    pq.write_table(comp.slice(0, 100), os.path.join(pdir, src))
    assert _rows(out) != before  # duplicates visible: the crash state
    optimize_sink(out, target_file_bytes=1 << 30, parallel=False)
    assert _rows(out) == before  # rolled forward


def test_vacuum_keeps_two_snapshots(tmp_path):
    out = _mk_sink(tmp_path, [10])
    sink = EpochSink(out, 0)
    for e in range(4):
        sink.write_snapshot(e, "agg", pa.table({"x": pa.array([e])}))
    vacuum_sink(out)
    left = sorted(glob.glob(f"{out}/part=0000/state-*.parquet"))
    assert [int(n[-14:-8]) for n in map(os.path.basename, left)] == [2, 3]
