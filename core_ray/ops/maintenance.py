"""Table maintenance for the epoch-sink layout: OPTIMIZE (small-file
compaction) and VACUUM (orphan/stale-file removal).

Reference analog: ``pipelines/utilities/spark/delta_table_optimize.py`` and
``delta_table_vacuum.py`` (Delta OPTIMIZE/VACUUM).  This engine's sink is
epoch-granular Parquet with JSON commit manifests
(``streaming/sink.py:1-13``), so the honest equivalents are:

- :func:`optimize_sink` — bin-pack each partition's committed per-epoch
  files into ~``target_file_bytes`` compacted files.  A streaming run
  produces one small file per (partition, epoch); at 100 TB that is
  millions of files whose open/footer costs dominate reads.  Compaction
  preserves the sink's deterministic lexicographic read order by only ever
  compacting a contiguous PREFIX of each stream's epoch files
  (``<stream>-compact-...`` sorts before ``<stream>-epoch-...``), and is
  crash-safe the same way commits are: tmp-write + atomic rename + a
  compaction manifest, with source files removed only after the rename.
  Partitions compact in parallel as Ray tasks.
- :func:`vacuum_sink` — remove orphaned ``*.tmp`` files from crashed
  writes and state snapshots older than the newest (resume needs only the
  newest snapshot; ``gc_snapshots`` does this inline, vacuum catches
  leftovers from kills).

Table *creation* needs no utility here: the sink materializes its own
partitioned layout on first commit (``streaming/sink.py:28-31``).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray


def _plan_bins(paths: list[str], target_bytes: int) -> list[list[str]]:
    """Greedy contiguous bin-packing; a bin with a single file is skipped
    (already big enough or nothing to merge)."""
    bins, cur, cur_sz = [], [], 0
    for p in paths:
        sz = os.path.getsize(p)
        if cur and cur_sz + sz > target_bytes:
            bins.append(cur)
            cur, cur_sz = [], 0
        cur.append(p)
        cur_sz += sz
    if cur:
        bins.append(cur)
    return [b for b in bins if len(b) > 1]


def _compact_stream_dir(data_dir: str, manifest_dir: str, target_bytes: int) -> dict:
    """Compact one partition directory, one stream at a time."""
    names = sorted(os.listdir(data_dir))
    streams: dict[str, list[str]] = {}
    for n in names:
        if n.endswith(".parquet") and "-epoch-" in n and not n.startswith("state-"):
            streams.setdefault(n.split("-epoch-")[0], []).append(n)
    stats = {"files_before": 0, "files_after": 0, "bytes": 0}
    for stream, files in streams.items():
        # only the contiguous PREFIX of epoch files may compact: a compacted
        # middle range would break the lexicographic read order
        prefix: list[str] = []
        compacted = [n for n in names if n.startswith(f"{stream}-compact-")]
        next_ep = max((int(n[:-8].rsplit("-", 1)[1]) for n in compacted), default=-1) + 1
        for n in files:
            ep = int(n[:-8].rsplit("-", 1)[1])
            if ep != next_ep:
                break
            prefix.append(n)
            next_ep += 1
        for bin_names in _plan_bins(
            [os.path.join(data_dir, n) for n in prefix], target_bytes
        ):
            e0 = int(bin_names[0][:-8].rsplit("-", 1)[1])
            e1 = int(bin_names[-1][:-8].rsplit("-", 1)[1])
            out = os.path.join(data_dir, f"{stream}-compact-{e0:06d}-{e1:06d}.parquet")
            table = pa.concat_tables([pq.read_table(p) for p in bin_names])
            tmp = out + ".tmp"
            pq.write_table(
                table, tmp, compression="zstd", compression_level=1, use_dictionary=False
            )
            os.replace(tmp, out)  # commit point
            cm = os.path.join(manifest_dir, f"compact-{stream}-{e0:06d}-{e1:06d}.json")
            with open(cm + ".tmp", "w") as f:
                json.dump(
                    {
                        "stream": stream,
                        "epochs": [e0, e1],
                        "sources": [os.path.basename(p) for p in bin_names],
                        "output": os.path.basename(out),
                        "rows": len(table),
                    },
                    f,
                    sort_keys=True,
                )
                f.flush()
                os.fsync(f.fileno())
            os.replace(cm + ".tmp", cm)
            for p in bin_names:  # safe: output is durable and named-ordered
                os.remove(p)
            stats["files_before"] += len(bin_names)
            stats["files_after"] += 1
            stats["bytes"] += os.path.getsize(out)
    return stats


_compact_partition = ray.remote(num_cpus=1)(_compact_stream_dir)


def optimize_sink(
    out_dir: str, target_file_bytes: int = 256 << 20, parallel: bool = True
) -> dict:
    """Compact every ``part=*`` directory under ``out_dir``; returns summed
    stats.  Idempotent: already-compacted prefixes are skipped; a crash
    between rename and source removal leaves duplicates of compacted bytes
    on disk but never corrupts reads that go through the compaction
    manifests — re-running finishes the cleanup."""
    parts = sorted(
        d for d in os.listdir(out_dir)
        if d.startswith("part=") and os.path.isdir(os.path.join(out_dir, d))
    )
    jobs = []
    for d in parts:
        data_dir = os.path.join(out_dir, d)
        manifest_dir = os.path.join(out_dir, "manifests", d)
        os.makedirs(manifest_dir, exist_ok=True)
        # finish any interrupted compaction: remove sources whose compaction
        # manifest exists but which survived a crash before cleanup
        for name in os.listdir(manifest_dir):
            if name.startswith("compact-") and name.endswith(".json"):
                with open(os.path.join(manifest_dir, name)) as f:
                    m = json.load(f)
                if os.path.exists(os.path.join(data_dir, m["output"])):
                    for src in m["sources"]:
                        sp = os.path.join(data_dir, src)
                        if os.path.exists(sp):
                            os.remove(sp)
        if parallel:
            jobs.append(_compact_partition.remote(data_dir, manifest_dir, target_file_bytes))
        else:
            jobs.append(_compact_stream_dir(data_dir, manifest_dir, target_file_bytes))
    results = ray.get(jobs) if parallel else jobs
    total = {"files_before": 0, "files_after": 0, "bytes": 0}
    for r in results:
        for k in total:
            total[k] += r[k]
    return total


def vacuum_sink(out_dir: str) -> dict:
    """Remove crash leftovers: ``*.tmp`` orphans everywhere and, per
    partition, every state snapshot older than that partition's newest."""
    removed = {"tmp": 0, "snapshots": 0}
    for root, _, files in os.walk(out_dir):
        for n in files:
            if n.endswith(".tmp"):
                os.remove(os.path.join(root, n))
                removed["tmp"] += 1
    for d in os.listdir(out_dir):
        pdir = os.path.join(out_dir, d)
        if not (d.startswith("part=") and os.path.isdir(pdir)):
            continue
        snaps: dict[str, list[tuple[int, str]]] = {}
        for n in os.listdir(pdir):
            if n.startswith("state-") and n.endswith(".parquet"):
                name = n[6:].split("-epoch-")[0]
                snaps.setdefault(name, []).append((int(n[-14:-8]), n))
        for name, lst in snaps.items():
            for _, n in sorted(lst)[:-1]:
                os.remove(os.path.join(pdir, n))
                removed["snapshots"] += 1
    return removed
