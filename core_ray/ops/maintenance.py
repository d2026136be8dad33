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
  writes and state snapshots older than the two newest (mid-barrier resume
  may need the previous epoch's snapshot; ``gc_snapshots(epoch - 1)`` keeps
  the same pair inline, vacuum catches leftovers from kills).

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
    """Greedy contiguous bin-packing.  ALL bins are returned, in order —
    skipping a middle bin would leave an epoch file between two compacted
    ranges, and ``<stream>-compact-`` sorts before ``<stream>-epoch-``, so
    any gap reorders reads.  Single-file bins are handled by the caller
    with a rename (no rewrite); only the TAIL bin may be deferred (future
    epochs may still join it)."""
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
    return bins


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
        bins = _plan_bins([os.path.join(data_dir, n) for n in prefix], target_bytes)
        # every bin compacts (a rewrite, or a hard-link rename for a lone
        # already-big MIDDLE file — skipping it would leave an epoch file
        # between two compacted ranges, and compact- sorts before epoch-,
        # reordering reads).  Only a single-file FINAL bin is deferred: it
        # is the frontier and future epochs may still merge into it.
        if bins and len(bins[-1]) == 1:
            bins = bins[:-1]
        for bin_names in bins:
            e0 = int(bin_names[0][:-8].rsplit("-", 1)[1])
            e1 = int(bin_names[-1][:-8].rsplit("-", 1)[1])
            out = os.path.join(data_dir, f"{stream}-compact-{e0:06d}-{e1:06d}.parquet")
            if len(bin_names) == 1:
                # lone file: hard-link to the compact name (no rewrite); the
                # source survives until the manifest commits, so recovery
                # rules below stay uniform
                os.link(bin_names[0], out)
                rows = None
            else:
                table = pa.concat_tables([pq.read_table(p) for p in bin_names])
                rows = len(table)
                tmp = out + ".tmp"
                pq.write_table(
                    table, tmp, compression="zstd", compression_level=1,
                    use_dictionary=False,
                )
                os.replace(tmp, out)
            # the MANIFEST is the commit point: an output without a manifest
            # is rolled back on the next run (sources are still intact);
            # sources are removed only after the manifest is durable
            cm = os.path.join(manifest_dir, f"compact-{stream}-{e0:06d}-{e1:06d}.json")
            with open(cm + ".tmp", "w") as f:
                json.dump(
                    {
                        "stream": stream,
                        "epochs": [e0, e1],
                        "sources": [os.path.basename(p) for p in bin_names],
                        "output": os.path.basename(out),
                        "rows": rows,
                    },
                    f,
                    sort_keys=True,
                )
                f.flush()
                os.fsync(f.fileno())
            os.replace(cm + ".tmp", cm)
            for p in bin_names:  # safe: the manifest is durable
                if os.path.abspath(p) != os.path.abspath(out):
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
    stats.  Idempotent and crash-safe with the MANIFEST as the commit
    point: an output file whose manifest never landed is rolled back on the
    next run (its sources are intact by protocol); a committed manifest
    whose sources survived a crash is rolled forward (sources removed).
    Re-running always converges to the compacted state with no duplicate
    rows visible."""
    parts = sorted(
        d for d in os.listdir(out_dir)
        if d.startswith("part=") and os.path.isdir(os.path.join(out_dir, d))
    )
    jobs = []
    for d in parts:
        data_dir = os.path.join(out_dir, d)
        manifest_dir = os.path.join(out_dir, "manifests", d)
        os.makedirs(manifest_dir, exist_ok=True)
        # crash recovery, two windows:
        # (a) output renamed but manifest missing -> ROLL BACK the orphan
        #     output (its sources are intact by protocol: sources are only
        #     removed after the manifest commits);
        # (b) manifest exists -> roll FORWARD: remove surviving sources.
        committed_outputs = set()
        for name in os.listdir(manifest_dir):
            if name.startswith("compact-") and name.endswith(".json"):
                with open(os.path.join(manifest_dir, name)) as f:
                    m = json.load(f)
                committed_outputs.add(m["output"])
                if os.path.exists(os.path.join(data_dir, m["output"])):
                    for src in m["sources"]:
                        sp = os.path.join(data_dir, src)
                        if sp != os.path.join(data_dir, m["output"]) and os.path.exists(sp):
                            os.remove(sp)
        for name in os.listdir(data_dir):
            if "-compact-" in name and name.endswith(".parquet") \
                    and name not in committed_outputs:
                os.remove(os.path.join(data_dir, name))
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
    partition, state snapshots older than that partition's TWO newest —
    matching the actors' own ``gc_snapshots(epoch - 1)`` policy: after a
    mid-barrier crash, resume loads min(committed) across partitions, which
    is one epoch behind the partitions that already committed."""
    removed = {"tmp": 0, "snapshots": 0, "orphan_compacts": 0}
    for root, _, files in os.walk(out_dir):
        for n in files:
            if n.endswith(".tmp"):
                os.remove(os.path.join(root, n))
                removed["tmp"] += 1
    # roll back compaction outputs whose manifest never landed (the crash
    # window between the output rename and the manifest commit): their
    # sources are intact, so the orphan is the duplicate copy
    for d in os.listdir(out_dir):
        pdir = os.path.join(out_dir, d)
        mdir = os.path.join(out_dir, "manifests", d)
        if not (d.startswith("part=") and os.path.isdir(pdir)):
            continue
        committed = set()
        if os.path.isdir(mdir):
            for n in os.listdir(mdir):
                if n.startswith("compact-") and n.endswith(".json"):
                    with open(os.path.join(mdir, n)) as f:
                        committed.add(json.load(f)["output"])
        for n in os.listdir(pdir):
            if "-compact-" in n and n.endswith(".parquet") and n not in committed:
                os.remove(os.path.join(pdir, n))
                removed["orphan_compacts"] += 1
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
            for _, n in sorted(lst)[:-2]:
                os.remove(os.path.join(pdir, n))
                removed["snapshots"] += 1
    return removed
