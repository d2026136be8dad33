"""Exactly-once Parquet sink: temp-write + atomic rename + epoch manifests.

Mirrors the reference's idempotence contract (at-least-once delivery +
idempotent keyed merges + checkpoint, ``pcdm_to_delta.py:336-376``) with an
explicit commit protocol instead of Delta merges:

- every (partition, epoch, stream) output is ONE deterministic file name;
- data is written to ``<name>.tmp`` then ``os.replace``d (atomic on POSIX);
- a partition's epoch commit is the manifest file
  ``manifests/part=<p>/epoch-<e>.json`` (row/token counters inside = the
  per-partition lineage log);
- replaying an epoch whose manifest exists is a no-op (resume support).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


class EpochSink:
    def __init__(self, out_dir: str, partition_id: int):
        self.out_dir = out_dir
        self.part = partition_id
        self.data_dir = os.path.join(out_dir, f"part={partition_id:04d}")
        self.manifest_dir = os.path.join(out_dir, "manifests", f"part={partition_id:04d}")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- commit log ---------------------------------------------------------

    def _manifest_path(self, epoch: int) -> str:
        return os.path.join(self.manifest_dir, f"epoch-{epoch:06d}.json")

    def committed(self, epoch: int) -> bool:
        return os.path.exists(self._manifest_path(epoch))

    def last_committed_epoch(self) -> int:
        """Highest committed epoch, or -1."""
        best = -1
        for name in os.listdir(self.manifest_dir):
            if name.startswith("epoch-") and name.endswith(".json"):
                best = max(best, int(name[6:-5]))
        return best

    def read_manifest(self, epoch: int) -> dict:
        with open(self._manifest_path(epoch)) as f:
            return json.load(f)

    # -- data ---------------------------------------------------------------

    def _write_atomic(self, table: pa.Table, path: str) -> None:
        tmp = path + ".tmp"
        # use_dictionary=False: dictionary-encoding high-cardinality token
        # ints is ~39x slower to encode for zero size win (measured 12.9s vs
        # 0.33s on a 70MB list<int32> table); zstd-1 keeps storage bandwidth
        # reasonable at scale without the snappy+dict encode cliff.
        pq.write_table(
            table, tmp, compression="zstd", compression_level=1, use_dictionary=False
        )
        os.replace(tmp, path)

    def commit_epoch(self, epoch: int, streams: dict[str, pa.Table], counters: dict) -> dict:
        """Write each named output stream for this epoch, then atomically
        commit the manifest. Tables must already be deterministically sorted.
        Idempotent: committed epochs are skipped."""
        if self.committed(epoch):
            return self.read_manifest(epoch)
        files = {}
        for name, table in streams.items():
            if table is None or len(table) == 0:
                continue
            fname = f"{name}-epoch-{epoch:06d}.parquet"
            self._write_atomic(table, os.path.join(self.data_dir, fname))
            files[name] = {"file": fname, "rows": len(table)}
        manifest = {
            "partition": self.part,
            "epoch": epoch,
            "files": files,
            "counters": counters,
        }
        mtmp = self._manifest_path(epoch) + ".tmp"
        with open(mtmp, "w") as f:
            json.dump(manifest, f, sort_keys=True, default=int)  # np ints welcome
            f.flush()
            os.fsync(f.fileno())
        os.replace(mtmp, self._manifest_path(epoch))
        return manifest

    # -- state snapshots ----------------------------------------------------

    def snapshot_path(self, epoch: int, name: str) -> str:
        return os.path.join(self.data_dir, f"state-{name}-epoch-{epoch:06d}.parquet")

    def write_snapshot(self, epoch: int, name: str, table: pa.Table) -> None:
        self._write_atomic(table, self.snapshot_path(epoch, name))

    def read_snapshot(self, epoch: int, name: str) -> pa.Table | None:
        path = self.snapshot_path(epoch, name)
        return pq.read_table(path) if os.path.exists(path) else None

    def gc_snapshots(self, keep_epoch: int) -> None:
        """Drop state snapshots older than ``keep_epoch`` (bounded state on
        disk; the newest snapshot is all resume needs)."""
        for name in os.listdir(self.data_dir):
            if name.startswith("state-") and name.endswith(".parquet"):
                # parse from the tail, not a fixed slice: %06d grows past
                # six digits and a fixed [-14:-8] would misread epoch 1e6+
                ep = int(name[:-8].rsplit("-", 1)[1])
                if ep < keep_epoch:
                    os.remove(os.path.join(self.data_dir, name))


def atomic_write_json(path: str, obj: dict) -> None:
    """tmp + fsync + atomic rename (the manifest commit discipline for any
    small JSON the checkpoint protocol persists)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, sort_keys=True, default=int)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def guard_job_shape(out_dir: str, shape: dict, resume: bool) -> None:
    """Persist the job shape on a fresh run; REFUSE a resume whose config
    disagrees — resuming with e.g. a different partition count or routing
    seed would misroute keys against the snapshotted state and break
    exactly-once silently, which is far worse than failing loudly.  Shared
    by every streaming engine."""
    path = os.path.join(out_dir, "manifests", "job.json")
    # normalize through JSON first: a tuple-valued config field must compare
    # equal to its list round-trip from the persisted file
    shape = json.loads(json.dumps(shape, sort_keys=True, default=int))
    if resume and os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        diff = {k: (prev.get(k), shape[k]) for k in shape
                if prev.get(k) != shape[k]}
        if diff:
            raise ValueError(
                "resume: job shape changed since the checkpointed run "
                f"(field: (was, now)): {diff} — start a fresh out_dir "
                "or restore the original config"
            )
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    atomic_write_json(path, shape)


def manifest_data_files(out_dir: str, stream: str | None = None) -> list[str]:
    """Every COMMITTED data file across partitions, resolved through the
    epoch manifests only.  Tolerates torn or leftover ``*.json.tmp``
    manifests from a crashed commit (a listdir-based reader would either
    double-count a replayed epoch's files or crash on truncated JSON).
    ``stream`` filters to one named output stream."""
    import glob

    files = []
    for mdir in sorted(glob.glob(os.path.join(out_dir, "manifests", "part=*"))):
        part_dir = os.path.join(out_dir, os.path.basename(mdir))
        for mf in sorted(os.listdir(mdir)):
            if not (mf.startswith("epoch-") and mf.endswith(".json")):
                continue
            with open(os.path.join(mdir, mf)) as f:
                man = json.load(f)
            for name, entry in man.get("files", {}).items():
                if stream is None or name == stream:
                    files.append(os.path.join(part_dir, entry["file"]))
    return files
