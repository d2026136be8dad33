"""Offline checkpoint RESCALING: resume a streaming job with a different
partition count (Flink-savepoint-style), without replaying the stream.

Spark structured streaming pins ``spark.sql.shuffle.partitions`` for the
lifetime of a stateful query; Flink rescales savepoints by re-hashing key
groups.  This module is the Flink-shaped arm for this engine: it rewrites
the per-partition state snapshots of a checkpointed
:class:`~core_ray.streaming.job.StreamingJob` from P to Q partitions so the
job resumes with a different actor-pool width.

Why this is semantically safe, state kind by kind (snapshot layout in
``state_actor.StreamPartitionActor._snapshot_table``):

- ``seen`` rows (the exactly-once dedup registers, keyed by ``doc_idx``)
  MUST be co-located with future duplicates, which route by
  ``hash(route_seed, doc_idx) % Q`` — so they are re-routed with exactly
  that function.  This is the only kind with a placement constraint.
- ``partial`` window aggregates and ``latest`` registers are PARTIALS:
  the driver merges them across actors at every window close
  (``merge_closed`` / ``merge_latest``), and both merges are commutative
  and associative, so ANY distribution over the new partitions yields
  identical merged output.  They are re-routed by a stable string hash of
  ``skey`` for balance.
- session-window state lives on the DRIVER (``job`` session snapshots on
  the constant agg partition) — untouched by rescaling.

Watermark/frontier metadata: every new partition gets
``max_ts = min(old max_ts)`` — the conservative choice; the next global
watermark (a min over partitions) is then exactly what the old layout
would have produced, so no row is ever treated as late that the unbroken
run would have kept.

Crash safety: rescaling rewrites many snapshot files and is not atomic,
so it journals first — the concatenated source state is backed up to
``manifests/rescale-backup.parquet`` and a ``rescale.json`` journal is
committed (atomic rename) BEFORE any snapshot is overwritten.  An
interrupted rescale is resumed by re-running ``rescale_checkpoint``: if a
journal exists, the source state is loaded from the backup (the partition
snapshots may be half-rewritten and are not trusted).  The journal and
backup are removed only after ``job.json`` — the commit point the resume
shape guard reads — has been rewritten.

Protocol bookkeeping: new partitions (Q > P) get one empty committed
manifest at the resume epoch so ``last_committed_epoch`` agrees across the
pool; orphan partitions (Q < P) keep their committed output files — the
output readers scan ALL ``part=*`` manifests, so history stays visible.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..synth import _hash2
from .sink import EpochSink


def _route_skey(skeys: np.ndarray, q: int) -> np.ndarray:
    """Deterministic (process-independent) balance routing for
    partial/latest rows — placement is free for correctness, but snapshot
    bytes should not depend on PYTHONHASHSEED."""
    if not len(skeys):
        return np.zeros(0, np.int64)
    h = np.array(
        [zlib.crc32(("" if s is None else s).encode()) for s in skeys],
        dtype=np.uint64,
    )
    return (h % np.uint64(q)).astype(np.int64)


def rescale_checkpoint(out_dir: str, new_partitions: int) -> dict:
    """Rewrite the checkpoint under ``out_dir`` from its current partition
    count to ``new_partitions``.  The job must be stopped (no actors
    holding the state).  Idempotent under crashes: re-run to finish an
    interrupted rescale.  After this,
    ``StreamingJob(cfg_with_new_count).run(resume=True)`` continues the
    stream on the new pool width."""
    mdir = os.path.join(out_dir, "manifests")
    job_path = os.path.join(mdir, "job.json")
    journal_path = os.path.join(mdir, "rescale.json")
    backup_path = os.path.join(mdir, "rescale-backup.parquet")
    with open(job_path) as f:
        shape = json.load(f)
    q = int(new_partitions)
    seed = int(shape.get("route_seed", 7))
    if q < 1:
        raise ValueError("new_partitions must be >= 1")

    if os.path.exists(journal_path):
        # resume an interrupted rescale: partition snapshots are not
        # trusted; the journaled backup is the source of truth
        with open(journal_path) as f:
            journal = json.load(f)
        if int(journal["new_q"]) != q:
            # a resumed rescale MUST finish the journaled plan: the first
            # attempt may already have written snapshots/manifests for
            # partitions in [q, journal.new_q) — retargeting would leave
            # them as live-looking stale state the resume rule then trusts
            raise ValueError(
                f"interrupted rescale in progress targets "
                f"{int(journal['new_q'])} partitions; re-run with that "
                f"count to finish it (got {q})"
            )
        old_p, k = int(journal["old_p"]), int(journal["epoch"])
        allt = pq.read_table(backup_path)
        metas = [journal["meta"]]
    else:
        old_p = int(shape["num_partitions"])
        if q == old_p:
            return {"old": old_p, "new": q, "epoch": None, "moved_rows": 0}
        sinks = [EpochSink(out_dir, p) for p in range(old_p)]
        k = min(s.last_committed_epoch() for s in sinks)
        if k < 0:
            raise ValueError("nothing committed yet — start fresh instead")
        tables, maxes, wms = [], [], []
        for p, s in enumerate(sinks):
            t = s.read_snapshot(k, "state")
            if t is None:
                raise RuntimeError(
                    f"state snapshot for epoch {k} missing on partition {p}"
                )
            m = {kk.decode(): v.decode() for kk, v in (t.schema.metadata or {}).items()}
            maxes.append(int(m.get("max_ts", -1)))
            wms.append(int(m.get("watermark", -(1 << 62))))
            tables.append(t.replace_schema_metadata(None))
        allt = pa.concat_tables(tables)
        # conservative shared frontier: min over old partitions (docstring);
        # the DEDUP frontier is the max — rows up to the global max may
        # already be emitted somewhere, so the seen gate must cover them
        metas = [{"max_ts": str(min(maxes)), "watermark": str(max(wms)),
                  "dedup_frontier": str(max(maxes))}]
        # journal BEFORE the first overwrite (atomic: tmp + rename)
        pq.write_table(allt, backup_path + ".tmp")
        os.replace(backup_path + ".tmp", backup_path)
        jtmp = journal_path + ".tmp"
        with open(jtmp, "w") as f:
            json.dump({"old_p": old_p, "new_q": q, "epoch": k,
                       "meta": metas[0]}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(jtmp, journal_path)

    kinds = np.asarray(allt["kind"].to_pylist(), dtype=object)
    dest = np.zeros(len(allt), dtype=np.int64)
    seen_mask = kinds == "seen"
    if seen_mask.any():
        # seen rows store doc_idx in `ws` (see _snapshot_table) — re-route
        # with the JOB's routing function so future duplicates co-locate
        idx = allt["ws"].to_numpy(zero_copy_only=False)[seen_mask].astype(np.int64)
        dest[seen_mask] = (_hash2(seed, idx) % np.uint64(q)).astype(np.int64)
    other = ~seen_mask
    if other.any():
        skeys = np.asarray(allt["skey"].to_pylist(), dtype=object)[other]
        dest[other] = _route_skey(skeys, q)

    moved = 0
    for p in range(q):
        part_rows = allt.filter(pa.array(dest == p))
        # deterministic snapshot bytes: total order over bookkeeping columns
        part_rows = part_rows.sort_by(
            [("kind", "ascending"), ("skey", "ascending"),
             ("ws", "ascending"), ("cnt", "ascending")]
        ).replace_schema_metadata(metas[0])
        sink = EpochSink(out_dir, p)
        sink.write_snapshot(k, "state", part_rows)
        moved += len(part_rows)
        if sink.last_committed_epoch() < k:
            # fresh partition: mark epoch k committed (no data files) so the
            # pool-wide min-committed resume rule lands on k+1
            sink.commit_epoch(
                k, {}, {"rescaled_from": old_p, "rescaled_to": q}
            )

    shape["num_partitions"] = q
    tmp = job_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(shape, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, job_path)  # commit point
    os.unlink(journal_path)
    os.unlink(backup_path)
    return {"old": old_p, "new": q, "epoch": k, "moved_rows": moved}


def _update_job_shape_partitions(out_dir: str, q: int) -> None:
    """A completed rescale IS the sanctioned partition-count change: update
    the persisted job shape (if the engine wrote one) so the resume guard
    accepts the new width."""
    job_path = os.path.join(out_dir, "manifests", "job.json")
    if not os.path.exists(job_path):
        return
    with open(job_path) as f:
        shape = json.load(f)
    shape["num_partitions"] = q
    tmp = job_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(shape, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, job_path)


def rescale_join_checkpoint(
    out_dir: str,
    old_partitions: int,
    new_partitions: int,
    key_col: str = "key",
    route_seed: int = 7,
) -> dict:
    """Rescale a stopped :class:`~core_ray.streaming.join.StreamJoinJob`
    checkpoint from P to Q partitions.  Unlike the window engine, EVERY
    join-state row has a placement constraint — future arrivals of a key
    route to ``hash(route_seed, key) % Q``, and matching is key-local — so
    both sides' rows re-route by exactly that function ( ``_matched``
    outer-mode flags ride along as ordinary columns).  Per-side
    ``max_ts`` metadata takes the conservative min over donors (the next
    conservative watermark then equals the old layout's); there are no
    cross-epoch dedup registers in the join engine (ingest dedup is
    per-epoch batch-id based), so no dedup-frontier split is needed.

    Same journal+backup crash-safety discipline as
    :func:`rescale_checkpoint`; the journal/backup live under
    ``manifests/`` of the join's out_dir.  The caller resumes with
    ``JoinConfig(num_partitions=Q)`` (the join config carries no persisted
    shape file — keep the rest of the config identical).
    """
    mdir = os.path.join(out_dir, "manifests")
    journal_path = os.path.join(mdir, "rescale-join.json")
    backup_paths = {
        s: os.path.join(mdir, f"rescale-join-backup-{s}.parquet")
        for s in ("l", "r")
    }
    q = int(new_partitions)
    if q < 1:
        raise ValueError("new_partitions must be >= 1")

    if os.path.exists(journal_path):
        with open(journal_path) as f:
            journal = json.load(f)
        if int(journal["new_q"]) != q:
            # same contract as rescale_checkpoint: finish the journaled plan
            raise ValueError(
                f"interrupted join rescale targets {int(journal['new_q'])} "
                f"partitions; re-run with that count to finish it (got {q})"
            )
        old_p, k = int(journal["old_p"]), int(journal["epoch"])
        tables = {
            s: (pq.read_table(p) if os.path.exists(p) else None)
            for s, p in backup_paths.items()
        }
        metas = journal["meta"]
    else:
        old_p = int(old_partitions)
        if q == old_p:
            return {"old": old_p, "new": q, "epoch": None, "moved_rows": 0}
        sinks = [EpochSink(out_dir, p) for p in range(old_p)]
        k = min(s.last_committed_epoch() for s in sinks)
        if k < 0:
            raise ValueError("nothing committed yet — start fresh instead")
        tables = {}
        metas = {}
        for side in ("l", "r"):
            parts, mmax, mwm, mlate = [], [], [], 0
            for p, s in enumerate(sinks):
                t = s.read_snapshot(k, f"join-{side}")
                if t is None:
                    raise RuntimeError(
                        f"join-{side} snapshot for epoch {k} missing on "
                        f"partition {p}"
                    )
                m = {kk.decode(): v.decode()
                     for kk, v in (t.schema.metadata or {}).items()}
                mmax.append(int(m.get("max_ts", -1)))
                mwm.append(int(m.get("watermark", -(1 << 62))))
                mlate += int(m.get("late", 0))
                if t.num_columns:
                    parts.append(t.replace_schema_metadata(None))
            tables[side] = pa.concat_tables(parts) if parts else None
            metas[side] = {"max_ts": str(min(mmax)),
                           "watermark": str(max(mwm)),
                           # late counters are global lineage: carry the sum
                           # on partition 0, zeros elsewhere
                           "late_total": str(mlate)}
        for side, t in tables.items():
            if t is not None:
                pq.write_table(t, backup_paths[side] + ".tmp")
                os.replace(backup_paths[side] + ".tmp", backup_paths[side])
        jtmp = journal_path + ".tmp"
        with open(jtmp, "w") as f:
            json.dump({"old_p": old_p, "new_q": q, "epoch": k, "meta": metas},
                      f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(jtmp, journal_path)

    moved = 0
    for p in range(q):
        sink = EpochSink(out_dir, p)
        for side in ("l", "r"):
            t = tables[side]
            meta = {
                "max_ts": metas[side]["max_ts"],
                "watermark": metas[side]["watermark"],
                # late counters are global lineage: partition 0 carries the
                # donors' sum, the rest restart at 0
                "late": metas[side]["late_total"] if p == 0 else "0",
            }
            if t is None or not len(t):
                part_rows = (
                    t if t is not None
                    else pa.Table.from_pydict({})
                )
            else:
                keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
                dest = (_hash2(route_seed, keys) % np.uint64(q)).astype(np.int64)
                part_rows = t.filter(pa.array(dest == p))
                part_rows = part_rows.sort_by(
                    [(c, "ascending") for c in part_rows.column_names
                     if c != "_matched"]
                )
                moved += len(part_rows)
            sink.write_snapshot(
                k, f"join-{side}", part_rows.replace_schema_metadata(meta)
            )
        if sink.last_committed_epoch() < k:
            sink.commit_epoch(k, {}, {"rescaled_from": old_p,
                                      "rescaled_to": q})
    _update_job_shape_partitions(out_dir, q)
    os.unlink(journal_path)
    for pth in backup_paths.values():
        if os.path.exists(pth):
            os.unlink(pth)
    return {"old": old_p, "new": q, "epoch": k, "moved_rows": moved}


def rescale_keyed_checkpoint(
    out_dir: str,
    old_partitions: int,
    new_partitions: int,
    snapshot_name: str,
    key_col: str = "key",
    route_seed: int = 7,
    sum_meta: tuple[str, ...] = ("late",),
) -> dict:
    """Generic rescaler for the single-keyed-snapshot-table engines (CEP
    ``"cep"`` state, and any future engine whose snapshot rows carry the
    routing key): concatenate the donors' snapshot tables at the resume
    epoch, re-route every row by the job's own ``hash(route_seed, key) %
    Q``, min/max-merge the watermark metadata (conservative), and carry
    each summed lineage counter in ``sum_meta`` on partition 0.

    Crash safety: same journal+backup discipline as
    :func:`rescale_checkpoint`, namespaced per ``snapshot_name``.
    """
    mdir = os.path.join(out_dir, "manifests")
    journal_path = os.path.join(mdir, f"rescale-{snapshot_name}.json")
    backup_path = os.path.join(mdir, f"rescale-{snapshot_name}-backup.parquet")
    q = int(new_partitions)
    if q < 1:
        raise ValueError("new_partitions must be >= 1")

    if os.path.exists(journal_path):
        with open(journal_path) as f:
            journal = json.load(f)
        if int(journal["new_q"]) != q:
            # same contract as the other rescalers: finish the journaled plan
            raise ValueError(
                f"interrupted {snapshot_name} rescale targets "
                f"{int(journal['new_q'])} partitions; re-run with that "
                f"count to finish it (got {q})"
            )
        old_p, k = int(journal["old_p"]), int(journal["epoch"])
        if journal.get("has_backup", True) and not os.path.exists(backup_path):
            # the journal promises state but the backup is gone (torn
            # cleanup): proceeding would overwrite every partition snapshot
            # with an EMPTY table — silent state wipe, so fail loudly
            raise RuntimeError(
                f"rescale journal {journal_path} references a missing "
                f"backup {backup_path}; cannot safely resume"
            )
        allt = pq.read_table(backup_path) if os.path.exists(backup_path) else None
        meta = journal["meta"]
    else:
        old_p = int(old_partitions)
        if q == old_p:
            return {"old": old_p, "new": q, "epoch": None, "moved_rows": 0}
        sinks = [EpochSink(out_dir, p) for p in range(old_p)]
        k = min(s.last_committed_epoch() for s in sinks)
        if k < 0:
            raise ValueError("nothing committed yet — start fresh instead")
        parts, maxes, wms = [], [], []
        sums = {name: 0 for name in sum_meta}
        for p, s in enumerate(sinks):
            t = s.read_snapshot(k, snapshot_name)
            if t is None:
                raise RuntimeError(
                    f"{snapshot_name} snapshot for epoch {k} missing on "
                    f"partition {p}"
                )
            m = {kk.decode(): v.decode()
                 for kk, v in (t.schema.metadata or {}).items()}
            maxes.append(int(m.get("max_ts", -1)))
            wms.append(int(m.get("watermark", -(1 << 62))))
            for name in sum_meta:
                sums[name] += int(m.get(name, 0))
            if t.num_columns and len(t):
                parts.append(t.replace_schema_metadata(None))
        allt = pa.concat_tables(parts) if parts else None
        meta = {"max_ts": str(min(maxes)), "watermark": str(max(wms)),
                "sums": {name: str(v) for name, v in sums.items()}}
        if allt is not None:
            pq.write_table(allt, backup_path + ".tmp")
            os.replace(backup_path + ".tmp", backup_path)
        jtmp = journal_path + ".tmp"
        with open(jtmp, "w") as f:
            json.dump({"old_p": old_p, "new_q": q, "epoch": k, "meta": meta,
                       "has_backup": allt is not None}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(jtmp, journal_path)

    if allt is not None:
        keys = allt[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dest = (_hash2(route_seed, keys) % np.uint64(q)).astype(np.int64)
    moved = 0
    for p in range(q):
        m = {"max_ts": meta["max_ts"], "watermark": meta["watermark"]}
        for name, v in meta["sums"].items():
            m[name] = v if p == 0 else "0"
        if allt is None:
            part_rows = pa.Table.from_pydict({})
        else:
            part_rows = allt.filter(pa.array(dest == p))
            part_rows = part_rows.sort_by(
                [(c, "ascending") for c in part_rows.column_names]
            )
            moved += len(part_rows)
        sink = EpochSink(out_dir, p)
        sink.write_snapshot(k, snapshot_name,
                            part_rows.replace_schema_metadata(m))
        if sink.last_committed_epoch() < k:
            sink.commit_epoch(k, {}, {"rescaled_from": old_p,
                                      "rescaled_to": q})
    _update_job_shape_partitions(out_dir, q)
    # journal FIRST: a crash between the unlinks must leave an orphaned
    # backup (harmless), never a journal whose backup is gone (a re-run
    # would then wipe every partition snapshot with an empty table)
    os.unlink(journal_path)
    if os.path.exists(backup_path):
        os.unlink(backup_path)
    return {"old": old_p, "new": q, "epoch": k, "moved_rows": moved}
