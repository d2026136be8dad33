"""Streaming TOKEN-FREQUENCY registers (continuous exact heavy hitters).

The streaming analog of the batch frequency operators
(``functions/sketches.py`` ``frequent_words_exact`` / ``heavy_hitters``) on
the token axis: as micro-batch epochs of ``(doc_id, tokens, n_tok, source)``
rows arrive, each partition actor maintains the exact occurrence count of
every token id in its residue class and emits, per epoch, the register's
CURRENT top-k — the continuously-updated "what is the corpus made of"
dashboard an ingest pipeline keeps live, rather than a batch job re-counting
the full corpus.

Exactness: token counts are pure integer addition, so the register is exact
at any scale (this is the exact-regime contract: a fixed model vocabulary is
BOUNDED state — ~50k int64 cells per actor — unlike open-vocabulary words,
where the batch engine's Misra-Gries sketch is the fallback).  Top-k order
is total: count desc, token asc.

Scale shape (the combiner discipline): consume tasks ``bincount`` each
file's flat token buffer — one vectorized pass over the payload — and route
only the NONZERO ``(token, cnt)`` partials, so per epoch each partition
receives at most ``min(distinct tokens in epoch, vocab) / num_partitions``
entries no matter how many tokens the epoch carries; the token payload
itself never crosses the shuffle.  Routing is ``token % num_partitions`` —
each token id lives in exactly ONE partition, which makes every partition's
local top-k globally correct for its tokens and the final merge a
``k x num_partitions``-row driver step.

Exactly-once / resume: the same ``EpochSink`` protocol as the other
streaming shapes — idempotent per-(epoch, batch) ingest (task-retry
redelivery must not double-count), deterministic per-(partition, epoch)
top-k files, atomic manifests, per-epoch register snapshots; a run killed
after epoch k and resumed is byte-identical to an unbroken run.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray

from .sink import EpochSink

_U64 = np.uint64

_TOPK_SCHEMA = pa.schema([("token", pa.int64()), ("cnt", pa.int64())])


@dataclass
class FreqConfig:
    input_dir: str
    out_dir: str
    num_partitions: int = 8
    files_per_epoch: int = 1
    k: int = 100


def _list_files(d: str) -> list[str]:
    return sorted(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet"))


@ray.remote(num_cpus=0)
class FreqPartitionActor:
    """One token-residue partition of the streaming frequency register:
    buffers the epoch's (token, cnt) partials, folds them into the exact
    count register at the barrier, emits the register's current top-k."""

    def __init__(self, partition_id: int, out_dir: str, k: int):
        pa.set_cpu_count(1)
        self.part = partition_id
        self.k = k
        self.out_dir = out_dir
        self.reset()

    def reset(self) -> bool:
        self.sink = EpochSink(self.out_dir, self.part)
        # exact counts indexed by token id (grown on demand; only this
        # partition's residue class is ever nonzero)
        self.counts = np.zeros(0, dtype=np.int64)
        self.tokens_in = 0
        self._epoch_rows: dict[int, list[pa.Table]] = {}
        self._epoch_ids: dict[int, set] = {}
        return True

    def ingest(self, epoch: int, batch_id: int, table: pa.Table) -> int:
        ids = self._epoch_ids.setdefault(epoch, set())
        if batch_id in ids:  # task-retry redelivery: counting twice corrupts
            return 0
        ids.add(batch_id)
        self._epoch_rows.setdefault(epoch, []).append(table)
        return len(table)

    def _grow(self, n: int) -> None:
        if n > len(self.counts):
            new = np.zeros(n, dtype=np.int64)
            new[: len(self.counts)] = self.counts
            self.counts = new

    def _topk_table(self) -> pa.Table:
        nz = np.flatnonzero(self.counts)
        if len(nz) == 0:
            return _TOPK_SCHEMA.empty_table()
        cnts = self.counts[nz]
        order = np.lexsort((nz, -cnts))[: self.k]
        return pa.table(
            {"token": pa.array(nz[order], pa.int64()),
             "cnt": pa.array(cnts[order], pa.int64())},
            schema=_TOPK_SCHEMA,
        )

    def end_epoch(self, epoch: int) -> dict:
        tables = self._epoch_rows.pop(epoch, [])
        self._epoch_ids.pop(epoch, None)
        added = 0
        for t in tables:
            tok = t["token"].to_numpy(zero_copy_only=False)
            cnt = t["cnt"].to_numpy(zero_copy_only=False)
            if len(tok):
                self._grow(int(tok.max()) + 1)
                np.add.at(self.counts, tok, cnt)
                added += int(cnt.sum())
        self.tokens_in += added
        out = self._topk_table()
        nz = int(np.count_nonzero(self.counts))
        counters = {
            "tokens_in": added,
            "tokens_total": self.tokens_in,
            "state_nonzero": nz,
            "state_bytes": self.counts.nbytes,
        }
        # snapshot BEFORE the manifest: the manifest is the commit point
        # resume keys on, so the state it implies must already be durable
        # (a crash between them would otherwise brick every later resume
        # with a missing-snapshot error)
        nzi = np.flatnonzero(self.counts)
        snap = pa.table(
            {"token": pa.array(nzi, pa.int64()),
             "cnt": pa.array(self.counts[nzi], pa.int64())}
        ).replace_schema_metadata({"tokens_in": str(self.tokens_in)})
        self.sink.write_snapshot(epoch, "freq", snap)
        self.sink.commit_epoch(epoch, {"topk": out}, counters)
        # keep epoch-1 AND epoch (state_actor.py convention): resume loads
        # min(committed) across partitions, which can lag this one by one
        self.sink.gc_snapshots(epoch - 1)
        return counters

    def load_snapshot(self, epoch: int) -> bool:
        t = self.sink.read_snapshot(epoch, "freq")
        if t is None:
            return False
        meta = {k.decode(): v.decode() for k, v in (t.schema.metadata or {}).items()}
        self.tokens_in = int(meta.get("tokens_in", 0))
        self.counts = np.zeros(0, dtype=np.int64)
        tok = t["token"].to_numpy(zero_copy_only=False)
        if len(tok):
            self._grow(int(tok.max()) + 1)
            self.counts[tok] = t["cnt"].to_numpy(zero_copy_only=False)
        return True


@ray.remote
def _consume_freq(files: list, actors: list, epoch: int, base_id: int) -> int:
    """Read one file group, bincount each file's flat token buffer (one
    vectorized pass — the combiner), route nonzero (token, cnt) partials by
    token residue (same task-not-Dataset rationale as job._consume_block)."""
    import pyarrow.parquet as pq

    pa.set_cpu_count(1)
    n_parts = len(actors)
    routed = 0
    for fi, f in enumerate(files):
        t = pq.read_table(f, columns=["tokens"], use_threads=False)
        flat = t["tokens"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            continue
        bc = np.bincount(flat)
        tok = np.flatnonzero(bc)
        cnt = bc[tok]
        part = (tok % n_parts).astype(np.int64)
        order = np.argsort(part, kind="stable")
        bounds = np.searchsorted(part[order], np.arange(n_parts + 1))
        refs = []
        for p in range(n_parts):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            if hi > lo:
                sl = pa.table(
                    {"token": pa.array(tok[order[lo:hi]], pa.int64()),
                     "cnt": pa.array(cnt[order[lo:hi]], pa.int64())}
                )
                refs.append(
                    actors[p].ingest.remote(epoch, base_id * 1_000_000 + fi, sl)
                )
        routed += sum(ray.get(refs)) if refs else 0
    return routed


class StreamFreqJob:
    def __init__(self, cfg: FreqConfig):
        self.cfg = cfg
        files = _list_files(cfg.input_dir)
        n = cfg.files_per_epoch
        self.epochs = [files[i : i + n] for i in range(0, len(files), n)]

    _SHAPE_FIELDS = ("num_partitions", "files_per_epoch", "k")

    def _guard_job_shape(self, resume: bool) -> None:
        from .sink import guard_job_shape

        guard_job_shape(
            self.cfg.out_dir,
            {f: getattr(self.cfg, f) for f in self._SHAPE_FIELDS},
            resume,
        )

    def run(self, resume: bool = True, stop_after_epoch: int | None = None) -> dict:
        cfg = self.cfg
        self._guard_job_shape(resume)
        actors = [
            FreqPartitionActor.remote(p, cfg.out_dir, cfg.k)
            for p in range(cfg.num_partitions)
        ]
        try:
            start = 0
            if resume:
                committed = [
                    EpochSink(cfg.out_dir, p).last_committed_epoch()
                    for p in range(cfg.num_partitions)
                ]
                start = min(committed) + 1
                if start > 0:
                    oks = ray.get([a.load_snapshot.remote(start - 1) for a in actors])
                    if not all(oks):
                        missing = [p for p, ok in enumerate(oks) if not ok]
                        raise RuntimeError(
                            f"resume: freq snapshot for epoch {start - 1} "
                            f"missing on partition(s) {missing}"
                        )
            last = len(self.epochs) - 1
            if stop_after_epoch is not None:
                last = min(last, stop_after_epoch)
            totals = {"tokens_in": 0}
            for e in range(start, last + 1):
                ray.get(_consume_freq.remote(self.epochs[e], actors, e, e))
                results = ray.get([a.end_epoch.remote(e) for a in actors])
                for c in results:
                    totals["tokens_in"] += c["tokens_in"]
            return {"epochs": len(self.epochs), "last_run": last, "totals": totals}
        finally:
            for a in actors:
                try:
                    ray.kill(a)
                except Exception:
                    pass


def final_topk(out_dir: str, num_partitions: int, k: int = 100):
    """The register's answer after the last committed epoch: merge every
    partition's final top-k (each token lives in exactly one partition, so
    the union of locals contains the global top-k) and take the global k
    under (cnt desc, token asc)."""
    import pyarrow.parquet as pq

    import ray.data

    parts = []
    for p in range(num_partitions):
        sink = EpochSink(out_dir, p)
        e = sink.last_committed_epoch()
        if e < 0:
            continue
        man = sink.read_manifest(e)
        entry = man["files"].get("topk")
        if entry is None:
            continue
        parts.append(
            pq.read_table(os.path.join(out_dir, f"part={p:04d}", entry["file"]))
        )
    if not parts:
        return ray.data.from_arrow(_TOPK_SCHEMA.empty_table())
    merged = pa.concat_tables(parts)
    tok = merged["token"].to_numpy(zero_copy_only=False)
    cnt = merged["cnt"].to_numpy(zero_copy_only=False)
    order = np.lexsort((tok, -cnt))[:k]
    return ray.data.from_arrow(
        pa.table(
            {"token": pa.array(tok[order], pa.int64()),
             "cnt": pa.array(cnt[order], pa.int64())},
            schema=_TOPK_SCHEMA,
        )
    )
