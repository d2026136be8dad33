"""Streaming EXACT dedup of pre-tokenized training sequences.

The streaming analog of ``functions.dedup_exact_tokens`` (and of the
reference's keyed idempotent-merge stage, ``pcdm_to_delta.py:336-376``): as
micro-batch epochs of ``(doc_id, tokens, n_tok, source)`` rows arrive, each
partition actor keeps the set of token sequences it has already admitted and
emits, per epoch, exactly the NEW sequences' first bearers — the streaming
"have we trained on this sequence before" gate that an ingest pipeline runs
continuously rather than as a batch job over the full corpus.

Exactness: the dedup key is the raw little-endian byte string of the int32
token array — injective, so two distinct sequences can never merge (routing
uses a 64-bit content hash, but admission compares full key bytes).
Determinism: arrival order inside an epoch is nondeterministic (consume
tasks race), so admission happens at the epoch BARRIER: the epoch's minimum
``doc_idx`` per key wins, making the emitted survivor set a pure function of
(input files, epoch grouping) — and, because the source files are monotone
in ``doc_idx``, equal to the batch rule "min doc_id per identical token
array".

Exactly-once / resume: the same ``EpochSink`` commit protocol as the other
streaming shapes — deterministic per-(partition, epoch) survivor files,
atomic manifests, per-epoch state snapshots; a run killed after epoch k and
resumed is byte-identical to an unbroken run (``tests/test_streaming.py``).

Scale shape: state per actor is one Arrow table (key bytes, doc_idx) — the
columnar buffers of the distinct sequences routed to that partition, the
irreducible memory cost of exact streaming dedup; growing it is O(new keys)
per epoch (one hash join against the epoch's winners, no rescan).  At 100 TB
the same layout holds with more partitions: routing is by content hash, so
partitions stay balanced regardless of key skew (identical contents are ONE
key).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray

from ..synth import _hash2
from .sink import EpochSink

_U64 = np.uint64

_OUT_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("n_tok", pa.int32()), ("source", pa.string()),
     ("doc_idx", pa.int64())]
)


@dataclass
class DedupConfig:
    input_dir: str
    out_dir: str
    num_partitions: int = 8
    files_per_epoch: int = 1
    route_seed: int = 11


def _list_files(d: str) -> list[str]:
    return sorted(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet"))


def token_keys(tokens: pa.ListArray) -> tuple[pa.Array, np.ndarray]:
    """(exact binary key, 64-bit routing hash) per row, both vectorized.

    Key = the int32 value buffer's bytes, sliced per row by reusing the list
    offsets ×4 as binary offsets — zero-copy over the token payload.  The
    routing hash mixes each token with its in-row position (order-sensitive)
    and wraps per row via ``np.add.reduceat``; collisions only co-locate
    distinct keys, never merge them.
    """
    off32 = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = tokens.values.to_numpy(zero_copy_only=False)
    # compact the value window (a sliced ListArray's offsets need not start at 0)
    vals = np.ascontiguousarray(vals[off32[0] : off32[-1]], dtype=np.int32)
    off = off32 - off32[0]
    n = len(off) - 1
    keys = pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer((off * 4).astype(np.int32).tobytes()), pa.py_buffer(vals.tobytes())],
    )
    lens = np.diff(off)
    pos = np.arange(len(vals), dtype=np.int64) - np.repeat(off[:-1], lens)
    elem = _hash2(17, vals.astype(np.int64), pos + 1)
    h = np.zeros(n, dtype=_U64)
    ne = lens > 0
    if ne.any():
        with np.errstate(over="ignore"):
            h[ne] = np.add.reduceat(elem, off[:-1][ne])
    return keys, h


@ray.remote(num_cpus=0)
class DedupPartitionActor:
    """One content-hash partition of the streaming dedup: buffers the epoch's
    arrivals, admits the epoch-minimum bearer of every previously-unseen
    sequence at the barrier, holds the admitted key set as Arrow state."""

    def __init__(self, partition_id: int, out_dir: str):
        pa.set_cpu_count(1)
        self.part = partition_id
        self.out_dir = out_dir
        self.reset()

    def reset(self) -> bool:
        self.sink = EpochSink(self.out_dir, self.part)
        # (key: binary, doc_idx: int64) — admitted sequences; keys unique
        self.state: pa.Table | None = None
        self._epoch_rows: dict[int, list[pa.Table]] = {}
        self._epoch_ids: dict[int, set] = {}
        self._dupes = 0
        return True

    def ingest(self, epoch: int, batch_id: int, table: pa.Table) -> int:
        ids = self._epoch_ids.setdefault(epoch, set())
        if batch_id in ids:  # task-retry redelivery
            return 0
        ids.add(batch_id)
        self._epoch_rows.setdefault(epoch, []).append(table)
        return len(table)

    def end_epoch(self, epoch: int) -> dict:
        import pyarrow.compute as pc

        tables = self._epoch_rows.pop(epoch, [])
        self._epoch_ids.pop(epoch, None)
        rows_in = 0
        if tables:
            t = pa.concat_tables(tables)
            rows_in = len(t)
            # epoch winner per key = min doc_idx; (key, doc_idx) is unique
            # (doc_idx is unique per row), so the join recovers exactly one
            # payload row per key — all Arrow kernels, no pandas round-trip
            wins = t.group_by("key").aggregate([("doc_idx", "min")]).rename_columns(
                ["key", "doc_idx"]
            )
            winners = wins.join(t, keys=["key", "doc_idx"], join_type="inner")
            # cross-epoch screen: drop keys already admitted
            if self.state is not None and len(self.state):
                probe = self.state.select(["key"]).append_column(
                    "_seen", pa.array(np.ones(len(self.state), dtype=np.int8))
                )
                j = winners.join(probe, keys=["key"], join_type="left outer")
                fresh = j.filter(pc.is_null(j["_seen"])).drop_columns(["_seen"])
            else:
                fresh = winners
            self._dupes += rows_in - len(fresh)
            out = (
                fresh.select(["doc_id", "n_tok", "source", "doc_idx"])
                .sort_by("doc_idx")
                .cast(_OUT_SCHEMA)
            )
            new_state = fresh.select(["key", "doc_idx"])
            self.state = (
                new_state
                if self.state is None or not len(self.state)
                else pa.concat_tables([self.state, new_state])
            )
        else:
            out = _OUT_SCHEMA.empty_table()
        counters = {
            "rows_in": rows_in,
            "survivors": len(out),
            "dupes_dropped": self._dupes,
            "state_rows": 0 if self.state is None else len(self.state),
            "state_bytes": 0 if self.state is None else self.state.nbytes,
        }
        # snapshot BEFORE the manifest commit point (see freq.py) — a lost
        # dedup snapshot would silently re-admit duplicates on resume
        st = self.state if self.state is not None else pa.table(
            {"key": pa.array([], pa.binary()), "doc_idx": pa.array([], pa.int64())}
        )
        self.sink.write_snapshot(
            epoch, "dedup", st.replace_schema_metadata({"dupes": str(self._dupes)})
        )
        self.sink.commit_epoch(epoch, {"survivors": out}, counters)
        # keep epoch-1 AND epoch (state_actor.py convention): resume loads
        # min(committed) across partitions, which can lag this one by one
        self.sink.gc_snapshots(epoch - 1)
        return counters

    def load_snapshot(self, epoch: int) -> bool:
        t = self.sink.read_snapshot(epoch, "dedup")
        if t is None:
            return False
        meta = {k.decode(): v.decode() for k, v in (t.schema.metadata or {}).items()}
        self._dupes = int(meta.get("dupes", 0))
        self.state = t.replace_schema_metadata(None) if len(t) else None
        return True


@ray.remote
def _consume_dedup(files: list, actors: list, epoch: int, base_id: int, seed: int) -> int:
    """Read one file group, derive (key, routing hash, doc_idx), route compact
    per-partition slices (same task-not-Dataset rationale as job._consume_block)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    pa.set_cpu_count(1)
    routed = 0
    for fi, f in enumerate(files):
        t = pq.read_table(
            f, columns=["doc_id", "tokens", "n_tok", "source"], use_threads=False
        )
        tokens = t["tokens"].combine_chunks()
        keys, h = token_keys(tokens)
        idx = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], 4, 99), pa.int64())
        part = (_hash2(seed, h) % _U64(len(actors))).astype(np.int32)
        payload = pa.table(
            {
                "key": keys,
                "doc_idx": idx,
                "doc_id": t["doc_id"],
                "n_tok": t["n_tok"],
                "source": t["source"],
            }
        )
        order = np.argsort(part, kind="stable")
        bounds = np.searchsorted(part[order], np.arange(len(actors) + 1))
        refs = []
        for p in range(len(actors)):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            if hi > lo:
                sl = payload.take(pa.array(order[lo:hi]))  # compact copy
                refs.append(
                    actors[p].ingest.remote(epoch, base_id * 1_000_000 + fi, sl)
                )
        routed += sum(ray.get(refs)) if refs else 0
    return routed


class StreamDedupJob:
    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        files = _list_files(cfg.input_dir)
        n = cfg.files_per_epoch
        self.epochs = [files[i : i + n] for i in range(0, len(files), n)]

    _SHAPE_FIELDS = ("num_partitions", "files_per_epoch", "route_seed")

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
            DedupPartitionActor.remote(p, cfg.out_dir)
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
                            f"resume: dedup snapshot for epoch {start - 1} "
                            f"missing on partition(s) {missing}"
                        )
            last = len(self.epochs) - 1
            if stop_after_epoch is not None:
                last = min(last, stop_after_epoch)
            totals = {"rows_in": 0, "survivors": 0}
            for e in range(start, last + 1):
                ray.get(
                    _consume_dedup.remote(
                        self.epochs[e], actors, e, e, cfg.route_seed
                    )
                )
                results = ray.get([a.end_epoch.remote(e) for a in actors])
                for c in results:
                    totals["rows_in"] += c["rows_in"]
                    totals["survivors"] += c["survivors"]
            totals["dupes_dropped"] = totals["rows_in"] - totals["survivors"]
            return {"epochs": len(self.epochs), "last_run": last, "totals": totals}
        finally:
            for a in actors:
                try:
                    ray.kill(a)
                except Exception:
                    pass


def read_survivors(out_dir: str):
    """The committed survivor set as a Ray Dataset (manifested files only)."""
    from .sink import manifest_data_files

    files = manifest_data_files(out_dir)
    import ray.data

    if not files:
        return ray.data.from_arrow(_OUT_SCHEMA.empty_table())
    return ray.data.read_parquet(files)
