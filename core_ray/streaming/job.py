"""Streaming job driver: epoch loop, normalize/route stages, watermark barrier.

Per epoch (a group of source Parquet files — the micro-batch, reference
``pcdm_to_delta.py:336-356``):

1. ``ray.data.read_parquet(files)`` → stateless normalize ``map_batches``
   (zero-copy Arrow: derive doc_idx / event-time / Status / partition id);
2. routing ``map_batches`` tasks slice each batch by ``hash(key) % N`` and
   push slices to the partition actors (at-least-once; actors dedupe by
   deterministic batch id);
3. two-phase barrier: collect per-partition max event time → global
   watermark = min(max_ts) - allowed_lateness → ``end_epoch(wm)`` on every
   actor (emit closed windows, commit sink files + manifests, snapshot);
4. driver merges the actors' closed-window partials (the final stage of the
   salted aggregate — cardinality = #agg_keys × #closed windows, tiny) and
   commits the per-epoch aggregate file.

Resume: first uncommitted epoch across all partition manifests; actors load
their state snapshot of the preceding epoch and replay from there.  Output
files are deterministic, so a resumed run is byte-identical to an unbroken
one (verified by tests/test_streaming.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..synth import event_time_us, row_status, _hash2
from .sink import EpochSink
from .state_actor import StreamPartitionActor

T0_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
AGG_PARTITION_ID = 9999  # pseudo-partition for the driver-side aggregate sink


@dataclass
class StreamConfig:
    input_dir: str
    out_dir: str
    num_partitions: int = 8
    window_s: int = 60
    lateness_s: int = 2
    files_per_epoch: int = 1
    route_seed: int = 7
    # window semantics: "tumbling" (reference-aligned), "sliding" (size =
    # window_s, slide = slide_s), or "session" (gap = gap_s per agg key)
    window_kind: str = "tumbling"
    slide_s: int = 30
    gap_s: int = 300
    # False = aggregation-only job: the token payload is read and aggregated
    # but not re-materialized at the sink (the data-reduction path).  In this
    # sandbox every NEW byte through the object store page-faults at a fixed
    # host rate that does not scale with CPUs, so the payload-preserving sink
    # is fault-capped; scaling efficiency is measured on this compute path.
    sink_payload_rows: bool = True


def normalize_tokens(cfg_num_partitions: int, route_seed: int, with_payload: bool = True):
    """Stateless normalize: tokens row -> keyed event (Arrow, zero-copy for
    the `tokens` payload; only small derived columns are materialized).
    ``with_payload=False`` is the aggregation-only path — the tokens column
    never enters the pipeline (pruned at the read)."""

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # doc_idx from "doc-%08d" (vectorized slice+cast, no Python loop)
        idx = pc.cast(pc.utf8_slice_codeunits(batch["doc_id"], 4, 99), pa.int64())
        idx_np = idx.to_numpy(zero_copy_only=False)
        ts = event_time_us(idx_np)
        status = row_status(idx_np)
        part = (_hash2(route_seed, idx_np) % np.uint64(cfg_num_partitions)).astype(np.int32)
        cols = {"doc_id": batch["doc_id"]}
        if with_payload:
            cols["tokens"] = batch["tokens"]
        cols.update(
            {
                "n_tok": batch["n_tok"],
                "source": batch["source"],
                "doc_idx": idx,
                "ts_us": pa.array(ts),
                "Status": pa.array(status),
                "part": pa.array(part),
            }
        )
        return pa.table(cols)

    return fn


def make_router(actors: list, epoch: int):
    """map_batches fn: slice the batch per partition and push to actors.

    Blocks on the actor acks (backpressure); returns per-batch lineage
    counters. Batch id = min doc_idx (deterministic) so actor-side dedup
    absorbs Ray task retries.
    """

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"routed": pa.array([], pa.int64())})
        part = batch["part"].to_numpy(zero_copy_only=False)
        order = np.argsort(part, kind="stable")
        sorted_batch = batch.take(pa.array(order))
        spart = part[order]
        bounds = np.searchsorted(spart, np.arange(len(actors) + 1))
        refs = []
        for p in range(len(actors)):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            if hi > lo:
                sl = sorted_batch.slice(lo, hi - lo).drop_columns(["part"])
                batch_id = int(sl["doc_idx"][0].as_py())
                refs.append(actors[p].ingest.remote(epoch, batch_id, sl))
        routed = sum(ray.get(refs)) if refs else 0
        return pa.table({"routed": pa.array([routed], pa.int64())})

    return fn


def merge_fragments(state: dict, fragments: list, gap_us: int) -> None:
    """Gap-merge new per-actor session fragments into the driver's global
    open-session state {source: [(start, end, cnt, sum), ...]} in place."""
    for src, s, e, c, v in fragments:
        state.setdefault(src, []).append((s, e, c, v))
    for src, frags in state.items():
        frags.sort()
        merged = []
        for f in frags:
            if merged and f[0] <= merged[-1][1] + gap_us:
                last = merged[-1]
                merged[-1] = (
                    last[0],
                    max(last[1], f[1]),
                    last[2] + f[2],
                    last[3] + f[3],
                )
            else:
                merged.append(f)
        state[src] = merged


def close_sessions(state: dict, watermark_us: int, gap_us: int) -> pa.Table:
    """Extract sessions no future event can extend (end + gap <= watermark)."""
    rows = []
    for src in sorted(state):
        keep = []
        for f in state[src]:
            if f[1] + gap_us <= watermark_us:
                rows.append((src, *f))
            else:
                keep.append(f)
        state[src] = keep
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "session_start": pa.array(
                np.array([r[1] for r in rows], dtype=np.int64).astype("datetime64[us]")
            ),
            "session_end": pa.array(
                np.array([r[2] for r in rows], dtype=np.int64).astype("datetime64[us]")
            ),
            "cnt": pa.array([r[3] for r in rows], pa.int64()),
            "sum_n_tok": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def _sessions_snapshot_table(state: dict) -> pa.Table:
    rows = [(src, *f) for src in sorted(state) for f in state[src]]
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "s": pa.array([r[1] for r in rows], pa.int64()),
            "e": pa.array([r[2] for r in rows], pa.int64()),
            "c": pa.array([r[3] for r in rows], pa.int64()),
            "v": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def _sessions_from_snapshot(t: pa.Table | None) -> dict:
    state: dict = {}
    if t is None:
        return state
    for src, s, e, c, v in zip(
        t["source"].to_pylist(), t["s"].to_pylist(), t["e"].to_pylist(),
        t["c"].to_pylist(), t["v"].to_pylist(),
    ):
        state.setdefault(src, []).append((s, e, c, v))
    return state


def merge_closed(results: list[dict]) -> pa.Table:
    """Final stage of the salted window aggregate: merge per-actor partials."""
    acc: dict[tuple[str, int], list[int]] = {}
    for r in results:
        for key, (cnt, s, mn, mx) in r["closed"].items():
            src, _, w = key.partition("\x00")
            a = acc.setdefault((src, int(w)), [0, 0, 1 << 62, -(1 << 62)])
            a[0] += cnt
            a[1] += s
            a[2] = min(a[2], mn)
            a[3] = max(a[3], mx)
    items = sorted(acc.items())
    cnts = np.array([v[0] for _, v in items], dtype=np.int64)
    sums = np.array([v[1] for _, v in items], dtype=np.int64)
    with np.errstate(invalid="ignore"):
        avg = np.where(cnts > 0, sums / np.maximum(cnts, 1), np.nan)
    return pa.table(
        {
            "source": pa.array([k[0] for k, _ in items], pa.string()),
            "window_start": pa.array(
                np.array([k[1] for k, _ in items], dtype=np.int64).astype("datetime64[us]")
            ),
            "cnt": pa.array(cnts),
            "sum_n_tok": pa.array(sums),
            "avg_n_tok": pa.array(avg),
            "min_n_tok": pa.array([v[2] for _, v in items], pa.int64()),
            "max_n_tok": pa.array([v[3] for _, v in items], pa.int64()),
        }
    )


def merge_latest(results: list[dict]) -> pa.Table:
    """Merge per-actor latest registers (argmax by (ts, value))."""
    best: dict[str, dict] = {}
    for r in results:
        for src, reg in r.get("latest", {}).items():
            b = best.get(src)
            if b is None:
                best[src] = dict(reg)
                continue
            if (reg["ts"], reg["value"]) > (b["ts"], b["value"]):
                b["ts"], b["value"], b["status"] = reg["ts"], reg["value"], reg["status"]
            if (reg["good_ts"], reg["good_value"]) > (b["good_ts"], b["good_value"]):
                b["good_ts"], b["good_value"] = reg["good_ts"], reg["good_value"]
    items = sorted(best.items())
    return pa.table(
        {
            "source": pa.array([k for k, _ in items], pa.string()),
            "EventTime": pa.array(
                np.array([v["ts"] for _, v in items], dtype=np.int64).astype("datetime64[us]")
            ),
            "Status": pa.array([v["status"] for _, v in items], pa.string()),
            "Value": pa.array([v["value"] for _, v in items], pa.int64()),
            "GoodEventTime": pa.array(
                np.array([v["good_ts"] for _, v in items], dtype=np.int64).astype(
                    "datetime64[us]"
                )
            ),
            "GoodValue": pa.array([v["good_value"] for _, v in items], pa.int64()),
        }
    )


class StreamingJob:
    def __init__(self, cfg: StreamConfig):
        self.cfg = cfg
        files = sorted(
            os.path.join(cfg.input_dir, f)
            for f in os.listdir(cfg.input_dir)
            if f.endswith(".parquet")
        )
        n = cfg.files_per_epoch
        self.epochs = [files[i : i + n] for i in range(0, len(files), n)]
        self.agg_sink = EpochSink(cfg.out_dir, AGG_PARTITION_ID)

    def run(self, resume: bool = True, stop_after_epoch: int | None = None) -> dict:
        cfg = self.cfg
        # num_cpus=0.25: the partition count is FIXED per job (key routing
        # must be stable), so on a small cluster the pool must not reserve
        # every CPU or the read/normalize tasks starve; actors are busy only
        # at the epoch barrier.
        actors = [
            StreamPartitionActor.options(num_cpus=0.25).remote(
                p,
                cfg.out_dir,
                cfg.window_s * 1_000_000,
                cfg.lateness_s * 1_000_000,
                T0_US,
                window_kind=cfg.window_kind,
                slide_us=cfg.slide_s * 1_000_000,
                gap_us=cfg.gap_s * 1_000_000,
                sink_payload_rows=cfg.sink_payload_rows,
            )
            for p in range(cfg.num_partitions)
        ]
        start_epoch = 0
        sessions: dict = {}
        if resume:
            committed = [EpochSink(cfg.out_dir, p).last_committed_epoch()
                         for p in range(cfg.num_partitions)]
            committed.append(self.agg_sink.last_committed_epoch())
            start_epoch = min(committed) + 1
            if start_epoch > 0:
                ray.get([a.load_snapshot.remote(start_epoch - 1) for a in actors])
                sessions = _sessions_from_snapshot(
                    self.agg_sink.read_snapshot(start_epoch - 1, "sessions")
                )

        totals = {"rows": 0, "tokens": 0, "late": 0, "dupes": 0}
        phase_s = {}  # summed across actors/epochs: where barrier time goes

        # Task sizing: group the epoch's files into ~2 blocks per CPU so
        # per-task fixed overhead amortizes at any cluster size (the key
        # routing is row-deterministic, so block layout never affects output).
        n_cpus = int(ray.cluster_resources().get("CPU", 8))

        def consume(e: int):
            """Read/normalize/route one epoch into the actors (blocking)."""
            cols = None if cfg.sink_payload_rows else ["doc_id", "n_tok", "source"]
            blocks = max(1, min(len(self.epochs[e]), n_cpus * 2))
            ds = ray.data.read_parquet(
                self.epochs[e], columns=cols, override_num_blocks=blocks
            )
            ds = ds.map_batches(
                normalize_tokens(
                    cfg.num_partitions, cfg.route_seed, with_payload=cfg.sink_payload_rows
                ),
                batch_format="pyarrow",
            )
            ds = ds.map_batches(make_router(actors, e), batch_format="pyarrow")
            return ds.sum("routed")

        # 1-deep epoch prefetch: epoch e+1's read/normalize/route overlaps
        # epoch e's end-of-epoch barrier.  Safe because actor ingest buffers
        # are keyed by epoch and the watermark only counts epochs <= e.
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=1)
        n_epochs = len(self.epochs)
        last = stop_after_epoch if stop_after_epoch is not None else n_epochs - 1
        last = min(last, n_epochs - 1)
        import time as _time

        timeline = []
        fut = pool.submit(consume, start_epoch) if start_epoch <= last else None
        for e in range(start_epoch, last + 1):
            t0 = _time.monotonic()
            fut.result()
            t_wait = _time.monotonic() - t0
            fut = pool.submit(consume, e + 1) if e + 1 <= last else None

            t0 = _time.monotonic()
            maxes = ray.get([a.epoch_max_ts.remote(e) for a in actors])
            seen_maxes = [m for m in maxes if m >= 0]
            wm = (min(seen_maxes) if seen_maxes else -1) - cfg.lateness_s * 1_000_000
            results = ray.get([a.end_epoch.remote(e, wm) for a in actors])
            t_barrier = _time.monotonic() - t0
            timeline.append({"epoch": e, "consume_wait_s": round(t_wait, 2),
                             "barrier_s": round(t_barrier, 2)})
            streams = {"agg": merge_closed(results)}
            if cfg.window_kind == "session":
                for r in results:
                    merge_fragments(sessions, r.get("fragments", []), cfg.gap_s * 1_000_000)
                streams["sessions"] = close_sessions(sessions, wm, cfg.gap_s * 1_000_000)
            self.agg_sink.commit_epoch(
                e,
                streams,
                {"watermark": wm, "windows_closed": len(streams["agg"])},
            )
            if cfg.window_kind == "session":
                self.agg_sink.write_snapshot(e, "sessions", _sessions_snapshot_table(sessions))
                self.agg_sink.gc_snapshots(e - 1)
            for r in results:
                c = r["counters"]
                totals["rows"] += c["rows_emitted"]
                totals["tokens"] += c["tokens_emitted"]
                totals["late"] += c["late_rows"]
                totals["dupes"] += c["dupes_dropped"]
                for k, v in r.get("timings", {}).items():
                    phase_s[k] = phase_s.get(k, 0.0) + v

        pool.shutdown(wait=True)
        if stop_after_epoch is not None and last < n_epochs - 1:
            for a in actors:
                ray.kill(a)
            return {"stopped_after": last, "totals": totals}

        # end of stream: flush remaining windows + sessions + latest registers
        final_epoch = len(self.epochs)
        if not self.agg_sink.committed(final_epoch):
            results = ray.get([a.flush_final.remote(final_epoch) for a in actors])
            streams = {"agg": merge_closed(results), "latest": merge_latest(results)}
            if cfg.window_kind == "session":
                streams["sessions"] = close_sessions(
                    sessions, 1 << 62, cfg.gap_s * 1_000_000
                )
            self.agg_sink.commit_epoch(final_epoch, streams, {"final": True})
        for a in actors:
            ray.kill(a)
        return {
            "epochs": len(self.epochs),
            "totals": totals,
            "actor_phase_seconds": {k: round(v, 2) for k, v in phase_s.items()},
            "timeline": timeline,
        }
