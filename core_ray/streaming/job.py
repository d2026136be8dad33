"""Streaming job driver: epoch loop, normalize/route stages, watermark barrier.

Per epoch (a group of source Parquet files — the micro-batch, reference
``pcdm_to_delta.py:336-356``):

1. one raw ``_consume_block`` task per contiguous file group reads the
   Parquet block, applies the stateless normalize (zero-copy Arrow: derive
   doc_idx / event-time / Status / partition id) and routes (see
   ``_consume_block`` for why this innermost stage is tasks, not a Dataset);
2. routing slices each batch by ``hash(key) % N`` and pushes compact slices
   to the partition actors (at-least-once; actors dedupe by deterministic
   batch id);
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

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..synth import T0_US as _SYNTH_T0, event_time_us, _hash2
from .sink import EpochSink
from .state_actor import StreamPartitionActor

# window anchor == the event-time epoch of the generator: ONE definition
# (diverging silently would shift every window against the event times)
T0_US = int(_SYNTH_T0)
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
    # epochs of read/normalize/route to run ahead of the barrier (0 = none)
    prefetch: int = 1
    # consume tasks per epoch (None -> 2x cluster CPUs).  Part of the JOB
    # shape: fix it when comparing cluster sizes, like num_partitions.
    epoch_blocks: int | None = None
    # True = windowed aggregates over token CONTENT: every token is read and
    # reduced per row in the normalize stage (sum of token values), then the
    # payload is dropped — the window aggregate additionally reports
    # sum_tok_values.  The data-parallel work is then proportional to token
    # bytes, which is what the scaling legs measure.
    token_stats: bool = False
    # Stream-static (dimension) join: path to a small Parquet table with
    # columns (source:string, weight:int64).  Spark's stream-static INNER
    # join semantics, applied per micro-batch task-side against the
    # broadcast dimension: streamed rows whose source has no dimension row
    # are DROPPED before routing (they never reach actor state), matched
    # rows gain a weighted token contribution and every closed window
    # additionally reports sum_weighted = SUM(n_tok * weight).
    dim_path: str | None = None
    # "append" emits each window once, when the watermark closes it (the
    # engine's native mode); "update" ADDITIONALLY writes, per epoch, the
    # cross-actor merged RUNNING totals of every window touched by that
    # epoch's rows (Spark structured streaming's update output mode) to an
    # `updates` stream in the agg partition.  Tumbling/sliding only.
    output_mode: str = "append"
    # Actor placement on a multi-node cluster: "SPREAD" asks Ray to spread
    # the partition actors across nodes (each actor's barrier work then
    # scales with the node count and no single node hosts every state
    # store); None (default) leaves Ray's default packing — right for the
    # single-node sandbox where a placement constraint only adds scheduler
    # latency.  Partition COUNT stays fixed either way (routing contract).
    placement: str | None = None
    # False = aggregation-only job: the token payload is read and aggregated
    # but not re-materialized at the sink (the data-reduction path).  In this
    # sandbox every NEW byte through the object store page-faults at a fixed
    # host rate that does not scale with CPUs, so the payload-preserving sink
    # is fault-capped; scaling efficiency is measured on this compute path.
    sink_payload_rows: bool = True


def normalize_tokens(
    cfg_num_partitions: int,
    route_seed: int,
    with_payload: bool = True,
    token_stats: bool = False,
    dim_map: dict | None = None,
):
    """Stateless normalize: tokens row -> keyed event (Arrow, zero-copy for
    the `tokens` payload; only small derived columns are materialized).
    ``with_payload=False`` is the aggregation-only path — the tokens column
    never enters the pipeline (pruned at the read).  ``token_stats=True``
    reads and REDUCES the payload here (per-row sum of token values, one
    vectorized reduceat over the flat value buffer) and then drops it.

    ``dim_map`` ({source: int weight}) enables the stream-static inner
    join: unmatched rows are filtered HERE (task-side, before the shuffle
    to the partition actors — the join never adds state), matched rows
    gain ``wt = n_tok * weight``.  The per-batch cost is one dictionary
    encode of the (already dictionary-friendly) source column plus a
    category-count Python lookup — no per-row Python."""

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if dim_map is not None:
            enc = pc.dictionary_encode(batch["source"].combine_chunks())
            cat_w = np.array(
                [float(dim_map.get(c, np.nan)) for c in enc.dictionary.to_pylist()]
            )
            w_row = cat_w[enc.indices.to_numpy(zero_copy_only=False)]
            keep = ~np.isnan(w_row)
            if not keep.all():
                batch = batch.filter(pa.array(keep))
                w_row = w_row[keep]
            row_weights = w_row.astype(np.int64)

        # doc_idx from "doc-%08d" (vectorized slice+cast, no Python loop)
        idx = pc.cast(pc.utf8_slice_codeunits(batch["doc_id"], 4, 99), pa.int64())
        idx_np = idx.to_numpy(zero_copy_only=False)
        ts = event_time_us(idx_np)
        bad = (idx_np % 97) == 0  # row_status semantics, flag form
        part = (_hash2(route_seed, idx_np) % np.uint64(cfg_num_partitions)).astype(np.int32)
        # Status as a dictionary array: 6M rows cost two int8 buffers, not
        # 6M Python/numpy strings (row_status kept for the batch-query path)
        status = pa.DictionaryArray.from_arrays(
            pa.array(bad.astype(np.int8)), pa.array(["Good", "Bad"])
        )
        # agg mode drops doc_id after deriving doc_idx — the string column
        # would otherwise be ~40% of the routed bytes and is only needed when
        # payload rows reach the sink
        cols = {"doc_id": batch["doc_id"]} if with_payload else {}
        if with_payload:
            cols["tokens"] = batch["tokens"]
        cols.update(
            {
                "n_tok": batch["n_tok"],
                "source": batch["source"],
                "doc_idx": idx,
                "ts_us": pa.array(ts),
                "Status": status,
                "part": pa.array(part),
            }
        )
        if token_stats:
            tok = batch["tokens"].combine_chunks()
            offs = tok.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            # zero-copy int32 view; reduceat accumulates straight into int64
            # (no 8-byte cast temp of the whole flat token buffer)
            vals = tok.values.to_numpy(zero_copy_only=False)[offs[0] : offs[-1]]
            sums = np.zeros(len(batch), dtype=np.int64)
            ne = np.diff(offs) > 0
            if ne.any():
                sums[ne] = np.add.reduceat(vals, offs[:-1][ne] - offs[0], dtype=np.int64)
            cols["tok_sum"] = pa.array(sums)
        if dim_map is not None:
            cols["wt"] = pa.array(
                batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
                * row_weights
            )
        return pa.table(cols)

    return fn


@ray.remote
def _consume_block(files: list, cols, normalize_fn, router_fn) -> int:
    """Read one block of the epoch's files, normalize, route to the actors.

    A raw Ray task, not a Dataset op: each micro-batch epoch would otherwise
    pay ray.data's per-execution driver overhead (~0.5-1.5s measured), which
    is a fixed serial term that caps scaling efficiency.  The Dataset API has
    no way to express \"N short executions against a shared actor barrier\"
    without that per-execution cost, so the innermost consume stage drops to
    tasks; every batch query in this repo still uses ray.data end-to-end.
    """
    import pyarrow.parquet as pq

    # this task owns ONE cpu slot: a default Arrow pool of hardware-size
    # threads per task (32 tasks x 32 threads) thrashes the whole node
    pa.set_cpu_count(1)
    # Read+normalize PER FILE, concat the (numeric, payload-free in agg mode)
    # outputs, route once.  Normalizing one concatenated multi-file batch
    # allocates file-count-times-larger transients; with 32 such tasks in
    # flight the allocator churn collapsed throughput ~13x (measured) — small
    # per-file working sets stay in the allocator's reuse path.
    outs = [
        normalize_fn(pq.read_table(f, columns=cols, use_threads=False)) for f in files
    ]
    out = router_fn(pa.concat_tables(outs))
    return int(out["routed"][0].as_py()) if len(out) else 0


def make_router(actors: list, epoch: int, block_tag: int = 0):
    """map_batches fn: slice the batch per partition and push to actors.

    Blocks on the actor acks (backpressure); returns per-batch lineage
    counters.  Batch id = (block_tag, per-task batch counter) — stable under
    Ray task retries (a retried task re-iterates the same batches in the
    same order) but UNIQUE across the epoch's consume blocks, so two blocks
    that happen to route the same leading key are never conflated as a
    retry (a first-doc_idx id would drop a whole distinct slice when
    at-least-once sources re-send rows)."""
    seq = {"i": 0}

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"routed": pa.array([], pa.int64())})
        part = batch["part"].to_numpy(zero_copy_only=False)
        order = np.argsort(part, kind="stable")
        spart = part[order]
        bounds = np.searchsorted(spart, np.arange(len(actors) + 1))
        payload = batch.drop_columns(["part"])
        refs = []
        for p in range(len(actors)):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            if hi > lo:
                # per-partition take — NOT slice-of-sorted-batch: pickling an
                # Arrow slice ships the slice's FULL parent buffers (measured
                # 2.6MB for a 2900-row slice of a 93k-row batch), turning the
                # route into num_partitions full-batch copies; take() emits a
                # compact table, so exactly one payload copy leaves this task.
                sl = payload.take(pa.array(order[lo:hi]))
                batch_id = block_tag * 1_000_000 + seq["i"]
                refs.append(actors[p].ingest.remote(epoch, batch_id, sl))
        seq["i"] += 1
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


def merge_closed(
    results: list[dict], token_stats: bool = False, weighted: bool = False
) -> pa.Table:
    """Final stage of the salted window aggregate: merge per-actor partials.

    Vectorized: per-actor closed frames arrive as column arrays; one pandas
    groupby merges them (every actor reports every closed window, so this is
    O(#windows x #actors) rows and a Python-dict merge measurably dominated
    the driver at high partition counts)."""
    import pandas as pd

    frames = [
        pd.DataFrame(r["closed"]) for r in results if len(r["closed"].get("ws", ()))
    ]
    if frames:
        m = pd.concat(frames, ignore_index=True)
        g = (
            m.groupby(["source", "ws"], sort=True, as_index=False)
            .agg(cnt=("cnt", "sum"), s=("s", "sum"), mn=("mn", "min"),
                 mx=("mx", "max"), st=("st", "sum"), w=("w", "sum"))
        )
    else:
        g = pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                "ws": pd.Series([], dtype=np.int64),
                "cnt": pd.Series([], dtype=np.int64),
                "s": pd.Series([], dtype=np.int64),
                "mn": pd.Series([], dtype=np.int64),
                "mx": pd.Series([], dtype=np.int64),
                "st": pd.Series([], dtype=np.int64),
                "w": pd.Series([], dtype=np.int64),
            }
        )
    cnts = g["cnt"].to_numpy(dtype=np.int64)
    sums = g["s"].to_numpy(dtype=np.int64)
    with np.errstate(invalid="ignore"):
        avg = np.where(cnts > 0, sums / np.maximum(cnts, 1), np.nan)
    return pa.table(
        {
            "source": pa.array(g["source"].tolist(), pa.string()),
            "window_start": pa.array(
                g["ws"].to_numpy(dtype=np.int64).astype("datetime64[us]")
            ),
            "cnt": pa.array(cnts),
            "sum_n_tok": pa.array(sums),
            "avg_n_tok": pa.array(avg),
            "min_n_tok": pa.array(g["mn"].to_numpy(dtype=np.int64)),
            "max_n_tok": pa.array(g["mx"].to_numpy(dtype=np.int64)),
        }
        | (
            {"sum_tok_values": pa.array(g["st"].to_numpy(dtype=np.int64))}
            if token_stats
            else {}
        )
        | (
            {"sum_weighted": pa.array(g["w"].to_numpy(dtype=np.int64))}
            if weighted
            else {}
        )
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


WATERMARK_FLOOR_US = -(1 << 62)


def conservative_watermark(partition_maxes: list[int], lateness_us: int) -> int:
    """Event-time watermark = min over ALL partitions minus allowed lateness.

    A partition that has never received data (max ts < 0) holds the
    watermark at the floor (no windows close) rather than being skipped —
    skipping would let its eventual older rows be classified late.
    Conservative-only: emission is delayed until every partition has been
    reached (with key-hash routing that is the first epoch), never
    incorrect.  Pinned by ``tests/test_streaming.py``.
    """
    if partition_maxes and all(m >= 0 for m in partition_maxes):
        return min(partition_maxes) - lateness_us
    return WATERMARK_FLOOR_US


def spawn_actors(cfg: StreamConfig) -> list:
    """Spawn the fixed partition-actor pool for ``cfg`` (reusable across
    runs via ``StreamingJob(cfg, actors=...)`` + actor-side ``reset``)."""
    opts: dict = {"num_cpus": 0}
    if cfg.placement:
        opts["scheduling_strategy"] = cfg.placement
    return [
        StreamPartitionActor.options(**opts).remote(
            p,
            cfg.out_dir,
            cfg.window_s * 1_000_000,
            cfg.lateness_s * 1_000_000,
            T0_US,
            window_kind=cfg.window_kind,
            slide_us=cfg.slide_s * 1_000_000,
            gap_us=cfg.gap_s * 1_000_000,
            sink_payload_rows=cfg.sink_payload_rows,
            output_mode=cfg.output_mode,
        )
        for p in range(cfg.num_partitions)
    ]


class StreamingJob:
    def __init__(self, cfg: StreamConfig, actors: list | None = None):
        self.cfg = cfg
        self.external_actors = actors
        files = sorted(
            os.path.join(cfg.input_dir, f)
            for f in os.listdir(cfg.input_dir)
            if f.endswith(".parquet")
        )
        n = cfg.files_per_epoch
        self.epochs = [files[i : i + n] for i in range(0, len(files), n)]
        self.agg_sink = EpochSink(cfg.out_dir, AGG_PARTITION_ID)

    # config fields that define the JOB SHAPE: changing any of them across a
    # resume silently corrupts state (routing = hash % num_partitions; window
    # assignment and dedup horizons are keyed on the rest)
    _SHAPE_FIELDS = (
        "num_partitions", "window_s", "lateness_s", "files_per_epoch",
        "route_seed", "window_kind", "slide_s", "gap_s", "token_stats",
        "dim_path", "output_mode",
    )

    def _guard_job_shape(self, resume: bool) -> None:
        """Persist the job shape on a fresh run; REFUSE a resume whose config
        disagrees — resuming with e.g. a different num_partitions would
        misroute keys against the snapshotted dedup/window state and break
        exactly-once silently, which is far worse than failing loudly."""
        shape = {f: getattr(self.cfg, f) for f in self._SHAPE_FIELDS}
        path = os.path.join(self.cfg.out_dir, "manifests", "job.json")
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
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(shape, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def run(self, resume: bool = True, stop_after_epoch: int | None = None) -> dict:
        cfg = self.cfg
        self._guard_job_shape(resume)
        # num_cpus=0: the partition count is FIXED per job (key routing must
        # be stable across cluster sizes), so it is sized to the LARGEST
        # cluster the job will run on; reserving CPU per actor would starve
        # the read/normalize tasks on smaller clusters (actors only compute
        # at the epoch barrier, where the OS timeshares them fine).
        if self.external_actors is not None:
            actors = self.external_actors
            ray.get([a.reset.remote() for a in actors])
        else:
            actors = spawn_actors(cfg)
        try:
            start_epoch = 0
            sessions: dict = {}
            if resume:
                committed = [EpochSink(cfg.out_dir, p).last_committed_epoch()
                             for p in range(cfg.num_partitions)]
                committed.append(self.agg_sink.last_committed_epoch())
                start_epoch = min(committed) + 1
                if start_epoch > 0:
                    oks = ray.get([a.load_snapshot.remote(start_epoch - 1) for a in actors])
                    if not all(oks):
                        # every partition committed start_epoch-1 (that's how
                        # start_epoch was derived), so its snapshot MUST exist;
                        # proceeding with empty state would silently re-emit rows
                        # and corrupt aggregates
                        missing = [p for p, ok in enumerate(oks) if not ok]
                        raise RuntimeError(
                            f"resume: state snapshot for epoch {start_epoch - 1} "
                            f"missing on partition(s) {missing}"
                        )
                    sessions = _sessions_from_snapshot(
                        self.agg_sink.read_snapshot(start_epoch - 1, "sessions")
                    )

            totals = {"rows": 0, "tokens": 0, "late": 0, "dupes": 0}
            phase_s = {}  # summed across actors/epochs: where barrier time goes

            # Task sizing: group the epoch's files into ~2 blocks per CPU so
            # per-task fixed overhead amortizes at any cluster size (the key
            # routing is row-deterministic, so block layout never affects output).
            n_cpus = int(ray.cluster_resources().get("CPU", 8))

            # stream-static join dimension: read ONCE on the driver (small
            # by contract) and captured by value in the normalize closure —
            # it ships with each consume task spec, never per batch
            dim_map = None
            if cfg.dim_path:
                import pyarrow.parquet as _pq

                dim_t = _pq.read_table(cfg.dim_path, columns=["source", "weight"])
                dim_map = dict(
                    zip(
                        dim_t["source"].to_pylist(),
                        (int(w) for w in dim_t["weight"].to_pylist()),
                    )
                )
            norm_fn = normalize_tokens(
                cfg.num_partitions,
                cfg.route_seed,
                with_payload=cfg.sink_payload_rows,
                token_stats=cfg.token_stats,
                dim_map=dim_map,
            )
            cols = (
                None
                if (cfg.sink_payload_rows or cfg.token_stats)
                else ["doc_id", "n_tok", "source"]
            )
            block_target = cfg.epoch_blocks or int(
                os.environ.get("GRAFT_EPOCH_BLOCKS", str(n_cpus * 2))
            )

            def submit_epoch(e: int) -> list:
                """Launch one raw _consume_block task per contiguous file group
                (contiguous → each routed slice covers a doc_idx range, keeping
                the sink's zero-copy ordered fast path)."""
                files = self.epochs[e]
                blocks = max(1, min(len(files), block_target))
                sz = (len(files) + blocks - 1) // blocks
                groups = [files[i : i + sz] for i in range(0, len(files), sz)]
                return [
                    _consume_block.remote(g, cols, norm_fn, make_router(actors, e, gi))
                    for gi, g in enumerate(groups)
                ]

            # Epoch prefetch: epochs <= e+prefetch have their consume tasks in
            # flight while epoch e's barrier runs.  Safe because actor ingest
            # buffers are keyed by epoch and the watermark only counts epochs <= e.
            n_epochs = len(self.epochs)
            last = stop_after_epoch if stop_after_epoch is not None else n_epochs - 1
            last = min(last, n_epochs - 1)
            import time as _time

            timeline = []
            prefetch = max(0, cfg.prefetch)
            pending: dict[int, list] = {}
            if start_epoch <= last:
                pending[start_epoch] = submit_epoch(start_epoch)
            for e in range(start_epoch, last + 1):
                if e not in pending:  # prefetch=0
                    pending[e] = submit_epoch(e)
                for k in range(1, prefetch + 1):
                    if e + k <= last and e + k not in pending:
                        pending[e + k] = submit_epoch(e + k)
                t0 = _time.monotonic()
                ray.get(pending.pop(e))
                t_wait = _time.monotonic() - t0

                t0 = _time.monotonic()
                maxes = ray.get([a.epoch_max_ts.remote(e) for a in actors])
                wm = conservative_watermark(maxes, cfg.lateness_s * 1_000_000)
                results = ray.get([a.end_epoch.remote(e, wm) for a in actors])
                t_barrier = _time.monotonic() - t0
                t0 = _time.monotonic()
                streams = {"agg": merge_closed(results, cfg.token_stats, weighted=cfg.dim_path is not None)}
                if cfg.output_mode == "update":
                    # running totals for the UNION of keys touched this
                    # epoch: every actor reported ALL its open partials, so
                    # the cross-actor merge IS the current total per window
                    merged = merge_closed(
                        [{"closed": r["updated"]} for r in results],
                        cfg.token_stats, weighted=cfg.dim_path is not None,
                    )
                    tk = {
                        (str(sname), int(w))
                        for r in results
                        for sname, w in zip(r["touched"]["source"],
                                            r["touched"]["ws"])
                    }
                    if len(merged) and tk:
                        keys = list(
                            zip(
                                merged["source"].to_pylist(),
                                merged["window_start"]
                                .cast("int64").to_pylist(),
                            )
                        )
                        mask = pa.array([k in tk for k in keys])
                        streams["updates"] = merged.filter(mask)
                    else:
                        streams["updates"] = merged.slice(0, 0)
                if cfg.window_kind == "session":
                    for r in results:
                        merge_fragments(sessions, r.get("fragments", []), cfg.gap_s * 1_000_000)
                    streams["sessions"] = close_sessions(sessions, wm, cfg.gap_s * 1_000_000)
                if cfg.window_kind == "session":
                    # snapshot BEFORE the manifest: the manifest is the commit
                    # point resume keys on, so the state it implies must already
                    # be durable (a crash between them would otherwise silently
                    # drop every open session on resume)
                    self.agg_sink.write_snapshot(e, "sessions", _sessions_snapshot_table(sessions))
                self.agg_sink.commit_epoch(
                    e,
                    streams,
                    {"watermark": wm, "windows_closed": len(streams["agg"])},
                )
                if cfg.window_kind == "session":
                    self.agg_sink.gc_snapshots(e - 1)
                for r in results:
                    c = r["counters"]
                    totals["rows"] += c["rows_emitted"]
                    totals["tokens"] += c["tokens_emitted"]
                    totals["late"] += c["late_rows"]
                    totals["dupes"] += c["dupes_dropped"]
                    for k, v in r.get("timings", {}).items():
                        phase_s[k] = phase_s.get(k, 0.0) + v
                timeline.append({"epoch": e, "consume_wait_s": round(t_wait, 2),
                                 "barrier_s": round(t_barrier, 2),
                                 "post_s": round(_time.monotonic() - t0, 2)})

            for refs in pending.values():  # stop_after_epoch may leave prefetches
                ray.get(refs)
            if stop_after_epoch is not None and last < n_epochs - 1:
                if self.external_actors is None:
                    for a in actors:
                        ray.kill(a)
                return {"stopped_after": last, "totals": totals}

            # end of stream: flush remaining windows + sessions + latest registers
            final_epoch = len(self.epochs)
            if not self.agg_sink.committed(final_epoch):
                results = ray.get([a.flush_final.remote(final_epoch) for a in actors])
                streams = {
                    "agg": merge_closed(results, cfg.token_stats, weighted=cfg.dim_path is not None),
                    "latest": merge_latest(results),
                }
                if cfg.window_kind == "session":
                    streams["sessions"] = close_sessions(
                        sessions, 1 << 62, cfg.gap_s * 1_000_000
                    )
                self.agg_sink.commit_epoch(final_epoch, streams, {"final": True})
            if self.external_actors is None:
                for a in actors:
                    ray.kill(a)
            return {
                "epochs": len(self.epochs),
                "totals": totals,
                "actor_phase_seconds": {k: round(v, 2) for k, v in phase_s.items()},
                "timeline": timeline,
            }
        finally:
            # never leak the internally-spawned actor pool (and its
            # buffered payload tables) when the loop raises mid-epoch
            if self.external_actors is None:
                for a in actors:
                    try:
                        ray.kill(a)
                    except Exception:
                        pass
