"""Streaming WINDOWED QUANTILE registers (continuous exact percentiles).

The streaming analog of the batch discrete-quantile operators
(``functions/sketches.py`` ``group_quantiles_exact``) on the token-value
axis: as micro-batch epochs of ``(doc_id, tokens, n_tok, source)`` rows
arrive, each partition actor maintains, per ``(source, tumbling window)``,
the exact HISTOGRAM of token values seen in that window, and emits per
epoch the registers' current discrete quantiles (p50/p90/p99 by default) —
the continuously-updated latency-percentile-style dashboard, computed over
the data distribution instead of a t-digest approximation.

Exactness: token ids live in a bounded vocabulary, so the per-window
histogram is bounded integer state (<= vocab int64 cells per open window)
and the quantile is the value at 1-based rank ``max(1, ceil(q * n))`` in
the window's sorted multiset — DuckDB's ``quantile_disc`` rule, evaluated
over the SAME float64 product, so the streamed registers are exactly
SQL-reproducible at any epoch (the exact-regime contract; for unbounded
double domains the batch t-digest is the fallback).

Scale shape (the combiner discipline): consume tasks assign event-time
windows from the row index (FIXTURES F1), ``bincount`` each (source,
window) group's token slice — one vectorized pass over the payload — and
route only the NONZERO ``(source, window, token, cnt)`` partials, keyed by
``hash(source, window)`` so each register lives in exactly ONE partition;
the token payload never crosses the shuffle, and per epoch a partition
receives at most O(windows_in_epoch x vocab / P) histogram entries no
matter how many tokens the epoch carries.

Exactly-once / resume: the ``EpochSink`` protocol shared by every streaming
shape — idempotent per-(epoch, batch) ingest, deterministic per-(partition,
epoch) quantile files, atomic manifests, per-epoch register snapshots; a
run killed after epoch k and resumed is byte-identical to an unbroken run.

Reference anchor: rtdip's summary/resample queries publish percentile-free
aggregates (``queries/time_series/summary.py``); this register family adds
the percentile column a monitoring consumer of those summaries asks for
first, kept exact and streaming.
"""

from __future__ import annotations

import json
import math
import os
import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray

from ..synth import event_time_us
from .sink import EpochSink

_Q_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("window_start", pa.timestamp("us")),
    ("q_permille", pa.int64()),
    ("value", pa.int64()),
])

_SNAP_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("window_start", pa.int64()),
    ("token", pa.int64()),
    ("cnt", pa.int64()),
])


@dataclass
class QuantileConfig:
    input_dir: str
    out_dir: str
    num_partitions: int = 8
    files_per_epoch: int = 1
    window_s: int = 60
    qs_permille: tuple[int, ...] = (500, 900, 990)


def _list_files(d: str) -> list[str]:
    return sorted(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet"))


def _route(source: str, window_start_us: int, window_us: int, n_parts: int) -> int:
    """Deterministic (source, window) -> partition routing: crc32 of the
    source string mixed with the window index.  Stable across runs and
    processes (no PYTHONHASHSEED dependence), so resume re-routes partials
    to the partition whose snapshot holds the register."""
    return int(
        (zlib.crc32(source.encode()) + window_start_us // window_us)
        % n_parts
    )


def _disc_quantiles(
    tokens: np.ndarray, cnts: np.ndarray, qs: tuple[int, ...]
) -> list[int]:
    """quantile_disc over a (sorted-by-token) histogram: value at 1-based
    rank max(1, ceil(q * n)) of the expanded multiset."""
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    out = []
    for q in qs:
        rank = max(1, math.ceil((q / 1000.0) * n))
        out.append(int(tokens[int(np.searchsorted(cum, rank, side="left"))]))
    return out


@ray.remote(num_cpus=0)
class QuantilePartitionActor:
    """Owns every (source, window) register routed to this partition:
    buffers the epoch's histogram partials, folds them at the barrier,
    emits every owned register's current quantiles."""

    def __init__(self, partition_id: int, out_dir: str,
                 qs_permille: tuple[int, ...]):
        pa.set_cpu_count(1)
        self.part = partition_id
        self.qs = tuple(qs_permille)
        self.out_dir = out_dir
        self.reset()

    def reset(self) -> bool:
        self.sink = EpochSink(self.out_dir, self.part)
        # (source, window_start_us) -> int64 histogram (grown on demand)
        self.hists: dict[tuple[str, int], np.ndarray] = {}
        self.tokens_in = 0
        self._epoch_rows: dict[int, list[pa.Table]] = {}
        self._epoch_ids: dict[int, set] = {}
        return True

    def ingest(self, epoch: int, batch_id: int, table: pa.Table) -> int:
        ids = self._epoch_ids.setdefault(epoch, set())
        if batch_id in ids:  # task-retry redelivery must not double-count
            return 0
        ids.add(batch_id)
        self._epoch_rows.setdefault(epoch, []).append(table)
        return len(table)

    def _fold(self, src: str, wstart: int, tok: np.ndarray, cnt: np.ndarray):
        key = (src, wstart)
        h = self.hists.get(key)
        need = int(tok.max()) + 1
        if h is None:
            h = np.zeros(need, dtype=np.int64)
            self.hists[key] = h
        elif need > len(h):
            g = np.zeros(need, dtype=np.int64)
            g[: len(h)] = h
            self.hists[key] = h = g
        np.add.at(h, tok, cnt)

    def _quantile_table(self) -> pa.Table:
        srcs, wins, qs_out, vals = [], [], [], []
        for (src, wstart) in sorted(self.hists):
            h = self.hists[(src, wstart)]
            nz = np.flatnonzero(h)
            if len(nz) == 0:
                continue
            v = _disc_quantiles(nz, h[nz], self.qs)
            for q, val in zip(self.qs, v):
                srcs.append(src)
                wins.append(wstart)
                qs_out.append(q)
                vals.append(val)
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "window_start": pa.array(wins, pa.timestamp("us")),
                "q_permille": pa.array(qs_out, pa.int64()),
                "value": pa.array(vals, pa.int64()),
            },
            schema=_Q_SCHEMA,
        )

    def end_epoch(self, epoch: int) -> dict:
        tables = self._epoch_rows.pop(epoch, [])
        self._epoch_ids.pop(epoch, None)
        added = 0
        for t in tables:
            src_arr = t["source"].to_pylist()
            ws = t["window_start"].to_numpy(zero_copy_only=False)
            tok = t["token"].to_numpy(zero_copy_only=False)
            cnt = t["cnt"].to_numpy(zero_copy_only=False)
            # partials arrive grouped by (source, window) runs
            changes = np.flatnonzero(
                (ws[1:] != ws[:-1])
                | (np.array(src_arr[1:]) != np.array(src_arr[:-1]))
            ) + 1 if len(ws) > 1 else np.array([], np.int64)
            bounds = np.concatenate(([0], changes, [len(ws)]))
            for bi in range(len(bounds) - 1):
                lo, hi = int(bounds[bi]), int(bounds[bi + 1])
                self._fold(src_arr[lo], int(ws[lo]), tok[lo:hi], cnt[lo:hi])
                added += int(cnt[lo:hi].sum())
        self.tokens_in += added
        out = self._quantile_table()
        counters = {
            "tokens_in": added,
            "tokens_total": self.tokens_in,
            "open_windows": len(self.hists),
            "state_bytes": sum(h.nbytes for h in self.hists.values()),
        }
        # snapshot BEFORE the manifest commit point (see freq.py)
        # snapshot: nonzero histogram entries of every register
        srcs, wins, toks, cnts = [], [], [], []
        for (src, wstart) in sorted(self.hists):
            h = self.hists[(src, wstart)]
            nz = np.flatnonzero(h)
            srcs.extend([src] * len(nz))
            wins.extend([wstart] * len(nz))
            toks.append(nz)
            cnts.append(h[nz])
        snap = pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "window_start": pa.array(wins, pa.int64()),
                "token": pa.array(
                    np.concatenate(toks) if toks else np.array([], np.int64),
                    pa.int64()),
                "cnt": pa.array(
                    np.concatenate(cnts) if cnts else np.array([], np.int64),
                    pa.int64()),
            },
            schema=_SNAP_SCHEMA,
        ).replace_schema_metadata({"tokens_in": str(self.tokens_in)})
        self.sink.write_snapshot(epoch, "qhist", snap)
        self.sink.commit_epoch(epoch, {"quantiles": out}, counters)
        self.sink.gc_snapshots(epoch - 1)
        return counters

    def load_snapshot(self, epoch: int) -> bool:
        t = self.sink.read_snapshot(epoch, "qhist")
        if t is None:
            return False
        meta = {k.decode(): v.decode() for k, v in (t.schema.metadata or {}).items()}
        self.tokens_in = int(meta.get("tokens_in", 0))
        self.hists = {}
        src_arr = t["source"].to_pylist()
        ws = t["window_start"].to_numpy(zero_copy_only=False)
        tok = t["token"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        if len(ws) == 0:
            return True
        # snapshot rows are written grouped by (source, window): rebuild
        # each register with one vectorized scatter per run
        changes = np.flatnonzero(
            (ws[1:] != ws[:-1])
            | (np.array(src_arr[1:]) != np.array(src_arr[:-1]))
        ) + 1 if len(ws) > 1 else np.array([], np.int64)
        bounds = np.concatenate(([0], changes, [len(ws)]))
        for bi in range(len(bounds) - 1):
            lo, hi = int(bounds[bi]), int(bounds[bi + 1])
            tk, ct = tok[lo:hi], cnt[lo:hi]
            h = np.zeros(int(tk.max()) + 1, dtype=np.int64)
            h[tk] = ct
            self.hists[(src_arr[lo], int(ws[lo]))] = h
        return True


@ray.remote
def _consume_quantile(
    files: list, actors: list, epoch: int, base_id: int, window_s: int
) -> int:
    """Read one file group, window-assign rows from the deterministic event
    time, bincount each (source, window) group's token slice, route nonzero
    (source, window, token, cnt) partials by register owner."""
    import pyarrow.parquet as pq

    pa.set_cpu_count(1)
    n_parts = len(actors)
    window_us = window_s * 1_000_000
    routed = 0
    for fi, f in enumerate(files):
        t = pq.read_table(f, columns=["doc_id", "tokens", "source"],
                          use_threads=False)
        if len(t) == 0:
            continue
        import pyarrow.compute as pc

        # vectorized doc_idx (no per-row Python; same kernel as job.py)
        idx = pc.cast(
            pc.utf8_slice_codeunits(t["doc_id"], 4, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        ev = event_time_us(idx)
        wstart = (ev // window_us) * window_us
        # dictionary-encode source: group on the ACTUAL category (a crc
        # collision between two sources would silently merge their
        # histograms), Python work bounded by #distinct sources
        enc = pc.dictionary_encode(t["source"].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cats = enc.dictionary.to_pylist()
        toks = t["tokens"].combine_chunks()
        # absolute offsets into the full child array (robust to slices)
        flat = toks.values.to_numpy(zero_copy_only=False)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        # group rows by (source, window): sort once; one flat token gather
        # in group order, then per-GROUP bincounts (loop count = #distinct
        # (source, window) pairs, not rows)
        order = np.lexsort((wstart, codes))
        scode, sw = codes[order], wstart[order]
        row_len = (offs[1:] - offs[:-1])[order]
        cum = np.concatenate(([0], np.cumsum(row_len)))
        pos_within = np.arange(cum[-1], dtype=np.int64) - np.repeat(
            cum[:-1], row_len
        )
        vals_sorted = flat[np.repeat(offs[:-1][order], row_len) + pos_within]
        change = np.flatnonzero(
            (scode[1:] != scode[:-1]) | (sw[1:] != sw[:-1])
        ) + 1
        row_bounds = np.concatenate(([0], change, [len(order)]))
        parts_rows: dict[int, list] = {}
        for gi in range(len(row_bounds) - 1):
            rlo, rhi = int(row_bounds[gi]), int(row_bounds[gi + 1])
            vals = vals_sorted[cum[rlo]: cum[rhi]]
            if not len(vals):
                continue
            bc = np.bincount(vals)
            tok_nz = np.flatnonzero(bc)
            s_name, w0 = cats[int(scode[rlo])], int(sw[rlo])
            p = _route(s_name, w0, window_us, n_parts)
            parts_rows.setdefault(p, []).append(
                (s_name, w0, tok_nz, bc[tok_nz]))
        refs = []
        for p, groups in parts_rows.items():
            srcs, wins, tks, cts = [], [], [], []
            for s, w, tk, ct in groups:
                srcs.extend([s] * len(tk))
                wins.extend([w] * len(tk))
                tks.append(tk)
                cts.append(ct)
            sl = pa.table(
                {
                    "source": pa.array(srcs, pa.string()),
                    "window_start": pa.array(wins, pa.int64()),
                    "token": pa.array(np.concatenate(tks), pa.int64()),
                    "cnt": pa.array(np.concatenate(cts), pa.int64()),
                }
            )
            refs.append(actors[p].ingest.remote(epoch, base_id * 1_000_000 + fi, sl))
        routed += sum(ray.get(refs)) if refs else 0
    return routed


class StreamQuantileJob:
    def __init__(self, cfg: QuantileConfig):
        self.cfg = cfg
        files = _list_files(cfg.input_dir)
        n = cfg.files_per_epoch
        self.epochs = [files[i: i + n] for i in range(0, len(files), n)]

    _SHAPE_FIELDS = ("num_partitions", "files_per_epoch", "window_s",
                     "qs_permille")

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
            QuantilePartitionActor.remote(p, cfg.out_dir, cfg.qs_permille)
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
                    oks = ray.get(
                        [a.load_snapshot.remote(start - 1) for a in actors])
                    if not all(oks):
                        missing = [p for p, ok in enumerate(oks) if not ok]
                        raise RuntimeError(
                            f"resume: quantile snapshot for epoch {start - 1}"
                            f" missing on partition(s) {missing}"
                        )
            last = len(self.epochs) - 1
            if stop_after_epoch is not None:
                last = min(last, stop_after_epoch)
            totals = {"tokens_in": 0}
            for e in range(start, last + 1):
                ray.get(_consume_quantile.remote(
                    self.epochs[e], actors, e, e, cfg.window_s))
                results = ray.get([a.end_epoch.remote(e) for a in actors])
                for c in results:
                    totals["tokens_in"] += c["tokens_in"]
            return {"epochs": len(self.epochs), "last_run": last,
                    "totals": totals}
        finally:
            for a in actors:
                try:
                    ray.kill(a)
                except Exception:
                    pass


def final_quantiles(out_dir: str, num_partitions: int):
    """The registers' answer after the last committed epoch: each (source,
    window) lives in exactly one partition, so the union of the partitions'
    final quantile files IS the global answer."""
    import pyarrow.parquet as pq

    import ray.data

    parts = []
    for p in range(num_partitions):
        sink = EpochSink(out_dir, p)
        e = sink.last_committed_epoch()
        if e < 0:
            continue
        man = sink.read_manifest(e)
        entry = man["files"].get("quantiles")
        if entry is None:
            continue
        parts.append(
            pq.read_table(os.path.join(out_dir, f"part={p:04d}", entry["file"]))
        )
    if not parts:
        return ray.data.from_arrow(_Q_SCHEMA.empty_table())
    return ray.data.from_arrow(pa.concat_tables(parts)).sort(
        ["source", "window_start", "q_permille"])
