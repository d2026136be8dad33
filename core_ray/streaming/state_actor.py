"""Per-partition stateful actor: keyed registers + salted window partials.

One actor owns ``hash(row_key) % num_partitions`` of the key space and holds
(SURVEY.md §2.5, §7.3):

- **merge-sink dedup state** (reference ``pcdm_to_delta.py:193-236``): a
  seen-key register so each (TagName, EventTime) is emitted exactly once
  across epochs and retried tasks; keys older than the watermark minus
  allowed lateness are evicted, so state is bounded by the lateness horizon,
  not the stream length;
- **latest-value registers per source** (reference
  ``pcdm_latest_to_delta.py:177-240``): the (EventTime, Status, Value)-max row
  and the Good-row variant, maintained monotonically — merge across actors is
  an argmax, so the registers are order-insensitive partials;
- **window partials**: per (agg_key, window_start) count/sum accumulators.
  Rows are routed by the HIGH-CARDINALITY row key, not the agg key, so a hot
  source (55% of rows) spreads over all actors; each actor holds partial
  sums and the driver merges them at emission — the two-stage salted
  aggregate (SURVEY.md §7.2 step 6).

Exactly-once guards:
- per-epoch ingest batch ids dedupe Ray task retries (at-least-once ingest,
  idempotent state update);
- all sink writes go through :class:`EpochSink` manifests (idempotent replay);
- emitted tables are sorted deterministically, so a replay — at any
  parallelism — produces byte-identical files.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .sink import EpochSink

TOKENS_COLS = ["doc_id", "tokens", "n_tok", "source", "doc_idx", "ts_us", "Status"]


def _empty_rows_table() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], pa.string()),
            "tokens": pa.array([], pa.list_(pa.int32())),
            "n_tok": pa.array([], pa.int32()),
            "source": pa.array([], pa.string()),
            "doc_idx": pa.array([], pa.int64()),
            "ts_us": pa.array([], pa.int64()),
            "Status": pa.array([], pa.string()),
        }
    )


@ray.remote
class StreamPartitionActor:
    def __init__(
        self,
        partition_id: int,
        out_dir: str,
        window_us: int,
        lateness_us: int,
        t0_us: int,
        window_kind: str = "tumbling",
        slide_us: int | None = None,
        gap_us: int | None = None,
        sink_payload_rows: bool = True,
    ):
        self.part = partition_id
        self.sink = EpochSink(out_dir, partition_id)
        self.window_us = window_us
        self.lateness_us = lateness_us
        self.t0_us = t0_us
        self.window_kind = window_kind
        self.slide_us = slide_us or window_us
        self.gap_us = gap_us or 300_000_000
        self.sink_payload_rows = sink_payload_rows

        # window partials: (source, ws) -> [cnt, sum_n_tok]
        self.partials: dict[tuple[str, int], list[int]] = {}
        # latest registers: source -> dict(ts, status, value, good_ts, good_value)
        self.latest: dict[str, dict] = {}
        # dedup horizon state: doc_idx -> ts_us
        self.seen: dict[int, int] = {}
        self.max_ts = -1  # from restored snapshots (epochs before resume)
        # per-epoch transient state, keyed by epoch so a prefetching driver
        # may ingest epoch e+1 while epoch e's barrier is still running
        self._epoch_rows: dict[int, list[pa.Table]] = {}
        self._epoch_batch_ids: dict[int, set[int]] = {}
        self._epoch_max: dict[int, int] = {}
        self._late = 0
        self._dupes = 0
        self.watermark = -(1 << 62)

    # -- resume -------------------------------------------------------------

    def load_snapshot(self, epoch: int) -> bool:
        """Restore state as of the END of ``epoch`` (so replay starts at
        epoch+1). Returns False if no snapshot exists (fresh start)."""
        t = self.sink.read_snapshot(epoch, "state")
        if t is None:
            return False
        meta = {k.decode(): v.decode() for k, v in (t.schema.metadata or {}).items()}
        self.max_ts = int(meta.get("max_ts", -1))
        self.watermark = int(meta.get("watermark", -(1 << 62)))
        self.partials = {}
        self.latest = {}
        self.seen = {}
        kind = t["kind"].to_pylist()
        for i in range(len(t)):
            k = kind[i]
            if k == "partial":
                key = (t["skey"][i].as_py(), t["ws"][i].as_py())
                self.partials[key] = [
                    t["cnt"][i].as_py(),
                    t["sum_n_tok"][i].as_py(),
                    int(t["status"][i].as_py()),
                    t["good_value"][i].as_py(),
                ]
            elif k == "seen":
                self.seen[t["ws"][i].as_py()] = t["cnt"][i].as_py()
            elif k == "latest":
                self.latest[t["skey"][i].as_py()] = {
                    "ts": t["ws"][i].as_py(),
                    "value": t["cnt"][i].as_py(),
                    "status": t["status"][i].as_py(),
                    "good_ts": t["sum_n_tok"][i].as_py(),
                    "good_value": t["good_value"][i].as_py(),
                }
        return True

    def _snapshot_table(self) -> pa.Table:
        # partials and latest are small; `seen` is bounded by the lateness
        # horizon (evicted every epoch) — bulk-convert it without a Python
        # loop anyway, in case lateness is configured large.
        kinds, skeys, wss, cnts, sums, statuses, goodv = [], [], [], [], [], [], []
        for (src, ws), (cnt, s, mn, mx) in self.partials.items():
            kinds.append("partial"); skeys.append(src); wss.append(ws)
            # min/max packed into the status/good_value slots of the generic row
            cnts.append(cnt); sums.append(s); statuses.append(str(mn)); goodv.append(mx)
        n_seen = len(self.seen)
        if n_seen:
            kinds.extend(["seen"] * n_seen)
            skeys.extend([None] * n_seen)
            wss.extend(self.seen.keys())
            cnts.extend(self.seen.values())
            sums.extend([None] * n_seen)
            statuses.extend([None] * n_seen)
            goodv.extend([None] * n_seen)
        for src, reg in self.latest.items():
            kinds.append("latest"); skeys.append(src); wss.append(reg["ts"])
            cnts.append(reg["value"]); sums.append(reg["good_ts"])
            statuses.append(reg["status"]); goodv.append(reg["good_value"])
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "skey": pa.array(skeys, pa.string()),
                "ws": pa.array(wss, pa.int64()),
                "cnt": pa.array(cnts, pa.int64()),
                "sum_n_tok": pa.array(sums, pa.int64()),
                "status": pa.array(statuses, pa.string()),
                "good_value": pa.array(goodv, pa.int64()),
            }
        ).replace_schema_metadata(
            {"max_ts": str(self.max_ts), "watermark": str(self.watermark)}
        )

    # -- ingest -------------------------------------------------------------

    def ingest(self, epoch: int, batch_id: int, table: pa.Table) -> int:
        """Idempotent per-epoch ingest of a routed slice (Arrow, zero-copy)."""
        ids = self._epoch_batch_ids.setdefault(epoch, set())
        if batch_id in ids:  # Ray task retry redelivery
            return 0
        ids.add(batch_id)
        self._epoch_rows.setdefault(epoch, []).append(table)

        ts = table["ts_us"].to_numpy()
        if len(ts):
            self._epoch_max[epoch] = max(self._epoch_max.get(epoch, -1), int(ts.max()))
        return len(table)

    def epoch_max_ts(self, upto_epoch: int) -> int:
        """Max event time over epochs <= upto_epoch only — rows already
        buffered for LATER epochs must not advance the watermark, or windows
        would close before those rows are applied."""
        vals = [v for k, v in self._epoch_max.items() if k <= upto_epoch]
        return max([self.max_ts] + vals)

    # -- epoch barrier ------------------------------------------------------

    def end_epoch(self, epoch: int, watermark_us: int) -> dict:
        """Apply this epoch's rows to state, emit sink rows, return closed
        window partials for the driver-side salted merge."""
        import time

        t_start = time.monotonic()
        buffered = self._epoch_rows.pop(epoch, [])
        self._epoch_batch_ids.pop(epoch, None)
        frontier = self.max_ts  # max event time seen BEFORE this epoch
        if epoch in self._epoch_max:
            self.max_ts = max(self.max_ts, self._epoch_max.pop(epoch))
        rows = pa.concat_tables(buffered) if buffered else _empty_rows_table()
        timings = {"concat": time.monotonic() - t_start}
        t_mark = time.monotonic()
        prev_watermark = self.watermark
        self.watermark = max(self.watermark, watermark_us)

        # Control-plane columns only — the `tokens` payload stays untouched
        # (zero-copy in the object store) until the single `take` at the sink.
        # Every extra filter/sort of the payload costs a full copy, which this
        # VM's page-fault behavior makes ~10x the compute cost (measured).
        idx = rows["doc_idx"].to_numpy()
        ts = rows["ts_us"].to_numpy()
        n_tok = rows["n_tok"].to_numpy()
        sources = rows["source"].to_numpy(zero_copy_only=False)
        status = rows["Status"].to_numpy(zero_copy_only=False)

        # --- dedup (exactly-once row emission across epochs/retries).
        # Vectorized: rows beyond the pre-epoch event-time frontier cannot be
        # cross-epoch duplicates, so the Python dict check runs only on the
        # (usually tiny) overlap region; intra-epoch duplicates are dropped
        # by keeping the first occurrence per doc_idx.
        if len(idx):
            fresh = np.ones(len(idx), dtype=bool)
            cand = np.nonzero(ts <= frontier)[0]
            if len(cand):
                fresh[cand] = np.fromiter(
                    (i not in self.seen for i in idx[cand].tolist()),
                    bool,
                    count=len(cand),
                )
            _, first_pos = np.unique(idx, return_index=True)
            intra_first = np.zeros(len(idx), dtype=bool)
            intra_first[first_pos] = True
            fresh &= intra_first
            late = ts < prev_watermark  # window may already be closed
            self.seen.update(zip(idx[fresh].tolist(), ts[fresh].tolist()))
        else:
            fresh = np.zeros(0, dtype=bool)
            late = fresh
        on_time = fresh & ~late
        n_late = int((fresh & late).sum())
        n_dupes = int((~fresh).sum())

        timings["dedup"] = time.monotonic() - t_mark
        t_mark = time.monotonic()

        # --- window partials (on-time rows only; late go to the side output)
        fragments: list = []
        if on_time.any():
            if self.window_kind == "session":
                fragments = self._session_fragments(
                    sources[on_time], ts[on_time], n_tok[on_time]
                )
            else:
                if self.window_kind == "sliding":
                    from ..windows import sliding_window_starts

                    ridx, ws = sliding_window_starts(
                        ts[on_time], self.t0_us, self.window_us, self.slide_us
                    )
                    srcs_w = sources[on_time][ridx]
                    ntok_w = n_tok[on_time][ridx]
                else:  # tumbling
                    ws = self.t0_us + (
                        (ts[on_time] - self.t0_us) // self.window_us
                    ) * self.window_us
                    srcs_w = sources[on_time]
                    ntok_w = n_tok[on_time]
                small = pa.table(
                    {
                        "source": pa.array(srcs_w),
                        "ws": pa.array(ws),
                        "n_tok": pa.array(ntok_w),
                    }
                )
                g = small.group_by(["source", "ws"], use_threads=False).aggregate(
                    [("n_tok", "count"), ("n_tok", "sum"), ("n_tok", "min"), ("n_tok", "max")]
                )
                for src, w, cnt, s, mn, mx in zip(
                    g["source"].to_pylist(),
                    g["ws"].to_pylist(),
                    g["n_tok_count"].to_pylist(),
                    g["n_tok_sum"].to_pylist(),
                    g["n_tok_min"].to_pylist(),
                    g["n_tok_max"].to_pylist(),
                ):
                    acc = self.partials.setdefault(
                        (src, w), [0, 0, 1 << 62, -(1 << 62)]
                    )
                    acc[0] += cnt
                    acc[1] += s
                    acc[2] = min(acc[2], mn)
                    acc[3] = max(acc[3], mx)

            # --- latest registers (argmax by (ts, value); Good variant)
            self._update_latest(
                sources[on_time], ts[on_time], n_tok[on_time], status[on_time]
            )

        timings["window"] = time.monotonic() - t_mark
        t_mark = time.monotonic()

        # --- emit closed windows (ws + window <= watermark)
        closed = {
            k: v for k, v in self.partials.items() if k[1] + self.window_us <= self.watermark
        }
        for k in closed:
            del self.partials[k]

        # --- sink: deterministic order, idempotent commit.  combine_chunks
        # FIRST: the epoch buffer is hundreds of small ingested slices, and
        # Arrow's take on a many-chunk list column is superlinear (measured
        # 90x at 160 chunks); one linear combine + one contiguous gather is
        # the only copy of the token payload.
        kept_pos = np.nonzero(fresh)[0]
        if self.sink_payload_rows:
            order = np.argsort(idx[fresh], kind="stable")
            rows = rows.combine_chunks()
            out_rows = rows.take(pa.array(kept_pos[order]))
        else:
            out_rows = rows.slice(0, 0)
        counters = {
            "rows_in": len(idx),
            "rows_emitted": int(fresh.sum()),
            "tokens_emitted": int(n_tok[fresh].sum()),
            "late_rows": n_late,
            "dupes_dropped": n_dupes,
            "watermark": self.watermark,
        }
        timings["sort"] = time.monotonic() - t_mark
        t_mark = time.monotonic()
        self.sink.commit_epoch(epoch, {"rows": out_rows}, counters)
        timings["sink"] = time.monotonic() - t_mark
        t_mark = time.monotonic()

        # --- evict dedup state below the lateness horizon EVERY epoch:
        # `seen` (and its snapshot) must stay bounded by the lateness window,
        # not the stream length — an unevicted dict made snapshot cost grow
        # superlinearly with stream position (measured at 8M rows).
        horizon = self.watermark - self.lateness_us
        if self.seen:
            self.seen = {k: v for k, v in self.seen.items() if v >= horizon}

        # --- snapshot for resume (state as of END of this epoch)
        self.sink.write_snapshot(epoch, "state", self._snapshot_table())
        self.sink.gc_snapshots(epoch - 1)
        timings["snapshot"] = time.monotonic() - t_mark
        timings["total"] = time.monotonic() - t_start

        return {
            "partition": self.part,
            "closed": {f"{src}\x00{w}": v for (src, w), v in closed.items()},
            "fragments": fragments,
            "counters": counters,
            "timings": timings,
        }

    def _session_fragments(self, sources, tss, vals) -> list:
        """Actor-local session fragments per agg key from this epoch's rows.

        A fragment over a SUBSET of a key's events is always a sub-session of
        the true session (connectivity in the subset implies connectivity in
        the full set), so the driver's global gap-merge of all actors'
        fragments reconstructs exact sessionization."""
        from ..windows import session_ids

        out = []
        order = np.lexsort((tss,))
        srcs = sources[order]
        ts_s = tss[order]
        v_s = vals[order]
        for src in np.unique(srcs):
            m = srcs == src
            t = ts_s[m]
            v = v_s[m]
            sid = session_ids(t, self.gap_us)
            for s in np.unique(sid):
                sm = sid == s
                out.append(
                    (
                        str(src),
                        int(t[sm].min()),
                        int(t[sm].max()),
                        int(sm.sum()),
                        int(v[sm].sum()),
                    )
                )
        return out

    def _update_latest(self, sources, tss, vals, status) -> None:
        order = np.lexsort((vals, tss))[::-1]  # descending (ts, value)
        srcs = sources[order].tolist()
        tss = tss[order].tolist()
        vals = vals[order].tolist()
        stats = status[order].tolist()
        seen_src: set[str] = set()
        seen_good: set[str] = set()
        for src, tsv, val, st in zip(srcs, tss, vals, stats):
            if src not in seen_src:
                seen_src.add(src)
                reg = self.latest.setdefault(
                    src,
                    {"ts": -1, "value": 0, "status": "", "good_ts": -1, "good_value": 0},
                )
                if (tsv, val) > (reg["ts"], reg["value"]):
                    reg["ts"], reg["value"], reg["status"] = tsv, val, st
            if st != "Bad" and src not in seen_good:
                seen_good.add(src)
                reg = self.latest[src]
                if (tsv, val) > (reg["good_ts"], reg["good_value"]):
                    reg["good_ts"], reg["good_value"] = tsv, val

    # -- end of stream ------------------------------------------------------

    def flush_final(self, epoch: int) -> dict:
        """Emit all remaining open windows and the latest registers."""
        closed = dict(self.partials)
        self.partials = {}
        latest = {
            src: dict(reg) for src, reg in self.latest.items()
        }
        return {
            "partition": self.part,
            "closed": {f"{src}\x00{w}": v for (src, w), v in closed.items()},
            "latest": latest,
        }
