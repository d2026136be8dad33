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
    ):
        self.part = partition_id
        self.sink = EpochSink(out_dir, partition_id)
        self.window_us = window_us
        self.lateness_us = lateness_us
        self.t0_us = t0_us

        # window partials: (source, ws) -> [cnt, sum_n_tok]
        self.partials: dict[tuple[str, int], list[int]] = {}
        # latest registers: source -> dict(ts, status, value, good_ts, good_value)
        self.latest: dict[str, dict] = {}
        # dedup horizon state: doc_idx -> ts_us
        self.seen: dict[int, int] = {}
        self.max_ts = -1
        # per-epoch transient state
        self._epoch_rows: list[pa.Table] = []
        self._epoch_batch_ids: set[int] = set()
        self._epoch = -1
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
                self.partials[key] = [t["cnt"][i].as_py(), t["sum_n_tok"][i].as_py()]
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
        kinds, skeys, wss, cnts, sums, statuses, goodv = [], [], [], [], [], [], []
        for (src, ws), (cnt, s) in self.partials.items():
            kinds.append("partial"); skeys.append(src); wss.append(ws)
            cnts.append(cnt); sums.append(s); statuses.append(None); goodv.append(None)
        for idx, ts in self.seen.items():
            kinds.append("seen"); skeys.append(None); wss.append(idx)
            cnts.append(ts); sums.append(None); statuses.append(None); goodv.append(None)
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
        if epoch != self._epoch:
            self._epoch = epoch
            self._epoch_rows = []
            self._epoch_batch_ids = set()
            self._late = 0
            self._dupes = 0
        if batch_id in self._epoch_batch_ids:  # Ray task retry redelivery
            return 0
        self._epoch_batch_ids.add(batch_id)
        self._epoch_rows.append(table)

        ts = table["ts_us"].to_numpy()
        if len(ts):
            self.max_ts = max(self.max_ts, int(ts.max()))
        return len(table)

    def epoch_max_ts(self) -> int:
        return self.max_ts

    # -- epoch barrier ------------------------------------------------------

    def end_epoch(self, epoch: int, watermark_us: int) -> dict:
        """Apply this epoch's rows to state, emit sink rows, return closed
        window partials for the driver-side salted merge."""
        rows = (
            pa.concat_tables(self._epoch_rows) if self._epoch_rows else _empty_rows_table()
        )
        self._epoch_rows = []
        prev_watermark = self.watermark
        self.watermark = max(self.watermark, watermark_us)

        idx = rows["doc_idx"].to_numpy()
        ts = rows["ts_us"].to_numpy()

        # --- dedup (exactly-once row emission across epochs/retries)
        if len(idx):
            fresh_mask = np.fromiter(
                (i not in self.seen for i in idx.tolist()), bool, count=len(idx)
            )
            # late = below the PREVIOUS watermark (its window may have closed)
            late_mask = ts < prev_watermark
            self._dupes += int((~fresh_mask).sum())
            self._late += int((fresh_mask & late_mask).sum())
            keep = fresh_mask
            self.seen.update(zip(idx[keep].tolist(), ts[keep].tolist()))
            rows = rows.filter(pa.array(keep))
            on_time = rows.filter(pa.array(~late_mask[keep]))
            late_rows = rows.filter(pa.array(late_mask[keep]))
        else:
            on_time = rows
            late_rows = rows.slice(0, 0)

        # --- window partials (on-time rows only; late go to the side output)
        if len(on_time):
            ws = self.t0_us + (
                (on_time["ts_us"].to_numpy() - self.t0_us) // self.window_us
            ) * self.window_us
            g = (
                on_time.append_column("ws", pa.array(ws))
                .group_by(["source", "ws"], use_threads=False)
                .aggregate([("n_tok", "count"), ("n_tok", "sum")])
            )
            for src, w, cnt, s in zip(
                g["source"].to_pylist(),
                g["ws"].to_pylist(),
                g["n_tok_count"].to_pylist(),
                g["n_tok_sum"].to_pylist(),
            ):
                acc = self.partials.setdefault((src, w), [0, 0])
                acc[0] += cnt
                acc[1] += s

            # --- latest registers (argmax by (ts, value); Good variant)
            self._update_latest(on_time)

        # --- emit closed windows (ws + window <= watermark)
        closed = {
            k: v for k, v in self.partials.items() if k[1] + self.window_us <= self.watermark
        }
        for k in closed:
            del self.partials[k]

        # --- sink: deterministic order, idempotent commit
        # combine_chunks: chunk layout depends on routing slice sizes (varies
        # with parallelism); one contiguous table -> byte-identical parquet.
        out_rows = (
            rows.sort_by([("doc_idx", "ascending")])
            .select(["doc_id", "tokens", "n_tok", "source", "doc_idx", "ts_us", "Status"])
            .combine_chunks()
        )
        counters = {
            "rows_in": len(idx),
            "rows_emitted": len(out_rows),
            "tokens_emitted": int(pc.sum(out_rows["n_tok"]).as_py() or 0),
            "late_rows": int(len(late_rows)),
            "dupes_dropped": self._dupes,
            "watermark": self.watermark,
        }
        self.sink.commit_epoch(epoch, {"rows": out_rows}, counters)

        # --- evict dedup state below the lateness horizon (bounded state)
        horizon = self.watermark - self.lateness_us
        if self.seen and epoch % 4 == 3:
            self.seen = {k: v for k, v in self.seen.items() if v >= horizon}

        # --- snapshot for resume (state as of END of this epoch)
        self.sink.write_snapshot(epoch, "state", self._snapshot_table())
        self.sink.gc_snapshots(epoch - 1)

        return {
            "partition": self.part,
            "closed": {f"{src}\x00{w}": v for (src, w), v in closed.items()},
            "counters": counters,
        }

    def _update_latest(self, rows: pa.Table) -> None:
        t = rows.sort_by(
            [("ts_us", "descending"), ("n_tok", "descending")]
        )
        srcs = t["source"].to_pylist()
        tss = t["ts_us"].to_pylist()
        vals = t["n_tok"].to_pylist()
        stats = t["Status"].to_pylist()
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
