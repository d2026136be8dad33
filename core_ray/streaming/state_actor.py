"""Per-partition stateful actor: keyed registers + salted window partials.

One actor owns ``hash(row_key) % num_partitions`` of the key space and holds
(SURVEY.md §2.5, §7.3):

- **merge-sink dedup state** (reference ``pcdm_to_delta.py:193-236``): a
  seen-key register so each (TagName, EventTime) is emitted exactly once
  across epochs and retried tasks; keys older than the watermark minus
  allowed lateness are evicted, so state is bounded by the lateness horizon,
  not the stream length.  BOUNDED-DEDUP CONTRACT: the exactly-once guarantee
  is exactly-once-within-lateness — a duplicate redelivered with an event
  time older than (watermark - lateness) arrives after its register was
  evicted and WILL re-emit.  Retries/replays always land inside the horizon
  (they replay the current epoch), so the bound only matters for sources
  that re-send arbitrarily old rows; widen ``lateness_s`` for those;
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
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .sink import EpochSink


def _empty_partials() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "c": pd.Series([], dtype=np.int64),
            "ws": pd.Series([], dtype=np.int64),
            "cnt": pd.Series([], dtype=np.int64),
            "s": pd.Series([], dtype=np.int64),
            "mn": pd.Series([], dtype=np.int64),
            "mx": pd.Series([], dtype=np.int64),
            "st": pd.Series([], dtype=np.int64),
            "w": pd.Series([], dtype=np.int64),
        }
    )


def _merge_partials(frames: list[pd.DataFrame]) -> pd.DataFrame:
    """Vectorized combine of window-partial frames keyed by the actor's
    PERSISTENT source code (int) + window start — int-keyed groupby stays on
    the pandas C path (string keys measurably dominated the barrier at high
    partition counts, since every actor holds every open window)."""
    frames = [f for f in frames if len(f)]
    if not frames:
        return _empty_partials()
    m = pd.concat(frames, ignore_index=True)
    return m.groupby(["c", "ws"], sort=False, as_index=False).agg(
        cnt=("cnt", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max"),
        st=("st", "sum"), w=("w", "sum"),
    )



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
        output_mode: str = "append",
    ):
        pa.set_cpu_count(1)  # one logical slot per partition actor
        self.part = partition_id
        self.out_dir = out_dir
        self.window_us = window_us
        self.lateness_us = lateness_us
        self.t0_us = t0_us
        self.window_kind = window_kind
        self.slide_us = slide_us or window_us
        self.gap_us = gap_us or 300_000_000
        self.sink_payload_rows = sink_payload_rows
        self.output_mode = output_mode
        if output_mode == "update" and window_kind == "session":
            raise ValueError("update output mode supports tumbling/sliding "
                             "windows (session state merges on the driver)")
        self.reset()

    def reset(self) -> bool:
        """(Re)initialize all mutable state — lets a warm actor pool be
        reused across job runs (process spawn + imports are a fixed cost
        that would otherwise land inside every run)."""
        self.sink = EpochSink(self.out_dir, self.part)

        # window partials: a columnar frame (source, ws, cnt, s, mn, mx) —
        # every actor holds a partial for EVERY open window (rows route by
        # the high-cardinality key), so this state is O(#windows) and must be
        # merged vectorized, never via a per-key Python dict (measured 5x
        # aggregate-actor-time blowup at 32 partitions with a dict).
        self.partials: pd.DataFrame = _empty_partials()
        # persistent source-string <-> code registry for partials keys
        self.src_ids: dict[str, int] = {}
        self.src_names: list[str] = []
        # latest registers: source -> dict(ts, status, value, good_ts, good_value)
        self.latest: dict[str, dict] = {}
        # dedup horizon state: per-epoch bands of (doc_idx, ts_us) arrays —
        # appending an epoch is O(1), membership is a vectorized np.isin over
        # the (overlap-only) candidates, eviction drops/filters whole bands
        self.seen_bands: list[tuple[np.ndarray, np.ndarray]] = []
        self.max_ts = -1  # from restored snapshots (epochs before resume)
        # dedup frontier: max event time whose rows may already have been
        # emitted SOMEWHERE.  Equals max_ts in normal operation; after a
        # checkpoint RESCALE it is the max over DONOR partitions while
        # max_ts is their min (the watermark-conservative choice) — the
        # dedup candidate gate must use the wider bound or re-sent rows
        # above the min frontier would skip the seen check (rescale.py).
        self.dedup_frontier = -1
        # per-epoch transient state, keyed by epoch so a prefetching driver
        # may ingest epoch e+1 while epoch e's barrier is still running
        self._epoch_rows: dict[int, list[pa.Table]] = {}
        self._epoch_batch_ids: dict[int, set[int]] = {}
        self._epoch_max: dict[int, int] = {}
        self.watermark = -(1 << 62)
        return True

    # -- resume -------------------------------------------------------------

    def load_snapshot(self, epoch: int) -> bool:
        """Restore state as of the END of ``epoch`` (so replay starts at
        epoch+1). Returns False if no snapshot exists (fresh start)."""
        t = self.sink.read_snapshot(epoch, "state")
        if t is None:
            return False
        meta = {k.decode(): v.decode() for k, v in (t.schema.metadata or {}).items()}
        self.max_ts = int(meta.get("max_ts", -1))
        self.dedup_frontier = int(meta.get("dedup_frontier", self.max_ts))
        self.watermark = int(meta.get("watermark", -(1 << 62)))
        self.latest = {}
        seen_mask = pc.equal(t["kind"], "seen")
        seen_rows = t.filter(seen_mask)
        self.seen_bands = (
            [(seen_rows["ws"].to_numpy(), seen_rows["cnt"].to_numpy())]
            if len(seen_rows)
            else []
        )
        part_rows = t.filter(pc.equal(t["kind"], "partial"))
        if len(part_rows):
            skeys = part_rows["skey"].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(skeys, return_inverse=True)
            codes = self._persist_codes(uniq)[inv]
            mn = pd.to_numeric(
                pd.Series(part_rows["status"].to_numpy(zero_copy_only=False))
            ).to_numpy(dtype=np.int64)
        else:
            codes = np.zeros(0, dtype=np.int64)
            mn = np.zeros(0, dtype=np.int64)
        self.partials = pd.DataFrame(
            {
                "c": codes,
                "ws": part_rows["ws"].to_numpy(),
                "cnt": part_rows["cnt"].to_numpy(),
                "s": part_rows["sum_n_tok"].to_numpy(),
                "mn": mn,
                "mx": part_rows["good_value"].to_numpy(),
                "st": part_rows["st"].to_numpy(),
                "w": (
                    part_rows["w"].to_numpy()
                    if "w" in t.column_names
                    else np.zeros(len(part_rows), dtype=np.int64)
                ),
            }
        )
        # the seen band dominates the snapshot when lateness is large: prune
        # to the handful of latest rows BEFORE any per-row Python
        lt = t.filter(pc.equal(t["kind"], "latest"))
        for i in range(len(lt)):
            new = {
                "ts": lt["ws"][i].as_py(),
                "value": lt["cnt"][i].as_py(),
                "status": lt["status"][i].as_py(),
                "good_ts": lt["sum_n_tok"][i].as_py(),
                "good_value": lt["good_value"][i].as_py(),
            }
            reg = self.latest.get(lt["skey"][i].as_py())
            if reg is None:
                self.latest[lt["skey"][i].as_py()] = new
                continue
            # Component-wise fold, NOT last-write-wins: a rescale co-locates
            # several donors' registers for one source onto this partition,
            # and the (ts, value) argmax and the Good-only (good_ts,
            # good_value) argmax may come from DIFFERENT donor rows —
            # overwriting whole rows silently regresses the Good register
            # (merge_latest semantics, mirrored here).
            if (new["ts"], new["value"]) > (reg["ts"], reg["value"]):
                reg["ts"], reg["value"], reg["status"] = (
                    new["ts"], new["value"], new["status"]
                )
            if (new["good_ts"], new["good_value"]) > (
                reg["good_ts"], reg["good_value"]
            ):
                reg["good_ts"], reg["good_value"] = (
                    new["good_ts"], new["good_value"]
                )
        return True

    def _persist_codes(self, cats: np.ndarray) -> np.ndarray:
        """Map this epoch's dictionary categories to the actor's persistent
        source codes (Python work is O(#distinct sources))."""
        out = np.empty(len(cats), dtype=np.int64)
        for i, name in enumerate(cats):
            code = self.src_ids.get(name)
            if code is None:
                code = len(self.src_names)
                self.src_ids[name] = code
                self.src_names.append(name)
            out[i] = code
        return out

    def _snapshot_table(self) -> pa.Table:
        # partials and latest are small; `seen` is bounded by the lateness
        # horizon (evicted every epoch) — bulk-convert it without a Python
        # loop anyway, in case lateness is configured large.
        p = self.partials
        names = np.asarray(self.src_names, dtype=object)
        # min packed into the status slot, max into good_value (generic row)
        kinds = ["partial"] * len(p)
        skeys = (
            names[p["c"].to_numpy(dtype=np.int64)].tolist() if len(p) else []
        )
        wss = p["ws"].tolist()
        cnts = p["cnt"].tolist()
        sums = p["s"].tolist()
        statuses = [str(v) for v in p["mn"].tolist()]
        goodv = p["mx"].tolist()
        sts = p["st"].tolist()
        ws_col = p["w"].tolist()
        if self.seen_bands:
            seen_idx = np.concatenate([b[0] for b in self.seen_bands])
            seen_ts = np.concatenate([b[1] for b in self.seen_bands])
            n_seen = len(seen_idx)
            kinds.extend(["seen"] * n_seen)
            skeys.extend([None] * n_seen)
            wss.extend(seen_idx.tolist())
            cnts.extend(seen_ts.tolist())
            sums.extend([None] * n_seen)
            statuses.extend([None] * n_seen)
            goodv.extend([None] * n_seen)
            sts.extend([None] * n_seen)
            ws_col.extend([None] * n_seen)
        for src, reg in self.latest.items():
            kinds.append("latest"); skeys.append(src); wss.append(reg["ts"])
            cnts.append(reg["value"]); sums.append(reg["good_ts"])
            statuses.append(reg["status"]); goodv.append(reg["good_value"])
            sts.append(None)
            ws_col.append(None)
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "skey": pa.array(skeys, pa.string()),
                "ws": pa.array(wss, pa.int64()),
                "cnt": pa.array(cnts, pa.int64()),
                "sum_n_tok": pa.array(sums, pa.int64()),
                "status": pa.array(statuses, pa.string()),
                "good_value": pa.array(goodv, pa.int64()),
                "st": pa.array(sts, pa.int64()),
                "w": pa.array(ws_col, pa.int64()),
            }
        ).replace_schema_metadata(
            {"max_ts": str(self.max_ts), "watermark": str(self.watermark),
             "dedup_frontier": str(max(self.max_ts, self.dedup_frontier))}
        )

    # -- ingest -------------------------------------------------------------

    def ingest(self, epoch: int, batch_id: int, table: pa.Table) -> int:
        """Idempotent per-epoch ingest of a routed slice (Arrow, zero-copy)."""
        ids = self._epoch_batch_ids.setdefault(epoch, set())
        if batch_id in ids:  # Ray task retry redelivery
            return 0
        ids.add(batch_id)
        self._epoch_rows.setdefault(epoch, []).append((batch_id, table))

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
        # max event time seen BEFORE this epoch (dedup_frontier kicks in
        # only on the first epochs after a rescaled resume)
        frontier = max(self.max_ts, self.dedup_frontier)
        if epoch in self._epoch_max:
            self.max_ts = max(self.max_ts, self._epoch_max.pop(epoch))
        # Deterministic base order: slices sorted by batch id (arrival order
        # is Ray-task-completion order, i.e. nondeterministic — sorting here
        # both fixes tie-breaking for duplicate keys and lets the sink skip
        # the payload gather entirely when the key is already nondecreasing).
        buffered.sort(key=lambda bt: bt[0])
        rows = (
            pa.concat_tables([t for _, t in buffered]) if buffered else _empty_rows_table()
        )
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
        tok_sum = (
            rows["tok_sum"].to_numpy()
            if "tok_sum" in rows.column_names
            else np.zeros(len(rows), dtype=np.int64)
        )
        # stream-static join contribution (normalize attaches `wt` when a
        # dimension table is configured — see StreamConfig.dim_path)
        wt = (
            rows["wt"].to_numpy()
            if "wt" in rows.column_names
            else np.zeros(len(rows), dtype=np.int64)
        )
        # No per-row Python objects: source is dictionary-encoded in C (codes
        # + a tiny category array), Status compared in Arrow; status STRINGS
        # are only fetched per latest-register winner (O(#sources) rows).
        if len(rows):
            enc = pc.dictionary_encode(rows["source"].combine_chunks())
            epoch_cats = np.asarray(enc.dictionary.to_pylist(), dtype=object)
            # remap epoch dictionary codes onto the actor's persistent codes
            src_codes = self._persist_codes(epoch_cats)[
                enc.indices.to_numpy().astype(np.int64)
            ]
            bad = pc.equal(rows["Status"], "Bad").combine_chunks().to_numpy(
                zero_copy_only=False
            )
        else:
            src_codes = np.zeros(0, dtype=np.int64)
            bad = np.zeros(0, dtype=bool)
        src_cats = np.asarray(self.src_names, dtype=object)
        status_col = rows["Status"]
        timings["conv"] = time.monotonic() - t_mark
        t_mark = time.monotonic()

        # --- dedup (exactly-once row emission across epochs/retries).
        # Vectorized: rows beyond the pre-epoch event-time frontier cannot be
        # cross-epoch duplicates, so the Python dict check runs only on the
        # (usually tiny) overlap region; intra-epoch duplicates are dropped
        # by keeping the first occurrence per doc_idx.
        if len(idx):
            fresh = np.ones(len(idx), dtype=bool)
            cand = np.nonzero(ts <= frontier)[0]
            if len(cand):
                known = np.zeros(len(cand), dtype=bool)
                for band_idx, _ in self.seen_bands:
                    known |= np.isin(idx[cand], band_idx)
                fresh[cand] = ~known
            _, first_pos = np.unique(idx, return_index=True)
            intra_first = np.zeros(len(idx), dtype=bool)
            intra_first[first_pos] = True
            fresh &= intra_first
            late = ts < prev_watermark  # window may already be closed
            if fresh.any():
                self.seen_bands.append((idx[fresh], ts[fresh]))
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
        touched = None  # update-mode: this epoch's (c, ws) keys
        if on_time.any():
            codes_t = src_codes[on_time]
            ts_t = ts[on_time]
            ntok_t = n_tok[on_time]
            tsum_t = tok_sum[on_time]
            wt_t = wt[on_time]
            if self.window_kind == "session":
                fragments = self._session_fragments(codes_t, src_cats, ts_t, ntok_t)
            else:
                if self.window_kind == "sliding":
                    from ..windows import sliding_window_starts

                    ridx, ws = sliding_window_starts(
                        ts_t, self.t0_us, self.window_us, self.slide_us
                    )
                    codes_w = codes_t[ridx]
                    ntok_w = ntok_t[ridx]
                    tsum_w = tsum_t[ridx]
                    wt_w = wt_t[ridx]
                else:  # tumbling
                    ws = self.t0_us + (
                        (ts_t - self.t0_us) // self.window_us
                    ) * self.window_us
                    codes_w = codes_t
                    ntok_w = ntok_t
                    tsum_w = tsum_t
                    wt_w = wt_t
                # int-keyed groupby (pandas C path) on (source code, ws)
                df = pd.DataFrame(
                    {"c": codes_w, "ws": ws, "n": ntok_w, "t": tsum_w,
                     "wv": wt_w}
                )
                g = df.groupby(["c", "ws"], sort=False, as_index=False).agg(
                    cnt=("n", "size"), s=("n", "sum"), mn=("n", "min"),
                    mx=("n", "max"), st=("t", "sum"), w=("wv", "sum"),
                )
                new = pd.DataFrame(
                    {
                        "c": g["c"].to_numpy(dtype=np.int64),
                        "ws": g["ws"].to_numpy(),
                        "cnt": g["cnt"].to_numpy(dtype=np.int64),
                        "s": g["s"].to_numpy(dtype=np.int64),
                        "mn": g["mn"].to_numpy(dtype=np.int64),
                        "mx": g["mx"].to_numpy(dtype=np.int64),
                        "st": g["st"].to_numpy(dtype=np.int64),
                        "w": g["w"].to_numpy(dtype=np.int64),
                    }
                )
                self.partials = _merge_partials([self.partials, new])
                if self.output_mode == "update":
                    touched = new[["c", "ws"]]

            timings["window_partials"] = time.monotonic() - t_mark
            t_lat = time.monotonic()
            # --- latest registers (argmax by (ts, value); Good variant).
            # positions map on-time row order back to original rows so status
            # strings are fetched only for the handful of winners.
            positions = np.nonzero(on_time)[0]
            self._update_latest(
                codes_t,
                src_cats,
                ts_t,
                ntok_t,
                bad[on_time],
                lambda i: status_col[int(positions[i])].as_py(),
            )
            timings["window_latest"] = time.monotonic() - t_lat

        timings["window"] = time.monotonic() - t_mark
        t_mark = time.monotonic()

        # --- emit closed windows (ws + window <= watermark)
        closed_mask = (self.partials["ws"].to_numpy() + self.window_us) <= self.watermark
        closed = self.partials[closed_mask]
        self.partials = self.partials[~closed_mask].reset_index(drop=True)

        # --- sink: deterministic order, idempotent commit.  Fast path: the
        # base order is deterministic (slices sorted by batch id above), so
        # when the kept keys are already nondecreasing — always true for a
        # key-ordered source like the tokens table — the payload is emitted
        # with ZERO copies (or one `filter` pass when rows were dropped).
        # Fallback for unordered keys: combine_chunks FIRST, then one gather
        # (Arrow's take on a many-chunk list column is superlinear — measured
        # 90x at 160 chunks); that single gather is the only payload copy.
        if self.sink_payload_rows:
            kept_idx = idx[fresh]
            if len(kept_idx) < 2 or bool((np.diff(kept_idx) >= 0).all()):
                out_rows = rows if fresh.all() else rows.filter(pa.array(fresh))
            else:
                order = np.argsort(kept_idx, kind="stable")
                rows = rows.combine_chunks()
                out_rows = rows.take(pa.array(np.nonzero(fresh)[0][order]))
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
        if self.seen_bands:
            kept_bands = []
            for band_idx, band_ts in self.seen_bands:
                if len(band_ts) == 0 or band_ts.max() < horizon:
                    continue  # whole band below horizon
                if band_ts.min() >= horizon:
                    kept_bands.append((band_idx, band_ts))
                else:
                    m = band_ts >= horizon
                    kept_bands.append((band_idx[m], band_ts[m]))
            self.seen_bands = kept_bands

        # --- snapshot for resume (state as of END of this epoch)
        self.sink.write_snapshot(epoch, "state", self._snapshot_table())
        self.sink.gc_snapshots(epoch - 1)
        timings["snapshot"] = time.monotonic() - t_mark
        timings["total"] = time.monotonic() - t_start

        result = {
            "partition": self.part,
            "closed": self._closed_payload(closed),
            "fragments": fragments,
            "counters": counters,
            "timings": timings,
        }
        if self.output_mode == "update":
            # Spark update-mode support: report ALL open running partials
            # (bounded by open windows, not rows) + the keys THIS epoch's
            # rows touched; the driver emits the cross-actor merged running
            # totals for the UNION of touched keys.  A window closed this
            # epoch was merged above before removal, so its final update
            # rides the same report.
            names = np.asarray(self.src_names, dtype=object)
            t = touched
            all_partials = _merge_partials([self.partials, closed])
            result["updated"] = self._closed_payload(all_partials)
            result["touched"] = {
                "source": (
                    names[t["c"].to_numpy(dtype=np.int64)]
                    if t is not None and len(t)
                    else np.zeros(0, dtype=object)
                ),
                "ws": (
                    t["ws"].to_numpy(dtype=np.int64)
                    if t is not None and len(t)
                    else np.zeros(0, dtype=np.int64)
                ),
            }
        return result

    def _closed_payload(self, closed: pd.DataFrame) -> dict:
        """Closed-window partials for the driver merge (source names, arrays)."""
        names = np.asarray(self.src_names, dtype=object)
        return {
            "source": names[closed["c"].to_numpy(dtype=np.int64)]
            if len(closed)
            else np.zeros(0, dtype=object),
            "ws": closed["ws"].to_numpy(dtype=np.int64),
            "cnt": closed["cnt"].to_numpy(dtype=np.int64),
            "s": closed["s"].to_numpy(dtype=np.int64),
            "mn": closed["mn"].to_numpy(dtype=np.int64),
            "mx": closed["mx"].to_numpy(dtype=np.int64),
            "st": closed["st"].to_numpy(dtype=np.int64),
            "w": closed["w"].to_numpy(dtype=np.int64),
        }

    def _session_fragments(self, codes, cats, tss, vals) -> list:
        """Actor-local session fragments per agg key from this epoch's rows.

        A fragment over a SUBSET of a key's events is always a sub-session of
        the true session (connectivity in the subset implies connectivity in
        the full set), so the driver's global gap-merge of all actors'
        fragments reconstructs exact sessionization."""
        from ..windows import session_ids

        out = []
        order = np.lexsort((tss,))
        sc = codes[order]
        ts_s = tss[order]
        v_s = vals[order]
        for c in np.unique(sc):
            m = sc == c
            t = ts_s[m]
            v = v_s[m]
            sid = session_ids(t, self.gap_us)
            for s in np.unique(sid):
                sm = sid == s
                out.append(
                    (
                        str(cats[c]),
                        int(t[sm].min()),
                        int(t[sm].max()),
                        int(sm.sum()),
                        int(v[sm].sum()),
                    )
                )
        return out

    def _update_latest(self, codes, cats, tss, vals, bad, get_status) -> None:
        # Per-source argmax by (ts, value) WITHOUT a global sort: sources are
        # a handful, so #sources masked max-passes (O(k*n) straight-line
        # comparisons) beat an n-log-n lexsort of the whole epoch by ~7x
        # (the lexsort version was 40% of all barrier actor-time, measured).
        # Tie rule preserved from the sort version: among equal (ts, value),
        # the LARGEST original index wins (latest arrival in batch order).
        def _argmax_ts_val(rows: np.ndarray) -> int:
            t = tss[rows]
            ti = rows[t == t.max()]
            v = vals[ti]
            return int(ti[v == v.max()].max())

        for c in np.unique(codes):
            rows = np.flatnonzero(codes == c)
            src = cats[c]
            i = _argmax_ts_val(rows)
            reg = self.latest.setdefault(
                src,
                {"ts": -1, "value": 0, "status": "", "good_ts": -1, "good_value": 0},
            )
            tsv, val = int(tss[i]), int(vals[i])
            if (tsv, val) > (reg["ts"], reg["value"]):
                reg["ts"], reg["value"], reg["status"] = tsv, val, str(get_status(i))
            grows = rows[~bad[rows]]
            if len(grows):
                gi = _argmax_ts_val(grows)
                gtsv, gval = int(tss[gi]), int(vals[gi])
                if (gtsv, gval) > (reg["good_ts"], reg["good_value"]):
                    reg["good_ts"], reg["good_value"] = gtsv, gval

    # -- end of stream ------------------------------------------------------

    def flush_final(self, epoch: int) -> dict:
        """Emit all remaining open windows and the latest registers."""
        closed = self.partials
        self.partials = _empty_partials()
        latest = {
            src: dict(reg) for src, reg in self.latest.items()
        }
        return {
            "partition": self.part,
            "closed": self._closed_payload(closed),
            "latest": latest,
        }
