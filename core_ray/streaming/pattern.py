"""Streaming CEP: strict-contiguity sequence patterns over one keyed event
stream, with event-time watermarks and an exactly-once manifested sink.

Batch twin: ``functions/cep.py::match_pattern`` — the two share
``find_pattern_starts``, and the streaming run over the same rows emits the
IDENTICAL match set (pinned by ``tests/test_stream_pattern.py``).

Finalization rule: a match (m consecutive same-key rows in ``(ts,
tiebreak)`` order, per-step gap <= ``within_us``) is emitted at the first
barrier whose watermark STRICTLY exceeds its last step's ts.  Any later
arrival that could break the contiguity would have to insert at ts <=
last_ts < wm — and such rows are dropped as late — so an emitted match can
never be retracted.  Each match's last_ts falls in exactly one
``[wm_prev, wm)`` interval, which is the exactly-once argument.

State bound: a match spans at most ``(m-1) * within_us``, so rows with
``ts < wm - (m-1) * within_us`` can appear only in already-emitted matches
and are evicted at each barrier — per-actor state is O(rows inside that
horizon), independent of stream length.  ``within_us`` is therefore
REQUIRED in streaming mode (an unbounded pattern would mean unbounded
state); the batch op accepts ``within_us=None``.

Eviction keeps per-key sort prefixes intact: everything evicted sorts
strictly before everything retained (ts below the horizon), so contiguity
among retained rows equals contiguity in the true stream.

Skew note: routing is by key hash, so one hot key lands on one actor; its
state is still bounded by the within-horizon, and the per-barrier kernel is
vectorized (shifted slices), not per-row Python.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions.cep import find_pattern_starts
from ..synth import _hash2
from .job import WATERMARK_FLOOR_US, conservative_watermark
from .sink import EpochSink

_EXHAUSTED = 1 << 62


@dataclass
class PatternConfig:
    in_dir: str
    out_dir: str
    pattern: list[str] = field(default_factory=list)
    within_us: int = 600_000_000
    key_col: str = "key"
    ts_col: str = "ts_us"  # int64 microseconds
    type_col: str = "etype"
    tiebreak_col: str = "event_id"
    num_partitions: int = 8
    lateness_s: int = 2
    files_per_epoch: int = 1
    route_seed: int = 11

    def __post_init__(self):
        if len(self.pattern) < 2:
            raise ValueError("pattern needs at least 2 steps")
        if self.within_us is None or self.within_us <= 0:
            raise ValueError("streaming CEP requires a positive within_us")


@ray.remote(num_cpus=0)
class PatternPartitionActor:
    """One hash partition: buffers per-epoch arrivals; at each barrier sorts
    its retained window, emits newly-finalized matches, evicts the horizon."""

    def __init__(self, partition_id: int, out_dir: str, cfg_dict: dict):
        pa.set_cpu_count(1)
        self.part = partition_id
        self.out_dir = out_dir
        self.key = cfg_dict["key_col"]
        self.ts = cfg_dict["ts_col"]
        self.ty = cfg_dict["type_col"]
        self.tb = cfg_dict["tiebreak_col"]
        self.pattern = list(cfg_dict["pattern"])
        self.within = int(cfg_dict["within_us"])
        self.m = len(self.pattern)
        self.reset()

    def reset(self) -> bool:
        self.sink = EpochSink(self.out_dir, self.part)
        # retained window lives as a TYPED ARROW TABLE (join.py discipline):
        # concat/sort/filter are compute kernels, the pattern kernel reads
        # zero-copy int views, and resident bytes are columnar buffers
        self.state: pa.Table | None = None
        self._schema: pa.Schema | None = None
        self.watermark = WATERMARK_FLOOR_US
        self.max_ts = -1
        self._epoch_rows: dict[int, list[pa.Table]] = {}
        self._epoch_ids: dict[int, set] = {}
        self._epoch_max: dict[int, int] = {}
        self._late = 0
        return True

    # -- ingest -----------------------------------------------------------

    def ingest(self, epoch: int, batch_id: int, table: pa.Table) -> int:
        ids = self._epoch_ids.setdefault(epoch, set())
        if batch_id in ids:  # task-retry redelivery
            return 0
        ids.add(batch_id)
        self._epoch_rows.setdefault(epoch, []).append(table)
        ts = table[self.ts].to_numpy()
        if len(ts):
            self._epoch_max[epoch] = max(
                self._epoch_max.get(epoch, -1), int(ts.max())
            )
        return len(table)

    def epoch_max_ts(self, upto_epoch: int) -> int:
        vals = [v for e, v in self._epoch_max.items() if e <= upto_epoch]
        return max([self.max_ts] + vals)

    # -- barrier ----------------------------------------------------------

    def end_epoch(self, epoch: int, watermark_us: int) -> dict:
        import pyarrow.compute as pc

        cols = [self.key, self.ts, self.ty, self.tb]
        tables = self._epoch_rows.pop(epoch, [])
        self._epoch_ids.pop(epoch, None)
        if epoch in self._epoch_max:
            self.max_ts = max(self.max_ts, self._epoch_max.pop(epoch))
        new = None
        if tables:
            new = pa.concat_tables([t.select(cols) for t in tables])
            self._schema = new.schema
            late = pc.less(new[self.ts], self.watermark)
            self._late += int(pc.sum(late).as_py() or 0)
            new = new.filter(pc.invert(late))
        parts = [t for t in (self.state, new) if t is not None]
        st = (
            None if not parts
            else parts[0] if len(parts) == 1
            else pa.concat_tables(parts)
        )

        if st is not None:
            st = st.sort_by(
                [(self.key, "ascending"), (self.ts, "ascending"),
                 (self.tb, "ascending")]
            )
            kcodes = (
                st[self.key].combine_chunks().dictionary_encode()
                .indices.to_numpy(zero_copy_only=False)
            )
            tarr = st[self.ty].to_numpy(zero_copy_only=False)
            ous = st[self.ts].to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            starts = find_pattern_starts(
                kcodes, tarr, ous, self.pattern, self.within
            )
            last_ts = (
                ous[starts + self.m - 1] if len(starts)
                else np.empty(0, np.int64)
            )
            newly = starts[
                (last_ts >= self.watermark) & (last_ts < watermark_us)
            ]
            take = pa.array(newly)
            out_cols = {
                self.key: pc.take(st[self.key], take),
                f"start_{self.ts}": pa.array(
                    ous[newly] if len(newly) else np.empty(0, np.int64)
                ),
                f"end_{self.ts}": pa.array(
                    ous[newly + self.m - 1]
                    if len(newly) else np.empty(0, np.int64)
                ),
            }
            for j in range(self.m):
                out_cols[f"{self.tb}_{j + 1}"] = pc.take(
                    st[self.tb],
                    pa.array(newly + j) if len(newly) else pa.array([], pa.int64()),
                )
            out = pa.table(out_cols)
            if len(out):
                out = out.sort_by(
                    [(c, "ascending") for c in out.column_names]
                )
            horizon = watermark_us - (self.m - 1) * self.within
            self.state = st.filter(pc.greater_equal(st[self.ts], horizon))
        else:
            # no data ever seen: only column NAMES are known (the old
            # pandas path's null-typed empty)
            out = pa.Table.from_pandas(
                pd.DataFrame(
                    {
                        self.key: [],
                        f"start_{self.ts}": np.empty(0, np.int64),
                        f"end_{self.ts}": np.empty(0, np.int64),
                        **{f"{self.tb}_{j + 1}": [] for j in range(self.m)},
                    }
                ),
                preserve_index=False,
            )
        self.watermark = watermark_us

        counters = {
            "rows_emitted": len(out),
            "late_rows": self._late,
            "state_rows": 0 if self.state is None else len(self.state),
            "state_bytes": 0 if self.state is None else self.state.nbytes,
        }
        # snapshot BEFORE the manifest commit point (see join.py)
        self._write_snapshot(epoch)
        self.sink.commit_epoch(epoch, {"matches": out}, counters)
        # keep epoch-1 AND epoch — mid-barrier crash resume loads
        # min(committed), see join.py / state_actor.py:500
        self.sink.gc_snapshots(epoch - 1)
        return counters

    # -- snapshots ----------------------------------------------------------

    def _write_snapshot(self, epoch: int) -> None:
        t = self.state
        if t is None:
            t = pa.Table.from_pandas(pd.DataFrame(), preserve_index=False)
        t = t.replace_schema_metadata(
            {
                "max_ts": str(self.max_ts),
                "watermark": str(self.watermark),
                "late": str(self._late),
            }
        )
        self.sink.write_snapshot(epoch, "cep", t)

    def load_snapshot(self, epoch: int) -> bool:
        t = self.sink.read_snapshot(epoch, "cep")
        if t is None:
            return False
        meta = {k.decode(): v.decode() for k, v in (t.schema.metadata or {}).items()}
        self.max_ts = int(meta.get("max_ts", -1))
        self.watermark = int(meta.get("watermark", WATERMARK_FLOOR_US))
        self._late = int(meta.get("late", 0))
        if t.num_columns:
            t = t.replace_schema_metadata(None)
            self.state = t
            self._schema = t.schema
        else:
            self.state = None
        return True


def _route(files: list, cols, key_col, seed, actors, epoch, base_id):
    """Raw consume task: read one file group, hash-route compact slices."""
    import pyarrow.parquet as pq

    pa.set_cpu_count(1)
    tables = [pq.read_table(f, columns=cols, use_threads=False) for f in files]
    if not tables:
        return 0
    t = pa.concat_tables(tables)
    keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    part = (_hash2(seed, keys) % np.uint64(len(actors))).astype(np.int32)
    order = np.argsort(part, kind="stable")
    spart = part[order]
    bounds = np.searchsorted(spart, np.arange(len(actors) + 1))
    refs = []
    for p in range(len(actors)):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        if hi > lo:
            sl = t.take(pa.array(order[lo:hi]))
            refs.append(actors[p].ingest.remote(epoch, base_id, sl))
    return sum(ray.get(refs)) if refs else 0


_route_task = ray.remote(_route)


class StreamPatternJob:
    """Drive the epoch loop: route files, two-phase barrier, final flush.

    The flush is one extra barrier at epoch ``n_epochs`` with an EXHAUSTED
    watermark so trailing matches (last step newer than the final
    conservative watermark) still emit — the stream has provably ended, so
    no arrival can break them.  Resume skips it like any committed epoch.
    """

    def __init__(self, cfg: PatternConfig):
        self.cfg = cfg
        files = sorted(
            os.path.join(cfg.in_dir, f)
            for f in os.listdir(cfg.in_dir)
            if f.endswith(".parquet")
        )
        self.groups = [
            files[i : i + cfg.files_per_epoch]
            for i in range(0, len(files), cfg.files_per_epoch)
        ]
        self.n_epochs = len(self.groups)

    def run(self, resume: bool = True, stop_after_epoch: int | None = None) -> dict:
        cfg = self.cfg
        cfg_dict = {
            "key_col": cfg.key_col,
            "ts_col": cfg.ts_col,
            "type_col": cfg.type_col,
            "tiebreak_col": cfg.tiebreak_col,
            "pattern": cfg.pattern,
            "within_us": cfg.within_us,
        }
        from .sink import guard_job_shape

        guard_job_shape(
            cfg.out_dir,
            {**{k: v for k, v in cfg_dict.items() if k != "pattern"},
             "pattern": list(cfg.pattern),
             "num_partitions": cfg.num_partitions,
             "route_seed": cfg.route_seed, "lateness_s": cfg.lateness_s,
             "files_per_epoch": cfg.files_per_epoch},
            resume,
        )
        actors = [
            PatternPartitionActor.remote(p, cfg.out_dir, cfg_dict)
            for p in range(cfg.num_partitions)
        ]
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
                    missing = [pi for pi, ok in enumerate(oks) if not ok]
                    raise RuntimeError(
                        f"resume: cep snapshot for epoch {start - 1} "
                        f"missing on partition(s) {missing}"
                    )

        cols = [cfg.key_col, cfg.ts_col, cfg.type_col, cfg.tiebreak_col]
        lateness_us = cfg.lateness_s * 1_000_000
        # epoch n_epochs is the flush barrier (no files, EXHAUSTED watermark)
        last = self.n_epochs if stop_after_epoch is None else min(
            stop_after_epoch, self.n_epochs
        )
        totals = {"rows": 0, "late": 0}
        try:
            for e in range(start, last + 1):
                if e < self.n_epochs:
                    ray.get(
                        _route_task.remote(
                            self.groups[e], cols, cfg.key_col, cfg.route_seed,
                            actors, e, e,
                        )
                    )
                    maxes = ray.get([a.epoch_max_ts.remote(e) for a in actors])
                    wm = conservative_watermark(maxes, lateness_us)
                else:
                    wm = _EXHAUSTED
                results = ray.get([a.end_epoch.remote(e, wm) for a in actors])
                totals["rows"] += sum(c["rows_emitted"] for c in results)
                totals["late"] = sum(c["late_rows"] for c in results)
            return {"epochs": self.n_epochs + 1, "totals": totals}
        finally:
            for a in actors:
                try:
                    ray.kill(a)
                except Exception:
                    pass


def read_matches(out_dir: str):
    """The committed match output as a Ray Dataset (manifested files only)."""
    import glob
    import json

    import ray.data

    from .sink import manifest_data_files

    files = manifest_data_files(out_dir)
    if not files:
        return ray.data.from_items([])
    # partitioning=None: the part=N sink layout must not leak a hive column
    return ray.data.read_parquet(files, partitioning=None)
