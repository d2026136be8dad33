"""PCDM normalize-then-merge destination (reference
``destinations/spark/pcdm_to_delta.py:38`` and
``pcdm_latest_to_delta.py:39`` — SURVEY.md §2.5).

Semantics reproduced:

1. ChangeType normalization: insert/update -> upsert (ref ``:277-283``);
2. dedup on (TagName, EventTime, ChangeType) keeping the last occurrence
   (ref ``:293-294``);
3. ValueType routing: rows split into three physical tables (float / integer /
   string) with Value cast per type (ref ``:296-310``);
4. keyed MERGE per table on (EventDate, TagName, EventTime) with
   update-if-changed / delete / insert arms (ref ``:193-226``), and PARTITION
   PRUNING — only the EventDate partitions present in the batch are touched
   (ref ``:227-236``);
5. latest-value table per TagName: (EventTime, Status, Value, ValueType) of
   the most recent event plus (GoodEventTime, GoodValue, GoodValueType) of the
   most recent Good event, each updated monotonically
   (ref ``pcdm_latest_to_delta.py:151-240``).

Layout: ``{root}/{vtype}/dt=YYYY-MM-DD/data.parquet`` + ``{root}/latest.parquet``.

Scale design: the merge fans out as ONE RAY TASK PER AFFECTED (vtype, date)
PARTITION (grouped_map over the batch keyed by the partition), each task
read-merge-writes its partition file atomically; idempotent because merging
the same batch twice converges (upserts overwrite equal keys, deletes are
absent either way). The latest table is maintained from per-tag argmax
candidates (tiny) merged driver-side.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..ops.common import grouped_map

VTYPES = ("float", "integer", "string")

EVENT_COLS = ["TagName", "EventTime", "Status", "Value"]


def _normalize_cdc(batch: pa.Table, merge: bool = True,
                   remove_nanoseconds: bool = False) -> pa.Table:
    """ChangeType normalization + EventDate derivation (+ optional ms
    truncation — the reference's ``remove_nanoseconds`` arm actually floors
    to milliseconds: ``floor(ts*1000)/1000``, ``pcdm_to_delta.py:285-291``)."""
    import pyarrow.compute as pc

    if merge:
        ct = pc.utf8_lower(batch["ChangeType"])
        ct = pc.if_else(
            pc.is_in(ct, value_set=pa.array(["insert", "update"])), "upsert", ct
        )
        i = batch.column_names.index("ChangeType")
        batch = batch.set_column(i, "ChangeType", ct)
    if remove_nanoseconds:
        i = batch.column_names.index("EventTime")
        us = pc.cast(pc.cast(batch["EventTime"], pa.timestamp("us")), pa.int64())
        ms = pc.multiply(pc.divide(us, 1000), 1000)
        batch = batch.set_column(
            i, "EventTime", pc.cast(ms, pa.timestamp("us"))
        )
    # normalize ValueType HERE so the shuffle key equals the physical path
    # key — an unknown vtype coerced inside the merge task would let two
    # groups (unknown + 'string') race on the same string/dt=<date> file
    vt = batch["ValueType"]
    vt = pc.if_else(pc.is_in(vt, value_set=pa.array(sorted(VTYPES))), vt, "string")
    i = batch.column_names.index("ValueType")
    batch = batch.set_column(i, "ValueType", vt)
    date = pc.strftime(pc.cast(batch["EventTime"], pa.timestamp("us")), "%Y-%m-%d")
    return batch.append_column("EventDate", date)


def _cast_value(df: pd.DataFrame, vtype: str) -> pd.DataFrame:
    df = df.copy()
    if vtype == "float":
        df["Value"] = pd.to_numeric(df["Value"], errors="coerce").astype("float64")
    elif vtype == "integer":
        df["Value"] = pd.to_numeric(df["Value"], errors="coerce").astype("Int64")
    else:
        df["Value"] = df["Value"].astype("string")
    return df


class PCDMMergeSink:
    def __init__(self, root: str, merge: bool = True,
                 remove_nanoseconds: bool = False, remove_duplicates: bool = True):
        self.root = root
        self.merge = merge
        self.remove_nanoseconds = remove_nanoseconds
        self.remove_duplicates = remove_duplicates
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------------ events

    def _partition_path(self, vtype: str, date: str) -> str:
        d = os.path.join(self.root, vtype, f"dt={date}")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, "data.parquet")

    def apply(self, cdc: ray.data.Dataset) -> dict:
        """Apply one batch of 6-column PCDM CDC rows; returns merge stats."""
        merge_flag, strip_ns = self.merge, self.remove_nanoseconds
        ds = cdc.map_batches(
            lambda b: _normalize_cdc(b, merge_flag, strip_ns), batch_format="pyarrow"
        )
        # both the keyed merge and the latest-register update consume the
        # normalized CDC; materialize it once so the (possibly expensive)
        # upstream parse doesn't run twice — one micro-batch, bounded size
        ds = ds.materialize()

        root = self.root
        dedup = self.remove_duplicates

        def merge_partition(g: pd.DataFrame) -> pd.DataFrame:
            vtype, date = g["ValueType"].iloc[0], g["EventDate"].iloc[0]
            # dedup (TagName, EventTime, ChangeType): deterministic winner.
            # Ray does not preserve row order across the blocks feeding this
            # shuffle, so "last occurrence" is ill-defined — sort by the full
            # row first so the surviving duplicate is the same at any
            # parallelism (exact-duplicate rows are interchangeable anyway;
            # sources that need arrival order must carry a sequence column).
            g = g.sort_values(
                ["TagName", "EventTime", "ChangeType", "Value"],
                kind="mergesort", key=lambda c: c.astype(str) if c.name == "Value" else c,
            )
            if dedup:
                g = g.drop_duplicates(["TagName", "EventTime", "ChangeType"], keep="last")
            path = os.path.join(root, vtype, f"dt={date}", "data.parquet")
            existing = pq.read_table(path).to_pandas() if os.path.exists(path) else None  # bounded: one (type, date) partition file
            key = ["TagName", "EventTime"]
            if not merge_flag:
                # merge=False is the reference's APPEND path
                # (pcdm_to_delta.py:277: no ChangeType rewriting, no keyed
                # arms) — every row appends regardless of ChangeType
                ups = _cast_value(g, vtype)[EVENT_COLS]
                dels = g.iloc[0:0][["TagName", "EventTime"]]
                frames = [f for f in (existing, ups) if f is not None and len(f)]
                merged = pd.concat(frames, ignore_index=True) if frames else ups
            else:
                # within equal (TagName, EventTime): a delete and an upsert in
                # the same batch -> apply upserts then deletes (delete wins),
                # matching a sequential merge of distinct ChangeType rows
                ups = _cast_value(g[g["ChangeType"] == "upsert"], vtype)[EVENT_COLS]
                dels = g[g["ChangeType"] == "delete"][["TagName", "EventTime"]]
                frames = [f for f in (existing, ups) if f is not None and len(f)]
                merged = (
                    pd.concat(frames, ignore_index=True) if frames else ups
                ).drop_duplicates(key, keep="last")  # upsert: new value wins
                if len(dels):
                    mask = merged.set_index(key).index.isin(dels.set_index(key).index)
                    merged = merged[~mask]
            merged = merged.sort_values(key, kind="mergesort").reset_index(drop=True)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            pq.write_table(pa.Table.from_pandas(merged, preserve_index=False), tmp)
            os.replace(tmp, path)
            return pd.DataFrame(
                {
                    "ValueType": [vtype],
                    "EventDate": [date],
                    "rows_after": [len(merged)],
                    "upserts": [len(ups)],
                    "deletes": [len(dels)],
                }
            )

        stats = grouped_map(ds, ["ValueType", "EventDate"], merge_partition, num_buckets=32)
        stats_df = stats.to_pandas()  # bounded: one row per partition

        self._update_latest(ds)
        return {
            "partitions_touched": len(stats_df),
            "upserts": int(stats_df["upserts"].sum()) if len(stats_df) else 0,
            "deletes": int(stats_df["deletes"].sum()) if len(stats_df) else 0,
        }

    # ------------------------------------------------------------------ latest

    def latest_path(self) -> str:
        return os.path.join(self.root, "latest.parquet")

    def _update_latest(self, ds: ray.data.Dataset) -> None:
        """Maintain the latest-value table from upsert rows (monotonic
        conditional updates, ref ``pcdm_latest_to_delta.py:177-240``)."""

        def candidates(g: pd.DataFrame) -> pd.DataFrame:
            # every non-delete row is a latest-register candidate (covers the
            # merge=False append path where ChangeType stays 'insert')
            g = g[g["ChangeType"] != "delete"]
            if len(g) == 0:
                return pd.DataFrame(
                    columns=[
                        "TagName", "EventTime", "Status", "Value", "ValueType",
                        "GoodEventTime", "GoodValue", "GoodValueType",
                    ]
                )
            g = g.sort_values(["EventTime", "Value"], kind="mergesort")
            top = g.iloc[-1]
            good = g[g["Status"] != "Bad"]
            gt = good.iloc[-1] if len(good) else None
            return pd.DataFrame(
                {
                    "TagName": [top["TagName"]],
                    "EventTime": [top["EventTime"]],
                    "Status": [top["Status"]],
                    "Value": [top["Value"]],
                    "ValueType": [top["ValueType"]],
                    "GoodEventTime": [gt["EventTime"] if gt is not None else pd.NaT],
                    "GoodValue": [gt["Value"] if gt is not None else None],
                    "GoodValueType": [gt["ValueType"] if gt is not None else None],
                }
            )

        cand = grouped_map(ds, ["TagName"], candidates).to_pandas()  # bounded: one candidate per tag
        if len(cand) == 0:
            return
        path = self.latest_path()
        if os.path.exists(path):
            existing = pq.read_table(path).to_pandas()  # bounded: latest registers
            both = pd.concat([existing, cand], ignore_index=True)
        else:
            both = cand
        both["EventTime"] = pd.to_datetime(both["EventTime"])
        both["GoodEventTime"] = pd.to_datetime(both["GoodEventTime"])

        def reduce_tag(g: pd.DataFrame) -> pd.Series:
            g_sorted = g.sort_values(["EventTime"], kind="mergesort")
            top = g_sorted.iloc[-1]
            good = g_sorted.dropna(subset=["GoodEventTime"]).sort_values(
                ["GoodEventTime"], kind="mergesort"
            )
            out = top.copy()
            if len(good):
                gt = good.iloc[-1]
                out["GoodEventTime"] = gt["GoodEventTime"]
                out["GoodValue"] = gt["GoodValue"]
                out["GoodValueType"] = gt["GoodValueType"]
            return out

        latest = (
            both.groupby("TagName", sort=True, group_keys=False)
            .apply(reduce_tag)
            .reset_index(drop=True)
        )
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(latest, preserve_index=False), tmp)
        os.replace(tmp, path)

    def read_latest(self) -> pd.DataFrame:
        return pq.read_table(self.latest_path()).to_pandas()  # bounded: latest registers read-back

    def read_events(self, vtype: str) -> pd.DataFrame:
        base = os.path.join(self.root, vtype)
        if not os.path.isdir(base):
            return pd.DataFrame(columns=EVENT_COLS)
        parts = []
        for d in sorted(os.listdir(base)):
            p = os.path.join(base, d, "data.parquet")
            if os.path.exists(p):
                parts.append(pq.read_table(p).to_pandas())  # bounded: partition read-back API
        return (
            pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(columns=EVENT_COLS)
        )
