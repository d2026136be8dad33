"""Generic conditional keyed MERGE destination.

Mirrors the reference's ``SparkDeltaMergeDestination`` surface
(``destinations/spark/delta_merge.py:30-39,215-270``): a merge condition on
key columns plus ordered clause lists —

- ``when_matched_update_list``: [MergeConditionValues] — first clause whose
  condition holds updates the target row with ``values`` (``"*"`` = take all
  source columns);
- ``when_matched_delete_list``: [MergeCondition];
- ``when_not_matched_insert_list``: [MergeConditionValues] — source rows with
  no target match;
- ``when_not_matched_by_source_update_list`` / ``..._delete_list``: target
  rows whose key is absent from the source batch.

Conditions/values are expressions over ``source.<col>`` / ``target.<col>``
(evaluated with pandas eval on the joined frame).  Clauses are evaluated in
list order, updates before deletes, first match wins — Delta's clause
semantics.

Storage: hash-bucketed Parquet under ``root`` (bucket = hash(key) % N), each
bucket rewritten atomically per merge — the same partition-pruned
read-modify-write shape as ``pcdm_merge.py``, generalized to arbitrary
schemas and clause lists.  The merge itself runs per bucket via
``grouped_map``; buckets untouched by the source are only processed when a
by-source clause exists (they are enumerated from the existing files, one
marker row each).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..ops.common import grouped_map


@dataclass
class MergeConditionValues:
    condition: str | None = None
    values: dict | str = "*"


@dataclass
class MergeCondition:
    condition: str | None = None


def _prefixed(df: pd.DataFrame, prefix: str) -> pd.DataFrame:
    return df.rename(columns={c: f"{prefix}{c}" for c in df.columns})


def _eval_cond(joined: pd.DataFrame, cond: str | None):
    if cond is None:
        return pd.Series(True, index=joined.index)
    expr = cond.replace("source.", "source_").replace("target.", "target_")
    return joined.eval(expr, engine="python")


def _eval_values(joined: pd.DataFrame, values: dict | str, cols: list[str], side: str):
    """Produce the result rows for an update/insert clause."""
    if values == "*":
        out = joined[[f"{side}_{c}" for c in cols]].copy()
        out.columns = cols
        return out
    out = pd.DataFrame(index=joined.index)
    for c in cols:
        if c in values:
            expr = str(values[c]).replace("source.", "source_").replace(
                "target.", "target_"
            )
            out[c] = joined.eval(expr, engine="python")
        else:
            out[c] = joined[f"target_{c}"] if f"target_{c}" in joined else pd.NA
    return out


class KeyedMergeDestination:
    def __init__(self, root: str, key_cols: list[str], num_buckets: int = 32):
        self.root = root
        self.key_cols = list(key_cols)
        self.num_buckets = num_buckets
        os.makedirs(root, exist_ok=True)

    def _bucket_path(self, b: int) -> str:
        return os.path.join(self.root, f"bucket={b:04d}.parquet")

    def _bucket_of(self, df: pd.DataFrame) -> pd.Series:
        return (
            pd.util.hash_pandas_object(df[self.key_cols], index=False)
            % self.num_buckets
        ).astype("int64")

    def read(self) -> pd.DataFrame | None:
        frames = []
        for name in sorted(os.listdir(self.root)):
            if name.endswith(".parquet"):
                frames.append(pq.read_table(os.path.join(self.root, name)).to_pandas())  # bounded: merged-state read-back API
        return pd.concat(frames, ignore_index=True) if frames else None

    def merge(
        self,
        source: ray.data.Dataset,
        when_matched_update_list: list[MergeConditionValues] | None = None,
        when_matched_delete_list: list[MergeCondition] | None = None,
        when_not_matched_insert_list: list[MergeConditionValues] | None = None,
        when_not_matched_by_source_update_list: list[MergeConditionValues] | None = None,
        when_not_matched_by_source_delete_list: list[MergeCondition] | None = None,
    ) -> dict:
        key_cols = self.key_cols
        root = self.root
        upd = when_matched_update_list or []
        dels = when_matched_delete_list or []
        ins = when_not_matched_insert_list or []
        bs_upd = when_not_matched_by_source_update_list or []
        bs_del = when_not_matched_by_source_delete_list or []
        by_source = bool(bs_upd or bs_del)

        num_buckets = self.num_buckets

        def add_bucket(t: pa.Table) -> pa.Table:
            # Arrow-native routing: only the KEY columns are converted for
            # hashing; the payload never round-trips through pandas here
            # (same hasher as ``_bucket_of``, so bucket ids are stable across
            # merges that used the old pandas path)
            import numpy as np

            if len(t) == 0:
                t = t.append_column("_kbucket", pa.array([], pa.int64()))
                return t.append_column("_marker", pa.array([], pa.bool_()))
            kdf = t.select(key_cols).to_pandas()  # per-batch
            h = (pd.util.hash_pandas_object(kdf, index=False) % num_buckets).to_numpy()
            t = t.append_column("_kbucket", pa.array(h.astype("int64")))
            return t.append_column("_marker", pa.array(np.zeros(len(t), dtype=bool)))

        tagged = source.map_batches(add_bucket, batch_format="pyarrow")
        if by_source:
            # by-source clauses must visit every existing bucket
            existing = [
                int(n[7:11])
                for n in os.listdir(root)
                if n.startswith("bucket=") and n.endswith(".parquet")
            ]
            if existing:
                src_schema = source.schema().names
                marker = pd.DataFrame({c: pd.Series([pd.NA] * len(existing)) for c in src_schema})
                marker["_kbucket"] = pd.Series(existing, dtype="int64")
                marker["_marker"] = True
                tagged = tagged.union(ray.data.from_pandas(marker))

        def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
            b = int(g["_kbucket"].iloc[0])
            src = g[~g["_marker"]].drop(columns=["_kbucket", "_marker"])
            # one source row per key (Delta errors on multiple matches; we
            # keep the deterministically-last row by full sort)
            if len(src):
                src = src.sort_values(list(src.columns), kind="mergesort").drop_duplicates(
                    key_cols, keep="last"
                )
            path = os.path.join(root, f"bucket={b:04d}.parquet")
            target = (
                pq.read_table(path).to_pandas()  # bounded: one bucket's target file
                if os.path.exists(path)
                else src.iloc[0:0]
            )
            cols = list(target.columns) if len(target.columns) else list(src.columns)
            counters = {"updated": 0, "deleted": 0, "inserted": 0,
                        "bs_updated": 0, "bs_deleted": 0}

            t_idx = target.set_index(key_cols).index if len(target) else None
            s_idx = src.set_index(key_cols).index if len(src) else None
            matched_t = (
                t_idx.isin(s_idx) if len(target) and len(src) else
                pd.Series(False, index=target.index).to_numpy()
            )
            out_rows = [target[~matched_t] if len(target) else target]

            if matched_t.any():
                joined = _prefixed(
                    target[matched_t].reset_index(drop=True), "target_"
                ).join(
                    _prefixed(
                        src.set_index(key_cols)
                        .loc[t_idx[matched_t]]
                        .reset_index(),
                        "source_",
                    )
                )
                decided = pd.Series(False, index=joined.index)
                for clause in upd:
                    hit = _eval_cond(joined, clause.condition) & ~decided
                    if hit.any():
                        res = _eval_values(joined[hit], clause.values, cols, "source")
                        for k in key_cols:  # keys never change under update
                            res[k] = joined.loc[hit, f"target_{k}"].to_numpy()
                        out_rows.append(res)
                        counters["updated"] += int(hit.sum())
                        decided |= hit
                for clause in dels:
                    hit = _eval_cond(joined, clause.condition) & ~decided
                    counters["deleted"] += int(hit.sum())
                    decided |= hit  # deleted rows are simply not re-emitted
                if (~decided).any():  # untouched matched rows stay as-is
                    keep = joined[~decided]
                    res = keep[[f"target_{c}" for c in cols]].copy()
                    res.columns = cols
                    out_rows.append(res)

            if len(src):
                unmatched_s = ~s_idx.isin(t_idx) if len(target) else pd.Series(
                    True, index=src.index
                ).to_numpy()
                if unmatched_s.any() and ins:
                    joined = _prefixed(src[unmatched_s].reset_index(drop=True), "source_")
                    decided = pd.Series(False, index=joined.index)
                    for clause in ins:
                        hit = _eval_cond(joined, clause.condition) & ~decided
                        if hit.any():
                            res = _eval_values(joined[hit], clause.values, cols, "source")
                            for k in key_cols:
                                res[k] = joined.loc[hit, f"source_{k}"].to_numpy()
                            out_rows.append(res)
                            counters["inserted"] += int(hit.sum())
                            decided |= hit

            if by_source and len(target):
                bs_mask = ~matched_t
                if bs_mask.any():
                    joined = _prefixed(target[bs_mask].reset_index(drop=True), "target_")
                    decided = pd.Series(False, index=joined.index)
                    keep_rows = joined.copy()
                    for clause in bs_upd:
                        hit = _eval_cond(joined, clause.condition) & ~decided
                        if hit.any():
                            res = _eval_values(joined[hit], clause.values, cols, "target")
                            for k in key_cols:
                                res[k] = joined.loc[hit, f"target_{k}"].to_numpy()
                            # replace the previously-kept untouched copies
                            keep_rows = keep_rows[~hit]
                            out_rows.append(res)
                            counters["bs_updated"] += int(hit.sum())
                            decided |= hit
                    for clause in bs_del:
                        hit = _eval_cond(joined, clause.condition) & ~decided
                        if hit.any():
                            keep_rows = keep_rows[~hit]
                            counters["bs_deleted"] += int(hit.sum())
                            decided |= hit
                    # out_rows[0] currently holds ALL unmatched target rows;
                    # rebuild it as only the ones no by-source clause touched
                    res = keep_rows[[f"target_{c}" for c in cols]].copy()
                    res.columns = cols
                    out_rows[0] = res

            merged = pd.concat(
                [r for r in out_rows if len(r)], ignore_index=True
            ) if any(len(r) for r in out_rows) else target.iloc[0:0]
            merged = merged.sort_values(key_cols, kind="mergesort").reset_index(drop=True)
            tmp = path + ".tmp"
            if len(merged):
                pq.write_table(pa.Table.from_pandas(merged, preserve_index=False), tmp)
                os.replace(tmp, path)
            elif os.path.exists(path):
                os.remove(path)
            return pd.DataFrame([{**counters, "bucket": b}])

        stats = grouped_map(tagged, ["_kbucket"], merge_bucket).to_pandas()  # bounded: one row per bucket
        return {
            k: int(stats[k].sum()) if len(stats) else 0
            for k in ("updated", "deleted", "inserted", "bs_updated", "bs_deleted")
        }
