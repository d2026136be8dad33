"""Minimal native Delta Lake transaction-log reader (no Spark, no delta-rs).

Reference ``sources/spark/delta.py:24`` reads Delta tables through Spark;
this module resolves a Delta table's LIVE parquet files + partition values
directly from the public ``_delta_log`` commit-log format (delta.io
PROTOCOL.md): JSON commit files ``<v>.json`` holding one action per line
(``add`` / ``remove`` / ``metaData`` / ``protocol``), optional parquet
checkpoints ``<v>.checkpoint*.parquet`` summarizing state at ``v``, and the
``_last_checkpoint`` pointer.  State reconstruction replays the checkpoint
(if any) plus every later commit in version order, applying adds and remove
tombstones.

``read_delta`` feeds the resolved files straight into
``ray.data.read_parquet`` — files sharing a partition tuple are read in one
call (column pruning and predicate pushdown intact) and their
``partitionValues`` are attached as constant columns typed per the table
schema, so a Hive-partitioned Delta table round-trips exactly.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

import ray.data

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(r"^(\d{20})\.checkpoint(\.\d+\.\d+)?\.parquet$")


@dataclass
class DeltaSnapshot:
    """Live state of a Delta table at a version."""

    version: int
    files: list[dict] = field(default_factory=list)  # {path, partitionValues}
    schema_string: str | None = None
    partition_columns: list[str] = field(default_factory=list)


def _log_dir(table_path: str) -> str:
    d = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(d):
        raise FileNotFoundError(f"not a Delta table (no _delta_log): {table_path}")
    return d


def _apply_action(state: dict, action: dict) -> None:
    if "add" in action and action["add"] is not None:
        a = action["add"]
        state["files"][a["path"]] = dict(a.get("partitionValues") or {})
    elif "remove" in action and action["remove"] is not None:
        state["files"].pop(action["remove"]["path"], None)
    elif "metaData" in action and action["metaData"] is not None:
        m = action["metaData"]
        state["schema_string"] = m.get("schemaString")
        state["partition_columns"] = list(m.get("partitionColumns") or [])


def _read_checkpoint(paths: list[str], state: dict) -> None:
    """Checkpoint parquet: one row per action, struct columns add/remove/
    metaData.  partitionValues may be a map or struct — both normalize to
    a plain dict."""
    import pyarrow.parquet as pq

    for path in paths:
        t = pq.read_table(path)
        rows = t.to_pylist()
        for r in rows:
            add = r.get("add")
            if add:
                pv = add.get("partitionValues") or {}
                if isinstance(pv, list):  # map type materializes as pairs
                    pv = dict(pv)
                state["files"][add["path"]] = pv
            meta = r.get("metaData")
            if meta:
                state["schema_string"] = meta.get("schemaString")
                state["partition_columns"] = list(
                    meta.get("partitionColumns") or []
                )
        # removes in a checkpoint are expired tombstones — nothing to apply


def _commit_timestamp(path: str) -> int:
    """Commit timestamp in epoch-ms: the ``commitInfo.timestamp`` action if
    the commit carries one (what Spark writes), else the log file's mtime —
    the same fallback the Delta protocol prescribes for time travel."""
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                info = json.loads(line).get("commitInfo")
                if info and isinstance(info.get("timestamp"), int):
                    return info["timestamp"]
    except (OSError, ValueError):
        pass
    return int(os.path.getmtime(path) * 1000)


def version_at_timestamp(table_path: str, timestamp_ms: int) -> int:
    """``timestampAsOf`` resolution (reference ``sources/spark/delta.py:64``):
    the LATEST version whose commit timestamp is <= the target.  Commit
    timestamps are read from each commit's ``commitInfo`` (file-mtime
    fallback); per the protocol they are treated as monotonic via a running
    max, so a clock-skewed earlier commit can't shadow a later one."""
    log = _log_dir(table_path)
    versions = sorted(
        int(m.group(1))
        for n in os.listdir(log)
        if (m := _COMMIT_RE.match(n))
    )
    if not versions:
        raise FileNotFoundError(f"empty _delta_log in {table_path}")
    best, running = None, None
    for v in versions:
        ts = _commit_timestamp(os.path.join(log, f"{v:020d}.json"))
        running = ts if running is None else max(running, ts)
        if running <= timestamp_ms:
            best = v
    if best is None:
        raise ValueError(
            f"timestamp {timestamp_ms} predates the first commit "
            f"({running} at version {versions[0]})"
        )
    return best


def snapshot(
    table_path: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> DeltaSnapshot:
    """Reconstruct the live-file set at ``version`` (default: latest), or at
    the version live as of ``timestamp_ms`` (exclusive with ``version``).

    IO shape: ONE checkpoint read (the newest at or below the target
    version, found via ``_last_checkpoint`` or a directory scan) + the JSON
    commits after it — the log replay is O(commits since checkpoint), not
    O(table history).
    """
    if version is not None and timestamp_ms is not None:
        raise ValueError("pass version OR timestamp_ms, not both")
    if timestamp_ms is not None:
        version = version_at_timestamp(table_path, timestamp_ms)
    log = _log_dir(table_path)
    names = sorted(os.listdir(log))
    commits: dict[int, str] = {}
    checkpoints: dict[int, list[str]] = {}
    for n in names:
        m = _COMMIT_RE.match(n)
        if m:
            commits[int(m.group(1))] = os.path.join(log, n)
            continue
        m = _CHECKPOINT_RE.match(n)
        if m:
            checkpoints.setdefault(int(m.group(1)), []).append(
                os.path.join(log, n)
            )
    if not commits and not checkpoints:
        raise FileNotFoundError(f"empty _delta_log in {table_path}")
    latest = max(list(commits) + list(checkpoints))
    target = latest if version is None else int(version)
    if target > latest:
        raise ValueError(f"version {target} > latest {latest}")

    # newest usable checkpoint at or below the target version; the
    # _last_checkpoint pointer is a hint, the directory scan the authority
    ckpt_version = None
    usable = [v for v in checkpoints if v <= target]
    if usable:
        ckpt_version = max(usable)

    state: dict = {"files": {}, "schema_string": None, "partition_columns": []}
    if ckpt_version is not None:
        _read_checkpoint(sorted(checkpoints[ckpt_version]), state)
    start = 0 if ckpt_version is None else ckpt_version + 1
    for v in range(start, target + 1):
        path = commits.get(v)
        if path is None:
            if ckpt_version is not None and v <= ckpt_version:
                continue
            raise FileNotFoundError(
                f"missing commit {v} in {table_path}/_delta_log"
            )
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    _apply_action(state, json.loads(line))

    return DeltaSnapshot(
        version=target,
        files=[
            {"path": p, "partitionValues": pv}
            for p, pv in sorted(state["files"].items())
        ],
        schema_string=state["schema_string"],
        partition_columns=state["partition_columns"],
    )


_SPARK_TO_ARROW = {
    "string": pa.string(),
    "long": pa.int64(),
    "integer": pa.int32(),
    "short": pa.int16(),
    "byte": pa.int8(),
    "double": pa.float64(),
    "float": pa.float32(),
    "boolean": pa.bool_(),
    "date": pa.date32(),
    "timestamp": pa.timestamp("us"),
}


def _partition_types(snap: DeltaSnapshot) -> dict[str, pa.DataType]:
    """Partition-column Arrow types from the metaData schemaString (a Spark
    struct JSON); unknown/absent types default to string (the log stores
    partition values as strings anyway)."""
    out = {c: pa.string() for c in snap.partition_columns}
    if snap.schema_string:
        try:
            for f in json.loads(snap.schema_string).get("fields", []):
                if f.get("name") in out and isinstance(f.get("type"), str):
                    out[f["name"]] = _SPARK_TO_ARROW.get(
                        f["type"], pa.string()
                    )
        except (ValueError, AttributeError):
            pass
    return out


def _typed_scalar(raw: str | None, typ: pa.DataType):
    if raw is None or raw == "" or raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    return pa.scalar(raw, pa.string()).cast(typ).as_py()


def read_delta(
    table_path: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Delta table -> Ray Dataset.  Files are grouped by partition tuple so
    each group is ONE pruned ``read_parquet`` (reads stay parallel and
    column/predicate pushdown applies); partition values become constant
    typed columns appended per batch.  ``version`` / ``timestamp_ms`` are
    the reference's versionAsOf / timestampAsOf time-travel options."""
    snap = snapshot(table_path, version=version, timestamp_ms=timestamp_ms)
    if not snap.files:
        raise FileNotFoundError(f"Delta table {table_path} has no live files")
    return read_snapshot(snap, base_path=table_path, columns=columns)


def read_snapshot(
    snap: DeltaSnapshot,
    base_path: str = "",
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Assemble a Dataset from any resolved live-file snapshot — the local
    ``_delta_log`` replay above or a Delta Sharing query response (the
    sharing protocol's metaData/file actions carry the same schemaString +
    partitionValues shape, ``sources/delta_sharing.py``)."""
    if not snap.files:
        raise FileNotFoundError("snapshot has no live files")
    ptypes = _partition_types(snap)
    pcols = [c for c in snap.partition_columns if columns is None or c in columns]
    data_columns = (
        None if columns is None else [c for c in columns if c not in pcols]
    )

    groups: dict[tuple, list[str]] = {}
    for f in snap.files:
        key = tuple(f["partitionValues"].get(c) for c in snap.partition_columns)
        groups.setdefault(key, []).append(
            os.path.join(base_path, f["path"]) if base_path else f["path"]
        )

    def attach(consts: dict):
        def fn(t: pa.Table) -> pa.Table:
            for name, value in consts.items():
                if name in t.column_names:
                    # a hive-laid-out file tree lets the parquet reader
                    # auto-infer the column from the path; the transaction
                    # log's partitionValues are the authority, so replace
                    t = t.drop_columns([name])
                arr = pa.nulls(len(t), ptypes[name]) if value is None else (
                    pa.array(np.repeat(np.array([value]), len(t)))
                    if isinstance(value, (int, float, np.number))
                    else pa.array([value] * len(t), ptypes[name])
                )
                t = t.append_column(name, arr.cast(ptypes[name]))
            return t

        return fn

    parts = []
    # None-safe ordering: a null partition value (JSON null /
    # __HIVE_DEFAULT_PARTITION__) must sort, not TypeError against strings
    order = sorted(
        groups.items(),
        key=lambda kv: tuple((v is None, v or "") for v in kv[0]),
    )
    for key, paths in order:
        ds = ray.data.read_parquet(sorted(paths), columns=data_columns)
        if pcols:
            consts = {
                c: _typed_scalar(
                    key[snap.partition_columns.index(c)], ptypes[c]
                )
                for c in pcols
            }
            ds = ds.map_batches(attach(consts), batch_format="pyarrow")
        parts.append(ds)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


__all__ = [
    "DeltaSnapshot",
    "snapshot",
    "read_delta",
    "read_snapshot",
    "version_at_timestamp",
]
