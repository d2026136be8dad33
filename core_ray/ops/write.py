"""Resumable partitioned Parquet output for batch pipelines.

Design requirement (ray_guide "Sources & sinks"): lay outputs out so a rerun
skips finished work — one directory per partition key, written atomically
(temp + rename), plus a manifest of completed partitions.  The streaming
engine has its own epoch-manifested sink (``streaming/sink.py``); this is the
batch-query analog (reference Delta writes partitioned by ``EventDate``,
``delta_table_create.py:48,54``).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from .common import grouped_map


def write_partitioned_resumable(
    ds: ray.data.Dataset,
    out_dir: str,
    partition_col: str,
    sort_cols: list[str] | None = None,
) -> dict:
    """Write one Parquet file per distinct ``partition_col`` value.

    Each partition writes ``part=<v>/data.parquet`` via temp+rename and is
    recorded in ``_manifest.json``; partitions already in the manifest are
    SKIPPED (a rerun after failure only writes what's missing).  Rows are
    sorted by ``sort_cols`` within the partition for deterministic files.
    Returns {"written": n, "skipped": n}.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_manifest.json")
    done: dict = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            done = json.load(f)

    def write_partition(g: pd.DataFrame) -> pd.DataFrame:
        key = str(g[partition_col].iloc[0])
        safe = key.replace("/", "_")
        if key in done:
            return pd.DataFrame({"partition": [key], "rows": [len(g)], "skipped": [True]})
        pdir = os.path.join(out_dir, f"part={safe}")
        os.makedirs(pdir, exist_ok=True)
        if sort_cols:
            g = g.sort_values(sort_cols, kind="mergesort")
        path = os.path.join(pdir, "data.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(g.reset_index(drop=True), preserve_index=False), tmp)
        os.replace(tmp, path)
        return pd.DataFrame({"partition": [key], "rows": [len(g)], "skipped": [False]})

    stats = grouped_map(ds, [partition_col], write_partition).to_pandas()  # bounded: one row per partition
    for _, r in stats.iterrows():
        if not r["skipped"]:
            done[str(r["partition"])] = int(r["rows"])
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(done, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, manifest_path)
    return {
        "written": int((~stats["skipped"]).sum()),
        "skipped": int(stats["skipped"].sum()),
    }
