"""Python (non-Spark) destinations (reference ``destinations/python/delta.py:23``).

``PolarsDeltaDestination`` mirrors the reference's mode semantics —
``error`` / ``append`` / ``overwrite`` / ``ignore`` against an existing
table — with the delta-rs writer import-gated (not in this container):
``format="delta"`` uses ``deltalake.write_deltalake`` when available,
``format="parquet"`` (the tested path) writes the same modes against a
parquet directory layout (one file per write, manifest-free append).
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..pipelines.framework import DestinationComponent

_MODES = ("error", "append", "overwrite", "ignore")


class PolarsDeltaDestination(DestinationComponent):
    def __init__(self, path: str, mode: str = "error", format: str = "parquet",
                 delta_write_options: dict | None = None):
        if mode not in _MODES:
            raise ValueError(f"mode must be one of {_MODES}")
        self.path = path
        self.mode = mode
        self.format = format
        self.delta_write_options = delta_write_options or {}

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and bool(os.listdir(self.path))

    def write_batch(self, ds: ray.data.Dataset) -> dict:
        exists = self._exists()
        if exists and self.mode == "error":
            raise FileExistsError(f"table exists at {self.path} (mode=error)")
        if exists and self.mode == "ignore":
            return {"written": 0, "skipped": True}
        if self.format == "delta":
            try:
                from deltalake import write_deltalake
            except ImportError as e:  # pragma: no cover - delta-rs not shipped
                raise ImportError(
                    "format='delta' requires the deltalake package; use "
                    "format='parquet' in this environment"
                ) from e
            table = pa.concat_tables(
                b for b in ds.iter_batches(batch_format="pyarrow")
            )
            write_deltalake(
                self.path, table,
                mode="overwrite" if self.mode == "overwrite" else "append",
                **self.delta_write_options,
            )
            return {"written": table.num_rows, "skipped": False}
        os.makedirs(self.path, exist_ok=True)
        if self.mode == "overwrite":
            for f in os.listdir(self.path):
                if f.endswith(".parquet"):
                    os.remove(os.path.join(self.path, f))
        # stream blocks through one writer — no driver-side materialization
        name = f"part-{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(self.path, "." + name)
        writer, written = None, 0
        for batch in ds.iter_batches(batch_format="pyarrow"):
            if writer is None:
                writer = pq.ParquetWriter(tmp, batch.schema)
            writer.write_table(batch)
            written += batch.num_rows
        if writer is None:
            return {"written": 0, "skipped": False}
        writer.close()
        os.replace(tmp, os.path.join(self.path, name))
        return {"written": written, "skipped": False}

    def read_back(self) -> pa.Table:
        files = (
            sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".parquet")
            )
            if os.path.isdir(self.path)
            else []
        )
        if not files:
            return pa.table({})
        return pa.concat_tables(pq.read_table(f) for f in files)
