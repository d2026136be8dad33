"""Queryable run logs: loggers -> Dataset.

Reference parity: ``pipelines/logging/logger_manager.py:21-77``
(``LoggerManager`` singleton registry),
``pipelines/logging/spark/dataframe/dataframe_log_handler.py:23-72``
(log records captured at runtime into a queryable DataFrame with columns
``timestamp/name/level/message``),
``pipelines/logging/spark/log_file/file_log_handler.py:21-61`` and
``pipelines/logging/spark/runtime_log_collector.py:32-70``.

Engine notes:

- The reference's handler unions a one-row Spark DataFrame per record
  (quadratic); here records buffer as plain Python lists and materialize
  to Arrow only when queried.
- Driver-process loggers are what a handler can see.  Distributed stages
  don't log through driver handlers — their run telemetry is the streaming
  sink's per-partition epoch manifests, surfaced as a queryable Dataset by
  :func:`manifest_logs` (row/token/late/dupe counters, watermark, one row
  per (partition, epoch) commit).
"""

from __future__ import annotations

import json
import logging
import os
from datetime import datetime

import pandas as pd
import pyarrow as pa

import ray.data

LOG_SCHEMA = pa.schema(
    [
        ("timestamp", pa.timestamp("us")),
        ("name", pa.string()),
        ("level", pa.string()),
        ("message", pa.string()),
    ]
)


class DatasetLogHandler(logging.Handler):
    """Buffers log records and exposes them as a queryable table.

    ``get_logs_as_df()`` mirrors the reference method name; ``to_dataset()``
    is the Ray-native surface."""

    def __init__(self):
        super().__init__()
        self._rows: list[tuple] = []

    def emit(self, record: logging.LogRecord) -> None:
        self._rows.append(
            (
                datetime.fromtimestamp(record.created),
                record.name,
                record.levelname,
                record.getMessage(),
            )
        )

    def _table(self) -> pa.Table:
        cols = list(zip(*self._rows)) if self._rows else [[], [], [], []]
        return pa.table(
            {f.name: pa.array(list(c), f.type) for f, c in zip(LOG_SCHEMA, cols)}
        )

    def get_logs_as_df(self) -> pd.DataFrame:
        return self._table().to_pandas()  # bounded: in-memory log buffer

    def to_dataset(self) -> ray.data.Dataset:
        return ray.data.from_arrow(self._table())

    def clear(self) -> None:
        self._rows.clear()


class FileLogHandler(logging.Handler):
    """Appends ``isoformat | name | LEVEL | message`` lines to a file
    (reference ``file_log_handler.py:21-61``)."""

    def __init__(self, file_path: str, mode: str = "a"):
        super().__init__()
        self.file_path = file_path
        self.mode = mode

    def emit(self, record: logging.LogRecord) -> None:
        line = (
            f"{datetime.fromtimestamp(record.created).isoformat()} | "
            f"{record.name} | {record.levelname} | {record.getMessage()}\n"
        )
        with open(self.file_path, self.mode, encoding="utf-8") as f:
            f.write(line)


class LoggerManager:
    """Singleton registry of application loggers (reference
    ``logger_manager.py:21-77``)."""

    _instance = None
    loggers: dict[str, logging.Logger] = {}

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    @classmethod
    def create_logger(cls, name: str) -> logging.Logger:
        if name not in cls.loggers:
            cls.loggers[name] = logging.getLogger(name)
        return cls.loggers[name]

    @classmethod
    def get_logger(cls, name: str) -> logging.Logger | None:
        return cls.loggers.get(name)

    @classmethod
    def get_all_loggers(cls) -> dict[str, logging.Logger]:
        return dict(cls.loggers)


class RuntimeLogCollector:
    """Attaches handlers to managed loggers (reference
    ``runtime_log_collector.py:32-70``)."""

    def __init__(self):
        self.logger_manager = LoggerManager()

    def attach_dataset_handler_to_logger(self, logger_name: str) -> DatasetLogHandler:
        logger = self.logger_manager.get_logger(logger_name)
        if logger is None:
            # returning an unattached handler would silently collect nothing
            raise ValueError(
                f"no managed logger {logger_name!r}; create it with "
                "LoggerManager.create_logger first"
            )
        handler = DatasetLogHandler()
        logger.addHandler(handler)
        return handler

    def attach_file_handler_to_loggers(
        self, filename: str, path: str = ".", mode: str = "a"
    ) -> None:
        handler = FileLogHandler(os.path.join(path, filename), mode)
        for logger in self.logger_manager.get_all_loggers().values():
            if handler not in logger.handlers:
                logger.addHandler(handler)


def manifest_logs(out_dir: str) -> ray.data.Dataset:
    """The streaming sink's epoch manifests as a queryable Dataset: one row
    per committed (partition, epoch) with its lineage counters — the
    distributed-run analog of the driver-side log handler.  Manifests are
    tiny JSON commit records, so this reads them driver-side in one pass."""
    rows = []
    mroot = os.path.join(out_dir, "manifests")
    if os.path.isdir(mroot):
        for part in sorted(os.listdir(mroot)):
            pdir = os.path.join(mroot, part)
            if not (part.startswith("part=") and os.path.isdir(pdir)):
                continue
            pid = int(part.split("=", 1)[1])
            for name in sorted(os.listdir(pdir)):
                if not (name.startswith("epoch-") and name.endswith(".json")):
                    continue
                with open(os.path.join(pdir, name)) as f:
                    m = json.load(f)
                rows.append(
                    {
                        "partition": pid,
                        "epoch": int(name[6:-5]),
                        **{k: m[k] for k in sorted(m) if not isinstance(m[k], (dict, list))},
                    }
                )
    if not rows:
        return ray.data.from_arrow(
            pa.table({"partition": pa.array([], pa.int64()), "epoch": pa.array([], pa.int64())})
        )
    return ray.data.from_pandas(pd.DataFrame(rows))
