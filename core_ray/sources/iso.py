"""ISO source family (reference ``sources/spark/iso/base_iso.py:31`` +
CAISO/MISO/ERCOT/PJM subclasses — SURVEY.md §2.3).

The reference pattern is: driver-side HTTP fetch → pandas ``_prepare_data`` /
``_sanitize_data`` → Spark DataFrame.  This sandbox has no network, so the
fetch step is pluggable: ``BaseISOSource._fetch`` returns raw bytes (a real
subclass would call ``requests``; ``FixtureISOSource`` reads a local file or
literal), and the prepare/sanitize hooks transform pandas before the data
enters Ray via ``from_pandas`` — the reference lifecycle preserved 1:1
(``base_iso.py:56,136,191-213``)."""

from __future__ import annotations

import io

import pandas as pd

import ray.data

from ..pipelines.framework import SourceComponent


class BaseISOSource(SourceComponent):
    required_columns: list[str] = []

    def _fetch(self) -> bytes:
        """Raw payload (CSV bytes). Real subclasses do the HTTP call here."""
        raise NotImplementedError

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        """Rename/derive columns (subclass hook)."""
        return df

    def _sanitize_data(self, df: pd.DataFrame) -> pd.DataFrame:
        """Drop invalid rows; enforce required columns."""
        missing = [c for c in self.required_columns if c not in df.columns]
        if missing:
            raise ValueError(f"missing required columns: {missing}")
        return df.dropna(subset=self.required_columns)

    def _get_data(self) -> pd.DataFrame:
        raw = self._fetch()
        df = pd.read_csv(io.BytesIO(raw))
        return self._sanitize_data(self._prepare_data(df))

    def read_batch(self) -> ray.data.Dataset:
        return ray.data.from_pandas(self._get_data())


class FixtureISOSource(BaseISOSource):
    """Deterministic ISO source over a CSV fixture (file path or bytes)."""

    required_columns = ["timestamp", "load_mw"]

    def __init__(self, fixture: str | bytes, zone: str = "ZONE1"):
        self.fixture = fixture
        self.zone = zone

    def _fetch(self) -> bytes:
        if isinstance(self.fixture, bytes):
            return self.fixture
        with open(self.fixture, "rb") as f:
            return f.read()

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={c: c.strip().lower() for c in df.columns})
        df["zone"] = self.zone
        df["timestamp"] = pd.to_datetime(df["timestamp"])
        return df
