"""Python (non-Spark) sources: Polars scan + MFFBAS consumption profiles.

Reference ``sources/python/delta.py`` reads Delta into a Polars LazyFrame;
here :class:`PolarsSource` scans Parquet with Polars (``scan_delta`` is
import-gated — delta-rs is not in this container) and bridges lazily into a
Ray Dataset via Arrow.  Reference ``sources/python/mffbas.py`` pulls the
Standaard Jaar Verbruiksprofielen API; :class:`MFFBASSource` implements its
``_prepare_data`` transformation 1:1 over an injectable payload (the API is
unreachable in-sandbox): explode PointList, map direction E17/E18 → A/I,
join the profile key, derive the 15-minute timestamp from pos, keep pos<96,
pivot to one column per profile.
"""

from __future__ import annotations

import pandas as pd

import ray.data

from ..pipelines.framework import SourceComponent


class PolarsSource(SourceComponent):
    """Polars lazy scan → Ray Dataset (Arrow hand-off, no pandas copy)."""

    def __init__(self, path: str, fmt: str = "parquet"):
        self.path = path
        self.fmt = fmt

    def _lazyframe(self):
        import polars as pl

        if self.fmt == "parquet":
            return pl.scan_parquet(self.path)
        if self.fmt == "delta":
            try:  # pragma: no cover - delta-rs absent in this container
                import deltalake  # noqa: F401  (scan_delta is lazy; the
                # missing-import error would otherwise only surface at
                # collect time, so probe eagerly)
            except ImportError:
                return self._scan_delta_native()
            return pl.scan_delta(self.path)
        raise ValueError(f"unsupported format: {self.fmt}")

    def _scan_delta_native(self):
        """delta-rs-free fallback: resolve live files + partition values
        from the native ``_delta_log`` reader (``sources/delta_log.py``)
        and scan them lazily with Polars, partition columns attached as
        typed literals per file group."""
        import os

        import polars as pl
        import pyarrow as pa

        from .delta_log import _partition_types, _typed_scalar, snapshot

        snap = snapshot(self.path)
        ptypes = _partition_types(snap)
        groups: dict[tuple, list[str]] = {}
        for f in snap.files:
            key = tuple(
                f["partitionValues"].get(c) for c in snap.partition_columns
            )
            groups.setdefault(key, []).append(
                os.path.join(self.path, f["path"])
            )
        frames = []
        order = sorted(
            groups.items(),
            key=lambda kv: tuple((v is None, v or "") for v in kv[0]),
        )
        for key, paths in order:
            lf = pl.scan_parquet(sorted(paths))
            for i, c in enumerate(snap.partition_columns):
                val = _typed_scalar(key[i], ptypes[c])
                dtype = pl.Series(
                    pa.chunked_array([pa.array([], ptypes[c])])
                ).dtype
                lf = lf.with_columns(pl.lit(val, dtype=dtype).alias(c))
            frames.append(lf)
        return pl.concat(frames) if len(frames) > 1 else frames[0]

    def read_batch(self) -> ray.data.Dataset:
        return ray.data.from_arrow(self._lazyframe().collect().to_arrow())


class EntsoeSource(SourceComponent):
    """Day-ahead power prices from the ENTSO-E transparency platform
    (reference ``sources/python/entsoe.py:23``): query prices for a country
    code between two UTC timestamps at a given resolution and return
    ``(EventTime, Price, Name)`` rows with ``Name = "APX"``.

    The ``entsoe-py`` client needs the network, which is absent in-sandbox,
    so the client is injectable: any callable ``(country_code, start, end,
    resolution) -> pd.Series`` (prices indexed by timestamp).  The default
    import-gates the real client.
    """

    def __init__(
        self,
        api_key: str,
        start: str,
        end: str,
        country_code: str,
        resolution: str = "60T",
        client=None,
    ):
        self.api_key = api_key
        self.start = pd.Timestamp(start, tz="UTC")
        self.end = pd.Timestamp(end, tz="UTC")
        self.country_code = country_code
        self.resolution = resolution
        self.client = client

    def _query(self) -> pd.Series:
        if self.client is not None:
            return self.client(self.country_code, self.start, self.end, self.resolution)
        from entsoe import EntsoePandasClient  # pragma: no cover - not installed

        return EntsoePandasClient(api_key=self.api_key).query_day_ahead_prices(
            self.country_code, start=self.start, end=self.end
        )

    def read_batch(self) -> ray.data.Dataset:
        prices = self._query()
        df = pd.DataFrame({"Price": prices.astype(float)})
        df["Name"] = "APX"
        df = df.rename_axis("EventTime").reset_index()
        df["EventTime"] = pd.to_datetime(df["EventTime"], utc=True).dt.tz_convert(
            None
        )
        return ray.data.from_pandas(df)


class MFFBASSource(SourceComponent):
    """Standard Consumption Profiles source over an injectable payload."""

    def __init__(self, payload: dict):
        self.payload = payload

    def _pull_data(self) -> dict:
        return self.payload

    def _prepare_data(self) -> pd.DataFrame:
        data = self._pull_data()
        df = pd.DataFrame.from_dict(data["Detail_SeriesList"])
        df = df.rename(columns={"calendar_date": "Versienr"})
        df = df.explode("PointList")
        df = pd.concat(
            [df.drop(["PointList"], axis=1), df["PointList"].apply(pd.Series)], axis=1
        )
        df["direction"] = df["direction"].map({"E17": "A", "E18": "I"})
        df["profiles"] = df[
            ["profileCategory", "determinedConsumption", "direction"]
        ].agg(lambda x: "_".join(x.dropna()), axis=1)
        df["Versienr"] = pd.to_datetime(df["Versienr"]) + pd.to_timedelta(
            df["pos"] * 15, unit="min"
        )
        df = df[df["pos"] < 96]
        df = df.drop(
            columns=[
                "direction",
                "pFdate_version",
                "profileCategory",
                "determinedConsumption",
                "pos",
                "resolution",
                "profileStatus_quality",
            ]
        )
        result = df.pivot(index="Versienr", columns="profiles", values="qnt")
        result["year_created"] = result.index.strftime("%Y-%m-%d")
        return result

    def read_batch(self) -> ray.data.Dataset:
        out = self._prepare_data().reset_index()
        out.columns = [str(c) for c in out.columns]
        return ray.data.from_pandas(out)
