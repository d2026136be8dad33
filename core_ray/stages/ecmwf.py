"""ECMWF MARS ``.nc`` forecast extraction → weather data model.

Reference semantics (``transformers/spark/ecmwf/nc_extractbase_to_weather_data_model.py:113-208``,
``nc_extractpoint_...py:21``, ``nc_extractgrid_...py:22``): one file per
forecast run named ``<yyyy-mm-dd>_<HH>.nc``; extraction selects the requested
latitudes/longitudes (nearest-neighbour) for a list of variables and melts the
cube to long rows — ``TagName = prefix + lat + "_" + lon + "_ECMWF_MARS_" +
measure`` with ``EnqueuedTime`` = run time and ``EventTime`` = forecast target
time — plus the wind-speed variable renames (``10u`` is stored as ``u10``...).

Ray-Data-first shape: run files are independent, so the run-time range becomes
a Dataset of run rows and each file is opened/selected/melted inside an
actor-pool ``map_batches`` stage — pipeline parallelism across runs with no
driver-side loop (the reference loops files on the driver and concats).

``xarray`` is NOT in this container, so the file-open kernel is an injectable
``loader``; :func:`fake_grid_loader` is a deterministic stand-in (values
derived from run time / variable / grid index via the engine hash) that keeps
the selection, melt and tag construction real and tested, exactly like the
multimodal decode gate (``stages/multimodal.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..synth import _hash2

# ECMWF stores the wind components under the swapped name (ref `:100-111`)
_WS_NAMES = {
    "10u": "u10",
    "100u": "u100",
    "200u": "u200",
    "10v": "v10",
    "100v": "v100",
    "200v": "v200",
}

_US_PER_HOUR = 3_600_000_000


def convert_ws_tag_names(variables: list[str]) -> list[str]:
    return [_WS_NAMES.get(v, v) for v in variables]


def run_times(date_start: str, date_end: str, run_interval: str, run_frequency: str):
    """Forecast-run timestamps between start and end at ``interval+frequency``
    (e.g. interval "12", frequency "H" → the 00 and 12 run of each day)."""
    freq = f"{run_interval}{run_frequency.lower()}"
    return pd.date_range(start=date_start, end=date_end, freq=freq)


def xarray_loader():
    """Real ``.nc`` loader — import-gated: xarray is absent in this container.

    Returns ``load(path, run_us, variables) -> (lats, lons, times_us, cube)``
    where ``cube[var]`` has shape ``(n_times, n_lat, n_lon)``.
    """

    def load(path, run_us, variables):  # pragma: no cover - xarray absent
        import xarray as xr

        ds = xr.open_dataset(path)
        lats = np.asarray(ds["latitude"], dtype=np.float64)
        lons = np.asarray(ds["longitude"], dtype=np.float64)
        times = np.asarray(ds["time"]).astype("datetime64[us]").astype(np.int64)
        cube = {v: np.asarray(ds[v]) for v in variables}
        ds.close()
        return lats, lons, times, cube

    return load


def fake_grid_loader(
    n_lat: int = 5, n_lon: int = 5, n_times: int = 4, seed: int = 7
):
    """Deterministic stand-in for :func:`xarray_loader`: a fixed 40..44°N ×
    -4..0°E grid with hourly steps from the run time; every value is a pure
    function of (seed, run, variable, time, cell) so repeated runs and
    different parallelism levels produce identical output."""

    def load(path, run_us, variables):
        lats = np.linspace(40.0, 44.0, n_lat)
        lons = np.linspace(-4.0, 0.0, n_lon)
        times = np.int64(run_us) + np.arange(n_times, dtype=np.int64) * _US_PER_HOUR
        cells = np.arange(n_times * n_lat * n_lon, dtype=np.uint64)
        cube = {}
        for vi, v in enumerate(sorted(variables)):
            h = _hash2(seed + vi, cells + np.uint64(run_us // _US_PER_HOUR))
            cube[v] = (h % np.uint64(10_000)).astype(np.float64).reshape(
                n_times, n_lat, n_lon
            ) / 100.0
        return lats, lons, times, cube

    return load


class ECMWFExtractStage:
    """Actor-pool stage: one forecast-run row in → melted weather rows out.

    The loader (file open / decode) is constructed once per actor in
    ``__init__``; ``__call__`` does the vectorized nearest-neighbour select
    and melt for each run in the batch.
    """

    def __init__(
        self,
        load_path: str,
        lat,
        lon,
        variables: list[str],
        tag_prefix: str,
        loader=None,
    ):
        self.load_path = load_path
        self.lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
        self.lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
        self.variables = sorted(convert_ws_tag_names(variables))
        self.tag_prefix = tag_prefix
        self.loader = loader if loader is not None else xarray_loader()

    def _one_run(self, run_us: int) -> dict[str, np.ndarray]:
        ts = pd.Timestamp(run_us, unit="us")
        path = f"{self.load_path}/{ts.date()}_{ts.hour:02}.nc"
        g_lats, g_lons, times, cube = self.loader(path, run_us, self.variables)
        # nearest-neighbour selection, vectorized over the requested points
        ilat = np.abs(g_lats[None, :] - self.lat[:, None]).argmin(axis=1)
        ilon = np.abs(g_lons[None, :] - self.lon[:, None]).argmin(axis=1)
        sel_lat = np.round(g_lats[ilat], 5)
        sel_lon = np.round(g_lons[ilon], 5)
        n_t, n_la, n_lo, n_v = len(times), len(ilat), len(ilon), len(self.variables)
        # melt order (lat, lon, time, var) — one take per variable, no loops
        # over cells
        vals = np.empty((n_la, n_lo, n_t, n_v), dtype=np.float64)
        for vi, v in enumerate(self.variables):
            vals[:, :, :, vi] = cube[v][:, ilat, :][:, :, ilon].transpose(1, 2, 0)
        lat_col = np.repeat(sel_lat, n_lo * n_t * n_v)
        lon_col = np.tile(np.repeat(sel_lon, n_t * n_v), n_la)
        time_col = np.tile(np.repeat(times, n_v), n_la * n_lo)
        var_col = np.tile(np.array(self.variables, dtype=object), n_la * n_lo * n_t)
        return {
            "Latitude": lat_col,
            "Longitude": lon_col,
            "EnqueuedTime": np.full(lat_col.shape, run_us, dtype=np.int64),
            "EventTime": time_col,
            "Measure": var_col,
            "Value": vals.ravel(),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        runs = batch["run_time"].to_numpy(zero_copy_only=False).astype(np.int64)
        parts = [self._one_run(int(r)) for r in runs]
        if not parts:
            parts = [self._one_run(0)]
            parts[0] = {k: v[:0] for k, v in parts[0].items()}
        cols = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
        lat_s = pd.Series(cols["Latitude"]).astype(str)
        lon_s = pd.Series(cols["Longitude"]).astype(str)
        tag = (
            self.tag_prefix
            + lat_s
            + "_"
            + lon_s
            + "_ECMWF_MARS_"
            + pd.Series(cols["Measure"]).astype(str)
        )
        ev = cols["EventTime"].astype("datetime64[us]")
        return pa.table(
            {
                "TagName": pa.array(tag, pa.string()),
                "Latitude": pa.array(cols["Latitude"], pa.float64()),
                "Longitude": pa.array(cols["Longitude"], pa.float64()),
                "EnqueuedTime": pa.array(
                    cols["EnqueuedTime"].astype("datetime64[us]")
                ),
                "EventTime": pa.array(ev),
                "EventDate": pa.array(ev.astype("datetime64[D]")),
                "Source": pa.array(
                    np.full(len(tag), "ECMWF_MARS", dtype=object), pa.string()
                ),
                "Status": pa.array(np.full(len(tag), "Good", dtype=object), pa.string()),
                "Value": pa.array(cols["Value"], pa.float64()),
                "Latest": pa.array(np.ones(len(tag), dtype=bool)),
            }
        )


def _extract(
    load_path, lat, lon, date_start, date_end, run_interval, run_frequency,
    variables, tag_prefix, loader, concurrency,
) -> ray.data.Dataset:
    from ..functions.text import pool_size

    runs = run_times(date_start, date_end, run_interval, run_frequency)
    ds = ray.data.from_items(
        [{"run_time": int(t.value // 1000)} for t in runs]
    )
    return ds.map_batches(
        ECMWFExtractStage,
        fn_constructor_kwargs=dict(
            load_path=load_path,
            lat=lat,
            lon=lon,
            variables=variables,
            tag_prefix=tag_prefix,
            loader=loader,
        ),
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency or pool_size(),
    )


def ecmwf_extract_point(
    load_path: str,
    lat: float,
    lon: float,
    date_start: str,
    date_end: str,
    run_interval: str,
    run_frequency: str,
    variables: list[str],
    tag_prefix: str,
    loader=None,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Point extraction (ref ``nc_extractpoint_to_weather_data_model.py:21``)."""
    return _extract(
        load_path, [lat], [lon], date_start, date_end, run_interval,
        run_frequency, variables, tag_prefix, loader, concurrency,
    )


def ecmwf_extract_grid(
    load_path: str,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    grid_step: float,
    date_start: str,
    date_end: str,
    run_interval: str,
    run_frequency: str,
    variables: list[str],
    tag_prefix: str,
    loader=None,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Grid extraction (ref ``nc_extractgrid_to_weather_data_model.py:22``):
    the request grid is ``linspace`` with ``round((max-min)/step)+1`` points."""
    lat = np.linspace(lat_min, lat_max, int(np.round((lat_max - lat_min) / grid_step)) + 1)
    lon = np.linspace(lon_min, lon_max, int(np.round((lon_max - lon_min) / grid_step)) + 1)
    return _extract(
        load_path, lat, lon, date_start, date_end, run_interval,
        run_frequency, variables, tag_prefix, loader, concurrency,
    )
