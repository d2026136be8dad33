"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01 and
compares it against the matching ``oracle_sql()[name]`` via DuckDB (row-count +
schema + order-insensitive value-hash).

Conventions shared by every (query, oracle) pair so value-hashes match:
- every float AGGREGATE output is rounded to 4 decimals on both sides
  (summation-order float noise is far below 1e-4);
- ties on EventTime break by value so first/last/latest are deterministic;
- timestamps are UTC-naive microseconds on both sides.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# Canonical query window over the driver's `events` table (spans Jan 2024).
START = "2024-01-01 00:00:00"
END = "2024-01-31 00:00:00"
S_US = 1_704_067_200_000_000  # epoch_us(START)
E_US = 1_706_659_200_000_000  # epoch_us(END)
HOUR_US = 3_600_000_000
TAGS2 = ["click", "purchase"]

AT_TIMESTAMPS = ["2024-01-05 00:00:00", "2024-01-10 12:30:00", "2024-02-05 00:00:00"]


def entry() -> Any:
    """Flagship pipeline on sf0.001: hourly resample (avg) over `events`."""
    from core_ray.ops import resample

    return resample(
        "/root/testdata/sf0.001", start=START, end=END, rate=1, unit="hour", agg="avg"
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_ts_raw(sf):
    from core_ray.ops import raw

    return raw(sf, start=START, end=END, tags=TAGS2, deduplicate=False)


def _q_ts_resample_avg(sf):
    from core_ray.ops import resample

    return resample(sf, start=START, end=END, rate=1, unit="hour", agg="avg")


def _q_ts_resample_last(sf):
    from core_ray.ops import resample

    return resample(sf, start=START, end=END, rate=1, unit="hour", agg="last")


def _q_ts_resample_count_fill(sf):
    from core_ray.ops import resample

    return resample(sf, start=START, end=END, rate=1, unit="hour", agg="count", fill=True)


def _q_ts_summary(sf):
    from core_ray.ops import summary

    return summary(sf, start=START, end=END)


def _q_ts_latest(sf):
    from core_ray.ops import latest

    return latest(sf)


def _q_ts_plot(sf):
    from core_ray.ops import plot

    return plot(sf, start=START, end=END, rate=6, unit="hour")


def _q_ts_interpolate(sf):
    from core_ray.ops import interpolate

    return interpolate(sf, start=START, end=END, rate=1, unit="hour")


def _q_ts_interp_at_time(sf):
    from core_ray.ops import interpolation_at_time

    return interpolation_at_time(sf, timestamps=AT_TIMESTAMPS)


def _q_ts_twa(sf):
    from core_ray.ops import time_weighted_average

    return time_weighted_average(sf, start=START, end=END, rate=1, unit="hour", step=False)


def _q_ts_twa_step(sf):
    from core_ray.ops import time_weighted_average

    return time_weighted_average(sf, start=START, end=END, rate=1, unit="hour", step=True)


def _q_ts_circular_avg(sf):
    from core_ray.ops import circular_average

    return circular_average(
        sf, start=START, end=END, rate=1, unit="day", lower_bound=0.0, upper_bound=360.0
    )


def _q_ts_circular_std(sf):
    from core_ray.ops import circular_stddev

    return circular_stddev(
        sf, start=START, end=END, rate=1, unit="day", lower_bound=0.0, upper_bound=360.0
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "ts_raw": _q_ts_raw,
        "ts_resample_avg": _q_ts_resample_avg,
        "ts_resample_last": _q_ts_resample_last,
        "ts_resample_count_fill": _q_ts_resample_count_fill,
        "ts_summary": _q_ts_summary,
        "ts_latest": _q_ts_latest,
        "ts_plot": _q_ts_plot,
        "ts_interpolate": _q_ts_interpolate,
        "ts_interp_at_time": _q_ts_interp_at_time,
        "ts_twa": _q_ts_twa,
        "ts_twa_step": _q_ts_twa_step,
        "ts_circular_avg": _q_ts_circular_avg,
        "ts_circular_std": _q_ts_circular_std,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; tables pre-registered as views)
# ---------------------------------------------------------------------------

_RANGE = f"ts BETWEEN TIMESTAMP '{START}' AND TIMESTAMP '{END}'"
_WS = f"({S_US} + ((epoch_us(ts) - {S_US}) // {HOUR_US}) * {HOUR_US})"


def _resample_base(ws_expr: str = _WS, where: str = _RANGE) -> str:
    return (
        f"SELECT event_type AS TagName, epoch_us(ts) AS tus, value, {ws_expr} AS ws "
        f"FROM events WHERE {where}"
    )


_ORACLE: dict[str, str] = {}

_ORACLE["ts_raw"] = f"""
SELECT event_type AS TagName, ts AS EventTime, 'Good' AS Status, value AS Value
FROM events
WHERE {_RANGE} AND event_type IN ('click', 'purchase')
ORDER BY 1, 2
"""

_ORACLE["ts_resample_avg"] = f"""
WITH f AS ({_resample_base()})
SELECT TagName, make_timestamp(ws) AS EventTime, round_even(AVG(value), 4) AS Value
FROM f GROUP BY 1, 2 ORDER BY 1, 2
"""

_ORACLE["ts_resample_last"] = f"""
WITH f AS ({_resample_base()}),
r AS (SELECT *, row_number() OVER (PARTITION BY TagName, ws ORDER BY tus DESC, value DESC) rn FROM f)
SELECT TagName, make_timestamp(ws) AS EventTime, round_even(value, 4) AS Value
FROM r WHERE rn = 1 ORDER BY 1, 2
"""

_ORACLE["ts_resample_count_fill"] = f"""
WITH f AS ({_resample_base()}),
agg AS (SELECT TagName, ws, CAST(COUNT(*) AS DOUBLE) AS v FROM f GROUP BY 1, 2),
tags AS (SELECT DISTINCT TagName FROM f),
grid AS (SELECT unnest(generate_series({S_US}, {E_US}, {HOUR_US})) AS ws)
SELECT t.TagName, make_timestamp(g.ws) AS EventTime, a.v AS Value
FROM tags t CROSS JOIN grid g
LEFT JOIN agg a ON a.TagName = t.TagName AND a.ws = g.ws
ORDER BY 1, 2
"""

_ORACLE["ts_summary"] = f"""
SELECT event_type AS TagName,
       CAST(COUNT(*) AS DOUBLE) AS Count,
       round_even(AVG(value), 4) AS Avg,
       MIN(value) AS Min,
       MAX(value) AS Max,
       round_even(STDDEV_SAMP(value), 4) AS StDev,
       round_even(SUM(value), 4) AS Sum,
       round_even(VAR_SAMP(value), 4) AS Var
FROM events WHERE {_RANGE}
GROUP BY 1 ORDER BY 1
"""

_ORACLE["ts_latest"] = """
SELECT event_type AS TagName, ts AS EventTime, 'Good' AS Status, value AS Value,
       ts AS GoodEventTime, value AS GoodValue
FROM events
QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, value DESC) = 1
ORDER BY 1
"""

_PLOT_WS = f"({S_US} + ((epoch_us(ts) - {S_US}) // {6 * HOUR_US}) * {6 * HOUR_US})"
_ORACLE["ts_plot"] = f"""
WITH f AS ({_resample_base(_PLOT_WS)}),
base AS (
  SELECT TagName, ws, value,
         row_number() OVER (PARTITION BY TagName, ws ORDER BY tus, value) rna,
         row_number() OVER (PARTITION BY TagName, ws ORDER BY tus DESC, value DESC) rnd
  FROM f),
agg AS (
  SELECT TagName, ws,
         round_even(MIN(value), 4) vmin, round_even(MAX(value), 4) vmax,
         round_even(MIN(CASE WHEN rna = 1 THEN value END), 4) vfirst,
         round_even(MIN(CASE WHEN rnd = 1 THEN value END), 4) vlast
  FROM base GROUP BY 1, 2)
SELECT TagName, make_timestamp(ws) AS EventTime, 'Min' AS Aggregation, vmin AS Value FROM agg
UNION ALL
SELECT TagName, make_timestamp(ws), 'Max', vmax FROM agg
UNION ALL
SELECT TagName, make_timestamp(ws), 'First', vfirst FROM agg
UNION ALL
SELECT TagName, make_timestamp(ws), 'Last', vlast FROM agg
ORDER BY 1, 2, 3
"""

_ORACLE["ts_interpolate"] = f"""
WITH f AS ({_resample_base()}),
r AS (SELECT *, row_number() OVER (PARTITION BY TagName, ws ORDER BY tus DESC, value DESC) rn FROM f),
agg AS (SELECT TagName, ws, value AS v FROM r WHERE rn = 1),
tags AS (SELECT DISTINCT TagName FROM f),
grid AS (SELECT unnest(generate_series({S_US}, {E_US}, {HOUR_US})) AS wus),
j AS (SELECT t.TagName, g.wus, a.v
      FROM tags t CROSS JOIN grid g
      LEFT JOIN agg a ON a.TagName = t.TagName AND a.ws = g.wus),
w AS (SELECT TagName, wus, v,
  last_value(v IGNORE NULLS) OVER
    (PARTITION BY TagName ORDER BY wus ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pv,
  last_value(CASE WHEN v IS NOT NULL THEN wus END IGNORE NULLS) OVER
    (PARTITION BY TagName ORDER BY wus ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pt,
  first_value(v IGNORE NULLS) OVER
    (PARTITION BY TagName ORDER BY wus ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nv,
  first_value(CASE WHEN v IS NOT NULL THEN wus END IGNORE NULLS) OVER
    (PARTITION BY TagName ORDER BY wus ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nt
  FROM j)
SELECT TagName, make_timestamp(wus) AS EventTime,
  round_even(CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (wus - pt) / (nt - pt)
             WHEN pv IS NOT NULL THEN pv END, 4) AS Value
FROM w ORDER BY 1, 2
"""

_at_list = ", ".join(f"TIMESTAMP '{t}'" for t in AT_TIMESTAMPS)
_ORACLE["ts_interp_at_time"] = f"""
WITH ev AS (SELECT event_type AS TagName, epoch_us(ts) AS tus, MIN(value) AS v
            FROM events GROUP BY 1, 2),
req AS (SELECT epoch_us(unnest([{_at_list}])) AS tus),
tags AS (SELECT DISTINCT TagName FROM ev),
pts AS (SELECT TagName, tus, v, 0 AS is_req FROM ev
        UNION ALL
        SELECT t.TagName, r.tus, NULL, 1 FROM tags t CROSS JOIN req r),
w AS (SELECT TagName, tus, v, is_req,
  last_value(v IGNORE NULLS) OVER
    (PARTITION BY TagName ORDER BY tus, is_req ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pv,
  last_value(CASE WHEN v IS NOT NULL THEN tus END IGNORE NULLS) OVER
    (PARTITION BY TagName ORDER BY tus, is_req ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pt,
  first_value(v IGNORE NULLS) OVER
    (PARTITION BY TagName ORDER BY tus, is_req ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nv,
  first_value(CASE WHEN v IS NOT NULL THEN tus END IGNORE NULLS) OVER
    (PARTITION BY TagName ORDER BY tus, is_req ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nt
  FROM pts)
SELECT TagName, make_timestamp(tus) AS EventTime,
  round_even(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt <> pt
               THEN pv + (nv - pv) * (tus - pt) / (nt - pt)
             WHEN pv IS NOT NULL THEN pv END, 4) AS Value
FROM w WHERE is_req = 1 ORDER BY 1, 2
"""


def _twa_sql(step: bool) -> str:
    contrib = "v2 * mins" if step else "(v2 + n_v2) / 2 * mins"
    bval = (
        "pv"
        if step
        else (
            "CASE WHEN pv IS NOT NULL AND nv IS NOT NULL THEN "
            "  CASE WHEN pt = tus THEN pv ELSE pv + (nv - pv) * (tus - pt) / (nt - pt) END "
            "WHEN pv IS NOT NULL THEN pv END"
        )
    )
    return f"""
WITH ev AS (SELECT event_type AS TagName, epoch_us(ts) AS tus, value AS v
            FROM events
            WHERE ts BETWEEN TIMESTAMP '{START}' - INTERVAL 1 HOUR
                         AND TIMESTAMP '{END}' + INTERVAL 1 HOUR),
tags AS (SELECT DISTINCT TagName FROM ev),
grid AS (SELECT unnest(generate_series({S_US}, {E_US}, {HOUR_US})) AS tus),
pts AS (SELECT TagName, tus, v, 0 AS is_b FROM ev
        UNION ALL
        SELECT t.TagName, g.tus, NULL, 1 FROM tags t CROSS JOIN grid g),
w AS (SELECT TagName, tus, v, is_b,
  last_value(v IGNORE NULLS) OVER
    (PARTITION BY TagName ORDER BY tus, is_b, v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pv,
  last_value(CASE WHEN v IS NOT NULL THEN tus END IGNORE NULLS) OVER
    (PARTITION BY TagName ORDER BY tus, is_b, v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pt,
  first_value(v IGNORE NULLS) OVER
    (PARTITION BY TagName ORDER BY tus, is_b, v ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nv,
  first_value(CASE WHEN v IS NOT NULL THEN tus END IGNORE NULLS) OVER
    (PARTITION BY TagName ORDER BY tus, is_b, v ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nt
  FROM pts),
filled AS (SELECT TagName, tus, is_b,
  CASE WHEN is_b = 0 THEN v ELSE {bval} END AS v2
  FROM w),
seg AS (SELECT TagName, tus, v2,
  lead(tus) OVER (PARTITION BY TagName ORDER BY tus, is_b) AS n_tus,
  lead(v2) OVER (PARTITION BY TagName ORDER BY tus, is_b) AS n_v2
  FROM filled),
c AS (SELECT TagName,
  {S_US} + CAST(floor((tus - {S_US}) / {HOUR_US}.0) AS BIGINT) * {HOUR_US} AS ws,
  (n_tus - tus) / 60000000.0 AS mins, v2, n_v2
  FROM seg
  WHERE n_tus IS NOT NULL AND v2 IS NOT NULL AND n_v2 IS NOT NULL)
SELECT TagName, make_timestamp(ws) AS EventTime, round_even(SUM({contrib}) / SUM(mins), 4) AS Value
FROM c WHERE ws >= {S_US} AND ws < {E_US}
GROUP BY 1, 2 HAVING SUM(mins) > 0
ORDER BY 1, 2
"""


_ORACLE["ts_twa"] = _twa_sql(step=False)
_ORACLE["ts_twa_step"] = _twa_sql(step=True)

_DAY_US = 86_400_000_000
_CIRC_BASE = f"""
WITH f AS (SELECT event_type AS TagName,
                  {S_US} + ((epoch_us(ts) - {S_US}) // {_DAY_US}) * {_DAY_US} AS ws,
                  value / 360.0 * 2 * pi() AS theta
           FROM events WHERE {_RANGE}),
agg AS (SELECT TagName, ws, AVG(sin(theta)) s, AVG(cos(theta)) c FROM f GROUP BY 1, 2)
"""

_ORACLE["ts_circular_avg"] = f"""
{_CIRC_BASE}
SELECT TagName, make_timestamp(ws) AS EventTime,
  round_even((atan2(s, c) / (2 * pi()) - floor(atan2(s, c) / (2 * pi()))) * 360.0, 4) AS Value
FROM agg ORDER BY 1, 2
"""

_ORACLE["ts_circular_std"] = f"""
{_CIRC_BASE}
SELECT TagName, make_timestamp(ws) AS EventTime,
  round_even(sqrt(greatest(-2 * ln(sqrt(s * s + c * c)), 0)) / (2 * pi()) * 360.0, 4) AS Value
FROM agg ORDER BY 1, 2
"""


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)
