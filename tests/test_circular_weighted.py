"""Weighted circular statistics vs a scalar transcription of the reference SQL.

Reference: ``_time_series_query_builder.py:1570-1719`` — time-difference
weighted running cos/sin pairs.  The engine's vectorized per-tag pass
(core_ray/ops/circular.py) must agree with this unvectorized line-by-line
transcription on randomized inputs, including spine-join NULL arms.
"""

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from core_ray.ops.circular import _weighted_tag_stats
from core_ray.ops.common import round4


def scalar_reference(tms, vals, start_us, end_us, ival_us, lower, upper, kind):
    rng = upper - lower
    spine = list(range(start_us, end_us + 1, ival_us))
    raw_sec = [t // 1_000_000 for t in tms]
    spine_sec = {s // 1_000_000 for s in spine}
    rows = []  # (ts, value-or-None)
    for t, v in zip(tms, vals):
        sec = t // 1_000_000
        rows.append((sec * 1_000_000 if sec in spine_sec else t, v))
    for s in spine:
        if s // 1_000_000 not in set(raw_sec):
            rows.append((s, None))
    rows.sort(key=lambda r: (r[0], float("inf") if r[1] is None else r[1]))

    def rad(v):
        return None if v is None else math.fmod(v - lower, rng) * (2 * math.pi / rng)

    recs = []
    prev_ts = None
    prev_cos = prev_sin = None
    for ts, v in rows:
        r = rad(v)
        cosv = None if r is None else math.cos(r)
        sinv = None if r is None else math.sin(r)
        td = None if prev_ts is None else ((ts // 1000) - (prev_ts // 1000)) / 86400000.0
        pair_c = [x for x in (prev_cos, cosv) if x is not None]
        pair_s = [x for x in (prev_sin, sinv) if x is not None]
        ac = sum(pair_c) / len(pair_c) if pair_c else None
        asn = sum(pair_s) / len(pair_s) if pair_s else None
        if ac is None or asn is None:
            dca = dsa = None
        else:
            vec = math.sqrt(ac * ac + asn * asn)
            dca = None if td is None else td * (ac / vec)
            dsa = None if td is None else td * (asn / vec)
        ws = (ts // ival_us) * ival_us
        recs.append((ws, td, dca, dsa))
        prev_ts, prev_cos, prev_sin = ts, cosv, sinv

    out = {}
    for ws in sorted({r[0] for r in recs}):
        grp = [r for r in recs if r[0] == ws]
        s_td = [r[1] for r in grp if r[1] is not None]
        s_dca = [r[2] for r in grp if r[2] is not None]
        s_dsa = [r[3] for r in grp if r[3] is not None]
        ct = (sum(s_dca) / sum(s_td)) if s_dca and s_td else None
        st = (sum(s_dsa) / sum(s_td)) if s_dsa and s_td else None
        if kind == "average":
            val = (
                None
                if ct is None or st is None
                else math.fmod(2 * math.pi + math.atan2(st, ct), 2 * math.pi)
                * rng
                / (2 * math.pi)
            )
        else:
            r_ = (
                1.0
                if ct is None or st is None
                else min(1.0, math.sqrt(ct * ct + st * st))
            )
            val = math.sqrt(max(-2.0 * math.log(r_), 0.0)) * rng / (2 * math.pi)
        out[ws] = val
    return out


@pytest.mark.parametrize("kind", ["average", "stddev"])
def test_weighted_circular_matches_scalar_reference(kind):
    rng = np.random.default_rng(5)
    start_us = 1_704_067_200_000_000
    ival = 3_600_000_000  # 1 hour
    end_us = start_us + 6 * ival
    n = 120
    tms = np.sort(rng.integers(start_us, end_us, n)) // 1000 * 1000
    tms = np.unique(tms)
    vals = rng.uniform(0, 480, len(tms))  # includes >360 wrap
    order = np.lexsort((vals, tms))
    uws, out = _weighted_tag_stats(
        tms[order], vals[order], start_us, end_us, ival, 0.0, 360.0, kind
    )
    exp = scalar_reference(
        tms.tolist(), vals.tolist(), start_us, end_us, ival, 0.0, 360.0, kind
    )
    assert list(uws) == sorted(exp)
    for w, got in zip(uws, out):
        want = exp[w]
        if want is None:
            assert np.isnan(got)
        else:
            assert got == pytest.approx(want, rel=1e-9), w


def test_circular_average_query_runs(sf_dir):
    from core_ray.ops import circular_average

    ds = circular_average(
        sf_dir,
        start="2024-01-01 00:00:00",
        end="2024-01-04 00:00:00",
        rate=1,
        unit="day",
        tags=["click"],
    )
    df = ds.to_pandas()
    assert len(df) >= 3
    assert set(df.columns) == {"TagName", "EventTime", "Value"}
