"""CEP sequence-pattern matching over keyed event streams — the
MATCH_RECOGNIZE-shaped operator the north rule's "structured-streaming /
CEP engine" calls for, in its batch form (the streaming form lives in
`streaming/` and shares these semantics; the batch form is the oracle).

Semantics: STRICT CONTIGUITY (MATCH_RECOGNIZE's default — no skipped rows):
within one key, rows are totally ordered by ``(order_col, tiebreak)``; a
match is ``m`` CONSECUTIVE rows whose ``type_col`` values equal ``pattern``
element-for-element, with every consecutive gap <= ``within_us``.  Matches
may overlap (AFTER MATCH SKIP TO NEXT ROW): each row can start at most one
match, so output size is bounded by input size.

Scale design: hash-bucket by key (one shuffle), per-bucket vectorized
shifted-slice comparison — no Python row loop, no per-key Python objects.
Same partitioning assumption as `asof_join`: one key's history fits in one
bucket task; raise ``num_buckets`` for more, smaller buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def find_pattern_starts(
    kcodes: np.ndarray,
    type_vals: np.ndarray,
    ts_us: np.ndarray,
    pattern: list[str],
    within_us: int | None,
) -> np.ndarray:
    """Shared kernel (batch op + streaming actor): indices ``i`` where rows
    ``i..i+m-1`` — PRE-SORTED by ``(key, ts, tiebreak)`` — are one key's
    strict-contiguous ``pattern`` instance with per-step gaps <= within."""
    m = len(pattern)
    n = len(kcodes)
    if n < m:
        return np.empty(0, dtype=np.int64)
    w = n - m + 1
    ok = np.ones(w, dtype=bool)
    for j in range(m):
        ok &= type_vals[j : w + j] == pattern[j]
        if j:
            ok &= kcodes[j : w + j] == kcodes[j - 1 : w + j - 1]
            if within_us is not None:
                ok &= (ts_us[j : w + j] - ts_us[j - 1 : w + j - 1]) <= within_us
    return np.nonzero(ok)[0]


def match_pattern(
    events: ray.data.Dataset,
    key: str,
    order_col: str,
    type_col: str,
    pattern: list[str],
    within_us: int | None = None,
    tiebreak: str | None = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Detect strict-contiguous ``pattern`` sequences per ``key``.

    Output: one row per match — ``key``, ``start_<order_col>`` /
    ``end_<order_col>`` (the first/last step's order values) and, when
    ``tiebreak`` is given, ``<tiebreak>_1 .. <tiebreak>_m`` (each step's id,
    which also makes the output hash-stable under equal-timestamp ties).
    """
    m = len(pattern)
    if m < 2:
        raise ValueError("pattern needs at least 2 steps")
    cols = [key, order_col, type_col] + ([tiebreak] if tiebreak else [])
    ds = events.select_columns(cols)

    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    types = (
        {f.name: f.type for f in base}
        if isinstance(base, pa.Schema)
        else dict(zip(sch.names, sch.types))
    )
    order_is_ts = pa.types.is_timestamp(types[order_col])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (
            pd.util.hash_pandas_object(
                pd.Series(t[key].to_numpy(zero_copy_only=False)), index=False
            ).to_numpy()
            % num_buckets
        ).astype(np.int64)
        return t.append_column("_bucket", pa.array(b))

    pat = list(pattern)

    def find(t: pa.Table) -> pa.Table:
        sort_keys = [(key, "ascending"), (order_col, "ascending")]
        if tiebreak:
            sort_keys.append((tiebreak, "ascending"))
        t = t.sort_by(sort_keys)
        n = len(t)
        out_schema = {
            key: types[key],
            f"start_{order_col}": types[order_col],
            f"end_{order_col}": types[order_col],
        }
        if tiebreak:
            for j in range(m):
                out_schema[f"{tiebreak}_{j + 1}"] = types[tiebreak]
        if n < m:
            return pa.table({c: pa.nulls(0, ty) for c, ty in out_schema.items()})
        kcodes, _ = pd.factorize(t[key].to_numpy(zero_copy_only=False))
        tarr = t[type_col].to_numpy(zero_copy_only=False)
        ovals = t[order_col]
        ous = (
            ovals.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            if order_is_ts
            else ovals.to_numpy(zero_copy_only=False).astype(np.int64)
        )
        starts = find_pattern_starts(kcodes, tarr, ous, pat, within_us)
        out = {
            key: t[key].take(pa.array(starts)),
            f"start_{order_col}": ovals.take(pa.array(starts)),
            f"end_{order_col}": ovals.take(pa.array(starts + m - 1)),
        }
        if tiebreak:
            for j in range(m):
                out[f"{tiebreak}_{j + 1}"] = t[tiebreak].take(pa.array(starts + j))
        return pa.table(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda t: find(t.drop_columns(["_bucket"])), batch_format="pyarrow"
        )
    )
