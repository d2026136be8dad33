"""Mergeable sketches as single-pass Ray Data aggregates — the 100-TB path
beside the exact ops (`vocab_topk`, `corpus_stats` quantile histograms,
`dedup_exact` distinct): one streaming scan, per-block vectorized
accumulation, tiny constant-size partials merged in Ray Data's aggregate
tree.  No shuffle of data rows at all — only sketch states move.

All three are classical published algorithms:
- HyperLogLog (Flajolet et al. 2007) — approx distinct count, 2^p byte
  registers, relative error ~1.04/sqrt(2^p).
- Merging t-digest (Dunning & Ertl) — approx quantiles over doubles,
  bounded centroid count, exact min/max at the tails.
- Misra-Gries (1982; merge rule from Agarwal et al. 2012) — heavy hitters
  with deterministic count bounds: true_count ∈ [count, count + err_bound],
  every value with frequency > n/(k+1) is guaranteed present.

Every sketch here is DETERMINISTIC given the input multiset (hashing is
seedless splitmix64; t-digest compaction sorts first), so repeated runs and
resumes agree — the same property the exactly-once sink relies on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import AggregateFn

# ---------------------------------------------------------------------------
# shared: vectorized 64-bit mixing (splitmix64, public domain constants)
# ---------------------------------------------------------------------------


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _get_col(block, name: str) -> pa.Array | pa.ChunkedArray:
    """Aggregate blocks may be pa.Table or pandas.DataFrame depending on the
    upstream block format; normalize to Arrow."""
    if isinstance(block, pa.Table):
        return block[name]
    return pa.Array.from_pandas(block[name])


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Column -> uniform uint64, vectorized. Strings go through pandas'
    hash_pandas_object (C, stable); numerics through splitmix64."""
    import pandas as pd

    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.int64)
        return _splitmix64(v.view(np.uint64))
    s = pd.Series(col.to_numpy(zero_copy_only=False))
    return _splitmix64(
        pd.util.hash_pandas_object(s, index=False).to_numpy().astype(np.uint64)
    )


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


class HLLSketch:
    __slots__ = ("p", "regs")

    def __init__(self, p: int = 14):
        self.p = p
        self.regs = np.zeros(1 << p, dtype=np.uint8)

    def update_hashes(self, h: np.ndarray) -> "HLLSketch":
        if not self.regs.flags.writeable:  # deserialized from the object store
            self.regs = self.regs.copy()
        p = np.uint64(self.p)
        idx = (h >> (np.uint64(64) - p)).astype(np.int64)
        # sentinel bit bounds the rank at 64-p+1; leading-zero count via a
        # 6-step vectorized binary reduction (no float-exponent imprecision)
        cur = (h << p) | np.uint64(1)
        lz = np.zeros(len(h), dtype=np.uint8)
        for shift in (32, 16, 8, 4, 2, 1):
            s = np.uint64(shift)
            high_zero = cur < (np.uint64(1) << (np.uint64(64) - s))
            lz = np.where(high_zero, lz + shift, lz).astype(np.uint8)
            cur = np.where(high_zero, cur << s, cur)
        rank = lz + 1
        np.maximum.at(self.regs, idx, rank)
        return self

    def merge(self, other: "HLLSketch") -> "HLLSketch":
        self.regs = np.maximum(self.regs, other.regs)  # no in-place: inputs
        return self  # may be read-only zero-copy views from the object store

    def estimate(self) -> float:
        m = float(len(self.regs))
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.float64(2.0) ** -self.regs.astype(np.float64))
        zeros = int(np.count_nonzero(self.regs == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting, small range
        return float(est)


def approx_distinct(ds: ray.data.Dataset, col: str, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT col) in ONE streaming pass.  Relative
    error ~1.04/sqrt(2^p) (p=14 -> ~0.8%); each partial is a 16 KiB
    register array, so a 256-node fan-in merges 256 x 16 KiB, not data."""
    agg = AggregateFn(
        init=lambda k: HLLSketch(p),
        accumulate_block=lambda s, t: s.update_hashes(_hash_column(_get_col(t, col))),
        merge=lambda a, b: a.merge(b),
        finalize=lambda s: s.estimate(),
        name=f"approx_distinct({col})",
    )
    return ds.aggregate(agg)[f"approx_distinct({col})"]


def approx_distinct_by(
    ds: ray.data.Dataset, key: str, col: str, p: int = 14
) -> ray.data.Dataset:
    """Grouped approximate COUNT(DISTINCT col) per ``key`` — the sketch
    composes with Ray Data's groupby tree, so per-group partials merge the
    same way the global ones do.  Output columns: key, ``approx_nd``."""
    agg = AggregateFn(
        init=lambda k: HLLSketch(p),
        accumulate_block=lambda s, t: s.update_hashes(_hash_column(_get_col(t, col))),
        merge=lambda a, b: a.merge(b),
        finalize=lambda s: s.estimate(),
        name="approx_nd",
    )
    return ds.groupby(key).aggregate(agg)


# ---------------------------------------------------------------------------
# merging t-digest (quantiles)
# ---------------------------------------------------------------------------


class TDigest:
    """Merging t-digest with the k1 scale function: buffered means/weights,
    compressed (sort + merge neighbors within quantile capacity) whenever
    the buffer exceeds 8x delta.  Deterministic: compaction order is the
    sorted order."""

    __slots__ = ("delta", "means", "weights", "vmin", "vmax")

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.vmin = np.inf
        self.vmax = -np.inf

    def update(self, vals: np.ndarray) -> "TDigest":
        vals = vals[~np.isnan(vals)]
        if not len(vals):
            return self
        self.vmin = min(self.vmin, float(vals.min()))
        self.vmax = max(self.vmax, float(vals.max()))
        self.means = np.concatenate([self.means, vals.astype(np.float64)])
        self.weights = np.concatenate([self.weights, np.ones(len(vals))])
        if len(self.means) > 8 * self.delta:
            self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._compress()
        return self

    def _compress(self) -> None:
        if not len(self.means):
            return
        order = np.argsort(self.means, kind="mergesort")
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        out_m, out_w = [], []
        cur_m, cur_w = means[0], weights[0]
        acc = 0.0  # weight strictly before the current centroid
        for i in range(1, len(means)):
            q = (acc + cur_w / 2) / total
            cap = 4 * total * q * (1 - q) / self.delta  # k1 capacity
            if cur_w + weights[i] <= max(cap, 1.0):
                cur_m += (means[i] - cur_m) * weights[i] / (cur_w + weights[i])
                cur_w += weights[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                acc += cur_w
                cur_m, cur_w = means[i], weights[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    def quantile(self, q: float) -> float:
        if not len(self.means):
            return float("nan")
        self._compress()
        if q <= 0:
            return self.vmin
        if q >= 1:
            return self.vmax
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))


def approx_quantiles(
    ds: ray.data.Dataset, col: str, qs: list[float], delta: int = 200
) -> dict[float, float]:
    """Approximate quantiles of a double column in ONE pass; partial state
    is <= 8*delta centroids regardless of data size (contrast the exact
    `corpus_stats` histogram, which needs a bounded integer domain)."""
    agg = AggregateFn(
        init=lambda k: TDigest(delta),
        accumulate_block=lambda s, t: s.update(
            _get_col(t, col).to_numpy(zero_copy_only=False).astype(np.float64)
        ),
        merge=lambda a, b: a.merge(b),
        finalize=lambda s: s,
        name="tdigest",
    )
    sk: TDigest = ds.aggregate(agg)["tdigest"]
    return {q: sk.quantile(q) for q in qs}


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


class MGSummary:
    """Misra-Gries summary: at most k counters; decrement-all when full.
    After processing n ITEMS (non-null values — nulls are not items and do
    not count toward n), every value with true frequency > n/(k+1) is
    present, and true_count ∈ [count, count + err]."""

    __slots__ = ("k", "counts", "decremented", "n")

    def __init__(self, k: int):
        self.k = k
        self.counts: dict = {}
        self.decremented = 0  # total decrement applied (error upper bound)
        self.n = 0

    def update_block(self, col: pa.ChunkedArray | pa.Array) -> "MGSummary":
        import pandas as pd

        vals = pd.Series(col.to_numpy(zero_copy_only=False)).value_counts()
        self.n += int(vals.sum())
        for v, c in vals.items():
            self.counts[v] = self.counts.get(v, 0) + int(c)
        self._shrink()
        return self

    def merge(self, other: "MGSummary") -> "MGSummary":
        for v, c in other.counts.items():
            self.counts[v] = self.counts.get(v, 0) + c
        self.n += other.n
        self.decremented += other.decremented
        self._shrink()
        return self

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        # subtract the (k+1)-th largest count from everything, drop <= 0
        # (Agarwal et al. mergeable-summaries rule; error adds up in
        # self.decremented)
        cs = np.sort(np.fromiter(self.counts.values(), dtype=np.int64))
        cut = int(cs[-(self.k + 1)])
        self.decremented += cut
        self.counts = {
            v: c - cut for v, c in self.counts.items() if c - cut > 0
        }

    def result(self) -> pa.Table:
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], str(kv[0])))
        return pa.table(
            {
                "value": pa.array([str(v) for v, _ in items]),
                "count_lo": pa.array([int(c) for _, c in items], pa.int64()),
                "count_hi": pa.array(
                    [int(c) + self.decremented for _, c in items], pa.int64()
                ),
                "n_rows": pa.array([self.n] * len(items), pa.int64()),
            }
        )


def heavy_hitters(ds: ray.data.Dataset, col: str, k: int = 64) -> pa.Table:
    """Deterministic heavy hitters in ONE pass: every value with frequency
    > n/(k+1) is guaranteed in the output with bounds
    true_count ∈ [count_lo, count_hi]."""
    agg = AggregateFn(
        init=lambda key: MGSummary(k),
        accumulate_block=lambda s, t: s.update_block(_get_col(t, col)),
        merge=lambda a, b: a.merge(b),
        finalize=lambda s: s,  # build the table driver-side: a finalize
        name="mg",  # returning pa.Table gets coerced by the block builder
    )
    return ds.aggregate(agg)["mg"].result()
