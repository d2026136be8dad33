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
import pyarrow.compute as pc

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


# ---------------------------------------------------------------------------
# exact companions: two-pass heavy hitters, exact grouped discrete quantiles
# ---------------------------------------------------------------------------


class _MGWeighted:
    """Misra-Gries over pre-counted (value, weight) partials, pandas-Series
    backed so each block merge is one vectorized add — no per-word Python."""

    __slots__ = ("k", "counts", "decremented", "n")

    def __init__(self, k: int):
        import pandas as pd

        self.k = k
        self.counts = pd.Series(dtype=np.int64)
        self.decremented = 0
        self.n = 0

    def update_pairs(self, vals: pa.Array, cnts: pa.Array) -> "_MGWeighted":
        import pandas as pd

        c = pd.Series(
            cnts.to_numpy(zero_copy_only=False).astype(np.int64),
            index=vals.to_numpy(zero_copy_only=False),
        )
        # collapse duplicate labels BEFORE the add: Series.add keeps dup
        # index rows, which would split (and later double-count) a word's
        # total and break the MG superset guarantee if a block ever carries
        # the same value twice (e.g. coalesced partials)
        c = c.groupby(level=0).sum()
        self.n += int(c.sum())
        self.counts = self.counts.add(c, fill_value=0).astype(np.int64)
        self._shrink()
        return self

    def merge(self, other: "_MGWeighted") -> "_MGWeighted":
        self.counts = self.counts.add(other.counts, fill_value=0).astype(np.int64)
        self.n += other.n
        self.decremented += other.decremented
        self._shrink()
        return self

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        cs = np.sort(self.counts.to_numpy())
        cut = int(cs[-(self.k + 1)])
        self.decremented += cut
        kept = self.counts - cut
        self.counts = kept[kept > 0]


def frequent_words_exact(
    source: str | ray.data.Dataset,
    phi_permille: int = 5,
    k: int = 512,
) -> ray.data.Dataset:
    """EXACT frequent words: every word with frequency >= phi of the total
    word count, with its exact count — the two-pass MG+recount construction
    (candidates from a one-pass Misra-Gries sketch, then an exact recount of
    the candidates only).

    Requires ``k + 1 > 1000 / phi_permille`` so the MG guarantee (every value
    with freq > n/(k+1) survives) covers the phi threshold — then the
    candidate set provably contains every qualifying word and the recount
    discards false candidates, making the result EXACT (Misra-Gries 1982).

    Scale shape: pass 1 shuffles only distinct-words-per-batch partial counts
    into a bounded sketch tree (never the corpus); pass 2 re-streams the
    corpus but each batch emits at most ``|candidates| <= 2k`` count rows, so
    the second shuffle is O(k x batches) tiny rows.  This is how "which words
    appear in >= 0.5% of a 100 TB corpus" runs without a full-vocabulary
    groupby.

    Output: ``(word, cnt)`` ordered count desc, word asc.
    """
    if (k + 1) * phi_permille <= 1000:
        raise ValueError(
            f"k={k} too small for phi={phi_permille}/1000: need k+1 > 1000/phi"
        )
    from .text import _read_docs
    import pyarrow.compute as pc

    def word_partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.utf8_split_whitespace(pc.utf8_lower(texts)).flatten()
        words = words.filter(pc.not_equal(words, ""))
        vc = words.value_counts()
        return pa.table(
            {"word": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )

    partials = _read_docs(source, ["text"]).map_batches(
        word_partial, batch_format="pyarrow"
    )
    agg = AggregateFn(
        init=lambda key: _MGWeighted(k),
        accumulate_block=lambda s, t: s.update_pairs(
            _get_col(t, "word"), _get_col(t, "cnt")
        ),
        merge=lambda a, b: a.merge(b),
        finalize=lambda s: s,
        name="mg",
    )
    sketch: _MGWeighted = partials.aggregate(agg)["mg"]
    n_total = sketch.n
    # candidates: count_hi = count + decremented could reach the threshold
    hi = sketch.counts.to_numpy() + sketch.decremented
    cand = set(sketch.counts.index[(hi * 1000) >= phi_permille * n_total])
    if not cand:
        return ray.data.from_arrow(
            pa.table({"word": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
        )
    cand_arr = pa.array(sorted(cand), pa.string())

    def recount(batch: pa.Table) -> pa.Table:
        t = word_partial(batch)
        keep = pc.is_in(t["word"], value_set=cand_arr)
        return t.filter(keep)

    counts = (
        _read_docs(source, ["text"])
        .map_batches(recount, batch_format="pyarrow")
        .groupby("word")
        .sum("cnt")
        .to_pandas()  # bounded: <= |candidates| rows
        .rename(columns={"sum(cnt)": "cnt"})
    )
    counts = counts[counts["cnt"] * 1000 >= phi_permille * n_total]
    counts = counts.sort_values(["cnt", "word"], ascending=[False, True])
    counts["cnt"] = counts["cnt"].astype(np.int64)
    return ray.data.from_pandas(counts.reset_index(drop=True))


def group_quantiles_exact(
    source: str | ray.data.Dataset,
    value_col: str = "n_chars",
    group_col: str = "lang",
    qs_permille: tuple[int, ...] = (250, 500, 750, 990),
) -> ray.data.Dataset:
    """EXACT per-group discrete quantiles of an integer column: the value at
    1-based rank ``max(1, ceil(q * n))`` in each group's sorted multiset —
    DuckDB's ``quantile_disc`` rule, so the oracle reproduces it bit-for-bit
    (the ceil is taken over the same float64 product both sides).

    Scale shape: each batch pre-aggregates to distinct ``(group, value)``
    pair counts (Arrow group_by), so the shuffle moves only the pair
    histogram, never rows; per-group state is the group's distinct-value
    histogram.  Exact quantiles this way need a bounded distinct-value
    domain (lengths, scores, counts) — for unbounded doubles use the
    ``approx_quantiles`` t-digest instead.

    Output: ``(group, q_permille, value)`` sorted by (group, q).
    """
    import math

    from .text import _read_docs

    qs = tuple(int(q) for q in qs_permille)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col, value_col]).group_by(
            [group_col, value_col]
        ).aggregate([([], "count_all")])
        return g.rename_columns([group_col, value_col, "cnt"])

    def per_group(t: pa.Table) -> pa.Table:
        import pandas as pd

        if isinstance(t, pd.DataFrame):
            t = pa.Table.from_pandas(t, preserve_index=False)
        df = (
            t.to_pandas()  # per-batch
            .groupby(value_col, sort=True)["cnt"]
            .sum()
        )
        vals = df.index.to_numpy()
        cum = np.cumsum(df.to_numpy().astype(np.int64))
        n = int(cum[-1])
        out_v = []
        for q in qs:
            rank = max(1, math.ceil((q / 1000.0) * n))
            out_v.append(vals[int(np.searchsorted(cum, rank, side="left"))])
        key = t[group_col][0].as_py()
        return pa.table(
            {
                group_col: pa.array([key] * len(qs), t[group_col].type),
                "q_permille": pa.array(qs, pa.int64()),
                "value": pa.array(out_v, t[value_col].type),
            }
        )

    return (
        _read_docs(source, [group_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(per_group, batch_format="pyarrow")
        .sort([group_col, "q_permille"])
    )


def _value_histogram(ds: ray.data.Dataset, value_col: str):
    """Bounded exact histogram of an INTEGER-DOMAIN column: per-batch
    value_counts partials, one groupby, sorted (values, counts) to the
    driver.  Shared by the discrete-quantile, band-filter and value-rank
    operators; for unbounded doubles use the t-digest sketch instead."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = batch[value_col].combine_chunks().value_counts()
        return pa.table({"v": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .sum("cnt")
        .to_pandas()  # bounded: distinct values of an integer-domain column
        .sort_values("v")
    )
    return hist["v"].to_numpy(), hist["sum(cnt)"].to_numpy().astype(np.int64)


def quantile_band_filter(
    source: str | ray.data.Dataset,
    value_col: str = "n_chars",
    lo_permille: int = 50,
    hi_permille: int = 950,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Percentile-band outlier trim: keep rows whose ``value_col`` lies
    between the corpus's exact discrete quantiles at ``lo``/``hi`` permille
    (inclusive) — the "drop the freak-length tails before training" gate,
    with thresholds defined by the same ``max(1, ceil(q*n))`` rank rule as
    :func:`group_quantiles_exact` so the cut is exactly SQL-reproducible.

    Two passes, both streamed: (1) the distinct-value histogram (per-batch
    pair counts, one bounded groupby — integer-domain values only), from
    which the driver picks the two thresholds; (2) a vectorized filter scan.
    Output: ``(id_col, value_col)`` sorted by id.
    """
    import math

    from .text import _read_docs

    if not (0 < lo_permille <= hi_permille <= 1000):
        raise ValueError(f"bad band: [{lo_permille}, {hi_permille}]")
    ds = _read_docs(source, [id_col, value_col])
    vals, cnts = _value_histogram(ds, value_col)
    cum = np.cumsum(cnts)
    n = int(cum[-1])

    def at(q: int):
        rank = max(1, math.ceil((q / 1000.0) * n))
        return vals[int(np.searchsorted(cum, rank, side="left"))]

    lo_v, hi_v = at(lo_permille), at(hi_permille)

    def keep(batch: pa.Table) -> pa.Table:
        v = batch[value_col]
        m = pc.and_(pc.greater_equal(v, lo_v), pc.less_equal(v, hi_v))
        return batch.filter(m)

    return ds.map_batches(keep, batch_format="pyarrow").sort(id_col)
