"""Deduplication over the ``documents`` table: exact, MinHash-LSH, SimHash.

Scale design (SURVEY.md "aggregation at scale" / ray_guide dedup pattern):

- **exact**: vectorized content-hash per batch → hash-shuffle on the digest →
  per-group min-doc_id survivor.  The shuffle key is the digest, so identical
  documents co-locate no matter where they were read.
- **MinHash-LSH**: per-batch vectorized shingling (word crc32s combined into
  3-gram hashes with numpy, 64 permutations via segment-min ``reduceat``) →
  explode to (band, band_hash, doc_id, signature) rows → groupby on the band
  bucket → pairwise signature comparison inside each (small) bucket →
  candidate pairs deduped across bands.  Only signatures shuffle, never text.
- **SimHash**: 64-bit sign-sum fingerprint per doc, 16-bit band blocking,
  Hamming-distance verification inside buckets.

Pairs output is (doc_a, doc_b, score) with doc_a < doc_b — deterministic and
order-insensitive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..synth import _hash2
from .text import _read_docs, pool_size

_U64 = np.uint64
NUM_PERM = 64
BANDS = 16
ROWS_PER_BAND = NUM_PERM // BANDS

# polynomial base for the byte-level word hash; powers precomputed lazily up
# to the longest word seen (wraparound uint64 arithmetic = mod 2^64)
_POLY_P = _U64(1099511628211)
_pow_table = np.array([1], dtype=np.uint64)

# 16-bit popcount lookup table (numpy < 2.0 has no bitwise_count)
_POPCNT16 = np.array(
    [bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8
)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array via a 16-bit LUT."""
    x = x.astype(np.uint64, copy=False)
    d = _POPCNT16[(x & _U64(0xFFFF)).astype(np.int64)].astype(np.int64)
    for s in (16, 32, 48):
        d += _POPCNT16[((x >> _U64(s)) & _U64(0xFFFF)).astype(np.int64)]
    return d


def _ragged_range(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """[starts[0]..starts[0]+counts[0]) ++ [starts[1]..) ... — vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    excl = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return np.repeat(starts, counts) + (np.arange(total) - np.repeat(excl, counts))


def split_words_flat(texts) -> tuple[pa.Array, np.ndarray]:
    """The corpus-wide word contract as a flat array: lowercase +
    whitespace-split + drop empties (bit-for-bit the oracles'
    ``list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')``).
    Returns ``(flat_words, parent_row_indices)``.  Shared so new operators
    don't fork the tokenization the exact oracles depend on."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.utf8_split_whitespace(pc.utf8_lower(texts))
    flat = words.flatten()
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat.filter(pa.array(keep)), parent[keep]


def _word_hashes_batch(texts: pa.ChunkedArray | pa.Array):
    """Vectorized per-word 64-bit hashes for a whole batch of documents.

    Lowercase + whitespace-split in Arrow, then one polynomial hash over the
    flat word byte buffer (no Python loop over words — this replaced a
    per-word ``zlib.crc32`` loop that dominated the minhash query's wall).

    Returns ``(flat_hashes, doc_word_counts)``: uint64 hashes of every word in
    document order, and words-per-document.
    """
    global _pow_table
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    words = pc.utf8_split_whitespace(pc.utf8_lower(texts))
    flat = words.flatten()
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    # offsets/data of the flat word array (account for the slice offset)
    offs = np.frombuffer(flat.buffers()[1], dtype=np.int32)[
        flat.offset : flat.offset + len(flat) + 1
    ].astype(np.int64)
    data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    starts, lens = offs[:-1], np.diff(offs)
    # Arrow keeps empty words for leading/trailing/solo whitespace where
    # Python's str.split() drops them — filter to match.
    keep = lens > 0
    starts, lens, parent = starts[keep], lens[keep], parent[keep]
    counts = np.bincount(parent, minlength=n_docs).astype(np.int64)
    if len(starts) == 0:
        return np.zeros(0, dtype=np.uint64), counts
    max_len = int(lens.max())
    if max_len >= len(_pow_table):
        _pow_table = np.empty(max_len + 1, dtype=np.uint64)
        _pow_table[0] = 1
        with np.errstate(over="ignore"):
            for i in range(1, max_len + 1):
                _pow_table[i] = _pow_table[i - 1] * _POLY_P
    byte_idx = _ragged_range(starts, lens)
    pos_in_word = np.arange(len(byte_idx)) - np.repeat(
        np.concatenate(([0], np.cumsum(lens)[:-1])), lens
    )
    exp = np.repeat(lens, lens) - 1 - pos_in_word
    with np.errstate(over="ignore"):
        terms = data[byte_idx].astype(np.uint64) * _pow_table[exp]
    seg_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    sums = np.add.reduceat(terms, seg_starts)
    return _hash2(42, sums + lens.astype(np.uint64)), counts


def _tri_mix(hashes: np.ndarray) -> np.ndarray:
    """uint64 trigram mixing over a flat word-hash buffer: out[i] combines
    hashes[i..i+2].  SINGLE definition shared by every shingle-consuming
    operator (MinHash shingles, duplicate-coverage, cross-source overlap,
    span removal) so the shingle space can never silently desynchronize."""
    a, b, c = hashes[:-2], hashes[1:-1], hashes[2:]
    with np.errstate(over="ignore"):
        return _hash2(
            99, a * _U64(0x9E3779B97F4A7C15) ^ b * _U64(0xC2B2AE3D27D4EB4F) ^ c
        )


def _batch_shingles(texts) -> tuple[np.ndarray, np.ndarray]:
    """3-gram word-shingle hashes for a batch: (flat_shingles, per_doc_counts).

    Docs with >= 3 words produce word-trigram hashes; shorter non-empty docs
    fall back to per-word hashes (so near-identical short docs still collide).
    Fully vectorized: trigram mixing runs once over the flat word-hash buffer
    and per-doc slices are gathered with ragged-range index arithmetic.
    """
    hashes, wc = _word_hashes_batch(texts)
    word_starts = np.concatenate(([0], np.cumsum(wc)[:-1]))
    sh_counts = np.where(wc >= 3, wc - 2, wc)
    total = int(sh_counts.sum())
    out = np.empty(total, dtype=np.uint64)
    sh_starts = np.concatenate(([0], np.cumsum(sh_counts)[:-1]))
    if len(hashes) >= 3:
        tri = _tri_mix(hashes)
    else:
        tri = np.zeros(0, dtype=np.uint64)
    big = wc >= 3
    if big.any():
        src = _ragged_range(word_starts[big], sh_counts[big])
        dst = _ragged_range(sh_starts[big], sh_counts[big])
        out[dst] = tri[src]
    small = (~big) & (wc > 0)
    if small.any():
        src = _ragged_range(word_starts[small], wc[small])
        dst = _ragged_range(sh_starts[small], wc[small])
        out[dst] = _hash2(99, hashes)[src]
    return out, sh_counts


def _pairs_within_groups(
    df: pd.DataFrame,
    key_cols: list[str],
    carry: list[str],
    max_group: int | None = None,
) -> pd.DataFrame:
    """All unordered (doc_a < doc_b) pairs inside every key group — FULLY
    vectorized via successor-index arithmetic (each row pairs with every later
    row of its group), replacing a per-group Python callback that cost ~0.4 ms
    per group (27k colliding groups = ~11 s of pure overhead, measured).
    ``carry`` columns are emitted as ``<col>_a`` / ``<col>_b``."""
    cols = {"doc_a": np.int64, "doc_b": np.int64}
    for c in carry:
        cols[c + "_a"] = df[c].dtype if c in df else np.float64
        cols[c + "_b"] = df[c].dtype if c in df else np.float64
    if len(df) < 2:
        return pd.DataFrame({k: pd.Series([], dtype=d) for k, d in cols.items()})
    keys = [df[c].to_numpy() for c in key_cols]
    ids = df["doc_id"].to_numpy()
    order = np.lexsort([ids] + keys[::-1])
    keys = [k[order] for k in keys]
    ids = ids[order]
    n = len(ids)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        change[1:] |= k[1:] != k[:-1]
    starts = np.nonzero(change)[0]
    counts = np.diff(np.append(starts, n))
    k_per_row = np.repeat(counts, counts)
    if max_group is not None:
        keep = k_per_row <= max_group
        ids, k_per_row = ids[keep], k_per_row[keep]
        order = order[keep]
        counts = counts[counts <= max_group]
        n = len(ids)
        if n == 0:
            return pd.DataFrame({k: pd.Series([], dtype=d) for k, d in cols.items()})
    pos = np.arange(n) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts
    )
    succ = k_per_row - 1 - pos
    a_idx = np.repeat(np.arange(n), succ)
    b_idx = _ragged_range(np.arange(n) + 1, succ)
    out = {"doc_a": ids[a_idx].astype(np.int64), "doc_b": ids[b_idx].astype(np.int64)}
    for c in carry:
        vals = df[c].to_numpy()[order]
        out[c + "_a"] = vals[a_idx]
        out[c + "_b"] = vals[b_idx]
    return pd.DataFrame(out)


def bucketed_group_pairs(
    ds: ray.data.Dataset,
    key_cols: list[str],
    carry: tuple[str, ...] = (),
    max_group: int | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Candidate-pair generation at scale: hash-bucket shuffle on the group
    key, then one vectorized all-pairs emit per bucket (singleton groups are
    dropped vectorized first; no per-group Python call anywhere)."""
    from ..ops.common import _arrow_add_bucket

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"])
        g = g[g.duplicated(key_cols, keep=False)]
        return _pairs_within_groups(g, key_cols, list(carry), max_group)

    return (
        ds.map_batches(_arrow_add_bucket(key_cols, num_buckets), batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


class MinHashStage:
    """Actor-pool stage: per-doc 64-permutation MinHash signature, exploded to
    LSH band rows. Permutation seeds precomputed once per actor.  With
    ``include_sig=False`` the (wide: 64×u64 per band row) signature column is
    omitted — the exact-verify path only needs candidate doc ids, so shipping
    signatures through the shuffle would be pure waste."""

    def __init__(self, include_sig: bool = True):
        # universal-hash permutation family h_j(x) = a_j*x + b_j (mod 2^64)
        # over one strong base hash: two wraparound ops per permutation
        # instead of a full avalanche pass — the signatures only drive LSH
        # candidate RECALL (output is exact-verified), so the family choice
        # affects speed, not correctness.  a_j odd => bijective mod 2^64.
        js = np.arange(1, NUM_PERM + 1, dtype=np.uint64)
        self.perm_a = (_hash2(101, js) | _U64(1)).reshape(1, NUM_PERM)
        self.perm_b = _hash2(202, js).reshape(1, NUM_PERM)
        self.include_sig = include_sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        flat, sh_counts = _batch_shingles(batch["text"])
        starts = np.concatenate(([0], np.cumsum(sh_counts)[:-1]))
        n_docs = len(doc_ids)
        sigs = np.full((n_docs, NUM_PERM), np.iinfo(np.uint64).max, dtype=np.uint64)
        nonempty = sh_counts > 0
        ne_starts = starts[nonempty]
        if len(ne_starts):
            base = _hash2(11, flat)
            with np.errstate(over="ignore"):
                # per-permutation 1-D pass: axis-0 reduceat on a 2-D matrix
                # is ~600x slower than 64 contiguous 1-D reduceats (measured)
                for j in range(NUM_PERM):
                    col = base * self.perm_a[0, j] + self.perm_b[0, j]
                    sigs[nonempty, j] = np.minimum.reduceat(col, ne_starts)
        # band rows
        band_ids = np.repeat(np.arange(BANDS, dtype=np.int32), n_docs)
        out_doc = doc_ids * BANDS
        band_hashes = np.empty(BANDS * n_docs, dtype=np.uint64)
        for b in range(BANDS):
            seg = sigs[:, b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
            with np.errstate(over="ignore"):
                h = _hash2(1000 + b, seg[:, 0] * _U64(31) ^ seg[:, 1])
                for r in range(2, ROWS_PER_BAND):
                    h = _hash2(1000 + b, h ^ seg[:, r])
            band_hashes[b * n_docs : (b + 1) * n_docs] = h
        cols = {
            "band": pa.array(band_ids),
            "band_hash": pa.array(band_hashes, pa.uint64()),
            "doc_id": pa.array(out_doc),
        }
        if self.include_sig:
            cols["sig"] = pa.FixedSizeListArray.from_arrays(
                pa.array(np.tile(sigs, (BANDS, 1)).ravel(), pa.uint64()), NUM_PERM
            )
        return pa.table(cols)


def _bucket_pairs(threshold: float | None):
    """In-bucket pairwise signature compare. ``threshold=None`` emits every
    co-bucketed pair (the LSH candidate set, for downstream exact verify)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []}).astype(
                {"doc_a": "int64", "doc_b": "int64", "est_jaccard": "float64"}
            )
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs = np.stack(g["sig"].to_numpy())
        rows = []
        for i in range(len(ids)):
            eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            for j, e in enumerate(eq):
                if threshold is None or e >= threshold:
                    rows.append((int(ids[i]), int(ids[i + 1 + j]), float(e)))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_jaccard"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "est_jaccard": "float64"}
        )

    return fn


_MINHASH_STAGES: dict = {}


def _minhash_bands_fn(include_sig: bool):
    """Plain-function form of :class:`MinHashStage` for task-pool
    ``map_batches``: the stage instance is built once per worker process and
    cached at module level (the stateful-setup-amortized pattern without
    actor-pool spawn latency)."""

    def fn(batch: pa.Table) -> pa.Table:
        stage = _MINHASH_STAGES.get(include_sig)
        if stage is None:
            stage = _MINHASH_STAGES[include_sig] = MinHashStage(include_sig=include_sig)
        return stage(batch)

    return fn


def exact_jaccard(text_a: str, text_b: str) -> float:
    """Exact word-3-gram shingle Jaccard (word-level fallback under 3 words),
    matching the MinHash shingle definition."""

    def sh(t: str) -> set:
        w = t.lower().split()
        return set(zip(w, w[1:], w[2:])) if len(w) >= 3 else set(w)

    a, b = sh(text_a), sh(text_b)
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def minhash_pairs(
    source: str | ray.data.Dataset,
    threshold: float = 0.5,
    concurrency: int | None = None,
    exact_verify: bool = True,
) -> ray.data.Dataset:
    """Near-duplicate pairs with Jaccard >= threshold.

    Banded MinHash-LSH proposes candidates (only signatures shuffle, pairwise
    compare runs inside small band buckets); with ``exact_verify`` every
    distinct candidate pair is re-scored with EXACT shingle Jaccard over the
    two texts and filtered on the exact value — output is then deterministic
    and hash-independent (modulo LSH recall: 1-(1-J^r)^b, >1-4e-8 at J>=0.9
    with 16x4 bands).  The verify stage fetches both candidate texts through
    partitioned hash joins (functions/join.py) — the candidate set never
    touches the driver, so it scales with the corpus, not driver memory.
    """
    ds = _read_docs(source, ["doc_id", "text"])
    # task pool, not an actor pool: MinHashStage's per-actor setup is two
    # tiny numpy arrays, so actor spawn latency (~seconds for the pool) was
    # pure overhead — a module-cached stage instance inside plain tasks
    # gives identical semantics with zero spawn cost
    bands = ds.map_batches(
        _minhash_bands_fn(include_sig=not exact_verify),
        batch_format="pyarrow",
        batch_size=2048,
        **({"concurrency": concurrency} if concurrency else {}),
    )
    from ..ops.common import bucketed_distinct, collision_grouped_map

    if not exact_verify:
        pairs = collision_grouped_map(bands, ["band", "band_hash"], _bucket_pairs(threshold))
        return bucketed_distinct(pairs, ["doc_a", "doc_b"], ["doc_a", "doc_b", "est_jaccard"])

    pairs = bucketed_group_pairs(bands, ["band", "band_hash"])
    # candidate PAIRS are bounded by the near-dup set — materialize once in
    # the object store so the LSH pipeline above runs exactly once (it feeds
    # both the semi-join key set and the final pair joins)
    cand = bucketed_distinct(pairs, ["doc_a", "doc_b"], ["doc_a", "doc_b"]).materialize()

    # Exact-verify without a driver-side texts dict and without shuffling
    # the corpus: (1) collect the DISTINCT candidate ids (ints — the only
    # driver-side materialization, 8 bytes/key; functions/join.py semi-join
    # machinery), (2) prune the corpus to candidate texts — pushed into the
    # parquet scan as a row-group filter when the source is a path, a
    # vectorized is_in scan otherwise, (3) park the candidate texts in the
    # OBJECT STORE as block refs and attach+verify both sides in one fused
    # map stage (workers fetch the broadcast table zero-copy; it is bounded
    # by the near-dup set).  For a near-dup set too big for a worker's heap,
    # route the attach through two `hash_join` passes instead — the
    # documented large-side path.
    from .join import (
        collect_key_set,
        fetch_broadcast_table,
        object_store_table,
        semi_join_filter,
    )

    keep = collect_key_set(cand, ["doc_a", "doc_b"])
    if isinstance(source, str):
        import pyarrow.dataset as pads

        path = source if source.endswith(".parquet") else f"{source}/documents.parquet"
        texts_cand = ray.data.read_parquet(
            path,
            columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(keep.to_pylist()),
        )
    else:
        texts_cand = semi_join_filter(
            ds.map_batches(
                lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
            ),
            None,
            "doc_id",
            key_set=keep,
        )
    texts_refs = object_store_table(texts_cand)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        from ..ops.common import round4

        tbl = fetch_broadcast_table(texts_refs)
        texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
        # memoize shingle sets per doc; the pairwise intersection itself is
        # C-level set arithmetic
        memo: dict = {}

        def sh(i: int) -> set:
            s = memo.get(i)
            if s is None:
                w = texts[i].lower().split()
                s = set(zip(w, w[1:], w[2:])) if len(w) >= 3 else set(w)
                memo[i] = s
            return s

        out = []
        for a, b in zip(batch["doc_a"], batch["doc_b"]):
            sa, sb = sh(int(a)), sh(int(b))
            if not sa and not sb:
                j = 1.0
            else:
                inter = len(sa & sb)
                j = inter / (len(sa) + len(sb) - inter)
            if j >= threshold:
                out.append((int(a), int(b), j))
        df = pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"}
        )
        if len(df):
            df["jaccard"] = round4(df["jaccard"].to_numpy())
        return df

    return cand.map_batches(verify, batch_format="pandas")


def _distinct_shingle_rows(batch: pa.Table) -> pa.Table:
    """Per-doc DISTINCT word-3-gram shingle hashes exploded to
    ``(shingle, doc_id, set_size)`` rows — the inverted-index stage-1 shape
    shared by :func:`jaccard_pairs` and :func:`containment_pairs`."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    flat, counts = _batch_shingles(batch["text"])
    doc_idx = np.repeat(np.arange(len(ids)), counts)
    # distinct shingles per doc: sort (doc, shingle), drop adjacent repeats
    order = np.lexsort((flat, doc_idx))
    d, s = doc_idx[order], flat[order]
    keep = np.ones(len(d), dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
    d, s = d[keep], s[keep]
    sizes = np.bincount(d, minlength=len(ids)).astype(np.int64)
    return pa.table(
        {
            "shingle": pa.array(s, pa.uint64()),
            "doc_id": pa.array(ids[d], pa.int64()),
            "set_size": pa.array(sizes[d], pa.int64()),
        }
    )


def containment_pairs(
    source: str | ray.data.Dataset,
    threshold_pct: int = 80,
    max_doc_freq: int | None = None,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Near-dup pairs by ASYMMETRIC shingle containment
    ``|A∩B| / min(|A|, |B|)`` — catches a document EMBEDDED inside a much
    larger one, where symmetric Jaccard stays tiny (a 100-word doc pasted
    into a 10,000-word doc has J ~= 0.01 but containment 1.0).  The
    standard companion metric to :func:`jaccard_pairs` in dedup literature
    (Broder's containment).

    Same recall-1 distributed inverted-index shape as ``jaccard_pairs``
    (only hashes and ints shuffle, ``max_doc_freq`` caps stop-shingle
    groups); the final gate is the EXACT integer cross-multiply
    ``c * 100 >= threshold_pct * min(|A|, |B|)`` so the float containment
    column is reporting-only.  Output ``(doc_a, doc_b, inter,
    containment)`` sorted within buckets, doc_a < doc_b.

    Exactness assumption: intersections are counted on 64-bit shingle
    hashes while the oracle intersects shingle strings (~n²/2⁶⁴ collision
    odds; same precedent as ``jaccard_pairs``)."""
    ds = _read_docs(source, ["doc_id", "text"])

    exploded = ds.map_batches(
        _distinct_shingle_rows,
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency or pool_size(),
    )

    from ..ops.common import _arrow_add_bucket, round4

    pairs = bucketed_group_pairs(
        exploded, ["shingle"], carry=("set_size",), max_group=max_doc_freq
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"])
        agg = (
            g.groupby(["doc_a", "doc_b"], sort=True)
            .agg(
                c=("set_size_a", "size"),
                size_a=("set_size_a", "first"),
                size_b=("set_size_b", "first"),
            )
            .reset_index()
        )
        c = agg["c"].to_numpy().astype(np.int64)
        mn = np.minimum(agg["size_a"].to_numpy(), agg["size_b"].to_numpy())
        keep = c * 100 >= threshold_pct * mn
        out = agg.loc[keep, ["doc_a", "doc_b"]].copy()
        out["inter"] = c[keep]
        out["containment"] = round4(c[keep] / mn[keep])
        return out

    return (
        pairs.map_batches(
            _arrow_add_bucket(["doc_a", "doc_b"], 64), batch_format="pyarrow"
        )
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def jaccard_pairs(
    source: str | ray.data.Dataset,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """EXACT n-gram Jaccard near-duplicate pairs via a distributed shingle
    inverted index — recall 1 by construction (every pair with a nonzero
    intersection is counted), unlike the probabilistic MinHash-LSH candidates.

    Shape (all-Ray-Data, no driver materialization):

    1. ``map_batches``: per-doc DISTINCT word-3-gram shingle hashes plus the
       doc's shingle-set size → explode to (shingle, doc_id, set_size) rows.
       Only 64-bit hashes and two ints shuffle — never text.
    2. Inverted index: hash-bucket shuffle on ``shingle``; singleton shingles
       (the vast majority) are dropped vectorized before pair generation;
       each colliding shingle group emits its doc pairs with both set sizes
       attached (so no sizes broadcast is ever needed).
    3. Hash-bucket shuffle on (doc_a, doc_b); one vectorized pandas groupby
       per bucket counts co-occurrences = |A∩B|, then
       J = c / (|A| + |B| - c), filtered on the unrounded value.

    Scale knob: a shingle shared by k docs emits k·(k-1)/2 pair rows, so a
    stop-shingle is quadratic.  ``max_doc_freq`` skips shingle groups larger
    than that many docs — at threshold t a pair needs an intersection fraction
    >= t/(1+t) of its union, so dropping a few hyper-frequent shingles only
    perturbs pairs already near the threshold; with the default ``None`` the
    result is exact.  (Prefix filtering would tighten this further.)
    """
    ds = _read_docs(source, ["doc_id", "text"])

    exploded = ds.map_batches(
        _distinct_shingle_rows,
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency or pool_size(),
    )

    from ..ops.common import _arrow_add_bucket, round4

    pairs = bucketed_group_pairs(
        exploded, ["shingle"], carry=("set_size",), max_group=max_doc_freq
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"])
        agg = (
            g.groupby(["doc_a", "doc_b"], sort=True)
            .agg(
                c=("set_size_a", "size"),
                size_a=("set_size_a", "first"),
                size_b=("set_size_b", "first"),
            )
            .reset_index()
        )
        j = agg["c"].to_numpy() / (
            agg["size_a"].to_numpy() + agg["size_b"].to_numpy() - agg["c"].to_numpy()
        )
        out = agg.loc[j >= threshold, ["doc_a", "doc_b"]].copy()
        out["jaccard"] = round4(j[j >= threshold])
        return out

    return (
        pairs.map_batches(
            _arrow_add_bucket(["doc_a", "doc_b"], 64), batch_format="pyarrow"
        )
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def dup_shingle_coverage(
    source: str | ray.data.Dataset,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Per-document duplicate n-gram coverage: for every doc with >= 3 words,
    the fraction of its DISTINCT word-trigram shingles that also occur in at
    least one OTHER document.  This is the n-gram-granularity "how much of
    this doc is boilerplate shared with the rest of the corpus" signal used
    to rank documents for substring-level dedup (cf. training-data dedup
    pipelines that remove repeated spans across a corpus).

    Shape (no driver materialization, two shuffles, only hashes move):

    1. ``map_batches``: per-doc DISTINCT trigram-shingle hashes + shingle-set
       size → (shingle, doc_id, set_size) rows.  Docs with < 3 words are
       excluded (no trigram exists; the oracle applies the same rule).
    2. Inverted index: hash-bucket shuffle on ``shingle``; within a bucket
       every global occurrence of a shingle is co-located, so a vectorized
       ``np.unique`` marks shingles held by >= 2 docs and a per-bucket
       groupby emits per-doc partial dup counts (<= 1 row per doc·bucket).
    3. Tiny hash-bucket shuffle on ``doc_id`` sums the partials:
       ``dup_ratio = n_dup / n_sh`` (canonical 4-dp rounding).

    At 100 TB the shingle index is the same machinery as ``jaccard_pairs``
    stage 2 but never generates pairs, so there is no quadratic arm — the
    output is exactly one row per document.
    """
    from ..ops.common import _arrow_add_bucket, round4

    ds = _read_docs(source, ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hashes, wc = _word_hashes_batch(batch["text"])
        n = len(ids)
        doc_idx = np.repeat(np.arange(n), wc)
        # trigram hashes only for docs with >= 3 words (no short-doc word
        # fallback here — the ratio is defined over true trigram sets)
        keep_doc = wc >= 3
        if len(hashes) >= 3:
            tri = _tri_mix(hashes)
            m = (doc_idx[:-2] == doc_idx[2:]) & keep_doc[doc_idx[:-2]]
            tri, tdoc = tri[m], doc_idx[:-2][m]
        else:
            tri = np.zeros(0, dtype=np.uint64)
            tdoc = np.zeros(0, dtype=np.int64)
        # distinct per doc
        order = np.lexsort((tri, tdoc))
        d, s = tdoc[order], tri[order]
        new = np.ones(len(d), dtype=bool)
        new[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
        d, s = d[new], s[new]
        sizes = np.bincount(d, minlength=n).astype(np.int64)
        return pa.table(
            {
                "shingle": pa.array(s, pa.uint64()),
                "doc_id": pa.array(ids[d], pa.int64()),
                "n_sh": pa.array(sizes[d], pa.int64()),
            }
        )

    exploded = ds.map_batches(
        explode,
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency or pool_size(),
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sh = g["shingle"].to_numpy()
        uniq, inv, cnt = np.unique(sh, return_inverse=True, return_counts=True)
        dup = (cnt[inv] >= 2).astype(np.int64)
        df = pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "dup": dup,
                "n_sh": g["n_sh"].to_numpy(),
            }
        )
        return (
            df.groupby("doc_id", sort=False)
            .agg(dup_cnt=("dup", "sum"), n_sh=("n_sh", "first"))
            .reset_index()
        )

    partials = (
        exploded.map_batches(_arrow_add_bucket(["shingle"], 64), batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby("doc_id", sort=True)
            .agg(n_dup=("dup_cnt", "sum"), n_sh=("n_sh", "first"))
            .reset_index()
        )
        out = agg[["doc_id", "n_sh", "n_dup"]].astype(
            {"doc_id": "int64", "n_sh": "int64", "n_dup": "int64"}
        )
        out["dup_ratio"] = round4(
            agg["n_dup"].to_numpy(np.float64) / agg["n_sh"].to_numpy(np.float64)
        )
        return out

    return (
        partials.map_batches(_arrow_add_bucket(["doc_id"], 16), batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(finalize, batch_format="pandas")
    )


# --- SimHash ---------------------------------------------------------------

_hash_con_local = __import__("threading").local()


def _duckdb_hash_con():
    """Per-thread in-process DuckDB connection for the hash kernels.

    Thread-local because Ray Data may run fused map stages on concurrent
    threads of one worker; sharing a connection across them raises
    "Query interrupted"."""
    import duckdb

    con = getattr(_hash_con_local, "con", None)
    if con is None:
        con = duckdb.connect()
        con.execute("SET threads=1")
        _hash_con_local.con = con
    return con


def _duckdb_word_hash(flat_words: pa.Array) -> np.ndarray:
    """DuckDB's own 64-bit string hash over an Arrow word array, vectorized.

    SimHash output is hash-defined (the fingerprint IS the hash), so to make
    the operator exactly oracle-able the engine uses the same kernel the
    DuckDB oracle uses — the round4 pattern (`ops/common.py:299`) applied to
    hashing.  One in-process zero-copy Arrow scan per batch; ``threads=1``
    keeps scan order stable.
    """
    con = _duckdb_hash_con()
    t = pa.table({"w": flat_words})
    con.register("_simhash_words", t)
    out = con.execute("SELECT hash(w) AS h FROM _simhash_words").fetch_arrow_table()
    con.unregister("_simhash_words")
    return out["h"].to_numpy(zero_copy_only=False).astype(np.uint64)


class SimHashStage:
    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        n_docs = len(doc_ids)
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.utf8_split_whitespace(pc.utf8_lower(texts))
        flat = words.flatten()
        parent = pc.list_parent_indices(words)
        # Arrow keeps empty words for leading/trailing whitespace; drop them
        # (the oracle's regexp split + ``w <> ''`` filter does the same)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep).to_numpy(zero_copy_only=False)
        wc = np.bincount(parent, minlength=n_docs).astype(np.int64)
        crcs = _duckdb_word_hash(flat)
        # one (n_words, 64) int8 bit matrix for the whole batch, summed per
        # doc with reduceat — no per-document Python loop
        shifts = np.arange(64, dtype=np.uint64)
        fps = np.zeros(n_docs, dtype=np.uint64)
        nonempty = wc > 0
        if nonempty.any():
            bits = ((crcs[:, None] >> shifts) & _U64(1)).astype(np.int8)
            starts = np.concatenate(([0], np.cumsum(wc)[:-1]))
            sums = np.add.reduceat(bits, starts[nonempty], axis=0).astype(np.int64)
            votes = 2 * sums - wc[nonempty, None]
            with np.errstate(over="ignore"):
                fps[nonempty] = ((votes > 0).astype(np.uint64) << shifts).sum(axis=1)
        return pa.table(
            {"doc_id": pa.array(doc_ids), "simhash": pa.array(fps, pa.uint64())}
        )


def simhash_pairs(
    source: str | ray.data.Dataset, max_hamming: int = 3, concurrency: int | None = None
) -> ray.data.Dataset:
    """Pairs with SimHash Hamming distance <= max_hamming (16-bit band
    blocking: any pair within distance 3 shares at least one of 4 bands)."""
    ds = _read_docs(source, ["doc_id", "text"])
    fps = ds.map_batches(
        SimHashStage,
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency or pool_size(),
    )

    def explode(batch: pa.Table) -> pa.Table:
        fp = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        bands, out_ids, out_fp, keys = [], [], [], []
        for b in range(4):
            key = (fp >> _U64(16 * b)) & _U64(0xFFFF)
            bands.append(np.full(len(fp), b, dtype=np.int32))
            keys.append(key)
            out_ids.append(ids)
            out_fp.append(fp)
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands)),
                "key": pa.array(np.concatenate(keys), pa.uint64()),
                "doc_id": pa.array(np.concatenate(out_ids)),
                "simhash": pa.array(np.concatenate(out_fp), pa.uint64()),
            }
        )

    exploded = fps.map_batches(explode, batch_format="pyarrow")

    from ..ops.common import bucketed_distinct

    pairs = bucketed_group_pairs(exploded, ["band", "key"], carry=("simhash",))

    def hamming_filter(g: pd.DataFrame) -> pd.DataFrame:
        a = g["simhash_a"].to_numpy().astype(np.uint64)
        b = g["simhash_b"].to_numpy().astype(np.uint64)
        d = popcount64(a ^ b)
        keep = d <= max_hamming
        out = g.loc[keep, ["doc_a", "doc_b"]].copy()
        out["hamming"] = d[keep].astype(np.int64)
        return out

    pairs = pairs.map_batches(hamming_filter, batch_format="pandas")
    return bucketed_distinct(pairs, ["doc_a", "doc_b"], ["doc_a", "doc_b", "hamming"])


# --- exact dedup -----------------------------------------------------------


def dedup_exact(source: str | ray.data.Dataset) -> ray.data.Dataset:
    """Exact dedup: survivors = min doc_id per text.  Returns the surviving
    full rows.

    The dedup key is the text itself: bucket routing hashes it with the
    vectorized pandas hasher (``ops/common._arrow_add_bucket``) and the
    in-bucket duplicate mask compares full texts, so two distinct texts can
    never merge on a hash collision — truly exact at any corpus size, with
    no per-row Python anywhere in the path.  The full row ships through the
    shuffle regardless (survivor rows are the output), so keying on text
    adds no extra bytes over a digest column.  Buckets sort by ``doc_id``
    only (an int sort — ordering long text payloads would dominate the
    in-bucket cost); first-per-text in that order IS min-doc_id-per-text."""
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    ds = _read_docs(source, cols)

    from ..ops.common import bucketed_distinct

    return bucketed_distinct(ds, ["text"], ["doc_id"])


# --- near-dup keep sets (connected components over pair output) -------------


# Auto-switch bound for dedup_near / dedup_semantic's default arm: pair
# lists at or below this fit comfortably on the driver (2 int64 cols,
# ~160 MB at the bound) and the union-find shortcut is several times
# faster; above it connected components run fully distributed.
COMPONENTS_DRIVER_MAX_PAIRS = 10_000_000


def component_drop_ids(pairs: ray.data.Dataset, a: str = "doc_a", b: str = "doc_b") -> np.ndarray:
    """Union-find over a near-duplicate pair Dataset: returns the sorted ids
    to DROP so that exactly the minimum id of every connected component
    survives.

    The pair list streams through ``iter_batches`` — only two int64 columns
    ever reach the driver, never documents.  Scale contract: the pair set is
    the near-duplicate subset (two ints per duplicate relation), orders of
    magnitude smaller than the corpus; if a corpus were dirty enough for the
    pair list itself to overwhelm a driver, use
    :func:`component_labels_distributed` (same min-root labels, computed as
    k rounds of ``hash_join`` + ``groupby(node).min`` with no driver loop) —
    the keep-set filter is unchanged either way."""
    parent: dict = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for batch in pairs.select_columns([a, b]).iter_batches(batch_format="pyarrow"):
        for u, v in zip(
            batch[a].to_numpy(zero_copy_only=False),
            batch[b].to_numpy(zero_copy_only=False),
        ):
            ru, rv = find(int(u)), find(int(v))
            if ru != rv:
                # min root wins, so find(x) is always the component minimum
                if ru < rv:
                    parent[rv] = ru
                else:
                    parent[ru] = rv
    drops = [x for x in parent if find(x) != x]
    return np.array(sorted(drops), dtype=np.int64)


def component_labels_distributed(
    pairs: ray.data.Dataset,
    a: str = "doc_a",
    b: str = "doc_b",
    max_rounds: int = 50,
) -> ray.data.Dataset:
    """Fully-distributed connected components over a pair Dataset by
    iterative min-label propagation — the scale path for corpora whose
    near-duplicate pair list is itself too large for a driver union-find.

    Each round: every node takes the minimum of its own label and its
    neighbors' labels (one ``hash_join`` edges⋈labels + one
    ``groupby(node).min``), until a fixpoint.  Rounds needed = the maximum
    component diameter (near-dup clusters are shallow, so a handful).
    Returns (node, label) with label = component minimum — identical to
    ``component_drop_ids``'s union-find convention.
    """
    from .join import hash_join

    def symmetrize(t: pa.Table) -> pa.Table:
        u = t[a].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[b].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([u, v])),
                "dst": pa.array(np.concatenate([v, u])),
            }
        )

    edges = (
        pairs.select_columns([a, b])
        .map_batches(symmetrize, batch_format="pyarrow")
        .materialize()  # reused every round; only two int64 columns
    )

    def init_labels(t: pa.Table) -> pa.Table:
        node = t["src"].to_numpy(zero_copy_only=False)
        nbr = t["min(dst)"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(node.astype(np.int64)),
                "label": pa.array(np.minimum(node, nbr).astype(np.int64)),
            }
        )

    labels = (
        edges.groupby("src").min("dst").map_batches(init_labels, batch_format="pyarrow")
    ).materialize()

    def as_dst_key(t: pa.Table) -> pa.Table:
        return t.rename_columns(["dst", "label"])

    def as_node_label(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["src"], "label": t["label"]})

    for _ in range(max_rounds):
        contrib = hash_join(
            edges, labels.map_batches(as_dst_key, batch_format="pyarrow"), on="dst"
        ).map_batches(as_node_label, batch_format="pyarrow")
        new_labels = (
            contrib.union(labels)
            .groupby("node")
            .min("label")
            .map_batches(
                lambda t: t.rename_columns(["node", "label"]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        # converged when no node's label shrank this round
        def relabel(t: pa.Table) -> pa.Table:
            return t.rename_columns(["node", "old"])

        changed = (
            hash_join(
                new_labels, labels.map_batches(relabel, batch_format="pyarrow"), on="node"
            )
            .map_batches(
                lambda t: t.filter(pc.not_equal(t["label"], t["old"])),
                batch_format="pyarrow",
            )
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # exiting via max_rounds with labels still moving would silently
        # mislabel long chains (survivor rule keeps BOTH ends of the chain)
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} rounds "
            f"({changed} labels still changing); raise max_rounds"
        )
    return labels


def dedup_near(
    source: str | ray.data.Dataset,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    concurrency: int | None = None,
    distributed_components: bool | None = None,
) -> ray.data.Dataset:
    """Corpus-level near-duplicate dedup: the end-to-end "give me the cleaned
    corpus" operator.  ``jaccard_pairs`` (exact n-gram Jaccard, recall 1)
    feeds connected components; the minimum doc_id of every duplicate
    component survives.  Returns the kept ``doc_id`` rows.

    ``distributed_components=None`` (default) AUTO-SWITCHES on the actual
    duplicate-pair count — one cheap aggregate over the already-materialized
    pair list: above :data:`COMPONENTS_DRIVER_MAX_PAIRS` it takes
    :func:`component_labels_distributed` + a left ``hash_join`` keep-filter
    (nothing reaches the driver — the path a 100 TB dirty corpus takes with
    no opt-in flag), below it the driver union-find shortcut (drop set
    broadcast once, vectorized ``is_in`` anti-filter — bounded by the
    threshold and several times faster at small scale).  Pass True/False to
    force an arm."""
    pairs = jaccard_pairs(
        source, threshold=threshold, max_doc_freq=max_doc_freq, concurrency=concurrency
    )
    ids = _read_docs(source, ["doc_id"])
    if distributed_components is None:
        # the distributed arm re-reads the pair list every label round and
        # the driver arm pulls it once — either way materializing the two
        # int64 columns here costs nothing extra
        pairs = pairs.materialize()
        distributed_components = pairs.count() > COMPONENTS_DRIVER_MAX_PAIRS
    if distributed_components:
        from .join import hash_join

        labels = component_labels_distributed(pairs).map_batches(
            lambda t: t.rename_columns(["doc_id", "label"]), batch_format="pyarrow"
        )
        joined = hash_join(ids, labels, on="doc_id", how="left")

        def keep_joined(batch: pa.Table) -> pa.Table:
            lbl = batch["label"]
            mask = pc.or_kleene(
                pc.is_null(lbl), pc.equal(lbl, batch["doc_id"])
            )
            return batch.filter(pc.fill_null(mask, True)).select(["doc_id"])

        return joined.map_batches(keep_joined, batch_format="pyarrow")

    drops = component_drop_ids(pairs)
    drops_ref = ray.put(pa.array(drops, pa.int64()))

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch["doc_id"], value_set=ray.get(drops_ref)))
        return batch.filter(mask)

    return ids.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cross-source overlap matrix
# ---------------------------------------------------------------------------


def source_overlap(
    source: str | ray.data.Dataset,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Cross-source n-gram contamination matrix: for every pair of sources,
    the number of DISTINCT word-trigram shingles that occur in both — the
    corpus-level "how much do these crawls/feeds overlap" report that decides
    which sources need cross-source dedup before mixing (per-document
    granularity of the same signal: :func:`dup_shingle_coverage`).

    Shape (one shuffle, only hashes + a small source index move):

    1. ``map_batches``: per-batch DISTINCT (trigram-hash, source-idx) pairs;
       docs with < 3 words contribute nothing (the oracle applies the same
       rule).  The source list comes from one bounded distinct pass.
    2. Bucket shuffle on the shingle hash; within a bucket every global
       occurrence of a shingle co-locates, so a vectorized pass builds one
       uint64 source-BITMASK per distinct shingle (``np.bitwise_or.at``) and
       counts each source pair's co-occurrences over the mask array — the
       per-bucket partial is at most ``n_src*(n_src-1)/2`` rows.
    3. A tiny groupby sums the partials.

    The bitmask bounds this path at 63 sources; an overlap matrix over
    thousands of DOMAINS should emit per-shingle source pairs instead (the
    ``jaccard_pairs`` stage-2 pair generation, with sources as nodes).

    Output: ``(source_a, source_b, n_shared)``, ``source_a < source_b``,
    pairs with zero overlap omitted, sorted by pair.
    """
    ds = _read_docs(source, ["source", "text"])

    def src_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"source": pc.unique(batch["source"])})

    srcs = sorted(
        r["source"]
        for r in ds.select_columns(["source"])
        .map_batches(src_partial, batch_format="pyarrow")
        .groupby("source")
        .count()
        .take_all()  # bounded: one row per source
    )
    n_src = len(srcs)
    if n_src > 63:
        raise ValueError(
            f"{n_src} sources exceed the uint64 bitmask; use the pair-"
            "generation path (jaccard_pairs stage 2) for domain-level overlap"
        )
    idx_ref = ray.put({s: i for i, s in enumerate(srcs)})

    def explode(batch: pa.Table) -> pa.Table:
        m = ray.get(idx_ref)
        src = batch["source"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        si = np.array([m[s] for s in uniq], np.int64)[inv]
        hashes, wc = _word_hashes_batch(batch["text"])
        doc_idx = np.repeat(np.arange(len(batch)), wc)
        keep_doc = wc >= 3
        if len(hashes) >= 3:
            tri = _tri_mix(hashes)
            keep = (doc_idx[:-2] == doc_idx[2:]) & keep_doc[doc_idx[:-2]]
            tri, tsrc = tri[keep], si[doc_idx[:-2][keep]]
        else:
            tri = np.zeros(0, np.uint64)
            tsrc = np.zeros(0, np.int64)
        # distinct (shingle, source) within the batch: shuffle-size cut only
        # (the bucket-side bitmask OR absorbs any remaining duplicates)
        order = np.lexsort((tsrc, tri))
        t, s = tri[order], tsrc[order]
        new = np.ones(len(t), bool)
        new[1:] = (t[1:] != t[:-1]) | (s[1:] != s[:-1])
        t, s = t[new], s[new]
        return pa.table(
            {
                "tri": pa.array(t, pa.uint64()),
                "src": pa.array(s, pa.int64()),
                "_bucket": pa.array(
                    (t % np.uint64(num_buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        if isinstance(g, pd.DataFrame):
            g = pa.Table.from_pandas(g, preserve_index=False)
        tri = g["tri"].to_numpy(zero_copy_only=False)
        s = g["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        uniq_t, inv = np.unique(tri, return_inverse=True)
        masks = np.zeros(len(uniq_t), np.uint64)
        np.bitwise_or.at(masks, inv, np.uint64(1) << s)
        # collapse to DISTINCT masks first: the i/j pair loop then runs over
        # the handful of distinct source combinations, not the full
        # per-shingle mask array (n_src^2/2 full-array scans otherwise)
        uniq_m, m_cnt = np.unique(masks, return_counts=True)
        rows_a, rows_b, rows_c = [], [], []
        for i in range(n_src):
            bi = ((uniq_m >> np.uint64(i)) & np.uint64(1)).astype(bool)
            if not bi.any():
                continue
            for j in range(i + 1, n_src):
                both = bi & ((uniq_m >> np.uint64(j)) & np.uint64(1)).astype(bool)
                c = int(m_cnt[both].sum())
                if c:
                    rows_a.append(i)
                    rows_b.append(j)
                    rows_c.append(c)
        return pa.table(
            {
                "sa": pa.array(rows_a, pa.int64()),
                "sb": pa.array(rows_b, pa.int64()),
                "cnt": pa.array(rows_c, pa.int64()),
            }
        )

    totals = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["sa", "sb"])
        .sum("cnt")
    )
    names_ref = ray.put(np.array(srcs, dtype=object))

    def emit(batch: pa.Table) -> pa.Table:
        names = ray.get(names_ref)
        sa = batch["sa"].to_numpy(zero_copy_only=False)
        sb = batch["sb"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source_a": pa.array(names[sa].astype(str)),
                "source_b": pa.array(names[sb].astype(str)),
                "n_shared": batch["sum(cnt)"],
            }
        )

    named = totals.map_batches(emit, batch_format="pyarrow")
    # a corpus with no shared trigram leaves zero groups (schema-less)
    named = ray.data.from_arrow(
        pa.table({"source_a": pa.array([], pa.string()),
                  "source_b": pa.array([], pa.string()),
                  "n_shared": pa.array([], pa.int64())})
    ).union(named)
    return named.sort(["source_a", "source_b"])


# ---------------------------------------------------------------------------
# cross-document duplicated-span REMOVAL
# ---------------------------------------------------------------------------


def dedup_spans(
    source: str | ray.data.Dataset,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """REMOVE cross-document duplicated spans at word-trigram granularity:
    a word is dropped iff it is covered by some trigram (of the lowercased
    word sequence) that also occurs in at least one OTHER document; the
    surviving words are rejoined with single spaces.  This is the
    span-level dedup of "Deduplicating Training Data Makes Language Models
    Better" (Lee et al. 2022) at n=3 granularity — it cuts repeated
    boilerplate out of otherwise-unique documents instead of dropping or
    keeping whole documents (:func:`dedup_exact` / :func:`dedup_near`), and
    :func:`dup_shingle_coverage` is its measurement-only companion.

    Shape (three bounded shuffles; document text moves through exactly ONE
    of them, and only hashes/ints through the rest):

    1. ``map_batches``: (trigram-hash, doc_id, start-pos) rows for every
       trigram start, positions indexed over the doc's nonempty words.
    2. Inverted index: hash-bucket shuffle on the trigram; within a bucket
       every global occurrence co-locates, so a vectorized run scan keeps
       exactly the rows of trigrams spanning >= 2 distinct docs (the
       typical output is the small duplicated subset).
    3. Doc-bucket shuffle of the surviving (doc, pos) rows builds one
       sorted start-position list per affected document.
    4. ``hash_join`` (LEFT) attaches the start lists to the documents —
       the one shuffle that moves text (and auto-broadcasts when the dup
       side is small) — then a streamed rebuild drops covered words:
       kept = words at positions not in ``{s, s+1, s+2}`` for any start s.

    Output: ``(doc_id, n_words, n_kept, text_clean)`` sorted by doc_id,
    with ``text_clean`` the ORIGINAL-case kept words joined by ' '
    (whitespace-normalized for every document, touched or not).

    Exactness assumption: duplication is decided on 64-bit trigram hashes
    (``_tri_mix``) while the oracle compares trigram strings — a collision
    between distinct trigrams in two documents would silently drop
    non-duplicated words.  At ~n distinct trigrams the collision odds are
    ~n²/2⁶⁴ (same precedent as :func:`jaccard_pairs` /
    :func:`dup_shingle_coverage`), but note this operator MUTATES text
    rather than just measuring, so a collision would corrupt output, not
    merely misreport a score.
    """
    from .join import hash_join

    ds = _read_docs(source, ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hashes, wc = _word_hashes_batch(batch["text"])
        doc_idx = np.repeat(np.arange(len(ids)), wc)
        word_starts = np.concatenate(([0], np.cumsum(wc)[:-1]))
        pos_in_doc = np.arange(len(hashes)) - word_starts[doc_idx]
        keep_doc = wc >= 3
        if len(hashes) >= 3:
            tri = _tri_mix(hashes)
            m = (doc_idx[:-2] == doc_idx[2:]) & keep_doc[doc_idx[:-2]]
            tri = tri[m]
            tdoc = ids[doc_idx[:-2][m]]
            tpos = pos_in_doc[:-2][m]
        else:
            tri = np.zeros(0, np.uint64)
            tdoc = np.zeros(0, np.int64)
            tpos = np.zeros(0, np.int64)
        return pa.table(
            {
                "tri": pa.array(tri, pa.uint64()),
                "doc_id": pa.array(tdoc, pa.int64()),
                "pos": pa.array(tpos, pa.int64()),
                "_bucket": pa.array(
                    (tri % np.uint64(num_buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    def dup_rows(g: pa.Table) -> pa.Table:
        if isinstance(g, pd.DataFrame):
            g = pa.Table.from_pandas(g, preserve_index=False)
        tri = g["tri"].to_numpy(zero_copy_only=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        pos = g["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, tri))
        t, d = tri[order], doc[order]
        new_tri = np.ones(len(t), bool)
        new_tri[1:] = t[1:] != t[:-1]
        new_doc = np.ones(len(t), bool)
        new_doc[1:] = new_tri[1:] | (d[1:] != d[:-1])
        run_id = np.cumsum(new_tri) - 1
        n_docs = np.zeros(run_id[-1] + 1 if len(t) else 0, np.int64)
        np.add.at(n_docs, run_id, new_doc.astype(np.int64))
        dup = n_docs[run_id] >= 2
        keep = order[dup]
        return pa.table(
            {"doc_id": pa.array(doc[keep], pa.int64()),
             "pos": pa.array(pos[keep], pa.int64())}
        )

    dup_pos = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(dup_rows, batch_format="pyarrow")
    )

    from ..ops.common import _arrow_add_bucket

    def pos_lists(g: pa.Table) -> pa.Table:
        if isinstance(g, pd.DataFrame):
            g = pa.Table.from_pandas(g, preserve_index=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        pos = g["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, doc))
        d, p = doc[order], pos[order]
        new = np.ones(len(d), bool)
        new[1:] = d[1:] != d[:-1]
        counts = np.diff(np.concatenate((np.nonzero(new)[0], [len(d)])))
        offsets = np.concatenate(([0], np.cumsum(counts)))
        # positions ride as a comma-joined string: plain columns survive the
        # join's pandas merge natively (a list column would round-trip into
        # a tensor-extension dtype); the rebuild splits it back with Arrow
        # kernels, still no per-row Python
        starts_str = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()),
                pc.cast(pa.array(p, pa.int64()), pa.string()),
            ),
            ",",
        )
        return pa.table(
            {"doc_id": pa.array(d[new], pa.int64()), "starts": starts_str}
        )

    lists = (
        dup_pos.map_batches(_arrow_add_bucket(["doc_id"], num_buckets),
                            batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pos_lists, batch_format="pyarrow")
    )
    # a clean corpus (no cross-doc duplicate trigram anywhere) leaves zero
    # groups above, i.e. a schema-less empty dataset; the typed-empty union
    # pins the schema so the left join still runs (pure passthrough)
    lists = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "starts": pa.array([], pa.string())})
    ).union(lists)
    joined = hash_join(ds, lists, on="doc_id", how="left")

    def rebuild(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.utf8_split_whitespace(texts)
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
        wc = np.bincount(parent, minlength=len(ids)).astype(np.int64)
        word_starts = np.concatenate(([0], np.cumsum(wc)[:-1]))
        keep = np.ones(len(flat), bool)
        starts_col = batch["starts"]
        # ragged gather of every covered position: starts + {0, 1, 2}
        valid = pc.is_valid(starts_col).to_numpy(zero_copy_only=False)
        if valid.any():
            sc = starts_col.combine_chunks() if isinstance(
                starts_col, pa.ChunkedArray) else starts_col
            lists = pc.cast(
                pc.split_pattern(pc.fill_null(sc, ""), ","),
                pa.large_list(pa.string()),
            )
            n_per = pc.list_value_length(lists).to_numpy(
                zero_copy_only=False).astype(np.int64)
            n_per[~valid] = 0
            flat_parent = pc.list_parent_indices(lists).to_numpy(
                zero_copy_only=False)
            flat_ok = valid[flat_parent]
            flat_starts = pc.cast(
                lists.flatten().filter(pa.array(flat_ok)), pa.int64()
            ).to_numpy(zero_copy_only=False)
            doc_of_start = flat_parent[flat_ok]
            base = word_starts[doc_of_start] + flat_starts
            cov = (base[:, None] + np.arange(3)[None, :]).ravel()
            keep[cov] = False
        kept_words = flat.filter(pa.array(keep))
        n_kept = np.zeros(len(ids), np.int64)
        np.add.at(n_kept, parent[keep], 1)
        offsets = np.concatenate(([0], np.cumsum(n_kept)))
        joined_txt = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                          kept_words),
            " ",
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(wc, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
                "text_clean": joined_txt,
            }
        )

    return joined.map_batches(rebuild, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# persisted shingle inverted index + incremental near-dup probe
# ---------------------------------------------------------------------------

_MH_META = "_minhash_meta.json"


def _batch_tri_shingles(texts) -> tuple[np.ndarray, np.ndarray]:
    """Word-trigram shingle hashes per doc, trigram-ONLY: a doc with < 3
    words emits NOTHING (it has no trigram set and can never be a near-dup
    under the trigram-set oracle rule), unlike :func:`_batch_shingles`'s
    per-word fallback for short docs."""
    hashes, wc = _word_hashes_batch(texts)
    word_starts = np.concatenate(([0], np.cumsum(wc)[:-1]))
    sh_counts = np.where(wc >= 3, wc - 2, 0)
    total = int(sh_counts.sum())
    out = np.empty(total, dtype=np.uint64)
    sh_starts = np.concatenate(([0], np.cumsum(sh_counts)[:-1]))
    tri = _tri_mix(hashes) if len(hashes) >= 3 else np.zeros(0, dtype=np.uint64)
    big = wc >= 3
    if big.any():
        src = _ragged_range(word_starts[big], sh_counts[big])
        dst = _ragged_range(sh_starts[big], sh_counts[big])
        out[dst] = tri[src]
    return out, sh_counts


def _tri_shingle_rows(ids: np.ndarray, texts) -> pa.Table:
    """DISTINCT trigram shingles per doc exploded to
    ``(shingle, doc_id, set_size)`` rows — the jaccard_pairs stage-1 shape,
    restricted to trigram-only semantics."""
    flat, counts = _batch_tri_shingles(texts)
    doc_idx = np.repeat(np.arange(len(ids)), counts)
    order = np.lexsort((flat, doc_idx))
    d, s = doc_idx[order], flat[order]
    keep = np.ones(len(d), dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
    d, s = d[keep], s[keep]
    sizes = np.bincount(d, minlength=len(ids)).astype(np.int64)
    return pa.table(
        {
            "shingle": pa.array(s, pa.uint64()),
            "doc_id": pa.array(ids[d], pa.int64()),
            "set_size": pa.array(sizes[d], pa.int64()),
        }
    )


def build_minhash_index(
    source: str | ray.data.Dataset,
    index_dir: str,
    ref_mod: int = 5,
    num_buckets: int = 32,
) -> dict:
    """Persist the REFERENCE corpus's near-dup screening index: the DISTINCT
    trigram-shingle inverted index ``(shingle, doc_id, set_size)``,
    hive-partitioned by a shingle-hash bucket (``sb``) so an ingest probe
    reads only the partitions its own shingles fall in — the "build once,
    probe many" layout shared with :func:`bloom_novel` and the IVF index.

    Round-4 redesign (recall): the previous layout persisted MinHash LSH
    bands, whose candidate recall at the verify threshold is < 1 (16 bands
    of 4 rows gives ~1-(1-J^4)^16 ~= 0.64 at J=0.5) — a true near-dup pair
    could miss every band and be falsely reported novel.  The shingle
    inverted index is recall-1 BY CONSTRUCTION: any pair with nonzero
    trigram intersection (a superset of J >= t for every t > 0) collides on
    at least one shingle partition.  Exactness note: shingles are compared
    as 64-bit ``_tri_mix`` hashes while the oracle compares trigram STRINGS
    — the same documented ~n^2/2^64-collision assumption as
    :func:`jaccard_pairs` / :func:`dup_shingle_coverage`.

    Reference slice: ``doc_id % ref_mod == 0`` (the deterministic
    yesterday's-corpus stand-in shared with ``lm_score``/``bloom_novel``).
    """
    import json
    import os

    ds = _read_docs(source, ["doc_id", "text"])
    nb = np.uint64(num_buckets)

    def ref_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids % ref_mod == 0
        t = _tri_shingle_rows(ids[keep], batch["text"].filter(pa.array(keep)))
        sb = (t["shingle"].to_numpy(zero_copy_only=False) % nb).astype(np.int64)
        return t.append_column("sb", pa.array(sb, pa.int64()))

    os.makedirs(index_dir, exist_ok=True)
    (
        ds.map_batches(ref_rows, batch_format="pyarrow", batch_size=2048)
        .write_parquet(os.path.join(index_dir, "shingles"),
                       partition_cols=["sb"])
    )
    meta = {"num_buckets": num_buckets, "ref_mod": ref_mod,
            "layout": "shingle-inverted"}
    with open(os.path.join(index_dir, _MH_META), "w") as f:
        json.dump(meta, f)
    return meta


def minhash_novel(
    source: str | ray.data.Dataset,
    index_dir: str,
    threshold: float = 0.5,
) -> ray.data.Dataset:
    """Incremental NEAR-dup screening with RECALL 1: flag which of today's
    documents (``doc_id % ref_mod != 0``) are novel vs the persisted
    reference shingle index.  Exact trigram Jaccard is computed directly
    from index co-occurrence counts — for each (ref, ingest) pair the
    number of shared distinct shingles IS the intersection size, so
    ``J = c / (|A| + |B| - c)`` needs no text fetch and misses no pair
    (every J > 0 pair shares a shingle; LSH-band candidates, by contrast,
    can miss true near-dups below ~0.9 Jaccard).

    IO shape: the ingest is shingled once (ints only, bounded by the
    ingest); the index read is pruned to the ``sb`` partitions the ingest's
    shingles fall in; reference TEXT is never read.  A stop-shingle shared
    by k docs emits k ref-x-ingest rows — the same quadratic knob as
    :func:`jaccard_pairs`; callers screening adversarial corpora should cap
    it there first.  Output: ``(doc_id, novel)`` for every ingest document,
    sorted.
    """
    import json
    import os

    with open(os.path.join(index_dir, _MH_META)) as f:
        meta = json.load(f)
    nb = int(meta["num_buckets"])
    ref_mod = int(meta["ref_mod"])
    ds = _read_docs(source, ["doc_id", "text"])

    def today_only(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % ref_mod != 0))

    today = ds.map_batches(today_only, batch_format="pyarrow")

    # ingest shingles: ints only, bounded by the ingest — materialized
    # because they feed both the probe-partition list and the collision join
    def ingest_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return _tri_shingle_rows(ids, batch["text"])

    tb = today.map_batches(
        ingest_rows, batch_format="pyarrow", batch_size=2048
    ).materialize()

    def probe_partial(t: pa.Table) -> pa.Table:
        sb = np.unique(
            t["shingle"].to_numpy(zero_copy_only=False) % np.uint64(nb)
        ).astype(np.int64)
        return pa.table({"sb": pa.array(sb, pa.int64())})

    probe_sb = sorted(
        int(r["sb"])
        for r in tb.map_batches(probe_partial, batch_format="pyarrow")
        .groupby("sb").count().take_all()  # bounded: <= num_buckets
    )
    paths = []
    for b in probe_sb:
        d = os.path.join(index_dir, "shingles", f"sb={b}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )

    from ..ops.common import _arrow_add_bucket

    hit_ref = None
    if paths:

        def flag(side: int):
            def fn(t: pa.Table) -> pa.Table:
                t = t.select(["shingle", "doc_id", "set_size"])
                return t.append_column(
                    "side", pa.array(np.full(len(t), side, np.int8))
                )

            return fn

        idx = ray.data.read_parquet(
            paths, columns=["shingle", "doc_id", "set_size"]
        ).map_batches(flag(0), batch_format="pyarrow")
        tagged = idx.union(tb.map_batches(flag(1), batch_format="pyarrow"))

        _CO_EMPTY = {c: pd.Series([], dtype="int64")
                     for c in ("rid", "nid", "c", "sr", "sn")}

        def co_partial(g: pd.DataFrame) -> pd.DataFrame:
            # per shingle-bucket: one vectorized ref-x-ingest merge on the
            # shingle hash; the per-(rid, nid) row count within a bucket is
            # a PARTIAL exact-intersection count (a pair's shingles span
            # buckets, so stage 2 re-aggregates)
            r = g.loc[g["side"] == 0, ["shingle", "doc_id", "set_size"]]
            n = g.loc[g["side"] == 1, ["shingle", "doc_id", "set_size"]]
            if not len(r) or not len(n):
                return pd.DataFrame(_CO_EMPTY)
            m = r.merge(n, on="shingle", suffixes=("_r", "_n"))
            if not len(m):
                return pd.DataFrame(_CO_EMPTY)
            agg = (
                m.groupby(["doc_id_r", "doc_id_n"], sort=False)
                .agg(c=("set_size_r", "size"), sr=("set_size_r", "first"),
                     sn=("set_size_n", "first"))
                .reset_index()
                .rename(columns={"doc_id_r": "rid", "doc_id_n": "nid"})
            )
            return agg.astype(
                {"rid": "int64", "nid": "int64", "c": "int64",
                 "sr": "int64", "sn": "int64"}
            )

        co = (
            tagged.map_batches(
                _arrow_add_bucket(["shingle"], 64), batch_format="pyarrow"
            )
            .groupby("_bucket")
            .map_groups(co_partial, batch_format="pandas")
        )

        def per_pair(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop(columns=["_bucket"])
            agg = (
                g.groupby(["rid", "nid"], sort=False)
                .agg(c=("c", "sum"), sr=("sr", "first"), sn=("sn", "first"))
                .reset_index()
            )
            j = agg["c"].to_numpy() / (
                agg["sr"].to_numpy() + agg["sn"].to_numpy()
                - agg["c"].to_numpy()
            )
            return pd.DataFrame(
                {"nid": pd.Series(
                    pd.unique(agg.loc[j >= threshold, "nid"].to_numpy()),
                    dtype="int64")}
            )

        hit_ids = sorted(
            {int(r["nid"]) for r in
             co.map_batches(
                 _arrow_add_bucket(["rid", "nid"], 64),
                 batch_format="pyarrow")
             .groupby("_bucket")
             .map_groups(per_pair, batch_format="pandas")
             .take_all()}
        )  # bounded: ingest docs with a verified reference near-dup
        if hit_ids:
            hit_ref = ray.put(pa.array(hit_ids, pa.int64()))

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        if hit_ref is None:
            novel = pa.array(np.ones(len(batch), bool))
        else:
            novel = pc.invert(pc.is_in(ids, value_set=ray.get(hit_ref)))
        return pa.table({"doc_id": ids, "novel": novel})

    return (
        today.map_batches(lambda t: t.select(["doc_id"]),
                          batch_format="pyarrow")
        .map_batches(emit, batch_format="pyarrow")
        .sort("doc_id")
    )


def dup_cluster_sizes(
    source: str | ray.data.Dataset,
    threshold: float = 0.5,
) -> ray.data.Dataset:
    """Near-duplicate CLUSTER SIZE histogram: connected components over the
    exact-Jaccard pair graph (recall-1 :func:`jaccard_pairs`), reported as
    ``(cluster_size, n_clusters)`` — the dedup-impact summary ("how much of
    the corpus sits in 2-clusters vs 50-clusters") that decides whether
    near-dedup is worth its shuffle before running the full keep-set pass.
    Components come from the distributed min-label propagation
    (:func:`component_labels_distributed` — no driver union-find), sizes
    and the histogram from two tiny groupbys.  Singleton documents (no
    near-dup) are not clusters and are excluded.
    """
    pairs = jaccard_pairs(source, threshold=threshold)
    labels = component_labels_distributed(pairs)

    def size_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["label"]).aggregate([([], "count_all")])
        return g.rename_columns(["label", "n"])

    sizes = (
        labels.map_batches(size_partial, batch_format="pyarrow")
        .groupby("label")
        .sum("n")
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["sum(n)"]).aggregate([([], "count_all")])
        return g.rename_columns(["cluster_size", "n_clusters"])

    hist = (
        sizes.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("cluster_size")
        .sum("n_clusters")
        .map_batches(
            lambda t: t.rename_columns(["cluster_size", "n_clusters"]),
            batch_format="pyarrow",
        )
    )
    return ray.data.from_arrow(
        pa.table({"cluster_size": pa.array([], pa.int64()),
                  "n_clusters": pa.array([], pa.int64())})
    ).union(hist).sort("cluster_size")


def dedup_near_best(
    source: str | ray.data.Dataset,
    threshold: float = 0.5,
) -> ray.data.Dataset:
    """Near-dedup keep set with QUALITY-RANKED survivors: in every
    near-duplicate cluster the surviving document is the one with the
    highest ``n_chars`` (ties to the smallest id) instead of
    :func:`dedup_near`'s min-id — what production dedup actually wants
    (keep the best duplicate, not the first-crawled one; any quality
    column works the same way).

    Shape: the recall-1 :func:`jaccard_pairs` graph -> distributed
    min-label components -> one hash_join attaches each member's quality ->
    per-cluster argmax via the bounded per-batch top-1 partials
    (``group_topk`` discipline) -> anti-filter of the losers.  Output:
    surviving ``doc_id`` rows, sorted.
    """
    from .join import hash_join
    from .text import _read_docs

    pairs = jaccard_pairs(source, threshold=threshold)
    labels = component_labels_distributed(pairs)  # (node, label)
    quality = _read_docs(source, ["doc_id", "n_chars"]).map_batches(
        lambda t: t.select(["doc_id", "n_chars"]).rename_columns(
            ["node", "n_chars"]),
        batch_format="pyarrow",
    )
    members = hash_join(labels, quality, on="node")

    def top_partial(t: pa.Table) -> pa.Table:
        lab = t["label"].to_numpy(zero_copy_only=False)
        node = t["node"].to_numpy(zero_copy_only=False)
        q = t["n_chars"].to_numpy(zero_copy_only=False)
        order = np.lexsort((node, -q, lab))
        lab_s = lab[order]
        first = np.ones(len(lab_s), bool)
        first[1:] = lab_s[1:] != lab_s[:-1]
        keep = order[first]
        return pa.table(
            {
                "label": pa.array(lab[keep], pa.int64()),
                "node": pa.array(node[keep], pa.int64()),
                "n_chars": pa.array(q[keep]),
            }
        )

    def winner(g: pa.Table) -> pa.Table:
        if isinstance(g, pd.DataFrame):
            g = pa.Table.from_pandas(g, preserve_index=False)
        node = g["node"].to_numpy(zero_copy_only=False)
        q = g["n_chars"].to_numpy(zero_copy_only=False)
        best = int(np.lexsort((node, -q))[0])
        return pa.table({"winner": pa.array([node[best]], pa.int64())})

    winners = (
        members.map_batches(top_partial, batch_format="pyarrow")
        .groupby("label")
        .map_groups(winner, batch_format="pyarrow")
    )

    from .join import anti_join_filter

    # drop set = clustered nodes minus the per-cluster winners, computed
    # DISTRIBUTED (winners are bounded — one per cluster — but the clustered
    # NODES are O(all duplicated docs) on a heavily duplicated corpus, so no
    # driver set is ever collected; both anti-joins ride the bucketed
    # hash-join arm, which auto-broadcasts small sides anyway)
    drops = anti_join_filter(
        labels.map_batches(lambda t: t.select(["node"]),
                           batch_format="pyarrow"),
        winners, on="node", key_cols=["winner"], distributed=True,
    )
    ids = _read_docs(source, ["doc_id"])
    return anti_join_filter(
        ids, drops, on="doc_id", key_cols=["node"], distributed=True
    ).sort("doc_id")


def dedup_intradoc(source: str | ray.data.Dataset) -> ray.data.Dataset:
    """Remove WITHIN-document repeated word trigrams (the in-document
    repetition-cleaning step C4-style pipelines run before cross-document
    dedup): every trigram occurrence after the FIRST in its own document
    drops its three covered words; survivors rejoin with single spaces.
    The cross-document sibling is :func:`dedup_spans`; this one needs NO
    shuffle at all — each document resolves entirely inside its own batch,
    so the operator is one streamed ``map_batches``.

    Output: ``(doc_id, n_words, n_kept, text_clean)`` sorted by doc_id
    (whitespace-normalized for every document, like ``dedup_spans``).

    Exactness assumption: repeats are detected on 64-bit trigram hashes
    (``_tri_mix``) while the oracle compares trigram strings; as in
    ``dedup_spans`` this operator MUTATES text, so the documented
    ~n²/2⁶⁴-odds collision would corrupt output rather than misreport.
    """
    from .text import _read_docs

    ds = _read_docs(source, ["doc_id", "text"])

    def clean(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        # lowercase hashes decide duplication; original-case words rebuild
        hashes, wc = _word_hashes_batch(texts)
        words = pc.utf8_split_whitespace(texts)
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
        keep = np.ones(len(flat), bool)
        if len(hashes) >= 3:
            doc_idx = parent  # identical split contract
            tri_all = _tri_mix(hashes)
            m = doc_idx[:-2] == doc_idx[2:]  # trigram stays inside its doc
            starts = np.flatnonzero(m)
            tri = tri_all[starts]
            tdoc = doc_idx[starts]
            # later-occurrence mask per (doc, trigram), order = position
            rep = (
                pd.DataFrame({"d": tdoc, "g": tri})
                .duplicated(keep="first")
                .to_numpy()
            )
            if rep.any():
                cov = (starts[rep][:, None] + np.arange(3)[None, :]).ravel()
                keep[cov] = False
        kept_words = flat.filter(pa.array(keep))
        wcnt = np.bincount(parent, minlength=len(ids)).astype(np.int64)
        n_kept = np.zeros(len(ids), np.int64)
        np.add.at(n_kept, parent[keep], 1)
        offsets = np.concatenate(([0], np.cumsum(n_kept)))
        joined_txt = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                          kept_words),
            " ",
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(wcnt, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
                "text_clean": joined_txt,
            }
        )

    return ds.map_batches(clean, batch_format="pyarrow").sort("doc_id")
