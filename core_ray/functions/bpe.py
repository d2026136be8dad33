"""Distributed BPE training primitives over token-array columns — the
tokens-native ops a pre-tokenization pipeline runs at corpus scale:
adjacent-pair counting (the argmax step of a BPE merge round) and
vectorized merge application (greedy left-to-right, overlap-safe).

Both kernels work directly on the Arrow list<int> buffers: values + offsets,
zero row loops.  A merge ROUND is: ``pair_counts`` (one streaming pass,
per-batch partial counts, small groupby) -> pick argmax -> ``apply_merge``
(one map_batches pass).  The driver loop over rounds is control-plane only
— per round the data moves once.

Pair keys pack as ``first << 32 | second`` (int64), so the partial-count
shuffle carries 16 bytes/distinct-pair/batch, not token data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _flat(tokens: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """list<int> column -> (values int64, offsets int64), zero-copy."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    if isinstance(tokens, (pa.ListArray, pa.LargeListArray)):
        off = tokens.offsets.to_numpy().astype(np.int64)
        vals = tokens.values.to_numpy(zero_copy_only=False).astype(np.int64)
        # a sliced ListArray's values buffer covers the PARENT: window to
        # this slice and rebase, or boundary pairs outside the slice leak in
        vals = vals[off[0] : off[-1]]
        return vals, off - off[0]
    raise TypeError(f"expected a list column, got {tokens.type}")


def _valid_pair_mask(n_vals: int, offsets: np.ndarray) -> np.ndarray:
    """True at pair position p (= between values p and p+1) unless the pair
    crosses a row boundary."""
    mask = np.ones(max(n_vals - 1, 0), dtype=bool)
    ends = offsets[1:] - 1  # last value index of each row
    ends = ends[(ends >= 0) & (ends < n_vals - 1)]
    mask[ends] = False
    return mask


def text_to_byte_tokens(col: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """utf8 column -> list<int32> of raw byte values, straight off the
    string buffers (offsets reused, data viewed as uint8) — the byte-level
    tokenization every BPE vocabulary starts from, zero row loops."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type):
        off_dtype = np.int64  # large_* offsets are 64-bit
    elif pa.types.is_string(col.type) or pa.types.is_binary(col.type):
        off_dtype = np.int32
    else:
        raise TypeError(f"expected a (large_)string/binary column, got {col.type}")
    off = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    vals = data[off[0] : off[-1]].astype(np.int32)
    return pa.ListArray.from_arrays(
        pa.array(off - off[0], pa.int32()), pa.array(vals, pa.int32())
    )


def batch_pair_counts(tokens: pa.ChunkedArray | pa.Array) -> pa.Table:
    """Partial adjacent-pair counts for one batch: (pair:int64, cnt:int64)."""
    vals, off = _flat(tokens)
    if len(vals) < 2:
        return pa.table(
            {"pair": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
        )
    mask = _valid_pair_mask(len(vals), off)
    key = (vals[:-1] << np.int64(32)) | vals[1:]
    u, c = np.unique(key[mask], return_counts=True)
    return pa.table({"pair": pa.array(u), "cnt": pa.array(c.astype(np.int64))})


def pair_counts(
    ds: ray.data.Dataset, tokens_col: str = "tokens", k: int | None = None
) -> ray.data.Dataset:
    """Corpus-wide adjacent-pair counts: one streaming pass of per-batch
    partials, then a small groupby over pair keys (the only shuffled rows
    are (pair, cnt) partials).  Output: first, second, cnt — sorted by
    (cnt DESC, first, second), optionally cut to top-``k``."""
    partial = ds.map_batches(
        lambda t: batch_pair_counts(t[tokens_col]), batch_format="pyarrow"
    )
    summed = partial.groupby("pair").sum("cnt")

    def unpack(t: pa.Table) -> pa.Table:
        p = t["pair"].to_numpy(zero_copy_only=False)
        c = t["sum(cnt)"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "first": pa.array(p >> np.int64(32)),
                "second": pa.array(p & np.int64(0xFFFFFFFF)),
                "cnt": pa.array(c.astype(np.int64)),
            }
        )

    out = summed.map_batches(unpack, batch_format="pyarrow").sort(
        ["cnt", "first", "second"], descending=[True, False, False]
    )
    return out.limit(k) if k is not None else out


def top_pair(ds: ray.data.Dataset, tokens_col: str = "tokens") -> tuple[int, int, int]:
    """The argmax pair of one merge round (ties break by smallest ids)."""
    row = pair_counts(ds, tokens_col, k=1).take(1)
    if not row:
        raise ValueError("no pairs in corpus")
    r = row[0]
    return int(r["first"]), int(r["second"]), int(r["cnt"])


def merge_values(
    vals: np.ndarray, off: np.ndarray, first: int, second: int, new_id: int
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right merge on flat buffers.  Overlap rule (matters
    only when first == second, e.g. AAAA + (A,A)): within each run of
    consecutive match positions, accept alternating positions from the run
    head — exactly what a sequential scan does."""
    n = len(vals)
    if n < 2:
        return vals, off
    mask = _valid_pair_mask(n, off)
    m = np.nonzero(mask & (vals[:-1] == first) & (vals[1:] == second))[0]
    if len(m) == 0:
        return vals, off
    # runs of consecutive positions -> accept every other from the head
    run_start = np.ones(len(m), dtype=bool)
    run_start[1:] = np.diff(m) != 1
    run_id = np.cumsum(run_start) - 1
    first_idx_of_run = np.nonzero(run_start)[0][run_id]
    accept = ((np.arange(len(m)) - first_idx_of_run) % 2) == 0
    acc = m[accept]
    out = vals.copy()
    out[acc] = new_id
    keep = np.ones(n, dtype=bool)
    keep[acc + 1] = False
    # new offsets: shift each boundary left by the merges before it
    removed_before = np.searchsorted(acc + 1, off, side="left")
    return out[keep], off - removed_before


def merge_table(
    t: pa.Table, first: int, second: int, new_id: int, tokens_col: str
) -> pa.Table:
    """One merge applied to one Arrow table (shared by the Dataset pass and
    the raw-task training path)."""
    col = t[tokens_col]
    vt = col.type.value_type  # preserve the input's value dtype
    vals, off = _flat(col)
    nv, no = merge_values(vals, off, first, second, new_id)
    arr = pa.ListArray.from_arrays(
        pa.array(no, pa.int32()), pa.array(nv, pa.int64()).cast(vt)
    )
    i = t.schema.get_field_index(tokens_col)
    return t.set_column(i, pa.field(tokens_col, arr.type), arr)


def apply_merge(
    ds: ray.data.Dataset,
    first: int,
    second: int,
    new_id: int,
    tokens_col: str = "tokens",
) -> ray.data.Dataset:
    """One map_batches pass replacing every greedy (first, second) occurrence
    with ``new_id`` inside each row's token array."""
    return ds.map_batches(
        lambda t: merge_table(t, first, second, new_id, tokens_col),
        batch_format="pyarrow",
    )


def bpe_train(
    ds: ray.data.Dataset,
    n_merges: int,
    first_new_id: int = 256,
    tokens_col: str = "tokens",
) -> tuple[pa.Table, ray.data.Dataset]:
    """Full BPE training run: ``n_merges`` rounds of count -> argmax ->
    merge (ties break by smallest (first, second), matching a sequential
    trainer over sorted pair keys).  Returns ``(merge_table, final_ds)``:
    the learned merge table (rank, first, second, new_id, cnt — cnt is the
    pair's corpus frequency at selection time) and the corpus re-tokenized
    with every merge applied.

    Scale shape: per round the corpus streams twice — one counting pass
    whose shuffle carries only (pair, cnt) partials (16 bytes per distinct
    pair per batch, never token data) and one map_batches merge pass.  The
    argmax is a k=1 fetch of the bounded distinct-pair table; the merge
    table itself is vocabulary-sized and driver-resident by design.  The
    working set is re-materialized per round so round r+1 doesn't
    re-execute rounds 0..r.
    """
    import ray

    rows: list[tuple[int, int, int, int]] = []
    # Raw-task rounds over pinned blocks: a Dataset execution per round
    # (count pass + merge materialize) pays seconds of fixed driver
    # overhead x n_merges for identical work.  Blocks stay in the object
    # store; each round is one task wave counting pairs (partials merged
    # on the driver — bounded by distinct adjacent pairs, vocabulary-sized)
    # and one task wave applying the merge.  Falls back to the streaming
    # Dataset path when the corpus is big enough that per-round execution
    # overhead stops mattering (and driver pair merges could grow).
    mat = ds.materialize()  # the round loop re-reads the corpus either way
    use_blocks = mat.count() <= 2_000_000  # free on materialized data
    if use_blocks:
        block_refs = list(mat.to_arrow_refs())

        @ray.remote
        def count_block(block: pa.Table):
            t = batch_pair_counts(block[tokens_col])
            return (
                t["pair"].to_numpy(zero_copy_only=False),
                t["cnt"].to_numpy(zero_copy_only=False),
            )

        @ray.remote
        def merge_block(block: pa.Table, f: int, s: int, nid: int):
            return merge_table(block, f, s, nid, tokens_col)

        for r in range(n_merges):
            parts = ray.get([count_block.remote(b) for b in block_refs])
            if not parts:
                break
            pairs = np.concatenate([p for p, _ in parts])
            cnts = np.concatenate([c for _, c in parts])
            if not len(pairs):
                break
            u, inv = np.unique(pairs, return_inverse=True)
            tot = np.zeros(len(u), dtype=np.int64)
            np.add.at(tot, inv, cnts)
            # argmax cnt, ties to the smallest packed pair == smallest
            # (first, second) lexicographically — same rule as pair_counts
            best = np.lexsort((u, -tot))[0]
            f = int(u[best] >> np.int64(32))
            s = int(u[best] & np.int64(0xFFFFFFFF))
            c = int(tot[best])
            nid = first_new_id + r
            rows.append((r, f, s, nid, c))
            block_refs = [merge_block.remote(b, f, s, nid) for b in block_refs]
        cur = ray.data.from_arrow_refs(block_refs)
    else:
        cur = mat
        for r in range(n_merges):
            top = pair_counts(cur, tokens_col, k=1).take(1)
            if not top:
                break
            f, s, c = int(top[0]["first"]), int(top[0]["second"]), int(top[0]["cnt"])
            nid = first_new_id + r
            rows.append((r, f, s, nid, c))
            cur = apply_merge(cur, f, s, nid, tokens_col).materialize()
    table = pa.table(
        {
            "rank": pa.array([r[0] for r in rows], pa.int64()),
            "first": pa.array([r[1] for r in rows], pa.int64()),
            "second": pa.array([r[2] for r in rows], pa.int64()),
            "new_id": pa.array([r[3] for r in rows], pa.int64()),
            "cnt": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    return table, cur


def train_merges(
    ds: ray.data.Dataset,
    n_merges: int,
    first_new_id: int,
    tokens_col: str = "tokens",
) -> list[tuple[int, int, int]]:
    """Run ``n_merges`` BPE rounds; returns [(first, second, new_id), ...].
    Thin view over :func:`bpe_train` for callers that only need the merge
    rules."""
    tbl, _ = bpe_train(ds, n_merges, first_new_id, tokens_col)
    return list(
        zip(
            tbl["first"].to_pylist(),
            tbl["second"].to_pylist(),
            tbl["new_id"].to_pylist(),
        )
    )
