"""Product quantization (Jégou et al. 2011) — the compression half of
IVF-PQ ANN serving.  Vectors are split into ``m`` subspaces; each subspace
is k-means-quantized to ``2^nbits`` codes, so a d-dim float vector becomes
``m`` bytes (d=64, m=8: 32x smaller than float32).  At 100 TB the codes
table is what a serving scan reads; the float corpus is touched only by
the one-time build and the optional exact refine of a few candidates.

Search is ADC (asymmetric distance computation): per query, ONE
(m x 2^nbits) lookup table of subvector distances is built and broadcast;
per batch the approximate distance is a pure table-gather + row sum — no
float matmul against the corpus.  ``knn_pq_refined`` re-ranks each batch's
ADC survivors with exact cosine (compute pruning: exact math on ~4k/batch
candidates instead of every row).

Composes with ``build_ivf_index`` (`similarity.py`): partition by coarse
centroid for IO pruning, PQ-encode within partitions for compute/memory
pruning — classic IVF-PQ.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .similarity import _batch_matrix, _kmeans, _read_emb, _sq_dists


def train_pq(
    source: str | ray.data.Dataset,
    m: int = 8,
    nbits: int = 6,
    sample_rows: int = 4096,
    seed: int = 17,
) -> np.ndarray:
    """Codebooks of shape (m, 2^nbits, d/m) from a seeded driver-side sample
    (the same build-once pattern as the IVF coarse quantizer)."""
    ds = _read_emb(source)
    sample_tbl = ds.limit(sample_rows).to_pandas()  # bounded: sample_rows
    sample = np.stack(sample_tbl["embedding"].to_numpy()).astype(np.float64)
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, 1 << nbits, dsub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        books[j] = _kmeans(sub, 1 << nbits, seed=seed + j)
    return books


def _encode_matrix(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    m, _, dsub = books.shape
    codes = np.empty((len(mat), m), dtype=np.uint8)
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        codes[:, j] = _sq_dists(sub, books[j]).argmin(axis=1).astype(np.uint8)
    return codes


def pq_encode(
    source: str | ray.data.Dataset, books: np.ndarray
) -> ray.data.Dataset:
    """vec_id + m-byte PQ code per row (codes column: list<uint8>)."""
    ref = ray.put(books)

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "code": pa.array([], pa.list_(pa.uint8()))}
            )
        codes = _encode_matrix(_batch_matrix(t), ray.get(ref))
        arr = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (len(t) + 1) * codes.shape[1], codes.shape[1],
                               dtype=np.int32)),
            pa.array(codes.reshape(-1)),
        )
        return pa.table({"vec_id": t["vec_id"], "code": arr})

    return _read_emb(source).map_batches(fn, batch_format="pyarrow")


def _adc_table(query: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(m x 2^nbits) squared-distance lookup table for one query."""
    m, _, dsub = books.shape
    lut = np.empty((m, books.shape[1]), dtype=np.float64)
    for j in range(m):
        qs = query[j * dsub : (j + 1) * dsub][None, :]
        lut[j] = _sq_dists(qs, books[j])[0]
    return lut


def _codes_matrix(t: pa.Table) -> np.ndarray:
    col = t["code"].combine_chunks()
    m = len(col[0])
    # flatten() windows a sliced ListArray to its own values (plain .values
    # would cover the parent block and break the reshape)
    return col.flatten().to_numpy(zero_copy_only=False).reshape(len(t), m)


def knn_pq(
    codes: ray.data.Dataset,
    books: np.ndarray,
    query: np.ndarray,
    k: int = 10,
) -> ray.data.Dataset:
    """ADC top-k over a :func:`pq_encode` table: per batch one LUT gather +
    row sum, k-row partials, global sort.  Output: vec_id, adc (squared
    distance, ascending = most similar first)."""
    q = np.asarray(query, dtype=np.float64)
    lut_ref = ray.put(_adc_table(q, books))

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "adc": pa.array([], pa.float64())}
            )
        lut = ray.get(lut_ref)
        c = _codes_matrix(t)
        d = lut[np.arange(c.shape[1])[None, :], c].sum(axis=1)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        # ADC is discrete over 2^nbits codes, so k-th-boundary ties are
        # common: break by vec_id so the cut is partition-order invariant
        keep = np.lexsort((ids, d))[:k]
        return pa.table({"vec_id": pa.array(ids[keep]), "adc": pa.array(d[keep])})

    return (
        codes.map_batches(score, batch_format="pyarrow")
        .sort(["adc", "vec_id"])
        .limit(k)
    )


def knn_pq_refined(
    source: str | ray.data.Dataset,
    books: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    refine: int = 8,
) -> ray.data.Dataset:
    """PQ-pruned exact search over the float corpus: per batch, encode, rank
    by ADC, keep ``refine * k`` candidates, run exact cosine ONLY on those
    — the matmul touches refine*k rows per batch instead of all of them.
    Output matches `knn_brute_force` (vec_id, sim desc) at near-1 recall."""
    from .similarity import _cosine, _topk_round4

    q = np.asarray(query, dtype=np.float64)
    books_ref = ray.put(books)
    lut_ref = ray.put(_adc_table(q, books))

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        mat = _batch_matrix(t)
        codes = _encode_matrix(mat, ray.get(books_ref))
        lut = ray.get(lut_ref)
        d = lut[np.arange(codes.shape[1])[None, :], codes].sum(axis=1)
        cand = np.argsort(d, kind="stable")[: refine * k]
        ids = t["vec_id"].to_numpy(zero_copy_only=False)[cand]
        out_ids, out_sim = _topk_round4(ids, _cosine(mat[cand], q), k)
        return pa.table({"vec_id": pa.array(out_ids), "sim": pa.array(out_sim)})

    return (
        _read_emb(source)
        .map_batches(score, batch_format="pyarrow")
        .sort(["sim", "vec_id"], descending=[True, False])
        .limit(k)
    )
