"""Similarity search over the ``embeddings`` table (``list<float>`` column).

- ``knn_brute_force``: baseline — broadcast query vector, per-batch numpy
  matmul cosine, per-batch top-k partials, global top-k by sort+limit.  The
  shuffle carries only k rows per batch.
- ``knn_ivf``: scale path — coarse centroids (numpy k-means on a seeded
  sample, built once and broadcast via ``ray.put``), per-batch assignment,
  search restricted to the ``n_probe`` closest centroids' buckets.  Recall is
  traded for touching ~n_probe/n_centroids of the data; verified vs
  brute force in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..ops.common import round4


def _read_emb(source: str | ray.data.Dataset) -> ray.data.Dataset:
    if isinstance(source, str):
        path = source if source.endswith(".parquet") else f"{source}/embeddings.parquet"
        return ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    return source


def _batch_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(batch), -1)


def _cosine(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(norms > 0, mat @ qn / norms, 0.0)


def knn_brute_force(
    source: str | ray.data.Dataset, query: np.ndarray, k: int = 10
) -> ray.data.Dataset:
    """Top-k rows by cosine similarity to ``query`` (ties break by vec_id)."""
    q = np.asarray(query, dtype=np.float64)

    def score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        sim = _cosine(_batch_matrix(batch), q)
        # per-batch partial top-k: only k rows leave each batch
        order = np.lexsort((batch["vec_id"].to_numpy(zero_copy_only=False), -sim))[:k]
        return pa.table(
            {
                "vec_id": pa.array(batch["vec_id"].to_numpy(zero_copy_only=False)[order]),
                "sim": pa.array(round4(sim[order])),
            }
        )

    partials = _read_emb(source).map_batches(score, batch_format="pyarrow")
    return partials.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


def _kmeans(sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 13):
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cents = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def knn_ivf(
    source: str | ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_rows: int = 2048,
) -> ray.data.Dataset:
    """IVF-bucketed ANN: only rows whose nearest centroid is among the
    query's ``n_probe`` closest centroids are scored."""
    q = np.asarray(query, dtype=np.float64)
    ds = _read_emb(source)
    # one driver-side seeded sample builds the coarse quantizer; broadcast it
    sample_tbl = ds.limit(sample_rows).to_pandas()
    sample = np.stack(sample_tbl["embedding"].to_numpy()).astype(np.float64)
    cents = _kmeans(sample, n_centroids)
    cents_ref = ray.put(cents)
    probe_set = set(
        np.argsort(((cents - q) ** 2).sum(axis=1))[:n_probe].tolist()
    )

    def score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        c = ray.get(cents_ref)
        mat = _batch_matrix(batch)
        d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        mask = np.isin(assign, list(probe_set))
        if not mask.any():
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        sub = mat[mask]
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)[mask]
        sim = _cosine(sub, q)
        order = np.lexsort((ids, -sim))[:k]
        return pa.table(
            {"vec_id": pa.array(ids[order]), "sim": pa.array(round4(sim[order]))}
        )

    partials = ds.map_batches(score, batch_format="pyarrow")
    return partials.sort(["sim", "vec_id"], descending=[True, False]).limit(k)
