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
import pyarrow.compute as pc

import ray
import ray.data

from ..ops.common import round4


def _read_emb(source: str | ray.data.Dataset) -> ray.data.Dataset:
    if isinstance(source, str):
        path = source if source.endswith(".parquet") else f"{source}/embeddings.parquet"
        return ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    return source


def _seed_rows(source: str | ray.data.Dataset, n: int) -> list[dict]:
    """The deterministic seed head (``vec_id < n``), sorted by vec_id.

    Path inputs push the predicate into the parquet scan (row groups with
    ``min(vec_id) >= n`` never leave storage); Dataset inputs apply a
    vectorized ``pc.less`` mask in ``map_batches`` — never a per-row Python
    ``ds.filter(lambda …)`` scan."""
    if isinstance(source, str):
        import pyarrow.dataset as pads

        path = (
            source if source.endswith(".parquet")
            else f"{source}/embeddings.parquet"
        )
        head = ray.data.read_parquet(
            path,
            columns=["vec_id", "embedding"],
            filter=pads.field("vec_id") < n,
        )
    else:

        def mask(t: pa.Table) -> pa.Table:
            return t.filter(pc.less(t["vec_id"], n))

        head = source.map_batches(mask, batch_format="pyarrow")
    rows = head.take_all()  # bounded: n rows
    rows.sort(key=lambda r: r["vec_id"])
    return rows


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


def _topk_round4(ids: np.ndarray, sim_raw: np.ndarray, k: int):
    """Round-then-rank, paying the oracle-parity round_even kernel only on the
    survivors: round_even(x, 4) moves a value by at most 5e-5, so every row
    that could round into the k-th kept bucket has unrounded sim within 1e-4
    of the k-th largest unrounded sim.  Rows below that margin are strictly
    dominated by >= k kept rows in rounded value, tie-breaks included."""
    if len(sim_raw) > k:
        kth = np.partition(sim_raw, -k)[-k]
        mask = sim_raw >= kth - 1e-4
        ids, sim_raw = ids[mask], sim_raw[mask]
    sim = round4(sim_raw)
    order = np.lexsort((ids, -sim))[:k]
    return ids[order], sim[order]


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
        sim_raw = _cosine(_batch_matrix(batch), q)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        # per-batch partial top-k: only k rows leave each batch
        out_ids, out_sim = _topk_round4(ids, sim_raw, k)
        return pa.table({"vec_id": pa.array(out_ids), "sim": pa.array(out_sim)})

    partials = _read_emb(source).map_batches(score, batch_format="pyarrow")
    return partials.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


def knn_multi(
    source: str | ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray | list | None = None,
    k: int = 10,
) -> ray.data.Dataset:
    """Batched ANN baseline: top-k by cosine for a whole QUERY MATRIX in one
    corpus pass.  ``queries`` is (m, dim); the normalized matrix is broadcast
    once via ``ray.put`` and every batch does a single (n, dim) x (dim, m)
    matmul — m queries cost one scan, not m scans.  Per batch only m*k
    partial rows leave; a tiny per-query group merge picks the global top-k
    (rank by 4-dp-rounded sim, ties by vec_id — same contract as
    ``knn_brute_force``).  Output: (query_id, vec_id, sim).
    """
    import pandas as pd

    Q = np.asarray(queries, dtype=np.float64)
    qids = np.arange(len(Q), dtype=np.int64) if query_ids is None else np.asarray(
        query_ids, dtype=np.int64
    )
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        mat = _batch_matrix(batch)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = np.inf  # zero rows score 0 against every query
        sims = (mat / norms[:, None]) @ ray.get(q_ref).T  # (n, m)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        out_q, out_i, out_s = [], [], []
        for j in range(sims.shape[1]):  # m is small; inner work is vectorized
            ki, ks = _topk_round4(ids, sims[:, j], k)
            out_q.append(np.full(len(ki), qids[j], dtype=np.int64))
            out_i.append(ki)
            out_s.append(ks)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_i).astype(np.int64)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    partials = _read_emb(source).map_batches(score, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        return g[["query_id", "vec_id", "sim"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def _sq_dists(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Squared distances via the norm expansion ||a||^2 - 2ab + ||b||^2 —
    O(n*c) memory (matmul), never the O(n*c*dim) broadcast tensor."""
    x2 = (x * x).sum(axis=1)[:, None]
    c2 = (cents * cents).sum(axis=1)[None, :]
    return x2 - 2.0 * (x @ cents.T) + c2


def _kmeans(sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 13):
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cents = sample[idx].copy()
    for _ in range(iters):
        assign = _sq_dists(sample, cents).argmin(axis=1)
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
    sample_tbl = ds.limit(sample_rows).to_pandas()  # bounded: sample_rows
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
        assign = _sq_dists(mat, c).argmin(axis=1)
        mask = np.isin(assign, list(probe_set))
        if not mask.any():
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        sub = mat[mask]
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)[mask]
        out_ids, out_sim = _topk_round4(ids, _cosine(sub, q), k)
        return pa.table({"vec_id": pa.array(out_ids), "sim": pa.array(out_sim)})

    partials = ds.map_batches(score, batch_format="pyarrow")
    return partials.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


def build_ivf_index(
    source: str | ray.data.Dataset,
    index_dir: str,
    n_centroids: int = 16,
    sample_rows: int = 2048,
    seed: int = 13,
) -> np.ndarray:
    """Persisted IVF layout: coarse k-means centroids from a seeded sample,
    then the corpus written hive-partitioned by nearest centroid
    (``data/centroid=<c>/``) alongside the centroid matrix
    (``centroids.parquet``).  This is the structure that makes ANN serving
    IO-pruned at scale: a query reads only its ``n_probe`` partitions'
    bytes instead of scanning (and assigning) the whole corpus per query.
    Build once, serve many — the build is the only full scan."""
    import os

    import pyarrow.parquet as pq

    ds = _read_emb(source)
    sample_tbl = ds.limit(sample_rows).to_pandas()  # bounded: sample_rows
    sample = np.stack(sample_tbl["embedding"].to_numpy()).astype(np.float64)
    cents = _kmeans(sample, n_centroids, seed=seed)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("centroid", pa.array([], pa.int32()))
        a = _sq_dists(_batch_matrix(batch), ray.get(cents_ref)).argmin(axis=1)
        return batch.append_column("centroid", pa.array(a.astype(np.int32)))

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "data"), partition_cols=["centroid"]
    )
    pq.write_table(
        pa.table({"centroid": pa.array(range(len(cents)), pa.int32()),
                  "embedding": pa.array(list(cents))}),
        os.path.join(index_dir, "centroids.parquet"),
    )
    return cents


def load_ivf_centroids(index_dir: str) -> np.ndarray:
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    return np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)


def knn_ivf_indexed(
    index_dir: str, query: np.ndarray, k: int = 10, n_probe: int = 4
) -> ray.data.Dataset:
    """Serve ANN from a :func:`build_ivf_index` layout: pick the query's
    ``n_probe`` nearest centroids from the (tiny) persisted centroid table,
    then ``read_parquet`` ONLY those partitions — IO cost is
    ~n_probe/n_centroids of the corpus, not a full scan."""
    import os

    q = np.asarray(query, dtype=np.float64)
    cents = load_ivf_centroids(index_dir)
    probe = np.argsort(((cents - q) ** 2).sum(axis=1))[:n_probe].tolist()
    # pyarrow's dataset() treats a LIST of paths as files, so expand each
    # probed partition dir to its parquet files explicitly
    paths = [
        os.path.join(p, f)
        for c in probe
        if os.path.isdir(p := os.path.join(index_dir, "data", f"centroid={c}"))
        for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
    ]
    if not paths:
        return ray.data.from_items([]).map_batches(
            lambda b: pa.table({"vec_id": pa.array([], pa.int64()),
                                "sim": pa.array([], pa.float64())}),
            batch_format="pyarrow",
        )
    ds = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    return knn_brute_force(ds, q, k=k)


def cosine_dup_pairs(
    source: str | ray.data.Dataset,
    threshold: float = 0.95,
    n_planes: int = 32,
    bands: int = 4,
    seed: int = 23,
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs: random-hyperplane LSH blocking
    (sign signature over ``n_planes`` seeded gaussian planes, split into
    ``bands`` exact-match bands) followed by EXACT cosine verification inside
    each bucket.  Only (vec_id, signature, embedding) rows shuffle.

    Recall note: a pair at cosine c collides on one band with probability
    1-(1-p^r)^b for p = 1 - arccos(c)/pi; at c>=0.95 and 4x8-bit bands this
    is >0.99."""
    import pandas as pd

    from ..ops.common import bucketed_distinct, collision_grouped_map

    rng = np.random.default_rng(seed)
    ds = _read_emb(source)
    sample = ds.limit(1).to_pandas()  # bounded: one row (dim probe)
    dim = len(sample["embedding"].iloc[0])
    planes = rng.normal(size=(dim, n_planes))
    planes_ref = ray.put(planes)
    bits_per_band = n_planes // bands

    def sig(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int32()),
                    "key": pa.array([], pa.uint64()),
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], batch.schema.field("embedding").type),
                }
            )
        p = ray.get(planes_ref)
        mat = _batch_matrix(batch)
        bits = (mat @ p) > 0  # (n, n_planes)
        out_band, out_key, out_id, out_emb = [], [], [], []
        ids = batch["vec_id"]
        for b in range(bands):
            seg = bits[:, b * bits_per_band : (b + 1) * bits_per_band]
            key = (seg * (1 << np.arange(bits_per_band, dtype=np.uint64))).sum(axis=1)
            out_band.append(np.full(len(mat), b, dtype=np.int32))
            out_key.append(key.astype(np.uint64))
            out_id.append(ids)
            out_emb.append(batch["embedding"])
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band)),
                "key": pa.array(np.concatenate(out_key), pa.uint64()),
                "vec_id": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_id]
                ),
                "embedding": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_emb]
                ),
            }
        )

    exploded = ds.map_batches(sig, batch_format="pyarrow")

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        cos = unit @ unit.T
        # vectorized upper-triangle extraction + ONE round4 kernel call (the
        # per-pair loop invoked the DuckDB rounding kernel once per pair)
        iu, ju = np.triu_indices(len(ids), k=1)
        c = cos[iu, ju]
        keep = c >= threshold
        iu, ju, c = iu[keep], ju[keep], c[keep]
        return pd.DataFrame(
            {
                "vec_a": ids[iu].astype(np.int64),
                "vec_b": ids[ju].astype(np.int64),
                "cosine": round4(c),
            }
        )

    pairs = collision_grouped_map(exploded, ["band", "key"], bucket)
    return bucketed_distinct(pairs, ["vec_a", "vec_b"], ["vec_a", "vec_b", "cosine"])


def dedup_semantic(
    source: str | ray.data.Dataset,
    threshold: float = 0.45,
    n_planes: int = 32,
    bands: int = 4,
    seed: int = 23,
    distributed_components: bool | None = None,
) -> ray.data.Dataset:
    """Semantic (embedding-space) dedup of the corpus: near-duplicate pairs
    from ``cosine_dup_pairs`` (hyperplane-LSH blocked, exact cosine verified)
    feed connected components; the minimum vec_id of each duplicate component
    survives.  This is the SemDeDup-shaped "keep one representative per
    semantic cluster" operator; returns the kept ``vec_id`` rows.

    ``distributed_components=None`` (default) auto-switches on the actual
    pair count, exactly like :func:`core_ray.functions.dedup.dedup_near`:
    distributed min-label components + hash-join keep-filter above
    ``COMPONENTS_DRIVER_MAX_PAIRS`` (nothing reaches the driver), the
    union-find shortcut below it.  Pass True/False to force an arm.
    """
    from .dedup import (COMPONENTS_DRIVER_MAX_PAIRS, component_drop_ids,
                        component_labels_distributed)

    pairs = cosine_dup_pairs(
        source, threshold=threshold, n_planes=n_planes, bands=bands, seed=seed
    )
    if distributed_components is None:
        pairs = pairs.materialize()
        distributed_components = pairs.count() > COMPONENTS_DRIVER_MAX_PAIRS
    if isinstance(source, str):
        path = source if source.endswith(".parquet") else f"{source}/embeddings.parquet"
        ids = ray.data.read_parquet(path, columns=["vec_id"])
    else:
        ids = source.select_columns(["vec_id"])

    if distributed_components:
        from .join import hash_join

        labels = component_labels_distributed(
            pairs, a="vec_a", b="vec_b"
        ).map_batches(
            lambda t: t.rename_columns(["vec_id", "label"]),
            batch_format="pyarrow",
        )
        joined = hash_join(ids, labels, on="vec_id", how="left")

        def keep_joined(batch: pa.Table) -> pa.Table:
            lbl = batch["label"]
            mask = pc.or_kleene(pc.is_null(lbl), pc.equal(lbl, batch["vec_id"]))
            return batch.filter(pc.fill_null(mask, True)).select(["vec_id"])

        return joined.map_batches(keep_joined, batch_format="pyarrow")

    drops = component_drop_ids(pairs, a="vec_a", b="vec_b")
    drops_ref = ray.put(pa.array(drops, pa.int64()))

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch["vec_id"], value_set=ray.get(drops_ref)))
        return batch.filter(mask)

    return ids.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# clustering: assignment (E-step) and distributed Lloyd iterations
# ---------------------------------------------------------------------------


def cluster_assign(
    source: str | ray.data.Dataset,
    n_clusters: int = 8,
    centroids: np.ndarray | None = None,
    centroid_ids: np.ndarray | None = None,
) -> ray.data.Dataset:
    """Nearest-centroid assignment by cosine similarity — the E-step of
    distributed k-means and the routing step of SemDeDup-style semantic
    clustering / the persisted IVF layout.  With ``centroids=None`` the
    centroid set is the embeddings with ``vec_id < n_clusters`` — a
    deterministic, SQL-reproducible choice that makes the whole assignment
    exactly oracle-checkable (``list_cosine_similarity`` + ``round_even``
    on the oracle side, the same ``_cosine``+``round4`` kernel pair the
    green ``emb_knn`` query uses).

    Ties after 4-dp rounding go to the SMALLEST centroid id (the oracle's
    ``ORDER BY sim DESC, cid``).  Scale shape: the k x dim centroid matrix
    broadcasts once via ``ray.put``; assignment is a pure streamed
    ``map_batches`` — one matmul per batch, no shuffle, no state.

    Output: ``(vec_id, centroid_id, sim)`` sorted by vec_id.
    """
    ds = _read_emb(source)
    if centroids is None:
        rows = _seed_rows(source, n_clusters)
        centroid_ids = np.array([r["vec_id"] for r in rows], np.int64)
        centroids = np.array([r["embedding"] for r in rows], np.float64)
    else:
        centroids = np.asarray(centroids, np.float64)
        if centroid_ids is None:
            centroid_ids = np.arange(len(centroids), dtype=np.int64)
    cents_ref = ray.put((centroid_ids, centroids))

    def assign(batch: pa.Table) -> pa.Table:
        cids, cents = ray.get(cents_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _batch_matrix(batch)
        # same per-centroid _cosine kernel as emb_knn, then ONE round4 call
        # over the n x k block (columns are centroid-id ascending, so
        # argmax's first-max rule IS the smallest-cid tiebreak)
        sims = np.stack([_cosine(mat, c) for c in cents], axis=1)
        sims = round4(sims.reshape(-1)).reshape(sims.shape)
        best = sims.argmax(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "centroid_id": pa.array(cids[best], pa.int64()),
                "sim": pa.array(sims[np.arange(len(ids)), best], pa.float64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow").sort("vec_id")


def kmeans_fit(
    source: str | ray.data.Dataset,
    n_clusters: int = 8,
    iters: int = 10,
    tol: float = 0.0,
) -> tuple[np.ndarray, float]:
    """DISTRIBUTED Lloyd iterations (contrast ``_kmeans``, which fits on a
    driver-side sample for IVF seeding): every iteration is one streamed
    pass over the full dataset emitting per-batch sufficient statistics —
    a ``(k, dim)`` member-sum matrix, a ``k`` count vector and the batch
    inertia — which a bounded reduce merges on the driver (k x dim floats,
    never rows).  Initial centroids are the deterministic
    ``vec_id < n_clusters`` head, so runs are reproducible across
    partitionings and cluster sizes.

    Euclidean objective (the standard k-means inertia); empty clusters keep
    their previous centroid.  Returns ``(centroids, inertia)``.  Iterative
    float refinement is inherently not SQL-expressible — pytest-gated, like
    ``DataBinning``; the assignment STEP is the oracle-checked
    :func:`cluster_assign`.
    """
    ds = _read_emb(source)
    head = _seed_rows(source, n_clusters)
    cents = np.array([r["embedding"] for r in head], np.float64)
    if len(cents) < n_clusters:
        raise ValueError(f"need vec_ids 0..{n_clusters - 1} present for init")
    inertia = np.inf
    for _ in range(iters):
        cents_ref = ray.put(cents)

        def stats(batch: pa.Table) -> pa.Table:
            c = ray.get(cents_ref)
            mat = _batch_matrix(batch)
            d = _sq_dists(mat, c)
            a = d.argmin(axis=1)
            k, dim = c.shape
            sums = np.zeros((k, dim))
            np.add.at(sums, a, mat)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            err = float(d[np.arange(len(mat)), a].sum())
            return pa.table(
                {
                    "cid": pa.array(np.arange(k), pa.int64()),
                    "sum": pa.array(list(sums), pa.list_(pa.float64())),
                    "cnt": pa.array(cnt, pa.int64()),
                    "err": pa.array([err] + [0.0] * (k - 1), pa.float64()),
                }
            )

        parts = ds.map_batches(stats, batch_format="pyarrow").to_pandas()  # bounded: centroid partials
        sums = np.zeros_like(cents)
        cnts = np.zeros(len(cents), np.int64)
        new_inertia = float(parts["err"].sum())
        g = parts.groupby("cid")
        for cid, sub in g:
            sums[int(cid)] = np.sum(np.stack(sub["sum"].to_numpy()), axis=0)
            cnts[int(cid)] = int(sub["cnt"].sum())
        nz = cnts > 0
        cents[nz] = sums[nz] / cnts[nz, None]
        if inertia - new_inertia <= tol and np.isfinite(inertia):
            inertia = new_inertia
            break
        inertia = new_inertia
    return cents, inertia


def knn_filtered(
    source: str | ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    label: int | None = None,
) -> ray.data.Dataset:
    """FILTERED vector search: top-k by cosine among rows matching a
    metadata predicate (``label == value``) — pre-filter semantics (the
    predicate prunes BEFORE ranking, so exactly k matching rows return; a
    post-filter over unfiltered top-k would under-deliver).  The predicate
    is pushed into the parquet scan as a row-group filter when the source
    is a path, so non-matching row groups never leave storage; otherwise a
    vectorized Arrow filter runs before scoring.  Same per-batch partial
    top-k shape as :func:`knn_brute_force`."""
    q = np.asarray(query, dtype=np.float64)
    if isinstance(source, str):
        import pyarrow.dataset as pads

        path = (
            source if source.endswith(".parquet")
            else f"{source}/embeddings.parquet"
        )
        kwargs = {}
        if label is not None:
            kwargs["filter"] = pads.field("label") == label
        ds = ray.data.read_parquet(
            path, columns=["vec_id", "embedding", "label"], **kwargs
        )
    else:
        ds = source
        if label is not None:
            ds = ds.map_batches(
                lambda t: t.filter(pc.equal(t["label"], label)),
                batch_format="pyarrow",
            )

    def score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        sim_raw = _cosine(_batch_matrix(batch), q)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        out_ids, out_sim = _topk_round4(ids, sim_raw, k)
        return pa.table({"vec_id": pa.array(out_ids), "sim": pa.array(out_sim)})

    partials = ds.map_batches(score, batch_format="pyarrow")
    return partials.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


def cluster_outliers(
    source: str | ray.data.Dataset,
    n_clusters: int = 8,
    threshold: float = 0.1,
) -> ray.data.Dataset:
    """Embedding OUTLIER report: rows whose best (4-dp-rounded) cosine to
    every centroid is below ``threshold`` — "far from all clusters", the
    SemDeDup-complement that surfaces junk/noise/out-of-domain vectors for
    manual review or exclusion.  Pure composition over
    :func:`cluster_assign` (same broadcast centroid set and streamed
    matmul), with a vectorized filter on the winning similarity."""

    assigned = cluster_assign(source, n_clusters=n_clusters)
    return assigned.map_batches(
        lambda t: t.filter(pc.less(t["sim"], threshold)),
        batch_format="pyarrow",
    )


def label_centroid_sums(
    source: str | ray.data.Dataset,
) -> ray.data.Dataset:
    """EXACT per-label embedding centroid statistics: for every (label,
    dimension), the count of vectors and the sum of the dimension's values
    scaled to int64 (``round_even(x * 1e6)`` per element, the scaled-
    integer discipline) — so the distributed vector aggregate is
    order-independent and bitwise SQL-reproducible where a float vector
    sum is not (reassociation).  Centroid = ``sum_e6 / (n_vecs * 1e6)``
    downstream at whatever precision the consumer wants.

    Scale shape: each batch reduces to one (labels x dim) partial-sum
    matrix (``np.add.at`` over the flat value buffer), so the shuffle
    moves ``labels x dim`` ints per batch, never vectors.

    Output: ``(label, dim, sum_e6, n_vecs)`` sorted by (label, dim),
    0-based dims.
    """
    if isinstance(source, str):
        path = (source if source.endswith(".parquet")
                else f"{source}/embeddings.parquet")
        ds = ray.data.read_parquet(path, columns=["label", "embedding"])
    else:
        ds = source

    from .dedup import _duckdb_hash_con

    def partial(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch)  # float64, exact widening from float32
        n, dim = mat.shape
        con = _duckdb_hash_con()
        con.register("_cent_in", pa.table({"v": pa.array(mat.ravel())}))
        xe = con.execute(
            "SELECT CAST(round_even(v * 1000000.0, 0) AS BIGINT) AS e"
            " FROM _cent_in"
        ).fetch_arrow_table()["e"].to_numpy(zero_copy_only=False)
        con.unregister("_cent_in")
        labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dim), np.int64)
        np.add.at(sums, inv, xe.reshape(n, dim))
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        lab_rep = np.repeat(uniq, dim)
        dim_rep = np.tile(np.arange(dim, dtype=np.int64), len(uniq))
        return pa.table(
            {
                "label": pa.array(lab_rep, pa.int64()),
                "dim": pa.array(dim_rep, pa.int64()),
                "sum_e6": pa.array(sums.ravel(), pa.int64()),
                "n": pa.array(np.repeat(cnt, dim), pa.int64()),
            }
        )

    def emit(t: pa.Table) -> pa.Table:
        return t.rename_columns(["label", "dim", "sum_e6", "n_vecs"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .sum(["sum_e6", "n"])
        .map_batches(emit, batch_format="pyarrow")
        .sort(["label", "dim"])
    )


# ---------------------------------------------------------------------------
# incremental embedding-novelty screen over a persisted reference IVF index
# ---------------------------------------------------------------------------

_NOVEL_META = "_novel_meta.json"


def build_ref_ivf_index(
    source: str | ray.data.Dataset,
    index_dir: str,
    ref_mod: int = 5,
    n_centroids: int = 16,
    sample_rows: int = 2048,
    seed: int = 13,
) -> np.ndarray:
    """IVF index over the REFERENCE slice (``vec_id % ref_mod == 0``) — the
    embedding analog of :func:`core_ray.functions.dedup.build_minhash_index`:
    yesterday's corpus is indexed once (hive-partitioned by nearest
    centroid), and every ingest epoch probes the index instead of
    re-scanning the reference."""
    import json
    import os

    ds = _read_emb(source)

    def ref_only(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % ref_mod == 0))

    cents = build_ivf_index(
        ds.map_batches(ref_only, batch_format="pyarrow"),
        index_dir,
        n_centroids=n_centroids,
        sample_rows=sample_rows,
        seed=seed,
    )
    with open(os.path.join(index_dir, _NOVEL_META), "w") as f:
        json.dump({"ref_mod": ref_mod, "n_centroids": int(len(cents))}, f)
    return cents


def emb_novel(
    source: str | ray.data.Dataset,
    index_dir: str,
    threshold: float = 0.45,
    n_probe: int = 4,
) -> ray.data.Dataset:
    """Incremental semantic-novelty screening: flag which of today's vectors
    (``vec_id % ref_mod != 0``) are novel vs the persisted reference IVF
    index — each ingest vector probes its ``n_probe`` nearest centroids'
    partitions and is exact-cosine verified against ONLY the reference
    vectors there (the ``minhash_novel`` discipline in embedding space).

    Recall note (honest, like ``emb_knn_ivf``): with ``n_probe`` < the
    centroid count a true near-dup lying in an unprobed partition is
    missed — continuous embedding space admits no inverted-index recall-1
    trick.  The exhaustive twin :func:`emb_novel_full` probes EVERY
    partition through this same code path and is exactly
    oracle-checkable; a recall pytest bounds the probed arm.

    Fully distributed shape: ingest probe rows (n_probe per vector, ints +
    one embedding copy) union the pruned index partitions; one
    ``centroid``-grouped screen does a per-partition normalized matmul and
    emits only HIT ids (bounded: ingest vectors with a reference near-dup),
    which broadcast once for the final flag pass.  Neither side is ever
    collected wholesale.
    """
    import json
    import os

    import pandas as pd

    with open(os.path.join(index_dir, _NOVEL_META)) as f:
        meta = json.load(f)
    ref_mod = int(meta["ref_mod"])
    cents = load_ivf_centroids(index_dir)
    n_probe = min(int(n_probe), len(cents))
    cents_ref = ray.put(cents)
    ds = _read_emb(source)

    def today_only(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % ref_mod != 0))

    today = ds.map_batches(today_only, batch_format="pyarrow")

    def probe_rows(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "centroid": pa.array([], pa.int32()),
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], t.schema.field("embedding").type),
                    "side": pa.array([], pa.int8()),
                }
            )
        mat = _batch_matrix(t)
        d = _sq_dists(mat, ray.get(cents_ref))
        probe = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
        n = len(t)
        idx = np.repeat(np.arange(n), n_probe)
        return pa.table(
            {
                "centroid": pa.array(probe.reshape(-1).astype(np.int32)),
                "vec_id": pc.take(t["vec_id"], pa.array(idx)),
                "embedding": pc.take(t["embedding"], pa.array(idx)),
                "side": pa.array(np.ones(n * n_probe, np.int8)),
            }
        )

    probes = today.map_batches(probe_rows, batch_format="pyarrow").materialize()

    # pruned index read: only the partitions some ingest vector probes
    probed = sorted(
        int(r["centroid"])
        for r in probes.groupby("centroid").count().take_all()
    )  # bounded: <= n_centroids
    paths = []
    for c in probed:
        p = os.path.join(index_dir, "data", f"centroid={c}")
        if os.path.isdir(p):
            paths.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            )

    hit_ref = None
    if paths:

        def flag_ref(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "centroid": t["centroid"].cast(pa.int32()),
                    "vec_id": t["vec_id"],
                    "embedding": t["embedding"],
                    "side": pa.array(np.zeros(len(t), np.int8)),
                }
            )

        idx = ray.data.read_parquet(
            paths, columns=["centroid", "vec_id", "embedding"]
        ).map_batches(flag_ref, batch_format="pyarrow")
        tagged = idx.union(probes)

        def screen(g: pd.DataFrame) -> pd.DataFrame:
            r = g[g["side"] == 0]
            n = g[g["side"] == 1]
            if not len(r) or not len(n):
                return pd.DataFrame({"nid": pd.Series([], dtype="int64")})
            rmat = np.stack(r["embedding"].to_numpy()).astype(np.float64)
            nmat = np.stack(n["embedding"].to_numpy()).astype(np.float64)
            rn = np.linalg.norm(rmat, axis=1)
            nn = np.linalg.norm(nmat, axis=1)
            rn[rn == 0] = 1.0
            nn[nn == 0] = 1.0
            sims = (nmat / nn[:, None]) @ (rmat / rn[:, None]).T
            hit = (sims >= threshold).any(axis=1)
            return pd.DataFrame(
                {"nid": pd.Series(
                    pd.unique(n["vec_id"].to_numpy()[hit]), dtype="int64")}
            )

        hit_ids = sorted(
            {int(r["nid"]) for r in
             tagged.groupby("centroid")
             .map_groups(screen, batch_format="pandas")
             .take_all()}
        )  # bounded: ingest vectors with a verified reference near-dup
        if hit_ids:
            hit_ref = ray.put(pa.array(hit_ids, pa.int64()))

    def emit(t: pa.Table) -> pa.Table:
        ids = t["vec_id"]
        if hit_ref is None:
            novel = pa.array(np.ones(len(t), bool))
        else:
            novel = pc.invert(pc.is_in(ids, value_set=ray.get(hit_ref)))
        return pa.table({"vec_id": ids, "novel": novel})

    return (
        today.map_batches(lambda t: t.select(["vec_id"]),
                          batch_format="pyarrow")
        .map_batches(emit, batch_format="pyarrow")
        .sort("vec_id")
    )


def emb_novel_full(
    source: str | ray.data.Dataset,
    index_dir: str,
    threshold: float = 0.45,
) -> ray.data.Dataset:
    """Exhaustive-probe twin of :func:`emb_novel`: every partition is
    probed, so every (reference, ingest) pair is compared — recall 1,
    exactly oracle-checkable, same code path."""
    cents = load_ivf_centroids(index_dir)
    return emb_novel(source, index_dir, threshold=threshold,
                     n_probe=len(cents))


# ---------------------------------------------------------------------------
# product quantization: the compressed-domain ANN scale path
# ---------------------------------------------------------------------------


def _e6_ints(arr: np.ndarray) -> np.ndarray:
    """round_even(x * 1e6) as int64 BY the in-process DuckDB kernel — the
    scaled-integer discipline (label_centroid_sums), so every distance
    computed from these ints is bitwise SQL-reproducible."""
    from .dedup import _duckdb_hash_con

    con = _duckdb_hash_con()
    con.register("_e6_in", pa.table({"v": pa.array(arr.ravel().astype(np.float64))}))
    out = con.execute(
        "SELECT CAST(round_even(v * 1000000.0, 0) AS BIGINT) AS e FROM _e6_in"
    ).fetch_arrow_table()["e"].to_numpy(zero_copy_only=False)
    con.unregister("_e6_in")
    return out.reshape(arr.shape)


def pq_encode_exact(
    source: str | ray.data.Dataset,
    n_sub: int = 4,
    n_centroids: int = 16,
    wide: bool = False,
) -> ray.data.Dataset:
    """Product-quantization codes for every embedding — the compression step
    of PQ/IVF-ADC search (Jegou et al. 2011, "Product quantization for
    nearest neighbor search"): the vector is split into ``n_sub`` contiguous
    subvectors and each is replaced by the id of its nearest sub-centroid,
    shrinking a 64-float vector to ``n_sub`` small ints (the representation
    a 100-TB ANN index actually stores).

    Determinism/exactness: sub-centroids are the subvectors of the
    embeddings with ``vec_id < n_centroids`` (the ``cluster_assign`` seed
    convention); every element is e6-scaled to int64 by the DuckDB
    round_even kernel, so squared L2 distances are exact integer sums and
    the argmin (ties to the smallest centroid id) is bitwise
    SQL-reproducible.

    Scale shape: the (n_centroids x dim) int codebook broadcasts once via
    ``ray.put``; encoding is a pure streamed ``map_batches`` — no shuffle.
    Output: long form (one row per (vec_id, sub) with ``code``, sorted) or,
    with ``wide=True``, one row per vec_id with ``code_0..code_{n_sub-1}``
    (the packed layout the ADC scan consumes) — unsorted, for composition.
    """
    ds = _read_emb(source)
    rows = _seed_rows(source, n_centroids)
    cents = _e6_ints(np.array([r["embedding"] for r in rows], np.float64))
    k, dim = cents.shape
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sd = dim // n_sub
    # (n_sub, k, sd) int64 codebook
    book_ref = ray.put(cents.reshape(k, n_sub, sd).transpose(1, 0, 2).copy())

    def encode(batch: pa.Table) -> pa.Table:
        book = ray.get(book_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        xe = _e6_ints(_batch_matrix(batch)).reshape(len(ids), n_sub, sd)
        codes = np.empty((len(ids), n_sub), np.int64)
        for s in range(n_sub):
            # (n, k, sd) int64 diffs: exact, bounded (|e6| <= ~1e6 for unit-
            # scale embeddings -> diff^2 * sd <= ~6e13, far inside int64)
            d = xe[:, s, None, :] - book[s][None, :, :]
            dist = np.einsum("nks,nks->nk", d, d)
            codes[:, s] = dist.argmin(axis=1)  # first min = smallest cid
        if wide:
            cols = {"vec_id": pa.array(ids, pa.int64())}
            for s in range(n_sub):
                cols[f"code_{s}"] = pa.array(codes[:, s], pa.int64())
            return pa.table(cols)
        n = len(ids)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, n_sub), pa.int64()),
                "sub": pa.array(np.tile(np.arange(n_sub, dtype=np.int64), n), pa.int64()),
                "code": pa.array(codes.ravel(), pa.int64()),
            }
        )

    out = ds.map_batches(encode, batch_format="pyarrow")
    return out if wide else out.sort(["vec_id", "sub"])


def pq_adc_topk(
    source: str | ray.data.Dataset,
    query_vec_id: int = 0,
    k: int = 10,
    n_sub: int = 4,
    n_centroids: int = 16,
) -> ray.data.Dataset:
    """Asymmetric-distance top-k over PQ codes: the query stays exact, every
    database vector is its PQ approximation, and the scan cost per vector is
    ``n_sub`` table lookups + adds instead of a ``dim``-wide product — the
    compressed-domain scan that makes billion-vector search feasible.

    The (n_sub x n_centroids) lookup table of exact-int squared distances
    from the query's subvectors to every sub-centroid is built once on the
    driver (tiny) and broadcast; the scan streams the PACKED code rows
    (``pq_encode_exact(wide=True)``) through ``map_batches``, each batch emitting
    its local top-k by the global rule (adist, then vec_id), so only
    ``k x n_blocks`` candidate rows reach the final sort.  All arithmetic
    stays in the e6-scaled integer domain — bitwise SQL-reproducible.

    Output: ``(vec_id, adist)`` — the ``k`` nearest by approximate squared
    L2, ascending (ties by vec_id); the query vector itself is excluded.
    """
    rows = _seed_rows(source, max(n_centroids, query_vec_id + 1))
    cents = _e6_ints(
        np.array([r["embedding"] for r in rows if int(r["vec_id"]) < n_centroids],
                 np.float64)
    )
    qrow = [r for r in rows if int(r["vec_id"]) == int(query_vec_id)]
    if not qrow:
        raise ValueError(f"query vec_id {query_vec_id} not found")
    q = _e6_ints(np.array(qrow[0]["embedding"], np.float64))
    dim = cents.shape[1]
    sd = dim // n_sub
    dq = cents.reshape(len(cents), n_sub, sd).transpose(1, 0, 2) - q.reshape(n_sub, 1, sd)
    lut_ref = ray.put((dq * dq).sum(axis=2))  # (n_sub, n_centroids) int64

    codes = pq_encode_exact(source, n_sub=n_sub, n_centroids=n_centroids, wide=True)

    def scan(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        adist = np.zeros(len(ids), np.int64)
        for s in range(n_sub):
            adist += lut[s][batch[f"code_{s}"].to_numpy(zero_copy_only=False)]
        keep = ids != query_vec_id
        ids, adist = ids[keep], adist[keep]
        # local top-k under the GLOBAL order (adist, vec_id): lexsort makes
        # the per-batch cut consistent with the final sort's tiebreak
        order = np.lexsort((ids, adist))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "adist": pa.array(adist[order], pa.int64()),
            }
        )

    return (
        codes.map_batches(scan, batch_format="pyarrow")
        .sort(["adist", "vec_id"])
        .limit(k)
    )


def ivfpq_topk(
    source: str | ray.data.Dataset,
    query_vec_id: int = 0,
    k: int = 10,
    n_coarse: int = 8,
    n_probe: int = 2,
    n_sub: int = 4,
    n_centroids: int = 16,
) -> ray.data.Dataset:
    """IVF-PQ composed: the full billion-vector serving shape (Jegou et al.
    2011) — a coarse quantizer routes every database vector to one of
    ``n_coarse`` inverted lists, the query probes only its ``n_probe``
    nearest lists, and vectors inside probed lists are ranked by PQ
    asymmetric distance (4 LUT gathers + adds per vector, never a dim-wide
    product).  IO pruning (skip unprobed lists) times compute/memory
    pruning (scan codes, not floats).

    Determinism/exactness: coarse centroids are the ``vec_id < n_coarse``
    seed head, PQ sub-centroids the ``vec_id < n_centroids`` head; all
    arithmetic is e6-scaled exact-int L2 with ties to the smallest id, so
    BOTH the routing and the ADC ranking are bitwise SQL-reproducible —
    unlike the float IVF (`knn_ivf`, honest recall<1 vs an exact oracle),
    this operator's oracle reproduces the probe decision itself.

    Scale shape: one broadcast (coarse matrix + codebook + query LUT, all
    tiny); the scan is a pure streamed ``map_batches`` emitting <= k rows
    per batch under the global (adist, vec_id) order.  Here routing is
    computed in-stream; `build_ivf_index` is the persisted-layout arm where
    unprobed partitions are never even read.
    """
    need = max(n_coarse, n_centroids, query_vec_id + 1)
    rows = _seed_rows(source, need)
    emb = {int(r["vec_id"]): np.asarray(r["embedding"], np.float64) for r in rows}
    if query_vec_id not in emb:
        raise ValueError(f"query vec_id {query_vec_id} not found")
    coarse = _e6_ints(np.stack([emb[i] for i in range(n_coarse)]))
    books = _e6_ints(np.stack([emb[i] for i in range(n_centroids)]))
    q = _e6_ints(emb[query_vec_id])
    dim = coarse.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sd = dim // n_sub
    dq = coarse - q[None, :]
    probe = np.lexsort((np.arange(n_coarse), (dq * dq).sum(axis=1)))[:n_probe]
    probe_mask = np.zeros(n_coarse, bool)
    probe_mask[probe] = True
    book = books.reshape(n_centroids, n_sub, sd).transpose(1, 0, 2).copy()
    dqs = book - q.reshape(n_sub, 1, sd)
    lut = (dqs * dqs).sum(axis=2)  # (n_sub, n_centroids) int64
    state_ref = ray.put((coarse, book, lut, probe_mask))

    def scan(batch: pa.Table) -> pa.Table:
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "adist": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        coarse_b, book_b, lut_b, pmask = ray.get(state_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        xe = _e6_ints(_batch_matrix(batch))
        d = xe[:, None, :] - coarse_b[None, :, :]
        assign = np.einsum("nkd,nkd->nk", d, d).argmin(axis=1)  # first=min cid
        keep = pmask[assign] & (ids != query_vec_id)
        if not keep.any():
            return empty
        ids_k = ids[keep]
        xs = xe[keep].reshape(len(ids_k), n_sub, sd)
        adist = np.zeros(len(ids_k), np.int64)
        for s in range(n_sub):
            dd = xs[:, s, None, :] - book_b[s][None, :, :]
            code = np.einsum("nkd,nkd->nk", dd, dd).argmin(axis=1)
            adist += lut_b[s][code]
        order = np.lexsort((ids_k, adist))[:k]
        return pa.table(
            {"vec_id": pa.array(ids_k[order], pa.int64()),
             "adist": pa.array(adist[order], pa.int64())}
        )

    return (
        _read_emb(source)
        .map_batches(scan, batch_format="pyarrow")
        .sort(["adist", "vec_id"])
        .limit(k)
    )


def mmr_select(
    source: str | ray.data.Dataset,
    query_vec_id: int = 0,
    k: int = 8,
    lam: float = 0.5,
) -> "pa.Table":
    """Maximal-marginal-relevance DIVERSE top-k (Carbonell & Goldstein 1998)
    — the data-curation selection primitive: greedily pick the candidate
    maximizing ``r4(cos(c, q)) - lam * max_{s in selected} r4(cos(c, s))``
    (ties to the smallest vec_id), so the selected set is both relevant to
    the query and internally diverse.

    Exactness: every cosine is rounded with the shared DuckDB ``round_even``
    kernel BEFORE the comparison, and ``lam`` defaults to an exactly
    representable 0.5 — the greedy trace is then bit-reproducible by a
    chained-CTE SQL replay (the BPE-training oracle pattern applied to
    selection).

    Scale shape: k bounded corpus passes; pass i broadcasts the <= k
    selected vectors via ``ray.put`` and each batch emits ONE partial
    argmax row (id, score, embedding) — the driver merges #blocks rows per
    pass.  At real scale you run MMR on a pre-filtered candidate pool (the
    output of a kNN stage), not the raw corpus; the kernel is the same.
    """
    ds = _read_emb(source)
    # The candidate pool's blocks stay PINNED in the object store and each
    # greedy step runs one raw task per block — a Dataset execution per step
    # would pay ~0.5s of fixed driver overhead x k steps for identical work
    # (the streaming engine's raw-task-consume rationale applied here).
    block_refs = ds.to_arrow_refs()

    @ray.remote
    def find_q(block: pa.Table):
        m = block.filter(pc.equal(block["vec_id"], query_vec_id))
        return (
            np.asarray(m["embedding"][0].as_py(), dtype=np.float64)
            if len(m)
            else None
        )

    qs = [v for v in ray.get([find_q.remote(b) for b in block_refs])
          if v is not None]
    if not qs:
        raise ValueError(f"query vec_id {query_vec_id} not found")
    q = qs[0]

    @ray.remote
    def step_partial(block: pa.Table, s_ids, s_mat):
        """Block-local argmax of the MMR objective; returns
        (vec_id, score, embedding) or None."""
        if len(block) == 0:
            return None
        ids = block["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _batch_matrix(block)
        keep = (ids != query_vec_id) & ~np.isin(ids, s_ids)
        if not keep.any():
            return None
        ids, mat = ids[keep], mat[keep]
        score = round4(_cosine(mat, q))
        if s_mat is not None:
            msim = np.max(
                np.stack([round4(_cosine(mat, s)) for s in s_mat]), axis=0
            )
            score = score - lam * msim
        best = np.lexsort((ids, -score))[0]
        return (int(ids[best]), float(score[best]), mat[best])

    selected: list[tuple[int, float, np.ndarray]] = []  # (id, score, vec)
    for _ in range(int(k)):
        sel_ids = np.array([i for i, _, _ in selected], dtype=np.int64)
        sel_mat = (
            np.stack([v for _, _, v in selected]) if selected else None
        )
        parts = [
            p
            for p in ray.get(
                [step_partial.remote(b, sel_ids, sel_mat) for b in block_refs]
            )
            if p is not None
        ]
        if not parts:
            break
        # driver merge of #blocks partial rows: max score, ties to min id
        selected.append(min(parts, key=lambda p: (-p[1], p[0])))

    return pa.table(
        {
            "rank": pa.array(range(len(selected)), pa.int64()),
            "vec_id": pa.array([i for i, _, _ in selected], pa.int64()),
            "score": pa.array([s for _, s, _ in selected], pa.float64()),
        }
    )
