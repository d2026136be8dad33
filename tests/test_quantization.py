"""Product quantization: encode determinism, compression shape, ADC recall
vs brute force, refined near-exact recall."""

import numpy as np
import pytest
import ray.data

from core_ray.functions import (
    knn_brute_force,
    knn_pq,
    knn_pq_refined,
    pq_encode,
    train_pq,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def books():
    return train_pq(SF, m=8, nbits=6)


def _query(seed=21):
    rng = np.random.default_rng(seed)
    return rng.normal(size=64)


def test_books_shape_and_determinism(books):
    assert books.shape == (8, 64, 8)
    again = train_pq(SF, m=8, nbits=6)
    assert np.array_equal(books, again)


def test_encode_is_m_bytes(books):
    t = pq_encode(SF, books).take(5)
    for r in t:
        assert len(r["code"]) == 8
        assert all(0 <= c < 64 for c in r["code"])


def test_adc_recall_vs_brute(books):
    q = _query()
    brute = {r["vec_id"] for r in knn_brute_force(SF, q, k=10).take(10)}
    codes = pq_encode(SF, books)
    approx = {r["vec_id"] for r in knn_pq(codes, books, q, k=10).take(10)}
    # 8x-compressed codes on 500 random vectors: coarse but useful
    assert len(brute & approx) / 10 >= 0.4


def test_refined_recall_near_exact(books):
    q = _query(seed=22)
    brute = {r["vec_id"] for r in knn_brute_force(SF, q, k=10).take(10)}
    ref = {r["vec_id"] for r in knn_pq_refined(SF, books, q, k=10, refine=8).take(10)}
    assert len(brute & ref) / 10 >= 0.9


def test_adc_tie_break_partition_invariant(books):
    # many vectors sharing one PQ code tie exactly on ADC: the top-k cut
    # must break by vec_id, not input order
    import pyarrow as pa

    base = np.random.default_rng(5).normal(size=64)
    rows = pa.table(
        {
            "vec_id": pa.array(np.arange(40, dtype="int64")),
            "embedding": pa.array([base.astype("float32") for _ in range(40)]),
        }
    )
    fwd = ray.data.from_arrow(rows)
    rev = ray.data.from_arrow(rows.take(list(range(39, -1, -1))))
    q = _query(seed=30)
    a = [r["vec_id"] for r in knn_pq(pq_encode(fwd, books), books, q, k=10).take(10)]
    b = [r["vec_id"] for r in knn_pq(pq_encode(rev, books), books, q, k=10).take(10)]
    assert a == b == list(range(10))


def test_codes_matrix_sliced_batch(books):
    from core_ray.functions.quantization import _codes_matrix

    t = pq_encode(SF, books).materialize().to_arrow_refs()
    import pyarrow as pa
    import ray as _ray

    full = pa.concat_tables(_ray.get(t))
    sl = full.slice(3, 7).combine_chunks()  # zero-copy sliced list column
    m = _codes_matrix(sl)
    assert m.shape == (7, 8)
    ref = _codes_matrix(full)
    assert np.array_equal(m, ref[3:10])


def test_dim_not_divisible_raises():
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(SF, m=7)


def test_pq_encode_exact_codes_valid():
    from core_ray.functions import pq_encode_exact

    df = pq_encode_exact(SF, n_sub=4, n_centroids=16).to_pandas()
    n_vecs = df["vec_id"].nunique()
    assert len(df) == n_vecs * 4
    assert df["code"].between(0, 15).all()
    # a centroid vector's nearest sub-centroid is itself in every subspace
    self_rows = df[df["vec_id"] < 16]
    assert (self_rows["code"] == self_rows["vec_id"]).all()


def test_pq_adc_topk_matches_exact_on_centroids():
    from core_ray.functions import pq_adc_topk

    out = pq_adc_topk(SF, query_vec_id=0, k=10, n_sub=4, n_centroids=16).to_pandas()
    assert len(out) == 10
    assert 0 not in set(out["vec_id"])
    assert (out["adist"].to_numpy() == np.sort(out["adist"].to_numpy())).all()
    assert (out["adist"] >= 0).all()


def test_ivfpq_exhaustive_probe_equals_pq_scan():
    """With every list probed, IVF-PQ degenerates to the plain ADC scan."""
    from core_ray.functions import ivfpq_topk, pq_adc_topk

    full = pq_adc_topk(SF, query_vec_id=0, k=10).to_pandas()
    ivf = ivfpq_topk(SF, query_vec_id=0, k=10, n_coarse=8, n_probe=8).to_pandas()
    assert ivf.values.tolist() == full.values.tolist()


def test_ivfpq_pruned_probe_is_subset_of_probed_lists():
    """Every returned vector coarse-routes to one of the query's probed
    lists, and results are a subset of the exhaustive ADC ranking order."""
    import numpy as np

    from core_ray.functions import ivfpq_topk, pq_adc_topk
    from core_ray.functions.similarity import (
        _batch_matrix, _e6_ints, _read_emb, _seed_rows,
    )

    out = ivfpq_topk(SF, query_vec_id=0, k=10, n_coarse=8, n_probe=2).to_pandas()
    assert len(out) == 10
    rows = _seed_rows(SF, 8)
    coarse = _e6_ints(np.stack([np.asarray(r["embedding"], np.float64) for r in rows]))
    q = coarse[0]
    dq = coarse - q[None, :]
    probe = set(np.lexsort((np.arange(8), (dq * dq).sum(axis=1)))[:2].tolist())
    emb = _read_emb(SF).to_pandas().set_index("vec_id")["embedding"]
    for vid in out["vec_id"]:
        x = _e6_ints(np.asarray(emb.loc[vid], np.float64))
        d = x[None, :] - coarse
        assert int(np.einsum("kd,kd->k", d, d).argmin()) in probe
    # pruned ranking preserves exhaustive ADC order on the shared rows
    full = pq_adc_topk(SF, query_vec_id=0, k=200).to_pandas()
    pos = {int(v): i for i, v in enumerate(full["vec_id"])}
    ranks = [pos[int(v)] for v in out["vec_id"] if int(v) in pos]
    assert ranks == sorted(ranks)
