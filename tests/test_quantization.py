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


def test_dim_not_divisible_raises():
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(SF, m=7)
