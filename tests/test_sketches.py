"""Mergeable sketches: error bounds vs exact answers, merge correctness,
determinism across partitionings."""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data

from core_ray.functions import (
    approx_distinct,
    approx_distinct_by,
    approx_quantiles,
    heavy_hitters,
)
from core_ray.functions.sketches import HLLSketch, MGSummary, TDigest, _hash_column


def _ds(df, blocks=8):
    return ray.data.from_pandas(df).repartition(blocks)


def test_hll_error_bound_ints():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 2_000_000, 300_000).astype("int64")
    exact = len(np.unique(vals))
    est = approx_distinct(_ds(pd.DataFrame({"v": vals})), "v", p=14)
    # p=14 -> sigma ~0.8%; 4 sigma bound
    assert abs(est - exact) / exact < 0.033


def test_hll_strings_and_small_range():
    # linear-counting regime: tiny cardinality must be near-exact
    vals = [f"user-{i % 37}" for i in range(5000)]
    est = approx_distinct(_ds(pd.DataFrame({"v": vals})), "v")
    assert abs(est - 37) < 1.5


def test_hll_partitioning_invariant():
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 50_000, 80_000).astype("int64")
    df = pd.DataFrame({"v": vals})
    e1 = approx_distinct(_ds(df, blocks=2), "v")
    e2 = approx_distinct(_ds(df, blocks=16), "v")
    assert e1 == e2  # register-max merge is order/partition independent


def test_hll_grouped():
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 60_000),
            "v": rng.integers(0, 5_000, 60_000),
        }
    )
    out = (
        approx_distinct_by(_ds(df, blocks=6), "g", "v")
        .to_pandas()
        .set_index("g")["approx_nd"]
    )
    exact = df.groupby("g")["v"].nunique()
    for g in ("a", "b", "c"):
        assert abs(out[g] - exact[g]) / exact[g] < 0.033


def test_tdigest_quantiles_skewed():
    rng = np.random.default_rng(3)
    vals = np.exp(rng.normal(0, 2, 200_000))  # heavy right tail
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    got = approx_quantiles(_ds(pd.DataFrame({"v": vals})), "v", qs)
    exact = np.quantile(vals, qs)
    for q, e in zip(qs, exact):
        # t-digest guarantees tight RELATIVE-RANK error; check the rank of
        # the returned value is within 1% of the requested quantile
        rank = (vals <= got[q]).mean()
        assert abs(rank - q) < 0.01, (q, got[q], e, rank)


def test_tdigest_exact_tails():
    vals = np.arange(10_000, dtype="float64")
    got = approx_quantiles(_ds(pd.DataFrame({"v": vals})), "v", [0.0, 1.0])
    assert got[0.0] == 0.0 and got[1.0] == 9999.0


def test_mg_heavy_hitters_guarantee():
    rng = np.random.default_rng(4)
    # planted heavies over a long tail
    heavy = np.repeat([f"h{i}" for i in range(5)], 20_000)
    tail = rng.choice([f"t{i}" for i in range(5_000)], 100_000)
    vals = np.concatenate([heavy, tail])
    rng.shuffle(vals)
    out = heavy_hitters(_ds(pd.DataFrame({"v": vals}), blocks=8), "v", k=64).to_pandas()
    n = len(vals)
    true_counts = pd.Series(vals).value_counts()
    # every value with freq > n/(k+1) is present
    must = set(true_counts[true_counts > n / 65].index.astype(str))
    assert must <= set(out["value"])
    # bounds contain the true counts
    for _, r in out.iterrows():
        tc = int(true_counts.get(r["value"], 0))
        assert r["count_lo"] <= tc <= r["count_hi"], (r["value"], tc, r.to_dict())
    assert (out["n_rows"] == n).all()


def test_mg_nulls_are_not_items():
    out = heavy_hitters(
        _ds(pd.DataFrame({"v": ["a", None, "a", None, "b"]}), blocks=2), "v", k=8
    ).to_pandas()
    assert (out["n_rows"] == 3).all()  # n counts non-null items only
    assert set(out["value"]) == {"a", "b"}


def test_sketch_units_merge_equals_bulk():
    rng = np.random.default_rng(5)
    a, b = rng.integers(0, 9_000, 40_000), rng.integers(0, 9_000, 40_000)
    s1 = HLLSketch().update_hashes(_hash_column(pa.array(a)))
    s2 = HLLSketch().update_hashes(_hash_column(pa.array(b)))
    bulk = HLLSketch().update_hashes(_hash_column(pa.array(np.concatenate([a, b]))))
    assert s1.merge(s2).estimate() == bulk.estimate()

    m1 = MGSummary(32).update_block(pa.array(a % 50))
    m2 = MGSummary(32).update_block(pa.array(b % 50))
    merged = m1.merge(m2)
    assert merged.n == 80_000

    t1 = TDigest().update(a.astype("float64"))
    t2 = TDigest().update(b.astype("float64"))
    q = t1.merge(t2).quantile(0.5)
    assert abs(q - 4500) < 200


def test_frequent_words_exact_matches_bruteforce():
    """Two-pass MG+recount equals a full groupby count at any partitioning,
    including a skewed head word and a long tail below threshold."""
    from core_ray.functions import frequent_words_exact

    rng = np.random.default_rng(11)
    tail = [f"tail{i}" for i in range(400)]
    texts = []
    for i in range(200):
        ws = ["hot"] * int(rng.integers(1, 4)) + list(
            rng.choice(tail, size=rng.integers(3, 9))
        )
        texts.append(" ".join(ws))
    df = pd.DataFrame({"doc_id": np.arange(200, dtype="int64"), "text": texts})
    df["lang"] = "x"; df["source"] = "t"; df["n_chars"] = df["text"].str.len()

    words = pd.Series(" ".join(texts).lower().split())
    counts = words.value_counts()
    n = len(words)
    expect = counts[counts * 1000 >= 5 * n]
    expect = (
        expect.rename("cnt").rename_axis("word").reset_index()
        .sort_values(["cnt", "word"], ascending=[False, True])
        .reset_index(drop=True)
    )
    expect["cnt"] = expect["cnt"].astype("int64")

    for blocks in (1, 7):
        out = (
            frequent_words_exact(_ds(df, blocks=blocks), phi_permille=5, k=512)
            .to_pandas().reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, expect)


def test_frequent_words_exact_k_guard():
    from core_ray.functions import frequent_words_exact

    with pytest.raises(ValueError):
        frequent_words_exact("/tmp/nope", phi_permille=5, k=100)


def test_group_quantiles_exact_rank_rule():
    """value at 1-based rank max(1, ceil(q*n)) per group, tie-stable."""
    import math

    from core_ray.functions import group_quantiles_exact

    rows = []
    vals_a = [5, 1, 3, 3, 9, 7]          # sorted: 1 3 3 5 7 9 (n=6)
    vals_b = [10]                         # n=1: every q -> 10
    for i, v in enumerate(vals_a):
        rows.append(("a", v, i))
    for i, v in enumerate(vals_b):
        rows.append(("b", v, 100 + i))
    df = pd.DataFrame(rows, columns=["lang", "n_chars", "doc_id"])
    df["text"] = "w"; df["source"] = "t"

    out = (
        group_quantiles_exact(_ds(df, blocks=4), value_col="n_chars",
                              group_col="lang")
        .to_pandas()
    )
    srt = sorted(vals_a)
    for q in (250, 500, 750, 990):
        rank = max(1, math.ceil(q / 1000.0 * len(srt)))
        got = out[(out["lang"] == "a") & (out["q_permille"] == q)]["value"].iloc[0]
        assert got == srt[rank - 1], (q, got, srt[rank - 1])
        got_b = out[(out["lang"] == "b") & (out["q_permille"] == q)]["value"].iloc[0]
        assert got_b == 10
