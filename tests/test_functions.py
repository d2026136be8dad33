"""Unit tests for training-data ops with planted fixtures: near-duplicate
detection must find planted dups, lang-id must classify real-language samples
(the driver `documents.lang` column is random, so accuracy is only testable on
planted text), IVF recall is bounded against brute force."""

import numpy as np
import pandas as pd
import pytest

import ray.data


def _docs_ds(rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"] = "x"
    df["source"] = "t"
    df["n_chars"] = df["text"].str.len()
    return ray.data.from_pandas(df)


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from "
    "the warm windowsill and the birds sing in the garden near the old oak tree"
)


def test_minhash_finds_planted_near_dup():
    from core_ray.functions import minhash_pairs

    rows = [
        (0, BASE),
        (1, BASE.replace("lazy", "sleepy")),  # near-dup of 0
        (2, "completely different text about distributed query engines and arrow"),
        (3, "another unrelated document discussing window aggregation semantics"),
    ]
    pairs = minhash_pairs(_docs_ds(rows), threshold=0.5, concurrency=1).to_pandas()
    assert {(0, 1)} == set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (pairs["jaccard"] >= 0.5).all()  # exact-verified Jaccard

    est = minhash_pairs(
        _docs_ds(rows), threshold=0.5, concurrency=1, exact_verify=False
    ).to_pandas()
    assert {(0, 1)} == set(zip(est["doc_a"], est["doc_b"]))
    assert (est["est_jaccard"] >= 0.5).all()


def test_jaccard_pairs_exact_values_and_recall():
    from core_ray.functions import exact_jaccard, jaccard_pairs

    rows = [
        (0, BASE),
        (1, BASE.replace("lazy", "sleepy")),  # near-dup of 0
        (2, "completely different text about distributed query engines and arrow"),
        (3, BASE.replace("garden", "meadow").replace("birds", "crows")),  # 2nd near-dup
    ]
    pairs = jaccard_pairs(_docs_ds(rows), threshold=0.5, concurrency=1).to_pandas()
    got = {(a, b): j for a, b, j in zip(pairs["doc_a"], pairs["doc_b"], pairs["jaccard"])}
    # inverted index has recall 1: every pair whose exact Jaccard clears the
    # threshold must appear, with the exact (4dp) value
    expect = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            ej = exact_jaccard(rows[i][1], rows[j][1])
            if ej >= 0.5:
                expect[(i, j)] = round(ej, 4)
    assert set(got) == set(expect) == {(0, 1), (0, 3), (1, 3)}
    for k, v in expect.items():
        assert abs(got[k] - v) < 5e-5

    # stop-shingle guard: max_doc_freq=1 drops every shared shingle group
    none = jaccard_pairs(
        _docs_ds(rows), threshold=0.5, max_doc_freq=1, concurrency=1
    ).to_pandas()
    assert len(none) == 0


def test_simhash_finds_planted_near_dup():
    from core_ray.functions import simhash_pairs

    rows = [
        (0, BASE),
        (1, BASE + " extra"),
        (2, "completely different text about distributed query engines and arrow"),
    ]
    pairs = simhash_pairs(_docs_ds(rows), max_hamming=6, concurrency=1).to_pandas()
    assert (0, 1) in set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (2 not in set(pairs["doc_a"])) and (2 not in set(pairs["doc_b"]))


def test_lang_id_on_planted_text():
    from core_ray.functions import lang_id

    rows = [
        (0, "the cat is in the house and it is happy with you"),
        (1, "der Hund ist nicht in dem Haus und das ist gut für ihn"),
        (2, "le chat est dans la maison et il est content pour vous"),
        (3, "el gato es feliz en la casa y es un buen día para todos"),
        (4, "今天天气很好我们一起去公园散步吧这是一个美好的日子"),
    ]
    out = lang_id(_docs_ds(rows), concurrency=1).to_pandas().sort_values("doc_id")
    assert out["lang_pred"].tolist() == ["en", "de", "fr", "es", "zh"]


def test_dedup_exact_keeps_min_doc_id():
    from core_ray.functions import dedup_exact

    rows = [(0, "aaa"), (1, "bbb"), (2, "aaa"), (3, "ccc"), (4, "bbb")]
    out = dedup_exact(_docs_ds(rows)).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 3]


def test_ivf_recall_vs_brute_force(sf_dir):
    from core_ray.functions import knn_brute_force, knn_ivf
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = np.asarray(t["embedding"][0].as_py(), dtype=np.float64)
    bf = set(knn_brute_force(sf_dir, q, k=10).to_pandas()["vec_id"])
    ivf = set(knn_ivf(sf_dir, q, k=10, n_probe=8).to_pandas()["vec_id"])
    assert len(bf) == 10
    # probing half the centroids must recover a majority of true neighbors
    assert len(bf & ivf) / 10 >= 0.5


def test_repetition_stats_planted():
    from core_ray.functions import repetition_stats

    rows = [
        (0, "a b a b a b"),          # 6 words, 2 distinct; top bigram "a b" x3 of 5 slots
        (1, "x y z w"),              # all distinct; every bigram count 1 of 3 slots
        (2, "solo"),                 # 1 word: no bigram slot
        (3, ""),                     # empty
    ]
    out = repetition_stats(_docs_ds(rows)).to_pandas().sort_values("doc_id")
    assert out["n_words"].tolist() == [6, 4, 1, 0]
    assert out["distinct_ratio"].tolist() == [0.3333, 1.0, 1.0, 0.0]
    assert out["top_bigram_frac"].tolist() == [0.6, 0.3333, 0.0, 0.0]


def test_dup_shingle_coverage_planted():
    from core_ray.functions import dup_shingle_coverage

    rows = [
        (0, "a b c d e"),    # shingles: abc bcd cde
        (1, "a b c x y"),    # shares abc with doc 0 -> 1/3
        (2, "p q r s"),      # no overlap -> 0/2
        (3, "t u"),          # < 3 words: excluded
    ]
    out = (
        dup_shingle_coverage(_docs_ds(rows))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["n_sh"].tolist() == [3, 3, 2]
    assert out["n_dup"].tolist() == [1, 1, 0]
    assert out["dup_ratio"].tolist() == [0.3333, 0.3333, 0.0]


def test_component_drop_ids_min_root():
    from core_ray.functions import component_drop_ids

    # components {0,2,5} (chain 5-2, 2-0) and {7,9}; 3 untouched
    pairs = pd.DataFrame({"doc_a": [5, 2, 7], "doc_b": [2, 0, 9]})
    drops = component_drop_ids(ray.data.from_pandas(pairs))
    assert drops.tolist() == [2, 5, 9]


def test_component_labels_distributed_matches_union_find():
    from core_ray.functions import component_drop_ids, component_labels_distributed

    rng = np.random.default_rng(11)
    n_nodes, n_edges = 60, 45
    pairs = pd.DataFrame(
        {
            "doc_a": rng.integers(0, n_nodes, n_edges),
            "doc_b": rng.integers(0, n_nodes, n_edges),
        }
    )
    pairs = pairs[pairs["doc_a"] != pairs["doc_b"]].reset_index(drop=True)
    ds = ray.data.from_pandas(pairs)

    drops_uf = set(component_drop_ids(ds).tolist())
    lbl = component_labels_distributed(ds).to_pandas()
    drops_dist = set(lbl.loc[lbl["label"] < lbl["node"], "node"].tolist())
    assert drops_dist == drops_uf
    # labels are the component minima: every label is itself a kept node
    assert set(lbl["label"]) <= set(lbl["node"]) - drops_dist


def test_dedup_near_keeps_component_min(sf_dir):
    from core_ray.functions import dedup_near

    long_a = " ".join(f"w{i}" for i in range(30))
    long_b = " ".join(f"w{i}" for i in range(29)) + " zz"  # near-dup of a
    rows = [
        (10, long_a),
        (11, long_b),
        (12, "totally different words here about other things entirely"),
    ]
    kept = sorted(dedup_near(_docs_ds(rows)).to_pandas()["doc_id"])
    assert kept == [10, 12]
    # the fully-distributed components arm computes the same keep set
    kept_dist = sorted(
        dedup_near(_docs_ds(rows), distributed_components=True).to_pandas()["doc_id"]
    )
    assert kept_dist == [10, 12]


def test_dedup_semantic_keeps_component_min():
    from core_ray.functions import dedup_semantic

    rng = np.random.default_rng(5)
    base = rng.normal(size=8)
    rows = []
    for i, vec in enumerate(
        [base, base + 0.001, -base, rng.normal(size=8) + 3.0]
    ):
        rows.append({"vec_id": i, "embedding": list(np.asarray(vec, np.float32))})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    kept = sorted(dedup_semantic(ds, threshold=0.95, n_planes=64, bands=32).to_pandas()["vec_id"])
    # 0 and 1 are near-identical (cosine ~1); 2 is anti-parallel; 3 unrelated
    assert kept == [0, 2, 3]


def test_corpus_filter_thresholds():
    from core_ray.functions import corpus_filter

    good = " ".join(a + b for a in "abcde" for b in "abcde")  # 25 distinct words
    repetitive = "a b " * 15                               # top bigram dominates
    short = "only four words here"
    digits = " ".join("123" for _ in range(25))            # all digits
    rows = [(0, good), (1, repetitive), (2, short), (3, digits)]
    out = corpus_filter(_docs_ds(rows)).to_pandas()
    assert out["doc_id"].tolist() == [0]


def test_corpus_stats_exact():
    from core_ray.functions import corpus_stats

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([1, 2, 3, 4, 5])]
    out = corpus_stats(_docs_ds(rows)).to_pandas()
    assert out.iloc[0]["n_docs"] == 5
    assert out.iloc[0]["total_words"] == 15
    assert out.iloc[0]["mean_words"] == 3.0
    assert out.iloc[0]["min_words"] == 1
    assert out.iloc[0]["max_words"] == 5
    # duckdb quantile_disc: sorted[ceil(q*n)-1] -> 0.5*5 -> idx 2 -> 3
    assert out.iloc[0]["median_words"] == 3
    assert out.iloc[0]["p95_words"] == 5


def test_token_count_bpe_splits_runs():
    from core_ray.functions import token_count_bpe

    rows = [
        (0, "hello world"),        # 2 letter runs
        (1, "it's 42 degrees!"),   # it + 's + 42 + degrees + !
        (2, "a1b2"),               # a 1 b 2
        (3, ""),
    ]
    out = token_count_bpe(_docs_ds(rows)).to_pandas().sort_values("doc_id")
    assert out["n_tokens"].tolist() == [2, 5, 4, 0]


def test_knn_multi_matches_single_query(sf_dir):
    from core_ray.functions import knn_brute_force, knn_multi
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    Q = np.array([np.asarray(v, np.float64) for v in t["embedding"][:3].to_pylist()])
    multi = knn_multi(sf_dir, Q, query_ids=[0, 1, 2], k=5).to_pandas()
    for qid in [0, 1, 2]:
        single = knn_brute_force(sf_dir, Q[qid], k=5).to_pandas()
        got = multi[multi["query_id"] == qid].sort_values(
            ["sim", "vec_id"], ascending=[False, True]
        )
        assert got["vec_id"].tolist() == single["vec_id"].tolist()
        assert got["sim"].tolist() == single["sim"].tolist()


def test_quality_score_empty_text():
    from core_ray.functions import quality_score

    out = quality_score(_docs_ds([(0, ""), (1, "ab cd")])).to_pandas().sort_values("doc_id")
    assert out["n_words"].tolist() == [0, 2]
    assert out["avg_word_len"].tolist() == [0.0, 2.0]


def test_cosine_dup_pairs_planted():
    from core_ray.functions import cosine_dup_pairs

    rng = np.random.default_rng(11)
    base = rng.normal(size=16)
    near = base + rng.normal(scale=0.02, size=16)  # cosine ~0.999
    others = rng.normal(size=(6, 16))
    vecs = [base, near] + [o for o in others]
    df = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [list(map(float, v)) for v in vecs]}
    )
    pairs = cosine_dup_pairs(ray.data.from_pandas(df), threshold=0.95).to_pandas()
    assert (0, 1) in set(zip(pairs["vec_a"], pairs["vec_b"]))
    assert (pairs["cosine"] >= 0.95).all()


def test_ivf_index_build_serve_and_io_pruning(sf_dir, tmp_path):
    """The persisted IVF layout must (a) serve with bounded recall vs brute
    force, (b) agree exactly with brute force restricted to the probed
    partitions, and (c) prune IO: the probed partitions' bytes are a small
    fraction of the corpus (the whole point of the layout at 100 TB)."""
    import os

    import pyarrow.parquet as pq

    from core_ray.functions import (
        build_ivf_index,
        knn_brute_force,
        knn_ivf_indexed,
        load_ivf_centroids,
    )

    idx = str(tmp_path / "ivf")
    cents = build_ivf_index(sf_dir, idx, n_centroids=16)
    assert cents.shape[0] == 16
    assert np.allclose(load_ivf_centroids(idx), cents)

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = np.asarray(t["embedding"][0].as_py(), dtype=np.float64)
    n_probe = 4

    got = knn_ivf_indexed(idx, q, k=10, n_probe=n_probe).to_pandas()
    bf = knn_brute_force(sf_dir, q, k=10).to_pandas()
    # (a) recall: the query's own partition is probed, so its exact dup
    # (itself) plus nearby vectors must appear
    assert len(set(bf["vec_id"]) & set(got["vec_id"])) / 10 >= 0.5

    # (b) exactness on the probed subset: serving == brute force over the
    # union of probed partitions (no approximation beyond partition pruning)
    probe = np.argsort(((cents - q) ** 2).sum(axis=1))[:n_probe].tolist()
    paths = [os.path.join(idx, "data", f"centroid={c}") for c in probe]
    files = [
        os.path.join(p, f)
        for p in paths
        if os.path.isdir(p)
        for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
    ]
    sub = ray.data.read_parquet(files, columns=["vec_id", "embedding"])
    ref = knn_brute_force(sub, q, k=10).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), ref.reset_index(drop=True))

    # (c) IO pruning: bytes under the probed dirs << bytes under data/
    def _bytes(paths):
        total = 0
        for p in paths:
            for root, _, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    probed = _bytes([p for p in paths if os.path.isdir(p)])
    full = _bytes([os.path.join(idx, "data")])
    assert probed / full <= n_probe / 16 * 2.5  # skew allowance


def test_topk_round4_matches_full_round():
    """_topk_round4's margin cut must be indistinguishable from rounding the
    whole array then ranking, including at rounding-boundary ties."""
    from core_ray.functions.similarity import _topk_round4, round4

    rng = np.random.default_rng(7)
    for trial in range(20):
        sims = rng.uniform(-1, 1, size=500)
        # plant boundary ties right at the 4-decimal rounding edge
        sims[:20] = np.round(sims[0], 4) + rng.integers(-2, 3, size=20) * 5e-5
        ids = rng.permutation(500).astype(np.int64)
        full = round4(sims)
        order = np.lexsort((ids, -full))[:10]
        got_ids, got_sim = _topk_round4(ids, sims, 10)
        assert got_ids.tolist() == ids[order].tolist()
        assert got_sim.tolist() == full[order].tolist()


def test_cluster_assign_planted_blobs():
    """Vectors near centroid 0 assign to 0, near centroid 1 to 1; ties after
    rounding go to the smaller centroid id; partitioning-invariant."""
    from core_ray.functions import cluster_assign

    rng = np.random.default_rng(7)
    c0 = rng.normal(size=8)
    c1 = rng.normal(size=8) + 5.0
    rows = [
        {"vec_id": 0, "embedding": list(c0.astype(np.float32))},
        {"vec_id": 1, "embedding": list(c1.astype(np.float32))},
    ]
    for i in range(2, 22):
        base = c0 if i % 2 == 0 else c1
        rows.append({"vec_id": i,
                     "embedding": list((base * (1 + 0.01 * i)).astype(np.float32))})
    df = pd.DataFrame(rows)
    outs = []
    for parts in (1, 4):
        out = (
            cluster_assign(ray.data.from_pandas(df).repartition(parts),
                           n_clusters=2)
            .to_pandas().reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0].set_index("vec_id")
    for i in range(2, 22):
        assert out.loc[i, "centroid_id"] == (i % 2), i
        # scaled copies are exactly parallel: cosine rounds to 1
        assert out.loc[i, "sim"] == 1.0
    # vec 0 is parallel to BOTH itself and any same-direction centroid;
    # tie at sim=1.0 with itself resolves to the smallest cid = 0
    assert out.loc[0, "centroid_id"] == 0 and out.loc[1, "centroid_id"] == 1


def test_kmeans_fit_separable_and_monotone():
    """On two well-separated blobs the distributed Lloyd fit recovers the
    blob means; inertia never increases; result is partitioning-invariant."""
    from core_ray.functions import cluster_assign, kmeans_fit

    rng = np.random.default_rng(11)
    a = rng.normal(scale=0.1, size=(30, 4))
    b = rng.normal(scale=0.1, size=(30, 4)) + 10.0
    vecs = np.concatenate([a, b])
    rows = [{"vec_id": 0, "embedding": list(a[0].astype(np.float32))},
            {"vec_id": 1, "embedding": list(b[0].astype(np.float32))}]
    for i, v in enumerate(vecs[2:], start=2):
        rows.append({"vec_id": i, "embedding": list(v.astype(np.float32))})
    df = pd.DataFrame(rows)
    cents1, in1 = kmeans_fit(ray.data.from_pandas(df), n_clusters=2, iters=5)
    cents2, in2 = kmeans_fit(ray.data.from_pandas(df).repartition(5),
                             n_clusters=2, iters=5)
    # invariant across layouts up to float-sum reassociation of the partials
    np.testing.assert_allclose(cents1, cents2, rtol=1e-9)
    assert np.isclose(in1, in2, rtol=1e-9)
    # one cluster sits near each blob center (order by first coordinate)
    lo, hi = sorted(cents1[:, 0])
    assert abs(lo) < 1.0 and abs(hi - 10.0) < 1.0
    _, in_1iter = kmeans_fit(ray.data.from_pandas(df), n_clusters=2, iters=1)
    assert in1 <= in_1iter + 1e-9  # more iterations never increase inertia


def test_anti_join_filter_arms_agree():
    """Broadcast and distributed anti arms produce the same survivor set,
    and it equals the NOT-EXISTS brute force; semi + anti partition ds."""
    from core_ray.functions import anti_join_filter, semi_join_filter

    big = pd.DataFrame({"k": np.arange(40, dtype="int64"),
                        "payload": [f"p{i}" for i in range(40)]})
    keys = pd.DataFrame({"kk": np.array([1, 3, 3, 7, 50], dtype="int64")})
    ds = ray.data.from_pandas(big).repartition(4)
    kds = ray.data.from_pandas(keys).repartition(2)
    expect = sorted(set(range(40)) - {1, 3, 7})
    got_b = sorted(
        anti_join_filter(ds, kds, on="k", key_cols=["kk"]).to_pandas()["k"]
    )
    got_d = sorted(
        anti_join_filter(ds, kds, on="k", key_cols=["kk"],
                         distributed=True).to_pandas()["k"]
    )
    assert got_b == expect and got_d == expect
    got_s = sorted(
        semi_join_filter(ds, kds, on="k", key_cols=["kk"]).to_pandas()["k"]
    )
    assert sorted(got_s + got_b) == list(range(40))


def test_quantile_band_filter_rank_rule():
    """Thresholds follow max(1, ceil(q*n)): n=10 values 1..10, band
    [250, 750] -> lo = value at rank 3, hi = value at rank 8; inclusive."""
    from core_ray.functions import quantile_band_filter

    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype="int64"),
        "n_chars": np.array([10, 1, 7, 3, 9, 5, 2, 8, 4, 6], dtype="int64"),
    })
    df["text"] = "w"; df["lang"] = "x"; df["source"] = "t"
    outs = []
    for parts in (1, 3):
        out = (
            quantile_band_filter(ray.data.from_pandas(df).repartition(parts),
                                 lo_permille=250, hi_permille=750)
            .to_pandas().reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    kept = set(outs[0]["n_chars"])
    assert kept == set(range(3, 9))  # values 3..8 inclusive


def test_dedup_spans_planted():
    """Words covered by a cross-doc shared trigram are removed (case
    preserved from the original), within-doc repeats alone do not trigger,
    short docs pass through; partitioning-invariant."""
    from core_ray.functions import dedup_spans

    rows = [
        (0, "Alpha Beta Gamma unique0 tail0"),   # shares 'alpha beta gamma' w/ 1
        (1, "prefix1 alpha beta gamma tail1"),
        (2, "x y x y x y"),                       # repeats only within itself
        (3, "one two"),                           # < 3 words: untouched
        (4, ""),                                  # empty
    ]
    outs = []
    for parts in (1, 3):
        out = (
            dedup_spans(_docs_ds(rows).repartition(parts))
            .to_pandas().reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0].set_index("doc_id")
    # doc 0: positions 0-2 covered; original case survives on kept words
    assert out.loc[0, "text_clean"] == "unique0 tail0"
    assert (out.loc[0, "n_words"], out.loc[0, "n_kept"]) == (5, 2)
    # doc 1: positions 1-3 covered
    assert out.loc[1, "text_clean"] == "prefix1 tail1"
    # doc 2: its trigrams live only in doc 2 -> nothing removed
    assert out.loc[2, "text_clean"] == "x y x y x y"
    assert out.loc[3, "text_clean"] == "one two"
    assert out.loc[4, "text_clean"] == "" and out.loc[4, "n_words"] == 0


def test_distinct_words_by_hand():
    """Case-insensitive distinct vocabulary per group, exact, invariant."""
    from core_ray.functions import distinct_words_by

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype="int64"),
        "text": ["a B b", "a a c", "z z", ""],
        "source": ["s1", "s1", "s2", "s2"],
        "lang": "x",
    })
    df["n_chars"] = df["text"].str.len()
    outs = []
    for parts in (1, 3):
        out = (
            distinct_words_by(ray.data.from_pandas(df).repartition(parts))
            .to_pandas().reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = dict(zip(outs[0]["source"], outs[0]["n_distinct_words"]))
    assert got == {"s1": 3, "s2": 1}  # s1: {a, b, c}; s2: {z}


def test_knn_filtered_prefilter_semantics(sf_dir):
    """Pre-filter: exactly k rows return, ALL matching the predicate — a
    post-filter of the unfiltered top-k would under-deliver."""
    import pyarrow.parquet as pq

    from core_ray.functions import knn_filtered

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    q = np.asarray(t["embedding"][0].as_py(), dtype=np.float64)
    labels = dict(zip(t["vec_id"].to_pylist(), t["label"].to_pylist()))
    out = knn_filtered(sf_dir, q, k=10, label=2).to_pandas()
    assert len(out) == 10
    assert all(labels[v] == 2 for v in out["vec_id"])
    # no-filter arm equals brute force
    from core_ray.functions import knn_brute_force

    a = knn_filtered(sf_dir, q, k=5).to_pandas()
    b = knn_brute_force(sf_dir, q, k=5).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_minhash_novel_planted(tmp_path):
    """Ingest doc near-identical to a REFERENCE doc (id % 5 == 0) is flagged
    not-novel; an ingest doc duplicating only another INGEST doc stays novel
    (the index holds the reference slice only); unrelated docs stay novel."""
    from core_ray.functions import build_minhash_index, minhash_novel

    rows = [
        (0, BASE),                                     # reference (0 % 5 == 0)
        (1, BASE.replace("lazy", "sleepy")),           # ingest near-dup of ref
        (2, "totally different content about engines and arrow kernels"),
        (3, "repeated ingest text about window semantics and state stores"),
        (4, "repeated ingest text about window semantics and state stores x"),
        (5, "another reference doc with entirely unrelated words here"),
    ]
    d = str(tmp_path / "mh")
    ds = _docs_ds(rows).repartition(2)
    build_minhash_index(ds, d, ref_mod=5)
    out = (
        minhash_novel(_docs_ds(rows).repartition(3), d, threshold=0.5)
        .to_pandas().set_index("doc_id")
    )
    assert sorted(out.index) == [1, 2, 3, 4]  # ingest slice only
    assert not out.loc[1, "novel"]            # near-dup of reference 0
    assert out.loc[2, "novel"]
    assert out.loc[3, "novel"] and out.loc[4, "novel"]  # ingest-ingest dup only


def test_label_centroid_sums_exact_and_invariant():
    """Scaled-int vector sums equal a direct computation and are identical
    across partitionings (float sums would reassociate)."""
    from core_ray.functions import label_centroid_sums

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 4)).astype(np.float32)
    labels = (np.arange(40) % 3).astype("int32")
    rows = [{"vec_id": i, "embedding": list(vecs[i]), "label": int(labels[i])}
            for i in range(40)]
    df = pd.DataFrame(rows)
    outs = []
    for parts in (1, 5):
        out = (
            label_centroid_sums(ray.data.from_pandas(df).repartition(parts))
            .to_pandas().reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    # direct: round-half-even per element, then integer sums
    scaled = np.round(vecs.astype(np.float64) * 1e6).astype(np.int64)
    for lb in range(3):
        sub = scaled[labels == lb]
        for d in range(4):
            row = out[(out["label"] == lb) & (out["dim"] == d)].iloc[0]
            assert row["sum_e6"] == sub[:, d].sum()
            assert row["n_vecs"] == len(sub)


def test_dedup_spans_clean_corpus_passthrough():
    """No cross-doc duplicate trigram anywhere: the join's empty dup side
    must not crash; output is whitespace-normalized passthrough."""
    from core_ray.functions import dedup_spans

    rows = [(0, "alpha beta gamma delta"), (1, "one  two\tthree"), (2, "")]
    out = dedup_spans(_docs_ds(rows)).to_pandas().set_index("doc_id")
    assert out.loc[0, "text_clean"] == "alpha beta gamma delta"
    assert out.loc[1, "text_clean"] == "one two three"
    assert out.loc[2, "text_clean"] == ""
    assert (out["n_kept"] == out["n_words"]).all()


def test_anti_join_filter_empty_keys_keeps_all():
    """NOT EXISTS over an empty key side keeps every row (both arms)."""
    from core_ray.functions import anti_join_filter

    big = pd.DataFrame({"k": np.arange(10, dtype="int64"), "p": "x"})
    keys = pd.DataFrame({"kk": pd.Series([], dtype="int64")})
    ds = ray.data.from_pandas(big).repartition(2)
    kds = ray.data.from_pandas(keys)
    for dist in (False, True):
        got = sorted(
            anti_join_filter(ds, kds, on="k", key_cols=["kk"],
                             distributed=dist).to_pandas()["k"]
        )
        assert got == list(range(10)), dist


def test_minhash_novel_short_docs_match_oracle_rule(tmp_path):
    """<3-word docs have no trigram shingles: a short ingest doc identical
    to a short reference doc stays NOVEL (the oracle's len(ws)>=3 rule),
    and empty docs don't j=1-match each other."""
    from core_ray.functions import build_minhash_index, minhash_novel

    rows = [
        (0, "hello world"),    # reference, 2 words
        (1, "hello world"),    # ingest, identical but shingle-less
        (5, ""),               # reference, empty
        (2, ""),               # ingest, empty
        (3, BASE),             # ingest, unrelated long doc
    ]
    d = str(tmp_path / "mh2")
    build_minhash_index(_docs_ds(rows), d, ref_mod=5)
    out = minhash_novel(_docs_ds(rows), d).to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "novel"]) and bool(out.loc[2, "novel"])
    assert bool(out.loc[3, "novel"])


def test_funnel_counts_strict_ordering(tmp_path):
    """A user converting in order counts at every step; out-of-order and
    same-timestamp events do NOT chain; funnel is monotone non-increasing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from core_ray.pipelines.relational import funnel_counts

    base = pd.Timestamp("2024-01-01")
    rows = [
        # u1: full ordered funnel
        (1, "view", base), (1, "click", base + pd.Timedelta("1h")),
        (1, "purchase", base + pd.Timedelta("2h")),
        # u2: click BEFORE view -> stops after view
        (2, "click", base), (2, "view", base + pd.Timedelta("1h")),
        # u3: click at the SAME timestamp as view -> strictly-after fails
        (3, "view", base), (3, "click", base),
        # u4: view+click ordered, no purchase
        (4, "view", base), (4, "click", base + pd.Timedelta("1h")),
        # u5: purchase only -> never enters
        (5, "purchase", base),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    df["event_id"] = np.arange(len(df)); df["value"] = 0.0; df["props"] = ""
    d = str(tmp_path / "ev"); import os; os.makedirs(d)
    pq.write_table(
        pa.Table.from_pandas(df[["event_id", "ts", "user_id", "event_type",
                                 "value", "props"]], preserve_index=False),
        f"{d}/events.parquet",
    )
    out = funnel_counts(d).to_pandas()
    assert list(out["step"]) == ["view", "click", "purchase"]
    assert list(out["n_users"]) == [4, 2, 1]


def test_dup_cluster_sizes_planted():
    """Two near-dup docs = one 2-cluster; three mutually-near docs = one
    3-cluster; singletons excluded."""
    from core_ray.functions import dup_cluster_sizes

    tri = " ".join(f"t{i}" for i in range(25))
    rows = [
        (0, BASE), (1, BASE.replace("lazy", "sleepy")),           # 2-cluster
        (2, tri), (3, tri + " x"), (4, tri.replace("t3", "q3")),  # 3-cluster
        (5, "completely different content here about nothing shared"),
    ]
    out = dup_cluster_sizes(_docs_ds(rows)).to_pandas()
    got = dict(zip(out["cluster_size"], out["n_clusters"]))
    assert got == {2: 1, 3: 1}


def test_retention_cohorts_hand(tmp_path):
    """Cohort = first-activity week; each active (user, week) counts once;
    offsets are relative to the cohort."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from core_ray.pipelines.relational import retention_cohorts

    base = pd.Timestamp("2024-01-01")
    wk = pd.Timedelta("7D")
    rows = [
        (1, base), (1, base + wk), (1, base + wk),          # w0 cohort: w0, w1
        (2, base + pd.Timedelta("1D")), (2, base + 2 * wk), # w0 cohort: w0, w2
        (3, base + wk),                                      # w1 cohort: w1
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["event_id"] = np.arange(len(df)); df["event_type"] = "view"
    df["value"] = 0.0; df["props"] = ""
    d = str(tmp_path / "ev"); os.makedirs(d)
    pq.write_table(
        pa.Table.from_pandas(df[["event_id", "ts", "user_id", "event_type",
                                 "value", "props"]], preserve_index=False),
        f"{d}/events.parquet",
    )
    out = retention_cohorts(d, start="2024-01-01 00:00:00").to_pandas()
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in out.itertuples()}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1}


def test_corr_chars_words_sign_and_exactness():
    """Perfectly correlated planted data -> r_e6 == 1_000_000; result is
    partitioning-invariant (integer sufficient statistics)."""
    from core_ray.functions import corr_chars_words

    rows = [(i, " ".join(["w"] * (i + 1))) for i in range(20)]
    # n_chars = 2*(i+1)-1 is affine in words -> r exactly 1
    outs = []
    for parts in (1, 4):
        out = (
            corr_chars_words(_docs_ds(rows).repartition(parts))
            .to_pandas().reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert outs[0]["n"].iloc[0] == 20
    assert outs[0]["r_e6"].iloc[0] == 1_000_000


def test_revenue_rollup_levels_consistent(sf_dir):
    """Fine rows sum exactly to their nation subtotal and the grand total
    (integer money makes every regrouping exact)."""
    from core_ray.pipelines.relational import revenue_rollup

    out = revenue_rollup(sf_dir).to_pandas()
    fine = out[out["o_orderpriority"].notna()]
    subs = out[out["o_orderpriority"].isna() & out["n_name"].notna()]
    grand = out[out["n_name"].isna()]
    assert len(grand) == 1
    assert grand["revenue_e4"].iloc[0] == fine["revenue_e4"].sum()
    per_nat = fine.groupby("n_name")["revenue_e4"].sum()
    for r in subs.itertuples():
        assert r.revenue_e4 == per_nat[r.n_name]


def test_unigram_entropy_hand():
    """Hand-computed scaled-int entropy; single-repeated-word doc has zero
    entropy; empty doc is zero; partitioning-invariant."""
    import math

    from core_ray.functions import unigram_entropy

    rows = [(0, "a a b"), (1, "x x x x"), (2, ""), (3, "p q r")]
    outs = []
    for parts in (1, 3):
        out = (
            unigram_entropy(_docs_ds(rows).repartition(parts))
            .to_pandas().reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0].set_index("doc_id")

    def rh(x):  # round-half-even like DuckDB round_even
        return int(np.round(x))

    expect0 = -(2 * rh(math.log(2 / 3) * 1e6) + 1 * rh(math.log(1 / 3) * 1e6))
    assert out.loc[0, "ent_e6"] == expect0
    assert out.loc[1, "ent_e6"] == 0  # ln(4/4) = 0
    assert out.loc[2, "ent_e6"] == 0 and out.loc[2, "n_words"] == 0
    expect3 = -3 * rh(math.log(1 / 3) * 1e6)
    assert out.loc[3, "ent_e6"] == expect3


def test_dedup_near_best_keeps_highest_quality():
    """The longest member of each near-dup cluster survives (ties -> min
    id), untouched docs all survive."""
    from core_ray.functions import dedup_near_best

    long_a = " ".join(f"w{i}" for i in range(30))
    long_b = " ".join(f"w{i}" for i in range(29)) + " zz zz2"  # LONGER near-dup
    rows = [
        (10, long_a),
        (11, long_b),
        (12, "totally different words here about other things entirely"),
    ]
    kept = sorted(dedup_near_best(_docs_ds(rows)).to_pandas()["doc_id"])
    # 11 is longer than 10 -> wins despite the larger id
    assert kept == [11, 12]


def test_containment_catches_doc_inside_doc():
    from core_ray.functions import containment_pairs, jaccard_pairs

    small = "the quick brown fox jumps over the lazy dog near the garden"
    big = small + " " + " ".join(f"filler{i} word{i} pad{i}" for i in range(40))
    rows = [
        (0, small),
        (1, big),  # doc 0 embedded verbatim in a much larger doc
        (2, "completely different text about distributed query engines today"),
    ]
    # symmetric Jaccard misses the embedding (J = |small| / |big| is tiny)...
    j = jaccard_pairs(_docs_ds(rows), threshold=0.5, concurrency=1).to_pandas()
    assert len(j) == 0 or (0, 1) not in set(zip(j["doc_a"], j["doc_b"]))
    # ...asymmetric containment reports it at 1.0 exactly
    c = containment_pairs(_docs_ds(rows), threshold_pct=80, concurrency=1).to_pandas()
    got = {(a, b): (i, ct) for a, b, i, ct in zip(
        c["doc_a"], c["doc_b"], c["inter"], c["containment"])}
    assert set(got) == {(0, 1)}
    n_small_shingles = len(small.split()) - 2
    assert got[(0, 1)] == (n_small_shingles, 1.0)


def test_containment_threshold_is_exact_integer_gate():
    from core_ray.functions import containment_pairs

    # 10 shingles in doc 0; doc 1 shares exactly 8 -> containment 0.8:
    # the >= 80 integer gate must INCLUDE the boundary pair
    words = [f"w{i}" for i in range(12)]  # 12 words -> 10 trigram shingles
    d0 = " ".join(words)
    d1 = " ".join(words[:10]) + " zz qq"  # shares trigrams 0..7 -> 8 shingles
    out = containment_pairs(
        _docs_ds([(0, d0), (1, d1)]), threshold_pct=80, concurrency=1
    ).to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {(0, 1)}
    assert out["inter"].tolist() == [8]
    assert out["containment"].tolist() == [0.8]
    # one notch above the boundary excludes it
    out81 = containment_pairs(
        _docs_ds([(0, d0), (1, d1)]), threshold_pct=81, concurrency=1
    ).to_pandas()
    assert len(out81) == 0


def test_json_field_stats_null_and_negative():
    import ray.data

    from core_ray.functions import json_field_stats

    rows = [
        {"event_type": "a", "props": '{"k": 5}'},
        {"event_type": "a", "props": '{"k": -7}'},
        {"event_type": "a", "props": '{"other": 1}'},  # no field -> not counted
        {"event_type": "b", "props": '{"k": 0}'},
        {"event_type": "b", "props": "not json"},
    ]
    out = (
        json_field_stats(ray.data.from_items(rows))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert out["event_type"].tolist() == ["a", "b"]
    assert out["n"].tolist() == [2, 1]
    assert out["sum_k"].tolist() == [-2, 0]
    assert out["min_k"].tolist() == [-7, 0]
    assert out["max_k"].tolist() == [5, 0]


def test_winnow_rightmost_tie_rule():
    """All-identical words -> every shingle hash equal -> each window selects
    its RIGHTMOST shingle, so the fingerprint positions are exactly w..m."""
    import ray.data

    from core_ray.functions.text import winnow_fingerprints

    docs = ray.data.from_items([{"doc_id": 1, "text": " ".join(["x"] * 10)}])
    out = winnow_fingerprints(docs, k=3, w=4).to_pandas()
    # 10 words -> 8 shingles -> windows end at shingle 4..8
    assert out["pos"].tolist() == [4, 5, 6, 7, 8]
    assert out["fp"].nunique() == 1


def test_winnow_shared_run_guarantee():
    """Two documents sharing a run of k+w-1 words share >= 1 fingerprint
    hash (the winnowing coverage guarantee)."""
    import ray.data

    from core_ray.functions.text import winnow_fingerprints

    run = "alpha beta gamma delta epsilon zeta"  # 6 = k+w-1 words
    docs = ray.data.from_items([
        {"doc_id": 1, "text": "one two three " + run + " four five six seven"},
        {"doc_id": 2, "text": "nine eight " + run + " ten eleven twelve"},
    ])
    out = winnow_fingerprints(docs, k=3, w=4).to_pandas()
    f1 = set(out[out["doc_id"] == 1]["fp"])
    f2 = set(out[out["doc_id"] == 2]["fp"])
    assert f1 & f2


def test_winnow_short_docs_emit_nothing():
    import ray.data

    from core_ray.functions.text import winnow_fingerprints

    docs = ray.data.from_items([
        {"doc_id": 1, "text": "a b c d e"},   # 3 shingles < w
        {"doc_id": 2, "text": "a b"},          # no shingles
    ])
    assert winnow_fingerprints(docs, k=3, w=4).count() == 0


def test_mmr_select_prefers_diverse_over_redundant():
    """Three candidates: two near-clones of the query and one orthogonal-ish
    vector — plain top-2 would take both clones, MMR's redundancy penalty
    must pick the diverse vector second."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from core_ray.functions import mmr_select

    rows = {
        0: [1.0, 0.0],          # query
        1: [0.95, 0.3122],      # winner (most relevant)
        2: [0.93, 0.3674],      # near-clone of 1: equally relevant as 3 but
                                # redundant (sim to 1 ~ 0.998 -> penalty 0.5)
        3: [0.93, -0.3674],     # same relevance, diverse (sim to 1 ~ 0.77)
    }
    t = pa.table(
        {
            "vec_id": pa.array(list(rows), pa.int64()),
            "embedding": pa.array([rows[i] for i in rows], pa.list_(pa.float32())),
        }
    )
    out = mmr_select(ray.data.from_arrow(t), query_vec_id=0, k=2, lam=0.5).to_pandas()
    assert out["vec_id"].tolist() == [1, 3]
    assert out["rank"].tolist() == [0, 1]


def test_dedup_intradoc_hand_case():
    """'a b c a b c d': the second 'a b c' trigram occurrence drops its 3
    words; cross-document repeats are untouched (per-doc scope)."""
    import pyarrow as pa
    import ray.data

    from core_ray.functions import dedup_intradoc

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b c a b c d", "a b c x"]),
        }
    )
    out = dedup_intradoc(ray.data.from_arrow(t)).to_pandas()
    assert out.loc[0, "text_clean"] == "a b c d"
    assert int(out.loc[0, "n_kept"]) == 4 and int(out.loc[0, "n_words"]) == 7
    # doc 1 shares the trigram with doc 0 but has no IN-doc repeat: intact
    assert out.loc[1, "text_clean"] == "a b c x"


def test_dedup_intradoc_overlapping_repeats():
    """'x y x y x y' (1-indexed trigrams at 1..4): 'x y x' repeats at 3,
    'y x y' repeats at 4 -> covered positions 3..6, so 'x y' survives."""
    import pyarrow as pa
    import ray.data

    from core_ray.functions import dedup_intradoc

    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array(["x y x y x y"])})
    out = dedup_intradoc(ray.data.from_arrow(t)).to_pandas()
    assert out.loc[0, "text_clean"] == "x y"
    assert int(out.loc[0, "n_kept"]) == 2


def test_dedup_near_auto_switch_threshold(monkeypatch):
    """distributed_components=None auto-switches on the pair count: with the
    bound forced to 0 every duplicate pair routes through the distributed
    min-label arm, and the keep set is unchanged."""
    from core_ray.functions import dedup, dedup_near

    long_a = " ".join(f"w{i}" for i in range(30))
    long_b = " ".join(f"w{i}" for i in range(29)) + " zz"
    rows = [(10, long_a), (11, long_b), (12, "all different words entirely here")]
    monkeypatch.setattr(dedup, "COMPONENTS_DRIVER_MAX_PAIRS", 0)
    kept = sorted(dedup_near(_docs_ds(rows)).to_pandas()["doc_id"])
    assert kept == [10, 12]
