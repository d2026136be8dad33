"""Tests for the LLM corpus-preparation stages (functions/training.py):
sequence packing (span arithmetic + partitioning invariance), vocabulary
top-k, decontamination against a planted eval overlap, PII redaction, and
deterministic quota sampling."""

import numpy as np
import pandas as pd
import pytest

import ray.data


def _docs(rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"] = "x"
    df["source"] = "t"
    df["n_chars"] = df["text"].str.len()
    return ray.data.from_pandas(df)


def test_pack_sequences_span_arithmetic():
    from core_ray.functions import pack_sequences

    # counts 3, 4, 5 with cap 4 over ids 0..2:
    #   stream positions: doc0 [0,3), doc1 [3,7), doc2 [7,12)
    #   doc0 -> pack0 off0 n3; doc1 -> pack0 off3 n1 + pack1 off0 n3;
    #   doc2 -> pack1 off3 n1 + pack2 off0 n4
    df = pd.DataFrame({"doc_id": [0, 1, 2], "n": [3, 4, 5]})
    out = (
        pack_sequences(ray.data.from_pandas(df), cap=4, count_col="n")
        .to_pandas()
        .sort_values(["doc_id", "pack_id"])
        .reset_index(drop=True)
    )
    expect = pd.DataFrame(
        {
            "doc_id": [0, 1, 1, 2, 2],
            "pack_id": [0, 0, 1, 1, 2],
            "pack_offset": [0, 3, 0, 3, 0],
            "n_in_pack": [3, 1, 3, 1, 4],
        }
    )
    pd.testing.assert_frame_equal(out.astype("int64"), expect.astype("int64"))


def test_pack_sequences_partitioning_invariant():
    """The two-pass prefix scan gives the same packing at any bucket count
    (the multi-node contract), every token lands in exactly one pack slot,
    and zero-length docs vanish."""
    from core_ray.functions import pack_sequences

    rng = np.random.default_rng(7)
    n = rng.integers(0, 9, size=200)
    df = pd.DataFrame({"doc_id": np.arange(200), "n": n})
    outs = []
    for nb in (1, 3, 16):
        out = (
            pack_sequences(ray.data.from_pandas(df), cap=16, count_col="n", n_buckets=nb)
            .to_pandas()
            .sort_values(["doc_id", "pack_id"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
    out = outs[0]
    assert out["n_in_pack"].sum() == n.sum()
    assert set(out["doc_id"]) == set(df.loc[df["n"] > 0, "doc_id"])
    # pack fullness: every pack except the last holds exactly cap tokens
    per_pack = out.groupby("pack_id")["n_in_pack"].sum()
    assert (per_pack.iloc[:-1] == 16).all()


def test_vocab_topk_counts_and_tiebreak():
    from core_ray.functions import vocab_topk

    rows = [(0, "b b b a a c"), (1, "a c c d")]
    out = vocab_topk(_docs(rows), k=3).to_pandas()
    # counts: a=3, b=3, c=3, d=1 -> top3 ties broken word-asc
    assert list(out["word"]) == ["a", "b", "c"]
    assert list(out["cnt"]) == [3, 3, 3]


def test_decontaminate_planted_overlap():
    from core_ray.functions import decontaminate

    eval_doc = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, eval_doc),  # eval (0 % 5 == 0)
        (1, "alpha beta gamma something else entirely here"),  # shares trigram
        (2, "totally unrelated words with no overlap at all"),
        (3, "delta epsilon zeta trailing content"),  # shares trigram
    ]
    out = decontaminate(_docs(rows), eval_mod=5, n=3).to_pandas()
    got = dict(zip(out["doc_id"], out["contaminated"]))
    assert got == {1: True, 2: False, 3: True}
    n_over = dict(zip(out["doc_id"], out["n_overlap"]))
    assert n_over[1] == 1 and n_over[3] == 1 and n_over[2] == 0


def test_pii_scrub_patterns_and_counts():
    from core_ray.functions import pii_scrub

    rows = [
        (0, "mail me at john.doe@example.com or 10.0.0.1 today"),
        (1, "account 1234567 is fine but 12345 is too short"),
        (2, "nothing sensitive here"),
    ]
    out = pii_scrub(_docs(rows)).to_pandas().set_index("doc_id")
    assert out.loc[0, "clean_text"] == "mail me at [PII] or [PII] today"
    assert out.loc[0, "n_redactions"] == 2
    assert out.loc[1, "clean_text"] == "account [PII] is fine but 12345 is too short"
    assert out.loc[1, "n_redactions"] == 1
    assert out.loc[2, "n_redactions"] == 0


def test_sample_quota_deterministic_and_bounded():
    from core_ray.functions import sample_quota

    df = pd.DataFrame(
        {
            "doc_id": np.arange(1000),
            "source": np.where(np.arange(1000) % 2 == 0, "a", "b"),
            "text": "x",
            "lang": "x",
            "n_chars": 1,
        }
    )
    ds = ray.data.from_pandas(df)
    out1 = sample_quota(ds, {"a": 0, "b": 500}).to_pandas()
    out2 = sample_quota(ray.data.from_pandas(df), {"a": 0, "b": 500}).to_pandas()
    pd.testing.assert_frame_equal(out1, out2)  # reproducible
    assert (out1["source"] == "b").all()  # quota 0 drops everything
    frac = len(out1) / 500.0
    assert 0.35 < frac < 0.65  # ~quota/mod of the b rows


def test_pack_sequences_matches_duckdb(sf_dir):
    """End-to-end oracle parity at sf0.001 (the driver gate runs sf0.01)."""
    import duckdb

    from core_ray.functions import pack_sequences

    mine = pack_sequences(sf_dir, cap=512).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    oracle = con.execute(
        """
        WITH c AS (
          SELECT doc_id, n_chars AS n_tok,
                 CAST(SUM(n_chars) OVER (ORDER BY doc_id) AS BIGINT) AS cum
          FROM documents WHERE n_chars > 0
        )
        SELECT doc_id, CAST(p AS BIGINT) AS pack_id,
               CAST(GREATEST(cum - n_tok - p*512, 0) AS BIGINT) AS pack_offset,
               CAST(LEAST((p+1)*512, cum) - GREATEST(p*512, cum - n_tok) AS BIGINT) AS n_in_pack
        FROM c, unnest(generate_series((cum - n_tok)//512, (cum-1)//512)) AS t(p)
        ORDER BY doc_id, pack_id
        """
    ).fetchdf()
    pd.testing.assert_frame_equal(mine.reset_index(drop=True), oracle)


def test_sample_min_k_exact_and_partition_invariant(sf_dir):
    from core_ray.functions import sample_min_k

    a = sample_min_k(sf_dir, k=25).to_pandas()
    assert len(a) == 25
    # rerun over a different sharding of the same rows: identical sample
    import pyarrow.parquet as pq

    docs = ray.data.from_arrow(
        pq.read_table(f"{sf_dir}/documents.parquet")
    ).repartition(7)
    b = sample_min_k(docs, k=25).to_pandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()


def test_sample_min_k_by_stratified(sf_dir):
    from core_ray.functions import sample_min_k_by

    out = sample_min_k_by(sf_dir, group_col="source", k=5).to_pandas()
    assert (out.groupby("source").size() <= 5).all()
    # per-group winners are the globally smallest hash priorities: rerun
    # over a different sharding agrees
    import pyarrow.parquet as pq

    docs = ray.data.from_arrow(
        pq.read_table(f"{sf_dir}/documents.parquet")
    ).repartition(9)
    again = sample_min_k_by(docs, group_col="source", k=5).to_pandas()
    pd.testing.assert_frame_equal(out, again)


def test_clean_text_planted():
    from core_ray.functions import clean_text

    t = ray.data.from_items(
        [
            {"doc_id": 1, "text": "  a\tb\n\nc  "},
            {"doc_id": 2, "text": "x\x00y"},
            {"doc_id": 3, "text": ""},
        ]
    )
    out = clean_text(t).to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == ["a b c", "x y", ""]
    assert out["n_chars"].tolist() == [5, 3, 0]


def test_tfidf_planted():
    from core_ray.functions import tfidf_top_terms

    t = ray.data.from_items(
        [
            {"doc_id": 1, "text": "apple apple banana common"},
            {"doc_id": 2, "text": "banana cherry common"},
            {"doc_id": 3, "text": "cherry cherry cherry common"},
        ]
    ).repartition(2)
    out = tfidf_top_terms(t, k=2).to_pandas()
    byd = {d: g for d, g in out.groupby("doc_id")}
    # 'common' appears in every doc: idf = ln(1) = 0 -> never a top term
    # unless ties run out; doc 1's top terms are apple (tf=2) then banana
    assert byd[1]["word"].tolist()[0] == "apple"
    assert byd[1].loc[byd[1]["word"] == "apple", "tf"].iloc[0] == 2
    assert byd[3]["word"].tolist()[0] == "cherry"
    # scores of idf-0 words are exactly 0
    zero = out[out["word"] == "common"]
    assert (zero["score"] == 0).all()
    assert (out.groupby("doc_id").size() <= 2).all()


def test_decontaminate_empty_eval_set():
    from core_ray.functions import decontaminate

    # no doc_id divisible by eval_mod -> empty eval shingle set; every doc
    # must come back with zero overlap instead of crashing
    t = ray.data.from_items(
        [{"doc_id": i, "text": "alpha beta gamma delta"} for i in (1, 2, 3)]
    )
    out = decontaminate(t, eval_mod=25).to_pandas()
    assert len(out) == 3 and (out["n_overlap"] == 0).all()
    assert (~out["contaminated"]).all()


def test_pack_sequences_empty_input():
    from core_ray.functions import pack_sequences

    import pyarrow as pa_

    empty = ray.data.from_arrow(
        pa_.table({"doc_id": pa_.array([], pa_.int64()),
                   "n_chars": pa_.array([], pa_.int64())})
    )
    ds_out = pack_sequences(empty)
    assert ds_out.count() == 0
    assert ds_out.schema().names == ["doc_id", "pack_id", "pack_offset", "n_in_pack"]


def test_split_assign_deterministic_partition():
    """Split assignment is a pure function of the id: identical at any
    partitioning, covers every row exactly once, and the three arms respect
    the permille thresholds against the same DuckDB hash."""
    import duckdb

    from core_ray.functions import split_assign

    df = pd.DataFrame({"doc_id": np.arange(1000, dtype="int64")})
    df["text"] = "w"
    a = (
        split_assign(ray.data.from_pandas(df).repartition(1), 100, 200)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        split_assign(ray.data.from_pandas(df).repartition(7), 100, 200)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 1000 and set(a["split"]) == {"train", "val", "test"}
    r = duckdb.connect().execute(
        "SELECT hash(v) % 1000 FROM (SELECT unnest(range(1000)) v)"
    ).fetchnumpy()
    mod = list(r.values())[0].astype("int64")
    want = np.where(mod < 200, "test", np.where(mod < 300, "val", "train"))
    assert (a["split"].to_numpy() == want).all()


def test_shuffle_rank_is_a_permutation():
    """shuffle_rank emits each rank exactly once and orders rows by
    (hash, id) — verified against a driver-side argsort of the same hash."""
    from core_ray.functions import shuffle_rank
    from core_ray.functions.training import _duckdb_hash_i64

    ids = np.arange(777, dtype="int64")
    df = pd.DataFrame({"doc_id": ids, "text": "w"})
    out = (
        shuffle_rank(ray.data.from_pandas(df).repartition(5), bits=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pri = _duckdb_hash_i64(ids)
    want = np.empty(len(ids), np.int64)
    want[np.lexsort((ids, pri))] = np.arange(len(ids))
    assert (out["pos"].to_numpy() == want).all()
    assert sorted(out["pos"]) == list(range(777))


def test_length_curriculum_batches_by_bucket():
    """Within each length bucket the batch index follows the deterministic
    (hash, id) order in contiguous cuts of batch_size; batch sizes are full
    except the last per bucket."""
    from core_ray.functions import length_curriculum
    from core_ray.functions.training import _duckdb_hash_i64

    rng = np.random.default_rng(11)
    n = rng.integers(0, 1500, size=400).astype("int64")
    df = pd.DataFrame(
        {"doc_id": np.arange(400, dtype="int64"), "n_chars": n, "text": "w"}
    )
    out = (
        length_curriculum(
            ray.data.from_pandas(df).repartition(6),
            boundaries=(200, 500, 1000), batch_size=10, bits=3,
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    lb = np.searchsorted(np.array([200, 500, 1000]), n, side="right")
    assert (out["length_bucket"].to_numpy() == lb).all()
    pri = _duckdb_hash_i64(df["doc_id"].to_numpy())
    for b in np.unique(lb):
        mask = lb == b
        ids_b = df["doc_id"].to_numpy()[mask]
        rank = np.empty(mask.sum(), np.int64)
        rank[np.lexsort((ids_b, pri[mask]))] = np.arange(mask.sum())
        assert (out.loc[mask, "batch_idx"].to_numpy() == rank // 10).all()


def test_lm_score_tiny_model_by_hand():
    """4 docs, ref slice = ids 0 (mod 5): model trained on 'a b a b a';
    bigrams ab x2, ba x2 -> c1(a)=2, c1(b)=2.  With V=10 (all words in
    vocab, unk unused): P(b|a)=(2+1)/(2+11), P(a|b)=3/13, unseen P(c|b)=
    1/13 from c1(b)=2 -> (0+1)/(2+11).  Scores are scaled-integer sums."""
    import duckdb

    from core_ray.functions import lm_score

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a b a b a", "a b", "b c", "x"],
        }
    )
    out = (
        lm_score(ray.data.from_pandas(df), ref_mod=5, vocab_size=10)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    lp = lambda a, b: con.execute(
        f"SELECT CAST(round_even(ln(CAST({a} AS DOUBLE)/CAST({b} AS DOUBLE))*1000000,0) AS BIGINT)"
    ).fetchone()[0]
    p_ab, p_ba = lp(3, 13), lp(3, 13)
    want = [
        -(p_ab + p_ba + p_ab + p_ba),  # doc0: ab ba ab ba
        -p_ab,                          # doc1: ab
        -lp(1, 13),                     # doc2: bc unseen, c1(b)=2
        0,                              # doc3: single word
    ]
    assert out["n_bigrams"].tolist() == [4, 1, 1, 0]
    assert out["nll_e6"].tolist() == want


def test_token_windows_novel_screen_and_partition_pruning(tmp_path):
    """A full copy screens non-novel, a fresh sequence novel; and the probe
    must read ONLY the partitions its hashes fall in — corrupting every
    non-probed partition file must not affect the screen."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from core_ray.functions import (build_token_window_index,
                                    token_windows_novel,
                                    poly_window_hashes)
    from core_ray.synth import make_chunk

    corpus = make_chunk(0, 300)
    cdir, idir, xdir = tmp_path / "c", tmp_path / "i", tmp_path / "x"
    cdir.mkdir(), idir.mkdir()
    pq_.write_table(corpus, str(cdir / "c.parquet"))
    build_token_window_index(str(cdir), str(xdir), w=16, stride=8,
                             num_buckets=32)

    tok = corpus["tokens"].combine_chunks()
    victim = tok[5].as_py()
    assert len(victim) >= 16
    ingest = pa.table(
        {
            "doc_id": ["copy", "fresh"],
            "tokens": pa.array([victim, list(range(7_000, 7_040))],
                               pa.list_(pa.int32())),
            "n_tok": pa.array([len(victim), 40], pa.int32()),
            "source": ["t", "t"],
        }
    )
    pq_.write_table(ingest, str(idir / "i.parquet"))

    # sabotage: corrupt every index partition the ingest does NOT probe
    import numpy as np

    vals = np.array(victim + list(range(7_000, 7_040)), dtype=np.int64)
    off = np.array([0, len(victim), len(victim) + 40], dtype=np.int64)
    _, h = poly_window_hashes(vals, off, 16, 8)
    probed = set((h % np.uint64(32)).astype(int).tolist())
    import os

    for d in os.listdir(xdir / "windows"):
        b = int(d.split("=")[1])
        if b not in probed:
            for f in os.listdir(xdir / "windows" / d):
                (xdir / "windows" / d / f).write_bytes(b"corrupt")

    out = (
        token_windows_novel(str(idir), str(xdir))
        .to_pandas().set_index("doc_id")
    )
    assert not out.loc["copy", "novel"] and out.loc["copy", "dup_windows"] > 0
    assert out.loc["fresh", "novel"] and out.loc["fresh", "dup_windows"] == 0


def test_dedup_exact_tokens_min_id_survivor():
    import pyarrow as pa

    from core_ray.functions import dedup_exact_tokens

    t = pa.table(
        {
            "doc_id": ["d3", "d0", "d1", "d2"],
            "tokens": pa.array([[1, 2, 3], [1, 2, 3], [1, 23], [12, 3]],
                               pa.list_(pa.int32())),
            "n_tok": pa.array([3, 3, 2, 2], pa.int32()),
            "source": ["a", "a", "b", "b"],
        }
    )
    out = dedup_exact_tokens(ray.data.from_arrow(t)).to_pandas()
    # d0 beats d3 on the identical array; "1,23" vs "12,3" must NOT merge
    assert out["doc_id"].tolist() == ["d0", "d1", "d2"]


def test_dup_token_windows_by_hand():
    """doc0: 24 tokens -> windows at 0 and 8; doc1 copies doc0's first 16
    tokens (window at 0 shared); doc2 disjoint.  doc1's window 0 == doc0's
    window 0; every other window unique."""
    import pyarrow as pa

    from core_ray.functions import dup_token_windows

    a = list(range(100, 124))
    b = a[:16]
    c = list(range(500, 520))
    t = pa.table(
        {
            "doc_id": ["d0", "d1", "d2"],
            "tokens": pa.array([a, b, c], pa.list_(pa.int32())),
            "n_tok": pa.array([24, 16, 20], pa.int32()),
        }
    )
    out = (
        dup_token_windows(ray.data.from_arrow(t), w=16, stride=8)
        .to_pandas().set_index("doc_id")
    )
    assert out.loc["d0", "n_windows"] == 2 and out.loc["d0", "dup_windows"] == 1
    assert out.loc["d1", "n_windows"] == 1 and out.loc["d1", "dup_windows"] == 1
    assert out.loc["d2", "n_windows"] == 1 and out.loc["d2", "dup_windows"] == 0


def test_dup_token_windows_partitioning_invariant():
    import pyarrow as pa

    from core_ray.functions import dup_token_windows
    from core_ray.synth import make_chunk

    t = make_chunk(0, 200)
    a = (
        dup_token_windows(ray.data.from_arrow(t).repartition(1))
        .to_pandas().reset_index(drop=True)
    )
    b = (
        dup_token_windows(ray.data.from_arrow(t).repartition(9))
        .to_pandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a["dup_windows"] == 0).all()  # random tokens: no verbatim dups


def test_dsir_weights_partitioning_invariant_and_directional():
    """DSIR scores are partition-invariant (int sums over a broadcast
    lambda) and tilt the right way: docs written in the target's vocabulary
    outscore docs written in the raw-only vocabulary."""
    from core_ray.functions import dsir_weights

    rng = np.random.default_rng(11)
    tgt_words = np.array(["alpha", "beta", "gamma"])
    raw_words = np.array(["uno", "dos", "tres", "quatro"])
    rows = []
    for i in range(90):
        if i % 3 == 0:  # target docs: pure target vocabulary
            rows.append(("t", " ".join(rng.choice(tgt_words, size=10))))
        elif i % 3 == 1:  # raw docs in target vocabulary
            rows.append(("r", " ".join(rng.choice(tgt_words, size=10))))
        else:  # raw docs in raw vocabulary
            rows.append(("r", " ".join(rng.choice(raw_words, size=10))))
    df = pd.DataFrame(
        {
            "doc_id": np.arange(90, dtype="int64"),
            "source": [s for s, _ in rows],
            "text": [t for _, t in rows],
        }
    )
    a = (
        dsir_weights(ray.data.from_pandas(df).repartition(1),
                     target_source="t", n_buckets=64)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        dsir_weights(ray.data.from_pandas(df).repartition(7),
                     target_source="t", n_buckets=64)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    scores = a.set_index("doc_id")["score_e6"]
    tgt_like = scores[[i for i in range(90) if i % 3 == 1]].mean()
    raw_like = scores[[i for i in range(90) if i % 3 == 2]].mean()
    assert tgt_like > raw_like


def test_dsir_weights_drops_empty_docs():
    from core_ray.functions import dsir_weights

    df = pd.DataFrame(
        {
            "doc_id": np.array([0, 1, 2], dtype="int64"),
            "source": ["t", "r", "r"],
            "text": ["alpha beta", "", "beta"],
        }
    )
    out = dsir_weights(ray.data.from_pandas(df), target_source="t",
                       n_buckets=16).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 2]


def test_lm_score_partitioning_invariant():
    from core_ray.functions import lm_score

    rng = np.random.default_rng(5)
    words = np.array(["aa", "bb", "cc", "dd", "ee", "ff"])
    texts = [" ".join(rng.choice(words, size=rng.integers(0, 12))) for _ in range(120)]
    df = pd.DataFrame({"doc_id": np.arange(120, dtype="int64"), "text": texts})
    a = (
        lm_score(ray.data.from_pandas(df).repartition(1), ref_mod=3, vocab_size=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        lm_score(ray.data.from_pandas(df).repartition(9), ref_mod=3, vocab_size=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a.loc[a["n_bigrams"] > 0, "nll_e6"] > 0).all()


def test_bloom_novel_planted_duplicates():
    """Docs repeating a reference text probe all-bits-set -> novel=false;
    unique texts are novel (m/n large enough that no FP fires here), and the
    output is partitioning-invariant."""
    from core_ray.functions import bloom_novel

    texts = [f"unique text {i}" for i in range(60)]
    # ids 0,5,10,... are the reference slice; make ids 7 and 13 repeat
    # reference texts (ids 5 and 10), id 21 repeat a NON-reference text (9)
    texts[7], texts[13], texts[21] = texts[5], texts[10], texts[9]
    df = pd.DataFrame({"doc_id": np.arange(60, dtype="int64"), "text": texts})
    outs = []
    for parts in (1, 6):
        out = (
            bloom_novel(ray.data.from_pandas(df).repartition(parts),
                        ref_mod=5, m_bits=65536, k=3)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0].set_index("doc_id")["novel"]
    assert len(out) == 48  # 60 minus the 12 reference docs
    assert not out[7] and not out[13]  # texts already in the reference slice
    assert out[21] and out[9]  # non-reference duplicate pair stays novel
    assert out.drop([7, 13]).all()


def test_chunk_windows_boundaries():
    """Window/stride arithmetic by hand: 10 words, window 4, stride 3 ->
    chunks at offsets 0,3,6,9 with lengths 4,4,4,1; empty doc emits no rows;
    output is partitioning-invariant."""
    from core_ray.functions import chunk_windows

    words = [f"w{i}" for i in range(10)]
    rows = [(0, " ".join(words)), (1, "   "), (2, "a b")]
    outs = []
    for parts in (1, 3):
        out = (
            chunk_windows(_docs(rows).repartition(parts), window=4, stride=3)
            .to_pandas().reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    d0 = out[out["doc_id"] == 0]
    assert list(d0["chunk_idx"]) == [0, 1, 2, 3]
    assert list(d0["n_chunk_tokens"]) == [4, 4, 4, 1]
    assert d0["chunk_text"].iloc[0] == "w0 w1 w2 w3"
    assert d0["chunk_text"].iloc[3] == "w9"
    assert (out["doc_id"] != 1).all()  # whitespace-only doc drops out
    d2 = out[out["doc_id"] == 2]
    assert list(d2["chunk_text"]) == ["a b"]


def test_sample_mixture_copy_counts():
    """Integer part of the weight is exact copies; the fractional arm is
    deterministic per doc_id; epoch runs 0..n-1; partitioning-invariant."""
    from core_ray.functions import sample_mixture

    df = pd.DataFrame({
        "doc_id": np.arange(50, dtype="int64"),
        "text": "t",
        "lang": "x",
        "source": ["up"] * 25 + ["down"] * 25,
    })
    df["n_chars"] = 1
    weights = {"up": 3000, "down": 500}
    outs = []
    for parts in (1, 5):
        out = (
            sample_mixture(ray.data.from_pandas(df).repartition(parts),
                           weights)
            .to_pandas().reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    up = out[out["source"] == "up"].groupby("doc_id").size()
    assert (up == 3).all() and len(up) == 25  # exactly w//1000 copies each
    down = out[out["source"] == "down"].groupby("doc_id").size()
    assert set(down) <= {1}  # downsampled docs appear at most once
    assert 0 < len(down) < 25  # hash arm keeps some, drops some
    per_doc = out.groupby("doc_id")["epoch"]
    assert (per_doc.min() == 0).all()
    assert (per_doc.max() == per_doc.size() - 1).all()


def test_token_shards_cumulative_rule():
    """shard = floor(tokens-before / S) in (hash(id), id) order; the
    engine's total assignment equals a brute-force scan in the same order;
    partitioning-invariant."""
    from core_ray.functions import token_shards
    from core_ray.functions.training import _duckdb_hash_i64

    rng = np.random.default_rng(3)
    rows = [
        (int(i), " ".join(f"w{j}" for j in range(int(rng.integers(1, 12)))))
        for i in range(60)
    ]
    outs = []
    for parts in (1, 6):
        out = (
            token_shards(_docs(rows).repartition(parts), shard_tokens=25)
            .to_pandas().reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0].set_index("doc_id")

    ids = np.array([r[0] for r in rows], np.int64)
    n_tok = np.array([len(r[1].split()) for r in rows], np.int64)
    order = np.lexsort((ids, _duckdb_hash_i64(ids)))
    cum_prev = np.cumsum(n_tok[order]) - n_tok[order]
    expect = dict(zip(ids[order].tolist(), (cum_prev // 25).tolist()))
    for i in ids:
        assert out.loc[i, "shard"] == expect[int(i)]
        assert out.loc[i, "n_tok"] == len(rows[i][1].split())
    # shards are contiguous from 0
    assert set(out["shard"]) == set(range(out["shard"].max() + 1))


def test_token_quota_boundary_doc_kept():
    """Within a source, docs are taken in (hash(id), id) order until the
    token budget is hit; the doc that CROSSES the budget is still kept
    (cum-before < budget), everything after is dropped."""
    from core_ray.functions import token_quota
    from core_ray.functions.training import _duckdb_hash_i64

    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype="int64"),
        "text": ["a b c d e"] * 10,           # 5 tokens each
        "lang": "x",
        "source": ["s1"] * 5 + ["s2"] * 5,
    })
    df["n_chars"] = df["text"].str.len()
    out = (
        token_quota(ray.data.from_pandas(df).repartition(3),
                    {"s1": 12, "s2": 1_000_000})
        .to_pandas().set_index("doc_id")
    )
    assert out.loc[5:, "keep"].all()  # s2 unlimited
    s1 = df[df["source"] == "s1"]
    ids = s1["doc_id"].to_numpy()
    order = np.lexsort((ids, _duckdb_hash_i64(ids)))
    taken = ids[order]
    # 5 tokens/doc, budget 12: cum-before 0,5,10 < 12 -> first 3 kept
    for rank, i in enumerate(taken):
        assert out.loc[i, "keep"] == (rank < 3), (rank, i)


def test_source_overlap_planted():
    """Two sources sharing one distinct trigram overlap by exactly 1;
    a disjoint third source pairs with nothing."""
    from core_ray.functions import source_overlap

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype="int64"),
        "text": [
            "alpha beta gamma unique1 only",   # a: trigrams incl 'alpha beta gamma'
            "alpha beta gamma other tail",     # b: shares exactly that one
            "zeta eta theta iota",             # c: disjoint
            "alpha beta gamma again here",     # a again: dup within source
        ],
        "lang": "x",
        "source": ["a", "b", "c", "a"],
    })
    df["n_chars"] = df["text"].str.len()
    out = source_overlap(ray.data.from_pandas(df).repartition(2)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["source_a"], r["source_b"], r["n_shared"]) == ("a", "b", 1)


def test_source_divergence_orders_drift():
    """A source matching the corpus distribution has lower KL than a skewed
    one; KL >= 0 up to scaled-int rounding; partitioning-invariant."""
    from core_ray.functions import source_divergence

    # corpus: words a..d; source 'bal' mirrors the mixture, 'skew' is all-'a'
    rows = []
    i = 0
    for _ in range(12):
        rows.append({"doc_id": i, "text": "a b c d", "source": "bal",
                     "lang": "x"}); i += 1
    for _ in range(12):
        rows.append({"doc_id": i, "text": "a a a a", "source": "skew",
                     "lang": "x"}); i += 1
    df = pd.DataFrame(rows)
    df["n_chars"] = df["text"].str.len()
    outs = []
    for parts in (1, 4):
        out = (
            source_divergence(ray.data.from_pandas(df).repartition(parts),
                              vocab_size=4)
            .to_pandas().reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0].set_index("source")
    assert out.loc["skew", "kl_e9"] > out.loc["bal", "kl_e9"]
    assert (out["kl_e9"] >= -1).all()  # Gibbs: KL >= 0 (rounding slack 1 ulp)
    assert out.loc["bal", "n_vocab_tok"] == 48
    assert out.loc["skew", "n_vocab_tok"] == 48


def test_group_topk_rank_and_ties():
    """(value desc, id asc) rank within each group; at most k per group;
    ties keep the smaller id; partitioning-invariant."""
    from core_ray.functions import group_topk

    df = pd.DataFrame({
        "doc_id": np.arange(8, dtype="int64"),
        "lang":   ["a", "a", "a", "a", "b", "b", "b", "b"],
        "n_chars": np.array([5, 9, 9, 1, 2, 2, 2, 7], dtype="int64"),
    })
    df["text"] = "w"; df["source"] = "t"
    outs = []
    for parts in (1, 4):
        out = (
            group_topk(ray.data.from_pandas(df).repartition(parts),
                       group_col="lang", value_col="n_chars", k=2)
            .to_pandas().reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    # group a: 9@1, 9@2 (tie -> both, id order); group b: 7@7 then 2@4
    assert list(map(tuple, out.to_numpy())) == [
        ("a", 1, 9), ("a", 2, 9), ("b", 7, 7), ("b", 4, 2)]


def test_bigram_topk_hand():
    from core_ray.functions import bigram_topk

    rows = [(0, "a b a b c"), (1, "a b x")]
    # bigrams: 'a b' x3, 'b a' x1, 'b c' x1, 'b x' x1
    out = bigram_topk(_docs(rows), k=2).to_pandas()
    assert list(out["bigram"]) == ["a b", "b a"]  # tie 1 -> asc bigram
    assert list(out["cnt"]) == [3, 1]


def test_skipgram_topk_matches_brute(corpus_words=None):
    import collections
    import random

    from core_ray.functions import skipgram_topk

    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
            for i in range(60)]
    want = collections.Counter()
    for _, text in rows:
        ws = text.split()
        for i, w in enumerate(ws):
            for d in (1, 2, 3):
                if i + d < len(ws):
                    want[(w, ws[i + d])] += 1
    exp = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    out = skipgram_topk(_docs(rows), window=3, k=10).to_pandas()
    got = [((r["w1"], r["w2"]), r["cnt"]) for _, r in out.iterrows()]
    assert got == exp
    # partitioning invariance
    out8 = skipgram_topk(_docs(rows).repartition(8), window=3, k=10).to_pandas()
    assert out8.equals(out)


def test_skipgram_topk_hand_directional():
    from core_ray.functions import skipgram_topk

    # window 2 over 'a b c': pairs (a,b),(a,c),(b,c) — no reverse pairs
    out = skipgram_topk(_docs([(0, "a b c")]), window=2, k=10).to_pandas()
    assert list(map(tuple, out.to_numpy())) == [
        ("a", "b", 1), ("a", "c", 1), ("b", "c", 1)]


def test_pmi_collocations_orders_association():
    """A pair that always co-occurs ranks above independent pairs; the
    min_count gate drops rare pairs; partitioning-invariant."""
    import math

    from core_ray.functions import pmi_collocations

    # 10 docs "alpha beta w{i} z": (alpha, beta) occurs 10x and exclusively;
    # every other pair occurs once and dies at min_count=5
    rows = [(i, f"alpha beta w{i} z") for i in range(10)]
    outs = []
    for parts in (1, 4):
        out = (
            pmi_collocations(_docs(rows).repartition(parts),
                             vocab_size=30, k=10, min_count=5)
            .to_pandas().reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    assert len(out) == 1  # only the exclusive pair survives min_count
    assert (out.iloc[0]["w1"], out.iloc[0]["w2"]) == ("alpha", "beta")
    # n=30 grid pairs total, c1(alpha)=10, c2(beta)=10 -> PMI = ln(3)
    expect = round(math.log(30 * 10 / (10 * 10)) * 1e6)
    assert abs(int(out.iloc[0]["pmi_e6"]) - expect) <= 1


def test_sample_weighted_inclusion_scales_with_weight():
    """Higher-weight rows win more slots; deterministic across
    partitionings; zero-weight rows never selected; exactly k rows."""
    from core_ray.functions import sample_weighted

    df = pd.DataFrame({
        "doc_id": np.arange(400, dtype="int64"),
        "n_chars": np.array([100] * 200 + [1] * 199 + [0], dtype="int64"),
        "text": "w", "lang": "x", "source": "t",
    })
    outs = []
    for parts in (1, 5):
        out = (
            sample_weighted(ray.data.from_pandas(df).repartition(parts), k=50)
            .to_pandas().reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    assert len(out) == 50
    assert 399 not in set(out["doc_id"])  # zero weight excluded
    heavy = (out["doc_id"] < 200).sum()
    assert heavy > 40  # weight-100 rows dominate the sample
    # keys are sorted desc with id tiebreak
    keys = out["samp_key"].to_numpy()
    assert (np.diff(keys) <= 0).all()


def test_value_rank_is_sort_position():
    """rank = 0-based position in (value, id) order; ties ordered by id;
    partitioning-invariant; a permutation of 0..n-1."""
    from core_ray.functions import value_rank

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 7, size=80)
    df = pd.DataFrame({
        "doc_id": np.arange(80, dtype="int64"),
        "n_chars": vals.astype("int64"),
        "text": "w", "lang": "x", "source": "t",
    })
    outs = []
    for parts in (1, 6):
        out = (
            value_rank(ray.data.from_pandas(df).repartition(parts))
            .to_pandas().reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    expect = np.lexsort((df["doc_id"].to_numpy(), vals))
    rank_expect = np.empty(80, np.int64)
    rank_expect[expect] = np.arange(80)
    assert out.sort_values("doc_id")["rank"].to_numpy().tolist() == rank_expect.tolist()
    assert sorted(out["rank"]) == list(range(80))


def _tok_table(n_tok_list, start=0):
    import pyarrow as pa

    offs = np.zeros(len(n_tok_list) + 1, dtype=np.int32)
    offs[1:] = np.cumsum(n_tok_list).astype(np.int32)
    vals = np.arange(offs[-1], dtype=np.int32) * 7 % 50_000
    return pa.table(
        {
            "doc_id": pa.array([f"doc-{start + i:08d}" for i in range(len(n_tok_list))]),
            "tokens": pa.ListArray.from_arrays(pa.array(offs), pa.array(vals)),
            "n_tok": pa.array(np.asarray(n_tok_list, dtype=np.int32)),
            "source": pa.array(["t"] * len(n_tok_list)),
        }
    )


def test_pack_token_sequences_hand_case():
    """counts 3,4,5 / cap 4: pack0 = doc0 + doc1[:1], pack1 = doc1[1:] +
    doc2[:1], pack2 = doc2[1:] (partial final pack kept); doc_starts mark
    where a doc BEGINS in each pack."""
    import pyarrow as pa

    from core_ray.functions import pack_token_sequences

    t = _tok_table([3, 4, 5])
    vals = t["tokens"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    out = pack_token_sequences(ray.data.from_arrow(t), cap=4).to_pandas()
    assert list(out["pack_id"]) == [0, 1, 2]
    assert list(out["n_tok"]) == [4, 4, 4]
    assert list(out["n_docs"]) == [2, 1, 0]
    got = np.concatenate([np.asarray(x) for x in out["tokens"]])
    assert np.array_equal(got, vals)  # stream preserved end-to-end
    assert [list(x) for x in out["doc_starts"]] == [[0, 3], [3], []]


def test_pack_token_sequences_partition_and_zero_len():
    """Same packs at any bucket count; zero-length docs emit no tokens and
    no doc_start; total output == total input stream."""
    import pyarrow as pa

    from core_ray.functions import pack_token_sequences

    rng = np.random.default_rng(11)
    n = rng.integers(0, 9, size=120)
    t = _tok_table(list(n))
    vals = t["tokens"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    ref = None
    for nb in (1, 4, 32):
        out = pack_token_sequences(ray.data.from_arrow(t), cap=16, n_buckets=nb).to_pandas()
        got = np.concatenate([np.asarray(x) for x in out["tokens"]])
        assert np.array_equal(got, vals)
        assert int(out["n_docs"].sum()) == int((n > 0).sum())
        key = [(int(r.pack_id), list(r.tokens), list(r.doc_starts)) for r in out.itertuples()]
        if ref is None:
            ref = key
        else:
            assert key == ref


def test_pack_token_sequences_empty_input():
    import pyarrow as pa

    from core_ray.functions import pack_token_sequences

    t = _tok_table([])
    out = pack_token_sequences(ray.data.from_arrow(t), cap=8)
    assert out.count() == 0
    assert out.schema().names == ["pack_id", "n_tok", "n_docs", "tokens", "doc_starts"]


def test_decontaminate_tokens_hand_case():
    """Corpus doc 0 shares its full 5-token run with benchmark doc 0 (3
    windows at w=3); doc 1 is clean; doc 2 is shorter than w (0 windows,
    keep)."""
    import pyarrow as pa

    from core_ray.functions import decontaminate_tokens

    corpus = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "tokens": pa.array(
                [[1, 2, 3, 4, 5], [9, 9, 9, 9], [1, 2]],
                pa.list_(pa.int32()),
            ),
        }
    )
    bench = pa.table(
        {"tokens": pa.array([[7, 1, 2, 3, 4, 5, 8]], pa.list_(pa.int32()))}
    )
    out = decontaminate_tokens(
        ray.data.from_arrow(corpus), ray.data.from_arrow(bench), w=3
    ).to_pandas()
    assert list(out["doc_id"]) == ["a", "b", "c"]
    assert list(out["n_windows"]) == [3, 2, 0]
    assert list(out["dirty_windows"]) == [3, 0, 0]
    assert list(out["keep"]) == [False, True, True]


def test_decontaminate_tokens_empty_benchmark():
    import pyarrow as pa

    from core_ray.functions import decontaminate_tokens

    corpus = _tok_table([5, 8])
    bench = pa.table({"tokens": pa.array([], pa.list_(pa.int32()))})
    out = decontaminate_tokens(
        ray.data.from_arrow(corpus), ray.data.from_arrow(bench), w=4
    ).to_pandas()
    assert out["keep"].all()
    assert int(out["dirty_windows"].sum()) == 0


def test_dedup_token_spans_hand_case():
    """Two docs share a verbatim 16-token run (at different offsets): both
    lose exactly those positions; the unique doc is untouched; surviving
    order is preserved."""
    import pyarrow as pa

    from core_ray.functions import dedup_token_spans

    run = list(range(100, 116))
    t = pa.table(
        {
            "doc_id": pa.array(["doc-a", "doc-b", "doc-c"]),
            "tokens": pa.array(
                [run + [1, 2, 3], [7, 8] + run, list(range(50, 70))],
                pa.list_(pa.int32()),
            ),
            "n_tok": pa.array([19, 18, 20], pa.int32()),
        }
    )
    out = dedup_token_spans(ray.data.from_arrow(t)).to_pandas()
    assert out["n_kept"].tolist() == [3, 2, 20]
    assert out["tokens_key"].tolist()[0] == "1,2,3"
    assert out["tokens_key"].tolist()[1] == "7,8"


def test_dedup_token_spans_overlapping_runs_fully_covered():
    """A doc that IS the shared run (n_tok == w) empties entirely."""
    import pyarrow as pa

    from core_ray.functions import dedup_token_spans

    run = list(range(200, 216))
    t = pa.table(
        {
            "doc_id": pa.array(["doc-a", "doc-b"]),
            "tokens": pa.array([run, [5] + run + [6]], pa.list_(pa.int32())),
            "n_tok": pa.array([16, 18], pa.int32()),
        }
    )
    out = dedup_token_spans(ray.data.from_arrow(t)).to_pandas()
    assert out["n_kept"].tolist() == [0, 2]
    assert out["tokens_key"].tolist() == ["", "5,6"]


def test_vocab_coverage_hand_case():
    """k=2 vocabulary over tokens {1:x4, 2:x3, 3:x1}: top-2 = {1,2};
    coverage per source follows exactly."""
    import pyarrow as pa

    from core_ray.functions import vocab_coverage

    t = pa.table(
        {
            "source": pa.array(["a", "a", "b"]),
            "tokens": pa.array([[1, 1, 2], [1, 2, 3], [1, 2]],
                               pa.list_(pa.int32())),
        }
    )
    out = vocab_coverage(ray.data.from_arrow(t), k=2).to_pandas()
    assert out["source"].tolist() == ["a", "b"]
    assert out["total_tokens"].tolist() == [6, 2]
    assert out["covered_tokens"].tolist() == [5, 2]
    assert out["coverage_pct"].tolist() == [83.3333, 100.0]


def test_dedup_token_spans_empty_doc_alignment():
    """A zero-length token row must not shift the rebuilt alignment of the
    docs after it in the batch (split_pattern('') yields one phantom
    element): the doc following two empty rows keeps its tokens verbatim."""
    import pyarrow as pa

    from core_ray.functions import dedup_token_spans

    seq = list(range(100, 132))  # 32 tokens, shared between doc a and c
    fresh = list(range(900, 920))
    rows = [
        ("a", seq),
        ("b_empty", []),
        ("c", seq),
        ("d_empty", []),
        ("e", fresh),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "tokens": pa.array([r[1] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[1]) for r in rows], pa.int32()),
        }
    )
    out = dedup_token_spans(ray.data.from_arrow(t), w=16).to_pandas()
    out = out.set_index("doc_id")
    # duplicated span fully covers a and c; e is untouched, empties survive
    assert out.loc["a", "n_kept"] == 0 and out.loc["c", "n_kept"] == 0
    assert out.loc["b_empty", "n_kept"] == 0
    assert out.loc["d_empty", "n_kept"] == 0
    assert out.loc["e", "n_kept"] == len(fresh)
    assert out.loc["e", "tokens_key"] == ",".join(str(v) for v in fresh)
