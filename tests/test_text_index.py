"""Inverted text index: IO pruning (only query-word buckets read), AND/OR
semantics vs a direct scan, empty results."""

import glob
import os

import pandas as pd
import pytest
import ray.data

from core_ray.functions import build_text_index, search_index


@pytest.fixture()
def corpus_ds():
    rows = [
        {"doc_id": 1, "text": "red green blue"},
        {"doc_id": 2, "text": "red red green"},
        {"doc_id": 3, "text": "blue yellow"},
        {"doc_id": 4, "text": "Red GREEN"},  # lowercased at build
        {"doc_id": 5, "text": ""},
    ]
    return ray.data.from_items(rows).repartition(2), rows


def _brute(rows, words, mode):
    out = []
    for r in rows:
        ws = set(r["text"].lower().split())
        hit = ws.issuperset(words) if mode == "and" else bool(ws & set(words))
        if hit:
            out.append(r["doc_id"])
    return sorted(out)


def test_and_or_match_brute(tmp_path, corpus_ds):
    ds, rows = corpus_ds
    d = str(tmp_path / "idx")
    build_text_index(ds, d, num_buckets=8)
    for words, mode in [
        (["red", "green"], "and"),
        (["blue"], "or"),
        (["red", "yellow"], "or"),
        (["red", "yellow"], "and"),
        (["nosuchword"], "or"),
    ]:
        got = search_index(d, words, mode).to_pandas()["doc_id"].tolist() \
            if search_index(d, words, mode).count() else []
        assert got == _brute(rows, words, mode), (words, mode)


def test_search_reads_only_query_buckets(tmp_path, corpus_ds):
    ds, _ = corpus_ds
    d = str(tmp_path / "idx")
    build_text_index(ds, d, num_buckets=8)
    # sabotage every bucket EXCEPT the query word's: if search touched them,
    # the read would fail
    import pandas as _pd

    from core_ray.functions.temporal import _bucket_of

    keep = set(_bucket_of(_pd.Series(["yellow"]), 8).tolist())
    for p in glob.glob(os.path.join(d, "postings", "bucket=*")):
        b = int(p.rsplit("=", 1)[1])
        if b not in keep:
            for f in os.listdir(p):
                open(os.path.join(p, f), "w").close()  # truncate to garbage
    got = search_index(d, ["yellow"], "or").to_pandas()["doc_id"].tolist()
    assert got == [3]


def test_case_and_dup_insensitive(tmp_path, corpus_ds):
    ds, rows = corpus_ds
    d = str(tmp_path / "idx")
    build_text_index(ds, d, num_buckets=4)
    # 'RED' query lowercased; doc 2's repeated 'red' posts once
    got = search_index(d, ["RED"], "or").to_pandas()["doc_id"].tolist()
    assert got == [1, 2, 4]


def test_bm25_hand_computed(tmp_path, corpus_ds):
    """BM25 against a by-hand reference on the tiny corpus: same idf/tf
    saturation formula, same round_even-to-e4 scaled-int discipline."""
    import math

    import numpy as np

    from core_ray.functions import search_bm25

    ds, rows = corpus_ds
    d = str(tmp_path / "idx")
    meta = build_text_index(ds, d, num_buckets=8)
    # corpus stats: doc 5 is empty -> N=4, total tokens = 3+3+2+2 = 10
    assert meta["n_docs"] == 4 and meta["total_tokens"] == 10
    out = search_bm25(d, ["red", "yellow"], k=10).to_pandas()

    n, avgdl, k1, b = 4, 10 / 4, 1.2, 0.75
    tf = {(1, "red"): 1, (2, "red"): 2, (4, "red"): 1, (3, "yellow"): 1}
    dl = {1: 3, 2: 3, 3: 2, 4: 2}
    df = {"red": 3, "yellow": 1}
    expect = {}
    for (doc, word), f in tf.items():
        idf = math.log((n - df[word] + 0.5) / (df[word] + 0.5) + 1.0)
        part = (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * dl[doc] / avgdl))
        e4 = int(np.round(idf * part * 10000))  # round-half-even like DuckDB
        expect[doc] = expect.get(doc, 0) + e4
    expect_rows = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
    got = list(zip(out["doc_id"], out["score_e4"]))
    assert got == expect_rows


def test_bm25_reads_only_query_buckets(tmp_path, corpus_ds, monkeypatch):
    """Sabotage every bucket the query words do NOT hash into: the ranked
    query must still succeed (it never opens those files)."""
    ds, rows = corpus_ds
    d = str(tmp_path / "idx")
    build_text_index(ds, d, num_buckets=8)
    import pandas as pd

    from core_ray.functions import search_bm25
    from core_ray.functions.temporal import _bucket_of

    keep = set(_bucket_of(pd.Series(["yellow"]), 8).tolist())
    for f in glob.glob(os.path.join(d, "postings", "bucket=*", "*.parquet")):
        bk = int(f.split("bucket=")[1].split(os.sep)[0])
        if bk not in keep:
            with open(f, "wb") as fh:
                fh.write(b"corrupt")
    out = search_bm25(d, ["yellow"], k=5).to_pandas()
    assert list(out["doc_id"]) == [3]


def test_bm25_no_hits_and_guards(tmp_path, corpus_ds):
    ds, rows = corpus_ds
    d = str(tmp_path / "idx")
    build_text_index(ds, d, num_buckets=8)
    from core_ray.functions import search_bm25

    assert len(search_bm25(d, ["nonexistentword"], k=5).to_pandas()) == 0
    with pytest.raises(ValueError):
        search_bm25(d, [], k=5)


def test_phrase_search_hand(tmp_path):
    """Consecutive-word matches with exact counts; overlapping occurrences
    and repeated phrase words handled; docs with all words but not adjacent
    do NOT match."""
    import ray.data

    from core_ray.functions import build_text_index, search_phrase

    rows = [
        {"doc_id": 1, "text": "new york new york city"},   # 'new york' x2
        {"doc_id": 2, "text": "york new and more words"},  # wrong order
        {"doc_id": 3, "text": "NEW YORK"},                 # case-folds, x1
        {"doc_id": 4, "text": "a b a"},                    # repeated-word phrase test
        {"doc_id": 5, "text": "unrelated"},
    ]
    ds = ray.data.from_items(rows).repartition(2)
    d = str(tmp_path / "idx")
    build_text_index(ds, d, num_buckets=8)
    out = search_phrase(d, ["new", "york"]).to_pandas()
    got = dict(zip(out["doc_id"], out["n_matches"]))
    assert got == {1: 2, 3: 1}
    out2 = search_phrase(d, ["a", "b", "a"]).to_pandas()
    assert dict(zip(out2["doc_id"], out2["n_matches"])) == {4: 1}
    assert len(search_phrase(d, ["no", "such", "phrase"]).to_pandas()) == 0
