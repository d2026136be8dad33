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
