"""Persisted inverted text index + IO-pruned boolean search — the text
retrieval analog of the persisted IVF layout (`similarity.py`): build once
with a full scan, serve queries by reading only the word-hash buckets the
query terms live in.

Layout: ``<dir>/postings/bucket=<b>/*.parquet`` with (word, doc_id) rows —
one posting per DISTINCT (word, document) pair — plus ``_index_meta.json``
pinning the bucket hash (the shared `_bucket_of`, same kind as every other
layout in `functions/`).  At corpus scale a query touches
``len(query_words) / num_buckets`` of the postings bytes, and the AND/OR
evaluation is a groupby over only the pruned postings.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .temporal import _bucket_of
from .text import _read_docs

_META = "_index_meta.json"


def _doc_word_pairs(t: pa.Table) -> pa.Table:
    texts = t["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.utf8_split_whitespace(pc.utf8_lower(texts))
    off = lists.offsets.to_numpy().astype(np.int64)
    words = lists.flatten().to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), np.diff(off))
    keep = words != ""
    pairs = pd.DataFrame(
        {"doc_id": t["doc_id"].to_numpy(zero_copy_only=False)[doc_idx[keep]],
         "word": words[keep]}
    ).drop_duplicates()
    return pa.table(
        {"word": pa.array(pairs["word"].to_numpy().astype(str)),
         "doc_id": pa.array(pairs["doc_id"].to_numpy().astype(np.int64))}
    )


def build_text_index(
    source: str | ray.data.Dataset, index_dir: str, num_buckets: int = 32
) -> dict:
    """Full-scan build: distinct (word, doc) postings, written
    hive-partitioned by word-hash bucket.  Build once, serve many."""

    def fn(t: pa.Table) -> pa.Table:
        p = _doc_word_pairs(t)
        b = _bucket_of(pd.Series(p["word"].to_numpy(zero_copy_only=False)),
                       num_buckets)
        return p.append_column("bucket", pa.array(b))

    os.makedirs(index_dir, exist_ok=True)
    _read_docs(source, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    ).write_parquet(os.path.join(index_dir, "postings"), partition_cols=["bucket"])
    meta = {"num_buckets": num_buckets, "hash_kind": "pandas_hash_v1"}
    with open(os.path.join(index_dir, _META), "w") as f:
        json.dump(meta, f)
    return meta


def search_index(
    index_dir: str, words: list[str], mode: str = "and"
) -> ray.data.Dataset:
    """Boolean retrieval over a :func:`build_text_index` layout: read ONLY
    the buckets the query words hash into, prune to the query words at the
    parquet scan, then one small groupby — AND keeps docs whose distinct
    query-word count equals len(words), OR keeps any.  Output: doc_id."""
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    if not words:
        raise ValueError("need at least one query word")
    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    nb = meta["num_buckets"]
    words = sorted({w.lower() for w in words})
    buckets = sorted(set(_bucket_of(pd.Series(words), nb).tolist()))
    paths = []
    for b in buckets:
        d = os.path.join(index_dir, "postings", f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    if not paths:
        return ray.data.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    import pyarrow.dataset as pads

    # NOTE: columns= + partitioning=None together trip a Ray 2.49 bug
    # (UnboundLocalError in parquet_datasource); the explicit columns list
    # already keeps the hive 'bucket' column out of the result
    ds = ray.data.read_parquet(
        paths,
        columns=["word", "doc_id"],
        filter=pads.field("word").isin(words),
    )
    if mode == "or":
        return (
            ds.groupby("doc_id")
            .count()
            .map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")
            .sort("doc_id")
        )
    need = len(words)

    def cut(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["count()"], need)).select(["doc_id"])

    # postings are distinct per (word, doc): count == distinct-word count
    return ds.groupby("doc_id").count().map_batches(
        cut, batch_format="pyarrow"
    ).sort("doc_id")
