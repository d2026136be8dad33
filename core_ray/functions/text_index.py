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
    """Postings rows for a batch: one row per DISTINCT (word, document)
    pair, carrying the pair's term frequency ``tf`` and the document's
    token count ``dl`` (denormalized so ranked retrieval never needs a
    doc-lengths side join — the standard search-index layout trick)."""
    texts = t["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.utf8_split_whitespace(pc.utf8_lower(texts))
    off = lists.offsets.to_numpy().astype(np.int64)
    words = lists.flatten().to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), np.diff(off))
    keep = words != ""
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
    kept_doc = doc_idx[keep]
    dl = np.bincount(kept_doc, minlength=len(t)).astype(np.int64)
    pairs = (
        pd.DataFrame({"doc_id": doc_ids[kept_doc], "word": words[keep]})
        .groupby(["doc_id", "word"], sort=False)
        .size()
        .reset_index(name="tf")
    )
    doc_dl = pd.Series(dl, index=doc_ids)
    return pa.table(
        {"word": pa.array(pairs["word"].to_numpy().astype(str)),
         "doc_id": pa.array(pairs["doc_id"].to_numpy().astype(np.int64)),
         "tf": pa.array(pairs["tf"].to_numpy().astype(np.int64)),
         "dl": pa.array(doc_dl.loc[pairs["doc_id"]].to_numpy().astype(np.int64))}
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

    # corpus stats for ranked retrieval (BM25 needs N and avgdl): one extra
    # pruned scan at build time — per-batch int partials, bounded reduce
    def stat_partial(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.utf8_lower(t["text"]), r"\S+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"n_docs": pa.array([int((n > 0).sum())], pa.int64()),
                         "n_tok": pa.array([int(n.sum())], pa.int64())})

    stats = (
        _read_docs(source, ["text"])
        .map_batches(stat_partial, batch_format="pyarrow")
        .sum(["n_docs", "n_tok"])
    )
    meta = {
        "num_buckets": num_buckets,
        "hash_kind": "pandas_hash_v1",
        "n_docs": int(stats["sum(n_docs)"]),
        "total_tokens": int(stats["sum(n_tok)"]),
    }
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


def search_bm25(
    index_dir: str,
    words: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> ray.data.Dataset:
    """BM25-RANKED retrieval over a :func:`build_text_index` layout: top-k
    documents by ``sum_t idf(t) * tf_part(t, d)`` over the query terms,
    with Robertson/Sparck-Jones idf ``ln((N - df + 0.5)/(df + 0.5) + 1)``
    and the standard ``(tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl))``
    saturation.

    Same IO shape as :func:`search_index`: ONLY the query words' hash
    buckets are read, with the word filter pushed into the parquet scan —
    the postings carry ``(tf, dl)`` so no doc-length side join is needed,
    and ``df`` per query term comes from a bounded groupby over the pruned
    postings themselves (postings are distinct per (word, doc), so the
    row count IS the document frequency).

    Exactness: per-posting scores are computed by the in-process DuckDB
    kernel as ``round_even(score * 1e4)`` scaled int64, so the per-document
    sum is order-independent and the ranking exactly SQL-reproducible
    (the ``lm_score`` scaled-integer discipline; numpy's SIMD ln can differ
    from libm by an ulp).  Output: ``(doc_id, score_e4)``, score desc,
    doc_id asc, ``<= k`` rows.
    """
    if not words:
        raise ValueError("need at least one query word")
    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    if "n_docs" not in meta:
        raise ValueError("index lacks corpus stats; rebuild with build_text_index")
    nb = meta["num_buckets"]
    n_docs = int(meta["n_docs"])
    avgdl = float(meta["total_tokens"]) / float(n_docs)
    words = sorted({w.lower() for w in words})
    buckets = sorted(set(_bucket_of(pd.Series(words), nb).tolist()))
    paths = []
    for bk in buckets:
        d = os.path.join(index_dir, "postings", f"bucket={bk}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "score_e4": pa.array([], pa.int64())})
    if not paths:
        return ray.data.from_arrow(empty)
    import pyarrow.dataset as pads

    postings = ray.data.read_parquet(
        paths,
        columns=["word", "doc_id", "tf", "dl"],
        filter=pads.field("word").isin(words),
    )
    # document frequency per query term: bounded (<= len(words) rows)
    df_rows = postings.groupby("word").count().take_all()
    df_map = {r["word"]: int(r["count()"]) for r in df_rows}
    if not df_map:
        return ray.data.from_arrow(empty)
    df_ref = ray.put(df_map)

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        m = ray.get(df_ref)
        w = t["word"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(w, return_inverse=True)
        df = np.array([m[x] for x in uniq], np.int64)[inv]
        from .dedup import _duckdb_hash_con

        con = _duckdb_hash_con()
        arg = pa.table({
            "tf": t["tf"],
            "dl": t["dl"],
            "df": pa.array(df, pa.int64()),
        })
        con.register("_bm25_in", arg)
        # the FULL score expression runs inside DuckDB so it is the oracle's
        # own expression tree bit-for-bit (constants inlined identically)
        out = con.execute(
            f"""
            SELECT CAST(round_even(
                     ln(({n_docs} - df + 0.5) / (df + 0.5) + 1.0) *
                     ((tf * ({k1} + 1.0)) /
                      (tf + {k1} * (1.0 - {b} + {b} * dl / ?))) * 10000,
                     0) AS BIGINT) AS s
            FROM _bm25_in
            """,
            [avgdl],
        ).fetch_arrow_table()
        con.unregister("_bm25_in")
        return pa.table({"doc_id": t["doc_id"], "s": out["s"]})

    totals = (
        postings.map_batches(score, batch_format="pyarrow")
        .groupby("doc_id")
        .sum("s")
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_id", "score_e4"])

    # candidate set = docs containing a query term; the top-k sort runs on
    # the aggregated (doc, score) pairs only, never the postings
    return (
        totals.map_batches(rename, batch_format="pyarrow")
        .sort(["score_e4", "doc_id"], descending=[True, False])
        .limit(k)
    )
