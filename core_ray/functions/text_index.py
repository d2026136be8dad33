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
    # 0-based kept-word position within each document
    doc_word_starts = np.concatenate(([0], np.cumsum(dl)[:-1]))
    # kept words arrive in document order, so position = running index
    pos_in_doc = np.arange(len(kept_doc)) - doc_word_starts[kept_doc]
    kw = words[keep]
    # one vectorized lexsort groups (doc, word) runs with positions ascending
    order = np.lexsort((pos_in_doc, kw, kept_doc))
    d_s, w_s, p_s = kept_doc[order], kw[order], pos_in_doc[order]
    new = np.ones(len(d_s), bool)
    new[1:] = (d_s[1:] != d_s[:-1]) | (w_s[1:] != w_s[:-1])
    counts = np.diff(np.concatenate((np.nonzero(new)[0], [len(d_s)])))
    offsets = np.concatenate(([0], np.cumsum(counts)))
    # positions ride as a comma-joined string (pandas/join-safe; parsed back
    # with Arrow kernels) — positional postings enable phrase search
    positions = pc.binary_join(
        pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            pc.cast(pa.array(p_s, pa.int64()), pa.string()),
        ),
        ",",
    )
    return pa.table(
        {"word": pa.array(w_s[new].astype(str)),
         "doc_id": pa.array(doc_ids[d_s[new]].astype(np.int64)),
         "tf": pa.array(counts.astype(np.int64)),
         "dl": pa.array(dl[d_s[new]].astype(np.int64)),
         "positions": positions}
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
    df_rows = postings.groupby("word").count().take_all()  # bounded: query terms
    df_map = {r["word"]: int(r["count()"]) for r in df_rows}
    if not df_map:
        return ray.data.from_arrow(empty)
    df_ref = ray.put(df_map)

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            # schema must match the normal path (doc_id, s) — the module
            # `empty` table is the POST-groupby schema and would poison
            # .groupby("doc_id").sum("s") with a mismatched block
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
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


def search_phrase(
    index_dir: str, words: list[str], num_buckets_doc: int = 16
) -> ray.data.Dataset:
    """PHRASE search over a :func:`build_text_index` layout: documents
    containing the words CONSECUTIVELY, with the exact occurrence count —
    the positional-postings feature that boolean/BM25 retrieval can't
    answer ("new york" vs documents merely containing both words).

    Shape: only the phrase words' hash buckets are read (the usual prune);
    each posting explodes to ``(doc, pos - slot_idx)`` anchor rows per
    phrase slot (positions parse back from the postings' comma string with
    Arrow kernels); one doc-bucket shuffle co-locates a document's anchors,
    where a phrase start is valid iff ALL slots voted for it — a vectorized
    ``np.unique`` run count, no per-doc Python.  Repeated words in the
    phrase are handled per slot.  Output: ``(doc_id, n_matches)`` sorted.
    """
    if not words:
        raise ValueError("need at least one phrase word")
    phrase = [w.lower() for w in words]
    uniq_words = sorted(set(phrase))
    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    nb = meta["num_buckets"]
    buckets = sorted(set(_bucket_of(pd.Series(uniq_words), nb).tolist()))
    paths = []
    for bk in buckets:
        d = os.path.join(index_dir, "postings", f"bucket={bk}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_matches": pa.array([], pa.int64())})
    if not paths:
        return ray.data.from_arrow(empty)
    import pyarrow.dataset as pads

    postings = ray.data.read_parquet(
        paths,
        columns=["word", "doc_id", "positions"],
        filter=pads.field("word").isin(uniq_words),
    )
    n_slots = len(phrase)
    slot_of: dict[str, list[int]] = {}
    for i, w in enumerate(phrase):
        slot_of.setdefault(w, []).append(i)

    def anchors(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "start": pa.array([], pa.int64()),
                             "slot": pa.array([], pa.int64())})
        pos_col = t["positions"]
        if isinstance(pos_col, pa.ChunkedArray):
            pos_col = pos_col.combine_chunks()
        lists = pc.cast(pc.split_pattern(pos_col, ","),
                        pa.large_list(pa.string()))
        flat_pos = pc.cast(pc.list_flatten(lists), pa.int64()).to_numpy(
            zero_copy_only=False)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        docs = t["doc_id"].to_numpy(zero_copy_only=False)
        wrds = t["word"].to_numpy(zero_copy_only=False)
        out_d, out_s, out_i = [], [], []
        for w, slots in slot_of.items():
            rows = wrds[parent] == w
            for i in slots:
                out_d.append(docs[parent[rows]])
                out_s.append(flat_pos[rows] - i)
                out_i.append(np.full(rows.sum(), i, np.int64))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "start": pa.array(np.concatenate(out_s), pa.int64()),
                "slot": pa.array(np.concatenate(out_i), pa.int64()),
            }
        )

    from ..ops.common import _arrow_add_bucket

    def count_matches(g: pa.Table) -> pa.Table:
        if isinstance(g, pd.DataFrame):
            g = pa.Table.from_pandas(g, preserve_index=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        s = g["start"].to_numpy(zero_copy_only=False)
        sl = g["slot"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sl, s, d))
        d, s, sl = d[order], s[order], sl[order]
        new = np.ones(len(d), bool)
        new[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
        run = np.cumsum(new) - 1
        votes = np.bincount(run)
        full = votes == n_slots  # every slot voted exactly once
        starts_idx = np.nonzero(new)[0][full]
        hit_d = d[starts_idx]
        if len(hit_d) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_matches": pa.array([], pa.int64())})
        uniq_d, cnt = np.unique(hit_d, return_counts=True)
        return pa.table(
            {"doc_id": pa.array(uniq_d, pa.int64()),
             "n_matches": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    matched = (
        postings.map_batches(anchors, batch_format="pyarrow")
        .map_batches(_arrow_add_bucket(["doc_id"], num_buckets_doc),
                     batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(count_matches, batch_format="pyarrow")
    )
    # zero matches leaves zero groups (schema-less); pin the output schema
    return ray.data.from_arrow(empty).union(matched).sort("doc_id")
