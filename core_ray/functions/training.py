"""LLM training-data pipeline operators: sequence packing, vocabulary
statistics, benchmark decontamination, PII redaction, deterministic quota
sampling.

These are the corpus-preparation stages that sit between the dedup/filter
operators (``functions/dedup.py``, ``functions/text.py``) and the tokenized
training stream (``streaming/job.py``): pack documents into fixed-length
training sequences, build a vocabulary, drop benchmark-contaminated
documents, redact PII, and downsample sources to mixture quotas.  Every
stage is a vectorized Arrow/numpy ``map_batches`` transform; the only
driver-side state is provably small (bucket prefix sums, the eval-side
shingle set, the top-k merge).

Reference analog: the reference has no LLM-corpus stages — these extend the
engine the way SURVEY.md §2's dedup/similarity section does, with the same
exact-DuckDB-oracle discipline (hash-defined outputs use DuckDB's own
``hash()`` kernel so the oracle reproduces them bit-for-bit).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from .dedup import _ragged_range, _duckdb_word_hash
from .text import _read_docs  # one source-to-Dataset resolver for doc ops


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def _id_hi_from_parquet(path: str, id_col: str) -> int | None:
    """Max id from parquet row-group statistics — no data scan."""
    try:
        md = pq.ParquetFile(path).metadata
        idx = md.schema.to_arrow_schema().get_field_index(id_col)
        hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or st.max is None:
                return None
            hi = st.max if hi is None else max(hi, st.max)
        return hi
    except Exception:
        return None


def pack_sequences(
    source: str | ray.data.Dataset,
    cap: int = 512,
    count_col: str = "n_chars",
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """GPT-style sequence packing: concatenate documents in ``id_col`` order
    into one token stream and cut it every ``cap`` tokens.  A document that
    straddles a cut appears in each pack it touches, so the output has one
    row per (document, pack) span: ``(doc_id, pack_id, pack_offset,
    n_in_pack)``.

    Distributed as a two-pass exclusive prefix scan — the packing of any
    range of documents depends only on the token total BEFORE it:

    1. per-bucket token totals (bucket = contiguous id range) via per-batch
       partial sums + a tiny ``groupby`` (``n_buckets`` rows to the driver);
    2. each bucket packs independently: sort within bucket, local cumsum +
       the bucket's exclusive prefix, vectorized span emission.

    One shuffle total (the bucket co-group); the driver holds ``n_buckets``
    integers.  The global result is partitioning-invariant, so the oracle is
    a plain window cumsum.  Zero-length documents produce no spans.
    """
    cols = [id_col, count_col]
    ds = _read_docs(source, cols)

    # bucket width from parquet stats when possible (no scan), else one
    # column-pruned aggregate pass
    hi = None
    if isinstance(source, str):
        path = source if source.endswith(".parquet") else f"{source}/documents.parquet"
        hi = _id_hi_from_parquet(path, id_col)
    if hi is None:
        hi = ds.max(id_col)
    if hi is None:  # zero-row input: no spans
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pack_id": pa.array([], pa.int64()),
                    "pack_offset": pa.array([], pa.int64()),
                    "n_in_pack": pa.array([], pa.int64()),
                }
            )
        )
    width = max(1, (int(hi) + n_buckets) // n_buckets)

    def partial_sums(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = batch[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = ids // width
        uniq, inv = np.unique(b, return_inverse=True)
        sums = np.bincount(inv, weights=n).astype(np.int64)
        return pa.table({"bucket": uniq.astype(np.int64), "psum": sums})

    totals = (
        ds.map_batches(partial_sums, batch_format="pyarrow")
        .groupby("bucket")
        .sum("psum")
        .take_all()  # bounded: <= n_buckets rows
    )
    tot = np.zeros(n_buckets + 1, dtype=np.int64)
    for row in totals:
        tot[int(row["bucket"])] = int(row["sum(psum)"])
    prefix = np.concatenate(([0], np.cumsum(tot)[:-1]))
    prefix_ref = ray.put(prefix)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.append_column("_bucket", pa.array(ids // width, pa.int64()))

    def pack_group(g) -> "pa.Table":
        import pandas as pd

        if isinstance(g, pd.DataFrame):
            g = pa.Table.from_pandas(g, preserve_index=False)
        bucket = int(g["_bucket"][0].as_py())
        order = pc.sort_indices(g[id_col])
        ids = g[id_col].take(order).to_numpy(zero_copy_only=False)
        n = g[count_col].take(order).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n > 0
        ids, n = ids[keep], n[keep]
        pre = ray.get(prefix_ref)[bucket]
        cum = pre + np.cumsum(n)
        start = (cum - n) // cap
        end = (cum - 1) // cap
        spans = (end - start + 1).astype(np.int64)
        pack = _ragged_range(start, spans)
        doc_rep = np.repeat(ids, spans)
        cum_rep = np.repeat(cum, spans)
        n_rep = np.repeat(n, spans)
        off = np.maximum(cum_rep - n_rep - pack * cap, 0)
        n_in = np.minimum((pack + 1) * cap, cum_rep) - np.maximum(
            pack * cap, cum_rep - n_rep
        )
        return pa.table(
            {
                "doc_id": doc_rep.astype(np.int64),
                "pack_id": pack.astype(np.int64),
                "pack_offset": off.astype(np.int64),
                "n_in_pack": n_in.astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pack_group, batch_format="pyarrow")
        .sort(["doc_id", "pack_id"])
    )


# ---------------------------------------------------------------------------
# vocabulary statistics
# ---------------------------------------------------------------------------


def _bucketed_topk(
    partials: ray.data.Dataset, key_col: str, k: int
) -> ray.data.Dataset:
    """Shared tail of the keyed top-k-by-count pattern: hash-bucket the
    per-batch partial counts, take each bucket's local top-k (count desc,
    key asc), merge the <= 64*k survivors on the driver.  No global sort
    at any key cardinality."""
    from ..ops.common import _arrow_add_bucket

    def bucket_topk(g) -> pa.Table:
        import pandas as pd

        if isinstance(g, pa.Table):
            g = g.to_pandas()  # per-batch
        out = g.groupby(key_col, sort=False)["cnt"].sum().reset_index()
        out = out.sort_values(["cnt", key_col],
                              ascending=[False, True]).head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    top = (
        partials.map_batches(_arrow_add_bucket([key_col], 64),
                             batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: bucket_topk(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
        .to_pandas()  # bounded: <= 64*k rows
        .sort_values(["cnt", key_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return ray.data.from_pandas(top)


def vocab_topk(source: str | ray.data.Dataset, k: int = 100) -> ray.data.Dataset:
    """Top-k corpus vocabulary by word frequency: ``(word, cnt)`` ordered by
    count desc, word asc.

    Per-batch partial counts (Arrow ``value_counts`` — one pass, no Python
    over words) shrink the shuffle to distinct-words-per-batch before the
    ``groupby`` sum; each hash bucket emits only its local top-k and the
    driver merges ``64*k`` candidate rows (the ``top_customers`` pattern,
    ``pipelines/relational.py:180``) — no global sort at any cardinality.
    """

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.utf8_split_whitespace(pc.utf8_lower(texts)).flatten()
        words = words.filter(pc.not_equal(words, ""))
        vc = words.value_counts()
        return pa.table(
            {
                "word": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    return _bucketed_topk(
        _read_docs(source, ["text"]).map_batches(partial,
                                                 batch_format="pyarrow"),
        "word", k,
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def _shingle_hashes(texts, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """DuckDB-hash word ``n``-gram shingles for a batch: ``(flat_hashes,
    per_doc_counts)``.  The shingle string is ``w1||chr(1)||w2||...`` hashed
    with DuckDB's own ``hash()`` kernel (``dedup._duckdb_word_hash``) so a
    SQL oracle reproduces it exactly.  Docs with < n words emit nothing.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    words = pc.utf8_split_whitespace(pc.utf8_lower(texts))
    flat = words.flatten()
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat, parent = flat.filter(pa.array(keep)), parent[keep]
    if len(flat) < n:
        return np.zeros(0, np.uint64), np.zeros(n_docs, np.int64)
    valid = parent[: len(parent) - n + 1] == parent[n - 1 :]
    parts = [flat.slice(i, len(flat) - n + 1) for i in range(n)]
    joined = pc.binary_join_element_wise(*parts, "\x01")
    joined = joined.filter(pa.array(valid))
    sh_parent = parent[: len(parent) - n + 1][valid]
    hashes = _duckdb_word_hash(joined) if len(joined) else np.zeros(0, np.uint64)
    counts = np.bincount(sh_parent, minlength=n_docs).astype(np.int64)
    return hashes, counts


def decontaminate(
    source: str | ray.data.Dataset,
    eval_mod: int = 25,
    n: int = 3,
) -> ray.data.Dataset:
    """Benchmark decontamination: flag training documents sharing any word
    ``n``-gram with the held-out evaluation set (here: ``doc_id % eval_mod
    == 0`` — a deterministic stand-in for the benchmark corpus).

    Output: ``(doc_id, n_overlap, contaminated)`` for every NON-eval
    document, where ``n_overlap`` counts DISTINCT shared shingles.

    Scale shape: the eval side of a decontamination run is MBs against a TB
    corpus, so its distinct shingle-hash set is collected once, sorted, and
    broadcast via ``ray.put``; the training side is a single streamed
    ``map_batches`` doing a vectorized ``searchsorted`` membership test —
    no shuffle at all.
    """
    ds = _read_docs(source, ["doc_id", "text"])

    def eval_shingles(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = ids % eval_mod == 0
        if not mask.any():
            return pa.table({"h": pa.array([], pa.uint64())})
        texts = batch["text"].combine_chunks() if isinstance(
            batch["text"], pa.ChunkedArray
        ) else batch["text"]
        h, _ = _shingle_hashes(texts.filter(pa.array(mask)), n)
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    # bounded by the eval corpus's distinct shingle count (MBs by design)
    ev_tbl = pa.concat_tables(
        ray.get(ds.map_batches(eval_shingles, batch_format="pyarrow").to_arrow_refs())
    )
    ev = np.unique(ev_tbl["h"].to_numpy(zero_copy_only=False).astype(np.uint64))
    ev_ref = ray.put(ev)

    def train_overlap(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = ids % eval_mod != 0
        ids = ids[mask]
        texts = batch["text"].combine_chunks() if isinstance(
            batch["text"], pa.ChunkedArray
        ) else batch["text"]
        h, counts = _shingle_hashes(texts.filter(pa.array(mask)), n)
        parent = np.repeat(np.arange(len(ids)), counts)
        ev_sorted = ray.get(ev_ref)
        if len(ev_sorted) == 0:  # empty eval set: nothing can overlap
            member = np.zeros(len(h), dtype=bool)
        else:
            pos = np.searchsorted(ev_sorted, h)
            member = (pos < len(ev_sorted)) & (
                ev_sorted[np.minimum(pos, len(ev_sorted) - 1)] == h
            )
        # distinct shared shingles per doc: unique (parent, hash) pairs
        if member.any():
            pair = np.stack([parent[member], h[member].astype(np.int64)], axis=1)
            pair = np.unique(pair, axis=0)
            n_over = np.bincount(pair[:, 0], minlength=len(ids)).astype(np.int64)
        else:
            n_over = np.zeros(len(ids), np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_overlap": pa.array(n_over, pa.int64()),
                "contaminated": pa.array(n_over > 0),
            }
        )

    return ds.map_batches(train_overlap, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# RE2-compatible (shared verbatim by pyarrow and the DuckDB oracle)
PII_PATTERNS: tuple[str, ...] = (
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",  # email
    r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",  # IPv4
    r"\b\d{6,}\b",  # long digit runs (ids, phone fragments)
)


def pii_scrub(
    source: str | ray.data.Dataset,
    patterns: tuple[str, ...] = PII_PATTERNS,
    repl: str = "[PII]",
    out_col: str = "clean_text",
) -> ray.data.Dataset:
    """Redact PII-shaped spans: ``(doc_id, clean_text, n_redactions)``.

    Patterns apply SEQUENTIALLY (each sees the previous replacement's
    output — order is part of the contract and the oracle nests the same
    way).  Pure vectorized Arrow regex kernels (RE2), one streamed
    ``map_batches``, no shuffle; both engine and oracle evaluate the
    identical RE2 pattern strings so counts and text match exactly.
    """

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        total = np.zeros(len(txt), np.int64)
        for pat in patterns:
            total += pc.count_substring_regex(txt, pat).to_numpy(zero_copy_only=False)
            txt = pc.replace_substring_regex(txt, pat, repl)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                out_col: txt,
                "n_redactions": pa.array(total, pa.int64()),
            }
        )

    return _read_docs(source, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    ).sort("doc_id")


# ---------------------------------------------------------------------------
# deterministic quota sampling
# ---------------------------------------------------------------------------


def _duckdb_hash_i64(vals: np.ndarray) -> np.ndarray:
    """DuckDB's 64-bit hash over an int64 array (same in-process kernel
    pattern as ``dedup._duckdb_word_hash`` — hash-defined sampling must be
    oracle-reproducible)."""
    from .dedup import _duckdb_hash_con

    con = _duckdb_hash_con()
    t = pa.table({"v": pa.array(vals, pa.int64())})
    con.register("_quota_vals", t)
    out = con.execute("SELECT hash(v) AS h FROM _quota_vals").fetch_arrow_table()
    con.unregister("_quota_vals")
    return out["h"].to_numpy(zero_copy_only=False).astype(np.uint64)


def sample_quota(
    source: str | ray.data.Dataset,
    quotas: dict[str, int],
    default: int = 1000,
    mod: int = 1000,
) -> ray.data.Dataset:
    """Deterministic per-source mixture sampling: keep a document iff
    ``hash(doc_id) % mod < quotas[source]`` (permille when ``mod=1000``).

    This is how source mixing weights are applied to a 100 TB corpus:
    stateless, reproducible across reruns and cluster sizes (the hash is
    DuckDB's, so the kept set is SQL-verifiable), and a pure streamed filter
    — no shuffle, no sampling state.  Output: ``(doc_id, source)`` kept rows.
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        src = batch["source"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        thr = np.array([quotas.get(s, default) for s in uniq], np.int64)
        keep = (_duckdb_hash_i64(ids) % np.uint64(mod)).astype(np.int64) < thr[inv]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "source": pa.array(src[keep], pa.string()),
            }
        )

    return _read_docs(source, ["doc_id", "source"]).map_batches(
        fn, batch_format="pyarrow"
    ).sort("doc_id")


def sample_min_k(
    source: str | ray.data.Dataset,
    k: int = 100,
    columns: list[str] | None = None,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic uniform-without-replacement sample of EXACTLY k rows:
    keep the k smallest ``hash(id)`` (bottom-k / KMV sampling).  One
    streaming pass — each batch contributes at most k (id, priority) rows to
    the final cut, so the shuffle is k rows per batch regardless of corpus
    size, and the result is identical across reruns, partitionings and
    cluster sizes.  The hash is DuckDB's own kernel, so the sample is
    SQL-verifiable (``ORDER BY hash(id) LIMIT k``).

    Contrast ``Dataset.random_sample`` (per-row Bernoulli, approximate size,
    seed-and-partitioning dependent): a training-data pipeline wants the
    SAME eval holdout no matter how the corpus was sharded that day.
    """
    cols = columns or [id_col]
    if id_col not in cols:
        cols = [id_col] + cols

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        pri = _duckdb_hash_i64(ids)  # uint64
        # tie-break by id at the batch cut too: on equal priorities (dup
        # ids, hash collisions) the global (hash, id) order must already
        # hold, or a true bottom-k row can be evicted here
        keep = np.lexsort((ids, pri))[:k]
        out = batch.select(cols).take(pa.array(keep))
        return out.append_column("_pri", pa.array(pri[keep], pa.uint64()))

    # the priority stays UNSIGNED end to end: numpy uint64 argsort per batch,
    # Arrow uint64 sort globally, UBIGINT ORDER BY in the oracle — one order
    return (
        _read_docs(source, cols)
        .map_batches(partial, batch_format="pyarrow")
        .sort(["_pri", id_col])
        .limit(k)
        .drop_columns(["_pri"])
    )


def sample_min_k_by(
    source: str | ray.data.Dataset,
    group_col: str = "source",
    k: int = 20,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Stratified bottom-k: the k smallest ``hash(id)`` WITHIN each group —
    the deterministic per-source eval holdout.  Per batch each group
    contributes at most k candidate rows, so the groupby shuffle moves
    O(groups * k) rows per batch, never the corpus."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        grp = batch[group_col].to_numpy(zero_copy_only=False)
        pri = _duckdb_hash_i64(ids)
        # order by (group, pri, id); first k of each group's run survive
        order = np.lexsort((ids, pri, grp))
        g_sorted = grp[order]
        starts = np.ones(len(order), dtype=bool)
        starts[1:] = g_sorted[1:] != g_sorted[:-1]
        run_first = np.nonzero(starts)[0][np.cumsum(starts) - 1]
        keep = order[(np.arange(len(order)) - run_first) < k]
        out = pa.table(
            {
                id_col: batch[id_col].take(pa.array(keep)),
                group_col: batch[group_col].take(pa.array(keep)),
            }
        )
        return out.append_column("_pri", pa.array(pri[keep], pa.uint64()))

    def cut(t: pa.Table) -> pa.Table:
        order = np.lexsort(
            (
                t[id_col].to_numpy(zero_copy_only=False),
                t["_pri"].to_numpy(zero_copy_only=False),
            )
        )[:k]
        return t.select([id_col, group_col]).take(pa.array(np.sort(order)))

    return (
        _read_docs(source, [id_col, group_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(cut, batch_format="pyarrow")
        .sort([group_col, id_col])
    )


# ---------------------------------------------------------------------------
# train/val/test split, deterministic shuffle order, length curriculum
# ---------------------------------------------------------------------------


def split_assign(
    source: str | ray.data.Dataset,
    val_permille: int = 50,
    test_permille: int = 50,
    id_col: str = "doc_id",
    mod: int = 1000,
) -> ray.data.Dataset:
    """Deterministic train/val/test split assignment: ``hash(id) % mod``
    lands in ``[0, test)`` -> test, ``[test, test+val)`` -> val, else train.

    The assignment is a pure function of the id (DuckDB's hash kernel, so
    SQL-verifiable) — stable across reruns, shard layouts and cluster sizes,
    which is the property a 100 TB corpus split must have: re-ingesting a
    source can never move a document across the eval boundary.  One streamed
    ``map_batches``, no shuffle.  Output: ``(id, split)``.
    """
    t_hi = int(test_permille)
    v_hi = t_hi + int(val_permille)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        r = (_duckdb_hash_i64(ids) % np.uint64(mod)).astype(np.int64)
        split = np.where(r < t_hi, "test", np.where(r < v_hi, "val", "train"))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    return _read_docs(source, [id_col]).map_batches(
        fn, batch_format="pyarrow"
    ).sort(id_col)


def _bucket_prefix_counts(
    ds: ray.data.Dataset,
    key_of,  # batch -> int64 composite bucket array (one slot per row)
    n_slots: int,
) -> np.ndarray:
    """Pass 1 of a distributed prefix scan: exclusive prefix sums of
    per-composite-bucket row counts.  Driver state is ``n_slots`` integers."""

    def partial(batch: pa.Table) -> pa.Table:
        b = key_of(batch)
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table(
            {"bucket": pa.array(uniq, pa.int64()), "cnt": pa.array(cnt, pa.int64())}
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").groupby("bucket").sum(
        "cnt"
    ).take_all()  # bounded: <= n_slots rows
    tot = np.zeros(n_slots + 1, dtype=np.int64)
    for r in rows:
        tot[int(r["bucket"])] = int(r["sum(cnt)"])
    return np.concatenate(([0], np.cumsum(tot)[:-1]))


def shuffle_rank(
    source: str | ray.data.Dataset,
    id_col: str = "doc_id",
    bits: int = 8,
) -> ray.data.Dataset:
    """Deterministic global shuffle order: ``rank`` = position of the row in
    ``(hash(id), id)`` order, 0-based — the reproducible corpus permutation a
    training run shards by (read back ``ORDER BY pos`` or route
    ``pos % n_shards``).

    Contrast ``Dataset.random_shuffle()``: a full materializing all-to-all
    whose order depends on partitioning and seed plumbing.  Here the
    permutation is a pure function of the ids, and it is computed as a
    two-pass prefix scan: (1) row counts per hash-prefix bucket (top ``bits``
    bits of the hash — bucket order IS hash order) with ``2**bits`` integers
    to the driver; (2) each bucket independently sorts its rows by
    ``(hash, id)`` and offsets by the bucket's exclusive prefix.  One shuffle
    (the bucket co-group); no global sort.  Output: ``(id, pos)``.
    """
    ds = _read_docs(source, [id_col])
    ranked = _prefix_scan_rank(ds, id_col, bits)

    def emit(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch[id_col], "pos": batch["_rank"]})

    return ranked.map_batches(emit, batch_format="pyarrow").sort(id_col)


def _prefix_scan_rank(
    ds: ray.data.Dataset,
    id_col: str,
    bits: int,
    lb_of=None,
    n_lb: int = 1,
) -> ray.data.Dataset:
    """Shared core of :func:`shuffle_rank` / :func:`length_curriculum`: the
    rank of every row within its ``lb_of`` partition (globally when
    ``lb_of`` is None) in ``(hash(id), id)`` order, as a two-pass prefix
    scan over composite ``(partition, hash-prefix)`` buckets.  Returns a
    Dataset with ``(id_col, _lb, _rank)``; driver state is
    ``n_lb * 2**bits`` integers."""
    n_hb = 1 << bits
    shift = np.uint64(64 - bits)

    def _lb(batch: pa.Table) -> np.ndarray:
        if lb_of is None:
            return np.zeros(len(batch), np.int64)
        return lb_of(batch)

    def key_of(batch: pa.Table) -> np.ndarray:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        hb = (_duckdb_hash_i64(ids) >> shift).astype(np.int64)
        return _lb(batch) * n_hb + hb

    prefix = _bucket_prefix_counts(ds, key_of, n_lb * n_hb)
    # re-base each partition's prefix to ITS OWN first slot so the rank
    # restarts at 0 per partition (PARTITION BY semantics); with one
    # partition the first slot's prefix is 0 and this is the identity
    slot_prefix = prefix[: n_lb * n_hb].reshape(n_lb, n_hb)
    slot_prefix = slot_prefix - slot_prefix[:, :1]
    prefix_ref = ray.put(slot_prefix.reshape(-1))

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        pri = _duckdb_hash_i64(ids)
        hb = (pri >> shift).astype(np.int64)
        lb = _lb(batch)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "_pri": pa.array(pri, pa.uint64()),
                "_lb": pa.array(lb, pa.int64()),
                "_bucket": pa.array(lb * n_hb + hb, pa.int64()),
            }
        )

    def rank_group(g: pa.Table) -> pa.Table:
        import pandas as pd

        if isinstance(g, pd.DataFrame):
            g = pa.Table.from_pandas(g, preserve_index=False)
        bucket = int(g["_bucket"][0].as_py())
        ids = g[id_col].to_numpy(zero_copy_only=False)
        pri = g["_pri"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, pri))
        base = ray.get(prefix_ref)[bucket]
        rank = np.empty(len(ids), np.int64)
        rank[order] = base + np.arange(len(ids), dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "_lb": g["_lb"],
                "_rank": pa.array(rank, pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(rank_group, batch_format="pyarrow")
    )


def length_curriculum(
    source: str | ray.data.Dataset,
    boundaries: tuple[int, ...] = (200, 500, 1000),
    batch_size: int = 32,
    count_col: str = "n_chars",
    id_col: str = "doc_id",
    bits: int = 6,
) -> ray.data.Dataset:
    """Length-bucketed batch assignment (curriculum / padding-efficiency
    batching): documents are binned by ``count_col`` against ``boundaries``
    (bucket b holds boundaries[b-1] <= n < boundaries[b]), then WITHIN each
    length bucket ordered by the deterministic shuffle ``(hash(id), id)`` and
    cut into batches of ``batch_size``.  Batches therefore contain
    similarly-sized documents (minimal padding waste) in a reproducible,
    shard-independent order.

    Distributed as the same two-pass prefix scan as :func:`shuffle_rank`,
    with the composite bucket ``(length_bucket, hash_prefix)`` so the
    within-length-bucket rank needs no global sort.  Output: ``(id,
    length_bucket, batch_idx)``.
    """
    bounds = np.asarray(boundaries, dtype=np.int64)
    ds = _read_docs(source, [id_col, count_col])

    def lb_of(batch: pa.Table) -> np.ndarray:
        n = batch[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return np.searchsorted(bounds, n, side="right").astype(np.int64)

    ranked = _prefix_scan_rank(ds, id_col, bits, lb_of=lb_of,
                               n_lb=len(bounds) + 1)

    def emit(batch: pa.Table) -> pa.Table:
        rank = batch["_rank"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch[id_col],
                "length_bucket": batch["_lb"],
                "batch_idx": pa.array(rank // batch_size, pa.int64()),
            }
        )

    return ranked.map_batches(emit, batch_format="pyarrow").sort(id_col)


# ---------------------------------------------------------------------------
# bigram-LM quality scoring (CCNet-style perplexity filter)
# ---------------------------------------------------------------------------


def _word_indices(texts, vocab_idx) -> tuple[np.ndarray, np.ndarray]:
    """Lower/whitespace-split a batch of texts (the corpus-wide word
    contract shared with ``vocab_topk``) and map each word to its vocab
    index, V for out-of-vocabulary.  Returns ``(flat_idx, parent)``."""
    import pandas as pd

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.utf8_split_whitespace(pc.utf8_lower(texts))
    flat = words.flatten()
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat, parent = flat.filter(pa.array(keep)), parent[keep]
    V = len(vocab_idx)
    if len(flat) == 0:
        return np.zeros(0, np.int64), parent
    # C-level hash lookup (pandas Index), not a Python loop over words
    idx = vocab_idx.get_indexer(flat.to_numpy(zero_copy_only=False))
    return np.where(idx < 0, V, idx).astype(np.int64), parent


def _lp_e6(c2p: np.ndarray, denom: np.ndarray) -> np.ndarray:
    """``round_even(ln(c2p/denom)*1e6, 0)`` as int64, computed by DuckDB's
    own ln/round kernels (the ``round4`` pattern): numpy's SIMD log can
    differ from libm by an ulp, and a scaled-integer score must match the
    SQL oracle bit-for-bit."""
    from .dedup import _duckdb_hash_con

    if len(c2p) == 0:
        return np.zeros(0, np.int64)
    con = _duckdb_hash_con()
    t = pa.table(
        {"a": pa.array(c2p, pa.int64()), "b": pa.array(denom, pa.int64())}
    )
    con.register("_lm_lp_in", t)
    out = con.execute(
        "SELECT CAST(round_even(ln(CAST(a AS DOUBLE)/CAST(b AS DOUBLE))"
        "*1000000, 0) AS BIGINT) AS lp FROM _lm_lp_in"
    ).fetch_arrow_table()
    con.unregister("_lm_lp_in")
    return out["lp"].to_numpy(zero_copy_only=False)


def lm_score(
    source: str | ray.data.Dataset,
    ref_mod: int = 5,
    vocab_size: int = 1000,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """CCNet-style bigram language-model quality score: train an add-one-
    smoothed bigram LM on the reference slice (``doc_id % ref_mod == 0`` — a
    deterministic stand-in for the "clean" target-domain corpus) and score
    EVERY document's negative log-likelihood under it.  High NLL per bigram
    = far from the reference distribution = low-quality / out-of-domain —
    the standard web-corpus quality gate.

    Output: ``(doc_id, n_bigrams, nll_e6)`` where ``nll_e6`` is the negated
    SUM of per-bigram ``round_even(ln P * 1e6)`` INTEGERS — scaled-integer
    log-probs make the per-document sum order-independent, so the score is
    exactly SQL-reproducible (float sums are not, under reassociation).

    Model: ``P(w2|w1) = (c2(w1,w2)+1) / (c1(w1) + V+1)`` with ``c1`` the
    bigram-left occurrence count, both over the reference slice after
    mapping non-vocab words to the single ``<unk>`` class (vocab = top
    ``vocab_size`` reference words by count desc, word asc).

    Scale shape: vocabulary and bigram-count build are per-batch partial
    counts + one bounded ``groupby`` each (distinct observed bigrams ≤
    (V+1)², ~16 MB at V=1000); the model broadcasts once via ``ray.put``;
    scoring is a single streamed ``map_batches`` over the corpus — no
    shuffle touches full rows.  The reference slice is deliberately
    re-SCANNED for the two (inherently ordered) model-build passes rather
    than materialized: at corpus scale the slice is still terabytes, and a
    second column-pruned read streams where a ``materialize()`` would camp
    on the object store.
    """
    import pandas as pd

    ds = _read_docs(source, [id_col, "text"])
    V = int(vocab_size)
    Vp1 = V + 1

    def ref_only(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % ref_mod == 0))

    ref = ds.map_batches(ref_only, batch_format="pyarrow")
    vocab_tbl = vocab_topk(ref.select_columns(["text"]), k=V).to_pandas()  # bounded: top-V vocab
    vocab_idx = pd.Index(vocab_tbl["word"].to_numpy())
    vocab_ref = ray.put(vocab_idx)

    def ref_bigram_counts(batch: pa.Table) -> pa.Table:
        idx, parent = _word_indices(batch["text"], ray.get(vocab_ref))
        if len(idx) < 2:
            return pa.table({"key": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        same = parent[:-1] == parent[1:]
        keys = idx[:-1][same] * Vp1 + idx[1:][same]
        uniq, cnt = np.unique(keys, return_counts=True)
        return pa.table({"key": pa.array(uniq, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    c2_rows = (
        ref.map_batches(ref_bigram_counts, batch_format="pyarrow")
        .groupby("key")
        .sum("cnt")
        .to_pandas()  # bounded: distinct observed reference bigrams
    )
    c2_keys = c2_rows["key"].to_numpy().astype(np.int64)
    c2_cnts = c2_rows["sum(cnt)"].to_numpy().astype(np.int64)
    order = np.argsort(c2_keys)
    c2_keys, c2_cnts = c2_keys[order], c2_cnts[order]
    c1 = np.zeros(Vp1, np.int64)
    np.add.at(c1, c2_keys // Vp1, c2_cnts)
    model_ref = ray.put((c2_keys, c2_cnts, c1))

    def score(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        idx, parent = _word_indices(batch["text"], ray.get(vocab_ref))
        n_docs = len(ids)
        if len(idx) < 2:
            zero = np.zeros(n_docs, np.int64)
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             "n_bigrams": pa.array(zero),
                             "nll_e6": pa.array(zero)})
        keys_sorted, cnts_sorted, c1_arr = ray.get(model_ref)
        same = parent[:-1] == parent[1:]
        i1 = idx[:-1][same]
        keys = i1 * Vp1 + idx[1:][same]
        bg_parent = parent[:-1][same]
        if len(keys_sorted):
            pos = np.minimum(np.searchsorted(keys_sorted, keys),
                             len(keys_sorted) - 1)
            c2 = np.where(keys_sorted[pos] == keys, cnts_sorted[pos], 0)
        else:
            c2 = np.zeros(len(keys), np.int64)
        lp = _lp_e6(c2 + 1, c1_arr[i1] + Vp1)
        n_bg = np.bincount(bg_parent, minlength=n_docs).astype(np.int64)
        # pure int64 accumulation: bincount's float64 weights would lose
        # exactness (and order-independence) past 2^53 on huge documents
        s = np.zeros(n_docs, np.int64)
        np.add.at(s, bg_parent, lp)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_bigrams": pa.array(n_bg),
                         "nll_e6": pa.array(-s)})

    return ds.map_batches(score, batch_format="pyarrow").sort(id_col)


# ---------------------------------------------------------------------------
# Bloom-filter incremental dedup
# ---------------------------------------------------------------------------


def bloom_novel(
    source: str | ray.data.Dataset,
    ref_mod: int = 5,
    m_bits: int = 65536,
    k: int = 3,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Incremental-ingest dedup: probe each NEW document against a Bloom
    filter built over the already-ingested reference slice (``doc_id %
    ref_mod == 0`` — the stand-in for yesterday's corpus).  ``novel=false``
    means "probably seen" (all ``k`` bits set); false positives are the
    filter's usual price and — because the bit positions come from DuckDB's
    own hash kernel via double hashing ``(h1 + j*h2) % m`` — they are
    deterministic and exactly SQL-reproducible, so even the FP outcomes are
    oracle-checkable.

    Scale shape: this is how a 100 TB daily ingest asks "which of today's
    documents did any previous day already contain" WITHOUT a shuffle join
    against the historical corpus — the historical side is compressed to
    ``m_bits`` once (per-batch partial bitmaps of <= m_bits/64 uint64 words,
    a bounded ``groupby`` OR-merge of <= m_bits/64 rows, one ``ray.put``),
    and the probe is a single streamed ``map_batches``.  Size ``m_bits`` to
    the FP budget (~0.1% at m/n=15, k=3).

    Output: ``(doc_id, novel)`` for every non-reference document.
    """
    m = int(m_bits)
    if m < 64 or m % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64: {m}")
    n_words = m // 64
    ds = _read_docs(source, [id_col, "text"])

    def _positions(texts) -> np.ndarray:
        """(n, k) bit positions via double hashing of the document text."""
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h1 = _duckdb_word_hash(texts) % np.uint64(m)
        salted = pc.binary_join_element_wise(texts, "\x01", "")
        h2 = _duckdb_word_hash(salted) % np.uint64(m)
        j = np.arange(k, dtype=np.uint64)[None, :]
        return (h1[:, None] + j * h2[:, None]) % np.uint64(m)

    def ref_bits(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mask = ids % ref_mod == 0
        if not mask.any():
            return pa.table({"w": pa.array([], pa.int64()),
                             "bits": pa.array([], pa.uint64())})
        pos = _positions(batch["text"].filter(pa.array(mask))).ravel()
        bitmap = np.zeros(n_words, np.uint64)
        np.bitwise_or.at(bitmap, (pos // 64).astype(np.int64),
                         np.uint64(1) << (pos % np.uint64(64)))
        nz = np.nonzero(bitmap)[0]
        return pa.table({"w": pa.array(nz, pa.int64()),
                         "bits": pa.array(bitmap[nz], pa.uint64())})

    def or_merge(g: pa.Table) -> pa.Table:
        import pandas as pd

        if isinstance(g, pd.DataFrame):
            g = pa.Table.from_pandas(g, preserve_index=False)
        bits = np.bitwise_or.reduce(
            g["bits"].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        return pa.table({"w": g["w"].slice(0, 1),
                         "bits": pa.array([bits], pa.uint64())})

    rows = (
        ds.map_batches(ref_bits, batch_format="pyarrow")
        .groupby("w")
        .map_groups(or_merge, batch_format="pyarrow")
        .to_pandas()  # bounded: <= m_bits/64 rows
    )
    bitmap = np.zeros(n_words, np.uint64)
    if len(rows):
        bitmap[rows["w"].to_numpy().astype(np.int64)] = rows["bits"].to_numpy().astype(
            np.uint64
        )
    bitmap_ref = ray.put(bitmap)

    def probe(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mask = ids % ref_mod != 0
        ids = ids[mask]
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "novel": pa.array([], pa.bool_())})
        pos = _positions(batch["text"].filter(pa.array(mask)))
        bm = ray.get(bitmap_ref)
        set_ = (bm[(pos // 64).astype(np.int64)]
                >> (pos % np.uint64(64))) & np.uint64(1)
        novel = (set_ == 0).any(axis=1)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "novel": pa.array(novel)})

    return ds.map_batches(probe, batch_format="pyarrow").sort(id_col)


# ---------------------------------------------------------------------------
# context-window chunking, mixture upsampling
# ---------------------------------------------------------------------------


def chunk_windows(
    source: str | ray.data.Dataset,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Split each document's whitespace tokens into fixed-size context
    windows of ``window`` tokens starting every ``stride`` tokens (overlap
    when ``stride < window``) — the chunking stage that turns documents into
    model-context-sized training/retrieval units, distinct from
    ``pack_sequences`` (which concatenates ACROSS documents).

    Fully vectorized: Arrow splits the batch's texts once, numpy builds the
    flat gather index for every chunk of every document
    (``_ragged_range``), one ``take`` re-materializes the overlapped word
    ranges, and ``pc.binary_join`` rejoins each chunk — no Python loop over
    documents or words.  A pure streamed ``map_batches``: no shuffle, no
    state, each batch emits only its own chunks, so the stage holds at 100 TB
    (the final sort is for the oracle's deterministic order only; a real
    pipeline feeds the chunks straight to the next stage unsorted).

    Output: ``(doc_id, chunk_idx, n_chunk_tokens, chunk_text)``; documents
    with no tokens emit no rows.
    """
    if window < 1 or stride < 1:
        raise ValueError(f"window and stride must be >= 1: {window}, {stride}")

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        lists = pc.utf8_split_whitespace(texts)
        flat = pc.list_flatten(lists)
        raw_counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        raw_counts = raw_counts.astype(np.int64)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        # per-doc nonempty word count + start offset into the kept-word array
        cum = np.concatenate(([0], np.cumsum(nonempty, dtype=np.int64)))
        ends = np.cumsum(raw_counts)
        starts_raw = ends - raw_counts
        n_words = cum[ends] - cum[starts_raw]
        kept = flat.filter(pa.array(nonempty))
        kept_start = cum[starts_raw]
        # chunk fan-out: ceil(n/stride) starts strictly below n
        n_chunks = np.where(n_words > 0, (n_words - 1) // stride + 1, 0)
        doc_idx = np.repeat(np.arange(len(ids)), n_chunks)
        chunk_idx = _ragged_range(np.zeros(len(ids), np.int64), n_chunks)
        rel_start = chunk_idx * stride
        clen = np.minimum(window, n_words[doc_idx] - rel_start)
        flat_idx = _ragged_range(kept_start[doc_idx] + rel_start, clen)
        chunk_words = kept.take(pa.array(flat_idx, pa.int64()))
        offsets = np.concatenate(([0], np.cumsum(clen)))
        chunk_list = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), chunk_words
        )
        return pa.table(
            {
                id_col: pa.array(ids[doc_idx], pa.int64()),
                "chunk_idx": pa.array(chunk_idx, pa.int64()),
                "n_chunk_tokens": pa.array(clen, pa.int64()),
                "chunk_text": pc.binary_join(chunk_list, " "),
            }
        )

    return (
        _read_docs(source, [id_col, "text"])
        .map_batches(fn, batch_format="pyarrow")
        .sort([id_col, "chunk_idx"])
    )


def sample_mixture(
    source: str | ray.data.Dataset,
    weights: dict[str, int] | None = None,
    default: int = 1000,
    mod: int = 1000,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Mixture RESAMPLING with repetition factors: a per-source weight in
    permille may exceed 1000, so a source can be UPSAMPLED (each document
    emitted ``w // 1000`` times plus one more iff ``hash(doc_id) % 1000 <
    w % 1000``) — how published training mixtures repeat high-quality
    sources (e.g. Wikipedia x3) while downsampling bulk crawl, in one
    deterministic stateless pass.

    Complements ``sample_quota`` (keep/drop only, w <= mod).  The Bernoulli
    arm uses DuckDB's own ``hash`` kernel so the emitted multiset is exactly
    SQL-reproducible; expected copies = w/mod per document.  Pure streamed
    ``map_batches`` fan-out (``np.repeat``): no shuffle, no state, identical
    output across reruns, partitionings and cluster sizes.

    Output: ``(doc_id, source, epoch)`` with ``epoch`` in ``[0, n_copies)``.
    """
    weights = weights or {}

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        src = batch["source"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        w = np.array([weights.get(s, default) for s in uniq], np.int64)[inv]
        frac = (_duckdb_hash_i64(ids) % np.uint64(mod)).astype(np.int64) < (w % mod)
        n_copies = w // mod + frac
        doc_idx = np.repeat(np.arange(len(ids)), n_copies)
        epoch = _ragged_range(np.zeros(len(ids), np.int64), n_copies)
        return pa.table(
            {
                id_col: pa.array(ids[doc_idx], pa.int64()),
                "source": pa.array(src[doc_idx], pa.string()),
                "epoch": pa.array(epoch, pa.int64()),
            }
        )

    return (
        _read_docs(source, [id_col, "source"])
        .map_batches(fn, batch_format="pyarrow")
        .sort([id_col, "epoch"])
    )


# ---------------------------------------------------------------------------
# token-budget planning: weighted prefix scan, token sharding, token quotas
# ---------------------------------------------------------------------------


def _token_counts(batch: pa.Table) -> np.ndarray:
    """Whitespace token count per row (maximal non-whitespace runs), the
    same convention as ``text.token_count`` / the oracles'
    ``list_filter(string_split_regex(text, '\\s+'), x -> x <> '')``."""
    n = pc.count_substring_regex(batch["text"], r"\S+")
    return n.to_numpy(zero_copy_only=False).astype(np.int64)


def _weighted_prefix_scan(
    ds: ray.data.Dataset,
    id_col: str,
    weight_of,  # batch -> int64 weight per row
    bits: int = 8,
    lb_of=None,  # batch -> int64 partition index per row (None = global)
    n_lb: int = 1,
):
    """Weighted sibling of :func:`_prefix_scan_rank`: for every row, the SUM
    of weights of all rows strictly BEFORE it in ``(hash(id), id)`` order
    (restarting per ``lb_of`` partition) — the distributed exclusive prefix
    sum that token-budget planning runs on.

    Same two-pass shape: (1) per-composite-bucket weight totals (driver
    state ``n_lb * 2**bits`` int64s); (2) each bucket independently sorts
    its rows by ``(hash, id)`` and cumsums, offset by the bucket's exclusive
    prefix.  One shuffle, no global sort.  Returns a Dataset with
    ``(id_col, _lb, _w, _cum_prev)``.
    """
    n_hb = 1 << bits
    shift = np.uint64(64 - bits)

    def _lb(batch: pa.Table) -> np.ndarray:
        if lb_of is None:
            return np.zeros(len(batch), np.int64)
        return lb_of(batch)

    def slot_partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        hb = (_duckdb_hash_i64(ids) >> shift).astype(np.int64)
        slot = _lb(batch) * n_hb + hb
        w = weight_of(batch)
        uniq, inv = np.unique(slot, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, w)
        return pa.table({"bucket": pa.array(uniq, pa.int64()),
                         "w": pa.array(tot, pa.int64())})

    rows = (
        ds.map_batches(slot_partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum("w")
        .take_all()  # bounded: <= n_lb * 2**bits rows
    )
    tot = np.zeros(n_lb * n_hb + 1, dtype=np.int64)
    for r in rows:
        tot[int(r["bucket"])] = int(r["sum(w)"])
    prefix = np.concatenate(([0], np.cumsum(tot)[:-1]))
    # re-base each partition to its own first slot (PARTITION BY semantics)
    slot_prefix = prefix[: n_lb * n_hb].reshape(n_lb, n_hb)
    slot_prefix = slot_prefix - slot_prefix[:, :1]
    prefix_ref = ray.put(slot_prefix.reshape(-1))

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        pri = _duckdb_hash_i64(ids)
        hb = (pri >> shift).astype(np.int64)
        lb = _lb(batch)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "_pri": pa.array(pri, pa.uint64()),
                "_lb": pa.array(lb, pa.int64()),
                "_w": pa.array(weight_of(batch), pa.int64()),
                "_bucket": pa.array(lb * n_hb + hb, pa.int64()),
            }
        )

    def scan_group(g: pa.Table) -> pa.Table:
        import pandas as pd

        if isinstance(g, pd.DataFrame):
            g = pa.Table.from_pandas(g, preserve_index=False)
        bucket = int(g["_bucket"][0].as_py())
        ids = g[id_col].to_numpy(zero_copy_only=False)
        pri = g["_pri"].to_numpy(zero_copy_only=False)
        w = g["_w"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, pri))
        base = ray.get(prefix_ref)[bucket]
        cum_prev = np.empty(len(ids), np.int64)
        cum_prev[order] = base + np.cumsum(w[order]) - w[order]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "_lb": g["_lb"],
                "_w": pa.array(w, pa.int64()),
                "_cum_prev": pa.array(cum_prev, pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(scan_group, batch_format="pyarrow")
    )


def token_shards(
    source: str | ray.data.Dataset,
    shard_tokens: int = 20000,
    id_col: str = "doc_id",
    bits: int = 8,
) -> ray.data.Dataset:
    """Token-BALANCED output sharding: assign every document to shard
    ``floor(tokens_before / shard_tokens)`` where ``tokens_before`` is the
    total token count of all documents strictly before it in the
    deterministic ``(hash(id), id)`` order — so each output shard carries
    ~``shard_tokens`` tokens regardless of document-length skew (doc-count
    sharding leaves shards 10x apart on a web corpus).

    The assignment is a pure function of the ids and lengths: identical
    across reruns, partitionings and cluster sizes, and computed as the
    two-pass weighted prefix scan (driver state: ``2**bits`` int64s) — no
    global sort, no materialization.  Output:
    ``(doc_id, n_tok, shard)`` sorted by id.
    """
    if shard_tokens < 1:
        raise ValueError(f"shard_tokens must be >= 1: {shard_tokens}")
    ds = _read_docs(source, [id_col, "text"])
    scanned = _weighted_prefix_scan(ds, id_col, _token_counts, bits=bits)

    def emit(batch: pa.Table) -> pa.Table:
        cum = batch["_cum_prev"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tok": batch["_w"],
                "shard": pa.array(cum // shard_tokens, pa.int64()),
            }
        )

    return scanned.map_batches(emit, batch_format="pyarrow").sort(id_col)


def token_quota(
    source: str | ray.data.Dataset,
    budgets: dict[str, int] | None = None,
    default_budget: int = 1 << 62,
    id_col: str = "doc_id",
    bits: int = 6,
) -> ray.data.Dataset:
    """Per-source TOKEN budgets (mixture planning in tokens, not documents):
    within each source, documents are taken in deterministic
    ``(hash(id), id)`` order until the source's token budget is reached — a
    document is kept iff the tokens consumed before it are still under
    budget (the boundary document is kept, then the source closes).

    ``sample_quota`` caps document COUNTS; real mixture specs are written in
    tokens.  Same deterministic-scan shape: one bounded pass discovers the
    source list, then the weighted prefix scan restarts per source
    (driver state ``n_sources * 2**bits`` int64s).  Output:
    ``(doc_id, source, n_tok, keep)`` sorted by id.
    """
    budgets = budgets or {}
    ds = _read_docs(source, [id_col, "source", "text"])

    def src_partial(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch["source"])
        return pa.table({"source": u})

    srcs = sorted(
        r["source"]
        for r in ds.select_columns(["source"])
        .map_batches(src_partial, batch_format="pyarrow")
        .groupby("source")
        .count()
        .take_all()  # bounded: one row per source
    )
    src_idx = {s: i for i, s in enumerate(srcs)}
    budget_arr = np.array(
        [int(budgets.get(s, default_budget)) for s in srcs], np.int64
    )
    src_ref = ray.put(src_idx)

    def lb_of(batch: pa.Table) -> np.ndarray:
        m = ray.get(src_ref)
        src = batch["source"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        return np.array([m[s] for s in uniq], np.int64)[inv]

    scanned = _weighted_prefix_scan(
        ds, id_col, _token_counts, bits=bits, lb_of=lb_of, n_lb=len(srcs)
    )
    budget_ref = ray.put(budget_arr)
    src_names_ref = ray.put(np.array(srcs, dtype=object))

    def emit(batch: pa.Table) -> pa.Table:
        lb = batch["_lb"].to_numpy(zero_copy_only=False)
        cum = batch["_cum_prev"].to_numpy(zero_copy_only=False)
        names = ray.get(src_names_ref)
        return pa.table(
            {
                id_col: batch[id_col],
                "source": pa.array(names[lb].astype(str)),
                "n_tok": batch["_w"],
                "keep": pa.array(cum < ray.get(budget_ref)[lb]),
            }
        )

    return scanned.map_batches(emit, batch_format="pyarrow").sort(id_col)


# ---------------------------------------------------------------------------
# per-source distribution drift
# ---------------------------------------------------------------------------


def source_divergence(
    source: str | ray.data.Dataset,
    vocab_size: int = 200,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-source KL divergence from the corpus unigram distribution — the
    mixture drift/quality report ("which sources look least like the
    corpus") that decides reweighting before training (cf. DoReMi-style
    domain weighting, which optimizes exactly this kind of per-domain
    distribution gap).

    Distributions are add-one-smoothed over the top-``vocab_size`` corpus
    words (``vocab_topk`` order: count desc, word asc; OOV words are
    excluded from both sides): ``P_s(w) = (c_s(w)+1)/(n_s+V)`` against
    ``Q(w) = (c(w)+1)/(n+V)``, ``KL = sum_w P_s ln(P_s/Q)``.

    Scale shape: the corpus-wide vocabulary is the existing bounded
    ``vocab_topk`` pass; per-(source, word) counts shrink to per-batch
    partials before one bounded ``groupby`` (<= n_sources * V rows); the
    final arithmetic runs over that bounded grid in the in-process DuckDB
    kernel, with each (source, word) term ``round_even``-scaled to int64 so
    the per-source sum is order-independent and the whole report exactly
    SQL-reproducible.

    Output: ``(source, n_vocab_tok, kl_e9)`` sorted by source.
    """
    import pandas as pd

    ds = _read_docs(source, ["source", "text"])
    V = int(vocab_size)
    vocab_pd = vocab_topk(ds.select_columns(["text"]), k=V).to_pandas()  # bounded: top-V vocab
    vocab_idx = pd.Index(vocab_pd["word"].to_numpy())
    vocab_ref = ray.put(vocab_idx)

    def partial(batch: pa.Table) -> pa.Table:
        vi = ray.get(vocab_ref)
        src = batch["source"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        idx, parent = _word_indices(batch["text"], vi)
        keep = idx < len(vi)  # vocab words only
        if not keep.any():
            return pa.table({"source": pa.array([], pa.string()),
                             "widx": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        sidx = inv[parent[keep]].astype(np.int64)
        key = sidx * len(vi) + idx[keep]
        ukey, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "source": pa.array(uniq[(ukey // len(vi))].astype(str)),
                "widx": pa.array(ukey % len(vi), pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    cnts_pd = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "widx"])
        .sum("cnt")
        .to_pandas()  # bounded: <= n_sources * V rows
        .rename(columns={"sum(cnt)": "cnt"})
    )
    cnts_pd["word"] = vocab_idx.to_numpy()[cnts_pd["widx"].to_numpy()]

    from .dedup import _duckdb_hash_con

    con = _duckdb_hash_con()
    con.register("_kl_cnts", pa.Table.from_pandas(
        cnts_pd[["source", "word", "cnt"]], preserve_index=False))
    con.register("_kl_vocab", pa.Table.from_pandas(
        vocab_pd.rename(columns={"cnt": "ccnt"}), preserve_index=False))
    # identical expression tree to the SQL oracle's final SELECT
    out = con.execute(
        f"""
        WITH src AS (
          SELECT source, CAST(sum(cnt) AS BIGINT) AS ns FROM _kl_cnts GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(ccnt) AS BIGINT) AS n FROM _kl_vocab),
        grid AS (
          SELECT s.source, s.ns, v.ccnt, COALESCE(c.cnt, 0) AS cs
          FROM src s CROSS JOIN _kl_vocab v
          LEFT JOIN _kl_cnts c ON c.source = s.source AND c.word = v.word
        ),
        terms AS (
          SELECT source, ns,
                 CAST(round_even(
                   ((cs + 1.0) / (ns + {V})) *
                   ln(((cs + 1.0) / (ns + {V})) / ((ccnt + 1.0) / (n + {V}))) *
                   1000000000.0, 0) AS BIGINT) AS t
          FROM grid CROSS JOIN tot
        )
        SELECT source, CAST(any_value(ns) AS BIGINT) AS n_vocab_tok,
               CAST(sum(t) AS BIGINT) AS kl_e9
        FROM terms GROUP BY 1 ORDER BY source
        """
    ).fetch_arrow_table()
    con.unregister("_kl_cnts")
    con.unregister("_kl_vocab")
    return ray.data.from_arrow(out)


def poly_window_hashes(
    vals: np.ndarray, off: np.ndarray, w: int, stride: int, p: int = 1_000_003
) -> tuple[np.ndarray, np.ndarray]:
    """Polynomial hashes of every ``w``-token window at ``stride`` offsets
    over a ragged batch (``vals`` flat int64 token buffer, ``off`` absolute
    row offsets): ``h = sum_k tok[s+k] * p^(w-1-k) mod 2^64``.

    Pure uint64 wraparound arithmetic — bit-equal to a HUGEINT-sum-mod-2^64
    in SQL, which is what makes ``dup_token_windows`` exactly oracle-able.
    Returns ``(row_idx, h)`` int64/uint64 arrays, one entry per window.
    """
    pw = np.empty(w, dtype=np.uint64)
    pw[w - 1] = np.uint64(1)
    with np.errstate(over="ignore"):
        for k in range(w - 2, -1, -1):
            pw[k] = pw[k + 1] * np.uint64(p)
    n_tok = off[1:] - off[:-1]
    counts = np.maximum((n_tok - w) // stride + 1, 0)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    row_idx = np.repeat(np.arange(len(n_tok), dtype=np.int64), counts)
    excl = np.concatenate(([0], np.cumsum(counts)[:-1]))
    within = (np.arange(total, dtype=np.int64) - np.repeat(excl, counts)) * stride
    s_abs = off[:-1][row_idx] + within
    h = np.zeros(total, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(w):
            h += vals[s_abs + k].astype(np.uint64) * pw[k]
    return row_idx, h


def dup_token_windows(
    source: str | ray.data.Dataset,
    w: int = 16,
    stride: int = 8,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Verbatim-memorization span detection over the PRE-TOKENIZED sequence
    table (the engine's primary ``(doc_id, tokens, n_tok, source)`` input):
    hash every ``w``-token window at ``stride`` offsets and report, per
    document, how many of its windows also occur verbatim in ANOTHER
    document — the token-level analog of ``dedup_spans``'s trigram scan,
    run directly on token ids so it catches duplicated training sequences
    regardless of the text they detokenize to.

    The window hash is a plain polynomial hash mod 2^64 (P = 1000003):
    numpy uint64 wraparound arithmetic and the SQL oracle's
    HUGEINT-sum-mod-2^64 compute identical values, so the operator is
    exactly oracle-able with no DuckDB hash round-trip in the hot loop.

    Scale shape: windows never leave their batch as payloads — only
    ``(h, doc, cnt)`` triples shuffle (one bounded groupby per unique
    (h, doc), one count-per-h groupby, one hash join to flag shared
    hashes, one per-doc sum).  A document's windows are computed entirely
    inside its own batch row; the token buffer is read zero-copy from the
    Arrow list column.

    Output: ``(doc_id, n_windows, dup_windows)`` for every document with
    at least one window (``n_tok >= w``), sorted by id.
    """
    import pandas as pd

    W, S = int(w), int(stride)
    ds = (
        ray.data.read_parquet(source, columns=[id_col, "tokens", "n_tok"])
        if isinstance(source, str)
        else source
    )

    def win_partials(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = tokens.values.to_numpy(zero_copy_only=False).astype(np.int64)
        row_idx, h = poly_window_hashes(vals, off, W, S)
        if len(h) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             id_col: pa.array([], batch[id_col].type),
                             "c": pa.array([], pa.int64())})
        # unique (h, doc) with counts — pandas C groupby, no Python loop
        g = (
            pd.DataFrame({"h": h.view(np.int64), "r": row_idx})
            .groupby(["h", "r"], sort=False)
            .size()
            .reset_index(name="c")
        )
        ids = batch[id_col].combine_chunks() if isinstance(
            batch[id_col], pa.ChunkedArray) else batch[id_col]
        return pa.table(
            {
                "h": pa.array(g["h"].to_numpy(), pa.int64()),
                id_col: ids.take(pa.array(g["r"].to_numpy())),
                "c": pa.array(g["c"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    # All rows of a window hash co-locate in ONE hash bucket (64 Ray groups),
    # where a C-speed pandas groupby marks shared hashes and pre-sums per-doc
    # partials — the whole operator is a single lazy lineage (read -> hash ->
    # bucket shuffle -> per-doc sum -> sort), so the ~2-4 s fixed cost of a
    # Ray Dataset execution is paid once, not per stage (the previous
    # materialize + count-join shape paid it 3-4x; (h, doc, cnt) triples are
    # still the only payload that ever shuffles).
    NB = np.uint64(64)

    def add_bucket(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "_bucket", pa.array((h % NB).astype(np.int64), pa.int64())
        )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        ndocs = g.groupby("h")["c"].transform("size")  # (h, doc) unique rows
        c = g["c"].to_numpy()
        part = pd.DataFrame(
            {
                id_col: g[id_col],
                "nw": c,
                "dw": np.where(ndocs.to_numpy() >= 2, c, 0),
            }
        )
        # return ARROW, not pandas: a downstream sort-aggregate over pandas
        # object-dtype string blocks is ~8x slower than over Arrow string
        # columns (measured 42 s vs 5 s on this very stage)
        return pa.Table.from_pandas(
            part.groupby(id_col, as_index=False).sum(), preserve_index=False
        )

    out = (
        ds.map_batches(win_partials, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(id_col)
        .sum(["nw", "dw"])
        .map_batches(
            lambda b: b.rename_columns([id_col, "n_windows", "dup_windows"]),
            batch_format="pyarrow",
        )
    )
    return out.sort(id_col)


def dedup_exact_tokens(
    source: str | ray.data.Dataset,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Exact dedup of pre-tokenized TRAINING SEQUENCES: survivors = min id
    per identical token array (the token-id analog of ``dedup_exact`` —
    catches duplicated sequences regardless of detokenized text).

    The dedup key is the comma-joined token string, built with two Arrow
    kernels (cast + binary_join) — injective for int arrays, so two
    distinct sequences can never merge; routing and in-bucket comparison
    reuse ``bucketed_distinct``'s shuffle (key bytes ~ token bytes, so the
    string key adds no asymptotic cost over shipping the arrays).

    Output: surviving ``(doc_id, n_tok, source)`` sorted by id — the keep
    manifest; the payload is re-read by id downstream rather than shipped
    through the shuffle twice.
    """
    ds = (
        ray.data.read_parquet(source, columns=[id_col, "tokens", "n_tok", "source"])
        if isinstance(source, str)
        else source
    )

    def key(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        strs = pa.ListArray.from_arrays(
            tokens.offsets, pc.cast(tokens.values, pa.string())
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tok": batch["n_tok"],
                "source": batch["source"],
                "tok_key": pc.binary_join(strs, ","),
            }
        )

    from ..ops.common import bucketed_distinct

    surv = bucketed_distinct(
        ds.map_batches(key, batch_format="pyarrow"), ["tok_key"], [id_col]
    )
    return surv.select_columns([id_col, "n_tok", "source"]).sort(id_col)


def decontaminate_tokens(
    corpus: str | ray.data.Dataset,
    benchmark: str | ray.data.Dataset,
    w: int = 13,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """TOKEN-level benchmark decontamination (the GPT-3/PaLM recipe applied
    to the engine's pre-tokenized sequence table): flag every training
    document sharing ANY verbatim ``w``-token window (stride 1 — every
    position, not a sampled grid) with the held-out benchmark corpus.

    The text-shingle sibling is :func:`decontaminate`; this one runs on
    token ids, so it catches contamination regardless of tokenizer-invisible
    text differences, and its window hash is the same polynomial mod-2^64
    as :func:`dup_token_windows` — bit-equal to a HUGEINT sum in SQL, so the
    operator is exactly oracle-able.

    Scale shape: a benchmark is MBs against a TB corpus, so its distinct
    window-hash set is collected once (bounded by benchmark size BY
    DEFINITION of the operator), sorted, and broadcast via ``ray.put``; the
    corpus side is ONE streamed ``map_batches`` doing a vectorized
    ``searchsorted`` membership test — no shuffle at all, and corpus tokens
    never leave their batch.

    Output: ``(doc_id, n_windows, dirty_windows, keep)`` for EVERY corpus
    document (docs shorter than ``w`` have 0 windows and keep=true),
    sorted by id.  ``dirty_windows`` counts window POSITIONS whose
    ``w``-gram occurs anywhere in the benchmark.
    """
    W = int(w)
    corp = (
        ray.data.read_parquet(corpus, columns=[id_col, "tokens"])
        if isinstance(corpus, str)
        else corpus
    )
    bench = (
        ray.data.read_parquet(benchmark, columns=["tokens"])
        if isinstance(benchmark, str)
        else benchmark
    )

    def bench_hashes(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = tokens.values.to_numpy(zero_copy_only=False).astype(np.int64)
        _, h = poly_window_hashes(vals, off, W, 1)
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    # bounded driver pull: distinct benchmark window hashes (benchmark ~MBs);
    # an all-empty benchmark yields pass-through blocks with the input schema
    b_tbls = [
        t
        for t in ray.get(
            bench.map_batches(bench_hashes, batch_format="pyarrow").to_arrow_refs()
        )
        if "h" in t.schema.names
    ]
    bset = (
        np.unique(
            pa.concat_tables(b_tbls)["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        if b_tbls
        else np.zeros(0, np.uint64)
    )
    bset_ref = ray.put(bset)

    def screen(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = tokens.values.to_numpy(zero_copy_only=False).astype(np.int64)
        nrows = len(batch)
        row_idx, h = poly_window_hashes(vals, off, W, 1)
        n_win = np.bincount(row_idx, minlength=nrows).astype(np.int64)
        ref = ray.get(bset_ref)
        if len(ref) and len(h):
            pos = np.searchsorted(ref, h)
            member = (pos < len(ref)) & (ref[np.minimum(pos, len(ref) - 1)] == h)
            dirty = np.bincount(row_idx[member], minlength=nrows).astype(np.int64)
        else:
            dirty = np.zeros(nrows, np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_windows": pa.array(n_win, pa.int64()),
                "dirty_windows": pa.array(dirty, pa.int64()),
                "keep": pa.array(dirty == 0),
            }
        )

    return corp.map_batches(screen, batch_format="pyarrow").sort(id_col)


_TW_META = "token_window_index.json"


def build_token_window_index(
    source: str | ray.data.Dataset,
    index_dir: str,
    w: int = 16,
    stride: int = 8,
    num_buckets: int = 32,
    id_col: str = "doc_id",
) -> dict:
    """Persist the training corpus's MEMORIZATION-SCREEN index: the distinct
    polynomial ``w``-token window hashes, hive-partitioned by a hash bucket
    (``hb = h % num_buckets``) so an ingest probe reads only the partitions
    its own window hashes fall in — the "build once, probe many" layout
    shared with the shingle and IVF indexes, applied to the token axis.

    Only distinct ``(h)`` values persist (with their corpus doc counts for
    reporting): the screen tests membership, so reference doc ids/text
    never enter the index and the index size is bounded by distinct
    windows, not corpus rows.
    """
    import json
    import os

    ds = (
        ray.data.read_parquet(source, columns=[id_col, "tokens"])
        if isinstance(source, str)
        else source
    )
    nb = np.uint64(num_buckets)
    W, S = int(w), int(stride)

    def win_rows(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = tokens.values.to_numpy(zero_copy_only=False).astype(np.int64)
        _, h = poly_window_hashes(vals, off, W, S)
        hu = np.unique(h)  # batch-level partial distinct
        return pa.table(
            {
                "h": pa.array(hu.view(np.int64), pa.int64()),
                "hb": pa.array((hu % nb).astype(np.int64), pa.int64()),
            }
        )

    os.makedirs(index_dir, exist_ok=True)
    (
        ds.map_batches(win_rows, batch_format="pyarrow")
        .groupby(["hb", "h"])
        .count()  # global distinct (count = corpus multiplicity by batch)
        .map_batches(
            lambda b: b.select(["hb", "h"]), batch_format="pyarrow"
        )
        .write_parquet(os.path.join(index_dir, "windows"),
                       partition_cols=["hb"])
    )
    meta = {"w": W, "stride": S, "num_buckets": num_buckets,
            "layout": "distinct-window-hash"}
    with open(os.path.join(index_dir, _TW_META), "w") as f:
        json.dump(meta, f)
    return meta


def token_windows_novel(
    source: str | ray.data.Dataset,
    index_dir: str,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Memorization screen for NEW pre-tokenized data against the persisted
    corpus window index: per ingest document, how many of its ``w``-token
    windows occur verbatim anywhere in the training corpus, and
    ``novel = (dup_windows == 0)``.

    IO shape: the ingest is hashed once (ints only, materialized — it feeds
    both the probe-partition list and the membership join); the index read
    is pruned to the ``hb`` partitions the ingest's hashes fall in; corpus
    tokens are never read.  Output: ``(doc_id, n_windows, dup_windows,
    novel)`` for every ingest doc with at least one window, sorted by id.
    """
    import json
    import os

    import pandas as pd

    from .join import hash_join

    with open(os.path.join(index_dir, _TW_META)) as f:
        meta = json.load(f)
    nb = int(meta["num_buckets"])
    W, S = int(meta["w"]), int(meta["stride"])

    ds = (
        ray.data.read_parquet(source, columns=[id_col, "tokens"])
        if isinstance(source, str)
        else source
    )

    def win_triples(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = tokens.values.to_numpy(zero_copy_only=False).astype(np.int64)
        row_idx, h = poly_window_hashes(vals, off, W, S)
        if len(h) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             id_col: pa.array([], batch[id_col].type),
                             "c": pa.array([], pa.int64())})
        g = (
            pd.DataFrame({"h": h.view(np.int64), "r": row_idx})
            .groupby(["h", "r"], sort=False)
            .size()
            .reset_index(name="c")
        )
        ids = batch[id_col].combine_chunks() if isinstance(
            batch[id_col], pa.ChunkedArray) else batch[id_col]
        return pa.table(
            {
                "h": pa.array(g["h"].to_numpy(), pa.int64()),
                id_col: ids.take(pa.array(g["r"].to_numpy())),
                "c": pa.array(g["c"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    triples = ds.map_batches(win_triples, batch_format="pyarrow").materialize()

    def probe_partial(t: pa.Table) -> pa.Table:
        hb = np.unique(
            t["h"].to_numpy(zero_copy_only=False).view(np.uint64)
            % np.uint64(nb)
        ).astype(np.int64)
        return pa.table({"hb": pa.array(hb, pa.int64())})

    # bounded driver pull: <= num_buckets rows per block, deduped in-process —
    # a groupby here would spend a whole all-to-all execution on <= nb ints
    probe_hb = sorted(
        {
            int(r["hb"])
            for r in triples.map_batches(
                probe_partial, batch_format="pyarrow"
            ).take_all()  # bounded: probe partials
        }
    )
    paths = []
    for b in probe_hb:
        d = os.path.join(index_dir, "windows", f"hb={b}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )

    totals = (
        triples.groupby(id_col).sum("c")
        .map_batches(lambda b: b.rename_columns([id_col, "n_windows"]),
                     batch_format="pyarrow")
    )
    if paths:
        idx = ray.data.read_parquet(paths, columns=["h"]).map_batches(
            lambda b: b.append_column("hit", pa.array(
                np.ones(len(b), dtype=np.int64))),
            batch_format="pyarrow",
        )
        matched = (
            hash_join(triples, idx, on="h")
            .map_batches(lambda b: b.select([id_col, "c"]),
                         batch_format="pyarrow")
            .groupby(id_col).sum("c")
            .map_batches(lambda b: b.rename_columns([id_col, "dup_windows"]),
                         batch_format="pyarrow")
        )
        out = hash_join(totals, matched, on=id_col, how="left")
    else:
        out = totals.map_batches(
            lambda b: b.append_column(
                "dup_windows", pa.array(np.zeros(len(b), dtype=np.int64))),
            batch_format="pyarrow",
        )

    def finish(batch: pa.Table) -> pa.Table:
        dw = batch["dup_windows"].to_numpy(zero_copy_only=False)
        dw = np.nan_to_num(dw.astype(np.float64), nan=0.0).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_windows": batch["n_windows"],
                "dup_windows": pa.array(dw, pa.int64()),
                "novel": pa.array(dw == 0),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort(id_col)


def dsir_weights(
    source: str | ray.data.Dataset,
    target_source: str = "src0",
    n_buckets: int = 1024,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """DSIR-style hashed n-gram importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score every
    document by how much its hashed-unigram profile looks like a TARGET
    subset (here ``source == target_source``) versus the raw rest of the
    corpus — ``log w(d) = sum_{word in d} lambda_{bucket(word)}`` with
    ``lambda_b = ln( p_target(b) / p_raw(b) )`` over ``n_buckets`` hash
    buckets, add-one smoothed.  The weights feed importance resampling
    (``sample_weighted``) to tilt a raw corpus toward a high-quality target
    distribution.

    Exactness: buckets are DuckDB's own ``hash(word) % n_buckets`` (the
    SimHash pattern — the oracle reproduces them bit-for-bit) and each
    ``lambda_b`` is ``round_even(ln(...)*1e6)`` computed BY the in-process
    DuckDB kernel over the aggregated integer bucket counts, so per-doc
    scores are order-free int64 sums (``score_e6``).

    Scale shape: stage 1 ships only per-batch ``(tgt, bucket, cnt)``
    partials into one bounded ``groupby`` (<= 2*n_buckets rows); the
    lambda table is a single ``n_buckets``-long int64 broadcast; stage 2 is
    embarrassingly parallel re-hash + one ``bincount`` per batch.  Text
    never shuffles.  Documents with no words are dropped (no profile).

    Output: ``(doc_id, score_e6)`` sorted by id.
    """
    B = int(n_buckets)
    ds = _read_docs(source, [id_col, "source", "text"])

    def _word_buckets(texts):
        from .dedup import split_words_flat

        flat, parent = split_words_flat(texts)
        if len(flat) == 0:
            return np.zeros(0, np.int64), parent
        bk = (_duckdb_word_hash(flat) % np.uint64(B)).astype(np.int64)
        return bk, parent

    def partials(batch: pa.Table) -> pa.Table:
        bk, parent = _word_buckets(batch["text"])
        if len(bk) == 0:
            return pa.table({"tgt": pa.array([], pa.int64()),
                             "bk": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        tgt_doc = pc.equal(batch["source"], target_source).to_numpy(
            zero_copy_only=False
        )
        key = tgt_doc[parent].astype(np.int64) * B + bk
        ukey, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "tgt": pa.array(ukey // B, pa.int64()),
                "bk": pa.array(ukey % B, pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    tot_pd = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["tgt", "bk"])
        .sum("cnt")
        .to_pandas()  # bounded: <= 2 * n_buckets rows
        .rename(columns={"sum(cnt)": "cnt"})
    )
    # pivot to one row per seen bucket: (bk, t, r) integer counts
    piv = tot_pd.pivot_table(index="bk", columns="tgt", values="cnt",
                             aggfunc="sum", fill_value=0)
    t_cnt = piv[1].to_numpy(dtype=np.int64) if 1 in piv.columns else np.zeros(len(piv), np.int64)
    r_cnt = piv[0].to_numpy(dtype=np.int64) if 0 in piv.columns else np.zeros(len(piv), np.int64)
    bks = piv.index.to_numpy(dtype=np.int64)

    from .dedup import _duckdb_hash_con

    con = _duckdb_hash_con()
    con.register("_dsir_tot", pa.table({"bk": bks, "t": t_cnt, "r": r_cnt}))
    # identical expression tree to the SQL oracle's lambda SELECT
    lam_tbl = con.execute(
        f"""
        WITH sums AS (SELECT sum(t) AS tt, sum(r) AS rr FROM _dsir_tot)
        SELECT bk,
               CAST(round_even(ln(((t + 1.0) / (tt + {B}.0)) /
                                  ((r + 1.0) / (rr + {B}.0))) * 1000000.0,
                               0) AS BIGINT) AS l
        FROM _dsir_tot CROSS JOIN sums
        """
    ).fetch_arrow_table()
    con.unregister("_dsir_tot")
    lam = np.zeros(B, dtype=np.int64)
    lam[lam_tbl["bk"].to_numpy()] = lam_tbl["l"].to_numpy()
    lam_ref = ray.put(lam)

    def score(batch: pa.Table) -> pa.Table:
        lam_v = ray.get(lam_ref)
        bk, parent = _word_buckets(batch["text"])
        n = len(batch)
        ids = batch[id_col]
        if len(bk) == 0:
            return pa.table({id_col: ids.slice(0, 0),
                             "score_e6": pa.array([], pa.int64())})
        # integer-valued float64 accumulation is exact here: |lambda| <=
        # ~1.5e7 and docs hold < 1e4 words, far inside 2^53
        s = np.bincount(parent, weights=lam_v[bk], minlength=n)
        nwords = np.bincount(parent, minlength=n)
        keep = nwords > 0
        return pa.table(
            {
                id_col: ids.filter(pa.array(keep)),
                "score_e6": pa.array(np.rint(s[keep]).astype(np.int64)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow").sort(id_col)


def group_topk(
    source: str | ray.data.Dataset,
    group_col: str = "lang",
    value_col: str = "n_chars",
    k: int = 3,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Top-k rows PER GROUP ranked by ``(value desc, id asc)`` — the
    "k longest / highest-scoring documents per language/source" report —
    computed with NO global sort: each batch contributes at most k
    candidate rows per group (vectorized run-length cut, the
    ``sample_min_k_by`` shape), so the groupby shuffle moves
    O(groups * k) rows per batch, never the corpus.

    Output: ``(group, id, value)`` sorted by (group asc, value desc,
    id asc) — exactly SQL's ``QUALIFY row_number() <= k``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        grp = batch[group_col].to_numpy(zero_copy_only=False)
        val = batch[value_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -val, grp))
        g_sorted = grp[order]
        starts = np.ones(len(order), dtype=bool)
        starts[1:] = g_sorted[1:] != g_sorted[:-1]
        run_first = np.nonzero(starts)[0][np.cumsum(starts) - 1]
        keep = order[(np.arange(len(order)) - run_first) < k]
        return pa.table(
            {
                group_col: batch[group_col].take(pa.array(keep)),
                id_col: batch[id_col].take(pa.array(keep)),
                value_col: batch[value_col].take(pa.array(keep)),
            }
        )

    def cut(t: pa.Table) -> pa.Table:
        order = np.lexsort(
            (
                t[id_col].to_numpy(zero_copy_only=False),
                -t[value_col].to_numpy(zero_copy_only=False),
            )
        )[:k]
        return t.take(pa.array(order))

    return (
        _read_docs(source, [id_col, group_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(cut, batch_format="pyarrow")
        .sort([group_col, value_col, id_col],
              descending=[False, True, False])
    )


# ---------------------------------------------------------------------------
# n-gram statistics: bigram vocabulary, PMI collocations
# ---------------------------------------------------------------------------


def _batch_bigram_counts(texts) -> pa.Table:
    """Per-batch bigram value counts: Arrow split once, one vectorized
    concat of adjacent words (doc-boundary aware), one value_counts."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.utf8_split_whitespace(pc.utf8_lower(texts))
    flat = lists.flatten()
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat, parent = flat.filter(pa.array(keep)), parent[keep]
    if len(flat) < 2:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    same = pa.array(parent[:-1] == parent[1:])
    left = flat.slice(0, len(flat) - 1).filter(same)
    right = flat.slice(1).filter(same)
    bigrams = pc.binary_join_element_wise(left, right, " ")
    vc = bigrams.value_counts()
    return pa.table({"bigram": vc.field("values"),
                     "cnt": vc.field("counts").cast(pa.int64())})


def bigram_topk(source: str | ray.data.Dataset, k: int = 100) -> ray.data.Dataset:
    """Top-k corpus bigrams by frequency: ``(bigram, cnt)`` ordered by
    count desc, bigram asc — the 2-gram sibling of :func:`vocab_topk`
    (phrase-vocabulary induction / tokenizer-merge seeding).  Same shape:
    per-batch partial counts, hash-bucketed local top-k, ``64*k``-row
    driver merge — no global sort at any cardinality."""

    def partial(batch: pa.Table) -> pa.Table:
        return _batch_bigram_counts(batch["text"])

    return _bucketed_topk(
        _read_docs(source, ["text"]).map_batches(partial,
                                                 batch_format="pyarrow"),
        "bigram", k,
    )


def skipgram_topk(
    source: str | ray.data.Dataset, window: int = 3, k: int = 200
) -> ray.data.Dataset:
    """Top-k skip-gram co-occurrence pairs — the word2vec training-pair
    generator (Mikolov et al. 2013) as a counting op: every DIRECTIONAL
    (center, context) pair with the context 1..``window`` words after the
    center inside one document, counted corpus-wide.  Output
    ``(w1, w2, cnt)`` by count desc then pair asc.

    Scale shape: one corpus pass; per batch the ``window`` shifted
    vectorized joins produce pair partials compressed by ``value_counts``
    before the shuffle (the shuffle carries distinct-pairs-per-batch, not
    one row per token position), then the shared hash-bucketed local-top-k
    merge — no global sort at any pair cardinality.  Pair keys travel as
    the single string ``"w1 w2"``: words are whitespace-split so ' ' can't
    occur inside one, and ' ' sorts below every word byte, so the key's
    lexicographic order IS the (w1, w2) tuple order the oracle uses."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.utf8_split_whitespace(pc.utf8_lower(texts))
        flat = lists.flatten()
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, parent = flat.filter(pa.array(keep)), parent[keep]
        outs = []
        for d in range(1, window + 1):
            if len(flat) <= d:
                break
            same = pa.array(parent[:-d] == parent[d:])
            left = flat.slice(0, len(flat) - d).filter(same)
            right = flat.slice(d).filter(same)
            outs.append(pc.binary_join_element_wise(left, right, " "))
        if not outs:
            return pa.table({"pair": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        vc = pa.chunked_array(outs).value_counts()
        return pa.table({"pair": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    top = _bucketed_topk(
        _read_docs(source, ["text"]).map_batches(partial,
                                                 batch_format="pyarrow"),
        "pair", k,
    )

    def unpack(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["pair"], " ")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        return pa.table(
            {
                "w1": pc.list_element(parts, 0),
                "w2": pc.list_element(parts, 1),
                "cnt": t["cnt"],
            }
        )

    return top.map_batches(unpack, batch_format="pyarrow")


def pmi_collocations(
    source: str | ray.data.Dataset,
    vocab_size: int = 200,
    k: int = 50,
    min_count: int = 5,
) -> ray.data.Dataset:
    """Top-k adjacent-word collocations by pointwise mutual information
    over the top-``vocab_size`` vocabulary: ``PMI = ln(n * c(w1,w2) /
    (c(w1) * c(w2)))`` with ``n`` the total adjacent-pair count —
    the classic collocation-extraction statistic (Church & Hanks 1990),
    restricted to in-vocabulary adjacent pairs so the count grid is
    bounded by V².

    Scale shape: the vocabulary is the bounded :func:`vocab_topk` pass;
    in-vocab adjacent-pair counts shrink to per-batch partials before one
    bounded groupby; unigram counts come from the vocabulary itself... no:
    PMI needs the marginal counts of pairs' members AS pair-slot members,
    so both marginals and n derive from the SAME bounded pair grid
    (row/column sums) — one corpus pass after the vocab pass.  The final
    arithmetic runs in the in-process DuckDB kernel with ``round_even``-
    scaled int64 PMI so the ranking is exactly SQL-reproducible.

    Output: ``(w1, w2, pair_cnt, pmi_e6)``, PMI desc then pair asc,
    pairs with ``pair_cnt < min_count`` dropped.
    """
    import pandas as pd

    ds = _read_docs(source, ["text"])
    V = int(vocab_size)
    vocab_pd = vocab_topk(ds.select_columns(["text"]), k=V).to_pandas()  # bounded: top-V vocab
    vocab_idx = pd.Index(vocab_pd["word"].to_numpy())
    vocab_ref = ray.put(vocab_idx)

    def pair_partial(batch: pa.Table) -> pa.Table:
        vi = ray.get(vocab_ref)
        idx, parent = _word_indices(batch["text"], vi)
        if len(idx) < 2:
            return pa.table({"key": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        Vn = len(vi)
        same = (parent[:-1] == parent[1:])
        inv = same & (idx[:-1] < Vn) & (idx[1:] < Vn)
        keys = idx[:-1][inv] * Vn + idx[1:][inv]
        uk, cnt = np.unique(keys, return_counts=True)
        return pa.table({"key": pa.array(uk, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    grid = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("key")
        .sum("cnt")
        .to_pandas()  # bounded: <= V^2 rows
        .rename(columns={"sum(cnt)": "cnt"})
    )
    Vn = len(vocab_idx)
    words = vocab_idx.to_numpy()
    grid["w1"] = words[(grid["key"] // Vn).to_numpy()]
    grid["w2"] = words[(grid["key"] % Vn).to_numpy()]

    from .dedup import _duckdb_hash_con

    con = _duckdb_hash_con()
    con.register("_pmi_grid", pa.Table.from_pandas(
        grid[["w1", "w2", "cnt"]], preserve_index=False))
    out = con.execute(
        f"""
        WITH tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM _pmi_grid),
        m1 AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS c1 FROM _pmi_grid GROUP BY 1),
        m2 AS (SELECT w2, CAST(sum(cnt) AS BIGINT) AS c2 FROM _pmi_grid GROUP BY 1),
        s AS (
          SELECT g.w1, g.w2, CAST(g.cnt AS BIGINT) AS pair_cnt,
                 CAST(round_even(
                   ln((n * 1.0 * g.cnt) / (c1 * 1.0 * c2)) * 1000000.0, 0)
                   AS BIGINT) AS pmi_e6
          FROM _pmi_grid g JOIN m1 USING (w1) JOIN m2 USING (w2)
          CROSS JOIN tot
          WHERE g.cnt >= {int(min_count)}
        )
        SELECT * FROM s
        QUALIFY row_number() OVER (ORDER BY pmi_e6 DESC, w1, w2) <= {int(k)}
        ORDER BY pmi_e6 DESC, w1, w2
        """
    ).fetch_arrow_table()
    con.unregister("_pmi_grid")
    return ray.data.from_arrow(out)


def sample_weighted(
    source: str | ray.data.Dataset,
    k: int = 100,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis 2006): each row draws ``u = (hash(id)+1) / 2^64``
    and the k largest keys ``u^(1/w)`` win — inclusion probability scales
    with the weight (quality score, length, dedup-cluster size), no
    replacement, and the sample is a pure function of the ids: identical
    across reruns, partitionings and cluster sizes (the weighted sibling of
    ``sample_min_k``'s uniform bottom-k).

    Keys are compared in log space (``ln(u)/w``, monotone in ``u^(1/w)``)
    and computed by the in-process DuckDB kernel — hash, cast, ln and
    divide are the oracle's own expression tree, so even the float keys
    are bitwise SQL-reproducible.  Per batch only k candidate rows leave
    (partial top-k); the final merge sorts k*batches rows.

    Output: ``(id, weight, samp_key)``, key desc, id asc, exactly
    ``min(k, rows with weight > 0)`` rows.
    """
    from .dedup import _duckdb_hash_con

    ds = _read_docs(source, [id_col, weight_col])

    def keys(batch: pa.Table) -> pa.Table:
        con = _duckdb_hash_con()
        arg = pa.table({"v": batch[id_col], "w": batch[weight_col]})
        con.register("_es_in", arg)
        out = con.execute(
            """
            SELECT ln((CAST(hash(v) AS DOUBLE) + 1) /
                      18446744073709551616.0) / w AS samp_key
            FROM _es_in
            """
        ).fetch_arrow_table()
        con.unregister("_es_in")
        kcol = out["samp_key"].to_numpy(zero_copy_only=False)
        w = batch[weight_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        ok = w > 0
        kcol, w, ids = kcol[ok], w[ok], ids[ok]
        # per-batch partial top-k by (key desc, id asc)
        order = np.lexsort((ids, -kcol))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                weight_col: pa.array(w[order]),
                "samp_key": pa.array(kcol[order], pa.float64()),
            }
        )

    return (
        ds.map_batches(keys, batch_format="pyarrow")
        .sort(["samp_key", id_col], descending=[True, False])
        .limit(k)
    )


def value_rank(
    source: str | ray.data.Dataset,
    value_col: str = "n_chars",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Global SORT POSITION of every row by ``(value, id)`` — computed with
    NO global sort: a bounded value histogram gives each distinct value its
    exclusive prefix (how many rows order strictly before it), then rows
    co-group BY VALUE and rank within their group by id.  The value-ordered
    sibling of ``shuffle_rank``'s hash-ordered permutation: this is how
    "percentile rank of every document's quality score" or a
    sorted-position column is attached at corpus scale (integer-domain
    values; for unbounded doubles, rank via the t-digest sketch instead).

    Output: ``(id, value, rank)`` (0-based), sorted by id.
    """
    from ..ops.common import _arrow_add_bucket

    from .sketches import _value_histogram

    ds = _read_docs(source, [id_col, value_col])
    vals, cnts = _value_histogram(ds, value_col)
    prefix = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    prefix_ref = ray.put((vals, prefix))

    def rank_group(g: pa.Table) -> pa.Table:
        import pandas as pd

        if isinstance(g, pd.DataFrame):
            g = pa.Table.from_pandas(g, preserve_index=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        v = g[value_col].to_numpy(zero_copy_only=False)
        vals_all, pref_all = ray.get(prefix_ref)
        # rows in this group share a _bucket, not a value: rank within each
        # value run by id, offset by the value's global exclusive prefix
        order = np.lexsort((ids, v))
        vs, iss = v[order], ids[order]
        new = np.ones(len(vs), bool)
        new[1:] = vs[1:] != vs[:-1]
        run_first = np.nonzero(new)[0][np.cumsum(new) - 1]
        within = np.arange(len(vs)) - run_first
        base = pref_all[np.searchsorted(vals_all, vs)]
        return pa.table(
            {
                id_col: pa.array(iss, pa.int64()),
                value_col: pa.array(vs),
                "rank": pa.array(base + within, pa.int64()),
            }
        )

    return (
        ds.map_batches(_arrow_add_bucket([value_col], 64),
                       batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(rank_group, batch_format="pyarrow")
        .sort(id_col)
    )


def trigram_topk(source: str | ray.data.Dataset, k: int = 10) -> ray.data.Dataset:
    """Top-k corpus word-trigrams by frequency (count desc, trigram asc) —
    the 3-gram sibling of :func:`bigram_topk`, and the deterministic
    phrase-picker the phrase-search driver query seeds itself with."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.utf8_split_whitespace(pc.utf8_lower(texts))
        flat = lists.flatten()
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, parent = flat.filter(pa.array(keep)), parent[keep]
        if len(flat) < 3:
            return pa.table({"trigram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        same = pa.array(parent[:-2] == parent[2:])
        a = flat.slice(0, len(flat) - 2).filter(same)
        b = flat.slice(1, len(flat) - 2).filter(same)
        c = flat.slice(2).filter(same)
        tri = pc.binary_join_element_wise(a, b, c, " ")
        vc = tri.value_counts()
        return pa.table({"trigram": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    return _bucketed_topk(
        _read_docs(source, ["text"]).map_batches(partial,
                                                 batch_format="pyarrow"),
        "trigram", k,
    )


# ---------------------------------------------------------------------------
# token-level sequence packing (materialized training batches)
# ---------------------------------------------------------------------------


def _tok_id_nums(ids: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Numeric part of the tokens table's ``doc-%08d`` ids (the fixture
    convention, FIXTURES.md F1) — zero-padded, so string order == numeric
    order and the packer's id buckets are contiguous ranges of both."""
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return (
        pc.utf8_slice_codeunits(ids, 4)
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )


def _tok_id_hi(source: str, id_col: str) -> int | None:
    """Max numeric doc id from parquet string statistics — no data scan
    (zero-padded ids make the lexicographic stats max the numeric max)."""
    import glob

    paths = (
        [source] if source.endswith(".parquet")
        else sorted(glob.glob(f"{source}/*.parquet"))
    )
    if not paths:
        return None
    hi = None
    try:
        for p in paths:
            md = pq.ParquetFile(p).metadata
            idx = md.schema.to_arrow_schema().get_field_index(id_col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or st.max is None:
                    return None
                v = int(str(st.max)[4:])
                hi = v if hi is None else max(hi, v)
        return hi
    except Exception:
        return None


_PACK_SCHEMA = pa.schema(
    [
        ("pack_id", pa.int64()),
        ("n_tok", pa.int64()),
        ("n_docs", pa.int64()),
        ("tokens", pa.list_(pa.int32())),
        ("doc_starts", pa.list_(pa.int64())),
    ]
)


def _slice_spans(gstart, gend, n, doc_off, vals, cap):
    """Shared span-slicing kernel: given each doc's global [gstart, gend)
    stream range and its offset into ``vals``, emit one row per (doc, pack)
    span — (pack, slice-start g0, token segment, doc-start offset or -1).
    Pure vectorized ragged gather."""
    start_pack = gstart // cap
    spans = (gend - 1) // cap - start_pack + 1
    pack = _ragged_range(start_pack, spans)
    g0 = np.maximum(pack * cap, np.repeat(gstart, spans))
    g1 = np.minimum((pack + 1) * cap, np.repeat(gend, spans))
    slen = g1 - g0
    src = np.repeat(doc_off - gstart, spans) + g0
    flat = vals[_ragged_range(src, slen)]
    seg_off = np.zeros(len(slen) + 1, dtype=np.int64)
    np.cumsum(slen, out=seg_off[1:])
    seg = pa.ListArray.from_arrays(
        pa.array(seg_off.astype(np.int32)), pa.array(flat, pa.int32())
    )
    dstart = np.where(pack == np.repeat(start_pack, spans), g0 % cap, -1)
    return pack, g0, seg, dstart


def _concat_packs(boundary_new, seg, dstart):
    """Shared pack-assembly kernel over rows already sorted by (pack key,
    g0): concatenate each pack's segments and collect its doc-start
    offsets.  ``boundary_new[i]`` is True where row i starts a new pack.
    Returns (row_starts, tokens, n_tok, n_docs, doc_starts)."""
    lens = pc.list_value_length(seg).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = seg.flatten().to_numpy(zero_copy_only=False)
    row_starts = np.flatnonzero(boundary_new)
    cum = np.concatenate(([0], np.cumsum(lens)))
    tok_off = cum[np.concatenate((row_starts, [len(lens)]))]
    tokens = pa.ListArray.from_arrays(
        pa.array(tok_off.astype(np.int32)), pa.array(flat, pa.int32())
    )
    is_start = dstart >= 0
    csum = np.concatenate(([0], np.cumsum(is_start)))
    ds_off = csum[np.concatenate((row_starts, [len(lens)]))]
    doc_starts = pa.ListArray.from_arrays(
        pa.array(ds_off.astype(np.int32)),
        pa.array(dstart[is_start], pa.int64()),
    )
    return row_starts, tokens, np.diff(tok_off), np.diff(ds_off), doc_starts


def pack_token_sequences(
    source: str | ray.data.Dataset,
    cap: int = 512,
    n_buckets: int = 32,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """MATERIALIZED GPT-style packing of the pre-tokenized sequence table:
    concatenate every document's token ids in ``id_col`` order into one
    global stream and cut it every ``cap`` tokens, emitting the actual
    packed training sequences — one row per pack with its ``list<int32>``
    token payload plus ``doc_starts``, the in-pack offsets where a new
    document begins (the attention-reset boundaries a trainer masks on).
    The final partial pack is kept.  ``pack_sequences`` is the planning
    twin (span bookkeeping only, never moves a token); this operator is the
    step that actually builds the model's input batches.

    Distributed as the same two-pass exclusive prefix scan (pack identity
    of any token depends only on the token total BEFORE its document):

    1. per-id-range-bucket token totals — per-batch ``bincount`` partials,
       one ``n_buckets``-row groupby, driver holds ``n_buckets`` ints;
    2. each bucket slices its own documents into (pack, segment) rows
       independently (vectorized ragged gather, no Python over tokens);
    3. segments co-locate per pack (the ONE shuffle that moves tokens —
       unavoidable: packing materializes output rows that mix documents)
       and concatenate vectorized.

    Token payloads cross exactly one exchange; every other stage moves
    int64 bookkeeping.  Output is partitioning-invariant, so the oracle is
    a plain window-cumsum regroup.  Zero-length documents emit no tokens
    and no doc_start.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1: {cap}")
    cols = [id_col, "tokens", "n_tok"]
    ds = (
        ray.data.read_parquet(source, columns=cols)
        if isinstance(source, str)
        else source
    )

    hi = _tok_id_hi(source, id_col) if isinstance(source, str) else None
    if hi is None:
        mx = ds.map_batches(
            lambda t: pa.table(
                {"m": pa.array([int(_tok_id_nums(t[id_col]).max())]
                               if len(t) else [], pa.int64())}
            ),
            batch_format="pyarrow",
        ).max("m")
        hi = int(mx) if mx is not None else None
    if hi is None:  # zero-row input
        return ray.data.from_arrow(_PACK_SCHEMA.empty_table())
    width = max(1, (int(hi) + n_buckets) // n_buckets)

    def partial_sums(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "psum": pa.array([], pa.int64())})
        b = _tok_id_nums(batch[id_col]) // width
        n = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(b, return_inverse=True)
        return pa.table(
            {"bucket": pa.array(uniq, pa.int64()),
             "psum": pa.array(np.bincount(inv, weights=n).astype(np.int64))}
        )

    totals = (
        ds.map_batches(partial_sums, batch_format="pyarrow")
        .groupby("bucket")
        .sum("psum")
        .take_all()  # bounded: <= n_buckets rows
    )
    tot = np.zeros(n_buckets + 1, dtype=np.int64)
    for row in totals:
        tot[int(row["bucket"])] = int(row["sum(psum)"])
    prefix = np.concatenate(([0], np.cumsum(tot)[:-1]))
    prefix_ref = ray.put(prefix)

    seg_schema = pa.schema(
        [("pack_id", pa.int64()), ("g0", pa.int64()),
         ("seg", pa.list_(pa.int32())), ("dstart", pa.int64())]
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = _tok_id_nums(batch[id_col]) // width
        return batch.append_column("_bucket", pa.array(b, pa.int64()))

    def emit_segments(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return seg_schema.empty_table()
        bucket = int(g["_bucket"][0].as_py())
        num = _tok_id_nums(g[id_col])
        order = np.argsort(num, kind="stable")
        tokens = g["tokens"].combine_chunks().take(pa.array(order))
        off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = tokens.flatten().to_numpy(zero_copy_only=False)
        n = np.diff(off)
        gend = int(ray.get(prefix_ref)[bucket]) + np.cumsum(n)
        gstart = gend - n
        keep = n > 0
        gstart, gend, n, doc_off = gstart[keep], gend[keep], n[keep], off[:-1][keep]
        if len(n) == 0:
            return seg_schema.empty_table()
        pack, g0, seg, dstart = _slice_spans(gstart, gend, n, doc_off, vals, cap)
        return pa.table(
            {"pack_id": pa.array(pack, pa.int64()),
             "g0": pa.array(g0, pa.int64()),
             "seg": seg,
             "dstart": pa.array(dstart, pa.int64())},
            schema=seg_schema,
        )

    def add_pack_bucket(batch: pa.Table) -> pa.Table:
        p = batch["pack_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("_pb", pa.array(p % 64, pa.int64()))

    def assemble(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _PACK_SCHEMA.empty_table()
        pack = g["pack_id"].to_numpy(zero_copy_only=False)
        g0 = g["g0"].to_numpy(zero_copy_only=False)
        order = np.lexsort((g0, pack))
        pack = pack[order]
        seg = g["seg"].combine_chunks().take(pa.array(order))
        dstart = g["dstart"].to_numpy(zero_copy_only=False)[order]
        new = np.concatenate(([True], pack[1:] != pack[:-1]))
        row_starts, tokens, n_tok, n_docs, doc_starts = _concat_packs(
            new, seg, dstart
        )
        return pa.table(
            {"pack_id": pa.array(pack[row_starts], pa.int64()),
             "n_tok": pa.array(n_tok, pa.int64()),
             "n_docs": pa.array(n_docs, pa.int64()),
             "tokens": tokens,
             "doc_starts": doc_starts},
            schema=_PACK_SCHEMA,
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(emit_segments, batch_format="pyarrow")
        .map_batches(add_pack_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(assemble, batch_format="pyarrow")
        .sort("pack_id")
    )


def dedup_token_spans(
    source: str | ray.data.Dataset,
    w: int = 16,
    num_buckets: int = 64,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """REMOVE cross-sequence duplicated token spans (Lee et al. 2022 applied
    to the PRE-TOKENIZED table): a token is dropped iff some ``w``-token
    window covering it (stride 1 — every position) occurs verbatim in at
    least one OTHER sequence; survivors keep their order.  The text sibling
    is ``dedup.dedup_spans``; :func:`dup_token_windows` is the
    measurement-only companion of this op.

    Exactness: duplication is decided on the polynomial mod-2^64 window
    hash AND the oracle replays the SAME hash (HUGEINT arithmetic), so
    engine and oracle agree bit-for-bit even in the astronomically unlikely
    collision case — unlike the text-spans op, there is no
    hash-vs-string-comparison gap to document.

    Shape (the dedup_spans discipline on the token axis): stride-1 window
    hashes leave each batch as (h, doc, start) ints; one hash-bucket
    shuffle finds hashes spanning >= 2 docs (typically the small duplicated
    subset); one doc-bucket shuffle builds per-doc sorted start lists; ONE
    left join moves the token payloads; the rebuild drops covered
    positions vectorized.  Output: ``(doc_id, n_tok, n_kept, tokens_key)``
    — the cleaned sequence as the injective comma string (the graded
    list-payload convention), sorted by id.
    """
    import pandas as pd

    from ..ops.common import _arrow_add_bucket
    from .join import hash_join

    W = int(w)
    ds = (
        ray.data.read_parquet(source, columns=[id_col, "tokens", "n_tok"])
        if isinstance(source, str)
        else source
    )

    def win_triples(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = tokens.values.to_numpy(zero_copy_only=False).astype(np.int64)
        row_idx, h = poly_window_hashes(vals, off, W, 1)
        n_tok = off[1:] - off[:-1]
        counts = np.maximum(n_tok - W + 1, 0)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pos = np.arange(len(h), dtype=np.int64) - starts[row_idx]
        ids = batch[id_col].combine_chunks() if isinstance(
            batch[id_col], pa.ChunkedArray) else batch[id_col]
        return pa.table(
            {
                "h": pa.array(h.view(np.int64), pa.int64()),
                "doc_id": ids.take(pa.array(row_idx)),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    def dup_rows(g: pa.Table) -> pa.Table:
        if isinstance(g, pd.DataFrame):
            g = pa.Table.from_pandas(g, preserve_index=False)
        h = g["h"].to_numpy(zero_copy_only=False)
        # string doc ids -> dense codes so the lexsort stays on int arrays
        enc = pc.dictionary_encode(g["doc_id"].combine_chunks())
        doc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pos = g["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, h))
        hs, dsort = h[order], doc[order]
        new_h = np.ones(len(hs), bool)
        new_h[1:] = hs[1:] != hs[:-1]
        new_pair = np.ones(len(hs), bool)
        new_pair[1:] = new_h[1:] | (dsort[1:] != dsort[:-1])
        run = np.cumsum(new_h) - 1
        ndocs = np.zeros(run[-1] + 1 if len(hs) else 0, np.int64)
        np.add.at(ndocs, run[new_pair], 1)
        keep = ndocs[run] >= 2
        kept = order[keep]
        return pa.table(
            {"doc_id": g["doc_id"].take(pa.array(kept)),
             "pos": pa.array(pos[kept], pa.int64())}
        )

    dup_pos = (
        ds.map_batches(win_triples, batch_format="pyarrow")
        .map_batches(_arrow_add_bucket(["h"], num_buckets), batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(dup_rows, batch_format="pyarrow")
    )

    def pos_lists(g: pa.Table) -> pa.Table:
        if isinstance(g, pd.DataFrame):
            g = pa.Table.from_pandas(g, preserve_index=False)
        enc = pc.dictionary_encode(g["doc_id"].combine_chunks())
        doc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pos = g["pos"].to_numpy(zero_copy_only=False)
        # dictionary codes are first-appearance ordered, not value-ordered:
        # sort by the decoded string rank to keep per-doc grouping stable
        rank = np.argsort(np.argsort(np.asarray(enc.dictionary.to_pylist(), dtype=object)))
        order = np.lexsort((pos, rank[doc]))
        d, p = doc[order], pos[order]
        new = np.ones(len(d), bool)
        new[1:] = d[1:] != d[:-1]
        counts = np.diff(np.concatenate((np.nonzero(new)[0], [len(d)])))
        offsets = np.concatenate(([0], np.cumsum(counts)))
        starts_str = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()),
                pc.cast(pa.array(p, pa.int64()), pa.string()),
            ),
            ",",
        )
        return pa.table(
            # positions of `new` index the SORTED arrays: map back via order
            {"doc_id": g["doc_id"].take(pa.array(order[np.nonzero(new)[0]])),
             "starts": starts_str}
        )

    lists = (
        dup_pos.map_batches(_arrow_add_bucket(["doc_id"], num_buckets),
                            batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pos_lists, batch_format="pyarrow")
    )
    lists = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.string()),
                  "starts": pa.array([], pa.string())})
    ).union(lists)

    def stringify(batch: pa.Table) -> pa.Table:
        # a list column round-trips the join's pandas merge as a tensor
        # extension; the injective comma string survives natively
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        strs = pa.ListArray.from_arrays(
            tokens.offsets, pc.cast(tokens.values, pa.string())
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tok": pc.cast(batch["n_tok"], pa.int64()),
                "tok_str": pc.binary_join(strs, ","),
            }
        )

    joined = hash_join(
        ds.map_batches(stringify, batch_format="pyarrow"), lists,
        on="doc_id", how="left",
    )

    def rebuild(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        toks = batch["tok_str"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        tl = pc.cast(pc.split_pattern(toks, ","), pa.large_list(pa.string()))
        n_tok = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        base0 = np.concatenate(([0], np.cumsum(n_tok)))
        vals = tl.flatten()
        # n_tok == 0 guard: split_pattern('') yields [''] — one phantom
        # element per empty doc that would shift the flattened alignment
        # (and keep[] coverage) of every later doc in the batch
        split_lens = pc.list_value_length(tl).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if (split_lens != n_tok).any():
            split_base = np.concatenate(([0], np.cumsum(split_lens)))
            good = np.ones(int(split_base[-1]), bool)
            for i in np.nonzero(split_lens != n_tok)[0]:
                if n_tok[i] != 0 or split_lens[i] != 1:
                    raise ValueError(
                        f"tok_str element count mismatch on row {i}: "
                        f"{split_lens[i]} vs n_tok {n_tok[i]}"
                    )
                good[split_base[i]] = False
            vals = vals.filter(pa.array(good))
        keep = np.ones(int(base0[-1]), bool)
        starts_col = batch["starts"]
        valid = pc.is_valid(starts_col).to_numpy(zero_copy_only=False)
        if valid.any():
            sc = starts_col.combine_chunks() if isinstance(
                starts_col, pa.ChunkedArray) else starts_col
            ls = pc.cast(
                pc.split_pattern(pc.fill_null(sc, ""), ","),
                pa.large_list(pa.string()),
            )
            flat_parent = pc.list_parent_indices(ls).to_numpy(
                zero_copy_only=False)
            ok = valid[flat_parent]
            flat_starts = pc.cast(
                ls.flatten().filter(pa.array(ok)), pa.int64()
            ).to_numpy(zero_copy_only=False)
            base = base0[:-1][flat_parent[ok]] + flat_starts
            cov = (base[:, None] + np.arange(W)[None, :]).ravel()
            keep[cov] = False
        parent = np.repeat(np.arange(len(ids)), n_tok)
        kept_vals = vals.take(pa.array(np.nonzero(keep)[0]))
        n_kept = np.zeros(len(ids), np.int64)
        np.add.at(n_kept, parent[keep], 1)
        offsets = np.concatenate(([0], np.cumsum(n_kept)))
        key = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                          kept_vals),
            ",",
        )
        return pa.table(
            {
                "doc_id": ids,
                "n_tok": pa.array(n_tok, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
                "tokens_key": key,
            }
        )

    return joined.map_batches(rebuild, batch_format="pyarrow").sort("doc_id")


def vocab_coverage(
    source: str | ray.data.Dataset,
    k: int = 1000,
) -> ray.data.Dataset:
    """Per-source coverage of the corpus-wide TOP-``k`` token vocabulary —
    the vocab-truncation analysis run before choosing a tokenizer budget:
    what fraction of each source's token stream survives if only the k most
    frequent token ids are kept (ties at the cutoff break to the smaller
    id, deterministically).

    Shape: pass 1 reduces each batch to (token, cnt) partials (bounded by
    the VOCABULARY, not rows), one small groupby merges them, and the
    driver takes the top-k (bounded pull — the vocabulary is ~50k ids by
    construction); pass 2 broadcasts the sorted top-k set and streams the
    corpus once with a vectorized ``np.isin`` membership per batch — only
    (source, total, covered) int partials shuffle.

    Output: ``(source, total_tokens, covered_tokens, coverage_pct)``
    sorted by source; pct = round_even(100.0 * covered / total, 4).
    """
    from ..ops.common import round4

    ds = (
        ray.data.read_parquet(source, columns=["source", "tokens"])
        if isinstance(source, str)
        else source
    )

    def tok_counts(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        vals = tokens.values.to_numpy(zero_copy_only=False)
        u, c = np.unique(vals, return_counts=True)
        return pa.table({"t": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    # Large partial batches: one (token, cnt) partial per 64k rows instead
    # of per 1k-row block, so partial volume is ~vocab x (rows/65536).
    partials = ds.map_batches(tok_counts, batch_format="pyarrow",
                              batch_size=65_536)
    # Small corpora skip the distributed aggregate entirely — the ray
    # groupby's shuffle machinery costs seconds of fixed overhead that
    # dwarfs a driver pandas merge of the bounded partials; large corpora
    # (partial volume beyond the driver) take the distributed path.
    if not isinstance(source, str):
        # Dataset inputs: materialize once so the gate's count and the two
        # passes don't each re-execute the upstream pipeline
        ds = ds.materialize()
    if ds.count() <= 2_000_000:  # metadata-only for parquet/materialized
        pdf = partials.to_pandas()  # bounded: <= vocab x (rows/65536) rows
        merged = pdf.groupby("t", as_index=False, sort=False)["c"].sum()
        merged = merged.rename(columns={"c": "sum(c)"})
    else:
        merged = (
            partials.groupby("t").sum("c").to_pandas()  # bounded: <= vocab ids
        )
    merged = merged.sort_values(["sum(c)", "t"], ascending=[False, True],
                                kind="mergesort").head(k)
    top = np.sort(merged["t"].to_numpy(dtype=np.int64))
    top_ref = ray.put(top)

    def cover(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = tokens.values.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = vals[off[0]: off[-1]]
        member = np.isin(vals, ray.get(top_ref))
        row_len = np.diff(off)
        parent = np.repeat(np.arange(len(batch)), row_len)
        cov = np.zeros(len(batch), np.int64)
        np.add.at(cov, parent[member], 1)
        g = (
            pd.DataFrame(
                {"source": batch["source"].to_numpy(zero_copy_only=False),
                 "total": row_len.astype(np.int64), "covered": cov}
            )
            .groupby("source", sort=False, as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    import pandas as pd

    def finish(t: pa.Table) -> pa.Table:
        tot = t["total"].to_numpy(zero_copy_only=False).astype(np.float64)
        cov = t["covered"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "source": t["source"],
                "total_tokens": t["total"],
                "covered_tokens": t["covered"],
                "coverage_pct": pa.array(round4(100.0 * cov / tot)),
            }
        )

    # The coverage merge is ALWAYS a driver merge: per-batch `cover` already
    # pre-groups to one row per (batch, source), so the partial volume is
    # #batches x #distinct-sources — trivially bounded at any corpus size
    # (sources are low-cardinality by construction) and a distributed
    # groupby's fixed shuffle cost buys nothing.
    pdf = (
        ds.map_batches(cover, batch_format="pyarrow", batch_size=65_536)
        .to_pandas()  # bounded: #batches x #sources tiny partial rows
        .groupby("source", as_index=False, sort=True)
        .sum()
    )
    out = finish(pa.Table.from_pandas(pdf, preserve_index=False))
    return ray.data.from_arrow(out).sort("source")
