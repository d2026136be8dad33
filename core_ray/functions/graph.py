"""Graph analytics over corpus-derived graphs.

``textrank`` runs exact-integer PageRank over the corpus word-adjacency
graph — TextRank (Mihalcea & Tarau 2004, "TextRank: Bringing Order into
Text") as a corpus-level keyword scorer, the iterative-algorithm family's
flagship.  The reference has no graph engine; this implements the standard
Pregel/BSP shape on Ray primitives.

Exactness design: every arithmetic step is int64 — ranks start at 1e9 per
node, one superstep is ``rank' = 150_000_000 + (85 * Σ_in(rank // outdeg))
// 100`` with floor division throughout — so a DuckDB oracle replaying the
same five supersteps as chained CTEs reproduces the engine bit-for-bit (no
float tolerance anywhere, same discipline as the exact-int money/PQ paths).
Dangling mass (words with no out-edge) is NOT redistributed; both sides
define it away identically.

Scale shape (the part Ray Data can't express is the iteration, NOT the
data pass):

1. Dataset pass over the corpus: adjacent-pair explode, per-batch local
   distinct, then :func:`bucketed_distinct` — the only stage that touches
   document text, fully streamed.
2. The DISTINCT edge list (the compressed graph, << token count) is
   re-indexed into int32 vocab ids via a broadcast sorted vocab
   (``ray.put`` once, ``np.searchsorted`` per batch) and left materialized
   in the OBJECT STORE as Arrow blocks — never collected to the driver.
3. Five BSP supersteps as raw Ray tasks over the edge blocks (the
   documented drop-to-tasks case: Dataset has no iterate-to-fixpoint):
   each task computes a per-shard int64 contribution vector
   (``np.add.at`` — unbuffered exact int accumulation), the driver folds
   partials as they finish (``ray.wait`` streaming, holds ONE extra
   vector), then broadcasts the new rank vector.  Per-superstep traffic is
   P shards × V·8 bytes of partials + one V·8-byte broadcast; edges never
   move again.

Driver/broadcast state is VOCAB-sized (the rank vector itself — the
algorithm's output), never corpus- or edge-sized.  On a 256-node cluster
the same shape holds: edge blocks stay put, rank vectors ride the object
store.  A web-scale vocabulary (hundreds of millions of types) would shard
the rank vector by the same hash the edge blocks are bucketed by; the
sandbox corpus doesn't need it and the oracle doesn't care.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..ops.common import bucketed_distinct
from .dedup import split_words_flat
from .text import _read_docs

TELEPORT_E9 = 150_000_000  # 0.15 scaled by the 1e9 rank unit
DAMP_NUM, DAMP_DEN = 85, 100  # 0.85 as exact integer ratio


def _adjacent_pairs(batch: pa.Table) -> pa.Table:
    """DISTINCT-within-batch directed adjacent word pairs (w[i] -> w[i+1])
    inside one document, as string columns (src, dst).  The per-batch
    combiner runs in integer code space: one dictionary encode of the flat
    word array, then ``np.unique`` on packed (src_code, dst_code) int64
    keys — no string group_by in the hot loop."""
    empty = pa.table(
        {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
    )
    flat, parent = split_words_flat(batch["text"])
    if len(flat) < 2:
        return empty
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    words = enc.dictionary
    same_doc = parent[:-1] == parent[1:]
    s, d = codes[:-1][same_doc], codes[1:][same_doc]
    if len(s) == 0:
        return empty
    uk = np.unique(s * np.int64(len(words)) + d)
    return pa.table(
        {
            "src": words.take(pa.array(uk // len(words), pa.int64())),
            "dst": words.take(pa.array(uk % len(words), pa.int64())),
        }
    )


@ray.remote
def _shard_contrib(block: pa.Table, ranks: np.ndarray, outdeg: np.ndarray) -> np.ndarray:
    """One superstep's contribution partial for one edge shard:
    acc[dst] += ranks[src] // outdeg[src], exact int64."""
    acc = np.zeros(len(ranks), dtype=np.int64)
    if block.num_rows == 0:  # 0-row blocks may carry a stale pre-map schema
        return acc
    src = block["src_idx"].to_numpy(zero_copy_only=False)
    dst = block["dst_idx"].to_numpy(zero_copy_only=False)
    np.add.at(acc, dst, ranks[src] // outdeg[src])
    return acc


@ray.remote
def _shard_outdeg(block: pa.Table, n_vocab: int) -> np.ndarray:
    if block.num_rows == 0:
        return np.zeros(n_vocab, dtype=np.int64)
    src = block["src_idx"].to_numpy(zero_copy_only=False)
    return np.bincount(src, minlength=n_vocab).astype(np.int64)


def textrank(
    source: str | ray.data.Dataset,
    iters: int = 5,
    k: int = 100,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Exact-int PageRank over the corpus word-adjacency graph; top ``k``
    words by final rank, ties by word.  Output ``(word, rank)``,
    rank = the int64 scaled score after ``iters`` supersteps."""
    docs = _read_docs(source, ["text"])
    edges = bucketed_distinct(
        docs.map_batches(_adjacent_pairs, batch_format="pyarrow"),
        ["src", "dst"],
        ["src", "dst"],
        num_buckets=num_buckets,
    ).materialize()

    # vocab = src ∪ dst, distinct — bounded by the type count (the rank
    # vector's own size); collected once, sorted, broadcast.
    def _words(t: pa.Table) -> pa.Table:
        arrs: list[pa.Array] = []
        for col in (t["src"], t["dst"]):
            arrs.extend(col.chunks if isinstance(col, pa.ChunkedArray) else [col])
        u = pc.unique(pa.chunked_array(arrs, pa.string()))
        return pa.table({"word": u})

    vocab_parts = edges.map_batches(_words, batch_format="pyarrow").take_all()  # bounded: vocab partials
    vocab = np.unique(np.asarray([r["word"] for r in vocab_parts], dtype=object))
    vocab_ref = ray.put(vocab)
    n = len(vocab)
    if n == 0:
        return ray.data.from_arrow(
            pa.table({"word": pa.array([], pa.string()), "rank": pa.array([], pa.int64())})
        )

    def _to_idx(t: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        s = np.searchsorted(v, t["src"].to_numpy(zero_copy_only=False).astype(object))
        d = np.searchsorted(v, t["dst"].to_numpy(zero_copy_only=False).astype(object))
        return pa.table(
            {"src_idx": pa.array(s, pa.int64()), "dst_idx": pa.array(d, pa.int64())}
        )

    idx_edges = edges.map_batches(_to_idx, batch_format="pyarrow").materialize()
    blocks = idx_edges.to_arrow_refs()

    deg_parts = [_shard_outdeg.remote(b, n) for b in blocks]
    outdeg = np.zeros(n, dtype=np.int64)
    while deg_parts:
        done, deg_parts = ray.wait(deg_parts, num_returns=1)
        outdeg += ray.get(done[0])
    outdeg_safe = np.maximum(outdeg, 1)  # dst-only words never index as src
    outdeg_ref = ray.put(outdeg_safe)

    ranks = np.full(n, 1_000_000_000, dtype=np.int64)
    for _ in range(iters):
        ranks_ref = ray.put(ranks)
        pending = [_shard_contrib.remote(b, ranks_ref, outdeg_ref) for b in blocks]
        acc = np.zeros(n, dtype=np.int64)
        while pending:
            done, pending = ray.wait(pending, num_returns=1)
            acc += ray.get(done[0])
        ranks = TELEPORT_E9 + (DAMP_NUM * acc) // DAMP_DEN

    top = min(k, n)
    # rank desc, word asc — lexsort keys in reverse priority order
    order = np.lexsort((vocab, -ranks))[:top]
    return ray.data.from_arrow(
        pa.table(
            {
                "word": pa.array(vocab[order], pa.string()),
                "rank": pa.array(ranks[order], pa.int64()),
            }
        )
    )
