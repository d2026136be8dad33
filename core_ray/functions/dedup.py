"""Deduplication over the ``documents`` table: exact, MinHash-LSH, SimHash.

Scale design (SURVEY.md "aggregation at scale" / ray_guide dedup pattern):

- **exact**: vectorized content-hash per batch → hash-shuffle on the digest →
  per-group min-doc_id survivor.  The shuffle key is the digest, so identical
  documents co-locate no matter where they were read.
- **MinHash-LSH**: per-batch vectorized shingling (word crc32s combined into
  3-gram hashes with numpy, 64 permutations via segment-min ``reduceat``) →
  explode to (band, band_hash, doc_id, signature) rows → groupby on the band
  bucket → pairwise signature comparison inside each (small) bucket →
  candidate pairs deduped across bands.  Only signatures shuffle, never text.
- **SimHash**: 64-bit sign-sum fingerprint per doc, 16-bit band blocking,
  Hamming-distance verification inside buckets.

Pairs output is (doc_a, doc_b, score) with doc_a < doc_b — deterministic and
order-insensitive.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..synth import _hash2
from .text import _read_docs, pool_size

_U64 = np.uint64
NUM_PERM = 64
BANDS = 16
ROWS_PER_BAND = NUM_PERM // BANDS


def _word_crcs(text: str) -> np.ndarray:
    words = text.lower().split()
    return np.array([zlib.crc32(w.encode()) for w in words], dtype=np.uint64)


def _shingle_hashes(crcs: np.ndarray) -> np.ndarray:
    """3-gram shingle hashes from word crcs (vectorized combine)."""
    if len(crcs) < 3:
        return _hash2(99, crcs) if len(crcs) else crcs
    a, b, c = crcs[:-2], crcs[1:-1], crcs[2:]
    with np.errstate(over="ignore"):
        mixed = a * _U64(0x9E3779B97F4A7C15) ^ b * _U64(0xC2B2AE3D27D4EB4F) ^ c
    return _hash2(99, mixed)


class MinHashStage:
    """Actor-pool stage: per-doc 64-permutation MinHash signature, exploded to
    LSH band rows. Permutation seeds precomputed once per actor."""

    def __init__(self):
        self.perm_seeds = list(range(1, NUM_PERM + 1))

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        all_shingles, offsets = [], [0]
        for t in texts:
            sh = _shingle_hashes(_word_crcs(t))
            all_shingles.append(sh)
            offsets.append(offsets[-1] + len(sh))
        flat = (
            np.concatenate(all_shingles) if all_shingles else np.array([], dtype=np.uint64)
        )
        starts = np.array(offsets[:-1])
        n_docs = len(doc_ids)
        sigs = np.full((n_docs, NUM_PERM), np.iinfo(np.uint64).max, dtype=np.uint64)
        nonempty = np.diff(offsets) > 0
        ne_starts = starts[nonempty]
        for j, seed in enumerate(self.perm_seeds):
            hashed = _hash2(seed, flat)
            if len(ne_starts):
                sigs[nonempty, j] = np.minimum.reduceat(hashed, ne_starts)
        # band rows
        band_ids = np.repeat(np.arange(BANDS, dtype=np.int32), n_docs)
        out_doc = doc_ids * BANDS
        band_hashes = np.empty(BANDS * n_docs, dtype=np.uint64)
        for b in range(BANDS):
            seg = sigs[:, b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
            with np.errstate(over="ignore"):
                h = _hash2(1000 + b, seg[:, 0] * _U64(31) ^ seg[:, 1])
                for r in range(2, ROWS_PER_BAND):
                    h = _hash2(1000 + b, h ^ seg[:, r])
            band_hashes[b * n_docs : (b + 1) * n_docs] = h
        sig_list = pa.FixedSizeListArray.from_arrays(
            pa.array(np.tile(sigs, (BANDS, 1)).ravel(), pa.uint64()), NUM_PERM
        )
        return pa.table(
            {
                "band": pa.array(band_ids),
                "band_hash": pa.array(band_hashes, pa.uint64()),
                "doc_id": pa.array(out_doc),
                "sig": sig_list,
            }
        )


def _bucket_pairs(threshold: float):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs = np.stack(g["sig"].to_numpy())
        rows = []
        for i in range(len(ids)):
            eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            for j, e in enumerate(eq):
                if e >= threshold:
                    rows.append((int(ids[i]), int(ids[i + 1 + j]), float(e)))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_jaccard"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "est_jaccard": "float64"}
        )

    return fn


def minhash_pairs(
    source: str | ray.data.Dataset, threshold: float = 0.5, concurrency: int | None = None
) -> ray.data.Dataset:
    """Near-duplicate candidate pairs with estimated Jaccard >= threshold."""
    ds = _read_docs(source, ["doc_id", "text"])
    bands = ds.map_batches(
        MinHashStage,
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency or pool_size(),
    )
    from ..ops.common import bucketed_distinct, grouped_map

    pairs = grouped_map(bands, ["band", "band_hash"], _bucket_pairs(threshold))
    # same pair can surface from several bands -> keep one
    return bucketed_distinct(pairs, ["doc_a", "doc_b"], ["doc_a", "doc_b", "est_jaccard"])


# --- SimHash ---------------------------------------------------------------


class SimHashStage:
    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        fps = np.empty(len(doc_ids), dtype=np.uint64)
        for i, t in enumerate(batch["text"].to_pylist()):
            crcs = _hash2(7, _word_crcs(t))
            if len(crcs) == 0:
                fps[i] = 0
                continue
            bits = ((crcs[:, None] >> np.arange(64, dtype=np.uint64)) & _U64(1)).astype(
                np.int32
            )
            votes = (2 * bits - 1).sum(axis=0)
            with np.errstate(over="ignore"):
                fps[i] = np.sum(
                    (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
                )
        return pa.table(
            {"doc_id": pa.array(doc_ids), "simhash": pa.array(fps, pa.uint64())}
        )


def simhash_pairs(
    source: str | ray.data.Dataset, max_hamming: int = 3, concurrency: int | None = None
) -> ray.data.Dataset:
    """Pairs with SimHash Hamming distance <= max_hamming (16-bit band
    blocking: any pair within distance 3 shares at least one of 4 bands)."""
    ds = _read_docs(source, ["doc_id", "text"])
    fps = ds.map_batches(
        SimHashStage,
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency or pool_size(),
    )

    def explode(batch: pa.Table) -> pa.Table:
        fp = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        bands, out_ids, out_fp, keys = [], [], [], []
        for b in range(4):
            key = (fp >> _U64(16 * b)) & _U64(0xFFFF)
            bands.append(np.full(len(fp), b, dtype=np.int32))
            keys.append(key)
            out_ids.append(ids)
            out_fp.append(fp)
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands)),
                "key": pa.array(np.concatenate(keys), pa.uint64()),
                "doc_id": pa.array(np.concatenate(out_ids)),
                "simhash": pa.array(np.concatenate(out_fp), pa.uint64()),
            }
        )

    exploded = fps.map_batches(explode, batch_format="pyarrow")

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []}).astype(
                {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}
            )
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        fp = g["simhash"].to_numpy().astype(np.uint64)
        rows = []
        for i in range(len(ids)):
            x = fp[i + 1 :] ^ fp[i]
            d = np.array([bin(v).count("1") for v in x])
            for j in np.nonzero(d <= max_hamming)[0]:
                rows.append((int(ids[i]), int(ids[i + 1 + j]), int(d[j])))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}
        )

    from ..ops.common import bucketed_distinct, grouped_map

    pairs = grouped_map(exploded, ["band", "key"], bucket)
    return bucketed_distinct(pairs, ["doc_a", "doc_b"], ["doc_a", "doc_b", "hamming"])


# --- exact dedup -----------------------------------------------------------


def dedup_exact(source: str | ray.data.Dataset) -> ray.data.Dataset:
    """Exact dedup: survivors = min doc_id per content digest.  Returns the
    surviving full rows."""
    import hashlib

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    ds = _read_docs(source, cols)

    def add_digest(batch: pa.Table) -> pa.Table:
        dig = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()]
        return batch.append_column("digest", pa.array(dig, pa.string()))

    from ..ops.common import bucketed_distinct

    out = bucketed_distinct(
        ds.map_batches(add_digest, batch_format="pyarrow"), ["digest"], ["digest", "doc_id"]
    )
    return out.map_batches(
        lambda df: df.drop(columns=["digest"]), batch_format="pandas"
    )
