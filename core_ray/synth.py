"""Deterministic synthetic tokens-table generator (FIXTURES.md F1).

Generates the primary engine input per BASELINE.json ``input_hint``:
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``.

All randomness is counter-based (splitmix64 over ``(seed, row, col)``), so any
row — and any token within a row — is reproducible independently of chunking,
process, or generation order. This is what lets the exactly-once tests verify
per-row token-array equality without shipping the input alongside the output.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import TOKENS_SCHEMA

VOCAB = 50_257
SOURCES = np.array(["web", "books", "code", "wiki", "forums"])
# Skewed weights exercise hot-key salting (FIXTURES.md F1).
SOURCE_WEIGHTS = np.array([0.55, 0.20, 0.12, 0.08, 0.05])
T0_US = np.int64(1_704_067_200_000_000)  # 2024-01-01T00:00:00Z in microseconds

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set).

    uint64 wraparound is the intended modular arithmetic."""
    with np.errstate(over="ignore"):
        x = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
        x = ((x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)).astype(_U64)
        x = ((x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)).astype(_U64)
        return x ^ (x >> _U64(31))


def _hash2(seed: int, a: np.ndarray, b: np.ndarray | int = 0) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = _splitmix64(np.asarray(a, dtype=_U64) + _U64(seed) * _U64(0x9E3779B97F4A7C15))
        return _splitmix64(h ^ (np.asarray(b, dtype=_U64) * _U64(0xD6E8FEB86659FD93)))


def _uniform01(seed: int, a: np.ndarray, b: np.ndarray | int = 0) -> np.ndarray:
    return (_hash2(seed, a, b) >> _U64(11)).astype(np.float64) / float(1 << 53)


def row_n_tok(idx: np.ndarray, seed: int = 42) -> np.ndarray:
    """n_tok for row indices: lognormal-ish clipped to [8, 4096] (FIXTURES F1)."""
    u1 = np.clip(_uniform01(seed, idx, 1), 1e-12, 1.0)
    u2 = _uniform01(seed, idx, 2)
    normal = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    return np.clip(np.exp(5.5 + 0.8 * normal), 8, 4096).astype(np.int32)


def row_source(idx: np.ndarray, seed: int = 42) -> np.ndarray:
    u = _uniform01(seed, idx, 3)
    cum = np.cumsum(SOURCE_WEIGHTS)
    return SOURCES[np.searchsorted(cum, u, side="right").clip(0, len(SOURCES) - 1)]


def row_tokens_flat(idx: np.ndarray, n_tok: np.ndarray, seed: int = 42):
    """Flat int32 token values + int32 offsets for a ListArray over ``idx`` rows."""
    offsets = np.zeros(len(idx) + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    total = int(offsets[-1])
    row_of = np.repeat(np.asarray(idx, dtype=np.int64), n_tok)
    col_of = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_tok)
    vals = (_hash2(seed, row_of, col_of + 16) % _U64(VOCAB)).astype(np.int32)
    return vals, offsets.astype(np.int32)


def make_chunk(start: int, count: int, seed: int = 42) -> pa.Table:
    """Rows [start, start+count) of the tokens table as an Arrow table."""
    idx = np.arange(start, start + count, dtype=np.int64)
    n_tok = row_n_tok(idx, seed)
    vals, offsets = row_tokens_flat(idx, n_tok, seed)
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(vals))
    doc_id = pa.array([f"doc-{i:08d}" for i in idx])
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(n_tok),
            "source": pa.array(row_source(idx, seed)),
        },
        schema=TOKENS_SCHEMA,
    )


def event_time_us(idx: np.ndarray) -> np.ndarray:
    """Deterministic event time (us since epoch) with controlled out-of-orderness.

    EventTime = T0 + i*137ms + (i*2654435761 % 7)*250ms delay (FIXTURES F1) —
    arrival order is by row index but event time jitters, exercising watermarks.
    """
    i = np.asarray(idx, dtype=np.int64)
    delay = (i * np.int64(2654435761)) % 7
    return T0_US + i * 137_000 + delay * 250_000


def row_status(idx: np.ndarray) -> np.ndarray:
    """'Bad' every 97th row (FIXTURES F1) — exercises Bad filtering / TWA."""
    return np.where(np.asarray(idx, dtype=np.int64) % 97 == 0, "Bad", "Good")


def write_tokens_table(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    rows_per_file: int = 50_000,
    rows_per_chunk: int = 5_000,
) -> list[str]:
    """Write the tokens table as a directory of Parquet files, one per shard.

    Multiple files = multiple source epochs for the streaming engine and
    natural read parallelism for Ray Data.

    Generation runs in small sub-chunks (``rows_per_chunk``): this VM's
    first-touch page faults on fresh mmap'd memory are ~100x normal cost, so
    bounding the numpy working set lets the allocator reuse already-faulted
    pages (measured ~6-10x speedup over monolithic chunks).
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for start in range(0, n_rows, rows_per_file):
        count = min(rows_per_file, n_rows - start)
        path = os.path.join(out_dir, f"part-{start // rows_per_file:05d}.parquet")
        if not os.path.exists(path):
            parts = [
                make_chunk(s, min(rows_per_chunk, start + count - s), seed)
                for s in range(start, start + count, rows_per_chunk)
            ]
            pq.write_table(pa.concat_tables(parts), path)
        paths.append(path)
    return paths
