"""Embedding-novelty screen: planted semantics, probed-arm recall floor vs
the exhaustive twin, and exactly-once crash/resume for the epoch ingest."""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from core_ray.functions.similarity import (
    build_ref_ivf_index,
    emb_novel,
    emb_novel_full,
)

SF = "/root/testdata/sf0.001"


def _planted_ds(dim=8, n=40, seed=5):
    """vec_id % 5 == 0 are reference; ingest vec 7 is a near-copy of ref
    vec 5, every other ingest vector is (with overwhelming probability)
    far from every reference vector."""
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    mat[7] = mat[5] + rng.normal(scale=1e-3, size=dim)  # near-dup of ref 5
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(mat.astype(np.float64))),
            }
        )
    )


def test_emb_novel_planted(tmp_path):
    ds = _planted_ds()
    idx = str(tmp_path / "idx")
    build_ref_ivf_index(ds, idx, ref_mod=5, n_centroids=4, sample_rows=64)
    out = (
        emb_novel_full(_planted_ds(), idx, threshold=0.9)
        .to_pandas()
        .set_index("vec_id")
    )
    assert len(out) == 32  # 40 minus the 8 reference vectors
    assert not bool(out.loc[7, "novel"])  # the planted near-dup
    assert out["novel"].sum() >= 30  # everything else novel


def test_emb_novel_probed_recall_vs_full(tmp_path):
    idx = str(tmp_path / "idx")
    build_ref_ivf_index(SF, idx, ref_mod=5, n_centroids=8, sample_rows=512)
    full = emb_novel_full(SF, idx, threshold=0.45).to_pandas()
    probed = emb_novel(SF, idx, threshold=0.45, n_probe=2).to_pandas()
    assert (full["vec_id"] == probed["vec_id"]).all()
    full_hits = set(full.loc[~full["novel"], "vec_id"])
    probed_hits = set(probed.loc[~probed["novel"], "vec_id"])
    # probing can only MISS near-dups, never invent them
    assert probed_hits <= full_hits
    if full_hits:
        recall = len(probed_hits) / len(full_hits)
        assert recall >= 0.5, f"recall {recall} below floor"
    # n_probe = n_centroids goes through the same path and must agree fully
    same = emb_novel(SF, idx, threshold=0.45, n_probe=8).to_pandas()
    assert (same["novel"] == full["novel"]).all()


def _sha_tree(root):
    h = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                h[os.path.relpath(p, root)] = hashlib.sha256(
                    open(p, "rb").read()
                ).hexdigest()
    return h


def test_emb_novel_ingest_crash_resume_identical(tmp_path):
    from core_ray.streaming.emb_ingest import EmbeddingNoveltyIngest

    idx = str(tmp_path / "idx")
    build_ref_ivf_index(SF, idx, ref_mod=5, n_centroids=8, sample_rows=512)

    clean_out = str(tmp_path / "clean")
    clean = EmbeddingNoveltyIngest(SF, idx, clean_out, epoch_rows=20)
    ck_clean = clean.run()
    assert ck_clean["epoch"] >= 1  # multiple epochs actually ran

    crash_out = str(tmp_path / "crash")
    crashed = EmbeddingNoveltyIngest(SF, idx, crash_out, epoch_rows=20)
    crashed.run(max_epochs=1)  # crash mid-stream
    ck2 = crashed.run()  # resume drains the rest
    assert ck2 == ck_clean
    assert _sha_tree(crash_out) == _sha_tree(clean_out)

    # the epoch-sliced union equals the one-shot screen over the whole ingest
    merged = (
        clean.read_results().to_pandas().sort_values("vec_id")
        .reset_index(drop=True)
    )
    direct = (
        emb_novel(SF, idx, threshold=0.45, n_probe=4)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert (merged["vec_id"] == direct["vec_id"]).all()
    assert (merged["novel"] == direct["novel"]).all()


def test_emb_novel_empty_index_partitions(tmp_path):
    # a reference slice so tiny some partitions are empty must not crash
    ds = _planted_ds(n=12)
    idx = str(tmp_path / "idx")
    build_ref_ivf_index(ds, idx, ref_mod=5, n_centroids=4, sample_rows=8)
    out = emb_novel_full(_planted_ds(n=12), idx, threshold=0.9).to_pandas()
    assert len(out) == 9
