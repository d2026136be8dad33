"""Incremental embedding-novelty ingest: epochs of new vectors screened
against the persisted reference IVF index, exactly-once.

The embedding analog of :class:`core_ray.streaming.ingest.StreamingPCDMIngest`:
each epoch slices the next ``epoch_rows`` ingest vectors (``vec_id %
ref_mod != 0``, ascending), runs :func:`core_ray.functions.similarity.emb_novel`
over ONLY that slice (the index partitions are probed, never the reference
scanned), and lands the epoch's ``(vec_id, novel)`` rows as one atomically
renamed parquet partition before the offset checkpoint commits — so a crash
between epochs replays nothing and a crash mid-epoch rewrites only that
epoch's tempfile.  Output bytes after crash+resume are identical to an
unbroken run (tested by sha256).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


class EmbeddingNoveltyIngest:
    def __init__(
        self,
        source_path: str,
        index_dir: str,
        out_root: str,
        threshold: float = 0.45,
        n_probe: int = 4,
        epoch_rows: int = 200,
    ):
        self.source_path = source_path
        self.index_dir = index_dir
        self.out_root = out_root
        self.threshold = threshold
        self.n_probe = n_probe
        self.epoch_rows = epoch_rows
        os.makedirs(out_root, exist_ok=True)

    def _ckpt_path(self) -> str:
        return os.path.join(self.out_root, "_checkpoint.json")

    def load_checkpoint(self) -> dict:
        p = self._ckpt_path()
        if not os.path.exists(p):
            return {"next_vec_id": 0, "epoch": -1, "screened": 0}
        with open(p) as f:
            return json.load(f)

    def _commit_checkpoint(self, ck: dict) -> None:
        tmp = self._ckpt_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ck, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._ckpt_path())

    def _ref_mod(self) -> int:
        from ..functions.similarity import _NOVEL_META

        with open(os.path.join(self.index_dir, _NOVEL_META)) as f:
            return int(json.load(f)["ref_mod"])

    @staticmethod
    def _max_vec_id(path: str) -> int:
        """Stream end from parquet ROW-GROUP STATISTICS — no data read, so
        an id-space gap (deletions, sharded allocation) can't be mistaken
        for end-of-stream."""
        import pyarrow.parquet as pq

        f = pq.ParquetFile(path)
        col = f.schema_arrow.names.index("vec_id")
        mx = -1
        for rg in range(f.metadata.num_row_groups):
            stats = f.metadata.row_group(rg).column(col).statistics
            if stats is not None and stats.has_min_max:
                mx = max(mx, int(stats.max))
        return mx

    def run(self, max_epochs: int | None = None) -> dict:
        """Drain ingest epochs (``max_epochs`` simulates a crash: the
        checkpoint then points mid-stream and ``run()`` again resumes)."""
        import pyarrow.dataset as pads

        from ..functions.similarity import emb_novel

        ref_mod = self._ref_mod()
        path = (
            self.source_path
            if self.source_path.endswith(".parquet")
            else f"{self.source_path}/embeddings.parquet"
        )
        end = self._max_vec_id(path)
        ck = self.load_checkpoint()
        done = 0
        while (max_epochs is None or done < max_epochs) and int(
            ck["next_vec_id"]
        ) <= end:
            lo = int(ck["next_vec_id"])
            # epoch slice by vec_id range, pruned AT THE SCAN — the window
            # is ref_mod/(ref_mod-1) wider than epoch_rows so each epoch
            # holds ~epoch_rows ingest vectors
            width = self.epoch_rows * ref_mod // max(ref_mod - 1, 1)
            hi = lo + width
            # one epoch is a bounded micro-batch (~epoch_rows vectors): read
            # the pruned slice eagerly with the Arrow dataset layer instead
            # of paying two Ray Dataset executions (read + count) of fixed
            # overhead per epoch — the same micro-batch rationale as the
            # token streaming job's consume tasks
            epoch_tbl = pads.dataset(path).to_table(
                columns=["vec_id", "embedding"],
                filter=(pads.field("vec_id") >= lo)
                & (pads.field("vec_id") < hi),
            )
            if epoch_tbl.num_rows == 0:
                # an EMPTY window inside the id space is a gap, not the
                # stream end: advance the checkpoint and keep draining
                ck = {"next_vec_id": hi, "epoch": int(ck["epoch"]),
                      "screened": int(ck["screened"])}
                self._commit_checkpoint(ck)
                continue
            out = emb_novel(
                ray.data.from_arrow(epoch_tbl), self.index_dir,
                threshold=self.threshold, n_probe=self.n_probe,
            ).to_pandas()  # bounded: one epoch's rows
            epoch = int(ck["epoch"]) + 1
            part_dir = os.path.join(self.out_root, f"epoch={epoch}")
            tmp_dir = part_dir + ".tmp"
            os.makedirs(tmp_dir, exist_ok=True)
            pq.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(
                            out["vec_id"].to_numpy().astype(np.int64)
                        ),
                        "novel": pa.array(out["novel"].to_numpy().astype(bool)),
                    }
                ),
                os.path.join(tmp_dir, "data.parquet"),
            )
            # atomic publish: rename the whole partition dir, then commit
            if os.path.isdir(part_dir):
                import shutil

                shutil.rmtree(part_dir)
            os.replace(tmp_dir, part_dir)
            ck = {
                "next_vec_id": hi,
                "epoch": epoch,
                "screened": int(ck["screened"]) + len(out),
            }
            self._commit_checkpoint(ck)
            done += 1
        return ck

    def read_results(self) -> ray.data.Dataset:
        # expand to FILES: a list of paths is treated as files by the
        # parquet dataset layer, not recursed as directories
        files = sorted(
            os.path.join(self.out_root, d, f)
            for d in os.listdir(self.out_root)
            if d.startswith("epoch=") and not d.endswith(".tmp")
            for f in os.listdir(os.path.join(self.out_root, d))
            if f.endswith(".parquet")
        )
        return ray.data.read_parquet(files)


__all__ = ["EmbeddingNoveltyIngest"]
