"""Streaming PCDM ingest: bus wire source → vendor parse → keyed merge.

The reference's production path is Eventhub → vendor JSON transformer →
``SparkPCDMToDeltaDestination`` running under Structured Streaming
``foreachBatch`` — at-least-once delivery made effectively exactly-once by
the idempotent keyed merge plus source-offset checkpoints
(``destinations/spark/pcdm_to_delta.py:336-376``).  This job reproduces that
contract on Ray Data:

- epochs come from ``KafkaFixtureSource.read_stream`` (per-partition offset
  ranges — the connector's trigger semantics);
- each epoch Dataset is parsed to PCDM CDC rows by a pluggable
  ``Dataset -> Dataset`` transformer (any ``stages/vendors.py`` preset);
- ``PCDMMergeSink.apply`` fans the merge out one Ray task per affected
  (ValueType, EventDate) partition;
- the offset checkpoint is committed (tmp+fsync+rename) AFTER the merge, so
  a crash between merge and commit replays the epoch on resume — and the
  keyed merge converges, so the replay is invisible (the reference's
  exactly-once argument, restated).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sources.bus import KafkaFixtureSource
from ..state.pcdm_merge import PCDMMergeSink


def wire_to_bodies(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Kafka wire rows → one string ``body`` column (BinaryToString on the
    value payload — ``transformers/spark/binary_to_string.py:21``)."""

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({"body": pc.cast(t["value"], pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


class StreamingPCDMIngest:
    """Micro-batch loop: bus epochs → parser → PCDM merge, offset-checkpointed.

    ``parser`` is any Dataset→Dataset transformer producing the 6-column PCDM
    CDC shape (TagName, EventTime, Status, Value, ValueType, ChangeType) from
    ``body`` strings, e.g. ``stages.vendors.opcua_to_pcdm``.
    """

    def __init__(
        self,
        bus_path: str,
        out_root: str,
        parser,
        max_offsets_per_trigger: int | None = None,
    ):
        self.bus_path = bus_path
        self.out_root = out_root
        self.parser = parser
        self.max_offsets_per_trigger = max_offsets_per_trigger
        self.sink = PCDMMergeSink(os.path.join(out_root, "pcdm"))
        os.makedirs(out_root, exist_ok=True)

    # ---------------------------------------------------------- checkpointing

    def _ckpt_path(self) -> str:
        return os.path.join(self.out_root, "_checkpoint.json")

    def load_checkpoint(self) -> dict:
        p = self._ckpt_path()
        if not os.path.exists(p):
            return {"offsets": None, "epoch": -1, "totals": {"rows": 0, "upserts": 0}}
        with open(p) as f:
            ck = json.load(f)
        ck["offsets"] = {int(k): v for k, v in (ck["offsets"] or {}).items()}
        return ck

    def _commit_checkpoint(self, ck: dict) -> None:
        tmp = self._ckpt_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ck, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._ckpt_path())

    # ----------------------------------------------------------------- runner

    def run(self, max_epochs: int | None = None) -> dict:
        """Process epochs until the log is drained (or ``max_epochs``, which
        simulates a crash: the checkpoint then points mid-stream)."""
        ck = self.load_checkpoint()
        start = ck["offsets"] if ck["offsets"] is not None else "earliest"
        # project to the value payload only: the wire key/headers/timestamp
        # columns would be read every epoch just for wire_to_bodies to drop
        source = KafkaFixtureSource(
            self.bus_path, starting_offsets=start, columns=["value"]
        )
        epoch = ck["epoch"]
        done = 0
        for epoch_ds, next_offsets in source.read_stream(self.max_offsets_per_trigger):
            epoch += 1
            cdc = self.parser(wire_to_bodies(epoch_ds))
            stats = self.sink.apply(cdc)
            rows = sum(
                stats[k] for k in ("upserts", "deletes")
            )
            ck = {
                "offsets": next_offsets,
                "epoch": epoch,
                "totals": {
                    "rows": ck["totals"]["rows"] + rows,
                    "upserts": ck["totals"]["upserts"] + stats["upserts"],
                },
            }
            self._commit_checkpoint(ck)
            done += 1
            if max_epochs is not None and done >= max_epochs:
                break
        return {"epochs_processed": done, **ck}
