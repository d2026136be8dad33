"""Epoch-driven streaming engine (the north-rule core).

Architecture (SURVEY.md §3, §7.2 step 3-5):

- **Source**: the pre-tokenized Parquet stream is consumed as a sequence of
  epochs (micro-batches of files), like the reference's Spark ``foreachBatch``
  micro-batches (``pcdm_to_delta.py:336-356``) but with explicit event-time
  watermarks the reference lacks (SURVEY.md §2.9).
- **Normalize**: stateless ``map_batches`` over zero-copy Arrow derives the
  PCDM-style key/time/status columns from the tokens table.
- **State**: a fixed pool of ``StreamPartitionActor``s, each owning
  ``hash(TagName) % N`` of the key space: per-key latest-value registers
  (reference ``pcdm_latest_to_delta.py:177-240`` semantics), keyed merge-sink
  buffers (reference ``pcdm_to_delta.py:193-236`` semantics), and SALTED
  per-window partial aggregates (rows are routed by the high-cardinality row
  key, so a hot ``source`` never concentrates on one actor; window partials
  merge at emission — the two-stage salted aggregate of SURVEY.md §7.2 step 6).
- **Watermark**: two-phase epoch barrier — actors report max event time, the
  driver takes the min across partitions minus allowed lateness, then all
  actors emit windows closed below the watermark.
- **Exactly-once sink**: per (partition, epoch) Parquet files written
  temp-then-rename with a per-epoch manifest; a replayed epoch whose manifest
  exists is skipped.  Output rows are sorted deterministically so reruns are
  byte-identical at any parallelism.
- **Checkpoint/resume**: per-epoch state snapshots + the manifest log; resume
  loads the snapshot of the last committed epoch and replays from there.
"""

from .job import StreamingJob, StreamConfig
from .join import JoinConfig, StreamJoinJob, read_joined
from .dedup import DedupConfig, StreamDedupJob, read_survivors
from .freq import FreqConfig, StreamFreqJob, final_topk
from .pattern import PatternConfig, StreamPatternJob, read_matches
from .quantile import QuantileConfig, StreamQuantileJob, final_quantiles
from .rescale import (
    rescale_checkpoint,
    rescale_join_checkpoint,
    rescale_keyed_checkpoint,
)

__all__ = [
    "rescale_checkpoint",
    "rescale_join_checkpoint",
    "rescale_keyed_checkpoint",
    "StreamingJob",
    "StreamConfig",
    "JoinConfig",
    "StreamJoinJob",
    "read_joined",
    "DedupConfig",
    "FreqConfig",
    "StreamFreqJob",
    "final_topk",
    "StreamDedupJob",
    "read_survivors",
    "PatternConfig",
    "StreamPatternJob",
    "read_matches",
    "QuantileConfig",
    "StreamQuantileJob",
    "final_quantiles",
]
