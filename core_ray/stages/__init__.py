"""Stateless transformer stages (reference ``pipelines/transformers/`` —
SURVEY.md §2.4): parsers/normalizers as vectorized ``map_batches`` fns."""

from .transformers import (
    binary_to_string,
    json_to_pcdm,
    pcdm_to_json,
    wide_to_mdm,
    JsonToPcdmConfig,
)
from .ml_prep import columns_to_vector, one_hot_encoding, polynomial_features
from .multimodal import (
    BinaryDecodeStage,
    decode_binary_column,
    frame_sample,
)

__all__ = [
    "binary_to_string",
    "json_to_pcdm",
    "pcdm_to_json",
    "wide_to_mdm",
    "JsonToPcdmConfig",
    "columns_to_vector",
    "one_hot_encoding",
    "polynomial_features",
    "BinaryDecodeStage",
    "decode_binary_column",
    "frame_sample",
]
