"""Typed data models (reference ``data_models/``): MDM enums, Usage/MetaData
models, Arrow storage schemas and vectorized table constructors."""

from .timeseries import (
    MDM_META_SCHEMA,
    MDM_USAGE_SCHEMA,
    MetaData,
    ModelType,
    SeriesType,
    Uom,
    Usage,
    ValueType,
    conform_mdm_usage,
    create_usage_vo,
    meta_table,
    usage_table,
)

__all__ = [
    "Uom", "ModelType", "SeriesType", "ValueType", "Usage", "MetaData",
    "create_usage_vo", "usage_table", "meta_table", "conform_mdm_usage",
    "MDM_USAGE_SCHEMA", "MDM_META_SCHEMA",
]
