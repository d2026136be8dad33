"""Arrow schema definitions.

Mirrors the reference's canonical schemas (see SURVEY.md §1):
- PCDM event schema: reference ``pipelines/_pipeline_utils/spark.py:563-570``
- PCDM CDC schema (ValueType/ChangeType): ``spark.py:552-561``
- latest table: ``pipelines/destinations/spark/pcdm_latest_to_delta.py:151-240``
- tokens stream table: BASELINE.json ``input_hint`` / FIXTURES.md F1.
"""

from __future__ import annotations

import pyarrow as pa

# Primary engine input: pre-tokenized training sequences (FIXTURES.md F1).
TOKENS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

# PCDM event row (reference PROCESS_DATA_MODEL_EVENT_SCHEMA).
PCDM_EVENT_SCHEMA = pa.schema(
    [
        ("TagName", pa.string()),
        ("EventTime", pa.timestamp("us")),
        ("Status", pa.string()),
        ("Value", pa.float64()),
    ]
)

# PCDM CDC row (reference PROCESS_DATA_MODEL_SCHEMA): adds type routing + CDC verb.
PCDM_CDC_SCHEMA = pa.schema(
    [
        ("TagName", pa.string()),
        ("EventTime", pa.timestamp("us")),
        ("Status", pa.string()),
        ("Value", pa.string()),
        ("ValueType", pa.string()),  # float | integer | string
        ("ChangeType", pa.string()),  # insert | update | upsert | delete
    ]
)

# Latest-value table (reference pcdm_latest_to_delta.py merge target).
LATEST_SCHEMA = pa.schema(
    [
        ("TagName", pa.string()),
        ("EventTime", pa.timestamp("us")),
        ("Status", pa.string()),
        ("Value", pa.string()),
        ("ValueType", pa.string()),
        ("GoodEventTime", pa.timestamp("us")),
        ("GoodValue", pa.string()),
        ("GoodValueType", pa.string()),
    ]
)

# Metadata table joined into query outputs (reference ``..._metadata``).
METADATA_SCHEMA = pa.schema(
    [
        ("TagName", pa.string()),
        ("UoM", pa.string()),
        ("Step", pa.bool_()),
    ]
)

US_PER_SECOND = 1_000_000

# Interval unit -> microseconds (reference accepts second/minute/hour/day).
UNIT_US = {
    "millisecond": 1_000,
    "ms": 1_000,
    "second": US_PER_SECOND,
    "seconds": US_PER_SECOND,
    "s": US_PER_SECOND,
    "minute": 60 * US_PER_SECOND,
    "minutes": 60 * US_PER_SECOND,
    "m": 60 * US_PER_SECOND,
    "hour": 3_600 * US_PER_SECOND,
    "hours": 3_600 * US_PER_SECOND,
    "h": 3_600 * US_PER_SECOND,
    "day": 86_400 * US_PER_SECOND,
    "days": 86_400 * US_PER_SECOND,
    "d": 86_400 * US_PER_SECOND,
}


def interval_us(rate: int | float, unit: str) -> int:
    """Interval length in microseconds for (rate, unit), e.g. (15, 'minute')."""
    try:
        return int(rate * UNIT_US[unit.lower()])
    except KeyError:
        raise ValueError(f"unknown interval unit: {unit!r}") from None
