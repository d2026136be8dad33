"""Readers (reference ``pipelines/sources/`` — SURVEY.md §2.3)."""

from .sql_query import sql_query
from .delta_sharing import (
    DeltaSharingClient,
    DeltaSharingProfile,
    DeltaSharingSource,
)
from .iso import BaseISOSource, FixtureISOSource
from .weather import weather_raw, weather_latest
from .bus import (
    KafkaEventhubFixtureSource,
    KafkaFixtureSource,
    KinesisFixtureSource,
    kafka_to_eventhub_schema,
    write_bus_log,
)

__all__ = [
    "sql_query",
    "DeltaSharingClient",
    "DeltaSharingProfile",
    "DeltaSharingSource",
    "BaseISOSource",
    "FixtureISOSource",
    "weather_raw",
    "weather_latest",
    "KafkaFixtureSource",
    "KafkaEventhubFixtureSource",
    "KinesisFixtureSource",
    "kafka_to_eventhub_schema",
    "write_bus_log",
]
