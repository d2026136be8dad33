"""Readers (reference ``pipelines/sources/`` — SURVEY.md §2.3)."""

from .sql_query import sql_query
from .iso import BaseISOSource, FixtureISOSource
from .weather import weather_raw, weather_latest

__all__ = [
    "sql_query",
    "BaseISOSource",
    "FixtureISOSource",
    "weather_raw",
    "weather_latest",
]
