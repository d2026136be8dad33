from .weather_query_builder import WeatherQueryBuilder

__all__ = ["WeatherQueryBuilder"]
