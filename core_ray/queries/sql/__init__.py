from .sql_query import SQLQueryBuilder

__all__ = ["SQLQueryBuilder"]
