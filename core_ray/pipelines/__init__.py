from .relational import (
    pricing_summary,
    revenue_by_nation,
    top_customers,
    sessionize,
    sliding_count,
)

__all__ = [
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "sessionize",
    "sliding_count",
]
