from .relational import (
    order_priority_revenue,
    pricing_summary,
    revenue_by_nation,
    top_customers,
    sessionize,
    sliding_count,
)

__all__ = [
    "order_priority_revenue",
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "sessionize",
    "sliding_count",
]
