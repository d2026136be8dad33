from .relational import (
    late_shipment_rate,
    order_priority_revenue,
    pricing_summary,
    revenue_by_nation,
    top_customers,
    sessionize,
    sliding_count,
)

__all__ = [
    "late_shipment_rate",
    "order_priority_revenue",
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "sessionize",
    "sliding_count",
]
