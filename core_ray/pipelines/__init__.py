from .relational import (
    big_volume_orders,
    late_shipment_rate,
    order_priority_revenue,
    pricing_summary,
    revenue_by_nation,
    top_customers,
    sessionize,
    ship_priority_topk,
    sliding_count,
)

__all__ = [
    "big_volume_orders",
    "late_shipment_rate",
    "order_priority_revenue",
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "sessionize",
    "ship_priority_topk",
    "sliding_count",
]
