"""Edge semantics of the TPC-H Q10/Q13/Q14/Q19/Q22-shaped pipelines on a
hand-built micro warehouse (the sf-dir parity test covers the full oracles)."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from core_ray.pipelines import (
    customer_order_distribution,
    idle_customer_segments,
    multi_arm_or_revenue,
    promo_revenue_share,
)


@pytest.fixture()
def micro_sf(tmp_path):
    d = str(tmp_path)
    ts = lambda s: dt.datetime.fromisoformat(s)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                "c_name": ["a", "b", "c", "d"],
                "c_nationkey": pa.array([0, 0, 1, 1], pa.int32()),
                # positive balances 10.00, 20.00, 30.00 -> avg 20.00; the
                # exact test is STRICT: 20.00 must NOT qualify
                "c_acctbal": [10.0, 20.0, 30.0, -5.0],
                "c_mktsegment": ["S1", "S1", "S2", "S2"],
            }
        ),
        f"{d}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([100, 101, 102], pa.int64()),
                "o_custkey": pa.array([1, 1, 2], pa.int64()),
                "o_orderstatus": ["O", "F", "O"],
                "o_totalprice": [1.0, 2.0, 3.0],
                "o_orderdate": pa.array(
                    [ts("2000-05-01"), ts("1999-01-01"), ts("1999-06-01")],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": ["1-URGENT"] * 3,
            }
        ),
        f"{d}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([100, 100, 102], pa.int64()),
                "l_partkey": pa.array([7, 8, 7], pa.int64()),
                "l_quantity": [5.0, 15.0, 25.0],
                "l_extendedprice": [100.0, 200.0, 400.0],
                "l_discount": [0.10, 0.00, 0.05],
                "l_returnflag": ["R", "N", "R"],
                "l_shipdate": pa.array(
                    [ts("1997-03-05"), ts("1997-03-20"), ts("1997-07-01")],
                    pa.timestamp("us"),
                ),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([7, 8], pa.int64()),
                "p_brand": ["Brand#12", "Brand#23"],
                "p_type": ["PROMO", "STANDARD"],
                "p_size": pa.array([3, 8], pa.int32()),
            }
        ),
        f"{d}/part.parquet",
    )
    return d


def test_q13_zero_order_customers_counted(ray_session, micro_sf):
    # status 'F' excluded: cust 1 has one qualifying order, cust 2 one,
    # custs 3 and 4 have none -> histogram {1: 2, 0: 2}
    out = customer_order_distribution(micro_sf, exclude_status="F").to_pandas()
    got = dict(zip(out["c_count"], out["custdist"]))
    assert got == {1: 2, 0: 2}
    # ordering: custdist desc then c_count desc
    assert list(out["c_count"]) == [1, 0]


def test_q22_average_boundary_is_strict(ray_session, micro_sf):
    # avg positive balance = 20.00 exactly; only 30.00 (cust 3, no orders
    # since 2000) qualifies — 20.00 == avg must be excluded
    out = idle_customer_segments(micro_sf, since="2000-01-01").to_pandas()
    assert list(out["c_mktsegment"]) == ["S2"]
    assert list(out["numcust"]) == [1]
    assert list(out["totacctbal_e2"]) == [3000]


def test_q14_promo_share_exact_ints(ray_session, micro_sf):
    # March 1997 lines: (part 7, PROMO, 100*0.9=90.0) + (part 8, STANDARD,
    # 200.0) -> promo 900000 e4, total 2900000 e4
    out = promo_revenue_share(
        micro_sf, month_from="1997-03-01", month_to="1997-04-01"
    ).to_pandas()
    assert out.loc[0, "promo_rev_e4"] == 900_000
    assert out.loc[0, "total_rev_e4"] == 2_900_000
    assert out.loc[0, "promo_share_e6"] == (900_000 * 1_000_000) // 2_900_000


def test_q19_arm_disjunction(ray_session, micro_sf):
    # arm1 (Brand#12, qty 1-11, size 1-5): line 1 qty 5 -> 90.0 matches;
    # line 3 qty 25 fails arm1's qty range. arm2 (Brand#23, qty 10-20,
    # size 1-10): line 2 qty 15 -> 200.0 matches.
    out = multi_arm_or_revenue(micro_sf).to_pandas()
    assert out.loc[0, "revenue_e4"] == 2_900_000


def test_rfm_scores_hand_case(tmp_path):
    """4 users with strictly ordered R/F/M: quartile thresholds = the sorted
    values themselves (n=4, ranks 1/2/3), scores come out 1..4 with recency
    inverted."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from core_ray.pipelines import rfm_segments

    rows = []
    # user u: freq = u purchases of value 10*u, last at Jan (u*3)th
    for u in (1, 2, 3, 4):
        for j in range(u):
            rows.append((u, np.datetime64(f"2024-01-{3*u:02d}", "us"),
                         "purchase", 10.0 * u))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type", "value"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = rfm_segments(str(tmp_path)).to_pandas().sort_values("user_id")
    # later last-purchase => smaller recency => higher r_score
    assert out["r_score"].tolist() == [1, 2, 3, 4]
    assert out["f_score"].tolist() == [1, 2, 3, 4]
    assert out["m_score"].tolist() == [1, 2, 3, 4]
    assert out["rfm"].tolist() == [111, 222, 333, 444]
    assert out["monetary"].tolist() == [10.0, 40.0, 90.0, 160.0]
