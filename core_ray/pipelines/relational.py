"""Relational + windowed pipelines over the TPC-H-ish test tables.

Demonstrates the engine's scale patterns on classic shapes:

- ``pricing_summary``: per-batch Arrow hash-aggregate partials → tiny merge
  shuffle (the partial-aggregation pattern; a bare groupby would shuffle
  every lineitem row).
- ``revenue_by_nation`` / ``top_customers``: BROADCAST hash joins — the
  dimension maps (orderkey→custkey→nationkey→name) are ``ray.put`` once and
  looked up vectorized inside ``map_batches``; no shuffle join.  (At true
  100 TB the orders side would move to a partitioned hash join; the broadcast
  threshold is the design point documented here.)
- ``sessionize``: gap-based session windows per user — per-key ordered
  ``map_groups`` using the shared session kernel (``windows.session_ids``).
- ``sliding_count``: sliding event-time windows via multi-assignment
  (``windows.sliding_window_starts``) + partial aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..ops.common import round4, ts_to_us
from ..windows import session_ids, sliding_window_starts


# --- pricing summary (TPC-H Q1 shape) -------------------------------------


def pricing_summary(sf_dir: str, ship_cutoff: str = "1998-09-02") -> ray.data.Dataset:
    cutoff = np.datetime64(ship_cutoff, "us")
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.less_equal(batch["l_shipdate"], pa.scalar(cutoff))
        t = batch.filter(mask)
        if len(t) == 0:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "l_linestatus": pa.array([], pa.string()),
                    "qty": pa.array([], pa.float64()),
                    "base": pa.array([], pa.float64()),
                    "disc_price": pa.array([], pa.float64()),
                    "disc": pa.array([], pa.float64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        disc_price = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        t = t.append_column("disc_price_c", disc_price)
        out = t.group_by(["l_returnflag", "l_linestatus"], use_threads=False).aggregate(
            [
                ("l_quantity", "sum"),
                ("l_extendedprice", "sum"),
                ("disc_price_c", "sum"),
                ("l_discount", "sum"),
                ("l_quantity", "count"),
            ]
        )
        return out.rename_columns(
            ["l_returnflag", "l_linestatus", "qty", "base", "disc_price", "disc", "cnt"]
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["cnt"].sum())
        return pd.DataFrame(
            {
                "l_returnflag": [g["l_returnflag"].iloc[0]],
                "l_linestatus": [g["l_linestatus"].iloc[0]],
                "sum_qty": round4(g["qty"].sum()),
                "sum_base_price": round4(g["base"].sum()),
                "sum_disc_price": round4(g["disc_price"].sum()),
                "avg_qty": round4(g["qty"].sum() / n),
                "avg_disc": round4(g["disc"].sum() / n),
                "count_order": [float(n)],
            }
        )

    from ..ops.common import grouped_map

    return grouped_map(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        merge,
        num_buckets=8,
    )


# --- broadcast-join revenue rollups ----------------------------------------


def _lookup_arrays(sf_dir: str):
    """Driver-side dimension maps, broadcast once via ray.put.

    Sorted-key numpy pairs -> vectorized searchsorted lookups in tasks."""
    orders = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_name"]
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    ok = orders["o_orderkey"].to_numpy()
    order_sort = np.argsort(ok)
    ck = cust["c_custkey"].to_numpy()
    cust_sort = np.argsort(ck)
    return {
        "o_key": ok[order_sort],
        "o_cust": orders["o_custkey"].to_numpy()[order_sort],
        "c_key": ck[cust_sort],
        "c_nation": cust["c_nationkey"].to_numpy()[cust_sort],
        "c_name": np.asarray(cust["c_name"].to_pylist(), dtype=object)[cust_sort],
        "n_key": nation["n_nationkey"].to_numpy(),
        "n_name": np.asarray(nation["n_name"].to_pylist(), dtype=object),
    }


def _revenue_partials(lk_ref, key: str):
    def fn(batch: pa.Table) -> pa.Table:
        lk = ray.get(lk_ref)
        rev = batch["l_extendedprice"].to_numpy() * (1.0 - batch["l_discount"].to_numpy())
        okey = batch["l_orderkey"].to_numpy()
        cust = lk["o_cust"][np.searchsorted(lk["o_key"], okey)]
        if key == "nation":
            nat = lk["c_nation"][np.searchsorted(lk["c_key"], cust)]
            names = lk["n_name"][np.searchsorted(lk["n_key"], nat)]
            group = pa.array(names.astype(str))
            out_col = "n_name"
        else:
            group = pa.array(cust)
            out_col = "custkey"
        t = pa.table({out_col: group, "rev": pa.array(rev)})
        out = t.group_by([out_col], use_threads=False).aggregate([("rev", "sum")])
        return out.rename_columns([out_col, "rev"])

    return fn


def revenue_by_nation(sf_dir: str) -> ray.data.Dataset:
    lk_ref = ray.put(_lookup_arrays(sf_dir))
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    partials = ds.map_batches(_revenue_partials(lk_ref, "nation"), batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n_name": [g["n_name"].iloc[0]], "revenue": round4(g["rev"].sum())}
        )

    from ..ops.common import grouped_map

    return grouped_map(partials, ["n_name"], merge, num_buckets=8)


def top_customers(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    lk = _lookup_arrays(sf_dir)
    lk_ref = ray.put(lk)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    partials = ds.map_batches(_revenue_partials(lk_ref, "cust"), batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"custkey": [g["custkey"].iloc[0]], "revenue": round4(g["rev"].sum())}
        )

    from ..ops.common import grouped_map

    per_cust = grouped_map(partials, ["custkey"], merge)
    top = per_cust.sort(["revenue", "custkey"], descending=[True, False]).limit(k)

    def add_name(batch: pa.Table) -> pa.Table:
        keys = batch["custkey"].to_numpy()
        names = lk["c_name"][np.searchsorted(lk["c_key"], keys)]
        return pa.table(
            {
                "c_name": pa.array(names.astype(str)),
                "revenue": batch["revenue"],
            }
        )

    return top.map_batches(add_name, batch_format="pyarrow")


def order_priority_revenue(sf_dir: str) -> ray.data.Dataset:
    """Revenue per order priority via the PARTITIONED HASH JOIN (large x
    large: lineitem joined to orders by bucket co-grouping, no broadcast —
    the non-broadcast join path of functions/join.py)."""
    from ..functions.join import hash_join

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def rev(batch: pa.Table) -> pa.Table:
        r = batch["l_extendedprice"].to_numpy() * (1.0 - batch["l_discount"].to_numpy())
        return pa.table({"o_orderkey": batch["l_orderkey"], "rev": pa.array(r)})

    line_rev = line.map_batches(rev, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = hash_join(line_rev, orders, on="o_orderkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("o_orderpriority", sort=True)["rev"].sum().reset_index()
        )

    partials = joined.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderpriority": [g["o_orderpriority"].iloc[0]],
                "revenue": round4(g["rev"].sum()),
            }
        )

    from ..ops.common import grouped_map

    return grouped_map(partials, ["o_orderpriority"], merge, num_buckets=8)


# --- session windows -------------------------------------------------------


def sessionize(sf_dir: str, gap_s: int = 1800) -> ray.data.Dataset:
    """Gap-based sessions per user over `events`: one row per session with
    start, event count and duration (semantics: windows.session_ids)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        sid = session_ids(ts, gap_s * 1_000_000)
        df = pd.DataFrame({"sid": sid, "ts": ts})
        agg = df.groupby("sid").agg(start=("ts", "min"), end=("ts", "max"), n=("ts", "size"))
        return pd.DataFrame(
            {
                "user_id": g["user_id"].iloc[0],
                "session_start": agg["start"].to_numpy().astype("datetime64[us]"),
                "n_events": agg["n"].astype(np.int64).to_numpy(),
                "duration_s": (agg["end"] - agg["start"]).to_numpy() / 1e6,
            }
        )

    from ..ops.common import grouped_map

    return grouped_map(ds, ["user_id"], per_user)


# --- sliding windows -------------------------------------------------------


def sliding_count(
    sf_dir: str, start: str, end: str, size_s: int = 10800, slide_s: int = 3600
) -> ray.data.Dataset:
    """Events per (event_type, sliding window) — multi-assign + partial agg."""
    s_us, e_us = ts_to_us(start), ts_to_us(end)
    size_us, slide_us = size_s * 1_000_000, slide_s * 1_000_000
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        in_range = (ts >= s_us) & (ts <= e_us)
        ts = ts[in_range]
        tags = batch["event_type"].to_numpy(zero_copy_only=False)[in_range]
        idx, ws = sliding_window_starts(ts, s_us, size_us, slide_us)
        keep = (ws >= s_us) & (ws < e_us)
        idx, ws = idx[keep], ws[keep]
        t = pa.table({"event_type": pa.array(tags[idx]), "ws": pa.array(ws)})
        out = t.group_by(["event_type", "ws"], use_threads=False).aggregate(
            [("ws", "count")]
        )
        return out.rename_columns(["event_type", "ws", "cnt"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("ws", sort=True).agg(cnt=("cnt", "sum")).reset_index()
        return pd.DataFrame(
            {
                "event_type": g["event_type"].iloc[0],
                "EventTime": m["ws"].to_numpy(dtype=np.int64).astype("datetime64[us]"),
                "cnt": m["cnt"].astype(np.int64),
            }
        )

    from ..ops.common import grouped_map

    return grouped_map(partials, ["event_type"], merge, num_buckets=8)
