"""The second half of the TPC-H query-shape suite (Q2/Q7/Q8/Q9/Q11/Q15/
Q16/Q17/Q20/Q21), adapted to the test schema (which has no ``partsupp``
table and no commit/receipt dates — the cost column is ``p_retailprice``,
"late" is measured against ``o_orderdate``) while keeping each query's
CLASSIC distributed shape:

- Q2   correlated MIN + argmin attribute fetch (per-part min unit price)
- Q7   nation-pair volume: two big joins collapsed to one partitioned
       hash join + two dimension broadcasts
- Q8   market share: numerator/denominator partials through one join
- Q9   profit rollup: cost map broadcast, supplier dim broadcast, one join
- Q11  global-scalar HAVING (value > fraction of a driver-scalar total)
- Q15  argmax-equality against a global aggregate
- Q16  distinct-count at (brand, type, size) grain via bucketed distinct
- Q17  per-group mean broadcast back as an exact-integer row predicate
- Q20  semi-join chain (qualifying (supp, part) totals -> supplier filter)
- Q21  per-order set logic (exists / not-exists) in one grouped pass

All money flows as exact e4-scaled int64 (``np.rint`` == round-half-even ==
DuckDB ``round_even`` on identical doubles; see ``relational._rev_e4``).
Quantities are integral doubles -> exact int64.  Every aggregate is
partial-aggregated per batch before its (single) shuffle; dimension lookups
(nation, supplier, filtered part subsets) ride one ``ray.put`` broadcast —
the documented small-side threshold — and the only large x large exchanges
are key-bucketed hash joins against ``orders``.

Reference anchor: rtdip/core has no relational engine — these exist to
exercise the engine's join/aggregate machinery on the canonical shapes
(reference queries are all time-series; see pipelines/relational.py for
Q1/Q3/Q4/Q5/Q10/Q12/Q13/Q14/Q18/Q19/Q22)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions.join import hash_join
from ..ops.common import _arrow_add_bucket, bucketed_distinct, grouped_map, round4


def _rev_e4_np(ep: np.ndarray, disc: np.ndarray) -> np.ndarray:
    return np.rint(ep * (1.0 - disc) * 10000.0).astype(np.int64)


def _pin_schema(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Union a typed zero-row block so a result that filters down to nothing
    (tiny scale factors) still reports its column schema through
    ``to_pandas`` instead of an empty no-column frame.  Every block is also
    conformed to the schema (``grouped_map``'s all-groups-empty fallback
    emits a zero-column block, which would otherwise poison the union)."""

    def conform(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        return t.select(schema.names).cast(schema)

    return ray.data.from_arrow(schema.empty_table()).union(
        ds.map_batches(conform, batch_format="pyarrow"))


def _read(sf_dir: str, table: str, columns: list[str], **kw) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns, **kw)


def _nation_suppkeys(sf_dir: str, n_names: list[str]) -> set[int]:
    """suppkeys of the given nations (supplier x nation are dimensions)."""
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    keys = {k for k, n in zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist())
            if n in n_names}
    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    return {s for s, nk in zip(sup["s_suppkey"].to_pylist(), sup["s_nationkey"].to_pylist())
            if nk in keys}


def _supp_nation_map(sf_dir: str) -> dict[int, str]:
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    return {s: name_of[nk]
            for s, nk in zip(sup["s_suppkey"].to_pylist(), sup["s_nationkey"].to_pylist())}


# --- Q2: per-part minimum unit price + argmin supplier ----------------------


def min_unitprice_supplier(
    sf_dir: str, max_size: int = 10, ptype: str = "SMALL", region: str = "EUROPE"
) -> ray.data.Dataset:
    """Q2 shape: for every part with ``p_size <= max_size``, ``p_type = ptype``,
    the minimum unit price (e4-int ``round_even(l_extendedprice*10000 /
    l_quantity)``) it was ever sold at by a supplier in ``region``, plus the
    argmin supplier's attributes (smallest suppkey on ties).

    Distributed argmin: each batch emits, per partkey, ONLY the rows at its
    local min (min suppkey among them) — any global-argmin row survives its
    own batch's partial, so the per-part merge over partials is exact."""
    import pyarrow.dataset as pads

    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pylist()
    rkey = next(r["r_regionkey"] for r in reg if r["r_name"] == region)
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nat_keys = {r["n_nationkey"]: r["n_name"] for r in nat.to_pylist()
                if r["n_regionkey"] == rkey}
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name", "s_nationkey"])
    supp_info = {r["s_suppkey"]: (r["s_name"], nat_keys[r["s_nationkey"]])
                 for r in sup.to_pylist() if r["s_nationkey"] in nat_keys}
    parts = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"],
        filters=(pads.field("p_size") <= max_size) & (pads.field("p_type") == ptype),
    )
    part_name = dict(zip(parts["p_partkey"].to_pylist(), parts["p_name"].to_pylist()))

    supp_ref = ray.put(np.array(sorted(supp_info), dtype=np.int64))
    part_ref = ray.put(np.array(sorted(part_name), dtype=np.int64))

    def partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        mask = np.isin(sk, ray.get(supp_ref)) & np.isin(pk, ray.get(part_ref))
        if not mask.any():
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "unit_e4": pa.array([], pa.int64()),
                             "s_suppkey": pa.array([], pa.int64())})
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)[mask]
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)[mask]
        unit = np.rint(ep * 10000.0 / qty).astype(np.int64)
        df = pd.DataFrame({"p_partkey": pk[mask], "unit_e4": unit,
                           "s_suppkey": sk[mask]})
        # local min unit per part, then min suppkey among the rows at it
        m = df.groupby("p_partkey")["unit_e4"].transform("min")
        df = df[df["unit_e4"] == m]
        out = df.groupby(["p_partkey", "unit_e4"], sort=False)["s_suppkey"].min()
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    partials = _read(sf_dir, "lineitem",
                     ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]
                     ).map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        mn = g["unit_e4"].min()
        at = g[g["unit_e4"] == mn]
        skey = int(at["s_suppkey"].min())
        pkey = int(g["p_partkey"].iloc[0])
        s_name, n_name = supp_info[skey]
        return pd.DataFrame({"p_partkey": [pkey], "p_name": [part_name[pkey]],
                             "min_unit_e4": [int(mn)], "s_suppkey": [skey],
                             "s_name": [s_name], "n_name": [n_name]})

    out = grouped_map(partials, ["p_partkey"], merge, num_buckets=16)
    return _pin_schema(out, pa.schema([
        ("p_partkey", pa.int64()), ("p_name", pa.string()),
        ("min_unit_e4", pa.int64()), ("s_suppkey", pa.int64()),
        ("s_name", pa.string()), ("n_name", pa.string())])).sort("p_partkey")


# --- Q7: volume between a nation pair --------------------------------------


def nation_pair_volume(
    sf_dir: str, n1: str = "NATION_18", n2: str = "NATION_19"
) -> ray.data.Dataset:
    """Q7 shape: shipping revenue between two nations per shipping year, both
    directions.  Supplier and customer nation lookups are broadcasts (true
    dimensions); the one large x large exchange is the partitioned hash join
    of pre-filtered lineitem partials against pre-filtered orders."""
    supp_nat = {k: v for k, v in _supp_nation_map(sf_dir).items() if v in (n1, n2)}
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nkeys = {r["n_nationkey"]: r["n_name"] for r in nat.to_pylist()
             if r["n_name"] in (n1, n2)}
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust_nat = {c: nkeys[nk] for c, nk in
                zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist())
                if nk in nkeys}
    supp_ref, cust_ref = ray.put(supp_nat), ray.put(cust_nat)

    def li_partial(t: pa.Table) -> pa.Table:
        smap = ray.get(supp_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        mask = np.isin(sk, np.fromiter(smap, np.int64, len(smap)))
        t2 = t.filter(pa.array(mask))
        if len(t2) == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "supp_nation": pa.array([], pa.string()),
                             "l_year": pa.array([], pa.int64()),
                             "rev_e4": pa.array([], pa.int64())})
        rev = _rev_e4_np(t2["l_extendedprice"].to_numpy(zero_copy_only=False),
                         t2["l_discount"].to_numpy(zero_copy_only=False))
        yr = pc.year(t2["l_shipdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        sn = pd.Series(t2["l_suppkey"].to_numpy(zero_copy_only=False)).map(smap)
        df = pd.DataFrame({"l_orderkey": t2["l_orderkey"].to_numpy(zero_copy_only=False),
                           "supp_nation": sn.to_numpy(), "l_year": yr, "rev_e4": rev})
        out = df.groupby(["l_orderkey", "supp_nation", "l_year"], sort=False)[
            "rev_e4"].sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                "l_shipdate"]).map_batches(li_partial, batch_format="pyarrow")

    def o_side(t: pa.Table) -> pa.Table:
        cmap = ray.get(cust_ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        mask = np.isin(ck, np.fromiter(cmap, np.int64, len(cmap)))
        t2 = t.filter(pa.array(mask))
        cn = pd.Series(t2["o_custkey"].to_numpy(zero_copy_only=False)).map(cmap)
        return pa.table({"l_orderkey": t2["o_orderkey"],
                         "cust_nation": pa.array(cn, pa.string())})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]
                   ).map_batches(o_side, batch_format="pyarrow")
    joined = hash_join(li, orders, on="l_orderkey")

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        keep = ((df["supp_nation"] == n1) & (df["cust_nation"] == n2)) | (
            (df["supp_nation"] == n2) & (df["cust_nation"] == n1))
        df = df[keep]
        return df.groupby(["supp_nation", "cust_nation", "l_year"], sort=False)[
            "rev_e4"].sum().reset_index()

    partials = joined.map_batches(pair_partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "supp_nation": [g["supp_nation"].iloc[0]],
            "cust_nation": [g["cust_nation"].iloc[0]],
            "l_year": [int(g["l_year"].iloc[0])],
            "revenue_e4": [int(g["rev_e4"].sum())]})

    out = grouped_map(partials, ["supp_nation", "cust_nation", "l_year"],
                      merge, num_buckets=8)
    return _pin_schema(out, pa.schema([
        ("supp_nation", pa.string()), ("cust_nation", pa.string()),
        ("l_year", pa.int64()), ("revenue_e4", pa.int64())])
    ).sort(["supp_nation", "cust_nation", "l_year"])


# --- Q8: market share -------------------------------------------------------


def market_share(
    sf_dir: str, nation: str = "NATION_5", region: str = "AMERICA",
    ptype: str = "PROMO",
) -> ray.data.Dataset:
    """Q8 shape: per order year, the revenue share of suppliers from
    ``nation`` within all sales of ``ptype`` parts to customers in
    ``region``.  Numerator and denominator flow as one (num, den) partial
    pair through a single partitioned join with orders."""
    import pyarrow.dataset as pads

    parts = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"],
                          filters=pads.field("p_type") == ptype)
    part_keys = ray.put(parts["p_partkey"].to_numpy())
    target_supp = ray.put(np.array(sorted(_nation_suppkeys(sf_dir, [nation])),
                                   dtype=np.int64))
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pylist()
    rkey = next(r["r_regionkey"] for r in reg if r["r_name"] == region)
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nat_in = {r["n_nationkey"] for r in nat.to_pylist() if r["n_regionkey"] == rkey}
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ckeys = np.sort(np.array(
        [c for c, nk in zip(cust["c_custkey"].to_pylist(),
                            cust["c_nationkey"].to_pylist()) if nk in nat_in],
        dtype=np.int64))
    cust_ref = ray.put(ckeys)

    def li_partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        mask = np.isin(pk, ray.get(part_keys))
        t2 = t.filter(pa.array(mask))
        if len(t2) == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "num_e4": pa.array([], pa.int64()),
                             "den_e4": pa.array([], pa.int64())})
        rev = _rev_e4_np(t2["l_extendedprice"].to_numpy(zero_copy_only=False),
                         t2["l_discount"].to_numpy(zero_copy_only=False))
        is_t = np.isin(t2["l_suppkey"].to_numpy(zero_copy_only=False),
                       ray.get(target_supp))
        df = pd.DataFrame({"l_orderkey": t2["l_orderkey"].to_numpy(zero_copy_only=False),
                           "num_e4": np.where(is_t, rev, 0), "den_e4": rev})
        out = df.groupby("l_orderkey", sort=False).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                "l_discount"]).map_batches(li_partial, batch_format="pyarrow")

    def o_side(t: pa.Table) -> pa.Table:
        mask = np.isin(t["o_custkey"].to_numpy(zero_copy_only=False),
                       ray.get(cust_ref))
        t2 = t.filter(pa.array(mask))
        yr = pc.year(t2["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"l_orderkey": t2["o_orderkey"],
                         "o_year": pa.array(yr, pa.int64())})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
                   ).map_batches(o_side, batch_format="pyarrow")
    joined = hash_join(li, orders, on="l_orderkey")

    def yr_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_year", sort=False)[["num_e4", "den_e4"]].sum(
            ).reset_index()

    partials = joined.map_batches(yr_partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        num, den = int(g["num_e4"].sum()), int(g["den_e4"].sum())
        return pd.DataFrame({"o_year": [int(g["o_year"].iloc[0])],
                             "num_e4": [num], "den_e4": [den],
                             "mkt_share": round4(num / den)})

    return grouped_map(partials, ["o_year"], merge, num_buckets=4).sort("o_year")


# --- Q9: profit by nation and year ------------------------------------------


def profit_by_nation_year(sf_dir: str, name_word: str = "widget") -> ray.data.Dataset:
    """Q9 shape: profit (revenue minus ``p_retailprice * quantity`` — the
    schema's cost analog for the missing ``ps_supplycost``) per supplier
    nation per order year, for parts whose name contains ``name_word``.
    Cost map and supplier dimension broadcast; one partitioned join."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name", "p_retailprice"])
    mask = pc.match_substring(part["p_name"], name_word)
    part = part.filter(mask)
    cost_e4 = {k: int(round(r * 10000)) for k, r in
               zip(part["p_partkey"].to_pylist(), part["p_retailprice"].to_pylist())}
    supp_nat = _supp_nation_map(sf_dir)
    cost_ref, supp_ref = ray.put(cost_e4), ray.put(supp_nat)

    def li_partial(t: pa.Table) -> pa.Table:
        cmap = ray.get(cost_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        m = np.isin(pk, np.fromiter(cmap, np.int64, len(cmap)))
        t2 = t.filter(pa.array(m))
        if len(t2) == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "n_name": pa.array([], pa.string()),
                             "profit_e4": pa.array([], pa.int64())})
        rev = _rev_e4_np(t2["l_extendedprice"].to_numpy(zero_copy_only=False),
                         t2["l_discount"].to_numpy(zero_copy_only=False))
        qty = np.rint(t2["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        cost = pd.Series(t2["l_partkey"].to_numpy(zero_copy_only=False)).map(
            cmap).to_numpy(dtype=np.int64)
        nn = pd.Series(t2["l_suppkey"].to_numpy(zero_copy_only=False)).map(
            ray.get(supp_ref))
        df = pd.DataFrame({"l_orderkey": t2["l_orderkey"].to_numpy(zero_copy_only=False),
                           "n_name": nn.to_numpy(),
                           "profit_e4": rev - cost * qty})
        out = df.groupby(["l_orderkey", "n_name"], sort=False)["profit_e4"].sum(
            ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount"]
               ).map_batches(li_partial, batch_format="pyarrow")

    def o_side(t: pa.Table) -> pa.Table:
        yr = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"l_orderkey": t["o_orderkey"],
                         "o_year": pa.array(yr, pa.int64())})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]
                   ).map_batches(o_side, batch_format="pyarrow")
    joined = hash_join(li, orders, on="l_orderkey")

    partials = joined.map_batches(
        lambda df: df.groupby(["n_name", "o_year"], sort=False)["profit_e4"].sum(
            ).reset_index(),
        batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n_name": [g["n_name"].iloc[0]],
                             "o_year": [int(g["o_year"].iloc[0])],
                             "profit_e4": [int(g["profit_e4"].sum())]})

    return grouped_map(partials, ["n_name", "o_year"], merge, num_buckets=8
                       ).sort(["n_name", "o_year"])


# --- Q11: important parts (global-scalar HAVING) -----------------------------


def important_parts(
    sf_dir: str, nation: str = "NATION_3", threshold_bp: int = 8
) -> ray.data.Dataset:
    """Q11 shape: per-part total sales value by suppliers of ``nation``,
    keeping parts whose value exceeds ``threshold_bp``/10000 of the grand
    total.  The HAVING threshold is exact integer arithmetic (``value*10000 >
    total*threshold_bp``) — no float fraction; the grand total is ONE driver
    scalar computed from the already-reduced per-part rows (bounded by part
    cardinality), broadcast into the filter."""
    skeys = ray.put(np.array(sorted(_nation_suppkeys(sf_dir, [nation])),
                             dtype=np.int64))

    def partial(t: pa.Table) -> pa.Table:
        m = np.isin(t["l_suppkey"].to_numpy(zero_copy_only=False), ray.get(skeys))
        t2 = t.filter(pa.array(m))
        if len(t2) == 0:
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "value_e4": pa.array([], pa.int64())})
        rev = _rev_e4_np(t2["l_extendedprice"].to_numpy(zero_copy_only=False),
                         t2["l_discount"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"p_partkey": t2["l_partkey"].to_numpy(zero_copy_only=False),
                           "value_e4": rev})
        return pa.Table.from_pandas(
            df.groupby("p_partkey", sort=False)["value_e4"].sum().reset_index(),
            preserve_index=False)

    partials = _read(sf_dir, "lineitem",
                     ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
                     ).map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"p_partkey": [int(g["p_partkey"].iloc[0])],
                             "value_e4": [int(g["value_e4"].sum())]})

    per_part = grouped_map(partials, ["p_partkey"], merge, num_buckets=16)
    per_part = per_part.materialize()  # reused twice: total + filter
    total = per_part.sum("value_e4") or 0

    def keep(t: pa.Table) -> pa.Table:
        v = t["value_e4"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(v * 10000 > total * threshold_bp))

    return _pin_schema(
        per_part.map_batches(keep, batch_format="pyarrow"),
        pa.schema([("p_partkey", pa.int64()), ("value_e4", pa.int64())]),
    ).sort(["value_e4", "p_partkey"], descending=[True, False])


# --- Q15: top supplier(s) ----------------------------------------------------


def top_supplier(
    sf_dir: str, date_from: str = "1996-01-01", date_to: str = "1996-04-01"
) -> ray.data.Dataset:
    """Q15 shape: supplier(s) whose revenue in the window equals the global
    maximum.  Per-supplier totals are bounded by the supplier dimension, the
    max is one driver scalar, and equality keeps all ties (as the view-based
    original does)."""
    lo, hi = np.datetime64(date_from, "us"), np.datetime64(date_to, "us")

    def partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False)
        m = (sd >= lo) & (sd < hi)
        t2 = t.filter(pa.array(m))
        if len(t2) == 0:
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "total_rev_e4": pa.array([], pa.int64())})
        rev = _rev_e4_np(t2["l_extendedprice"].to_numpy(zero_copy_only=False),
                         t2["l_discount"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"s_suppkey": t2["l_suppkey"].to_numpy(zero_copy_only=False),
                           "total_rev_e4": rev})
        return pa.Table.from_pandas(
            df.groupby("s_suppkey", sort=False)["total_rev_e4"].sum().reset_index(),
            preserve_index=False)

    partials = _read(sf_dir, "lineitem",
                     ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
                     ).map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s_suppkey": [int(g["s_suppkey"].iloc[0])],
                             "total_rev_e4": [int(g["total_rev_e4"].sum())]})

    per_supp = grouped_map(partials, ["s_suppkey"], merge, num_buckets=8
                           ).materialize()
    best = per_supp.max("total_rev_e4")
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    names = dict(zip(sup["s_suppkey"].to_pylist(), sup["s_name"].to_pylist()))

    def pick(t: pa.Table) -> pa.Table:
        v = t["total_rev_e4"].to_numpy(zero_copy_only=False)
        t2 = t.filter(pa.array(v == best))
        nm = [names[int(s)] for s in t2["s_suppkey"].to_pylist()]
        return pa.table({"s_suppkey": t2["s_suppkey"],
                         "s_name": pa.array(nm, pa.string()),
                         "total_rev_e4": t2["total_rev_e4"]})

    return per_supp.map_batches(pick, batch_format="pyarrow").sort("s_suppkey")


# --- Q16: supplier counts per (brand, type, size) ----------------------------


def parts_supplier_counts(
    sf_dir: str, brand_excl: str = "Brand#2", type_excl: str = "PROMO",
    sizes: tuple[int, ...] = (3, 9, 14, 19, 23, 36, 45, 49),
) -> ray.data.Dataset:
    """Q16 shape: COUNT(DISTINCT supplier) per (brand, type, size) for parts
    outside the excluded brand/type, excluding suppliers with negative
    account balance (the schema's complaints analog).  Distinct pairs are
    reduced per batch, deduplicated in key-hash buckets, then counted."""
    import pyarrow.dataset as pads

    part = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
        filters=(pads.field("p_brand") != brand_excl)
        & (pads.field("p_type") != type_excl)
        & (pads.field("p_size").isin(list(sizes))),
    )
    info = {r["p_partkey"]: (r["p_brand"], r["p_type"], r["p_size"])
            for r in part.to_pylist()}
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_acctbal"])
    bad_supp = np.sort(np.array(
        [s for s, b in zip(sup["s_suppkey"].to_pylist(), sup["s_acctbal"].to_pylist())
         if b < 0], dtype=np.int64))
    info_ref, bad_ref = ray.put(info), ray.put(bad_supp)

    def pair_partial(t: pa.Table) -> pa.Table:
        imap = ray.get(info_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        m = np.isin(pk, np.fromiter(imap, np.int64, len(imap))) & ~np.isin(
            sk, ray.get(bad_ref))
        df = pd.DataFrame({"p_partkey": pk[m], "s_suppkey": sk[m]}
                          ).drop_duplicates()
        bts = df["p_partkey"].map(imap)
        return pa.table({
            "p_brand": pa.array([b for b, _, _ in bts], pa.string()),
            "p_type": pa.array([t_ for _, t_, _ in bts], pa.string()),
            "p_size": pa.array([int(s) for _, _, s in bts], pa.int64()),
            "s_suppkey": pa.array(df["s_suppkey"].to_numpy(), pa.int64()),
        })

    pairs = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]
                  ).map_batches(pair_partial, batch_format="pyarrow")
    distinct = bucketed_distinct(
        pairs, ["p_brand", "p_type", "p_size", "s_suppkey"],
        ["p_brand", "p_type", "p_size", "s_suppkey"], num_buckets=16)

    def cnt_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["p_brand", "p_type", "p_size"]).aggregate([([], "count_all")])
        return g.rename_columns(["p_brand", "p_type", "p_size", "supplier_cnt"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"p_brand": [g["p_brand"].iloc[0]],
                             "p_type": [g["p_type"].iloc[0]],
                             "p_size": [int(g["p_size"].iloc[0])],
                             "supplier_cnt": [int(g["supplier_cnt"].sum())]})

    return _pin_schema(
        grouped_map(
            distinct.map_batches(cnt_partial, batch_format="pyarrow"),
            ["p_brand", "p_type", "p_size"], merge, num_buckets=16),
        pa.schema([("p_brand", pa.string()), ("p_type", pa.string()),
                   ("p_size", pa.int64()), ("supplier_cnt", pa.int64())]),
    ).sort(["supplier_cnt", "p_brand", "p_type", "p_size"],
           descending=[True, False, False, False])


# --- Q17: small-quantity revenue ---------------------------------------------


def small_quantity_revenue(
    sf_dir: str, brand: str = "Brand#15", ptype: str = "ECONOMY"
) -> ray.data.Dataset:
    """Q17 shape: total extended price of lineitems whose quantity is below
    20% of the part's average quantity, for one brand+type slice.  The
    correlated mean is made EXACT: qty < 0.2 * (sum/n)  <=>  5*qty*n < sum
    (quantities are integral), so the per-part (n, sum) stats broadcast back
    as an integer predicate — no float threshold, no second join."""
    import pyarrow.dataset as pads

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"],
                         filters=(pads.field("p_brand") == brand)
                         & (pads.field("p_type") == ptype))
    pk_ref = ray.put(part["p_partkey"].to_numpy())

    def stat_partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        m = np.isin(pk, ray.get(pk_ref))
        qty = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)[m]
                      ).astype(np.int64)
        df = pd.DataFrame({"p_partkey": pk[m], "n": 1, "sum_qty": qty})
        return pa.Table.from_pandas(
            df.groupby("p_partkey", sort=False).agg(
                n=("n", "sum"), sum_qty=("sum_qty", "sum")).reset_index(),
            preserve_index=False)

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    stats = (_read(sf_dir, "lineitem", li_cols[:2])
             .map_batches(stat_partial, batch_format="pyarrow")
             .to_pandas())
    if len(stats):  # bounded: filtered parts only
        stats = stats.groupby("p_partkey").sum()
        n_of = stats["n"].to_dict()
        sum_of = stats["sum_qty"].to_dict()
    else:  # no part matched the slice (tiny sf) -> zero-row predicate
        n_of, sum_of = {}, {}
    n_ref, sum_ref = ray.put(n_of), ray.put(sum_of)

    def sum_small(t: pa.Table) -> pa.Table:
        nmap, smap = ray.get(n_ref), ray.get(sum_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        m = np.isin(pk, np.fromiter(nmap, np.int64, len(nmap)))
        if not m.any():
            return pa.table({"total_eprice_e4": pa.array([0], pa.int64()),
                             "n_lines": pa.array([0], pa.int64())})
        pkm = pk[m]
        qty = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)[m]
                      ).astype(np.int64)
        n = pd.Series(pkm).map(nmap).to_numpy(dtype=np.int64)
        s = pd.Series(pkm).map(smap).to_numpy(dtype=np.int64)
        small = 5 * qty * n < s
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m][small]
        tot = int(np.rint(ep * 10000.0).astype(np.int64).sum())
        return pa.table({"total_eprice_e4": pa.array([tot], pa.int64()),
                         "n_lines": pa.array([int(small.sum())], pa.int64())})

    partials = _read(sf_dir, "lineitem", li_cols
                     ).map_batches(sum_small, batch_format="pyarrow").to_pandas()  # bounded: one partial row per block
    out = pa.table({
        "total_eprice_e4": pa.array([int(partials["total_eprice_e4"].sum())],
                                    pa.int64()),
        "n_lines": pa.array([int(partials["n_lines"].sum())], pa.int64())})
    return ray.data.from_arrow(out)


# --- Q20: suppliers with excess sales of a part family -----------------------


def excess_suppliers(
    sf_dir: str, name_prefix: str = "small", nation: str = "NATION_3",
    min_qty: int = 40,
) -> ray.data.Dataset:
    """Q20 shape: suppliers of ``nation`` who sold more than ``min_qty``
    units of at least one part whose name starts with ``name_prefix`` — the
    semi-join chain (filtered parts -> qualifying (supp, part) totals ->
    distinct suppliers -> nation filter)."""
    import pyarrow.dataset as pads

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    keep = pc.starts_with(part["p_name"], name_prefix)
    pk_ref = ray.put(part.filter(keep)["p_partkey"].to_numpy())
    nat_supp = _nation_suppkeys(sf_dir, [nation])

    def qty_partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        m = np.isin(pk, ray.get(pk_ref)) & np.isin(
            sk, np.fromiter(nat_supp, np.int64, len(nat_supp)))
        qty = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)[m]
                      ).astype(np.int64)
        df = pd.DataFrame({"s_suppkey": sk[m], "p_partkey": pk[m], "qty": qty})
        return pa.Table.from_pandas(
            df.groupby(["s_suppkey", "p_partkey"], sort=False)["qty"].sum(
                ).reset_index(), preserve_index=False)

    partials = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"]
                     ).map_batches(qty_partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if int(g["qty"].sum()) > min_qty:
            return pd.DataFrame({"s_suppkey": [int(g["s_suppkey"].iloc[0])]})
        return None

    qualifying = grouped_map(partials, ["s_suppkey", "p_partkey"], merge,
                             num_buckets=16)
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    names = dict(zip(sup["s_suppkey"].to_pylist(), sup["s_name"].to_pylist()))
    distinct = bucketed_distinct(qualifying, ["s_suppkey"], ["s_suppkey"],
                                 num_buckets=8)

    def attach(t: pa.Table) -> pa.Table:
        nm = [names[int(s)] for s in t["s_suppkey"].to_pylist()]
        return pa.table({"s_suppkey": t["s_suppkey"],
                         "s_name": pa.array(nm, pa.string())})

    return _pin_schema(
        distinct.map_batches(attach, batch_format="pyarrow"),
        pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string())]),
    ).sort("s_suppkey")


# --- Q21: suppliers who alone shipped late -----------------------------------


def waiting_suppliers(
    sf_dir: str, nation: str = "NATION_3", late_days: int = 60
) -> ray.data.Dataset:
    """Q21 shape: per supplier of ``nation``, the number of finished
    multi-supplier orders where THAT supplier shipped late (``l_shipdate >
    o_orderdate + late_days``) and no other supplier did — the classic
    EXISTS / NOT EXISTS pair, computed as one grouped pass over per-order
    supplier sets (late flags reduced per (order, supplier) first)."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderstatus"]).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "F")).select(
            ["o_orderkey", "o_orderdate"]).rename_columns(
            ["l_orderkey", "o_orderdate"]),
        batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    joined = hash_join(li, orders, on="l_orderkey")
    late_us = np.timedelta64(late_days, "D").astype("timedelta64[us]")

    def per_order_partial(df: pd.DataFrame) -> pd.DataFrame:
        late = (df["l_shipdate"].to_numpy() >
                df["o_orderdate"].to_numpy() + late_us).astype(np.int64)
        out = pd.DataFrame({"l_orderkey": df["l_orderkey"],
                            "l_suppkey": df["l_suppkey"], "late": late})
        return out.groupby(["l_orderkey", "l_suppkey"], sort=False)["late"].max(
            ).reset_index()

    partials = joined.map_batches(per_order_partial, batch_format="pandas")

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        # one full order per call: re-reduce partials, then the set logic
        s = g.groupby("l_suppkey", sort=False)["late"].max()
        if len(s) > 1 and int(s.sum()) == 1:
            return pd.DataFrame({"s_suppkey": [int(s.idxmax())]})
        return None

    credited = grouped_map(partials, ["l_orderkey"], per_order, num_buckets=32)
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    names = dict(zip(sup["s_suppkey"].to_pylist(), sup["s_name"].to_pylist()))
    nat_supp = _nation_suppkeys(sf_dir, [nation])

    def cnt_partial(t: pa.Table) -> pa.Table:
        sk = t["s_suppkey"].to_numpy(zero_copy_only=False)
        m = np.isin(sk, np.fromiter(nat_supp, np.int64, len(nat_supp)))
        df = pd.DataFrame({"s_suppkey": sk[m], "numwait": 1})
        return pa.Table.from_pandas(
            df.groupby("s_suppkey", sort=False)["numwait"].sum().reset_index(),
            preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        skey = int(g["s_suppkey"].iloc[0])
        return pd.DataFrame({"s_name": [names[skey]],
                             "numwait": [int(g["numwait"].sum())]})

    return _pin_schema(
        grouped_map(
            credited.map_batches(cnt_partial, batch_format="pyarrow"),
            ["s_suppkey"], merge, num_buckets=8),
        pa.schema([("s_name", pa.string()), ("numwait", pa.int64())]),
    ).sort(["numwait", "s_name"], descending=[True, False])
