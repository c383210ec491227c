"""Broadcast-join demonstration over the relational side tables.

The engine's join strategy for small dimension tables (ray_guide / SURVEY §4
partitioning table): ``ray.put`` the built hash map ONCE, probe it inside
``map_batches`` on the fact table — no shuffle at all.  This is the same
pattern the spatial stages use for host boxes and the ANN stage uses for the
query matrix; here it is exercised on a classic customer⋈orders rollup so
the oracle can check it relationally.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def orders_by_nation(sf_dir: str):
    """Per-nation order rollup: broadcast customer→nation map, probe per
    batch of orders, partial-agg, tiny final shuffle."""
    import ray.data as rd

    from ray.data.aggregate import Sum

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"]).to_pandas()
    cust2nation = dict(zip(
        cust["c_custkey"].to_numpy(),
        cust["c_nationkey"].map(dict(zip(nation["n_nationkey"], nation["n_name"]))).to_numpy(),
    ))
    ref = ray.put(cust2nation)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def probe(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        keys = batch["o_custkey"].to_numpy(zero_copy_only=False)
        names = [lookup.get(int(k), "") for k in keys]
        cents = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        t = pa.table({"n_name": pa.array(names, pa.string()),
                      "cents": pa.array(cents, pa.int64())})
        g = t.group_by("n_name").aggregate([("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["n_name", "part_cents", "part_n"])

    partials = orders.map_batches(probe, batch_format="pyarrow")
    agg = partials.groupby("n_name").aggregate(
        Sum("part_cents", alias_name="total_cents"),
        Sum("part_n", alias_name="n_orders"),
    )
    return agg.map_batches(
        lambda t: pa.table({
            "n_name": t["n_name"],
            "total_cents": t["total_cents"],
            "n_orders": t["n_orders"],
        }),
        batch_format="pyarrow",
    )


def revenue_by_month(sf_dir: str):
    """Monthly revenue from the two LARGE fact tables — lineitem ⋈ orders on
    orderkey via the engine's shuffle ``hash_join`` (neither side broadcast),
    then exact-integer cents aggregation.

    Money stays exact: prices/discounts carry two decimals, so
    ``cents × (100 − disc_pct)`` is pure int64 arithmetic — no float
    summation-order drift against the SQL oracle."""
    import ray.data as rd

    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..util import hash_join, pre_shuffle_coalesce

    def prep_li(t: pa.Table) -> pa.Table:
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "cents": pa.array(np.rint(price * 100).astype(np.int64)),
            "disc_pct": pa.array(np.rint(disc * 100).astype(np.int64)),
        })

    def prep_o(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "order_month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
        })

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(prep_li, batch_format="pyarrow")
    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"],
    ).map_batches(prep_o, batch_format="pyarrow")
    joined = hash_join(li, od, "l_orderkey", "o_orderkey")

    def partial(df) -> pa.Table:
        rev = (df["cents"].to_numpy() * (100 - df["disc_pct"].to_numpy()))
        g = (df.assign(rev=rev).groupby("order_month", sort=False)
             .agg(part_rev=("rev", "sum"), part_n=("rev", "size")))
        g = g.reset_index()
        return pa.table({
            "order_month": pa.array(g["order_month"].tolist(), pa.string()),
            "part_rev": pa.array(g["part_rev"].astype(np.int64), pa.int64()),
            "part_n": pa.array(g["part_n"].astype(np.int64), pa.int64()),
        })

    agg = pre_shuffle_coalesce(
        joined.map_batches(partial, batch_format="pandas")
    ).groupby("order_month").aggregate(
        Sum("part_rev", alias_name="revenue_cents"),
        Sum("part_n", alias_name="n_items"))
    return agg.map_batches(
        lambda t: pa.table({
            "order_month": t["order_month"],
            "revenue_cents": pc.cast(t["revenue_cents"], pa.int64()),
            "n_items": pc.cast(t["n_items"], pa.int64()),
        }),
        batch_format="pyarrow")


def revenue_by_month_sql() -> str:
    return """
SELECT strftime(o.o_orderdate, '%Y-%m') AS order_month,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))) AS BIGINT)
           AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


def orders_by_nation_sql() -> str:
    return """
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""
