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

from ..sources.interleaved import read_table


def orders_by_nation(sf_dir: str, broadcast_max: int = 5_000_000):
    """Per-nation order rollup, SIZE-ROUTED on the dimension side (the
    ``corpus_keep_auto`` precedent): customer row count (parquet metadata
    only — no data read) ≤ ``broadcast_max`` takes the broadcast route —
    ``ray.put`` a sorted-key array ONCE, probe each orders batch with one
    vectorized ``np.searchsorted`` (the per-row ``dict.get`` loop this
    replaces was the batch cost) — else the ``util.hash_join`` shuffle
    route, since a customer table that grows with SF eventually fits no
    worker heap.  Both routes partial-agg on the int nation key and
    resolve names once on the bounded (≤ nations) result."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ray.data.aggregate import Sum

    nation = read_table(sf_dir, "nation",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    nkeys = nation["n_nationkey"].to_numpy(dtype=np.int64)
    order_nk = np.argsort(nkeys, kind="stable")
    nkeys_sorted = nkeys[order_nk]
    nnames_sorted = nation["n_name"].to_numpy(dtype=object)[order_nk]

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_totalprice"])

    n_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    if n_cust <= broadcast_max:
        cust = read_table(sf_dir, "customer",
                          columns=["c_custkey", "c_nationkey"]).to_pandas()
        order_c = np.argsort(cust["c_custkey"].to_numpy(), kind="stable")
        ckeys = cust["c_custkey"].to_numpy(dtype=np.int64)[order_c]
        cnats = cust["c_nationkey"].to_numpy(dtype=np.int64)[order_c]
        ref = ray.put((ckeys, cnats))

        def probe(batch: pa.Table) -> pa.Table:
            ckeys_s, cnats_s = ray.get(ref)
            if len(ckeys_s) == 0:
                return pa.table({"nk": pa.array([], pa.int64()),
                                 "part_cents": pa.array([], pa.int64()),
                                 "part_n": pa.array([], pa.int64())})
            k = batch["o_custkey"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(ckeys_s, k), len(ckeys_s) - 1)
            ok = ckeys_s[pos] == k  # inner-join semantics: drop unmatched
            cents = np.round(batch["o_totalprice"].to_numpy(
                zero_copy_only=False) * 100).astype(np.int64)
            t = pa.table({"nk": pa.array(cnats_s[pos][ok], pa.int64()),
                          "cents": pa.array(cents[ok], pa.int64())})
            g = t.group_by("nk").aggregate([("cents", "sum"),
                                            ("cents", "count")])
            return g.rename_columns(["nk", "part_cents", "part_n"])

        partials = orders.map_batches(probe, batch_format="pyarrow")
    else:
        from ..util import hash_join

        def prep_orders(t: pa.Table) -> pa.Table:
            cents = np.round(t["o_totalprice"].to_numpy(
                zero_copy_only=False) * 100).astype(np.int64)
            return pa.table({"o_custkey": t["o_custkey"],
                             "cents": pa.array(cents, pa.int64())})

        cust_ds = read_table(sf_dir, "customer",
                                  columns=["c_custkey", "c_nationkey"])
        joined = hash_join(orders.map_batches(prep_orders,
                                              batch_format="pyarrow"),
                           cust_ds, "o_custkey", "c_custkey")

        def partial(df) -> pa.Table:
            g = (df.groupby("c_nationkey", sort=False)
                 .agg(part_cents=("cents", "sum"), part_n=("cents", "size"))
                 .reset_index())
            return pa.table({
                "nk": pa.array(g["c_nationkey"].astype(np.int64), pa.int64()),
                "part_cents": pa.array(g["part_cents"].astype(np.int64)),
                "part_n": pa.array(g["part_n"].astype(np.int64)),
            })

        partials = joined.map_batches(partial, batch_format="pandas")

    agg = partials.groupby("nk").aggregate(
        Sum("part_cents", alias_name="total_cents"),
        Sum("part_n", alias_name="n_orders"),
    )

    def name_out(t: pa.Table) -> pa.Table:
        nk = t["nk"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(nkeys_sorted, nk)
        return pa.table({
            "n_name": pa.array(nnames_sorted[pos], pa.string()),
            "total_cents": pa.array(
                t["total_cents"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "n_orders": pa.array(
                t["n_orders"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
        })

    return agg.map_batches(name_out, batch_format="pyarrow")


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

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(prep_li, batch_format="pyarrow")
    od = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate"],
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
