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
