"""Local mimic of the driver's DuckDB correctness compare: run a queries()
callable and its oracle_sql() side-by-side, sort rows and columns, compare
values exactly."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        try:
            return result.to_pandas()
        except TypeError:
            return result.to_pandas()
    raise TypeError(type(result))


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_matches_oracle(name: str, sf_dir: str = "/root/testdata/sf0.001"):
    import __ray_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name] if name in entrymod.oracle_sql() else None
    assert sql is not None, f"no oracle for {name}"
    # oracle_sql() is pinned to sf0.01 paths by the driver contract; rebuild
    # for the requested tier when testing smaller ones.
    from har2tree_ray import queries as qmod

    sql = {n: s for n, s in qmod.oracle_sql(sf_dir).items()}[name]
    got = canon(to_pandas(q(sf_dir)))
    want = canon(run_oracle(sql, sf_dir))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
