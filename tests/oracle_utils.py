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


def cookie_asof_flat_oracle(flat_ds):
    """Independent (flat + groupby + iterrows) re-implementation of the J7
    cookie as-of join, kept ONLY as a differential oracle for the
    zero-shuffle interleaved fast path (former engine flat variant; the
    registered query is cookies.cookie_asof_interleaved)."""
    from har2tree_ray.pipelines.cookies import cookie_events

    events = cookie_events(flat_ds)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        setters = df[df["side"] == "set"].sort_values("offset", kind="mergesort")
        senders = df[df["side"] == "sent"].sort_values("offset", kind="mergesort")
        rows = []
        for _, s in senders.iterrows():
            shost = s["hostname"].split(":")[0]
            cand = setters[
                (setters["name"] == s["name"]) & (setters["offset"] < s["offset"])
            ]
            cand = cand[[shost.endswith(d) for d in cand["domain"]]]
            if cand.empty:
                continue
            best = cand.iloc[-1]
            rows.append({"doc_id": s["doc_id"], "offset": int(s["offset"]),
                         "name": s["name"], "setter_offset": int(best["offset"])})
        out = pd.DataFrame(rows, columns=["doc_id", "offset", "name", "setter_offset"])
        if out.empty:
            out = out.astype({"offset": "int64", "setter_offset": "int64"})
        return out

    return events.groupby("doc_id").map_groups(per_doc, batch_format="pandas")
