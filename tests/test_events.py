"""Event-stream operators (sessionize / tumbling window / as-of / JSON
props): oracle parity plus targeted semantics on hand-built fixtures."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.oracle_utils import assert_matches_oracle, to_pandas

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", [
    "event_sessions", "event_window_agg", "event_asof", "event_props_rollup",
    "event_funnel", "event_retention", "event_transitions",
    "event_window_sliding",
])
def test_oracle_parity(name):
    assert_matches_oracle(name, SF)


def _mk(rows):
    import ray.data as rd

    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"])
    return rd.from_pandas(df)


def test_sessionize_gap_split():
    from har2tree_ray.pipelines.events import sessionize

    ds = _mk([
        {"event_id": 1, "user_id": 1, "ts": "2024-01-01 00:00:00", "event_type": "view", "value": 1.0, "props": "{}"},
        {"event_id": 2, "user_id": 1, "ts": "2024-01-01 00:10:00", "event_type": "view", "value": 2.0, "props": "{}"},
        # 31-minute gap → new session
        {"event_id": 3, "user_id": 1, "ts": "2024-01-01 00:41:00", "event_type": "view", "value": 3.0, "props": "{}"},
        {"event_id": 4, "user_id": 2, "ts": "2024-01-01 00:00:00", "event_type": "view", "value": 4.0, "props": "{}"},
    ])
    out = to_pandas(sessionize(ds)).sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert out["session_id"].tolist() == [1, 2, 1]
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out["total_cents"].tolist() == [300, 300, 400]


def test_asof_matches_latest_prior_click():
    from har2tree_ray.pipelines.events import asof_error_click

    ds = _mk([
        {"event_id": 1, "user_id": 1, "ts": "2024-01-01 00:00:00", "event_type": "click", "value": 0.0, "props": "{}"},
        {"event_id": 2, "user_id": 1, "ts": "2024-01-01 00:05:00", "event_type": "click", "value": 0.0, "props": "{}"},
        {"event_id": 3, "user_id": 1, "ts": "2024-01-01 00:06:00", "event_type": "error", "value": 0.0, "props": "{}"},
        # error before any click → dropped
        {"event_id": 5, "user_id": 2, "ts": "2024-01-01 00:00:00", "event_type": "error", "value": 0.0, "props": "{}"},
    ])
    out = to_pandas(asof_error_click(ds))
    assert len(out) == 1
    assert out.iloc[0]["click_id"] == 2
    assert out.iloc[0]["lag_us"] == 60_000_000


def test_props_rollup_null_semantics():
    """Rows with missing/malformed props are skipped by sum/max but counted
    in n — SQL NULL semantics (the oracle's SUM/MAX skip NULLs)."""
    import pandas as pd
    import ray.data as rd

    from har2tree_ray.pipelines.events import props_rollup

    ds = rd.from_items([
        {"event_type": "a", "props": '{"k": 5}'},
        {"event_type": "a", "props": '{"other": 1}'},   # no 'k' → skipped
        {"event_type": "a", "props": "not json"},        # malformed → skipped
        {"event_type": "a", "props": None},              # null → skipped
        {"event_type": "a", "props": '{"k": -7}'},
        {"event_type": "b", "props": '{"x": 1}'},        # type with no k at all
    ])
    out = props_rollup(ds).to_pandas().set_index("event_type")
    assert out.loc["a", "sum_k"] == -2
    assert out.loc["a", "max_k"] == 5
    assert out.loc["a", "n"] == 5
    assert out.loc["b", "n"] == 1
    assert pd.isna(out.loc["b", "sum_k"]) and pd.isna(out.loc["b", "max_k"])


def test_funnel_strict_ordering():
    """Step k must be strictly after step k-1; out-of-order events do not
    count (view after click does not make the click a step 2)."""
    import pandas as pd
    import ray.data as rd

    from har2tree_ray.pipelines.events import funnel

    t0 = pd.Timestamp("2026-01-01")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1: full funnel in order
        dict(user_id=1, event_id=1, ts=t0, event_type="view"),
        dict(user_id=1, event_id=2, ts=t0 + m, event_type="click"),
        dict(user_id=1, event_id=3, ts=t0 + 2 * m, event_type="purchase"),
        # user 2: click BEFORE view -> stops at step 1
        dict(user_id=2, event_id=4, ts=t0, event_type="click"),
        dict(user_id=2, event_id=5, ts=t0 + m, event_type="view"),
        # user 3: never views -> reaches nothing
        dict(user_id=3, event_id=6, ts=t0, event_type="purchase"),
    ]
    out = funnel(rd.from_pandas(pd.DataFrame(rows))).to_pandas()
    got = out.set_index("step")["n_users"].to_dict()
    assert got == {1: 2, 2: 1, 3: 1}


def test_running_total_bruteforce():
    import pandas as pd

    from har2tree_ray.pipelines import events as ev
    from har2tree_ray.sources.interleaved import read_table

    sf = "/root/testdata/sf0.001"
    got = ev.running_total(
        read_table(sf, "events",
                   columns=["user_id", "ts", "event_id", "value"])).to_pandas()
    df = read_table(sf, "events",
                    columns=["user_id", "ts", "event_id", "value"]).to_pandas()
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    cents = (df["value"] * 100).round().astype("int64")
    want = pd.DataFrame({
        "event_id": df["event_id"].to_numpy(),
        "user_id": df["user_id"].to_numpy(),
        "running_n": (cents.groupby(df["user_id"].to_numpy()).cumcount() + 1)
        .astype("int64").to_numpy(),
        "running_cents": cents.groupby(df["user_id"].to_numpy()).cumsum()
        .to_numpy(),
    })
    got_s = got.sort_values("event_id").reset_index(drop=True)
    want_s = want.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)
    assert len(got_s) == len(df)


def test_window_distinct_bruteforce():
    import pandas as pd

    from har2tree_ray.pipelines import events as ev
    from har2tree_ray.sources.interleaved import read_table

    sf = "/root/testdata/sf0.001"
    got = ev.window_distinct(
        read_table(sf, "events",
                   columns=["ts", "event_type", "user_id"])).to_pandas()
    df = read_table(sf, "events",
                    columns=["ts", "event_type", "user_id"]).to_pandas()
    hop_us = 30 * 60 * 1_000_000
    us = df["ts"].astype("int64")
    frames = []
    for k in range(2):
        frames.append(pd.DataFrame({
            "window_start": ((us // hop_us) * hop_us - k * hop_us)
            .astype("datetime64[us]"),
            "event_type": df["event_type"],
            "user_id": df["user_id"],
        }))
    rep = pd.concat(frames, ignore_index=True)
    want = (rep.groupby(["window_start", "event_type"])["user_id"]
            .nunique().reset_index(name="n_users"))
    key = ["window_start", "event_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s) and len(got_s) > 0
    pd.testing.assert_frame_equal(got_s[want_s.columns.tolist()], want_s,
                                  check_dtype=False)


def test_burst_windows_bruteforce():
    import pandas as pd

    from har2tree_ray.pipelines import events as ev
    from har2tree_ray.sources.interleaved import read_table

    sf = "/root/testdata/sf0.001"
    got = ev.burst_windows(
        read_table(sf, "events", columns=["ts", "event_type"])).to_pandas()
    df = read_table(sf, "events", columns=["ts", "event_type"]).to_pandas()
    width_us = 60 * 60 * 1_000_000
    us = df["ts"].astype("int64")
    c = (pd.DataFrame({"w": (us // width_us) * width_us,
                       "event_type": df["event_type"]})
         .groupby(["w", "event_type"]).size().reset_index(name="n"))
    prev = c.rename(columns={"n": "pn"}).copy()
    prev["w"] += width_us
    m = c.merge(prev, on=["w", "event_type"], how="left")
    m["pn"] = m["pn"].fillna(0).astype("int64")
    m = m[m["n"] > 2 * m["pn"]]
    want = pd.DataFrame({
        "window_start": m["w"].astype("datetime64[us]"),
        "event_type": m["event_type"],
        "n_events": m["n"].astype("int64"),
        "prev_n": m["pn"]})
    key = ["window_start", "event_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s) and len(got_s) > 0
    pd.testing.assert_frame_equal(got_s[want_s.columns.tolist()], want_s,
                                  check_dtype=False)
    # both burst causes present: silence->activity and genuine 2x jumps
    assert (got_s["prev_n"] == 0).any()


def test_topk_users_bruteforce():
    import pandas as pd

    from har2tree_ray.pipelines import events as ev
    from har2tree_ray.sources.interleaved import read_table

    sf = "/root/testdata/sf0.001"
    got = ev.topk_users(
        read_table(sf, "events",
                   columns=["event_type", "user_id", "value"])).to_pandas()
    df = read_table(sf, "events",
                    columns=["event_type", "user_id", "value"]).to_pandas()
    df["cents"] = (df["value"] * 100).round().astype("int64")
    t = (df.groupby(["event_type", "user_id"])["cents"].sum()
         .reset_index(name="total_cents"))
    t = t.sort_values(["event_type", "total_cents", "user_id"],
                      ascending=[True, False, True], kind="mergesort")
    t["rank"] = (t.groupby("event_type").cumcount() + 1).astype("int64")
    want = t[t["rank"] <= 5][["event_type", "rank", "user_id", "total_cents"]]
    key = ["event_type", "rank"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s) and len(got_s) > 0
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)


def test_rfm_bruteforce():
    import pandas as pd

    from har2tree_ray.pipelines import events as ev
    from har2tree_ray.sources.interleaved import read_table

    sf = "/root/testdata/sf0.001"
    got = ev.rfm(read_table(sf, "events",
                            columns=["user_id", "ts", "value"])).to_pandas()
    df = read_table(sf, "events",
                    columns=["user_id", "ts", "value"]).to_pandas()
    df["cents"] = (df["value"] * 100).round().astype("int64")
    want = df.groupby("user_id").agg(
        last_ts=("ts", "max"), n_events=("cents", "size"),
        total_cents=("cents", "sum")).reset_index()
    got_s = got.sort_values("user_id").reset_index(drop=True)
    want_s = want.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s[want_s.columns.tolist()], want_s,
                                  check_dtype=False)


def test_session_histogram_consistency():
    """The histogram must be exactly the value_counts of sessionize's
    n_events column (composition correctness)."""
    import pandas as pd

    from har2tree_ray.pipelines import events as ev
    from har2tree_ray.sources.interleaved import read_table

    sf = "/root/testdata/sf0.001"
    cols = ["user_id", "ts", "event_id", "value"]
    sessions = ev.sessionize(read_table(sf, "events", columns=cols)).to_pandas()
    got = ev.session_histogram(
        read_table(sf, "events", columns=cols)).to_pandas()
    want = (sessions["n_events"].value_counts().rename_axis("n_events")
            .reset_index(name="n_sessions"))
    got_s = got.sort_values("n_events").reset_index(drop=True)
    want_s = want.sort_values("n_events").reset_index(drop=True)
    assert len(got_s) > 0
    pd.testing.assert_frame_equal(got_s, want_s[got_s.columns],
                                  check_dtype=False)
    assert got_s["n_sessions"].sum() == len(sessions)
