"""Event-stream operators over the ``events`` table (event_id, ts, user_id,
event_type, value, props-JSON) — the windowed / sessionization / as-of
custom operators a training-data pipeline needs (SURVEY §2.9's ordering
concerns generalized to a real timestamped stream; the reference's only
temporal join is the cookie as-of, har2tree/har2tree.py:372-385).

Partitioning: every operator here shuffles at most once, keyed on
``user_id`` (sessionize, as-of) or on the window key (tumbling agg); the
tumbling aggregate pre-aggregates inside ``map_batches`` so only partial
(window, type) rows — not events — cross the exchange.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

SESSION_GAP_MIN = 30
WINDOW = "1h"


# ------------------------------------------------------------ sessionization


def sessionize(events_ds, gap_min: int = SESSION_GAP_MIN,
               n_parts: int | None = None):
    """Per-user session windows: a new session starts when the gap from the
    previous event exceeds ``gap_min`` minutes.

    One shuffle — but keyed on ``crc32(user_id) % n_parts`` rather than
    user_id itself: user keys are numerous (one Ray group per user would
    pay Python dispatch per user), while a coarse range keeps every user's
    rows in ONE group and the whole range resolves with a single vectorized
    pandas pass (sort by (user, ts, event_id); session break = user change
    or gap; grouped cumsum; one hash group-by for the window aggregates)."""
    from ..util import user_range_groupby

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        # exact-integer money (values carry 2 decimals) — float summation
        # order would otherwise differ between engines
        df["cents"] = (df["value"] * 100).round().astype("int64")
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap = df["ts"].diff() > pd.Timedelta(minutes=gap_min)
        brk = (gap & ~new_user).astype("int64")
        df["session_id"] = brk.groupby(df["user_id"].to_numpy()).cumsum() + 1
        g = df.groupby(["user_id", "session_id"], as_index=False, sort=False).agg(
            n_events=("cents", "size"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max"),
            total_cents=("cents", "sum"),
        )
        g["n_events"] = g["n_events"].astype("int64")
        g["total_cents"] = g["total_cents"].astype("int64")
        return g[["user_id", "session_id", "n_events", "start_ts", "end_ts",
                  "total_cents"]]

    return user_range_groupby(events_ds, per_range, n_parts=n_parts)


def sessionize_sql(gap_min: int = SESSION_GAP_MIN) -> str:
    return f"""
WITH o AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL {gap_min} MINUTE
                THEN 1 ELSE 0 END AS brk
    FROM events
), s AS (
    SELECT *, 1 + SUM(brk) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS session_id
    FROM o
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
FROM s GROUP BY user_id, session_id
"""


# ------------------------------------------------------ transition bigrams


def transitions(events_ds, n_parts: int | None = None):
    """Per-user event-type transition counts — the clickstream Markov
    matrix: for every consecutive (prev, next) event pair of a user
    (ordered by ts, event_id), count the (from_type, to_type) bigram.

    Same shape as sessionize: ONE crc32 user-range shuffle, one vectorized
    pandas pass per range (sort + shift — no per-user dispatch), partial
    bigram counts per range, then a final native groupby over the bounded
    type×type key space (|event_type|² rows)."""
    from ray.data.aggregate import Sum

    from ..util import user_range_groupby

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same = df["user_id"].eq(df["user_id"].shift())
        sel = pd.DataFrame({"from_type": df["event_type"].shift()[same],
                            "to_type": df["event_type"][same]})
        if sel.empty:
            return pd.DataFrame({"from_type": pd.Series(dtype=object),
                                 "to_type": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        # dropna=False: the oracle's GROUP BY keeps NULL to_type rows
        g = sel.groupby(["from_type", "to_type"], as_index=False, sort=False,
                        dropna=False).size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    import pyarrow.compute as pc

    partials = user_range_groupby(events_ds, per_range, n_parts=n_parts)
    agg = partials.groupby(["from_type", "to_type"]).aggregate(
        Sum("n", alias_name="n_transitions"))
    return agg.map_batches(
        lambda t: pa.table({
            "from_type": t["from_type"],
            "to_type": t["to_type"],
            "n_transitions": pc.cast(t["n_transitions"], pa.int64()),
        }),
        batch_format="pyarrow")


def transitions_sql() -> str:
    return """
WITH o AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
)
SELECT prev_type AS from_type, event_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM o WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


# -------------------------------------------------------- tumbling window agg


def window_agg(events_ds):
    """Tumbling 1-hour windows × event_type — partial aggregation inside
    map_batches (combiner), then a small groupby over (window, type) partials
    (SURVEY guidance: push aggregation partial before the shuffle)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["window_start"] = df["ts"].dt.floor("h")
        df["cents"] = (df["value"] * 100).round().astype("int64")
        g = df.groupby(["window_start", "event_type"], sort=False).agg(
            part_n=("event_id", "size"), part_cents=("cents", "sum"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    from ..util import pre_shuffle_coalesce

    partials = pre_shuffle_coalesce(events_ds.map_batches(partial, batch_format="pyarrow"))

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.Table.from_pandas(pd.DataFrame({
            "window_start": [df["window_start"].iloc[0]],
            "event_type": [df["event_type"].iloc[0]],
            "n_events": [int(df["part_n"].sum())],
            "total_cents": [int(df["part_cents"].sum())],
        }), preserve_index=False)

    return partials.groupby(["window_start", "event_type"]).map_groups(
        merge, batch_format="pyarrow")


def window_agg_sql() -> str:
    return """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------- sliding (hopping) window


def window_sliding(events_ds, width_min: int = 60, hop_min: int = 30):
    """Sliding (hopping) window aggregate: ``width_min``-minute windows
    advancing every ``hop_min`` minutes, so each event belongs to
    ``width/hop`` overlapping windows — the streaming-window family's
    second member next to the tumbling ``window_agg``.

    Same scale shape: the per-event window REPLICATION (width/hop rows)
    happens batch-locally and is immediately pre-aggregated to
    (window_start, event_type) partials before the one bounded shuffle —
    window×type cardinality, not event cardinality, crosses the exchange.
    Window starts are integer epoch-microsecond floors, bit-exact vs the
    oracle's ``make_timestamp((epoch_us(ts) // hop) * hop)`` arithmetic.
    """
    if width_min % hop_min:
        raise ValueError("width must be a multiple of hop")
    n_hops = width_min // hop_min
    hop_us = hop_min * 60 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        us = df["ts"].astype("int64").to_numpy()          # epoch micros
        base = (us // hop_us) * hop_us
        cents = (df["value"] * 100).round().astype("int64").to_numpy()
        etype = df["event_type"].to_numpy()
        frames = []
        for k in range(n_hops):
            frames.append(pd.DataFrame({
                "window_start": base - k * hop_us,
                "event_type": etype,
                "cents": cents,
            }))
        rep = pd.concat(frames, ignore_index=True)
        g = rep.groupby(["window_start", "event_type"], sort=False).agg(
            part_n=("cents", "size"), part_cents=("cents", "sum")).reset_index()
        g["window_start"] = g["window_start"].astype("datetime64[us]")
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    from ..util import pre_shuffle_coalesce

    partials = pre_shuffle_coalesce(
        events_ds.map_batches(partial, batch_format="pyarrow"))
    agg = partials.groupby(["window_start", "event_type"]).aggregate(
        Sum("part_n", alias_name="n_events"),
        Sum("part_cents", alias_name="total_cents"))
    import pyarrow.compute as pc

    return agg.map_batches(
        lambda t: pa.table({
            "window_start": t["window_start"],
            "event_type": t["event_type"],
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "total_cents": pc.cast(t["total_cents"], pa.int64()),
        }),
        batch_format="pyarrow")


def window_sliding_sql(width_min: int = 60, hop_min: int = 30) -> str:
    n_hops = width_min // hop_min
    hop_us = hop_min * 60 * 1_000_000
    return f"""
WITH h AS (
    SELECT event_type, value,
           (epoch_us(ts) // {hop_us}) * {hop_us} AS base_us
    FROM events
), rep AS (
    SELECT event_type, value,
           make_timestamp(base_us - k.k * {hop_us}) AS window_start
    FROM h, (SELECT CAST(g AS BIGINT) AS k
             FROM generate_series(0, {n_hops - 1}) AS t(g)) k
)
SELECT window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
FROM rep GROUP BY 1, 2
"""


# ----------------------------------------------------------------- as-of join


def asof_error_click(events_ds):
    """As-of join within the stream: each 'error' event matched to the most
    recent preceding 'click' of the same user (NULL-free: unmatched errors
    are dropped).  Generalizes the reference's cookie as-of
    (har2tree/har2tree.py:372-385) to a timestamped table."""

    from ..util import user_range_groupby

    empty = {"user_id": "int64", "error_id": "int64",
             "click_id": "int64", "lag_us": "int64"}

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized merge_asof over ALL the range's users (by=user_id);
        # strict c.ts < e.ts via allow_exact_matches=False, ties among
        # same-ts clicks resolve to the highest event_id (frame sorted by
        # (ts, event_id), merge_asof takes the last preceding row) — the
        # same tie the SQL's ROW_NUMBER ... ORDER BY c.ts, c.event_id DESC
        # picks.
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        clicks = df.loc[df["event_type"] == "click",
                        ["user_id", "ts", "event_id"]].rename(
            columns={"event_id": "click_id"})
        clicks["click_ts"] = clicks["ts"]
        errors = df.loc[df["event_type"] == "error",
                        ["user_id", "ts", "event_id"]].rename(
            columns={"event_id": "error_id"})
        if clicks.empty or errors.empty:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in empty.items()})
        m = pd.merge_asof(errors, clicks, on="ts", by="user_id",
                          direction="backward", allow_exact_matches=False)
        m = m.dropna(subset=["click_id"])
        lag = (m["ts"].to_numpy() - m["click_ts"].to_numpy()) \
            // np.timedelta64(1, "us")
        return pd.DataFrame({
            "user_id": m["user_id"].to_numpy(),
            "error_id": m["error_id"].to_numpy(),
            "click_id": m["click_id"].to_numpy().astype("int64"),
            "lag_us": lag.astype("int64"),
        })

    return user_range_groupby(events_ds, per_range)


def asof_error_click_sql() -> str:
    return """
WITH m AS (
    SELECT e.user_id, e.event_id AS error_id, c.event_id AS click_id,
           CAST(date_diff('microsecond', c.ts, e.ts) AS BIGINT) AS lag_us,
           ROW_NUMBER() OVER (PARTITION BY e.event_id
                              ORDER BY c.ts DESC, c.event_id DESC) AS rn
    FROM events e JOIN events c
      ON c.user_id = e.user_id AND c.event_type = 'click'
     AND e.event_type = 'error' AND c.ts < e.ts
)
SELECT user_id, error_id, click_id, lag_us FROM m WHERE rn = 1
"""


# ------------------------------------------------------------------ funnel

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel(events_ds, steps: tuple[str, ...] = FUNNEL_STEPS):
    """Ordered-sequence funnel: how many users reach each step, where step k
    means the first step-k event STRICTLY after the time the user reached
    step k-1 (first-occurrence semantics, ties on ts break nothing because
    the comparison is on ts alone — mirrored exactly by the SQL oracle).

    One user-keyed shuffle; per-user evaluation is vectorized pandas (min-ts
    per step, no event walk), then batch-local partial counts → tiny Sum."""
    from ray.data.aggregate import Sum

    from ..util import pre_shuffle_coalesce

    from ..util import user_range_groupby

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        # loop over the (constant-count) STEPS, never over users: step k's
        # per-user min-ts is one hash group-by filtered to users whose
        # reached == k and whose events fall strictly after their step-k-1
        # time — identical semantics to the sequential per-user walk.
        users = pd.Index(df["user_id"].unique())
        reached = pd.Series(0, index=users, dtype="int64")
        t_prev = pd.Series(dtype="datetime64[us]")  # set by the k=0 pass
        for k, s in enumerate(steps):
            sel = df[df["event_type"] == s]
            if k > 0:
                lim = sel["user_id"].map(t_prev)
                sel = sel[sel["ts"] > lim]  # NaT compares False → drops
            if sel.empty:
                break
            m = sel.groupby("user_id")["ts"].min()
            m = m[reached.reindex(m.index).to_numpy() == k]
            reached.loc[m.index] += 1
            t_prev = m
        return pd.DataFrame({"user_id": users.to_numpy(),
                             "reached": reached.to_numpy()})

    per = user_range_groupby(
        events_ds.select_columns(["user_id", "ts", "event_type"]), per_range)

    def partial(t: pa.Table) -> pa.Table:
        r = t["reached"].to_numpy(zero_copy_only=False)
        ks = np.arange(1, len(steps) + 1, dtype=np.int64)
        return pa.table({
            "step": pa.array(ks, pa.int64()),
            "part_n": pa.array([(r >= k).sum() for k in ks], pa.int64()),
        })

    agg = pre_shuffle_coalesce(
        per.map_batches(partial, batch_format="pyarrow")
    ).groupby("step").aggregate(Sum("part_n", alias_name="n_users"))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        names = pa.array([steps[int(s) - 1] for s in t["step"].to_pylist()],
                         pa.string())
        return pa.table({
            "step": pc.cast(t["step"], pa.int64()),
            "event_type": names,
            "n_users": pc.cast(t["n_users"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def funnel_sql(steps: tuple[str, ...] = FUNNEL_STEPS) -> str:
    ctes = [f"""u1 AS (
    SELECT user_id, MIN(ts) AS t1 FROM events
    WHERE event_type = '{steps[0]}' GROUP BY user_id
)"""]
    for k in range(2, len(steps) + 1):
        ctes.append(f"""u{k} AS (
    SELECT e.user_id, MIN(e.ts) AS t{k}
    FROM events e JOIN u{k - 1} p ON e.user_id = p.user_id
    WHERE e.event_type = '{steps[k - 1]}' AND e.ts > p.t{k - 1}
    GROUP BY e.user_id
)""")
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS step, '{steps[k - 1]}' AS event_type, "
        f"CAST(COUNT(*) AS BIGINT) AS n_users FROM u{k}"
        for k in range(1, len(steps) + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + selects


# ---------------------------------------------------------------- retention

RETENTION_MAX_DAYS = 30


def retention(events_ds, max_days: int = RETENTION_MAX_DAYS):
    """Cohort retention matrix: users grouped by the DATE of their first
    event; for each day offset, how many of the cohort were active that day.
    Output: (cohort_day ISO string, day_offset, n_users).

    One user-keyed shuffle; each user contributes at most one row per
    (cohort, offset) pair (distinct-by-construction), so the final count is
    a plain Sum over batch-local partials — never a distinct over events."""
    from ray.data.aggregate import Sum

    from ..util import pre_shuffle_coalesce

    from ..util import user_range_groupby

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        # all users of the range in one pass: cohort day via grouped
        # transform-min, offsets deduped with one drop_duplicates
        day = df["ts"].dt.normalize()
        d0 = day.groupby(df["user_id"].to_numpy()).transform("min")
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "cohort_day": d0.dt.strftime("%Y-%m-%d").to_numpy(),
            "day_offset": (day - d0).dt.days.astype("int64").to_numpy(),
        })
        out = out[out["day_offset"] <= max_days].drop_duplicates()
        return out[["cohort_day", "day_offset"]]

    per = user_range_groupby(
        events_ds.select_columns(["user_id", "ts"]), per_range)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["cohort_day", "day_offset"]).aggregate(
            [("cohort_day", "count")])
        return g.rename_columns(["cohort_day", "day_offset", "part_n"])

    agg = pre_shuffle_coalesce(
        per.map_batches(partial, batch_format="pyarrow")
    ).groupby(["cohort_day", "day_offset"]).aggregate(
        Sum("part_n", alias_name="n_users"))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "cohort_day": t["cohort_day"],
            "day_offset": pc.cast(t["day_offset"], pa.int64()),
            "n_users": pc.cast(t["n_users"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def retention_sql(max_days: int = RETENTION_MAX_DAYS) -> str:
    return f"""
WITH u AS (
    SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort FROM events GROUP BY user_id
), a AS (
    SELECT DISTINCT e.user_id, u.cohort,
           date_diff('day', u.cohort, CAST(e.ts AS DATE)) AS day_offset
    FROM events e JOIN u ON e.user_id = u.user_id
)
SELECT CAST(cohort AS VARCHAR) AS cohort_day,
       CAST(day_offset AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM a WHERE day_offset <= {max_days}
GROUP BY cohort, day_offset
"""


# ------------------------------------------------------------- JSON decoding


def props_rollup(events_ds):
    """JSON-decode the props column (the reference's mime-routed POST-body
    decode M12, har2tree/nodes.py:260-498, recast to a typed table) and
    aggregate per event_type."""

    def partial(batch: pa.Table) -> pa.Table:
        types = batch["event_type"].to_pylist()
        ks = []
        for p in batch["props"].to_pylist():
            # rows whose props are null/malformed or lack 'k' are SKIPPED by
            # sum/max (SQL NULL semantics — the oracle's SUM/MAX do the same)
            # but still counted in n (COUNT(*))
            try:
                v = json.loads(p) if p else None
            except (ValueError, TypeError):
                v = None
            ks.append(v.get("k") if isinstance(v, dict) else None)
        df = pd.DataFrame({"event_type": types,
                           "k": pd.array(ks, dtype="Int64")})
        g = df.groupby("event_type", sort=False).agg(
            part_sum=("k", "sum"), part_n=("k", "size"),
            part_max=("k", "max"), part_cnt=("k", "count"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    partials = events_ds.map_batches(partial, batch_format="pyarrow")

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        has_k = int(df["part_cnt"].sum()) > 0
        return pa.Table.from_pandas(pd.DataFrame({
            "event_type": [df["event_type"].iloc[0]],
            "sum_k": [int(df["part_sum"].sum()) if has_k else None],
            "n": [int(df["part_n"].sum())],
            "max_k": [int(df["part_max"].max()) if has_k else None],
        }), preserve_index=False)

    return partials.groupby("event_type").map_groups(merge, batch_format="pyarrow")


def props_rollup_sql() -> str:
    return """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
"""


def running_total(events_ds, n_parts: int | None = None):
    """Per-user ORDERED prefix aggregation — the distributed window
    function ``SUM/COUNT OVER (PARTITION BY user ORDER BY ts, event_id)``:
    each event is annotated with the user's running event count and running
    value total (exact integer cents, avoiding float summation order).

    Same shape as sessionize: ONE crc32 user-range shuffle (every user's
    rows in exactly one range), then a single vectorized pandas pass per
    range (sort + grouped cumsum/cumcount).  Output row count equals input
    row count — the stage is a windowed annotate, not an aggregate."""
    from ..util import user_range_groupby

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = (df["value"] * 100).round().astype("int64")
        u = df["user_id"].to_numpy()
        out = pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "user_id": u,
            "running_n": cents.groupby(u).cumcount() + 1,
            "running_cents": cents.groupby(u).cumsum().to_numpy(),
        })
        out["running_n"] = out["running_n"].astype("int64")
        return out

    return user_range_groupby(events_ds, per_range, n_parts=n_parts)


def running_total_sql(rel: str = "events") -> str:
    return f"""
SELECT event_id, user_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS running_n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
           AS running_cents
FROM {rel}
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def window_distinct(events_ds, width_min: int = 60, hop_min: int = 30,
                    n_parts: int | None = None):
    """EXACT distinct-user count per hopping window and event type — the
    COUNT(DISTINCT) member of the streaming-window family (window_sliding
    counts events; this counts users).

    Distinct counts don't pre-sum, so the plan is the exact-dedup shape:
    batch-local window replication collapses immediately to DISTINCT
    (window, type, user) partials — each batch ships each triple once —
    then ONE coarse hash-range shuffle on the COMPOSITE triple key (uniform
    by construction: the user axis spreads any hot window across every
    range) dedups globally and emits per-(window, type) partial counts,
    and a final bounded-key groupby (window×type cardinality) sums them.
    The approximate escalation at register scale is the HLL register
    sketch of ``tile_host_hll`` keyed on (window, type).
    """
    if width_min % hop_min:
        raise ValueError("width must be a multiple of hop")
    n_hops = width_min // hop_min
    hop_us = hop_min * 60 * 1_000_000

    from ..util import (default_n_parts, key_partition_ids,
                        pre_shuffle_coalesce, user_range_groupby)

    if n_parts is None:
        n_parts = default_n_parts()

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        us = df["ts"].astype("int64").to_numpy()
        base = (us // hop_us) * hop_us
        frames = [pd.DataFrame({
            "window_start": base - k * hop_us,
            "event_type": df["event_type"].to_numpy(),
            "user_id": df["user_id"].to_numpy(),
        }) for k in range(n_hops)]
        rep = pd.concat(frames, ignore_index=True).drop_duplicates()
        t = pa.Table.from_pandas(rep, preserve_index=False)
        # composite-key range id: combine the three columns' hashes so a
        # hot window still spreads across ranges via the user axis
        gp = (key_partition_ids(t["window_start"], 1 << 20).astype("int64")
              * 1_000_003
              + key_partition_ids(t["user_id"], 1 << 20).astype("int64")
              * 31
              + key_partition_ids(t["event_type"], 1 << 20).astype("int64")
              ) % n_parts
        return t.append_column("_kpart", pa.array(gp.astype("int32")))

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        ded = df.drop(columns=["_kpart"]).drop_duplicates()
        g = ded.groupby(["window_start", "event_type"], sort=False).size()
        out = g.reset_index(name="part_n")
        out["part_n"] = out["part_n"].astype("int64")
        return out   # window_start stays int64 epoch-us through the merge

    parts = pre_shuffle_coalesce(
        events_ds.map_batches(partial, batch_format="pyarrow"))
    counts = parts.groupby("_kpart").map_groups(
        per_range, batch_format="pandas")

    # merge the per-range partials with a SECOND coarse range shuffle on the
    # int64 window key + a vectorized pandas sum — NOT a native composite
    # (timestamp, string) aggregate, which measured 30+ s on 7k groups at
    # sf0.1 (the host_cooccur lesson: native multi-key sort-aggregates pay
    # per-group overhead; an int-keyed range + hash groupby doesn't).
    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["window_start", "event_type"], sort=False)
             ["part_n"].sum().reset_index(name="n_users"))
        g["n_users"] = g["n_users"].astype("int64")
        g["window_start"] = g["window_start"].astype("datetime64[us]")
        return g

    return user_range_groupby(counts, merge, key="window_start",
                              n_parts=n_parts)


def window_distinct_sql(width_min: int = 60, hop_min: int = 30) -> str:
    n_hops = width_min // hop_min
    hop_us = hop_min * 60 * 1_000_000
    return f"""
WITH h AS (
    SELECT event_type, user_id,
           (epoch_us(ts) // {hop_us}) * {hop_us} AS base_us
    FROM events
), rep AS (
    SELECT event_type, user_id,
           make_timestamp(base_us - k.k * {hop_us}) AS window_start
    FROM h, (SELECT CAST(g AS BIGINT) AS k
             FROM generate_series(0, {n_hops - 1}) AS t(g)) k
)
SELECT window_start, event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM rep GROUP BY 1, 2
"""


def burst_windows(events_ds, width_min: int = 60, factor: int = 2,
                  n_parts: int | None = None):
    """Streaming burst detection over tumbling windows: every
    (window, event_type) whose event count exceeds ``factor`` × the
    PREVIOUS window's count (absent previous window counts as 0, so any
    activity after silence is a burst) — the monitoring/alerting member
    of the window family.

    Fully distributed, no driver-side window table: (1) batch-local
    (window, type) partial counts → one coarse int-keyed range shuffle +
    vectorized pandas sum (the event_window_distinct merge pattern);
    (2) each summed count row is emitted TWICE — keyed at its own window
    ("self") and at the NEXT window (as that window's "prev") — and a
    second range shuffle on the window key lets a vectorized per-range
    merge pair self with prev and filter bursts.  Both exchanges move
    window×type-cardinality rows, never events."""
    width_us = width_min * 60 * 1_000_000

    from ..util import user_range_groupby

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        us = df["ts"].astype("int64").to_numpy()
        g = (pd.DataFrame({"window_us": (us // width_us) * width_us,
                           "event_type": df["event_type"].to_numpy()})
             .groupby(["window_us", "event_type"], sort=False)
             .size().reset_index(name="part_n"))
        g["part_n"] = g["part_n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def sum_range(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["window_us", "event_type"], sort=False)
             ["part_n"].sum().reset_index(name="n"))
        g["n"] = g["n"].astype("int64")
        return g

    counts = user_range_groupby(
        events_ds.map_batches(partial, batch_format="pyarrow"),
        sum_range, key="window_us", n_parts=n_parts)

    def dual(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        self_rows = pd.DataFrame({
            "key_us": df["window_us"], "event_type": df["event_type"],
            "n_self": df["n"], "n_prev": 0})
        prev_rows = pd.DataFrame({
            "key_us": df["window_us"] + width_us, "event_type": df["event_type"],
            "n_self": 0, "n_prev": df["n"]})
        out = pd.concat([self_rows, prev_rows], ignore_index=True)
        out["n_self"] = out["n_self"].astype("int64")
        out["n_prev"] = out["n_prev"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["key_us", "event_type"], sort=False)
             .agg(n_events=("n_self", "sum"), prev_n=("n_prev", "sum"))
             .reset_index())
        g = g[(g["n_events"] > 0) & (g["n_events"] > factor * g["prev_n"])]
        return pd.DataFrame({
            "window_start": g["key_us"].astype("datetime64[us]"),
            "event_type": g["event_type"],
            "n_events": g["n_events"].astype("int64"),
            "prev_n": g["prev_n"].astype("int64"),
        })

    return user_range_groupby(
        counts.map_batches(dual, batch_format="pyarrow"),
        resolve, key="key_us", n_parts=n_parts)


def burst_windows_sql(width_min: int = 60, factor: int = 2) -> str:
    width_us = width_min * 60 * 1_000_000
    return f"""
WITH c AS (
    SELECT (epoch_us(ts) // {width_us}) * {width_us} AS window_us,
           event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
)
SELECT make_timestamp(a.window_us) AS window_start, a.event_type,
       a.n AS n_events, CAST(COALESCE(p.n, 0) AS BIGINT) AS prev_n
FROM c a
LEFT JOIN c p ON p.event_type = a.event_type
             AND p.window_us = a.window_us - {width_us}
WHERE a.n > {factor} * COALESCE(p.n, 0)
"""


def topk_users(events_ds, k: int = 5, n_parts: int | None = None):
    """Top-k users by total spend per event type (exact integer cents,
    ties by user_id ascending) — distributed top-k-per-group over the
    event stream, the "biggest spenders per category" leaderboard.

    Scale shape: batch-local (type, user) partial cent sums (the combiner
    bounds a hot type to its distinct users per batch) → ONE crc32
    USER-range shuffle — keyed on the user axis, not the handful of types,
    so the exchange stays uniform — summing per (type, user); per-range
    local top-k per type (safe: a range holds each user's whole total) →
    gather the ≤ n_parts × |types| × k finalists into one final exact
    rank (small by construction).  The two-phase top-k pattern of
    host_topk_urls, with a cross-range finalist merge because the GROUP
    key (type) spans ranges."""
    from ..util import default_n_parts, key_partition_ids, pre_shuffle_coalesce

    if n_parts is None:
        n_parts = default_n_parts()

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["cents"] = (df["value"] * 100).round().astype("int64")
        g = (df.groupby(["event_type", "user_id"], sort=False)["cents"].sum()
             .reset_index(name="part_cents"))
        g["part_cents"] = g["part_cents"].astype("int64")
        t = pa.Table.from_pandas(g, preserve_index=False)
        return t.append_column(
            "gpart", pa.array(key_partition_ids(t["user_id"], n_parts)))

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["event_type", "user_id"], sort=False)["part_cents"]
             .sum().reset_index(name="total_cents"))
        g["total_cents"] = g["total_cents"].astype("int64")
        g = g.sort_values(["event_type", "total_cents", "user_id"],
                          ascending=[True, False, True], kind="mergesort")
        return g[g.groupby("event_type").cumcount() < k]

    finalists = pre_shuffle_coalesce(
        events_ds.map_batches(partial, batch_format="pyarrow")
    ).groupby("gpart").map_groups(per_range, batch_format="pandas")

    def final_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "total_cents", "user_id"],
                            ascending=[True, False, True], kind="mergesort")
        df["rank"] = (df.groupby("event_type").cumcount() + 1).astype("int64")
        out = df[df["rank"] <= k].reset_index(drop=True)
        return out[["event_type", "rank", "user_id", "total_cents"]]

    # finalist set is <= n_parts * |types| * k rows — resolve in one group
    # (batch_size=None: rank over the whole single block, never a split)
    return finalists.repartition(1).map_batches(
        final_rank, batch_format="pandas", batch_size=None)


def topk_users_sql(k: int = 5) -> str:
    return f"""
WITH t AS (
    SELECT event_type, user_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM events GROUP BY 1, 2
), r AS (
    SELECT event_type, user_id, total_cents,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY total_cents DESC, user_id) AS rank
    FROM t
)
SELECT event_type, CAST(rank AS BIGINT) AS rank, user_id, total_cents
FROM r WHERE rank <= {k}
"""


def rfm(events_ds, n_parts: int | None = None):
    """Per-user RFM profile (recency / frequency / monetary) in exact
    units: last event timestamp, event count, total spend in integer
    cents — the classic user-segmentation aggregate.

    Scale shape: batch-local per-user partials (max ts, count, cent sum —
    all mergeable) → ONE crc32 user-range shuffle → vectorized per-range
    merge.  Nothing but user-cardinality partials cross the exchange."""
    from ..util import user_range_groupby

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["cents"] = (df["value"] * 100).round().astype("int64")
        g = df.groupby("user_id", sort=False).agg(
            part_last=("ts", "max"), part_n=("cents", "size"),
            part_cents=("cents", "sum")).reset_index()
        g["part_n"] = g["part_n"].astype("int64")
        g["part_cents"] = g["part_cents"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False).agg(
            last_ts=("part_last", "max"), n_events=("part_n", "sum"),
            total_cents=("part_cents", "sum")).reset_index()
        g["n_events"] = g["n_events"].astype("int64")
        g["total_cents"] = g["total_cents"].astype("int64")
        return g

    return user_range_groupby(events_ds.map_batches(
        partial, batch_format="pyarrow"), per_range, n_parts=n_parts)


def rfm_sql() -> str:
    return """
SELECT user_id, MAX(ts) AS last_ts,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM events GROUP BY user_id
"""


def session_histogram(events_ds, gap_min: int = SESSION_GAP_MIN,
                      n_parts: int | None = None):
    """Session-LENGTH distribution — the composition demo of the event
    family: ``sessionize`` (one user-range shuffle) feeds a bounded
    histogram reduce (sessions per n_events bucket).  Bucket cardinality
    is the max session length, so batch-local partial counts + one tiny
    int-keyed range merge finish it; nothing user-sized crosses the
    second exchange."""
    from ..util import user_range_groupby

    sessions = sessionize(events_ds, gap_min=gap_min, n_parts=n_parts)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("n_events", sort=False).size().reset_index(
            name="part_n")
        g["part_n"] = g["part_n"].astype("int64")
        return pa.Table.from_pandas(g[["n_events", "part_n"]],
                                    preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_events", sort=False)["part_n"].sum().reset_index(
            name="n_sessions")
        g["n_sessions"] = g["n_sessions"].astype("int64")
        return g

    return user_range_groupby(
        sessions.map_batches(partial, batch_format="pyarrow"),
        merge, key="n_events", n_parts=n_parts)


def session_histogram_sql(gap_min: int = SESSION_GAP_MIN) -> str:
    return f"""
SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM ({sessionize_sql(gap_min)}) GROUP BY n_events
"""
