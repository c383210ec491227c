"""Cookie tables and the sent→setter as-of join.

Recast of the reference's cookie machinery: cookie-received normalization
with the third-party test (M14 — /root/reference/har2tree/nodes.py:508-528),
cookie-sent normalization (M15 — nodes.py:530-539), and the J7 as-of join —
"a sent cookie's setter must have started before the sender"
(har2tree/har2tree.py:372-385): for each sent cookie, the most recent prior
span that set a cookie of the same name whose domain suffix-matches the
sender's hostname.

Engine shape: directive extraction is vectorized in ``map_batches``; the
as-of join runs per-document inside ``map_groups`` over offset-sorted rows
(the ordering assumption of SURVEY §2.9).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions import parse


def _cookie_rows(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    # cheap vectorized pre-filter: cookie directives are rare (<1% of spans);
    # the regex loop below only ever sees matching rows
    mask = pc.or_(
        pc.match_substring(batch["text"], "@setcookie="),
        pc.match_substring(batch["text"], "@cookie="),
    )
    batch = batch.filter(mask)
    texts = batch["text"].to_pylist()
    docs = batch["doc_id"].to_pylist()
    offs = batch["offset"].to_pylist()
    hosts = batch["hostname"].to_pylist()
    out = {"doc_id": [], "offset": [], "side": [], "name": [], "value": [],
           "domain": [], "hostname": [], "third_party": []}
    for i, t in enumerate(texts):
        host = hosts[i].split(":")[0]
        for name, value, domain in parse.RE_SETCOOKIE.findall(t):
            out["doc_id"].append(docs[i])
            out["offset"].append(offs[i])
            out["side"].append("set")
            out["name"].append(name)
            out["value"].append(value)
            out["domain"].append(domain)
            out["hostname"].append(hosts[i])
            # third-party test of M14 (nodes.py:517-524): the setting span's
            # own hostname does not end with the cookie domain
            out["third_party"].append(not host.endswith(domain))
        for name, value in parse.RE_COOKIE.findall(t):
            out["doc_id"].append(docs[i])
            out["offset"].append(offs[i])
            out["side"].append("sent")
            out["name"].append(name)
            out["value"].append(value)
            out["domain"].append("")
            out["hostname"].append(hosts[i])
            out["third_party"].append(False)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "offset": pa.array(out["offset"], pa.int32()),
            "side": pa.array(out["side"], pa.string()),
            "name": pa.array(out["name"], pa.string()),
            "value": pa.array(out["value"], pa.string()),
            "domain": pa.array(out["domain"], pa.string()),
            "hostname": pa.array(out["hostname"], pa.string()),
            "third_party": pa.array(out["third_party"], pa.bool_()),
        }
    )


def cookie_events(flat_ds):
    """Exploded cookie event table (one row per cookie directive)."""
    slim = flat_ds.select_columns(["doc_id", "offset", "text", "hostname"])
    return slim.map_batches(_cookie_rows, batch_format="pyarrow")


def cookie_asof(flat_ds):
    """As-of join: (doc_id, offset, name, setter_offset, third_party).

    setter = max setter_offset < sender offset with matching name and
    domain-suffix match on the sender hostname (port stripped).
    """
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
            rows.append(
                {
                    "doc_id": s["doc_id"],
                    "offset": int(s["offset"]),
                    "name": s["name"],
                    "setter_offset": int(best["offset"]),
                }
            )
        out = pd.DataFrame(rows, columns=["doc_id", "offset", "name", "setter_offset"])
        if out.empty:  # keep dtypes stable for empty groups
            out = out.astype({"offset": "int64", "setter_offset": "int64"})
        return out

    return events.groupby("doc_id").map_groups(per_doc, batch_format="pandas")
