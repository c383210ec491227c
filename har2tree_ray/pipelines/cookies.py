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


def _asof_rows(doc_id: str, events: list[tuple]) -> list[tuple]:
    """events: (offset, side, name, domain, hostname) — returns matched
    (doc_id, offset, name, setter_offset) rows.  Pure per-doc as-of."""
    setters = sorted((e for e in events if e[1] == "set"), key=lambda e: e[0])
    senders = sorted((e for e in events if e[1] == "sent"), key=lambda e: e[0])
    rows = []
    for off, _, name, _, hostname in senders:
        shost = hostname.split(":")[0]
        best = None
        for s_off, _, s_name, s_dom, _ in setters:
            if s_off >= off:
                break
            if s_name == name and shost.endswith(s_dom):
                best = s_off
        if best is not None:
            rows.append((doc_id, off, name, best))
    return rows


def cookie_asof_interleaved(interleaved_ds, batch_size: int = 64):
    """Shuffle-free cookie as-of join: the join key is doc-local and
    interleaved rows hold whole documents (substring guards skip the >99%
    of spans with no cookie directives)."""
    from ..functions.urls import split_url

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        out = {"doc_id": [], "offset": [], "name": [], "setter_offset": []}
        for did, spans in zip(ids, spans_col):
            events = []
            for s in spans:
                t = s["text"]
                has_set = "@setcookie=" in t
                has_sent = "@cookie=" in t
                if not (has_set or has_sent):
                    continue
                _, host, _ = split_url(s["media_ref"])
                if has_set:
                    for name, _v, dom in parse.RE_SETCOOKIE.findall(t):
                        events.append((s["offset"], "set", name, dom, host))
                if has_sent:
                    for name, _v in parse.RE_COOKIE.findall(t):
                        events.append((s["offset"], "sent", name, "", host))
            for did2, off, name, setter in _asof_rows(did, events):
                out["doc_id"].append(did2)
                out["offset"].append(off)
                out["name"].append(name)
                out["setter_offset"].append(setter)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "offset": pa.array(out["offset"], pa.int64()),
            "name": pa.array(out["name"], pa.string()),
            "setter_offset": pa.array(out["setter_offset"], pa.int64()),
        })

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                      batch_size=batch_size)


