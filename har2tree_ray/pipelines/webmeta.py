"""Web-artifact metadata pipelines: HHHash, domhash, TLD split, identifier
extraction, never-sent cookie anti-join.  Reference ops M13/M28/M29/M30/D4
(SURVEY §2) re-expressed over the flat span / interleaved tables.

All are single-pass ``map_batches`` except:
* ``host_tld`` groups once on hostname (distinct — tiny output);
* ``cookies_never_sent`` groups once on doc_id (per-doc anti-join).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions import webhash


# ------------------------------------------------------------------ hhhash


def span_hhhash(flat_ds):
    """(doc_id, offset, hhhash) per span — ordered directive-name hash."""

    def per_batch(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "offset": pa.array(batch["offset"].to_pylist(), pa.int32()),
            "hhhash": pa.array([webhash.hhhash(t) for t in batch["text"].to_pylist()],
                               pa.string()),
        })

    return flat_ds.select_columns(["doc_id", "offset", "text"]).map_batches(
        per_batch, batch_format="pyarrow")


def span_hhhash_sql(flat_path: str) -> str:
    v = webhash.HHHASH_VERSION
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), n AS (
    SELECT doc_id, CAST(s."offset" AS INTEGER) AS "offset",
           regexp_extract_all(s.text, '@([a-z_]+)=', 1) AS names
    FROM ex
)
SELECT doc_id, "offset",
       'hhh:{v}:' || sha256(array_to_string(
           list_filter(names, (x, i) -> i = 1 OR names[i - 1] <> x), ':')) AS hhhash
FROM n
"""


# ----------------------------------------------------------------- domhash


def doc_domhash(interleaved_ds):
    """(doc_id, domhash) — per-document kind-sequence hash, computed straight
    on the interleaved rows (spans sorted by offset in-row; NO shuffle)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        out_ids, out_hash = [], []
        ids = batch["doc_id"].to_pylist()
        spans = batch["spans"].to_pylist()
        for did, sp in zip(ids, spans):
            ordered = sorted(sp, key=lambda s: s["offset"])
            out_ids.append(did)
            out_hash.append(webhash.domhash([s["kind"] for s in ordered]))
        return pa.table({"doc_id": pa.array(out_ids, pa.string()),
                         "domhash": pa.array(out_hash, pa.string())})

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow")


def doc_domhash_sql(flat_path: str) -> str:
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
)
SELECT doc_id,
       substr(sha256(string_agg(s.kind, '|' ORDER BY s."offset")), 1, 32) AS domhash
FROM ex GROUP BY doc_id
"""


# ---------------------------------------------------------------- TLD split


def host_tld(flat_ds):
    """Distinct hostnames → (hostname, tld, reg_domain); IPs yield empties
    (M28: faup returns None for IP hosts)."""

    from ray.data.aggregate import Count

    def local_distinct(t: pa.Table) -> pa.Table:
        g = t.group_by("hostname").aggregate([("hostname", "count")])
        return g.select(["hostname"])

    from ..util import pre_shuffle_coalesce

    # batch-local distinct first: only unique hostnames per block reach the
    # shuffle (a groupby over raw span rows would move every row)
    hosts = (pre_shuffle_coalesce(
                flat_ds.select_columns(["hostname"])
                .map_batches(local_distinct, batch_format="pyarrow"))
             .groupby("hostname").aggregate(Count(alias_name="_n"))
             .map_batches(lambda t: t.select(["hostname"]), batch_format="pyarrow"))

    def split(batch: pa.Table) -> pa.Table:
        hs = batch["hostname"].to_pylist()
        parts = [webhash.split_suffix(h) for h in hs]
        return pa.table({
            "hostname": pa.array(hs, pa.string()),
            "tld": pa.array([p[0] for p in parts], pa.string()),
            "reg_domain": pa.array([p[1] for p in parts], pa.string()),
        })

    return hosts.map_batches(split, batch_format="pyarrow")


def host_tld_sql(flat_path: str) -> str:
    sl = ", ".join(f"'{s}'" for s in sorted(webhash.SECOND_LEVEL_SUFFIXES))
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), hosts AS (
    SELECT DISTINCT CASE WHEN regexp_matches(s.media_ref, '^https?://')
                THEN regexp_extract(s.media_ref, '^https?://([^/?#]+)', 1)
                ELSE '' END AS hostname
    FROM ex
), lab AS (
    SELECT hostname,
           string_split(regexp_replace(hostname, ':[0-9]+$', ''), '.') AS l,
           regexp_replace(hostname, ':[0-9]+$', '') AS noport
    FROM hosts
)
SELECT hostname,
       CASE WHEN hostname = '' OR len(l) < 2
                 OR regexp_matches(noport, '^[0-9]{{1,3}}(\\.[0-9]{{1,3}}){{3}}$')
            THEN ''
            WHEN len(l) >= 3 AND (l[-2] || '.' || l[-1]) IN ({sl})
            THEN l[-2] || '.' || l[-1]
            ELSE l[-1] END AS tld,
       CASE WHEN hostname = '' OR len(l) < 2
                 OR regexp_matches(noport, '^[0-9]{{1,3}}(\\.[0-9]{{1,3}}){{3}}$')
            THEN ''
            WHEN len(l) >= 3 AND (l[-2] || '.' || l[-1]) IN ({sl})
            THEN l[-3] || '.' || l[-2] || '.' || l[-1]
            ELSE l[-2] || '.' || l[-1] END AS reg_domain
FROM lab
"""


# -------------------------------------------------------------- identifiers


def span_identifiers(flat_ds):
    """Expanded identifier rows: (doc_id, offset, id_type, value) for captcha
    sitekeys and non-blocklisted google tag IDs (M30)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        offs = batch["offset"].to_pylist()
        texts = batch["text"].to_pylist()
        o_doc, o_off, o_type, o_val = [], [], [], []
        for d, o, t in zip(ids, offs, texts):
            sitekeys, gtags = webhash.extract_identifiers(t)
            for v in sitekeys:
                o_doc.append(d); o_off.append(o); o_type.append("sitekey"); o_val.append(v)
            for v in gtags:
                o_doc.append(d); o_off.append(o); o_type.append("gtag"); o_val.append(v)
        return pa.table({
            "doc_id": pa.array(o_doc, pa.string()),
            "offset": pa.array(o_off, pa.int32()),
            "id_type": pa.array(o_type, pa.string()),
            "value": pa.array(o_val, pa.string()),
        })

    return flat_ds.select_columns(["doc_id", "offset", "text"]).map_batches(
        per_batch, batch_format="pyarrow")


def span_identifiers_sql(flat_path: str) -> str:
    bl = ", ".join(f"'{b}'" for b in sorted(webhash.GTAG_BLOCKLIST))
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), sk AS (
    SELECT doc_id, CAST(s."offset" AS INTEGER) AS "offset", 'sitekey' AS id_type,
           UNNEST(regexp_extract_all(s.text, 'data-sitekey="([^"]+)"', 1)) AS value
    FROM ex
), gt AS (
    SELECT doc_id, CAST(s."offset" AS INTEGER) AS "offset", 'gtag' AS id_type,
           UNNEST(regexp_extract_all(s.text, '\\b(G(?:TM?)?-[A-Z0-9]{{6,10}})\\b', 1)) AS value
    FROM ex
)
SELECT * FROM sk
UNION ALL
SELECT * FROM gt WHERE value NOT IN ({bl})
"""


# ------------------------------------------------------- cookies never sent


def cookies_never_sent(flat_ds):
    """D4 recast (har2tree/har2tree.py:362-387): cookies SET in a document
    with no later SEND of the same name — per-doc anti-join on offset order."""
    from .cookies import cookie_events

    ev = cookie_events(flat_ds)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        setters = df[df["side"] == "set"]
        sent = df[df["side"] == "sent"]
        rows = []
        for _, s in setters.iterrows():
            later = sent[(sent["name"] == s["name"]) & (sent["offset"] > s["offset"])]
            if later.empty:
                rows.append({"doc_id": s["doc_id"], "offset": int(s["offset"]),
                             "name": s["name"], "domain": s["domain"]})
        out = pd.DataFrame(rows, columns=["doc_id", "offset", "name", "domain"])
        if out.empty:
            out = out.astype({"offset": "int64"})
        return out

    return ev.groupby("doc_id").map_groups(per_doc, batch_format="pandas")


def cookies_never_sent_interleaved(interleaved_ds, batch_size: int = 64):
    """Zero-shuffle D4 recast: interleaved rows hold whole documents, so the
    per-doc anti-join is batch-local — directive extraction loops only over
    the <1% of spans with cookie markers, then ONE vectorized pandas merge
    (max sent offset per (doc, name)) replaces any per-doc dispatch."""
    from ..functions import parse

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        s_doc, s_off, s_name, s_dom = [], [], [], []
        d_doc, d_off, d_name = [], [], []
        for did, spans in zip(ids, spans_col):
            for s in spans:
                t = s["text"]
                if "@setcookie=" in t:
                    for name, _v, dom in parse.RE_SETCOOKIE.findall(t):
                        s_doc.append(did)
                        s_off.append(s["offset"])
                        s_name.append(name)
                        s_dom.append(dom)
                if "@cookie=" in t:
                    for name, _v in parse.RE_COOKIE.findall(t):
                        d_doc.append(did)
                        d_off.append(s["offset"])
                        d_name.append(name)
        setters = pd.DataFrame({"doc_id": s_doc, "offset": s_off,
                                "name": s_name, "domain": s_dom})
        sent = pd.DataFrame({"doc_id": d_doc, "offset": d_off, "name": d_name})
        if setters.empty:
            return pa.table({"doc_id": pa.array([], pa.string()),
                             "offset": pa.array([], pa.int64()),
                             "name": pa.array([], pa.string()),
                             "domain": pa.array([], pa.string())})
        max_sent = (sent.groupby(["doc_id", "name"])["offset"].max()
                    .rename("max_sent"))
        m = setters.merge(max_sent, left_on=["doc_id", "name"],
                          right_index=True, how="left")
        keep = m[m["max_sent"].isna() | (m["max_sent"] <= m["offset"])]
        return pa.table({
            "doc_id": pa.array(keep["doc_id"].tolist(), pa.string()),
            "offset": pa.array(keep["offset"].astype("int64").tolist(), pa.int64()),
            "name": pa.array(keep["name"].tolist(), pa.string()),
            "domain": pa.array(keep["domain"].tolist(), pa.string()),
        })

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                      batch_size=batch_size)


def cookies_never_sent_sql(flat_path: str) -> str:
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), st AS (
    SELECT doc_id, CAST(s."offset" AS INTEGER) AS "offset",
           regexp_extract(s.text, '@setcookie=([^=\\s]+)=(\\S+)@(\\S+)', 1) AS name,
           regexp_extract(s.text, '@setcookie=([^=\\s]+)=(\\S+)@(\\S+)', 3) AS domain
    FROM ex WHERE regexp_matches(s.text, '@setcookie=')
), sd AS (
    SELECT doc_id, CAST(s."offset" AS INTEGER) AS "offset",
           regexp_extract(s.text, '@cookie=([^=\\s]+)=(\\S+)', 1) AS name
    FROM ex WHERE regexp_matches(s.text, '@cookie=')
)
SELECT st.doc_id, st."offset", st.name, st.domain
FROM st
WHERE NOT EXISTS (
    SELECT 1 FROM sd
    WHERE sd.doc_id = st.doc_id AND sd.name = st.name AND sd."offset" > st."offset"
)
"""


# ------------------------------------------------------ embedded data-URIs


def embedded_blobs(flat_ds):
    """Data-URI embedded resources (M19 unpacking, helper.py:85-127,236-250):
    (doc_id, offset, mime, payload_b64, n_bytes) — one row per blob; decode
    validity (base64 repair) is enforced engine-side, n_bytes is the decoded
    length so the SQL oracle can cross-check it via from_base64."""
    from ..functions import parse

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        offs = batch["offset"].to_pylist()
        texts = batch["text"].to_pylist()
        o = {"doc_id": [], "offset": [], "mime": [], "payload_b64": [], "n_bytes": []}
        for d, off, t in zip(ids, offs, texts):
            if ";base64," not in t:
                continue
            for mime, b64 in parse.RE_DATAURI.findall(t):
                raw = parse.repair_b64(b64)
                if not raw:
                    continue
                o["doc_id"].append(d)
                o["offset"].append(off)
                o["mime"].append(mime)
                o["payload_b64"].append(b64)
                o["n_bytes"].append(len(raw))
        return pa.table({
            "doc_id": pa.array(o["doc_id"], pa.string()),
            "offset": pa.array(o["offset"], pa.int32()),
            "mime": pa.array(o["mime"], pa.string()),
            "payload_b64": pa.array(o["payload_b64"], pa.string()),
            "n_bytes": pa.array(o["n_bytes"], pa.int64()),
        })

    return flat_ds.map_batches(per_batch, batch_format="pyarrow")


def embedded_blobs_sql(flat_path: str) -> str:
    rx = "data:([\\w/+.-]+);base64,([A-Za-z0-9+/=]+)"
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), m AS (
    SELECT doc_id, CAST(s."offset" AS INTEGER) AS "offset",
           UNNEST(regexp_extract_all(s.text, '{rx}', 1)) AS mime,
           UNNEST(regexp_extract_all(s.text, '{rx}', 2)) AS payload_b64
    FROM ex
)
SELECT doc_id, "offset", mime, payload_b64,
       CAST(octet_length(from_base64(payload_b64)) AS BIGINT) AS n_bytes
FROM m
"""


# --------------------------------------------------- rendered-page URL list


_URL_CHANNELS = (
    ('src="([^"]+)"', "src"),
    ('href="([^"]+)"', "href"),
    (r"url\(([^)]+)\)", "cssurl"),
    (r"location\.href='([^']+)'", "jsloc"),
)


def urls_in_doc(interleaved_ds, batch_size: int = 64):
    """Sorted distinct http(s) URLs referenced anywhere in a document's
    markup channels — the recast of ``urls_in_rendered_page`` (M31,
    nodes.py:661-701) with the M20 cleanup (non-http and data: refs
    dropped).  Zero-shuffle: per-doc on the interleaved rows."""
    from ..functions import parse

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        out_doc, out_url = [], []
        for did, spans in zip(ids, spans_col):
            found: set[str] = set()
            for s in spans:
                t = s["text"]
                f = parse.parse_span_features(t)
                for u in (f["ext_src"] + f["ext_href"] + f["ext_cssurl"]
                          + f["jsloc_urls"]):
                    u = u.strip(" '\"")  # same char-set trim as the oracle
                    if u.startswith(("http://", "https://")):
                        found.add(u)
            for u in sorted(found):
                out_doc.append(did)
                out_url.append(u)
        return pa.table({"doc_id": pa.array(out_doc, pa.string()),
                         "url": pa.array(out_url, pa.string())})

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                      batch_size=batch_size)


def urls_in_doc_sql(flat_path: str) -> str:
    unions = "\nUNION ALL\n".join(
        f"""SELECT doc_id, UNNEST(regexp_extract_all(s.text, '{rx}', 1)) AS u
    FROM ex""" for rx, _name in (
            ('src="([^"]+)"', "src"),
            ('href="([^"]+)"', "href"),
            ('url\\(([^)]+)\\)', "cssurl"),
            ("location\\.href=''([^'']+)''", "jsloc"),
        ))
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), raw AS (
{unions}
)
SELECT DISTINCT doc_id, trim(u, ' ''\"') AS url
FROM raw
WHERE regexp_matches(trim(u, ' ''\"'), '^https?://')
"""
