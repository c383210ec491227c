"""Web-artifact metadata pipelines: HHHash, domhash, TLD split, identifier
extraction, never-sent cookie anti-join.  Reference ops M13/M28/M29/M30/D4
(SURVEY §2) re-expressed over the flat span / interleaved tables.

All are single-pass ``map_batches`` except ``host_tld``, which groups once
on hostname (distinct — tiny output); ``cookies_never_sent_interleaved``
does its per-doc anti-join batch-locally on the interleaved rows.
"""

from __future__ import annotations

import json

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
    """Oracle for the full PSL algorithm, generated from the SAME vendored
    suffix tables the engine loads (webhash.psl_sql_tables): exceptions
    first (suffix = rule minus leftmost label), else the longest matching
    exact / wildcard rule, else the implicit '*' default."""
    exact, wild, exc = webhash.psl_sql_tables()

    def inlist(vals: list[str]) -> str:
        return ", ".join(f"'{v}'" for v in vals)

    exc_branches = "\n           ".join(
        f"WHEN noport = '{r}' OR ends_with(noport, '.{r}') THEN {k - 1}"
        for r, k in exc)
    length_terms = ["1"]
    for k in sorted(exact):
        length_terms.append(
            f"CASE WHEN len(l) >= {k} AND array_to_string(l[-{k}:], '.')"
            f" IN ({inlist(exact[k])}) THEN {k} ELSE 1 END")
    for k in sorted(wild):
        length_terms.append(
            f"CASE WHEN len(l) >= {k + 1} AND array_to_string(l[-{k}:], '.')"
            f" IN ({inlist(wild[k])}) THEN {k + 1} ELSE 1 END")
    greatest = ",\n               ".join(length_terms)
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
), sized AS (
    SELECT hostname, l,
           hostname = '' OR len(l) < 2
               OR regexp_matches(noport, '^[0-9]{{1,3}}(\\.[0-9]{{1,3}}){{3}}$')
               AS nodomain,
           CASE {exc_branches}
           ELSE greatest({greatest}) END AS k
    FROM lab
)
SELECT hostname,
       CASE WHEN nodomain THEN ''
            ELSE array_to_string(l[-k:], '.') END AS tld,
       CASE WHEN nodomain OR len(l) <= k THEN ''
            ELSE array_to_string(l[-(k + 1):], '.') END AS reg_domain
FROM sized
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
    SELECT doc_id, "offset",
           regexp_extract(m, '@setcookie=([^=\\s]+)=(\\S+)@(\\S+)', 1) AS name,
           regexp_extract(m, '@setcookie=([^=\\s]+)=(\\S+)@(\\S+)', 3) AS domain
    FROM (SELECT doc_id, CAST(s."offset" AS INTEGER) AS "offset",
                 UNNEST(regexp_extract_all(s.text, '@setcookie=[^=\\s]+=\\S+@\\S+')) AS m
          FROM ex WHERE contains(s.text, '@setcookie='))
), sd AS (
    SELECT doc_id, "offset",
           regexp_extract(m, '@cookie=([^=\\s]+)=(\\S+)', 1) AS name
    FROM (SELECT doc_id, CAST(s."offset" AS INTEGER) AS "offset",
                 UNNEST(regexp_extract_all(s.text, '@cookie=[^=\\s]+=\\S+')) AS m
          FROM ex WHERE contains(s.text, '@cookie='))
)
SELECT st.doc_id, st."offset", st.name, st.domain
FROM st
WHERE NOT EXISTS (
    SELECT 1 FROM sd
    WHERE sd.doc_id = st.doc_id AND sd.name = st.name AND sd."offset" > st."offset"
)
"""


# ------------------------------------------------ cookies locally created


def cookies_locally_created(interleaved_ds, batch_size: int = 64):
    """D4 reference set algebra over the ``cookies_json`` sidecar column
    (the browser's final cookie jar, ``<stem>.cookies.json`` —
    har2tree.py:142-148):

    * ``locally_created`` = jar − received − initial, where *received* is
      every ``@setcookie`` identifier and *initial* is the ROOT span's
      ``@cookie`` identifiers (``_nodes_list[0].cookies_sent`` —
      har2tree.py:344-346,362-369);
    * ``never_sent`` flags the subset never seen in any ``@cookie``
      directive (``locally_created_not_sent`` — har2tree.py:371-377).

    Identifier = ``name=value``; jar entries dedup dict-style (last wins,
    har2tree.py:366-368).  Zero-shuffle: interleaved rows hold whole
    documents, so the set algebra is batch-local."""
    from ..functions import parse

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        jars = batch["cookies_json"].to_pylist()
        o_doc, o_name, o_val, o_dom, o_ns = [], [], [], [], []
        for did, spans, jar_raw in zip(ids, spans_col, jars):
            if not jar_raw:
                continue
            try:
                jar = json.loads(jar_raw)
            except (ValueError, TypeError):
                continue
            if not isinstance(jar, list) or not jar:
                continue
            received: set[str] = set()
            sent: set[str] = set()
            initial: set[str] = set()
            root_off = min((s["offset"] for s in spans), default=0)
            for s in spans:
                t = s["text"]
                if "@setcookie=" in t:
                    for n, v, _d in parse.RE_SETCOOKIE.findall(t):
                        received.add(f"{n}={v}")
                if "@cookie=" in t:
                    for n, v in parse.RE_COOKIE.findall(t):
                        sent.add(f"{n}={v}")
                        if s["offset"] == root_off:
                            initial.add(f"{n}={v}")
            local: dict[str, dict] = {}
            for c in jar:
                if not isinstance(c, dict) or "name" not in c:
                    continue
                ident = f'{c["name"]}={c.get("value", "")}'
                if ident not in received and ident not in initial:
                    local[ident] = c  # last jar entry wins (dict semantics)
            for ident, c in local.items():
                o_doc.append(did)
                o_name.append(str(c["name"]))
                o_val.append(str(c.get("value", "")))
                o_dom.append(str(c.get("domain", "")))
                o_ns.append(ident not in sent)
        return pa.table({
            "doc_id": pa.array(o_doc, pa.string()),
            "name": pa.array(o_name, pa.string()),
            "value": pa.array(o_val, pa.string()),
            "domain": pa.array(o_dom, pa.string()),
            "never_sent": pa.array(o_ns, pa.bool_()),
        })

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                      batch_size=batch_size)


def cookies_locally_created_sql(flat_path: str) -> str:
    return f"""
WITH t AS (
    SELECT doc_id, spans, cookies_json FROM read_parquet('{flat_path}/*.parquet')
), jarl AS (
    SELECT doc_id,
           unnest(from_json(cookies_json,
               '[{{"name":"VARCHAR","value":"VARCHAR","domain":"VARCHAR"}}]')) AS c,
           generate_subscripts(from_json(cookies_json,
               '[{{"name":"VARCHAR","value":"VARCHAR","domain":"VARCHAR"}}]'), 1) AS idx
    FROM t WHERE cookies_json IS NOT NULL
), jar0 AS (
    SELECT doc_id, idx, c.name AS name,
           coalesce(c.value, '') AS value,
           coalesce(c.domain, '') AS domain
    FROM jarl WHERE c.name IS NOT NULL
), jar AS (
    -- dedup on the JOINED ident (name || '=' || value), not the (name,
    -- value) pair: the reference keys its dict on f'{{name}}={{value}}'
    -- (har2tree.py:366-368), so names/values containing '=' collapse
    -- last-wins exactly as the engine computes them
    SELECT doc_id, name, value, domain
    FROM (SELECT *, row_number() OVER (
              PARTITION BY doc_id, name || '=' || value ORDER BY idx DESC) AS rn
          FROM jar0)
    WHERE rn = 1
), ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM t
), sc AS (
    SELECT doc_id, CAST(s."offset" AS INTEGER) AS off,
           UNNEST(regexp_extract_all(s.text, '@cookie=[^=\\s]+=\\S+')) AS m
    FROM ex WHERE contains(s.text, '@cookie=')
), sent AS (
    SELECT DISTINCT doc_id, substr(m, 9) AS ident FROM sc
), rootoff AS (
    SELECT doc_id, min(CAST(s."offset" AS INTEGER)) AS o FROM ex GROUP BY doc_id
), initial AS (
    SELECT DISTINCT sc.doc_id, substr(sc.m, 9) AS ident
    FROM sc JOIN rootoff r ON sc.doc_id = r.doc_id AND sc.off = r.o
), recv AS (
    SELECT DISTINCT doc_id,
           regexp_extract(m, '@setcookie=([^=\\s]+)=(\\S+)@(\\S+)', 1) || '=' ||
           regexp_extract(m, '@setcookie=([^=\\s]+)=(\\S+)@(\\S+)', 2) AS ident
    FROM (SELECT doc_id,
                 UNNEST(regexp_extract_all(s.text, '@setcookie=[^=\\s]+=\\S+@\\S+')) AS m
          FROM ex WHERE contains(s.text, '@setcookie='))
)
SELECT j.doc_id, j.name, j.value, j.domain,
       NOT EXISTS (SELECT 1 FROM sent s
                   WHERE s.doc_id = j.doc_id
                     AND s.ident = j.name || '=' || j.value) AS never_sent
FROM jar j
WHERE NOT EXISTS (SELECT 1 FROM recv r
                  WHERE r.doc_id = j.doc_id
                    AND r.ident = j.name || '=' || j.value)
  AND NOT EXISTS (SELECT 1 FROM initial i
                  WHERE i.doc_id = j.doc_id
                    AND i.ident = j.name || '=' || j.value)
"""


# ------------------------------------------------------------- posted data


def posted_data(flat_ds):
    """M12 POST-body decode over the span table — the recast of the
    reference's biggest per-record parser (nodes.py:260-498): mime-routed
    dispatch (form-urlencoded → dict, JSON family → object, text → string,
    undecodable bytes → ``{"_raw_b64": ...}``), emitted as one canonical JSON
    string per POST (``sort_keys`` + compact separators) so the SQL oracle
    can reproduce it byte-for-byte.

    Form-urlencoded parity contract: the engine decodes with ``parse_qsl``
    (the reference's semantics); the oracle mirrors '&'-split, first-'='
    split, '+'→space and JSON quote/backslash escaping, but DuckDB 1.0 has
    no url_decode, so payloads carrying %XX escapes, duplicate keys
    (parse_qsl last-wins) or control chars are outside the oracle's domain
    — the pytest fixtures and synth stay within it on purpose."""
    import json

    from ..functions import parse

    def per_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.match_substring(batch["text"], "@post="))
        o = {"doc_id": [], "offset": [], "mime": [], "decoded": []}
        for d, off, t in zip(batch["doc_id"].to_pylist(),
                             batch["offset"].to_pylist(),
                             batch["text"].to_pylist()):
            for mime, b64 in parse.RE_POST.findall(t):
                raw = parse.repair_b64(b64)
                val = parse.decode_posted_data(mime, raw)
                o["doc_id"].append(d)
                o["offset"].append(off)
                o["mime"].append(mime)
                o["decoded"].append(
                    json.dumps(val, sort_keys=True, separators=(",", ":")))
        return pa.table({
            "doc_id": pa.array(o["doc_id"], pa.string()),
            "offset": pa.array(o["offset"], pa.int32()),
            "mime": pa.array(o["mime"], pa.string()),
            "decoded": pa.array(o["decoded"], pa.string()),
        })

    return flat_ds.select_columns(["doc_id", "offset", "text"]).map_batches(
        per_batch, batch_format="pyarrow")


def posted_data_sql(flat_path: str) -> str:
    """Oracle for ``posted_data``.  The form-urlencoded branch reproduces
    parse_qsl for the SQL-expressible subset: '&'-split (empty segments
    dropped), key = before the FIRST '=', value = the full remainder,
    '+'→space on both, JSON backslash/quote escaping, pairs sorted — see
    the engine docstring for the out-of-domain cases (%XX, dup keys)."""
    rx = "@post=([^:\\s]+):(\\S+)"
    # decode() is blob→utf8 text; CAST(blob AS VARCHAR) would escape bytes
    body = "decode(from_base64(b64))"
    # JSON string escaping: backslash first, then quote
    jesc = "replace(replace({0}, '\\', '\\\\'), '\"', '\\\"')"
    esc = jesc.format("replace({0}, '+', ' ')")
    key = esc.format("split_part(x, '=', 1)")
    val = esc.format("CASE WHEN contains(x, '=') THEN "
                     "substr(x, length(split_part(x, '=', 1)) + 2) "
                     "ELSE '' END")
    crlf = "chr(13) || chr(10)"
    # multipart: segment between boundary markers → strip leading CRLF,
    # header block before the first blank line, content after it (minus the
    # CRLF owned by the next boundary) — mirrors parse.decode_multipart
    seg = f"CASE WHEN starts_with(x, {crlf}) THEN substr(x, 3) ELSE x END"
    hb = f"string_split({seg}, {crlf} || {crlf})"
    hdr_json = (
        "array_to_string(list_sort(list_transform(list_filter("
        f"string_split(({hb})[1], {crlf}), h -> contains(h, ':')), "
        "h -> '\"' || " + jesc.format("trim(split_part(h, ':', 1))")
        + " || '\":\"' || "
        + jesc.format("trim(substr(h, strpos(h, ':') + 1))")
        + " || '\"')), ',')")
    content = jesc.format(
        f"regexp_replace(array_to_string(({hb})[2:], {crlf} || {crlf}),"
        " '\\r\\n$', '')")
    # NOTE: interpolated into the f-string below as a VALUE — single braces
    part_json = ("'{\"content\":\"' || " + content
                 + " || '\",\"headers\":{' || " + hdr_json + " || '}}'")
    boundary = "regexp_extract(mime, 'boundary=\"?([^\";,]+)\"?', 1)"
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), p AS (
    SELECT doc_id, CAST(s."offset" AS INTEGER) AS "offset",
           regexp_extract(s.text, '{rx}', 1) AS mime,
           regexp_extract(s.text, '{rx}', 2) AS b64
    FROM ex WHERE regexp_matches(s.text, '@post=')
)
SELECT doc_id, "offset", mime,
       CASE
         WHEN mime LIKE '%form-urlencoded%' THEN
           '{{' || array_to_string(list_sort(list_transform(
               list_filter(string_split({body}, '&'), x -> x <> ''),
               x -> '"' || {key} || '":"' || {val} || '"')), ',') || '}}'
         WHEN mime LIKE 'application/x-json-stream%' THEN
           '[' || array_to_string(list_filter(
               string_split({body}, chr(10)), x -> trim(x) <> ''), ',') || ']'
         WHEN mime LIKE 'multipart%' THEN
           '[' || array_to_string(list_transform(
               list_filter((string_split({body}, '--' || {boundary}))[2:],
                           x -> NOT starts_with(x, '--')),
               x -> {part_json}), ',') || ']'
         WHEN mime LIKE 'application/x-amzn-ion%'
              AND starts_with(b64, 'ZXZ0Ojp7') THEN
           -- 'ZXZ0Ojp7' = base64('evt::{{'): the WHEN must not decode the
           -- blob (CASE conditions evaluate over ALL rows incl. the
           -- invalid-UTF8 raw fixtures; THEN branches are selective)
           '{{"$ion_annotations":["evt"],"value":{{"kind":{{"$ion_symbol":"'
           || regexp_extract({body}, 'kind:([A-Za-z_0-9]+)', 1)
           || '"}},"n":' || regexp_extract({body}, '[,{{]n:(\\d+)', 1)
           || ',"ts":{{"$ion_timestamp":"'
           || regexp_extract({body}, 'ts:([0-9TZ:.+-]+)', 1) || '"}}}}}}'
         WHEN mime LIKE 'application/atom+xml%'
              OR mime LIKE 'application/x-amzn-ion%' THEN {body}
         WHEN mime LIKE '%json%' THEN {body}
         WHEN mime LIKE 'text/%' THEN '"' || {body} || '"'
         ELSE '{{"_raw_b64":"' || b64 || '"}}'
       END AS decoded
FROM p
"""


# --------------------------------------------------------- security details


def span_security(flat_ds):
    """M26 security-details normalize (nodes.py securityDetails analog):
    (doc_id, offset, tls_proto, tls_issuer) for spans carrying @tls."""
    from ..functions import parse

    def per_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.match_substring(batch["text"], "@tls="))
        o = {"doc_id": [], "offset": [], "tls_proto": [], "tls_issuer": []}
        for d, off, t in zip(batch["doc_id"].to_pylist(),
                             batch["offset"].to_pylist(),
                             batch["text"].to_pylist()):
            for proto, issuer in parse.RE_TLS.findall(t):
                o["doc_id"].append(d)
                o["offset"].append(off)
                o["tls_proto"].append(proto)
                o["tls_issuer"].append(issuer)
        return pa.table({
            "doc_id": pa.array(o["doc_id"], pa.string()),
            "offset": pa.array(o["offset"], pa.int32()),
            "tls_proto": pa.array(o["tls_proto"], pa.string()),
            "tls_issuer": pa.array(o["tls_issuer"], pa.string()),
        })

    return flat_ds.select_columns(["doc_id", "offset", "text"]).map_batches(
        per_batch, batch_format="pyarrow")


def span_security_sql(flat_path: str) -> str:
    rx = "@tls=([^@\\s]+)@(\\S+)"
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
)
SELECT doc_id, CAST(s."offset" AS INTEGER) AS "offset",
       regexp_extract(s.text, '{rx}', 1) AS tls_proto,
       regexp_extract(s.text, '{rx}', 2) AS tls_issuer
FROM ex WHERE regexp_matches(s.text, '@tls=')
"""


# -------------------------------------------------------------- user agent


def doc_user_agent(interleaved_ds, batch_size: int = 256):
    """M11: the capture user agent — extracted from the min-offset (root)
    span, like the reference reads the first entry's request headers
    (har2tree.py:255-260).  Zero-shuffle per-doc on interleaved rows."""
    from ..functions import parse

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        out_ids, out_ua = [], []
        for did, spans in zip(ids, spans_col):
            if not spans:
                continue
            root = min(spans, key=lambda s: s["offset"])
            out_ids.append(did)
            out_ua.append(parse.first(parse.RE_UA, root["text"]))
        return pa.table({
            "doc_id": pa.array(out_ids, pa.string()),
            "user_agent": pa.array(out_ua, pa.string()),
        })

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                      batch_size=batch_size)


def doc_user_agent_sql(flat_path: str) -> str:
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
)
SELECT doc_id,
       ARG_MIN(regexp_extract(s.text, '@ua=(\\S+)', 1), s."offset") AS user_agent
FROM ex GROUP BY doc_id
"""


# ----------------------------------------------------------- sidecar columns


# public file signatures for the M18 mimetype sniff (MagicDb recast —
# /root/reference/har2tree/helper.py:477-485; no libmagic in this container,
# so the signature table is a built-in constant shared with the SQL oracle)
#: (offset, signature, mime) — public well-known magic numbers; ordered
#: longest/most-specific first so weak 2-byte matches (BM, MZ, 1F8B) never
#: shadow a longer one.  The SQL oracle is GENERATED from this table
#: (single source of truth, like the PSL tables).
MAGIC_SIGNATURES = [
    (0, b"\x89PNG\r\n\x1a\n", "image/png"),
    (0, b"7z\xbc\xaf\x27\x1c", "application/x-7z-compressed"),
    (0, b"Rar!\x1a\x07", "application/vnd.rar"),
    (0, b"\xfd7zXZ\x00", "application/x-xz"),
    (0, b"GIF89a", "image/gif"),
    (0, b"GIF87a", "image/gif"),
    (0, b"%PDF-", "application/pdf"),
    (0, b"SQLite format 3\x00", "application/vnd.sqlite3"),
    (0, b"\x00\x00\x00\x0cJXL ", "image/jxl"),   # JXL container
    (0, b"\x30\x26\xb2\x75\x8e\x66\xcf\x11", "video/x-ms-asf"),
    (257, b"ustar", "application/x-tar"),
    (32769, b"CD001", "application/x-iso9660-image"),
    (128, b"DICM", "application/dicom"),
    (0, b"!<arch>\n", "application/x-archive"),  # ar / deb / .lib
    (0, b"ARROW1", "application/vnd.apache.arrow.file"),
    (0, b"gimp xcf", "image/x-xcf"),
    (0, b"#!AMR", "audio/amr"),
    # ISO BMFF brand-specific sniffs MUST precede the generic ftyp entry
    (4, b"ftypavif", "image/avif"),
    (4, b"ftypheic", "image/heic"),
    (4, b"ftypheix", "image/heic"),
    (4, b"ftypmif1", "image/heif"),
    (4, b"ftypM4A ", "audio/mp4"),
    (4, b"ftypqt  ", "video/quicktime"),
    (4, b"ftyp", "video/mp4"),          # ISO BMFF (mp4/mov/heic family)
    (8, b"WEBP", "image/webp"),         # RIFF....WEBP
    (8, b"WAVE", "audio/wav"),          # RIFF....WAVE
    (0, b"PK\x03\x04", "application/zip"),
    (0, b"wOF2", "font/woff2"),
    (0, b"wOFF", "font/woff"),
    (0, b"OTTO", "font/otf"),
    (0, b"\x00\x01\x00\x00", "font/ttf"),
    (0, b"\x00\x00\x01\x00", "image/vnd.microsoft.icon"),
    (0, b"OggS", "audio/ogg"),
    (0, b"fLaC", "audio/flac"),
    (0, b"ID3", "audio/mpeg"),
    (0, b"\x1aE\xdf\xa3", "video/webm"),  # EBML (webm/matroska)
    (0, b"FLV\x01", "video/x-flv"),
    (0, b"\xff\xd8\xff", "image/jpeg"),
    (0, b"II*\x00", "image/tiff"),
    (0, b"MM\x00*", "image/tiff"),
    (0, b"\x28\xb5\x2f\xfd", "application/zstd"),
    (0, b"\x00asm", "application/wasm"),
    (0, b"\x7fELF", "application/x-executable"),
    (0, b"\xd4\xc3\xb2\xa1", "application/vnd.tcpdump.pcap"),
    (0, b"\xa1\xb2\xc3\xd4", "application/vnd.tcpdump.pcap"),
    (0, b"\x0a\x0d\x0d\x0a", "application/x-pcapng"),
    (0, b"\xca\xfe\xba\xbe", "application/java-vm"),  # .class (and Mach-O fat)
    (0, b"\xfe\xed\xfa\xce", "application/x-mach-binary"),
    (0, b"\xfe\xed\xfa\xcf", "application/x-mach-binary"),
    (0, b"\xcf\xfa\xed\xfe", "application/x-mach-binary"),
    (0, b"\xce\xfa\xed\xfe", "application/x-mach-binary"),
    (0, b"MThd", "audio/midi"),
    (8, b"AIFF", "audio/aiff"),
    (8, b"AVI ", "video/x-msvideo"),
    (0, b".snd", "audio/basic"),
    (0, b"8BPS", "image/vnd.adobe.photoshop"),
    (0, b"\xed\xab\xee\xdb", "application/x-rpm"),
    (0, b"LZIP", "application/x-lzip"),
    (0, b"\x04\x22\x4d\x18", "application/x-lz4"),
    (0, b"MSCF", "application/vnd.ms-cab-compressed"),
    (0, b"ITSF", "application/vnd.ms-htmlhelp"),
    (0, b"Cr24", "application/x-chrome-extension"),
    (0, b"dex\n", "application/x-dex"),
    (0, b"qoif", "image/qoi"),
    (0, b"\x76\x2f\x31\x01", "image/x-exr"),
    (0, b"\x00\x00\x01\xba", "video/mpeg"),
    (0, b"\x00\x00\x01\xb3", "video/mpeg"),
    (0, b"PAR1", "application/vnd.apache.parquet"),
    (0, b"Obj\x01", "application/avro"),
    (0, b"%!PS", "application/postscript"),
    (0, b"BPG\xfb", "image/bpg"),
    (0, b"FWS", "application/x-shockwave-flash"),
    (0, b"CWS", "application/x-shockwave-flash"),
    (0, b"ZWS", "application/x-shockwave-flash"),
    (0, b"BZh", "application/x-bzip2"),
    (0, b"\x1f\x8b", "application/gzip"),
    (0, b"\xff\x0a", "image/jxl"),      # bare JXL codestream (weak, 2-byte)
    (0, b"BM", "image/bmp"),
    (0, b"MZ", "application/x-msdownload"),
]


def sniff_mime(raw: bytes) -> str:
    for off, sig, mime in MAGIC_SIGNATURES:
        if len(raw) >= off + len(sig) and raw[off:off + len(sig)] == sig:
            return mime
    return ""


def doc_sidecars(sidecar_ds):
    """S2 sidecar table: downloaded filename/size + M18 magic-sniffed mime +
    rendered-HTML length, per document.  Input must be the interleaved table
    pruned to the sidecar columns (``spans`` never leaves storage)."""
    import base64

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        fns = batch["downloaded_filename"].to_pylist()
        b64s = batch["downloaded_b64"].to_pylist()
        htmls = batch["rendered_html"].to_pylist()
        n_bytes, mimes, rlens = [], [], []
        for b, h in zip(b64s, htmls):
            raw = base64.b64decode(b) if b else b""
            n_bytes.append(len(raw))
            mimes.append(sniff_mime(raw) if raw else "")
            rlens.append(len(h) if h else 0)
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "downloaded_filename": pa.array(
                [f or "" for f in fns], pa.string()),
            "n_download_bytes": pa.array(n_bytes, pa.int64()),
            "sniffed_mime": pa.array(mimes, pa.string()),
            "rendered_len": pa.array(rlens, pa.int64()),
        })

    return sidecar_ds.map_batches(per_batch, batch_format="pyarrow")


def doc_sidecars_sql(flat_path: str) -> str:
    """Oracle generated from MAGIC_SIGNATURES (same table, same order):
    each (offset, sig) becomes a hex-substring CASE branch."""
    hx = "hex(from_base64(downloaded_b64))"
    branches = "\n            ".join(
        f"WHEN substr({hx}, {off * 2 + 1}, {len(sig) * 2}) = '{sig.hex().upper()}'"
        f" THEN '{mime}'"
        for off, sig, mime in MAGIC_SIGNATURES)
    return f"""
SELECT doc_id,
       COALESCE(downloaded_filename, '') AS downloaded_filename,
       CAST(COALESCE(octet_length(from_base64(downloaded_b64)), 0) AS BIGINT)
           AS n_download_bytes,
       CASE WHEN downloaded_b64 IS NULL THEN ''
            {branches}
            ELSE '' END AS sniffed_mime,
       CAST(COALESCE(length(rendered_html), 0) AS BIGINT) AS rendered_len
FROM read_parquet('{flat_path}/*.parquet')
"""


# ----------------------------------------------------------- host link graph


def _referral_pairs(batch: pa.Table):
    """Cross-host (referer_host, span_host) pairs of a flat-span batch —
    shared extraction of the host-graph family (link_graph, rank,
    components, triangles, clustering, reciprocity, assortativity).

    Fully Arrow-vectorized (two extract_regex kernels — the per-row
    Python parse.first/split_url loop this replaces was the dominant cost
    of every host-graph query at sf0.1: host_link_graph alone 3.6 s, the
    loop shared by 7 queries).  The regexes are EXACTLY the oracle SQL's
    (``@referer=(\\S+)`` then ``^https?://([^/?#]+)``), so parity is by
    construction."""
    import numpy as np
    import pyarrow.compute as pc

    m = pc.extract_regex(batch["text"], r"@referer=(?P<r>\S+)")
    ref = pc.fill_null(pc.struct_field(m, "r"), "")
    hm = pc.extract_regex(ref, r"^https?://(?P<h>[^/?#]+)")
    src = pc.fill_null(pc.struct_field(hm, "h"), "").to_numpy(
        zero_copy_only=False)
    dst_col = batch["hostname"]
    dst = (dst_col.to_numpy(zero_copy_only=False)
           if len(dst_col) else np.array([], dtype=object))
    keep = (src != "") & (dst != "") & (src != dst)
    return src[keep], dst[keep]


def host_link_graph(flat_ds):
    """Cross-host referral graph: (src_host, dst_host, n_links) counting
    spans whose ``@referer`` host differs from their own host — the
    host-level web graph the per-doc trees imply (HostNode edges aggregated
    across the corpus, har2tree.py:680-708 generalized).  Batch-local pair
    counts pre-aggregate before one bounded (host×host) shuffle."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..util import pre_shuffle_coalesce

    def partial(batch: pa.Table) -> pa.Table:
        src, dst = _referral_pairs(batch)
        t2 = pa.table({"src_host": pa.array(src, pa.string()),
                       "dst_host": pa.array(dst, pa.string())})
        g = t2.group_by(["src_host", "dst_host"]).aggregate([("src_host", "count")])
        return g.rename_columns(["src_host", "dst_host", "part_n"])

    agg = pre_shuffle_coalesce(
        flat_ds.select_columns(["text", "hostname"]).map_batches(
            partial, batch_format="pyarrow")
    ).groupby(["src_host", "dst_host"]).aggregate(Sum("part_n", alias_name="n_links"))
    return agg.map_batches(
        lambda t: pa.table({
            "src_host": t["src_host"],
            "dst_host": t["dst_host"],
            "n_links": pc.cast(t["n_links"], pa.int64()),
        }),
        batch_format="pyarrow")


def host_link_graph_sql(flat_path: str) -> str:
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), r AS (
    SELECT CASE WHEN regexp_matches(regexp_extract(s.text, '@referer=(\\S+)', 1), '^https?://')
                THEN regexp_extract(regexp_extract(s.text, '@referer=(\\S+)', 1), '^https?://([^/?#]+)', 1)
                ELSE '' END AS src_host,
           CASE WHEN regexp_matches(s.media_ref, '^https?://')
                THEN regexp_extract(s.media_ref, '^https?://([^/?#]+)', 1)
                ELSE '' END AS dst_host
    FROM ex WHERE regexp_matches(s.text, '@referer=')
)
SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links
FROM r WHERE src_host <> '' AND dst_host <> '' AND src_host <> dst_host
GROUP BY src_host, dst_host
"""



def _graph_node_partials(pair_ds, col_a: str, col_b: str):
    """Batch-local distinct endpoints of a materialized pair table — a
    (host,) dataset bounded by hosts × blocks, materialized because both
    the route decision (count) and the chosen route (gather or exact
    distinct) consume it."""

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"host": pd.unique(
            pd.concat([df[col_a], df[col_b]], ignore_index=True))})

    return pair_ds.map_batches(uniq, batch_format="pandas").materialize()


def _distinct_nodes_ds(node_part):
    """Exact distinct node table — ONE bounded host-key exchange, reused by
    every escalated iteration (seed + zero/own rows)."""
    from ..util import user_range_groupby

    return user_range_groupby(
        node_part, lambda df: df.drop_duplicates(), key="host").materialize()


def host_rank(flat_ds, iters: int = 3, mass: int = 1_000_000,
              base: int = 150_000, broadcast_max: int = 2_000_000):
    """Iterative damped link-mass propagation (PageRank-style) over the
    cross-host referral graph — the canonical *iterative* distributed
    algorithm over ``host_link_graph`` edges.

    INTEGER semantics make it exactly oracle-checkable: every node starts
    with ``mass``; each synchronous iteration a node sends
    ``(m * 85) // (100 * outdeg)`` along each distinct out-edge and the
    next mass is ``base + sum(incoming)``.  All quantities are int64 and
    every reduce is a sum of ints, so the result is independent of
    reduction order — no float-summation parity hazard — and the DuckDB
    oracle is ``iters`` unrolled join+group CTEs.  (Dangling-node mass
    drains by design; the teleport term is the uniform ``base``.)

    Scale shape: the edge list (with outdeg) is the iterative working set —
    outdeg computed via ONE coarse src-key range shuffle (a source's edges
    all co-live in its range, so outdeg is a range-local
    ``transform('size')``) and ``materialize()``d deliberately: re-deriving
    it from spans every iteration would re-run the whole upstream pipeline
    ``iters`` times (at 100 TB the equivalent is a per-iteration parquet
    checkpoint via ``state/checkpoint.py``, not an object-store pin of raw
    spans — the edge list is the host×host graph, orders of magnitude
    smaller than the span stream).  The RANK vector is one row per host —
    the same bounded small side the engine already broadcasts for the ST5
    covering index (``host_boxes``) — so each iteration is a ``ray.put``
    broadcast of the current ranks + one map-only pass over the
    (materialized, never re-shuffled) edge partitions emitting batch-local
    per-destination partial sums, gathered and summed on the driver
    (partials are bounded by hosts × blocks).

    When the node table outgrows the broadcast contract (the batch-local
    unique partial COUNT — an upper bound on distinct hosts, so the router
    errs toward escalating — exceeds ``broadcast_max``), each iteration
    runs the CODED co-partition form ``_rank_copart``: union(edges, ranks)
    → src-range shuffle → contribs → dst-range shuffle — the documented
    ST5 escalation, at 2 exchanges per iteration with no driver gather and
    no broadcast (the ``dedup_clusters`` size-routing precedent,
    dedup.py:339+).
    """
    import numpy as np
    import ray as _ray

    from ..util import user_range_groupby, worker_cached_stage

    edges = host_link_graph(flat_ds).select_columns(["src_host", "dst_host"])

    def with_outdeg(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"src_host": pd.Series(dtype=object),
                                 "dst_host": pd.Series(dtype=object),
                                 "outdeg": pd.Series(dtype=np.int64)})
        return df.assign(
            outdeg=df.groupby("src_host")["dst_host"].transform("size")
            .astype(np.int64))

    edges_aug = user_range_groupby(edges, with_outdeg,
                                   key="src_host").materialize()

    node_part = _graph_node_partials(edges_aug, "src_host", "dst_host")
    if node_part.count() > broadcast_max:
        return _rank_copart(edges_aug, node_part, iters, mass, base)

    # node set: host-cardinality driver gather (ST5 small-side contract)
    nodes = pd.unique(node_part.to_pandas()["host"])

    class ContribPartial:
        """Per-worker: fetch the broadcast rank vector once, then emit
        batch-local per-destination partial contribution sums."""

        def __init__(self, ranks_ref) -> None:
            self.ranks = _ray.get(ranks_ref)  # pd.Series host -> m

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = df["src_host"].map(self.ranks).to_numpy(dtype=np.int64)
            c = (m * 85) // (100 * df["outdeg"].to_numpy())
            g = (pd.DataFrame({"dst": df["dst_host"], "c": c})
                 .groupby("dst", sort=False)["c"].sum().reset_index())
            return g

    ranks = pd.Series(np.full(len(nodes), mass, dtype=np.int64), index=nodes)
    for _ in range(iters):
        ref = _ray.put(ranks)
        partials = edges_aug.map_batches(
            worker_cached_stage(ContribPartial, ref, cache_key=ref.hex()),
            batch_format="pandas").to_pandas()
        sums = partials.groupby("dst", sort=False)["c"].sum()
        ranks = pd.Series(np.full(len(nodes), base, dtype=np.int64),
                          index=nodes)
        ranks.loc[sums.index] += sums.astype(np.int64)

    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(
        {"hostname": ranks.index.to_numpy(dtype=object),
         "rank": ranks.to_numpy(dtype=np.int64)}))


def _rank_copart(edges_aug, node_part, iters: int, mass: int, base: int):
    """Co-partition escalation of ``host_rank`` for node tables too large to
    broadcast: each iteration is union(edges, ranks) → ONE src-key range
    shuffle (every src's edges AND its rank row co-locate, so the per-edge
    contribution is a range-local vectorized map) → ONE dst-key range
    shuffle summing contributions + a zero row per node (so sinks keep
    their base).  No driver gather, no ``ray.put`` — the rank vector lives
    as a Dataset, materialized per iteration (the bounded iterative working
    set; at 100 TB this is the parquet checkpoint).  Sentinel values (-1
    mass / outdeg 0) keep every column int64 through pandas — typed NULLs
    would decay to float64 inside the range resolver and break BIGINT
    exactness past 2^53."""
    import numpy as np

    from ..util import user_range_groupby

    nodes_ds = _distinct_nodes_ds(node_part)

    def seed(t: pa.Table) -> pa.Table:
        return pa.table({"host": t["host"],
                         "m": pa.array(np.full(len(t), mass, np.int64))})

    ranks = nodes_ds.map_batches(seed, batch_format="pyarrow").materialize()

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["src_host"], "dst": t["dst_host"],
                         "outdeg": t["outdeg"],
                         "m": pa.array(np.full(len(t), -1, np.int64))})

    def tag_ranks(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["host"],
                         "dst": pa.array([""] * len(t), pa.string()),
                         "outdeg": pa.array(np.zeros(len(t), np.int64)),
                         "m": t["m"]})

    def contribs(df: pd.DataFrame) -> pd.DataFrame:
        r = df.loc[df["outdeg"] == 0].set_index("key")["m"]
        e = df.loc[df["outdeg"] > 0]
        if e.empty:
            return pd.DataFrame({"dst": pd.Series(dtype=object),
                                 "c": pd.Series(dtype="int64")})
        mvals = e["key"].map(r).to_numpy(dtype=np.int64)
        c = (mvals * 85) // (100 * e["outdeg"].to_numpy(dtype=np.int64))
        return (pd.DataFrame({"dst": e["dst"], "c": c})
                .groupby("dst", sort=False, as_index=False)["c"].sum())

    def zero_rows(t: pa.Table) -> pa.Table:
        return pa.table({"dst": t["host"],
                         "c": pa.array(np.zeros(len(t), np.int64))})

    def total(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("dst", sort=False, as_index=False)["c"].sum()
        return pd.DataFrame({"host": g["dst"],
                             "m": (base + g["c"]).astype("int64")})

    zero = nodes_ds.map_batches(zero_rows, batch_format="pyarrow")
    for _ in range(iters):
        u = edges_aug.map_batches(tag_edges, batch_format="pyarrow").union(
            ranks.map_batches(tag_ranks, batch_format="pyarrow"))
        part = user_range_groupby(u, contribs, key="key")
        ranks = user_range_groupby(part.union(zero), total,
                                   key="dst").materialize()

    return ranks.map_batches(
        lambda t: pa.table({"hostname": t["host"], "rank": t["m"]}),
        batch_format="pyarrow")


def host_components(flat_ds, max_iters: int = 64,
                    broadcast_max: int = 2_000_000):
    """Connected components of the (undirected) cross-host referral graph
    via synchronous min-label propagation — the graph-analytics companion
    of ``host_rank``: each host's component id is the MINIMUM hostname
    (lexicographic) reachable from it.

    Exactly oracle-checkable: min-label propagation converges to the same
    fixpoint as the oracle's recursive-CTE reachability closure + MIN, and
    min() is order-independent, so there is no reduction-order hazard.

    Scale shape: identical to ``host_rank`` — the undirected edge list is
    materialized once as the iterative working set; the label vector is
    host-cardinality (ST5 small-side contract) and broadcasts per
    iteration via ``ray.put``; each iteration is ONE map-only pass over
    the edge partitions emitting batch-local (dst, min incoming label)
    partials, gathered and min-merged on the driver.  Iterations stop at
    the fixpoint (bounded by the eccentricity of each component's
    minimum-label node; ``max_iters`` is a runaway guard and hitting it
    UNCONVERGED raises rather than returning wrong components).  When the
    node table outgrows the broadcast contract (router as in
    ``host_rank``), iterations run the CODED co-partition form
    ``_components_copart`` — 2 exchanges per iteration, no driver gather.
    """
    import numpy as np
    import ray as _ray

    from ..util import worker_cached_stage

    edges = host_link_graph(flat_ds).select_columns(
        ["src_host", "dst_host"])

    def undirect(t: pa.Table) -> pa.Table:
        chunks_s, chunks_d = [], []
        for a, b in (("src_host", "dst_host"), ("dst_host", "src_host")):
            ca, cb = t[a], t[b]
            chunks_s.extend(ca.chunks if isinstance(ca, pa.ChunkedArray) else [ca])
            chunks_d.extend(cb.chunks if isinstance(cb, pa.ChunkedArray) else [cb])
        return pa.table({"src": pa.chunked_array(chunks_s, pa.string()),
                         "dst": pa.chunked_array(chunks_d, pa.string())})

    und = edges.map_batches(undirect, batch_format="pyarrow").materialize()

    node_part = _graph_node_partials(und, "src", "dst")
    if node_part.count() > broadcast_max:
        return _components_copart(und, node_part, max_iters)

    nodes = pd.unique(node_part.to_pandas()["host"])

    class MinLabelPartial:
        def __init__(self, labels_ref) -> None:
            self.labels = _ray.get(labels_ref)  # pd.Series host -> label

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            lbl = df["src"].map(self.labels)
            g = (pd.DataFrame({"dst": df["dst"], "lbl": lbl})
                 .groupby("dst", sort=False)["lbl"].min().reset_index())
            return g

    labels = pd.Series(nodes, index=nodes)   # own hostname
    converged = len(nodes) == 0
    for _ in range(0 if converged else max_iters):
        ref = _ray.put(labels)
        partials = und.map_batches(
            worker_cached_stage(MinLabelPartial, ref, cache_key=ref.hex()),
            batch_format="pandas").to_pandas()
        incoming = partials.groupby("dst", sort=False)["lbl"].min()
        new = labels.copy()
        upd = np.minimum(new.loc[incoming.index].to_numpy(dtype=object),
                         incoming.to_numpy(dtype=object))
        new.loc[incoming.index] = upd
        if new.equals(labels):
            converged = True
            break
        labels = new
    if not converged:
        raise RuntimeError(
            f"host_components did not converge within max_iters={max_iters} "
            "iterations (labels still changing) — raise max_iters; returning "
            "the unconverged labeling would be silently wrong")

    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(
        {"hostname": labels.index.to_numpy(dtype=object),
         "component": labels.to_numpy(dtype=object)}))


def _components_copart(und, node_part, max_iters: int):
    """Co-partition escalation of ``host_components``: per iteration,
    union(edges, labels) → ONE src-key range shuffle resolving each edge's
    source label batch-locally → ONE host-key range shuffle taking the min
    of (own label, incoming partial mins) per node and flagging changes.
    The label vector is a Dataset materialized per iteration; convergence
    is an exact distributed ``sum(changed)`` over it — no driver gather of
    labels, ever.  Raises on hitting ``max_iters`` unconverged."""
    import numpy as np

    from ..util import user_range_groupby

    nodes_ds = _distinct_nodes_ds(node_part)

    def seed(t: pa.Table) -> pa.Table:
        return pa.table({"host": t["host"], "label": t["host"]})

    labels = nodes_ds.map_batches(seed, batch_format="pyarrow").materialize()

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["src"], "dst": t["dst"],
                         "lbl": pa.array([""] * len(t), pa.string()),
                         "is_lbl": pa.array([0] * len(t), pa.int8())})

    def tag_labels(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["host"],
                         "dst": pa.array([""] * len(t), pa.string()),
                         "lbl": t["label"],
                         "is_lbl": pa.array([1] * len(t), pa.int8())})

    _EMPTY_MIN = {"host": object, "lbl": object, "own": "int8"}

    def edge_mins(df: pd.DataFrame) -> pd.DataFrame:
        lab = df.loc[df["is_lbl"] == 1].set_index("key")["lbl"]
        e = df.loc[df["is_lbl"] == 0]
        if e.empty:
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in _EMPTY_MIN.items()})
        g = (pd.DataFrame({"host": e["dst"], "lbl": e["key"].map(lab)})
             .groupby("host", sort=False, as_index=False)["lbl"].min())
        g["own"] = np.int8(0)
        return g[["host", "lbl", "own"]]

    def own_rows(t: pa.Table) -> pa.Table:
        return pa.table({"host": t["host"], "lbl": t["label"],
                         "own": pa.array([1] * len(t), pa.int8())})

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        new = df.groupby("host", sort=False)["lbl"].min()
        old = df.loc[df["own"] == 1].set_index("host")["lbl"]
        changed = (new != old.reindex(new.index)).astype("int64")
        return pd.DataFrame({"host": new.index.to_numpy(dtype=object),
                             "label": new.to_numpy(dtype=object),
                             "changed": changed.to_numpy()})

    converged = nodes_ds.count() == 0
    for _ in range(max_iters):
        u = und.map_batches(tag_edges, batch_format="pyarrow").union(
            labels.map_batches(tag_labels, batch_format="pyarrow"))
        part = user_range_groupby(u, edge_mins, key="key")
        nxt = user_range_groupby(
            part.union(labels.map_batches(own_rows, batch_format="pyarrow")),
            resolve, key="host").materialize()
        n_changed = nxt.sum("changed") or 0
        labels = nxt.select_columns(["host", "label"]).materialize()
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"host_components (co-partition route) did not converge within "
            f"max_iters={max_iters} iterations — raise max_iters; returning "
            "the unconverged labeling would be silently wrong")

    return labels.map_batches(
        lambda t: pa.table({"hostname": t["host"], "component": t["label"]}),
        batch_format="pyarrow")


def host_components_sql(flat_path: str) -> str:
    return f"""
WITH RECURSIVE ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), r AS (
    SELECT CASE WHEN regexp_matches(regexp_extract(s.text, '@referer=(\\S+)', 1), '^https?://')
                THEN regexp_extract(regexp_extract(s.text, '@referer=(\\S+)', 1), '^https?://([^/?#]+)', 1)
                ELSE '' END AS src_host,
           CASE WHEN regexp_matches(s.media_ref, '^https?://')
                THEN regexp_extract(s.media_ref, '^https?://([^/?#]+)', 1)
                ELSE '' END AS dst_host
    FROM ex WHERE regexp_matches(s.text, '@referer=')
), e AS (
    SELECT DISTINCT src_host AS s, dst_host AS t FROM r
    WHERE src_host <> '' AND dst_host <> '' AND src_host <> dst_host
), und AS (
    SELECT s, t FROM e UNION SELECT t AS s, s AS t FROM e
), nodes AS (
    SELECT s AS h FROM und UNION SELECT t FROM und
), reach AS (
    SELECT h, h AS r FROM nodes
    UNION
    SELECT reach.h, und.t AS r FROM reach JOIN und ON und.s = reach.r
)
SELECT h AS hostname, MIN(r) AS component FROM reach GROUP BY h
"""


def host_rank_sql(flat_path: str, iters: int = 3, mass: int = 1_000_000,
                  base: int = 150_000) -> str:
    head = f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), r AS (
    SELECT CASE WHEN regexp_matches(regexp_extract(s.text, '@referer=(\\S+)', 1), '^https?://')
                THEN regexp_extract(regexp_extract(s.text, '@referer=(\\S+)', 1), '^https?://([^/?#]+)', 1)
                ELSE '' END AS src_host,
           CASE WHEN regexp_matches(s.media_ref, '^https?://')
                THEN regexp_extract(s.media_ref, '^https?://([^/?#]+)', 1)
                ELSE '' END AS dst_host
    FROM ex WHERE regexp_matches(s.text, '@referer=')
), e AS (
    SELECT DISTINCT src_host AS s, dst_host AS t FROM r
    WHERE src_host <> '' AND dst_host <> '' AND src_host <> dst_host
), od AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY s),
nodes AS (SELECT s AS h FROM e UNION SELECT t FROM e),
r0 AS (SELECT h, CAST({mass} AS BIGINT) AS m FROM nodes)"""
    for k in range(1, iters + 1):
        head += f""",
r{k} AS (
    SELECT n.h,
           CAST({base} + COALESCE(SUM((p.m * 85) // (100 * od.d)), 0) AS BIGINT) AS m
    FROM nodes n
    LEFT JOIN e ON e.t = n.h
    LEFT JOIN od ON od.s = e.s
    LEFT JOIN r{k - 1} p ON p.h = e.s
    GROUP BY n.h)"""
    return head + f"""
SELECT h AS hostname, m AS rank FROM r{iters}
"""


def host_cooccur(interleaved_ds):
    """Domain co-citation graph: ``(host_a, host_b, n_docs)`` counting the
    documents in which BOTH hosts appear as span resources — the undirected
    companion of ``host_link_graph`` (which needs an explicit ``@referer``
    edge; co-citation needs only shared membership, the signal tracker-graph
    studies use when referer headers are stripped).

    Scale shape: per-doc pair fan-out is C(u,2) with u = unique hosts per
    doc (bounded by span count), generated batch-locally by a vectorized
    pandas self-merge — docs never straddle batches because the flatten
    happens inside this same ``map_batches``.  Batch-local counts shrink
    the stream before the ONE shuffle, a coarse hash-range exchange on
    crc32(host_a|host_b) — pair keys are strictly finer than host keys, so
    a hot host alone cannot skew a partition the way it would in a per-host
    groupby, and sorting 32 int32 range ids is far cheaper than the native
    two-string-key sort it replaces (measured 10.1→3.1 s warm at sf0.1)."""
    import pyarrow.compute as pc

    from ..stages.normalize import _HOST_RE
    from ..util import key_partition_ids, pre_shuffle_coalesce

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        empty = pa.table({"host_a": pa.array([], pa.string()),
                          "host_b": pa.array([], pa.string()),
                          "part_n": pa.array([], pa.int64())})
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans)
        media_ref = pc.struct_field(pc.list_flatten(spans), "media_ref")
        host = pc.fill_null(pc.struct_field(
            pc.extract_regex(media_ref, _HOST_RE), "host"), "")
        h = np.asarray(host.to_pylist(), dtype=object)
        d = parent.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = h != ""
        if not keep.any():
            return empty
        # factorize hostnames; np.unique sorts, so int-code order IS the
        # lexicographic host order and (code_a < code_b) == (host_a < host_b)
        uniq, codes = np.unique(h[keep], return_inverse=True)
        hn = np.int64(len(uniq))
        # distinct (doc, host) membership as one composite int key
        mem = np.unique(d[keep] * hn + codes)
        df = pd.DataFrame({"d": mem // hn, "c": mem % hn})
        m = df.merge(df, on="d")  # hash-join on int64 — no string compares
        pk = m["c_x"].to_numpy() * hn + m["c_y"].to_numpy()
        pk = pk[m["c_x"].to_numpy() < m["c_y"].to_numpy()]
        if not len(pk):
            return empty
        pk_u, cnt = np.unique(pk, return_counts=True)
        return pa.table({
            "host_a": pa.array(uniq[pk_u // hn], pa.string()),
            "host_b": pa.array(uniq[pk_u % hn], pa.string()),
            "part_n": pa.array(cnt, pa.int64()),
        })

    import ray as _ray

    n_parts = max(8, int(_ray.cluster_resources().get("CPU", 8))
                  if _ray.is_initialized() else 8)

    def add_part(t: pa.Table) -> pa.Table:
        pair = pc.binary_join_element_wise(t["host_a"], t["host_b"], "|")
        if not isinstance(pair, pa.ChunkedArray):
            pair = pa.chunked_array([pair])
        return t.append_column("_kpart",
                               pa.array(key_partition_ids(pair, n_parts)))

    def per_range(df):
        out = (df.drop(columns=["_kpart"])
                 .groupby(["host_a", "host_b"], sort=False, as_index=False)
                 ["part_n"].sum()
                 .rename(columns={"part_n": "n_docs"}))
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    return (pre_shuffle_coalesce(
                interleaved_ds.map_batches(partial, batch_format="pyarrow"))
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("_kpart").map_groups(per_range, batch_format="pandas"))


def host_cooccur_sql(flat_path: str) -> str:
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), h AS (
    SELECT DISTINCT doc_id,
           regexp_extract(s.media_ref, '^https?://([^/?#]+)', 1) AS host
    FROM ex WHERE regexp_matches(s.media_ref, '^https?://[^/?#]')
)
SELECT a.host AS host_a, b.host AS host_b,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM h a JOIN h b ON a.doc_id = b.doc_id AND a.host < b.host
GROUP BY host_a, host_b
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
    """Mirrors the engine's repair_b64 semantics: pad to a multiple of 4
    with '='; length ≡ 1 (mod 4) is undecodable even after padding (both
    sides drop the blob)."""
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
       CAST(octet_length(from_base64(
           payload_b64 || repeat('=', (4 - length(payload_b64) % 4) % 4)
       )) AS BIGINT) AS n_bytes
FROM m
WHERE length(payload_b64) % 4 <> 1
"""


# --------------------------------------------------- per-node resource hashes


def span_resource_hashes(flat_ds):
    """A4 ``resources_hashes`` recast: one row per (span, embedded blob) —
    the per-node resource-hash sets of build_all_hashes
    (har2tree.py:550-569, helper.py:236-250).  ``res_hash`` is sha256 of the
    blob's base64 TEXT: DuckDB's sha256 is VARCHAR-only, so the engine
    hashes the same representation the oracle can (the reference hashes
    decoded bytes with sha512 — same identity, different digest domain).
    Every regex match is hashed unconditionally — decodability is NOT a
    precondition (the hash is over the text), so undecodable payloads in
    real captures keep engine and oracle in lockstep."""
    import hashlib

    from ..functions import parse

    def per_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.match_substring(batch["text"], ";base64,"))
        o = {"doc_id": [], "offset": [], "res_hash": []}
        for d, off, t in zip(batch["doc_id"].to_pylist(),
                             batch["offset"].to_pylist(),
                             batch["text"].to_pylist()):
            for _mime, b64 in parse.RE_DATAURI.findall(t):
                o["doc_id"].append(d)
                o["offset"].append(off)
                o["res_hash"].append(hashlib.sha256(b64.encode()).hexdigest())
        return pa.table({
            "doc_id": pa.array(o["doc_id"], pa.string()),
            "offset": pa.array(o["offset"], pa.int32()),
            "res_hash": pa.array(o["res_hash"], pa.string()),
        })

    return flat_ds.select_columns(["doc_id", "offset", "text"]).map_batches(
        per_batch, batch_format="pyarrow")


def span_resource_hashes_sql(flat_path: str) -> str:
    rx = "data:([\\w/+.-]+);base64,([A-Za-z0-9+/=]+)"
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), m AS (
    SELECT doc_id, CAST(s."offset" AS INTEGER) AS "offset",
           UNNEST(regexp_extract_all(s.text, '{rx}', 2)) AS payload_b64
    FROM ex
)
SELECT doc_id, "offset", sha256(payload_b64) AS res_hash FROM m
"""


# ------------------------------------------------- rendered-features merge


def rendered_urls(sidecar_spans_ds, batch_size: int = 128):
    """M33 rendered-features merge: distinct hrefs in the rendered-HTML
    sidecar, flagged by whether each URL also exists as a span media_ref —
    the recast of merging rendered-page URLs back into the capture tree
    (nodes.py rendered-node handling / har2tree.py:158-179 sidecars).
    Zero-shuffle: sidecar and spans live on the same interleaved row."""
    from ..functions import parse

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        htmls = batch["rendered_html"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        o = {"doc_id": [], "url": [], "in_tree": []}
        for did, html, spans in zip(ids, htmls, spans_col):
            if not html:
                continue
            span_urls = {s["media_ref"] for s in spans}
            for u in sorted(set(parse.RE_HREF.findall(html))):
                o["doc_id"].append(did)
                o["url"].append(u)
                o["in_tree"].append(u in span_urls)
        return pa.table({
            "doc_id": pa.array(o["doc_id"], pa.string()),
            "url": pa.array(o["url"], pa.string()),
            "in_tree": pa.array(o["in_tree"], pa.bool_()),
        })

    return sidecar_spans_ds.map_batches(per_batch, batch_format="pyarrow",
                                        batch_size=batch_size)


def rendered_urls_sql(flat_path: str) -> str:
    return f"""
WITH d AS (
    SELECT doc_id, spans, rendered_html
    FROM read_parquet('{flat_path}/*.parquet')
), h AS (
    SELECT DISTINCT doc_id,
           UNNEST(regexp_extract_all(rendered_html, 'href="([^"]+)"', 1)) AS url
    FROM d WHERE rendered_html IS NOT NULL
), su AS (
    SELECT DISTINCT doc_id, s.media_ref AS url
    FROM (SELECT doc_id, UNNEST(spans) AS s FROM d)
)
SELECT h.doc_id, h.url, (su.url IS NOT NULL) AS in_tree
FROM h LEFT JOIN su ON su.doc_id = h.doc_id AND su.url = h.url
"""


def rendered_urls_canonical(sidecar_spans_ds, batch_size: int = 128):
    """M31 full sanitize chain over the rendered-page hrefs — the recast of
    ``urls_in_rendered_page``'s per-URL ``_sanitize`` (reference
    nodes.py:663-673): strip HTML5 whitespace → ``safe_url_string`` →
    ``urljoin`` against the capture root → ``canonicalize_url``
    (keep_fragments=True, the reference's mode) → require a netloc.

    Join base deviation, documented: the reference resolves against the
    rendered NODE's own URL (``self.name``); the engine uses the capture
    root (offset-0 span), which is the deterministic per-doc anchor the
    interleaved layout carries without a chain walk.

    Synth contract (like posted_data's): the synthetic href vocabulary is
    escape-free, so the SQL oracle re-expresses only the transforms that
    vocabulary needs (resolution, case, default port, query sort, empty
    path); percent-normalization is pytest-covered on hostile inputs
    (tests/test_url_canonical.py).  Zero-shuffle: per-doc map_batches."""
    from urllib.parse import urljoin, urlsplit

    from ..functions import parse
    from ..functions.urls import (canonicalize_url, safe_url_string,
                                  strip_html5_whitespace)

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        htmls = batch["rendered_html"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        out_doc, out_url = [], []
        for did, html, spans in zip(ids, htmls, spans_col):
            if not html:
                continue
            base = ""
            for s in spans:
                if s["offset"] == 0:
                    base = s["media_ref"]
                    break
            found: set[str] = set()
            for raw in parse.RE_HREF.findall(html):
                href = safe_url_string(strip_html5_whitespace(raw))
                href = canonicalize_url(urljoin(base, href),
                                        keep_fragments=True)
                if urlsplit(href).netloc:
                    found.add(href)
            for u in sorted(found):
                out_doc.append(did)
                out_url.append(u)
        return pa.table({"doc_id": pa.array(out_doc, pa.string()),
                         "url": pa.array(out_url, pa.string())})

    return sidecar_spans_ds.map_batches(per_batch, batch_format="pyarrow",
                                        batch_size=batch_size)


def rendered_urls_canonical_sql(flat_path: str) -> str:
    """The sanitize chain over the synth (escape-free) href vocabulary:
    trim → resolve against the offset-0 span URL → lowercase scheme/host →
    strip default port → empty path '/' → sort query args → keep fragment →
    require netloc.

    SYNTH CONTRACT (parity holds only inside it — the generator's messy-URL
    vocabulary stays within these bounds by construction):
    * query keys are single-segment ``k=v`` pairs with no '=',
      '&'-in-value, percent-escapes or valueless params — the SQL sorts raw
      'k=v' strings while the engine sorts decoded (key, value) pairs via
      parse_qsl/urlencode (which would emit ``flag=`` for a valueless
      param), and raw-string sort differs from pair sort on prefix keys
      ('a9=1' vs 'a10=1' style);
    * relative hrefs contain no '../' dot segments — the SQL's
      relative-href concat does not resolve them, urljoin does;
    * hrefs are HTML-escape-free (percent-normalization and entity cases
      are covered by the pure-function pytests instead)."""
    return f"""
WITH d AS (
    SELECT doc_id, rendered_html,
           list_filter(spans, s -> s."offset" = 0)[1].media_ref AS base
    FROM read_parquet('{flat_path}/*.parquet')
    WHERE rendered_html IS NOT NULL
), h AS (
    SELECT doc_id, base,
           trim(UNNEST(regexp_extract_all(rendered_html, 'href="([^"]+)"', 1)))
               AS href
    FROM d
), r AS (
    SELECT doc_id,
        CASE
          WHEN href LIKE '//%'
            THEN regexp_extract(base, '^([A-Za-z0-9+.-]+):', 1) || ':' || href
          WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*:')
            THEN href
          WHEN href LIKE '/%'
            THEN regexp_extract(base, '^[A-Za-z0-9+.-]+://[^/?#]+') || href
          ELSE regexp_replace(regexp_replace(base, '[?#].*$', ''),
                              '[^/]*$', '') || href
        END AS abs_url
    FROM h
), p AS (
    SELECT doc_id,
        lower(regexp_extract(abs_url, '^([A-Za-z0-9+.-]+)://', 1)) AS scheme,
        lower(regexp_extract(abs_url, '^[A-Za-z0-9+.-]+://([^/?#]+)', 1)) AS netloc,
        COALESCE(regexp_extract(abs_url, '^[A-Za-z0-9+.-]+://[^/?#]+([^?#]*)', 1), '') AS path,
        COALESCE(regexp_extract(abs_url, '\\?([^#]*)', 1), '') AS query,
        COALESCE(regexp_extract(abs_url, '#(.*)$', 1), '') AS frag
    FROM r
    WHERE regexp_matches(abs_url, '^[A-Za-z0-9+.-]+://[^/?#]+')
)
SELECT DISTINCT doc_id,
    scheme || '://' ||
    CASE WHEN scheme = 'https' AND netloc LIKE '%:443'
             THEN regexp_replace(netloc, ':443$', '')
         WHEN scheme = 'http' AND netloc LIKE '%:80'
             THEN regexp_replace(netloc, ':80$', '')
         ELSE netloc END ||
    CASE WHEN path = '' THEN '/' ELSE path END ||
    CASE WHEN query <> ''
         THEN '?' || list_aggr(list_sort(str_split(query, '&')),
                               'string_agg', '&')
         ELSE '' END ||
    CASE WHEN frag <> '' THEN '#' || frag ELSE '' END AS url
FROM p
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
                          + f["ext_srcset"] + f["ext_attr"]
                          + f["ext_cssimport"] + f["ext_fulltext"]
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
    """Every markup channel runs over the raw text AND its HTML-unescaped
    copy (the engine uses ``html.unescape``; the replace() pair below covers
    the synth escape vocabulary — &quot;/&amp; — the same documented
    synth-only contract as ``posted_data``)."""
    channels = (
        ('src="([^"]+)"', 1),
        ('href="([^"]+)"', 1),
        ('url\\(([^)]+)\\)', 1),
        ("location\\.href=''([^'']+)''", 1),
        ('\\b(?:poster|longdesc|data)="([^"]+)"', 1),
        ('@import\\s+["'']([^"'']+)["'']', 1),
    )
    unions = "\nUNION ALL\n".join(
        f"""SELECT doc_id, UNNEST(regexp_extract_all({col}, '{rx}', {grp})) AS u
    FROM ex""" for rx, grp in channels for col in ("t", "tu"))
    srcset = "\nUNION ALL\n".join(
        f"""SELECT doc_id, split_part(trim(c), ' ', 1) AS u FROM (
    SELECT doc_id, UNNEST(string_split(v, ',')) AS c FROM (
        SELECT doc_id, UNNEST(regexp_extract_all({col}, 'srcset="([^"]+)"', 1)) AS v
        FROM ex))
    WHERE trim(c) <> ''""" for col in ("t", "tu"))
    fulltext = """SELECT doc_id,
       rtrim(UNNEST(regexp_extract_all(
           regexp_replace(tu, '@\\w+=\\S+', ' ', 'g'),
           'https?://[^\\s"''<>()\\[\\]{}]+')), '.,;:!?') AS u
    FROM ex"""
    return f"""
WITH ex AS (
    SELECT doc_id, s.text AS t,
           replace(replace(s.text, '&quot;', '"'), '&amp;', '&') AS tu
    FROM (SELECT doc_id, UNNEST(spans) AS s
          FROM read_parquet('{flat_path}/*.parquet'))
), raw AS (
{unions}
UNION ALL
{srcset}
UNION ALL
{fulltext}
)
SELECT DISTINCT doc_id, trim(u, ' ''\"') AS url
FROM raw
WHERE regexp_matches(trim(u, ' ''\"'), '^https?://')
"""


# ------------------------------------------------------ triangle counting


def host_triangles(flat_ds, n_parts: int | None = None):
    """Per-host triangle counts (see ``_host_triangles_impl``)."""
    return _host_triangles_impl(flat_ds, n_parts)[0]


def _host_triangles_impl(flat_ds, n_parts: int | None = None):
    """Per-host triangle counts over the undirected host referral graph —
    the classic distributed graph-analytics benchmark, with the
    degree-ordered orientation that bounds skew: every edge is oriented
    from its lower-(degree, name) endpoint, so each node's out-degree is
    O(√m) and wedge generation never explodes on a hub host.  Each
    triangle has exactly one node whose two edges both point OUT, so it is
    enumerated exactly once.

    Plan (three bounded exchanges + one tiny rollup):
      1. canonical undirected edge set — one (a, b) pair-key groupby over
         the already-distinct ``host_link_graph`` output;
      2. degree table (one row per host, the ST5 small side) broadcast via
         ``ray.put``; orientation is map-only;
      3. wedge generation per src-range (ONE crc32 shuffle; per-range
         vectorized triu pair expansion) keyed by the closing pair;
      4. closure: wedges ∪ edges co-partitioned on the pair key (ONE
         shuffle), per-range hash merge; matched wedges emit their three
         hosts into batch-local partials → bounded per-host Sum."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from ..util import default_n_parts, key_partition_ids, pre_shuffle_coalesce

    if n_parts is None:
        n_parts = default_n_parts()

    def canon_partial(batch: pa.Table) -> pa.Table:
        # straight from the span stream: triangles need only the DISTINCT
        # canonical pairs, so the link-graph's n_links Sum shuffle is
        # skipped entirely (one bounded pair-key exchange instead of two)
        src, dst = _referral_pairs(batch)
        t = pa.table({"s": pa.array(src, pa.string()),
                      "d": pa.array(dst, pa.string())})
        lo = pc.min_element_wise(t["s"], t["d"])
        hi = pc.max_element_wise(t["s"], t["d"])
        return (pa.table({"a": lo, "b": hi})
                .group_by(["a", "b"]).aggregate([("a", "count")])
                .rename_columns(["a", "b", "_n"]))

    # materialize the canonical edge list ONCE: it is consumed three times
    # (degree rollup, orientation, closure edge side) and is the algorithm's
    # bounded working set — host-pair-sized, not span-sized — the same
    # contract as host_rank's materialized edge+outdeg table.  Without this
    # each consumer re-executes the whole explode→canonicalize upstream
    # (measured 18.8 s → 6.5 s at sf0.1).  The global distinct is ONE
    # crc32 range on "a" (all copies of a pair share a, so the per-range
    # drop_duplicates is exact) — the native multi-key string groupby it
    # replaces cost 6.3 s of the 11 s wall at sf0.1 (execution lesson (a))
    from ..util import user_range_groupby

    canon = user_range_groupby(
        pre_shuffle_coalesce(
            flat_ds.select_columns(["text", "hostname"]).map_batches(
                canon_partial, batch_format="pyarrow")),
        lambda df: df.drop_duplicates(["a", "b"])[["a", "b"]],
        key="a").materialize()

    # degree table: one row per host (bounded small side, like host_rank's
    # rank vector) — gathered once, shipped once via ray.put
    def deg_partial(t: pa.Table) -> pa.Table:
        hosts = pa.concat_arrays([t["a"].combine_chunks().cast(pa.string()),
                                  t["b"].combine_chunks().cast(pa.string())])
        g = pa.table({"h": hosts}).group_by("h").aggregate([("h", "count")])
        return g.rename_columns(["h", "part_d"])

    deg_df = (pre_shuffle_coalesce(
                  canon.map_batches(deg_partial, batch_format="pyarrow"))
              .groupby("h").aggregate(Sum("part_d", alias_name="deg"))
              .to_pandas())
    deg_ref = ray.put((deg_df["h"].to_numpy(dtype=object),
                       deg_df["deg"].to_numpy(dtype=np.int64)))

    class Orient:
        """Degree lookups via pd.Index.get_indexer (one C hashtable probe
        per column) and an Arrow string compare — no per-edge Python."""

        def __init__(self, ref) -> None:
            hosts, degs = ray.get(ref)
            self.idx = pd.Index(hosts)
            self.degs = degs

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table({"src": pa.array([], pa.string()),
                                 "dst": pa.array([], pa.string()),
                                 "spart": pa.array([], pa.int32())})
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            da = self.degs[self.idx.get_indexer(a)]
            db = self.degs[self.idx.get_indexer(b)]
            name_lt = pc.less(t["a"], t["b"]).to_numpy(zero_copy_only=False)
            fwd = (da < db) | ((da == db) & name_lt)
            src = np.where(fwd, a, b)
            dst = np.where(fwd, b, a)
            out = pa.table({"src": pa.array(src, pa.string()),
                            "dst": pa.array(dst, pa.string())})
            return out.append_column(
                "spart", pa.array(key_partition_ids(out["src"], n_parts)))

    from ..util import worker_cached_stage

    oriented = canon.map_batches(
        worker_cached_stage(Orient, deg_ref, cache_key=deg_ref.hex() + "-tri"),
        batch_format="pyarrow")

    def wedges(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["src", "dst"], kind="mergesort")
        o_a, o_b, o_u = [], [], []
        for src, g in df.groupby("src", sort=False):
            nb = g["dst"].to_numpy()
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            o_a.append(nb[i])
            o_b.append(nb[j])
            o_u.append(np.full(len(i), src, dtype=object))
        if o_a:
            a = np.concatenate(o_a); b = np.concatenate(o_b)
            u = np.concatenate(o_u)
        else:
            a = b = u = np.array([], dtype=object)
        out = pa.table({"a": pa.array(a, pa.string()),
                        "b": pa.array(b, pa.string()),
                        "u": pa.array(u, pa.string()),
                        "is_edge": pa.array(np.zeros(len(a), bool))})
        key = pc.binary_join_element_wise(out["a"], out["b"], "|")
        return out.append_column("ppart",
                                 pa.array(key_partition_ids(key, n_parts)))

    wedge_ds = pre_shuffle_coalesce(oriented).groupby("spart").map_groups(
        wedges, batch_format="pyarrow")

    def edge_side(t: pa.Table) -> pa.Table:
        out = pa.table({
            "a": t["a"], "b": t["b"],
            "u": pa.nulls(t.num_rows, pa.string()),
            "is_edge": pa.array(np.ones(t.num_rows, bool)),
        })
        key = pc.binary_join_element_wise(out["a"], out["b"], "|")
        return out.append_column("ppart",
                                 pa.array(key_partition_ids(key, n_parts)))

    edge_ds = canon.map_batches(edge_side, batch_format="pyarrow")

    def close_range(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        e = df[df["is_edge"]][["a", "b"]]
        w = df[~df["is_edge"]]
        m = w.merge(e, on=["a", "b"], how="inner")
        hosts = pd.concat([m["u"], m["a"], m["b"]], ignore_index=True)
        g = hosts.value_counts()
        return pa.table({"hostname": pa.array(g.index, pa.string()),
                         "part_n": pa.array(g.to_numpy(), pa.int64())})

    tri = (pre_shuffle_coalesce(wedge_ds.union(edge_ds))
           .groupby("ppart").map_groups(close_range, batch_format="pyarrow")
           .groupby("hostname").aggregate(Sum("part_n", alias_name="n_triangles")))
    out = tri.map_batches(
        lambda t: pa.table({"hostname": t["hostname"],
                            "n_triangles": pc.cast(t["n_triangles"], pa.int64())}),
        batch_format="pyarrow")
    return out, deg_df


def host_clustering(flat_ds, n_parts: int | None = None):
    """Local clustering coefficient per host, in EXACT integers: the
    coefficient is ``n_triangles / n_wedges`` with ``n_wedges =
    deg·(deg−1)/2`` over the canonical undirected graph — both counts are
    emitted as BIGINTs (the ratio is left to the consumer), so the oracle
    compare stays float-free like host_rank's integer mass.  Hosts with
    degree < 2 are excluded (no wedge to close).  Reuses the triangle
    plan; the degree table is the bounded small side already gathered
    there, so the extra cost is one driver-side merge."""
    tri_ds, deg_df = _host_triangles_impl(flat_ds, n_parts)
    tri = tri_ds.to_pandas()  # bounded: one row per host
    out = deg_df.rename(columns={"h": "hostname"}).copy()
    out["deg"] = out["deg"].astype("int64")
    out = out[out["deg"] >= 2]
    out["n_wedges"] = out["deg"] * (out["deg"] - 1) // 2
    out = out.merge(tri, on="hostname", how="left")
    out["n_triangles"] = out["n_triangles"].fillna(0).astype("int64")
    return pa.Table.from_pandas(
        out[["hostname", "deg", "n_wedges", "n_triangles"]].sort_values(
            "hostname").reset_index(drop=True), preserve_index=False)


def host_clustering_sql(flat_path: str) -> str:
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), r AS (
    SELECT CASE WHEN regexp_matches(regexp_extract(s.text, '@referer=(\\S+)', 1), '^https?://')
                THEN regexp_extract(regexp_extract(s.text, '@referer=(\\S+)', 1), '^https?://([^/?#]+)', 1)
                ELSE '' END AS src_host,
           CASE WHEN regexp_matches(s.media_ref, '^https?://')
                THEN regexp_extract(s.media_ref, '^https?://([^/?#]+)', 1)
                ELSE '' END AS dst_host
    FROM ex WHERE regexp_matches(s.text, '@referer=')
), g AS (
    SELECT src_host, dst_host FROM r
    WHERE src_host <> '' AND dst_host <> '' AND src_host <> dst_host
    GROUP BY 1, 2
), e AS (
    SELECT DISTINCT LEAST(src_host, dst_host) AS a,
                    GREATEST(src_host, dst_host) AS b
    FROM g
), d AS (
    SELECT hostname, CAST(COUNT(*) AS BIGINT) AS deg
    FROM (SELECT a AS hostname FROM e UNION ALL SELECT b FROM e)
    GROUP BY 1
), t AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), tc AS (
    SELECT hostname, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (SELECT x AS hostname FROM t
          UNION ALL SELECT y FROM t
          UNION ALL SELECT z FROM t)
    GROUP BY 1
)
SELECT d.hostname, d.deg,
       CAST(d.deg * (d.deg - 1) // 2 AS BIGINT) AS n_wedges,
       CAST(COALESCE(tc.n_triangles, 0) AS BIGINT) AS n_triangles
FROM d LEFT JOIN tc USING (hostname)
WHERE d.deg >= 2
"""


def host_triangles_sql(flat_path: str) -> str:
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), r AS (
    SELECT CASE WHEN regexp_matches(regexp_extract(s.text, '@referer=(\\S+)', 1), '^https?://')
                THEN regexp_extract(regexp_extract(s.text, '@referer=(\\S+)', 1), '^https?://([^/?#]+)', 1)
                ELSE '' END AS src_host,
           CASE WHEN regexp_matches(s.media_ref, '^https?://')
                THEN regexp_extract(s.media_ref, '^https?://([^/?#]+)', 1)
                ELSE '' END AS dst_host
    FROM ex WHERE regexp_matches(s.text, '@referer=')
), g AS (
    SELECT src_host, dst_host FROM r
    WHERE src_host <> '' AND dst_host <> '' AND src_host <> dst_host
    GROUP BY 1, 2
), e AS (
    SELECT DISTINCT LEAST(src_host, dst_host) AS a,
                    GREATEST(src_host, dst_host) AS b
    FROM g
), t AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), h AS (
    SELECT x AS hostname FROM t
    UNION ALL SELECT y FROM t
    UNION ALL SELECT z FROM t
)
SELECT hostname, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM h GROUP BY hostname
"""


def host_reciprocity(flat_ds, n_parts: int | None = None):
    """Per-host edge RECIPROCITY over the directed host referral graph:
    for every source host, its distinct out-degree and how many of those
    out-edges are reciprocated (the reverse edge exists) — the directed
    companion of ``host_clustering`` (mutual-link density, a standard
    web-graph trust signal).

    Scale shape (exact, no broadcast): batch-local DISTINCT directed
    pairs straight from the span stream (the host_triangles lesson — the
    link-graph's n_links Sum exchange is skipped entirely because only
    distinctness matters), keyed on the CANONICAL unordered pair
    (min, max) with a direction bit, so every copy of BOTH directions
    co-locates in ONE crc32 pair-key range shuffle; the per-range pass
    dedups directed pairs globally, marks an out-edge reciprocated iff
    its pair carries both direction bits, and emits per-source partials;
    a final bounded (host-cardinality) groupby sums.  Exact integers
    throughout.  A/B at sf0.1 (loaded window): 8.5 → ~4 s."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..util import (default_n_parts, key_partition_ids,
                        pre_shuffle_coalesce, user_range_groupby)

    if n_parts is None:
        n_parts = default_n_parts()

    def tag(batch: pa.Table) -> pa.Table:
        src0, dst0 = _referral_pairs(batch)
        t = (pa.table({"s": pa.array(src0, pa.string()),
                       "d": pa.array(dst0, pa.string())})
             .group_by(["s", "d"]).aggregate([("s", "count")]))
        src = t["s"].to_numpy(zero_copy_only=False)
        dst = t["d"].to_numpy(zero_copy_only=False)
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        return pa.table({
            "pair": pa.array(
                np.char.add(np.char.add(lo.astype(str), "|"), hi.astype(str)),
                pa.string()),
            "src_host": pa.array(src, pa.string()),
            "fwd": pa.array(src == lo),
        })

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        # batch partials repeat directed edges across batches: dedup
        # globally first (all copies share the range), then a pair is
        # reciprocated iff both direction bits survive
        df = df.drop_duplicates(["pair", "fwd"])
        both = df.groupby("pair", sort=False)["fwd"].transform("size") == 2
        out = (pd.DataFrame({"hostname": df["src_host"],
                             "recip": both.astype("int64")})
               .groupby("hostname", sort=False)
               .agg(part_out=("recip", "size"), part_recip=("recip", "sum"))
               .reset_index())
        out["part_out"] = out["part_out"].astype("int64")
        return out

    parts = user_range_groupby(
        flat_ds.select_columns(["text", "hostname"]).map_batches(
            tag, batch_format="pyarrow"), per_range,
        key="pair", n_parts=n_parts)
    agg = pre_shuffle_coalesce(parts).groupby("hostname").aggregate(
        Sum("part_out", alias_name="out_deg"),
        Sum("part_recip", alias_name="n_reciprocal"))

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "hostname": t["hostname"],
            "out_deg": pc.cast(t["out_deg"], pa.int64()),
            "n_reciprocal": pc.cast(t["n_reciprocal"], pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def host_reciprocity_sql(flat_path: str) -> str:
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), r AS (
    SELECT CASE WHEN regexp_matches(regexp_extract(s.text, '@referer=(\\S+)', 1), '^https?://')
                THEN regexp_extract(regexp_extract(s.text, '@referer=(\\S+)', 1), '^https?://([^/?#]+)', 1)
                ELSE '' END AS src_host,
           CASE WHEN regexp_matches(s.media_ref, '^https?://')
                THEN regexp_extract(s.media_ref, '^https?://([^/?#]+)', 1)
                ELSE '' END AS dst_host
    FROM ex WHERE regexp_matches(s.text, '@referer=')
), e AS (
    SELECT DISTINCT src_host AS s, dst_host AS t FROM r
    WHERE src_host <> '' AND dst_host <> '' AND src_host <> dst_host
)
SELECT e.s AS hostname,
       CAST(COUNT(*) AS BIGINT) AS out_deg,
       CAST(SUM(CASE WHEN b.s IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           AS n_reciprocal
FROM e LEFT JOIN e b ON b.s = e.t AND b.t = e.s
GROUP BY e.s
"""


def host_assortativity(flat_ds):
    """Degree-assortativity components of the undirected host graph in
    EXACT integers — one row ``(m, sum_a, sum_b, sum_ab, sum_a2, sum_b2)``
    over the canonical (a < b) edge list with da/db the endpoints'
    undirected degrees: the Pearson degree-degree correlation assembles
    from these six moments (Newman 2002, public), so only BIGINTs cross
    the oracle compare (the host_clustering philosophy).

    Scale shape: the canonical distinct edge list (one bounded pair-key
    groupby off host_link_graph) + the per-host degree table broadcast via
    ``ray.put`` (ST5 small side, exactly host_triangles' step 2); moments
    accumulate batch-locally into 1-row partials and a driver-free 1-block
    reduce sums them."""
    import numpy as np
    import ray as _ray

    from ..util import pre_shuffle_coalesce, worker_cached_stage

    def canon_partial(batch: pa.Table) -> pa.Table:
        # straight from the span stream (the host_triangles / reciprocity
        # lesson): only DISTINCT canonical pairs matter, so the link
        # graph's n_links Sum exchange is skipped entirely
        src, dst = _referral_pairs(batch)
        lo = np.minimum(np.asarray(src, object), np.asarray(dst, object))
        hi = np.maximum(np.asarray(src, object), np.asarray(dst, object))
        out = pa.table({"a": pa.array(lo, pa.string()),
                        "b": pa.array(hi, pa.string())})
        return out.group_by(["a", "b"]).aggregate([("a", "count")]).select(["a", "b"])

    from ray.data.aggregate import Count

    cedges = (pre_shuffle_coalesce(
                  flat_ds.select_columns(["text", "hostname"]).map_batches(
                      canon_partial, batch_format="pyarrow"))
              .groupby(["a", "b"]).aggregate(Count())
              .select_columns(["a", "b"])).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        hosts = pa.concat_arrays([t["a"].combine_chunks().cast(pa.string()),
                                  t["b"].combine_chunks().cast(pa.string())])
        g = pa.table({"h": hosts}).group_by("h").aggregate([("h", "count")])
        return g.rename_columns(["h", "part_d"])

    from ray.data.aggregate import Sum

    deg_df = (pre_shuffle_coalesce(
                  cedges.map_batches(deg_partial, batch_format="pyarrow"))
              .groupby("h").aggregate(Sum("part_d", alias_name="deg"))
              .to_pandas())
    deg_ref = _ray.put(dict(zip(deg_df["h"], deg_df["deg"].astype(int))))

    class Moments:
        def __init__(self, ref) -> None:
            self.deg = _ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t["a"].to_pylist()
            b = t["b"].to_pylist()
            da = np.array([self.deg[x] for x in a], np.int64)
            db = np.array([self.deg[x] for x in b], np.int64)
            return pa.table({
                "m": pa.array([np.int64(len(a))]),
                "sum_a": pa.array([da.sum()]),
                "sum_b": pa.array([db.sum()]),
                "sum_ab": pa.array([(da * db).sum()]),
                "sum_a2": pa.array([(da * da).sum()]),
                "sum_b2": pa.array([(db * db).sum()]),
            })

    parts = cedges.map_batches(
        worker_cached_stage(Moments, deg_ref, cache_key=deg_ref.hex() + "-ass"),
        batch_format="pyarrow")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = ("m", "sum_a", "sum_b", "sum_ab", "sum_a2", "sum_b2")
        import numpy as _np

        return pd.DataFrame({c: [_np.int64(df[c].sum())] for c in cols})

    return parts.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def host_assortativity_sql(flat_path: str) -> str:
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), r AS (
    SELECT CASE WHEN regexp_matches(regexp_extract(s.text, '@referer=(\\S+)', 1), '^https?://')
                THEN regexp_extract(regexp_extract(s.text, '@referer=(\\S+)', 1), '^https?://([^/?#]+)', 1)
                ELSE '' END AS src_host,
           CASE WHEN regexp_matches(s.media_ref, '^https?://')
                THEN regexp_extract(s.media_ref, '^https?://([^/?#]+)', 1)
                ELSE '' END AS dst_host
    FROM ex WHERE regexp_matches(s.text, '@referer=')
), e0 AS (
    SELECT DISTINCT src_host AS sh, dst_host AS dh FROM r
    WHERE src_host <> '' AND dst_host <> '' AND src_host <> dst_host
), e AS (
    SELECT DISTINCT LEAST(sh, dh) AS a, GREATEST(sh, dh) AS b FROM e0
), d AS (
    SELECT h, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT a AS h FROM e UNION ALL SELECT b FROM e) GROUP BY h
)
SELECT CAST(COUNT(*) AS BIGINT) AS m,
       CAST(SUM(da.deg) AS BIGINT) AS sum_a,
       CAST(SUM(db.deg) AS BIGINT) AS sum_b,
       CAST(SUM(da.deg * db.deg) AS BIGINT) AS sum_ab,
       CAST(SUM(da.deg * da.deg) AS BIGINT) AS sum_a2,
       CAST(SUM(db.deg * db.deg) AS BIGINT) AS sum_b2
FROM e JOIN d da ON da.h = e.a JOIN d db ON db.h = e.b
"""


# -------------------------------------------------------- core decomposition


def host_kcore(flat_ds):
    """Core decomposition of the undirected host referral graph:
    ``core(h)`` = the largest k such that h belongs to a subgraph in which
    every node has degree ≥ k (graph degeneracy / k-core peel — the
    standard "dense-subgraph layer" analytic completing the host-graph
    family next to triangles/clustering/components).

    Plan: the canonical DISTINCT edge set is built exactly as
    host_triangles stage 1 (batch-local canonical pairs → ONE crc32
    pair-range exchange with per-range drop_duplicates), then gathered
    ONCE to the driver — host-PAIR-sized, the same ST5 bounded working
    set host_rank/triangles argue — where the exact min-degree peel runs
    (lazy-deletion heap, O(E log V)).  Escalation for an unbounded host
    table: the distributed iterative peel (repeat per k: degree rollup →
    drop nodes with deg < k → re-rollup), one bounded exchange per round
    over the same canonical edge Dataset — the host_components
    escalation pattern.

    Rows-only (iterative peeling has no SQL form; fixpoint-per-k is not
    recursive-CTE-expressible with aggregates): invariants pytest-checked
    against an independent per-k maximal-subgraph computation
    (tests/test_webmeta.py)."""
    import heapq

    edges = _canonical_edge_df(flat_ds)

    adj: dict[str, set] = {}
    for a, b in zip(edges["a"], edges["b"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {h: len(s) for h, s in adj.items()}
    heap = [(d, h) for h, d in deg.items()]
    heapq.heapify(heap)
    core: dict[str, int] = {}
    k = 0
    while heap:
        d, h = heapq.heappop(heap)
        if h in core or d != deg[h]:
            continue            # stale lazy-deletion entry
        k = max(k, d)
        core[h] = k
        for nb in adj[h]:
            if nb not in core:
                deg[nb] -= 1
                heapq.heappush(heap, (deg[nb], nb))
    hosts = sorted(core)
    return pa.table({
        "hostname": pa.array(hosts, pa.string()),
        "core": pa.array([core[h] for h in hosts], pa.int64()),
    })


def _canonical_edge_df(flat_ds):
    """DISTINCT canonical (a < b) undirected host referral edges, gathered
    to the driver — the host-PAIR-bounded ST5 working set shared by
    host_kcore/host_bridges (built exactly as host_triangles stage 1: one
    crc32 pair-range exchange, per-range drop_duplicates)."""
    import pyarrow.compute as pc

    from ..util import pre_shuffle_coalesce, user_range_groupby

    def canon_partial(batch: pa.Table) -> pa.Table:
        src, dst = _referral_pairs(batch)
        t = pa.table({"s": pa.array(src, pa.string()),
                      "d": pa.array(dst, pa.string())})
        lo = pc.min_element_wise(t["s"], t["d"])
        hi = pc.max_element_wise(t["s"], t["d"])
        return (pa.table({"a": lo, "b": hi})
                .group_by(["a", "b"]).aggregate([("a", "count")])
                .rename_columns(["a", "b", "_n"]))

    return user_range_groupby(
        pre_shuffle_coalesce(
            flat_ds.select_columns(["text", "hostname"]).map_batches(
                canon_partial, batch_format="pyarrow")),
        lambda df: df.drop_duplicates(["a", "b"])[["a", "b"]],
        key="a").to_pandas()


def host_bridges(flat_ds):
    """BRIDGE edges of the undirected host referral graph: edges whose
    removal disconnects their component (cut edges / Tarjan low-link) —
    the connectivity-structure analytic next to components/kcore: a
    bridge is exactly a single-point-of-failure referral path between
    host clusters.

    Plan: the canonical distinct edge set (one bounded pair-range
    exchange, ``_canonical_edge_df``) gathered once — host-pair-bounded —
    then an ITERATIVE Tarjan DFS (explicit stack: no recursion limit on
    path-like graphs) computing disc/low; edge (u, v) is a bridge iff
    low[v] > disc[u].  Deterministic: roots and neighbors visited in
    sorted order.  Escalation for an unbounded host table: bridge =
    edge absent from every cycle — distributed cycle-membership via the
    components machinery on the edge-deleted graph, one candidate edge
    class per round.  Rows-only (low-link has no SQL form); brute-force
    removal pytest in tests/test_webmeta.py."""
    edges = _canonical_edge_df(flat_ds)
    adj: dict[str, list] = {}
    for a, b in zip(edges["a"], edges["b"]):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for h in adj:
        adj[h].sort()

    disc: dict[str, int] = {}
    low: dict[str, int] = {}
    bridges: list[tuple[str, str]] = []
    t = 0
    for root in sorted(adj):
        if root in disc:
            continue
        # iterative DFS: stack of (node, parent, neighbor-iterator)
        disc[root] = low[root] = t
        t += 1
        stack = [(root, None, iter(adj[root]))]
        while stack:
            u, parent, it = stack[-1]
            advanced = False
            for v in it:
                if v not in disc:
                    disc[v] = low[v] = t
                    t += 1
                    stack.append((v, u, iter(adj[v])))
                    advanced = True
                    break
                elif v != parent:
                    low[u] = min(low[u], disc[v])
            if not advanced:
                stack.pop()
                if parent is not None:
                    low[parent] = min(low[parent], low[u])
                    if low[u] > disc[parent]:
                        bridges.append((min(parent, u), max(parent, u)))
    bridges.sort()
    return pa.table({
        "a": pa.array([x[0] for x in bridges], pa.string()),
        "b": pa.array([x[1] for x in bridges], pa.string()),
    })
