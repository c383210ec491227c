"""Web-artifact metadata ops (HHHash, domhash, TLD, identifiers, never-sent
cookies) + the JSON render sink."""

from __future__ import annotations

import json

import pytest

from har2tree_ray.functions import webhash
from tests.oracle_utils import assert_matches_oracle, to_pandas

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", [
    "span_hhhash", "doc_domhash", "host_tld", "span_identifiers",
    "cookies_never_sent",
])
def test_oracle_parity(name):
    assert_matches_oracle(name, SF)


def test_hhhash_consecutive_dedup():
    a = webhash.hhhash("@geo=1,2 @frame=u1 @frame=u2 @referer=x")
    b = webhash.hhhash("@geo=1,2 @frame=u1 @referer=x")
    assert a == b  # consecutive duplicate names collapse
    c = webhash.hhhash("@geo=1,2 @referer=x @frame=u1 @referer=y")
    assert c != a  # non-consecutive repeats are kept
    assert a.startswith(f"hhh:{webhash.HHHASH_VERSION}:")


def test_identifier_blocklist():
    sitekeys, gtags = webhash.extract_identifiers(
        'x data-sitekey="6LKEY" gtag G-ABC1234 gtag G-12345678')
    assert sitekeys == ["6LKEY"]
    assert gtags == ["G-ABC1234"]  # blocklisted placeholder removed


def test_identifiers_present_in_fixture():
    from har2tree_ray import queries as q

    df = to_pandas(q.q_span_identifiers(SF))
    assert (df["id_type"] == "sitekey").any()
    assert (df["id_type"] == "gtag").any()
    assert not df["value"].isin(webhash.GTAG_BLOCKLIST).any()


def test_split_suffix():
    assert webhash.split_suffix("www.example.co.uk") == ("co.uk", "example.co.uk")
    assert webhash.split_suffix("h1.example2.com:8080") == ("com", "example2.com")
    assert webhash.split_suffix("10.1.1.2") == ("", "")
    assert webhash.split_suffix("localhost") == ("", "")


def test_host_tree_json_roundtrip():
    """The JSON render must reproduce the host-edge structure exactly."""
    from har2tree_ray import queries as q

    docs = to_pandas(q.q_host_tree_json(SF))
    edges = to_pandas(q.q_host_edges(SF))
    some = docs.head(20)
    for _, row in some.iterrows():
        tree = json.loads(row["json"])
        assert tree["doc_id"] == row["doc_id"]

        got_edges = set()

        def walk(node, parent_key):
            key = (node["level"], node["name"])
            if parent_key is not None:
                got_edges.add((*parent_key, *key))
            for ch in node.get("children", []):
                walk(ch, key)

        for r in tree["tree"]:
            walk(r, None)
        want = edges[edges["doc_id"] == row["doc_id"]]
        want_edges = {
            (int(pl), ph, int(hl), h)
            for pl, ph, hl, h in zip(want["parent_level"], want["parent_hostname"],
                                     want["host_level"], want["hostname"])
            if int(pl) >= 0  # root sentinel edges carry no JSON parent
        }
        assert got_edges == want_edges
        # deterministic output
        assert row["json"] == json.dumps(json.loads(row["json"]),
                                         sort_keys=True, separators=(",", ":"))


@pytest.mark.parametrize("name", ["embedded_blobs", "urls_in_doc", "capture_stats"])
def test_oracle_parity_extras(name):
    assert_matches_oracle(name, SF)


def test_embedded_blob_roundtrip():
    from har2tree_ray.functions.parse import repair_b64
    from har2tree_ray import queries as q

    df = to_pandas(q.q_embedded_blobs(SF))
    assert len(df) > 0
    for b64, n in zip(df["payload_b64"].head(50), df["n_bytes"].head(50)):
        assert len(repair_b64(b64)) == n
