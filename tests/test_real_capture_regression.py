"""Real-capture golden-count regression (S1/S2 parity lock).

The synthetic corpus evolves every round; these EXACT counts over the
reference's own public captures (tests/test.py:15-26 builds CrawledTrees
from the same files) pin the HAR ingestion + cascade + graft behavior so
source/parser changes can't silently shift real-capture output.  The
numbers were frozen from a run whose cascade was parity-verified edge-by-
edge against the independent recursive oracle (tests/test_har.py::
test_cascade_parity_on_real_hars covers the same files) — they are
regression locks, not re-derivations.

Marked ``realhar``: run with ``pytest -m realhar`` (full suite includes it
by default; whole module < 60 s).
"""

from __future__ import annotations

import glob
import json
import os
from collections import Counter

import pytest

DATA = "/root/reference/tests/data"
LALIBRE = os.path.join(DATA, "lalibre")

pytestmark = [
    pytest.mark.realhar,
    pytest.mark.skipif(not os.path.isdir(LALIBRE),
                       reason="reference HAR corpus not present"),
]

# frozen from the parity-verified cascade (see module docstring); the rule
# mix matters as much as the total — a regression that swaps referer
# attaches for fallbacks keeps the total but shifts the histogram
LALIBRE_EDGES = 2839
LALIBRE_RULES = {"referer": 1736, "fallback_root": 398,
                 "fallback_hostname": 275, "redirect": 216, "root": 214}
LALIBRE_GRAFT_ROWS = 214  # one graft row per capture in the corpus

SINGLE_HAR_GOLDEN = {
    "buzzfeed.har": (162, {"root": 1, "referer": 146, "fallback_root": 14,
                           "fallback_hostname": 1}),
    "circl.har": (11, {"root": 1, "referer": 10}),
    "lemonde.har": (220, {"root": 1, "fallback_root": 66, "referer": 64,
                          "fallback_hostname": 76, "redirect": 13}),
    "libe.har": (513, {"root": 1, "referer": 343, "fallback_root": 109,
                       "fallback_hostname": 17, "redirect": 43}),
    "nyt.har": (22, {"root": 1, "referer": 20, "fallback_root": 1}),
    "simple/heroku_index.har": (6, {"root": 1, "initiator": 4,
                                    "referer": 1}),
}


def _coarse(rules) -> dict:
    return dict(Counter("external" if r.startswith("external_") else r
                        for r in rules))


def test_lalibre_corpus_edge_counts_frozen():
    from har2tree_ray.pipelines import tree
    from har2tree_ray.sources.har import read_har_dir

    edges = tree.build_edges_interleaved(read_har_dir(LALIBRE)).to_pandas()
    assert len(edges) == LALIBRE_EDGES
    assert _coarse(edges["attach_rule"]) == LALIBRE_RULES


def test_lalibre_graft_rows_frozen():
    from har2tree_ray.pipelines import graft
    from har2tree_ray.sources.har import read_har_dir

    g = graft.graft_edges_interleaved(read_har_dir(LALIBRE)).to_pandas()
    assert len(g) == LALIBRE_GRAFT_ROWS
    assert g["child_doc"].nunique() == LALIBRE_GRAFT_ROWS


@pytest.mark.parametrize("rel", sorted(SINGLE_HAR_GOLDEN))
def test_single_har_edge_counts_frozen(rel):
    from har2tree_ray.pipelines.tree import doc_edge_rows
    from har2tree_ray.sources.har import har_entries_to_spans

    with open(os.path.join(DATA, rel)) as f:
        h = json.load(f)
    entries = sorted(h["log"]["entries"],
                     key=lambda e: e.get("startedDateTime", ""))
    edges = doc_edge_rows(har_entries_to_spans(entries))
    want_n, want_rules = SINGLE_HAR_GOLDEN[rel]
    assert len(edges) == want_n
    assert _coarse(e["attach_rule"] for e in edges) == want_rules
