"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself before importing this module; no
function here (or in har2tree_ray) calls ``ray.init``/``ray.shutdown``.

``entry()`` runs the flagship pipeline (interleaved docs → flatten/normalize
→ tile rollup) at sf0.001.  ``queries()``/``oracle_sql()`` expose every
implemented operator per SURVEY.md §2 — 135 queries, 115 with exact DuckDB
oracles (counts asserted by ``tests/test_synth.py`` so they cannot go
stale); the oracle is omitted only for the genuinely non-SQL-expressible
ones (the consume-once tree cascade family, approximate/scale-path variants,
binary payload plumbing), each of which is pytest-verified against an
independent in-process implementation or its exact counterpart.
``queries()`` lists oracled entries FIRST (the driver's correctness
snapshot covers the first 50).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def entry() -> Any:
    """Flagship pipeline on sf0.001: synthesize interleaved docs, flatten +
    normalize spans, roll up into tiles.  Returns a ray.data.Dataset."""
    from har2tree_ray.queries import q_tile_rollup

    return q_tile_rollup(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from har2tree_ray import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from har2tree_ray import queries as q

    return q.oracle_sql(SF_CORRECT)
