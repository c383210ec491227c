"""SpanParser — the stateful actor-pool parsing stage (stage B of the
lifecycle, SURVEY.md §3.1).

Recasts the reference's heavy per-entry content parsers — POST-body decode
dispatch (M12, /root/reference/har2tree/nodes.py:260-498), external/embedded
resource extraction (M19, helper.py:356-466), JS-redirect (M22), meta-refresh
(M23), initiator (M25), cookie normalizers (M14/M15) — as one single-pass
regex extractor over span text.  The reference loads parser machinery into
lazy globals (MagicDb helper.py:477-485, soup builders helper.py:283-294);
here that state (compiled patterns) is built once per actor in ``__init__``
and reused per ``__call__`` batch: ``map_batches(SpanParser, concurrency=N)``.

Output adds Arrow-native feature columns (lists stay ``list<string>`` — no
Python object columns) consumed by the tree-builder shuffle.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import parse


_STR_COLS = frozenset({"redirect_url", "meta_refresh", "referer", "initiator_url"})


class SpanParser:
    """Callable class for ``ds.map_batches(SpanParser, concurrency=...)``."""

    def __init__(self) -> None:
        # compiled once per actor (regexes are module-level compiled; binding
        # them locally here pins the lookup cost out of the batch loop)
        self._extract = parse.parse_span_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        cols: dict[str, list] = {
            "redirect_url": [""] * n,
            "meta_refresh": [""] * n,
            "referer": [""] * n,
            "initiator_url": [""] * n,
            "frame_urls": [None] * n,
            "ext_src": [None] * n,
            "ext_href": [None] * n,
            "ext_cssurl": [None] * n,
            "ext_srcset": [None] * n,
            "ext_attr": [None] * n,
            "ext_cssimport": [None] * n,
            "ext_fulltext": [None] * n,
            "jsloc_urls": [None] * n,
            "embedded_mimes": [None] * n,
            "embedded_hashes": [None] * n,
            "setcookies": [None] * n,
            "cookies_sent": [None] * n,
        }
        for i, t in enumerate(texts):
            f = self._extract(t)
            for k in cols:
                cols[k][i] = f[k]
        out = batch
        for k, v in cols.items():
            typ = pa.string() if k in _STR_COLS else pa.list_(pa.string())
            out = out.append_column(k, pa.array(v, typ))
        return out


def default_pool_size() -> int:
    """FIXED actor-pool size of ~half the CPUs: the pool never reserves
    every CPU (read/shuffle stages keep running alongside — ray_guide: a
    pool that reserves every CPU serializes the pipeline), and a fixed size
    avoids the autoscaling ramp from 1 actor, which serialized the first
    seconds of every actor stage (measured 2x on media_features at sf0.1)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, cpus // 2)


def parse_spans(flat_ds, concurrency: int | tuple[int, int] | None = None,
                batch_size: int = 2048):
    """Flat span Dataset → Dataset with parsed attach-evidence columns.

    Runs as plain tasks with a per-worker SpanParser memo
    (``util.worker_cached_stage``): the parser's state is compiled regex
    bindings — microsecond setup — so an actor pool paid its spin-up
    (3-6 s per Dataset execution, once per QUERY) for nothing.  Tasks run
    on Ray's long-lived workers and parallelize across every core instead
    of a fixed half-CPU pool."""
    from ..util import task_concurrency, worker_cached_stage

    return flat_ds.map_batches(
        worker_cached_stage(SpanParser),
        batch_format="pyarrow",
        batch_size=batch_size,
        **task_concurrency(concurrency),
    )


def parse_redirects(flat_ds):
    """Light task-based extractor for pipelines that only need the redirect
    chain evidence (redirect_url, referer) — skips the full feature set, so
    column pruning carries through to the parse (stateless: plain tasks,
    no actor pool needed for two compiled regexes)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        red = [parse.first(parse.RE_REDIRECT, t) for t in texts]
        ref = [parse.first(parse.RE_REFERER, t) for t in texts]
        return pa.table({
            "doc_id": batch["doc_id"],
            "offset": batch["offset"],
            "media_ref": batch["media_ref"],
            "redirect_url": pa.array(red, pa.string()),
            "referer": pa.array(ref, pa.string()),
        })

    return flat_ds.select_columns(
        ["doc_id", "offset", "media_ref", "text"]
    ).map_batches(per_batch, batch_format="pyarrow")
