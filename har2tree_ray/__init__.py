"""har2tree_ray — a Ray-Data-native spatial-join + tiling engine.

Built from scratch (not a port) with the query/data-processing capabilities
of Lookyloo/har2tree (reference, read-only, at /root/reference), recast per
the north rule as H3/S2-style tiling over interleaved text+media document
tables.  See SURVEY.md for the blueprint and the reference↔engine concept
map.

Public surface (the recast of har2tree/__init__.py:9-17):
  - sources.interleaved.read_interleaved — the capture loader
  - stages.normalize.flat_spans          — span normalization
  - stages.parser.parse_spans            — the span parser actor pool
  - pipelines.tree.build_edges           — URL-tree construction (CrawledTree)
  - pipelines.hosttree.host_edges        — hostname tree (HostNode)
  - pipelines.stats.doc_stats            — per-document stats
  - sources.har.read_har_dir             — real HAR ingestion
  - pipelines.corpus.corpus_keep         — training-corpus curation verdict
  - pipelines.tiling                     — tile encode / rollup / vectorize
"""

__version__ = "0.1.0"
