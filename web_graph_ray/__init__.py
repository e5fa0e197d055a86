"""web_graph_ray — a Ray-Data-native web-graph crawl + data-processing engine.

A from-scratch reimplementation of the capabilities of the reference
crawler ``jamesjarvis/web-graph`` (Go + LevelDB + Postgres) as idiomatic
Ray Data pipelines: ``ray.data.Dataset`` → ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, explicit
host-hash partitioning for the wide steps, per-partition checkpoints.

Layout:
- ``functions/`` — pure scalar/vector building blocks (URL canonicalization
  with Go net/url parity, filters, HTML extraction, hashing, text analysis)
- ``stages/``   — Ray Data batch transforms (canonicalize, fetch, extract,
  dedup families, ANN, multimodal stubs)
- ``state/``    — sharded crawl state (seen sets, politeness, checkpoints)
- ``pipelines/``— the round-based crawl driver + graph query library
- ``sources/``  — corpus/seed readers

IMPORTANT: nothing in this package calls ``ray.init()``/``ray.shutdown()``
— sessions are owned by the caller (driver, bench.py, test fixture).
"""

__version__ = "0.1.0"
