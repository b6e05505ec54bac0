"""stract_tpu — a TPU-native web search engine framework.

Brand-new implementation of the capabilities of StractOrg/stract (Rust reference),
re-designed TPU-first: query-time compute (block-max BM25 top-k, fused signal
coalescing, embedding rerank, cross-encoder BERT, HyperBall harmonic centrality)
runs as JAX/XLA/Pallas programs on TPU; the surrounding runtime (crawl, parse,
storage, RPC/gossip fabric, HTTP API) is host-side Python/C++.

Layer map (mirrors reference SURVEY.md §1):
  L0 storage/foundation: utils/, kv/, index/ (segment format), warc.py
  L1 offline pipelines:  entrypoint/{indexer,webgraph,centrality,...}, crawler/
  L2 local engines:      index/, webgraph/, ranking/, query/, collector/, snippet.py
  L3 shard servers:      entrypoint/{search_server,webgraph_server,live_index,...}
  L4 distributed fabric: distributed/ (sonic RPC, gossip cluster, sharded clients)
  L5 coordinator:        searcher/api.py
  L6 HTTP API:           api/
"""

__version__ = "0.1.0"
