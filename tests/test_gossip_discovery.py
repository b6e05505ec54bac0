"""Full service-discovery loop: a search shard announces itself via gossip and
a ReusableShardedClient built from the cluster finds and queries it (the
reference's ReusableShardedClient auto-refresh, sonic/replication.rs:494-505)."""

import time

from stract_tpu.distributed.cluster import Cluster, Service
from stract_tpu.distributed.replication import ReusableShardedClient
from stract_tpu.distributed.sonic import serve_in_thread
from stract_tpu.entrypoint.search_server import SearchService
from stract_tpu.index import InvertedIndex
from stract_tpu.searcher.distributed import DistributedSearcher
from stract_tpu.searcher.query import SearchQuery

from conftest import make_doc


def test_gossip_discovered_search(tmp_path):
    idx = InvertedIndex(str(tmp_path / "i"))
    idx.insert(make_doc("https://found.com/x", "discoverable page", "found via gossip discovery"))
    idx.commit()

    seed = Cluster.join(Service("api"), interval=0.1, failure_timeout=5.0)
    srv = serve_in_thread(SearchService(idx, shard_id=0))
    shard_cluster = Cluster.join(
        Service("search-server", host=srv.addr, shard=0),
        seeds=[seed.gossip_addr], interval=0.1, failure_timeout=5.0,
    )
    try:
        assert seed.await_member(lambda m: m.service.kind == "search-server", timeout=10)
        client = ReusableShardedClient(seed, "search-server", refresh=0.5)
        ds = DistributedSearcher(client)
        candidates, count = ds.search_initial(SearchQuery(query="gossip discovery"))
        assert count.value == 1
        ds.retrieve(SearchQuery(query="gossip discovery"), candidates)
        assert candidates[0].retrieved["url"] == "https://found.com/x"
    finally:
        shard_cluster.shutdown()
        seed.shutdown()
        srv.stop()
