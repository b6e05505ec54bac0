import numpy as np

from stract_tpu.distributed.sonic import serve_in_thread, RemoteClient, StreamingResponse
from stract_tpu.webgraph import Edge, WebgraphBuilder
from stract_tpu.webgraph.betweenness import betweenness_centrality


class StreamService:
    def numbers(self, body):
        return StreamingResponse(range(body["n"]))

    def plain(self, body):
        return "not streamed"


def test_streaming_response():
    srv = serve_in_thread(StreamService())
    try:
        c = RemoteClient(srv.addr)
        assert c.send("numbers", {"n": 5}) == [0, 1, 2, 3, 4]
        # connection reusable after a stream
        assert c.send("plain", {}) == "not streamed"
        assert c.send("numbers", {"n": 2}) == [0, 1]
    finally:
        srv.stop()


def test_betweenness(tmp_path):
    # path graph a→b→c→d: b and c lie on all through-paths
    b = WebgraphBuilder()
    for f, t in [("a", "b"), ("b", "c"), ("c", "d")]:
        b.insert(Edge(f, t))
    g = b.build(str(tmp_path / "g"))
    bc = betweenness_centrality(g)
    assert bc["b"] > 0 and bc["c"] > 0
    assert bc["a"] == 0 and bc["d"] == 0
    assert abs(bc["b"] - bc["c"]) < 1e-12

    # sampled variant stays proportional
    bc_s = betweenness_centrality(g, num_samples=4)
    assert bc_s["b"] >= bc_s["a"]
