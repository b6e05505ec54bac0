"""HTTP API (role of reference crates/core/src/api/: axum build_router
api/mod.rs:94-145 — search/widget/sidebar/spellcheck/autosuggest/webgraph/
similar-hosts routes, /metrics Prometheus router :266-268, concurrency limit +
CORS, user counters, improvement click log).

aiohttp app; blocking searcher work (device calls, shard RPC) runs in the
default executor so the event loop stays responsive."""

from __future__ import annotations

import asyncio
import json
import os

from aiohttp import web

from ..searcher.api import ApiSearcher
from ..searcher.query import SearchQuery
from ..utils.metrics import PrometheusRegistry
from .improvement import ImprovementLog
from .user_count import UserCount


def build_app(
    searcher: ApiSearcher,
    autosuggest=None,
    similar_hosts=None,
    page_graph=None,
    image_store=None,
    registry: PrometheusRegistry | None = None,
    max_concurrency: int = 64,
    max_batch: int | None = None,
) -> web.Application:
    app = web.Application()
    registry = registry or PrometheusRegistry()
    search_ok = registry.counter("search_requests_total", "successful searches", status="ok")
    search_err = registry.counter("search_requests_total", "failed searches", status="error")
    latency = registry.histogram("search_latency_seconds", "search latency")
    user_count = UserCount()
    improvements = ImprovementLog()
    sem = asyncio.Semaphore(max_concurrency)
    # dedicated executor sized to the concurrency limit: the default asyncio
    # executor has ~5 threads on a 1-core host, which starves the shard-side
    # query micro-batcher (batches of 5 instead of 64+)
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=max_concurrency, thread_name_prefix="api-blk")

    async def _blocking(fn, *args):
        loop = asyncio.get_running_loop()
        async with sem:
            return await loop.run_in_executor(pool, fn, *args)

    # concurrent searches funnel through a TWO-stage pipelined funnel: worker 1
    # runs the batched device fan-out, worker 2 the host tails — batch k's
    # snippets/rerank overlap batch k+1's device wait. (A thread per request
    # would convoy on the GIL and collapse throughput ~10x on a 1-core host.)
    from ..searcher.batcher import PipelinedBatcher

    # max_batch defaults to HALF the admission limit: the pipeline only
    # overlaps when a second batch can form while the first is in flight
    search_batcher = PipelinedBatcher(
        searcher.search_phase1, searcher.search_phase2,
        max_batch=max_batch or max(1, max_concurrency // 2), window_ms=4.0)

    # ---- search ----------------------------------------------------------------
    async def search(request: web.Request):
        try:
            body = await request.json()
        except json.JSONDecodeError:
            return web.json_response({"error": "invalid json"}, status=400)
        if not isinstance(body, dict) or not isinstance(body.get("query"), str):
            return web.json_response({"error": "missing or invalid 'query'"}, status=400)
        sq = SearchQuery.from_json(body)
        if not sq.query.strip():
            return web.json_response({"error": "empty query"}, status=400)
        user_count.observe(request.headers.get("X-Forwarded-For", request.remote or ""))
        try:
            with latency.time():
                result = await _blocking(search_batcher.submit, sq)
            search_ok.inc()
        except Exception as e:  # noqa: BLE001
            search_err.inc()
            return web.json_response({"error": str(e)}, status=500)
        return web.json_response(result.to_json())

    # ---- widget / sidebar / spellcheck -------------------------------------------
    async def widget(request: web.Request):
        body = await request.json()
        w = await _blocking(searcher.widget, body.get("query", ""))
        return web.json_response({"widget": w})

    async def sidebar(request: web.Request):
        body = await request.json()
        s = await _blocking(searcher.sidebar_for, body.get("query", ""))
        return web.json_response({"sidebar": s})

    async def spellcheck(request: web.Request):
        body = await request.json()
        c = await _blocking(searcher.spell_correction, body.get("query", ""))
        return web.json_response({"correction": c.to_json() if c else None})

    async def autosuggest_route(request: web.Request):
        q = request.query.get("q", "")
        if not q and request.method == "POST":
            try:
                q = (await request.json()).get("q", "")
            except Exception:  # noqa: BLE001
                q = ""
        if autosuggest is None:
            return web.json_response([])
        return web.json_response([{"raw": s} for s in autosuggest.suggest(q)])

    # ---- webgraph / explore ---------------------------------------------------------
    async def similar_hosts_route(request: web.Request):
        body = await request.json()
        if similar_hosts is None:
            return web.json_response([])
        hosts = body.get("hosts", [])
        top_k = int(body.get("topN", body.get("top_k", 20)))
        res = await _blocking(similar_hosts.similar_hosts, hosts, top_k)
        return web.json_response([{"host": h, "score": s} for h, s in res])

    async def knows_host(request: web.Request):
        host = request.query.get("host", "")
        if similar_hosts is None:
            return web.json_response({"type": "unknown"})
        known = similar_hosts.graph.rank_of(host) is not None
        return web.json_response({"type": "known" if known else "unknown", "host": host})

    # ---- webgraph link browsing (api/webgraph.rs:130-260 ingoing/outgoing) ---------
    def _edges(graph, node: str, direction: str) -> list:
        if graph is None:
            return []
        from ..webgraph.edge import RelFlags

        links = graph.backlinks(node) if direction == "in" else graph.forwardlinks(node)
        out = []
        for other_rank, flags in links[:1024]:
            other = graph.name_of(other_rank)
            frm, to = (other, node) if direction == "in" else (node, other)
            rel = [f.name for f in RelFlags if flags & f.value]
            out.append({"from": frm, "to": to, "relFlags": rel})
        return out

    async def _links_route(request: web.Request, graph, key: str, direction: str):
        node = request.query.get(key, "")
        if not node:
            try:
                body = await request.json()
                node = body.get(key, "")
            except Exception:  # noqa: BLE001
                node = ""
        if not node:
            return web.json_response({"error": f"missing {key}"}, status=400)
        # strip scheme for host-graph nodes
        node = node.split("://", 1)[-1].rstrip("/") if key == "host" else node
        edges = await _blocking(_edges, graph, node, direction)
        return web.json_response(edges)

    host_graph = similar_hosts.graph if similar_hosts is not None else None

    async def host_ingoing(request):
        return await _links_route(request, host_graph, "host", "in")

    async def host_outgoing(request):
        return await _links_route(request, host_graph, "host", "out")

    async def page_ingoing(request):
        return await _links_route(request, page_graph, "page", "in")

    async def page_outgoing(request):
        return await _links_route(request, page_graph, "page", "out")

    # ---- optic export (api/hosts.rs:39-48, api/explore.rs:37-72) -------------------
    async def hosts_export(request: web.Request):
        from ..optics.optic import HostRankings, Optic

        body = await request.json()
        hr = HostRankings.from_json(body.get("hostRankings", body.get("host_rankings", {})))
        return web.Response(text=Optic(host_rankings=hr).to_string(), content_type="text/plain")

    async def explore_export(request: web.Request):
        from ..optics.optic import Action, HostRankings, Matching, MatchLocation, Optic, Rule

        body = await request.json()
        chosen = body.get("chosenHosts", body.get("chosen_hosts", []))
        similar = body.get("similarHosts", body.get("similar_hosts", []))
        blocks = [
            [Matching(MatchLocation.DOMAIN, f"|{site}|")] for site in list(similar) + list(chosen)
        ]
        optic = Optic(
            rules=[Rule(blocks, Action("boost", 0))],
            host_rankings=HostRankings(liked=list(chosen)),
            discard_non_matching=True,
        )
        return web.Response(text=optic.to_string(), content_type="text/plain")

    # ---- entity image (api/search.rs:351-375) --------------------------------------
    async def entity_image(request: web.Request):
        image_id = request.query.get("imageId", request.query.get("image_id", ""))
        if image_store is None or not image_id:
            return web.Response(status=404)
        data = await _blocking(image_store.get, image_id)
        if data is None:
            return web.Response(status=404)
        return web.Response(body=data, content_type="image/webp")

    # ---- browser autosuggest (OpenSearch format, api/autosuggest.rs:107-116) -------
    async def autosuggest_browser(request: web.Request):
        q = request.query.get("q", "")
        if not q or autosuggest is None:
            return web.json_response(["", []])
        return web.json_response([q, autosuggest.suggest(q)])

    # ---- misc -----------------------------------------------------------------------
    async def improvement_store(request: web.Request):
        """Store a (qid, query, urls) record for LTR training (role of
        api/improvement.rs:64-80 StoreQuery)."""
        body = await request.json()
        qid = improvements.store(body.get("query", ""), body.get("urls", []))
        return web.Response(text=qid)

    async def improvement_click(request: web.Request):
        body = await request.json()
        improvements.log(body.get("qid", ""), body.get("click", ""))
        return web.json_response({"ok": True})

    async def metrics(request: web.Request):
        return web.Response(text=registry.render(), content_type="text/plain")

    async def health(request: web.Request):
        return web.Response(text="ok")

    async def docs_openapi(request: web.Request):
        from .docs import openapi_spec

        return web.json_response(openapi_spec())

    async def docs_page(request: web.Request):
        from .docs import docs_html

        return web.Response(text=docs_html(), content_type="text/html")

    # ---- frontend SPA (stract_tpu/frontend/, role of the reference's
    # SvelteKit app: search/explore/settings routes client-side routed) --------
    _frontend = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "frontend")

    async def ui(request: web.Request):
        p = os.path.join(_frontend, "index.html")
        if os.path.exists(p):
            with open(p) as fh:
                return web.Response(text=fh.read(), content_type="text/html")
        return web.Response(text=_SEARCH_UI, content_type="text/html")

    _MIME = {".js": "text/javascript", ".css": "text/css", ".xml": "application/xml",
             ".html": "text/html", ".svg": "image/svg+xml", ".png": "image/png"}

    async def static_file(request: web.Request):
        name = os.path.basename(request.match_info["name"])  # no traversal
        p = os.path.join(_frontend, name)
        if not os.path.exists(p):
            return web.Response(status=404)
        ext = os.path.splitext(name)[1]
        with open(p, "rb") as fh:
            return web.Response(body=fh.read(), content_type=_MIME.get(ext, "application/octet-stream"))

    app.router.add_post("/beta/api/search", search)
    app.router.add_post("/beta/api/search/widget", widget)  # api/mod.rs:118
    app.router.add_post("/beta/api/widget", widget)  # legacy alias (pre-round-3 clients)
    app.router.add_post("/beta/api/search/sidebar", sidebar)
    app.router.add_post("/beta/api/search/spellcheck", spellcheck)
    app.router.add_get("/beta/api/autosuggest", autosuggest_route)
    app.router.add_post("/beta/api/autosuggest", autosuggest_route)
    app.router.add_post("/beta/api/webgraph/host/similar", similar_hosts_route)
    app.router.add_get("/beta/api/webgraph/host/knows", knows_host)
    app.router.add_post("/beta/api/webgraph/host/ingoing", host_ingoing)
    app.router.add_post("/beta/api/webgraph/host/outgoing", host_outgoing)
    app.router.add_post("/beta/api/webgraph/page/ingoing", page_ingoing)
    app.router.add_post("/beta/api/webgraph/page/outgoing", page_outgoing)
    app.router.add_post("/beta/api/hosts/export", hosts_export)
    app.router.add_post("/beta/api/explore/export", explore_export)
    app.router.add_get("/beta/api/entity_image", entity_image)
    app.router.add_get("/beta/api/autosuggest/browser", autosuggest_browser)
    app.router.add_post("/improvement/store", improvement_store)
    app.router.add_post("/improvement/click", improvement_click)
    app.router.add_get("/metrics", metrics)
    app.router.add_get("/health", health)
    app.router.add_get("/beta/api/docs/openapi.json", docs_openapi)
    app.router.add_get("/beta/api/docs", docs_page)
    app.router.add_get("/", ui)
    app.router.add_get("/search", ui)
    app.router.add_get("/explore", ui)
    app.router.add_get("/settings", ui)
    # article pages (reference frontend/src/routes/{about,webmasters,
    # privacy-and-happy-lawyers})
    app.router.add_get("/about", ui)
    app.router.add_get("/webmasters", ui)
    app.router.add_get("/privacy", ui)
    app.router.add_get("/static/{name}", static_file)

    # permissive CORS (reference api/mod.rs:100-113 CorsLayer::permissive)
    @web.middleware
    async def cors(request, handler):
        if request.method == "OPTIONS":
            resp = web.Response()
        else:
            resp = await handler(request)
        resp.headers["Access-Control-Allow-Origin"] = "*"
        resp.headers["Access-Control-Allow-Headers"] = "*"
        resp.headers["Access-Control-Allow-Methods"] = "*"
        return resp

    app.middlewares.append(cors)
    return app


def run_api(app: web.Application, host: str = "0.0.0.0", port: int = 3000):
    web.run_app(app, host=host, port=port)


_SEARCH_UI = """<!doctype html>
<html><head><meta charset="utf-8"><title>stract_tpu</title>
<style>body{font-family:sans-serif;max-width:720px;margin:40px auto;padding:0 16px}
input{width:70%;padding:8px;font-size:16px}button{padding:8px 16px;font-size:16px}
.r{margin:18px 0}.r a{font-size:18px}.u{color:#0a7d33;font-size:13px}.s{color:#444}
b{background:#fff2a8}</style></head>
<body><h2>stract_tpu</h2>
<form onsubmit="go();return false"><input id=q autofocus><button>Search</button></form>
<div id=out></div>
<script>
async function go(){
  const q=document.getElementById('q').value;
  const res=await fetch('/beta/api/search',{method:'POST',
    headers:{'content-type':'application/json'},body:JSON.stringify({query:q})});
  const data=await res.json();
  const out=document.getElementById('out');out.innerHTML='';
  if(data.type==='bang'){location=data.redirectTo;return}
  for(const w of (data.webpages||[])){
    out.innerHTML+=`<div class=r><a href="${w.url}">${w.title||w.url}</a>
      <div class=u>${w.url}</div><div class=s>${w.snippet_html||w.snippet||''}</div></div>`;
  }
  out.innerHTML+=`<p>${(data.numHits&&data.numHits.value)||0} results</p>`;
}
</script></body></html>"""
