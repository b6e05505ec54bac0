"""API coordinator process (role of reference entrypoint/api.rs: wires the
ApiSearcher to gossip-discovered search shards, loads the aux models, serves
HTTP)."""

from __future__ import annotations

from ..api.server import build_app, run_api
from ..autosuggest import Autosuggest
from ..bangs import Bangs
from ..config import ApiConfig, GossipConfig, _from_dict
from ..distributed.cluster import Cluster, Service
from ..distributed.replication import ReusableShardedClient
from ..ranking.pipeline import RankingPipeline, RecallStage, PrecisionStage
from ..searcher.api import ApiSearcher
from ..searcher.distributed import DistributedSearcher


def run(cfg: ApiConfig):
    gossip = _from_dict(GossipConfig, cfg.gossip or {})
    cluster = Cluster.join(
        Service("api"), gossip_addr=gossip.addr_tuple(), seeds=gossip.seed_tuples()
    )
    client = ReusableShardedClient(cluster, "search-server")
    live_client = ReusableShardedClient(cluster, "live-index")
    searcher = DistributedSearcher(client, live_client=live_client)

    recall = RecallStage()
    precision = PrecisionStage()
    # the neural rerank models (reference config/mod.rs:270-272 →
    # searcher/api/mod.rs:598-614: dual encoder in recall, cross encoder in
    # precision) — loaded from native checkpoint dirs or HF safetensors dirs
    if cfg.dual_encoder_path:
        from ..models.dual_encoder import DualEncoder

        recall.dual_encoder = DualEncoder.load(cfg.dual_encoder_path)
    if cfg.cross_encoder_path:
        from ..ranking.models.cross_encoder import CrossEncoderModel

        precision.cross_encoder = CrossEncoderModel.load(cfg.cross_encoder_path)
    if cfg.lambdamart_path:
        from ..ranking.models import LambdaMART

        with open(cfg.lambdamart_path) as fh:
            text = fh.read()
        model = (
            LambdaMART.parse_lightgbm(text) if "Tree=" in text else LambdaMART.from_json(text)
        )
        recall.lambdamart = model
        precision.lambdamart = model

    sidebar = None
    if cfg.entity_index_path:
        from ..entity_index import EntityIndex
        from ..entity_index.index import SidebarManager

        sidebar = SidebarManager(EntityIndex(cfg.entity_index_path))
    else:
        # no local entity index → serve the sidebar from gossip-discovered
        # entity-search-server processes (role of the reference's remote
        # EntitySearcher service, entrypoint/entity_search_server.rs)
        from .entity_search_server import RemoteSidebarManager

        sidebar = RemoteSidebarManager(ReusableShardedClient(cluster, "entity-search"))

    spell = None
    if cfg.spell_path:
        from ..spell.trainer import load_checker

        spell = load_checker(cfg.spell_path)

    similar = None
    if cfg.host_graph_path:
        from ..ranking.inbound_similarity import InboundSimilarity
        from ..webgraph import Webgraph

        similar = InboundSimilarity(Webgraph(cfg.host_graph_path))
        recall.inbound = similar

    from ..widgets import WidgetManager

    api = ApiSearcher(
        searcher,
        pipeline=RankingPipeline(recall, precision),
        bangs=Bangs.from_path(cfg.bangs_path) if cfg.bangs_path else Bangs.builtin(),
        spell_checker=spell,
        widget_manager=WidgetManager(),
        sidebar_manager=sidebar,
    )
    page_graph = None
    if cfg.page_graph_path:
        from ..webgraph import Webgraph

        page_graph = Webgraph(cfg.page_graph_path)
    image_store = None
    if cfg.entity_image_store_path:
        from ..image_store import ImageStore

        image_store = ImageStore(cfg.entity_image_store_path)
    elif not cfg.entity_index_path:
        from .entity_search_server import RemoteEntityImageStore

        image_store = RemoteEntityImageStore(
            ReusableShardedClient(cluster, "entity-search"))

    suggest = Autosuggest.load(cfg.autosuggest_path) if cfg.autosuggest_path else None
    app = build_app(api, autosuggest=suggest, similar_hosts=similar,
                    page_graph=page_graph, image_store=image_store,
                    max_concurrency=cfg.max_concurrency)
    run_api(app, cfg.host, cfg.port)
