"""LocalSearcher — one shard's full search logic (role of reference
searcher/local/mod.rs:46-140 LocalSearcher + InnerLocalSearcher).

Flow per query (reference call stack §3.1):
  Query.parse → optics attach → device search_initial (fused core signals) →
  device signal matrix for the shard's top candidates → host gathers of
  embeddings + dedup hash columns → RankedCandidates for the coordinator.
"""

from __future__ import annotations

from ..collector import ApproxCount
from ..index import InvertedIndex
from ..query import Query
from ..ranking.computer import TermGroup
from ..ranking.pipeline import RankedCandidate, NUM_PIPELINE_RANKING_RESULTS
from ..ranking import signals as S
from .query import SearchQuery

DEDUP_COLUMNS = [
    "url_without_query_hash1",
    "url_without_query_hash2",
    "title_hash1",
    "site_hash1",
    "sim_hash",
]


class LocalSearcher:
    def __init__(self, index: InvertedIndex, shard_id: int = 0, linear_model=None,
                 batcher=None):
        self.index = index
        self.shard_id = shard_id
        self.linear_model = linear_model
        self.batcher = batcher  # searcher/batcher.py QueryBatcher (shard servers)

    def parse_query(self, sq: SearchQuery) -> Query:
        optic = None
        if sq.optic:
            from ..optics import Optic

            optic = Optic.parse(sq.optic)
        q = Query.parse(
            sq.query,
            coefficients=sq.signal_coefficients,
            selected_region=sq.selected_region,
            optic=optic,
        )
        if sq.safe_search:
            q.groups.append(
                TermGroup("nsfw", ["safety_classification"], required=False, excluded=True, scoring=False)
            )
        if sq.host_rankings is not None:
            q.host_rankings = sq.host_rankings
        return q

    def search_initial(self, sq: SearchQuery, max_candidates: int = NUM_PIPELINE_RANKING_RESULTS):
        """→ (candidates: list[RankedCandidate], count: ApproxCount)."""
        q = self.parse_query(sq)
        if q.is_empty():
            return [], ApproxCount(0, True)
        ctx = q.context()

        if self.batcher is not None:
            ptrs, scores = self.batcher.search_initial(ctx)
            ptrs, scores = ptrs[:max_candidates], scores[:max_candidates]
        else:
            ptrs, scores = self.index.search_initial(ctx, top_k=max_candidates)
        if q.phrases:
            keep = self.index.filter_phrases(ptrs, q.phrases)
            ptrs = [ptrs[i] for i in keep]
            scores = [scores[i] for i in keep]
        n_found = len(ptrs)
        if n_found >= max_candidates:
            # saturated: report the df-based estimate (Count::Approximate role)
            count = ApproxCount(max(self.index.estimate_count(ctx), n_found), False)
        else:
            count = ApproxCount(n_found, True)
        if not ptrs:
            return [], count

        sig = self.index.compute_signals(ctx, ptrs)  # [K, NUM_SIGNALS]
        t_emb = self.index.gather_embeddings(ptrs, "title_embeddings")
        k_emb = self.index.gather_embeddings(ptrs, "keyword_embeddings")

        candidates = []
        for i, (p, sc) in enumerate(zip(ptrs, scores)):
            seg = self.index.segments[p.segment]
            dedup = {name: int(seg.column(name)[p.doc]) for name in DEDUP_COLUMNS}
            host_id = int(seg.column("host_node_id")[p.doc])
            c = RankedCandidate(
                shard=self.shard_id,
                pointer=p,
                score=float(sc),
                signals=sig[i].copy(),
                title_embedding=t_emb[i] if t_emb is not None else None,
                keyword_embedding=k_emb[i] if k_emb is not None else None,
                dedup=dedup,
                host_id=host_id,
            )
            if self.linear_model is not None:
                c.score += float(self.linear_model.predict(sig[i][None, :])[0])
            candidates.append(c)
        return candidates, count

    def retrieve(self, sq: SearchQuery, pointers: list) -> list:
        q = self.parse_query(sq)
        return self.index.retrieve(pointers, q.simple_terms)

    def search(self, sq: SearchQuery) -> dict:
        """Single-shard end-to-end search (no coordinator pipeline) — used by
        tests and the dev server."""
        candidates, count = self.search_initial(sq)
        page = candidates[sq.offset() : sq.offset() + sq.num_results]
        docs = self.retrieve(sq, [c.pointer for c in page])
        for c, d in zip(page, docs):
            c.retrieved = d
        return {
            "webpages": [
                {**(c.retrieved or {}), "score": c.score, "shard": c.shard}
                for c in page
            ],
            "num_hits": count.to_json(),
        }
