"""ApiSearcher — the coordinator search logic (role of reference
searcher/api/mod.rs:218,645: bang handling :292, spell check :340,
combine_results cross-shard merge :412-465, recall + retrieve + precision
rerank flow :554-642)."""

from __future__ import annotations

from dataclasses import dataclass, field

from ..bangs import Bangs
from ..collector import BucketCollector
from ..query import Query
from ..ranking.pipeline import NUM_PIPELINE_RANKING_RESULTS, RankingPipeline
from ..ranking import signals as S
from .query import SearchQuery

MAX_PRECISION_PAGE = 2  # cross-encoder rerank only for the first pages (api/mod.rs:598-614)
# deep-paging cutoff: offset+num past the pipeline window is most likely a bot
# (api/mod.rs:561-566) — approximate offsets, no recall/precision ranking
MAX_APPROX_CANDIDATES = 4096  # scan stage generates ≤ SCAN_C per segment anyway


@dataclass
class WebsitesResult:
    webpages: list
    num_hits: dict
    search_duration_ms: float = 0.0
    has_more_results: bool = False

    def to_json(self):
        return {
            "type": "websites",
            "webpages": self.webpages,
            "numHits": self.num_hits,
            "searchDurationMs": self.search_duration_ms,
            "hasMoreResults": self.has_more_results,
        }


@dataclass
class BangResult:
    redirect_to: str

    def to_json(self):
        return {"type": "bang", "redirectTo": self.redirect_to}


class ApiSearcher:
    def __init__(
        self,
        distributed_searcher,
        pipeline: RankingPipeline | None = None,
        bangs: Bangs | None = None,
        spell_checker=None,
        widget_manager=None,
        sidebar_manager=None,
    ):
        self.searcher = distributed_searcher
        self.pipeline = pipeline or RankingPipeline()
        self.bangs = bangs or Bangs.builtin()
        self.spell_checker = spell_checker
        self.widgets = widget_manager
        self.sidebar = sidebar_manager

    # -- main entry (reference ApiSearcher::search :645) --------------------------
    def search(self, sq: SearchQuery):
        return self.search_many([sq])[0]

    def search_many(self, sqs: list) -> list:
        """Coordinator flow for a BATCH of queries: one batched shard fan-out,
        then the per-query tail (merge → recall → retrieve → precision). The
        HTTP layer funnels concurrent requests here through a PipelinedBatcher
        that runs search_phase1 (device-heavy fan-out) and search_phase2 (host
        tail) on separate workers, overlapping batch k's tail with batch k+1's
        device wait — on a 1-core host the blocking jax fetch releases the GIL,
        so the overlap is real."""
        return self.search_phase2(self.search_phase1(sqs))

    def search_phase1(self, sqs: list):
        """Parse + bang short-circuit + batched shard fan-out (device work).
        Shard results are ARRAY-carried (CandidateBlock) whenever the searcher
        supports it — per-result object builds were the coordinator's top
        host cost (docs/perf_notes.md round 4)."""
        import time

        from ..ranking.pipeline.block import CandidateBlock

        t0 = time.perf_counter()
        results: list = [None] * len(sqs)
        live: list = []
        parsed: list = []
        for i, sq in enumerate(sqs):
            q = Query.parse(sq.query, coefficients=sq.signal_coefficients,
                            selected_region=sq.selected_region)
            hit = self.bangs.get(q) if q.bangs else None
            if hit is not None:
                results[i] = BangResult(hit.redirect_to)
            elif sq.offset() + sq.num_results > NUM_PIPELINE_RANKING_RESULTS:
                # bot deep paging: approximate offsets, skip recall/precision
                # (reference search_websites_approx_offsets, api/mod.rs:503,564)
                results[i] = self.search_websites_approx_offsets(sq, q)
            else:
                live.append(i)
                parsed.append(q)

        shard_res = []
        qemb_fetch = None
        if live:
            import os

            # query-side dual-encoder forward dispatched ASYNC, FIRST: its
            # device round trip + compute then overlap the (blocking) pass-1
            # fan-out below instead of serializing after the merge
            dual = self.pipeline.recall.dual_encoder
            if dual is not None:
                qemb_fetch = dual.embed_async([sqs[i].query for i in live])

            blocks = getattr(self.searcher, "search_blocks_many", None)
            if os.environ.get("STRACT_TPU_OBJECT_RESULTS"):  # A/B: legacy object path
                blocks = None
            if blocks is not None:
                shard_res = blocks([sqs[i] for i in live])
            else:
                batched = getattr(self.searcher, "search_initial_many", None)
                obj_res = (batched([sqs[i] for i in live]) if batched is not None
                           else [self.searcher.search_initial(sqs[i]) for i in live])
                shard_res = [(CandidateBlock.from_candidates(cands), count)
                             for cands, count in obj_res]
        return sqs, results, live, parsed, shard_res, t0, qemb_fetch

    def search_phase2(self, state) -> list:
        """Per-query host tail: merge → optics residual → [BATCHED recall] →
        page cut → [ONE batched page-signal materialization] → retrieve/
        snippets → [BATCHED precision]. Results stay ARRAY-carried
        (CandidateBlock) until the page cut — only the final ≤20 rows per
        query become Python objects. Every neural-model and signal-matrix
        device dispatch is batched across the request batch — per-query
        dispatches cost a device round trip each (measured 7.1 qps vs 63.8 at
        D=10M with the cross-encoder on before batching)."""
        import time

        sqs, results, live, parsed, shard_res, t0, qemb_fetch = state
        merged_items = []  # (i, ctx, merged block, count)
        for j, i in enumerate(live):
            ctx, merged, count = self._merge_block(sqs[i], parsed[j], *shard_res[j])
            merged_items.append((i, ctx, merged, count))

        # recall stage, batched: materialize the merged sets' signals in one
        # device pass only when an active scorer will modify them; the query
        # embeddings were PREFETCHED in phase 1 (one per-batch forward whose
        # round trip rode behind the pass-1 fan-out)
        if self.pipeline.recall.has_scorers:
            self._ensure_blocks([(sqs[i], merged) for i, _, merged, _ in merged_items])
        ranked = self.pipeline.rank_recall_many_blocks(
            [(ctx, merged) for _, ctx, merged, _ in merged_items],
            qembs=qemb_fetch() if qemb_fetch is not None else None)

        staged = []
        for (i, ctx, _, count), block in zip(merged_items, ranked):
            offset = sqs[i].offset()
            page_block = block.take(slice(offset, offset + sqs[i].num_results))
            has_more = len(block) > offset + sqs[i].num_results
            staged.append((i, ctx, page_block, count, has_more))

        # materialize every page's lazy signals in ONE device pass across the
        # whole batch — per-query materialization would pay a tunnel dispatch
        # (~25 ms) per query — THEN build the page's candidate objects
        self._ensure_blocks([(sqs[i], pb) for i, _, pb, _, _ in staged])
        for _, _, pb, _, _ in staged:
            pb.fill_slop_signals()  # device pass-2 doesn't know the slop signals
        staged = [(i, ctx, pb.to_candidates(), count, has_more)
                  for i, ctx, pb, count, has_more in staged]
        for i, _, page, _, _ in staged:
            self.searcher.retrieve(sqs[i], [c for c in page if c.retrieved is None])

        # precision stage, batched: one cross-encoder forward for every
        # query's title+snippet pairs
        prec_items = [(ctx, page) for i, ctx, page, _, _ in staged
                      if sqs[i].page < MAX_PRECISION_PAGE]
        prec_pages = iter(self.pipeline.rank_precision_many(prec_items))

        for i, ctx, page, count, has_more in staged:
            if sqs[i].page < MAX_PRECISION_PAGE:
                page = next(prec_pages)
            res = self._serialize_page(sqs[i], page, count, has_more)
            res.search_duration_ms = (time.perf_counter() - t0) * 1000
            results[i] = res
        return results

    def _ensure_many(self, items: list) -> None:
        ensure_many = getattr(self.searcher, "ensure_signals_many", None)
        if ensure_many is not None:
            ensure_many(items)
            return
        ensure = getattr(self.searcher, "ensure_signals", None)
        if ensure is not None:
            for sq, cands in items:
                ensure(sq, cands)

    def _ensure_blocks(self, items: list) -> None:
        """Materialize lazy signal matrices on blocks, batched across the
        request batch. Remote shards serialize signals with the block, so a
        searcher without ensure_blocks_many has nothing to do."""
        ensure = getattr(self.searcher, "ensure_blocks_many", None)
        if ensure is not None:
            ensure(items)

    def _merge_block(self, sq: SearchQuery, q: Query, block, count):
        """Array-carried merge → optics residual (reference combine_results
        :412-465). Signals may still be LAZY — the recall/page stages
        materialize them batched across queries."""
        from ..ranking.pipeline.block import CandidateBlock, merge_blocks

        ctx = q.context()
        merged = merge_blocks([block], NUM_PIPELINE_RANKING_RESULTS)

        # optics residual (boosts, content patterns, non-compilable discards):
        # needs retrieved fields, so this rare path bridges to objects
        if sq.optic:
            from ..optics import Optic

            _, residual = Optic.parse(sq.optic).compile_groups()
            if residual.rules or residual.host_rankings.blocked or residual.discard_non_matching:
                cands = merged.to_candidates()
                self.searcher.retrieve(sq, [c for c in cands if c.retrieved is None])
                kept = residual.apply(cands, self._optic_fields)
                mb = CandidateBlock.from_candidates(kept)
                mb.ctxs, mb.seg_names = merged.ctxs, merged.seg_names
                # keep the retrieved docs: the page cut re-materializes these
                # rows, and re-retrieving them would redo snippet generation
                mb.retrieved_map = {
                    (int(c.shard), int(c.pointer.segment), int(c.pointer.doc)): c.retrieved
                    for c in kept if c.retrieved is not None}
                merged = mb
        return ctx, merged, count

    def spell_correction(self, query: str):
        if self.spell_checker is None:
            return None
        return self.spell_checker.correct(query)

    def widget(self, query: str):
        if self.widgets is None:
            return None
        return self.widgets.widget(query)

    # reference searcher/api/stackoverflow.optic + sidebar.rs:109-157
    SO_SIDEBAR_OPTIC = (
        "DiscardNonMatching;\n"
        'Rule { Matches { Domain("stackoverflow.com"), Schema("QAPage"), '
        'Schema("acceptedAnswer") } }'
    )
    # reference defaults::Api::stackoverflow() = 0.5 on its normalized score
    # scale; our fused score (BM25 + static sums) sits far above 1 for any
    # weak match, so the gate here is on a [0,1]-normalized relevance: the
    # fraction of query terms present in the result's title
    SO_SIDEBAR_THRESHOLD = 0.5

    def sidebar_for(self, query: str):
        """Entity sidebar first, else a StackOverflow accepted-answer sidebar
        (reference sidebar.rs:158-173: entity above threshold wins, otherwise
        the stackoverflow-optic search's top result)."""
        if self.sidebar is not None:
            ent = self.sidebar.sidebar(query)
            if ent is not None:
                return ent
        return self.stackoverflow_sidebar(query)

    def stackoverflow_sidebar(self, query: str):
        """Search with the stackoverflow optic; top result above threshold →
        {type, title, answer} from its QAPage schema (sidebar.rs:109)."""
        from ..prettifier import _answer, _many, _one

        try:
            sq = SearchQuery(query=query, num_results=1, optic=self.SO_SIDEBAR_OPTIC)
            cands, count = self.searcher.search_initial(sq)
            # the optic's Schema(...) matchers are residual host filters —
            # _merge_candidates applies them (retrieving as needed)
            q = Query.parse(sq.query)
            _ctx, merged, _count = self._merge_candidates(sq, q, cands, count)
        except Exception:  # noqa: BLE001 — sidebar must never fail a search
            return None
        if not merged:
            return None
        top = merged[0]
        if top.signals is None:
            self._ensure_many([(sq, [top])])
        title_cov = (
            float(top.signals[S.TITLE_COVERAGE.id]) if top.signals is not None else 0.0
        )
        if title_cov < self.SO_SIDEBAR_THRESHOLD:
            return None
        if top.retrieved is None:
            self.searcher.retrieve(sq, [top])
        import json as _json

        raw = (top.retrieved or {}).get("stored", {}).get("schema_org_json", "")
        try:
            items = _json.loads(raw) if raw else []
        except ValueError:
            return None
        qa = next((it for it in items
                   if isinstance(it, dict) and "QAPage" in _many(it.get("@type"))), None)
        q = _one(qa.get("mainEntity")) if qa else None
        if not isinstance(q, dict):
            return None
        title = _one(q.get("name"))
        acc = _one(q.get("acceptedAnswer"))
        answer = _answer(acc, accepted=True) if acc is not None else None
        if not title or answer is None:
            return None
        return {"type": "stackOverflow", "title": str(title), "answer": answer}

    def search_websites_approx_offsets(self, sq: SearchQuery, q: Query) -> WebsitesResult:
        """Deep-paging bypass (reference api/mod.rs:503-552): per-shard offset
        skip (approximate — the reference applies the offset in each shard's
        collector), dedup merge, take num_results, retrieve. No recall or
        precision stages — don't spend ranking effort on a bot."""
        import numpy as np

        from ..ranking.pipeline.block import CandidateBlock, merge_blocks

        offset = min(sq.offset(), MAX_APPROX_CANDIDATES)
        mc = min(offset + sq.num_results + 1, MAX_APPROX_CANDIDATES)
        blocks_fn = getattr(self.searcher, "search_blocks_many", None)
        if blocks_fn is not None:
            block, count = blocks_fn([sq], max_candidates=mc)[0]
        else:
            cands, count = self.searcher.search_initial(sq)
            block = CandidateBlock.from_candidates(cands)

        # per-shard skip: rows arrive per-shard score-descending
        parts, has_more = [], False
        for sid in np.unique(block.shard):
            rows = np.nonzero(block.shard == sid)[0]
            parts.append(rows[offset : offset + sq.num_results + 1])
            has_more = has_more or len(rows) > offset + sq.num_results
        cut = block.take(np.concatenate(parts)) if parts else block
        merged = merge_blocks([cut], sq.num_results)
        page_block = merged.take(slice(0, sq.num_results))
        self._ensure_blocks([(sq, page_block)])
        page_block.fill_slop_signals()
        page = page_block.to_candidates()
        self.searcher.retrieve(sq, [c for c in page if c.retrieved is None])
        return self._serialize_page(sq, page, count, has_more)

    # -- website search flow (reference :554-642) -----------------------------------
    def search_websites(self, sq: SearchQuery, q: Query | None = None) -> WebsitesResult:
        q = q or Query.parse(sq.query, coefficients=sq.signal_coefficients,
                             selected_region=sq.selected_region)
        candidates, count = self.searcher.search_initial(sq)
        return self._finish(sq, q, candidates, count)

    def _finish(self, sq: SearchQuery, q: Query, candidates, count) -> WebsitesResult:
        """Single-query flow (tests, widgets) — same stages as search_phase2's
        batched path, batch of one."""
        ctx, merged, count = self._merge_candidates(sq, q, candidates, count)
        if self.pipeline.recall.has_scorers:
            self._ensure_many([(sq, merged)])
        merged = self.pipeline.rank_recall(ctx, merged)
        page, has_more = self._page_from_ranked(sq, merged)
        self._ensure_many([(sq, page)])
        if sq.page < MAX_PRECISION_PAGE:
            page = self.pipeline.rank_precision(ctx, page)
        return self._serialize_page(sq, page, count, has_more)

    def _merge_candidates(self, sq: SearchQuery, q: Query, candidates, count):
        """Merge → optics residual. Signals may still be LAZY — the recall/
        page stages materialize them batched across queries."""
        ctx = q.context()

        # combine_results: cross-shard merge with dedup (reference :412-465)
        collector = BucketCollector(NUM_PIPELINE_RANKING_RESULTS)
        collector.extend(candidates)
        merged = collector.into_sorted_vec()

        # optics: site/url/domain constraints were compiled into the shards'
        # device candidate plans (Query.parse → Optic.compile_groups); only the
        # residual (boosts, content patterns, non-compilable discards) runs as
        # a host post-filter over the merged candidates
        if sq.optic:
            from ..optics import Optic

            _, residual = Optic.parse(sq.optic).compile_groups()
            if residual.rules or residual.host_rankings.blocked or residual.discard_non_matching:
                self.searcher.retrieve(sq, [c for c in merged if c.retrieved is None])
                merged = residual.apply(merged, self._optic_fields)
        return ctx, merged, count

    def _page_from_ranked(self, sq: SearchQuery, merged: list):
        """Page select + retrieve stored docs/snippets for the final page."""
        offset = sq.offset()
        page = merged[offset : offset + sq.num_results]
        has_more = len(merged) > offset + sq.num_results
        self.searcher.retrieve(sq, [c for c in page if c.retrieved is None])
        return page, has_more

    def _serialize_page(self, sq: SearchQuery, page, count, has_more) -> WebsitesResult:
        from ..prettifier import rich_snippet

        webpages = []
        for c in page:
            w = dict(c.retrieved or {})
            rich = rich_snippet(w)
            if rich is not None:
                w["richSnippet"] = rich
            w.pop("stored", None)
            w["score"] = c.score
            if sq.return_ranking_signals:
                w["rankingSignals"] = {
                    s.name: float(c.signals[s.id]) for s in S.SIGNALS if c.signals[s.id] != 0
                }
            webpages.append(w)

        return WebsitesResult(webpages=webpages, num_hits=count.to_json(), has_more_results=has_more)

    @staticmethod
    def _optic_fields(c) -> dict:
        d = c.retrieved or {}
        return {
            "site": d.get("site", ""),
            "url": d.get("url", ""),
            "domain": d.get("domain", ""),
            "title": d.get("title", ""),
            "description": d.get("description", ""),
            "content": d.get("stored", {}).get("clean_text", d.get("snippet", "")),
            # schema.org JSON lives in the stored sub-dict (retrieve keeps the
            # response surface clean) — reading it from the top level left
            # Schema(...) optic matchers blind after retrieval
            "schema": d.get("stored", {}).get("schema_org_json", "")
            or d.get("schema_org_json", ""),
            "microformattag": "",
        }
