"""LocalSearcher — one shard's full search logic (role of reference
searcher/local/mod.rs:46-140 LocalSearcher + InnerLocalSearcher).

Flow per query (reference call stack §3.1):
  Query.parse → optics attach → device search_initial (fused core signals) →
  device signal matrix for the shard's top candidates → host gathers of
  embeddings + dedup hash columns → RankedCandidates for the coordinator.
"""

from __future__ import annotations

import numpy as np

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
                 batcher=None, lazy_signals: bool = True, mesh=None):
        self.index = index
        self.shard_id = shard_id
        self.linear_model = linear_model
        self.batcher = batcher  # searcher/batcher.py QueryBatcher (shard servers)
        # multi-chip serving: with a >1-device mesh the index's segments are
        # distributed one-per-device and pass 1 runs the fused two-stage
        # sharded program (parallel/search.py MeshShardedSearcher) — the
        # document-partition parallelism of searcher/distributed.rs:341-404
        # mapped onto ICI instead of sonic
        self._sharded = None
        if mesh is not None and int(mesh.devices.size) > 1:
            from ..parallel.search import MeshShardedSearcher

            self._sharded = MeshShardedSearcher(index, mesh)
        # lazy: skip the pass-2 signal matrix at search time (the device has
        # already fused the core signals into the score; the ~6 MB/128-batch
        # matrix fetch crosses the ~30 MB/s tunnel direction) and materialize
        # on demand via materialize_signals. Shard SERVERS construct with
        # lazy_signals=False: their candidates serialize over sonic and the
        # batched pass 2 is cheaper than per-query materialization later.
        self.lazy_signals = lazy_signals and linear_model is None

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
        if self.batcher is not None:
            return self.batcher.search_initial(sq, max_candidates)
        return self.search_initial_many([sq], max_candidates)[0]

    def search_initial_many(self, sqs: list, max_candidates: int = NUM_PIPELINE_RANKING_RESULTS):
        """Compat wrapper over search_blocks_many → list of (candidates:
        list[RankedCandidate], count). Hot callers (coordinator, wire) use
        search_blocks_many — per-result object builds were the coordinator's
        top host cost (docs/perf_notes.md round 4)."""
        out = []
        for block, count in self.search_blocks_many(sqs, max_candidates):
            out.append((block.to_candidates(), count))
        return out

    def search_blocks_many(self, sqs: list, max_candidates: int = NUM_PIPELINE_RANKING_RESULTS):
        """Shard-side flow for a BATCH of queries — every device round trip is
        batched across the queries (pass 1, pass 2, and the host column /
        embedding gathers), and results stay ARRAY-carried (CandidateBlock):
        no per-result Python objects anywhere on this path.
        → list of (CandidateBlock, count) aligned with sqs."""
        from ..ranking.pipeline.block import CandidateBlock

        qs = [self.parse_query(sq) for sq in sqs]
        ctxs = [q.context() for q in qs]
        out: list = [None] * len(sqs)
        live = [i for i, q in enumerate(qs) if not q.is_empty()]
        for i, q in enumerate(qs):
            if q.is_empty():
                out[i] = (CandidateBlock.empty(), ApproxCount(0, True))
        if not live:
            return out

        # pass 1, one device program per compiled-shape bucket; with a mesh,
        # the fused sharded program replaces the per-segment host loop
        if self._sharded is not None:
            batch_res = []
            for ptrs, scores in self._sharded.search_batch(
                    [ctxs[i] for i in live], top_k=max_candidates):
                n = len(ptrs)
                batch_res.append((
                    np.fromiter((p.segment for p in ptrs), np.int32, n),
                    np.fromiter((p.doc for p in ptrs), np.int64, n),
                    np.asarray(scores, dtype=np.float32)))
        else:
            batch_res = self.index.search_arrays_batch(
                [ctxs[i] for i in live], top_k=max_candidates
            )

        # the search stamped every ctx with the segment-list snapshot its
        # ordinals index; all late resolution must use it, not index.segments
        snap = getattr(ctxs[live[0]], "_segments", None)
        seg_names = [s.name for s in snap] if snap is not None else None

        per_query: list = []
        counts: dict = {}
        for j, i in enumerate(live):
            segs_a, docs_a, scores_a = batch_res[j]
            if qs[i].phrases or getattr(qs[i], "field_phrases", None):
                keep = self.index.filter_phrases_arr(
                    segs_a, docs_a, qs[i].phrases, segments=snap,
                    field_phrases=getattr(qs[i], "field_phrases", None))
                segs_a, docs_a, scores_a = segs_a[keep], docs_a[keep], scores_a[keep]
            n_found = len(docs_a)
            if n_found >= max_candidates:
                counts[i] = ApproxCount(max(self.index.estimate_count(ctxs[i]), n_found), False)
            else:
                counts[i] = ApproxCount(n_found, True)
            per_query.append((i, segs_a, docs_a, scores_a))

        # pass 2, batched across queries (skipped in lazy mode — see __init__)
        if self.lazy_signals:
            sigs = [None] * len(per_query)
        else:
            sig_items = [(ctxs[i], segs_a, docs_a)
                         for i, segs_a, docs_a, _ in per_query]
            sigs = self.index.compute_signals_arrays_many(sig_items)

        # host gathers, ONE flat gather across all queries' rows
        flat_segs = np.concatenate([s for _, s, _, _ in per_query])
        flat_docs = np.concatenate([d for _, _, d, _ in per_query])
        t_emb = self.index.gather_embeddings_arr(
            flat_segs, flat_docs, "title_embeddings", segments=snap)
        k_emb = self.index.gather_embeddings_arr(
            flat_segs, flat_docs, "keyword_embeddings", segments=snap)
        cols = self.index.gather_columns_arr(
            flat_segs, flat_docs, DEDUP_COLUMNS + ["host_node_id"], segments=snap)

        off = 0
        for (i, segs_a, docs_a, scores_a), sig in zip(per_query, sigs):
            n = len(docs_a)
            sl = slice(off, off + n)
            off += n
            slop_cols = self._slop_columns(ctxs[i], segs_a, docs_a, snap)
            scores64 = scores_a.astype(np.float32, copy=False)
            if self.linear_model is not None and n:
                scores64 = scores64 + np.asarray(
                    self.linear_model.predict(sig), dtype=np.float32)
            block = CandidateBlock(
                shard=np.full(n, self.shard_id, dtype=np.int32),
                segment=segs_a.astype(np.int32, copy=False),
                doc=docs_a.astype(np.int64, copy=False),
                score=scores64,
                dedup={name: cols[name][sl] for name in DEDUP_COLUMNS},
                host_id=cols["host_node_id"][sl],
                signals=sig,
                title_emb=t_emb[sl] if t_emb is not None else None,
                keyword_emb=k_emb[sl] if k_emb is not None else None,
                # carry the search-time ctx per shard: lazy materialization
                # reuses its per-request caches (slot trees, stage-B factor
                # columns), and retrieve/wire serialization use its segment
                # snapshot to stay stable across a concurrent compact/prune
                ctxs={self.shard_id: ctxs[i]},
            )
            if seg_names is not None:
                block.seg_names = {self.shard_id: seg_names}
            if slop_cols is not None:
                block.cols.update(slop_cols)
            out[i] = (block, counts[i])
        return out

    def _slop_columns(self, ctx, seg_arr, doc_arr, snap) -> dict | None:
        """Recall-stage term-distance values from STORED POSITIONS for every
        candidate (role of reference stages/recall.rs:311-312 TitleDistance/
        BodyDistanceScorer over all ~300 recall candidates — proximity can
        change WHICH docs reach the page). → {'title_slop', 'body_slop'}
        f64[N] columns, or None when disabled."""
        import os

        if os.environ.get("STRACT_TPU_RECALL_SLOP", "1") in ("0", "off"):
            return None
        from ..ranking.term_distance import SLOP_MAX, min_slop_block
        from ..schema import text_field
        from ..tokenizer import get_tokenizer
        from ..utils.hashing import term_hash

        n = len(doc_arr)
        terms = getattr(ctx, "simple_terms", None) or []
        tokens = (get_tokenizer("default").tokenize(" ".join(terms))
                  if len(terms) >= 2 else [])
        out = {"title_slop": np.full(n, SLOP_MAX), "body_slop": np.full(n, SLOP_MAX)}
        if len(tokens) < 2 or n == 0:
            return out  # reference: <2 windows → u32::MAX slop (score ≈ 0)
        segs = snap if snap is not None else self.index.segments
        for name, fname in (("title_slop", "title"), ("body_slop", "clean_body")):
            fid = text_field(fname).id
            for ord_ in np.unique(seg_arr):
                rows = np.nonzero(seg_arr == ord_)[0]
                out[name][rows] = min_slop_block(
                    segs[int(ord_)], fid, tokens, doc_arr[rows], term_hash)
        return out

    def materialize_signals(self, sq: SearchQuery, candidates: list) -> None:
        """Fill `signals` for lazily-built candidates (device pass 2 over just
        these pointers — the final page / active-scorer set, not the full
        top-300)."""
        self.materialize_signals_many([(sq, candidates)])

    def materialize_signals_many(self, items: list) -> None:
        """Batched variant: items = [(sq, candidates)]; one
        compute_signals_batch_many device pass across all queries."""
        todo = []
        for sq, candidates in items:
            cands = [c for c in candidates if c.signals is None]
            if cands:
                # reuse the SEARCH-time ctx when the candidates carry it: its
                # per-request caches (slot trees, stage-B factor columns) turn
                # the pass-2 factor fill into a gather instead of fresh
                # full-range binary searches
                ctx = getattr(cands[0], "_ctx", None)
                if ctx is None:
                    ctx = self.parse_query(sq).context()
                todo.append((ctx, cands))
        if not todo:
            return
        sigs = self.index.compute_signals_batch_many(
            [(ctx, [c.pointer for c in cands]) for ctx, cands in todo])
        for (ctx, cands), sig in zip(todo, sigs):
            for i, c in enumerate(cands):
                c.signals = sig[i]

    def _build_candidates(self, ptrs: list, scores, sig, t_emb, k_emb, cols) -> list:
        scores = np.asarray(scores, dtype=np.float64)
        if self.linear_model is not None and len(ptrs):
            scores = scores + np.asarray(self.linear_model.predict(sig), dtype=np.float64)
        host_ids = cols["host_node_id"]
        return [
            RankedCandidate(
                shard=self.shard_id,
                pointer=p,
                score=float(scores[i]),
                signals=sig[i] if sig is not None else None,
                title_embedding=t_emb[i] if t_emb is not None else None,
                keyword_embedding=k_emb[i] if k_emb is not None else None,
                dedup={name: int(cols[name][i]) for name in DEDUP_COLUMNS},
                host_id=int(host_ids[i]),
            )
            for i, p in enumerate(ptrs)
        ]

    def retrieve(self, sq: SearchQuery, pointers: list, segments: list | None = None) -> list:
        q = self.parse_query(sq)
        return self.index.retrieve(pointers, q.simple_terms, segments=segments)

    def search(self, sq: SearchQuery) -> dict:
        """Single-shard end-to-end search (no coordinator pipeline) — used by
        tests and the dev server."""
        candidates, count = self.search_initial(sq)
        page = candidates[sq.offset() : sq.offset() + sq.num_results]
        snap = getattr(getattr(page[0], "_ctx", None), "_segments", None) if page else None
        docs = self.retrieve(sq, [c.pointer for c in page], segments=snap)
        for c, d in zip(page, docs):
            c.retrieved = d
        return {
            "webpages": [
                {**(c.retrieved or {}), "score": c.score, "shard": c.shard}
                for c in page
            ],
            "num_hits": count.to_json(),
        }
