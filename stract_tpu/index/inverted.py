"""InvertedIndex — the local search engine core (role of reference
inverted_index/mod.rs:176 + search.rs:47,194).

Owns a set of immutable segments under <path>/segments/, uploads them to TPU
HBM lazily, and serves the two-phase protocol:

    search_initial(ctx, top_k)  → ranked (doc pointers, fused scores)   [device]
    compute_signals(ctx, ptrs)  → full signal matrix for candidates     [device]
    retrieve(ptrs, terms)       → stored docs + snippets                [host]

Like the reference, multi-segment indexes are searched per segment and merged;
`merge_all()` compacts to one segment (the serving layout).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import numpy as np

# Driver-mode cap: when the smallest required group's postings fit this budget
# the intersection is driven from it (exact, no L-prefix truncation); mirrors
# the reference's max_docs_considered semantics counted on *filtered* docs.
DRIVER_MAX = int(os.environ.get("STRACT_TPU_DRIVER_MAX", 4096))

from ..ops import scoring as O
from ..ranking import signals as S
from ..ranking.computer import QueryContext, build_slots, choose_L, uses_default_static
from .. import snippet as snippet_mod
from .device import DeviceSegment
from .merge import merge_segments
from .segment import Segment, SegmentBuilder


class DocPointer:
    """(segment ordinal, doc id) — the cross-phase doc handle."""

    __slots__ = ("segment", "doc")

    def __init__(self, segment: int, doc: int):
        self.segment = segment
        self.doc = doc

    def to_json(self):
        return {"segment": self.segment, "doc": self.doc}

    @classmethod
    def from_json(cls, d):
        return cls(d["segment"], d["doc"])

    def __repr__(self):
        return f"DocPointer({self.segment},{self.doc})"

    def __eq__(self, o):
        return (self.segment, self.doc) == (o.segment, o.doc)

    def __hash__(self):
        return hash((self.segment, self.doc))


class InvertedIndex:
    def __init__(self, path: str, embedding_dim: int = 0):
        self.path = path
        self.embedding_dim = embedding_dim
        os.makedirs(os.path.join(path, "segments"), exist_ok=True)
        self._meta_path = os.path.join(path, "index_meta.json")
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as fh:
                self.meta = json.load(fh)
        else:
            self.meta = {"segments": [], "embedding_dim": embedding_dim}
            self._save_meta()
        self.embedding_dim = self.meta.get("embedding_dim", embedding_dim)
        self.segments: list[Segment] = [
            Segment(os.path.join(path, "segments", name)) for name in self.meta["segments"]
        ]
        self._device: dict[int, DeviceSegment] = {}
        self._builder: SegmentBuilder | None = None

    # -- lifecycle ------------------------------------------------------------
    @classmethod
    def temporary(cls, embedding_dim: int = 0) -> "InvertedIndex":
        import tempfile

        return cls(tempfile.mkdtemp(prefix="sti-"), embedding_dim=embedding_dim)

    def _save_meta(self):
        with open(self._meta_path, "w") as fh:
            json.dump(self.meta, fh)

    @property
    def num_docs(self) -> int:
        return sum(s.num_docs for s in self.segments)

    # -- writing ----------------------------------------------------------------
    def insert(self, doc: dict) -> None:
        if self._builder is None:
            self._builder = SegmentBuilder(embedding_dim=self.embedding_dim)
        self._builder.add(doc)

    def commit(self) -> None:
        """Flush pending docs as a new segment."""
        if self._builder is None or len(self._builder) == 0:
            return
        name = f"seg-{uuid.uuid4().hex[:12]}"
        seg = self._builder.build(os.path.join(self.path, "segments", name))
        self.segments.append(seg)
        self.meta["segments"].append(name)
        self._save_meta()
        self._builder = None

    def merge_all(self) -> None:
        """Compact all segments into one (invalidates device caches and pointers)."""
        if len(self.segments) <= 1:
            return
        name = f"seg-{uuid.uuid4().hex[:12]}"
        merged = merge_segments(self.segments, os.path.join(self.path, "segments", name))
        for old in self.meta["segments"]:
            shutil.rmtree(os.path.join(self.path, "segments", old), ignore_errors=True)
        self.segments = [merged]
        self.meta["segments"] = [name]
        self._save_meta()
        self._device.clear()

    def merge_from(self, other: "InvertedIndex") -> None:
        """Adopt another index's segments (reference indexer merge-search path)."""
        for name in other.meta["segments"]:
            new_name = f"seg-{uuid.uuid4().hex[:12]}"
            shutil.copytree(
                os.path.join(other.path, "segments", name),
                os.path.join(self.path, "segments", new_name),
            )
            self.segments.append(Segment(os.path.join(self.path, "segments", new_name)))
            self.meta["segments"].append(new_name)
        self._save_meta()

    # -- device -------------------------------------------------------------------
    def device_segment(self, ord_: int) -> DeviceSegment:
        if ord_ not in self._device:
            self._device[ord_] = DeviceSegment(self.segments[ord_])
        return self._device[ord_]

    # -- index-level term stats -------------------------------------------------------
    def _df_lookup(self):
        """fn(hashes) → merged doc frequencies summed across ALL segments (role
        of tantivy Searcher::doc_freq) — None for the common 1-segment layout
        where per-segment df already is the index df."""
        if len(self.segments) <= 1:
            return None

        def merged(hashes: np.ndarray) -> np.ndarray:
            total = np.zeros(len(hashes), dtype=np.int64)
            for s in self.segments:
                _, lens = s.lookup_terms(hashes)
                total += np.asarray(lens, dtype=np.int64)
            return total

        return merged

    # -- driver-mode candidate generation ----------------------------------------------
    @staticmethod
    def _driver_docs(seg: Segment, q) -> np.ndarray | None:
        """If the smallest required group's postings fit DRIVER_MAX, return its
        doc ids (ascending = best-static-first) padded to a power-of-two bucket
        with the pad doc; else None (scan path)."""
        lens = np.asarray(q.lens, dtype=np.int64)
        starts = np.asarray(q.starts, dtype=np.int64)
        groups = np.asarray(q.group, dtype=np.int64)
        req = groups < O.MAX_GROUPS
        if not req.any():
            return None
        best_gid, best_size = None, None
        for gid in np.unique(groups[req]):
            size = int(lens[groups == gid].sum())
            if best_size is None or size < best_size:
                best_gid, best_size = gid, size
        if best_size == 0 or best_size > DRIVER_MAX:
            return None
        idxs = np.nonzero((groups == best_gid) & (lens > 0))[0]
        parts = [
            np.asarray(seg.postings_docs[starts[i] : starts[i] + lens[i]], dtype=np.int64)
            for i in idxs
        ]
        docs = parts[0] if len(parts) == 1 else np.unique(np.concatenate(parts))
        Kd = 128
        while Kd < len(docs):
            Kd *= 2
        out = np.full(Kd, seg.num_docs, dtype=np.int32)
        out[: len(docs)] = docs
        return out

    @staticmethod
    def _slot_factors_for(seg: Segment, q, cand: np.ndarray) -> np.ndarray:
        """Packed per-slot factors i32[P, len(cand)] for arbitrary candidate
        docs, by binary search over each slot's FULL posting range (mmap'd
        device-posting cache) — the host half of ops.scoring.score_driver."""
        from .device import build_device_postings

        pf = build_device_postings(seg)
        starts = np.asarray(q.starts, dtype=np.int64)
        lens = np.asarray(q.lens, dtype=np.int64)
        P = len(starts)
        out = np.zeros((P, len(cand)), dtype=np.int32)
        if len(pf) == 0:
            return out
        docs_all = pf[:, 0]
        facs = pf[:, 1]
        for p in range(P):
            l = int(lens[p])
            if l == 0:
                continue
            s = int(starts[p])
            dp = docs_all[s : s + l]
            pos = np.searchsorted(dp, cand)
            pos_c = np.minimum(pos, l - 1)
            found = dp[pos_c] == cand
            out[p, found] = facs[s + pos_c[found]]
        return out

    # -- region stats ---------------------------------------------------------------
    def region_scores(self) -> np.ndarray:
        """Corpus region frequencies (role of reference RegionCount, index.rs:30)."""
        counts = np.zeros(O.NUM_REGIONS, dtype=np.float64)
        for s in self.segments:
            reg = np.asarray(s.column("region"), dtype=np.int64)
            if len(reg):
                counts += np.bincount(reg.clip(0, O.NUM_REGIONS - 1), minlength=O.NUM_REGIONS)
        total = counts.sum()
        return (counts / total).astype(np.float32) if total else counts.astype(np.float32)

    # -- searching --------------------------------------------------------------------
    def search_initial(self, ctx: QueryContext, top_k: int = 1024):
        """Returns (pointers, scores) ranked by the fused core-signal score."""
        results = []
        region_scores = self.region_scores()
        total = self.num_docs
        dfl = self._df_lookup()
        default_static = uses_default_static(ctx)
        for ord_, seg in enumerate(self.segments):
            if seg.num_docs == 0:
                continue
            q, _aggs = build_slots(ctx, seg, total, region_scores, df_lookup=dfl)
            dev = self.device_segment(ord_)
            driver = self._driver_docs(seg, q)
            if driver is not None:
                import jax.numpy as jnp

                facs = self._slot_factors_for(seg, q, driver)
                docs, scores = O.score_driver(
                    dev.arrays, q, jnp.asarray(facs), jnp.asarray(driver), default_static
                )
            else:
                L = choose_L(np.asarray(q.lens))
                # fast path also requires non-negative text weights (optics can
                # downboost via custom coefficients → exact slow path)
                nonneg = (
                    float(np.asarray(q.w_bm25).min()) >= 0
                    and float(np.asarray(q.w_bm25f).min()) >= 0
                    and float(np.asarray(q.w_presence).min()) >= 0
                )
                fast = default_static and nonneg
                docs, scores = O.score_candidates(dev.arrays, q, L, O.DEFAULT_K, fast)
            docs = np.asarray(docs)
            scores = np.asarray(scores)
            valid = docs < seg.num_docs
            for d, sc in zip(docs[valid][:top_k], scores[valid][:top_k]):
                results.append((DocPointer(ord_, int(d)), float(sc)))
        results.sort(key=lambda x: -x[1])
        results = results[:top_k]
        return [p for p, _ in results], [s for _, s in results]

    def estimate_count(self, ctx: QueryContext) -> int:
        """Approximate total hits (role of collector/approx_count.rs
        Count::Approximate): AND queries are bounded by the smallest required
        group's doc frequency; OR-ish queries by the union bound."""
        from ..ranking.computer import build_slots as _bs

        total = 0
        for seg in self.segments:
            if seg.num_docs == 0:
                continue
            q, _ = _bs(ctx, seg, self.num_docs)
            lens = np.asarray(q.lens, dtype=np.int64)
            groups = np.asarray(q.group, dtype=np.int64)
            group_dfs = []
            for gid in np.unique(groups[groups < O.MAX_GROUPS]):
                group_dfs.append(int(lens[groups == gid].sum()))
            if group_dfs:
                total += min(min(group_dfs), seg.num_docs)
            else:
                total += min(int(lens[groups == O.OPTIONAL_GROUP].sum()), seg.num_docs)
        return total

    def search_initial_batch(self, ctxs: list, top_k: int = 1024) -> list:
        """Batched pass 1 for many queries (the shard server's micro-batcher):
        queries bucket by compiled shape (P, L, fast) and each bucket runs as
        ONE device program (score_candidates_batch) per segment. → list of
        (pointers, scores) aligned with ctxs."""
        import jax
        import jax.numpy as jnp

        region_scores = self.region_scores()
        total = self.num_docs
        dfl = self._df_lookup()
        per_query: list[list] = [[] for _ in ctxs]

        for ord_, seg in enumerate(self.segments):
            if seg.num_docs == 0:
                continue
            dev = self.device_segment(ord_)
            buckets: dict = {}
            for qi, ctx in enumerate(ctxs):
                q, _ = build_slots(ctx, seg, total, region_scores, df_lookup=dfl)
                driver = self._driver_docs(seg, q)
                if driver is not None:
                    import jax.numpy as jnp

                    facs = self._slot_factors_for(seg, q, driver)
                    docs, scores = O.score_driver(
                        dev.arrays, q, jnp.asarray(facs), jnp.asarray(driver),
                        uses_default_static(ctx),
                    )
                    docs, scores = np.asarray(docs), np.asarray(scores)
                    valid = docs < seg.num_docs
                    for d, sc in zip(docs[valid][:top_k], scores[valid][:top_k]):
                        per_query[qi].append((DocPointer(ord_, int(d)), float(sc)))
                    continue
                L = choose_L(np.asarray(q.lens))
                nonneg = (
                    float(np.asarray(q.w_bm25).min()) >= 0
                    and float(np.asarray(q.w_bm25f).min()) >= 0
                    and float(np.asarray(q.w_presence).min()) >= 0
                )
                fast = uses_default_static(ctx) and nonneg
                key = (q.starts.shape[0], L, fast)
                buckets.setdefault(key, []).append((qi, q))
            for (P, L, fast), items in buckets.items():
                if len(items) == 1:
                    qi, q = items[0]
                    docs, scores = O.score_candidates(dev.arrays, q, L, O.DEFAULT_K, fast)
                    batch = [(qi, np.asarray(docs), np.asarray(scores))]
                else:
                    qs = jax.tree.map(lambda *xs: jnp.stack(xs), *[q for _, q in items])
                    docs_b, scores_b = O.score_candidates_batch(dev.arrays, qs, L, O.DEFAULT_K, fast)
                    docs_b = np.asarray(docs_b)
                    scores_b = np.asarray(scores_b)
                    batch = [(qi, docs_b[j], scores_b[j]) for j, (qi, _) in enumerate(items)]
                for qi, docs, scores in batch:
                    valid = docs < seg.num_docs
                    for d, sc in zip(docs[valid][:top_k], scores[valid][:top_k]):
                        per_query[qi].append((DocPointer(ord_, int(d)), float(sc)))

        out = []
        for results in per_query:
            results.sort(key=lambda x: -x[1])
            results = results[:top_k]
            out.append(([p for p, _ in results], [s for _, s in results]))
        return out

    def compute_signals_batch_many(self, items: list) -> list:
        """Pass 2 for many queries at once: items = [(ctx, pointers)]. Queries
        bucket by (segment, P, L, K) and each bucket runs one
        compute_signals_batch program. → list of signal matrices."""
        import jax
        import jax.numpy as jnp

        region_scores = self.region_scores()
        total = self.num_docs
        dfl = self._df_lookup()
        out = [np.zeros((len(ptrs), S.NUM_SIGNALS), dtype=np.float32) for _, ptrs in items]

        # (qi, segment) work units
        buckets: dict = {}
        for qi, (ctx, pointers) in enumerate(items):
            by_seg: dict = {}
            for i, p in enumerate(pointers):
                by_seg.setdefault(p.segment, []).append(i)
            for ord_, idxs in by_seg.items():
                seg = self.segments[ord_]
                q, aggs = build_slots(ctx, seg, total, region_scores, df_lookup=dfl)
                K = 1
                while K < max(len(idxs), 1):
                    K *= 2
                K = max(K, 8)
                cand = np.full(K, seg.num_docs, dtype=np.int32)
                for j, i in enumerate(idxs):
                    cand[j] = items[qi][1][i].doc
                facs = self._slot_factors_for(seg, q, cand)
                key = (ord_, q.starts.shape[0], K)
                buckets.setdefault(key, []).append((qi, idxs, q, aggs, cand, facs))

        for (ord_, P, K), group in buckets.items():
            dev = self.device_segment(ord_)
            if len(group) == 1:
                qi, idxs, q, aggs, cand, facs = group[0]
                sig = np.asarray(O.compute_signals_from_factors(
                    dev.arrays, q, aggs, jnp.asarray(facs), jnp.asarray(cand)
                ))
                sigs = [(qi, idxs, sig)]
            else:
                qs = jax.tree.map(lambda *xs: jnp.stack(xs), *[g[2] for g in group])
                ags = jax.tree.map(lambda *xs: jnp.stack(xs), *[g[3] for g in group])
                cands = jnp.asarray(np.stack([g[4] for g in group]))
                facs_b = jnp.asarray(np.stack([g[5] for g in group]))
                sig_b = np.asarray(O.compute_signals_from_factors_batch(dev.arrays, qs, ags, facs_b, cands))
                sigs = [(g[0], g[1], sig_b[j]) for j, g in enumerate(group)]
            for qi, idxs, sig in sigs:
                for j, i in enumerate(idxs):
                    out[qi][i] = sig[:, j]
        return out

    def compute_signals(self, ctx: QueryContext, pointers: list) -> np.ndarray:
        """Full signal matrix f32[len(pointers), NUM_SIGNALS] (device pass 2)."""
        out = np.zeros((len(pointers), S.NUM_SIGNALS), dtype=np.float32)
        region_scores = self.region_scores()
        total = self.num_docs
        dfl = self._df_lookup()
        by_seg: dict[int, list[int]] = {}
        for i, p in enumerate(pointers):
            by_seg.setdefault(p.segment, []).append(i)
        for ord_, idxs in by_seg.items():
            seg = self.segments[ord_]
            q, aggs = build_slots(ctx, seg, total, region_scores, df_lookup=dfl)
            dev = self.device_segment(ord_)
            K = 1
            while K < max(len(idxs), 1):
                K *= 2
            cand = np.full(K, seg.num_docs, dtype=np.int32)
            for j, i in enumerate(idxs):
                cand[j] = pointers[i].doc
            import jax.numpy as jnp

            facs = self._slot_factors_for(seg, q, cand)
            sig = np.asarray(O.compute_signals_from_factors(
                dev.arrays, q, aggs, jnp.asarray(facs), jnp.asarray(cand)
            ))
            for j, i in enumerate(idxs):
                out[i] = sig[:, j]
        return out

    # -- phrase verification ------------------------------------------------------------
    def verify_phrase(self, pointer, words: list) -> bool:
        """Exact adjacency of `words` in any phrase-tracked field (role of
        tantivy phrase queries; positions recorded for title/clean_body)."""
        from ..index.segment import PHRASE_FIELDS
        from ..schema import text_field
        from ..utils.hashing import term_hash

        seg = self.segments[pointer.segment]
        for fname in PHRASE_FIELDS:
            fid = text_field(fname).id
            starts = seg.positions_for(term_hash(fid, words[0]), pointer.doc)
            if len(starts) == 0:
                continue
            ok = starts
            for k, w in enumerate(words[1:], start=1):
                pos_k = seg.positions_for(term_hash(fid, w), pointer.doc)
                if len(pos_k) == 0:
                    ok = ok[:0]
                    break
                ok = ok[np.isin(ok + k, pos_k)]
                if len(ok) == 0:
                    break
            if len(ok):
                return True
        return False

    def filter_phrases(self, pointers: list, phrases: list) -> list:
        """Indices of pointers satisfying every phrase."""
        if not phrases:
            return list(range(len(pointers)))
        return [
            i for i, p in enumerate(pointers)
            if all(self.verify_phrase(p, words) for words in phrases)
        ]

    # -- retrieval ---------------------------------------------------------------------
    def retrieve(self, pointers: list, query_terms: list | None = None) -> list:
        """Stored docs + snippets (role of inverted_index/search.rs:194)."""
        out = []
        for p in pointers:
            seg = self.segments[p.segment]
            stored = seg.stored_doc(p.doc)
            snip = snippet_mod.generate(query_terms or [], stored.get("clean_text", ""), stored.get("description", ""))
            out.append(
                {
                    "url": stored.get("url", ""),
                    "title": stored.get("title", ""),
                    "site": stored.get("site", ""),
                    "domain": stored.get("domain", ""),
                    "snippet": snip.text(),
                    "snippet_html": snip.html(),
                    "description": stored.get("description", ""),
                    "region": stored.get("region", 0),
                    "lang": stored.get("lang", "en"),
                    "stored": stored,
                }
            )
        return out

    # -- embeddings for the recall stage -----------------------------------------------
    def gather_embeddings(self, pointers: list, name: str) -> np.ndarray | None:
        dim = None
        for s in self.segments:
            d = s.meta["embedding_dims"].get(name)
            if d:
                dim = d
        if dim is None:
            return None
        out = np.zeros((len(pointers), dim), dtype=np.float32)
        for i, p in enumerate(pointers):
            mat = self.segments[p.segment].embeddings(name)
            if mat is not None:
                out[i] = mat[p.doc].astype(np.float32)
        return out
