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

# bm25f tf-factor bound: f2 = g(cf*t) <= max(cf, 1) * g(t) = max(cf, 1) * f1
# (g concave through 0 => subadditive), used by the UB scoring bound
_CF_MAX = max(1.0, max(S.BM25F_FIELD_COEFFS.values()))

# stage-A unseen-contribution estimate scale (see _augment_with_impact).
# Default 0 — measured on the 10M bench corpus (hardware TPU, C=2048):
# λ=0 → ndcg@10 0.9801, λ=0.5 → 0.9646, λ=1.0 → 0.9578. The optimistic
# bound inflates docs with many low-visibility slots, crowding true top docs
# out of the fixed top-C cut; seen-only scoring + the soft-required bonus
# orders candidates better at this operating point. Knob kept for corpora
# where deep-posting contributions actually dominate.
UB_LAMBDA = float(os.environ.get("STRACT_TPU_UB_LAMBDA", 0.0))

# stage-B factor matrices joined ON DEVICE (ops.scoring.factors_join binary
# search) instead of host searchsorted + a [B, P, Kd] i32 upload per batch.
DEVICE_JOIN = os.environ.get("STRACT_TPU_DEVICE_JOIN", "0") == "1"

# FUSED stage-B verify + pass-2: the verify dispatch also returns the q16
# signal matrix for each query's top FUSED_SIG_K docs, so the coordinator
# tail's page materialization is a host cache lookup instead of a second
# device round trip with a factor re-upload (~25 ms dispatch + htod through
# the tunnel per batch). Default is PLATFORM-AWARE (None → on for
# accelerators, off for XLA-CPU: with no round trips to save, the extra
# signal compute measured a straight 184→259 ms/32-batch regression on CPU);
# STRACT_TPU_FUSED_SIGNALS=0/1 forces it.
FUSED_SIGNALS = os.environ.get("STRACT_TPU_FUSED_SIGNALS")  # None → by platform
FUSED_SIG_K = int(os.environ.get("STRACT_TPU_FUSED_SIG_K", "64"))


def _fused_enabled() -> bool:
    if FUSED_SIGNALS is None:
        import jax

        return jax.default_backend() != "cpu"
    return FUSED_SIGNALS in (True, 1, "1")



def _term_in_doc(seg, term_h: int, doc_id: int) -> bool:
    """Does the term's posting list contain doc_id? (presence fallback for
    field-scoped phrase checks against pre-positions segments)"""
    starts, lens = seg.lookup_terms(np.array([term_h], dtype=np.uint64))
    s, l = int(starts[0]), int(lens[0])
    if l == 0:
        return False
    docs = seg.postings_docs[s : s + l]
    idx = int(np.searchsorted(docs, doc_id))
    return idx < l and int(docs[idx]) == doc_id


def _qshape(n: int, steps=(128, 512, 2048, 4096)) -> int:
    """Quantize a unified batch dimension to a tiny fixed menu — every distinct
    compiled shape costs seconds of XLA compile through the TPU tunnel, so
    batch-dependent max dims must not leak into jit shapes. Values above the
    menu round up to the next power of two (never clamp: a wildcard optic can
    legitimately expand past the largest step)."""
    for s in steps:
        if n <= s:
            return s
    b = steps[-1]
    while b < n:
        b *= 2
    return b

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
        # atomic replace: a crash mid-write must never corrupt the segment
        # manifest (the reference gets this from tantivy's meta.json protocol)
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self.meta, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._meta_path)

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
        return self.device_segment_for(self.segments[ord_])

    def device_segment_for(self, seg: Segment) -> DeviceSegment:
        """Device arrays keyed by segment IDENTITY, not ordinal: maintenance
        (live-index prune/compact, merge_all) REBINDS self.segments, so a
        search that snapshotted the old list keeps getting the device arrays
        of the segments it is iterating — ordinal keys would silently remap
        to different segments mid-search."""
        key = id(seg)
        dev = self._device.get(key)
        if dev is None:
            dev = self._device[key] = DeviceSegment(seg)
        return dev

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

    # -- per-request caches ---------------------------------------------------------------
    def _slots_for(self, ctx, ord_: int, seg, total, region_scores, dfl):
        """build_slots memoized on the ctx object: pass 1 and pass 2 run over
        the same parsed query within one request, and slot construction costs
        ~2ms of term hashing + field expansion per (query, segment)."""
        cache = ctx.__dict__.setdefault("_slots_cache", {})
        key = (ord_, id(seg))  # a merge replaces the segment behind an ordinal
        if key not in cache:
            cache[key] = build_slots(ctx, seg, total, region_scores, df_lookup=dfl)
        return cache[key]

    @staticmethod
    def _cache_stageb_factors(ctx, ord_: int, seg, cand: np.ndarray, facs: np.ndarray):
        """Remember the verify stage's full-range factor columns: pass 2
        re-scores a SUBSET of these (query, doc) pairs, so its factor matrix is
        a column gather instead of fresh binary searches over the posting
        memmap."""
        order = np.argsort(cand, kind="stable")
        ctx.__dict__.setdefault("_p1_factors", {})[(ord_, id(seg))] = (
            cand[order], order, facs)

    @staticmethod
    def _cache_fused_signals(ctx, ord_: int, seg, docs: np.ndarray, sig: np.ndarray):
        """Remember the fused verify+signals result: sig f32[NUM_SIGNALS, sig_k]
        columns aligned with docs[:sig_k] (stage-B rank order). The coordinator
        tail's page materialization resolves against this before paying a
        device round trip. Stored sorted-by-doc so fills are one vectorized
        searchsorted instead of a per-row dict probe."""
        k = sig.shape[-1]
        d = np.asarray(docs[:k], dtype=np.int64)
        valid = d < seg.num_docs
        cols = np.nonzero(valid)[0]
        dv = d[valid]
        order = np.argsort(dv, kind="stable")
        ctx.__dict__.setdefault("_fused_sigs", {})[(ord_, id(seg))] = (
            dv[order], cols[order], sig)

    @staticmethod
    def _fused_signal_fill(ctx, segs, pointers, out: np.ndarray) -> bool:
        """Pointer-list compat wrapper over _fused_signal_fill_arr."""
        if not pointers:
            return False
        seg_arr = np.fromiter((p.segment for p in pointers), dtype=np.int64,
                              count=len(pointers))
        doc_arr = np.fromiter((p.doc for p in pointers), dtype=np.int64,
                              count=len(pointers))
        return InvertedIndex._fused_signal_fill_arr(ctx, segs, seg_arr, doc_arr, out)

    @staticmethod
    def _fused_signal_fill_arr(ctx, segs, seg_arr: np.ndarray, doc_arr: np.ndarray,
                               out: np.ndarray) -> bool:
        """Fill out[i] = signal row for (seg_arr[i], doc_arr[i]) from the fused
        stage-B cache, vectorized (one searchsorted per touched segment).
        All-or-nothing per query: False on any miss (docs past sig_k, e.g.
        deep dedup slack or an eager top-300 materialization)."""
        cache = ctx.__dict__.get("_fused_sigs")
        if not cache or len(seg_arr) == 0:
            return False
        for ord_ in np.unique(seg_arr):
            ent = cache.get((int(ord_), id(segs[int(ord_)])))
            if ent is None:
                return False
            docs_sorted, cols, sig = ent
            rows = np.nonzero(seg_arr == ord_)[0]
            want = doc_arr[rows]
            if len(docs_sorted) == 0:
                return False
            pos = np.searchsorted(docs_sorted, want)
            pos_c = np.minimum(pos, len(docs_sorted) - 1)
            if not (docs_sorted[pos_c] == want).all():
                return False
            out[rows] = sig[:, cols[pos_c]].T
        return True

    @staticmethod
    def _cached_factor_fill(ctx, ord_: int, seg, cand: np.ndarray, n_real: int,
                            out: np.ndarray) -> bool:
        """Fill out[:, :len(cand)] from the stage-B cache; False on miss (docs
        outside the cached candidate set, e.g. a non-search caller)."""
        hit = ctx.__dict__.get("_p1_factors", {}).get((ord_, id(seg)))
        if hit is None or n_real == 0:
            return hit is not None and n_real == 0
        cand_sorted, order, facs_src = hit
        want = cand[:n_real]
        pos = np.searchsorted(cand_sorted, want)
        pos_c = np.minimum(pos, len(cand_sorted) - 1)
        if not (cand_sorted[pos_c] == want).all():
            return False
        cols = order[pos_c]
        # P buckets may differ between the passes; rows past the real kept
        # slot count are zero on both sides, so the smaller P wins
        Pc = min(facs_src.shape[0], out.shape[0])
        out[:Pc, :n_real] = facs_src[:Pc, cols]
        out[Pc:, :] = 0
        out[:Pc, n_real:] = 0
        return True

    # -- slot compaction -----------------------------------------------------------------
    @staticmethod
    def _compact_slots(q, aggs=None, min_p: int = 8):
        """Drop zero-length slots and shrink the P bucket — the driver and
        pass-2 paths upload per-slot factor matrices, and padded slots multiply
        the host→device bytes 4-8x for nothing (zero-len slots contribute no
        score and no group presence either way). → (q', aggs') (aggs' None when
        aggs is None)."""
        lens = np.asarray(q.lens)
        keep = np.nonzero(lens > 0)[0]
        P = min_p
        while P < len(keep):
            P *= 2
        idx = np.zeros(P, dtype=np.int64)
        idx[: len(keep)] = keep
        mask = np.zeros(P, dtype=bool)
        mask[: len(keep)] = True
        q2 = q._replace(
            starts=np.where(mask, q.starts[idx], 0).astype(np.int32),
            lens=np.where(mask, lens[idx], 0).astype(np.int32),
            group=np.where(mask, q.group[idx], O.OPTIONAL_GROUP).astype(np.int32),
            idf=np.where(mask, q.idf[idx], 0).astype(np.float32),
            w_bm25=np.where(mask, q.w_bm25[idx], 0).astype(np.float32),
            w_bm25f=np.where(mask, q.w_bm25f[idx], 0).astype(np.float32),
            w_presence=np.where(mask, q.w_presence[idx], 0).astype(np.float32),
        )
        if aggs is None:
            return q2, None
        m = mask[None, :]
        aggs2 = aggs._replace(
            agg_bm25=np.where(m, aggs.agg_bm25[:, idx], 0),
            agg_bm25f=np.where(m, aggs.agg_bm25f[:, idx], 0),
            agg_idf=np.where(m, aggs.agg_idf[:, idx], 0),
            agg_cov=np.where(m, aggs.agg_cov[:, idx], 0),
        )
        return q2, aggs2

    # -- impact-prefix augmentation (block-max/WAND role) -------------------------------
    @staticmethod
    def _augment_with_impact(seg: Segment, dev, q, L_q: int | None = None):
        """Fill the query's EMPTY slot positions with the impact-prefix ranges
        of its long posting lists (index/device.py build_impact_prefixes): the
        candidate scan then covers best-static docs AND best-text docs per
        slot. Prefixes are disjoint by construction, so contributions sum
        correctly.

        → (q', ub_entry f32[P], ub_total float): the per-slot remaining-
        contribution UPPER BOUND for entries NOT visible to the L_q-prefix
        scan (the block-max role): slots fully covered bound to 0; slots with
        an impact prefix bound by the prefix's min tf-factor (everything
        outside has a smaller one); other truncated slots bound by the max
        possible tf-factor. The scan kernel scores candidates as
        score_seen + Σ_unseen-slots ub — an optimistic estimate that stops
        the top-C cut from dropping docs whose contributions sit deep."""
        from .device import IMPACT_L

        lens = np.asarray(q.lens)
        starts = np.asarray(q.starts)
        groups = np.asarray(q.group)
        w1 = np.asarray(q.w_bm25)
        w2 = np.asarray(q.w_bm25f)
        wp = np.asarray(q.w_presence)
        P = len(lens)
        if L_q is None:
            L_q = O.DEFAULT_L

        # per-slot impact info (term index found by start offset)
        t_starts = np.asarray(seg.term_starts, dtype=np.int64)
        imp = {}  # slot i -> (device start, len, term index)
        big = np.nonzero(lens > IMPACT_L)[0]
        if len(dev.impact_lens):
            for i in big:
                ti = int(np.searchsorted(t_starts, starts[i]))
                if ti < len(t_starts) and int(t_starts[ti]) == int(starts[i]) \
                        and dev.impact_lens[ti] > 0:
                    imp[int(i)] = (int(dev.impact_starts[ti]), int(dev.impact_lens[ti]), ti)

        # attachment feasibility decides the bound depth: attached prefixes are
        # scanned L_q deep (bound = prefix row min(L_q, len)-1); unattached
        # prefixes are invisible (bound = prefix row 0, the tail max)
        extras = [(i, s, l) for i, (s, l, _) in imp.items()]
        free = list(np.nonzero(lens == 0)[0])
        attached = bool(extras) and len(free) >= len(extras)

        # remaining-contribution upper bound per ORIGINAL slot, scaled by
        # UB_LAMBDA: 1.0 = true optimistic bound (WAND), 0.0 = pessimistic
        # seen-only scoring; between = midpoint estimate. Folded here so the
        # kernel is λ-free.
        deq = 1.0 / O.FACTOR_SCALE
        ub = np.zeros(P, dtype=np.float32)
        truncated = np.nonzero((lens > L_q) & (groups != O.EXCLUDED_GROUP))[0]
        for i in truncated:
            i = int(i)
            if i in imp:
                f1c = dev.impact_bound_f1(imp[i][2], L_q if attached else 0)
            else:
                f1c = 65535.0
            f2c = min(65535.0, f1c * _CF_MAX)
            ub[i] = (
                max(0.0, float(w1[i])) * f1c * deq
                + max(0.0, float(w2[i])) * f2c * deq
                + max(0.0, float(wp[i]))
            )
        ub *= UB_LAMBDA
        ub_total = float(ub.sum())

        if not attached:
            return q, ub, ub_total
        starts2 = starts.copy()
        lens2 = lens.copy()
        group2 = groups.copy()
        idf2 = np.asarray(q.idf).copy()
        w1 = w1.copy()
        w2 = w2.copy()
        wp = wp.copy()
        ub = ub.copy()
        for (src_i, ist, iln), dst in zip(extras, free):
            starts2[dst] = ist
            lens2[dst] = iln
            group2[dst] = group2[src_i]
            idf2[dst] = idf2[src_i]
            w1[dst] = w1[src_i]
            w2[dst] = w2[src_i]
            wp[dst] = wp[src_i]
            # a doc seen in EITHER prefix of the pair is "seen" for this term:
            # both slots carry the same subtract-on-seen bound (they are
            # doc-disjoint, so a doc never subtracts it twice)
            ub[dst] = ub[src_i]
        q2 = q._replace(starts=starts2, lens=lens2, group=group2, idf=idf2,
                        w_bm25=w1, w_bm25f=w2, w_presence=wp)
        return q2, ub, ub_total

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
        # Kd from a quantized menu (1024 included so driver lists share verify
        # programs with the SCAN_C=1024 scan bucket): power-of-two buckets made
        # 6 distinct verify programs per (P, ds) and fragmented the micro-batch
        # into tiny per-shape batches
        Kd = _qshape(len(docs), (128, 512, 1024, 4096))
        out = np.full(Kd, seg.num_docs, dtype=np.int32)
        out[: len(docs)] = docs
        return out

    @staticmethod
    def _slot_factors_for(seg: Segment, q, cand: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
        """Packed per-slot factors i32[P, len(cand)] for arbitrary candidate
        docs, by binary search over each slot's FULL posting range (mmap'd
        device-posting cache) — the host half of ops.scoring.score_driver.
        `out` lets batch callers write straight into a preallocated batch
        tensor (this host's memory bandwidth makes extra copies expensive)."""
        from .device import build_device_postings

        pf = build_device_postings(seg)
        starts = np.asarray(q.starts, dtype=np.int64)
        lens = np.asarray(q.lens, dtype=np.int64)
        P = len(starts)
        if out is None:
            out = np.zeros((P, len(cand)), dtype=np.int32)
        else:
            out = out[:P, : len(cand)]
            out[:] = 0
        if len(pf) == 0:
            return out
        # native fast path: sorted-candidate gallop search in C++ (~3-4x the
        # numpy per-slot searchsorted below at serving shapes)
        from .. import native

        if native.slot_factors(pf, starts, lens, np.ascontiguousarray(cand), out):
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
        """Corpus region frequencies (role of reference RegionCount, index.rs:30).
        Cached: segments are immutable and the scan is O(total docs)."""
        cached = getattr(self, "_region_scores", None)
        if cached is not None and cached[0] == len(self.segments):
            return cached[1]
        counts = np.zeros(O.NUM_REGIONS, dtype=np.float64)
        for s in self.segments:
            reg = np.asarray(s.column("region"), dtype=np.int64)
            if len(reg):
                counts += np.bincount(reg.clip(0, O.NUM_REGIONS - 1), minlength=O.NUM_REGIONS)
        total = counts.sum()
        out = (counts / total).astype(np.float32) if total else counts.astype(np.float32)
        self._region_scores = (len(self.segments), out)
        return out

    # -- searching --------------------------------------------------------------------
    def search_initial(self, ctx: QueryContext, top_k: int = 1024):
        """Returns (pointers, scores) ranked by the fused core-signal score.
        Same two-stage flow as the batch path: optimistic candidates (driver
        group OR relaxed impact+static prefix scan), then the EXACT verify
        kernel over full posting ranges."""
        results = []
        region_scores = self.region_scores()
        total = self.num_docs
        dfl = self._df_lookup()
        default_static = uses_default_static(ctx)
        K_out = _qshape(top_k, (512, O.DEFAULT_K))
        segments = self.segments  # snapshot: maintenance rebinds, never mutates
        ctx._segments = segments  # DocPointer ordinals index THIS snapshot
        for ord_, seg in enumerate(segments):
            if seg.num_docs == 0:
                continue
            q, _aggs = self._slots_for(ctx, ord_, seg, total, region_scores, dfl)
            dev = self.device_segment_for(seg)
            cand = self._driver_docs(seg, q)
            if cand is None:
                # stage A: optimistic candidate scan (soft-required booleans:
                # full matches outrank partials via SOFT_REQUIRED_BONUS)
                L = choose_L(np.asarray(q.lens))
                nonneg = (
                    float(np.asarray(q.w_bm25).min()) >= 0
                    and float(np.asarray(q.w_bm25f).min()) >= 0
                    and float(np.asarray(q.w_presence).min()) >= 0
                )
                fast = default_static and nonneg
                qa, ub, ub_total = self._augment_with_impact(seg, dev, q, L)
                C = _qshape(max(self.SCAN_CANDIDATES, top_k), (1024, 2048, 4096))
                ubkw = (
                    dict(ub_entry=ub, ub_total=np.float32(ub_total))
                    if UB_LAMBDA > 0 else {}
                )
                cand, _ = O.score_candidates(
                    dev.arrays, qa, L, C, fast, soft_required=True, **ubkw)
                cand = np.asarray(cand)
                if self.VERIFY_C:
                    vs = _qshape(max(self.VERIFY_C, top_k), (1024, 2048, 4096))
                    if len(cand) > vs:
                        cand = cand[:vs]
            # stage B: exact verify
            qc, _ = self._compact_slots(q, min_p=16)
            if DEVICE_JOIN:
                docs, scores = O.score_driver_joined(
                    dev.arrays, qc, cand, default_static, K_out)
            else:
                facs = self._slot_factors_for(seg, qc, cand)
                self._cache_stageb_factors(ctx, ord_, seg, cand, facs)
                docs, scores = O.score_driver(dev.arrays, qc, facs, cand, default_static, K_out)
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

    # stage-A candidate budget for the two-stage scan path. Default 4096:
    # measured at D=10M (hardware v5e) ndcg@10 = 0.9970 vs 0.9785 at 2048
    # and 0.9301 at 1024; shard-level batch-128 qps 86 vs 109 vs ~112 — the
    # BASELINE comparison is "QPS at NDCG@10 parity", so near-exact quality
    # buys more than the ~20% throughput the smaller budget returns.
    SCAN_CANDIDATES = int(os.environ.get("STRACT_TPU_SCAN_C", 4096))
    # stage-B verify budget: only the top VERIFY_C of stage A's (soft-required-
    # ordered) candidates are exactly rescored — halving it halves the factor
    # upload + host searchsorted + device verify cost. 0 = verify all of C.
    VERIFY_C = int(os.environ.get("STRACT_TPU_VERIFY_C", 0))

    def search_initial_batch(self, ctxs: list, top_k: int = 1024) -> list:
        """Compat wrapper over search_arrays_batch: → list of (pointers,
        scores) with per-result DocPointer objects. Hot callers use
        search_arrays_batch directly — the object build is ~0.5 ms/query at
        32-batch (measured, docs/perf_notes.md round 4)."""
        out = []
        for segs, docs, scores in self.search_arrays_batch(ctxs, top_k):
            out.append(([DocPointer(int(s), int(d)) for s, d in zip(segs, docs)],
                        [float(x) for x in scores]))
        return out

    def search_arrays_batch(self, ctxs: list, top_k: int = 1024) -> list:
        """Batched pass 1 for many queries (the shard server's micro-batcher).

        Two modes per query, both ending in the EXACT verify kernel
        (ops.score_driver — full-range factors, exact booleans):

          driver: the smallest required group fits DRIVER_MAX → its postings
                  ARE the candidates (exact, reference rarest-term semantics);
          scan:   stage A generates candidates optimistically — union of
                  static-ordered AND impact-ordered prefixes per slot, boolean
                  groups relaxed to SHOULD — then stage B rescores the top
                  SCAN_CANDIDATES docs exactly. Prefix-limited AND checks used
                  to silently drop deep intersections (ndcg@10 0.70 → ~exact).

        Every device program shape (B, P, L, Kd) is quantized; → list of
        (segs i32[N], docs i32[N], scores f32[N]) aligned with ctxs — ARRAYS,
        not per-result objects: results stay array-carried through the shard
        gathers, cross-shard merge, and recall stage (reference
        combine_results searcher/api/mod.rs:412-465's role), and only the
        final page materializes Python objects."""
        import jax

        region_scores = self.region_scores()
        total = self.num_docs
        dfl = self._df_lookup()
        per_query: list[list] = [[] for _ in ctxs]
        # fetch only as many results as the caller keeps (device→host bytes)
        K_out = _qshape(top_k, (512, O.DEFAULT_K))

        segments = self.segments  # snapshot: maintenance rebinds, never mutates
        for ctx in ctxs:
            # DocPointer.segment ordinals index THIS snapshot; stamp it on the
            # ctx so late consumers (lazy pass-2 in the coordinator tail) never
            # resolve ordinals against a rebound self.segments — a prune or
            # compact in between would silently remap them
            ctx._segments = segments
        for ord_, seg in enumerate(segments):
            if seg.num_docs == 0:
                continue
            dev = self.device_segment_for(seg)
            scan_items: list = []
            verify_buckets: dict = {}

            fused = _fused_enabled() and not DEVICE_JOIN

            def add_verify(qi, q, aggs, cand, ds):
                qc, ac = self._compact_slots(q, aggs if fused else None, min_p=16)
                key = (qc.starts.shape[0], len(cand), ds)
                verify_buckets.setdefault(key, []).append((qi, qc, ac, cand))

            for qi, ctx in enumerate(ctxs):
                q, aggs = self._slots_for(ctx, ord_, seg, total, region_scores, dfl)
                ds = uses_default_static(ctx)
                driver = self._driver_docs(seg, q)
                if driver is not None:
                    add_verify(qi, q, aggs, driver, ds)
                    continue
                L = choose_L(np.asarray(q.lens))
                nonneg = (
                    float(np.asarray(q.w_bm25).min()) >= 0
                    and float(np.asarray(q.w_bm25f).min()) >= 0
                    and float(np.asarray(q.w_presence).min()) >= 0
                )
                scan_items.append((qi, q, aggs, L, ds and nonneg, ds))

            # ---- stage A: optimistic candidate scan --------------------------------
            buckets: dict = {}
            if scan_items:
                maxL = _qshape(max(L for _, _, _, L, _, _ in scan_items), (128, O.DEFAULT_L))
                for qi, q, aggs, _, fast, ds in scan_items:
                    # UB visibility uses the KERNEL's L (the batch maxL), not the
                    # per-query choose_L: slots with len <= maxL are fully
                    # scanned, so their remaining bound is exactly 0
                    qa, ub, ubt = self._augment_with_impact(seg, dev, q, maxL)
                    buckets.setdefault((qa.starts.shape[0], maxL, fast), []).append(
                        (qi, q, aggs, qa, ds, ub, ubt))
            C = _qshape(max(self.SCAN_CANDIDATES, top_k), (1024, 2048, 4096))
            # dispatch every stage-A bucket before fetching any result: JAX
            # dispatch is async, so the device pipelines bucket k+1's scan
            # behind bucket k's while the host waits on the first fetch
            pending = []
            for (P, L, fast), items in buckets.items():
                if len(items) == 1:
                    qi, q, aggs, qa, ds, ub, ubt = items[0]
                    ubkw = (
                        dict(ub_entry=ub, ub_total=np.float32(ubt))
                        if UB_LAMBDA > 0 else {}
                    )
                    cand, _ = O.score_candidates(
                        dev.arrays, qa, L, C, fast, soft_required=True, **ubkw)
                    pending.append((cand, [(qi, q, aggs, ds)]))
                else:
                    # batch dim B is a compiled shape too: pad by repeating the
                    # last query, ignore its extra rows
                    B = _qshape(len(items), (8, 32, 128, 512))
                    pad = B - len(items)
                    qlist = [qa for _, _, _, qa, _, _, _ in items] + [items[-1][3]] * pad
                    qs = jax.tree.map(lambda *xs: np.stack(xs), *qlist)
                    if UB_LAMBDA > 0:
                        ub_b = np.stack([ub for *_, ub, _ in items]
                                        + [items[-1][5]] * pad).astype(np.float32)
                        ubt_b = np.array([ubt for *_, ubt in items]
                                         + [items[-1][6]] * pad, dtype=np.float32)
                        ubkw = dict(ub_entry=ub_b, ub_total=ubt_b)
                    else:
                        ubkw = {}
                    cand_b, _ = O.score_candidates_batch(
                        dev.arrays, qs, L, C, fast, soft_required=True, **ubkw)
                    pending.append((cand_b, [(qi, q, aggs, ds)
                                             for qi, q, aggs, _, ds, _, _ in items]))
            for cand_dev, metas in pending:
                cand_np = np.asarray(cand_dev)
                if self.VERIFY_C:
                    vs = _qshape(max(self.VERIFY_C, top_k), (1024, 2048, 4096))
                    if cand_np.shape[-1] > vs:
                        cand_np = cand_np[..., :vs]
                if len(metas) == 1:
                    qi, q, aggs, ds = metas[0]
                    add_verify(qi, q, aggs, cand_np, ds)
                else:
                    for j, (qi, q, aggs, ds) in enumerate(metas):
                        add_verify(qi, q, aggs, cand_np[j], ds)

            # ---- stage B: exact verify over full posting ranges ---------------------
            def emit(qi, docs, scores):
                valid = docs < seg.num_docs
                per_query[qi].append(
                    (ord_, docs[valid][:top_k], scores[valid][:top_k]))

            # same async-dispatch pattern: all verify programs are queued on
            # the device before any result is fetched. Each pending entry is
            # ONE packed device array = ONE fetch round trip (separate
            # docs/scores/signal fetches each cost ~25 ms of tunnel latency).
            pending_b = []
            for (P, Kd, ds), items in verify_buckets.items():
                k_fetch = min(K_out, Kd)
                sig_k = min(FUSED_SIG_K, Kd)
                if len(items) == 1:
                    qi, qc, ac, cand = items[0]
                    if DEVICE_JOIN:
                        docs, scores = O.score_driver_joined(
                            dev.arrays, qc, cand, ds, K_out)
                        pending_b.append(((docs, scores), None, [qi]))
                    else:
                        facs = self._slot_factors_for(seg, qc, cand)
                        self._cache_stageb_factors(ctxs[qi], ord_, seg, cand, facs)
                        if fused:
                            packed = O.score_driver_with_signals(
                                dev.arrays, qc, facs, cand, ac, ds, K_out, sig_k)
                            pending_b.append((packed, (k_fetch, sig_k), [qi]))
                        else:
                            docs, scores = O.score_driver(
                                dev.arrays, qc, facs, cand, ds, K_out)
                            pending_b.append(((docs, scores), None, [qi]))
                else:
                    B = _qshape(len(items), (8, 32, 128, 512))
                    qlist = [it[1] for it in items] + [items[-1][1]] * (B - len(items))
                    candlist = [it[3] for it in items] + [items[-1][3]] * (B - len(items))
                    qs = jax.tree.map(lambda *xs: np.stack(xs), *qlist)
                    cand_b = np.stack(candlist)
                    if DEVICE_JOIN:
                        docs_b, scores_b = O.score_driver_joined_batch(
                            dev.arrays, qs, cand_b, ds, K_out)
                        pending_b.append(((docs_b, scores_b), None,
                                          [it[0] for it in items]))
                    else:
                        facs_b = np.zeros((B, P, Kd), dtype=np.int32)
                        for j, (qi, qc, ac, cand) in enumerate(items):
                            self._slot_factors_for(seg, qc, cand, out=facs_b[j])
                            self._cache_stageb_factors(ctxs[qi], ord_, seg, cand, facs_b[j])
                        if fused:
                            alist = ([it[2] for it in items]
                                     + [items[-1][2]] * (B - len(items)))
                            ags = jax.tree.map(lambda *xs: np.stack(xs), *alist)
                            packed = O.score_driver_batch_with_signals(
                                dev.arrays, qs, facs_b, cand_b, ags, ds, K_out, sig_k)
                            pending_b.append((packed, (k_fetch, sig_k),
                                              [it[0] for it in items]))
                        else:
                            packed = O.score_driver_batch_packed(
                                dev.arrays, qs, facs_b, cand_b, ds, K_out)
                            pending_b.append((packed, (k_fetch, None),
                                              [it[0] for it in items]))
            for packed, meta, qis in pending_b:
                if meta is None:  # legacy two-array form (device join / single plain)
                    docs_np, scores_np = np.asarray(packed[0]), np.asarray(packed[1])
                    sig_np = None
                else:
                    k_fetch, sig_k = meta
                    if sig_k is None:
                        docs_np, scores_np = O.unpack_stageb(packed, k_fetch)
                        sig_np = None
                    else:
                        docs_np, scores_np, sig_np = O.unpack_stageb(
                            packed, k_fetch, S.NUM_SIGNALS, sig_k)
                if len(qis) == 1:
                    emit(qis[0], docs_np, scores_np)
                    if sig_np is not None:
                        self._cache_fused_signals(ctxs[qis[0]], ord_, seg,
                                                  docs_np, sig_np)
                else:
                    for j, qi in enumerate(qis):
                        emit(qi, docs_np[j], scores_np[j])
                        if sig_np is not None:
                            self._cache_fused_signals(ctxs[qi], ord_, seg,
                                                      docs_np[j], sig_np[j])

        out = []
        for chunks in per_query:
            if not chunks:
                out.append((np.zeros(0, np.int32), np.zeros(0, np.int32),
                            np.zeros(0, np.float32)))
                continue
            segs_q = np.concatenate(
                [np.full(len(d), o, dtype=np.int32) for o, d, _ in chunks])
            docs_q = np.concatenate([d for _, d, _ in chunks]).astype(np.int32, copy=False)
            scores_q = np.concatenate([s for _, _, s in chunks]).astype(np.float32, copy=False)
            order = np.argsort(-scores_q, kind="stable")[:top_k]
            out.append((segs_q[order], docs_q[order], scores_q[order]))
        return out

    def compute_signals_batch_many(self, items: list) -> list:
        """Pointer-list compat wrapper over compute_signals_arrays_many:
        items = [(ctx, pointers)]."""
        conv = []
        for ctx, ptrs in items:
            seg_arr = np.fromiter((p.segment for p in ptrs), dtype=np.int64,
                                  count=len(ptrs))
            doc_arr = np.fromiter((p.doc for p in ptrs), dtype=np.int64,
                                  count=len(ptrs))
            conv.append((ctx, seg_arr, doc_arr))
        return self.compute_signals_arrays_many(conv)

    def compute_signals_arrays_many(self, items: list) -> list:
        """Pass 2 for many queries at once: items = [(ctx, seg_arr, doc_arr)].
        Queries bucket by (segment, P, L, K) and each bucket runs one
        compute_signals_batch program. → list of signal matrices
        f32[len(doc_arr), NUM_SIGNALS]."""
        import jax
        import jax.numpy as jnp

        region_scores = self.region_scores()
        total = self.num_docs
        dfl = self._df_lookup()
        out = [np.zeros((len(doc_arr), S.NUM_SIGNALS), dtype=np.float32)
               for _, _, doc_arr in items]

        # (qi, segment) work units; K and P are UNIFIED per segment across the
        # whole batch (one compiled shape, ONE device round trip per segment —
        # on a tunneled TPU each extra fetch costs ~27ms of pure latency)
        # key work units by segment IDENTITY, resolving each query's ordinals
        # against the segment-list snapshot its ctx was searched with (a
        # maintenance rebind between pass 1 and this call must not remap them)
        work: dict = {}
        seg_by_id: dict = {}
        for qi, (ctx, seg_arr, doc_arr) in enumerate(items):
            segs = getattr(ctx, "_segments", None) or self.segments
            # fused stage-B cache: the verify dispatch already returned these
            # docs' signal rows — a host lookup replaces the device round trip
            if len(doc_arr) and self._fused_signal_fill_arr(
                    ctx, segs, seg_arr, doc_arr, out[qi]):
                continue
            for ord_ in np.unique(seg_arr):
                idxs = np.nonzero(seg_arr == ord_)[0]
                seg_by_id[id(segs[ord_])] = segs[ord_]
                # carry the per-ctx ordinal: slot/factor caches key on (ctx, ord_)
                work.setdefault(id(segs[ord_]), []).append((qi, idxs, ctx, int(ord_)))

        for seg_key, group in work.items():
            seg = seg_by_id[seg_key]
            dev = self.device_segment_for(seg)
            K = _qshape(max(len(idxs) for _, idxs, _, _ in group), (128, 512))
            B = _qshape(len(group), (8, 32, 128, 512))
            # slots first (to know the unified P), then factors straight into
            # the preallocated batch tensor
            prepared = []
            maxP = 16
            for qi, idxs, ctx, ord_ in group:
                q, aggs = self._slots_for(ctx, ord_, seg, total, region_scores, dfl)
                q, aggs = self._compact_slots(q, aggs, min_p=16)
                maxP = max(maxP, q.starts.shape[0])
                prepared.append((qi, idxs, q, aggs, ctx, ord_))
            maxP = _qshape(maxP, (16, 64))
            facs_b = (np.zeros((B, maxP, K), dtype=np.int32)
                      if not DEVICE_JOIN else np.zeros((B, 0, 0), dtype=np.int32))
            cands = np.full((B, K), seg.num_docs, dtype=np.int32)
            padded = []
            for j, (qi, idxs, q, aggs, ctx, ord_) in enumerate(prepared):
                P = q.starts.shape[0]
                if P < maxP:
                    pad = maxP - P
                    q = q._replace(
                        starts=np.pad(q.starts, (0, pad)),
                        lens=np.pad(q.lens, (0, pad)),
                        group=np.pad(q.group, (0, pad), constant_values=O.OPTIONAL_GROUP),
                        idf=np.pad(q.idf, (0, pad)),
                        w_bm25=np.pad(q.w_bm25, (0, pad)),
                        w_bm25f=np.pad(q.w_bm25f, (0, pad)),
                        w_presence=np.pad(q.w_presence, (0, pad)),
                    )
                    aggs = aggs._replace(
                        agg_bm25=np.pad(aggs.agg_bm25, ((0, 0), (0, pad))),
                        agg_bm25f=np.pad(aggs.agg_bm25f, ((0, 0), (0, pad))),
                        agg_idf=np.pad(aggs.agg_idf, ((0, 0), (0, pad))),
                        agg_cov=np.pad(aggs.agg_cov, ((0, 0), (0, pad))),
                    )
                cand = cands[j]
                cand[:] = seg.num_docs
                cand[: len(idxs)] = items[qi][2][idxs]
                # pass-2 docs are a subset of this query's verify-stage
                # candidates: reuse those factor columns when cached (host
                # path only — the device join re-searches on device)
                if not DEVICE_JOIN and not self._cached_factor_fill(
                        ctx, ord_, seg, cand, len(idxs), facs_b[j]):
                    self._slot_factors_for(seg, q, cand, out=facs_b[j])
                padded.append((qi, idxs, q, aggs))
            if len(padded) == 1:
                qi, idxs, q, aggs = padded[0]
                if DEVICE_JOIN:
                    sig = np.asarray(O.compute_signals_joined(dev.arrays, q, aggs, cands[0]))
                else:
                    sig = np.asarray(O.compute_signals_from_factors(dev.arrays, q, aggs, facs_b[0], cands[0]))
                sigs = [(qi, idxs, sig)]
            else:
                qpad = [g[2] for g in padded] + [padded[-1][2]] * (B - len(padded))
                apad = [g[3] for g in padded] + [padded[-1][3]] * (B - len(padded))
                qs = jax.tree.map(lambda *xs: np.stack(xs), *qpad)
                ags = jax.tree.map(lambda *xs: np.stack(xs), *apad)
                # q16 fetch: int16 + per-(query, signal) scale — half the
                # device→host bytes on the ~30 MB/s fetch direction
                if DEVICE_JOIN:
                    sq16, scl = O.compute_signals_joined_batch_q16(dev.arrays, qs, ags, cands)
                else:
                    sq16, scl = O.compute_signals_from_factors_batch_q16(
                        dev.arrays, qs, ags, facs_b, cands)
                sig_b = O.dequantize_signals(sq16, scl)
                sigs = [(g[0], g[1], sig_b[j]) for j, g in enumerate(padded)]
            for qi, idxs, sig in sigs:
                out[qi][idxs] = sig[:, : len(idxs)].T
        return out

    def compute_signals(self, ctx: QueryContext, pointers: list) -> np.ndarray:
        """Full signal matrix f32[len(pointers), NUM_SIGNALS] (device pass 2)."""
        out = np.zeros((len(pointers), S.NUM_SIGNALS), dtype=np.float32)
        region_scores = self.region_scores()
        total = self.num_docs
        dfl = self._df_lookup()
        segs = getattr(ctx, "_segments", None) or self.segments
        by_seg: dict[int, list[int]] = {}
        for i, p in enumerate(pointers):
            by_seg.setdefault(p.segment, []).append(i)
        for ord_, idxs in by_seg.items():
            seg = segs[ord_]
            q, aggs = self._slots_for(ctx, ord_, seg, total, region_scores, dfl)
            q, aggs = self._compact_slots(q, aggs)
            dev = self.device_segment_for(seg)
            K = 128
            while K < len(idxs):
                K *= 2
            cand = np.full(K, seg.num_docs, dtype=np.int32)
            for j, i in enumerate(idxs):
                cand[j] = pointers[i].doc
            if DEVICE_JOIN:
                sig = np.asarray(O.compute_signals_joined(dev.arrays, q, aggs, cand))
            else:
                facs = np.zeros((q.starts.shape[0], K), dtype=np.int32)
                if not self._cached_factor_fill(ctx, ord_, seg, cand, len(idxs), facs):
                    facs = self._slot_factors_for(seg, q, cand)
                sig = np.asarray(O.compute_signals_from_factors(
                    dev.arrays, q, aggs, facs, cand
                ))
            for j, i in enumerate(idxs):
                out[i] = sig[:, j]
        return out

    # -- phrase verification ------------------------------------------------------------
    def verify_phrase(self, pointer, words: list, segments: list | None = None,
                      fields: tuple | None = None) -> bool:
        """Exact adjacency of `words` in any phrase-tracked field (role of
        tantivy phrase queries; positions recorded for PHRASE_FIELDS).
        `fields` scopes the check (site: operators check url_for_site_operator
        only); a field-scoped check against a segment built BEFORE that field
        tracked positions falls back to presence (the candidate plan already
        AND'd the tokens)."""
        from ..index.segment import PHRASE_FIELDS
        from ..schema import text_field
        from ..utils.hashing import term_hash

        seg = (segments if segments is not None else self.segments)[pointer.segment]
        for fname in fields or PHRASE_FIELDS:
            fid = text_field(fname).id
            starts = seg.positions_for(term_hash(fid, words[0]), pointer.doc)
            if len(starts) == 0:
                if fields is not None and _term_in_doc(
                        seg, term_hash(fid, words[0]), pointer.doc):
                    return True  # old segment: term present, positions untracked
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

    @staticmethod
    def _phrase_checks(phrases: list, field_phrases: list | None) -> list:
        return ([(None, w) for w in phrases]
                + [((f,), w) for f, w in (field_phrases or [])])

    def filter_phrases(self, pointers: list, phrases: list, segments: list | None = None,
                       field_phrases: list | None = None) -> list:
        """Indices of pointers satisfying every phrase (incl. field-scoped)."""
        checks = self._phrase_checks(phrases, field_phrases)
        if not checks:
            return list(range(len(pointers)))
        return [
            i for i, p in enumerate(pointers)
            if all(self.verify_phrase(p, words, segments, fields=flds)
                   for flds, words in checks)
        ]

    def filter_phrases_arr(self, seg_arr: np.ndarray, doc_arr: np.ndarray,
                           phrases: list, segments: list | None = None,
                           field_phrases: list | None = None) -> np.ndarray:
        """Array-carried variant of filter_phrases → bool mask[N]."""
        keep = np.ones(len(doc_arr), dtype=bool)
        checks = self._phrase_checks(phrases, field_phrases)
        if not checks:
            return keep
        for i in range(len(doc_arr)):
            p = DocPointer(int(seg_arr[i]), int(doc_arr[i]))
            keep[i] = all(self.verify_phrase(p, words, segments, fields=flds)
                          for flds, words in checks)
        return keep

    # -- retrieval ---------------------------------------------------------------------
    def retrieve(self, pointers: list, query_terms: list | None = None,
                 segments: list | None = None) -> list:
        """Stored docs + snippets (role of inverted_index/search.rs:194).
        `segments`: the search-time snapshot the pointers' ordinals index
        (defaults to the current list — pass it whenever the index can
        compact/prune between phases, e.g. the live index)."""
        segs = segments if segments is not None else self.segments
        out = []
        for p in pointers:
            seg = segs[p.segment]
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
    def gather_embeddings(self, pointers: list, name: str,
                          segments: list | None = None) -> np.ndarray | None:
        segs = segments if segments is not None else self.segments
        dim = None
        for s in segs:
            d = s.meta["embedding_dims"].get(name)
            if d:
                dim = d
        if dim is None:
            return None
        out = np.zeros((len(pointers), dim), dtype=np.float32)
        by_seg: dict[int, list[int]] = {}
        for i, p in enumerate(pointers):
            by_seg.setdefault(p.segment, []).append(i)
        for ord_, idxs in by_seg.items():
            mat = segs[ord_].embeddings(name)
            if mat is not None:
                rows = np.fromiter((pointers[i].doc for i in idxs), dtype=np.int64, count=len(idxs))
                out[np.asarray(idxs)] = np.asarray(mat[rows], dtype=np.float32)
        return out

    def gather_columns(self, pointers: list, names: list,
                       segments: list | None = None) -> dict:
        """Vectorized per-candidate column gathers: {name: f64[len(pointers)]}
        (replaces the per-result Python loop flagged in round-1 review)."""
        segs = segments if segments is not None else self.segments
        out = {name: np.zeros(len(pointers), dtype=np.int64) for name in names}
        by_seg: dict[int, list[int]] = {}
        for i, p in enumerate(pointers):
            by_seg.setdefault(p.segment, []).append(i)
        for ord_, idxs in by_seg.items():
            seg = segs[ord_]
            rows = np.fromiter((pointers[i].doc for i in idxs), dtype=np.int64, count=len(idxs))
            ii = np.asarray(idxs)
            for name in names:
                col = seg.column(name)
                if len(col):
                    out[name][ii] = np.asarray(col[rows], dtype=np.int64)
        return out

    def gather_embeddings_arr(self, seg_arr: np.ndarray, doc_arr: np.ndarray,
                              name: str, segments: list | None = None) -> np.ndarray | None:
        """Array-carried variant of gather_embeddings: rows addressed by
        (segment-ordinal, doc) arrays — no per-row pointer objects."""
        segs = segments if segments is not None else self.segments
        dim = None
        for s in segs:
            d = s.meta["embedding_dims"].get(name)
            if d:
                dim = d
        if dim is None:
            return None
        out = np.zeros((len(doc_arr), dim), dtype=np.float32)
        for ord_ in np.unique(seg_arr):
            rows = np.nonzero(seg_arr == ord_)[0]
            mat = segs[int(ord_)].embeddings(name)
            if mat is not None:
                out[rows] = np.asarray(mat[doc_arr[rows]], dtype=np.float32)
        return out

    def gather_columns_arr(self, seg_arr: np.ndarray, doc_arr: np.ndarray,
                           names: list, segments: list | None = None) -> dict:
        """Array-carried variant of gather_columns."""
        segs = segments if segments is not None else self.segments
        out = {name: np.zeros(len(doc_arr), dtype=np.int64) for name in names}
        for ord_ in np.unique(seg_arr):
            seg = segs[int(ord_)]
            rows = np.nonzero(seg_arr == ord_)[0]
            docs = doc_arr[rows]
            for name in names:
                col = seg.column(name)
                if len(col):
                    out[name][rows] = np.asarray(col[docs], dtype=np.int64)
        return out
