"""Document-partitioned search over a device mesh — the PRODUCT's multi-chip
story (role of reference searcher/distributed.rs:341-404: fan-out to all index
shards + coordinator merge — but INSIDE one TPU slice: each device holds one
segment shard in its HBM, scores locally, and the top-k merge is an
all-gather over ICI instead of sonic RPC).

The cross-host layer (distributed/, gossip + sonic) still fans out between
hosts; this module is the intra-slice fan-out where the shards are devices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops import scoring as O


def stack_segment_arrays(segs: list) -> O.SegmentArrays:
    """Stack per-device SegmentArrays along a new leading shard axis. All
    segments must share bucketed shapes (index/device.py buckets them)."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *segs)


def make_sharded_search(mesh, axis: str = "x", L: int = O.DEFAULT_L, K: int = O.DEFAULT_K,
                        default_static: bool = True):
    """→ jitted fn(stacked_segs, q) → (docs i32[K], shards i32[K], scores f32[K])
    globally ranked across every device's segment. q is replicated; the stacked
    SegmentArrays are sharded one-segment-per-device along `axis`."""

    def local(seg_stk, q):
        seg = jax.tree.map(lambda x: x[0], seg_stk)  # this device's segment
        docs, scores = O.score_candidates(seg, q, L, K, default_static)
        shard = jax.lax.axis_index(axis).astype(jnp.int32)
        gd = jax.lax.all_gather(docs, axis)                      # [n_dev, K]
        gs = jax.lax.all_gather(scores, axis)
        gh = jax.lax.all_gather(jnp.full((K,), shard, jnp.int32), axis)
        top_scores, idx = jax.lax.top_k(gs.reshape(-1), K)
        flat_d = gd.reshape(-1)
        flat_h = gh.reshape(-1)
        return flat_d[idx], flat_h[idx], top_scores

    shmap = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shmap)


def make_sharded_two_stage(mesh, axis: str = "x", L: int = O.DEFAULT_L,
                           C: int = 2048, K: int = O.DEFAULT_K,
                           default_static: bool = True, fast: bool = True):
    """The SERVING multi-chip program: the full two-stage near-exact search in
    ONE dispatch across the mesh — per-device stage-A soft-required scan
    (MUST/MUST_NOT groups relaxed to a dominant bonus), exact stage-B verify
    with the factor join ON DEVICE (no host round trip between stages — the
    point of the fused program), then a global top-K all-gather merge over ICI
    (role of reference searcher/distributed.rs:341-404 inside a slice).

    → jitted fn(stacked_segs, qa_stk, qc_stk) → (docs i32[K], shards i32[K],
    scores f32[K]); qa = impact-augmented slots (stage A), qc = compacted
    original slots (stage B — the augmented prefixes would double-count)."""

    def local(seg_stk, qa_stk, qc_stk):
        seg = jax.tree.map(lambda x: x[0], seg_stk)
        qa = jax.tree.map(lambda x: x[0], qa_stk)
        qc = jax.tree.map(lambda x: x[0], qc_stk)
        cand, _ = O.score_candidates(seg, qa, L, C, fast, soft_required=True)
        docs, scores = O.score_driver_joined(seg, qc, cand, default_static, K)
        shard = jax.lax.axis_index(axis).astype(jnp.int32)
        gd = jax.lax.all_gather(docs, axis)
        gs = jax.lax.all_gather(scores, axis)
        gh = jax.lax.all_gather(jnp.full((K,), shard, jnp.int32), axis)
        top_scores, idx = jax.lax.top_k(gs.reshape(-1), K)
        return gd.reshape(-1)[idx], gh.reshape(-1)[idx], top_scores

    shmap = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shmap)


def _pad_slots(q, maxP: int):
    """Pad a QuerySlots to maxP inert slots (len 0, OPTIONAL group)."""
    cur = q.starts.shape[0]
    if cur >= maxP:
        return q
    pad = maxP - cur
    return q._replace(
        starts=np.pad(np.asarray(q.starts), (0, pad)),
        lens=np.pad(np.asarray(q.lens), (0, pad)),
        group=np.pad(np.asarray(q.group), (0, pad), constant_values=O.OPTIONAL_GROUP),
        idf=np.pad(np.asarray(q.idf), (0, pad)),
        w_bm25=np.pad(np.asarray(q.w_bm25), (0, pad)),
        w_bm25f=np.pad(np.asarray(q.w_bm25f), (0, pad)),
        w_presence=np.pad(np.asarray(q.w_presence), (0, pad)),
    )


class MeshShardedSearcher:
    """Multi-chip serving path used by LocalSearcher when constructed with a
    >1-device mesh: the index's segments are distributed one-per-device (HBM
    document partitioning), and every query runs the fused two-stage program
    from make_sharded_two_stage — a single dispatch replaces the per-segment
    host-interleaved loop of the single-chip path.

    Trade-off, recorded: stage-B factors are joined on device (binary search
    over the shard's posting matrix) instead of the host gallop join. On a
    single tunneled chip the host join measured faster (docs/perf_notes.md),
    but per-device corpora are D/n here and the join stays on-chip, so the
    whole query costs ONE round trip instead of 2 per segment."""

    def __init__(self, index, mesh, axis: str = "x"):
        self.index = index
        self.mesh = mesh
        self.axis = axis
        self.n = int(mesh.devices.size)
        self._segments = [s for s in index.segments if s.num_docs > 0]
        if not (0 < len(self._segments) <= self.n):
            raise ValueError(
                f"need 1..{self.n} non-empty segments for a {self.n}-device mesh, "
                f"got {len(self._segments)}")
        self._num_docs = [s.num_docs for s in self._segments] + [0] * (self.n - len(self._segments))
        arrays = pad_segments_to_common_shapes(
            [index.device_segment_for(s) for s in self._segments])
        # pad the shard axis with zero-doc clones of shard 0 (num_docs=0 makes
        # every doc invalid, so they contribute nothing to the merge)
        while len(arrays) < self.n:
            arrays.append(arrays[0]._replace(num_docs=np.int32(0)))
        stacked = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *arrays)
        sharding = jax.sharding.NamedSharding(mesh, P(axis))
        self._stacked = jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)
        self._fns: dict = {}

    def _fn(self, L: int, C: int, K: int, default_static: bool, fast: bool):
        key = (L, C, K, default_static, fast)
        if key not in self._fns:
            self._fns[key] = make_sharded_two_stage(
                self.mesh, self.axis, L, C, K, default_static, fast)
        return self._fns[key]

    def search_batch(self, ctxs: list, top_k: int = 1024) -> list:
        """Same contract as InvertedIndex.search_initial_batch: → list of
        (pointers, scores) aligned with ctxs. Dispatches are queued for every
        query before the first fetch (async device pipelining)."""
        from ..index.inverted import DocPointer, _qshape
        from ..ranking.computer import choose_L, uses_default_static

        idx = self.index
        region_scores = idx.region_scores()
        total = idx.num_docs
        dfl = idx._df_lookup()
        K_out = _qshape(top_k, (512, O.DEFAULT_K))
        C = _qshape(max(idx.SCAN_CANDIDATES, top_k), (1024, 2048, 4096))

        pending = []
        driver_qis: list = []  # queries routed through the exact single-chip path
        for qi, ctx in enumerate(ctxs):
            ctx._segments = self._segments  # pointer ordinals index this snapshot
            ds = uses_default_static(ctx)
            qas, qcs, Ls = [], [], []
            nonneg = True
            is_driver = False
            for ord_, seg in enumerate(self._segments):
                q, _ = idx._slots_for(ctx, ord_, seg, total, region_scores, dfl)
                # driver-eligible (selective required group — site:, exacturl,
                # optic site filters): the mesh program's L-prefix-truncated
                # stage-A scan can miss matches past the prefix, so these take
                # the single-chip exact path (full-posting-range driver verify)
                # — same answer, one host-interleaved loop instead of one
                # fused dispatch, and such queries are the rare selective ones
                if idx._driver_docs(seg, q) is not None:
                    is_driver = True
                    break
                L = choose_L(np.asarray(q.lens))
                dev = idx.device_segment_for(seg)
                qa, _ub, _ubt = idx._augment_with_impact(seg, dev, q, L)
                qc, _ = idx._compact_slots(q, min_p=16)
                nonneg = nonneg and (
                    float(np.asarray(q.w_bm25).min()) >= 0
                    and float(np.asarray(q.w_bm25f).min()) >= 0
                    and float(np.asarray(q.w_presence).min()) >= 0)
                qas.append(qa)
                qcs.append(qc)
                Ls.append(L)
            if is_driver:
                driver_qis.append(qi)
                pending.append(None)
                continue
            L = _qshape(max(Ls), (128, O.DEFAULT_L))
            Pa = _qshape(max(q.starts.shape[0] for q in qas), (16, 64))
            Pc = _qshape(max(q.starts.shape[0] for q in qcs), (16, 64))
            qas = [_pad_slots(q, Pa) for q in qas] + [_pad_slots(qas[-1], Pa)] * (self.n - len(qas))
            qcs = [_pad_slots(q, Pc) for q in qcs] + [_pad_slots(qcs[-1], Pc)] * (self.n - len(qcs))
            qa_stk = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *qas)
            qc_stk = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *qcs)
            fn = self._fn(L, C, K_out, ds, ds and nonneg)
            pending.append(fn(self._stacked, qa_stk, qc_stk))

        driver_res = (
            iter(idx.search_initial_batch([ctxs[qi] for qi in driver_qis], top_k=top_k))
            if driver_qis else None
        )
        driver_set = set(driver_qis)
        out = []
        for qi, res in enumerate(pending):
            if qi in driver_set:
                out.append(next(driver_res))
                continue
            docs, shards, scores = res
            docs = np.asarray(docs)
            shards = np.asarray(shards)
            scores = np.asarray(scores)
            nd = np.asarray(self._num_docs)[shards]
            valid = np.isfinite(scores) & (docs < nd)
            ptrs = [DocPointer(int(s), int(d))
                    for s, d in zip(shards[valid][:top_k], docs[valid][:top_k])]
            out.append((ptrs, [float(x) for x in scores[valid][:top_k]]))
        return out


def pad_segments_to_common_shapes(dev_segments: list) -> list:
    """Host-side pad so differently-sized segments stack (shards are built
    independently, so their bucketed shapes can differ by one bucket)."""
    arrays = [d.arrays for d in dev_segments]
    maxes = jax.tree.map(lambda *xs: tuple(np.max([np.shape(x) for x in xs], axis=0)), *arrays)

    def pad_leaf(x, shape):
        x = np.asarray(x)
        if x.shape == tuple(shape):
            return x
        pads = [(0, int(t) - int(s)) for s, t in zip(x.shape, shape)]
        return np.pad(x, pads)

    return [jax.tree.map(pad_leaf, a, maxes) for a in arrays]
