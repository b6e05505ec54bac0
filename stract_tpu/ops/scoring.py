"""Fused postings scoring on TPU — the core query-time compute.

Replaces the reference's HOT LOOP 1 (tantivy postings intersection + per-doc
SignalComputer scoring + top-k heap, inverted_index/search.rs:47 +
ranking/computer/mod.rs:62-95) with two fully-vectorized XLA passes:

PASS 1 — candidates + fused score (`score_candidates`):
  1. Gather the first L postings of each of P query (field, token) slots
     (postings are doc-id-ascending = pre-computed-score-descending, so this IS
     the reference's early-termination semantics: the best static-quality docs
     come first; the reference caps at max_docs_considered=1000).
  2. One fused per-entry formula folds every text signal (BM25 per field, BM25F,
     IDF-sums, coverage) times its coefficient into a single contribution —
     possible because every text signal is a sum of per-(slot, doc) terms.
  3. Sparse join by doc id: sort (doc, group, contrib) triples, segment-sum,
     enforce boolean semantics (every required term group present, no excluded
     group present — reference plan composes MUST/SHOULD/MUST_NOT the same way,
     query/plan/mod.rs:350-410), add column-signal scores, top-k.

PASS 2 — per-signal breakdown (`compute_signals`) for the merged candidates:
  per-slot tf lookup via vectorized binary search, then one-hot aggregation
  matmuls [S, P] @ [P, K] on the MXU produce the full signal matrix the
  coordinator pipeline uses as LTR features.

Everything is static-shape: P (slots), L (postings budget per slot), K
(candidates) are compile-time constants; short queries are masked, long queries
bucket up to the next power of two.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ranking import bm25_math as BM
from ..ranking import signals as S

# Default static sizes (compile-time). L mirrors the reference's early-termination
# budget (max_docs_considered=1000, configs/search_server.toml:17).
# Env overrides exist so tests can use small shapes (XLA CPU compile time).
import os as _os

DEFAULT_P = int(_os.environ.get("STRACT_TPU_P", 64))
DEFAULT_L = int(_os.environ.get("STRACT_TPU_L", 1024))
DEFAULT_K = int(_os.environ.get("STRACT_TPU_K", 1024))

NUM_REGIONS = 16

# Term-group encoding in QuerySlots.group:
#   0..MAX_GROUPS-1  required group (MUST — every group must match the doc)
#   OPTIONAL_GROUP   scoring-only slot (SHOULD — n-gram boosters etc.)
#   EXCLUDED_GROUP   exclusion (MUST_NOT)
MAX_GROUPS = 32
OPTIONAL_GROUP = 62
EXCLUDED_GROUP = 63

# Static column stack (order is a contract between index/device.py and this file).
# Each row is the score-transformed column except region (raw id) and
# last_updated (raw unix seconds), which are query-dependent.
STATIC_COLUMNS = [
    "host_centrality",             # raw value
    "host_centrality_rank",        # score_rank applied at upload
    "page_centrality",             # raw value
    "page_centrality_rank",        # score_rank applied at upload
    "is_homepage",                 # 0/1
    "fetch_time_ms",               # 1/(ms+1), 0 if >= 1000
    "tracker_score",               # 1/(n+1)
    "num_path_and_query_digits",   # 1/(n+1)
    "num_path_and_query_slashes",  # 1/(n+1)
    "link_density",                # score_link_density
    "likely_has_ads",              # 1 if no ads else 0
]
NUM_STATIC = len(STATIC_COLUMNS)
STATIC_SIGNAL_IDS = [
    S.HOST_CENTRALITY.id, S.HOST_CENTRALITY_RANK.id, S.PAGE_CENTRALITY.id,
    S.PAGE_CENTRALITY_RANK.id, S.IS_HOMEPAGE.id, S.FETCH_TIME_MS.id,
    S.TRACKER_SCORE.id, S.URL_DIGITS.id, S.URL_SLASHES.id, S.LINK_DENSITY.id,
    S.HAS_ADS.id,
]


class SegmentArrays(NamedTuple):
    """HBM-resident per-segment arrays (uploaded once by index/device.py)."""

    postings_docs: jax.Array   # i32[Ptot]
    postings_tfs: jax.Array    # i32[Ptot]
    field_lens: jax.Array      # f32[F_used, D+1] (pad row: 1.0)
    static_cols: jax.Array     # f32[NUM_STATIC, D+1] score-transformed (pad: 0)
    region_ids: jax.Array      # i32[D+1]
    last_updated: jax.Array    # f32[D+1] unix seconds
    num_docs: jax.Array        # i32 scalar


class QuerySlots(NamedTuple):
    """Per-query slot arrays, P entries (built by ranking/computer.py)."""

    starts: jax.Array        # i32[P] posting start offsets
    lens: jax.Array          # i32[P] posting lengths (0 = unused slot)
    group: jax.Array         # i32[P] term-group id (see encoding above)
    n_required: jax.Array    # i32 scalar: number of required groups
    field_idx: jax.Array     # i32[P] row into field_lens (0 if unused)
    avg_len: jax.Array       # f32[P] average field length
    idf: jax.Array           # f32[P]
    w_bm25: jax.Array        # f32[P] coeff(bm25 signal) * idf
    w_bm25f: jax.Array       # f32[P] coeff(bm25f) * idf (0 for non-bm25f slots)
    bm25f_cf: jax.Array      # f32[P] per-field bm25f tf coefficient
    w_presence: jax.Array    # f32[P] coeff(idf_sum)*idf + coeff(coverage)/n_terms
    # aggregation matrices for pass 2 (one-hot rows over slots):
    agg_bm25: jax.Array      # f32[NUM_SIGNALS, P]
    agg_bm25f: jax.Array     # f32[1, P] slots in the bm25f fusion (0/1)
    agg_idf: jax.Array       # f32[NUM_SIGNALS, P] idf-sum one-hot
    agg_cov: jax.Array       # f32[NUM_SIGNALS, P] coverage one-hot / n_terms
    # column-signal coefficients:
    static_coeffs: jax.Array  # f32[NUM_STATIC]
    region_lut: jax.Array     # f32[NUM_REGIONS] region score per region id (incl. boost)
    coeff_region: jax.Array   # f32 scalar
    coeff_update: jax.Array   # f32 scalar
    current_ts: jax.Array     # f32 scalar (unix seconds)


def _gather_entries(seg: SegmentArrays, q: QuerySlots, L: int):
    """Gather [P, L] doc/tf tiles for all slots. Invalid entries → doc=num_docs
    (the pad row) with tf=0."""
    P = q.starts.shape[0]
    offs = jax.lax.broadcasted_iota(jnp.int32, (P, L), 1)
    valid = offs < jnp.minimum(q.lens, L)[:, None]
    idx = jnp.clip(q.starts[:, None] + offs, 0, seg.postings_docs.shape[0] - 1)
    docs = jnp.where(valid, seg.postings_docs[idx], seg.num_docs)
    tfs = jnp.where(valid, seg.postings_tfs[idx], 0).astype(jnp.float32)
    return docs, tfs, valid


def _entry_contrib(seg: SegmentArrays, q: QuerySlots, docs, tfs):
    """Fused per-entry text contribution: every text signal × coefficient folded
    into one formula (see module docstring)."""
    flen = seg.field_lens[q.field_idx[:, None], docs]  # [P, L]
    k1, b = BM.K1, BM.B
    norm = k1 * (1.0 - b + b * flen / q.avg_len[:, None])
    tf_factor = tfs * (k1 + 1.0) / (tfs + norm)
    stf = tfs * q.bm25f_cf[:, None]
    tf_factor_f = stf * (k1 + 1.0) / (stf + norm)
    present = (tfs > 0).astype(jnp.float32)
    return (
        q.w_bm25[:, None] * tf_factor
        + q.w_bm25f[:, None] * tf_factor_f
        + q.w_presence[:, None] * present
    )


def _static_score(seg: SegmentArrays, q: QuerySlots, docs):
    """Query-weighted column-signal score for given doc ids (pad row → 0)."""
    cols = seg.static_cols[:, docs]  # [NUM_STATIC, ...]
    score = jnp.tensordot(q.static_coeffs, cols, axes=1)
    region = jnp.clip(seg.region_ids[docs], 0, NUM_REGIONS - 1)
    score = score + q.coeff_region * q.region_lut[region]
    upd = BM.score_update_timestamp(seg.last_updated[docs], q.current_ts, jnp)
    score = score + q.coeff_update * upd
    return score


def _segment_sum_at_ends(values, is_end):
    """Sum `values` within runs ending at `is_end` positions. Returns per-entry
    array valid at end positions. Robust to negative values (cummax over indices,
    not cumsums)."""
    csum = jnp.cumsum(values)
    n = values.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    end_pos = jnp.where(is_end, idx, -1)
    prev_pos = jax.lax.cummax(jnp.concatenate([jnp.full(1, -1, jnp.int32), end_pos[:-1]]))
    prev_csum = jnp.where(prev_pos >= 0, csum[jnp.clip(prev_pos, 0)], 0.0)
    return csum - prev_csum


@functools.partial(jax.jit, static_argnames=("L", "K"))
def score_candidates(seg: SegmentArrays, q: QuerySlots, L: int = DEFAULT_L, K: int = DEFAULT_K):
    """PASS 1: (top-K doc ids i32[K], scores f32[K]). Pad entries → doc=num_docs,
    score=-inf. Enforces MUST/MUST_NOT term-group semantics."""
    docs, tfs, _ = _gather_entries(seg, q, L)
    contrib = _entry_contrib(seg, q, docs, tfs)

    P = q.starts.shape[0]
    groups = jnp.broadcast_to(q.group[:, None], (P, L))

    flat_docs = docs.reshape(-1)
    flat_groups = groups.reshape(-1).astype(jnp.int32)
    flat_contrib = contrib.reshape(-1)
    sorted_docs, sorted_groups, sorted_contrib = jax.lax.sort(
        (flat_docs, flat_groups, flat_contrib), num_keys=2
    )

    # Boundaries: doc runs and (doc, group) runs.
    last = jnp.ones(1, dtype=bool)
    doc_end = jnp.concatenate([sorted_docs[1:] != sorted_docs[:-1], last])
    pair_end = jnp.concatenate(
        [(sorted_docs[1:] != sorted_docs[:-1]) | (sorted_groups[1:] != sorted_groups[:-1]), last]
    )

    text_total = _segment_sum_at_ends(sorted_contrib, doc_end)

    required = (sorted_groups < MAX_GROUPS).astype(jnp.float32)
    excluded = (sorted_groups == EXCLUDED_GROUP).astype(jnp.float32)
    req_groups_present = _segment_sum_at_ends(pair_end.astype(jnp.float32) * required, doc_end)
    excl_present = _segment_sum_at_ends(pair_end.astype(jnp.float32) * excluded, doc_end)

    static = _static_score(seg, q, sorted_docs)
    total = text_total + static
    valid = (
        doc_end
        & (sorted_docs < seg.num_docs)
        & (req_groups_present >= q.n_required.astype(jnp.float32))
        & (excl_present < 0.5)
    )
    total = jnp.where(valid, total, -jnp.inf)

    top_scores, top_idx = jax.lax.top_k(total, K)
    top_docs = jnp.where(
        jnp.isneginf(top_scores), seg.num_docs, sorted_docs[top_idx]
    ).astype(jnp.int32)
    return top_docs, top_scores


def _slot_tf_lookup(docs_tile, tfs_tile, cand, L: int):
    """For each slot p and candidate doc c: tf of c in slot p's gathered postings.
    docs_tile [P, L] ascending per row (pad = num_docs at tail), cand i32[K].
    Vectorized binary search, log2(L) fori steps → tf f32[P, K]."""
    P = docs_tile.shape[0]
    K = cand.shape[0]
    lo = jnp.zeros((P, K), dtype=jnp.int32)
    hi = jnp.full((P, K), L, dtype=jnp.int32)
    steps = max(1, int(np.ceil(np.log2(max(L, 2)))) + 1)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        mid_vals = jnp.take_along_axis(docs_tile, jnp.clip(mid, 0, L - 1), axis=1)
        go_right = mid_vals < cand[None, :]
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    pos = jnp.clip(lo, 0, L - 1)
    found = jnp.take_along_axis(docs_tile, pos, axis=1) == cand[None, :]
    tf = jnp.where(found, jnp.take_along_axis(tfs_tile, pos, axis=1), 0.0)
    return tf


@functools.partial(jax.jit, static_argnames=("L",))
def compute_signals(seg: SegmentArrays, q: QuerySlots, cand: jax.Array, L: int = DEFAULT_L):
    """PASS 2: full signal matrix f32[NUM_SIGNALS, K] for candidate doc ids
    (pad candidates with num_docs). Non-core signal rows are 0 (filled by the
    coordinator pipeline)."""
    docs_tile, tfs_tile, _ = _gather_entries(seg, q, L)
    tf = _slot_tf_lookup(docs_tile, tfs_tile, cand, L)  # [P, K]

    flen = seg.field_lens[q.field_idx[:, None], jnp.clip(cand, 0, seg.num_docs)[None, :]]
    k1, b = BM.K1, BM.B
    norm = k1 * (1.0 - b + b * flen / q.avg_len[:, None])
    tf_factor = tf * (k1 + 1.0) / (tf + norm)
    stf = tf * q.bm25f_cf[:, None]
    tf_factor_f = stf * (k1 + 1.0) / (stf + norm)
    present = (tf > 0).astype(jnp.float32)

    bm25 = q.idf[:, None] * tf_factor          # [P, K]
    bm25f = q.idf[:, None] * tf_factor_f
    idf_present = q.idf[:, None] * present

    sig = jnp.zeros((S.NUM_SIGNALS, cand.shape[0]), dtype=jnp.float32)
    sig = sig + jnp.dot(q.agg_bm25, bm25, preferred_element_type=jnp.float32)
    sig = sig.at[S.BM25_F.id].add(jnp.dot(q.agg_bm25f, bm25f, preferred_element_type=jnp.float32)[0])
    sig = sig + jnp.dot(q.agg_idf, idf_present, preferred_element_type=jnp.float32)
    sig = sig + jnp.dot(q.agg_cov, present, preferred_element_type=jnp.float32)

    # Column signals for the candidates.
    cols = seg.static_cols[:, cand]  # [NUM_STATIC, K]
    sig = sig.at[jnp.array(STATIC_SIGNAL_IDS), :].set(cols)
    region = jnp.clip(seg.region_ids[cand], 0, NUM_REGIONS - 1)
    sig = sig.at[S.REGION.id].set(q.region_lut[region])
    sig = sig.at[S.UPDATE_TIMESTAMP.id].set(
        BM.score_update_timestamp(seg.last_updated[cand], q.current_ts, jnp)
    )
    # Zero out rows for pad candidates.
    sig = jnp.where((cand < seg.num_docs)[None, :], sig, 0.0)
    return sig


# Batched variants: one compiled program scores a whole batch of queries against
# the same segment (bench path; the HTTP server micro-batches concurrent queries).
@functools.partial(jax.jit, static_argnames=("L", "K"))
def score_candidates_batch(seg: SegmentArrays, qs: QuerySlots, L: int = DEFAULT_L, K: int = DEFAULT_K):
    """qs: QuerySlots with a leading batch dim on every array."""
    return jax.vmap(lambda q: score_candidates(seg, q, L, K))(qs)


@functools.partial(jax.jit, static_argnames=("L",))
def compute_signals_batch(seg: SegmentArrays, qs: QuerySlots, cands: jax.Array, L: int = DEFAULT_L):
    return jax.vmap(lambda q, c: compute_signals(seg, q, c, L))(qs, cands)
