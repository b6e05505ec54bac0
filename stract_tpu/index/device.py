"""DeviceSegment — a segment's query-time arrays resident in TPU HBM.

Uploads the memory-mapped segment (index/segment.py) once; all queries against
the segment reuse the same HBM buffers. Static column signals are
score-transformed at upload (rank → score_rank etc., see ops/scoring.py
STATIC_COLUMNS) so the per-query device work is pure gathers + arithmetic.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import scoring as O
from ..ranking import bm25_math as BM
from ..ranking import signals as S
from ..ranking.computer import BM25_FIELDS, BM25_FIELD_ROW
from ..schema import text_field
from .segment import Segment


def _static_col(seg: Segment, name: str) -> np.ndarray:
    col = np.asarray(seg.column(name), dtype=np.float64)
    if name in ("host_centrality_rank", "page_centrality_rank"):
        return BM.score_rank(col, np)
    if name == "fetch_time_ms":
        return BM.score_fetch_time(col, np)
    if name in ("tracker_score", "num_path_and_query_digits", "num_path_and_query_slashes"):
        return BM.score_reciprocal(col)
    if name == "link_density":
        return BM.score_link_density(col, np)
    if name == "likely_has_ads":
        return BM.score_has_ads(col, np)
    return col  # raw: centralities, is_homepage


def _bucket(n: int, minimum: int = 1024) -> int:
    """Next power of two ≥ n — device array shapes are bucketed so segments of
    similar size share compiled XLA programs (static shapes, no recompiles)."""
    b = minimum
    while b < n:
        b *= 2
    return b


class DeviceSegment:
    def __init__(self, seg: Segment):
        self.seg = seg
        self.num_docs = seg.num_docs
        D = seg.num_docs
        DB = _bucket(D + 1)  # padded doc axis; ids in [D, DB) all behave as pad

        # field lens [F_used, DB], pad value 1.0 (safe BM25 norm for pad doc).
        flens = np.ones((len(BM25_FIELDS), DB), dtype=np.float32)
        for name, row in BM25_FIELD_ROW.items():
            fid = text_field(name).id
            flens[row, :D] = np.maximum(seg.field_lens[fid].astype(np.float32), 1.0)

        static = np.zeros((O.NUM_STATIC, DB), dtype=np.float32)
        for i, name in enumerate(O.STATIC_COLUMNS):
            static[i, :D] = _static_col(seg, name)

        region = np.zeros(DB, dtype=np.int32)
        region[:D] = np.asarray(seg.column("region"), dtype=np.int64).clip(0, O.NUM_REGIONS - 1)
        last_updated = np.zeros(DB, dtype=np.float32)
        last_updated[:D] = np.asarray(seg.column("last_updated"), dtype=np.float64)

        n_post = len(seg.postings_docs)
        PB = _bucket(max(n_post, 1))
        p_docs = np.full(PB, D, dtype=np.int32)
        p_tfs = np.zeros(PB, dtype=np.int32)
        p_docs[:n_post] = np.asarray(seg.postings_docs, dtype=np.int32)
        p_tfs[:n_post] = np.asarray(seg.postings_tfs, dtype=np.int32)

        self.arrays = O.SegmentArrays(
            postings_docs=jnp.asarray(p_docs),
            postings_tfs=jnp.asarray(p_tfs),
            field_lens=jnp.asarray(flens),
            static_cols=jnp.asarray(static),
            region_ids=jnp.asarray(region),
            last_updated=jnp.asarray(last_updated),
            num_docs=D,
        )

        self.embeddings = {}
        for name in ("title_embeddings", "keyword_embeddings"):
            mat = seg.embeddings(name)
            if mat is not None:
                # pad rows of zeros so candidate gathers with id>=num_docs are safe
                padded = np.zeros((DB, mat.shape[1]), dtype=np.float16)
                padded[:D] = mat
                self.embeddings[name] = jnp.asarray(padded, dtype=jnp.bfloat16)
