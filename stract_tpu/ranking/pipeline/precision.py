"""Precision stage (role of reference ranking/pipeline/stages/precision.rs:114):
cross-encoder BERT rerank of the final page of results — (query, snippet) and
(query, title) pairs, 128-token truncation — plus LambdaMART, then the final
linear combination. Applied to the first pages only (searcher/api/mod.rs:598-614).
"""

from __future__ import annotations

import numpy as np

from .. import signals as S


class PrecisionStage:
    def __init__(self, cross_encoder=None, lambdamart=None):
        self.cross_encoder = cross_encoder
        self.lambdamart = lambdamart

    def apply(self, ctx, candidates: list) -> list:
        if not candidates:
            return candidates

        # proximity (slop) signals from the retrieved text (reference
        # MinTitleSlop/MinCleanBodySlop, non_core/text.rs:33-52)
        from ..proximity import min_slop, slop_score

        terms = getattr(ctx, "simple_terms", [])
        if terms:
            for c in candidates:
                d = c.retrieved or {}
                c.set_signal(S.MIN_TITLE_SLOP, slop_score(min_slop(terms, d.get("title", ""))))
                body = d.get("stored", {}).get("clean_text", "") or d.get("snippet", "")
                c.set_signal(S.MIN_CLEAN_BODY_SLOP, slop_score(min_slop(terms, body)))

        if self.cross_encoder is not None:
            snippets = [
                (c.retrieved or {}).get("snippet", "") or (c.retrieved or {}).get("description", "")
                for c in candidates
            ]
            titles = [(c.retrieved or {}).get("title", "") for c in candidates]
            s_scores = self.cross_encoder.score(ctx.raw, snippets)
            t_scores = self.cross_encoder.score(ctx.raw, titles)
            for c, s, t in zip(candidates, s_scores, t_scores):
                c.set_signal(S.CROSS_ENCODER_SNIPPET, float(s))
                c.set_signal(S.CROSS_ENCODER_TITLE, float(t))

        if self.lambdamart is not None:
            feats = np.stack([c.signals for c in candidates])
            preds = self.lambdamart.predict(feats)
            for c, v in zip(candidates, preds):
                c.set_signal(S.LAMBDA_MART, float(v))

        from .recall import rescore

        rescore(ctx, candidates)
        candidates.sort(key=lambda c: -c.score)
        return candidates
