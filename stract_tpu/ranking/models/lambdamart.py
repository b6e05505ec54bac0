"""LambdaMART GBDT inference on TPU (role of reference
ranking/models/lambdamart.rs, 389 LoC: pure-Rust scorer for LightGBM text dumps).

The tree ensemble is tensorized: every tree's (feature, threshold, children,
leaf values) become fixed-shape arrays, and evaluation is a jit fori-loop of
gathers — [num_trees, batch] nodes advance one level per step, so the whole
forest over a 300-candidate recall stage is a handful of fused gather kernels
instead of the reference's per-doc pointer chase.

Ensemble sources:
  - `parse_lightgbm(text)`: the LightGBM text dump format the reference loads
    (the `lambdamart.txt` artifact from ltr/lambdamart.py).
  - `train(...)`: a self-contained gradient-boosted regression trainer (numpy)
    so the framework can produce its own models (role of ltr/ training scripts).
"""

from __future__ import annotations

import functools
import json
import re

import jax
import jax.numpy as jnp
import numpy as np


class LambdaMART:
    """Tensorized GBDT. Internal node children are indices >= 0; leaves are
    encoded as -(leaf_index + 1)."""

    def __init__(self, feature, threshold, left, right, leaf_value, max_depth: int):
        T = len(feature)
        self.feature = jnp.asarray(feature, dtype=jnp.int32)       # [T, N]
        self.threshold = jnp.asarray(threshold, dtype=jnp.float32) # [T, N]
        self.left = jnp.asarray(left, dtype=jnp.int32)             # [T, N]
        self.right = jnp.asarray(right, dtype=jnp.int32)           # [T, N]
        self.leaf_value = jnp.asarray(leaf_value, dtype=jnp.float32)  # [T, L]
        self.max_depth = max_depth
        self.num_trees = T

    # -- inference ---------------------------------------------------------------
    def predict(self, x: np.ndarray) -> np.ndarray:
        """x: f32[K, F] feature matrix → scores f32[K].

        K is padded to a power-of-2 bucket before the jit call: the serving
        path's K is the summed candidate count of a request batch, which is
        different on almost every call — unbucketed, every predict() compiled
        a fresh program (seconds each through the tunnel; profiled at 26 s of
        a 70 s / 128-query run, tools/profile_pipeline_on.py). Zero-padded
        rows walk the trees like any row and their outputs are sliced off.
        The per-row tree walk is shape-independent, but XLA may reassociate
        the cross-tree sum differently between program shapes: measured on
        the bench forest across K in [1, 3000], the padded call differs by
        at most 1 ULP (max rel 1.2e-7, only at K=1) with rank order
        preserved at every K (tests/test_lambdamart.py bucket-parity)."""
        x = np.asarray(x, dtype=np.float32)
        k = len(x)
        b = 256
        while b < k:
            b *= 2
        if b != k:
            x = np.concatenate([x, np.zeros((b - k, x.shape[1]), np.float32)])
        return np.asarray(_gbdt_forward(
            self.feature, self.threshold, self.left, self.right, self.leaf_value,
            jnp.asarray(x), self.max_depth,
        ))[:k]

    def predict_jax(self, x):
        return _gbdt_forward(
            self.feature, self.threshold, self.left, self.right, self.leaf_value,
            x, self.max_depth,
        )

    # -- serialization --------------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps({
            "feature": np.asarray(self.feature).tolist(),
            "threshold": np.asarray(self.threshold).tolist(),
            "left": np.asarray(self.left).tolist(),
            "right": np.asarray(self.right).tolist(),
            "leaf_value": np.asarray(self.leaf_value).tolist(),
            "max_depth": self.max_depth,
        })

    @classmethod
    def from_json(cls, s) -> "LambdaMART":
        """Accepts the to_json() string or an already-parsed dict (callers
        holding a json.load()ed file pass the dict directly)."""
        d = json.loads(s) if isinstance(s, (str, bytes)) else s
        return cls(
            np.array(d["feature"]), np.array(d["threshold"]), np.array(d["left"]),
            np.array(d["right"]), np.array(d["leaf_value"]), d["max_depth"],
        )

    # -- LightGBM text dump ------------------------------------------------------------
    @classmethod
    def parse_lightgbm(cls, text: str) -> "LambdaMART":
        """Parses LightGBM `model.txt` dumps (Tree=K sections with num_leaves,
        split_feature, threshold, left_child, right_child, leaf_value)."""
        trees = []
        cur: dict = {}
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("Tree="):
                if cur.get("num_leaves"):
                    trees.append(cur)
                cur = {}
            elif "=" in line:
                k, v = line.split("=", 1)
                cur[k] = v
        if cur.get("num_leaves"):
            trees.append(cur)

        def ints(s):
            return [int(t) for t in s.split()] if s else []

        def floats(s):
            return [float(t) for t in s.split()] if s else []

        parsed = []
        for t in trees:
            n_leaves = int(t["num_leaves"])
            feat = ints(t.get("split_feature", ""))
            thr = floats(t.get("threshold", ""))
            left = ints(t.get("left_child", ""))
            right = ints(t.get("right_child", ""))
            leaves = floats(t.get("leaf_value", ""))
            # LightGBM leaf refs are encoded as -(leaf_idx)-1 already
            parsed.append((feat, thr, left, right, leaves, n_leaves))

        max_nodes = max(max(len(p[0]), 1) for p in parsed)
        max_leaves = max(p[5] for p in parsed)
        T = len(parsed)
        feature = np.zeros((T, max_nodes), dtype=np.int32)
        threshold = np.zeros((T, max_nodes), dtype=np.float32)
        left = np.full((T, max_nodes), -1, dtype=np.int32)
        right = np.full((T, max_nodes), -1, dtype=np.int32)
        leaf_value = np.zeros((T, max_leaves), dtype=np.float32)
        for i, (feat, thr, l, r, leaves, _) in enumerate(parsed):
            n = len(feat)
            if n == 0:  # single-leaf tree
                continue
            feature[i, :n] = feat
            threshold[i, :n] = thr
            left[i, :n] = l
            right[i, :n] = r
            leaf_value[i, : len(leaves)] = leaves
        depth = int(np.ceil(np.log2(max(max_leaves, 2)))) + 2
        return cls(feature, threshold, left, right, leaf_value, max_depth=max(depth, 4))

    # -- training ------------------------------------------------------------------------
    @classmethod
    def train(
        cls,
        x: np.ndarray,
        y: np.ndarray,
        num_trees: int = 50,
        max_depth: int = 4,
        learning_rate: float = 0.1,
        min_samples: int = 4,
    ) -> "LambdaMART":
        """Gradient-boosted regression trees on (features, targets). For ranking,
        pass NDCG-style gains as targets (the reference trains lambdarank in
        LightGBM offline; this gives the framework a built-in trainer)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        pred = np.zeros_like(y)
        trees = []
        for _ in range(num_trees):
            resid = y - pred
            tree = _fit_tree(x, resid, max_depth, min_samples)
            trees.append(tree)
            pred += learning_rate * _eval_tree_np(tree, x)

        max_nodes = max(max(len(t["feature"]), 1) for t in trees)
        max_leaves = max(len(t["leaves"]) for t in trees)
        T = len(trees)
        feature = np.zeros((T, max_nodes), dtype=np.int32)
        threshold = np.zeros((T, max_nodes), dtype=np.float32)
        left = np.full((T, max_nodes), -1, dtype=np.int32)
        right = np.full((T, max_nodes), -1, dtype=np.int32)
        leaf_value = np.zeros((T, max_leaves), dtype=np.float32)
        for i, t in enumerate(trees):
            n = len(t["feature"])
            if n:
                feature[i, :n] = t["feature"]
                threshold[i, :n] = t["threshold"]
                left[i, :n] = t["left"]
                right[i, :n] = t["right"]
            leaf_value[i, : len(t["leaves"])] = np.array(t["leaves"]) * learning_rate
        return cls(feature, threshold, left, right, leaf_value, max_depth=max_depth + 2)


@functools.partial(jax.jit, static_argnames=("max_depth",))
def _gbdt_forward(feature, threshold, left, right, leaf_value, x, max_depth: int):
    """feature/threshold/left/right [T, N], leaf_value [T, L], x [K, F] → [K]."""
    T = feature.shape[0]
    K = x.shape[0]
    cur = jnp.zeros((T, K), dtype=jnp.int32)
    k_idx = jnp.arange(K)[None, :]

    def body(_, cur):
        node = jnp.clip(cur, 0, feature.shape[1] - 1)
        f = jnp.take_along_axis(feature, node, axis=1)       # [T, K]
        thr = jnp.take_along_axis(threshold, node, axis=1)
        l = jnp.take_along_axis(left, node, axis=1)
        r = jnp.take_along_axis(right, node, axis=1)
        vals = x[k_idx, f]                                    # [T, K]
        nxt = jnp.where(vals <= thr, l, r)
        return jnp.where(cur >= 0, nxt, cur)                  # leaves stay put

    cur = jax.lax.fori_loop(0, max_depth, body, cur)
    leaf_idx = jnp.clip(-cur - 1, 0, leaf_value.shape[1] - 1)
    vals = jnp.take_along_axis(leaf_value, leaf_idx, axis=1)  # [T, K]
    return jnp.sum(vals, axis=0)


# ---- numpy CART fitting (host-side training) --------------------------------

def _fit_tree(x, y, max_depth, min_samples):
    feature, threshold, left, right, leaves = [], [], [], [], []

    def build(idx, depth):
        if depth >= max_depth or len(idx) < min_samples or np.ptp(y[idx]) < 1e-12:
            leaves.append(float(np.mean(y[idx])) if len(idx) else 0.0)
            return -len(leaves)  # -(leaf_idx + 1)
        best = None
        parent_sse = np.var(y[idx]) * len(idx)
        for f in range(x.shape[1]):
            vals = x[idx, f]
            order = np.argsort(vals)
            sv, sy = vals[order], y[idx][order]
            csum = np.cumsum(sy)
            csq = np.cumsum(sy**2)
            n = len(sy)
            for cut in range(min_samples, n - min_samples + 1):
                if sv[cut - 1] == sv[min(cut, n - 1)]:
                    continue
                ls, lq = csum[cut - 1], csq[cut - 1]
                rs, rq = csum[-1] - ls, csq[-1] - lq
                sse = (lq - ls**2 / cut) + (rq - rs**2 / (n - cut))
                if best is None or sse < best[0]:
                    best = (sse, f, (sv[cut - 1] + sv[cut]) / 2.0)
        if best is None or best[0] >= parent_sse - 1e-12:
            leaves.append(float(np.mean(y[idx])))
            return -len(leaves)
        _, f, thr = best
        node_id = len(feature)
        feature.append(f)
        threshold.append(thr)
        left.append(0)
        right.append(0)
        l_idx = idx[x[idx, f] <= thr]
        r_idx = idx[x[idx, f] > thr]
        left[node_id] = build(l_idx, depth + 1)
        right[node_id] = build(r_idx, depth + 1)
        return node_id

    root = build(np.arange(len(y)), 0)
    if root < 0 and not feature:  # single leaf
        return {"feature": [], "threshold": [], "left": [], "right": [], "leaves": leaves}
    return {"feature": feature, "threshold": threshold, "left": left, "right": right, "leaves": leaves}


def _eval_tree_np(tree, x):
    if not tree["feature"]:
        return np.full(len(x), tree["leaves"][0])
    out = np.zeros(len(x))
    for i in range(len(x)):
        node = 0
        while node >= 0:
            f = tree["feature"][node]
            node = tree["left"][node] if x[i, f] <= tree["threshold"][node] else tree["right"][node]
        out[i] = tree["leaves"][-node - 1]
    return out
