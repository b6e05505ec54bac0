#!/usr/bin/env python
"""Profile pass-1 with the segmented P-way bitonic merge vs the full lax.sort
(VERDICT round-4 item 7 — wire or kill, with profiles; HOT LOOP 1, reference
inverted_index/search.rs:47).

Runs score_candidates_batch at the bench shapes (B=64, P=64, L=1024, C=4096,
soft-required fast path, saturated slot lens — the worst case the latency
budget attributes ~26 of 32 ms/batch to) on synthetic doc-ascending postings,
one subprocess per kernel arm (STRACT_TPU_MERGE_KERNEL is read at import).

    python tools/profile_merge.py            # both arms, prints one JSON line
    python tools/profile_merge.py --arm 1    # single arm (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

B = int(os.environ.get("PROF_B", 64))
P = int(os.environ.get("PROF_P", 64))
L = int(os.environ.get("PROF_L", 1024))
C = int(os.environ.get("PROF_C", 4096))
ITERS = int(os.environ.get("PROF_ITERS", 20))


def run_arm() -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from stract_tpu.ops import scoring as O

    rng = np.random.default_rng(0)
    D = 10_000_000
    Ptot = 1 << 23
    docs = np.sort(rng.integers(0, D, Ptot)).astype(np.int32)
    f = rng.integers(1, 65536, (Ptot, 2)).astype(np.int64)
    # aux MUST be a function of the doc (production invariant: it's the doc's
    # packed static/region/freshness) — per-posting random aux made the two
    # arms legitimately disagree, since which equal-key row survives at the
    # doc_end position is tie-order-dependent
    doc_aux = ((rng.integers(0, 65536, D).astype(np.int64) << 16)
               | rng.integers(0, 4096, D).astype(np.int64))
    aux = doc_aux[docs]
    rows = np.empty((Ptot, 3), dtype=np.int32)
    rows[:, 0] = docs
    rows[:, 1] = (((f[:, 0] << 16) | f[:, 1]) & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    rows[:, 2] = (aux & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    DB = 1 << 24
    seg = O.SegmentArrays(
        postings=jnp.asarray(rows),
        static_cols=jnp.zeros((O.NUM_STATIC, DB), jnp.float32),
        static_default=jnp.zeros(DB, jnp.float32),
        static_scale=jnp.float32(1e-4),
        region_ids=jnp.zeros(DB, jnp.int32),
        last_updated=jnp.zeros(DB, jnp.float32),
        num_docs=jnp.int32(D),
    )

    def slots(seed):
        r = np.random.default_rng(seed)
        starts = r.integers(0, Ptot - L, (B, P)).astype(np.int32)
        lens = np.full((B, P), L, np.int32)
        group = np.zeros((B, P), np.int32)
        return O.QuerySlots(
            starts=jnp.asarray(starts), lens=jnp.asarray(lens),
            group=jnp.asarray(group),
            n_required=jnp.ones(B, jnp.int32),
            idf=jnp.ones((B, P), jnp.float32),
            w_bm25=jnp.ones((B, P), jnp.float32),
            w_bm25f=jnp.full((B, P), 0.5, jnp.float32),
            w_presence=jnp.full((B, P), 0.1, jnp.float32),
            static_coeffs=jnp.ones((B, O.NUM_STATIC), jnp.float32),
            region_lut=jnp.zeros((B, O.NUM_REGIONS), jnp.float32),
            coeff_region=jnp.zeros(B, jnp.float32),
            coeff_update=jnp.zeros(B, jnp.float32),
            current_ts=jnp.full(B, 1.7e9, jnp.float32),
            soft_bonus=jnp.full(B, O.SOFT_REQUIRED_BONUS, jnp.float32),
        )

    qs = slots(1)
    out = O.score_candidates_batch(seg, qs, L, C, True, soft_required=True)
    np.asarray(out[1][:, :8])  # compile + sync (block_until_ready returns
    # early under the tunneled device — a host fetch is the only real barrier)

    def timed_run(iters):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = O.score_candidates_batch(seg, qs, L, C, True, soft_required=True)
        np.asarray(out[1][:, :8])  # one sync fetch after the whole chain
        return time.perf_counter() - t0

    t_fetch = timed_run(1)  # ~1 dispatch + the constant fetch round trip
    total = timed_run(ITERS)
    med = max(total - t_fetch, 1e-9) / max(ITERS - 1, 1)
    return {
        "merge_kernel": O.MERGE_KERNEL, "platform": jax.devices()[0].platform,
        "B": B, "P": P, "L": L, "C": C,
        "median_ms_per_batch": round(med * 1e3, 2),
        "single_dispatch_plus_fetch_ms": round(t_fetch * 1e3, 2),
        "ms_per_query": round(med * 1e3 / B, 3),
        # top scores, not doc ids: equal-key payload order differs between the
        # arms, so per-doc float sums drift ~1e-7 and near-ties can reorder
        "scores_sample": np.asarray(out[1])[0, :8].tolist(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", default=None)
    args = ap.parse_args()
    if args.arm is not None:
        print(json.dumps(run_arm()))
        return
    results = {}
    for arm in ("0", "1"):
        env = dict(os.environ, STRACT_TPU_MERGE_KERNEL=arm)
        p = subprocess.run([sys.executable, os.path.abspath(__file__), "--arm", arm],
                           env=env, capture_output=True, text=True, timeout=1200)
        if p.returncode:
            print(p.stderr[-2000:], file=sys.stderr)
            sys.exit(1)
        results["merge" if arm == "1" else "sort"] = json.loads(p.stdout.strip().splitlines()[-1])
    s, m = results["sort"], results["merge"]
    import numpy as np

    np.testing.assert_allclose(s["scores_sample"], m["scores_sample"], rtol=1e-5)
    print(json.dumps({
        "sort_ms": s["median_ms_per_batch"], "merge_ms": m["median_ms_per_batch"],
        "speedup": round(s["median_ms_per_batch"] / m["median_ms_per_batch"], 3),
        "shapes": {k: s[k] for k in ("B", "P", "L", "C")},
        "platform": s["platform"],
    }))


if __name__ == "__main__":
    main()
