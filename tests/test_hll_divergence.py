"""HLL++-style estimator (utils/hyperloglog.py) and the divergence tool's
core machinery (tools/hll_divergence.py): the round-2-carried question —
classic estimator vs the reference's bias-corrected HLL++
(hyperloglog.rs:27-1150) — is answered by CENTRALITY.json's
estimator_divergence section; these tests pin the machinery behind it."""

import importlib.util
import os

import numpy as np
import pytest

from stract_tpu.utils.hyperloglog import (
    HyperLogLog, estimate_cardinalities, estimate_cardinalities_pp, mc_bias_table,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "hll_divergence", os.path.join(REPO, "tools", "hll_divergence.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bias():
    return mc_bias_table(6, trials=1500, seed=0)


def test_pp_reduces_midrange_bias(bias):
    """In the bias band (~2.5m..5m) the MC-corrected estimator must be less
    biased than the classic one — the property HLL++'s tables exist for."""
    rng = np.random.default_rng(5)
    c = 150
    regs = np.zeros((300, 64), dtype=np.uint8)
    for t in range(300):
        h = HyperLogLog(6)
        h.add_many_u64(rng.integers(0, 2**64, c, dtype=np.uint64))
        regs[t] = h.registers
    err_classic = abs(float(estimate_cardinalities(regs).mean()) - c) / c
    err_pp = abs(float(estimate_cardinalities_pp(regs, bias).mean()) - c) / c
    assert err_pp < err_classic
    assert err_pp < 0.03


def test_pp_matches_classic_outside_band(bias):
    """Above 5m both paths are the raw estimate; tiny cardinalities both take
    linear counting — divergence is confined to the band."""
    rng = np.random.default_rng(6)
    for c in (20, 2000):
        regs = np.zeros((50, 64), dtype=np.uint8)
        for t in range(50):
            h = HyperLogLog(6)
            h.add_many_u64(rng.integers(0, 2**64, c, dtype=np.uint64))
            regs[t] = h.registers
        np.testing.assert_allclose(
            estimate_cardinalities_pp(regs, bias), estimate_cardinalities(regs))


def test_exact_bfs_matches_brute_force():
    """Reverse-BFS exact harmonic centrality vs an O(n^3)-ish brute force on a
    tiny graph."""
    tool = _load_tool()
    ef = np.array([0, 1, 2, 3, 0, 4], dtype=np.int32)  # edges w->v
    et = np.array([1, 2, 3, 0, 2, 2], dtype=np.int32)
    n = 5
    # brute-force distances via repeated relaxation
    INF = 10**9
    d = np.full((n, n), INF, dtype=np.int64)
    np.fill_diagonal(d, 0)
    for _ in range(n):
        for w, v in zip(ef, et):
            d[:, v] = np.minimum(d[:, v], d[:, w] + 1)
    sample = np.arange(n)
    got = tool.exact_harmonic_sample(n, ef, et, sample)
    want = np.array([
        sum(1.0 / d[u, v] for u in range(n) if u != v and d[u, v] < INF) / (n - 1)
        for v in range(n)
    ])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_hyperball_two_estimators_rank_agreement():
    """At small scale the two estimators' centralities must rank-correlate
    ≥0.95 with exact — the full-scale number lives in CENTRALITY.json."""
    tool = _load_tool()
    ef, et = tool.make_graph(2000, 40000, seed=0)
    c_classic, c_pp = tool.hyperball_two_estimators(2000, ef, et)
    sample = np.random.default_rng(1).choice(2000, 40, replace=False)
    c_exact = tool.exact_harmonic_sample(2000, ef, et, sample)
    nz = c_exact > 0
    assert tool.spearman(c_classic[sample][nz], c_exact[nz]) > 0.95
    assert tool.spearman(c_pp[sample][nz], c_exact[nz]) > 0.95
