"""tools/eval_10m.py must actually run (VERDICT r4 weak #7: it was committed
untested and its first real run could simply crash). Smoke: both arms at a
tiny corpus scale in a subprocess, asserting the JSON artifact shape."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_eval_10m_smoke(tmp_path):
    out = tmp_path / "EVAL_TINY.json"
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "BENCH_CACHE": str(tmp_path / "cache"),
        "EVAL_DOCS": "2000",
        "EVAL_QUERIES": "3",
        "EVAL_BOOT": "50",
        "BENCH_PIPELINE": "off",
        "EVAL_OUT": str(out),
    })
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "eval_10m.py")],
        env=env, capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(out.read_text())
    assert res["docs"] == 2000
    assert res["n_queries"] >= 1
    lo, hi = res["ndcg10_off"]["ci95"]
    assert 0.0 <= lo <= res["ndcg10_off"]["mean"] <= hi <= 1.0
    assert 0.0 <= res["recall_oracle100_at_300"] <= 1.0
