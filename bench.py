"""Headline benchmark: END-TO-END search QPS/chip on a 10M-doc shard.

The measured path is the real serving path (BASELINE.json's operating point),
through real HTTP: aiohttp API server → ApiSearcher (parse → device pass-1 →
device pass-2 → cross-shard merge/dedup → recall stage → retrieve top-20 with
snippets → precision slop signals), backed by the shard micro-batcher so
concurrent queries share device programs. Reported alongside: p50/p99 latency
and NDCG@10 against an exact float64 host oracle over the full corpus (no
early-termination, unquantized BM25) — the quality-parity check BASELINE.json
demands.

Corpus: 10M synthetic web pages (zipf vocabulary, per-site centralities,
stored docs, site/domain identity fields) written by stract_tpu/bench_corpus.py
in the ordinary segment format and cached under BENCH_CACHE.

Baseline: the SAME end-to-end path with JAX on this host's CPU (the Rust
reference cannot run here — no cargo; this machine exposes a single CPU core,
so the host baseline is single-socket-single-core, stated in the unit field).

Env knobs: BENCH_DOCS, BENCH_QUERIES, BENCH_CONCURRENCY, BENCH_CACHE,
BENCH_NDCG_QUERIES, BENCH_SKIP_CPU, BENCH_BUDGET_S, BENCH_ROLE (internal).
Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Budget discipline (the driver runs this under an external timeout): every
phase is time-boxed against BENCH_BUDGET_S; a watchdog thread and a SIGTERM
handler both flush the best-so-far JSON line, so a tunnel stall degrades the
run instead of zeroing it. The float64 NDCG oracle and the CPU-baseline qps
are cached in BENCH_CACHE keyed by (corpus, config, source hash) so reruns
skip the expensive phases entirely.
"""

from __future__ import annotations

import hashlib
import json
import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np

DOCS = int(os.environ.get("BENCH_DOCS", 10_000_000))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", 4096))
CONCURRENCY = int(os.environ.get("BENCH_CONCURRENCY", 64))
CACHE = os.environ.get("BENCH_CACHE", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache"))
NDCG_QUERIES = int(os.environ.get("BENCH_NDCG_QUERIES", 200))
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1500))
# neural ranking pipeline in the MEASURED path (reference runs its recall
# scorers + precision cross-encoder whenever models are configured,
# searcher/api/mod.rs:554-642): auto = on when trained models + embedding
# columns exist in BENCH_CACHE (entrypoint/train_encoders.py +
# tools/build_bench_embeddings.py), off otherwise — the unit says which.
PIPE_MODE = os.environ.get("BENCH_PIPELINE", "auto")
_T0 = time.monotonic()


def remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


# ---- emit-once result plumbing -------------------------------------------------
# All exits (normal completion, watchdog at budget, SIGTERM from an external
# timeout) funnel through emit(): the driver always gets its one JSON line.

_RES_LOCK = threading.Lock()
_EMITTED = False
_PH: dict = {  # progressively-updated phase results
    "docs": DOCS, "qps": 0.0, "n_run": 0, "conc": CONCURRENCY, "ok": 0,
    "p50": None, "p99": None, "p50_c4": None,
    "ndcg": None, "ndcg_n": 0, "ndcg_src": "skipped",
    "cpu_qps": None, "cpu_src": "skipped", "tpu_med": None, "ab_note": None,
    "note": "init", "pipe": "off",
}


def emit(exit_code=None):
    global _EMITTED
    with _RES_LOCK:
        if _EMITTED:
            if exit_code is not None:
                os._exit(exit_code)
            return
        _EMITTED = True
    p = _PH
    lat = (
        f"p50={p['p50']:.1f}ms, p99={p['p99']:.1f}ms, " if p["p50"] is not None else ""
    )
    if p["p50_c4"] is not None:
        lat += f"p50_c4={p['p50_c4']:.1f}ms, "  # low-concurrency service cost
    ndcg = (
        f"ndcg@10={p['ndcg']:.4f}[{p['ndcg_src']},n={p['ndcg_n']}] vs exact-f64-oracle, "
        if p["ndcg"] is not None else "ndcg@10=skipped, "
    )
    cpu = f"cpu-baseline=single-core-host-same-models[{p['cpu_src']}]"
    if p["tpu_med"] is not None and p["cpu_qps"]:
        cpu += (f", A/B medians tpu={p['tpu_med']:.2f}/cpu={p['cpu_qps']:.2f} qps"
                f"[{p['ab_note']}]")
    plat = f", platform={p['platform']}" if p.get("platform") else ""
    # vs_baseline from INTERLEAVED same-n chunk medians when the A/B ran
    # (alternating equal-size chunks, equal concurrency — the builder's own
    # round-2 measurement rule); falls back to headline/cpu otherwise
    tpu_side = p["tpu_med"] if p["tpu_med"] is not None else p["qps"]
    unit = (
        f"qps e2e-HTTP (D={p['docs']}, n={p['n_run']}, conc={p['conc']}, ok={p['ok']}, "
        f"pipeline={p['pipe']}, {lat}{ndcg}{cpu}, phase={p['note']}{plat})"
    )
    out = {
        "metric": "e2e_search_qps_10M_1chip",
        "value": round(p["qps"], 2),
        "unit": unit,
        "vs_baseline": round(tpu_side / p["cpu_qps"], 2) if p["cpu_qps"] else 0.0,
    }
    sys.stdout.write(json.dumps(out) + "\n")
    sys.stdout.flush()
    if exit_code is not None:
        os._exit(exit_code)


def _install_guards():
    # watchdog: leave 20s headroom for the emit itself
    t = threading.Timer(max(remaining() - 20.0, 5.0), emit, kwargs={"exit_code": 0})
    t.daemon = True
    t.start()
    signal.signal(signal.SIGTERM, lambda *_: emit(exit_code=0))
    signal.signal(signal.SIGINT, lambda *_: emit(exit_code=1))


def _source_hash() -> str:
    """Hash of the engine source — invalidates cached oracle/baseline results
    exactly when code that could change scoring or throughput changes."""
    h = hashlib.sha256()
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "stract_tpu")
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                with open(os.path.join(dirpath, fn), "rb") as fh:
                    h.update(fh.read())
    with open(os.path.abspath(__file__), "rb") as fh:
        h.update(fh.read())
    return h.hexdigest()[:16]


def _cache_get(name: str):
    try:
        with open(os.path.join(CACHE, name)) as fh:
            return json.load(fh)
    except Exception:  # noqa: BLE001
        return None


def _cache_put(name: str, obj) -> None:
    try:
        os.makedirs(CACHE, exist_ok=True)
        tmp = os.path.join(CACHE, name + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(obj, fh)
        os.replace(tmp, os.path.join(CACHE, name))
    except Exception:  # noqa: BLE001
        pass


def pick_docs() -> int:
    """Fall back to the largest cached corpus if building DOCS fresh would eat
    the whole budget (fresh 10M build ≈ 40 min on this 1-core host)."""
    seg = os.path.join(CACHE, f"bench-{DOCS}", "segments", "seg-bench", "meta.json")
    if os.path.exists(seg):
        return DOCS
    est_build_s = DOCS / 10_000_000 * 2400.0
    if remaining() > est_build_s + 600.0:
        return DOCS
    cached = []
    if os.path.isdir(CACHE):
        for d in os.listdir(CACHE):
            if d.startswith("bench-"):
                try:
                    n = int(d.split("-")[1])
                except ValueError:
                    continue
                if os.path.exists(os.path.join(CACHE, d, "segments", "seg-bench", "meta.json")):
                    cached.append(n)
    cached = [n for n in cached if n <= DOCS]  # never exceed the asked scale
    if cached:
        return max(cached)
    return min(DOCS, 1_000_000)


def _models_tag(docs: int) -> str:
    """Short content hash of the trained serving models — NDCG/CPU caches must
    invalidate when the models (not just the engine source) change."""
    h = hashlib.sha256()
    for name in (f"dual_encoder-{docs}", f"cross_encoder-{docs}"):
        d = os.path.join(CACHE, name)
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            p = os.path.join(d, fn)
            with open(p, "rb") as fh:
                h.update(fn.encode())
                h.update(fh.read())
    lm = os.path.join(CACHE, f"lambdamart-{docs}.json")
    if os.path.exists(lm):  # the forest is a served model too
        with open(lm, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:10]


def _load_pipeline(docs: int, index):
    """→ (RankingPipeline, tag). auto: recall dual-encoder similarity needs the
    corpus's stored embedding columns (tools/build_bench_embeddings.py) AND a
    trained dual encoder; precision needs a trained cross encoder. Either
    alone still counts as pipeline-on (tag says which)."""
    from stract_tpu.ranking.pipeline import RankingPipeline
    from stract_tpu.ranking.pipeline.precision import PrecisionStage
    from stract_tpu.ranking.pipeline.recall import RecallStage

    if PIPE_MODE == "off":
        return RankingPipeline(), "off"
    parts = []
    dual = cross = None
    has_emb = any(s.meta.get("embedding_dims") for s in index.segments)
    dual_dir = os.path.join(CACHE, f"dual_encoder-{docs}")
    if has_emb and os.path.exists(os.path.join(dual_dir, "config.json")):
        from stract_tpu.models.dual_encoder import DualEncoder

        dual = DualEncoder.load(dual_dir)
        parts.append("dual")
    cross_dir = os.path.join(CACHE, f"cross_encoder-{docs}")
    if os.path.exists(os.path.join(cross_dir, "config.json")):
        from stract_tpu.ranking.models.cross_encoder import CrossEncoderModel

        cross = CrossEncoderModel.load(cross_dir)
        parts.append("cross")
    if not parts:
        if PIPE_MODE == "on":
            raise RuntimeError(
                "BENCH_PIPELINE=on but no trained models in BENCH_CACHE — run "
                "tools/train_bench_encoders.py + tools/build_bench_embeddings.py first")
        return RankingPipeline(), "off(no-models)"
    # name the served model capacity in the tag: the round-4 headline hid
    # 2-layer/hidden-64 toys behind "on(dual+cross)" (VERDICT r4 missing #1)
    shapes = []
    for m in (dual, cross):
        if m is not None:
            c = m.cfg
            shapes.append(f"L{c.num_layers}-H{c.hidden_size}-V{c.vocab_size}@{m.max_len}tok")
    shape_tag = ";".join(dict.fromkeys(shapes))
    lm = None
    lm_path = os.path.join(CACHE, f"lambdamart-{docs}.json")
    if os.path.exists(lm_path):
        from stract_tpu.ranking.models.lambdamart import LambdaMART

        with open(lm_path) as fh:
            lm = LambdaMART.from_json(json.load(fh))
        parts.append("lambdamart")
    return (
        RankingPipeline(recall=RecallStage(dual_encoder=dual, lambdamart=lm),
                        precision=PrecisionStage(cross_encoder=cross)),
        "on(" + "+".join(parts) + ";" + shape_tag + ")",
    )


def build_stack(docs: int):
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # the axon sitecustomize force-registers its platform over the env
        # var; an explicit config update is what actually takes (same fix as
        # the eval tools, round 3)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    try:  # persistent XLA cache: tunnel compiles cost seconds, cache survives runs
        jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 — older jax / unsupported backend
        pass

    # the tunneled TPU can be DOWN for an hour at a stretch: probe it with a
    # bounded tiny dispatch IN A SUBPROCESS (a hung in-process init poisons
    # the backend registry — the platform switch then never takes); on
    # failure fall back to XLA-CPU in the parent BEFORE any backend
    # initializes, and SAY SO in the emitted unit — a labeled CPU number
    # beats a zeroed round
    if os.environ.get("BENCH_ROLE") in (None, "", "main"):
        probe_ok = False
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; (jnp.zeros(8)+1).block_until_ready(); print('OK')"],
                capture_output=True, text=True,
                timeout=min(120.0, max(remaining() * 0.2, 30.0)),
            )
            probe_ok = "OK" in (r.stdout or "")
        except Exception as e:  # noqa: BLE001 — incl. TimeoutExpired
            print(f"device probe failed: {e}", file=sys.stderr)
        if not probe_ok:
            print("TPU unavailable — falling back to XLA-CPU (labeled)", file=sys.stderr)
            _PH["platform"] = "cpu-fallback(tpu-unavailable)"
            os.environ["JAX_PLATFORMS"] = "cpu"
            jax.config.update("jax_platforms", "cpu")

    from stract_tpu.api.server import build_app
    from stract_tpu.bench_corpus import ensure_corpus
    from stract_tpu.index import InvertedIndex
    from stract_tpu.searcher.api import ApiSearcher
    from stract_tpu.searcher.batcher import QueryBatcher
    from stract_tpu.searcher.distributed import LocalShardedSearcher
    from stract_tpu.searcher.local import LocalSearcher

    path = ensure_corpus(CACHE, docs, log=lambda m: print(m, file=sys.stderr))
    index = InvertedIndex(path)
    local = LocalSearcher(index, shard_id=0)
    local.batcher = QueryBatcher(local, max_batch=CONCURRENCY, window_ms=4.0)
    pipeline, pipe_tag = _load_pipeline(docs, index)
    _PH["pipe"] = pipe_tag
    api = ApiSearcher(LocalShardedSearcher([local]), pipeline=pipeline)
    app = build_app(api, max_concurrency=CONCURRENCY)
    return index, local, api, app


def run_http_load(app, queries: list, concurrency: int):
    """Drive the aiohttp app over real HTTP with `concurrency` in-flight
    requests; → (elapsed_s, latencies_ms, n_ok)."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    latencies: list = []

    async def go():
        async with TestClient(TestServer(app)) as client:
            sem = asyncio.Semaphore(concurrency)
            n_ok = 0

            async def one(q):
                nonlocal n_ok
                async with sem:
                    t0 = time.perf_counter()
                    resp = await client.post("/beta/api/search", json={"query": q})
                    body = await resp.json()
                    latencies.append((time.perf_counter() - t0) * 1000)
                    if resp.status == 200 and body.get("type") == "websites":
                        n_ok += 1

            t0 = time.perf_counter()
            await asyncio.gather(*[one(q) for q in queries])
            return time.perf_counter() - t0, n_ok

    # one persistent loop across calls — the aiohttp Application binds to the
    # loop that first serves it, so asyncio.run (fresh loop each call) breaks
    global _LOOP
    try:
        _LOOP
    except NameError:
        _LOOP = asyncio.new_event_loop()
    elapsed, n_ok = _LOOP.run_until_complete(go())
    return elapsed, latencies, n_ok


def cpu_server_loop(app):
    """BENCH_ROLE=cpu_server: serve equal-size query chunks on demand so the
    parent can INTERLEAVE the CPU-baseline arm with the TPU arm (alternating
    same-n chunks, same concurrency, same models — VERDICT r4 item 3). The
    parent writes one line per command: `RUN <n> <conc> <seed>`; each chunk
    answers with one JSON line {"qps", "n", "p50"}. EOF or `QUIT` exits."""
    from stract_tpu.bench_corpus import sample_queries

    sys.stdout.write(json.dumps({"ready": True}) + "\n")
    sys.stdout.flush()
    for line in sys.stdin:
        parts = line.split()
        if not parts or parts[0] == "QUIT":
            break
        n, conc, seed = int(parts[1]), int(parts[2]), int(parts[3])
        qs = sample_queries(np.random.default_rng(seed), n)
        elapsed, lats, n_ok = run_http_load(app, qs, conc)
        sys.stdout.write(json.dumps({
            "qps": n / elapsed, "n": n, "ok": n_ok,
            "p50": float(np.percentile(lats, 50)) if lats else None,
        }) + "\n")
        sys.stdout.flush()
    os._exit(0)


class CpuArm:
    """Parent-side handle on the cpu_server subprocess."""

    def __init__(self, docs: int):
        env = dict(os.environ)
        env.update({
            "BENCH_ROLE": "cpu_server", "JAX_PLATFORMS": "cpu",
            "BENCH_DOCS": str(docs), "BENCH_CACHE": CACHE,
            "BENCH_BUDGET_S": str(max(remaining(), 120.0)),
        })
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1)
        self._ready = False

    def wait_ready(self, timeout_s: float) -> bool:
        import select

        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            r, _, _ = select.select([self.proc.stdout], [], [], 5.0)
            if r:
                line = self.proc.stdout.readline()
                if not line:
                    return False
                try:
                    if json.loads(line).get("ready"):
                        self._ready = True
                        return True
                except ValueError:
                    continue
            if self.proc.poll() is not None:
                return False
        return False

    def run_chunk(self, n: int, conc: int, seed: int, timeout_s: float):
        """→ chunk qps or None (timeout/death). A timeout kills the child —
        the protocol has no way to cancel an in-flight chunk."""
        import select

        try:
            self.proc.stdin.write(f"RUN {n} {conc} {seed}\n")
            self.proc.stdin.flush()
        except (BrokenPipeError, ValueError):
            return None
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            r, _, _ = select.select([self.proc.stdout], [], [], 5.0)
            if r:
                line = self.proc.stdout.readline()
                if not line:
                    return None
                try:
                    return float(json.loads(line)["qps"])
                except (ValueError, KeyError):
                    continue
            if self.proc.poll() is not None:
                return None
        self.close(kill=True)
        return None

    def close(self, kill: bool = False) -> None:
        try:
            if kill:
                self.proc.kill()
            else:
                self.proc.stdin.write("QUIT\n")
                self.proc.stdin.flush()
                self.proc.wait(timeout=10)
        except Exception:  # noqa: BLE001
            try:
                self.proc.kill()
            except Exception:  # noqa: BLE001
                pass


def interleaved_ab(app, cpu: "CpuArm", run_qs_seed: int, reserve_s: float):
    """Alternating equal-n chunks: TPU chunk → CPU chunk → … (≥3 pairs when
    the budget allows). → (tpu_median, cpu_median, note) or (None,)*3.
    Chunk size adapts to the CPU arm's measured speed so the whole A/B fits
    reserve_s; both arms run the same chunk size, query seeds, concurrency."""
    from stract_tpu.bench_corpus import sample_queries

    t_ab = time.monotonic()
    left = lambda: reserve_s - (time.monotonic() - t_ab)
    # probe: smallest chunk on the CPU arm to size the real chunks
    probe_n = 4
    t0 = time.monotonic()
    q0 = cpu.run_chunk(probe_n, min(CONCURRENCY, probe_n), run_qs_seed + 7001,
                       timeout_s=max(left() * 0.45, 60.0))
    if q0 is None or q0 <= 0:
        return None, None, "cpu-arm-failed"
    probe_t = time.monotonic() - t0
    rounds = 3
    # spend ≤ 70% of what's left on CPU chunks, split over `rounds`
    per_chunk_s = max(left() * 0.7 / rounds - 2.0, 10.0)
    chunk = int(max(4, min(64, q0 * per_chunk_s)))
    tpu_meds, cpu_meds = [], []
    for r in range(rounds):
        if r > 0 and left() < (chunk / max(q0, 1e-9)) * 1.3 + 10:
            break  # not enough budget for another CPU chunk
        seed = run_qs_seed + 100 + r
        qs = sample_queries(np.random.default_rng(seed), chunk)
        elapsed, _, _ = run_http_load(app, qs, min(CONCURRENCY, chunk))
        tpu_meds.append(chunk / elapsed)
        cq = cpu.run_chunk(chunk, min(CONCURRENCY, chunk), seed,
                           timeout_s=max(left(), 30.0))
        if cq is None:
            break
        cpu_meds.append(cq)
    if not cpu_meds:
        return None, None, f"cpu-arm-died(probe={probe_t:.0f}s)"
    k = min(len(tpu_meds), len(cpu_meds))
    note = f"interleaved,chunks={k}x{chunk},conc={min(CONCURRENCY, chunk)}"
    return (float(np.median(tpu_meds[:k])), float(np.median(cpu_meds[:k])), note)


# ---- exact host oracle (float64, no early termination, unquantized BM25) ------

def oracle_scores(index, ctx) -> np.ndarray:
    from stract_tpu.ranking import bm25_math as BM
    from stract_tpu.ranking import signals as S
    from stract_tpu.schema import text_field
    from stract_tpu.tokenizer import get_tokenizer
    from stract_tpu.utils.hashing import term_hash
    from stract_tpu.ranking.computer import NGRAM_FIELDS

    seg = index.segments[0]
    n = seg.num_docs
    total_docs = index.num_docs
    text = np.zeros(n)
    req_count = np.zeros(n, dtype=np.int64)
    excluded = np.zeros(n, dtype=bool)
    cand = np.zeros(n, dtype=bool)
    n_terms = max(len(ctx.simple_terms), 1)
    n_req = 0
    bm25_sigs = {s.field: s for s in S.SIGNALS if s.kind == "bm25"}
    idf_sigs = {s.field: s for s in S.SIGNALS if s.kind == "idf_sum"}
    cov_sigs = {s.field: s for s in S.SIGNALS if s.kind == "coverage"}

    def score_slot(fname, tok, scoring):
        f = text_field(fname)
        docs, tfs = seg.postings(term_hash(f.id, tok))
        if len(docs) == 0 or not scoring:
            return docs
        df = len(docs)
        idf = np.log1p((max(total_docs - df, 0) + 0.5) / (df + 0.5))
        avg = seg.avg_field_len(f.id)
        flen = np.maximum(seg.field_lens[f.id][docs].astype(np.float64), 1.0)
        tff = BM.bm25_tf_factor(tfs.astype(np.float64), flen, avg)
        if fname in bm25_sigs:
            text[docs] += ctx.coeff(bm25_sigs[fname]) * idf * tff
        if fname in idf_sigs:
            text[docs] += ctx.coeff(idf_sigs[fname]) * idf
        if fname in cov_sigs:
            text[docs] += ctx.coeff(cov_sigs[fname]) / n_terms
        if fname in S.BM25F_FIELD_COEFFS:
            cf = S.BM25F_FIELD_COEFFS[fname]
            text[docs] += ctx.coeff(S.BM25_F) * idf * BM.bm25f_tf_factor(
                tfs.astype(np.float64), cf, flen, avg)
        return docs

    for g in ctx.groups:
        gd = None
        expand = getattr(g, "expand", None)
        pairs = (
            [(fn, tok) for fn, v in expand(seg) for tok in [v]]
            if expand is not None
            else [
                (fn, tok)
                for fn in g.fields
                for tok in dict.fromkeys(get_tokenizer(text_field(fn).tokenizer).tokenize(g.text))
            ]
        )
        for fname, tok in pairs:
            docs = score_slot(fname, tok, g.scoring and not g.excluded)
            if len(docs):
                cand[docs] = True
                m = np.zeros(n, bool)
                m[docs] = True
                gd = m if gd is None else (gd | m)
        if gd is None:
            gd = np.zeros(n, bool)
        if g.excluded:
            excluded |= gd
        elif g.required:
            n_req += 1
            req_count[gd] += 1

    joined = " ".join(ctx.simple_terms)
    if len(ctx.simple_terms) >= 2:
        for fname in NGRAM_FIELDS:
            f = text_field(fname)
            for tok in dict.fromkeys(get_tokenizer(f.tokenizer).tokenize(joined)):
                docs = score_slot(fname, tok, True)
                if len(docs):
                    cand[docs] = True

    static = _oracle_static(index, ctx)
    scores = text + static
    valid = cand & (req_count == n_req) & ~excluded
    scores = np.where(valid, scores, -np.inf)
    return _oracle_add_slop(index, ctx, scores)


def _oracle_add_slop(index, ctx, scores: np.ndarray) -> np.ndarray:
    """Recall-stage term-distance contribution (ranking/term_distance.py,
    reference stages/recall.rs:311-312), exact for the oracle's top-100 use:
    slop adds at most max_delta = 0.5·(coeff_t + coeff_b) and is always > 0,
    so only docs within max_delta of the pre-slop rank-100 score can enter or
    reorder the top 100 — they get the exact f64 contribution; docs below the
    window can never displace a top-100 entry."""
    from stract_tpu.ranking import signals as S
    from stract_tpu.ranking.term_distance import min_slop_block, score_slop
    from stract_tpu.schema import text_field
    from stract_tpu.tokenizer import get_tokenizer
    from stract_tpu.utils.hashing import term_hash

    terms = ctx.simple_terms
    tokens = (get_tokenizer("default").tokenize(" ".join(terms))
              if len(terms) >= 2 else [])
    if len(tokens) < 2:
        return scores
    coeff_t = ctx.coeff(S.MIN_TITLE_SLOP)
    coeff_b = ctx.coeff(S.MIN_CLEAN_BODY_SLOP)
    max_delta = 0.5 * (coeff_t + coeff_b)
    finite = scores[np.isfinite(scores)]
    if len(finite) == 0:
        return scores
    k = min(100, len(finite))
    s100 = np.partition(finite, -k)[-k]
    cand_docs = np.nonzero(np.isfinite(scores) & (scores >= s100 - max_delta))[0]
    seg = index.segments[0]
    t_slop = min_slop_block(seg, text_field("title").id, tokens, cand_docs, term_hash)
    b_slop = min_slop_block(seg, text_field("clean_body").id, tokens, cand_docs, term_hash)
    scores[cand_docs] += (coeff_t * score_slop(t_slop).astype(np.float64)
                          + coeff_b * score_slop(b_slop).astype(np.float64))
    return scores


_STATIC_CACHE = {}


def _oracle_static(index, ctx) -> np.ndarray:
    from stract_tpu.ranking import bm25_math as BM
    from stract_tpu.ranking import signals as S

    seg = index.segments[0]
    key = id(seg)
    if key not in _STATIC_CACHE:
        col = lambda nm: np.asarray(seg.column(nm), dtype=np.float64)
        st = np.zeros(seg.num_docs)
        st += S.HOST_CENTRALITY.default_coefficient * col("host_centrality")
        st += S.PAGE_CENTRALITY.default_coefficient * col("page_centrality")
        st += S.HOST_CENTRALITY_RANK.default_coefficient * BM.score_rank(col("host_centrality_rank"), np)
        st += S.PAGE_CENTRALITY_RANK.default_coefficient * BM.score_rank(col("page_centrality_rank"), np)
        st += S.IS_HOMEPAGE.default_coefficient * col("is_homepage")
        st += S.FETCH_TIME_MS.default_coefficient * BM.score_fetch_time(col("fetch_time_ms"), np)
        st += S.TRACKER_SCORE.default_coefficient * BM.score_reciprocal(col("tracker_score"))
        st += S.URL_DIGITS.default_coefficient * BM.score_reciprocal(col("num_path_and_query_digits"))
        st += S.URL_SLASHES.default_coefficient * BM.score_reciprocal(col("num_path_and_query_slashes"))
        st += S.LINK_DENSITY.default_coefficient * BM.score_link_density(col("link_density"), np)
        st += S.HAS_ADS.default_coefficient * BM.score_has_ads(col("likely_has_ads"), np)
        _STATIC_CACHE[key] = (st, col("last_updated"))
    st, last_updated = _STATIC_CACHE[key]
    from stract_tpu.ranking import bm25_math as BM2
    from stract_tpu.ranking import signals as S2

    upd = BM2.score_update_timestamp(last_updated, ctx.current_ts or time.time(), np)
    return st + S2.UPDATE_TIMESTAMP.default_coefficient * upd


def _oracle_final_rank(index, ctx, scores: np.ndarray, pipeline) -> np.ndarray:
    """Final f64 oracle ranking with the SAME pipeline stages the engine
    serves (searcher/api/mod.rs:554-642): recall embedding similarity over the
    oracle's top-300 (mirrors RecallStage.apply_many_blocks — coeff × cosine
    from the stored f16 columns, here in f64), then the precision
    cross-encoder over the final top-20 using the engine's own retrieved
    texts and the same model weights. → top-100 doc ids, best first. With no
    pipeline models this is just the base argsort."""
    from stract_tpu.index.inverted import DocPointer
    from stract_tpu.ranking import signals as S

    n_valid = int(np.isfinite(scores).sum())
    if n_valid == 0:
        return np.array([], dtype=np.int64)
    k = max(min(300, n_valid), 1)
    if n_valid > 4 * k:
        # tie-exact top-k without the full-corpus argsort (the 10M stable
        # argsort dominated per-query oracle time): every doc scoring >= the
        # k-th largest value enters the candidate pool, and a stable sort of
        # that pool breaks ties by ascending doc id — byte-identical to the
        # full `np.argsort(-scores, kind="stable")[:k]`.
        kth = np.partition(scores[np.isfinite(scores)], -k)[-k]
        cand = np.nonzero(scores >= kth)[0]
        order = cand[np.argsort(-scores[cand], kind="stable")][:k]
    else:
        order = np.argsort(-scores, kind="stable")[:k]
    sc = scores[order].copy()
    dual = pipeline.recall.dual_encoder if pipeline is not None else None
    emb_sims = {}
    if dual is not None:
        qemb = np.asarray(dual.embed([ctx.raw])[0], dtype=np.float64)
        seg = index.segments[0]
        for name, sig in (("title_embeddings", S.TITLE_EMBEDDING_SIMILARITY),
                          ("keyword_embeddings", S.KEYWORD_EMBEDDING_SIMILARITY)):
            mat = seg.embeddings(name)
            if mat is None:
                continue
            M = np.asarray(mat[order], dtype=np.float64)
            norms = np.linalg.norm(M, axis=1)
            sims = np.where(norms > 1e-6, (M @ qemb) / np.maximum(norms, 1e-6), 0.0)
            emb_sims[sig.id] = sims
            sc = sc + ctx.coeff(sig) * sims
    lm = pipeline.recall.lambdamart if pipeline is not None else None
    if lm is not None:
        # mirror RecallStage.apply_many_blocks feature construction for the
        # oracle's candidate pool: per-signal matrix (engine signal pass, the
        # only producer of the forest's base features), then the slop and
        # embedding-sim columns in the same order the engine writes them,
        # then one forest predict — coeff(lambda_mart) × pred joins the f64
        # sum exactly where signals @ coeffs places it on the engine side
        from stract_tpu.ranking.term_distance import min_slop_block, score_slop
        from stract_tpu.schema import text_field
        from stract_tpu.tokenizer import get_tokenizer
        from stract_tpu.utils.hashing import term_hash

        feats = index.compute_signals_arrays_many(
            [(ctx, np.zeros(len(order), np.int64), order)])[0]
        tokens = (get_tokenizer("default").tokenize(" ".join(ctx.simple_terms))
                  if len(ctx.simple_terms) >= 2 else [])
        if len(tokens) >= 2:
            seg = index.segments[0]
            t_slop = min_slop_block(seg, text_field("title").id, tokens, order, term_hash)
            b_slop = min_slop_block(seg, text_field("clean_body").id, tokens, order, term_hash)
            feats[:, S.MIN_TITLE_SLOP.id] = score_slop(t_slop)
            feats[:, S.MIN_CLEAN_BODY_SLOP.id] = score_slop(b_slop)
        for sid, sims in emb_sims.items():
            feats[:, sid] = sims.astype(np.float32)
        sc = sc + ctx.coeff(S.LAMBDA_MART) * np.asarray(lm.predict(feats), np.float64)
    re = np.argsort(-sc, kind="stable")
    fin = order[re]
    cross = pipeline.precision.cross_encoder if pipeline is not None else None
    if cross is not None and len(fin):
        top = fin[:20]
        docs = index.retrieve([DocPointer(0, int(d)) for d in top], ctx.simple_terms)
        pairs = []
        for d in docs:
            pairs.append((ctx.raw, d.get("snippet", "") or d.get("description", "")))
            pairs.append((ctx.raw, d.get("title", "")))
        cs = np.asarray(cross.score_pairs(pairs), dtype=np.float64)
        head = sc[re][: len(top)] + (
            ctx.coeff(S.CROSS_ENCODER_SNIPPET) * cs[0::2]
            + ctx.coeff(S.CROSS_ENCODER_TITLE) * cs[1::2])
        fin = np.concatenate([top[np.argsort(-head, kind="stable")], fin[len(top):]])
    return fin[:100]


def _engine_top10(local, lss, pipeline, sq, ctx) -> list:
    """The engine's served top-10 for one query through the REAL stage flow
    (the block path of ApiSearcher.search_phase2, minus the cross-shard dedup
    merge the single-shard oracle doesn't model)."""
    block, _ = local.search_blocks_many([sq], 300)[0]
    if pipeline is None or (not pipeline.recall.has_scorers
                            and pipeline.precision.cross_encoder is None
                            and pipeline.precision.lambdamart is None):
        return [int(d) for d in block.sort_desc().doc[:10]]
    if pipeline.recall.has_scorers:
        lss.ensure_blocks_many([(sq, block)])
    ranked = pipeline.rank_recall_many_blocks([(ctx, block)])[0]
    page_block = ranked.take(slice(0, 20))
    lss.ensure_blocks_many([(sq, page_block)])
    page_block.fill_slop_signals()
    page = page_block.to_candidates()
    lss.retrieve(sq, [c for c in page if c.retrieved is None])
    page = pipeline.rank_precision_many([(ctx, page)])[0]
    return [int(c.pointer.doc) for c in page[:10]]


def ndcg_at_10(index, local, lss, queries: list, deadline_s: float | None = None,
               pipeline=None):
    """Served top-10 vs exact f64 oracle AT THE SAME OPERATING POINT (pipeline
    stages applied to both sides with identical model weights — differences
    measure device bf16/q16 quantization, not model reranking): relevance of
    the oracle's rank-r doc is 1/log2(r+2) over its top-100; NDCG@10 averaged
    over queries with hits. Stops at deadline_s — returns (ndcg, n_done)."""
    from stract_tpu.searcher.query import SearchQuery

    vals = []
    for q in queries:
        if deadline_s is not None and time.monotonic() - _T0 > deadline_s:
            break
        sq = SearchQuery(query=q)
        pq = local.parse_query(sq)
        ctx = pq.context()
        oracle = oracle_scores(index, ctx)
        n_valid = int(np.isfinite(oracle).sum())
        if n_valid == 0:
            continue
        top100 = _oracle_final_rank(index, ctx, oracle, pipeline)
        rel = {int(d): 1.0 / np.log2(r + 2) for r, d in enumerate(top100)}
        got = _engine_top10(local, lss, pipeline, sq, ctx)
        dcg = sum(rel.get(d, 0.0) / np.log2(i + 2) for i, d in enumerate(got))
        ideal = sum(
            1.0 / np.log2(r + 2) / np.log2(r + 2) for r in range(min(10, n_valid))
        )
        vals.append(dcg / ideal)
    return (float(np.mean(vals)) if vals else 0.0), len(vals)


def _run_load_chunked(app, queries: list, conc: int, deadline_s: float):
    """HTTP load in chunks so a budget overrun loses at most one chunk; the
    phase globals are updated after every chunk (watchdog-visible)."""
    all_lats: list = []
    tot_elapsed, tot_ok, tot_n = 0.0, 0, 0
    chunk = max(conc * 8, 256)
    for i in range(0, len(queries), chunk):
        if tot_n > 0 and time.monotonic() - _T0 > deadline_s:
            break
        qs = queries[i : i + chunk]
        elapsed, lats, n_ok = run_http_load(app, qs, conc)
        tot_elapsed += elapsed
        tot_ok += n_ok
        tot_n += len(qs)
        all_lats.extend(lats)
        la = np.array(all_lats)
        _PH.update(
            qps=tot_n / tot_elapsed, n_run=tot_n, ok=tot_ok,
            p50=float(np.percentile(la, 50)), p99=float(np.percentile(la, 99)),
        )
    return tot_n


def main():
    from stract_tpu.bench_corpus import sample_queries

    role = os.environ.get("BENCH_ROLE", "main")
    if role != "cpu_server":
        _install_guards()  # the parent owns the cpu_server's lifetime/budget
    docs = pick_docs()
    _PH.update(docs=docs, note="build")
    index, local, api, app = build_stack(docs)

    if role == "cpu_server":
        # warm the CPU arm's compile shapes, then serve chunks on demand
        run_http_load(app, sample_queries(np.random.default_rng(3), 8), 4)
        cpu_server_loop(app)  # never returns

    srch = _source_hash()
    rng = np.random.default_rng(7)
    run_qs = sample_queries(rng, N_QUERIES)

    # phase reserves (s): only reserved when the cached result is absent
    skip_cpu = bool(os.environ.get("BENCH_SKIP_CPU"))
    ptag = _PH["pipe"] + _models_tag(docs)  # model change must invalidate caches
    ab_key = f"cpuab-{docs}-{CONCURRENCY}-{ptag}-{srch}.json"
    ndcg_key = f"ndcg-{docs}-{NDCG_QUERIES}-{ptag}-{srch}.json"
    ab_cached = None if skip_cpu else _cache_get(ab_key)
    ndcg_cached = _cache_get(ndcg_key)
    reserve_cpu = 0.0 if (skip_cpu or ab_cached) else min(700.0, remaining() * 0.45)
    reserve_ndcg = 0.0 if ndcg_cached else min(360.0, remaining() * 0.25)
    margin = 45.0

    # warm: compile the (B, P, L, Kd, K) shape buckets the workload hits — a
    # new shape mid-run costs seconds of XLA compile via the tunnel.
    _PH["note"] = "warm"
    warm_qs = sample_queries(rng, 256)
    run_http_load(app, warm_qs[:64], 8)
    if remaining() > reserve_cpu + reserve_ndcg + margin + 120:
        run_http_load(app, warm_qs, CONCURRENCY)

    _PH["note"] = "load"
    load_deadline = BUDGET_S - reserve_cpu - reserve_ndcg - margin
    _run_load_chunked(app, run_qs, CONCURRENCY, load_deadline)
    _PH["note"] = "load-done"

    # low-concurrency latency: queue-free p50 ≈ service cost (VERDICT r4
    # weak #6 — make the ~30 ms service-cost claim driver-visible)
    if remaining() > reserve_cpu + reserve_ndcg + margin:
        _, lats_c4, _ = run_http_load(app, sample_queries(rng, 64), 4)
        if lats_c4:
            _PH["p50_c4"] = float(np.percentile(lats_c4, 50))

    # the CPU arm boots NOW, overlapping the NDCG phase: its index open +
    # XLA-CPU model compiles take minutes on the 1-core host. It must NOT
    # overlap the load/low-conc phases — a booting sibling steals the single
    # host core and depresses the TPU arm's measured numbers.
    cpu_arm = None if (skip_cpu or ab_cached or remaining() < margin + 90) else CpuArm(docs)

    if ndcg_cached:
        _PH.update(ndcg=ndcg_cached["ndcg"], ndcg_n=ndcg_cached["n"], ndcg_src="cached")
    elif remaining() > reserve_cpu + margin + 30:
        _PH["note"] = "ndcg"
        ndcg, n_done = ndcg_at_10(
            index, local, api.searcher,
            sample_queries(np.random.default_rng(11), NDCG_QUERIES),
            deadline_s=BUDGET_S - reserve_cpu - margin,
            pipeline=api.pipeline,
        )
        if n_done:
            _PH.update(ndcg=ndcg, ndcg_n=n_done, ndcg_src="live")
            if n_done == NDCG_QUERIES:
                _cache_put(ndcg_key, {"ndcg": ndcg, "n": n_done})

    if ab_cached:
        _PH.update(cpu_qps=ab_cached["cpu_med"], tpu_med=ab_cached["tpu_med"],
                   cpu_src="cached", ab_note=ab_cached["note"])
    elif cpu_arm is not None and remaining() > margin + 60:
        _PH["note"] = "interleaved-ab"
        if cpu_arm.wait_ready(timeout_s=max(remaining() * 0.5, 120.0)):
            tpu_med, cpu_med, note = interleaved_ab(
                app, cpu_arm, 7, reserve_s=remaining() - margin)
            if cpu_med:
                _PH.update(cpu_qps=cpu_med, tpu_med=tpu_med, cpu_src="live",
                           ab_note=note)
                _cache_put(ab_key, {"tpu_med": tpu_med, "cpu_med": cpu_med, "note": note})
            else:
                _PH["ab_note"] = note
                print(f"interleaved A/B failed: {note}", file=sys.stderr)
        else:
            print("cpu arm never became ready", file=sys.stderr)
        cpu_arm.close()

    _PH["note"] = "complete"
    emit()


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — ALWAYS emit the one-line JSON:
        # a TPU-backend init failure or tunnel death must degrade the run
        # (phase notes what died), never zero it (the daemon watchdog dies
        # with the process, so an early crash would otherwise print nothing)
        import traceback

        traceback.print_exc()
        _PH["note"] = f"crashed[{_PH.get('note')}]: {type(e).__name__}: {str(e)[:160]}"
        emit(exit_code=1)
