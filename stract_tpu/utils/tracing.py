"""Tracing/profiling (role of reference tracing-subscriber setup, main.rs:278-288
— plus the XLA profiler, which the reference has no equivalent of; SURVEY §5
flags that gap).

  span("name")            — timed span → log + per-span latency histogram
  device_trace(dir)       — wraps jax.profiler.trace: captures an XLA timeline
                            (TensorBoard-compatible) for kernel-level analysis
  STRACT_TPU_TRACE=dir    — env: trace every `span` into the XLA profiler too
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

from .metrics import PrometheusRegistry

logger = logging.getLogger("stract_tpu")

_registry = PrometheusRegistry()
_span_hists: dict = {}


def setup_logging(level: str | None = None) -> None:
    """Env-filtered logging like RUST_LOG (default stract_tpu=info)."""
    lvl = (level or os.environ.get("STRACT_TPU_LOG", "info")).upper()
    logging.basicConfig(format="%(asctime)s %(levelname)s %(name)s %(message)s")
    logger.setLevel(getattr(logging, lvl, logging.INFO))


def tracing_registry() -> PrometheusRegistry:
    return _registry


@contextlib.contextmanager
def span(name: str, **fields):
    """Timed span; duration recorded to a histogram + debug log."""
    if name not in _span_hists:
        _span_hists[name] = _registry.histogram(f"span_{name}_seconds", f"span {name}")
    t0 = time.perf_counter()
    xla_dir = os.environ.get("STRACT_TPU_TRACE")
    ctx = contextlib.nullcontext()
    if xla_dir:
        import jax.profiler

        ctx = jax.profiler.TraceAnnotation(name)
    with ctx:
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            _span_hists[name].observe(dt)
            logger.debug("span %s %.1fms %s", name, dt * 1000, fields or "")


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA device timeline (view with TensorBoard's profile plugin)."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
