"""Test harness: force CPU with 8 virtual devices so multi-chip sharding code
paths (pjit/shard_map over a Mesh) run on one box, mirroring the reference's
in-process multi-node tests (entrypoint/live_index/tests.rs pattern)."""

import os

# Force CPU (the ambient environment points JAX_PLATFORMS at the tunneled TPU,
# which makes every test compile cross a network hop).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Small device-scoring shapes: tests build tiny corpora; full-size L/K only slow
# down XLA CPU compiles without exercising anything extra.
os.environ.setdefault("STRACT_TPU_L", "128")
os.environ.setdefault("STRACT_TPU_K", "128")

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start; override back to cpu before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_doc(
    url="https://example.com/page",
    title="an example title",
    body="some body text about examples",
    **kw,
):
    """Synthetic prepared document for index tests."""
    from urllib.parse import urlparse

    parsed = urlparse(url)
    site = parsed.netloc
    domain = ".".join(site.split(".")[-2:]) if "." in site else site
    doc = {
        "url": url,
        "title": title,
        "clean_text": body,
        "all_text": body,
        "site": site,
        "domain": domain,
        "domain_name": domain.split(".")[0],
        "host_centrality": 0.0,
        "page_centrality": 0.0,
        "host_centrality_rank": 1,
        "page_centrality_rank": 1,
        "fetch_time_ms": 10,
        "is_homepage": parsed.path in ("", "/"),
    }
    doc.update(kw)
    return doc


@pytest.fixture
def make_doc_fn():
    return make_doc
