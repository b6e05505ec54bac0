"""sonic wire-format property tests + concurrent-streaming stress.

Role of the reference's proptest round-trips for sonic messages
(distributed/sonic/mod.rs:304-387) and of the connection-pool reuse
invariants: a pooled connection must never be handed to a second request
while a stream is still being drained.
"""

import threading

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from stract_tpu.distributed.sonic import (
    RemoteClient,
    StreamingResponse,
    pack,
    serve_in_thread,
    unpack,
)

# ---- pack/unpack round-trip properties --------------------------------------

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False),
    st.text(max_size=64),
    st.binary(max_size=64),
)

np_dtypes = st.sampled_from(["<i4", "<i8", "<u8", "<f4", "<f8", "|u1"])


@st.composite
def np_arrays(draw):
    dtype = np.dtype(draw(np_dtypes))
    shape = tuple(draw(st.lists(st.integers(0, 8), min_size=0, max_size=3)))
    n = int(np.prod(shape)) if shape else 1
    if dtype.kind == "f":
        vals = draw(st.lists(st.floats(-1e30, 1e30, allow_nan=False), min_size=n, max_size=n))
    else:
        info = np.iinfo(dtype)
        vals = draw(st.lists(st.integers(int(info.min), int(info.max)), min_size=n, max_size=n))
    return np.array(vals, dtype=dtype).reshape(shape)


messages = st.recursive(
    st.one_of(scalars, np_arrays()),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=16), children, max_size=4),
    ),
    max_leaves=12,
)


def _eq(a, b):
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return (
            isinstance(a, np.ndarray)
            and isinstance(b, np.ndarray)
            and a.dtype == b.dtype
            and a.shape == b.shape
            and bool(np.array_equal(a, b))
        )
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_eq(a[k], b[k]) for k in a)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    return a == b


@settings(max_examples=200, deadline=None)
@given(messages)
def test_pack_unpack_roundtrip(msg):
    assert _eq(unpack(pack(msg)), msg)


@settings(max_examples=100, deadline=None)
@given(np_arrays())
def test_ndarray_roundtrip_exact(arr):
    out = unpack(pack(arr))
    assert out.dtype == arr.dtype and out.shape == arr.shape
    assert np.array_equal(out, arr)


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=256))
def test_unpack_garbage_never_hangs(data):
    try:
        unpack(data)
    except Exception:
        pass  # any exception is fine; hangs/crashes are not


# ---- concurrent streaming over one pooled client ----------------------------


class _StreamService:
    def echo(self, body):
        return body

    def stream_range(self, body):
        n = body["n"]
        tag = body["tag"]
        return StreamingResponse({"tag": tag, "i": i} for i in range(n))


@pytest.fixture(scope="module")
def stream_server():
    srv = serve_in_thread(_StreamService())
    yield srv
    srv.stop()


def test_concurrent_streaming_no_interleave(stream_server):
    """16 threads × mixed stream/unary calls through ONE pooled client: every
    stream must come back complete, ordered, and tagged with its own id
    (regression: the pool used to release the socket before draining)."""
    client = RemoteClient(stream_server.addr)
    errors = []

    def worker(tid):
        try:
            for r in range(20):
                if (tid + r) % 3 == 0:
                    got = client.send("echo", {"tag": tid, "r": r})
                    assert got == {"tag": tid, "r": r}, got
                else:
                    n = 5 + (r % 7)
                    chunks = client.send("stream_range", {"n": n, "tag": tid})
                    assert [c["i"] for c in chunks] == list(range(n)), chunks
                    assert all(c["tag"] == tid for c in chunks), chunks
        except Exception as e:  # noqa: BLE001 — collected for the main thread
            errors.append((tid, repr(e)))

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    client.close()
    assert not errors, errors


def test_stream_single_chunk_and_empty(stream_server):
    client = RemoteClient(stream_server.addr)
    assert [c["i"] for c in client.send("stream_range", {"n": 1, "tag": 0})] == [0]
    client.close()
