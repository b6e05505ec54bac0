"""External (disk-backed) sort for datasets larger than RAM (role of reference
external_sort.rs). Chunks are sorted in memory, spilled as msgpack runs, and
k-way merged with a heap."""

from __future__ import annotations

import heapq
import os
import struct
import tempfile
from typing import Callable, Iterable, Iterator

import msgpack

_HEADER = struct.Struct(">I")


def _write_run(items: list, key) -> str:
    items.sort(key=key)
    fd, path = tempfile.mkstemp(prefix="extsort-")
    with os.fdopen(fd, "wb") as fh:
        for it in items:
            blob = msgpack.packb(it, use_bin_type=True)
            fh.write(_HEADER.pack(len(blob)) + blob)
    return path


def _read_run(path: str) -> Iterator:
    with open(path, "rb") as fh:
        while True:
            head = fh.read(_HEADER.size)
            if len(head) < _HEADER.size:
                break
            (n,) = _HEADER.unpack(head)
            yield msgpack.unpackb(fh.read(n), raw=False)
    os.unlink(path)


def external_sort(items: Iterable, key: Callable = lambda x: x, chunk_size: int = 100_000) -> Iterator:
    """Yields items in sorted order using bounded memory."""
    runs = []
    chunk: list = []
    for it in items:
        chunk.append(it)
        if len(chunk) >= chunk_size:
            runs.append(_write_run(chunk, key))
            chunk = []
    if not runs:
        chunk.sort(key=key)
        yield from chunk
        return
    if chunk:
        runs.append(_write_run(chunk, key))
    yield from heapq.merge(*(_read_run(r) for r in runs), key=key)
