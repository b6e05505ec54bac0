"""Randomized robustness tests (role of the reference's cargo-fuzz targets:
query_parser, rss, atom, robotstxt — fuzz/fuzz_targets/)."""

import random
import string

import pytest


def _random_text(rng, n, alphabet):
    return "".join(rng.choice(alphabet) for _ in range(n))


ALPHABETS = [
    string.printable,
    'site:intitle:"-!|()γλώσσα中文\\x00 ',
    "".join(chr(c) for c in range(0x20, 0x3000, 37)),
]


def test_query_parser_never_crashes():
    from stract_tpu.query import parse_terms, Query

    rng = random.Random(0)
    for i in range(300):
        q = _random_text(rng, rng.randint(0, 80), rng.choice(ALPHABETS))
        terms = parse_terms(q)
        assert isinstance(terms, list)
        Query.parse(q)  # planning must not crash either


def test_optics_parser_rejects_garbage_gracefully():
    from stract_tpu.optics import Optic
    from stract_tpu.optics.optic import OpticError

    rng = random.Random(1)
    for i in range(200):
        src = _random_text(rng, rng.randint(0, 60), 'Rule{}Matches()Site"*|;,Like ')
        try:
            Optic.parse(src)
        except OpticError:
            pass  # rejection is fine; crashing is not


def test_robots_parser_garbage():
    from stract_tpu.crawler import Robots

    rng = random.Random(2)
    for i in range(100):
        content = _random_text(rng, rng.randint(0, 200), string.printable)
        r = Robots.parse(content)
        r.is_allowed("Bot", "/some/path")


def test_feed_sitemap_zim_garbage():
    from stract_tpu.feed import parse_feed
    from stract_tpu.sitemap import parse_sitemap

    rng = random.Random(3)
    for i in range(50):
        blob = _random_text(rng, rng.randint(0, 300), string.printable + "<>&;")
        parse_feed(blob)
        parse_sitemap(blob)


def test_html_parser_garbage():
    from stract_tpu.webpage import Html

    rng = random.Random(4)
    for i in range(30):
        raw = _random_text(rng, rng.randint(0, 500), string.printable + "<>=/\"'")
        h = Html.parse(raw, "https://x.com/y")
        h.prepare()  # full field extraction must not crash


def test_sonic_rejects_malformed_frames():
    import socket
    import struct

    from stract_tpu.distributed.sonic import serve_in_thread

    class Svc:
        def ping(self, body):
            return "pong"

    srv = serve_in_thread(Svc())
    try:
        # oversized header → server drops the connection without crashing
        s = socket.create_connection(srv.addr, timeout=5)
        s.sendall(struct.pack(">Q", 1 << 50) + b"xxxx")
        s.settimeout(2)
        assert s.recv(1024) == b""  # closed
        s.close()
        # garbage body → error response or clean close, server stays up
        s = socket.create_connection(srv.addr, timeout=5)
        s.sendall(struct.pack(">Q", 4) + b"\xc1\xc1\xc1\xc1")
        s.settimeout(2)
        try:
            s.recv(1024)
        except OSError:
            pass
        s.close()
        # server still serves
        from stract_tpu.distributed.sonic import RemoteClient

        assert RemoteClient(srv.addr).send("ping", None) == "pong"
    finally:
        srv.stop()
