"""Raft-replicated DHT shard tests (role of reference ampc/dht openraft usage):
election, replicated upserts, leader failover."""

import time

import pytest

from stract_tpu.ampc.raft import start_raft_group
from stract_tpu.ampc.dht import upsert


def wait_for_leader(nodes, timeout=8.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        leaders = [n for n in nodes if n.state == "leader"]
        if len(leaders) == 1:
            return leaders[0]
        time.sleep(0.05)
    raise AssertionError("no single leader elected")


def test_raft_replicated_writes_and_failover():
    nodes, servers, client = start_raft_group(3)
    try:
        leader = wait_for_leader(nodes)

        client.write("batch_set", {"table": "t", "pairs": [(b"k", 1)]})
        client.write("batch_upsert", {"table": "t", "fn": upsert.U64_ADD, "pairs": [(b"k", 41)]})
        assert client.read("batch_get", {"table": "t", "keys": [b"k"]}) == [42]

        # every replica applied the committed log
        time.sleep(0.5)
        for n in nodes:
            assert n.store.tables.get("t", {}).get(b"k") == 42, n.status(None)

        # kill the leader → a new one takes over and writes continue
        idx = nodes.index(leader)
        servers[idx].stop()
        leader._stop.set()
        survivors = [n for i, n in enumerate(nodes) if i != idx]
        new_leader = wait_for_leader(survivors)
        assert new_leader is not leader

        client.write("batch_upsert", {"table": "t", "fn": upsert.U64_ADD, "pairs": [(b"k", 8)]})
        assert client.read("batch_get", {"table": "t", "keys": [b"k"]}) == [50]
    finally:
        for i, s in enumerate(servers):
            try:
                s.stop()
            except Exception:
                pass
        for n in nodes:
            n._stop.set()


def test_raft_log_consistency_after_rejoin():
    nodes, servers, client = start_raft_group(3)
    try:
        wait_for_leader(nodes)
        for i in range(5):
            client.write("batch_upsert", {"table": "c", "fn": upsert.U64_ADD, "pairs": [(b"n", 1)]})
        assert client.read("batch_get", {"table": "c", "keys": [b"n"]}) == [5]
        time.sleep(0.5)
        logs = [len(n.log) for n in nodes]
        assert max(logs) == min(logs), logs
        terms = {n.term for n in nodes}
        assert len(terms) == 1
    finally:
        for s in servers:
            s.stop()
        for n in nodes:
            n._stop.set()
