"""Raft-replicated DHT shard tests (role of reference ampc/dht openraft usage):
election, replicated upserts, leader failover."""

import time

import pytest

from stract_tpu.ampc.raft import start_raft_group
from stract_tpu.ampc.dht import upsert


def wait_for_leader(nodes, timeout=20.0):
    # generous: the suite shares ONE host core, so election timers stall
    # under load (observed flake: 10s was not enough mid-suite)
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


def test_no_spurious_elections_with_dead_follower():
    """Liveness: with one DEAD follower, the leader's heartbeats to the live
    followers must keep flowing (per-peer replicator threads) — the term must
    not advance while writes continue (regression: a synchronous heartbeat
    broadcast blocked ~2s on the dead peer every cycle and the live followers
    timed out)."""
    nodes, servers, client = start_raft_group(5)
    try:
        leader = wait_for_leader(nodes)
        # kill one FOLLOWER
        dead = next(i for i, n in enumerate(nodes) if n is not leader)
        servers[dead].stop()
        nodes[dead]._stop.set()
        time.sleep(0.3)
        term0 = leader.term
        # sustained writes for > several election timeouts
        t_end = time.monotonic() + 2.0
        k = 0
        while time.monotonic() < t_end:
            client.write("batch_set", {"table": "t", "pairs": [(f"k{k}".encode(), k)]})
            k += 1
        assert k > 10
        live = [n for i, n in enumerate(nodes) if i != dead]
        new_leader = wait_for_leader(live)
        assert new_leader is leader, "leadership must be stable with one dead follower"
        assert leader.term == term0, f"term advanced {term0} -> {leader.term} (spurious election)"
        assert client.read("batch_get", {"table": "t", "keys": [b"k0"]}) == [0]
    finally:
        for s in servers:
            try:
                s.stop()
            except Exception:
                pass
        for n in nodes:
            n._stop.set()


def test_partitioned_leader_steps_down_and_rejoins():
    """5-node group: fully partition the leader (inbound server stopped AND
    outbound clients black-holed) — a new leader wins among the 4 and writes
    continue; on heal, the old leader hears the higher term through its own
    outbound RPCs and steps down."""
    nodes, servers, client = start_raft_group(5)
    try:
        leader = wait_for_leader(nodes)
        idx = nodes.index(leader)
        servers[idx].stop()  # inbound cut
        saved_addrs = {nid: c.addr for nid, c in leader.peers.items()}
        for c in leader.peers.values():  # outbound black-holed
            c.close()
            c.addr = ("127.0.0.1", 1)
        others = [n for i, n in enumerate(nodes) if i != idx]
        new_leader = wait_for_leader(others, timeout=30.0)
        assert new_leader is not leader
        client.write("batch_set", {"table": "p", "pairs": [(b"x", 7)]})
        assert client.read("batch_get", {"table": "p", "keys": [b"x"]}) == [7]
        # heal outbound: the old leader's own RPCs return the higher term
        for nid, c in leader.peers.items():
            c.close()
            c.addr = saved_addrs[nid]
        deadline = time.monotonic() + 6.0
        while time.monotonic() < deadline and leader.state == "leader":
            time.sleep(0.1)
        assert leader.state != "leader", "healed ex-leader must step down"
        assert leader.term >= new_leader.term - 1
    finally:
        for s in servers:
            try:
                s.stop()
            except Exception:
                pass
        for n in nodes:
            n._stop.set()
