"""Sharded-client tests: consistent-hash ring properties and
end-to-end routing/failover against two live servers (the reference's
horizontal-scaling topology — README.rst:54-57 / qcache-client)."""
from __future__ import annotations

import json

import pytest

from qcache_spark.client import HashRing, NoNodeAvailable, ShardedClient
from qcache_spark.server import make_server, serve_forever_in_thread

KEYS = [f"table_{i}" for i in range(20)]


# ------------------------------------------------------------- ring unit

def test_ring_deterministic_and_complete():
    ring1 = HashRing(["a", "b", "c"])
    ring2 = HashRing(["c", "a", "b"])  # node order must not matter
    for k in KEYS:
        assert ring1.node_for(k) == ring2.node_for(k)
        assert list(ring1.nodes_for(k)) == list(ring2.nodes_for(k))
        assert set(ring1.nodes_for(k)) == {"a", "b", "c"}


def test_ring_spreads_keys():
    ring = HashRing(["a", "b", "c"])
    owners = {ring.node_for(f"key_{i}") for i in range(200)}
    assert owners == {"a", "b", "c"}


def test_ring_minimal_remap_on_node_loss():
    """Consistent hashing's defining property: removing one of three
    nodes remaps ONLY the keys that lived on it."""
    big = HashRing(["a", "b", "c"])
    small = HashRing(["a", "b"])
    keys = [f"key_{i}" for i in range(300)]
    for k in keys:
        if big.node_for(k) != "c":
            assert small.node_for(k) == big.node_for(k)
    # and the failover target precomputed by the full ring is exactly
    # where the shrunken ring places the key
    for k in keys:
        order = list(big.nodes_for(k))
        if order[0] == "c":
            assert small.node_for(k) == order[1]


def test_ring_rejects_bad_args():
    with pytest.raises(ValueError):
        HashRing([])
    with pytest.raises(ValueError):
        HashRing(["a"], replicas=0)


# ------------------------------------------------------------ end-to-end

@pytest.fixture()
def two_servers(spark):
    servers = [make_server(spark, max_cache_size=1 << 30) for _ in range(2)]
    for s in servers:
        serve_forever_in_thread(s)
    urls = [f"http://127.0.0.1:{s.server_address[1]}" for s in servers]
    yield servers, urls
    for s in servers:
        try:
            s.shutdown()
        except Exception:
            pass


def _csv(i):
    return f"foo,bar\n1,{i}\n2,{i * 10}\n"


def test_sharded_store_query_delete(two_servers):
    servers, urls = two_servers
    client = ShardedClient(urls)

    placed = {}
    for i, key in enumerate(KEYS):
        status, node = client.store(key, _csv(i))
        assert status == 201
        placed[key] = node
    # placement is the ring's placement, and both nodes hold data
    for key in KEYS:
        assert placed[key] == client.ring.node_for(key)
    assert set(placed.values()) == set(urls)

    for i, key in enumerate(KEYS):
        status, rows, headers = client.query(key, {"where": ["==", "foo", 1]})
        assert status == 200
        assert rows == [{"foo": 1, "bar": i}]
        assert headers["X-QCache-unsliced-length"] == "1"

    # a dataset lives ONLY on its ring node: any other node 404s it
    key = KEYS[0]
    other = next(u for u in urls if u != placed[key])
    solo = ShardedClient([other])
    status, _, _ = solo.query(key, {})
    assert status == 404

    assert client.delete(key) == 200
    status, _, _ = client.query(key, {})
    assert status == 404


def test_sharded_failover_to_surviving_node(two_servers):
    servers, urls = two_servers
    client = ShardedClient(urls)

    # kill node 0; keys whose primary was node 0 fail over to node 1
    victim_url = urls[0]
    down_keys = [k for k in KEYS if client.ring.node_for(k) == victim_url]
    assert down_keys  # 20 keys across 2 nodes: some land on each
    servers[0].shutdown()
    servers[0].server_close()

    key = down_keys[0]
    status, node = client.store(key, _csv(99))
    assert status == 201
    assert node == urls[1]
    status, rows, _ = client.query(key, {"select": [["count"]]})
    assert status == 200 and rows == [{"count": 2}]


def test_all_nodes_down_raises(spark):
    # ports from servers we immediately close: nothing listens there
    s1 = make_server(spark)
    s2 = make_server(spark)
    urls = [f"http://127.0.0.1:{s.server_address[1]}" for s in (s1, s2)]
    s1.server_close()
    s2.server_close()
    client = ShardedClient(urls, timeout=2.0)
    with pytest.raises(NoNodeAvailable):
        client.store("k", "a\n1\n")
