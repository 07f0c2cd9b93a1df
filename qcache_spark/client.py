"""Sharded client: consistent-hash key distribution over multiple
qcache_spark servers.

The reference scales horizontally exactly this way — "Scales linearly
in query capacity with the number of servers. A python client library
that uses consistent hashing for key distribution among servers is
available" (reference README.rst:54-57, pointing at the qcache-client
project). This is a clean-room equivalent for this server: each
dataset key lives on one node chosen by a ketama-style hash ring, so
N independent single-driver servers serve N times the query volume
with no coordination between them.

Design notes:
- The ring places `replicas` md5-derived virtual points per node;
  adding/removing one node remaps only ~1/N of the key space (the
  whole point of consistent hashing vs `hash(key) % N`).
- Failover walks the ring: if a key's primary node is unreachable,
  the request goes to the next DISTINCT node clockwise — the same
  traversal every client instance computes, so all clients agree on
  the fallback node without talking to each other.
- Server-side state is per-node only (each node has its own cache and
  statistics); the client owns placement. This mirrors the reference
  topology, where the servers are shared-nothing.

Everything here is stdlib (hashlib + urllib): the client is intended
to be copy-able into any Python environment that can reach the
servers.
"""
from __future__ import annotations

import bisect
import hashlib
import json
import urllib.error
import urllib.parse
import urllib.request
from typing import Iterable, Iterator, Sequence


def _hash(value: str) -> int:
    """64-bit ring position from md5 (stable across processes,
    machines and Python versions — `hash()` is salted, md5 is not)."""
    return int.from_bytes(hashlib.md5(value.encode("utf-8")).digest()[:8], "big")


class HashRing:
    """Ketama-style consistent-hash ring over opaque node names."""

    def __init__(self, nodes: Sequence[str], replicas: int = 100):
        if not nodes:
            raise ValueError("HashRing needs at least one node")
        if replicas < 1:
            raise ValueError(f"replicas must be >= 1, got {replicas}")
        self.nodes = list(nodes)
        points = []
        for node in self.nodes:
            for i in range(replicas):
                points.append((_hash(f"{node}:{i}"), node))
        points.sort()
        self._points = [p for p, _ in points]
        self._owners = [n for _, n in points]

    def node_for(self, key: str) -> str:
        """The primary node for a key: first ring point clockwise."""
        return next(iter(self.nodes_for(key)))

    def nodes_for(self, key: str) -> Iterator[str]:
        """All nodes in failover order: walk the ring clockwise from
        the key's position, yielding each distinct node once."""
        start = bisect.bisect_left(self._points, _hash(key)) % len(self._points)
        seen = set()
        for i in range(len(self._points)):
            node = self._owners[(start + i) % len(self._points)]
            if node not in seen:
                seen.add(node)
                yield node
            if len(seen) == len(self.nodes):
                return


class NoNodeAvailable(ConnectionError):
    """Every candidate node failed at the transport level."""


class ShardedClient:
    """Route store/query/delete requests across qcache_spark servers
    by consistent hash of the dataset key.

    `base_urls`: e.g. ["http://host1:8888", "http://host2:8888"].
    HTTP-level errors (4xx/5xx) are returned to the caller — they mean
    the node is alive and answered. Only transport-level failures
    (connection refused, DNS, timeout) trigger failover to the next
    ring node.
    """

    def __init__(
        self,
        base_urls: Sequence[str],
        replicas: int = 100,
        url_prefix: str = "/qcache",
        timeout: float = 30.0,
    ):
        self.ring = HashRing([u.rstrip("/") for u in base_urls], replicas)
        self.prefix = "/" + url_prefix.strip("/")
        self.timeout = timeout

    # -------------------------------------------------------- transport

    def _request(self, key: str, method: str, path: str, body, headers):
        last_err: Exception | None = None
        for node in self.ring.nodes_for(key):
            req = urllib.request.Request(
                node + path, data=body, method=method, headers=headers or {}
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return resp.status, resp.read(), dict(resp.headers), node
            except urllib.error.HTTPError as e:
                # the node answered: this is an application-level reply
                return e.code, e.read(), dict(e.headers), node
            except (urllib.error.URLError, ConnectionError, OSError) as e:
                last_err = e  # transport failure: try the next ring node
        raise NoNodeAvailable(f"all nodes failed for key {key!r}") from last_err

    # ------------------------------------------------------- operations

    def store(
        self,
        key: str,
        body: bytes | str,
        content_type: str = "text/csv",
        headers: dict | None = None,
    ):
        """POST a dataset to the key's node. Returns (status, node)."""
        if isinstance(body, str):
            body = body.encode("utf-8")
        h = {"Content-Type": content_type}
        h.update(headers or {})
        status, _, _, node = self._request(
            key, "POST", f"{self.prefix}/dataset/{key}", body, h
        )
        return status, node

    def query(
        self,
        key: str,
        q: dict,
        accept: str = "application/json",
        headers: dict | None = None,
    ):
        """Run a query-dict against the key's node. Returns
        (status, decoded rows or raw bytes, response headers)."""
        h = {"Accept": accept}
        h.update(headers or {})
        qs = urllib.parse.quote(json.dumps(q))
        status, raw, resp_headers, _ = self._request(
            key, "GET", f"{self.prefix}/dataset/{key}?q={qs}", None, h
        )
        if status == 200 and accept == "application/json":
            return status, json.loads(raw), resp_headers
        return status, raw, resp_headers

    def delete(self, key: str):
        """DELETE the dataset from the key's node. Returns status."""
        status, _, _, _ = self._request(
            key, "DELETE", f"{self.prefix}/dataset/{key}", None, {}
        )
        return status
