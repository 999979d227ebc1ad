"""Sharded URL-seen set: the distributed twin of Queue.seen.

The reference's seen-set is one Go map guarded by a mutex
(internal/queue.go:11-16, dedup at 92-96). At 10^10 URLs that is a
sharded actor pool: each shard holds a cuckoo filter (scale path) and/or
an exact Python set (ground-truth twin, used for conformance), and the
dedup stage routes each candidate batch to its shard with ONE batched
``check_and_insert`` RPC (SURVEY.md §2.4: anti-semi-join via actor RPC).

Shard routing is a *salted host-hash* (north_star): shard =
(crc32(host) + crc32(url) % salt_k) % num_shards. With salt_k == 1 this
is pure host-sharding; salt_k > 1 spreads a hot host over salt_k shards
while staying deterministic (the same URL always routes to the same
shard, so membership stays consistent). Because the reference's same-host
filter confines a crawl to the seed host (internal/pageparser.go:45-47),
the seed host IS the hot host and salting is load-bearing, not optional.

``check_and_insert`` preserves list order and applies first-occurrence-
wins within the batch, mirroring single-push semantics (queue.go:92-96).
"""

from __future__ import annotations

import zlib

import numpy as np
import ray

from .cuckoo import CuckooFilter


def shard_of(url: str, host: str, num_shards: int, salt_k: int = 4) -> int:
    """Deterministic salted host-hash shard routing."""
    h = zlib.crc32(host.encode("utf-8"))
    if salt_k > 1:
        h += zlib.crc32(url.encode("utf-8")) % salt_k
    return h % num_shards


def shard_of_many(urls, hosts, num_shards: int, salt_k: int = 4) -> np.ndarray:
    out = np.empty(len(urls), dtype=np.int32)
    for i, (u, h) in enumerate(zip(urls, hosts)):
        out[i] = shard_of(u, h, num_shards, salt_k)
    return out


class _SeenShardImpl:
    """One shard: exact set and/or cuckoo filter. Pure Python (testable
    without Ray); the actor below is a thin wrapper."""

    def __init__(self, mode: str = "exact", cuckoo_capacity: int = 1 << 20,
                 shard_id: int = 0):
        if mode not in ("exact", "cuckoo", "both"):
            raise ValueError(f"bad seen-shard mode {mode!r}")
        self.mode = mode
        self.shard_id = shard_id
        self.exact: set[str] | None = set() if mode in ("exact", "both") else None
        self.cuckoo: CuckooFilter | None = (
            CuckooFilter(cuckoo_capacity, seed=shard_id)
            if mode in ("cuckoo", "both") else None
        )
        self.n_checked = 0
        self.n_inserted = 0

    def check_and_insert(self, urls) -> np.ndarray:
        """For each url IN ORDER: True if newly inserted (never seen),
        False if already seen. First occurrence within the list wins.

        Accepts a list[str] or a pyarrow Array (callers ship Arrow so the
        string deserialization happens HERE, inside the shard actor, in
        parallel across shards — not serially on the driver)."""
        if not isinstance(urls, list):
            urls = urls.to_pylist()
        n = len(urls)
        self.n_checked += n
        out = np.zeros(n, dtype=bool)
        if self.mode == "cuckoo":
            # vectorized pre-check, then ordered insert of the misses
            pre = self.cuckoo.contains_many(urls)
            inbatch: set[str] = set()
            for i, u in enumerate(urls):
                if pre[i] or u in inbatch:
                    continue
                inbatch.add(u)
                out[i] = self.cuckoo.add(u)
        else:
            ex = self.exact
            for i, u in enumerate(urls):
                if u not in ex:
                    ex.add(u)
                    out[i] = True
                    if self.cuckoo is not None:
                        self.cuckoo.add(u)
        self.n_inserted += int(out.sum())
        return out

    def contains(self, urls: list[str]) -> np.ndarray:
        if self.exact is not None:
            return np.fromiter((u in self.exact for u in urls), dtype=bool,
                               count=len(urls))
        return self.cuckoo.contains_many(urls)

    def bulk_restore(self, urls) -> int:
        """Re-insert without reporting novelty (checkpoint resume)."""
        if not isinstance(urls, list):
            urls = urls.to_pylist()
        if self.exact is not None:
            self.exact.update(urls)
        if self.cuckoo is not None:
            for u in urls:
                if u not in self.cuckoo:
                    self.cuckoo.add(u)
        return len(urls)

    def size(self) -> int:
        return len(self.exact) if self.exact is not None else self.cuckoo.count

    def snapshot(self) -> list[str]:
        if self.exact is None:
            raise RuntimeError("cuckoo-only shard has no exact snapshot")
        return sorted(self.exact)

    def stats(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "size": self.size(),
            "checked": self.n_checked,
            "inserted": self.n_inserted,
            "cuckoo_load": self.cuckoo.load_factor if self.cuckoo else None,
        }


SeenShardActor = ray.remote(_SeenShardImpl)


class ShardedSeenSet:
    """Driver-side handle over the shard actor pool.

    At scale each map task talks straight to its shard actor (batched RPC
    from inside map_batches / map_groups); this handle is the driver
    convenience + checkpoint surface.
    """

    def __init__(self, num_shards: int = 8, mode: str = "exact",
                 salt_k: int = 4, cuckoo_capacity: int = 1 << 20):
        self.num_shards = num_shards
        self.salt_k = salt_k
        self.mode = mode
        self.actors = [
            SeenShardActor.options(num_cpus=0).remote(
                mode=mode, cuckoo_capacity=cuckoo_capacity, shard_id=i)
            for i in range(num_shards)
        ]

    def shard_ids(self, urls: list[str], hosts: list[str]) -> np.ndarray:
        return shard_of_many(urls, hosts, self.num_shards, self.salt_k)

    def check_and_insert(self, urls: list[str], hosts: list[str]) -> np.ndarray:
        """Ordered first-push-wins dedup across all shards (one RPC per
        shard touched, all in flight concurrently)."""
        n = len(urls)
        if n == 0:
            return np.zeros(0, dtype=bool)
        sid = self.shard_ids(urls, hosts)
        out = np.zeros(n, dtype=bool)
        futures = {}
        for s in np.unique(sid):
            idx = np.nonzero(sid == s)[0]
            futures[int(s)] = (idx, self.actors[int(s)].check_and_insert.remote(
                [urls[i] for i in idx]))
        for s, (idx, fut) in futures.items():
            out[idx] = ray.get(fut)
        return out

    def check_and_insert_arrow(self, url_array, host_array) -> np.ndarray:
        """Arrow-native dedup: URLs stay as Arrow buffers end-to-end; each
        shard actor does its own to_pylist, so the driver's serial cost is
        hashing + takes (the per-shard string materialization runs in
        parallel inside the actors)."""
        import pyarrow as pa

        n = len(url_array)
        if n == 0:
            return np.zeros(0, dtype=bool)
        sid = shard_of_many(url_array.to_pylist(), host_array.to_pylist(),
                            self.num_shards, self.salt_k)
        out = np.zeros(n, dtype=bool)
        futures = []
        for s in np.unique(sid):
            idx = np.nonzero(sid == s)[0]
            futures.append((idx, self.actors[int(s)].check_and_insert.remote(
                url_array.take(pa.array(idx)))))
        for idx, fut in futures:
            out[idx] = ray.get(fut)
        return out

    def contains(self, urls: list[str], hosts: list[str]) -> np.ndarray:
        n = len(urls)
        if n == 0:
            return np.zeros(0, dtype=bool)
        sid = self.shard_ids(urls, hosts)
        out = np.zeros(n, dtype=bool)
        futs = []
        for s in np.unique(sid):
            idx = np.nonzero(sid == s)[0]
            futs.append((idx, self.actors[int(s)].contains.remote(
                [urls[i] for i in idx])))
        for idx, fut in futs:
            out[idx] = ray.get(fut)
        return out

    def bulk_restore(self, urls: list[str], hosts: list[str]) -> None:
        sid = self.shard_ids(urls, hosts)
        futs = []
        for s in np.unique(sid):
            idx = np.nonzero(sid == s)[0]
            futs.append(self.actors[int(s)].bulk_restore.remote(
                [urls[i] for i in idx]))
        ray.get(futs)

    def total_size(self) -> int:
        return sum(ray.get([a.size.remote() for a in self.actors]))

    def stats(self) -> list[dict]:
        return ray.get([a.stats.remote() for a in self.actors])

    def snapshot(self) -> list[str]:
        parts = ray.get([a.snapshot.remote() for a in self.actors])
        return sorted(u for p in parts for u in p)

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
