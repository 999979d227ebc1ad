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
import pyarrow as pa
import ray

from ..functions.hashing import crc32_many
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


def shard_of_arrow(url_array, host_array, num_shards: int,
                   salt_k: int = 4) -> np.ndarray:
    """Vectorized twin of :func:`shard_of` (bit-identical routing).

    Host hashes go through a dictionary encode (few unique hosts per
    batch — one scalar crc each); the per-URL salt is the vectorized
    crc32 kernel. No Python loop over rows."""
    if isinstance(host_array, pa.ChunkedArray):
        host_array = host_array.combine_chunks()
    import pyarrow.compute as pc

    enc = pc.dictionary_encode(host_array)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dvals = enc.dictionary.to_pylist()
    dcrc = np.fromiter((zlib.crc32(v.encode("utf-8")) for v in dvals),
                       dtype=np.uint64, count=len(dvals))
    h = dcrc[codes] if len(dvals) else np.zeros(len(host_array), np.uint64)
    if salt_k > 1:
        h = h + (crc32_many(url_array).astype(np.uint64)
                 % np.uint64(salt_k))
    return (h % np.uint64(num_shards)).astype(np.int32)


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
        # round-accept protocol state (offer -> dedup_round -> finalize)
        self._pending: list[pa.Table] = []
        self._offered_round = 0
        self._accepted: pa.Table | None = None

    # -- distributed round-accept protocol --------------------------------
    # The crawl's accept path (reference Push semantics, queue.go:88-114)
    # runs ON the shards: map tasks explode children and `offer` each
    # shard its slice; after the round's stream completes the driver
    # calls `dedup_round` (push-order sort + first-occurrence dedup +
    # seen insert — insert happens HERE, before the budget, preserving
    # the D1 refused-but-seen invariant), collects only slim integer
    # columns to cut the global budget, then `finalize_round` hands each
    # shard its keep-mask + seq numbers. URL strings never aggregate on
    # the driver.

    def offer(self, tbl: pa.Table) -> int:
        """Buffer a candidate slice for this round (routed by shard)."""
        self._pending.append(tbl)
        self._offered_round += tbl.num_rows
        return tbl.num_rows

    def dedup_round(self) -> dict:
        """Resolve buffered candidates: sort by (parent_seq, position) =
        single-worker push order, keep each URL's first occurrence,
        check+insert against the seen set. Accepted full rows stay
        shard-side; returns {slim (parent_seq, position, is_page),
        offered count}."""
        import pyarrow.compute as pc

        offered = self._offered_round
        self._offered_round = 0
        if not self._pending:
            self._accepted = None
            return {"slim": pa.table({
                "parent_seq": pa.array([], pa.int64()),
                "position": pa.array([], pa.int32()),
                "is_page": pa.array([], pa.bool_())}), "offered": offered}
        cand = (pa.concat_tables(self._pending, promote_options="default")
                if len(self._pending) > 1 else self._pending[0])
        self._pending = []
        ps = cand.column("parent_seq").to_numpy(zero_copy_only=False)
        pos = cand.column("position").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, ps))
        cand = cand.take(pa.array(order))
        url_col = cand.column("url").combine_chunks()
        codes = pc.dictionary_encode(url_col).indices.to_numpy(
            zero_copy_only=False)
        _, fi = np.unique(codes, return_index=True)
        fi.sort()
        first_tbl = cand.take(pa.array(fi))
        novel = self.check_and_insert(
            first_tbl.column("url").combine_chunks())
        acc = first_tbl.filter(pa.array(novel))
        self._accepted = acc
        return {"slim": pa.table({
            "parent_seq": acc.column("parent_seq"),
            "position": acc.column("position"),
            "is_page": pc.equal(acc.column("kind"), "page"),
        }), "offered": offered}

    def finalize_round(self, keep: np.ndarray, seqs: np.ndarray) -> dict:
        """Apply the driver's budget cut: ``keep`` aligns with the slim
        table row order; ``seqs`` are the kept rows' seq numbers (in that
        order). Returns the kept frontier rows and the budget-refused
        URLs (which stay in the seen set — D1)."""
        acc = self._accepted
        self._accepted = None
        if acc is None or acc.num_rows == 0:
            return {"kept": None, "refused": None}
        kept = acc.filter(pa.array(keep))
        kept = kept.append_column("seq", pa.array(seqs, pa.int64()))
        refused = None
        if not keep.all():
            refused = acc.filter(pa.array(~keep)).select(["url", "host"])
        return {"kept": kept, "refused": refused}

    def finalize_round_refs(self, keep: np.ndarray, seqs: np.ndarray,
                            step: int = 8192) -> dict:
        """:meth:`finalize_round`, except the kept frontier rows NEVER
        travel to the driver: the shard puts ~``step``-row slices into
        the object store and returns only the refs + row count (plus the
        refused rows, which are budget-bounded small). The refs-mode
        crawl round consumes them via ``ray.data.from_arrow_refs`` —
        this is the 10^10-frontier accept path where the driver holds
        O(shards x blocks) refs, not O(frontier) rows."""
        got = self.finalize_round(keep, seqs)
        kept, refused = got["kept"], got["refused"]
        if kept is None or kept.num_rows == 0:
            return {"kept_refs": [], "n_kept": 0, "refused": refused}
        refs = [ray.put(kept.slice(i, step))
                for i in range(0, kept.num_rows, step)]
        return {"kept_refs": refs, "n_kept": kept.num_rows,
                "refused": refused}

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
        """Arrow-native dedup: URLs stay as Arrow buffers end-to-end; the
        driver's serial cost is vectorized hashing + takes (per-shard
        string materialization runs in parallel inside the actors)."""
        import pyarrow as pa

        n = len(url_array)
        if n == 0:
            return np.zeros(0, dtype=bool)
        sid = shard_of_arrow(url_array, host_array,
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

    # -- distributed round-accept protocol (driver side) -------------------
    def offer_arrow(self, cand: "pa.Table") -> None:
        """Route a candidate table to its shards (vectorized) and buffer
        it there. Called from the driver (seeds) or from inside map
        tasks (the explode stage) — same code either way."""
        if cand.num_rows == 0:
            return
        sid = shard_of_arrow(cand.column("url"), cand.column("host"),
                             self.num_shards, self.salt_k)
        futs = []
        for s in np.unique(sid):
            part = cand.filter(pa.array(sid == s))
            futs.append(self.actors[int(s)].offer.remote(part))
        ray.get(futs)

    def dedup_round_all(self) -> tuple[list, int]:
        """Barrier: every shard resolves its buffered candidates (sort,
        first-occurrence, seen insert). Returns ([slim tables in shard
        order], total offered count)."""
        got = ray.get([a.dedup_round.remote() for a in self.actors])
        return [g["slim"] for g in got], sum(g["offered"] for g in got)

    def finalize_round_all(self, keeps: list[np.ndarray],
                           seqs: list[np.ndarray]) -> tuple[list, list]:
        """Apply the driver's budget cut per shard; returns ([kept
        frontier tables], [refused (url, host) tables])."""
        got = ray.get([
            a.finalize_round.remote(keeps[i], seqs[i])
            for i, a in enumerate(self.actors)])
        kept = [g["kept"] for g in got if g["kept"] is not None
                and g["kept"].num_rows]
        refused = [g["refused"] for g in got if g["refused"] is not None
                   and g["refused"].num_rows]
        return kept, refused

    def finalize_round_all_refs(self, keeps: list[np.ndarray],
                                seqs: list[np.ndarray],
                                step: int = 8192) -> tuple[list, int, list]:
        """Refs-mode budget cut: returns ([object refs to kept frontier
        slices], total kept rows, [refused tables]). The kept rows stay
        in the object store, owned by their shard actors."""
        got = ray.get([
            a.finalize_round_refs.remote(keeps[i], seqs[i], step)
            for i, a in enumerate(self.actors)])
        refs = [r for g in got for r in g["kept_refs"]]
        n = sum(g["n_kept"] for g in got)
        refused = [g["refused"] for g in got if g["refused"] is not None
                   and g["refused"].num_rows]
        return refs, n, refused

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

    def bulk_restore(self, urls, hosts) -> None:
        """Checkpoint-resume re-insert; accepts lists or Arrow arrays
        (vectorized routing either way)."""
        if isinstance(urls, list):
            urls = pa.array(urls, pa.string())
        if isinstance(hosts, list):
            hosts = pa.array(hosts, pa.string())
        if len(urls) == 0:
            return
        sid = shard_of_arrow(urls, hosts, self.num_shards, self.salt_k)
        futs = []
        for s in np.unique(sid):
            idx = np.nonzero(sid == s)[0]
            futs.append(self.actors[int(s)].bulk_restore.remote(
                urls.take(pa.array(idx))))
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
