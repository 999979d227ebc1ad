"""Cuckoo filter: approximate set membership with deletion support.

The scale-path structure behind the URL-seen set (north_star: "sharded
cuckoo-filter URL-seen set held in an actor pool"). The reference keeps an
exact Go map (internal/queue.go:11-13,92-96); a 10^10-URL frontier cannot,
so each seen shard pairs a cuckoo filter (memory-bounded, small false-
positive rate) with an exact set twin at test scale to verify behavior
(SURVEY.md §2.3 ST1).

Design is the standard Fan et al. 2014 "Cuckoo Filter: Practically Better
Than Bloom" layout (public paper): 4-slot buckets, 16-bit fingerprints,
partial-key cuckoo hashing (alternate bucket = bucket XOR hash(fp)).
~2.3 bytes/URL at 95% load; a 256-node cluster with 64 shards/node holds
10^10 fingerprints in ~44 GiB total.

Only public knowledge used: the paper's algorithm; numpy for storage.
"""

from __future__ import annotations

import zlib

import numpy as np

_FP_MASK = 0xFFFF
_MAX_KICKS = 500


def _h64(data: bytes) -> int:
    """Stable 64-bit hash: crc32 of the bytes + crc32 of the reversed
    bytes (two genuinely different linear maps; crc32 with two init
    seeds differs only by a constant, so equal-length collisions would
    coincide — see stages/fetch._hash_urls)."""
    a = zlib.crc32(data)
    b = zlib.crc32(data[::-1])
    return (a << 32) | b


class CuckooFilter:
    """Fixed-capacity cuckoo filter over byte strings."""

    def __init__(self, capacity: int, bucket_size: int = 4, seed: int = 0):
        # round buckets up to a power of two for cheap masking
        n_buckets = 1
        while n_buckets * bucket_size < capacity:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.seed = seed
        self.table = np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.default_rng(seed)

    # -- internals --------------------------------------------------------
    def _fingerprint_and_index(self, item: str) -> tuple[int, int]:
        h = _h64(item.encode("utf-8"))
        fp = (h & _FP_MASK) or 1          # 0 is the empty marker
        i1 = (h >> 16) & (self.n_buckets - 1)
        return fp, i1

    def _alt_index(self, i: int, fp: int) -> int:
        return (i ^ zlib.crc32(fp.to_bytes(2, "little"))) & (self.n_buckets - 1)

    # -- public API -------------------------------------------------------
    def add(self, item: str) -> bool:
        """Insert; False when the filter is full (caller should resize/shard)."""
        fp, i1 = self._fingerprint_and_index(item)
        i2 = self._alt_index(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict loop
        i = i1 if self._rng.integers(2) else i2
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(self.bucket_size))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._alt_index(i, fp)
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        return False

    def __contains__(self, item: str) -> bool:
        fp, i1 = self._fingerprint_and_index(item)
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def contains_many(self, items: list[str]) -> np.ndarray:
        """Vectorized membership for a batch of items."""
        n = len(items)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return out
        fps = np.empty(n, dtype=np.uint16)
        idx1 = np.empty(n, dtype=np.int64)
        for k, it in enumerate(items):
            fp, i1 = self._fingerprint_and_index(it)
            fps[k] = fp
            idx1[k] = i1
        idx2 = np.empty(n, dtype=np.int64)
        for k in range(n):
            idx2[k] = self._alt_index(int(idx1[k]), int(fps[k]))
        hit1 = (self.table[idx1] == fps[:, None]).any(axis=1)
        hit2 = (self.table[idx2] == fps[:, None]).any(axis=1)
        return hit1 | hit2

    def remove(self, item: str) -> bool:
        fp, i1 = self._fingerprint_and_index(item)
        for i in (i1, self._alt_index(i1, fp)):
            row = self.table[i]
            hits = np.nonzero(row == fp)[0]
            if hits.size:
                row[hits[0]] = 0
                self.count -= 1
                return True
        return False

    @property
    def load_factor(self) -> float:
        return self.count / (self.n_buckets * self.bucket_size)

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, bucket_size: int = 4, seed: int = 0) -> "CuckooFilter":
        table = np.frombuffer(data, dtype=np.uint16).copy()
        n_buckets = table.size // bucket_size
        f = cls(n_buckets * bucket_size, bucket_size, seed)
        f.table = table.reshape(n_buckets, bucket_size)
        f.count = int((f.table != 0).sum())
        return f
