"""[NEW] Per-host politeness tokens and robots.txt rules.

The reference has NO politeness or robots support (README.md:42-47 lists
them as future work; SURVEY.md §2.3 ST4) — these semantics are our own
spec, pinned here and verified against our own tests:

- **robots**: a host's rules live at ``https://<host>/robots.txt`` in the
  corpus; the body is plain text with ``Disallow: <path-prefix>`` lines
  (only ``User-agent: *`` groups; our crawler matches every agent). A URL
  whose path starts with any disallowed prefix is never fetched: its row
  is emitted with status="skipped", skipped_on="robots", no children.
  Robots-blocked URLs were already inserted into the seen set at enqueue
  (dedup happens first), matching the enqueue-time-seen discipline.
- **tokens**: each host grants ``max_per_host_per_round`` fetches per BFS
  round (a round is the time quantum). Excess frontier rows are NOT
  dropped — they are deferred: they keep their ``seq`` and re-enter the
  next round's frontier ahead of younger rows (priority sort on
  (priority, seq)).

Politeness is OFF by default so reference conformance stays exactly
testable (SURVEY.md §7.2 step 6).

Robots state is held in an actor pool sharded by host-hash; each actor
caches parsed rules per host (fetched once from the corpus backend — the
"stateful map_batches actors" of the north_star). Token accounting is
per-round and computed vectorized over the round's frontier (a groupby
host + rank-by-seq), so it needs no cross-round actor state.
"""

from __future__ import annotations

import zlib

import numpy as np
import ray


def parse_robots(body: str) -> list[str]:
    """Disallow path-prefixes from a robots.txt body (our [NEW] dialect:
    every User-agent group applies)."""
    rules = []
    for line in body.splitlines():
        line = line.split("#", 1)[0].strip()
        if line.lower().startswith("disallow:"):
            prefix = line.split(":", 1)[1].strip()
            if prefix:
                rules.append(prefix)
    return rules


class _RobotsShardImpl:
    """Caches per-host robots rules; answers batched allow/deny checks."""

    def __init__(self, corpus_getter=None):
        # corpus_getter: callable url -> spans|None (plugged by the pipeline;
        # kept injectable so unit tests need no Ray / corpus)
        self._rules: dict[str, list[str]] = {}
        self._corpus_getter = corpus_getter
        self.n_checked = 0
        self.n_blocked = 0

    def _rules_for(self, host: str) -> list[str]:
        if host not in self._rules:
            rules: list[str] = []
            if self._corpus_getter is not None:
                spans = self._corpus_getter(f"https://{host}/robots.txt")
                if spans:
                    body = "".join(s["text"] for s in spans if s["kind"] == "text")
                    rules = parse_robots(body)
            self._rules[host] = rules
        return self._rules[host]

    def preload(self, host_bodies: dict[str, str]) -> None:
        for host, body in host_bodies.items():
            self._rules[host] = parse_robots(body)

    def allowed(self, hosts: list[str], paths: list[str]) -> np.ndarray:
        n = len(hosts)
        self.n_checked += n
        out = np.ones(n, dtype=bool)
        for i, (h, p) in enumerate(zip(hosts, paths)):
            for prefix in self._rules_for(h):
                if p.startswith(prefix):
                    out[i] = False
                    break
        self.n_blocked += int((~out).sum())
        return out

    def stats(self) -> dict:
        return {"hosts_cached": len(self._rules), "checked": self.n_checked,
                "blocked": self.n_blocked}


RobotsShardActor = ray.remote(_RobotsShardImpl)


class RobotsCache:
    """Driver handle over the robots actor pool (sharded by host-hash)."""

    def __init__(self, num_shards: int = 4, corpus_getter=None):
        self.num_shards = num_shards
        self.actors = [
            RobotsShardActor.options(num_cpus=0).remote(corpus_getter)
            for _ in range(num_shards)
        ]

    def _shard(self, host: str) -> int:
        return zlib.crc32(host.encode()) % self.num_shards

    def allowed(self, hosts: list[str], paths: list[str]) -> np.ndarray:
        n = len(hosts)
        if n == 0:
            return np.ones(0, dtype=bool)
        sid = np.fromiter((self._shard(h) for h in hosts), dtype=np.int32, count=n)
        out = np.ones(n, dtype=bool)
        futs = []
        for s in np.unique(sid):
            idx = np.nonzero(sid == s)[0]
            futs.append((idx, self.actors[int(s)].allowed.remote(
                [hosts[i] for i in idx], [paths[i] for i in idx])))
        for idx, fut in futs:
            out[idx] = ray.get(fut)
        return out

    def stats(self) -> list[dict]:
        return ray.get([a.stats.remote() for a in self.actors])

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


def apply_host_tokens(hosts: np.ndarray, seqs: np.ndarray,
                      max_per_host: int) -> np.ndarray:
    """True = fetch this round, False = defer to next round.

    Vectorized per-round token bucket: within each host, the
    ``max_per_host`` lowest-seq rows win (seq order = FIFO fairness).
    """
    n = len(hosts)
    if n == 0 or max_per_host <= 0:
        return np.ones(n, dtype=bool) if max_per_host else np.zeros(n, dtype=bool)
    order = np.lexsort((seqs, hosts))          # sort by host, then seq
    ranks = np.empty(n, dtype=np.int64)
    sorted_hosts = hosts[order]
    new_host = np.ones(n, dtype=bool)
    new_host[1:] = sorted_hosts[1:] != sorted_hosts[:-1]
    # rank within host = position since last host change
    idx = np.arange(n)
    start = np.maximum.accumulate(np.where(new_host, idx, 0))
    ranks[order] = idx - start
    return ranks < max_per_host
