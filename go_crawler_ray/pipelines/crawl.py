"""The crawl pipeline: a driver BFS-round loop over Ray Data stages.

Architecture (SURVEY.md §7.1):

```
seeds -> frontier_0
round k (ONE fused streaming execution over the round's frontier):
  [1] fetch:   map_batches(FetchFn)    corpus lookup, size gate, retry
  [2] parse:   map_batches(ParseFn)    spans -> canonicalized children
  [3] save:    map_batches(SaveFn)     save_path + localized content;
               full doc rows stream to partitioned parquet WORKER-side
  [4] explode: map_batches(ExplodeOfferFn)  children -> candidate rows,
               vectorized crc32 shard routing, batched offer() RPCs to
               the seen shards (candidates buffer SHARD-side)
      (stream consumed = round barrier — level-synchronized BFS)
  [5] dedup:   shards resolve in parallel — push-order sort, first-
               occurrence per URL, seen insert (queue.go:92-96); the
               driver receives only (parent_seq, position, is_page) ints
  [6] budget+seq: driver cumsum over the slim ints — enqueue-time page
               budget AFTER seen-insert (queue.go:101-106); shards then
               materialize their kept frontier rows (refused pages stay
               seen: the D1 invariant)
  [7] politeness [NEW]: robots filter + per-host tokens; excess deferred
  frontier_{k+1} + delta checkpoint (visit/seen-extra deltas + manifest)
until frontier and deferral queue empty, or page budget exhausted+drained
```

Determinism: the reference's canonical order is single-worker FIFO BFS
(internal/queue.go:49,108). We reproduce it exactly by (a) level-
synchronized rounds, (b) sorting each round's candidates by
(parent_seq, position) before dedup/budget/seq assignment, (c) assigning
``seq`` densely in that order. Fan-out order inside a round is then free
for Ray to parallelize — conformance is on the seq-sorted result, never
on physical block order (SURVEY.md §7.3).

Termination: the reference's pendingAckCount quiescence (queue.go:116-129)
becomes "round accepted zero candidates and nothing is deferred".

Worker-side state amortization: heavy per-stage state (corpus hash index,
canonicalizer memo) lives in module-level caches keyed by the broadcast
object ref — Ray reuses worker processes across rounds, so each worker
builds its index ONCE per crawl, not once per round. The broadcast itself
is a single ``ray.put`` (zero-copy reads from the object store).

Scale notes (10^10-URL frontier): every per-round dataset here is bounded
by the round's frontier slice (politeness caps it), never the whole
frontier. Candidate URL strings never aggregate on the driver: they flow
map task -> seen shard -> (kept rows only) frontier; per-round driver
state is O(accepted) integer columns plus the assembled next frontier.
Docs stream straight to partitioned Parquet per round (resumable); the
corpus side would swap InMemoryCorpusBackend for
PartitionedCorpusBackend. With ``CrawlConfig.frontier_refs=True`` the
inter-round frontier itself is object-store-resident too: seen shards
put kept slices, rounds consume ``rd.from_arrow_refs``, checkpoints are
written by Ray tasks — the driver holds only refs + counts (the last
driver-resident structure, now optional; table mode remains the default
for small conformance crawls). Equivalence is pinned by
tests/test_resume_politeness.py::TestFrontierRefs.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions.retry import RetryConfig
from ..functions.urlnorm import host_of
from ..stages.fetch import FetchStage
from ..stages.parse import ParseStage, explode_children
from ..stages.save import SaveStage
from ..state.politeness import RobotsCache, apply_host_tokens, parse_robots
from ..state.seen import ShardedSeenSet

# ---------------------------------------------------------------------------
# per-worker stage-state caches (amortized across rounds via worker reuse)

_FETCH_CACHE: dict = {}
_PARSE_CACHE: dict = {}
_SAVE_CACHE: dict = {}


@dataclass
class CrawlConfig:
    max_count: int = 100                 # page budget (CRAWLER_MAX_COUNT default, config.go:29)
    max_file_size: int | None = 64 << 20  # HEAD gate (config.go:37)
    num_seen_shards: int = 8
    salt_k: int = 4                      # hot-host salting of seen shards
    seen_mode: str = "exact"             # exact | cuckoo | both
    politeness_max_per_host: int | None = None   # None/0 = off (reference mode)
    robots: bool = False                 # [NEW]
    strict_rfc3986: bool = True
    checkpoint_dir: str | None = None
    fetch_concurrency: int = 4
    batch_size: int = 2048
    max_rounds: int = 10_000
    retry_attempts: int = 3
    retry_delay: float = 0.0             # 0 in tests; 1.0 mirrors reference default
    transient_fail_rate: float = 0.0
    localize: bool = True                # run the T1 transform in save
    enrich_docs: bool = False            # + fingerprint/n_tokens per doc
    # fetch returns raw HTML bytes and parse runs the REAL extractor over
    # them (pkg/htmlparser path) instead of reading corpus span metadata;
    # BFS order/seen set are byte-identical in both modes (conformance-
    # tested) because render→extract is the hash-verified round-trip
    parse_html: bool = False
    write_docs: bool = True
    # materialize the full seen set into CrawlResult.seen at the end.
    # Default OFF: snapshotting 10^10 URLs onto the driver is exactly what
    # the sharded design avoids. Conformance/tests opt in explicitly.
    snapshot_seen: bool = False
    # [NEW] priority frontier: callable (accepted-candidates pa.Table) ->
    # int32 ndarray; lower = fetched earlier. None = 0 for all (pure FIFO,
    # the reference-conformant order)
    priority_fn: object = None
    # frontier ordering runs on the driver below this row count (vectorized
    # lexsort); above it, the sort becomes a Ray Data sort shuffle — the
    # groupby/sort path of the north-star design for frontiers that exceed
    # driver memory
    driver_sort_threshold: int = 2_000_000
    # [NEW] object-store-resident frontier: the accepted rows NEVER land
    # on the driver — seen shards put kept slices into the object store
    # and the round consumes them via ray.data.from_arrow_refs; visit
    # deltas and frontier checkpoints are written by Ray tasks
    # worker-side. The driver holds only refs + counts: this is the
    # 10^10-frontier regime (VERDICT r2 #5) and the DEFAULT since round
    # 4 (robots now evaluates worker-side in the fetch stage, so the
    # scale mode supports the full feature set). Semantics are
    # identical to table mode (equivalence-tested); CrawlResult.
    # visit_order is still materialized at the END for presentation —
    # at true scale read the checkpoint delta chain instead.
    # frontier_refs=False keeps the driver-table mode (small crawls,
    # and the equivalence baseline in tests).
    frontier_refs: bool = True


class _FetchFn:
    """Picklable wrapper: heavy backend comes from the per-worker cache."""

    def __init__(self, corpus_ref, cfg: CrawlConfig, robots_ref=None):
        self.corpus_ref = corpus_ref
        self.max_file_size = cfg.max_file_size
        self.retry_attempts = cfg.retry_attempts
        self.retry_delay = cfg.retry_delay
        self.transient_fail_rate = cfg.transient_fail_rate
        self.emit_content = cfg.parse_html
        self.robots_ref = robots_ref    # {host: [prefix]} broadcast or None

    def _stage(self) -> FetchStage:
        key = (self.corpus_ref.hex(), self.emit_content,
               self.robots_ref.hex() if self.robots_ref is not None else "")
        st = _FETCH_CACHE.get(key)
        if st is None:
            st = FetchStage(
                self.corpus_ref,
                max_file_size=self.max_file_size,
                retry_config=RetryConfig(max_attempts=self.retry_attempts,
                                         delay=self.retry_delay,
                                         jitter_factor=0.0),
                transient_fail_rate=self.transient_fail_rate,
                emit_content=self.emit_content,
                robots_rules=(ray.get(self.robots_ref)
                              if self.robots_ref is not None else None),
            )
            _FETCH_CACHE[key] = st
        return st

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._stage()(batch)


class _ParseFn:
    def __init__(self, strict: bool, parse_html: bool = False):
        self.key = (strict, parse_html)

    def __call__(self, batch: pa.Table) -> pa.Table:
        st = _PARSE_CACHE.get(self.key)
        if st is None:
            st = _PARSE_CACHE[self.key] = ParseStage(*self.key)
        return st(batch)


class _SaveFn:
    """Save stage; with ``out_dir`` set, each batch writes its full docs
    rows (content included) straight to a parquet part file from the
    WORKER and returns only the slim columns — document content never
    crosses to the driver (at 100 TB it can't). Part files are uuid-named:
    a task retry may leave a duplicate part; readers needing exactly-once
    dedupe on (doc_id) which is unique per crawl."""

    def __init__(self, strict: bool, localize: bool,
                 out_dir: str | None = None, round_no: int = 0,
                 enrich: bool = False):
        self.key = (strict, localize, enrich)
        self.out_dir = out_dir
        self.round_no = round_no

    def __call__(self, batch: pa.Table) -> pa.Table:
        st = _SAVE_CACHE.get(self.key)
        if st is None:
            st = _SAVE_CACHE[self.key] = SaveStage(
                self.key[0], self.key[1], enrich=self.key[2])
        out = st(batch)
        if self.out_dir is not None and out.num_rows:
            import uuid

            full = out.rename_columns(
                ["doc_id" if c == "url" else c for c in out.column_names])
            full = full.drop_columns(["children", "span_canon"])
            full = full.append_column(
                "round", pa.array(
                    np.full(full.num_rows, self.round_no, dtype=np.int32)))
            pq.write_table(full, os.path.join(
                self.out_dir,
                f"round-{self.round_no:05d}-{uuid.uuid4().hex[:12]}.parquet"))
            out = out.drop_columns(
                [c for c in ("content", "spans", "span_canon")
                 if c in out.column_names])
        return out


class _ExplodeOfferFn:
    """Final fused stage: explode each doc row's children into candidate
    rows (M5 flat-map), route them to the seen shards with the vectorized
    crc32 kernel, and buffer them shard-side (`offer`). The accept path's
    per-row work — explode, hashing, string shipping — runs in the map
    tasks; the driver later cuts only slim integer columns (see
    state/seen.py round protocol). Output = the doc batch without the
    children column."""

    def __init__(self, seen: "ShardedSeenSet"):
        self.seen = seen

    def __call__(self, batch: pa.Table) -> pa.Table:
        cands = explode_children(batch)
        if cands.num_rows:
            self.seen.offer_arrow(cands)
        return batch.drop_columns(["children"])


@dataclass
class CrawlResult:
    visit_order: pa.Table               # (url, seq, kind) in global FIFO order
    seen: list[str]                     # final URL-seen set (sorted)
    pages_queued: int
    rounds: int
    docs_dir: str | None
    metrics: dict = field(default_factory=dict)

    def docs_dataset(self) -> rd.Dataset:
        if self.docs_dir is None:
            raise RuntimeError("crawl ran with write_docs=False")
        return rd.read_parquet(self.docs_dir)


_FRONTIER_COLS = ["url", "seq", "kind", "parent_seq", "position", "depth",
                  "priority", "host"]


@ray.remote(num_cpus=0, num_returns=2)
def _arrow_block_and_count(t):
    """(arrow table, row count) for a materialized Ray Data block — Ray
    passes EMPTY blocks through map operators as pandas DataFrames, so
    ``to_arrow_refs`` can yield mixed types; refs-mode consumers
    (from_arrow_refs, the checkpoint task) need uniform Arrow blocks."""
    if not isinstance(t, pa.Table):
        t = (pa.Table.from_pandas(t, preserve_index=False)
             if len(t) else None)
    if t is None or t.num_rows == 0:
        return _empty_frontier(), 0
    return t, t.num_rows


@ray.remote(num_cpus=0)
def _ckpt_write_refs_task(rdir: str, frontier_refs: list,
                          deferred_refs: list, visit_refs: list,
                          extra: pa.Table) -> None:
    """Worker-side checkpoint data write for refs-mode: resolves the
    object-store refs HERE (never on the driver) and writes the round's
    parquet files. ``rdir`` must be reachable from workers (per-node
    local in this sandbox; shared storage on a real cluster)."""
    def cat(refs: list) -> pa.Table:
        ts = [t for t in ray.get(list(refs)) if t.num_rows]
        return (pa.concat_tables(ts, promote_options="default")
                if ts else _empty_frontier())

    pq.write_table(cat(frontier_refs), os.path.join(rdir, "frontier.parquet"))
    pq.write_table(cat(deferred_refs), os.path.join(rdir, "deferred.parquet"))
    pq.write_table(cat(visit_refs), os.path.join(rdir, "visit_delta.parquet"))
    pq.write_table(extra, os.path.join(rdir, "seen_extra_delta.parquet"))


def _empty_frontier() -> pa.Table:
    return pa.table({
        "url": pa.array([], pa.string()), "seq": pa.array([], pa.int64()),
        "kind": pa.array([], pa.string()),
        "parent_seq": pa.array([], pa.int64()),
        "position": pa.array([], pa.int32()),
        "depth": pa.array([], pa.int32()),
        "priority": pa.array([], pa.int32()),
        "host": pa.array([], pa.string()),
    })


@ray.remote
def _robots_scan_partition(path: str) -> dict[str, str]:
    """Scan ONE corpus partition for robots.txt docs -> {host: body}.

    Two-phase so non-matching row groups never decode their (large)
    spans column: first the doc_id column alone, then a pushed-down
    ``isin`` read of just the matching rows."""
    ids = pq.read_table(path, columns=["doc_id"]).column("doc_id")
    hits = pc.ends_with(ids, pattern="/robots.txt")
    if not pc.any(hits).as_py():
        return {}
    matches = pc.filter(ids, hits)
    tbl = pq.read_table(path, columns=["doc_id", "spans"],
                        filters=pc.field("doc_id").isin(matches))
    out: dict[str, str] = {}
    for u, spans in zip(tbl.column("doc_id").to_pylist(),
                        tbl.column("spans").to_pylist()):
        out[host_of(u)] = "".join(
            s["text"] for s in spans if s["kind"] == "text")
    return out


class Crawler:
    """Driver for the BFS-round crawl over a corpus table."""

    def __init__(self, corpus, config: CrawlConfig | None = None):
        """``corpus``: an in-memory Arrow table (broadcast with a prebuilt
        hash index) or a :class:`~..stages.fetch.CorpusSpec` pointing at a
        hash-partitioned on-disk corpus (the 100 TB layout — workers load
        only the partitions their URLs hash into)."""
        self.cfg = config or CrawlConfig()
        from ..stages.fetch import CorpusSpec, build_corpus_index

        if isinstance(corpus, CorpusSpec):
            self.corpus_ref = ray.put(corpus)
        else:
            hs, perm = build_corpus_index(corpus.column("doc_id").to_pylist())
            # broadcast (table, prebuilt hash index) ONCE; workers
            # zero-copy it (no combine_chunks: nested children can exceed
            # the 2 GB chunk cap)
            self.corpus_ref = ray.put((corpus, hs, perm))
        self.seen = ShardedSeenSet(self.cfg.num_seen_shards,
                                   mode=self.cfg.seen_mode,
                                   salt_k=self.cfg.salt_k)
        # robots: refs mode evaluates rules WORKER-side in the fetch
        # stage (a small {host: [prefix]} broadcast — no frontier-sized
        # driver pass); table mode keeps the RobotsCache actor pool
        # (both paths equivalence-tested in TestFrontierRefs)
        self.robots: RobotsCache | None = None
        self._robots_ref = None
        if self.cfg.robots:
            bodies = (self._robots_bodies_spec(corpus)
                      if isinstance(corpus, CorpusSpec)
                      else self._robots_bodies(corpus))
            if self.cfg.frontier_refs:
                self._robots_ref = ray.put(
                    {h: parse_robots(b) for h, b in bodies.items()})
            else:
                self.robots = RobotsCache(num_shards=2)
                for actor in self.robots.actors:
                    ray.get(actor.preload.remote(bodies))
        self.next_seq = 0
        self.pages_queued = 0
        self.round = 0
        self._visit_parts: list[pa.Table] = []
        self._seen_extra_parts: list[pa.Table] = []
        # parts not yet checkpointed (each round writes only its DELTA —
        # rewriting the cumulative log each round was O(rounds x total)
        # write amplification)
        self._visit_new: list[pa.Table] = []
        self._seen_extra_new: list[pa.Table] = []
        self._last_offered = 0
        self._deferred = _empty_frontier()
        # refs-mode state: the frontier/deferred/visit live in the object
        # store; the driver holds refs + row counts only
        self._frontier_refs: list = []
        self._frontier_count = 0
        self._deferred_refs: list = []
        self._deferred_count = 0
        self._visit_refs: list = []
        self._visit_new_refs: list = []
        self.metrics: dict = {
            "rounds": [], "pages_fetched": 0, "assets_fetched": 0,
            "skipped_download": 0, "skipped_robots": 0,
            "candidates": 0, "dedup_rejected": 0, "budget_refused": 0,
            "deferred_total": 0, "bytes_content": 0,
        }
        ckpt = self.cfg.checkpoint_dir
        self.docs_dir = os.path.join(ckpt, "docs") if ckpt and self.cfg.write_docs \
            else (None if not self.cfg.write_docs else None)
        if ckpt:
            os.makedirs(ckpt, exist_ok=True)
            if self.docs_dir:
                os.makedirs(self.docs_dir, exist_ok=True)
        self._docs_mem: list[pa.Table] = []   # when no checkpoint dir
        from concurrent.futures import ThreadPoolExecutor

        self._ckpt_pool = ThreadPoolExecutor(max_workers=1,
                                             thread_name_prefix="ckpt")
        self._ckpt_future = None

    # -- robots -----------------------------------------------------------
    @staticmethod
    def _robots_bodies_spec(spec) -> dict[str, str]:
        """Streaming robots preload over the partitioned on-disk corpus
        (the 100 TB layout): ONE Ray task per partition file scans only
        the doc_id column (projection pushdown) and decodes spans just
        for its robots.txt matches; the driver merges the tiny
        {host: body} dicts. Never materializes a partition's documents
        on the driver — robots now rides the CorpusSpec backend instead
        of raising (the last robots×layout feature-matrix hole)."""
        import glob

        paths = sorted(glob.glob(os.path.join(spec.root, "part-*.parquet")))
        bodies: dict[str, str] = {}
        for d in ray.get([_robots_scan_partition.remote(p) for p in paths]):
            bodies.update(d)
        return bodies

    @staticmethod
    def _robots_bodies(corpus: pa.Table) -> dict[str, str]:
        """Scan the corpus once for robots.txt docs: {host: body} (the
        real-web path would fetch lazily per host)."""
        ids = corpus.column("doc_id").to_pylist()
        bodies: dict[str, str] = {}
        for i, u in enumerate(ids):
            if u.endswith("/robots.txt"):
                spans = corpus.column("spans")[i].as_py()
                bodies[host_of(u)] = "".join(
                    s["text"] for s in spans if s["kind"] == "text")
        return bodies

    # -- seed / push ------------------------------------------------------
    def push_seeds(self, seeds: list[str]) -> None:
        n = len(seeds)
        urls = pa.array(seeds, pa.string())
        # vectorized host extraction (Arrow kernels); host_of fallback
        # only for refs the canonical-URL regex can't split
        stripped = pc.replace_substring_regex(urls, r"^[a-z][a-z0-9+.\-]*://",
                                              "", max_replacements=1)
        changed = pc.not_equal(stripped, urls)
        hosts_fast = pc.list_element(
            pc.split_pattern(stripped, "/", max_splits=1), 0)
        hosts = pc.if_else(changed, hosts_fast, pa.scalar("", pa.string()))
        if not pc.all(changed).as_py():
            hl = hosts.to_pylist()
            for i, (u, c) in enumerate(zip(seeds, changed.to_pylist())):
                if not c:
                    hl[i] = host_of(u)
            hosts = pa.array(hl, pa.string())
        cand = pa.table({
            "url": urls,
            # pa.repeat builds the constant column at C speed — a
            # 432k-element Python-object array measured ~0.5 s of the
            # seed-push serial floor
            "kind": pa.repeat(pa.scalar("page"), n),
            "parent_seq": pa.array(np.full(n, -1, dtype=np.int64)),
            "position": pa.array(np.arange(n, dtype=np.int32)),
            "depth": pa.array(np.zeros(n, dtype=np.int32)),
            "host": hosts,
        })
        if n > 16_384:
            # giant seeded frontiers (the drain regime): route+offer from
            # map tasks so the seed push parallelizes like any round
            nblocks = int(np.clip(n // 16_384 + 1,
                                  1, 4 * self.cfg.fetch_concurrency))
            step = -(-n // nblocks)
            slices = [cand.slice(i, step) for i in range(0, n, step)]
            seen = self.seen

            def offer_batch(batch: pa.Table) -> pa.Table:
                seen.offer_arrow(batch)
                return batch.select(["url"]).slice(0, 0)

            (rd.from_arrow(slices)
             .map_batches(offer_batch, batch_format="pyarrow",
                          batch_size=step)
             .count())
        else:
            self.seen.offer_arrow(cand)
        self._frontier = self._resolve_accept()

    # -- the ordered accept step (dedup -> budget -> seq) ------------------
    def _resolve_accept(self) -> pa.Table:
        """Reference Push semantics (queue.go:88-114), distributed.

        Candidates were already offered to the seen shards (by the
        explode map tasks, or by push_seeds). Each shard resolves its
        slice — (parent_seq, position) push-order sort, first-occurrence
        dedup, seen check+insert — in parallel; the driver sees only slim
        integer columns to apply the global enqueue-time page budget and
        assign dense seq numbers, then each shard materializes its kept
        frontier rows. Budget-refused pages stay seen (D1): the insert
        happened shard-side BEFORE the budget cut, mirroring the
        reference's dedup-before-budget ordering (queue.go:92-106)."""
        if self.cfg.frontier_refs:
            self._frontier_refs = []
            self._frontier_count = 0
        slims, offered = self.seen.dedup_round_all()
        self.metrics["candidates"] += offered
        self._last_offered = offered
        ns = [t.num_rows for t in slims]
        total = sum(ns)
        self.metrics["dedup_rejected"] += offered - total
        if total == 0:
            return _empty_frontier()

        def col(name, dtype):
            return np.concatenate(
                [t.column(name).to_numpy(zero_copy_only=False) for t in slims]
            ) if total else np.zeros(0, dtype=dtype)

        ps = col("parent_seq", np.int64)
        pos = col("position", np.int32)
        is_page = col("is_page", bool)
        # global single-worker push order over slim ints only
        order = np.lexsort((pos, ps))
        ip_sorted = is_page[order]
        budget_left = max(0, self.cfg.max_count - self.pages_queued)
        page_rank = np.cumsum(ip_sorted)        # 1-based rank among pages
        enq_sorted = ~ip_sorted | (page_rank <= budget_left)
        n_pages_in = int(min(budget_left, ip_sorted.sum()))
        self.metrics["budget_refused"] += int(ip_sorted.sum()) - n_pages_in
        self.pages_queued += n_pages_in
        seq_sorted = np.where(
            enq_sorted,
            np.cumsum(enq_sorted) - 1 + self.next_seq, np.int64(-1))
        self.next_seq += int(enq_sorted.sum())
        keep = np.empty(total, dtype=bool)
        keep[order] = enq_sorted
        seqg = np.empty(total, dtype=np.int64)
        seqg[order] = seq_sorted

        keeps, seqs = [], []
        off = 0
        for n in ns:
            k = keep[off:off + n]
            keeps.append(k)
            seqs.append(seqg[off:off + n][k])
            off += n
        if self.cfg.frontier_refs:
            # the kept rows never land here: shards put slices into the
            # object store; the driver records refs + counts only
            refs, n_kept, refused_r = self.seen.finalize_round_all_refs(
                keeps, seqs, step=max(self.cfg.batch_size, 2048))
            if refused_r:
                part = pa.concat_tables(refused_r, promote_options="default")
                self._seen_extra_parts.append(part)
                self._seen_extra_new.append(part)
            self._frontier_refs = refs
            self._frontier_count = n_kept
            return _empty_frontier()
        kept_tables, refused = self.seen.finalize_round_all(keeps, seqs)
        if refused:
            # budget-refused pages are seen-but-never-enqueued: persist
            # them so resume can restore the full seen set (D1 invariant)
            part = pa.concat_tables(refused, promote_options="default")
            self._seen_extra_parts.append(part)
            self._seen_extra_new.append(part)
        if not kept_tables:
            return _empty_frontier()
        acc = pa.concat_tables(kept_tables, promote_options="default")
        # back to global FIFO (seq) order — frontier rows stay in the
        # deterministic push order regardless of shard interleaving
        seq_np = acc.column("seq").to_numpy(zero_copy_only=False)
        acc = acc.take(pa.array(np.argsort(seq_np)))
        if self.cfg.priority_fn is not None:
            prio = np.asarray(self.cfg.priority_fn(acc), dtype=np.int32)
        else:
            prio = np.zeros(acc.num_rows, dtype=np.int32)
        acc = acc.append_column("priority", pa.array(prio))
        return acc.select(_FRONTIER_COLS)

    # -- refs-mode helpers --------------------------------------------------
    def _frontier_rows(self) -> int:
        return (self._frontier_count if self.cfg.frontier_refs
                else self._frontier.num_rows)

    def _deferred_rows(self) -> int:
        return (self._deferred_count if self.cfg.frontier_refs
                else self._deferred.num_rows)

    def _prepare_round_refs(self):
        """Refs-mode round prep: (lazy Dataset over this round's admitted
        frontier, admitted row count). Priority is stamped per batch;
        politeness admission and the (priority, seq) ordering run as one
        Ray pipeline; deferred rows stay in the object store as block
        refs. Nothing frontier-sized ever lands on the driver."""
        cfg = self.cfg
        n_before = self._frontier_count + self._deferred_count
        if n_before == 0:
            return None, 0

        prio_fn = cfg.priority_fn

        def stamp(batch: pa.Table) -> pa.Table:
            prio = (np.asarray(prio_fn(batch), dtype=np.int32)
                    if prio_fn is not None
                    else np.zeros(batch.num_rows, dtype=np.int32))
            return batch.append_column("priority", pa.array(prio))

        f_ds = (rd.from_arrow_refs(list(self._frontier_refs))
                .map_batches(stamp, batch_format="pyarrow")
                if self._frontier_refs else None)
        d_ds = (rd.from_arrow_refs(list(self._deferred_refs))
                if self._deferred_refs else None)
        pre_ds = f_ds.union(d_ds) if (f_ds is not None and d_ds is not None) \
            else (f_ds if f_ds is not None else d_ds)
        self._deferred_refs, self._deferred_count = [], 0

        mph = cfg.politeness_max_per_host
        if mph:
            def admit_topk(g: pd.DataFrame) -> pd.DataFrame:
                order = np.lexsort((g["seq"].to_numpy(),
                                    g["priority"].to_numpy()))
                admit = np.zeros(len(g), dtype=bool)
                admit[order[:mph]] = True
                return g.assign(admit=admit)

            mat = (pre_ds.groupby("host")
                   .map_groups(admit_topk, batch_format="pandas")
                   .sort(["priority", "seq"]).materialize())

            def split(flag: bool):
                def f(b: pa.Table) -> pa.Table:
                    m = pc.equal(b.column("admit"), flag)
                    return b.filter(m).drop_columns(["admit"])
                return f

            dmat = (mat.map_batches(split(False), batch_format="pyarrow")
                    .materialize())
            pairs = [_arrow_block_and_count.remote(r)
                     for r in dmat.to_arrow_refs()]
            counts = ray.get([p[1] for p in pairs])
            self._deferred_refs = [p[0] for p, c in zip(pairs, counts) if c]
            self._deferred_count = int(sum(counts))
            self.metrics["deferred_total"] += self._deferred_count
            pre_ds = mat.map_batches(split(True), batch_format="pyarrow")
            return pre_ds, n_before - self._deferred_count
        if prio_fn is not None:
            return pre_ds.sort(["priority", "seq"]), n_before
        # pure FIFO: within-round fetch order doesn't affect accept
        # semantics (push order is re-derived shard-side from
        # (parent_seq, position)); skip the global sort shuffle
        return pre_ds, n_before

    # -- one round --------------------------------------------------------
    def _run_round(self) -> None:
        cfg = self.cfg
        t0 = time.time()
        if cfg.frontier_refs:
            pre_ds, n_refs = self._prepare_round_refs()
            robots_blocked = None
            current = None
        else:
            current = pa.concat_tables([self._deferred, self._frontier]) \
                if self._deferred.num_rows else self._frontier
        # [NEW] priority frontier: order by (priority, seq) — deferred rows
        # keep their old seq so they go first among equals (FIFO fairness).
        # Small frontiers sort on the driver (vectorized lexsort); huge ones
        # go through a Ray Data sort shuffle (the scale path — exercised in
        # tests via a tiny threshold).
        robots_blocked = None
        if cfg.frontier_refs:
            pass                      # refs-mode prep already ran above
        elif current.num_rows > self.cfg.driver_sort_threshold:
            # scale path: politeness admission AND the (priority, seq)
            # ordering run as ONE Ray pipeline — a groupby(host) stamps
            # the per-host token admit flag (top max_per_host rows by
            # (priority, seq) FIFO fairness), chained into the sort
            # shuffle; a 10^10-row frontier round never computes
            # admission driver-side
            nb = int(np.clip(current.num_rows // 65536 + 1, 2, 256))
            step = -(-current.num_rows // nb)
            slices = [current.slice(i, step)
                      for i in range(0, current.num_rows, step)]
            ds = rd.from_arrow(slices)
            mph = cfg.politeness_max_per_host
            if mph:
                def admit_topk(g):
                    order = np.lexsort((g["seq"].to_numpy(),
                                        g["priority"].to_numpy()))
                    admit = np.zeros(len(g), dtype=bool)
                    admit[order[:mph]] = True
                    return g.assign(admit=admit)

                ds = ds.groupby("host").map_groups(admit_topk,
                                                   batch_format="pandas")
            sorted_ds = ds.sort(["priority", "seq"])
            parts = [b for b in sorted_ds.iter_batches(batch_format="pyarrow")
                     if b.num_rows]
            current = pa.concat_tables(parts, promote_options="default")
            if mph:
                admit = current.column("admit")
                current = current.drop_columns(["admit"])
                self._deferred = current.filter(pc.invert(admit))
                self.metrics["deferred_total"] += \
                    current.num_rows - int(pc.sum(admit).as_py() or 0)
                current = current.filter(admit)
            else:
                self._deferred = _empty_frontier()
        else:
            if current.num_rows:
                srt = np.lexsort(
                    (current.column("seq").to_numpy(zero_copy_only=False),
                     current.column("priority").to_numpy(zero_copy_only=False)))
                current = current.take(pa.array(srt))
            if cfg.politeness_max_per_host:
                hosts = np.array(current.column("host").to_pylist())
                # rank = position in the (priority, seq)-sorted frontier,
                # so admission honors priority then FIFO
                rank = np.arange(current.num_rows, dtype=np.int64)
                admit = apply_host_tokens(hosts, rank,
                                          cfg.politeness_max_per_host)
                self._deferred = current.filter(pa.array(~admit))
                self.metrics["deferred_total"] += int((~admit).sum())
                current = current.filter(pa.array(admit))
            else:
                self._deferred = _empty_frontier()

        if self.robots is not None and current.num_rows:
            hosts = current.column("host").to_pylist()
            paths = ["/" + u.split("/", 3)[3] if u.count("/") >= 3 else "/"
                     for u in current.column("url").to_pylist()]
            ok = self.robots.allowed(hosts, paths)
            robots_blocked = current.filter(pa.array(~ok))
            self.metrics["skipped_robots"] += robots_blocked.num_rows
            current = current.filter(pa.array(ok))

        # ---- the Ray Data stages over this round's frontier slice ----
        n = n_refs if cfg.frontier_refs else current.num_rows
        docs_round = None
        phase_t: dict[str, float] = {}
        t_mark = time.time()

        def _mark(name: str) -> None:
            nonlocal t_mark
            now = time.time()
            phase_t[name] = round(now - t_mark, 4)
            t_mark = now

        if n:
            # size blocks so the round fans out AND stays memory-sane:
            # at least 2 blocks per fetch slot (parallelism), at most
            # ~8k rows per block (a 10 KB-content row -> ~80 MB output
            # blocks; bigger blocks measurably stall the 4-CPU drain on
            # object-store pressure), and never below 256 rows (task
            # overhead floor)
            batch_rows = cfg.batch_size
            if cfg.frontier_refs:
                # blocks are the shard-side object-store slices (already
                # ~batch_size rows each) — no driver-side slicing at all
                ds = pre_ds
            else:
                nblocks = int(np.clip(
                    max(n // 8192 + 1, 2 * cfg.fetch_concurrency),
                    1, max(1, n // 256 + 1)))
                # keep batches = blocks: a batch_size below the block size
                # makes Ray Data re-slice every block (measured 3-5x slower)
                if nblocks > 1:
                    # pre-sliced blocks: zero-copy table slices avoid a
                    # Repartition all-to-all operator (a measured barrier)
                    step = -(-n // nblocks)
                    slices = [current.slice(i, step)
                              for i in range(0, n, step)]
                    ds = rd.from_arrow(slices)
                else:
                    ds = rd.from_arrow(current)
            # NO `concurrency=` here: Ray's Task->Task operator fusion
            # requires equal TaskPoolStrategy sizes, so capping just this
            # stage split the chain into three physical operators and
            # pushed the full content stream through the object store
            # twice between them (measured: round-0 stream scaled 1->4
            # CPUs at only ~0.74 from the extra memcpy contention). Left
            # uncapped, stamp+fetch+parse+save+explode fuse into ONE
            # operator and content bytes stay inside the map task.
            ds = ds.map_batches(
                _FetchFn(self.corpus_ref, cfg, robots_ref=self._robots_ref),
                batch_format="pyarrow", batch_size=batch_rows)
            ds = ds.map_batches(
                _ParseFn(cfg.strict_rfc3986, cfg.parse_html),
                batch_format="pyarrow", batch_size=batch_rows)
            if cfg.write_docs:
                ds = ds.map_batches(
                    _SaveFn(cfg.strict_rfc3986, cfg.localize,
                            out_dir=self.docs_dir, round_no=self.round,
                            enrich=cfg.enrich_docs),
                    batch_format="pyarrow", batch_size=batch_rows)
            # explode + shard-offer runs IN the map tasks (accept path
            # off the driver); its batched offer RPCs complete before the
            # stage returns, so stream completion = all candidates offered
            ds = ds.map_batches(_ExplodeOfferFn(self.seen),
                                batch_format="pyarrow",
                                batch_size=batch_rows)
            # ONE streaming execution per round (fetch+parse+save+explode
            # fused); the driver consumes only the slim doc stream — this
            # is the round barrier.
            round_batches = [b for b in ds.iter_batches(batch_format="pyarrow")
                             if b.num_rows]
            round_tbl = pa.concat_tables(round_batches,
                                         promote_options="default") \
                if round_batches else None
            _mark("fetch_parse_save")

            if round_tbl is not None and cfg.write_docs:
                docs_round = round_tbl.drop_columns(
                    [c for c in ("span_canon",)
                     if c in round_tbl.column_names])
                docs_round = docs_round.rename_columns(
                    ["doc_id" if c == "url" else c
                     for c in docs_round.column_names])
                _mark("save")

        # ---- robots-blocked rows become skipped docs (no fetch) ----
        if robots_blocked is not None and robots_blocked.num_rows:
            rb = robots_blocked
            empty_spans = pa.array(
                [[]] * rb.num_rows,
                type=pa.list_(pa.struct([("kind", pa.string()),
                                         ("text", pa.string()),
                                         ("media_ref", pa.string()),
                                         ("offset", pa.int32())])))
            rbt = rb.append_column("spans", empty_spans)
            rbt = rbt.append_column("content_size", pa.array(
                np.zeros(rb.num_rows, dtype=np.int64)))
            rbt = rbt.append_column("status", pa.array(["skipped"] * rb.num_rows))
            rbt = rbt.append_column("skipped_on", pa.array(["robots"] * rb.num_rows))
            rbt = rbt.append_column("n_children", pa.array(
                np.zeros(rb.num_rows, dtype=np.int32)))
            save = SaveStage(cfg.strict_rfc3986, cfg.localize)
            rbt = save(rbt)
            rbt = rbt.rename_columns(
                ["doc_id" if c == "url" else c for c in rbt.column_names])
            if self.docs_dir:
                full = rbt.append_column("round", pa.array(
                    np.full(rbt.num_rows, self.round, dtype=np.int32)))
                pq.write_table(full, os.path.join(
                    self.docs_dir, f"round-{self.round:05d}-robots.parquet"))
                rbt = rbt.drop_columns(["content", "spans"])
            docs_round = (pa.concat_tables([docs_round, rbt],
                                           promote_options="default")
                          if docs_round is not None else rbt)

        # ---- persist docs + frontier + seen-delta (checkpoint) ----
        # (with docs_dir set, workers already wrote the full rows; the
        # driver only tallies metrics from the slim columns)
        if docs_round is not None:
            self.metrics["bytes_content"] += int(pc.sum(
                docs_round.column("content_size")).as_py() or 0)
            ok = pc.equal(docs_round.column("status"), "ok")
            is_pg = pc.equal(docs_round.column("kind"), "page")
            self.metrics["pages_fetched"] += int(pc.sum(
                pc.and_(ok, is_pg)).as_py() or 0)
            self.metrics["assets_fetched"] += int(pc.sum(
                pc.and_(ok, pc.invert(is_pg))).as_py() or 0)
            self.metrics["skipped_download"] += int(pc.sum(pc.equal(
                docs_round.column("skipped_on"), "download")).as_py() or 0)
            if self._robots_ref is not None:
                # refs mode: robots skips happened worker-side in fetch
                # (table mode counted its driver pass above)
                self.metrics["skipped_robots"] += int(pc.sum(pc.equal(
                    docs_round.column("skipped_on"), "robots")).as_py() or 0)
            if not self.docs_dir:
                rc = pa.array(np.full(docs_round.num_rows, self.round,
                                      dtype=np.int32))
                self._docs_mem.append(docs_round.append_column("round", rc))

        _mark("persist")
        # ---- accept next frontier (shard-resolved; driver cuts budget) ----
        self._last_offered = 0
        self._frontier = self._resolve_accept()
        if cfg.frontier_refs:
            if self._frontier_refs:
                self._visit_refs.extend(self._frontier_refs)
                self._visit_new_refs.extend(self._frontier_refs)
        elif self._frontier.num_rows:
            self._visit_parts.append(self._frontier)
            self._visit_new.append(self._frontier)
        _mark("accept")

        self.metrics["rounds"].append({
            "round": self.round, "frontier": n,
            "candidates": self._last_offered,
            "accepted_next": self._frontier_rows(),
            "deferred": self._deferred_rows(),
            "sec": round(time.time() - t0, 4),
            "phases": phase_t,
        })
        self._checkpoint()
        _mark("checkpoint")
        self.metrics["rounds"][-1]["sec_checkpoint"] = phase_t.get(
            "checkpoint", 0.0)
        self.round += 1

    def _checkpoint(self) -> None:
        """Submit this round's checkpoint to the writer thread and return
        immediately — the parquet/manifest writes (driver-local I/O, the
        measured per-round serial floor after r2 moved the accept path
        off the driver) OVERLAP the next round's distributed stream. The
        one-deep queue (join before the next submit) keeps round dirs
        strictly ordered; a crash mid-write leaves a round dir without
        manifest.json, which resume already treats as incomplete."""
        ckpt = self.cfg.checkpoint_dir
        if not ckpt:
            return
        extra = (pa.concat_tables(self._seen_extra_new)
                 if self._seen_extra_new
                 else pa.table({"url": pa.array([], pa.string()),
                                "host": pa.array([], pa.string())}))
        self._seen_extra_new = []
        manifest = {
            "round": self.round, "next_seq": self.next_seq,
            "pages_queued": self.pages_queued,
            "seen_size": self.seen.total_size(),
            "frontier_rows": self._frontier_rows(),
            "deferred_rows": self._deferred_rows(),
            "docs_parts": None,     # filled by the writer (it lists the dir)
            "round_metrics": self.metrics["rounds"][-1]
            if self.metrics["rounds"] else None,
            "metrics": {k: v for k, v in self.metrics.items() if k != "rounds"},
        }
        import copy

        self._ckpt_flush()
        if self.cfg.frontier_refs:
            # frontier/deferred/visit are object-store refs: a Ray task
            # concatenates + writes them WORKER-side (the checkpoint dir
            # is per-node local here, shared storage on a real cluster);
            # the driver thread only awaits the task and stamps the
            # manifest after the data lands
            visit_refs = self._visit_new_refs
            self._visit_new_refs = []
            self._ckpt_future = self._ckpt_pool.submit(
                self._write_checkpoint_refs, ckpt, self.round,
                list(self._frontier_refs), list(self._deferred_refs),
                visit_refs, extra, copy.deepcopy(manifest), self.docs_dir)
            return
        visit = (pa.concat_tables(self._visit_new)
                 if self._visit_new else _empty_frontier())
        self._visit_new = []
        self._ckpt_future = self._ckpt_pool.submit(
            self._write_checkpoint, ckpt, self.round, self._frontier,
            self._deferred, visit, extra, copy.deepcopy(manifest),
            self.docs_dir)

    def _write_checkpoint(self, ckpt, round_no, frontier, deferred, visit,
                          extra, manifest, docs_dir) -> None:
        rdir = os.path.join(ckpt, f"round-{round_no:05d}")
        os.makedirs(rdir, exist_ok=True)
        pq.write_table(frontier, os.path.join(rdir, "frontier.parquet"))
        pq.write_table(deferred, os.path.join(rdir, "deferred.parquet"))
        # DELTA logs: only parts produced since the previous checkpoint
        # (resume concatenates the round chain's deltas)
        pq.write_table(visit, os.path.join(rdir, "visit_delta.parquet"))
        pq.write_table(extra, os.path.join(rdir, "seen_extra_delta.parquet"))
        # per-partition lineage: which docs part files this round produced
        # (workers wrote them before the round barrier; a resumed run can
        # skip/verify completed partitions by listing the manifest chain)
        docs_parts = []
        if docs_dir and os.path.isdir(docs_dir):
            prefix = f"round-{round_no:05d}-"
            docs_parts = sorted(
                f for f in os.listdir(docs_dir) if f.startswith(prefix))
        manifest["docs_parts"] = docs_parts
        tmp = os.path.join(rdir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(rdir, "manifest.json"))

    def _write_checkpoint_refs(self, ckpt, round_no, frontier_refs,
                               deferred_refs, visit_refs, extra,
                               manifest, docs_dir) -> None:
        """Refs-mode checkpoint: the parquet writes happen in a Ray task
        (frontier/deferred/visit never touch the driver); the manifest is
        stamped here AFTER the data lands — same crash contract as the
        table-mode writer (a round dir without manifest.json is
        incomplete)."""
        rdir = os.path.join(ckpt, f"round-{round_no:05d}")
        os.makedirs(rdir, exist_ok=True)
        ray.get(_ckpt_write_refs_task.remote(
            rdir, frontier_refs, deferred_refs, visit_refs, extra))
        docs_parts = []
        if docs_dir and os.path.isdir(docs_dir):
            prefix = f"round-{round_no:05d}-"
            docs_parts = sorted(
                f for f in os.listdir(docs_dir) if f.startswith(prefix))
        manifest["docs_parts"] = docs_parts
        tmp = os.path.join(rdir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(rdir, "manifest.json"))

    def _ckpt_flush(self) -> None:
        """Join the in-flight checkpoint write (raises its error, if any)."""
        fut = getattr(self, "_ckpt_future", None)
        if fut is not None:
            self._ckpt_future = None
            fut.result()

    # -- run / resume ------------------------------------------------------
    def run(self, seeds: list[str], max_rounds: int | None = None) -> CrawlResult:
        self.push_seeds(seeds)
        if self.cfg.frontier_refs:
            self._visit_refs.extend(self._frontier_refs)
            self._visit_new_refs.extend(self._frontier_refs)
        else:
            self._visit_parts.append(self._frontier)
            self._visit_new.append(self._frontier)
        return self._loop(max_rounds)

    def _loop(self, max_rounds: int | None = None) -> CrawlResult:
        limit = max_rounds if max_rounds is not None else self.cfg.max_rounds
        t0 = time.time()
        rounds_done = 0
        while (self._frontier_rows() or self._deferred_rows()) \
                and rounds_done < limit:
            self._run_round()
            rounds_done += 1
        self._ckpt_flush()       # join the overlapped final checkpoint
        elapsed = time.time() - t0
        if self.cfg.frontier_refs:
            # presentation only: the visit log lived in the object store
            # all run; materialize + seq-sort it for the result table (at
            # true scale read the checkpoint delta chain instead)
            parts = [t for t in ray.get(list(self._visit_refs))
                     if t.num_rows]
            visit = (pa.concat_tables(parts, promote_options="default")
                     .sort_by([("seq", "ascending")])
                     if parts else _empty_frontier())
        else:
            visit = (pa.concat_tables(self._visit_parts)
                     if self._visit_parts else _empty_frontier())
        urls_processed = int(visit.num_rows)
        self.metrics["elapsed_sec"] = round(elapsed, 4)
        self.metrics["urls_per_sec"] = round(urls_processed / elapsed, 2) \
            if elapsed > 0 else None
        self.metrics["crawl_rate_pages_per_sec"] = round(
            self.metrics["pages_fetched"] / elapsed, 2) if elapsed > 0 else None
        return CrawlResult(
            visit_order=visit.select(["url", "seq", "kind"]),
            seen=self.seen.snapshot()
            if self.cfg.snapshot_seen and self.cfg.seen_mode != "cuckoo"
            else [],
            pages_queued=self.pages_queued,
            rounds=self.round,
            docs_dir=self.docs_dir,
            metrics=self.metrics,
        )

    def docs_table(self) -> pa.Table:
        """In-memory docs (only when no checkpoint_dir was set)."""
        if self.docs_dir:
            return pq.read_table(self.docs_dir)
        return pa.concat_tables(self._docs_mem, promote_options="default") \
            if self._docs_mem else None

    @classmethod
    def resume(cls, corpus: pa.Table, checkpoint_dir: str,
               config: CrawlConfig | None = None) -> "Crawler":
        """Rebuild driver state from the latest complete round checkpoint.

        Seen shards are restored from the visit log + the dedup invariant
        is re-established by re-inserting every URL recorded seen (the
        visit log holds enqueued URLs; budget-refused seen URLs are
        re-discovered idempotently because check_and_insert re-rejects
        duplicates)."""
        cfg = config or CrawlConfig()
        cfg.checkpoint_dir = checkpoint_dir
        rounds = sorted(d for d in os.listdir(checkpoint_dir)
                        if d.startswith("round-")
                        and os.path.exists(os.path.join(checkpoint_dir, d,
                                                        "manifest.json")))
        if not rounds:
            raise FileNotFoundError(f"no complete round under {checkpoint_dir}")
        rdir = os.path.join(checkpoint_dir, rounds[-1])
        with open(os.path.join(rdir, "manifest.json")) as f:
            manifest = json.load(f)
        self = cls.__new__(cls)
        self.cfg = cfg
        from ..stages.fetch import CorpusSpec, build_corpus_index

        if isinstance(corpus, CorpusSpec):
            self.corpus_ref = ray.put(corpus)
        else:
            hs, perm = build_corpus_index(corpus.column("doc_id").to_pylist())
            self.corpus_ref = ray.put((corpus, hs, perm))
        self.seen = ShardedSeenSet(cfg.num_seen_shards, mode=cfg.seen_mode,
                                   salt_k=cfg.salt_k)
        self.robots = None
        self._robots_ref = None
        if cfg.robots:
            bodies = cls._robots_bodies(corpus)
            if cfg.frontier_refs:
                self._robots_ref = ray.put(
                    {h: parse_robots(b) for h, b in bodies.items()})
            else:
                self.robots = RobotsCache(num_shards=2)
                for actor in self.robots.actors:
                    ray.get(actor.preload.remote(bodies))
        self.next_seq = manifest["next_seq"]
        self.pages_queued = manifest["pages_queued"]
        self.round = manifest["round"] + 1
        self._frontier = pq.read_table(os.path.join(rdir, "frontier.parquet"))
        self._deferred = pq.read_table(os.path.join(rdir, "deferred.parquet"))
        # a refs-mode checkpoint stores the frontier WITHOUT the
        # (transiently stamped) priority column; restore it for table mode
        for col in ("_frontier", "_deferred"):
            t = getattr(self, col)
            if "priority" not in t.column_names:
                t = t.append_column("priority", pa.array(
                    np.zeros(t.num_rows, dtype=np.int32)))
                setattr(self, col, t)
        self._frontier_refs, self._frontier_count = [], 0
        self._deferred_refs, self._deferred_count = [], 0
        self._visit_refs, self._visit_new_refs = [], []
        if cfg.frontier_refs:
            # hand the restored rows straight back to the object store:
            # frontier refs travel WITHOUT priority (the round stamps it
            # per batch), deferred refs WITH it (they bypass the stamp)
            step = max(cfg.batch_size, 2048)
            for col, rattr, cattr, keep_prio in (
                    ("_frontier", "_frontier_refs", "_frontier_count", False),
                    ("_deferred", "_deferred_refs", "_deferred_count", True)):
                t = getattr(self, col)
                if not keep_prio:
                    t = t.drop_columns(["priority"])
                setattr(self, rattr, [ray.put(t.slice(i, step))
                                      for i in range(0, t.num_rows, step)])
                setattr(self, cattr, t.num_rows)
                setattr(self, col, _empty_frontier())
        # visit log = concat of the complete rounds' DELTA files (each
        # checkpoint writes only what the round added)
        visit_parts = []
        extra_parts = []
        for r in rounds:
            vp = os.path.join(checkpoint_dir, r, "visit_delta.parquet")
            ep = os.path.join(checkpoint_dir, r, "seen_extra_delta.parquet")
            # a round dir with manifest.json but no delta files is a
            # corrupt or pre-delta-format checkpoint — resuming past it
            # would silently drop the visit log / seen set and re-enqueue
            # already-visited URLs, so refuse instead of skipping
            missing = [p for p in (vp, ep) if not os.path.exists(p)]
            if missing:
                raise FileNotFoundError(
                    f"checkpoint round {r} has manifest.json but is missing "
                    f"{[os.path.basename(m) for m in missing]} — corrupt or "
                    "incompatible (pre-delta) checkpoint; cannot resume")
            t = pq.read_table(vp)
            if t.num_rows:
                visit_parts.append(t)
            t = pq.read_table(ep)
            if t.num_rows:
                extra_parts.append(t)
        if cfg.frontier_refs:
            # the restored visit log goes straight back to the object
            # store; already-checkpointed deltas are NOT re-queued for
            # the next checkpoint write (visit_new stays empty)
            self._visit_parts = []
            self._visit_refs = [ray.put(t) for t in visit_parts]
        else:
            self._visit_parts = visit_parts
        self._visit_new = []
        self._seen_extra_new = []
        self.metrics = dict(manifest["metrics"])
        self.metrics["rounds"] = []
        self._docs_mem = []
        self._last_offered = 0
        from concurrent.futures import ThreadPoolExecutor

        self._ckpt_pool = ThreadPoolExecutor(max_workers=1,
                                             thread_name_prefix="ckpt")
        self._ckpt_future = None
        self.docs_dir = os.path.join(checkpoint_dir, "docs") \
            if cfg.write_docs else None
        # restore the seen set: every URL ever enqueued OR refused was
        # inserted; the visit deltas cover enqueued URLs (frontier rows
        # carry their host — vectorized re-route, no per-row parsing);
        # budget-refused seen URLs come from the seen_extra deltas.
        for t in visit_parts:
            self.seen.bulk_restore(t.column("url"), t.column("host"))
        self._seen_extra_parts = extra_parts
        for t in extra_parts:
            self.seen.bulk_restore(t.column("url"), t.column("host"))
        return self

    def shutdown(self) -> None:
        self._ckpt_flush()
        self._ckpt_pool.shutdown(wait=True)
        self.seen.shutdown()
        if self.robots is not None:
            self.robots.shutdown()
