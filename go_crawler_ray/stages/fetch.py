"""Fetch stage: resolve frontier URLs to documents.

In the sandbox there is no network, so "fetch" is a lookup into the
synthetic corpus (SURVEY.md §2.1 S1): the stage is a callable CLASS for
``map_batches`` — the corpus handle is built ONCE per actor in __init__
(the reference's sync.Pool of HTTP clients, cmd/crawler/main.go:46-50,
becomes actor-held state), and each __call__ resolves a whole Arrow batch.

Reference behaviors reproduced:
- HEAD size gate: documents larger than ``max_file_size`` are skipped
  with skipped_on="download" (main.go:319-330 + 64 MiB default,
  internal/config.go:37). Size := total text bytes of the doc.
- miss (dangling URL) -> skipped_on="download" after retry exhaustion
  (main.go:150-161); failed rows are KEPT, not dropped (M7).
- in-UDF retry: pkg/retry semantics via functions.retry; a deterministic
  ``transient_fail_rate`` knob makes a fraction of URLs fail on their
  first attempt so the retry path is integration-testable.

At real scale the backend would be async HTTP inside the actor; for a
100 TB corpus the lookup backend is partitioned Parquet with per-actor
partition memoization (see PartitionedCorpusBackend).
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.retry import RetryConfig, retry_call
from ..schemas import SPAN_STRUCT


def _hash_urls(urls) -> np.ndarray:
    """Stable 64-bit hashes for URL keys: crc32 of the bytes combined
    with crc32 of the REVERSED bytes. The two passes are different
    GF(2)-linear maps of the message bits (unlike crc32 with two init
    seeds, which differ only by a constant — a collision in one implies
    a collision in the other), so joint collisions are ~2^-64.

    Accepts a list[str] or an Arrow string array; vectorized either way
    (functions.hashing.crc32_many — one numpy pass per byte position)."""
    from ..functions.hashing import hash64_many

    return hash64_many(urls)


def build_corpus_index(doc_ids: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(sorted_hashes, row_perm) searchsorted index over doc_ids.

    Built ONCE on the driver and broadcast as numpy arrays — workers
    zero-copy map them from the object store, so per-worker 'index build'
    is free (a 216k-entry Python dict per worker measured ~2.7s; this is
    ~0). Collisions (P ~ n^2/2^65) are detected at build time and fall
    back to exact-dict mode."""
    h = _hash_urls(doc_ids)
    perm = np.argsort(h, kind="stable")
    hs = h[perm]
    if len(hs) > 1 and (hs[1:] == hs[:-1]).any():
        return None, None        # caller falls back to dict mode
    return hs, perm.astype(np.int64)


class InMemoryCorpusBackend:
    """Lookup over a broadcast Arrow corpus table.

    The table (and its prebuilt hash index) live ONCE in the object store
    (``ray.put`` on the driver); every fetch worker zero-copy-reads them
    (S3 idiom: per-worker state built once, here ~free)."""

    def __init__(self, table: pa.Table,
                 index: tuple[np.ndarray, np.ndarray] | None = None):
        # spans stays a ChunkedArray: a bench-scale corpus's nested text
        # child can exceed Arrow's 2 GB single-chunk offset limit, so we
        # never combine_chunks the corpus (ChunkedArray.take handles
        # global row indices across chunks)
        self.table = table
        self.spans = self.table.column("spans")
        if index is None:
            index = build_corpus_index(table.column("doc_id").to_pylist())
        self.hash_sorted, self.perm = index
        self.index: dict[str, int] | None = None
        if self.hash_sorted is None:   # hash collision: exact fallback
            urls = self.table.column("doc_id").to_pylist()
            self.index = {u: i for i, u in enumerate(urls)}

    def indices(self, urls) -> np.ndarray:
        """Corpus row index per URL (-1 = miss). ``urls`` may be a
        list[str] or an Arrow string array (zero-copy hot path)."""
        if self.index is not None:
            if not isinstance(urls, list):
                urls = urls.to_pylist()
            idx = np.empty(len(urls), dtype=np.int64)
            get = self.index.get
            for i, u in enumerate(urls):
                idx[i] = get(u, -1)
            return idx
        h = _hash_urls(urls)
        pos = np.searchsorted(self.hash_sorted, h)
        pos_c = np.minimum(pos, len(self.hash_sorted) - 1)
        hit = self.hash_sorted[pos_c] == h
        return np.where(hit, self.perm[pos_c], -1)

    def take_spans(self, indices: np.ndarray) -> pa.Array:
        """Gather spans; missing (-1) become null entries.

        Chunk-aware: ChunkedArray.take concatenates all chunks first,
        which overflows 32-bit offsets when the corpus's nested text child
        exceeds 2 GB — so we take per chunk and merge only the
        batch-sized result."""
        mask = indices < 0
        safe = np.where(mask, 0, indices).astype(np.int64)
        spans = self.spans
        if isinstance(spans, pa.ChunkedArray):
            if spans.num_chunks == 1:
                out = spans.chunk(0).take(pa.array(safe))
            else:
                lengths = np.fromiter((len(c) for c in spans.chunks),
                                      dtype=np.int64, count=spans.num_chunks)
                bounds = np.concatenate(([0], np.cumsum(lengths)))
                cid = np.searchsorted(bounds, safe, side="right") - 1
                local = safe - bounds[cid]
                parts, order = [], []
                for c in np.unique(cid):
                    sel = np.nonzero(cid == c)[0]
                    parts.append(spans.chunk(int(c)).take(pa.array(local[sel])))
                    order.append(sel)
                merged = pa.concat_arrays(parts)      # batch-sized: safe
                inv = np.empty(len(safe), dtype=np.int64)
                inv[np.concatenate(order)] = np.arange(len(safe))
                out = merged.take(pa.array(inv))
        else:
            out = spans.take(pa.array(safe))
        if mask.any():
            out = pc.if_else(pa.array(mask), pa.nulls(len(out), out.type), out)
        return out

    def get_spans(self, url: str):
        i = int(self.indices([url])[0])
        return None if i < 0 else self.spans[i].as_py()


from dataclasses import dataclass


@dataclass(frozen=True)
class CorpusSpec:
    """Reference to a partitioned on-disk corpus (the 100 TB layout):
    pass this to Crawler/FetchStage instead of an in-memory table and
    each fetch worker lazily loads only the partitions its URLs hash
    into."""

    root: str
    num_partitions: int


class PartitionedCorpusBackend:
    """Scale-path backend: corpus laid out as hash(url)%P parquet files;
    partitions load lazily and are memoized per actor. On a cluster, P is
    sized so each partition fits a worker heap and hot partitions stay in
    the OS page cache."""

    def __init__(self, root: str, num_partitions: int):
        self.root = root
        self.P = num_partitions
        self._parts: dict[int, InMemoryCorpusBackend] = {}

    @staticmethod
    def partition_of(url: str, P: int) -> int:
        return zlib.crc32(url.encode("utf-8")) % P

    @classmethod
    def write(cls, table: pa.Table, root: str, num_partitions: int) -> None:
        urls = table.column("doc_id").to_pylist()
        pid = np.fromiter((cls.partition_of(u, num_partitions) for u in urls),
                          dtype=np.int64, count=len(urls))
        os.makedirs(root, exist_ok=True)
        for p in range(num_partitions):
            sub = table.take(pa.array(np.nonzero(pid == p)[0]))
            pq.write_table(sub, os.path.join(root, f"part-{p:05d}.parquet"))

    def _part(self, p: int) -> InMemoryCorpusBackend:
        be = self._parts.get(p)
        if be is None:
            tbl = pq.read_table(os.path.join(self.root, f"part-{p:05d}.parquet"))
            be = self._parts[p] = InMemoryCorpusBackend(tbl)
        return be

    def indices(self, urls: list[str]) -> np.ndarray:
        raise NotImplementedError("use lookup_spans; partition ids are internal")

    def lookup_spans(self, urls: list[str]) -> pa.Array:
        pid = [self.partition_of(u, self.P) for u in urls]
        out: list = [None] * len(urls)
        by_part: dict[int, list[int]] = {}
        for i, p in enumerate(pid):
            by_part.setdefault(p, []).append(i)
        chunks = []
        order = []
        for p, idxs in by_part.items():
            be = self._part(p)
            sub = be.take_spans(be.indices([urls[i] for i in idxs]))
            chunks.append(sub)
            order.extend(idxs)
        merged = pa.concat_arrays([c.cast(pa.list_(SPAN_STRUCT)) for c in chunks])
        inv = np.empty(len(urls), dtype=np.int64)
        inv[np.array(order)] = np.arange(len(urls))
        return merged.take(pa.array(inv))


def spans_text_sizes(spans: pa.Array) -> np.ndarray:
    """Per-row total text bytes of a list<struct> spans column (the
    deterministic Content-Length stand-in)."""
    arr = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
    n = len(arr)
    sizes = np.zeros(n, dtype=np.int64)
    flat_parent = pc.list_parent_indices(arr).to_numpy(zero_copy_only=False)
    if len(flat_parent) == 0:
        return sizes
    texts = arr.flatten().field("text")
    lens = pc.binary_length(texts).to_numpy(zero_copy_only=False)
    np.add.at(sizes, flat_parent.astype(np.int64), lens)
    return sizes


EMPTY_SPANS = pa.scalar([], type=pa.list_(SPAN_STRUCT))


class FetchStage:
    """map_batches callable: (url, ...) -> + spans, status, skipped_on,
    content_size. Build once per actor; vectorized per batch."""

    def __init__(self, corpus, max_file_size: int | None = None,
                 retry_config: RetryConfig | None = None,
                 transient_fail_rate: float = 0.0,
                 emit_content: bool = False,
                 robots_rules: dict | None = None):
        """``emit_content``: additionally emit ``raw_content`` — the
        page's raw HTML bytes (rendered from its spans; a real-web
        backend would return the HTTP body here) — so the parse stage
        can run the REAL HTML extractor instead of reading corpus spans
        (CrawlConfig.parse_html mode, reference path internal/
        models.go:112-126 over pkg/htmlparser/parser.go:20-98).

        ``robots_rules``: {host: [disallow path-prefixes]} — when set,
        disallowed rows are never looked up: they come back
        status="skipped", skipped_on="robots", empty spans, size 0
        (the worker-side robots evaluation of the object-store-frontier
        mode; rules are parsed once driver-side from the corpus's
        robots.txt docs and broadcast — a real-web backend fetches and
        caches them per host in this same per-actor state)."""
        import ray

        obj = ray.get(corpus) if isinstance(corpus, ray.ObjectRef) else corpus
        if isinstance(obj, CorpusSpec):  # 100 TB layout: lazy partitions
            self.backend = PartitionedCorpusBackend(obj.root,
                                                    obj.num_partitions)
        elif isinstance(obj, tuple):    # (table, sorted_hashes, perm) broadcast
            table, hs, perm = obj
            self.backend = InMemoryCorpusBackend(table, index=(hs, perm))
        else:
            self.backend = InMemoryCorpusBackend(obj)
        self.partitioned = isinstance(self.backend, PartitionedCorpusBackend)
        self.max_file_size = max_file_size
        self.retry_config = retry_config or RetryConfig(
            max_attempts=3, delay=0.0, jitter_factor=0.0)
        self.transient_fail_rate = transient_fail_rate
        self.emit_content = emit_content
        self.robots_rules = robots_rules
        self._ruled_hosts = (pa.array(
            [h for h, r in robots_rules.items() if r], pa.string())
            if robots_rules else None)
        self._failed_once: set[str] = set()

    def _robots_blocked(self, batch: pa.Table) -> np.ndarray:
        """True where robots disallows the row's URL path. The batch is
        first cut to rows whose host HAS rules with one vectorized
        membership test (a C-hash pass), so the per-row prefix checks —
        inherently per-rule-list Python — run only over the ruled
        subset, which on a real web crawl is a tiny fraction of rows."""
        out = np.zeros(batch.num_rows, dtype=bool)
        if self._ruled_hosts is None:
            # a robots-enabled crawl over a corpus with no robots.txt
            # docs (or all-empty rule lists) has nothing to block
            return out
        hosts = batch.column("host")
        ruled = pc.is_in(hosts, value_set=self._ruled_hosts).to_numpy(
            zero_copy_only=False)
        if not ruled.any():
            return out
        urls = np.asarray(batch.column("url").to_pylist(), dtype=object)
        hosts_np = np.asarray(hosts.to_pylist(), dtype=object)
        for i in np.nonzero(ruled)[0]:
            u = urls[i]
            rules = self.robots_rules[hosts_np[i]]
            path = "/" + u.split("/", 3)[3] if u.count("/") >= 3 else "/"
            out[i] = any(path.startswith(p) for p in rules)
        return out

    def _lookup_one(self, url: str) -> int:
        """Per-URL 'HTTP GET' with simulated first-attempt transient
        failure (the reference retries per item, main.go:150-156)."""
        thresh = int(self.transient_fail_rate * 1000)
        if url not in self._failed_once and \
                zlib.crc32(url.encode()) % 1000 < thresh:
            self._failed_once.add(url)
            raise ConnectionError(f"transient fetch failure for {url}")
        return int(self.backend.indices([url])[0])

    def _lookup(self, urls) -> np.ndarray:
        if self.transient_fail_rate <= 0.0:
            return self.backend.indices(urls)   # vectorized hot path
        if not isinstance(urls, list):
            urls = urls.to_pylist()
        out = np.empty(len(urls), dtype=np.int64)
        for i, u in enumerate(urls):
            try:
                out[i] = retry_call(lambda u=u: self._lookup_one(u),
                                    self.retry_config)
            except ConnectionError:
                out[i] = -1                     # exhausted -> download skip
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url")   # stays Arrow on the hot path
        if self.partitioned:
            # lazy-partition lookup (nulls mark misses); the transient-
            # failure simulation knob is an in-memory-backend test tool
            spans = self.backend.lookup_spans(urls.to_pylist())
            missing = pc.is_null(spans).to_numpy(zero_copy_only=False)
        else:
            idx = self._lookup(urls)
            spans = self.backend.take_spans(idx)
            missing = idx < 0
        blocked = (self._robots_blocked(batch)
                   if self.robots_rules is not None
                   else np.zeros(batch.num_rows, dtype=bool))
        sizes = spans_text_sizes(spans)
        sizes[blocked] = 0              # robots rows were never fetched
        oversize = (np.zeros_like(missing) if self.max_file_size is None
                    else (sizes > self.max_file_size) & ~missing)
        skipped = missing | oversize | blocked
        # skipped rows carry empty spans (oracle parity: parse of empty
        # content succeeds with zero children, Go html.Parse on nil bytes)
        spans = pc.if_else(pa.array(skipped), EMPTY_SPANS, spans)
        spans = spans.fill_null(EMPTY_SPANS)
        status = pc.if_else(pa.array(skipped), pa.scalar("skipped"), pa.scalar("ok"))
        skipped_on = pc.if_else(pa.array(skipped), pa.scalar("download"), pa.scalar(""))
        if blocked.any():
            skipped_on = pc.if_else(pa.array(blocked), pa.scalar("robots"),
                                    skipped_on)
        out = batch.append_column("spans", spans)
        out = out.append_column("content_size", pa.array(sizes))
        out = out.append_column("status", status)
        out = out.append_column("skipped_on", skipped_on)
        if self.emit_content:
            from .html_extract import render_doc_html

            kinds_l = batch.column("kind").to_pylist()
            spans_l = spans.to_pylist()
            skipped_l = skipped.tolist()
            contents = [
                render_doc_html(s).encode("utf-8")
                if k == "page" and not sk else b""
                for s, k, sk in zip(spans_l, kinds_l, skipped_l)]
            out = out.append_column(
                "raw_content", pa.array(contents, pa.large_binary()))
        return out
