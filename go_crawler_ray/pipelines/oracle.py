"""Sequential oracle: single-worker reference semantics, pure Python.

This is the executable spec the Ray pipeline must match (SURVEY.md §5).
It reimplements exactly the reference's single-worker behavior:

- FIFO frontier: container/list PushBack/Front (internal/queue.go:49,108)
  -> deterministic BFS from the seed; ``seq`` is the global enqueue index.
- Dedup-before-budget at push: a URL is marked seen *before* the page
  budget check, so a budget-refused page is permanently seen and can
  never be crawled later (internal/queue.go:92-106).
- Enqueue-time page budget: pages counted when pushed, not completed;
  assets unlimited (queue.go:101-106).
- Fetch: lookup in the synthetic corpus; a miss (dangling URL) or an
  over-size document marks skipped_on="download" (cmd/crawler/main.go:161,
  size gate main.go:319-330); the item still flows to the end (M7).
- Parse: download-skipped pages parse empty content successfully (Go
  html.Parse never fails on empty bytes) -> zero children, skipped_on
  stays "download". Children = links (doc order) then assets (doc order)
  (internal/models.go:128-147), built from spans via canonicalize
  (fragment strip -> resolve -> same-host filter,
  internal/pageparser.go:28-68).
- Save: compute save path (internal/models.go:61-63, 187-189); always
  succeeds here (no disk errors in the model).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from ..functions.urlnorm import (
    asset_save_path,
    canonicalize_url,
    host_of,
    page_save_path,
)
from ..schemas import RESOURCE_KINDS


@dataclass
class OracleResult:
    visit_order: list[tuple[str, int, str]] = field(default_factory=list)  # (url, seq, kind)
    seen: set[str] = field(default_factory=set)
    docs: list[dict] = field(default_factory=list)
    pages_queued: int = 0
    rounds: int = 0


def doc_content_size(spans: list[dict]) -> int:
    """Deterministic stand-in for Content-Length: total text bytes."""
    return sum(len(s["text"]) for s in spans)


def extract_children(page_url: str, spans: list[dict],
                     strict_rfc3986: bool = True) -> list[tuple[str, str]]:
    """(url, kind) children of a page in GetChildren order.

    kind is "page" for <a> links, "asset" otherwise. Order: links in span
    order, then assets in span order (internal/models.go:128-147).
    """
    page_host = host_of(page_url)
    links: list[str] = []
    assets: list[str] = []
    for s in spans:
        if s["kind"] not in RESOURCE_KINDS:
            continue
        u = canonicalize_url(s["media_ref"], page_url, strict_rfc3986)
        if u is None or host_of(u) != page_host:
            continue
        (links if s["kind"] == "link" else assets).append(u)
    return [(u, "page") for u in links] + [(u, "asset") for u in assets]


def oracle_crawl(
    corpus: dict[str, list[dict]],
    seed: str,
    max_count: int = 100,
    max_file_size: int | None = None,
    strict_rfc3986: bool = True,
) -> OracleResult:
    """Run the sequential reference crawl over an in-memory corpus.

    ``corpus`` maps canonical URL -> spans (list of dicts with kind/text/
    media_ref/offset). Returns visit order, seen set and per-doc outputs.
    """
    res = OracleResult()
    queue: deque[tuple[str, int, str, int]] = deque()  # (url, seq, kind, depth)
    next_seq = 0

    def push(url: str, kind: str, depth: int) -> bool:
        nonlocal next_seq
        if url in res.seen:
            return False
        res.seen.add(url)                      # seen BEFORE budget (queue.go:92-96)
        if kind == "page":
            if res.pages_queued >= max_count:  # refused but stays seen (queue.go:101-104)
                return False
            res.pages_queued += 1
        queue.append((url, next_seq, kind, depth))
        res.visit_order.append((url, next_seq, kind))
        next_seq += 1
        return True

    push(seed, "page", 0)
    max_depth_seen = 0

    while queue:
        url, seq, kind, depth = queue.popleft()
        max_depth_seen = max(max_depth_seen, depth)
        spans = corpus.get(url)
        skipped_on = ""
        if spans is None:
            spans, skipped_on = [], "download"
        elif max_file_size is not None and doc_content_size(spans) > max_file_size:
            spans, skipped_on = [], "download"

        children: list[tuple[str, str]] = []
        if kind == "page" and not skipped_on:
            children = extract_children(url, spans, strict_rfc3986)
            for curl, ckind in children:
                push(curl, ckind, depth + 1)

        res.docs.append(
            {
                "doc_id": url,
                "seq": seq,
                "kind": kind,
                "spans": spans,
                "save_path": page_save_path(url) if kind == "page" else asset_save_path(url),
                "status": "skipped" if skipped_on else "ok",
                "skipped_on": skipped_on,
                "n_children": len(children),
            }
        )

    res.rounds = max_depth_seen + 1
    return res


def corpus_table_to_dict(tbl) -> dict[str, list[dict]]:
    """pyarrow corpus table -> {doc_id: spans} for the oracle."""
    out: dict[str, list[dict]] = {}
    for doc_id, spans in zip(tbl["doc_id"].to_pylist(), tbl["spans"].to_pylist()):
        out[doc_id] = spans
    return out
