"""Arrow schemas for every table the engine reads or writes.

The corpus schema is exactly BASELINE.json:input_hint:
(doc_id:string, spans:array<struct<kind,text,media_ref,offset:int32>>).
Span order encodes DOM pre-order (pkg/htmlparser/parser.go:83-98); the
per-row invariant everywhere is span-sequence equality on
(kind, text, media_ref, order).

Span kinds: "text" (inline text), "link" (<a href>, internal/models.go:157),
"css"/"script"/"img" (assets, pkg/htmlparser/parser.go:41-65).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_KINDS = ("text", "link", "css", "script", "img")
RESOURCE_KINDS = ("link", "css", "script", "img")   # spans that carry a URL
ASSET_KINDS = ("css", "script", "img")              # Downloadable+Savable, not Parsable

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

CORPUS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),   # canonical URL
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Frontier rows: the accepted, deduplicated work items of one BFS round.
# kind: "page" (Parsable) | "asset" (fetch+save only) — queue routing,
# internal/queue.go:57-60. seq is the global enqueue index (FIFO order,
# queue.go:108); priority defaults to 0 ([NEW] priority frontier).
FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("seq", pa.int64()),
        ("kind", pa.string()),
        ("parent_seq", pa.int64()),   # -1 for seeds
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("host", pa.string()),
    ]
)

# Candidate rows: children extracted in a round, before dedup/budget.
CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("kind", pa.string()),
        ("parent_seq", pa.int64()),
        ("position", pa.int32()),   # index in GetChildren order (links then assets)
        ("depth", pa.int32()),
        ("host", pa.string()),
    ]
)

# Crawled-document output rows (the reference's saved item + metadata).
# status: "ok" | "skipped"; skipped_on: "" | "download" | "parse" | "save" |
# "robots" ([NEW]) — errors are data, never exceptions (internal/models.go:153).
DOCS_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("seq", pa.int64()),
        ("kind", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("content", pa.large_binary()),   # rendered/localized content (save stage)
        ("save_path", pa.string()),
        ("status", pa.string()),
        ("skipped_on", pa.string()),
        ("n_children", pa.int32()),
        ("round", pa.int32()),
    ]
)

SEEN_DELTA_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("shard", pa.int32()),
        ("round", pa.int32()),
    ]
)

VISIT_ORDER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("seq", pa.int64()),
        ("kind", pa.string()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
