"""HTML-bytes resource extractor (M1/M2): the reference's real parser.

Reproduces /root/reference/pkg/htmlparser/parser.go:20-98 over raw HTML
bytes, using only the Python stdlib tokenizer:

- collect ``a``/``link``/``script``/``img`` elements in DOCUMENT ORDER
  (the reference walks the parsed DOM depth-first pre-order,
  parser.go:83-98; a streaming tokenizer emits start tags in exactly
  that order for the element kinds collected here);
- per-tag URL attribute rules (ReadResourceURL, parser.go:41-65):
  ``script``/``img`` -> ``src``; ``a`` -> ``href``; ``link`` -> ``href``
  ONLY when ``type="text/css"`` or ``rel="stylesheet"`` (exact,
  case-sensitive value comparison, as Go does) — non-stylesheet
  ``<link>``s are dropped;
- first occurrence of an attribute wins (readHTMLNodeAttrValue,
  parser.go:100-108); a present-but-empty attribute still collects
  (Go returns ok=true for ``href=""``).

The map_batches stage turns a ``(doc_id, content: binary)`` batch into
one row per extracted resource ``(doc_id, kind, ref, res_idx)`` where
``kind`` is the span kind (a->link, link->css, script->script, img->img)
and ``res_idx`` the document-order index — the raw extraction level of
pkg/htmlparser (fragments intact, no host filter; resolution/filtering
is the parse stage's job, M4).

``render_doc_html`` is the inverse used by the conformance query: it
renders a corpus row's spans into an HTML page (with planted decoy
elements the parser must drop), so extract(render(spans)) must equal the
resource spans exactly — giving the HTML parser a value-exact DuckDB
oracle over the corpus table.
"""

from __future__ import annotations

import html as _html
from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

_COLLECT_TAGS = frozenset(("a", "link", "script", "img"))

# reference span kinds per tag (corpus.py span vocabulary)
_TAG_TO_KIND = {"a": "link", "link": "css", "script": "script", "img": "img"}


def _first_attr(attrs: list[tuple[str, str | None]], name: str):
    """First occurrence wins; a bare attribute reads as "" (both match
    Go's readHTMLNodeAttrValue / tokenizer behavior)."""
    for k, v in attrs:
        if k == name:
            return v if v is not None else ""
    return None


def read_resource_url(tag: str, attrs) -> str | None:
    """ReadResourceURL (parser.go:41-65): the per-tag attribute rule."""
    if tag in ("script", "img"):
        return _first_attr(attrs, "src")
    if tag == "a":
        return _first_attr(attrs, "href")
    if tag == "link":
        type_attr = _first_attr(attrs, "type")
        rel_attr = _first_attr(attrs, "rel")
        if type_attr == "text/css" or rel_attr == "stylesheet":
            return _first_attr(attrs, "href")
        return None
    return None


class _ResourceCollector(HTMLParser):
    """Streaming collector: (tag, url) pairs in document order."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.out: list[tuple[str, str]] = []

    def _visit(self, tag: str, attrs) -> None:
        if tag in _COLLECT_TAGS:
            url = read_resource_url(tag, attrs)
            if url is not None:
                self.out.append((tag, url))

    def handle_starttag(self, tag, attrs):
        self._visit(tag, attrs)

    def handle_startendtag(self, tag, attrs):    # <img ... />
        self._visit(tag, attrs)


def extract_html_resources(content: bytes | str) -> list[tuple[str, str]]:
    """ParseHTMLResources' resource list (parser.go:20-39): ordered
    (tag, raw url) pairs — fragments kept, hosts unfiltered."""
    if isinstance(content, (bytes, bytearray, memoryview)):
        content = bytes(content).decode("utf-8", errors="replace")
    p = _ResourceCollector()
    p.feed(content)
    p.close()
    return p.out


class HtmlExtractStage:
    """map_batches callable: (doc_id, content) -> exploded
    (doc_id, kind, ref, res_idx) resource rows.

    Per-row Python is inherent here (an HTML tokenizer is a per-document
    kernel, like the reference's html.Parse per page); the stage
    distributes it across map tasks and emits columnar output."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, refs, idxs = [], [], [], []
        for doc_id, content in zip(batch.column("doc_id").to_pylist(),
                                   batch.column("content").to_pylist()):
            for i, (tag, url) in enumerate(extract_html_resources(content)):
                ids.append(doc_id)
                kinds.append(_TAG_TO_KIND[tag])
                refs.append(url)
                idxs.append(i)
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "ref": pa.array(refs, pa.string()),
            "res_idx": pa.array(np.array(idxs, dtype=np.int32)),
        })


def render_doc_html(spans: list[dict]) -> str:
    """Deterministic spans -> HTML renderer (the conformance inverse).

    Every resource span becomes the tag the reference's per-tag rules
    re-extract; decoy elements that must NOT be extracted are planted
    between spans (non-stylesheet <link>s, anchor-less <a>, src-less
    <img>) so the round-trip actually exercises the drop rules."""
    e = _html.escape
    parts = ["<!DOCTYPE html><html><head>",
             '<link rel="icon" href="/favicon.ico">',   # decoy: dropped
             "</head><body>"]
    for s in spans:
        kind, text, ref = s["kind"], s["text"], s["media_ref"]
        off = s["offset"]
        if kind == "text":
            parts.append(f"<p>{e(text)}</p>")
        elif kind == "link":
            parts.append(f'<a href="{e(ref, quote=True)}">{e(text)}</a>')
        elif kind == "css":
            # alternate the two attribute forms ReadResourceURL accepts
            if off % 2:
                parts.append(f'<link type="text/css" '
                             f'href="{e(ref, quote=True)}">')
            else:
                parts.append(f'<link rel="stylesheet" '
                             f'href="{e(ref, quote=True)}">')
        elif kind == "script":
            parts.append(f'<script src="{e(ref, quote=True)}"></script>')
        elif kind == "img":
            parts.append(f'<img src="{e(ref, quote=True)}" alt="x">')
        if off % 3 == 0:
            # decoys: no URL attribute / non-stylesheet link -> dropped
            parts.append('<a name="anchor"></a><img alt="no-src">'
                         '<link rel="alternate" type="application/rss+xml" '
                         'href="/feed.xml">')
    parts.append("</body></html>")
    return "".join(parts)


class RenderHtmlStage:
    """map_batches callable: corpus (doc_id, spans) -> (doc_id, content)
    HTML bytes — the synthetic corpus's 'raw page body'."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        contents = [render_doc_html(s).encode("utf-8")
                    for s in spans_col.to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "content": pa.array(contents, pa.large_binary()),
        })
