"""Save stage: save-path resolution + the localization transform (T1).

Reference semantics:
- save path: pages -> resolveLocalSavePath(url, "index", "html")
  (internal/models.go:61-63); assets -> (url, "", "") (models.go:187-189).
- Transform (internal/models.go:83-110, T1): before saving a page,
  every kept asset's ref is rewritten to the *relative local path* of the
  asset's save path, and every kept link's ref to the link target's
  would-be local ".html" path — both relativized against the page's own
  save dir (makeRelativeURL, models.go:233-249). Cross-host/dropped spans
  keep their original refs (the reference only rewrites nodes it kept).
- content: the reference re-renders the DOM to bytes; we render the spans
  to a deterministic textual form (one line per span: "kind<TAB>payload"),
  which preserves the per-row span-sequence invariant while giving the
  save sink real bytes to write.

Vectorization note: save-path resolution and relativization are pure
string functions; they run per unique URL with a per-actor memo table
(URLs repeat heavily across a crawl's spans).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.urlnorm import (
    Canonicalizer,
    asset_save_path,
    host_of,
    link_save_path,
    make_relative_url,
    page_save_path,
)
from ..schemas import RESOURCE_KINDS


class SaveStage:
    """map_batches callable: + save_path:string, content:large_binary.

    The rewrite needs the same canonicalization the parse stage did (to
    know which spans were kept and what their absolute URL is); the
    memoizing canonicalizer is shared per actor.
    """

    def __init__(self, strict_rfc3986: bool = True, localize: bool = True):
        self.canon = Canonicalizer(strict_rfc3986)
        self.localize = localize
        self._page_path: dict[str, str] = {}
        self._target_path: dict[tuple[str, bool], str] = {}

    def _save_path(self, url: str, kind: str) -> str:
        if kind == "page":
            p = self._page_path.get(url)
            if p is None:
                p = self._page_path[url] = page_save_path(url)
            return p
        key = (url, True)
        p = self._target_path.get(key)
        if p is None:
            p = self._target_path[key] = asset_save_path(url)
        return p

    def _rewrite_ref(self, ref: str, span_kind: str, page_url: str,
                     page_path: str) -> str:
        """T1 per-span rewrite; returns the original ref when the span was
        dropped at parse time (cross-host / unparsable)."""
        u = self.canon(ref, page_url)
        if u is None or host_of(u) != host_of(page_url):
            return ref
        target = link_save_path(u) if span_kind == "link" else asset_save_path(u)
        return make_relative_url(page_path, target)

    def render_content(self, url: str, kind: str, spans: list[dict],
                       save_path: str) -> bytes:
        lines = []
        if kind == "page" and self.localize:
            for s in spans:
                if s["kind"] in RESOURCE_KINDS:
                    new_ref = self._rewrite_ref(s["media_ref"], s["kind"],
                                                url, save_path)
                    lines.append(f"{s['kind']}\t{new_ref}")
                else:
                    lines.append(f"text\t{s['text']}")
        else:
            for s in spans:
                payload = s["text"] if s["kind"] == "text" else s["media_ref"]
                lines.append(f"{s['kind']}\t{payload}")
        return ("\n".join(lines) + ("\n" if lines else "")).encode("utf-8")

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        kinds = batch.column("kind").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        paths = [self._save_path(u, k) for u, k in zip(urls, kinds)]
        contents = [
            self.render_content(u, k, s, p)
            for u, k, s, p in zip(urls, kinds, spans_col, paths)
        ]
        out = batch.append_column("save_path", pa.array(paths, type=pa.string()))
        return out.append_column("content",
                                 pa.array(contents, type=pa.large_binary()))


def write_localized_tree(docs: pa.Table, out_dir: str) -> int:
    """Optional file-tree sink (S4, cmd/crawler/main.go:345-364): write
    each doc's content at out_dir/<save_path>. Returns files written.
    Used for small outputs/tests; the scale sink is partitioned Parquet."""
    import os

    n = 0
    for path, content in zip(docs.column("save_path").to_pylist(),
                             docs.column("content").to_pylist()):
        full = os.path.join(out_dir, path.lstrip("/"))
        os.makedirs(os.path.dirname(full) or out_dir, exist_ok=True)
        with open(full, "wb") as f:
            f.write(content)
        n += 1
    return n
