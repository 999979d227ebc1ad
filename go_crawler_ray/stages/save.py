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

Performance: the parse stage already canonicalized every resource span
(``span_canon`` column: canonical same-host URL or "" for dropped spans),
so this stage does NO URL parsing. Save paths and relativized refs are
memoized per worker — crawl targets repeat heavily across pages, so the
memo hit rate climbs toward 1 as the crawl proceeds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.urlnorm import (
    asset_save_path,
    link_save_path,
    make_relative_url,
    page_save_path,
)


class SaveStage:
    """map_batches callable: + save_path:string, content:large_binary."""

    def __init__(self, strict_rfc3986: bool = True, localize: bool = True,
                 enrich: bool = False):
        self.localize = localize
        self.enrich = enrich
        self._page_path: dict[str, str] = {}
        self._target_path: dict[tuple[str, bool], str] = {}
        self._rel: dict[tuple[str, str], str] = {}

    def _save_path(self, url: str, kind: str) -> str:
        if kind == "page":
            p = self._page_path.get(url)
            if p is None:
                p = self._page_path[url] = page_save_path(url)
            return p
        key = (url, False)
        p = self._target_path.get(key)
        if p is None:
            p = self._target_path[key] = asset_save_path(url)
        return p

    def _rewrite(self, canon: str, is_link: bool, page_dir_key: str) -> str:
        tkey = (canon, is_link)
        target = self._target_path.get(tkey)
        if target is None:
            target = self._target_path[tkey] = (
                link_save_path(canon) if is_link else asset_save_path(canon))
        rkey = (page_dir_key, target)
        rel = self._rel.get(rkey)
        if rel is None:
            rel = self._rel[rkey] = make_relative_url(page_dir_key, target)
        return rel

    def render_content(self, kind: str, spans: list[dict],
                       canons: list[str], save_path: str) -> bytes:
        """Reference per-row renderer (kept as the executable spec; the
        batch path below is the vectorized equivalent)."""
        lines = []
        if kind == "page" and self.localize:
            for s, c in zip(spans, canons):
                k = s["kind"]
                if k == "text":
                    lines.append(f"text\t{s['text']}")
                elif c:
                    lines.append(f"{k}\t{self._rewrite(c, k == 'link', save_path)}")
                else:
                    lines.append(f"{k}\t{s['media_ref']}")   # dropped: keep ref
        else:
            for s in spans:
                payload = s["text"] if s["kind"] == "text" else s["media_ref"]
                lines.append(f"{s['kind']}\t{payload}")
        return ("\n".join(lines) + ("\n" if lines else "")).encode("utf-8")

    def _render_batch(self, batch: pa.Table, paths: list[str]) -> pa.Array:
        """Vectorized content render: Arrow string kernels end-to-end;
        Python only touches the UNIQUE (page, target) rewrites, memoized
        across batches."""
        import pyarrow.compute as pc

        spans = batch.column("spans")
        spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
        n = batch.num_rows
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        flat = spans.flatten()
        f_kind = flat.field("kind")
        f_text = flat.field("text")
        f_ref = flat.field("media_ref")

        is_text = pc.equal(f_kind, "text")
        payload = pc.if_else(is_text, f_text, f_ref)

        if self.localize and "span_canon" in batch.column_names:
            sc = batch.column("span_canon")
            sc = sc.combine_chunks() if isinstance(sc, pa.ChunkedArray) else sc
            f_canon = sc.flatten()
            kinds_row = np.asarray(batch.column("kind").to_pylist(),
                                   dtype=object)
            localize_row = kinds_row == "page"
            canon_np = np.asarray(f_canon.to_pylist(), dtype=object)
            kept = np.array([bool(c) for c in canon_np], dtype=bool) \
                & localize_row[parent] if len(parent) else np.zeros(0, bool)
            if kept.any():
                idx = np.nonzero(kept)[0]
                is_link = pc.equal(f_kind.take(pa.array(idx)), "link") \
                    .to_numpy(zero_copy_only=False)
                rewritten = [
                    self._rewrite(canon_np[i], bool(is_link[j]),
                                  paths[parent[i]])
                    for j, i in enumerate(idx)
                ]
                pay_np = payload.to_numpy(zero_copy_only=False).astype(object)
                pay_np[idx] = rewritten
                payload = pa.array(pay_np, pa.string())

        lines = pc.binary_join_element_wise(f_kind, payload, "\t")
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(pc.list_value_length(spans).to_numpy(zero_copy_only=False),
                  out=offsets[1:])
        line_list = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), lines.cast(pa.large_string()))
        joined = pc.binary_join(line_list, pa.scalar("\n", pa.large_string()))
        nonempty = pc.greater(pc.list_value_length(spans), 0)
        content = pc.if_else(
            nonempty,
            pc.binary_join_element_wise(joined,
                                        pa.scalar("", pa.large_string()),
                                        pa.scalar("\n", pa.large_string())),
            pa.scalar("", pa.large_string()))
        return content.cast(pa.large_binary())

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        kinds = batch.column("kind").to_pylist()
        paths = [self._save_path(u, k) for u, k in zip(urls, kinds)]
        contents_arr = self._render_batch(batch, paths)
        out = batch.append_column("save_path", pa.array(paths, type=pa.string()))
        out = out.append_column("content", contents_arr)
        if self.enrich:
            # inline doc enrichment (what a training-data crawl computes at
            # save time): content fingerprint + token count
            import hashlib

            contents = contents_arr.to_pylist()
            fps = [hashlib.md5(c).hexdigest() for c in contents]
            ntok = [c.count(b" ") + c.count(b"\n") + 1 for c in contents]
            out = out.append_column("fingerprint", pa.array(fps, pa.string()))
            out = out.append_column(
                "n_tokens", pa.array(np.asarray(ntok, dtype=np.int64)))
        return out


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
