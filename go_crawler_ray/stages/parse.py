"""Parse stage: spans -> canonicalized child candidates.

The reference's Parse() (internal/models.go:112-126) builds a DOM and
extracts/resolves out-edges; our corpus rows already carry the extraction
result as ordered spans, so "parse" = validate spans + canonicalize refs
+ classify children, vectorized over the Arrow batch.

Reproduced semantics:
- per-span resolve: fragment strip -> resolve vs page URL -> drop parse
  failures and cross-host targets (internal/pageparser.go:28-68, M4);
- child classification: span kind "link" (<a>) -> a new page; css/script/
  img -> asset (pageparser.go:49-64);
- child ORDER: links first (doc order), then assets (doc order) —
  GetChildren, internal/models.go:128-147 (M5). ``position`` is the index
  in that order; it is the tie-breaker that makes BFS order reproducible
  under parallelism (SURVEY.md §7.3).
- only pages parse (assets have no children: queue routing
  internal/queue.go:57-60); download-skipped pages yield zero children.

The stage is a callable class so the memoizing canonicalizer (compiled
regex + (base, ref) cache) is built once per actor (ST2/S3 idiom).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.urlnorm import Canonicalizer, host_of
from ..schemas import RESOURCE_KINDS

CHILD_STRUCT = pa.struct(
    [("url", pa.string()), ("kind", pa.string()), ("position", pa.int32())]
)


class ParseStage:
    """map_batches callable: + children:list<struct<url,kind,position>>,
    n_children:int32."""

    def __init__(self, strict_rfc3986: bool = True):
        self.canon = Canonicalizer(strict_rfc3986)
        self._host_cache: dict[str, str] = {}

    def _host(self, url: str) -> str:
        h = self._host_cache.get(url)
        if h is None:
            h = self._host_cache[url] = host_of(url)
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        spans = batch.column("spans")
        spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
        urls = batch.column("url").to_pylist()
        kinds = batch.column("kind").to_pylist()
        skipped = batch.column("skipped_on").to_pylist()

        # flatten resource spans with parent row indices
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        flat = spans.flatten()
        if len(parent):
            skind = flat.field("kind").to_numpy(zero_copy_only=False)
            is_res = np.isin(skind, RESOURCE_KINDS)
        else:
            skind = np.array([], dtype=object)
            is_res = np.zeros(0, dtype=bool)

        # candidate selection: parent must be a live page
        parent_ok = np.fromiter(
            ((kinds[i] == "page") and (skipped[i] == "") for i in range(n)),
            dtype=bool, count=n)
        keep = is_res & parent_ok[parent] if len(parent) else is_res

        sel = np.nonzero(keep)[0]
        refs = flat.field("media_ref").take(pa.array(sel)).to_pylist()
        sel_parent = parent[sel]
        sel_kind = skind[sel]

        canon = self.canon
        child_urls: list[str] = []
        child_kind: list[str] = []
        child_parent: list[int] = []
        child_is_asset: list[bool] = []
        child_span_pos: list[int] = []
        for j, ref in enumerate(refs):
            p = int(sel_parent[j])
            base = urls[p]
            u = canon(ref, base)
            if u is None or self._host(u) != self._host(base):
                continue
            is_asset = sel_kind[j] != "link"
            child_urls.append(u)
            child_kind.append("asset" if is_asset else "page")
            child_parent.append(p)
            child_is_asset.append(is_asset)
            child_span_pos.append(j)

        m = len(child_urls)
        if m:
            # GetChildren order: per parent, links then assets, doc order
            order = np.lexsort((np.array(child_span_pos),
                                np.array(child_is_asset),
                                np.array(child_parent)))
            cp = np.array(child_parent)[order]
            cu = [child_urls[i] for i in order]
            ck = [child_kind[i] for i in order]
            counts = np.bincount(cp, minlength=n)
            offsets = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(counts, out=offsets[1:])
            starts = offsets[:-1]
            positions = np.arange(m, dtype=np.int32) - np.repeat(
                starts[counts > 0].astype(np.int32), counts[counts > 0])
            children_struct = pa.StructArray.from_arrays(
                [pa.array(cu), pa.array(ck), pa.array(positions)],
                fields=list(CHILD_STRUCT))
            children = pa.ListArray.from_arrays(pa.array(offsets), children_struct)
            n_children = counts.astype(np.int32)
        else:
            offsets = np.zeros(n + 1, dtype=np.int32)
            children = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array([], type=CHILD_STRUCT))
            n_children = np.zeros(n, dtype=np.int32)

        out = batch.append_column("children", children)
        return out.append_column("n_children", pa.array(n_children))


def explode_children(batch: pa.Table) -> pa.Table:
    """children list column -> candidate rows (CANDIDATE_SCHEMA).

    A stateless map_batches fn (flat_map shape, M5)."""
    children = batch.column("children")
    children = (children.combine_chunks()
                if isinstance(children, pa.ChunkedArray) else children)
    parent = pc.list_parent_indices(children)
    flat = children.flatten()
    seqs = batch.column("seq").take(parent)
    depths = pc.add(batch.column("depth").take(parent), 1).cast(pa.int32())
    urls = flat.field("url")
    hosts = pa.array([host_of(u) for u in urls.to_pylist()])
    return pa.table(
        {
            "url": urls,
            "kind": flat.field("kind"),
            "parent_seq": seqs,
            "position": flat.field("position"),
            "depth": depths,
            "host": hosts,
        }
    )
