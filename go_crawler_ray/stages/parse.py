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

Canonicalization is the vectorized ``canonicalize_batch`` (pandas string
kernels for the regular ref shapes, exact per-item fallback for odd
ones). The stage also emits ``span_canon`` — per span, the canonical
same-host URL or "" for dropped/text spans — so the save-side transform
(T1) never re-canonicalizes.

The stage is a callable class so the fallback canonicalizer's memo cache
is built once per worker (ST2/S3 idiom).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.urlnorm import Canonicalizer, canonicalize_batch
from ..schemas import RESOURCE_KINDS

CHILD_STRUCT = pa.struct(
    [("url", pa.string()), ("kind", pa.string()), ("position", pa.int32())]
)


class ParseStage:
    """map_batches callable: + children:list<struct<url,kind,position>>,
    span_canon:list<string>, n_children:int32."""

    def __init__(self, strict_rfc3986: bool = True, parse_html: bool = False):
        """``parse_html``: take each page's out-edges from the REAL HTML
        extractor over its ``raw_content`` bytes (stages/html_extract.py,
        reference pkg/htmlparser/parser.go:20-98) instead of the corpus
        spans' media_ref metadata. The resource spans still provide slot
        positions/kinds (the extractor emits resources in exactly that
        document order — the hash-verified render→extract round-trip),
        so children, span_canon and the BFS order are byte-identical in
        both modes."""
        self.strict = strict_rfc3986
        self.parse_html = parse_html
        self.canon = Canonicalizer(strict_rfc3986)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        spans = batch.column("spans")
        spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
        kinds = np.asarray(batch.column("kind").to_pylist(), dtype=object)
        skipped = np.asarray(batch.column("skipped_on").to_pylist(), dtype=object)
        urls = np.asarray(batch.column("url").to_pylist(), dtype=object)

        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = spans.flatten()
        n_flat = len(flat)
        flat_canon = np.full(n_flat, "", dtype=object)

        if n_flat:
            skind = np.asarray(flat.field("kind").to_pylist(), dtype=object)
            is_res = np.isin(skind, RESOURCE_KINDS)
            parent_ok = (kinds == "page") & (skipped == "")
            keep = is_res & parent_ok[parent]
        else:
            keep = np.zeros(0, dtype=bool)

        sel = np.nonzero(keep)[0]
        m = 0
        if sel.size:
            refs = np.asarray(
                flat.field("media_ref").take(pa.array(sel)).to_pylist(),
                dtype=object)
            sel_parent = parent[sel]
            if self.parse_html and "raw_content" in batch.column_names:
                # substitute the extracted raw URLs slot-for-slot: sel is
                # ascending, so each parent's resource slots are a
                # contiguous run in document order — the same order the
                # streaming extractor emits
                from .html_extract import extract_html_resources

                contents = batch.column("raw_content").to_pylist()
                uniq, starts_ = np.unique(sel_parent, return_index=True)
                run_ends = np.append(starts_[1:], len(sel_parent))
                for r, s0, s1 in zip(uniq, starts_, run_ends):
                    ext = extract_html_resources(contents[int(r)])
                    if len(ext) != int(s1 - s0):
                        # the mode exists to DETECT render→extract
                        # divergence — a count mismatch must surface,
                        # not silently blend extracted and metadata refs
                        raise ValueError(
                            f"parse_html: extractor returned {len(ext)} "
                            f"resources for page '{urls[int(r)]}' but the "
                            f"corpus has {int(s1 - s0)} resource spans")
                    for i in range(int(s1 - s0)):
                        refs[s0 + i] = ext[i][1]
            bases = urls[sel_parent]
            canon, same = canonicalize_batch(refs, bases, self.strict,
                                             fallback=self.canon)
            ok = same & np.array([u is not None for u in canon], dtype=bool)
            flat_canon[sel[ok]] = canon[ok]

            ok_idx = np.nonzero(ok)[0]
            child_parent = sel_parent[ok_idx]
            child_urls = canon[ok_idx]
            child_is_asset = np.asarray(
                [skind[sel[i]] != "link" for i in ok_idx], dtype=bool)
            m = len(ok_idx)

        if m:
            # GetChildren order: per parent, links then assets, doc order
            order = np.lexsort((np.arange(m), child_is_asset, child_parent))
            cp = child_parent[order]
            cu = child_urls[order]
            ck = np.where(child_is_asset[order], "asset", "page")
            counts = np.bincount(cp, minlength=n)
            offsets = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(counts, out=offsets[1:])
            starts = offsets[:-1]
            nz = counts > 0
            positions = np.arange(m, dtype=np.int32) - np.repeat(
                starts[nz].astype(np.int32), counts[nz])
            children_struct = pa.StructArray.from_arrays(
                [pa.array(list(cu), pa.string()),
                 pa.array(list(ck), pa.string()),
                 pa.array(positions)],
                fields=list(CHILD_STRUCT))
            children = pa.ListArray.from_arrays(pa.array(offsets), children_struct)
            n_children = counts.astype(np.int32)
        else:
            offsets = np.zeros(n + 1, dtype=np.int32)
            children = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array([], type=CHILD_STRUCT))
            n_children = np.zeros(n, dtype=np.int32)

        span_offsets = pc.list_value_length(spans).cast(pa.int32())
        soff = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(span_offsets.to_numpy(zero_copy_only=False), out=soff[1:])
        span_canon = pa.ListArray.from_arrays(
            pa.array(soff), pa.array(list(flat_canon), pa.string()))

        if "raw_content" in batch.column_names:
            batch = batch.drop_columns(["raw_content"])   # consumed here
        out = batch.append_column("children", children)
        out = out.append_column("span_canon", span_canon)
        return out.append_column("n_children", pa.array(n_children))


def explode_children(batch: pa.Table) -> pa.Table:
    """children list column -> candidate rows (CANDIDATE_SCHEMA).

    A stateless flat-map (M5). Host extraction is a vectorized substring
    (children URLs are canonical absolute http(s) URLs by construction).
    """
    children = batch.column("children")
    children = (children.combine_chunks()
                if isinstance(children, pa.ChunkedArray) else children)
    parent = pc.list_parent_indices(children)
    flat = children.flatten()
    seqs = batch.column("seq").take(parent)
    depths = pc.add(batch.column("depth").take(parent), 1).cast(pa.int32())
    urls = flat.field("url")
    # host = text between "://" and the next "/" — pure Arrow kernels
    # (children are canonical absolute URLs; scheme is http or https)
    stripped = pc.replace_substring_regex(urls, r"^https?://", "",
                                          max_replacements=1)
    hosts = pc.list_element(
        pc.split_pattern(stripped, "/", max_splits=1), 0)
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
