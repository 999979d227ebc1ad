"""Crawl-side query surface for the driver contract.

Each callable takes ``sf_dir`` and maps it onto the deterministic
synthetic corpus scale (TESTDATA.md tiering -> FIXTURES.md F1 scales):
sf0.001->t1, sf0.01->t2, sf0.1->bench. The corpus parquet is generated
on first use at a fixed /tmp path so the DuckDB oracle can read the same
file.

The BFS crawl result is cached per (scale, budget) within the process:
several query entries expose different projections of one crawl.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..schemas import RESOURCE_KINDS
from ..sources.corpus import ensure_corpus, scale_for_sf_dir, seed_url
from .crawl import Crawler, CrawlConfig

CRAWL_BUDGET = 300        # page budget for the conformance-query crawl


def corpus_parquet(sf_dir: str) -> str:
    return ensure_corpus(scale_for_sf_dir(sf_dir))


def spans_flatten(sf_dir: str) -> pa.Table:
    """Explode the interleaved corpus to one row per span (doc_id, kind,
    text, media_ref, offset) — the flat_map shape (M5)."""
    ds = rd.read_parquet(corpus_parquet(sf_dir))

    def flatten(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
        parent = pc.list_parent_indices(spans)
        flat = spans.flatten()
        return pa.table({
            "doc_id": batch.column("doc_id").take(parent),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
        })

    parts = [b for b in ds.map_batches(flatten, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow") if b.num_rows]
    out = pa.concat_tables(parts)
    return out.sort_by([("doc_id", "ascending"), ("offset", "ascending")])


def extract_resources(sf_dir: str) -> pa.Table:
    """Resource spans with the fragment stripped (the canonicalizer's
    first step, internal/pageparser.go:39): (doc_id, kind, ref_nofrag,
    offset)."""
    flat = spans_flatten(sf_dir)
    mask = pc.is_in(flat["kind"], value_set=pa.array(RESOURCE_KINDS))
    res = flat.filter(mask)
    nofrag = pc.list_element(pc.split_pattern(res["media_ref"], "#",
                                              max_splits=1), 0)
    return pa.table({
        "doc_id": res["doc_id"],
        "kind": res["kind"],
        "ref_nofrag": nofrag,
        "offset": res["offset"],
    })


def span_stats(sf_dir: str) -> pa.Table:
    """Per-kind span tally over the corpus: (kind, n_spans, n_docs)."""
    flat = spans_flatten(sf_dir)
    g = flat.group_by("kind").aggregate(
        [("doc_id", "count"), ("doc_id", "count_distinct")])
    out = pa.table({
        "kind": g["kind"],
        "n_spans": g["doc_id_count"],
        "n_docs": g["doc_id_count_distinct"],
    })
    return out.sort_by([("kind", "ascending")])


def html_extract(sf_dir: str) -> pa.Table:
    """Render every corpus row's spans into real HTML bytes, then
    re-extract resources with the HTML-bytes parser (M1/M2,
    pkg/htmlparser/parser.go:20-98): (doc_id, kind, ref, res_idx).

    Because the renderer plants decoy elements the per-tag rules must
    drop, extract(render(spans)) == the corpus's resource spans exactly —
    which is what the DuckDB oracle recomputes."""
    from ..stages.html_extract import HtmlExtractStage, RenderHtmlStage

    ds = rd.read_parquet(corpus_parquet(sf_dir))
    out = (ds.map_batches(RenderHtmlStage(), batch_format="pyarrow")
           .map_batches(HtmlExtractStage(), batch_format="pyarrow"))
    parts = [b for b in out.iter_batches(batch_format="pyarrow")
             if b.num_rows]
    tbl = pa.concat_tables(parts)
    return tbl.sort_by([("doc_id", "ascending"), ("res_idx", "ascending")])


_CRAWL_CACHE: dict = {}


def _crawl(sf_dir: str):
    scale = scale_for_sf_dir(sf_dir)
    key = (scale, CRAWL_BUDGET)
    hit = _CRAWL_CACHE.get(key)
    if hit is None:
        corpus = pq.read_table(ensure_corpus(scale))
        # snapshot_seen: the crawl_seen_set conformance query materializes
        # the seen set against the recursive-CTE oracle — explicit opt-in
        crawler = Crawler(corpus, CrawlConfig(max_count=CRAWL_BUDGET,
                                              snapshot_seen=True))
        result = crawler.run([seed_url(0)])
        docs = crawler.docs_table()
        crawler.shutdown()
        hit = _CRAWL_CACHE[key] = (result, docs)
    return hit


def bfs_visit_order(sf_dir: str) -> pa.Table:
    """Deterministic FIFO-BFS visit order (url, seq, kind) at budget 300,
    politeness off — the reference-conformance crawl."""
    result, _ = _crawl(sf_dir)
    return result.visit_order


def crawl_docs_out(sf_dir: str) -> pa.Table:
    """Crawled-document summary (doc_id, kind, status, skipped_on,
    n_children, save_path)."""
    _, docs = _crawl(sf_dir)
    out = docs.select(["doc_id", "kind", "status", "skipped_on",
                       "n_children", "save_path"])
    return out.sort_by([("doc_id", "ascending")])


def crawl_docs_out_html(sf_dir: str) -> pa.Table:
    """Same crawled-document summary but with ``parse_html=True`` — the
    crawl's out-edges come from the REAL HTML extractor over raw page
    bytes (fetch renders, parse extracts; reference path internal/
    models.go:112-126 over pkg/htmlparser/parser.go:20-98) instead of
    corpus span metadata. Byte-identical to crawl_docs_out by the
    render→extract round-trip, so it shares that query's recursive-CTE
    SQL oracle — putting the integrated HTML-parsing crawl itself behind
    the hash-exact correctness gate."""
    scale = scale_for_sf_dir(sf_dir)
    key = (scale, CRAWL_BUDGET, "html")
    hit = _CRAWL_CACHE.get(key)
    if hit is None:
        corpus = pq.read_table(ensure_corpus(scale))
        crawler = Crawler(corpus, CrawlConfig(max_count=CRAWL_BUDGET,
                                              parse_html=True))
        crawler.run([seed_url(0)])
        docs = crawler.docs_table()
        crawler.shutdown()
        hit = _CRAWL_CACHE[key] = docs
    out = hit.select(["doc_id", "kind", "status", "skipped_on",
                      "n_children", "save_path"])
    return out.sort_by([("doc_id", "ascending")])


def crawl_seen_set(sf_dir: str) -> pd.DataFrame:
    """Final URL-seen set (sorted) — includes budget-refused pages (D1)."""
    result, _ = _crawl(sf_dir)
    return pd.DataFrame({"url": result.seen})


def crawl_metrics(sf_dir: str) -> pd.DataFrame:
    """Per-round crawl metrics (the reference's aspirational metrics
    module, internal/metrics.go:10-113, wired for real): one row per BFS
    round with frontier/candidate/accept counts and stage wall times."""
    result, _ = _crawl(sf_dir)
    rows = []
    for r in result.metrics["rounds"]:
        rows.append({
            "round": r["round"],
            "frontier": r["frontier"],
            "candidates": r["candidates"],
            "accepted_next": r["accepted_next"],
            "deferred": r["deferred"],
            "sec_total": r["sec"],
            "sec_fetch_parse_save": r["phases"].get("fetch_parse_save", 0.0),
            "sec_accept": r["phases"].get("accept", 0.0),
        })
    out = pd.DataFrame(rows)
    for c in ("round", "frontier", "candidates", "accepted_next", "deferred"):
        out[c] = out[c].astype("int64")
    return out
