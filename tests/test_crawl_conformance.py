"""Conformance: the Ray BFS-round crawl must match the sequential oracle
exactly — final URL-seen set, visit (enqueue) ordering, per-doc spans
(SURVEY.md §5 items 1-3, 5, 6)."""

import pyarrow as pa
import pytest

from go_crawler_ray.pipelines.crawl import Crawler, CrawlConfig
from go_crawler_ray.pipelines.oracle import corpus_table_to_dict, oracle_crawl
from go_crawler_ray.sources.corpus import CorpusParams, generate_corpus, seed_url


def run_both(corpus_tbl, seed, max_count, **cfg_kw):
    corpus = corpus_table_to_dict(corpus_tbl)
    oracle = oracle_crawl(corpus, seed, max_count=max_count,
                          max_file_size=cfg_kw.get("max_file_size"))
    crawler = Crawler(corpus_tbl, CrawlConfig(snapshot_seen=True, max_count=max_count, **cfg_kw))
    result = crawler.run([seed])
    crawler.shutdown()
    return oracle, result, crawler


def tiny_corpus(rows: dict[str, list[dict]]) -> pa.Table:
    from go_crawler_ray.schemas import CORPUS_SCHEMA

    ids, spans = [], []
    for u, ss in rows.items():
        for k, s in enumerate(ss):
            s.setdefault("offset", k)
        ids.append(u)
        spans.append(ss)
    return pa.Table.from_pydict({"doc_id": ids, "spans": spans},
                                schema=CORPUS_SCHEMA)


@pytest.mark.usefixtures("ray_session")
class TestConformance:
    def test_unit_corpus_unbounded(self, unit_corpus):
        oracle, result, _ = run_both(unit_corpus, seed_url(0), 10_000)
        assert set(result.seen) == oracle.seen
        got = list(zip(result.visit_order.column("url").to_pylist(),
                       result.visit_order.column("seq").to_pylist(),
                       result.visit_order.column("kind").to_pylist()))
        assert got == oracle.visit_order

    def test_t1_corpus_with_budget(self, t1_corpus):
        oracle, result, crawler = run_both(t1_corpus, seed_url(0), 50)
        assert result.pages_queued == oracle.pages_queued == 50
        assert set(result.seen) == oracle.seen
        got = list(zip(result.visit_order.column("url").to_pylist(),
                       result.visit_order.column("seq").to_pylist(),
                       result.visit_order.column("kind").to_pylist()))
        assert got == oracle.visit_order

    def test_parse_html_mode_identical_t1(self, t1_corpus):
        """parse_html=True routes out-edges through the REAL HTML
        extractor (render -> extract over raw bytes) instead of corpus
        span metadata; the crawl must be byte-identical in both modes."""
        base = Crawler(t1_corpus, CrawlConfig(snapshot_seen=True,
                                              max_count=50))
        r_base = base.run([seed_url(0)])
        base.shutdown()
        html = Crawler(t1_corpus, CrawlConfig(snapshot_seen=True,
                                              max_count=50,
                                              parse_html=True))
        r_html = html.run([seed_url(0)])
        html.shutdown()
        assert r_base.visit_order.equals(r_html.visit_order)
        assert r_base.seen == r_html.seen
        assert r_base.pages_queued == r_html.pages_queued

    def test_parse_html_mode_identical_t2(self):
        import pyarrow.parquet as pq

        from go_crawler_ray.sources.corpus import ensure_corpus

        tbl = pq.read_table(ensure_corpus("t2"))
        out = []
        for flag in (False, True):
            c = Crawler(tbl, CrawlConfig(snapshot_seen=True, max_count=120,
                                         parse_html=flag))
            out.append(c.run([seed_url(0)]))
            c.shutdown()
        assert out[0].visit_order.equals(out[1].visit_order)
        assert out[0].seen == out[1].seen

    def test_docs_span_sequence_equality(self, unit_corpus):
        """Per-row invariant: (kind, text, media_ref, order) equality."""
        oracle, result, crawler = run_both(unit_corpus, seed_url(0), 10_000)
        docs = crawler.docs_table()
        by_id = {}
        for i in range(docs.num_rows):
            by_id[docs.column("doc_id")[i].as_py()] = \
                docs.column("spans")[i].as_py()
        for od in oracle.docs:
            got = by_id[od["doc_id"]]
            want = od["spans"]
            assert [(s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in got] == \
                   [(s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in want], od["doc_id"]

    def test_docs_status_and_counts(self, t1_corpus):
        oracle, result, crawler = run_both(t1_corpus, seed_url(0), 40)
        docs = crawler.docs_table()
        got = {(docs.column("doc_id")[i].as_py(),
                docs.column("status")[i].as_py(),
                docs.column("skipped_on")[i].as_py(),
                docs.column("n_children")[i].as_py())
               for i in range(docs.num_rows)}
        want = {(d["doc_id"], d["status"], d["skipped_on"], d["n_children"])
                for d in oracle.docs}
        assert got == want

    def test_budget_refused_still_seen(self):
        corpus = tiny_corpus({
            "https://h.example/": [
                {"kind": "link", "text": "", "media_ref": "a.html"},
                {"kind": "link", "text": "", "media_ref": "b.html"},
                {"kind": "link", "text": "", "media_ref": "c.html"},
            ],
            "https://h.example/a.html": [
                {"kind": "link", "text": "", "media_ref": "c.html"}],
            "https://h.example/b.html": [{"kind": "text", "text": "x", "media_ref": ""}],
            "https://h.example/c.html": [{"kind": "text", "text": "y", "media_ref": ""}],
        })
        oracle, result, _ = run_both(corpus, "https://h.example/", 2)
        # budget 2: seed + a.html crawled; b/c refused but SEEN; a's re-link
        # to c is dedup-rejected (c already seen via refusal)
        assert oracle.pages_queued == result.pages_queued == 2
        assert set(result.seen) == oracle.seen
        assert "https://h.example/c.html" in set(result.seen)
        visited = set(result.visit_order.column("url").to_pylist())
        assert "https://h.example/c.html" not in visited

    def test_dup_link_asset_first_wins(self):
        corpus = tiny_corpus({
            "https://h.example/": [
                {"kind": "img", "text": "", "media_ref": "x"},
                {"kind": "link", "text": "", "media_ref": "x"},
            ],
            "https://h.example/x": [{"kind": "text", "text": "z", "media_ref": ""}],
        })
        oracle, result, _ = run_both(corpus, "https://h.example/", 100)
        got = list(zip(result.visit_order.column("url").to_pylist(),
                       result.visit_order.column("seq").to_pylist(),
                       result.visit_order.column("kind").to_pylist()))
        assert got == oracle.visit_order
        # link (page) wins: GetChildren emits links BEFORE assets even
        # though the img span comes first in the document
        kinds = [k for u, _, k in got if u == "https://h.example/x"]
        assert kinds == ["page"]

    def test_max_file_size_gate(self):
        corpus = tiny_corpus({
            "https://h.example/": [
                {"kind": "link", "text": "", "media_ref": "big.html"}],
            "https://h.example/big.html": [
                {"kind": "text", "text": "x" * 500, "media_ref": ""}],
        })
        oracle, result, crawler = run_both(corpus, "https://h.example/", 100,
                                           max_file_size=100)
        docs = crawler.docs_table()
        by_id = {docs.column("doc_id")[i].as_py():
                 docs.column("skipped_on")[i].as_py()
                 for i in range(docs.num_rows)}
        assert by_id["https://h.example/big.html"] == "download"

    def test_transient_failures_retried(self, unit_corpus):
        """With retry enabled, deterministic first-attempt failures don't
        change the result (R1 integration)."""
        oracle, result, _ = run_both(unit_corpus, seed_url(0), 10_000,
                                     transient_fail_rate=0.5,
                                     retry_attempts=3)
        assert set(result.seen) == oracle.seen

    def test_metrics_populated(self, unit_corpus):
        _, result, _ = run_both(unit_corpus, seed_url(0), 10_000)
        m = result.metrics
        assert m["pages_fetched"] > 0 and m["assets_fetched"] > 0
        assert m["elapsed_sec"] > 0 and m["urls_per_sec"] > 0
        assert len(m["rounds"]) == result.rounds
