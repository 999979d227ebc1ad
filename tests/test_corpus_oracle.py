"""Corpus generator determinism + sequential-oracle semantics (SURVEY.md §5)."""

import pyarrow as pa

from go_crawler_ray.functions.urlnorm import host_of
from go_crawler_ray.pipelines.oracle import (
    corpus_table_to_dict,
    extract_children,
    oracle_crawl,
)
from go_crawler_ray.schemas import CORPUS_SCHEMA, RESOURCE_KINDS
from go_crawler_ray.sources.corpus import CorpusParams, generate_corpus, seed_url


class TestCorpus:
    def test_schema_matches_input_hint(self, unit_corpus):
        assert unit_corpus.schema.equals(CORPUS_SCHEMA)

    def test_deterministic(self):
        a = generate_corpus(CorpusParams.for_scale("unit"))
        b = generate_corpus(CorpusParams.for_scale("unit"))
        assert a.equals(b)

    def test_offsets_strictly_increasing(self, unit_corpus):
        for spans in unit_corpus["spans"].to_pylist():
            assert [s["offset"] for s in spans] == list(range(len(spans)))

    def test_planted_cases_present(self, t1_corpus):
        spans_all = [s for row in t1_corpus["spans"].to_pylist() for s in row]
        refs = [s["media_ref"] for s in spans_all if s["kind"] in RESOURCE_KINDS]
        assert any("#" in r for r in refs), "fragment refs planted"
        assert any("?" in r for r in refs), "querystring refs planted"
        assert any(not r.startswith("https://") for r in refs), "relative refs"
        assert any(r.startswith("https://") for r in refs), "absolute refs"
        assert any("/missing/" in r for r in refs), "dangling refs"
        # cross-host absolute refs exist
        ids = set(t1_corpus["doc_id"].to_pylist())
        hosts = {host_of(u) for u in ids}
        assert len(hosts) > 1

    def test_hot_host_dominates(self, t1_corpus):
        ids = t1_corpus["doc_id"].to_pylist()
        h0 = sum(1 for u in ids if host_of(u) == "h0.example")
        assert h0 > len(ids) / len({host_of(u) for u in ids})


class TestOracle:
    def test_seed_reaches_host_pages_only(self, unit_corpus):
        corpus = corpus_table_to_dict(unit_corpus)
        res = oracle_crawl(corpus, seed_url(0), max_count=10_000)
        assert all(host_of(u) == "h0.example" for u in res.seen)
        # every crawled page doc is on the seed host and was in the corpus or dangling
        crawled_pages = [d for d in res.docs if d["kind"] == "page"]
        assert crawled_pages[0]["doc_id"] == seed_url(0)

    def test_visit_order_is_fifo_bfs(self, unit_corpus):
        corpus = corpus_table_to_dict(unit_corpus)
        res = oracle_crawl(corpus, seed_url(0), max_count=10_000)
        seqs = [s for _, s, _ in res.visit_order]
        assert seqs == list(range(len(seqs)))
        # children of earlier parents come before children of later parents:
        # seq order equals docs order (FIFO)
        assert [d["seq"] for d in res.docs] == sorted(d["seq"] for d in res.docs)

    def test_budget_enqueue_time_and_seen_retention(self, unit_corpus):
        corpus = corpus_table_to_dict(unit_corpus)
        full = oracle_crawl(corpus, seed_url(0), max_count=10_000)
        limited = oracle_crawl(corpus, seed_url(0), max_count=3)
        pages = [d for d in limited.docs if d["kind"] == "page"]
        assert len(pages) == 3 <= limited.pages_queued
        # D1: budget-refused pages are STILL seen (queue.go:92-106)
        assert len(limited.seen) > len([d for d in limited.docs])
        assert limited.seen <= full.seen

    def test_dangling_marks_download_skip(self, t1_corpus):
        corpus = corpus_table_to_dict(t1_corpus)
        res = oracle_crawl(corpus, seed_url(0), max_count=10_000)
        skipped = [d for d in res.docs if d["skipped_on"] == "download"]
        assert skipped, "corpus plants dangling refs"
        assert all(d["status"] == "skipped" and d["n_children"] == 0 for d in skipped)

    def test_children_links_then_assets(self):
        spans = [
            {"kind": "img", "text": "", "media_ref": "i.png", "offset": 0},
            {"kind": "link", "text": "x", "media_ref": "b.html", "offset": 1},
            {"kind": "text", "text": "t", "media_ref": "", "offset": 2},
            {"kind": "css", "text": "", "media_ref": "s.css", "offset": 3},
            {"kind": "link", "text": "y", "media_ref": "a.html", "offset": 4},
        ]
        got = extract_children("https://h.example/", spans)
        assert got == [
            ("https://h.example/b.html", "page"),
            ("https://h.example/a.html", "page"),
            ("https://h.example/i.png", "asset"),
            ("https://h.example/s.css", "asset"),
        ]

    def test_dup_url_first_push_wins(self):
        # URL appearing as both link and asset -> crawled once, first kind wins
        corpus = {
            "https://h.example/": [
                {"kind": "link", "text": "", "media_ref": "x", "offset": 0},
                {"kind": "img", "text": "", "media_ref": "x", "offset": 1},
            ],
            "https://h.example/x": [{"kind": "text", "text": "z", "media_ref": "", "offset": 0}],
        }
        res = oracle_crawl(corpus, "https://h.example/", max_count=100)
        kinds = [k for u, _, k in res.visit_order if u == "https://h.example/x"]
        assert kinds == ["page"]

    def test_max_file_size_gate(self):
        corpus = {
            "https://h.example/": [
                {"kind": "link", "text": "", "media_ref": "big.html", "offset": 0}],
            "https://h.example/big.html": [
                {"kind": "text", "text": "x" * 1000, "media_ref": "", "offset": 0}],
        }
        res = oracle_crawl(corpus, "https://h.example/", max_count=100, max_file_size=100)
        big = [d for d in res.docs if d["doc_id"].endswith("big.html")]
        assert big[0]["skipped_on"] == "download"
