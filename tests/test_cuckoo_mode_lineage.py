"""End-to-end cuckoo seen-mode + checkpoint lineage records."""

import json
import os

import pytest

from go_crawler_ray.pipelines.crawl import Crawler, CrawlConfig
from go_crawler_ray.pipelines.oracle import corpus_table_to_dict, oracle_crawl
from go_crawler_ray.sources.corpus import seed_url


@pytest.mark.usefixtures("ray_session")
class TestCuckooMode:
    def test_cuckoo_crawl_close_to_exact(self, t1_corpus):
        """seen_mode='cuckoo' at scale-capacity: a cuckoo false positive
        can only SKIP a URL (rejects a never-seen one); at t1 sizes the
        crawl should match exactly or nearly."""
        oracle = oracle_crawl(corpus_table_to_dict(t1_corpus), seed_url(0),
                              max_count=10_000)
        c = Crawler(t1_corpus, CrawlConfig(snapshot_seen=True, max_count=10_000,
                                           seen_mode="cuckoo"))
        res = c.run([seed_url(0)])
        c.shutdown()
        visited = set(res.visit_order.column("url").to_pylist())
        oracle_visited = {u for u, _, _ in oracle.visit_order}
        # no over-crawl ever; under-crawl bounded by the tiny FP rate
        assert visited <= oracle_visited
        assert len(visited) >= 0.99 * len(oracle_visited)

    def test_both_mode_exact_plus_filter(self, unit_corpus):
        oracle = oracle_crawl(corpus_table_to_dict(unit_corpus), seed_url(0),
                              max_count=10_000)
        c = Crawler(unit_corpus, CrawlConfig(snapshot_seen=True, max_count=10_000,
                                             seen_mode="both"))
        res = c.run([seed_url(0)])
        stats = c.seen.stats()
        c.shutdown()
        assert set(res.seen) == oracle.seen       # exact twin is authoritative
        assert any(s["cuckoo_load"] and s["cuckoo_load"] > 0 for s in stats)


@pytest.mark.usefixtures("ray_session")
class TestLineage:
    def test_manifest_records_partition_lineage(self, t1_corpus, tmp_path):
        ck = str(tmp_path / "ck")
        c = Crawler(t1_corpus, CrawlConfig(snapshot_seen=True, max_count=30, checkpoint_dir=ck))
        res = c.run([seed_url(0)])
        c.shutdown()
        rounds = sorted(d for d in os.listdir(ck) if d.startswith("round-"))
        assert len(rounds) == res.rounds
        all_parts = []
        for rd_ in rounds:
            with open(os.path.join(ck, rd_, "manifest.json")) as f:
                m = json.load(f)
            assert {"round", "next_seq", "pages_queued", "seen_size",
                    "docs_parts", "round_metrics",
                    "metrics"} <= set(m)
            # every recorded part exists on disk
            for p in m["docs_parts"]:
                assert os.path.exists(os.path.join(ck, "docs", p))
            all_parts.extend(m["docs_parts"])
        # lineage covers every docs part that exists
        assert sorted(all_parts) == sorted(os.listdir(os.path.join(ck, "docs")))
        # per-round metrics present with phase timings
        with open(os.path.join(ck, rounds[-1], "manifest.json")) as f:
            last = json.load(f)
        assert "phases" in (last["round_metrics"] or {})
