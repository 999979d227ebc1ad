"""CLI config surface (S6), file-tree sink (S4), partitioned corpus
backend (scale fetch path)."""

import json
import os
import subprocess
import sys

import pytest

from go_crawler_ray.cli import load_config


class TestConfig:
    def test_defaults_match_reference(self, monkeypatch):
        for k in list(os.environ):
            if k.startswith("CRAWLER_"):
                monkeypatch.delenv(k)
        cfg = load_config(["--url", "https://h0.example/"])
        # internal/config.go:29-37 defaults
        assert cfg.max_count == 100
        assert cfg.max_concurrent == 10
        assert cfg.max_file_size == 64 << 20
        assert cfg.timeout == 30.0
        assert cfg.retry_attempts == 3
        assert cfg.retry_delay == 1.0
        assert cfg.output_dir == "./.tmp/"
        assert cfg.log_level == "info"

    def test_env_overrides_and_duration_parse(self, monkeypatch):
        monkeypatch.setenv("CRAWLER_MAX_COUNT", "7")
        monkeypatch.setenv("CRAWLER_TIMEOUT", "45s")
        monkeypatch.setenv("CRAWLER_RETRY_DELAY", "500ms")
        cfg = load_config(["--url", "x://y"])
        assert cfg.max_count == 7
        assert cfg.timeout == 45.0
        assert cfg.retry_delay == 0.5

    def test_flag_beats_env(self, monkeypatch):
        monkeypatch.setenv("CRAWLER_MAX_COUNT", "7")
        cfg = load_config(["--url", "x://y", "--max-count", "9"])
        assert cfg.max_count == 9

    def test_missing_url_errors(self, monkeypatch):
        monkeypatch.delenv("CRAWLER_URL", raising=False)
        with pytest.raises(SystemExit):
            load_config([])

    def test_validation(self):
        with pytest.raises(SystemExit):
            load_config(["--url", "x://y", "--max-concurrent", "0"])


@pytest.mark.usefixtures("ray_session")
class TestFileTreeSink:
    def test_write_localized_tree(self, unit_corpus, tmp_path):
        from go_crawler_ray.pipelines.crawl import Crawler, CrawlConfig
        from go_crawler_ray.stages.save import write_localized_tree
        from go_crawler_ray.sources.corpus import seed_url

        c = Crawler(unit_corpus, CrawlConfig(snapshot_seen=True, max_count=100))
        c.run([seed_url(0)])
        docs = c.docs_table()
        c.shutdown()
        n = write_localized_tree(docs, str(tmp_path))
        assert n == docs.num_rows
        # root page at its resolved save path (models.go:61-63 fallback)
        root = tmp_path / "index.html"
        assert root.exists()
        body = root.read_text()
        # T1: kept resource refs rewritten to relative local paths
        assert "./static/" in body or "../static/" in body

    def test_cli_end_to_end(self, tmp_path):
        """Drive the real CLI in a subprocess (fresh Ray session)."""
        env = dict(os.environ, CRAWLER_LOG_LEVEL="error",
                   PYTHONPATH="/root/repo")
        out = subprocess.run(
            [sys.executable, "-m", "go_crawler_ray",
             "--url", "https://h0.example/", "--corpus", "unit",
             "--max-count", "20", "--output-dir", str(tmp_path),
             "--write-tree"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300)
        assert out.returncode == 0, out.stderr[-2000:]
        summary = json.loads(out.stdout.strip().splitlines()[-1])
        assert summary["pages_queued"] <= 20
        assert summary["urls_visited"] > 0
        assert os.path.isdir(tmp_path / "site")
        assert os.path.isdir(summary["checkpoint_dir"])


@pytest.mark.usefixtures("ray_session")
class TestPartitionedBackend:
    def test_roundtrip_lookup(self, t1_corpus, tmp_path):
        from go_crawler_ray.stages.fetch import PartitionedCorpusBackend

        root = str(tmp_path / "parts")
        PartitionedCorpusBackend.write(t1_corpus, root, num_partitions=8)
        assert len(os.listdir(root)) == 8
        be = PartitionedCorpusBackend(root, 8)
        urls = t1_corpus["doc_id"].to_pylist()[:50] + ["https://nope.example/x"]
        spans = be.lookup_spans(urls)
        assert len(spans) == 51
        assert spans[50].as_py() is None           # miss -> null
        # hits identical to source rows
        want = t1_corpus["spans"].to_pylist()[:50]
        got = spans.to_pylist()[:50]
        assert got == want
        # only touched partitions are memoized
        assert 0 < len(be._parts) <= 8

    def test_crawl_over_partitioned_corpus_matches_in_memory(
            self, t1_corpus, tmp_path):
        """End-to-end: the crawl driven by a CorpusSpec (lazy partition
        loads inside fetch workers — the 100 TB corpus layout) must
        reproduce the in-memory crawl byte for byte."""
        from go_crawler_ray.pipelines.crawl import Crawler, CrawlConfig
        from go_crawler_ray.stages.fetch import (CorpusSpec,
                                                 PartitionedCorpusBackend)
        from go_crawler_ray.sources.corpus import seed_url

        root = str(tmp_path / "pcorpus")
        PartitionedCorpusBackend.write(t1_corpus, root, num_partitions=8)

        cfg = CrawlConfig(snapshot_seen=True, max_count=60)
        mem = Crawler(t1_corpus, cfg)
        r_mem = mem.run([seed_url(0)])
        mem.shutdown()

        part = Crawler(CorpusSpec(root, 8), CrawlConfig(snapshot_seen=True, max_count=60))
        r_part = part.run([seed_url(0)])
        part.shutdown()

        assert r_part.visit_order.to_pylist() == r_mem.visit_order.to_pylist()
        assert r_part.seen == r_mem.seen
