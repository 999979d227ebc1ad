"""Checkpoint/resume (SURVEY.md §5 item 5) and [NEW] politeness/robots
semantics (our own spec — the reference has neither)."""

import os

import pytest

from go_crawler_ray.pipelines.crawl import Crawler, CrawlConfig
from go_crawler_ray.pipelines.oracle import corpus_table_to_dict, oracle_crawl
from go_crawler_ray.sources.corpus import seed_url


@pytest.mark.usefixtures("ray_session")
class TestResume:
    def test_kill_after_k_rounds_resume_identical(self, t1_corpus, tmp_path):
        seed = seed_url(0)
        # uninterrupted reference run
        c_full = Crawler(t1_corpus, CrawlConfig(snapshot_seen=True, 
            max_count=60, checkpoint_dir=str(tmp_path / "full")))
        full = c_full.run([seed])
        c_full.shutdown()

        # interrupted after 2 rounds...
        ck = str(tmp_path / "ck")
        c1 = Crawler(t1_corpus, CrawlConfig(snapshot_seen=True, max_count=60, checkpoint_dir=ck))
        c1.run([seed], max_rounds=2)
        c1.shutdown()
        assert os.path.exists(os.path.join(ck, "round-00001", "manifest.json"))

        # ...then resumed from the checkpoint
        c2 = Crawler.resume(t1_corpus, ck,
                            CrawlConfig(snapshot_seen=True, max_count=60, checkpoint_dir=ck))
        resumed = c2._loop()
        c2.shutdown()

        assert set(resumed.seen) == set(full.seen)
        assert resumed.pages_queued == full.pages_queued
        got = list(zip(resumed.visit_order.column("url").to_pylist(),
                       resumed.visit_order.column("seq").to_pylist()))
        want = list(zip(full.visit_order.column("url").to_pylist(),
                        full.visit_order.column("seq").to_pylist()))
        assert got == want

    def test_docs_partitioned_per_round(self, unit_corpus, tmp_path):
        ck = str(tmp_path / "ck2")
        c = Crawler(unit_corpus, CrawlConfig(snapshot_seen=True, max_count=100, checkpoint_dir=ck))
        res = c.run([seed_url(0)])
        c.shutdown()
        files = sorted(os.listdir(os.path.join(ck, "docs")))
        assert all(f.startswith("round-") for f in files)
        # partitioned per round (workers write parts; >=1 part per round
        # that produced docs)
        rounds_with_parts = {f.split("-")[1] for f in files}
        assert len(rounds_with_parts) == res.rounds
        ds = res.docs_dataset()
        assert ds.count() == len(res.visit_order)


@pytest.mark.usefixtures("ray_session")
class TestPoliteness:
    def test_tokens_defer_not_drop(self, t1_corpus):
        """Politeness changes WHEN a URL is fetched, never WHETHER."""
        seed = seed_url(0)
        base = Crawler(t1_corpus, CrawlConfig(snapshot_seen=True, max_count=40))
        ref = base.run([seed])
        base.shutdown()

        pol = Crawler(t1_corpus, CrawlConfig(snapshot_seen=True, 
            max_count=40, politeness_max_per_host=5))
        got = pol.run([seed])
        pol.shutdown()

        assert set(got.seen) == set(ref.seen)
        assert got.pages_queued == ref.pages_queued
        assert got.rounds > ref.rounds            # throttling stretches rounds
        assert got.metrics["deferred_total"] > 0

    def test_per_round_host_cap_respected(self, t1_corpus):
        pol = Crawler(t1_corpus, CrawlConfig(snapshot_seen=True, 
            max_count=30, politeness_max_per_host=3))
        got = pol.run([seed_url(0)])
        pol.shutdown()
        for r in got.metrics["rounds"]:
            assert r["frontier"] <= 3             # single host -> cap = 3/round

    def test_politeness_sort_shuffle_path_identical(self, t1_corpus):
        """Forcing the Ray sort-shuffle path (tiny driver_sort_threshold)
        must produce the SAME crawl as the driver lexsort path — the
        distributed groupby(host) admission is semantics-identical to the
        vectorized apply_host_tokens kernel."""
        seed = seed_url(0)
        results = []
        for thresh in (2_000_000, 1):
            c = Crawler(t1_corpus, CrawlConfig(
                snapshot_seen=True, max_count=30,
                politeness_max_per_host=4, driver_sort_threshold=thresh))
            results.append(c.run([seed]))
            c.shutdown()
        a, b = results
        assert a.visit_order.equals(b.visit_order)
        assert a.seen == b.seen
        assert a.rounds == b.rounds
        assert (a.metrics["deferred_total"]
                == b.metrics["deferred_total"] > 0)

    def test_robots_blocks_disallowed_prefix(self, t1_corpus):
        """Corpus plants robots.txt with 'Disallow: /dir0/' on h0."""
        c = Crawler(t1_corpus, CrawlConfig(snapshot_seen=True, max_count=10_000, robots=True))
        got = c.run([seed_url(0)])
        docs = c.docs_table()
        c.shutdown()
        by_status = {}
        for i in range(docs.num_rows):
            by_status[docs.column("doc_id")[i].as_py()] = (
                docs.column("status")[i].as_py(),
                docs.column("skipped_on")[i].as_py())
        blocked = {u: v for u, v in by_status.items() if v[1] == "robots"}
        assert blocked, "some /dir0/ URLs must be robots-blocked"
        assert all(u.startswith("https://h0.example/dir0/") for u in blocked)
        # robots-blocked pages yield no children but ARE in the seen set
        assert set(blocked) <= set(got.seen)
        # and no /dir0/ page was actually fetched ok
        assert not any(u.startswith("https://h0.example/dir0/")
                       and v == ("ok", "") for u, v in by_status.items())

    def test_resume_refuses_corrupt_checkpoint(self, t1_corpus, tmp_path):
        """A round dir with manifest.json but no visit_delta.parquet is a
        corrupt (or pre-delta-format) checkpoint: resume must raise, not
        silently restart with an empty visit log (ADVICE r2)."""
        import pytest as _pytest

        ck = str(tmp_path / "ck")
        c1 = Crawler(t1_corpus, CrawlConfig(max_count=60,
                                            checkpoint_dir=ck))
        c1.run([seed_url(0)], max_rounds=2)
        c1.shutdown()
        victim = os.path.join(ck, "round-00000", "visit_delta.parquet")
        assert os.path.exists(victim)
        os.remove(victim)
        with _pytest.raises(FileNotFoundError, match="corrupt"):
            Crawler.resume(t1_corpus, ck,
                           CrawlConfig(max_count=60, checkpoint_dir=ck))


@pytest.mark.usefixtures("ray_session")
class TestFrontierRefs:
    """Refs-mode (object-store-resident frontier) must be semantically
    identical to table mode: same visit set + seq order, same seen set,
    same metrics counts — the only difference is WHERE the rows live."""

    def _run(self, corpus, refs: bool, tmp_path, sub: str, **kw):
        cfg = CrawlConfig(snapshot_seen=True, max_count=60,
                          checkpoint_dir=str(tmp_path / sub),
                          frontier_refs=refs, **kw)
        c = Crawler(corpus, cfg)
        res = c.run([seed_url(0)])
        c.shutdown()
        return res

    def test_refs_mode_bfs_identical(self, t1_corpus, tmp_path):
        tab = self._run(t1_corpus, False, tmp_path, "tab")
        ref = self._run(t1_corpus, True, tmp_path, "ref")
        assert ref.visit_order.sort_by("seq").to_pydict() == \
            tab.visit_order.sort_by("seq").to_pydict()
        assert ref.seen == tab.seen
        assert ref.pages_queued == tab.pages_queued
        assert ref.rounds == tab.rounds
        for k in ("pages_fetched", "assets_fetched", "candidates",
                  "dedup_rejected", "budget_refused"):
            assert ref.metrics[k] == tab.metrics[k], k

    def test_refs_mode_robots_identical(self, t1_corpus, tmp_path):
        """Refs mode evaluates robots worker-side in the fetch stage
        (broadcast rules); table mode uses the driver-side actor-pool
        pass. Same blocked set, same seen set, same metrics."""
        tab = self._run(t1_corpus, False, tmp_path, "rbtab", robots=True)
        ref = self._run(t1_corpus, True, tmp_path, "rbref", robots=True)
        assert ref.visit_order.sort_by("seq").to_pydict() == \
            tab.visit_order.sort_by("seq").to_pydict()
        assert ref.seen == tab.seen
        assert ref.metrics["skipped_robots"] == \
            tab.metrics["skipped_robots"] > 0
        assert ref.metrics["candidates"] == tab.metrics["candidates"]

    def test_refs_mode_politeness_identical(self, t1_corpus, tmp_path):
        tab = self._run(t1_corpus, False, tmp_path, "ptab",
                        politeness_max_per_host=3)
        ref = self._run(t1_corpus, True, tmp_path, "pref",
                        politeness_max_per_host=3)
        assert ref.visit_order.sort_by("seq").to_pydict() == \
            tab.visit_order.sort_by("seq").to_pydict()
        assert ref.seen == tab.seen
        assert ref.metrics["deferred_total"] == \
            tab.metrics["deferred_total"]

    def test_refs_mode_resume_identical(self, t1_corpus, tmp_path):
        full = self._run(t1_corpus, True, tmp_path, "rfull")
        ck = str(tmp_path / "rck")
        c1 = Crawler(t1_corpus, CrawlConfig(
            snapshot_seen=True, max_count=60, checkpoint_dir=ck,
            frontier_refs=True))
        c1.run([seed_url(0)], max_rounds=2)
        c1.shutdown()
        c2 = Crawler.resume(t1_corpus, ck, CrawlConfig(
            snapshot_seen=True, max_count=60, frontier_refs=True))
        res2 = c2._loop()
        c2.shutdown()
        # the resumed run finishes the crawl; union of the visit logs
        # equals the uninterrupted run's
        import pyarrow as pa
        merged = pa.concat_tables(
            [res2.visit_order]).sort_by("seq").to_pydict()
        assert merged == full.visit_order.sort_by("seq").to_pydict()
        assert res2.seen == full.seen


@pytest.mark.usefixtures("ray_session")
class TestRobotsPartitionedCorpus:
    """robots=True must ride the CorpusSpec (partitioned on-disk) corpus
    backend: the preload becomes one Ray task per partition (doc_id
    projection scan + pushed-down spans read for the matches) instead of
    the in-memory table scan — VERDICT r4 'What's missing' #3."""

    @staticmethod
    def _run(corpus, tmp_path, sub, **kw):
        cfg = CrawlConfig(snapshot_seen=True, max_count=60,
                          checkpoint_dir=str(tmp_path / sub), **kw)
        c = Crawler(corpus, cfg)
        res = c.run([seed_url(0)])
        c.shutdown()
        return res

    def test_corpus_spec_robots_matches_in_memory(self, t1_corpus, tmp_path):
        from go_crawler_ray.stages.fetch import (CorpusSpec,
                                                 PartitionedCorpusBackend)

        root = str(tmp_path / "pcorpus_rb")
        PartitionedCorpusBackend.write(t1_corpus, root, num_partitions=8)
        spec = CorpusSpec(root, 8)

        mem = self._run(t1_corpus, tmp_path, "rbmem",
                        robots=True, frontier_refs=True)
        # refs mode (worker-side rules) AND table mode (actor pool),
        # both over the partitioned backend
        for refs, sub in ((True, "rbspec_refs"), (False, "rbspec_tab")):
            got = self._run(spec, tmp_path, sub,
                            robots=True, frontier_refs=refs)
            assert got.visit_order.sort_by("seq").to_pydict() == \
                mem.visit_order.sort_by("seq").to_pydict(), sub
            assert got.seen == mem.seen, sub
            assert got.metrics["skipped_robots"] == \
                mem.metrics["skipped_robots"] > 0, sub

    def test_robots_corpus_without_robots_docs(self, t1_corpus, tmp_path):
        """robots=True over a corpus with NO robots.txt docs must behave
        exactly like robots=False (regression: empty rules made the
        refs-mode fetch stage raise TypeError on every batch)."""
        import pyarrow.compute as pc

        bare = t1_corpus.filter(pc.invert(pc.ends_with(
            t1_corpus.column("doc_id"), pattern="/robots.txt")))
        off = self._run(bare, tmp_path, "nr_off", robots=False,
                        frontier_refs=True)
        on = self._run(bare, tmp_path, "nr_on", robots=True,
                       frontier_refs=True)
        assert on.visit_order.sort_by("seq").to_pydict() == \
            off.visit_order.sort_by("seq").to_pydict()
        assert on.seen == off.seen
        assert on.metrics["skipped_robots"] == 0
