"""[NEW] priority frontier: priority_fn hook + distributed-sort path."""

import numpy as np
import pytest

from go_crawler_ray.pipelines.crawl import Crawler, CrawlConfig
from go_crawler_ray.sources.corpus import seed_url


@pytest.mark.usefixtures("ray_session")
class TestPriorityFrontier:
    def test_priority_reorders_fetch_under_politeness(self, t1_corpus):
        """Depth-descending priority + politeness throttling must fetch
        deep URLs earlier than the FIFO ordering would."""

        def depth_first(acc):
            # lower value = earlier: prefer DEEPER pages
            return (-acc.column("depth").to_numpy(zero_copy_only=False)) \
                .astype(np.int32)

        # unlimited budget: priority may only reorder, never change coverage
        fifo = Crawler(t1_corpus, CrawlConfig(snapshot_seen=True, 
            max_count=1 << 30, politeness_max_per_host=6))
        r_fifo = fifo.run([seed_url(0)])
        fifo.shutdown()

        prio = Crawler(t1_corpus, CrawlConfig(snapshot_seen=True, 
            max_count=1 << 30, politeness_max_per_host=6,
            priority_fn=depth_first))
        r_prio = prio.run([seed_url(0)])
        prio.shutdown()

        # same crawl coverage (politeness defers, never drops)
        assert set(r_prio.seen) == set(r_fifo.seen)
        # but different round composition: the priority run must differ in
        # per-round metrics (reordering is observable)
        assert r_prio.metrics["rounds"] != r_fifo.metrics["rounds"]

    def test_distributed_sort_path_same_result(self, unit_corpus):
        """Forcing the Ray-sort path (tiny threshold) must not change the
        crawl outcome vs the driver lexsort path."""
        a = Crawler(unit_corpus, CrawlConfig(snapshot_seen=True, max_count=10_000))
        ra = a.run([seed_url(0)])
        a.shutdown()
        b = Crawler(unit_corpus, CrawlConfig(snapshot_seen=True, max_count=10_000,
                                             driver_sort_threshold=0))
        rb = b.run([seed_url(0)])
        b.shutdown()
        assert set(ra.seen) == set(rb.seen)
        assert ra.visit_order.column("url").to_pylist() == \
            rb.visit_order.column("url").to_pylist()
