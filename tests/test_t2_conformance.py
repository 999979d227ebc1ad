"""t2-scale (~5k docs) oracle conformance — the SURVEY §5 tier-2 gate."""

import pytest

from go_crawler_ray.pipelines.crawl import Crawler, CrawlConfig
from go_crawler_ray.pipelines.oracle import corpus_table_to_dict, oracle_crawl
from go_crawler_ray.sources.corpus import CorpusParams, generate_corpus, seed_url


@pytest.mark.usefixtures("ray_session")
def test_t2_full_conformance():
    tbl = generate_corpus(CorpusParams.for_scale("t2"))
    oracle = oracle_crawl(corpus_table_to_dict(tbl), seed_url(0),
                          max_count=10_000)
    c = Crawler(tbl, CrawlConfig(snapshot_seen=True, max_count=10_000, num_seen_shards=4))
    res = c.run([seed_url(0)])
    c.shutdown()
    assert len(res.seen) == len(oracle.seen) > 1500
    assert set(res.seen) == oracle.seen
    got = list(zip(res.visit_order.column("url").to_pylist(),
                   res.visit_order.column("seq").to_pylist(),
                   res.visit_order.column("kind").to_pylist()))
    assert got == oracle.visit_order
