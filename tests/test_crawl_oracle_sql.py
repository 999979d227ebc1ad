"""The recursive-CTE crawl oracle (pipelines/crawl_oracle.py) must track
the engine at ANY scale/budget, not just the sf0.01 gate configuration —
this pins the SQL simulation itself (budget boundary, dedup-before-
budget, seq assignment) at a second operating point."""

import duckdb
import pyarrow.parquet as pq
import pytest

from go_crawler_ray.pipelines import crawl_oracle as co
from go_crawler_ray.pipelines.crawl import Crawler, CrawlConfig
from go_crawler_ray.sources.corpus import ensure_corpus, seed_url

BUDGET = 50


@pytest.mark.usefixtures("ray_session")
def test_sql_simulation_matches_engine_at_t1_budget50():
    corpus_path = ensure_corpus("t1")
    crawler = Crawler(pq.read_table(corpus_path),
                      CrawlConfig(snapshot_seen=True, max_count=BUDGET))
    result = crawler.run([seed_url(0)])
    docs = crawler.docs_table()
    crawler.shutdown()

    con = duckdb.connect()
    seed = seed_url(0)

    visit = con.execute(
        co.visit_order_sql(corpus_path, seed, BUDGET)).df()
    eng_visit = result.visit_order.to_pandas()
    assert len(visit) == len(eng_visit)
    assert (visit["url"].values == eng_visit["url"].values).all()
    assert (visit["seq"].values == eng_visit["seq"].values).all()
    assert (visit["kind"].values == eng_visit["kind"].values).all()

    seen = con.execute(co.seen_set_sql(corpus_path, seed, BUDGET)).df()
    assert list(seen["url"]) == result.seen

    docs_sql = con.execute(co.docs_out_sql(corpus_path, seed, BUDGET)).df()
    eng_docs = (docs.select(["doc_id", "kind", "status", "skipped_on",
                             "n_children", "save_path"])
                .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(docs_sql) == len(eng_docs)
    for c in eng_docs.columns:
        assert (docs_sql[c].values == eng_docs[c].values).all(), c
