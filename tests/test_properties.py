"""Property-based tests (hypothesis): the vectorized fast paths must be
observationally identical to the exact per-item implementations, and the
Ray crawl must match the oracle on arbitrary generated corpora."""

import hypothesis.strategies as st
import numpy as np
import pytest
from hypothesis import given, settings

from go_crawler_ray.functions.urlnorm import (
    Canonicalizer,
    canonicalize_batch,
    canonicalize_url,
    host_of,
)

# --- ref-string strategy: every shape the canonicalizer classifies -------
_path_seg = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789._-",
    min_size=1, max_size=8)
_host = st.sampled_from(["h0.example", "h1.example", "H2.Example",
                         "cdn.example:8080", "other.example"])


@st.composite
def refs(draw):
    kind = draw(st.integers(0, 7))
    segs = draw(st.lists(_path_seg, min_size=1, max_size=4))
    path = "/".join(segs)
    if kind == 0:                      # absolute
        return f"https://{draw(_host)}/{path}"
    if kind == 1:                      # root-relative
        return f"/{path}"
    if kind == 2:                      # bare relative
        return path
    if kind == 3:                      # fragment-bearing
        return f"{path}#sec{draw(st.integers(0, 9))}"
    if kind == 4:                      # querystring
        return f"{path}?v={draw(st.integers(0, 9))}"
    if kind == 5:                      # dot segments
        return f"../{path}"
    if kind == 6:                      # scheme-relative
        return f"//{draw(_host)}/{path}"
    return draw(st.sampled_from(["", "#top", "?q=1", ".", "./x",
                                 "HTTPS://H0.Example:443/p/../q.html",
                                 "mailto:x@y.example", "a..b/c",
                                 "/a/./b", "x:1/y"]))


_bases = st.sampled_from([
    "https://h0.example/",
    "https://h0.example/p/3.html",
    "https://h0.example/a/b/5.html?q=1",
    "http://h1.example/dir0/9.html",
])


class TestCanonicalizeBatchEquivalence:
    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.tuples(refs(), _bases), min_size=1, max_size=30))
    def test_vectorized_equals_exact(self, pairs):
        rs = [r for r, _ in pairs]
        bs = [b for _, b in pairs]
        got_urls, got_same = canonicalize_batch(rs, bs)
        for i, (r, b) in enumerate(pairs):
            want = canonicalize_url(r, b)
            assert got_urls[i] == want, (r, b, got_urls[i], want)
            want_same = want is not None and host_of(want) == host_of(b)
            assert bool(got_same[i]) == want_same, (r, b)

    @settings(max_examples=100, deadline=None)
    @given(refs(), _bases)
    def test_memoized_matches_plain(self, r, b):
        c = Canonicalizer()
        assert c(r, b) == canonicalize_url(r, b)


class TestSeenShardProperties:
    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.integers(0, 30), min_size=1, max_size=100))
    def test_check_and_insert_equals_sequential_set(self, ids):
        from go_crawler_ray.state.seen import _SeenShardImpl

        urls = [f"https://h.example/{i}" for i in ids]
        shard = _SeenShardImpl("exact")
        got = shard.check_and_insert(urls)
        seen: set[str] = set()
        want = []
        for u in urls:
            want.append(u not in seen)
            seen.add(u)
        assert got.tolist() == want

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(0, 1000), min_size=1, max_size=200,
                    unique=True))
    def test_cuckoo_never_false_negative(self, ids):
        from go_crawler_ray.state.cuckoo import CuckooFilter

        f = CuckooFilter(4096)
        items = [f"u{i}" for i in ids]
        for it in items:
            f.add(it)
        assert f.contains_many(items).all()


@pytest.mark.usefixtures("ray_session")
class TestCrawlOracleProperty:
    @settings(max_examples=5, deadline=None)
    @given(st.integers(0, 10_000))
    def test_random_seed_corpus_conformance(self, seed):
        """Arbitrary generator seeds: pipeline == oracle, always."""
        from go_crawler_ray.pipelines.crawl import Crawler, CrawlConfig
        from go_crawler_ray.pipelines.oracle import (corpus_table_to_dict,
                                                     oracle_crawl)
        from go_crawler_ray.sources.corpus import CorpusParams, generate_corpus

        tbl = generate_corpus(CorpusParams(
            n_hosts=2, pages_per_host=6, assets_per_page=2,
            links_per_page=3, text_spans_per_page=1, seed=seed))
        oracle = oracle_crawl(corpus_table_to_dict(tbl),
                              "https://h0.example/", max_count=8)
        c = Crawler(tbl, CrawlConfig(snapshot_seen=True, max_count=8))
        res = c.run(["https://h0.example/"])
        c.shutdown()
        assert set(res.seen) == oracle.seen
        got = list(zip(res.visit_order.column("url").to_pylist(),
                       res.visit_order.column("seq").to_pylist(),
                       res.visit_order.column("kind").to_pylist()))
        assert got == oracle.visit_order


def test_sql_crc32_matches_zlib_on_arbitrary_ascii():
    """The DuckDB crc32 reimplementation (_crc32_sql) must equal
    zlib.crc32 for ANY printable-ASCII string — it oracles simhash
    signatures, sampling buckets and shuffle ranks. Property-tested
    beyond the corpus values the parity suite pins."""
    import zlib

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from __ray_entry__ import _crc32_sql

    con = duckdb.connect()
    expr = _crc32_sql("s")

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        max_size=40), min_size=1, max_size=8))
    def check(strings):
        con.execute("CREATE OR REPLACE TABLE t AS SELECT * FROM "
                    "(SELECT unnest(?) AS s)", [strings])
        got = dict(con.execute(f"SELECT s, {expr} FROM t").fetchall())
        for s in strings:
            assert got[s] == zlib.crc32(s.encode()), repr(s)

    check()
