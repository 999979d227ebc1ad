"""Driver-contract parity: every queries() entry with an oracle_sql()
entry must match DuckDB on row count, column names and (order-insensitive)
values at sf0.01 — a local mirror of the driver's correctness gate."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


ORACLE_KEYS = [
    "crawl_spans_flatten", "crawl_extract_resources", "crawl_span_stats",
    "crawl_html_extract",
    "crawl_bfs_visit_order", "crawl_seen_set", "crawl_docs_out",
    "crawl_docs_out_html",
    "pricing_summary", "segment_revenue", "top_orders",
    "distinct_event_types", "high_value_lineitems", "hourly_event_stats",
    "sliding_event_stats", "top_orders_per_segment",
    "user_sessions", "text_token_count", "text_quality", "text_fingerprint",
    "text_curation", "text_winnow_fp", "text_langid",
    "dedup_exact", "dedup_embedding_cosine", "dedup_ngram_jaccard",
    "dedup_minhash_clusters", "dedup_simhash_pairs", "dedup_simhash",
    "dedup_embedding_clusters", "dedup_dup_spans",
    "ann_brute_force_topk",
    "multimodal_media_meta", "multimodal_resize", "multimodal_frames",
    "multimodal_features",
    "text_vocab_topk", "sample_docs", "decontaminate", "epoch_shuffle",
    "curated_epoch", "text_repetition", "text_oov", "domain_balance",
    "pack_sequences", "event_asof_join", "revenue_percentiles",
    "text_chunks", "text_bpe_tokens",
    "text_tfidf", "approx_distinct_tokens", "order_revenue_topk",
    "graph_pagerank", "graph_components", "dedup_bloom_incremental",
    "text_bm25", "text_model_score", "temperature_sample",
    "text_surprisal", "sample_per_group", "decontaminate_ngrams",
    "graph_host_stats", "dedup_simhash_clusters", "dedup_paragraphs",
    "dedup_semantic", "text_dsir",
]


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(entrymod, con, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = normalize(to_pandas(q(SF_DIR)))
    want = normalize(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_every_oracle_key_has_query(entrymod):
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    assert set(sqls) <= set(qs)
    assert set(ORACLE_KEYS) == set(sqls)


def test_rows_only_queries_run(entrymod):
    """Queries without oracles still run and return stable non-degenerate
    results at sf0.01."""
    qs = entrymod.queries()
    rows_only = set(qs) - set(entrymod.oracle_sql())
    for name in sorted(rows_only):
        out = to_pandas(qs[name](SF_DIR))
        assert out is not None and out.shape[1] >= 1, name
        if name not in ("dedup_ngram_jaccard", "dedup_simhash_pairs"):
            assert len(out) > 0, name


def test_entry_smoke(entrymod):
    out = to_pandas(entrymod.entry())
    assert len(out) >= 0 and out.shape[1] >= 1


def test_simhash_sql_oracle_edge_cases():
    """The independent SQL crc32+vote reimplementation must agree with
    the numpy kernel on tokenizer edge cases (multi-space runs, leading/
    trailing whitespace incl. tabs/newlines, repeated words — the vote
    is multiplicity-weighted — and single-char tokens). Hermetic: plain
    kernel call + DuckDB, no Ray."""
    import __ray_entry__ as e
    from go_crawler_ray.pipelines.dedup import SimHashStage

    docs = pd.DataFrame({
        "doc_id": pd.array(range(6), dtype="int64"),
        "text": [
            "plain words here",
            "  leading and   multi  space runs  ",
            "\t tabs\nand\nnewlines \r\n mixed \t",
            "dup dup dup dup unique",          # multiplicity matters
            "a b c d e f g",                   # single-char tokens
            "x",                               # one token
        ],
    })
    expected = SimHashStage()(docs)
    con = duckdb.connect()
    con.register("documents", docs)
    got = con.sql(e._simhash_sql()).df()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        expected.sort_values("doc_id").reset_index(drop=True),
        check_dtype=False)
