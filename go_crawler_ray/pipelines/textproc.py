"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline stages: token counting, quality
scoring, document fingerprinting (md5 of normalized text AND winnowing
rolling-hash sketches), language-ID, and a composite curation pass
(filter -> exact dedup -> tokenize) — all vectorized ``map_batches``
transforms (pandas string kernels / numpy), with DuckDB oracles where
SQL can express the same function (token count, quality, fingerprint,
curation) and deterministic rows-only outputs otherwise (langid,
winnowing).

Tokenization contract shared with the SQL oracles: tokens =
``\\s+``-split of the trimmed text.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.compat import round_half_away
from ..functions.pool import auto_pool

_WS = re.compile(r"\s+")

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")

# tiny deterministic per-language stopword profiles for the heuristic
# language-ID (documents.text is synthetic; the profiles are the spec)
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a"},
    "es": {"el", "la", "de", "que", "y"},
    "de": {"der", "die", "und", "das", "ist"},
    "fr": {"le", "la", "et", "les", "des"},
    "zh": set(),   # no-latin-stopword fallback bucket
}


def _read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def token_count(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_tokens) — whitespace tokenization."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.strip().str.split(_WS)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_tokens": toks.str.len().astype("int64"),
        })

    out = ds.map_batches(counts, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_BPE_ISH = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_token_count(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_tokens) under a BPE-ish pre-tokenizer: maximal letter
    runs, digit runs, and single non-alnum marks (the word/number/punct
    split every BPE pre-tokenizer performs before merges). The pattern
    is deliberately RE2-safe — no lookarounds — so the Python engine and
    the DuckDB oracle tokenize identically. Vectorized: one
    ``str.count`` kernel per batch, no per-row Python."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "n_tokens": batch["text"].str.count(_BPE_ISH).astype("int64"),
        })

    out = ds.map_batches(counts, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def quality_scores(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_chars, n_words, avg_word_len, stopword_ratio) — cheap
    quality signals used by corpus-filtering pipelines."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    stop = set(STOPWORDS)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.textkeys import count_in_set

        text = batch["text"]
        words = text.str.strip().str.split(_WS)
        n_words = words.str.len().astype("int64")
        word_chars = text.str.replace(" ", "", regex=False).str.len()
        stop_n = count_in_set(words, stop)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_chars": text.str.len().astype("int64"),
            "n_words": n_words,
            "avg_word_len": round_half_away(word_chars / n_words),
            "stopword_ratio": round_half_away(stop_n / n_words),
        })

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def fingerprint(sf_dir: str) -> pd.DataFrame:
    """(doc_id, fp) — md5 of the lower-cased, whitespace-normalized text
    (the same normalization a dedup pass would key on; F1 hasher idiom,
    internal/models.go:208-211)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        norm = (batch["text"].str.lower()
                .str.replace(_WS, " ", regex=True).str.strip())
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "fp": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm],
        })

    out = ds.map_batches(fp, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def curate(sf_dir: str, min_words: int = 5,
           max_stopword_ratio: float = 0.5,
           key_words: int = 3) -> pd.DataFrame:
    """Composite curation pipeline — the filter -> dedup -> tokenize
    chain a training-data pass runs end-to-end, fused into two stages:

    1. map_batches: quality signals (word count, stopword ratio), the
       quality FILTER, the dedup key (first-``key_words`` tokens) and
       token count, all vectorized per batch;
    2. groupby(dedup_key): first-push-wins = keep min doc_id per key
       (native Min/Count aggregate — one key shuffle, no per-group
       Python).

    Returns (doc_id, dedup_key, n_tokens, n_dups) for surviving docs,
    sorted by doc_id. Fully SQL-expressible -> value-exact oracle."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    stop = set(STOPWORDS)

    def stage1(batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.textkeys import count_in_set

        text = batch["text"]
        words = text.str.strip().str.split(_WS)
        n_words = words.str.len().astype("int64")
        stop_n = count_in_set(words, stop)
        keep = (n_words >= min_words) & \
               ((stop_n / n_words) <= max_stopword_ratio)
        kept = batch[keep]
        kw = words[keep]
        from ..functions.textkeys import dedup_key_from_tokens

        return pd.DataFrame({
            "doc_id": kept["doc_id"].astype("int64"),
            "dedup_key": dedup_key_from_tokens(kw, key_words),
            "n_tokens": kw.str.len().astype("int64"),
        })

    import ray
    from ray.data.aggregate import Count, Min

    # materialize the slim filtered projection once (doc_id, key,
    # n_tokens — no text): both consumers below reuse the blocks instead
    # of re-reading + re-scoring the corpus
    filtered = ds.map_batches(stage1, batch_format="pandas").materialize()
    survivors = (filtered.groupby("dedup_key")
                 .aggregate(Min("doc_id"), Count())
                 .to_pandas()
                 .rename(columns={"min(doc_id)": "doc_id",
                                  "count()": "n_dups"}))
    # fetch the survivors' token counts via a broadcast semi-join filter
    # (driver traffic stays O(survivors), never the filtered corpus)
    ids_ref = ray.put(survivors["doc_id"].to_numpy())

    def keep_survivors(batch: pd.DataFrame) -> pd.DataFrame:
        ids = ray.get(ids_ref)
        return batch[batch["doc_id"].isin(ids)][["doc_id", "n_tokens"]]

    toks = filtered.map_batches(keep_survivors,
                                batch_format="pandas").to_pandas()
    out = survivors.merge(toks, on="doc_id", how="left")
    out = out[["doc_id", "dedup_key", "n_tokens", "n_dups"]].astype(
        {"doc_id": "int64", "n_tokens": "int64", "n_dups": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def winnow_fingerprints(sf_dir: str, k: int = 8, w: int = 6) -> pd.DataFrame:
    """(doc_id, n_grams, n_fp, fp_digest) — winnowing document
    fingerprints (Schleimer/Wilkerson/Aiken 2003, "Winnowing: Local
    Algorithms for Document Fingerprinting" — public): character
    ``k``-gram ROLLING hashes, then the minimum hash of every window of
    ``w`` consecutive grams; the deduplicated minima are the document's
    fingerprint set (robust to local edits, the classic plagiarism/
    near-dup sketch). Emitted per doc: gram count, fingerprint-set size,
    and an order-independent xor digest of the set (the values are
    rolling-hash-kernel-specific -> rows-only check).

    Vectorized per doc: the Rabin-Karp recurrence runs as a numpy
    cumulative form (prefix products over the fixed base), window minima
    via a strided sliding view."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    B = np.uint64(1_000_003)          # rolling base (wraps mod 2^64)

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        ids, n_grams, n_fp, digest = [], [], [], []
        for d, t in zip(batch["doc_id"], batch["text"]):
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8) \
                .astype(np.uint64)
            n = len(b)
            if n < k:
                grams = np.zeros(1, dtype=np.uint64) if n == 0 else \
                    np.array([(b * (B ** np.arange(n, dtype=np.uint64)
                                    [::-1])).sum()], dtype=np.uint64)
            else:
                # k-gram hashes h[j] = sum b[j:j+k] * B^(k-1-off): a
                # correlation-style pass, one vectorized multiply-add
                # per offset (k is small and fixed)
                powers = B ** np.arange(k, dtype=np.uint64)[::-1]
                grams = np.zeros(n - k + 1, dtype=np.uint64)
                for off in range(k):
                    grams += b[off: off + n - k + 1] * powers[off]
            if len(grams) <= w:
                mins = np.array([grams.min()], dtype=np.uint64)
            else:
                win = np.lib.stride_tricks.sliding_window_view(grams, w)
                mins = win.min(axis=1)
            sel = np.unique(mins)
            ids.append(int(d))
            n_grams.append(len(grams))
            n_fp.append(len(sel))
            digest.append(int(np.bitwise_xor.reduce(sel)))
        return pd.DataFrame({
            "doc_id": np.array(ids, dtype="int64"),
            "n_grams": np.array(n_grams, dtype="int64"),
            "n_fp": np.array(n_fp, dtype="int64"),
            "fp_digest": np.array(digest, dtype="uint64").view("int64"),
        })

    out = ds.map_batches(fp, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def repetition_signals(sf_dir: str) -> pd.DataFrame:
    """(doc_id, dup_word_ratio, top2gram_ratio, dup3gram_ratio) — the
    within-document repetition signals corpus-quality filters cut on
    (the Gopher/MassiveText family of rules, Rae et al. 2021, public):

    - ``dup_word_ratio``: fraction of tokens that are repeats of an
      earlier token, ``(n - n_unique) / n``;
    - ``top2gram_ratio``: occurrences of the most frequent word 2-gram
      over total 2-grams (0.0 when the doc has fewer than 2 tokens);
    - ``dup3gram_ratio``: fraction of word 3-grams that are duplicates
      (0.0 below 3 tokens).

    Stateless ``map_batches``; the per-doc Counter is a real per-document
    kernel (each doc's n-gram multiset is independent), distributed
    across map tasks. All three ratios are SQL-expressible, so the query
    sits behind a value-exact DuckDB oracle."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def signals(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        dup_w, top2, dup3 = [], [], []
        for t in batch["text"]:
            ws = _WS.split(t.strip())
            n = len(ws)
            dup_w.append((n - len(set(ws))) / n)
            if n >= 2:
                c2 = Counter(zip(ws, ws[1:]))
                top2.append(max(c2.values()) / (n - 1))
            else:
                top2.append(0.0)
            if n >= 3:
                g3 = list(zip(ws, ws[1:], ws[2:]))
                dup3.append((len(g3) - len(set(g3))) / len(g3))
            else:
                dup3.append(0.0)
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "dup_word_ratio": round_half_away(np.array(dup_w)),
            "top2gram_ratio": round_half_away(np.array(top2)),
            "dup3gram_ratio": round_half_away(np.array(dup3)),
        })

    out = ds.map_batches(signals, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def chunk_docs(sf_dir: str, chunk_tokens: int = 32,
               overlap: int = 8) -> pd.DataFrame:
    """(doc_id, chunk_idx, start_tok, n_tokens, chunk_text) — sliding
    token-window chunking, the explode step in front of every embedding
    / retrieval pipeline: window of ``chunk_tokens`` advancing by
    ``chunk_tokens - overlap``, last window truncated at the doc end,
    and a doc always yields >= 1 chunk. ``n_chunks = max(1,
    ceil((n - overlap) / step))`` — a window whose tokens are all
    overlap re-emits nothing.

    Pure stateless flat-map (each input row explodes independently):
    fully streaming, no shuffle, no state — the operator shape that
    scales embarrassingly. Ordered by (doc_id, chunk_idx)."""
    step = chunk_tokens - overlap
    assert step > 0, "overlap must be smaller than chunk_tokens"
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, cidx, start, ntok, ctext = [], [], [], [], []
        for d, t in zip(batch["doc_id"], batch["text"]):
            ws = _WS.split(t.strip())
            n = len(ws)
            n_chunks = max(1, -(-(n - overlap) // step))
            for i in range(n_chunks):
                s = i * step
                e = min(s + chunk_tokens, n)
                ids.append(int(d))
                cidx.append(i)
                start.append(s)
                ntok.append(e - s)
                ctext.append(" ".join(ws[s:e]))
        return pd.DataFrame({
            "doc_id": np.array(ids, dtype="int64"),
            "chunk_idx": np.array(cidx, dtype="int64"),
            "start_tok": np.array(start, dtype="int64"),
            "n_tokens": np.array(ntok, dtype="int64"),
            "chunk_text": ctext,
        })

    out = ds.map_batches(explode, batch_format="pandas").to_pandas()
    return (out.sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True))


class LangIdStage:
    """Actor-pool language-ID: profiles compiled once per actor."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-Z]+")
        self.profiles = {k: v for k, v in _LANG_PROFILES.items() if v}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for t in batch["text"]:
            toks = [w.lower() for w in self.word.findall(t)]
            ts = set(toks)
            best, best_n = "zh", 0       # fallback bucket
            for lang, prof in self.profiles.items():
                hits = len(ts & prof)
                if hits > best_n:
                    best, best_n = lang, hits
            preds.append(best)
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": preds})


def langid(sf_dir: str) -> pd.DataFrame:
    """(doc_id, lang_pred) — deterministic stopword-profile heuristic
    (rows-only check: no SQL oracle can express the heuristic)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(LangIdStage, batch_format="pandas",
                         concurrency=auto_pool()).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def tfidf_topk(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """(doc_id, word, tfidf): each doc's top-``k`` whitespace tokens by
    tf-idf, tf = raw in-doc count, idf = ln(N / df) with df = number of
    docs containing the word. Ties break (tfidf desc, word asc); scores
    rounded half-away to 4 places AFTER the cut.

    Scale shape — two key-colocating shuffles, no vocabulary broadcast,
    both grouped by SALT BUCKETS (word-hash mod P / doc_id mod P) so
    neither pays one A2A group + one Python call per distinct word or
    doc (the measured many-groups-per-block constant; a key always
    lands whole in one salt group, so scores are unchanged):
    1. per-batch (word, doc_id, tf) postings via one explode +
       value_counts (the inverted-index build);
    2. word salt groupby: df = per-word transform('size') (each doc
       appears once per word), score every posting vectorized in place
       — idf needs nothing but the group and the constant N (parquet
       row count, no extra pass);
    3. doc salt groupby: per-doc top-k via one vectorized sort +
       groupby-head per salt group.
    The driver receives only the k * N_docs result rows. At 100 TB both
    shuffles carry the postings table, which is the irreducible payload
    of exact tf-idf.
    """
    import pyarrow.parquet as _pq

    from ..functions.hashing import crc32_many
    from ..functions.pool import cluster_cpus

    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    P = max(16, 4 * int(cluster_cpus()))

    def postings(batch: pd.DataFrame) -> pd.DataFrame:
        toks = (batch["text"].str.strip().str.split(_WS)
                .reset_index(drop=True))
        ids = batch["doc_id"].reset_index(drop=True)
        ex = toks.explode()
        df = pd.DataFrame({"doc_id": ids.reindex(ex.index).to_numpy(),
                           "word": ex.to_numpy()})
        g = (df.groupby(["doc_id", "word"], sort=False).size()
             .reset_index(name="tf"))
        words = g["word"].to_numpy(dtype=object)
        wbkt = (crc32_many(pa.array(words.astype(str), pa.string()))
                % np.uint32(P)).astype("int64")
        return pd.DataFrame({"word": words,
                             "doc_id": g["doc_id"].astype("int64"),
                             "tf": g["tf"].astype("int64"),
                             "wbkt": wbkt})

    def score(g: pd.DataFrame) -> pd.DataFrame:
        # one salt group: df per word via a vectorized transform
        df_w = g.groupby("word", sort=False)["tf"].transform("size")
        ids = g["doc_id"].to_numpy().astype("int64")
        return pd.DataFrame({
            "doc_id": ids,
            "word": g["word"],
            "tfidf_raw": g["tf"].to_numpy()
            * np.log(n_docs / df_w.to_numpy()),
            "dbkt": ids % P,
        })

    def doc_topk(g: pd.DataFrame) -> pd.DataFrame:
        cut = (g.sort_values(["doc_id", "tfidf_raw", "word"],
                             ascending=[True, False, True])
               .groupby("doc_id", sort=False).head(k))
        return pd.DataFrame({
            "doc_id": cut["doc_id"].astype("int64"),
            "word": cut["word"],
            "tfidf": round_half_away(cut["tfidf_raw"].to_numpy()),
        })

    out = (_read_docs(sf_dir, ["doc_id", "text"])
           .map_batches(postings, batch_format="pandas")
           .groupby("wbkt").map_groups(score, batch_format="pandas")
           .groupby("dbkt").map_groups(doc_topk, batch_format="pandas")
           .to_pandas())
    return (out.sort_values(["doc_id", "tfidf", "word"],
                            ascending=[True, False, True])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (Robertson & Zaragoza 2009, "The Probabilistic
# Relevance Framework: BM25 and Beyond")

BM25_QUERY = ("sort", "join", "hash", "window", "query")
_BM25_K1 = 1.2
_BM25_B = 0.75


def bm25_topk(sf_dir: str, terms: tuple = BM25_QUERY,
              k: int = 10) -> pd.DataFrame:
    """(doc_id, score): top-``k`` documents by BM25 for a fixed query
    term set; ties break by doc_id; scores rounded half-away to 4
    places AFTER the cut (ordering uses the raw double).

    idf_t = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)  (Lucene's variant:
    non-negative for any df), score = sum_t idf_t * tf * (k1+1) /
    (tf + k1 * (1 - b + b * dl/avgdl)); term contributions accumulate
    in fixed query order so the float expression tree matches the SQL
    oracle exactly.

    Scale shape — two streaming passes, zero shuffles:
    1. corpus stats: per-batch partials (sum dl as int64, per-term
       containing-doc counts — |terms| ints per batch) -> driver sums;
       avgdl = exact-int total / N, idf from exact-int dfs;
    2. scoring: vectorized per-batch tf (one explode + |terms| equality
       reductions), score, per-batch partial top-k -> k x blocks driver
       merge. The corpus never sorts and the driver never holds more
       than k rows per block."""
    import math

    import pyarrow.parquet as _pq

    n_docs = _pq.ParquetFile(
        f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def _tf_matrix(batch: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        """(dl, tf[n_rows x n_terms]) via one explode per batch."""
        toks = (batch["text"].str.strip().str.split(_WS)
                .reset_index(drop=True))
        dl = toks.str.len().to_numpy(dtype="int64")
        ex = toks.explode()
        idx = ex.index.to_numpy(dtype="int64")
        w = ex.to_numpy(dtype=object)
        tf = np.zeros((len(batch), len(terms)), dtype="int64")
        for j, t in enumerate(terms):
            np.add.at(tf[:, j], idx, (w == t).astype("int64"))
        return dl, tf

    # ---- pass 1: exact-integer corpus stats ----
    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        dl, tf = _tf_matrix(batch)
        row = {"total_dl": [int(dl.sum())]}
        for j in range(len(terms)):
            row[f"df{j}"] = [int((tf[:, j] > 0).sum())]
        return pd.DataFrame(row)

    st = ds.map_batches(stats, batch_format="pandas").to_pandas().sum()
    avgdl = float(st["total_dl"]) / n_docs
    idf = [math.log((n_docs - float(st[f"df{j}"]) + 0.5)
                    / (float(st[f"df{j}"]) + 0.5) + 1.0)
           for j in range(len(terms))]

    # ---- pass 2: score + partial top-k ----
    def score(batch: pd.DataFrame) -> pd.DataFrame:
        dl, tf = _tf_matrix(batch)
        norm = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl)
        raw = np.zeros(len(batch), dtype="float64")
        for j in range(len(terms)):     # fixed-order accumulation
            raw = raw + idf[j] * (tf[:, j] * (_BM25_K1 + 1.0)) \
                / (tf[:, j] + norm)
        out = pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                            "raw": raw})
        return (out.sort_values(["raw", "doc_id"],
                                ascending=[False, True]).head(k))

    cand = ds.map_batches(score, batch_format="pandas").to_pandas()
    cut = (cand.sort_values(["raw", "doc_id"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    return pd.DataFrame({"doc_id": cut["doc_id"],
                         "score": round_half_away(cut["raw"].to_numpy())})


def bm25_sql(terms: tuple = BM25_QUERY, k: int = 10) -> str:
    """DuckDB oracle for :func:`bm25_topk`: the same tokenizer pairing
    every text oracle uses (regexp_split_to_array(trim(text),'\\s+')
    vs pandas strip+split), exact-integer dl/df stats, and a score
    expression whose float operation tree mirrors the engine's
    fixed-order accumulation term by term (left-associative sum of
    per-term contributions, (1.2 + 1.0) spelled as the engine spells
    _BM25_K1 + 1.0) so the raw doubles agree bit-for-bit before the
    shared ROUND/round_half_away at 4 places."""
    toks = "regexp_split_to_array(trim(text), '\\s+')"
    tf_cols = ", ".join(
        f"len(list_filter(toks, w -> w = '{t}')) AS tf{j}"
        for j, t in enumerate(terms))
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf{j} > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS df{j}" for j in range(len(terms)))
    norm = (f"{_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} "
            f"* d.dl / st.avgdl)")
    contribs = " + ".join(
        f"(ln((st.n - st.df{j} + 0.5) / (st.df{j} + 0.5) + 1.0) "
        f"* (d.tf{j} * ({_BM25_K1} + 1.0)) / (d.tf{j} + {norm}))"
        for j in range(len(terms)))
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
d AS (SELECT doc_id, len(toks) AS dl, {tf_cols} FROM t),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, {df_cols}
       FROM d),
sc AS (SELECT d.doc_id, {contribs} AS raw FROM d CROSS JOIN st)
SELECT doc_id, ROUND(raw, 4) AS score FROM sc
ORDER BY raw DESC, doc_id LIMIT {k}"""


# ---------------------------------------------------------------------------
# Batched model inference: a deterministic linear quality classifier

# Fixed "trained" weights over (bias, n_words/100, stopword_ratio,
# distinct_ratio, avg_word_len): the weights are the model artifact a
# real pipeline would load from storage in the actor's __init__.
_QMODEL_W = (-2.0, 0.01, 3.0, 1.5, -0.25)


class QualityModelStage:
    """Actor-pool stage for batched model scoring: the 'model load'
    happens ONCE per actor in __init__ (here: materializing the weight
    vector + stopword set — the slot where a real pipeline deserializes
    a sklearn/torch artifact); __call__ scores a whole batch
    vectorized. score = sigmoid(w · x), rounded half-away at 4 AFTER
    the full float pipeline, feature order fixed so the SQL oracle can
    mirror the expression tree term by term."""

    def __init__(self) -> None:
        self.w = np.asarray(_QMODEL_W, dtype="float64")
        self.stop = frozenset(STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.textkeys import count_in_set

        text = batch["text"]
        words = text.str.strip().str.split(_WS)
        n_words = words.str.len().to_numpy(dtype="float64")
        stop_n = count_in_set(words, self.stop).astype("float64")
        distinct_n = words.map(lambda ws: len(set(ws))).to_numpy(
            dtype="float64")
        word_chars = (text.str.replace(" ", "", regex=False)
                      .str.len().to_numpy(dtype="float64"))
        w = self.w
        z = w[0] + w[1] * (n_words / 100.0)
        z = z + w[2] * (stop_n / n_words)
        z = z + w[3] * (distinct_n / n_words)
        z = z + w[4] * (word_chars / n_words)
        score = 1.0 / (1.0 + np.exp(-z))
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "score": round_half_away(score),
        })


def model_score(sf_dir: str) -> pd.DataFrame:
    """(doc_id, score): logistic quality score per document via the
    actor-pool inference stage (the batched-model-scoring plumbing a
    100 TB curation run uses — per-actor setup, vectorized per-batch
    forward pass, no state on the driver)."""
    from ..functions.pool import auto_pool

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(QualityModelStage, batch_format="pandas",
                         concurrency=auto_pool()).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def model_score_sql() -> str:
    """DuckDB oracle for :func:`model_score`: the same tokenizer
    pairing, the same left-associative dot-product accumulation and
    sigmoid, ROUND at 4 mirroring round_half_away. distinct-token and
    stopword counts are exact integers on both sides, so the only
    float ops are the mirrored divisions/exp."""
    w = _QMODEL_W
    stop = "(" + ",".join(f"'{s}'" for s in STOPWORDS) + ")"
    toks = "regexp_split_to_array(trim(text), '\\s+')"
    return f"""
WITH t AS (SELECT doc_id, text, {toks} AS ws FROM documents),
f AS (SELECT doc_id,
  CAST(len(ws) AS DOUBLE) AS n_words,
  CAST(len(list_filter(ws, w -> w IN {stop})) AS DOUBLE) AS stop_n,
  CAST(len(list_distinct(ws)) AS DOUBLE) AS distinct_n,
  CAST(length(replace(text, ' ', '')) AS DOUBLE) AS word_chars
  FROM t),
z AS (SELECT doc_id,
  {w[0]} + {w[1]} * (n_words / 100.0) + {w[2]} * (stop_n / n_words)
  + {w[3]} * (distinct_n / n_words) + {w[4]} * (word_chars / n_words)
  AS z FROM f)
SELECT doc_id, ROUND(1.0 / (1.0 + exp(-z)), 4) AS score FROM z
ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# Unigram-LM surprisal (the CCNet-style perplexity quality filter:
# Wenzek et al. 2020 score documents with a language model and keep the
# low-perplexity tail; here the LM is the corpus's own unigram model)

def unigram_surprisal(sf_dir: str) -> pd.DataFrame:
    """(doc_id, surprisal): mean unigram-LM surprisal per document in
    nats — sum over tokens of -ln(count(w)/total_tokens), divided by
    the document's token count.

    The per-token surprisals are INTEGER-quantized (micro-nats,
    round-half-away) before the per-document sum, so accumulation is
    order-free exact int64 arithmetic and the SQL oracle can mirror the
    score with no float-summation-order hazard; the only float ops are
    the per-WORD ln (libm scalar on both sides — the bm25 oracle
    already pins DuckDB ln == math.log here) and the final mean.

    Scale shape — two streaming passes:
    1. unigram census: per-batch partial counts -> ONE groupby-sum
       shuffle over unique words -> the vocabulary table (rows = vocab
       size, not corpus size). The quantized log-prob table is built
       driver-side and broadcast via ray.put; at web scale you'd prune
       to the tokenizer's top-V words + an OOV bucket — same plumbing,
       the census already yields counts in rank order.
    2. scoring: stateless vectorized map (explode -> dict lookup ->
       segment sum); the corpus never shuffles.
    """
    import math

    import ray

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        vc = (batch["text"].str.strip().str.split(_WS)
              .explode().value_counts())
        return pd.DataFrame({"word": vc.index.to_numpy(dtype=object),
                             "n": vc.to_numpy(dtype="int64")})

    census = (ds.map_batches(partial_counts, batch_format="pandas")
              .groupby("word").sum("n").to_pandas())
    total = int(census["sum(n)"].sum())
    # micro-nat quantization: scalar libm ln over the identical double
    # ratio DuckDB computes, then the shared half-away round
    qtab = {w: int(round_half_away(-math.log(int(n) / total) * 1e6, 0))
            for w, n in zip(census["word"], census["sum(n)"])}
    q_ref = ray.put(qtab)

    class Score:
        def __init__(self):
            self.q = ray.get(q_ref)     # one deserialization per actor

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = (batch["text"].str.strip().str.split(_WS)
                    .reset_index(drop=True))
            nt = toks.str.len().to_numpy(dtype="int64")
            ex = toks.explode()
            qs = ex.map(self.q).to_numpy(dtype="int64")
            sq = np.zeros(len(batch), dtype="int64")
            np.add.at(sq, ex.index.to_numpy(dtype="int64"), qs)
            return pd.DataFrame({
                "doc_id": batch["doc_id"].astype("int64"),
                "surprisal": round_half_away(
                    sq.astype("float64") / nt / 1e6),
            })

    out = ds.map_batches(Score, batch_format="pandas",
                         concurrency=auto_pool()).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def unigram_surprisal_sql() -> str:
    """DuckDB oracle for :func:`unigram_surprisal`: same tokenizer
    pairing, same census, same micro-nat integer quantization
    (ROUND(-ln(ratio) * 1e6, 0) == round_half_away), exact int64
    per-doc sums, and the identical final double division chain."""
    toks = "regexp_split_to_array(trim(text), '\\s+')"
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
w AS (SELECT unnest(toks) AS word FROM t),
c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY word),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
q AS (SELECT word, CAST(ROUND(-ln(CAST(n AS DOUBLE) / total)
                         * 1000000.0, 0) AS BIGINT) AS q
      FROM c CROSS JOIN tot),
d AS (SELECT doc_id, unnest(toks) AS word FROM t),
s AS (SELECT d.doc_id, CAST(SUM(q.q) AS BIGINT) AS sq,
             CAST(COUNT(*) AS BIGINT) AS nt
      FROM d JOIN q USING (word) GROUP BY d.doc_id)
SELECT doc_id, ROUND(CAST(sq AS DOUBLE) / nt / 1000000.0, 4) AS surprisal
FROM s ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# DSIR importance scores (hashed-ngram importance resampling weights)

DSIR_BUCKETS = 1024


def _hashed_grams(texts: pd.Series, n_buckets: int):
    """(bucket_ids, row_indices) of every unigram AND bigram of each
    row, hashed with zlib-crc32 into ``n_buckets`` (the shared SQL
    pairing: bucket = crc32(gram) % n_buckets, bigram = 'w1 w2').
    Bigrams come from the shifted-concat trick over ONE explode — no
    per-row Python loop."""
    from ..functions.hashing import crc32_many

    toks = texts.str.strip().str.split(_WS).reset_index(drop=True)
    ex = toks.explode()
    idx = ex.index.to_numpy(dtype="int64")
    words = ex.to_numpy(dtype=object).astype(str)
    if len(words) > 1:
        same = idx[:-1] == idx[1:]
        big = np.char.add(np.char.add(words[:-1], " "), words[1:])[same]
        grams = np.concatenate([words, big])
        gidx = np.concatenate([idx, idx[:-1][same]])
    else:
        grams, gidx = words, idx
    bk = (crc32_many(pa.array(grams, pa.string()))
          % np.uint32(n_buckets)).astype("int64")
    return bk, gidx


def dsir_scores(sf_dir: str, target_lang: str = "en",
                n_buckets: int = DSIR_BUCKETS) -> pd.DataFrame:
    """(doc_id, dsir_logw): DSIR importance log-weights (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): bag-of-hashed-ngrams features (unigrams + bigrams,
    crc32 % ``n_buckets``), a target bucket unigram model fit on the
    docs with ``lang == target_lang`` vs the raw model on the whole
    corpus (add-1 smoothed), and per-doc
    ``log w = Σ_b f_b · (ln p_target(b) − ln p_raw(b))`` — the weight
    importance resampling would exponentiate to select target-like data.

    Integer discipline mirrors :func:`unigram_surprisal`: the per-bucket
    log ratio quantizes to micro-nats ONCE (2 × n_buckets scalar ``ln``
    on identical double ratios on both sides), per-doc accumulation is
    order-free exact int64, and the one trailing float op is the final
    1e-6 scale — so the SQL oracle is value-exact.

    Scale shape — two streaming passes, ZERO shuffles:
    1. bucket census: per-batch DENSE ``int64[n_buckets]`` partial count
       vectors for (target, raw), folded at the driver — the
       revenue_percentiles mergeable-sketch discipline; bucket ids are
       dense by construction so there is nothing to group by;
    2. scoring: the quantized int table broadcasts via ``ray.put``; a
       stateless vectorized map (hash → table gather → segment-sum)
       scores every doc. The corpus never shuffles and the driver holds
       2 × n_buckets ints of model state."""
    import math

    import ray

    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        bk, gidx = _hashed_grams(batch["text"], n_buckets)
        raw = np.bincount(bk, minlength=n_buckets).astype("int64")
        tgt_row = (batch["lang"] == target_lang).to_numpy()
        tgt = np.bincount(bk[tgt_row[gidx]],
                          minlength=n_buckets).astype("int64")
        return pd.DataFrame({"raw": [raw], "tgt": [tgt]})

    cen = ds.map_batches(partials, batch_format="pandas").to_pandas()
    raw = np.sum(np.stack(cen["raw"].to_numpy()), axis=0)
    tgt = np.sum(np.stack(cen["tgt"].to_numpy()), axis=0)
    n_raw, n_tgt = int(raw.sum()), int(tgt.sum())
    s = np.array([int(round_half_away(
        (math.log((int(t) + 1) / (n_tgt + n_buckets))
         - math.log((int(r) + 1) / (n_raw + n_buckets))) * 1e6, 0))
        for t, r in zip(tgt, raw)], dtype="int64")
    s_ref = ray.put(s)

    class Score:
        def __init__(self):
            self.s = ray.get(s_ref)     # plasma-local int table

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            bk, gidx = _hashed_grams(batch["text"], n_buckets)
            acc = np.zeros(len(batch), dtype="int64")
            np.add.at(acc, gidx, self.s[bk])
            return pd.DataFrame({
                "doc_id": batch["doc_id"].astype("int64"),
                "dsir_logw": round_half_away(
                    acc.astype("float64") / 1e6),
            })

    out = ds.map_batches(Score, batch_format="pandas",
                         concurrency=auto_pool()).to_pandas()
    return out[["doc_id", "dsir_logw"]].sort_values(
        "doc_id").reset_index(drop=True)
