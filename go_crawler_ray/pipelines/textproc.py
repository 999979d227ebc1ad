"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline stages: token counting, quality
scoring, document fingerprinting, language-ID — all vectorized
``map_batches`` transforms (pandas string kernels / numpy), with DuckDB
oracles where SQL can express the same function (token count, quality,
fingerprint) and deterministic rows-only outputs otherwise (langid).

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


def quality_scores(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_chars, n_words, avg_word_len, stopword_ratio) — cheap
    quality signals used by corpus-filtering pipelines."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    stop = set(STOPWORDS)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        words = text.str.strip().str.split(_WS)
        n_words = words.str.len().astype("int64")
        word_chars = text.str.replace(" ", "", regex=False).str.len()
        stop_n = words.map(lambda ws: sum(1 for w in ws if w in stop))
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
                         concurrency=2).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)
