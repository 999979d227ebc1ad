"""Shared text-key kernels.

The first-``key_words``-token key is the grouping key of exact_dedup,
the curation pipeline's dedup stage, and the decontamination check —
one definition here so the three stay equivalent (their SQL twin is
``array_to_string((regexp_split_to_array(trim(text), '\\s+'))[1:k], ' ')``).
"""

from __future__ import annotations

import re

import pandas as pd

_WS = re.compile(r"\s+")


def dedup_key_from_tokens(words: pd.Series, key_words: int = 3) -> pd.Series:
    """Key from an already-tokenized Series (each row a token list)."""
    return words.str[:key_words].str.join(" ")


def dedup_key(text: pd.Series, key_words: int = 3) -> pd.Series:
    """First-``key_words``-token key of each document."""
    return dedup_key_from_tokens(text.str.strip().str.split(_WS), key_words)


def count_in_set(words: pd.Series, vocab) -> "np.ndarray":
    """Per-row count of tokens that are members of ``vocab`` — the
    vectorized stopword/vocab-hit kernel shared by quality scoring and
    the curation pipelines (one explode + one isin + one index-level
    sum; no Python loop over tokens)."""
    import numpy as np

    w = words.reset_index(drop=True)
    ex = w.explode()
    return (ex.isin(vocab).groupby(level=0).sum()
            .reindex(w.index, fill_value=0).to_numpy().astype("int64"))
