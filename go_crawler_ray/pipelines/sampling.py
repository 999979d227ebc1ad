"""Corpus-scale vocabulary and sampling operators.

Training-data pipelines need two cheap global passes beyond dedup and
scoring: a vocabulary census (token frequencies feed tokenizer training
and contamination checks) and deterministic subsampling (fixed,
reproducible corpus fractions for ablations and mixture weights).

Scale shape:
- ``vocab_topk`` pre-aggregates per batch (one Counter over the batch's
  tokens, emitting unique-word partial counts), so the groupby shuffle
  carries O(unique words per block) rows, never one row per token; the
  final sort+limit runs over the vocabulary table only.
- ``sample_docs`` is a stateless vectorized filter over the doc_id
  column alone — the read prunes every other column, nothing shuffles,
  and the same crc32 keyed decision is reproducible on any cluster
  shape (functions/hashing.py kernel == zlib.crc32 exactly).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import crc32_many

_WS = re.compile(r"\s+")


def vocab_topk(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Top-``k`` whitespace tokens by global frequency.

    Returns (word, n) ordered by (n desc, word asc) — the tie-break
    makes the cut deterministic. Partial counts per batch, one
    groupby-sum shuffle over unique words, sort+limit over the
    vocabulary table.
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        vc = (batch["text"].str.strip().str.split(_WS)
              .explode().value_counts())
        return pd.DataFrame({"word": vc.index.to_numpy(dtype=object),
                             "n": vc.to_numpy(dtype="int64")})

    out = (ds.map_batches(partial_counts, batch_format="pandas")
           .groupby("word").sum("n")
           .sort(["sum(n)", "word"], descending=[True, False])
           .limit(k)
           .to_pandas())
    out = out.rename(columns={"sum(n)": "n"})
    return out[["word", "n"]].reset_index(drop=True)


def sample_docs(sf_dir: str, permille: int = 100) -> pd.DataFrame:
    """Deterministic ``permille``/1000 corpus sample keyed on
    crc32(doc_id as string) — the standard reproducible-subset idiom
    (same docs selected on every run, cluster shape, and engine).

    Returns (doc_id, bucket) for kept docs, ordered by doc_id; bucket is
    the crc32 residue mod 1000, kept in the output so downstream mixture
    weighting can re-slice without rehashing.
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        h = crc32_many(pc.cast(ids, pa.string()).combine_chunks())
        bucket = (h % np.uint32(1000)).astype("int64")
        mask = bucket < permille
        return pa.table({
            "doc_id": pc.cast(ids, pa.int64()).combine_chunks()
                        .filter(pa.array(mask)),
            "bucket": pa.array(bucket[mask]),
        })

    out = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)
