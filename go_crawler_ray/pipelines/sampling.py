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
    makes the cut deterministic. Partial counts per batch, ONE
    groupby-sum shuffle over unique words; the top-k cut is per-block
    partial top-k (exact: the groupby co-locates each word in one
    block) + a k×blocks driver merge — no second all-to-all sort of
    the vocabulary table.
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        vc = (batch["text"].str.strip().str.split(_WS)
              .explode().value_counts())
        return pd.DataFrame({"word": vc.index.to_numpy(dtype=object),
                             "n": vc.to_numpy(dtype="int64")})

    def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return (batch.sort_values(["sum(n)", "word"],
                                  ascending=[False, True]).head(k))

    out = (ds.map_batches(partial_counts, batch_format="pandas")
           .groupby("word").sum("n")
           .map_batches(block_topk, batch_format="pandas")
           .to_pandas())
    out = (out.sort_values(["sum(n)", "word"], ascending=[False, True])
           .head(k).rename(columns={"sum(n)": "n"}))
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


def oov_ratio(sf_dir: str, vocab_k: int = 100) -> pd.DataFrame:
    """(doc_id, n_tokens, n_oov, oov_ratio) — per-doc out-of-vocabulary
    rate against the global top-``vocab_k`` token census. The classic
    two-pass shape: the census is the distributed ``vocab_topk`` pass
    (one groupby-sum over unique words), its tiny result is broadcast
    once (``ray.put``), and scoring is a stateless streaming filter —
    the corpus is read twice but never shuffled for the join.

    At 100 TB the vocab is a fixed artifact (a tokenizer's vocabulary);
    here it is derived from the same corpus so the whole query is
    self-contained and SQL-oracleable.
    """
    import ray

    vocab_ref = ray.put(frozenset(vocab_topk(sf_dir, vocab_k)["word"]))
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    class Score:
        def __init__(self):
            # one frozenset deserialization per ACTOR, not per batch
            self.vocab = ray.get(vocab_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            from ..functions.compat import round_half_away

            words = (batch["text"].str.strip().str.split(_WS)
                     .reset_index(drop=True))
            n = words.str.len().astype("int64")
            # vectorized membership: explode keeps the row index, so the
            # per-row OOV count is one isin + one index-level sum (no
            # Python loop over tokens in the hot path)
            ex = words.explode()
            oov = ((~ex.isin(self.vocab)).groupby(level=0).sum()
                   .reindex(words.index, fill_value=0)
                   .to_numpy().astype("int64"))
            nn = n.to_numpy()
            return pd.DataFrame({
                "doc_id": batch["doc_id"].to_numpy().astype("int64"),
                "n_tokens": nn,
                "n_oov": oov,
                "oov_ratio": round_half_away(oov / nn),
            })

    from ..functions.pool import auto_pool

    out = ds.map_batches(Score, batch_format="pandas",
                         concurrency=auto_pool(frac=0.5)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def domain_balance(sf_dir: str, group_col: str = "lang") -> pd.DataFrame:
    """Per-group balanced downsample — the mixture-weighting pass a
    training run uses to stop one language/domain from dominating an
    epoch (the corpus's ``lang`` column is ~3x skewed toward en).

    Every group is deterministically thinned toward the SMALLEST group's
    row count: ``rate_g = floor(min_count * 1000 / count_g)`` permille,
    and a doc survives iff ``crc32(str(doc_id)) % 1000 < rate_g`` (the
    ``sample_docs`` decision kernel, so the subset is reproducible
    across runs, engines and cluster shapes).

    Scale shape: the per-group census is ONE tiny groupby-count (rows =
    number of groups); the rate table is broadcast; the keep filter is
    a stateless vectorized map — no shuffle of the corpus itself.

    Returns (doc_id, lang, bucket) for kept docs, ordered by doc_id.
    """
    import ray

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", group_col])
    counts = ds.groupby(group_col).count().to_pandas()
    mn = int(counts["count()"].min())
    rates = {s: (mn * 1000) // int(c)
             for s, c in zip(counts[group_col], counts["count()"])}
    rates_ref = ray.put(rates)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(rates_ref)
        ids = batch["doc_id"].to_numpy().astype("int64")
        h = crc32_many(pa.array(ids.astype(str).tolist(), pa.string()))
        bucket = (h % np.uint32(1000)).astype("int64")
        rate = batch[group_col].map(r).to_numpy().astype("int64")
        m = bucket < rate
        return pd.DataFrame({"doc_id": ids[m],
                             group_col: batch[group_col].to_numpy()[m],
                             "bucket": bucket[m]})

    out = ds.map_batches(keep, batch_format="pandas").to_pandas()
    if "doc_id" not in out.columns:   # degenerate: nothing kept anywhere
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                            group_col: pd.Series(dtype=object),
                            "bucket": pd.Series(dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)


def pack_sequences(sf_dir: str, seq_len: int = 256,
                   n_buckets: int = 4096) -> pd.DataFrame:
    """Training-sequence packing layout: concatenate every doc's tokens
    in doc_id order and cut the stream into fixed ``seq_len`` windows —
    each doc learns where its tokens land.

    Returns (doc_id, n_tokens, start_tok, seq_id, n_seqs): global token
    offset of the doc's first token, the training sequence that token
    falls in, and how many sequences the doc straddles.

    The global offset is an exclusive prefix sum over 10^10 docs,
    computed as a distributed scan (the ``epoch_shuffle`` rank pattern):
    1. one streaming pass emits (doc_id, n_tokens, bucket) where bucket
       is a contiguous doc_id range;
    2. per-bucket token sums -> a tiny driver-side cumulative-offset
       table (``n_buckets`` ints);
    3. per-bucket local cumsum + bucket offset = the exact global
       offset. No single-node sort, no all-to-all beyond the bucket
       groupby.

    Ordered by doc_id. Bucket count adapts to the data and the result is
    bucket-count-invariant (pinned by test).
    """
    import pyarrow.parquet as _pq
    import ray

    n_rows = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    nb, _ = _adapt_buckets(n_rows, n_buckets)
    rpb = max(1, -(-n_rows // nb))        # ceil, >= 1
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def counted(batch: pd.DataFrame) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype("int64")
        n = (batch["text"].str.strip().str.split(_WS)
             .str.len().to_numpy().astype("int64"))
        # Arrow output: the slim table re-enters two shuffles — no
        # object-dtype round-trip on the wire (VERDICT r3 #7)
        return pa.table({"doc_id": pa.array(ids),
                         "n_tokens": pa.array(n),
                         "bucket": pa.array(ids // rpb)})

    def hist_partial(b: pa.Table) -> pa.Table:
        # select BY NAME: pyarrow has moved the group-key column between
        # releases (keys trailed the aggregates in older ones), so a
        # positional rename would silently swap bucket ids with sums
        g = b.group_by("bucket").aggregate([("n_tokens", "sum")])
        return pa.table({"bucket": g.column("bucket"),
                         "n_tokens": g.column("n_tokens_sum")})

    slim = ds.map_batches(counted, batch_format="pandas").materialize()
    hist = (slim.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("bucket").sum("n_tokens").to_pandas()
            .sort_values("bucket"))
    toks = hist["sum(n_tokens)"].to_numpy().astype("int64")
    offsets_ref = ray.put(dict(zip(
        hist["bucket"].astype("int64"),
        np.concatenate([[0], np.cumsum(toks)[:-1]]))))

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)
        g = g.sort_values("doc_id")
        n = g["n_tokens"].to_numpy()
        start = off[int(g["bucket"].iloc[0])] + np.cumsum(n) - n
        seq = start // seq_len
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "n_tokens": n,
            "start_tok": start,
            "seq_id": seq,
            "n_seqs": (start + n - 1) // seq_len - seq + 1,
        })

    out = (slim.groupby("bucket")
           .map_groups(pack_bucket, batch_format="pandas").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def epoch_shuffle(sf_dir: str, epoch: int = 0,
                  n_buckets: int = 4096) -> pd.DataFrame:
    """Deterministic global shuffle order for one training epoch:
    every doc gets a unique ``shuffle_rank`` in [0, n_docs) — the
    permutation is the sort order of crc32(f"{doc_id}:{epoch}") (ties
    broken by doc_id), so it is reproducible across runs, engines and
    cluster shapes, and changes completely between epochs.

    The global rank is assigned WITHOUT any single-node sort, the way a
    distributed sort ranks its output:
    1. one streaming pass histograms the top bits of each key into
       ``n_buckets`` ranges — per-batch ``np.bincount`` partials, summed
       into a tiny driver-side cumulative-offset table;
    2. one groupby shuffle co-locates each key range; inside a bucket
       the group sorts locally and ranks are ``offset[bucket] + i``.
    Both passes touch only the doc_id column; at 10^10 docs the driver
    holds 4096 ints and each group holds n/4096 rows.

    Returns (doc_id, shuffle_rank) ordered by doc_id.
    """
    import pyarrow.parquet as _pq

    n_rows = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_buckets, shift = _adapt_buckets(n_rows, n_buckets)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
                   .astype("int64")
        key = _epoch_keys(ids, epoch)
        return pa.table({
            "doc_id": pa.array(ids),
            "key": pa.array(key.astype("int64")),
            "bucket": pa.array((key >> np.uint32(shift)).astype("int64")),
        })

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    out = _rank_keyed(keyed_ds, n_buckets)
    return out.sort_values("doc_id").reset_index(drop=True)


def _adapt_buckets(n_rows: int, n_buckets: int) -> tuple[int, int]:
    """(bucket count, key shift): ~256 rows per bucket, capped at
    ``n_buckets`` — mostly-empty groups turn the rank groupby into pure
    scheduling (ranks are bucket-count-invariant, pinned by test)."""
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
    while n_buckets > 16 and n_buckets * 256 > n_rows:
        n_buckets >>= 1
    return n_buckets, 32 - int(np.log2(n_buckets))


def _epoch_keys(ids: np.ndarray, epoch: int) -> np.ndarray:
    """crc32(f"{doc_id}:{epoch}") per row, vectorized (uint32)."""
    s = np.char.add(ids.astype("int64").astype(str), f":{epoch}")
    return crc32_many(pa.array(s.tolist(), pa.string()))


def _rank_keyed(keyed_ds: rd.Dataset, n_buckets: int) -> pd.DataFrame:
    """Global rank assignment over a MATERIALIZED (doc_id, key, bucket)
    dataset: rank = position in the (key, doc_id) sort order, computed
    as bucket-histogram cumulative offsets + per-bucket local sort
    (no single-node sort; the driver holds ``n_buckets`` ints)."""
    import ray

    def partial_hist(batch: pa.Table) -> pa.Table:
        h = np.bincount(batch.column("bucket").to_numpy(zero_copy_only=False),
                        minlength=n_buckets)
        return pa.table({"bucket": pa.array(np.arange(n_buckets,
                                                      dtype="int64")),
                         "n": pa.array(h.astype("int64"))})

    hist = (keyed_ds.map_batches(partial_hist, batch_format="pyarrow")
            .groupby("bucket").sum("n").to_pandas())
    counts = np.zeros(n_buckets, dtype="int64")
    counts[hist["bucket"].to_numpy()] = hist["sum(n)"].to_numpy()
    offsets = ray.put(np.concatenate([[0], np.cumsum(counts)[:-1]]))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets)
        g = g.sort_values(["key", "doc_id"])
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "shuffle_rank": off[int(g["bucket"].iloc[0])]
            + np.arange(len(g), dtype="int64"),
        })

    return (keyed_ds.groupby("bucket")
            .map_groups(rank_bucket, batch_format="pandas")
            .to_pandas())


def decontaminate(sf_dir: str, holdout_permille: int = 100,
                  key_words: int = 3) -> pd.DataFrame:
    """Training/eval contamination check: which training docs collide
    with the held-out eval slice on the dedup content key?

    The corpus splits deterministically on the ``sample_docs`` crc32
    bucket (top ``holdout_permille``/1000 = the eval side). Both sides
    are keyed in ONE streaming pass (the first-``key_words``-token key
    exact_dedup groups on; swap in n-gram shingles for published
    benchmark decontamination — the plumbing is identical); the eval
    side's key multiset is tiny by construction, so it is collected once
    and broadcast — the training side then filters as a stateless map,
    with NO shuffle join. At 100 TB the eval set is a benchmark suite
    (KBs of keys broadcast to every task) while the training side
    streams.

    Returns (doc_id, n_matches) per CONTAMINATED training doc: how many
    eval docs share its key. Ordered by doc_id.
    """
    from collections import Counter

    import ray

    cut = 1000 - holdout_permille
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fps(batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.textkeys import dedup_key

        ids = batch["doc_id"].to_numpy().astype("int64")
        h = crc32_many(pc.cast(pa.array(ids), pa.string()))
        return pd.DataFrame({
            "doc_id": ids,
            "bucket": (h % np.uint32(1000)).astype("int64"),
            "fp": dedup_key(batch["text"], key_words),
        })

    slim = ds.map_batches(fps, batch_format="pandas").materialize()

    def hold_fps(batch: pd.DataFrame) -> pd.DataFrame:
        # fused filter+project: Ray's expr-filter -> Project pair leaks
        # the unprojected schema through empty blocks
        return batch.loc[batch["bucket"] >= cut, ["fp"]]

    hold = slim.map_batches(hold_fps, batch_format="pandas").to_pandas()
    hold_counts = ray.put(dict(Counter(hold["fp"])))

    class Contaminated:
        def __init__(self):
            # one dict deserialization per ACTOR, not per batch
            self.hc = ray.get(hold_counts)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            train = batch[batch["bucket"] < cut]
            n = train["fp"].map(self.hc)
            keep = n.notna()
            return pd.DataFrame({
                "doc_id": train["doc_id"][keep],
                "n_matches": n[keep].astype("int64"),
            })

    from ..functions.pool import auto_pool

    out = slim.map_batches(Contaminated, batch_format="pandas",
                           concurrency=auto_pool(frac=0.25)).to_pandas()
    if "doc_id" not in out.columns:   # zero contaminated docs anywhere
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                            "n_matches": pd.Series(dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)


def curated_epoch(sf_dir: str, epoch: int = 0, min_words: int = 5,
                  max_stopword_ratio: float = 0.5, key_words: int = 3,
                  holdout_permille: int = 100,
                  n_buckets: int = 4096) -> pd.DataFrame:
    """The end-to-end curation pass a training run consumes — quality
    filter -> exact dedup -> eval decontamination -> reproducible epoch
    shuffle — composed as ONE pipeline over a single corpus read:

    1. one map_batches pass scores quality (word count, stopword ratio
       — textproc.curate's filter), computes the crc train/holdout
       bucket and the dedup key;
    2. the holdout slice's key set (eval sets are not quality-filtered)
       is collected once and broadcast;
    3. first-push-wins dedup of quality-passing TRAIN docs = one native
       Min aggregate per key (the only all-to-all exchange);
    4. winners drop contaminated keys and take their epoch key in the
       same map; ranks come from the shared bucket-histogram assignment
       (no single-node sort).

    Returns (doc_id, shuffle_rank) over the curated survivors, ranks a
    permutation of [0, n_survivors), ordered by doc_id.
    """
    import pyarrow.parquet as _pq
    import ray
    from ray.data.aggregate import Min

    from ..functions.textkeys import dedup_key_from_tokens
    from .textproc import STOPWORDS

    cut = 1000 - holdout_permille
    stop = set(STOPWORDS)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def stage1(batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.textkeys import count_in_set

        ids = batch["doc_id"].to_numpy().astype("int64")
        h = crc32_many(pc.cast(pa.array(ids), pa.string()))
        words = batch["text"].str.strip().str.split(_WS)
        n_words = words.str.len().astype("int64")
        stop_n = count_in_set(words, stop)
        ok = (n_words >= min_words) & \
             ((stop_n / n_words) <= max_stopword_ratio)
        return pd.DataFrame({
            "doc_id": ids,
            "bucket": (h % np.uint32(1000)).astype("int64"),
            "key": dedup_key_from_tokens(words, key_words),
            "ok": ok.to_numpy(),
        })

    slim = ds.map_batches(stage1, batch_format="pandas").materialize()

    def hold_keys(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.loc[batch["bucket"] >= cut, ["key"]]

    hold_ref = ray.put(set(
        slim.map_batches(hold_keys, batch_format="pandas")
        .to_pandas()["key"]))

    def train_ok(batch: pd.DataFrame) -> pd.DataFrame:
        m = (batch["bucket"] < cut) & batch["ok"]
        return batch.loc[m, ["doc_id", "key"]]

    win_ds = (slim.map_batches(train_ok, batch_format="pandas")
              .groupby("key").aggregate(Min("doc_id"))
              .materialize())

    # survivor estimate for bucket adaptation: survivors <= corpus rows,
    # and ranks are bucket-count-invariant, so the full-corpus row count
    # is a safe (slightly over-bucketed) hint
    n_rows = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    nb, shift = _adapt_buckets(n_rows, n_buckets)

    def decon_and_key(batch: pd.DataFrame) -> pd.DataFrame:
        hk = ray.get(hold_ref)
        keep = ~batch["key"].isin(hk)
        ids = batch["min(doc_id)"][keep].to_numpy().astype("int64")
        key = _epoch_keys(ids, epoch)
        return pd.DataFrame({
            "doc_id": ids,
            "key": key.astype("int64"),
            "bucket": (key >> np.uint32(shift)).astype("int64"),
        })

    keyed = win_ds.map_batches(decon_and_key,
                               batch_format="pandas").materialize()
    if not keyed.count():
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "shuffle_rank": pd.Series(dtype="int64")})
    out = _rank_keyed(keyed, nb)
    return out.sort_values("doc_id").reset_index(drop=True)


def approx_distinct_tokens(sf_dir: str, log2m: int = 10) -> pd.DataFrame:
    """Deterministic HyperLogLog estimate of the corpus's distinct
    whitespace-token count (Flajolet et al. 2007, "HyperLogLog: the
    analysis of a near-optimal cardinality estimation algorithm").

    The hash is crc32 (functions/hashing.py == zlib.crc32) spread by
    the 64-bit golden-ratio multiply mod 2^64 (same mix the simhash
    kernel uses — raw crc32 is affine over GF(2), and its leading-zero
    statistics on similar strings are correlated enough to bias the
    estimate ~35% on a sequential vocabulary; the odd-multiplier mix
    leaves the HIGH bits uniform). Bucket = top ``log2m`` bits of the
    spread value, rank = 1 + leading-zero count of the next 22 bits
    (via exact frexp bit-length, no float log), register = max rank.
    The sketch — registers, zero count, estimate — is therefore
    bit-reproducible on any cluster shape AND re-derivable in SQL
    (HUGEINT modular multiply, as the simhash oracle already does).
    All register values and the harmonic sum are dyadic rationals well
    inside double precision, so the estimate is value-exact across
    engines, not just approximately equal.

    Scale shape — the textbook mergeable sketch: each block emits its
    partial registers as (bucket, rank) maxima (<= m rows per block),
    ONE groupby(bucket).max shuffle over <= m * blocks tiny rows merges
    them, and the driver folds <= m rows into the estimate. The corpus
    itself never shuffles.

    Returns one row: (m, n_zero_registers, estimate).
    """
    m = 1 << log2m
    wbits = 32 - log2m

    def partial_registers(batch: pd.DataFrame) -> pd.DataFrame:
        toks = (batch["text"].str.strip().str.split(_WS).explode()
                .dropna().unique())
        if not len(toks):
            return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                                 "rank": pd.Series(dtype="int64")})
        h64 = (crc32_many(pa.array(toks, pa.string())).astype(np.uint64)
               * np.uint64(0x9E3779B97F4A7C15))
        bucket = (h64 >> np.uint64(64 - log2m)).astype("int64")
        w = ((h64 >> np.uint64(32)) & np.uint64((1 << wbits) - 1)) \
            .astype("int64")
        # exact integer bit length via frexp (no float log): for w > 0,
        # frexp exponent == bit_length; rank = 1 + leading zeros
        bl = np.frexp(w.astype("float64"))[1].astype("int64")
        rank = np.where(w > 0, wbits + 1 - bl, wbits + 1).astype("int64")
        df = pd.DataFrame({"bucket": bucket, "rank": rank})
        return (df.groupby("bucket", sort=False)["rank"].max()
                .reset_index())

    reg = (rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
           .map_batches(partial_registers, batch_format="pandas")
           .groupby("bucket").max("rank")
           .to_pandas())
    ranks = np.zeros(m, dtype="int64")
    ranks[reg["bucket"].to_numpy()] = reg["max(rank)"].to_numpy()
    n_zero = int((ranks == 0).sum())
    alpha = 0.7213 / (1 + 1.079 / m)
    harm = float(np.sum(np.ldexp(1.0, -ranks)))     # exact dyadic sum
    est = alpha * m * m / harm
    if est <= 2.5 * m and n_zero > 0:
        est = m * np.log(m / n_zero)                # linear-counting range
    from ..functions.compat import round_half_away

    return pd.DataFrame({"m": pd.array([m], dtype="int64"),
                         "n_zero_registers": pd.array([n_zero],
                                                      dtype="int64"),
                         "estimate": round_half_away(np.array([est]))})


def temperature_sample(sf_dir: str, group_col: str = "lang",
                              alpha_num: int = 1,
                              alpha_den: int = 2) -> pd.DataFrame:
    """(doc_id, <group_col>): temperature-based mixture resampling (the
    corpus's ``lang`` column is the skewed axis — ~3x toward en — so it
    is the default; ``source`` is uniform in the synthetic corpus) — the
    mixture pass that flattens a skewed source distribution toward
    p_s ∝ n_s^α (α = alpha_num/alpha_den, default 1/2) instead of
    domain_balance's hard equalization. The smallest source keeps 100%
    of its rows; a source with n rows keeps a (n_min/n)^(1-α) fraction.

    The acceptance test is ALL-INTEGER so the SQL oracle is exact with
    no float thresholds: for α = 1/2 a doc survives iff

        (crc32(str(doc_id)) % 1000)^2 * n_s < n_min * 1000^2

    which is b < 1000 * sqrt(n_min/n_s) without ever computing the
    square root (int64-safe to n_s ~ 9e12 per source). Only α = 1/2 is
    wired — other temperatures need a different integer power pair.

    Scale shape (the domain_balance discipline): ONE tiny
    groupby("source") census (rows = number of sources), the count
    table broadcast via ray.put, then a stateless vectorized keep
    filter — the corpus itself never shuffles.
    """
    import ray

    if (alpha_num, alpha_den) != (1, 2):
        raise NotImplementedError("only alpha = 1/2 is wired "
                                  "(integer acceptance test)")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", group_col])
    counts = ds.groupby(group_col).count().to_pandas()
    n_by = {s: int(c) for s, c in zip(counts[group_col], counts["count()"])}
    n_min = min(n_by.values())
    n_ref = ray.put(n_by)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        nb = ray.get(n_ref)
        ids = batch["doc_id"].to_numpy().astype("int64")
        h = crc32_many(pa.array(ids.astype(str).tolist(), pa.string()))
        b = (h % np.uint32(1000)).astype("int64")
        ns = batch[group_col].map(nb).to_numpy().astype("int64")
        m = b * b * ns < n_min * 1_000_000
        return pd.DataFrame({"doc_id": ids[m],
                             group_col: batch[group_col].to_numpy()[m]})

    out = ds.map_batches(keep, batch_format="pandas").to_pandas()
    if "doc_id" not in out.columns:
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                            group_col: pd.Series(dtype=object)})
    return out.sort_values("doc_id").reset_index(drop=True)


def sample_per_group(sf_dir: str, k: int = 40,
                     group_col: str = "lang") -> pd.DataFrame:
    """(doc_id, <group_col>): deterministic ``k``-per-group sample —
    the k docs with the smallest (crc32(str(doc_id)), doc_id) rank key
    within each group. The hash rank makes the pick uniform-ish and
    reproducible on any cluster shape (same contract as sample_docs);
    the doc_id tie-break pins hash collisions.

    Scale shape — a distributed top-k PER GROUP: each block keeps at
    most k rows per group it sees (vectorized partial cut), then ONE
    groupby(group) shuffle over those partials finishes the cut in the
    group's single block. The shuffle carries O(k x groups x blocks)
    rows, never the corpus; no global sort.
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", group_col])

    def rank_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy().astype("int64")
        h = crc32_many(pa.array(ids.astype(str).tolist(), pa.string()))
        out = pd.DataFrame({"doc_id": ids,
                            group_col: batch[group_col].to_numpy(),
                            "h": h.astype("int64")})
        return (out.sort_values(["h", "doc_id"])
                .groupby(group_col, sort=False).head(k))

    def final_cut(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["h", "doc_id"]).head(k)

    out = (ds.map_batches(rank_rows, batch_format="pandas")
           .groupby(group_col).map_groups(final_cut,
                                          batch_format="pandas")
           .to_pandas())
    return (out[["doc_id", group_col]]
            .sort_values("doc_id").reset_index(drop=True))


def _ngram_rows(text: pd.Series, n: int) -> tuple[np.ndarray, pd.Series]:
    """(row_index, ngram_string) arrays for every word ``n``-gram in a
    batch of texts — fully vectorized: ONE explode, n-1 shifted
    elementwise string concats, a same-row boundary mask."""
    toks = text.str.strip().str.split(_WS).reset_index(drop=True)
    ex = toks.explode()
    idx = ex.index.to_numpy(dtype="int64")
    w = pd.Series(ex.to_numpy(dtype=object))
    m = len(w) - (n - 1)
    if m <= 0:
        return np.empty(0, dtype="int64"), pd.Series([], dtype=object)
    ng = w.iloc[0:m].reset_index(drop=True)
    for i in range(1, n):
        ng = ng + " " + w.iloc[i:m + i].reset_index(drop=True)
    same = idx[0:m] == idx[n - 1:]          # n-gram stays inside one doc
    return idx[0:m][same], ng[same]


def decontaminate_ngrams(sf_dir: str, holdout_permille: int = 100,
                         n: int = 5) -> pd.DataFrame:
    """Benchmark-style n-gram decontamination (the GPT-3 appendix-C /
    open-LM-suite discipline, at word-``n``-gram granularity): which
    training docs contain any word n-gram that also appears in the
    held-out eval slice, and how many DISTINCT such n-grams each one
    contains.

    Split = the deterministic crc32(doc_id) permille bucket shared with
    :func:`decontaminate` (top ``holdout_permille`` buckets = eval).

    Scale shape: the eval side's distinct n-gram set is collected once
    (eval suites are KB-MB scale against a 100 TB train side) and
    broadcast via ray.put; both sides stream — per-batch vectorized
    n-gram generation (one explode + n-1 shifted concats, no per-row
    loop), set-membership filter, per-doc distinct count. The train
    corpus never shuffles and never materializes.

    Returns (doc_id, n_hits) per contaminated TRAINING doc, by doc_id.
    """
    import ray

    cut = 1000 - holdout_permille
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def bucket_of(ids: np.ndarray) -> np.ndarray:
        h = crc32_many(pa.array(ids.astype(str).tolist(), pa.string()))
        return (h % np.uint32(1000)).astype("int64")

    def eval_ngrams(batch: pd.DataFrame) -> pa.Table:
        # typed Arrow output: Ray's block-size estimator chokes on
        # empty object-dtype pandas columns
        ids = batch["doc_id"].to_numpy().astype("int64")
        hold = bucket_of(ids) >= cut
        if not hold.any():
            return pa.table({"ng": pa.array([], pa.string())})
        _, ng = _ngram_rows(batch["text"][hold], n)
        return pa.table({"ng": pa.array(ng.drop_duplicates(),
                                        pa.string())})

    hold_ng = ds.map_batches(eval_ngrams,
                             batch_format="pandas").to_pandas()
    ng_ref = ray.put(frozenset(hold_ng["ng"]))

    class Hits:
        def __init__(self):
            self.ngs = ray.get(ng_ref)   # one deserialization per actor

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["doc_id"].to_numpy().astype("int64")
            train = bucket_of(ids) < cut
            if not train.any():
                return pd.DataFrame({
                    "doc_id": pd.Series(dtype="int64"),
                    "n_hits": pd.Series(dtype="int64")})
            sub = batch["text"][train]
            idx, ng = _ngram_rows(sub, n)
            hit = ng.isin(self.ngs).to_numpy()
            f = (pd.DataFrame({"i": idx[hit],
                               "ng": ng[hit].to_numpy()})
                 .drop_duplicates())
            cnt = f.groupby("i").size()
            return pd.DataFrame({
                "doc_id": ids[train][cnt.index.to_numpy(dtype="int64")],
                "n_hits": cnt.to_numpy(dtype="int64")})

    from ..functions.pool import auto_pool

    out = ds.map_batches(Hits, batch_format="pandas",
                         concurrency=auto_pool(frac=0.25)).to_pandas()
    if "doc_id" not in out.columns:
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                            "n_hits": pd.Series(dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)
