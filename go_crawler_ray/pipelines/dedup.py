"""Deduplication family over the ``documents`` / ``embeddings`` tables.

The large-scale training-data dedup toolkit, Ray-Data-first:

- **exact**: content-key dedup = vectorized key extraction in
  map_batches, then a native ``groupby(key).aggregate(Min, Count)``
  (the canonical exact-dedup shape: one key shuffle with per-block
  partial combine, no per-group Python).
- **MinHash + LSH** (Broder 1997, "On the resemblance and containment
  of documents"; banding per Leskovec/Rajaraman/Ullman, Mining of
  Massive Datasets ch.3): per-batch shingle->minhash signatures (numpy),
  explode to (band_id, band_hash, doc_id) rows, ``groupby`` bands to get
  candidate buckets, exact-Jaccard verification of candidate pairs, then
  connected components -> cluster ids. The only all-to-all exchange is
  the band groupby, whose rows are tiny (3 ints per band).
- **SimHash** (Charikar 2002, "Similarity estimation techniques from
  rounding algorithms"; blocking per Manku et al. 2007): 64-bit
  signatures per doc + Hamming-near pairs via band-blocking (4x16-bit
  bands must collide on one band), pairs enumerated per bucket in a
  distributed groupby with chunked scans (no bucket-size cap).
- **n-gram Jaccard**: exact full-recall set-similarity self-join via
  prefix filtering (Xiao et al. 2008, PPJoin's prefix principle) —
  admits an all-pairs SQL oracle.
- **embedding cosine**: exact cosine self-join as a partitioned
  block-pair matmul over object-store block refs (distributed-GEMM
  layout; no full-matrix materialization on any node).

Every O(corpus) stage — signatures, banding, bucket pairs, candidate
shingling (broadcast semi-join), pair verification — runs in map_batches
/ groupby. The driver handles only candidate-pair lists (small by LSH /
prefix-filter design) and the final union-find over verified pairs; at
10^10-doc scale, swap the driver union-find for a few rounds of
min-label propagation with groupby.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.compat import round_half_away

_WS = re.compile(r"\s+")


def _read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# exact dedup

def exact_dedup(sf_dir: str, key_words: int = 3) -> pd.DataFrame:
    """Group docs by their first-``key_words``-token key; keep min doc_id.

    Returns (dedup_key, keep_doc_id, n_dups) per key — the survivor table
    of an exact dedup pass."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        keys = (batch["text"].str.strip().str.split(_WS).str[:key_words]
                .str.join(" "))
        return pd.DataFrame({"dedup_key": keys, "doc_id": batch["doc_id"]})

    # native hash-shuffle aggregate: per-block partial min/count combine
    # before the exchange, and no per-group Python (a map_groups with a
    # pandas constructor per group was measurably slower)
    from ray.data.aggregate import Count, Min

    out = (ds.map_batches(add_key, batch_format="pandas")
           .groupby("dedup_key")
           .aggregate(Min("doc_id"), Count())
           .to_pandas())
    out = out.rename(columns={"min(doc_id)": "keep_doc_id",
                              "count()": "n_dups"})
    out["keep_doc_id"] = out["keep_doc_id"].astype("int64")
    out["n_dups"] = out["n_dups"].astype("int64")
    return out.sort_values("dedup_key").reset_index(drop=True)


# ---------------------------------------------------------------------------
# MinHash + LSH

def _shingles(text: str, k: int = 3) -> set[int]:
    toks = _WS.split(text.strip())
    if len(toks) < k:
        return {zlib.crc32(" ".join(toks).encode())}
    return {zlib.crc32(" ".join(toks[i:i + k]).encode())
            for i in range(len(toks) - k + 1)}


def _string_shingles(text: str, k: int = 3) -> set[str]:
    """Un-hashed shingles — used where exact Jaccard must match a SQL
    oracle bit for bit (a crc collision would silently change a hashed
    set's cardinality)."""
    toks = _WS.split(text.strip())
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


class MinHasher:
    """num_perms universal-hash minhash; coefficients fixed by seed so
    every actor computes identical signatures."""

    _P = (1 << 61) - 1

    def __init__(self, num_perms: int = 64, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, self._P, size=num_perms, dtype=np.uint64)
        self.b = rng.integers(0, self._P, size=num_perms, dtype=np.uint64)
        self.num_perms = num_perms

    def signature(self, shingles: set[int]) -> np.ndarray:
        if not shingles:
            return np.zeros(self.num_perms, dtype=np.uint64)
        x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
        # (a*x + b) mod P, rowwise min — vectorized over shingles x perms
        v = (np.outer(self.a, x) + self.b[:, None]) % self._P
        return v.min(axis=1)


class MinHashStage:
    """map_batches actor: emits (band_id, band_hash, doc_id) rows."""

    def __init__(self, num_perms: int = 64, bands: int = 16, shingle_k: int = 3):
        self.mh = MinHasher(num_perms)
        self.bands = bands
        self.rows_per_band = num_perms // bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        band_ids, band_hashes, doc_ids = [], [], []
        r = self.rows_per_band
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            sig = self.mh.signature(_shingles(text, self.shingle_k))
            for b in range(self.bands):
                h = zlib.crc32(sig[b * r:(b + 1) * r].tobytes())
                band_ids.append(b)
                band_hashes.append(h)
                doc_ids.append(doc_id)
        return pd.DataFrame({
            "band_id": np.array(band_ids, dtype="int32"),
            "band_hash": np.array(band_hashes, dtype="int64"),
            "doc_id": np.array(doc_ids, dtype="int64"),
        })


def _candidate_pairs(ds: rd.Dataset) -> set[tuple[int, int]]:
    """groupby band bucket -> all pairs within a bucket."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"a": np.array([], dtype="int64"),
                                 "b": np.array([], dtype="int64")})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[a], "b": ids[b]})

    got = (ds.groupby(["band_id", "band_hash"])
           .map_groups(pairs, batch_format="pandas").to_pandas())
    return set(zip(got["a"], got["b"]))


class _UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def _collect_candidate_shingles(sf_dir: str, doc_ids,
                                shingle_k: int = 3,
                                string_shingles: bool = False) -> dict:
    """Distributed semi-join: broadcast the candidate-id set (ray.put
    once), filter + shingle inside map_batches, and return only the
    candidates' shingle sets to the driver (a set LSH keeps tiny).
    The full corpus is never scanned on the driver."""
    need_ref = ray.put(np.array(sorted(doc_ids), dtype=np.int64))

    class ShingleCandidates:
        def __init__(self):
            self.need = ray.get(need_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = np.isin(batch["doc_id"].to_numpy(), self.need)
            sub = batch[m]
            rows = []
            for d, t in zip(sub["doc_id"], sub["text"]):
                sh = (_string_shingles(t, shingle_k) if string_shingles
                      else _shingles(t, shingle_k))
                rows.append((int(d), sorted(sh)))
            return pd.DataFrame(rows, columns=["doc_id", "shingles"])

    got = (_read_docs(sf_dir, ["doc_id", "text"])
           .map_batches(ShingleCandidates, batch_format="pandas",
                        concurrency=2)
           .to_pandas())
    return {int(d): set(s) for d, s in zip(got["doc_id"], got["shingles"])}


def _verify_pairs_distributed(pairs: list[tuple[int, int]],
                              shingles: dict, threshold: float) -> pd.DataFrame:
    """Exact-Jaccard verification as a map_batches stage over the pair
    list, with the (candidate-only) shingle map broadcast once."""
    if not pairs:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    sh_ref = ray.put(shingles)

    class VerifyJaccard:
        def __init__(self):
            self.sh = ray.get(sh_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out_a, out_b, out_j = [], [], []
            for a, b in zip(batch["a"], batch["b"]):
                sa, sb = self.sh[int(a)], self.sh[int(b)]
                u = len(sa | sb)
                j = len(sa & sb) / u if u else 1.0
                if j >= threshold:
                    out_a.append(int(a)); out_b.append(int(b))
                    out_j.append(j)
            return pd.DataFrame({
                "a": np.array(out_a, dtype="int64"),
                "b": np.array(out_b, dtype="int64"),
                "jaccard": round_half_away(np.array(out_j, dtype="float64")),
            })

    ds = rd.from_pandas(pd.DataFrame(pairs, columns=["a", "b"]))
    out = ds.map_batches(VerifyJaccard, batch_format="pandas",
                         concurrency=2).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def minhash_clusters(sf_dir: str, threshold: float = 0.8,
                     num_perms: int = 64, bands: int = 16) -> pd.DataFrame:
    """(doc_id, cluster_id): near-dup clusters; cluster_id = min doc_id of
    the component. Docs with no near-dup are their own cluster.

    All O(corpus) work is distributed: signatures + banding
    (map_batches), bucket pairs (groupby), candidate shingling (semi-join
    map_batches), exact-Jaccard verify (map_batches over pairs). Only
    union-find over the verified pairs — O(near-dup pairs) — runs on the
    driver (swap for min-label-propagation rounds at 10^10 docs)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    band_ds = ds.map_batches(MinHashStage, batch_format="pandas",
                             concurrency=2,
                             fn_constructor_kwargs={"num_perms": num_perms,
                                                    "bands": bands})
    cands = _candidate_pairs(band_ds)

    uf = _UnionFind()
    if cands:
        need = {i for p in cands for i in p}
        sh = _collect_candidate_shingles(sf_dir, need)
        verified = _verify_pairs_distributed(sorted(cands), sh, threshold)
        for a, b_ in zip(verified["a"], verified["b"]):
            uf.union(int(a), int(b_))

    all_ids = _read_docs(sf_dir, ["doc_id"]).to_pandas()["doc_id"]
    cluster = np.array([uf.find(int(d)) if int(d) in uf.parent else int(d)
                        for d in all_ids], dtype="int64")
    out = pd.DataFrame({"doc_id": all_ids.astype("int64"),
                        "cluster_id": cluster})
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash

class SimHashStage:
    """64-bit simhash of word-level features, vectorized per batch."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(batch), dtype=np.uint64)
        for i, text in enumerate(batch["text"]):
            toks = _WS.split(text.strip())
            hs = np.array([zlib.crc32(w.encode()) for w in toks],
                          dtype=np.uint64)
            hs = hs * np.uint64(0x9E3779B97F4A7C15)      # spread to 64 bits
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            out[i] = np.packbits(votes > 0, bitorder="little").view(np.uint64)[0]
        return pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                             "simhash": out.view(np.int64)})


def simhash_signatures(sf_dir: str) -> pd.DataFrame:
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(SimHashStage, batch_format="pandas",
                         concurrency=2).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_POP16 = np.unpackbits(
    np.arange(65536, dtype=np.uint16).view(np.uint8).reshape(-1, 2),
    axis=1).sum(axis=1).astype(np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via a 16-bit lookup table."""
    x = x.astype(np.uint64)
    out = np.zeros(len(x), dtype=np.int64)
    for s in (0, 16, 32, 48):
        out += _POP16[((x >> np.uint64(s)) & np.uint64(0xFFFF)).astype(np.int64)]
    return out


def simhash_near_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """(a, b, hamming) pairs within ``max_hamming`` bits, via 4x16-bit
    band blocking (Manku et al. 2007: a pair within 3 bits must agree on
    >=1 band).

    Fully distributed: band explode (map_batches) -> bucket groupby ->
    per-bucket pair enumeration with CHUNKED block scans (no bucket-size
    cap — the documented recall guarantee holds even for hot buckets) ->
    distinct-pair groupby. The driver receives only the final pairs."""

    def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy().view(np.uint64)
        ids = batch["doc_id"].to_numpy()
        parts = []
        for band in range(4):
            key = ((h >> np.uint64(band * 16)) & np.uint64(0xFFFF))
            parts.append(pd.DataFrame({
                "band": np.full(len(ids), band, dtype="int32"),
                "key": key.astype("int64"),
                "doc_id": ids.astype("int64"),
                "simhash": h.view(np.int64),
            }))
        return pd.concat(parts, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy()
        h = g["simhash"].to_numpy().view(np.uint64)
        order = np.argsort(ids)
        ids, h = ids[order], h[order]
        n = len(ids)
        out_a, out_b, out_d = [], [], []
        if n >= 2:
            # chunked upper-triangle scan: memory stays O(chunk x n)
            for i0 in range(0, n - 1, 512):
                i1 = min(i0 + 512, n - 1)
                blk = slice(i0, i1)
                d = _popcount64(
                    (h[blk, None] ^ h[None, :]).ravel()).reshape(i1 - i0, n)
                bi, bj = np.nonzero(d <= max_hamming)
                keep = (bi + i0) < bj            # strict upper triangle
                out_a.append(ids[bi[keep] + i0])
                out_b.append(ids[bj[keep]])
                out_d.append(d[bi[keep], bj[keep]])
        if not out_a:
            return pd.DataFrame({"a": np.array([], dtype="int64"),
                                 "b": np.array([], dtype="int64"),
                                 "hamming": np.array([], dtype="int64")})
        return pd.DataFrame({
            "a": np.concatenate(out_a).astype("int64"),
            "b": np.concatenate(out_b).astype("int64"),
            "hamming": np.concatenate(out_d).astype("int64"),
        })

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[:1][["a", "b", "hamming"]]

    sig_ds = (_read_docs(sf_dir, ["doc_id", "text"])
              .map_batches(SimHashStage, batch_format="pandas",
                           concurrency=2))
    pairs = (sig_ds.map_batches(explode_bands, batch_format="pandas")
             .groupby(["band", "key"])
             .map_groups(bucket_pairs, batch_format="pandas")
             .groupby(["a", "b"])           # a pair may collide in >1 band
             .map_groups(dedup_pairs, batch_format="pandas")
             .to_pandas())
    if pairs.empty:
        return pd.DataFrame({"a": np.array([], dtype="int64"),
                             "b": np.array([], dtype="int64"),
                             "hamming": np.array([], dtype="int64")})
    return (pairs.astype({"a": "int64", "b": "int64", "hamming": "int64"})
            .sort_values(["a", "b"]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# n-gram Jaccard (direct verification kernel as its own operator)

def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5,
                        shingle_k: int = 3) -> pd.DataFrame:
    """(a, b, jaccard) for EVERY pair with exact shingle-set Jaccard >=
    ``threshold`` — a full-recall exact similarity join (so it admits a
    value-exact all-pairs SQL oracle), not an LSH approximation.

    Shape (prefix-filtered set-similarity join, Xiao et al. 2008
    "Efficient Similarity Joins for Near Duplicate Detection" — public):
    per-doc shingle sets (map_batches) -> explode only each doc's PREFIX
    shingles (|S| - ceil(t*|S|) + 1 smallest under a global order; any
    pair with J >= t must share one) -> groupby(shingle) -> candidate
    pairs -> distinct -> distributed exact-Jaccard verify over candidate
    docs only (broadcast semi-join). Shingles stay strings end-to-end —
    hashing could alter set cardinality on collision and break the
    oracle."""
    import math

    def prefix_rows(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, t in zip(batch["doc_id"], batch["text"]):
            sh = sorted(_string_shingles(t, shingle_k))
            plen = len(sh) - math.ceil(threshold * len(sh)) + 1
            for s in sh[:max(1, plen)]:
                rows.append((s, int(d)))
        return pd.DataFrame(rows, columns=["shingle", "doc_id"])

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"a": np.array([], dtype="int64"),
                                 "b": np.array([], dtype="int64")})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[a].astype("int64"),
                             "b": ids[b].astype("int64")})

    cand_df = (_read_docs(sf_dir, ["doc_id", "text"])
               .map_batches(prefix_rows, batch_format="pandas")
               .groupby("shingle")
               .map_groups(bucket_pairs, batch_format="pandas")
               .to_pandas())
    cands = sorted(set(zip(cand_df["a"], cand_df["b"])))
    if not cands:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    need = {i for p in cands for i in p}
    sh = _collect_candidate_shingles(sf_dir, need, shingle_k,
                                     string_shingles=True)
    return _verify_pairs_distributed(cands, sh, threshold)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup

def embedding_near_pairs(sf_dir: str, threshold: float = 0.45) -> pd.DataFrame:
    """(a, b, cos) for vector pairs with cosine >= threshold — an EXACT
    cosine similarity self-join, computed as a partitioned block-pair
    matmul:

    1. normalize per batch (map_batches) and materialize — the blocks
       stay in the object store; the driver holds only their ObjectRefs;
    2. fan out one task per block PAIR (i <= j); each task zero-copy
       reads its two blocks and emits only above-threshold pairs.

    No full-matrix materialization anywhere (neither driver nor any one
    worker); at cluster scale the block-pair grid is the classic
    distributed GEMM layout. The O(N^2/B^2) pair grid is inherent to an
    exact join — pipelines/ann.py's hyperplane-LSH buckets are the
    approximate fast path when recall < 1 is acceptable."""

    def normalize(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy().astype("int64")
        V = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        return pd.DataFrame({"vec_id": ids, "embedding": list(Vn)})

    mat = (rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
           .map_batches(normalize, batch_format="pandas", batch_size=2048)
           .materialize())
    refs = mat.to_arrow_refs()            # driver keeps refs, not data

    class BlockPairCosine:
        """One call per (i, j) block pair; blocks cached per actor."""

        def __init__(self, refs):
            self.refs = refs
            self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

        def _block(self, i: int):
            got = self._cache.get(i)
            if got is None:
                tbl = ray.get(self.refs[i])
                ids = tbl.column("vec_id").to_numpy(
                    zero_copy_only=False).astype("int64")
                V = np.stack(tbl.column("embedding").to_pylist())
                got = self._cache[i] = (ids, V)
            return got

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = []
            for i, j in zip(batch["bi"], batch["bj"]):
                ids_i, Vi = self._block(int(i))
                ids_j, Vj = self._block(int(j))
                S = Vi @ Vj.T
                bi, bj = np.nonzero(S >= threshold)
                a, b = ids_i[bi], ids_j[bj]
                keep = a < b
                out.append(pd.DataFrame({
                    "a": a[keep], "b": b[keep],
                    "cos": round_half_away(S[bi, bj][keep]),
                }))
            return (pd.concat(out, ignore_index=True) if out
                    else pd.DataFrame({"a": [], "b": [], "cos": []}))

    grid = [{"bi": i, "bj": j} for i in range(len(refs))
            for j in range(i, len(refs))]
    out = (rd.from_items(grid)
           .map_batches(BlockPairCosine, batch_format="pandas",
                        batch_size=4, concurrency=2,
                        fn_constructor_kwargs={"refs": refs})
           .to_pandas())
    out = out.astype({"a": "int64", "b": "int64"})
    return out.sort_values(["a", "b"]).reset_index(drop=True)
