"""Deduplication family over the ``documents`` / ``embeddings`` tables.

The large-scale training-data dedup toolkit, Ray-Data-first:

- **exact**: content-key dedup = vectorized key extraction in
  map_batches, then hash-partitioned ``groupby(key).map_groups(first)``
  (the canonical exact-dedup shape; one shuffle on the key).
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
  bands must collide on one band).
- **n-gram Jaccard**: the verification kernel exposed directly.
- **embedding cosine**: near-dup pairs over the embedding column via
  blockwise matmul against a broadcast normalized matrix.

Driver-side union-find is used for the final connected components over
*candidate pairs only* (a set that LSH keeps tiny); the band groupby and
signature computation — the O(corpus) work — stay distributed. At
10^10-doc scale, swap the driver union-find for a few rounds of
min-label propagation with groupby (documented in cluster_minhash).
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


def minhash_clusters(sf_dir: str, threshold: float = 0.8,
                     num_perms: int = 64, bands: int = 16) -> pd.DataFrame:
    """(doc_id, cluster_id): near-dup clusters; cluster_id = min doc_id of
    the component. Docs with no near-dup are their own cluster."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    band_ds = ds.map_batches(MinHashStage, batch_format="pandas",
                             concurrency=2,
                             fn_constructor_kwargs={"num_perms": num_perms,
                                                    "bands": bands})
    cands = _candidate_pairs(band_ds)

    # exact-Jaccard verify (fetch only candidate docs' texts: semi-join
    # via broadcast id-set filter)
    uf = _UnionFind()
    if cands:
        need = sorted({i for p in cands for i in p})
        need_set = set(need)
        texts: dict[int, set[int]] = {}
        for b in (_read_docs(sf_dir, ["doc_id", "text"])
                  .map_batches(lambda t: t, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")):
            for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
                if d in need_set:
                    texts[d] = _shingles(t)
        for a, b_ in sorted(cands):
            sa, sb = texts[a], texts[b_]
            j = len(sa & sb) / len(sa | sb) if sa | sb else 1.0
            if j >= threshold:
                uf.union(a, b_)

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


def simhash_near_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """(a, b, hamming) pairs within ``max_hamming`` bits, found by 4x16-bit
    band blocking (a pair within 3 bits must agree on >=1 band)."""
    sigs = simhash_signatures(sf_dir)
    ids = sigs["doc_id"].to_numpy()
    h = sigs["simhash"].to_numpy().view(np.uint64)
    cands: set[tuple[int, int]] = set()
    for band in range(4):
        key = (h >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        df = pd.DataFrame({"key": key, "i": np.arange(len(ids))})
        for _, g in df.groupby("key"):
            if 1 < len(g) <= 200:
                ii = g["i"].to_numpy()
                a, b = np.triu_indices(len(ii), k=1)
                cands.update(zip(ii[a], ii[b]))
    rows_a, rows_b, rows_d = [], [], []
    for i, j in sorted(cands):
        d = int(bin(int(h[i]) ^ int(h[j])).count("1"))
        if d <= max_hamming:
            rows_a.append(int(ids[i])); rows_b.append(int(ids[j])); rows_d.append(d)
    return pd.DataFrame({"a": np.array(rows_a, dtype="int64"),
                         "b": np.array(rows_b, dtype="int64"),
                         "hamming": np.array(rows_d, dtype="int64")})


# ---------------------------------------------------------------------------
# n-gram Jaccard (direct verification kernel as its own operator)

def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5,
                        shingle_k: int = 3) -> pd.DataFrame:
    """(a, b, jaccard) for candidate pairs from MinHash banding, verified
    with exact shingle Jaccard."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    band_ds = ds.map_batches(MinHashStage, batch_format="pandas",
                             concurrency=2,
                             fn_constructor_kwargs={"shingle_k": shingle_k})
    cands = _candidate_pairs(band_ds)
    docs = _read_docs(sf_dir, ["doc_id", "text"]).to_pandas()
    sh = {int(d): _shingles(t, shingle_k)
          for d, t in zip(docs["doc_id"], docs["text"])}
    rows = []
    for a, b in sorted(cands):
        sa, sb = sh[int(a)], sh[int(b)]
        j = len(sa & sb) / len(sa | sb) if sa | sb else 1.0
        if j >= threshold:
            rows.append((int(a), int(b), round_half_away(j)))
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"]).astype(
        {"a": "int64", "b": "int64"})


# ---------------------------------------------------------------------------
# embedding-cosine near-dup

def embedding_near_pairs(sf_dir: str, threshold: float = 0.45) -> pd.DataFrame:
    """(a, b, cos) for vector pairs with cosine >= threshold.

    Blockwise: the full normalized matrix is broadcast once (ray.put);
    each batch computes batch x corpus similarities with one matmul and
    emits only above-threshold pairs with a < b."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    full = ds.to_pandas().sort_values("vec_id")
    ids = full["vec_id"].to_numpy()
    V = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    ref = ray.put((ids, Vn))

    class CosineBlock:
        def __init__(self):
            self.ids, self.Vn = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            bid = batch["vec_id"].to_numpy()
            B = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
            S = Bn @ self.Vn.T
            bi, cj = np.nonzero(S >= threshold)
            a = bid[bi]; b = self.ids[cj]
            keep = a < b
            return pd.DataFrame({
                "a": a[keep].astype("int64"),
                "b": b[keep].astype("int64"),
                "cos": round_half_away(S[bi, cj][keep]),
            })

    out = ds.map_batches(CosineBlock, batch_format="pandas",
                         concurrency=2, batch_size=512).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)
