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

Every O(corpus) AND every O(pairs) stage runs distributed: signatures,
banding and bucket pairs in map_batches/groupby; candidate pairs stay a
distinct-pair groupby DATASET; exact-Jaccard verification point-reads
each pair batch's own doc ids with a pushed-down filter (no task or
actor ever holds the global candidate set); connected components run
as Hash-to-Min min-label-propagation groupby rounds. The driver only
ever holds final (node, label) tables — O(LSH candidates), never
O(corpus) or O(pairs).
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
from ..functions.pool import auto_pool

_WS = re.compile(r"\s+")


def _read_docs(sf_dir: str, columns: list[str],
               nblocks: int | None = None) -> rd.Dataset:
    """Pruned documents read. ``nblocks`` overrides Ray's default block
    split (2x cluster CPUs): on a small corpus that default yields dozens
    of sub-100-row blocks, and every downstream groupby shuffles with one
    partition PER BLOCK — pure scheduling overhead. Callers that feed a
    shuffle pick ~2 blocks per pool actor instead; at 100 TB the default
    (bytes-targeted) split is already right, so pass None there."""
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns,
                           override_num_blocks=nblocks)


def _docs_blocks(sf_dir: str, rows_per_block: int = 512) -> int:
    """Block count for the documents table (see functions.pool.blocks_for)."""
    import pyarrow.parquet as _pq

    from ..functions.pool import blocks_for

    n = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return blocks_for(n, rows_per_block)


# ---------------------------------------------------------------------------
# exact dedup

def exact_dedup(sf_dir: str, key_words: int = 3) -> pd.DataFrame:
    """Group docs by their first-``key_words``-token key; keep min doc_id.

    Returns (dedup_key, keep_doc_id, n_dups) per key — the survivor table
    of an exact dedup pass."""
    ds = _read_docs(sf_dir, ["doc_id", "text"], _docs_blocks(sf_dir))

    from ..functions.textkeys import dedup_key

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"dedup_key": dedup_key(batch["text"], key_words),
                             "doc_id": batch["doc_id"]})

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
    """map_batches actor: emits (band_id, band_hash, doc_id) rows.

    The signature kernel is BATCH-vectorized: shingle strings for the
    whole batch are hashed in one table-driven crc pass
    (functions.hashing.crc32_many), deduped per doc with a single
    np.unique over (doc_idx << 32 | hash) keys, and min-hashed with ONE
    (perms x shingles) modular multiply + segment-min (reduceat) —
    bit-identical to the per-doc ``MinHasher.signature`` path, which
    remains as the reference kernel for tests."""

    def __init__(self, num_perms: int = 64, bands: int = 16, shingle_k: int = 3):
        self.mh = MinHasher(num_perms)
        self.bands = bands
        self.rows_per_band = num_perms // bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # chunk internally: the (perms x shingles) work matrix must stay
        # cache-sized regardless of how Ray blocks the input (a 5000-doc
        # block measured 8.5 s monolithic vs 0.4 s in 512-doc chunks)
        if len(batch) > 512:
            return pd.concat(
                [self._chunk(batch.iloc[i:i + 512])
                 for i in range(0, len(batch), 512)], ignore_index=True)
        return self._chunk(batch)

    def _chunk(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashing import crc32_many

        k = self.shingle_k
        texts = batch["text"].tolist()
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        n_docs = len(texts)
        if not n_docs:
            return pd.DataFrame({
                "band_id": np.array([], dtype="int32"),
                "band_hash": np.array([], dtype="int64"),
                "doc_id": np.array([], dtype="int64"),
            })
        sh_strs: list[str] = []
        seg = np.empty(n_docs + 1, dtype=np.int64)
        seg[0] = 0
        for d, t in enumerate(texts):
            toks = _WS.split(t.strip())
            if len(toks) < k:
                sh_strs.append(" ".join(toks))
            else:
                sh_strs.extend(" ".join(toks[i:i + k])
                               for i in range(len(toks) - k + 1))
            seg[d + 1] = len(sh_strs)

        h = crc32_many(pa.array(sh_strs, pa.string())).astype(np.uint64)
        docidx = np.repeat(np.arange(n_docs, dtype=np.uint64), np.diff(seg))
        uk = np.unique((docidx << np.uint64(32)) | h)   # per-doc distinct
        uh = uk & np.uint64(0xFFFFFFFF)
        ud = (uk >> np.uint64(32)).astype(np.int64)
        starts = np.searchsorted(ud, np.arange(n_docs))
        # (a*x + b) mod P for every (perm, shingle) at once, then per-doc
        # segment minima — identical arithmetic to MinHasher.signature
        v = (self.mh.a[:, None] * uh[None, :]
             + self.mh.b[:, None]) % MinHasher._P
        sigs = np.ascontiguousarray(
            np.minimum.reduceat(v, starts, axis=1).T)   # docs x perms

        r = self.rows_per_band
        band_hashes = np.empty(n_docs * self.bands, dtype=np.int64)
        pos = 0
        for d in range(n_docs):
            row = sigs[d]
            for b in range(self.bands):
                band_hashes[pos] = zlib.crc32(row[b * r:(b + 1) * r].tobytes())
                pos += 1
        return pd.DataFrame({
            "band_id": np.tile(np.arange(self.bands, dtype=np.int32), n_docs),
            "band_hash": band_hashes,
            "doc_id": np.repeat(ids, self.bands),
        })


def _candidate_pairs_ds(ds: rd.Dataset,
                        n_salt: int | None = None) -> rd.Dataset:
    """Candidate pairs as a DATASET. The pair set never lands on the
    driver (it used to be a driver ``set``; on a skewed corpus one hot
    band bucket would have made that the scale-killer).

    Round-4 shape: the band rows groupby a SALT BUCKET (band_hash mod
    P, P ~ pool size), NOT the (band_id, band_hash) key — at 216k docs
    x 16 bands the bucket-keyed groupby carries ~3.5M nearly-all-
    singleton groups through the all-to-all and pays one Python
    map_groups call each (the measured many-groups-per-block constant;
    6.2 s of a 7.6 s op at sf0.1). Inside each of the P groups a
    vectorized ``duplicated`` mark cuts to the colliding rows and only
    ACTUAL collision buckets (rare) enumerate pairs in Python. A
    (band_id, band_hash) bucket always lands whole in one salt group,
    so the pair set is unchanged. A pair may still surface from >1
    band: every consumer tolerates that (connected components absorb
    duplicates; verification pays at most a bands-x duplication), so
    no dedup-by-pair shuffle runs at all."""
    from ..functions.pool import cluster_cpus

    P = n_salt or max(16, 4 * int(cluster_cpus()))

    def salt(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[["band_id", "band_hash", "doc_id"]].copy()
        batch["bkt"] = ((batch["band_hash"].to_numpy().astype(np.uint64)
                         * np.uint64(31)
                         + batch["band_id"].to_numpy().astype(np.uint64))
                        % np.uint64(P)).astype("int64")
        return batch

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        dup = g[g.duplicated(["band_id", "band_hash"], keep=False)]
        out_a, out_b = [], []
        for _, grp in dup.groupby(["band_id", "band_hash"], sort=False):
            ids = np.sort(pd.unique(grp["doc_id"]))
            if len(ids) >= 2:
                ia, ib = np.triu_indices(len(ids), k=1)
                out_a.append(ids[ia])
                out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame({"a": np.array([], dtype="int64"),
                                 "b": np.array([], dtype="int64")})
        return pd.DataFrame({
            "a": np.concatenate(out_a).astype("int64"),
            "b": np.concatenate(out_b).astype("int64"),
        })

    return (ds.map_batches(salt, batch_format="pandas")
            .groupby("bkt")
            .map_groups(bucket_pairs, batch_format="pandas"))


def _verify_pairs_ds(pairs_ds: rd.Dataset, sf_dir: str,
                     threshold: float, shingle_k: int = 3,
                     string_shingles: bool = False) -> rd.Dataset:
    """Exact-Jaccard verification as a map_batches stage over the pair
    dataset. Each verify actor point-reads ONLY the doc ids its current
    batch needs (pushed-down parquet ``isin`` filter — row-group stats
    prune the scan) and shingles them locally, caching shingle sets
    across batches. Round-4 rewrite of the former broadcast shape (one
    task read+shingled the WHOLE candidate set, every actor then held a
    full dict copy): now no single task and no single actor ever holds
    more shingle sets than its own pair batches reference — and the
    per-actor cache is additionally capped at MAX_CACHED_DOCS entries
    (cleared wholesale when exceeded) so cumulative growth across a
    long-lived actor's many batches is bounded too. The stage therefore
    scales with pairs-per-actor, not with the global candidate count —
    the partitioned point-lookup layout that works against partitioned
    corpus storage at 100 TB. Shingle sets never touch the driver."""

    class VerifyJaccard:
        # cache budget: without it a long-lived actor in a small pool
        # would asymptotically accumulate every candidate's shingles,
        # re-creating the per-actor-memory problem the round-4 rewrite
        # removed. Eviction = wholesale clear (simpler than LRU; the
        # next batch re-point-reads only its own ids)
        MAX_CACHED_DOCS = 50_000

        def __init__(self):
            self.sh: dict[int, set] = {}

        def _ensure(self, ids: np.ndarray) -> None:
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            if len(self.sh) > self.MAX_CACHED_DOCS:
                self.sh.clear()
            missing = np.array([i for i in ids if i not in self.sh],
                               dtype=np.int64)
            if not len(missing):
                return
            tbl = pq.read_table(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                filters=pc.field("doc_id").isin(missing))
            for d, t in zip(tbl.column("doc_id").to_pylist(),
                            tbl.column("text").to_pylist()):
                self.sh[int(d)] = (
                    _string_shingles(t, shingle_k) if string_shingles
                    else _shingles(t, shingle_k))

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            self._ensure(np.unique(np.concatenate([
                batch["a"].to_numpy().astype("int64"),
                batch["b"].to_numpy().astype("int64")])))
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

    return pairs_ds.map_batches(VerifyJaccard, batch_format="pandas",
                                concurrency=auto_pool(frac=0.25))


def _min_label_components(pairs_ds: rd.Dataset,
                          max_rounds: int = 64) -> pd.DataFrame:
    """Distributed connected components over an edge dataset via
    Hash-to-Min (Rastogi et al. 2012, "Finding Connected Components in
    Map-Reduce in Logarithmic Rounds" — public). Returns (node, label)
    for every node that appears in an edge; label = component min.

    State is a (node, member) multiset: C(v) starts as N(v) ∪ {v} —
    duplicate input edges are harmless (np.unique per group absorbs
    them), so callers may feed raw multi-band pairs without a distinct
    pass. Each round, per node, m = min(C(v)); emit (m, c) and (c, m)
    for all c ∈ C(v); new C(v) = union of received. The state reaches a
    fixpoint in O(log d) rounds; LSH near-dup components are
    near-cliques (diameter ≤ 2), so the loop finalizes after two rounds
    and only keeps iterating if the edge-consistency check — one cheap
    distributed pass asserting every edge's endpoints share a label —
    fails. Every round is ONE groupby shuffle over the LSH-bounded
    edge-adjacency rows; the driver holds nothing but the final label
    table."""

    def init_state(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        return pd.DataFrame({
            "node": np.concatenate([a, b, a, b]).astype("int64"),
            "member": np.concatenate([b, a, a, b]).astype("int64"),
        })

    def htm_round(g: pd.DataFrame) -> pd.DataFrame:
        C = np.unique(g["member"].to_numpy())
        m = C[0]
        return pd.DataFrame({
            "node": np.concatenate([np.full(len(C), m, dtype="int64"), C]),
            "member": np.concatenate([C, np.full(len(C), m, dtype="int64")]),
        }).drop_duplicates()

    def labels_of(st: rd.Dataset) -> pd.DataFrame:
        # st is materialized and O(candidate nodes) — the label table is
        # being pulled to the driver anyway (it IS the result), so a
        # local min-per-node over the state blocks replaces a whole
        # aggregate execution
        df = st.to_pandas()
        out = (df.groupby("node", sort=True)["member"].min()
               .reset_index().rename(columns={"member": "label"}))
        out["label"] = out["label"].astype("int64")
        return out

    def edges_consistent(lab: pd.DataFrame) -> bool:
        lab_ref = ray.put(dict(zip(lab["node"].astype(int),
                                   lab["label"].astype(int))))

        def mism(batch: pd.DataFrame) -> pd.DataFrame:
            lb = ray.get(lab_ref)
            n = sum(1 for a, b in zip(batch["a"], batch["b"])
                    if lb.get(int(a), int(a)) != lb.get(int(b), int(b)))
            return pd.DataFrame({"bad": [n]})

        got = pairs_ds.map_batches(mism, batch_format="pandas").to_pandas()
        return int(got["bad"].sum()) == 0

    # init chains LAZILY into round 1's shuffle — no extra barrier
    state = pairs_ds.map_batches(init_state, batch_format="pandas")
    rounds = 0
    lab = None
    while rounds < max_rounds:
        state = (state.groupby("node")
                 .map_groups(htm_round, batch_format="pandas")
                 .materialize())
        rounds += 1
        if rounds >= 2:
            lab = labels_of(state)
            if edges_consistent(lab):
                return lab
    return lab if lab is not None else labels_of(state)


def minhash_clusters(sf_dir: str, threshold: float = 0.8,
                     num_perms: int = 64, bands: int = 16) -> pd.DataFrame:
    """(doc_id, cluster_id): near-dup clusters; cluster_id = min doc_id of
    the component. Docs with no near-dup are their own cluster.

    Fully distributed: signatures + banding (map_batches), bucket pairs +
    distinct (groupby — never a driver set), exact-Jaccard verify
    (map_batches over the pair dataset; each actor point-reads and
    shingles only its own batches' doc ids), connected components
    (Hash-to-Min groupby rounds), final cluster assignment (broadcast
    label map over a map_batches pass). The only value the driver ever
    holds is the final label table — O(LSH candidates), not O(corpus)
    or O(pairs)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"], _docs_blocks(sf_dir))
    band_ds = ds.map_batches(MinHashStage, batch_format="pandas",
                             concurrency=auto_pool(frac=0.25),
                             fn_constructor_kwargs={"num_perms": num_perms,
                                                    "bands": bands})
    # no distinct-pair shuffle: components absorb multi-band duplicate
    # pairs, trading a ≤bands-x verify duplication (microseconds per
    # pair) for one fewer all-to-all barrier
    pairs_ds = _candidate_pairs_ds(band_ds).materialize()

    labels: dict[int, int] = {}
    if pairs_ds.count():
        verified = _verify_pairs_ds(pairs_ds, sf_dir,
                                    threshold).materialize()
        if verified.count():
            lab = _min_label_components(verified)
            labels = dict(zip(lab["node"].astype(int), lab["label"].astype(int)))

    lab_ref = ray.put(labels)

    def assign_cluster(batch: pd.DataFrame) -> pd.DataFrame:
        lab = ray.get(lab_ref)        # plasma-local after the first call
        ids = batch["doc_id"].astype("int64")
        cl = ids.map(lab).fillna(ids).astype("int64")
        return pd.DataFrame({"doc_id": ids, "cluster_id": cl})

    out = (_read_docs(sf_dir, ["doc_id"], _docs_blocks(sf_dir, 8192))
           .map_batches(assign_cluster, batch_format="pandas")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash

class SimHashStage:
    """64-bit simhash of word-level features, vectorized per BATCH:
    every token of the batch is crc-hashed in one table-driven pass
    (functions.hashing.crc32_many == zlib.crc32 bit for bit), spread by
    the 64-bit golden ratio, and the per-doc bit votes are segment sums
    (np.add.reduceat over the doc boundaries) — no per-token Python.
    Values are bit-identical to the per-doc zlib reference kernel,
    which the brute-force parity test and the SQL crc32 oracle pin."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # chunk internally so the (tokens x 64) sign matrix stays
        # cache-sized whatever Ray's block size is (same discipline as
        # the minhash kernel)
        return pd.concat([self._chunk(batch.iloc[i:i + 512])
                          for i in range(0, len(batch), 512)],
                         ignore_index=True)

    def _chunk(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashing import crc32_many

        toks = batch["text"].str.strip().str.split(_WS)
        lens = toks.str.len().to_numpy().astype(np.int64)
        flat = toks.explode()
        hs = (crc32_many(pa.array(flat.to_numpy(dtype=object),
                                  pa.string())).astype(np.uint64)
              * np.uint64(0x9E3779B97F4A7C15))           # spread to 64 bits
        signs = (2 * ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1)
                 .astype(np.int64) - 1)                  # tokens x 64
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        votes = np.add.reduceat(signs, starts, axis=0)   # docs x 64
        out = np.packbits(votes > 0, axis=1,
                          bitorder="little").view(np.uint64).ravel()
        return pd.DataFrame({"doc_id": batch["doc_id"].astype("int64")
                             .to_numpy(),
                             "simhash": out.view(np.int64)})


def simhash_signatures(sf_dir: str) -> pd.DataFrame:
    ds = _read_docs(sf_dir, ["doc_id", "text"], _docs_blocks(sf_dir))
    out = ds.map_batches(SimHashStage, batch_format="pandas",
                         concurrency=auto_pool()).to_pandas()
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


def simhash_sidecar_path(sf_dir: str) -> str:
    """Signatures sidecar dir for the Hamming-join oracle: the pair QUERY
    gets a value-exact DuckDB check (brute-force ``bit_count(xor)`` join
    over these signatures — full recall is guaranteed by the 4x16 band
    pigeonhole), while the crc signature kernel itself stays pinned by
    the brute-force parity test."""
    import hashlib
    import os

    norm = os.path.abspath(os.path.normpath(sf_dir))
    base = os.path.basename(norm)
    # key on the full path, not just the basename — two corpora at
    # different paths with the same leaf name must not clobber each
    # other's signatures (the oracle would silently join the wrong ones)
    tag = hashlib.md5(norm.encode()).hexdigest()[:8]
    return f"/tmp/graft_sidecar/simhash_sigs_{base}_{tag}"


def _simhash_pairs_ds(sf_dir: str, max_hamming: int = 3,
                      write_sidecar: bool = True) -> rd.Dataset:
    """Lazy (a, b, hamming) candidate-pair Dataset within
    ``max_hamming`` bits via 4x16-bit band blocking (Manku et al. 2007:
    a pair within 3 bits must agree on >= 1 band) — PRE-distinct (a
    pair colliding in several bands appears once per band; consumers
    either dedup with one groupby or absorb duplicates in components).

    Band explode (map_batches) -> bucket groupby -> per-bucket pair
    enumeration with CHUNKED block scans (no bucket-size cap — the
    documented recall guarantee holds even for hot buckets).
    ``write_sidecar`` persists the signatures (worker-side parquet) so
    the oracle can replay the join as a brute-force Hamming self-join."""

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

    def scan_bucket(ids: np.ndarray, h: np.ndarray,
                    out_a: list, out_b: list, out_d: list) -> None:
        order = np.argsort(ids)
        ids, h = ids[order], h[order]
        n = len(ids)
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

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one salt group: vectorized duplicate mark cuts to colliding
        # (band, key) buckets; only those run the Hamming scan
        dup = g[g.duplicated(["band", "key"], keep=False)]
        out_a: list = []
        out_b: list = []
        out_d: list = []
        for _, grp in dup.groupby(["band", "key"], sort=False):
            scan_bucket(grp["doc_id"].to_numpy(),
                        grp["simhash"].to_numpy().view(np.uint64),
                        out_a, out_b, out_d)
        if not out_a:
            return pd.DataFrame({"a": np.array([], dtype="int64"),
                                 "b": np.array([], dtype="int64"),
                                 "hamming": np.array([], dtype="int64")})
        return pd.DataFrame({
            "a": np.concatenate(out_a).astype("int64"),
            "b": np.concatenate(out_b).astype("int64"),
            "hamming": np.concatenate(out_d).astype("int64"),
        })

    from ..functions.pool import cluster_cpus

    P = max(16, 4 * int(cluster_cpus()))

    def salt(batch: pd.DataFrame) -> pd.DataFrame:
        # (band, key) buckets -> P salt groups: the bucket-keyed
        # groupby carried docs x bands nearly-singleton groups through
        # the all-to-all with one Python call each (the measured
        # many-groups-per-block constant); a bucket always lands whole
        # in one salt group, so the pair set is unchanged
        batch["bkt"] = ((batch["key"].to_numpy().astype(np.uint64)
                         * np.uint64(31)
                         + batch["band"].to_numpy().astype(np.uint64))
                        % np.uint64(P)).astype("int64")
        return batch

    sig_ds = (_read_docs(sf_dir, ["doc_id", "text"], _docs_blocks(sf_dir))
              .map_batches(SimHashStage, batch_format="pandas",
                           concurrency=auto_pool(frac=0.25)))
    if write_sidecar:
        import os
        import shutil

        side = simhash_sidecar_path(sf_dir)
        shutil.rmtree(side, ignore_errors=True)   # drop stale parts
        os.makedirs(side, exist_ok=True)
        sig_ds = sig_ds.materialize()
        sig_ds.write_parquet(side)
    return (sig_ds.map_batches(explode_bands, batch_format="pandas")
            .map_batches(salt, batch_format="pandas")
            .groupby("bkt")
            .map_groups(bucket_pairs, batch_format="pandas"))


def simhash_near_pairs(sf_dir: str, max_hamming: int = 3,
                       write_sidecar: bool = True) -> pd.DataFrame:
    """(a, b, hamming) pairs within ``max_hamming`` bits — the
    :func:`_simhash_pairs_ds` banded join plus ONE distinct-pair
    groupby; the driver receives only the final pairs."""

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[:1][["a", "b", "hamming"]]

    pairs = (_simhash_pairs_ds(sf_dir, max_hamming, write_sidecar)
             .groupby(["a", "b"])           # a pair may collide in >1 band
             .map_groups(dedup_pairs, batch_format="pandas")
             .to_pandas())
    if pairs.empty:
        return pd.DataFrame({"a": np.array([], dtype="int64"),
                             "b": np.array([], dtype="int64"),
                             "hamming": np.array([], dtype="int64")})
    return (pairs.astype({"a": "int64", "b": "int64", "hamming": "int64"})
            .sort_values(["a", "b"]).reset_index(drop=True))


def simhash_clusters(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """(doc_id, cluster_id): near-dup clusters over the simhash
    Hamming-ball pair graph; cluster_id = min doc_id of the component,
    singletons label themselves — the simhash twin of
    :func:`minhash_clusters`.

    Fully distributed: the banded pair Dataset feeds Hash-to-Min
    components DIRECTLY (no distinct shuffle — components absorb the
    per-band duplicate pairs), then one broadcast-label assignment pass
    over the doc_id column. The driver holds only the label table."""
    pairs_ds = _simhash_pairs_ds(sf_dir, max_hamming).materialize()

    labels: dict[int, int] = {}
    if pairs_ds.count():
        lab = _min_label_components(pairs_ds)
        labels = dict(zip(lab["node"].astype(int),
                          lab["label"].astype(int)))
    lab_ref = ray.put(labels)

    def assign_cluster(batch: pd.DataFrame) -> pd.DataFrame:
        lab = ray.get(lab_ref)
        ids = batch["doc_id"].astype("int64")
        cl = ids.map(lab).fillna(ids).astype("int64")
        return pd.DataFrame({"doc_id": ids, "cluster_id": cl})

    out = (_read_docs(sf_dir, ["doc_id"], _docs_blocks(sf_dir, 8192))
           .map_batches(assign_cluster, batch_format="pandas")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


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
    pair with J >= t must share one) -> candidate pairs -> distinct ->
    distributed exact-Jaccard verify over candidate docs only.

    The prefix rows shuffle as 64-bit shingle HASHES grouped by a SALT
    BUCKET (hash mod P), not by the shingle string: the string-keyed
    groupby carried one nearly-singleton group per distinct prefix
    shingle through the all-to-all and paid one Python map_groups call
    each (measured 105 s at sf0.1 before the rewrite — the same
    many-groups-per-block constant excised from the minhash banding).
    A hash collision can only ADD a candidate pair (two shingles
    merging can never hide a genuinely shared one), and every candidate
    is verified with exact string-shingle Jaccard afterwards — so full
    recall and the value-exact oracle are preserved; verification keeps
    shingles as strings (hashing there could alter set cardinality).
    Pair distinct runs inside P hash(a,b) salt groups with one
    vectorized drop_duplicates each (same-pair rows always land in the
    same group)."""
    import math

    from ..functions.hashing import crc32_many
    from ..functions.pool import cluster_cpus

    P = max(16, 4 * int(cluster_cpus()))

    def prefix_rows(batch: pd.DataFrame) -> pd.DataFrame:
        shs: list[str] = []
        ids: list[int] = []
        for d, t in zip(batch["doc_id"], batch["text"]):
            sh = sorted(_string_shingles(t, shingle_k))
            plen = len(sh) - math.ceil(threshold * len(sh)) + 1
            keep = sh[:max(1, plen)]
            shs.extend(keep)
            ids.extend([int(d)] * len(keep))
        arr = pa.array(shs, pa.string())
        h = (crc32_many(arr).astype(np.uint64) << np.uint64(32)) \
            | crc32_many(arr, reverse=True).astype(np.uint64)
        return pd.DataFrame({
            "h": h.view(np.int64),
            "doc_id": np.array(ids, dtype="int64"),
            "bkt": (h % np.uint64(P)).astype("int64"),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        dup = g[g.duplicated("h", keep=False)]
        out_a, out_b = [], []
        for _, grp in dup.groupby("h", sort=False):
            ids = np.sort(pd.unique(grp["doc_id"]))
            if len(ids) >= 2:
                ia, ib = np.triu_indices(len(ids), k=1)
                out_a.append(ids[ia])
                out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame({"a": np.array([], dtype="int64"),
                                 "b": np.array([], dtype="int64")})
        a = np.concatenate(out_a).astype("int64")
        b = np.concatenate(out_b).astype("int64")
        return pd.DataFrame({"a": a, "b": b})

    def pair_salt(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[["a", "b"]].copy()
        batch["pbkt"] = ((batch["a"].to_numpy().astype(np.uint64)
                          * np.uint64(2654435761)
                          + batch["b"].to_numpy().astype(np.uint64))
                         % np.uint64(P)).astype("int64")
        return batch

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    pairs_ds = (_read_docs(sf_dir, ["doc_id", "text"], _docs_blocks(sf_dir))
                .map_batches(prefix_rows, batch_format="pandas")
                .groupby("bkt")
                .map_groups(bucket_pairs, batch_format="pandas")
                .map_batches(pair_salt, batch_format="pandas")
                .groupby("pbkt")     # distinct pairs, no driver set
                .map_groups(bucket_distinct, batch_format="pandas")
                .materialize())
    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "jaccard": pd.Series(dtype="float64")})
    n_pairs = pairs_ds.count()
    if not n_pairs:
        return empty
    pairs_ds = pairs_ds.repartition(
        int(np.clip(n_pairs // 100_000 + 2, 2, 32))).materialize()
    out = _verify_pairs_ds(pairs_ds, sf_dir, threshold, shingle_k,
                           string_shingles=True).to_pandas()
    if out.empty:
        return empty
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# exact duplicate-substring spans (token n-gram granularity)

def _gram_weights(k: int, salt: int) -> np.ndarray:
    """``k`` odd 64-bit position multipliers from a SplitMix-style LCG —
    fixed per (k, salt), so every worker derives identical weights."""
    m64 = (1 << 64) - 1
    c = salt & m64
    out = np.empty(k, dtype=np.uint64)
    for j in range(k):
        c = (c * 6364136223846793005 + 1442695040888963407) & m64
        out[j] = c | 1
    return out


def duplicate_ngram_spans(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """(doc_id, span_start, span_end, n_dup_grams): maximal token spans
    covered by duplicated ``k``-grams — exact substring-level dedup at
    token-n-gram granularity (after Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", which uses suffix
    arrays; the n-gram census is the shuffle-friendly equivalent at a
    fixed minimum match length).

    A k-gram is *duplicated* iff it occurs >= 2 times corpus-wide
    (across docs or repeated within one). Per doc, overlapping or
    touching duplicated-gram occurrences (next start <= prev start + k)
    merge into one maximal span [span_start, span_end).

    Shape (round-4 rewrite of the round-3 string-gram census, which
    shuffled ~k x corpus string bytes AND paid one Python map_groups
    call per distinct gram):

    1. per-batch VECTORIZED 128-bit gram hashing — tokens hashed once
       with two polars xxhash seeds, gram hash = position-weighted
       modular sum of the k token hashes (two independent 64-bit
       functions; a false dup needs a simultaneous collision in both,
       ~2^-128 per pair — the Lee-et-al.-style hashed census);
    2. ONE groupby over a SALT BUCKET (hash mod P, P ~ blocks): each of
       the P groups dup-marks its grams with one vectorized pandas
       ``duplicated`` — the all-to-all carries 4 ints per gram and the
       per-group Python overhead is O(P), not O(distinct grams);
    3. survivors (only duplicated-gram occurrences) reshuffle once by
       doc bucket for a vectorized multi-doc island merge.

    Gram STRINGS never leave the batch that tokenized them; the SQL
    oracle stays string-keyed, so hash-exact driver equality also
    certifies the no-collision assumption at test scale."""
    nblocks = _docs_blocks(sf_dir)
    P = max(16, nblocks)
    w1 = _gram_weights(k, 0x243F6A8885A308D3)
    w2 = _gram_weights(k, 0x13198A2E03707344)

    def gram_rows(batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        tok_lists = [_WS.split(t.strip()) for t in batch["text"]]
        lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
        m = np.maximum(lens - k + 1, 0)
        total = int(m.sum())
        if total == 0:
            return pd.DataFrame({"g1": pd.Series(dtype="int64"),
                                 "g2": pd.Series(dtype="int64"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "pos": pd.Series(dtype="int64"),
                                 "bkt": pd.Series(dtype="int64")})
        flat = [w for toks in tok_lists for w in toks]
        s = pl.Series(flat)
        th1 = s.hash(seed=1).to_numpy().astype(np.uint64)
        th2 = s.hash(seed=2).to_numpy().astype(np.uint64)
        off = np.cumsum(lens) - lens
        doc_idx = np.repeat(np.arange(len(lens)), m)
        pos = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(m) - m, m)
        fstart = off[doc_idx] + pos
        g1 = np.zeros(total, dtype=np.uint64)
        g2 = np.zeros(total, dtype=np.uint64)
        for j in range(k):
            g1 += th1[fstart + j] * w1[j]
            g2 += th2[fstart + j] * w2[j]
        return pd.DataFrame({
            "g1": g1.view(np.int64),
            "g2": g2.view(np.int64),
            "doc_id": batch["doc_id"].to_numpy()[doc_idx].astype("int64"),
            "pos": pos,
            "bkt": (g1 % np.uint64(P)).astype("int64"),
        })

    def bucket_dups(g: pd.DataFrame) -> pd.DataFrame:
        occ = g.loc[g.duplicated(["g1", "g2"], keep=False),
                    ["doc_id", "pos"]]
        return occ.assign(dbkt=(occ["doc_id"] % P).astype("int64"))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "pos"])
        d = g["doc_id"].to_numpy()
        p = g["pos"].to_numpy()
        brk = np.ones(len(p), dtype=bool)
        if len(p) > 1:
            brk[1:] = (d[1:] != d[:-1]) | (np.diff(p) > k)
        idx = np.flatnonzero(brk)
        return pd.DataFrame({
            "doc_id": d[brk].astype("int64"),
            "span_start": p[brk].astype("int64"),
            "span_end": (np.maximum.reduceat(p, idx) + k).astype("int64"),
            "n_dup_grams": np.diff(np.append(idx, len(p))).astype("int64"),
        })

    out = (_read_docs(sf_dir, ["doc_id", "text"], nblocks)
           .map_batches(gram_rows, batch_format="pandas")
           .groupby("bkt")
           .map_groups(bucket_dups, batch_format="pandas")
           .groupby("dbkt")
           .map_groups(merge_bucket, batch_format="pandas")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "span_start": pd.Series(dtype="int64"),
                             "span_end": pd.Series(dtype="int64"),
                             "n_dup_grams": pd.Series(dtype="int64")})
    return (out[["doc_id", "span_start", "span_end", "n_dup_grams"]]
            .astype("int64")
            .sort_values(["doc_id", "span_start"]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup

@ray.remote
def _block_angular_stats(tbl: pa.Table) -> tuple:
    """(centroid unit vector | None, max angular radius) of one block;
    (None, -1.0) marks an empty block (Ray sort can emit them)."""
    if tbl.num_rows == 0:
        return None, -1.0
    V = np.stack(tbl.column("embedding").to_pylist())
    # a zero-norm input vector normalizes to NaN; it can never satisfy
    # the cosine threshold, but left in place it would poison the
    # centroid/radius (NaN radius would drop the WHOLE block from the
    # join) — bound the cap over the finite rows only
    finite = np.isfinite(V).all(axis=1)
    if not finite.all():
        V = V[finite]
        if not len(V):
            return None, -1.0      # only degenerate rows: no pairs possible
    c = V.mean(axis=0)
    n = np.linalg.norm(c)
    if n < 1e-12:
        return None, float(np.pi)      # degenerate: never prunable
    c = c / n
    ang = np.arccos(np.clip(V @ c, -1.0, 1.0))
    return c, float(ang.max())


@ray.remote
def _grid_prune_chunk(Cm: np.ndarray, Rv: np.ndarray, lo: int, hi: int,
                      max_ang: float) -> tuple:
    """Triangle-inequality pruning of block-pair grid rows [lo, hi):
    angle(cI, cJ) - rI - rJ > arccos(threshold) proves block pair
    (I, J) holds no qualifying vector pair. Returns the SURVIVING
    upper-triangle (bi, bj) pairs of this row chunk; Cm/Rv resolve
    plasma-local (broadcast once by the caller)."""
    D = np.arccos(np.clip(Cm[lo:hi] @ Cm.T, -1.0, 1.0))
    ok = (D - Rv[lo:hi, None] - Rv[None, :]) <= max_ang
    ii, jj = np.nonzero(ok)
    ii = ii + lo
    keep = jj >= ii
    return ii[keep].astype("int64"), jj[keep].astype("int64")


def _embedding_pairs_ds(sf_dir: str, threshold: float = 0.45,
                        n_clusters: int = 16, n_train: int = 2048,
                        seed: int = 13) -> rd.Dataset:
    """(a, b, cos) pair DATASET with cosine >= threshold — an EXACT
    cosine similarity self-join, computed as a pivot-partitioned
    block-pair matmul with angular triangle-inequality pruning:

    1. normalize per batch and assign each vector to its nearest pivot
       (spherical k-means over a bounded seeded sample — the ann.py IVF
       coarse quantizer); ONE sort shuffle by pivot makes blocks
       angularly tight; blocks stay in the object store (driver holds
       refs only);
    2. per-block (centroid, max angular radius) stats — tiny side tasks;
    3. prune the (i <= j) block-pair grid: for unit vectors angular
       distance is a metric, so a pair spanning blocks I, J satisfies
       angle(u,v) >= angle(cI,cJ) - rI - rJ; if that bound exceeds
       arccos(threshold), block pair (I, J) cannot contain a qualifying
       pair and is skipped — EXACTNESS IS PRESERVED (hyperplane-LSH
       bucketing cannot guarantee the hash-exact oracle's full recall,
       so it stays the approximate path in pipelines/ann.py);
    4. one task per surviving block pair: matmul, emit above-threshold
       (lo, hi) pairs.

    At 10^10 vectors the unpruned grid is 10^8 tasks; with pivot-sorted
    blocks the survivors are the near-diagonal O(B x partners) pairs.
    No full-matrix materialization anywhere (neither driver nor any one
    worker)."""

    # ---- pivots: spherical k-means on a bounded seeded sample ----
    train = (rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["embedding"])
             .limit(n_train).to_pandas())
    T = np.stack(train["embedding"].to_numpy()).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        # zero-norm rows normalize to NaN by design; the next line drops
        # them, so silence the (expected) divide warning
        Tn = T / np.linalg.norm(T, axis=1, keepdims=True)
    Tn = Tn[np.isfinite(Tn).all(axis=1)]   # zero-norm rows poison k-means
    if not len(Tn):
        # every sampled training vector degenerate: fall back to one
        # arbitrary pivot — partitioning quality degrades (single
        # cluster) but exactness never depended on the pivots
        C = np.zeros((1, T.shape[1]))
        C[0, 0] = 1.0
    else:
        rng = np.random.default_rng(seed)
        C = Tn[rng.choice(len(Tn), size=min(n_clusters, len(Tn)),
                          replace=False)]
        for _ in range(8):
            assign = np.argmax(Tn @ C.T, axis=1)
            for c in range(len(C)):
                m = assign == c
                if m.any():
                    v = Tn[m].sum(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        C[c] = v / n
    piv_ref = ray.put(C)

    class NormalizeAssign:
        def __init__(self):
            self.C = ray.get(piv_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["vec_id"].to_numpy().astype("int64")
            V = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                # zero-norm vectors become NaN rows: they can never
                # clear the cosine threshold, so they flow through the
                # block scans pairing with nothing (expected, silent)
                Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            cl = np.argmax(np.nan_to_num(Vn @ self.C.T, nan=-2.0),
                           axis=1).astype("int32")
            return pd.DataFrame({"vec_id": ids, "cluster": cl,
                                 "embedding": list(Vn)})

    from .ann import _emb_read

    mat = (_emb_read(sf_dir, rows_per_block=2048)
           .map_batches(NormalizeAssign, batch_format="pandas",
                        batch_size=2048, concurrency=auto_pool())
           .sort("cluster")
           .materialize())
    refs = mat.to_arrow_refs()            # driver keeps refs, not data

    # ---- per-block angular stats + grid pruning ----
    stats = ray.get([_block_angular_stats.remote(r) for r in refs])
    keep_blocks = [i for i, (_, r) in enumerate(stats) if r >= 0.0]
    refs = [refs[i] for i in keep_blocks]        # drop empty sort blocks
    stats = [stats[i] for i in keep_blocks]
    max_ang = float(np.arccos(np.clip(threshold, -1.0, 1.0)))

    # grid pruning, vectorized + task-parallel (was a driver-side
    # O(B^2)-interpreted Python loop — fine at tens of blocks, a
    # bottleneck at the 10^5-block regime): centroids/radii pack into a
    # (B, d) matrix broadcast ONCE; one Ray task per row-chunk computes
    # its arccos(C_chunk @ C.T) slice and returns only the surviving
    # upper-triangle (bi, bj) index pairs, so the driver holds the
    # pruned pair list and nothing quadratic. A degenerate block
    # (no centroid) carries radius pi, which makes the triangle bound
    # unconditionally pass — no special-casing; the i == j diagonal
    # passes unconditionally too (D=0 <= max_ang + 2r).
    B = len(refs)
    if B:
        dim = next((len(c) for c, _ in stats if c is not None), 1)
        cm_ref = ray.put(np.stack(
            [c if c is not None else np.zeros(dim) for c, _ in stats]))
        rv_ref = ray.put(np.array(
            [np.pi if c is None else r for c, r in stats]))
        chunk = 2048
        parts = ray.get([
            _grid_prune_chunk.remote(cm_ref, rv_ref, lo,
                                     min(lo + chunk, B), max_ang)
            for lo in range(0, B, chunk)])
        bi = np.concatenate([p[0] for p in parts])
        bj = np.concatenate([p[1] for p in parts])
    else:
        bi = bj = np.array([], dtype="int64")
    grid_tbl = pa.table({"bi": pa.array(bi, type=pa.int64()),
                         "bj": pa.array(bj, type=pa.int64())})

    class BlockPairCosine:
        """One call per surviving (i, j) block pair; blocks cached per
        actor."""

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
                if int(i) == int(j):
                    keep = a < b
                    lo, hi = a[keep], b[keep]
                else:
                    # cross-block roles are arbitrary (the cluster sort
                    # breaks vec_id ordering across blocks): normalize to
                    # (lo, hi) instead of filtering a < b, which would
                    # silently drop pairs whenever block J holds the
                    # smaller id (ADVICE r2)
                    keep = a != b
                    lo = np.minimum(a[keep], b[keep])
                    hi = np.maximum(a[keep], b[keep])
                out.append(pd.DataFrame({
                    "a": lo, "b": hi,
                    "cos": round_half_away(S[bi, bj][keep]),
                }))
            return (pd.concat(out, ignore_index=True) if out
                    else pd.DataFrame({"a": [], "b": [], "cos": []}))

    return rd.from_arrow(grid_tbl).map_batches(
        BlockPairCosine, batch_format="pandas", batch_size=4,
        concurrency=auto_pool(), fn_constructor_kwargs={"refs": refs})


def embedding_near_pairs(sf_dir: str, threshold: float = 0.45,
                         n_clusters: int = 16, n_train: int = 2048,
                         seed: int = 13) -> pd.DataFrame:
    """(a, b, cos) rows of :func:`_embedding_pairs_ds`, sorted — the
    exact cosine self-join surface (driver holds only the final pairs)."""
    out = _embedding_pairs_ds(sf_dir, threshold, n_clusters, n_train,
                              seed).to_pandas()
    out = out.astype({"a": "int64", "b": "int64"})
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def embedding_clusters(sf_dir: str, threshold: float = 0.45) -> pd.DataFrame:
    """(vec_id, cluster_id): connected components of the exact
    cosine >= ``threshold`` pair graph; cluster_id = component min.
    Vectors with no near-neighbor are their own cluster.

    Same fully-distributed composition as :func:`minhash_clusters`:
    the pair graph comes from the pruned block-pair matmul
    (:func:`_embedding_pairs_ds`, exact — so the clusters admit a
    recursive-CTE SQL oracle), components from the Hash-to-Min groupby
    rounds (:func:`_min_label_components`), and the final assignment is
    a broadcast label map over a streaming vec_id read. The driver only
    holds the O(near-dup nodes) label table."""
    pairs_ds = _embedding_pairs_ds(sf_dir, threshold).materialize()

    labels: dict[int, int] = {}
    if pairs_ds.count():
        lab = _min_label_components(pairs_ds)
        labels = dict(zip(lab["node"].astype(int), lab["label"].astype(int)))
    lab_ref = ray.put(labels)

    def assign_cluster(batch: pd.DataFrame) -> pd.DataFrame:
        lab = ray.get(lab_ref)
        ids = batch["vec_id"].astype("int64")
        cl = ids.map(lab).fillna(ids).astype("int64")
        return pd.DataFrame({"vec_id": ids, "cluster_id": cl})

    out = (rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id"])
           .map_batches(assign_cluster, batch_format="pandas")
           .to_pandas())
    return out.sort_values("vec_id").reset_index(drop=True)


def semantic_dedup(sf_dir: str, threshold: float = 0.45) -> pd.DataFrame:
    """(vec_id, keep): SemDedup-style semantic deduplication (Abbas et
    al. 2023, "SemDeDup: Data-efficient learning at web-scale through
    semantic deduplication"): within every connected component of the
    exact cosine >= ``threshold`` near-dup graph keep exactly ONE
    representative — the minimum vec_id (a deterministic stand-in for
    the paper's keep-one-per-cluster policy, chosen so an exact SQL
    oracle exists); singletons keep themselves.

    Pure composition over :func:`embedding_clusters` (pruned block-pair
    matmul pair graph + Hash-to-Min components, all distributed):
    keep = 1 iff vec_id equals its component min. The verdict table is
    the filter a curation pipeline semi-joins against the documents
    table — the :func:`paragraph_dedup` keep-column discipline at
    whole-document granularity."""
    cl = embedding_clusters(sf_dir, threshold)
    return pd.DataFrame({
        "vec_id": cl["vec_id"],
        "keep": (cl["vec_id"] == cl["cluster_id"]).astype("int64"),
    })


# ---------------------------------------------------------------------------
# Incremental (cross-corpus) dedup: Bloom-filter prefilter + exact confirm

_BLOOM_BITS = 1 << 20          # 1 Mbit = 128 KiB per partial / final
_BLOOM_K = 4


def _bloom_positions(fps: pd.Series) -> np.ndarray:
    """(n, _BLOOM_K) bit positions per fingerprint — double hashing
    (Kirsch & Mitzenmacher 2006, "Less hashing, same performance") over
    the two independent crc32 maps of functions.hashing."""
    from ..functions.hashing import crc32_many

    arr = pa.array(fps.astype(str).tolist(), pa.string())
    h1 = crc32_many(arr).astype(np.uint64)
    h2 = crc32_many(arr, reverse=True).astype(np.uint64)
    i = np.arange(_BLOOM_K, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None])
            % np.uint64(_BLOOM_BITS)).astype(np.int64)


def _bloom_set(pos: np.ndarray) -> np.ndarray:
    """Pack bit positions into a (bits/8,) uint8 bitmap."""
    bm = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    flat = pos.reshape(-1)
    np.bitwise_or.at(bm, flat >> 3,
                     np.left_shift(np.uint8(1), (flat & 7).astype(np.uint8)))
    return bm


def _bloom_test(bm: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Per-row membership: all K bits set."""
    bits = (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


@ray.remote
def _bloom_or(*parts: bytes) -> bytes:
    acc = np.frombuffer(parts[0], dtype=np.uint8).copy()
    for p in parts[1:]:
        acc |= np.frombuffer(p, dtype=np.uint8)
    return acc.tobytes()


def bloom_incremental(sf_dir: str, key_words: int = 3,
                      split_permille: int = 500) -> pd.DataFrame:
    """(doc_id, fp): incoming documents whose content fingerprint does
    NOT already occur in the existing corpus — the incremental-crawl
    dedup pass (new shard vs an already-ingested corpus), exact by
    construction.

    The corpus splits deterministically on crc32(str(doc_id)) % 1000
    (the sample_docs idiom): existing = residue < ``split_permille``,
    incoming = the rest. fp = md5 of the shared first-``key_words``-token
    dedup key (functions.textkeys — the same key exact_dedup groups on,
    so cross-split duplicates genuinely exist in the synthetic corpus).

    Scale shape — the big (existing) side never shuffles and never
    leaves its workers; only O(candidates) strings cross the wire:
    1. ONE streaming pass over existing fps builds a Bloom filter
       (per-batch partial bitmaps, fan-in-8 tree OR of 128 KiB blocks —
       at 10^10 docs & 1 Mbit that undersizes; m scales to ~10 bits/key
       and the same tree carries it);
    2. incoming fps probe the broadcast filter: bloom-NEGATIVE rows are
       definitely new (no false negatives) and short-circuit out;
    3. bloom-POSITIVE candidates (true dups + ~(1-e^-kn/m)^k false
       positives) broadcast as a set to ONE more streaming pass over
       existing, which emits just the fps that really occur there;
    4. new = bloom-negatives + unconfirmed candidates.
    The exact-confirm pass makes the result independent of the filter's
    false-positive rate — the Bloom filter only sizes step 3's
    broadcast."""
    from ..functions.hashing import crc32_many
    from ..functions.textkeys import dedup_key

    docs = _read_docs(sf_dir, ["doc_id", "text"], _docs_blocks(sf_dir))

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        keys = dedup_key(batch["text"], key_words)
        fp = [hashlib.md5(k.encode("utf-8")).hexdigest() for k in keys]
        b = crc32_many(pa.array(batch["doc_id"].astype(str).tolist(),
                                pa.string())) % np.uint32(1000)
        return pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                             "fp": fp,
                             "existing": b < split_permille})

    keyed_ds = docs.map_batches(keyed, batch_format="pandas").materialize()

    # ---- 1. Bloom build over the existing side (tree OR) ----
    def partial_bloom(batch: pd.DataFrame) -> pd.DataFrame:
        ex = batch.loc[batch["existing"], "fp"]
        if not len(ex):
            return pd.DataFrame({"bitmap": pd.Series(dtype=object)})
        return pd.DataFrame(
            {"bitmap": [_bloom_set(_bloom_positions(ex)).tobytes()]})

    parts = (keyed_ds.map_batches(partial_bloom, batch_format="pandas")
             .to_pandas()["bitmap"].tolist())
    refs = [ray.put(p) for p in parts]
    while len(refs) > 1:
        refs = [_bloom_or.remote(*refs[i:i + 8])
                for i in range(0, len(refs), 8)]
    bloom = (np.frombuffer(ray.get(refs[0]), dtype=np.uint8) if refs
             else np.zeros(_BLOOM_BITS // 8, dtype=np.uint8))
    bloom_ref = ray.put(bloom)

    # ---- 2. probe incoming ----
    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        inc = batch.loc[~batch["existing"], ["doc_id", "fp"]]
        if not len(inc):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "fp": pd.Series(dtype=object),
                                 "hit": pd.Series(dtype=bool)})
        bm = ray.get(bloom_ref)
        hit = _bloom_test(bm, _bloom_positions(inc["fp"]))
        return pd.DataFrame({"doc_id": inc["doc_id"].to_numpy(),
                             "fp": inc["fp"].to_numpy(),
                             "hit": hit})

    probed = (keyed_ds.map_batches(probe, batch_format="pandas")
              .to_pandas())

    # ---- 3. exact confirm of the bloom-positive candidates ----
    cand_fps = set(probed.loc[probed["hit"], "fp"])
    confirmed: set = set()
    if cand_fps:
        cand_ref = ray.put(cand_fps)

        def match_existing(batch: pd.DataFrame) -> pd.DataFrame:
            cs = ray.get(cand_ref)
            m = batch.loc[batch["existing"] & batch["fp"].isin(cs), "fp"]
            return pd.DataFrame({"fp": m.unique()})

        got = (keyed_ds.map_batches(match_existing, batch_format="pandas")
               .to_pandas())
        confirmed = set(got["fp"])

    # ---- 4. new = bloom-negative + unconfirmed positives ----
    new = probed[~probed["fp"].isin(confirmed)]
    out = pd.DataFrame({"doc_id": new["doc_id"].astype("int64"),
                        "fp": new["fp"]})
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Paragraph-level exact dedup (the MassiveText/Gopher discipline, Rae et
# al. 2021 — public: remove repeated passages ACROSS documents, not just
# whole-document duplicates; boilerplate headers/footers dominate real
# web corpora and whole-doc dedup never sees them)

def paragraph_dedup(sf_dir: str, para_tokens: int = 16) -> pd.DataFrame:
    """(doc_id, para_idx, keep): global first-occurrence verdict per
    paragraph — ``keep=1`` iff this is the corpus-wide FIRST occurrence
    (smallest (doc_id, para_idx)) of the paragraph's content.

    Paragraphs are non-overlapping ``para_tokens``-token windows (the
    synthetic corpus is a flat word stream; on real documents the same
    operator keys on blank-line splits — only ``explode_paras``
    changes). Content identity is the md5 of the space-joined window,
    matching DuckDB's ``md5()`` so the oracle is hash-exact.

    Scale shape: ONE hash shuffle. The explode emits slim
    (doc_id, para_idx, md5) rows — paragraph TEXT never enters the
    shuffle — grouped by a SALT BUCKET (md5-prefix mod P), not by the
    md5 itself: hash-keyed grouping would carry one nearly-singleton
    group per distinct paragraph with a Python call each (the measured
    many-groups-per-block constant). Each salt group marks every md5's
    lexicographic (doc_id, para_idx) minimum with ONE vectorized
    sort + duplicated pass; an md5 always lands whole in one salt
    group, so the verdict is unchanged. No broadcast table, no driver
    state; rows out = paragraphs in, so the verdict table streams
    straight to a sink at any scale. The md5 loop is a real
    per-paragraph kernel (same discipline as the fingerprint op),
    distributed across map tasks."""
    import hashlib

    from ..functions.pool import cluster_cpus

    P = max(16, 4 * int(cluster_cpus()))
    ds = _read_docs(sf_dir, ["doc_id", "text"], _docs_blocks(sf_dir))

    def explode_paras(batch: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        pidx: list[int] = []
        ph: list[str] = []
        for did, t in zip(batch["doc_id"].astype("int64"), batch["text"]):
            toks = _WS.split(t.strip())
            for i in range(0, len(toks), para_tokens):
                ids.append(did)
                pidx.append(i // para_tokens)
                ph.append(hashlib.md5(
                    " ".join(toks[i:i + para_tokens]).encode()).hexdigest())
        df = pd.DataFrame({"doc_id": np.array(ids, dtype="int64"),
                           "para_idx": np.array(pidx, dtype="int64"),
                           "ph": ph})
        df["bkt"] = (df["ph"].str[:8].apply(int, base=16)
                     % P).astype("int64")
        return df

    def mark_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ph", "doc_id", "para_idx"])
        keep = (~g.duplicated("ph", keep="first")).to_numpy()
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                             "para_idx": g["para_idx"].to_numpy(),
                             "keep": keep.astype("int64")})

    out = (ds.map_batches(explode_paras, batch_format="pandas")
           .groupby("bkt").map_groups(mark_first, batch_format="pandas")
           .to_pandas())
    return (out.astype({"doc_id": "int64", "para_idx": "int64",
                        "keep": "int64"})
            .sort_values(["doc_id", "para_idx"]).reset_index(drop=True))
