"""Graph analytics over the corpus link graph.

``pagerank`` runs the canonical iterative distributed PageRank (Page et
al. 1999, "The PageRank citation ranking") over the page->page link
edges of the synthetic crawl corpus — the graph the crawler itself
discovers. It is the engine's iterative-algorithm showcase: every
iteration is TWO reduce-side groupby shuffles (ranks co-shuffled with
edges on the source key -> per-edge contributions; contributions summed
on the destination key), ranks never broadcast and never resident on
the driver (only the dangling-mass SCALAR crosses per iteration).

Edge semantics (shared bit-for-bit with the SQL oracle):
- nodes = every corpus page (doc_id IS the page URL);
- edges = DISTINCT (src, dst) where src has a ``link`` span whose
  canonicalized (fragment-strip + resolve), same-host target dst exists
  in the corpus — exactly the crawl's child-extraction semantics
  (internal/pageparser.go:28-68), restricted to page kind;
- dst-membership and the distinct are ONE groupby(dst) with node-marker
  rows (a reduce-side semi-join — no corpus-wide membership broadcast).

Rank update (d = 0.85, fixed ``iters`` sweeps from r0 = 1/N):
    r'(v) = (1-d)/N + d * (sum_{(u,v)} r(u)/outdeg(u) + D/N),
    D = sum of dangling (outdeg 0) ranks.

``components`` finds the undirected connected components of the same
edge set via Hash-to-Min (Rastogi et al. 2012 — the string-keyed
sibling of pipelines/dedup._min_label_components): every round is ONE
groupby shuffle over the adjacency state, labels are component-min URL
strings, and singleton pages label themselves without ever entering the
shuffle. The known Hash-to-Min caveat applies and is deliberate: the
minimum node of a giant component eventually holds that component's
full member list in one group — fine for web-graph components whose
giant component fits one worker's heap as an id list; beyond that the
round structure stays the same with label propagation (exchange only
(node, min) pairs, O(diameter) rounds) as the drop-in state bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.compat import round_half_away
from ..functions.urlnorm import canonicalize_batch, host_of
from .crawl_queries import corpus_parquet

_DANG = ""          # sentinel groupby key for the dangling-mass scalar


def _edges_ds(corpus: str, membership: bool = True) -> rd.Dataset:
    """DISTINCT page->page edge Dataset: flatten -> canonicalize ->
    same-host filter -> node-membership filter.

    The distinct needs no shuffle: a src doc's spans live in exactly
    one corpus block, so (src, dst) duplicates can only be intra-batch
    and one per-batch ``drop_duplicates`` is globally distinct.

    - ``membership=True`` (default): the node set is ray.put once and
      each batch filters with a vectorized ``isin`` — ZERO shuffles.
      Right up to node sets that fit a node's plasma store (~10^8).
    - ``membership=False``: emit all same-host candidates unfiltered;
      the caller enforces membership — the 10^10-node path defers it to
      :class:`_ShardEncode`'s hash-partitioned index probe, where a
      missing dst encodes to -1 and is dropped, so membership costs no
      extra pass at all (it used to be a reduce-side groupby(dst)
      semi-join whose per-group all-to-all constant dominated;
      equality is pinned by TestGraphOps)."""

    def link_candidates(batch: pa.Table) -> pd.DataFrame:
        spans = batch.column("spans")
        spans = (spans.combine_chunks()
                 if isinstance(spans, pa.ChunkedArray) else spans)
        parent = pc.list_parent_indices(spans)
        flat = spans.flatten()
        src = batch.column("doc_id").take(parent).to_pandas()
        kind = flat.field("kind").to_pandas()
        refs = flat.field("media_ref").to_pandas()
        m = (kind == "link").to_numpy()
        src = src.to_numpy(dtype=object)[m]
        refs = refs.to_numpy(dtype=object)[m]
        canon, same = canonicalize_batch(refs, src)
        keep = same & np.array([u is not None for u in canon],
                               dtype=bool)
        # typed Arrow output (not object-dtype pandas): Ray's block size
        # estimator chokes on empty object columns, and string Arrow
        # columns are zero-copy into the sort shuffle
        return pa.table({
            "dst": pa.array(canon[keep].astype(str), pa.string()),
            "src": pa.array(src[keep].astype(str), pa.string()),
            "side": pa.array(np.full(int(keep.sum()), 1, dtype=np.int8)),
        })

    ds = rd.read_parquet(corpus)
    if membership:
        import pyarrow.parquet as _pq

        nodes_ref = ray.put(frozenset(
            _pq.read_table(corpus, columns=["doc_id"])
            .column("doc_id").to_pylist()))

        def candidates_filtered(batch: pa.Table) -> pd.DataFrame:
            # fused: candidate explode + membership + distinct in ONE
            # batch, so a doc's rows can never straddle a batch boundary
            # (the per-batch drop_duplicates stays globally distinct)
            nodes = ray.get(nodes_ref)  # plasma-local after first call
            df = link_candidates(batch).select(["src", "dst"]).to_pandas()
            return df[df["dst"].isin(nodes)].drop_duplicates()

        return ds.map_batches(candidates_filtered, batch_format="pyarrow")

    def candidates_distinct(batch: pa.Table) -> pd.DataFrame:
        return (link_candidates(batch).select(["src", "dst"])
                .to_pandas().drop_duplicates())

    return ds.map_batches(candidates_distinct, batch_format="pyarrow")


def _sorted_node_ids(corpus: str) -> list[str]:
    """Every corpus page URL, lexicographically sorted — so the integer
    index order IS the URL order and an integer MIN is a URL MIN."""
    import pyarrow.parquet as _pq

    ids = _pq.read_table(corpus, columns=["doc_id"]) \
        .column("doc_id").to_pylist()
    ids.sort()
    return ids


def _encode_edges(corpus: str, ids: list[str]) -> rd.Dataset:
    """(s, t) integer-encoded DISTINCT edge dataset against the sorted
    node index. The index rides the object store once (plasma-local per
    worker after the first batch); at 10^10 nodes the lookup becomes
    the hash-partitioned shard probe (``pagerank(sharded=True)``)."""
    idx_ref = ray.put({u: i for i, u in enumerate(ids)})

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(idx_ref)            # plasma-local after first call
        return pd.DataFrame({
            "s": batch["src"].map(m).to_numpy(dtype="int64"),
            "t": batch["dst"].map(m).to_numpy(dtype="int64"),
        })

    return (_edges_ds(corpus)
            .map_batches(encode, batch_format="pandas").materialize())


def _edge_block_refs(enc: rd.Dataset) -> list:
    """Non-empty encoded-edge blocks as plain object refs (zero-copy
    task inputs for the per-sweep block tasks)."""
    from ..pipelines.crawl import _arrow_block_and_count

    pairs = [_arrow_block_and_count.remote(r) for r in enc.to_arrow_refs()]
    counts = ray.get([p[1] for p in pairs])
    return [p[0] for p, c in zip(pairs, counts) if c]


@ray.remote
def _pr_contrib(enc: pa.Table, r_over_deg: np.ndarray) -> np.ndarray:
    """One edge block's dense contribution vector: for every (s, t) edge
    in the block, add r[s]/deg[s] into a dense accumulator. The block
    and rank-vector refs resolve plasma-local (zero-copy read) in the
    task; only the ~n_nodes float partial returns."""
    s = enc.column("s").to_numpy(zero_copy_only=False)
    t = enc.column("t").to_numpy(zero_copy_only=False)
    c = np.zeros(len(r_over_deg), dtype="float64")
    np.add.at(c, t, r_over_deg[s])
    return c


# --- sharded-state pagerank (the 10^10-node mode, behind a flag) ---

@ray.remote(num_cpus=0)
def _idx_block(tbl: pa.Table, offset: int) -> pa.Table:
    """Contiguous global ids for one globally-sorted id block."""
    return pa.table({
        "url": pc.cast(tbl.column("doc_id"), pa.string()),
        "idx": pa.array(offset + np.arange(tbl.num_rows), pa.int64()),
    })


@ray.remote
def _route_index(tbl: pa.Table, S: int) -> list:
    """One index block split into S hash shards (crc32(url) % S)."""
    from ..functions.hashing import crc32_many

    h = crc32_many(tbl.column("url")) % np.uint32(S)
    return [tbl.filter(pa.array(h == s)) for s in range(S)]


@ray.remote
def _build_shard(*pieces: pa.Table) -> tuple:
    """One hash shard of the node index: (sorted url array, idx array)
    — a binary-searchable probe table living in the object store."""
    t = pa.concat_tables(pieces)
    urls = np.asarray(t.column("url").to_pylist(), dtype=object)
    idx = t.column("idx").to_numpy(zero_copy_only=False)
    order = np.argsort(urls)
    return urls[order], idx[order].astype("int64")


class _ShardEncode:
    """Actor-pool edge encoder: probes the hash-partitioned node index
    (the PartitionedCorpusBackend idiom). Shards resolve plasma-local
    ONCE per actor in __init__ — never rebuilt per batch, never a
    driver-side dict. A URL absent from the index encodes to -1 and
    the row is dropped, so node-membership filtering is a FREE
    byproduct of the encode probe (no separate semi-join pass)."""

    def __init__(self, shard_refs: list, S: int):
        self._shards = ray.get(list(shard_refs))
        self._S = S

    def _lookup(self, urls: np.ndarray) -> np.ndarray:
        from ..functions.hashing import crc32_many

        h = crc32_many(pa.array(urls.astype(str), pa.string())) \
            % np.uint32(self._S)
        res = np.full(len(urls), -1, dtype="int64")
        for s in range(self._S):
            m = h == s
            if m.any():
                su, si = self._shards[s]
                pos = np.searchsorted(su, urls[m])
                inb = pos < len(su)
                found = inb.copy()
                found[inb] = su[pos[inb]] == urls[m][inb]
                out = np.full(int(m.sum()), -1, dtype="int64")
                out[found] = si[pos[found]]
                res[m] = out
        return res

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = self._lookup(batch["src"].to_numpy(dtype=object))
        t = self._lookup(batch["dst"].to_numpy(dtype=object))
        keep = (s >= 0) & (t >= 0)
        return pd.DataFrame({"s": s[keep], "t": t[keep]})


@ray.remote
def _grid_split(tbl: pa.Table, rsize: int, R: int) -> list:
    """One encoded edge block cut into the R x R (s-range, t-range)
    grid."""
    s = tbl.column("s").to_numpy(zero_copy_only=False)
    t = tbl.column("t").to_numpy(zero_copy_only=False)
    cell = (s // rsize) * R + (t // rsize)
    return [pa.table({"s": pa.array(s[cell == c], pa.int64()),
                      "t": pa.array(t[cell == c], pa.int64())})
            for c in range(R * R)]


@ray.remote(num_cpus=0)
def _concat_cells(*pieces: pa.Table) -> pa.Table:
    return pa.concat_tables(pieces)


@ray.remote
def _deg_shard(lo: int, size: int, *cells: pa.Table) -> np.ndarray:
    """Out-degree for one s-range from its grid row."""
    dg = np.zeros(size, dtype="int64")
    for c in cells:
        if c.num_rows:
            dg += np.bincount(c.column("s").to_numpy(zero_copy_only=False)
                              - lo, minlength=size)
    return dg


@ray.remote(num_cpus=0)
def _rank_init(size: int, N: float) -> np.ndarray:
    return np.full(size, 1.0 / N, dtype="float64")


@ray.remote(num_cpus=0)
def _rv_shard(rank: np.ndarray, deg: np.ndarray) -> np.ndarray:
    inv = np.zeros(len(deg), dtype="float64")
    nz = deg > 0
    inv[nz] = 1.0 / deg[nz]
    return rank * inv


@ray.remote(num_cpus=0)
def _dang_partial(rank: np.ndarray, deg: np.ndarray) -> float:
    return float(rank[deg == 0].sum())


@ray.remote
def _cell_contrib(cell: pa.Table, rv_i: np.ndarray, lo_i: int,
                  lo_j: int, size_j: int) -> np.ndarray:
    """Grid cell (i, j)'s dense contribution into t-range j, reading
    ONLY rank shard i."""
    c = np.zeros(size_j, dtype="float64")
    if cell.num_rows:
        s = cell.column("s").to_numpy(zero_copy_only=False)
        t = cell.column("t").to_numpy(zero_copy_only=False)
        np.add.at(c, t - lo_j, rv_i[s - lo_i])
    return c


@ray.remote(num_cpus=0)
def _rank_update(d: float, N: float, D: float,
                 *parts: np.ndarray) -> np.ndarray:
    return (1.0 - d) / N + d * (np.sum(parts, axis=0) + D / N)


def _sharded_graph(corpus: str, S: int, R: int) -> tuple:
    """Shared sharded-graph preamble for the 10^10-node modes
    (``pagerank(sharded=True)`` / ``components(sharded=True)``):

    - node index: distributed sort of doc_id -> contiguous global ids
      per block (driver holds O(blocks) counts only) ->
      crc32-hash-partitioned probe shards in the object store;
    - edges: per-batch-distinct candidates (no membership pass) encoded
      by the :class:`_ShardEncode` actor pool — a URL missing from the
      index probes to -1 and drops there, so membership is free;
    - layout: encoded edges grid-partitioned ONCE into R x R
      (s-range, t-range) cells living in the object store.

    Returns (idx_blocks, n_nodes, lo, sizes, cells); everything but the
    scalars is object refs."""
    ids_ds = (rd.read_parquet(corpus, columns=["doc_id"])
              .sort("doc_id").materialize())
    from ..pipelines.crawl import _arrow_block_and_count

    blk = [_arrow_block_and_count.remote(r) for r in ids_ds.to_arrow_refs()]
    counts = ray.get([b[1] for b in blk])
    offsets = np.cumsum([0] + counts[:-1])
    n_nodes = int(sum(counts))
    idx_blocks = [_idx_block.remote(b[0], int(o))
                  for b, c, o in zip(blk, counts, offsets) if c]

    routed = [_route_index.options(num_returns=S).remote(ib, S)
              for ib in idx_blocks]
    if S == 1:      # num_returns=1 unwraps the list
        routed = [[r] for r in routed]
    shard_refs = [_build_shard.remote(*[r[s] for r in routed])
                  for s in range(S)]

    from ..functions.pool import auto_pool

    enc = (_edges_ds(corpus, membership=False)
           .map_batches(_ShardEncode,
                        fn_constructor_args=(shard_refs, S),
                        batch_format="pandas",
                        concurrency=auto_pool(0.5))
           .materialize())

    rsize = -(-n_nodes // R)
    lo = [min(i * rsize, n_nodes) for i in range(R + 1)]
    sizes = [lo[i + 1] - lo[i] for i in range(R)]

    eb = [_arrow_block_and_count.remote(r) for r in enc.to_arrow_refs()]
    ecounts = ray.get([b[1] for b in eb])
    grids = [_grid_split.options(num_returns=R * R).remote(b[0], rsize, R)
             for b, c in zip(eb, ecounts) if c]
    if R == 1:
        grids = [[g] for g in grids]
    cells = [_concat_cells.remote(*[g[c] for g in grids])
             if grids else _concat_cells.remote(pa.table(
                 {"s": pa.array([], pa.int64()),
                  "t": pa.array([], pa.int64())}))
             for c in range(R * R)]
    return idx_blocks, n_nodes, lo, sizes, cells


def _pagerank_sharded(corpus: str, d: float, iters: int,
                      n_shards: int = 8, n_ranges: int = 4) -> pd.DataFrame:
    """PageRank with NO node-keyed state on the driver (the 10^10-node
    mode; ``pagerank(sharded=True)``):

    - node index: distributed sort of doc_id -> contiguous ids per
      block (driver holds O(blocks) counts) -> crc32-hash-partitioned
      probe shards in the object store; edges encode in an actor pool
      that binary-searches the shards (:class:`_ShardEncode`);
    - edge derivation: per-batch candidates with NO membership pass at
      all (``_edges_ds(membership=False)``) — a dst outside the corpus
      encodes to -1 in the shard probe and is dropped there, so
      membership rides the encode for free (no corpus-wide broadcast,
      no semi-join shuffle);
    - iteration state: deg / rank / rank-over-deg live as R
      range-shards in the object store; edges are grid-partitioned
      into R x R (s-range, t-range) cells once; each sweep runs one
      task per non-empty cell reading exactly one rank shard and
      emitting one t-range partial; per-range update tasks fold the
      partials. The driver touches refs and the dangling-mass scalars
      only.

    The dense mode remains the default below ~10^8 nodes: same
    arithmetic, fewer moving parts (equality pinned by
    TestShardedPagerank at the rounded 6-place contract)."""
    idx_blocks, n_nodes, lo, sizes, cells = _sharded_graph(
        corpus, n_shards, n_ranges)
    N = float(n_nodes)
    R = n_ranges

    deg = [_deg_shard.remote(lo[i], sizes[i],
                             *[cells[i * R + j] for j in range(R)])
           for i in range(R)]
    rank = [_rank_init.remote(sizes[i], N) for i in range(R)]

    for _ in range(iters):
        D = float(sum(ray.get(
            [_dang_partial.remote(rank[i], deg[i]) for i in range(R)])))
        rv = [_rv_shard.remote(rank[i], deg[i]) for i in range(R)]
        parts = [[_cell_contrib.remote(cells[i * R + j], rv[i],
                                       lo[i], lo[j], sizes[j])
                  for i in range(R)] for j in range(R)]
        rank = [_rank_update.remote(d, N, D, *parts[j]) for j in range(R)]

    urls = np.concatenate([
        np.asarray(t.column("url").to_pylist(), dtype=object)
        for t in ray.get(idx_blocks)])
    r = np.concatenate(ray.get(rank))
    # the query CONTRACT returns a driver-side DataFrame — this final
    # O(N) gather is the result itself, not iteration state
    return pd.DataFrame({"node": urls, "rank": round_half_away(r, 6)})


def pagerank(sf_dir: str, d: float = 0.85, iters: int = 5,
             sharded: bool = False) -> pd.DataFrame:
    """(node, rank): PageRank of every corpus page after ``iters``
    synchronous sweeps; rank rounded half-away to 6 places (values sit
    near 1/N — 4 places would quantize them together).

    Shape: the classic BLOCK-PARTITIONED MATVEC (how distributed
    PageRank is actually run — Page et al. 1999; Malewicz et al. 2010
    Pregel both describe the per-partition accumulate):

    1. the (src, dst) edge set comes from the zero-shuffle broadcast
       derivation (:func:`_edges_ds`, computed ONCE) and is
       integer-encoded against a broadcast node index; encoded edge
       blocks live in the object store;
    2. each sweep launches one task per edge block: a vectorized
       ``np.add.at`` dense accumulate of r[s]/deg[s] into an n_nodes
       float vector — NO per-iteration shuffle at all (the previous
       two-groupby-per-sweep formulation paid Ray's all-to-all
       aggregate constant twice per sweep: measured 84 s at sf0.01 vs
       ~4 s for this formulation);
    3. the driver (tree-reduce root) sums the ~blocks partials
       (n_nodes x 8 B each), folds the dangling mass scalar, and
       re-broadcasts the new rank vector via ``ray.put``.

    At 10^10 nodes the dense accumulator no longer fits one task and
    the node index no longer fits the driver: ``sharded=True`` switches
    to :func:`_pagerank_sharded` — hash-partitioned index probe shards,
    range-sharded deg/rank state in the object store, and an R x R
    grid of per-cell contribution tasks — with no node-keyed driver
    state at all (equality pinned at the rounded 6-place contract by
    TestShardedPagerank)."""
    corpus = corpus_parquet(sf_dir)
    if sharded:
        return _pagerank_sharded(corpus, d, iters)
    ids = _sorted_node_ids(corpus)
    n_nodes = len(ids)
    N = float(n_nodes)
    enc = _encode_edges(corpus, ids)

    # per-block dense outdegree partials -> driver sum (the same
    # fixed-size mergeable-sketch reduce as revenue_percentiles)
    def deg_partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = np.bincount(batch["s"].to_numpy(), minlength=n_nodes)
        return pd.DataFrame({"h": [h.astype("int64")]})

    deg = np.zeros(n_nodes, dtype="int64")
    for hb in (enc.map_batches(deg_partial, batch_format="pandas")
               .iter_batches(batch_format="pandas")):
        for arr in hb["h"]:
            deg += np.asarray(arr, dtype="int64")

    erefs = _edge_block_refs(enc)

    dangling = deg == 0
    inv = np.zeros(n_nodes, dtype="float64")
    nz = deg > 0
    inv[nz] = 1.0 / deg[nz]
    r = np.full(n_nodes, 1.0 / N, dtype="float64")
    for _ in range(iters):
        rv_ref = ray.put(r * inv)
        parts = ray.get([_pr_contrib.remote(e, rv_ref) for e in erefs])
        s = np.sum(parts, axis=0) if parts else np.zeros(n_nodes)
        D = float(r[dangling].sum())
        r = (1.0 - d) / N + d * (s + D / N)

    out = pd.DataFrame({"node": np.array(ids, dtype=object),
                        "rank": round_half_away(r, 6)})
    return out.sort_values("node").reset_index(drop=True)


def _edge_ctes_sql(corpus_path: str) -> str:
    """The link-graph edge derivation as a WITH-clause body (no WITH
    keyword) — the SQL twin of :func:`_edges_ds`, shared by the
    pagerank and components oracles. The canon chain mirrors
    pipelines/crawl_oracle.py's URL canonicalization."""
    return f"""flat AS (
  SELECT doc_id, u.media_ref AS media_ref
  FROM read_parquet('{corpus_path}'), UNNEST(spans) AS t(u)
  WHERE u.kind = 'link'
),
canon0 AS (
  SELECT doc_id AS src,
    regexp_replace(doc_id, '/[^/]*$', '') AS dir,
    regexp_extract(doc_id, '^(https?://[^/]+)', 1) AS origin,
    split_part(media_ref, '#', 1) AS ref
  FROM flat
),
canon1 AS (
  SELECT src,
    CASE WHEN ref LIKE 'http://%' OR ref LIKE 'https://%' THEN ref
         WHEN ref LIKE '/%' THEN origin || ref
         ELSE dir || '/' || ref END AS joined
  FROM canon0
),
canon2 AS (
  SELECT src,
    regexp_replace(regexp_replace(regexp_replace(
      joined, '/[^/]+/\\.\\./', '/'), '/[^/]+/\\.\\./', '/'),
      '/[^/]+/\\.\\./', '/') AS url
  FROM canon1
),
cand AS (
  SELECT src, url AS dst FROM canon2
  WHERE regexp_extract(url, '^https?://([^/]+)', 1)
        = regexp_extract(src, '^https?://([^/]+)', 1)
),
nodes AS (SELECT doc_id AS node FROM read_parquet('{corpus_path}')),
edges AS (SELECT DISTINCT c.src, c.dst
          FROM cand c JOIN nodes n ON n.node = c.dst)"""


@ray.remote
def _cc_partial(enc: pa.Table, lab: np.ndarray) -> np.ndarray:
    """One edge block's min-label sweep: for every (s, t) edge fold
    min(lab[s], lab[t]) into both endpoints of a dense label copy. Block
    and label refs resolve plasma-local; only the n_nodes int64 partial
    returns."""
    s = enc.column("s").to_numpy(zero_copy_only=False)
    t = enc.column("t").to_numpy(zero_copy_only=False)
    e = np.minimum(lab[s], lab[t])
    acc = lab.copy()
    np.minimum.at(acc, s, e)
    np.minimum.at(acc, t, e)
    return acc


@ray.remote(num_cpus=0)
def _lab_init(lo: int, size: int) -> np.ndarray:
    return lo + np.arange(size, dtype="int64")


@ray.remote(num_returns=2)
def _cc_cell(cell: pa.Table, Li: np.ndarray, Lj: np.ndarray,
             lo_i: int, lo_j: int) -> tuple:
    """Grid cell (i, j)'s min-label proposals into BOTH of its ranges:
    for every (s, t) edge fold min(L[s], L[t]) into copies of label
    shards i and j. Cell and shard refs resolve plasma-local; the two
    range-sized proposals return as separate refs so each range's
    update task fetches only its own."""
    pi, pj = Li.copy(), Lj.copy()
    if cell.num_rows:
        s = cell.column("s").to_numpy(zero_copy_only=False) - lo_i
        t = cell.column("t").to_numpy(zero_copy_only=False) - lo_j
        e = np.minimum(Li[s], Lj[t])
        np.minimum.at(pi, s, e)
        np.minimum.at(pj, t, e)
    return pi, pj


@ray.remote(num_returns=2)
def _lab_update(old: np.ndarray, lo: int, *parts: np.ndarray) -> tuple:
    """Fold one range's proposals, then SHARD-LOCAL pointer jumping
    (labels pointing inside this range compress to their target's
    label; cross-range pointers resolve over subsequent rounds — the
    edge-consistency fixpoint, not the jumping, is what convergence is
    declared on). Returns (new labels, changed?) as separate refs so
    the driver fetches only the booleans."""
    L = old
    for p in parts:
        L = np.minimum(L, p)
    size = len(L)
    while True:
        local = (L >= lo) & (L < lo + size)
        L2 = L.copy()
        L2[local] = L[L[local] - lo]
        if np.array_equal(L2, L):
            break
        L = L2
    return L, bool(not np.array_equal(L, old))


def _components_sharded(corpus: str, max_rounds: int = 64,
                        n_shards: int = 8, n_ranges: int = 4) -> pd.DataFrame:
    """Connected components with NO node-keyed state on the driver (the
    10^10-node mode; ``components(sharded=True)``): the
    :func:`_sharded_graph` index/edge/grid layout, labels as R range
    shards in the object store, one :func:`_cc_cell` task per grid cell
    per round and one :func:`_lab_update` fold per range. The driver
    touches refs and R booleans per round. Min-label propagation
    converges in <= diameter rounds (each round moves labels one hop in
    both edge directions); shard-local pointer jumping accelerates it.
    At an edge-consistent fixpoint every edge's endpoints share a label
    and each component's common label is its minimum node id, so the
    result equals the dense mode exactly (pinned by TestComponents)."""
    idx_blocks, n_nodes, lo, sizes, cells = _sharded_graph(
        corpus, n_shards, n_ranges)
    R = n_ranges
    lab = [_lab_init.remote(lo[i], sizes[i]) for i in range(R)]
    for _ in range(max_rounds):
        props = [[_cc_cell.remote(cells[i * R + j], lab[i], lab[j],
                                  lo[i], lo[j])
                  for j in range(R)] for i in range(R)]
        new_lab, changed = [], []
        for k in range(R):
            parts = ([props[k][j][0] for j in range(R)]
                     + [props[i][k][1] for i in range(R)])
            nl, ch = _lab_update.remote(lab[k], lo[k], *parts)
            new_lab.append(nl)
            changed.append(ch)
        lab = new_lab
        if not any(ray.get(changed)):
            break
    else:
        raise RuntimeError(f"components: no fixpoint after {max_rounds} "
                           "rounds")
    urls = np.concatenate([
        np.asarray(t.column("url").to_pylist(), dtype=object)
        for t in ray.get(idx_blocks)])
    # the query CONTRACT returns a driver-side DataFrame — this final
    # O(N) gather is the result itself, not iteration state
    L = np.concatenate(ray.get(lab))
    return pd.DataFrame({"node": urls, "component": urls[L]})


def components(sf_dir: str, max_rounds: int = 64,
               algorithm: str = "dense", sharded: bool = False) -> pd.DataFrame:
    """(node, component): undirected connected components of the corpus
    link graph; component = lexicographic min URL in the component.

    ``algorithm="dense"`` (default) is the round-4 rewrite after the
    measured many-groups-per-block all-to-all pathology (BASELINE.md):
    the same block-partitioned dense treatment as pagerank's matvec.
    Nodes are integer-encoded against the SORTED node index (integer
    min == URL min); each round launches one task per encoded edge
    block doing a vectorized ``np.minimum.at`` min-label sweep
    (:func:`_cc_partial`) — NO per-round shuffle and no adjacency state
    anywhere; the driver folds the ~blocks dense partials, applies full
    pointer-jumping compression (L <- L[L] to fixpoint, driver-cheap on
    the dense vector), and re-broadcasts. Convergence = a round that
    changes nothing; min-label + compression converges in O(log
    diameter) rounds. At 10^10 nodes the dense vector no longer fits
    one task and the node index no longer fits the driver:
    ``sharded=True`` switches to :func:`_components_sharded` — the same
    hash-partitioned index probe, R x R edge grid, and range-sharded
    label state as ``pagerank(sharded=True)``, with no node-keyed
    driver state at all (equality pinned by TestComponents).

    ``algorithm="htm"`` keeps the round-3 Hash-to-Min formulation
    (Rastogi et al. 2012) as the shuffle-based equivalence path — one
    groupby("node") per round over adjacency state — pinned equal to
    the dense path by tests (TestComponents)."""
    corpus = corpus_parquet(sf_dir)
    if sharded:
        return _components_sharded(corpus, max_rounds)
    if algorithm == "htm":
        return _components_htm(corpus, max_rounds)
    ids = _sorted_node_ids(corpus)
    ids_arr = np.array(ids, dtype=object)
    erefs = _edge_block_refs(_encode_edges(corpus, ids))
    L = np.arange(len(ids), dtype="int64")
    for _ in range(max_rounds):
        if not erefs:
            break
        lab_ref = ray.put(L)
        parts = ray.get([_cc_partial.remote(e, lab_ref) for e in erefs])
        Lnew = L
        for p in parts:
            Lnew = np.minimum(Lnew, p)
        while True:                     # full path compression
            L2 = Lnew[Lnew]
            if np.array_equal(L2, Lnew):
                break
            Lnew = L2
        if np.array_equal(Lnew, L):
            break
        L = Lnew
    else:
        raise RuntimeError(f"components: no fixpoint after {max_rounds} "
                           "rounds")
    return pd.DataFrame({"node": ids_arr, "component": ids_arr[L]})


_HTM_MAX_EDGES = 2_000_000


def _components_htm(corpus: str, max_rounds: int = 64) -> pd.DataFrame:
    """Hash-to-Min components — TEST-SCALE equivalence witness ONLY.

    Kept as the shuffle-based formulation that pins the dense and
    sharded rewrites by equality, NOT as a production path: each
    convergence check collects the full state to the driver
    (``labels_of``'s ``to_pandas``) and broadcasts a node→label Python
    dict, both O(nodes) on the driver. Inputs are therefore capped at
    ``_HTM_MAX_EDGES`` edges with a clear error — at larger scale use
    the default dense mode (<~10^8 nodes) or ``sharded=True`` (10^10
    mode), which hold no node-keyed driver state.

    Algorithm (string-keyed sibling of
    pipelines/dedup._min_label_components): the adjacency state starts
    as C(v) = N(v) ∪ {v} from the edge dataset; each Hash-to-Min round
    is ONE groupby("node") shuffle (per node emit (min, c) and (c, min)
    for all members); convergence is declared by a distributed
    edge-consistency pass, not a driver diff. Pages with no edges never
    enter the shuffle — the final pass assigns them their own URL via
    the broadcast label map over a streaming doc_id read, so the state
    carries only edge-touched nodes (the near-dup-cluster discipline)."""
    edges = _edges_ds(corpus).materialize()
    n_edges = edges.count()
    if n_edges > _HTM_MAX_EDGES:
        raise ValueError(
            f"algorithm='htm' is the test-scale equivalence witness "
            f"(O(nodes) driver state) and is capped at {_HTM_MAX_EDGES} "
            f"edges; got {n_edges}. Use the default dense mode or "
            f"sharded=True for large graphs.")

    def init_state(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["src"].to_numpy(dtype=object)
        b = batch["dst"].to_numpy(dtype=object)
        return pd.DataFrame({
            "node": np.concatenate([a, b, a, b]),
            "member": np.concatenate([b, a, a, b]),
        })

    def htm_round(g: pd.DataFrame) -> pd.DataFrame:
        C = np.unique(g["member"].to_numpy(dtype=object))
        m = C[0]
        return pd.DataFrame({
            "node": np.concatenate([np.full(len(C), m, dtype=object), C]),
            "member": np.concatenate([C, np.full(len(C), m, dtype=object)]),
        }).drop_duplicates()

    def labels_of(st: rd.Dataset) -> pd.DataFrame:
        df = st.to_pandas()
        return (df.groupby("node", sort=True)["member"].min()
                .reset_index().rename(columns={"member": "label"}))

    def edges_consistent(lab: pd.DataFrame) -> bool:
        lab_ref = ray.put(dict(zip(lab["node"], lab["label"])))

        def mism(batch: pd.DataFrame) -> pd.DataFrame:
            lb = ray.get(lab_ref)
            n = sum(1 for a, b in zip(batch["src"], batch["dst"])
                    if lb.get(a, a) != lb.get(b, b))
            return pd.DataFrame({"bad": [n]})

        got = edges.map_batches(mism, batch_format="pandas").to_pandas()
        return int(got["bad"].sum()) == 0

    state = edges.map_batches(init_state, batch_format="pandas")
    lab = pd.DataFrame({"node": pd.Series(dtype="object"),
                        "label": pd.Series(dtype="object")})
    if n_edges:
        for rnd in range(max_rounds):
            state = (state.groupby("node")
                     .map_groups(htm_round, batch_format="pandas")
                     .materialize())
            # web-graph diameters make O(log d) rounds ~5-7; check
            # convergence from round 2 on (round 1 never suffices for
            # any component with diameter > 2)
            if rnd >= 1:
                lab = labels_of(state)
                if edges_consistent(lab):
                    break
        else:
            raise RuntimeError("components: no fixpoint "
                               f"after {max_rounds} rounds")

    lab_ref = ray.put(dict(zip(lab["node"], lab["label"])))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        lb = ray.get(lab_ref)
        urls = batch["doc_id"].astype(str)
        return pd.DataFrame({"node": urls,
                             "component": urls.map(lambda u: lb.get(u, u))})

    out = (rd.read_parquet(corpus, columns=["doc_id"])
           .map_batches(assign, batch_format="pandas")
           .to_pandas())
    return out.sort_values("node").reset_index(drop=True)


def components_sql(corpus_path: str) -> str:
    """DuckDB oracle: recursive-CTE reachability over the same edge
    derivation; component = MIN(reachable node) per node."""
    return f"""
WITH RECURSIVE {_edge_ctes_sql(corpus_path)},
und AS (SELECT src AS u, dst AS v FROM edges
        UNION SELECT dst AS u, src AS v FROM edges),
reach(u, v) AS (SELECT node, node FROM nodes
                UNION SELECT r.u, e.v FROM reach r JOIN und e ON e.u = r.v)
SELECT u AS node, MIN(v) AS component FROM reach GROUP BY u ORDER BY node"""


def pagerank_sql(corpus_path: str, d: float = 0.85, iters: int = 5) -> str:
    """DuckDB oracle: the same edge derivation (canon chain shared with
    pipelines/crawl_oracle.py) and ``iters`` UNROLLED rank sweeps —
    recursive CTEs restrict aggregation in the recursive term, so each
    sweep is its own CTE. Arithmetic mirrors the engine expression for
    expression ((1-d)/N + d*(s + D/N), contributions r/outdeg) so the
    result is value-exact at 6 places."""
    prev = "pr0"
    sweeps = []
    for i in range(1, iters + 1):
        sweeps.append(f"""
pr{i} AS (
  SELECT n.node, n.outdeg,
    (1.0 - {d}) / nn.N + {d} * (COALESCE(c.s, 0.0) + dg.D / nn.N) AS r
  FROM {prev} n
  LEFT JOIN (SELECT e.dst AS node, SUM(p.r / p.outdeg) AS s
             FROM edges e JOIN {prev} p ON p.node = e.src
             GROUP BY e.dst) c ON c.node = n.node
  CROSS JOIN (SELECT COALESCE(SUM(r) FILTER (WHERE outdeg = 0), 0.0)
              AS D FROM {prev}) dg
  CROSS JOIN nn
)""")
        prev = f"pr{i}"
    return f"""
WITH {_edge_ctes_sql(corpus_path)},
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS N FROM nodes),
pr0 AS (
  SELECT n.node, COALESCE(dg.outdeg, 0) AS outdeg, 1.0 / nn.N AS r
  FROM nodes n LEFT JOIN deg dg ON dg.node = n.node CROSS JOIN nn
),{",".join(sweeps)}
SELECT node, ROUND(r, 6) AS rank FROM {prev} ORDER BY node"""


# ---------------------------------------------------------------------------
# Host-level link statistics (the crawl-planning aggregate: per-host
# page counts and internal-link density drive politeness budgets and
# shard sizing on a real crawl)

_HOST_RE = r"^https?://([^/]+)"


def host_stats(sf_dir: str) -> pd.DataFrame:
    """(host, n_pages, n_edges, avg_outdeg): per-host page count,
    same-host link-edge count (the pagerank/components edge set), and
    mean out-degree (ROUND half-away, 4).

    Scale shape: per-batch partial (host, pages, edges) counts from
    BOTH inputs (corpus pages and derived edges — src is always a
    corpus page and edges are same-host, so every host appears on the
    page side), then ONE groupby(host) sum. The shuffle carries
    O(hosts x blocks) partial rows, never pages or edges."""
    corpus = corpus_parquet(sf_dir)

    def page_partial(batch: pa.Table) -> pd.DataFrame:
        h = (batch.column("doc_id").to_pandas().astype(str)
             .str.extract(_HOST_RE, expand=False))
        vc = h.value_counts()
        return pd.DataFrame({"host": vc.index.to_numpy(dtype=object),
                             "pages": vc.to_numpy(dtype="int64"),
                             "edges": np.int64(0)})

    def edge_partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["src"].astype(str).str.extract(_HOST_RE, expand=False)
        vc = h.value_counts()
        return pd.DataFrame({"host": vc.index.to_numpy(dtype=object),
                             "pages": np.int64(0),
                             "edges": vc.to_numpy(dtype="int64")})

    out = (rd.read_parquet(corpus, columns=["doc_id"])
           .map_batches(page_partial, batch_format="pyarrow")
           .union(_edges_ds(corpus).map_batches(edge_partial,
                                                batch_format="pandas"))
           .groupby("host").sum(["pages", "edges"])
           .to_pandas())
    pages = out["sum(pages)"].to_numpy(dtype="int64")
    edges = out["sum(edges)"].to_numpy(dtype="int64")
    res = pd.DataFrame({
        "host": out["host"],
        "n_pages": pages,
        "n_edges": edges,
        "avg_outdeg": round_half_away(
            edges.astype("float64") / pages),
    })
    return res.sort_values("host").reset_index(drop=True)


def host_stats_sql(corpus_path: str) -> str:
    """DuckDB oracle for :func:`host_stats` over the shared edge CTEs."""
    return f"""
WITH {_edge_ctes_sql(corpus_path)},
p AS (SELECT regexp_extract(doc_id, '{_HOST_RE}', 1) AS host,
             CAST(COUNT(*) AS BIGINT) AS n_pages
      FROM read_parquet('{corpus_path}') GROUP BY 1),
eh AS (SELECT regexp_extract(src, '{_HOST_RE}', 1) AS host,
              CAST(COUNT(*) AS BIGINT) AS n_edges
       FROM edges GROUP BY 1)
SELECT p.host, p.n_pages, COALESCE(eh.n_edges, 0) AS n_edges,
       ROUND(CAST(COALESCE(eh.n_edges, 0) AS DOUBLE) / p.n_pages, 4)
         AS avg_outdeg
FROM p LEFT JOIN eh USING (host) ORDER BY host"""
