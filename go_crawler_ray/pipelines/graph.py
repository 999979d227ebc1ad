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


def _edges_ds(corpus: str) -> rd.Dataset:
    """DISTINCT page->page edge Dataset via flatten -> canonicalize ->
    same-host filter -> reduce-side semi-join against the node set."""

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

    def node_rows(batch: pa.Table) -> pa.Table:
        urls = pc.cast(batch.column("doc_id"), pa.string())
        return pa.table({
            "dst": urls,
            "src": pa.array([""] * len(urls), pa.string()),
            "side": pa.array(np.zeros(len(urls), dtype=np.int8)),
        })

    def member_distinct(g: pd.DataFrame) -> pd.DataFrame:
        if not (g["side"] == 0).any():      # dst not a corpus page
            return pd.DataFrame({"src": pd.Series(dtype="object"),
                                 "dst": pd.Series(dtype="object")})
        srcs = g.loc[g["side"] == 1, "src"].unique()
        return pd.DataFrame({"src": srcs,
                             "dst": g["dst"].iloc[0]})

    ds = rd.read_parquet(corpus)
    return (ds.map_batches(link_candidates, batch_format="pyarrow")
            .union(ds.map_batches(node_rows, batch_format="pyarrow"))
            .groupby("dst")
            .map_groups(member_distinct, batch_format="pandas"))


def pagerank(sf_dir: str, d: float = 0.85, iters: int = 5) -> pd.DataFrame:
    """(node, rank): PageRank of every corpus page after ``iters``
    synchronous sweeps; rank rounded half-away to 6 places (values sit
    near 1/N — 4 places would quantize them together)."""
    import pyarrow.parquet as _pq

    corpus = corpus_parquet(sf_dir)
    n_nodes = _pq.ParquetFile(corpus).metadata.num_rows
    N = float(n_nodes)

    edges = _edges_ds(corpus).materialize()

    # ---- init: ranks (node, r, deg) via one groupby over nodes+edges ----
    def node_init(batch: pa.Table) -> pd.DataFrame:
        urls = batch.column("doc_id").to_pandas().astype(str)
        return pd.DataFrame({"node": urls, "side": np.int8(0)})

    def edge_src(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": batch["src"], "side": np.int8(1)})

    def init_group(g: pd.DataFrame) -> pd.DataFrame:
        if not (g["side"] == 0).any():      # unreachable: src is a page
            return pd.DataFrame({"node": pd.Series(dtype="object"),
                                 "r": pd.Series(dtype="float64"),
                                 "deg": pd.Series(dtype="int64")})
        return pd.DataFrame({"node": [g["node"].iloc[0]],
                             "r": [1.0 / N],
                             "deg": [int((g["side"] == 1).sum())]})

    ranks = (rd.read_parquet(corpus)
             .map_batches(node_init, batch_format="pyarrow")
             .union(edges.map_batches(edge_src, batch_format="pandas"))
             .groupby("node")
             .map_groups(init_group, batch_format="pandas")
             .materialize())

    # ---- iterations: 2 reduce-side shuffles each, scalar D to driver ----
    def rank_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": batch["node"], "dst": "",
                             "r": batch["r"].astype("float64"),
                             "deg": batch["deg"].astype("int64"),
                             "side": np.int8(0)})

    def edge_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": batch["src"], "dst": batch["dst"],
                             "r": np.float64(0.0), "deg": np.int64(-1),
                             "side": np.int8(1)})

    def contribute(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["side"] == 0]
        r = float(base["r"].iloc[0])
        deg = int(base["deg"].iloc[0])
        out_key = [g["node"].iloc[0]]
        out_val = [0.0]
        out_deg = [deg]
        if deg == 0:
            out_key.append(_DANG); out_val.append(r); out_deg.append(-1)
        else:
            for dst in g.loc[g["side"] == 1, "dst"]:
                out_key.append(dst); out_val.append(r / deg)
                out_deg.append(-1)
        return pd.DataFrame({"key": out_key,
                             "val": np.array(out_val, dtype="float64"),
                             "deg": np.array(out_deg, dtype="int64")})

    def gather(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": [g["key"].iloc[0]],
                             "s": [float(g["val"].to_numpy().sum())],
                             "deg": [int(g["deg"].max())]})

    for _ in range(iters):
        # the union rows group on 'node' for contribution, then on
        # 'key' for gathering — the iteration's two reduce-side shuffles
        summed = (ranks.map_batches(rank_rows, batch_format="pandas")
                  .union(edges.map_batches(edge_rows,
                                           batch_format="pandas"))
                  .groupby("node")
                  .map_groups(contribute, batch_format="pandas")
                  .groupby("key")
                  .map_groups(gather, batch_format="pandas")
                  .materialize())
        dang = summed.filter(lambda row: row["node"] == _DANG).to_pandas()
        D = float(dang["s"].iloc[0]) if len(dang) else 0.0

        def update(batch: pd.DataFrame, D=D) -> pd.DataFrame:
            keep = batch["node"] != _DANG
            b = batch[keep]
            r = (1.0 - d) / N + d * (b["s"].to_numpy() + D / N)
            return pd.DataFrame({"node": b["node"],
                                 "r": r.astype("float64"),
                                 "deg": b["deg"].astype("int64")})

        # NOT materialized: the update chains lazily into the next
        # iteration's rank_rows (or the final pull) — one fewer
        # execution per sweep
        ranks = summed.map_batches(update, batch_format="pandas")

    out = ranks.to_pandas()
    out = pd.DataFrame({"node": out["node"].astype(str),
                        "rank": round_half_away(out["r"].to_numpy(), 6)})
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


def components(sf_dir: str, max_rounds: int = 64) -> pd.DataFrame:
    """(node, component): undirected connected components of the corpus
    link graph; component = lexicographic min URL in the component.

    Distributed shape (the string-keyed sibling of
    pipelines/dedup._min_label_components): the adjacency state starts
    as C(v) = N(v) ∪ {v} from the edge dataset; each Hash-to-Min round
    is ONE groupby("node") shuffle (per node emit (min, c) and (c, min)
    for all members); convergence is declared by a distributed
    edge-consistency pass, not a driver diff. Pages with no edges never
    enter the shuffle — the final pass assigns them their own URL via
    the broadcast label map over a streaming doc_id read, so the state
    carries only edge-touched nodes (the near-dup-cluster discipline)."""
    corpus = corpus_parquet(sf_dir)
    edges = _edges_ds(corpus).materialize()

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
    if edges.count():
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
