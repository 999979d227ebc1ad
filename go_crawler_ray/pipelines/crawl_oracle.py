"""DuckDB-SQL simulation of the reference crawl (the crawl oracle).

Builds one recursive-CTE query that REPLAYS the single-worker FIFO-BFS
crawl (internal/queue.go:49,88-114 semantics) entirely in SQL:

- ``children``: per corpus page, the canonicalized same-host out-edges in
  GetChildren order (links then assets, doc order —
  internal/models.go:128-147), with fragment strip / relative resolution
  / dot-segment removal matching internal/pageparser.go:28-68 for every
  ref shape the corpus generator emits (absolute, root-relative, bare
  relative, single-level ``../``; nothing deeper is generated — a ref
  resolving above the host root would need urljoin's clamping, which
  this bounded rewrite does not model);
- ``st``: one row per BFS round carrying (visited, frontier, refused,
  pages_queued, next_seq) as list-state; each iteration sorts the
  round's candidates by (parent_seq, position) = push order, keeps each
  URL's first occurrence, drops already-seen URLs, applies the
  enqueue-time page budget (refused pages stay permanently seen — the
  D1 dedup-before-budget invariant), and assigns dense ``seq`` numbers.

DuckDB 1.0 quirk this code works around: window functions / QUALIFY
evaluated directly over a relation derived from ``UNNEST(st.frontier)
JOIN ...`` inside a correlated lateral get implicitly re-partitioned per
unnested element by dependent-join flattening (each parent restarted the
running budget/seq sums). Stage 1 therefore aggregates candidates into a
single LIST value (aggregates decorrelate correctly), and stage 2 runs
the windows over a re-UNNEST of that one list.

The driver's correctness gate runs these oracles at sf0.01 (the "t2"
corpus; ~1.1k URLs, ~3.5 s per query) — the point is value-exact
verification of the distributed engine, not oracle speed.
"""

from __future__ import annotations


def sim_prefix(corpus_path: str, seed: str, budget: int) -> str:
    """The WITH RECURSIVE prefix ending in the ``final`` state CTE."""
    return f"""
WITH RECURSIVE
flat AS (
  SELECT doc_id, u.kind AS kind, u.media_ref AS media_ref,
         u."offset" AS off
  FROM read_parquet('{corpus_path}'), UNNEST(spans) AS t(u)
  WHERE u.kind IN ('link','css','script','img')
),
canon0 AS (
  SELECT doc_id AS src, kind, off,
    regexp_replace(doc_id, '/[^/]*$', '') AS dir,
    regexp_extract(doc_id, '^(https?://[^/]+)', 1) AS origin,
    split_part(media_ref, '#', 1) AS ref
  FROM flat
),
canon1 AS (
  SELECT src, kind, off,
    CASE WHEN ref LIKE 'http://%' OR ref LIKE 'https://%' THEN ref
         WHEN ref LIKE '/%' THEN origin || ref
         ELSE dir || '/' || ref END AS joined
  FROM canon0
),
canon2 AS (
  SELECT src, kind, off,
    regexp_replace(regexp_replace(regexp_replace(
      joined, '/[^/]+/\\.\\./', '/'), '/[^/]+/\\.\\./', '/'),
      '/[^/]+/\\.\\./', '/') AS url
  FROM canon1
),
children AS (
  SELECT src,
    CASE WHEN kind = 'link' THEN 'page' ELSE 'asset' END AS kind,
    url,
    CAST(ROW_NUMBER() OVER (PARTITION BY src
        ORDER BY (kind <> 'link'), off) - 1 AS INTEGER) AS position
  FROM canon2
  WHERE regexp_extract(url, '^https?://([^/]+)', 1)
        = regexp_extract(src, '^https?://([^/]+)', 1)
),
st(visited, frontier, refused, pages_queued, next_seq) AS (
  SELECT
    [struct_pack(url := '{seed}', seq := CAST(0 AS BIGINT),
                 kind := 'page')],
    [struct_pack(url := '{seed}', seq := CAST(0 AS BIGINT),
                 kind := 'page')],
    CAST([] AS VARCHAR[]),
    CAST(1 AS BIGINT), CAST(1 AS BIGINT)
  UNION ALL
  SELECT
    st.visited || s2.nf, s2.nf, st.refused || s2.nref,
    st.pages_queued + s2.npages, st.next_seq + s2.nacc
  FROM st,
  LATERAL (
    SELECT COALESCE(list(struct_pack(ps := f.seq, pos := c.position,
                                     url := c.url, kind := c.kind)),
                    []) AS cands
    FROM (SELECT UNNEST(st.frontier, recursive := true)) f
    JOIN children c ON c.src = f.url
    WHERE f.kind = 'page'
      AND c.url NOT IN (
        SELECT v.url FROM (SELECT UNNEST(st.visited, recursive := true)) v)
      AND c.url NOT IN (SELECT UNNEST(st.refused))
  ) c1,
  LATERAL (
    SELECT
      COALESCE(list(struct_pack(url := url, seq := seq2, kind := kind)
                    ORDER BY seq2) FILTER (WHERE enq), []) AS nf,
      COALESCE(list(url ORDER BY ps, pos) FILTER (WHERE NOT enq), [])
        AS nref,
      COALESCE(SUM(CASE WHEN enq AND kind = 'page' THEN 1 ELSE 0 END), 0)
        AS npages,
      COALESCE(SUM(CASE WHEN enq THEN 1 ELSE 0 END), 0) AS nacc
    FROM (
      SELECT *,
        st.next_seq - 1 + SUM(CASE WHEN enq THEN 1 ELSE 0 END)
          OVER (ORDER BY ps, pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq2
      FROM (
        SELECT *,
          (kind <> 'page'
           OR page_rank <= {budget} - st.pages_queued) AS enq
        FROM (
          SELECT *,
            SUM(CASE WHEN kind = 'page' THEN 1 ELSE 0 END)
              OVER (ORDER BY ps, pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS page_rank
          FROM (
            SELECT ps, pos, url, kind
            FROM (SELECT UNNEST(c1.cands, recursive := true))
            QUALIFY ROW_NUMBER() OVER (PARTITION BY url
                ORDER BY ps, pos) = 1
          )
        )
      )
    )
  ) s2
  WHERE len(st.frontier) > 0
),
final AS (
  SELECT * FROM st ORDER BY len(visited) DESC, len(frontier) ASC LIMIT 1
)
"""


def visit_order_sql(corpus_path: str, seed: str, budget: int) -> str:
    """Oracle for crawl_bfs_visit_order: (url, seq, kind) in FIFO order."""
    return sim_prefix(corpus_path, seed, budget) + """
SELECT v.url AS url, v.seq AS seq, v.kind AS kind
FROM final, (SELECT UNNEST(final.visited, recursive := true)) v
ORDER BY seq
"""


def seen_set_sql(corpus_path: str, seed: str, budget: int) -> str:
    """Oracle for crawl_seen_set: visited ∪ budget-refused, sorted."""
    return sim_prefix(corpus_path, seed, budget) + """
SELECT url FROM (
  SELECT v.url AS url
  FROM final, (SELECT UNNEST(final.visited, recursive := true)) v
  UNION
  SELECT r.u AS url FROM final, (SELECT UNNEST(final.refused) AS u) r
) ORDER BY url
"""


def docs_out_sql(corpus_path: str, seed: str, budget: int) -> str:
    """Oracle for crawl_docs_out: per visited URL the doc summary
    (status/skipped_on from corpus membership — main.go:150-161;
    n_children = emitted same-host children for fetched pages;
    save_path per internal/models.go:213-231 Go path semantics for the
    URL shapes this corpus generates)."""
    return sim_prefix(corpus_path, seed, budget) + f"""
SELECT v.url AS doc_id, v.kind AS kind,
  CASE WHEN c.doc_id IS NULL THEN 'skipped' ELSE 'ok' END AS status,
  CASE WHEN c.doc_id IS NULL THEN 'download' ELSE '' END AS skipped_on,
  CAST(CASE WHEN v.kind = 'page' AND c.doc_id IS NOT NULL
       THEN COALESCE(ch.n, 0) ELSE 0 END AS INTEGER) AS n_children,
  CASE WHEN v.kind = 'page' THEN
    CASE WHEN v.path = '' OR v.path = '/' THEN '/index.html'
         ELSE v.path || '.html' END
  ELSE v.path END AS save_path
FROM final,
  (SELECT u.url AS url, u.kind AS kind,
     split_part(regexp_replace(u.url, '^https?://[^/]+', ''), '?', 1)
       AS path
   FROM (SELECT UNNEST(final.visited, recursive := true)) u) v
LEFT JOIN (SELECT doc_id FROM read_parquet('{corpus_path}')) c
  ON c.doc_id = v.url
LEFT JOIN (SELECT src, COUNT(*) AS n FROM children GROUP BY src) ch
  ON ch.src = v.url
ORDER BY doc_id
"""
