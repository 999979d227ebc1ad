"""Relational operator suite over the driver's TPC-H-ish tables.

These are the engine-breadth pipelines: scan (with column pruning at the
read), vectorized filter/project, partial-then-final aggregation,
broadcast hash join, top-k, distinct, event-time tumbling windows and
sessionization — each the Ray-Data-idiomatic realization of a classic
operator, and each paired with an ANSI-SQL oracle in __ray_entry__.py.

Scale discipline:
- every read passes ``columns=[...]`` (prune at the read);
- aggregations pre-combine inside map_batches (one row per key per
  batch) before the small groupby shuffle — the partial/final pattern;
- the join broadcasts the small side via ray.put once, probed per batch
  (no shuffle);
- top-k keeps a per-batch heap then merges k·B rows on the driver
  instead of sorting the whole table;
- all float aggregates are rounded to 4 decimals so the DuckDB oracle
  hashes byte-identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.compat import round_half_away
from ..functions.pool import auto_pool
from ray.data.aggregate import Count, Sum


def _read(sf_dir: str, table: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Q1-style pricing summary: partial-agg inside map_batches, tiny final shuffle

def pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(batch["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = batch.append_column("disc_price", disc_price)
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")])

    final = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity_sum", alias_name="sum_qty"),
            Sum("l_extendedprice_sum", alias_name="sum_base_price"),
            Sum("disc_price_sum", alias_name="sum_disc_price"),
            Sum("l_quantity_count", alias_name="n_rows"),
        )
        .to_pandas()
    )
    final["avg_qty"] = round_half_away(final["sum_qty"] / final["n_rows"])
    final["avg_price"] = round_half_away(final["sum_base_price"] / final["n_rows"])
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        final[c] = round_half_away(final[c])
    final["n_rows"] = final["n_rows"].astype("int64")
    return final.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# broadcast hash join: orders ⋈ customer (small side via ray.put, no shuffle)

def segment_revenue(sf_dir: str) -> pd.DataFrame:
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    cust_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    class JoinPartial:
        """Actor-pool stage: the broadcast map is fetched ONCE per actor."""

        def __init__(self):
            self.seg = ray.get(cust_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            segs = pd.Series(batch["o_custkey"].to_numpy()).map(self.seg)
            t = pa.table({
                "c_mktsegment": pa.array(segs, pa.string()),
                "o_totalprice": batch["o_totalprice"],
            })
            return t.group_by(["c_mktsegment"]).aggregate(
                [("o_totalprice", "sum"), ("o_totalprice", "count")])

    out = (
        ds.map_batches(JoinPartial, batch_format="pyarrow", concurrency=auto_pool())
        .groupby("c_mktsegment")
        .aggregate(Sum("o_totalprice_sum", alias_name="revenue"),
                   Sum("o_totalprice_count", alias_name="n_orders"))
        .to_pandas()
    )
    out["revenue"] = round_half_away(out["revenue"])
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


# ---------------------------------------------------------------------------
# top-k without a full sort: per-batch partial top-k, driver merge

def top_orders(sf_dir: str, k: int = 10) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def batch_topk(batch: pa.Table) -> pa.Table:
        n = min(k, batch.num_rows)
        idx = pc.select_k_unstable(
            batch, k=n, sort_keys=[("o_totalprice", "descending"),
                                   ("o_orderkey", "ascending")])
        return batch.take(idx)

    parts = [b for b in ds.map_batches(batch_topk, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
    merged = pa.concat_tables(parts).to_pandas()
    merged = merged.sort_values(["o_totalprice", "o_orderkey"],
                                ascending=[False, True]).head(k)
    merged["o_totalprice"] = round_half_away(merged["o_totalprice"])
    return merged.reset_index(drop=True)


# ---------------------------------------------------------------------------
# distinct (shuffle op)

def distinct_event_types(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pd.DataFrame({"event_type": vals})


# ---------------------------------------------------------------------------
# vectorized filter + project with predicate/column pushdown at the read

def high_value_lineitems(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_extendedprice") > 90_000.0),
    )

    def project(batch: pa.Table) -> pa.Table:
        rev = pc.round(
            pc.multiply(batch["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), batch["l_discount"])),
            ndigits=4, round_mode="half_towards_infinity")
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "l_linenumber": batch["l_linenumber"],
            "revenue": rev,
        })

    out = ds.map_batches(project, batch_format="pyarrow").to_pandas()
    return out.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# event-time tumbling window (Ray Data has no watermarks: the batch
# realization is groupby(key, window_start), SURVEY.md §2.9)

def hourly_event_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def add_window(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table({
            "event_type": batch["event_type"],
            "window_start": hour,
            "value": batch["value"],
        })
        return t.group_by(["event_type", "window_start"]).aggregate(
            [("value", "sum"), ("value", "count")])

    out = (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("value_sum", alias_name="sum_value"),
                   Sum("value_count", alias_name="n_events"))
        .to_pandas()
    )
    out["sum_value"] = round_half_away(out["sum_value"])
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# sliding window: each event contributes to size/slide windows, realized
# as a vectorized flat-map (duplicate with shifted window starts) + the
# same partial/final aggregation as the tumbling case

def sliding_event_stats(sf_dir: str, size_hours: int = 2,
                        slide_hours: int = 1) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    k = size_hours // slide_hours

    def expand(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        parts = []
        for h in range(k):
            shifted = pc.subtract(
                hour, pa.scalar(np.timedelta64(h * slide_hours * 3600, "s")
                                .astype("timedelta64[us]")))
            parts.append(pa.table({
                "event_type": batch["event_type"],
                "window_start": shifted,
                "value": batch["value"],
            }))
        t = pa.concat_tables(parts)
        return t.group_by(["event_type", "window_start"]).aggregate(
            [("value", "sum"), ("value", "count")])

    out = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("value_sum", alias_name="sum_value"),
                   Sum("value_count", alias_name="n_events"))
        .to_pandas()
    )
    out["sum_value"] = round_half_away(out["sum_value"])
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# top-k per group: broadcast-join the group key, per-batch partial top-k
# per key, tiny driver merge (no global sort)

def top_orders_per_segment(sf_dir: str, k: int = 3) -> pd.DataFrame:
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    cust_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    class GroupTopK:
        def __init__(self):
            self.seg = ray.get(cust_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.assign(
                c_mktsegment=batch["o_custkey"].map(self.seg))
            batch = batch.sort_values(
                ["c_mktsegment", "o_totalprice", "o_orderkey"],
                ascending=[True, False, True])
            return batch.groupby("c_mktsegment", sort=False).head(k)[
                ["c_mktsegment", "o_orderkey", "o_totalprice"]]

    cand = ds.map_batches(GroupTopK, batch_format="pandas",
                          concurrency=auto_pool()).to_pandas()
    cand = cand.sort_values(["c_mktsegment", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True])
    out = cand.groupby("c_mktsegment", sort=True).head(k).reset_index(drop=True)
    out["o_totalprice"] = round_half_away(out["o_totalprice"])
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# sessionization: global (user_id, ts) sort -> vectorized per-batch
# partials -> O(batches) boundary stitch on the driver

def user_sessions(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """(user_id, n_sessions, n_events): a session break is a gap >
    ``gap_minutes`` between a user's consecutive events.

    Shape: ONE sort shuffle by (user_id, ts), then a map_batches that
    computes each ordered batch's partial — per-user event counts,
    within-batch break counts (one vectorized diff, no per-group
    Python) — plus its first/last (user, ts). The driver only stitches
    batch boundaries (same user across a batch edge -> one more gap
    check), O(batches + users) work. This replaces the previous
    groupby().map_groups with a per-user pandas constructor."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch["user_id"].to_numpy()
        ts = batch["ts"].to_numpy()
        if not len(u):
            # Ray sort can emit empty blocks at range boundaries
            return pd.DataFrame({
                "user_id": pd.Series(dtype=batch["user_id"].dtype),
                "n_events": pd.Series(dtype="int64"),
                "n_breaks": pd.Series(dtype="int64"),
                "bid": pd.Series(dtype="object"),
                "first_user": pd.Series(dtype=batch["user_id"].dtype),
                "first_ts": pd.Series(dtype=batch["ts"].dtype),
                "last_user": pd.Series(dtype=batch["user_id"].dtype),
                "last_ts": pd.Series(dtype=batch["ts"].dtype),
            })
        new_user = np.empty(len(u), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        brk = np.zeros(len(u), dtype=bool)
        if len(u) > 1:
            brk[1:] = ~new_user[1:] & ((ts[1:] - ts[:-1]) > gap)
        import uuid

        g = pd.DataFrame({"user_id": u,
                          "n_breaks": brk.astype("int64")})
        agg = g.groupby("user_id", sort=True).agg(
            n_events=("user_id", "size"), n_breaks=("n_breaks", "sum"))
        agg = agg.reset_index()
        # the slice's edge rows, stamped on every output row with a
        # unique slice id: the driver re-batches arbitrarily (and the
        # streaming executor reorders), so edges must survive concat
        agg["bid"] = uuid.uuid4().hex
        agg["first_user"] = u[0]
        agg["first_ts"] = ts[0]
        agg["last_user"] = u[-1]
        agg["last_ts"] = ts[-1]
        return agg

    allp = (ds.sort(["user_id", "ts"])
            .map_batches(partials, batch_format="pandas")
            .to_pandas())
    # combine per-user partials
    out = allp.groupby("user_id", sort=True).agg(
        n_events=("n_events", "sum"),
        n_breaks=("n_breaks", "sum")).reset_index()
    # boundary stitch over the slice edges, ordered by first edge row
    # (slices are contiguous runs of the sorted data, so their first
    # rows totally order them; an equal-boundary tie would mean a zero
    # gap, which never adds a break either way)
    edge_tbl = (allp[["bid", "first_user", "first_ts",
                      "last_user", "last_ts"]]
                .drop_duplicates("bid")
                .sort_values(["first_user", "first_ts"])
                .reset_index(drop=True))
    extra: dict = {}
    for i in range(len(edge_tbl) - 1):
        pu = edge_tbl["last_user"].iloc[i]
        pt = edge_tbl["last_ts"].iloc[i]
        nu = edge_tbl["first_user"].iloc[i + 1]
        nt = edge_tbl["first_ts"].iloc[i + 1]
        if pu == nu and (nt - pt) > gap:
            extra[pu] = extra.get(pu, 0) + 1
    if extra:
        out["n_breaks"] += out["user_id"].map(extra).fillna(0).astype("int64")
    out["n_sessions"] = (out["n_breaks"] + 1).astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return (out[["user_id", "n_sessions", "n_events"]]
            .sort_values("user_id").reset_index(drop=True))


# ---------------------------------------------------------------------------
# As-of join: for each purchase, the latest click at-or-before it per user

def event_asof_join(sf_dir: str, left_type: str = "purchase",
                    right_type: str = "click") -> pd.DataFrame:
    """As-of join over the events table — the windowed-lookup operator
    Ray Data has no primitive for: every ``left_type`` event matches the
    LATEST ``right_type`` event by the same user with ``right.ts <=
    left.ts`` (ties on ts broken toward the larger event_id, so the
    match is deterministic). Unmatched left rows drop (inner as-of).

    Shape: ONE key shuffle — filter both event kinds in the same
    streaming pass, ``groupby(user_id)``, then a vectorized
    ``np.searchsorted`` per group (the group's right side sorted once,
    every left row matched in O(log n)). Partitioning assumption: one
    user's history fits a group — the key is the entity id, the same
    assumption sessionization makes; a pathological single-user stream
    would need time-range sub-splitting with boundary carry-over.

    Returns (user_id, purchase_id, purchase_ts, click_id, click_ts,
    gap_us) ordered by purchase_id; gap_us = microseconds between the
    two events (exact int64 — no float rounding in the oracle compare).
    """
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def both_kinds(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch["event_type"].isin((left_type, right_type))
        return batch.loc[m, ["event_id", "ts", "user_id", "event_type"]]

    def asof_group(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == left_type]
        right = (g[g["event_type"] == right_type]
                 .sort_values(["ts", "event_id"]))
        empty = pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "purchase_id": pd.Series(dtype="int64"),
            "purchase_ts": pd.Series(dtype="datetime64[us]"),
            "click_id": pd.Series(dtype="int64"),
            "click_ts": pd.Series(dtype="datetime64[us]"),
            "gap_us": pd.Series(dtype="int64"),
        })
        if not len(left) or not len(right):
            return empty
        l_ts = left["ts"].to_numpy().astype("datetime64[us]").view("int64")
        r_ts = right["ts"].to_numpy().astype("datetime64[us]").view("int64")
        idx = np.searchsorted(r_ts, l_ts, side="right") - 1
        keep = idx >= 0
        if not keep.any():
            return empty
        idx = idx[keep]
        return pd.DataFrame({
            "user_id": left["user_id"].to_numpy()[keep],
            "purchase_id": left["event_id"].to_numpy()[keep],
            "purchase_ts": left["ts"].to_numpy()[keep],
            "click_id": right["event_id"].to_numpy()[idx],
            "click_ts": right["ts"].to_numpy()[idx],
            "gap_us": l_ts[keep] - r_ts[idx],
        })

    out = (ds.map_batches(both_kinds, batch_format="pandas")
           .groupby("user_id")
           .map_groups(asof_group, batch_format="pandas")
           .to_pandas())
    if "purchase_id" not in out.columns:
        return asof_group(pd.DataFrame({
            "event_id": pd.Series(dtype="int64"),
            "ts": pd.Series(dtype="datetime64[us]"),
            "user_id": pd.Series(dtype="int64"),
            "event_type": pd.Series(dtype=object)}))
    return out.sort_values("purchase_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Exact distributed percentiles: histogram-select order statistics

def _revenue_bounds_from_stats(path: str):
    """(mn, mx, n) bounds for l_extendedprice * (1 - l_discount) from
    parquet row-group statistics alone — no data read. The product's
    range over [pmin,pmax] x [1-dmax,1-dmin] is attained at a corner
    (bilinear over a box), so corner products bound it for ANY signs.
    Returns (None, None, n) when any row group lacks statistics."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    pi, di = names.index("l_extendedprice"), names.index("l_discount")
    corners = []
    for g in range(md.num_row_groups):
        ps = md.row_group(g).column(pi).statistics
        ds_ = md.row_group(g).column(di).statistics
        if (ps is None or ds_ is None or not ps.has_min_max
                or not ds_.has_min_max):
            return None, None, md.num_rows
        for p in (ps.min, ps.max):
            for f in (1.0 - ds_.max, 1.0 - ds_.min):
                corners.append(p * f)
    return float(min(corners)), float(max(corners)), md.num_rows


def revenue_percentiles(
        sf_dir: str,
        pcts: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
        n_buckets: int = 8192) -> pd.DataFrame:
    """Exact percentiles of lineitem revenue
    (``l_extendedprice * (1 - l_discount)``) WITHOUT a global sort —
    the classic distributed order-statistics selection:

    1. value-range bounds from parquet ROW-GROUP STATISTICS — zero data
       read: the derived column's bounds are the corner products of the
       price/discount column bounds (a covering range is all the
       histogram needs; exactness never depended on tight bounds). A
       stats-less file falls back to one streaming (min, max) pass;
    2. one streaming pass: per-batch value histograms over
       ``n_buckets`` equal-width bins, each batch emitting ONE dense
       int64 vector row; the driver merges the fixed-size mergeable
       sketches (~n_buckets x 8 B each — the tree-reduce root, same
       discipline as the ANN partial-top-k merge). A groupby-sum here
       was measured at 46 s for 43 x 8k partial rows (Ray's sort
       aggregate pathologically mishandles many-groups-per-block
       partials) vs ~1.5 s for the dense reduce; at 10^5+ blocks,
       raise ``batch_size`` or insert one intermediate combine level;
    3. the cumulative histogram locates, for each target rank
       ``k = floor(pct * (n - 1))``, the ONE bin containing it; only
       those bins' values (n / n_buckets each) are pulled and the k-th
       element read off with ``np.partition``.

    At 10^10 rows a bin is ~1M doubles — driver-trivial; under
    pathological value skew (one bin dominating) the same three passes
    recurse within the hot bin. A min == max column short-circuits.

    Returns (pct, value) with value rounded to 4 (the oracle is the
    SQL row at OFFSET k of the sorted column).
    """
    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_discount"])

    def rev(batch: pd.DataFrame) -> np.ndarray:
        return (batch["l_extendedprice"].to_numpy()
                * (1.0 - batch["l_discount"].to_numpy()))

    mn, mx, n = _revenue_bounds_from_stats(f"{sf_dir}/lineitem.parquet")
    if mn is None:
        def stats(batch: pd.DataFrame) -> pd.DataFrame:
            v = rev(batch)
            return pd.DataFrame({"mn": [v.min()], "mx": [v.max()],
                                 "n": [len(v)]})

        st = ds.map_batches(stats, batch_format="pandas").to_pandas()
        mn, mx, n = (float(st["mn"].min()), float(st["mx"].max()),
                     int(st["n"].sum()))
    ks = [int(np.floor(p * (n - 1))) for p in pcts]
    if mn == mx:
        return pd.DataFrame({"pct": np.array(pcts, dtype="float64"),
                             "value": round_half_away(np.full(len(pcts), mn))})
    width = (mx - mn) / n_buckets

    def to_bucket(v: np.ndarray) -> np.ndarray:
        return np.clip(((v - mn) / width).astype("int64"), 0, n_buckets - 1)

    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        h = np.bincount(to_bucket(rev(batch)), minlength=n_buckets)
        return pd.DataFrame({"h": [h.astype("int64")]})

    counts = np.zeros(n_buckets, dtype="int64")
    for hb in (ds.map_batches(hist, batch_format="pandas")
               .iter_batches(batch_format="pandas")):
        for arr in hb["h"]:
            counts += np.asarray(arr, dtype="int64")
    cum_before = np.concatenate([[0], np.cumsum(counts)[:-1]])
    need = {int(np.searchsorted(np.cumsum(counts), k, side="right"))
            for k in ks}

    def pull(batch: pd.DataFrame) -> pd.DataFrame:
        v = rev(batch)
        b = to_bucket(v)
        m = np.isin(b, list(need))
        return pd.DataFrame({"bucket": b[m], "v": v[m]})

    pulled = ds.map_batches(pull, batch_format="pandas").to_pandas()
    vals = []
    for p, k in zip(pcts, ks):
        b = int(np.searchsorted(np.cumsum(counts), k, side="right"))
        inb = pulled.loc[pulled["bucket"] == b, "v"].to_numpy()
        j = k - int(cum_before[b])
        vals.append(np.partition(inb, j)[j])
    return pd.DataFrame({"pct": np.array(pcts, dtype="float64"),
                         "value": round_half_away(np.array(vals))})


# ---------------------------------------------------------------------------
# reduce-side join: lineitem ⋈ orders co-shuffled on the order key — the
# large×large join shape (every other join here broadcasts a small side)

def order_revenue_topk(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-``k`` orders by total lineitem revenue, with the customer's
    market segment: (o_orderkey, c_mktsegment, revenue).

    The lineitem⋈orders join is LARGE×LARGE, so it runs as a classic
    reduce-side join — no broadcast:
    1. lineitem: per-batch partial revenue combine per order key (the
       combiner halves the shuffle payload to one row per key per
       block);
    2. orders: slim (key, custkey) rows;
    3. both sides tagged and unioned, then ONE groupby over a SALT
       BUCKET (okey mod P, P ~ pool size) co-shuffle — key-keyed
       grouping carried one group per order (~150k nearly-singleton
       groups, one Python call each: the measured many-groups-per-block
       constant, 39 s at sf0.1) — and each salt group joins its keys
       with ONE vectorized pandas groupby-sum + merge (inner join: keys
       missing either side emit nothing);
    4. the customer→segment map IS small, so it stays a broadcast
       lookup (the rule: broadcast small sides, shuffle big ones);
    5. top-k = per-block partial top-k + a k×blocks driver merge, cut
       on the RAW revenue (rounding only on the report).

    At scale the single co-shuffle reuses one partitioning key
    end-to-end; skew is bounded (≤ 7 lineitems per order in TPC-H).
    """
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    from ..functions.pool import cluster_cpus

    P = max(16, 4 * int(cluster_cpus()))

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = pa.table({"okey": batch["l_orderkey"], "revenue": rev})
        agg = t.group_by("okey").aggregate([("revenue", "sum")]).to_pandas()
        keys = agg["okey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "okey": keys,
            "side": np.int8(1),
            "custkey": np.int64(-1),
            "revenue": agg["revenue_sum"].astype("float64"),
            "bkt": keys % P,
        })

    def orders_rows(batch: pa.Table) -> pd.DataFrame:
        keys = batch["o_orderkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "okey": keys,
            "side": np.int8(0),
            "custkey": batch["o_custkey"].to_numpy().astype("int64"),
            "revenue": np.float64(0.0),
            "bkt": keys % P,
        })

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m1 = g["side"].to_numpy() == 1
        rev = (g.loc[m1].groupby("okey", sort=False)["revenue"].sum()
               .rename("revenue"))
        o = g.loc[~m1, ["okey", "custkey"]]
        j = o.merge(rev, left_on="okey", right_index=True, how="inner")
        return pd.DataFrame({
            "o_orderkey": j["okey"].astype("int64"),
            "custkey": j["custkey"].astype("int64"),
            "revenue": j["revenue"].astype("float64"),
        })

    class TopKWithSegment:
        def __init__(self):
            self.seg = ray.get(seg_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            cut = batch.sort_values(["revenue", "o_orderkey"],
                                    ascending=[False, True]).head(k)
            return pd.DataFrame({
                "o_orderkey": cut["o_orderkey"].astype("int64"),
                "c_mktsegment": cut["custkey"].map(self.seg),
                "revenue": cut["revenue"].astype("float64"),
            })

    joined = (li.map_batches(li_partial, batch_format="pyarrow")
              .union(orders.map_batches(orders_rows, batch_format="pyarrow"))
              .groupby("bkt")
              .map_groups(join_bucket, batch_format="pandas")
              .map_batches(TopKWithSegment, batch_format="pandas",
                           concurrency=auto_pool(frac=0.5))
              .to_pandas())
    out = (joined.sort_values(["revenue", "o_orderkey"],
                              ascending=[False, True]).head(k)
           .reset_index(drop=True))
    out["revenue"] = round_half_away(out["revenue"])
    return out
