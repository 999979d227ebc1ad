"""Deterministic synthetic interleaved-document corpus (the "web").

Generates the F1 fixture of FIXTURES.md: one row per fetchable document,
schema exactly BASELINE.json:input_hint — (doc_id, spans) with spans an
ordered list<struct<kind,text,media_ref,offset>>. The graph is seeded and
fully deterministic; no external data.

Planted cases (FIXTURES.md F1, mirroring the reference's golden page
/root/reference/testdata/example1.html and its tests):
- relative refs ("p/7.html", "../static/x.css"), absolute same-host,
  absolute cross-host (must be dropped: internal/pageparser.go:45-47),
  fragment-bearing links ("p/5.html#sec" — fragment stripped,
  pageparser.go:39), querystring-bearing assets ("s/added.js?v=1" —
  preserved, internal/pageparser_test.go asserts this);
- one hot host holding ~50% of all pages (salted-repartition exercise);
- URLs appearing as both link and asset (dedup edge case D1);
- dangling refs (fetch-miss -> skipped_on="download", main.go:161);
- root pages with empty path basename (save-path fallback "index",
  internal/models.go:222-227);
- robots.txt docs per host ([NEW] politeness tests; plain-text
  "Disallow: <prefix>" lines in a single text span).

Page doc_ids: https://h{i}.example/... ; the seed for host i is the root
"https://h{i}.example/". Because the reference drops cross-host refs, a
crawl seeded at host 0 stays on host 0; host 0 is the hot host.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import CORPUS_SCHEMA

_WORDS = (
    "the quick brown fox jumps over lazy dog data stream arrow batch "
    "shuffle frontier crawl parse fetch dedup host page asset span graph "
    "ray actor block schedule vector hash filter token robot polite queue"
).split()


GEN_VERSION = "v2"   # bump when generator output changes (invalidates /tmp cache)


@dataclass(frozen=True)
class CorpusParams:
    n_hosts: int = 3
    pages_per_host: int = 40          # cold hosts; the hot host gets hot_factor x
    hot_factor: int = 2               # hot host page multiplier (~50% of pages)
    assets_per_page: int = 3
    links_per_page: int = 5
    cross_host_frac: float = 0.10     # refs pointing at another host (dropped)
    dangling_frac: float = 0.08       # refs to URLs absent from the corpus
    fragment_frac: float = 0.20      # link refs carrying #fragments
    relative_frac: float = 0.50       # refs written relative instead of absolute
    query_frac: float = 0.15          # asset refs carrying ?querystrings
    dup_link_asset_frac: float = 0.10 # asset URLs also emitted as links elsewhere
    text_spans_per_page: int = 4
    text_words: int = 8               # words per text span (bench uses ~300 so
    asset_words: int = 20             # per-URL content work is web-realistic)
    seed: int = 42

    @staticmethod
    def for_scale(scale: str) -> "CorpusParams":
        """unit/t1/t2/bench sizes per FIXTURES.md F1."""
        if scale == "unit":
            return CorpusParams(n_hosts=2, pages_per_host=8, assets_per_page=2,
                                links_per_page=3, text_spans_per_page=2)
        if scale == "t1":       # ~500 docs
            return CorpusParams(n_hosts=3, pages_per_host=40)
        if scale == "t2":       # ~5k docs
            return CorpusParams(n_hosts=5, pages_per_host=300)
        if scale == "bench":    # ~200k docs, ~10 KB per fetched page
            return CorpusParams(n_hosts=8, pages_per_host=8000,
                                assets_per_page=4, links_per_page=8,
                                text_words=300, asset_words=600)
        if scale == "benchxl":  # ~2x bench — the scaling-efficiency
            # sample (a larger drain shrinks the fixed-cost fraction,
            # closer to the metric's 10^10-URL regime)
            return CorpusParams(n_hosts=8, pages_per_host=16000,
                                assets_per_page=4, links_per_page=8,
                                text_words=300, asset_words=600)
        raise ValueError(f"unknown corpus scale {scale!r}")


def _host(i: int) -> str:
    return f"h{i}.example"


def _page_path(rng: random.Random, j: int) -> str:
    """Vary path shapes so save-path/relativization logic is exercised."""
    r = rng.random()
    if j == 0:
        return "/"                        # root page, basename fallback
    if r < 0.15:
        return f"/a/b/{j}.html"           # nested dir
    if r < 0.25:
        return f"/dir{j % 7}/{j}.html"
    return f"/p/{j}.html"


def _text(rng: random.Random, n: int = 8) -> str:
    return " ".join(rng.choices(_WORDS, k=n))


def generate_corpus(params: CorpusParams) -> pa.Table:
    """Build the corpus table deterministically from ``params.seed``."""
    rng = random.Random(params.seed)

    # --- lay out the URL space -------------------------------------------
    hosts = [_host(i) for i in range(params.n_hosts)]
    pages: dict[str, list[str]] = {}       # host -> page URLs
    for i, h in enumerate(hosts):
        n = params.pages_per_host * (params.hot_factor if i == 0 else 1)
        paths = sorted({_page_path(rng, j) for j in range(n)})
        pages[h] = [f"https://{h}{p}" for p in paths]

    assets: dict[str, list[str]] = {}      # host -> asset URLs
    akind_of: dict[str, str] = {}
    for i, h in enumerate(hosts):
        n_assets = max(2, len(pages[h]) * params.assets_per_page // 2)
        urls = []
        for j in range(n_assets):
            kind = ("css", "script", "img")[j % 3]
            ext = {"css": "css", "script": "js", "img": "png"}[kind]
            u = f"https://{h}/static/{kind}{j}.{ext}"
            if rng.random() < params.query_frac:
                u += f"?v={j % 9}"   # querystring is part of the canonical URL
            urls.append(u)
            akind_of[u] = kind
        assets[h] = urls

    # --- emit rows --------------------------------------------------------
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []

    def add_doc(doc_id: str, spans: list[dict]) -> None:
        for k, s in enumerate(spans):
            s["offset"] = k
        doc_ids.append(doc_id)
        spans_col.append(spans)

    def rel_or_abs(target: str, page_url: str) -> str:
        """Write a ref relative (various shapes) or absolute.

        Cross-host targets stay absolute (a relativized form would resolve
        against the page host and point at the wrong document)."""
        if target.split("/", 3)[2] != page_url.split("/", 3)[2]:
            return target
        if rng.random() >= params.relative_frac:
            return target
        # target is https://host/path...; make it page-relative
        t_path = target.split(".example", 1)[1]
        p_dir = page_url.split(".example", 1)[1].rsplit("/", 1)[0]
        if rng.random() < 0.3 and p_dir.count("/") >= 2:
            # ../-style
            up = p_dir.rsplit("/", 1)[0]
            if t_path.startswith(up + "/"):
                return "../" + t_path[len(up) + 1 :]
        if t_path.startswith(p_dir + "/") and rng.random() < 0.7:
            return t_path[len(p_dir) + 1 :]          # bare relative
        return t_path                                 # root-relative

    for hi, h in enumerate(hosts):
        hp, ha = pages[h], assets[h]
        other_hosts = [x for x in hosts if x != h]
        for pi, page_url in enumerate(hp):
            spans: list[dict] = []
            link_targets: list[str] = []
            # chain link guarantees BFS reaches every page of the host
            link_targets.append(hp[(pi + 1) % len(hp)])
            for _ in range(params.links_per_page - 1):
                r = rng.random()
                if r < params.cross_host_frac and other_hosts:
                    oh = rng.choice(other_hosts)
                    link_targets.append(rng.choice(pages[oh]))
                elif r < params.cross_host_frac + params.dangling_frac:
                    link_targets.append(f"https://{h}/missing/{rng.randrange(10**6)}.html")
                elif r < params.cross_host_frac + params.dangling_frac + params.dup_link_asset_frac:
                    link_targets.append(rng.choice(ha))   # asset URL as a link (D1)
                else:
                    link_targets.append(rng.choice(hp))
            asset_targets = [rng.choice(ha) for _ in range(params.assets_per_page)]

            n_text = params.text_spans_per_page
            slots = [("link", t) for t in link_targets] + [
                (akind_of[t], t) for t in asset_targets
            ]
            rng.shuffle(slots)
            for si, (kind, target) in enumerate(slots):
                if si < n_text:
                    spans.append({"kind": "text", "text": _text(rng, params.text_words), "media_ref": ""})
                ref = rel_or_abs(target, page_url)
                if kind == "link" and rng.random() < params.fragment_frac:
                    ref += f"#sec{rng.randrange(5)}"
                spans.append({"kind": kind, "text": _text(rng, 2) if kind == "link" else "",
                              "media_ref": ref})
            spans.append({"kind": "text", "text": _text(rng, params.text_words), "media_ref": ""})
            add_doc(page_url, spans)

        for a_url in ha:
            add_doc(a_url, [{"kind": "text", "text": _text(rng, params.asset_words), "media_ref": ""}])

        # [NEW] robots.txt per host: disallow one directory prefix
        robots_body = f"User-agent: *\nDisallow: /dir{hi % 7}/\n"
        add_doc(f"https://{h}/robots.txt",
                [{"kind": "text", "text": robots_body, "media_ref": ""}])

    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=CORPUS_SCHEMA
    )


def corpus_path(scale: str, base_dir: str = "/tmp/graft_corpus") -> str:
    return os.path.join(base_dir, GEN_VERSION, scale, "corpus.parquet")


def ensure_corpus(scale: str, base_dir: str = "/tmp/graft_corpus") -> str:
    """Write (once) and return the parquet path for a corpus scale."""
    path = corpus_path(scale, base_dir)
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tbl = generate_corpus(CorpusParams.for_scale(scale))
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=20_000)
        os.replace(tmp, path)
    return path


def seed_url(host_index: int = 0) -> str:
    """Canonical seed: the root page of a host (reference takes one --url)."""
    return f"https://{_host(host_index)}/"


def scale_for_sf_dir(sf_dir: str) -> str:
    """Map the driver's sf dirs to corpus scales (TESTDATA.md tiering)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": "t1", "sf0.01": "t2", "sf0.1": "bench"}.get(name, "t1")
