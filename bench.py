"""Benchmark harness.

Headline: frontier-drain throughput (URLs fetched+deduped/sec) of the
BFS crawl over the bench-scale synthetic corpus — the BASELINE.json
metric — plus per-operator timings of the breadth pipelines over
$GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "urls_per_sec": ...}

--scaling: runs the headline crawl twice in fresh processes
(num_cpus=8 then num_cpus=32) on the same input and reports both
throughputs + scaling efficiency (the sandbox stand-in for the
N-vs-4N-node criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    only = os.environ.get("BENCH_ONLY", "")

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.parquet as pq

    from go_crawler_ray.pipelines.crawl import Crawler, CrawlConfig
    from go_crawler_ray.sources.corpus import (ensure_corpus,
                                               scale_for_sf_dir, seed_url)

    queries: dict[str, float] = {}
    sf_tag = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")

    # ---- headline: frontier drain ----
    scale = scale_for_sf_dir(sf_dir)
    corpus = pq.read_table(ensure_corpus(scale))   # cached after first build
    t0 = time.time()
    crawler = Crawler(corpus, CrawlConfig(
        max_count=1 << 30, max_file_size=None,
        num_seen_shards=max(4, num_cpus // 4),
        fetch_concurrency=num_cpus, batch_size=4096,
        write_docs=True, localize=True))
    result = crawler.run([seed_url(0)])
    headline = time.time() - t0
    urls = result.visit_order.num_rows
    crawler.shutdown()
    queries["crawl_drain"] = round(headline, 3)

    urls_per_sec = round(urls / headline, 1)

    if not only:
        from go_crawler_ray.pipelines import ann as _ann
        from go_crawler_ray.pipelines import dedup as _dedup
        from go_crawler_ray.pipelines import relational as _rel
        from go_crawler_ray.pipelines import textproc as _text

        for name, fn in [
            ("pricing_summary", _rel.pricing_summary),
            ("segment_revenue", _rel.segment_revenue),
            ("hourly_event_stats", _rel.hourly_event_stats),
            ("user_sessions", _rel.user_sessions),
            ("text_quality", _text.quality_scores),
            ("dedup_exact", _dedup.exact_dedup),
            ("dedup_minhash_clusters", _dedup.minhash_clusters),
            ("ann_brute_force_topk", _ann.brute_force_topk),
        ]:
            t0 = time.time()
            fn(sf_dir)
            queries[name] = round(time.time() - t0, 3)

    out = {
        "metric": "frontier-drain throughput (URLs fetched+deduped/sec), "
                  "headline = crawl_drain wall sec",
        "value": queries["crawl_drain"],
        "unit": "sec",
        "queries": queries,
        "sf": float(sf_tag) if sf_tag.replace(".", "").isdigit() else sf_tag,
        "num_cpus": num_cpus,
        "urls": urls,
        "urls_per_sec": urls_per_sec,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Same crawl at 8 and 32 CPUs in fresh processes; efficiency =
    (t8/t32)/(32/8)."""
    # warm the corpus cache (untimed) so both runs measure compute, not
    # first-time corpus generation
    from go_crawler_ray.sources.corpus import ensure_corpus, scale_for_sf_dir

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ensure_corpus(scale_for_sf_dir(sf_dir))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_ONLY="crawl")
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (32 / 8)
    return {
        "sec_8": t_lo, "sec_32": t_hi,
        "urls": lo["urls"],
        "urls_per_sec_8": lo["urls_per_sec"],
        "urls_per_sec_32": hi["urls_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
