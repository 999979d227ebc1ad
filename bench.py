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


def host_probe() -> float:
    """Effective memory-copy bandwidth (MB/s) of a fixed 32 MB numpy
    copy, measured immediately before the timed runs. This host has
    noisy-neighbor phases where copy bandwidth drops 30-50x while
    compute-bound work is unaffected (see BASELINE.md §host noise);
    the probe lets any recorded run be read against the host state it
    ran under. Quiet ≈ 2,000-10,000 MB/s; loud windows measure < 200."""
    import numpy as np

    a = np.zeros((2000, 2000))          # 32 MB
    t0 = time.perf_counter()
    b = a.copy()
    dt = time.perf_counter() - t0
    del b
    return round(64 / dt, 1)            # 32 MB read + 32 MB write


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    only = os.environ.get("BENCH_ONLY", "")
    probe = host_probe()

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
    # BENCH_SCALE overrides the corpus tier (run_scaling uses the 2x
    # "benchxl" drain so the fixed per-round costs amortize; the default
    # headline stays on "bench" for round-over-round comparability)
    scale = os.environ.get("BENCH_SCALE") or scale_for_sf_dir(sf_dir)
    corpus = pq.read_table(ensure_corpus(scale))   # cached after first build

    crawler = Crawler(corpus, CrawlConfig(
        max_count=1 << 30, max_file_size=None,
        num_seen_shards=max(4, num_cpus // 4),
        fetch_concurrency=num_cpus, batch_size=4096,
        checkpoint_dir=f"/dev/shm/graft_bench_ckpt_{num_cpus}",  # docs stream to per-worker files; shm stands in for the per-node disks a real cluster scales with
        write_docs=True, localize=True, enrich_docs=True,
        snapshot_seen=False,    # don't haul the seen set onto the driver
        # object-store-resident frontier (the 10^10 regime); override
        # with GRAFT_FRONTIER_REFS=0 to time the table-mode path
        frontier_refs=os.environ.get("GRAFT_FRONTIER_REFS", "1") == "1"))

    # untimed warm-up: run the fused fetch/parse/save stage over a fake
    # frontier wide enough to spawn EVERY worker (one cold worker costs
    # ~1.5s of imports + cache builds; cold-start scales with num_cpus and
    # would otherwise invert the scaling comparison — the guide's "warm
    # the cache with one untimed read first" rule)
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from go_crawler_ray.pipelines.crawl import _FetchFn, _ParseFn, _SaveFn

    shutil.rmtree(crawler.cfg.checkpoint_dir, ignore_errors=True)
    os.makedirs(crawler.docs_dir, exist_ok=True)
    wn = num_cpus * 512
    w_urls = corpus.column("doc_id").to_pylist()[:wn]
    wn = len(w_urls)
    warm_tbl = pa.table({
        "url": w_urls, "seq": np.arange(wn),
        "kind": ["page"] * wn,
        "parent_seq": np.full(wn, -1, dtype=np.int64),
        "position": np.zeros(wn, dtype=np.int32),
        "depth": np.zeros(wn, dtype=np.int32),
        "priority": np.zeros(wn, dtype=np.int32),
        "host": [""] * wn,
    })
    step = -(-wn // (2 * num_cpus))
    slices = [warm_tbl.slice(i, step) for i in range(0, wn, step)]
    (rd.from_arrow(slices)
     .map_batches(_FetchFn(crawler.corpus_ref, crawler.cfg),
                  batch_format="pyarrow", batch_size=4096,
                  concurrency=num_cpus)
     .map_batches(_ParseFn(True), batch_format="pyarrow", batch_size=4096)
     .map_batches(_SaveFn(True, True, enrich=True), batch_format="pyarrow",
                  batch_size=4096)
     .count())
    shutil.rmtree(crawler.cfg.checkpoint_dir, ignore_errors=True)
    os.makedirs(crawler.docs_dir, exist_ok=True)

    # BENCH_MODE=drain: the BASELINE.json metric shape — drain a large
    # SEEDED frontier (every corpus URL pushed at once: the steady-state
    # giant-round regime of a 10^10-URL frontier). Default: BFS discovery
    # crawl from one seed (the reference's own workload).
    # per-query host probes: one bandwidth snapshot immediately BEFORE
    # each timed query plus one after the last — a single pre-run probe
    # cannot certify an ~80 s multi-query run on a host whose loud
    # phases start mid-session (round-3 lesson), so every recorded
    # number now carries the host state it ran under
    probes: dict[str, float] = {}
    probes["crawl_drain"] = host_probe()
    if os.environ.get("BENCH_MODE", "") == "drain":
        seeds = corpus.column("doc_id").to_pylist()
        t0 = time.time()
        result = crawler.run(seeds, max_rounds=2)
    else:
        t0 = time.time()
        result = crawler.run([seed_url(0)])
    headline = time.time() - t0
    urls = result.visit_order.num_rows
    crawler.shutdown()
    shutil.rmtree(crawler.cfg.checkpoint_dir, ignore_errors=True)
    queries["crawl_drain"] = round(headline, 3)

    urls_per_sec = round(urls / headline, 1)

    if not only:
        from go_crawler_ray.pipelines import ann as _ann
        from go_crawler_ray.pipelines import dedup as _dedup
        from go_crawler_ray.pipelines import graph as _graph
        from go_crawler_ray.pipelines import relational as _rel
        from go_crawler_ray.pipelines import sampling as _sample
        from go_crawler_ray.pipelines import textproc as _text

        for name, fn in [
            ("pricing_summary", _rel.pricing_summary),
            ("segment_revenue", _rel.segment_revenue),
            ("hourly_event_stats", _rel.hourly_event_stats),
            ("user_sessions", _rel.user_sessions),
            ("text_quality", _text.quality_scores),
            ("text_vocab_topk", _sample.vocab_topk),
            ("sample_docs", _sample.sample_docs),
            ("decontaminate", _sample.decontaminate),
            ("epoch_shuffle", _sample.epoch_shuffle),
            ("event_asof_join", _rel.event_asof_join),
            ("revenue_percentiles", _rel.revenue_percentiles),
            ("pack_sequences", _sample.pack_sequences),
            ("text_surprisal", _text.unigram_surprisal),
            ("sample_per_group", _sample.sample_per_group),
            ("decontaminate_ngrams", _sample.decontaminate_ngrams),
            ("dedup_exact", _dedup.exact_dedup),
            ("dedup_paragraphs", _dedup.paragraph_dedup),
            ("dedup_minhash_clusters", _dedup.minhash_clusters),
            ("dedup_ngram_jaccard", _dedup.ngram_jaccard_pairs),
            ("dedup_dup_spans", _dedup.duplicate_ngram_spans),
            ("dedup_embedding_clusters", _dedup.embedding_clusters),
            ("ann_brute_force_topk", _ann.brute_force_topk),
            ("graph_components", _graph.components),
            ("graph_pagerank", _graph.pagerank),
        ]:
            probes[name] = host_probe()
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
        "host_probe_mb_s": probe,
        "query_probes_mb_s": probes,
        "host_probe_end_mb_s": host_probe(),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """The N-vs-4N-cluster criterion, in-sandbox: the same seeded-frontier
    drain at num_cpus=N and num_cpus=4N in fresh processes; efficiency =
    (t_N / t_4N) / 4.

    N defaults to 1 (so 4N=4). This box advertises 32 schedulable CPUs
    but saturates memory bandwidth well below 32-way parallelism for
    string/Arrow-heavy work (measured: a fixed 24k-row fetch+parse+save
    pipeline runs ~1.4x SLOWER under a 32-CPU session than an 8-CPU one),
    so 8->32 measures the memory wall, not the engine. 2->8 stays inside
    the bandwidth envelope; both results are recorded in BASELINE.md.
    Override with GRAFT_SCALE_N."""
    from go_crawler_ray.sources.corpus import ensure_corpus

    scale = os.environ.get("BENCH_SCALE", "benchxl")
    os.environ["BENCH_SCALE"] = scale
    ensure_corpus(scale)                      # untimed one-time generation
    n_lo = int(os.environ.get("GRAFT_SCALE_N", "1"))
    n_hi = 4 * n_lo

    repeats = int(os.environ.get("GRAFT_SCALE_REPEATS", "3"))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   BENCH_ONLY="crawl", BENCH_MODE="drain")
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # The sandbox host has intermittent noisy-neighbor interference
    # (~5% historical CPU steal; occasional multi-minute 2-3x slowdown
    # phases). Running all N-CPU repeats then all 4N-CPU repeats lets a
    # loud phase hit ONE level only and corrupt the ratio, so each
    # repeat is a SANDWICH — 4N, N, 4N — bracketing the long N run with
    # the short 4N runs: noise is strictly additive, so min(4N_before,
    # 4N_after) is the principled estimate of the true 4N time within
    # that window, and a large spread between the two brackets marks the
    # window itself as loud. The HEADLINE efficiency is the MEDIAN of
    # valid pairs — one-sided rejection plus max-of-N would be a
    # selection-biased estimator; the max is reported alongside, with
    # every pair.
    pairs = []
    for _ in range(repeats):
        hi_a = run(n_hi)
        lo = run(n_lo)
        hi_b = run(n_hi)
        hi = hi_a if hi_a["value"] <= hi_b["value"] else hi_b
        spread = abs(hi_a["value"] - hi_b["value"]) / hi["value"]
        eff = (lo["value"] / hi["value"]) / (n_hi / n_lo)
        pairs.append((eff, lo, hi, spread))
    # Window-validity criteria (two-sided — this rejects WINDOWS, not
    # outcomes): (a) efficiency > 1 is physically impossible for this
    # workload — the noise hit the N-CPU run only; (b) the two 4N
    # brackets disagreeing by >25% means the environment changed inside
    # the window, so the N run in between is uninterpretable.
    valid = [p for p in pairs if p[0] <= 1.0 and p[3] <= 0.25]
    if not valid:       # every window corrupted: take the quietest pair
        valid = [min(pairs, key=lambda p: p[1]["value"] + p[2]["value"])]
    valid.sort(key=lambda p: p[0])
    med_eff, med_lo, med_hi, _ = valid[len(valid) // 2]
    best_eff = valid[-1][0]
    return {
        "cpus": [n_lo, n_hi],
        f"sec_{n_lo}": med_lo["value"], f"sec_{n_hi}": med_hi["value"],
        "urls": med_lo["urls"],
        f"urls_per_sec_{n_lo}": med_lo["urls_per_sec"],
        f"urls_per_sec_{n_hi}": med_hi["urls_per_sec"],
        "scaling_efficiency": round(med_eff, 3),     # median valid pair
        "best_pair_efficiency": round(best_eff, 3),
        "all_pairs": [round(p[0], 3) for p in pairs],
        "bracket_spreads": [round(p[3], 3) for p in pairs],
        "valid_pairs": [round(p[0], 3) for p in valid],
        # per-pair (N-run, 4N-run) host memory-bandwidth probes, MB/s —
        # reads loud windows directly (quiet ≈ thousands, loud < 200)
        "probes": [[p[1].get("host_probe_mb_s"),
                    p[2].get("host_probe_mb_s")] for p in pairs],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
