"""CLI entry point — the reference's config surface (S6) on the Ray engine.

Mirrors internal/config.go:25-57: every setting comes from a CRAWLER_*
environment variable with a CLI flag override and the reference's
defaults (max-count 100, max-concurrent 10, timeout 30s, retry 3x/1s,
output-dir ./.tmp/, max-file-size 64 MiB, log-level info). New
engine-only settings (politeness, robots, seen shards, checkpoint dir)
get CRAWLER_*-style names too.

This is the one module that owns a Ray session (guarded init), mirroring
`ray job submit -- python -m go_crawler_ray --url ...` usage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from dataclasses import dataclass


def _env_str(name: str, default: str) -> str:
    return os.environ.get(name, default)


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    try:
        return int(v) if v is not None else default
    except ValueError:
        return default


def _env_float_seconds(name: str, default: float) -> float:
    """Durations: plain seconds or Go-style '30s'/'1m' suffixes."""
    v = os.environ.get(name)
    if v is None:
        return default
    v = v.strip().lower()
    try:
        if v.endswith("ms"):
            return float(v[:-2]) / 1000.0
        if v.endswith("s") and not v.endswith("ms"):
            return float(v[:-1])
        if v.endswith("m"):
            return float(v[:-1]) * 60.0
        return float(v)
    except ValueError:
        return default


@dataclass
class CliConfig:
    url: str
    max_count: int
    max_concurrent: int
    max_file_size: int
    timeout: float
    retry_attempts: int
    retry_delay: float
    output_dir: str
    log_level: str
    politeness_max_per_host: int
    robots: bool
    num_seen_shards: int
    checkpoint_dir: str
    write_tree: bool
    parse_html: bool


def load_config(argv: list[str] | None = None) -> CliConfig:
    p = argparse.ArgumentParser(
        prog="go_crawler_ray",
        description="Ray-Data-native web-crawl engine (reference-parity CLI)")
    p.add_argument("--url", default=_env_str("CRAWLER_URL", ""),
                   help="seed URL (required)")
    p.add_argument("--max-count", type=int,
                   default=_env_int("CRAWLER_MAX_COUNT", 100),
                   help="page budget (enqueue-time semantics)")
    p.add_argument("--max-concurrent", type=int,
                   default=_env_int("CRAWLER_MAX_CONCURRENT", 10),
                   help="per-stage parallelism (fetch concurrency)")
    p.add_argument("--max-file-size", type=int,
                   default=_env_int("CRAWLER_MAX_FILE_SIZE", 64 << 20))
    p.add_argument("--timeout", type=float,
                   default=_env_float_seconds("CRAWLER_TIMEOUT", 30.0))
    p.add_argument("--retry-attempts", type=int,
                   default=_env_int("CRAWLER_RETRY_ATTEMPTS", 3))
    p.add_argument("--retry-delay", type=float,
                   default=_env_float_seconds("CRAWLER_RETRY_DELAY", 1.0))
    p.add_argument("--output-dir",
                   default=_env_str("CRAWLER_OUTPUT_DIR", "./.tmp/"))
    p.add_argument("--log-level",
                   default=_env_str("CRAWLER_LOG_LEVEL", "info"),
                   choices=["debug", "info", "warn", "error"])
    p.add_argument("--politeness-max-per-host", type=int,
                   default=_env_int("CRAWLER_POLITENESS_MAX_PER_HOST", 0),
                   help="0 disables politeness (reference mode)")
    p.add_argument("--robots", action="store_true",
                   default=_env_str("CRAWLER_ROBOTS", "") == "1")
    p.add_argument("--num-seen-shards", type=int,
                   default=_env_int("CRAWLER_SEEN_SHARDS", 8))
    p.add_argument("--checkpoint-dir",
                   default=_env_str("CRAWLER_CHECKPOINT_DIR", ""))
    p.add_argument("--corpus",
                   default=_env_str("CRAWLER_CORPUS", ""),
                   help="corpus parquet path, or a scale name "
                        "(unit/t1/t2/bench) for the synthetic corpus")
    p.add_argument("--write-tree", action="store_true",
                   help="also write the localized file tree (S4 sink)")
    p.add_argument("--parse-html", action="store_true",
                   default=_env_str("CRAWLER_PARSE_HTML", "") == "1",
                   help="extract out-edges from raw HTML bytes with the "
                        "real parser instead of corpus span metadata")
    a = p.parse_args(argv)

    if not a.url:
        p.error("--url (or CRAWLER_URL) is required")
    if a.max_count < 0 or a.max_concurrent < 1:
        p.error("--max-count must be >= 0 and --max-concurrent >= 1")

    cfg = CliConfig(
        url=a.url, max_count=a.max_count, max_concurrent=a.max_concurrent,
        max_file_size=a.max_file_size, timeout=a.timeout,
        retry_attempts=a.retry_attempts, retry_delay=a.retry_delay,
        output_dir=a.output_dir, log_level=a.log_level,
        politeness_max_per_host=a.politeness_max_per_host,
        robots=a.robots, num_seen_shards=a.num_seen_shards,
        checkpoint_dir=a.checkpoint_dir, write_tree=a.write_tree,
        parse_html=a.parse_html,
    )
    cfg.corpus = a.corpus  # type: ignore[attr-defined]
    return cfg


def main(argv: list[str] | None = None) -> int:
    cfg = load_config(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from .pipelines.crawl import Crawler, CrawlConfig
    from .sources.corpus import ensure_corpus

    corpus_arg = getattr(cfg, "corpus", "") or "t1"
    corpus_path = (corpus_arg if os.path.exists(corpus_arg)
                   else ensure_corpus(corpus_arg))
    corpus = pq.read_table(corpus_path)

    ckpt = cfg.checkpoint_dir or os.path.join(cfg.output_dir, "checkpoint")
    crawler = Crawler(corpus, CrawlConfig(
        max_count=cfg.max_count,
        max_file_size=cfg.max_file_size,
        num_seen_shards=cfg.num_seen_shards,
        politeness_max_per_host=cfg.politeness_max_per_host or None,
        robots=cfg.robots,
        fetch_concurrency=cfg.max_concurrent,
        retry_attempts=cfg.retry_attempts,
        retry_delay=cfg.retry_delay,
        checkpoint_dir=ckpt,
        parse_html=cfg.parse_html,
    ))
    result = crawler.run([cfg.url])

    if cfg.write_tree:
        from .stages.save import write_localized_tree

        docs = crawler.docs_table()
        n = write_localized_tree(docs, os.path.join(cfg.output_dir, "site"))
        print(f"wrote {n} files under {cfg.output_dir}/site", file=sys.stderr)

    summary = {
        "urls_visited": result.visit_order.num_rows,
        "pages_queued": result.pages_queued,
        # seen size comes from the shard actors — the CLI never pulls the
        # full seen set onto the driver (snapshot_seen stays off)
        "seen": crawler.seen.total_size(),
        "rounds": result.rounds,
        "elapsed_sec": result.metrics.get("elapsed_sec"),
        "urls_per_sec": result.metrics.get("urls_per_sec"),
        "pages_fetched": result.metrics["pages_fetched"],
        "assets_fetched": result.metrics["assets_fetched"],
        "skipped_download": result.metrics["skipped_download"],
        "skipped_robots": result.metrics["skipped_robots"],
        "docs_dir": result.docs_dir,
        "checkpoint_dir": ckpt,
    }
    print(json.dumps(summary))
    crawler.shutdown()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
