"""go_crawler_ray — a Ray-Data-native web-crawl / data-processing engine.

A brand-new engine (NOT a port) with the query and data-processing
capabilities of the reference crawler ``gallyamow/go-crawler``, re-expressed
Ray-Data-first:

- the crawl frontier is a sequence of per-round ``ray.data.Dataset`` s of
  small frontier rows (url, seq, kind, ...) checkpointed to Parquet;
- fetch / parse / extract are vectorized ``map_batches`` stages over
  zero-copy Arrow batches (actor pools where state is held);
- the URL-seen set is a sharded actor pool (exact set + cuckoo filter),
  keyed by a salted host-hash so one hot host cannot own a shard;
- per-host politeness tokens and robots rules are [NEW] stateful actors
  (off by default so reference conformance is exactly testable);
- termination/budget is a driver BFS-round loop (the reference's
  ack-refcount quiescence, internal/queue.go:116-129, becomes
  "round produced zero accepted candidates or page budget exhausted").

Reference semantics are cited per-module as /root/reference/<file>:<lines>.
"""

__version__ = "0.1.0"
