"""Application-level retry with exponential backoff + jitter.

Semantics pinned to the reference generic retry (pkg/retry/retry.go:23-63,
defaults retry.go:82-93):
- the function is called at least once regardless of config;
- on success the result is returned immediately;
- a non-retryable error (per ``retryable``) short-circuits with that error;
- otherwise up to ``max_attempts`` calls, sleeping
  ``delay * backoff_factor**attempt`` plus uniform jitter up to
  ``jitter_factor`` of that delay, capped at ``max_delay``, between calls;
- after the last failed attempt the last error is raised.

This is the *in-UDF* retry layer for per-record transient errors (wrapped
around fetch and save, cmd/crawler/main.go:150-156, 277-283 — NOT around
parse). Worker-death resilience is Ray's own task/actor retry layer;
both exist deliberately (SURVEY.md §2.12 R1).

``rng`` is injectable so tests and deterministic pipelines can fix jitter.
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass, field
from typing import Callable, TypeVar

T = TypeVar("T")


@dataclass
class RetryConfig:
    max_attempts: int = 3
    delay: float = 1.0            # seconds (reference default 1s, config.go:33)
    max_delay: float = 3.0        # cap (retry.go:88)
    backoff_factor: float = 1.0   # 1.0 = constant delay (retry.go:89)
    jitter_factor: float = 0.1    # uniform extra in [0, jitter*delay] (retry.go:90)
    retryable: Callable[[BaseException], bool] = field(default=lambda e: True)
    sleep: Callable[[float], None] = field(default=time.sleep)
    rng: random.Random = field(default_factory=random.Random)

    def __post_init__(self):
        if self.max_attempts < 1:
            raise ValueError("max_attempts must be >= 1")
        if self.delay < 0 or self.backoff_factor < 0:
            raise ValueError("delay/backoff_factor must be >= 0")
        if not (0 <= self.jitter_factor <= 1):
            raise ValueError("jitter_factor must be in [0, 1]")


def retry_call(fn: Callable[[], T], config: RetryConfig | None = None) -> T:
    """Run ``fn`` with the reference's retry policy; raise the last error."""
    cfg = config or RetryConfig()
    last: BaseException | None = None
    for attempt in range(cfg.max_attempts):
        try:
            return fn()
        except BaseException as e:  # noqa: BLE001 — policy decides retryability
            last = e
            if not cfg.retryable(e):
                raise
            if attempt + 1 < cfg.max_attempts:
                d = cfg.delay * (cfg.backoff_factor ** attempt)
                d += d * cfg.rng.random() * cfg.jitter_factor
                cfg.sleep(min(d, cfg.max_delay))
    assert last is not None
    raise last
