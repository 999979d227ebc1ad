"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def unit_corpus():
    """Tiny hand-checkable corpus (FIXTURES.md 'unit' scale)."""
    from go_crawler_ray.sources.corpus import CorpusParams, generate_corpus

    return generate_corpus(CorpusParams.for_scale("unit"))


@pytest.fixture(scope="session")
def t1_corpus():
    from go_crawler_ray.sources.corpus import CorpusParams, generate_corpus

    return generate_corpus(CorpusParams.for_scale("t1"))
