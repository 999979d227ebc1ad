"""Port of pkg/retry/retry_test.go:9-160 intents (SURVEY.md §5)."""

import random

import pytest

from go_crawler_ray.functions.retry import RetryConfig, retry_call


def _cfg(**kw):
    sleeps: list[float] = []
    kw.setdefault("sleep", sleeps.append)
    kw.setdefault("rng", random.Random(0))
    return RetryConfig(**kw), sleeps


def test_success_single_call():
    calls = []
    cfg, _ = _cfg(max_attempts=3)
    assert retry_call(lambda: calls.append(1) or "ok", cfg) == "ok"
    assert len(calls) == 1


def test_failure_exactly_max_attempts():
    calls = []

    def fn():
        calls.append(1)
        raise ValueError("boom")

    cfg, _ = _cfg(max_attempts=4, delay=0.01)
    with pytest.raises(ValueError):
        retry_call(fn, cfg)
    assert len(calls) == 4


def test_non_retryable_short_circuits():
    calls = []

    def fn():
        calls.append(1)
        raise KeyError("fatal")

    cfg, _ = _cfg(max_attempts=5, retryable=lambda e: not isinstance(e, KeyError))
    with pytest.raises(KeyError):
        retry_call(fn, cfg)
    assert len(calls) == 1


def test_called_at_least_once_even_with_never_retryable():
    calls = []
    cfg, _ = _cfg(max_attempts=1, retryable=lambda e: False)
    assert retry_call(lambda: calls.append(1) or 7, cfg) == 7
    assert len(calls) == 1


def test_backoff_and_jitter_bounds():
    def fn():
        raise ValueError

    cfg, sleeps = _cfg(max_attempts=4, delay=1.0, backoff_factor=2.0,
                       jitter_factor=0.1, max_delay=100.0)
    with pytest.raises(ValueError):
        retry_call(fn, cfg)
    # 3 sleeps: base 1, 2, 4 each inflated by up to 10%
    assert len(sleeps) == 3
    for base, got in zip([1.0, 2.0, 4.0], sleeps):
        assert base <= got <= base * 1.1


def test_max_delay_cap():
    def fn():
        raise ValueError

    cfg, sleeps = _cfg(max_attempts=3, delay=10.0, backoff_factor=10.0,
                       jitter_factor=0.0, max_delay=0.5)
    with pytest.raises(ValueError):
        retry_call(fn, cfg)
    assert sleeps == [0.5, 0.5]


def test_config_validation():
    with pytest.raises(ValueError):
        RetryConfig(max_attempts=0)
    with pytest.raises(ValueError):
        RetryConfig(jitter_factor=1.5)
