"""Cuckoo filter + sharded seen-set semantics (SURVEY.md §2.3 ST1, §2.7 D1)."""

import numpy as np
import pytest

from go_crawler_ray.state.cuckoo import CuckooFilter
from go_crawler_ray.state.politeness import apply_host_tokens, parse_robots
from go_crawler_ray.state.seen import _SeenShardImpl, shard_of


def test_h64_survives_crc32_collisions():
    """Regression (ADVICE r1): crc32 with two init seeds is affine in the
    init, so an equal-length crc collision collided in BOTH halves of the
    old 64-bit key. The forward+reversed construction must keep colliding
    strings apart."""
    import zlib

    from go_crawler_ray.stages.fetch import _hash_urls
    from go_crawler_ray.state.cuckoo import _h64

    rng = np.random.default_rng(0)
    seen: dict[int, str] = {}
    pair = None
    for _ in range(300_000):
        s = "".join(chr(97 + c) for c in rng.integers(0, 26, size=12))
        c = zlib.crc32(s.encode())
        if c in seen and seen[c] != s:
            pair = (seen[c], s)
            break
        seen[c] = s
    assert pair is not None, "no crc32 collision found (increase iterations)"
    a, b = pair
    assert _hash_urls([a])[0] != _hash_urls([b])[0]
    assert _h64(a.encode()) != _h64(b.encode())


class TestCuckoo:
    def test_add_contains(self):
        f = CuckooFilter(1024)
        urls = [f"https://h.example/p/{i}" for i in range(500)]
        assert all(f.add(u) for u in urls)
        assert all(u in f for u in urls)
        assert f.count == 500

    def test_no_false_negatives_vectorized(self):
        f = CuckooFilter(4096)
        urls = [f"https://h{i%7}.example/x/{i}" for i in range(2000)]
        for u in urls:
            f.add(u)
        assert f.contains_many(urls).all()

    def test_low_false_positive_rate(self):
        f = CuckooFilter(8192)
        for i in range(4000):
            f.add(f"https://h.example/in/{i}")
        probe = [f"https://h.example/out/{i}" for i in range(4000)]
        fp = f.contains_many(probe).sum() / len(probe)
        assert fp < 0.01, f"false positive rate {fp}"

    def test_remove(self):
        f = CuckooFilter(256)
        f.add("a")
        assert "a" in f
        assert f.remove("a")
        assert "a" not in f

    def test_serialization_roundtrip(self):
        f = CuckooFilter(512)
        for i in range(200):
            f.add(f"u{i}")
        g = CuckooFilter.from_bytes(f.to_bytes())
        assert all(f"u{i}" in g for i in range(200))

    def test_full_filter_returns_false(self):
        f = CuckooFilter(8, bucket_size=2)
        results = [f.add(f"item-{i}") for i in range(64)]
        assert not all(results)   # must report saturation, not corrupt


class TestSeenShard:
    def test_first_push_wins_in_batch(self):
        s = _SeenShardImpl("exact")
        got = s.check_and_insert(["a", "b", "a", "c", "b"])
        assert got.tolist() == [True, True, False, True, False]

    def test_cross_batch_membership(self):
        s = _SeenShardImpl("exact")
        s.check_and_insert(["a", "b"])
        assert s.check_and_insert(["b", "c"]).tolist() == [False, True]
        assert s.size() == 3

    def test_cuckoo_mode_agrees_with_exact(self):
        e, c = _SeenShardImpl("exact"), _SeenShardImpl("cuckoo",
                                                       cuckoo_capacity=1 << 14)
        urls = [f"https://h.example/{i % 700}" for i in range(2000)]
        for i in range(0, 2000, 100):
            batch = urls[i:i + 100]
            ge, gc = e.check_and_insert(batch), c.check_and_insert(batch)
            # cuckoo may false-positive (reject a novel URL) but never
            # double-accepts
            assert not (gc & ~ge).any()
            agree = (ge == gc).mean()
            assert agree > 0.99

    def test_bulk_restore(self):
        s = _SeenShardImpl("exact")
        s.bulk_restore(["x", "y"])
        assert s.check_and_insert(["x", "z"]).tolist() == [False, True]

    def test_snapshot_sorted(self):
        s = _SeenShardImpl("exact")
        s.check_and_insert(["c", "a", "b"])
        assert s.snapshot() == ["a", "b", "c"]

    def test_bad_mode(self):
        with pytest.raises(ValueError):
            _SeenShardImpl("bogus")


class TestShardRouting:
    def test_deterministic(self):
        assert shard_of("https://h.example/a", "h.example", 8) == \
            shard_of("https://h.example/a", "h.example", 8)

    def test_salting_spreads_hot_host(self):
        urls = [f"https://hot.example/p/{i}" for i in range(1000)]
        unsalted = {shard_of(u, "hot.example", 16, salt_k=1) for u in urls}
        salted = {shard_of(u, "hot.example", 16, salt_k=4) for u in urls}
        assert len(unsalted) == 1        # one hot host -> one shard: the problem
        assert len(salted) == 4          # salted over salt_k shards: the fix


class TestPoliteness:
    def test_parse_robots(self):
        body = "User-agent: *\nDisallow: /dir1/\nDisallow: /tmp\n# c\nAllow: /x\n"
        assert parse_robots(body) == ["/dir1/", "/tmp"]

    def test_host_tokens_lowest_seq_wins(self):
        hosts = np.array(["a", "a", "a", "b", "b"])
        seqs = np.array([5, 3, 9, 1, 2])
        got = apply_host_tokens(hosts, seqs, max_per_host=2)
        # host a: seqs 3,5 admitted, 9 deferred; host b: both admitted
        assert got.tolist() == [True, True, False, True, True]

    def test_host_tokens_zero(self):
        got = apply_host_tokens(np.array(["a"]), np.array([0]), 0)
        assert got.tolist() == [False]
