"""Autotune tests: cache convergence, plans, checksum invalidation
(reference tune/tuner.rs + tune_cache.rs test strategy)."""

import numpy as np
import pytest

from cubecl_tpu.tune import (
    LocalTuner,
    Tunable,
    TunableSet,
    TuneGroup,
    Tuner,
    checksum,
)


def _mk_set(calls):
    def key_fn(x):
        return ("k", len(x))

    ts = TunableSet("testset", key_fn)

    def slow(x):
        calls.append("slow")
        import time

        time.sleep(0.002)
        return x * 2

    def fast(x):
        calls.append("fast")
        return x * 2

    ts.with_tunable(slow, "slow")
    ts.with_tunable(fast, "fast")
    return ts


def test_tuner_picks_fastest_and_caches(client):
    calls = []
    ts = _mk_set(calls)
    tuner = Tuner(ts, client, level="minimal")
    tuner.cache.store = None  # in-memory only for this test
    tuner.cache.mem.clear()
    x = np.arange(8.0)
    r = tuner.execute(x)
    np.testing.assert_array_equal(r, x * 2)
    assert tuner.cache.get(("k", 8)) == 1  # fast wins
    calls.clear()
    tuner.execute(x)
    assert calls == ["fast"], "cache hit must run only the winner"


def test_tune_groups_prioritize():
    g_hi = TuneGroup("hi", lambda key: 10)
    g_lo = TuneGroup("lo", lambda key: 1)
    ts = TunableSet("g", lambda x: "k")
    ts.with_tunable(lambda x: 1, "a", group=g_lo)
    ts.with_tunable(lambda x: 2, "b", group=g_hi)
    ts.with_tunable(lambda x: 3, "c", group=g_hi, priority=5)
    batches = ts.plan("k")
    assert [t.name for t in batches[0]] == ["c", "b"]
    assert [t.name for t in batches[1]] == ["a"]


def test_checksum_changes_with_set():
    ts1 = TunableSet("s", lambda: 0).with_tunable(lambda: 1, "a")
    ts2 = TunableSet("s", lambda: 0).with_tunable(lambda: 1, "a") \
        .with_tunable(lambda: 2, "b")
    assert checksum(ts1) != checksum(ts2)


def test_persistent_cache_roundtrip(tmp_path):
    from cubecl_tpu.tune.cache import PersistentStore, TuneCache

    store = PersistentStore("t", path=str(tmp_path / "s.sqlite"))
    store.put("a", "1")
    assert store.get("a") == "1"
    store.delete("a")
    assert store.get("a") is None

    c = TuneCache.__new__(TuneCache)
    c.mem = {}
    c.checksum = "x"
    c.store = PersistentStore("tc", path=str(tmp_path / "s.sqlite"))
    c.put("key1", 2, "winner")
    c2 = TuneCache.__new__(TuneCache)
    c2.mem = {}
    c2.checksum = "x"
    c2.store = PersistentStore("tc", path=str(tmp_path / "s.sqlite"))
    c2._load()
    assert c2.get("key1") == 2
    # checksum mismatch -> stale entries ignored
    c3 = TuneCache.__new__(TuneCache)
    c3.mem = {}
    c3.checksum = "DIFFERENT"
    c3.store = PersistentStore("tc", path=str(tmp_path / "s.sqlite"))
    c3._load()
    assert c3.get("key1") is None


def test_autotuned_reduce(client):
    from cubecl_tpu.ops import reduce_sum_autotuned

    x = np.random.randn(1 << 13).astype(np.float32)
    h = client.create(x)
    out = reduce_sum_autotuned(client, h)
    np.testing.assert_allclose(client.read_one(out)[0], x.sum(), rtol=1e-4)
