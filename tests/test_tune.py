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


def test_local_tuner_keys_by_tunable_set(client):
    """Regression (round-3 fp8 autotune): LocalTuner must NOT reuse the
    first call's Tuner for a later call whose TunableSet differs — the
    stale key_fn closure computed the OLD key (cache hit) and silently ran
    the OLD candidates, so the new key was never recorded."""
    lt = LocalTuner("regress")
    ran = []

    def mk(tag):
        ts = TunableSet(f"regress", lambda x, _t=tag: ("k", _t))
        ts.with_tunable(lambda x, _t=tag: ran.append(_t) or x, f"only_{tag}")
        return ts

    lt.execute(client, mk("bf16"), np.arange(4.0))
    lt.execute(client, mk("fp8"), np.arange(4.0))
    assert "fp8" in ran, "second TunableSet's candidate never ran"
    t8 = lt.tuner_for(client, ("k", "fp8"))
    assert t8 is not None and t8.cache.mem.get(str(("k", "fp8"))) is not None, \
        "second key must be recorded under its own Tuner"


def test_tuner_zero_survivors_raises_with_reasons(client):
    """A tune where every candidate dies must raise with per-candidate
    reasons (round-3 regression: silent fallback hid the fp8 crash)."""
    ts = TunableSet("allfail", lambda x: "k")

    def boom(x):
        raise ValueError("candidate exploded")

    ts.with_tunable(boom, "boom")
    tuner = Tuner(ts, client, level="minimal")
    tuner.cache.store = None
    tuner.cache.mem.clear()
    with pytest.raises(RuntimeError) as ei:
        tuner._tune("k", np.arange(4.0))
    assert "boom" in str(ei.value) and "exploded" in str(ei.value)


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


def test_tuner_prunes_vmem_doomed_candidates(client):
    """A candidate whose kernels exceed the scoped-VMEM budget must be
    pruned during capture (before any AOT compile), not crash the tune
    (round-2 VERDICT: bench.py showed a mid-run Mosaic VMEM OOM)."""
    from cubecl_tpu import CubeCount, CubeDim, cube
    from cubecl_tpu.frontend import (ABSOLUTE_POS, ArrayArg, MutSlice,
                                     Slice, cast)
    from cubecl_tpu.ir.types import f32, i32

    @cube
    def gathered(src: Slice, idx: Slice, out: MutSlice):
        # data-dependent gather: the planner cannot window src, so the
        # whole buffer must be VMEM-resident
        j = cast(idx[ABSOLUTE_POS], i32)
        out[ABSOLUTE_POS] = src[j]

    @cube
    def windowed(src: Slice, idx: Slice, out: MutSlice):
        out[ABSOLUTE_POS] = src[ABSOLUTE_POS] * 1.0

    # 64MB f32: whole-resident (x2 double-buffered) busts even the raised
    # 100MB scoped-VMEM ceiling (round 2: emitter lifts the 16MB default)
    n = 16 * 1024 * 1024
    src = client.create(np.random.randn(n).astype(np.float32))
    small = client.create(np.random.randn(1024).astype(np.float32))
    idx = client.create(np.arange(1024, dtype=np.int32))
    out = client.empty((1024,), "float32")

    from cubecl_tpu.tune import TunableSet, Tuner

    ts = TunableSet("vmem_prune_test", lambda *a: "k")

    def doomed(_key=None):
        gathered.launch_unchecked(client, CubeCount(8),
                                  CubeDim.new_1d(128),
                                  ArrayArg(src), ArrayArg(idx),
                                  ArrayArg(out, mutable=True))

    def fine(_key=None):
        windowed.launch_unchecked(client, CubeCount(1),
                                  CubeDim.new_1d(8),
                                  ArrayArg(small, line_size=128),
                                  ArrayArg(idx),
                                  ArrayArg(out, mutable=True,
                                           line_size=128))

    ts.with_tunable(doomed, "doomed")
    ts.with_tunable(fine, "fine")
    tuner = Tuner(ts, client, level="minimal")
    tuner.cache.store = None
    tuner.cache.mem.clear()
    idx_won = tuner._tune("k", None)
    assert ts.tunables[idx_won].name == "fine"
    timings = tuner.cache.timings("k")
    assert "doomed" not in timings, "doomed candidate must be pruned"


def test_tuner_times_launch_candidates_via_capture(client):
    """Launch-sequence candidates are captured and slope-timed; the
    winner's cached timing must be device-plausible (>0, finite)."""
    import math

    from cubecl_tpu import CubeCount, CubeDim, cube
    from cubecl_tpu.frontend import ABSOLUTE_POS, ArrayArg, MutSlice, Slice

    @cube
    def scale2(a: Slice, out: MutSlice):
        out[ABSOLUTE_POS] = a[ABSOLUTE_POS] * 2.0

    a = client.create(np.arange(256, dtype=np.float32))
    o = client.empty((256,), "float32")

    from cubecl_tpu.tune import TunableSet, Tuner

    ts = TunableSet("capture_time_test", lambda *a: "k")

    def cand_cd8(_key=None):
        scale2.launch_unchecked(client, CubeCount(1), CubeDim.new_1d(8),
                                ArrayArg(a, line_size=32),
                                ArrayArg(o, mutable=True, line_size=32))

    ts.with_tunable(cand_cd8, "cd8")
    tuner = Tuner(ts, client, level="minimal")
    tuner.cache.store = None
    tuner.cache.mem.clear()
    widx = tuner._tune("k", None)
    per = tuner.cache.timings("k")["cd8"]
    assert math.isfinite(per) and per > 0
    # and executing for real still produces the right answer
    ts.tunables[widx].fn(None)
    np.testing.assert_array_equal(client.read_one(o),
                                  np.arange(256, dtype=np.float32) * 2)
