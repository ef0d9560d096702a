"""Serving engine soak + crash recovery.

Round-3 close-out made the scheduler fail loudly on death; this round makes
death survivable: ``max_restarts`` crash recoveries per sliding window reset
slot/device state and requeue-or-fail in-flight work (engine._recover).
The soak test hammers the engine with randomized admit/cancel/deadline/
eos/sampling traffic under a leak watch — slot-state leaks (pending
records, Request refs, histogram rows) that unit tests can't see.

Soak length scales with CLEARCAM_SOAK_REQUESTS (default 120, a ~1-minute
CPU run; set 5000+ for an hours-long soak on a real host). The reference
has no serving engine to soak — its generations serialize onto the main
loop (/root/reference/clearcam.py:1214-1226)."""
import gc
import os
import time
import tracemalloc
import weakref

import numpy as np
import pytest

from clearcam_tpu.models import llm
from clearcam_tpu.serving import ServingEngine
from clearcam_tpu.serving.engine import _FREE

from test_llm import tiny_cfg
from test_serving import _solo


def _flaky(eng, fail_on):
    """Wrap eng.decode_all to raise on the Nth call (1-based)."""
    orig = eng.decode_all
    calls = {"n": 0}

    def wrapper(*a, **k):
        calls["n"] += 1
        if calls["n"] in fail_on:
            raise RuntimeError("injected decode failure")
        return orig(*a, **k)

    eng.decode_all = wrapper
    return calls


def test_recovery_requeues_unobserved_requests():
    """A crash before any token materialized requeues the in-flight
    requests; after the scheduler restart they complete with EXACTLY
    their solo greedy output (fresh state, nothing poisoned survives)."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    # sync_lag=4: tokens materialize late, so a crash at decode call 2
    # happens before any client-observed token -> both requeue
    eng = ServingEngine(params, cfg, n_slots=2, max_restarts=3, sync_lag=4)
    _flaky(eng, fail_on={2})
    eng.start()
    r1 = eng.submit([1, 2, 3, 4, 5], max_new=6)
    r2 = eng.submit([9, 8, 7], max_new=5)
    assert r1.wait(30) == _solo(params, cfg, [1, 2, 3, 4, 5], 6)
    assert r2.wait(30) == _solo(params, cfg, [9, 8, 7], 5)
    assert not r1.failed and not r2.failed
    assert eng.stats["scheduler_restarts"] == 1
    # engine is healthy: a fresh request also matches solo
    r3 = eng.submit([5, 5], max_new=4)
    assert r3.wait(30) == _solo(params, cfg, [5, 5], 4)
    eng.close()


def test_recovery_fails_streamed_requests():
    """A request that already streamed tokens cannot silently restart
    mid-stream: it completes failed=True with its partial tokens (a valid
    solo prefix); a later request runs clean on the reset state."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    # sync_lag=0 fetch_every=1: tokens materialize every step, so by
    # decode call 6 the request has observed tokens -> fail, not requeue
    eng = ServingEngine(params, cfg, n_slots=1, max_restarts=3,
                        sync_lag=0, fetch_every=1)
    _flaky(eng, fail_on={6})
    eng.start()
    r1 = eng.submit([1, 2, 3], max_new=12)
    toks = r1.wait(30)
    assert r1.failed and 0 < len(toks) < 12
    assert toks == _solo(params, cfg, [1, 2, 3], 12)[:len(toks)]
    r2 = eng.submit([7, 1, 7, 1], max_new=4)
    assert r2.wait(30) == _solo(params, cfg, [7, 1, 7, 1], 4)
    assert not r2.failed
    eng.close()


def test_restart_budget_exhaustion_fails_loudly():
    """More crashes than max_restarts inside the window -> _fail_all:
    waiters unblock failed, further submits raise (round-3 behavior)."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=1, max_restarts=1)
    _flaky(eng, fail_on={1, 2})          # crash, recover, crash again
    eng.start()
    r = eng.submit([1, 2, 3], max_new=4)
    r.wait(30)
    assert r.failed
    with pytest.raises(RuntimeError):
        eng.submit([1], max_new=1)
    eng.close()


def test_restart_window_slides():
    """Old restart marks age out: two crashes farther apart than the
    window both recover even with max_restarts=1."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=1, max_restarts=1,
                        restart_window_s=0.05)
    calls = _flaky(eng, fail_on={1})
    eng.start()
    r1 = eng.submit([1, 2, 3], max_new=4)
    assert r1.wait(30) == _solo(params, cfg, [1, 2, 3], 4)
    # drain fully (lag-window junk steps still call decode_all after r1
    # retires) and let the first restart mark age out of the window
    deadline = time.monotonic() + 20
    while eng._has_work() and time.monotonic() < deadline:
        time.sleep(0.01)
    time.sleep(0.1)
    calls["n"] = 0                        # arm the next injected failure
    r2 = eng.submit([5, 5], max_new=4)
    assert r2.wait(30) == _solo(params, cfg, [5, 5], 4)
    assert eng.stats["scheduler_restarts"] == 2
    eng.close()


def _random_request(rng, eng, cfg, clean_bias=0.5):
    """Submit one randomized request; returns (request, expect) where
    expect is ("solo", prompt, max_new, eos) for greedy/no-penalty
    requests whose tokens must be an exact solo prefix, else None."""
    plen = int(rng.integers(1, 20))
    prompt = [int(t) for t in rng.integers(1, cfg.vocab_size, plen)]
    max_new = int(rng.integers(1, min(10, cfg.max_context - plen)))
    kw = {}
    clean = rng.random() < clean_bias
    eos = None
    if not clean:
        pick = rng.random()
        if pick < 0.25:
            kw["temperature"] = 0.8
            kw["seed"] = int(rng.integers(1 << 20))
            kw["top_k"] = int(rng.integers(2, 16))
        elif pick < 0.5:
            kw["repetition_penalty"] = 1.3
        elif pick < 0.75:
            kw["logit_bias"] = {int(rng.integers(cfg.vocab_size)): -100.0}
        else:
            kw["logprobs"] = 2
            clean = True                  # logprobs never change outputs
    if rng.random() < 0.3:
        eos = int(rng.integers(1, cfg.vocab_size))
    if rng.random() < 0.1:
        kw["timeout_s"] = float(rng.random() * 0.02)
    r = eng.submit(prompt, max_new=max_new, eos_id=eos, **kw)
    return r, (("solo", tuple(prompt), max_new, eos) if clean else None)


def _drive(eng, rng, params, cfg, n_requests, inject_every=0):
    """Inline soak driver mimicking start()'s loop (step + recover-on-
    crash), with randomized admission/cancellation interleaved."""
    if inject_every:
        orig = eng.decode_all
        calls = {"n": 0}

        def sometimes(*a, **k):
            calls["n"] += 1
            if calls["n"] % inject_every == 0:
                raise RuntimeError("injected soak failure")
            return orig(*a, **k)

        eng.decode_all = sometimes

    reqs, submitted = [], 0
    while submitted < n_requests or eng.has_work():
        if submitted < n_requests and rng.random() < 0.4:
            reqs.append(_random_request(rng, eng, cfg))
            submitted += 1
        live = [r for r, _ in reqs if not r.done]
        if live and rng.random() < 0.04:
            eng.cancel(live[int(rng.integers(len(live)))])
        try:
            eng.step()
        except Exception:
            assert eng._recover(), "restart budget exhausted mid-soak"
    return reqs


def test_serving_soak():
    """Randomized soak: every request terminates, clean greedy requests'
    tokens are exact solo prefixes (equal unless cancelled/timed out/
    failed), slot state drains to empty, completed Requests are not
    leaked, and steady-state Python memory does not grow."""
    n = int(os.environ.get("CLEARCAM_SOAK_REQUESTS", "120"))
    cfg = tiny_cfg(max_context=64)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=3, max_restarts=64,
                        sync_lag=2, fetch_every=3)
    rng = np.random.default_rng(0)

    # warmup half: compiles graphs, fills caches/pools
    reqs = _drive(eng, rng, params, cfg, n // 2)
    gc.collect()
    tracemalloc.start()
    base = tracemalloc.take_snapshot()
    # measured half under the leak watch, with crash recoveries mixed in
    reqs += _drive(eng, rng, params, cfg, n - n // 2, inject_every=97)
    gc.collect()
    growth = sum(s.size_diff for s in
                 tracemalloc.take_snapshot().compare_to(base, "filename"))
    tracemalloc.stop()

    # -- termination + per-request correctness ------------------------------
    solo_cache = {}
    checked = 0
    for r, expect in reqs:
        assert r.done
        if expect is None:
            continue
        key = expect[1:]
        # solo generation is the expensive part — sample a bounded number
        if key not in solo_cache and checked >= 15:
            continue
        if key not in solo_cache:
            solo_cache[key] = _solo(params, cfg, list(key[0]), key[1],
                                    eos_id=key[2])
            checked += 1
        want = solo_cache[key]
        if r.timed_out or r.failed or len(r.tokens) < len(want):
            assert r.tokens == want[:len(r.tokens)], (r.tokens, want)
        else:
            assert r.tokens == want, (r.tokens, want)
    assert checked >= 10

    # -- slot state fully drained -------------------------------------------
    assert all(p == _FREE for p in eng.phase)
    assert all(r is None for r in eng.req)
    assert not eng._pending and not eng._acc
    assert not eng._waiting and not eng._cancel
    assert all(len(h) <= cfg.max_context for h in eng.hist)
    assert eng.stats["scheduler_restarts"] > 0   # recovery actually ran

    # -- no Request leak: engine holds no refs once retired -----------------
    refs = [weakref.ref(r) for r, _ in reqs]
    del reqs, r
    gc.collect()
    alive = sum(1 for w in refs if w() is not None)
    assert alive == 0, f"{alive} retired Requests still referenced"

    # -- steady-state memory: second half must not grow the heap ------------
    assert growth < 2 << 20, f"python heap grew {growth} bytes during soak"
