"""Continuous-batching serving engine: exactness vs solo generation under
staggered admission, slot reuse, SSM/hybrid stacks, int8 KV, and the
per-row-position Pallas decode kernel.

The reference serializes generations one at a time onto its main loop
(clearcam.py:1214-1226); the engine serves them concurrently from one
cache — these tests pin that every request's greedy output is EXACTLY what
it would have been alone (per-row positions + park policy leak nothing
across slots)."""
import jax.numpy as jnp

from clearcam_tpu.models import llm
from clearcam_tpu.serving import ServingEngine

from test_llm import tiny_cfg


def _solo(params, cfg, prompt, n, eos_id=None):
    out = []
    for tok in llm.Transformer(params, cfg, seed=0).generate(
            list(prompt), temperature=0.0, max_new=n):
        out.append(tok)
        if eos_id is not None and tok == eos_id:
            break
    return out


def test_staggered_requests_match_solo():
    """Requests submitted while others are mid-flight (including a
    multi-chunk prompt that interleaves prefill chunks between decode
    steps) each produce exactly their solo greedy output."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2)

    r1 = eng.submit([1, 2, 3, 4, 5], max_new=8)
    for _ in range(3):                       # r1 prefills + decodes a bit
        eng.step()
    long_prompt = list(range(1, 41))         # 40 tokens -> 2 prefill chunks
    r2 = eng.submit(long_prompt, max_new=6)
    eng.step()                               # r2 chunk 1 between r1 decodes
    r3 = eng.submit([9, 8, 7], max_new=5)    # queues: both slots busy
    eng.run_until_idle()

    assert r1.wait(1) == _solo(params, cfg, [1, 2, 3, 4, 5], 8)
    assert r2.wait(1) == _solo(params, cfg, long_prompt, 6)
    assert r3.wait(1) == _solo(params, cfg, [9, 8, 7], 5)


def test_slot_reuse_and_eos():
    """More requests than slots; eos retires early and the freed slot's
    next occupant is unaffected by the previous one's cache leftovers."""
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=4)
    # find an eos that actually occurs early for one prompt
    probe = _solo(params, cfg, [1, 2, 3], 4)
    eos = probe[1]
    eng = ServingEngine(params, cfg, n_slots=1)
    reqs = [eng.submit([1, 2, 3], max_new=6, eos_id=eos),
            eng.submit([5, 5], max_new=4),
            eng.submit([7, 1, 7, 1], max_new=4)]
    eng.run_until_idle()
    assert reqs[0].wait(1) == _solo(params, cfg, [1, 2, 3], 6, eos_id=eos)
    assert reqs[0].tokens[-1] == eos and len(reqs[0].tokens) == 2
    assert reqs[1].wait(1) == _solo(params, cfg, [5, 5], 4)
    assert reqs[2].wait(1) == _solo(params, cfg, [7, 1, 7, 1], 4)


def test_serving_ssm_hybrid():
    """SSM/attention hybrid: a freed slot's recurrent state is zeroed on
    the next occupant's first chunk, and dead rows never advance their
    recurrence during other slots' decode steps."""
    ssm = llm.SSMConfig(conv_kernel=3, state_size=8, group_count=2,
                        time_step_rank=4, inner_size=32)
    cfg = tiny_cfg(ssm=ssm, full_attention_interval=2, qk_norm=8)
    params = llm.init_params(cfg, seed=7)
    eng = ServingEngine(params, cfg, n_slots=2)
    r1 = eng.submit([1, 2, 3, 4, 5], max_new=5)
    for _ in range(2):
        eng.step()
    r2 = eng.submit([9, 8, 7], max_new=5)
    r3 = eng.submit([2, 7], max_new=4)       # reuses whichever slot frees
    eng.run_until_idle()
    assert r1.wait(1) == _solo(params, cfg, [1, 2, 3, 4, 5], 5)
    assert r2.wait(1) == _solo(params, cfg, [9, 8, 7], 5)
    assert r3.wait(1) == _solo(params, cfg, [2, 7], 4)


def test_serving_kv_quant():
    """int8 KV cache serving: identical writes at identical positions make
    the engine's output equal generate_batch's kv_quant oracle."""
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=4)
    oracle = llm.generate_batch(params, cfg, [[1, 2, 3, 4, 5]], max_new=5,
                                kv_quant=True)[0]
    eng = ServingEngine(params, cfg, kv_quant=True, n_slots=2)
    r = eng.submit([1, 2, 3, 4, 5], max_new=5)
    eng.run_until_idle()
    assert r.wait(1) == oracle


def test_serving_pallas_decode_matches_xla():
    """Per-row-position Pallas decode (interpret mode): rows at different
    absolute positions, reads bounded by max(pos) — token-exact vs XLA."""
    cfg = tiny_cfg(head_dim=128, rope_dim=128, v_head_dim=128, n_heads=4,
                   n_kv_heads=2, max_context=512)
    params = llm.init_params(cfg, seed=6)

    def run(**kw):
        eng = ServingEngine(params, cfg, n_slots=2,
                            state_dtype=jnp.bfloat16, **kw)
        r1 = eng.submit([1, 2, 3, 4, 5], max_new=5)
        for _ in range(2):
            eng.step()
        r2 = eng.submit([9, 8, 7], max_new=4)   # joins at a LOWER position
        eng.run_until_idle()
        return r1.wait(1), r2.wait(1)

    assert run(use_pallas_decode=True, interpret=True) == run()


def test_sync_lag_invariance():
    """Lagged token materialization (device-chained sampling, late EOS
    discovery) must not change any request's output — only when the host
    learns it. Junk steps decoded past an undiscovered EOS are dropped by
    the occupancy-epoch filter and their cache writes never become
    attendable."""
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=4)
    probe = _solo(params, cfg, [1, 2, 3], 4)
    eos = probe[1]                       # retire early -> junk steps happen

    def run(lag):
        eng = ServingEngine(params, cfg, n_slots=2, sync_lag=lag)
        rs = [eng.submit([1, 2, 3], max_new=6, eos_id=eos),
              eng.submit([5, 5], max_new=5),
              eng.submit([7, 1, 7, 1], max_new=4)]
        eng.run_until_idle()
        return [r.wait(1) for r in rs]

    assert run(0) == run(4) == run(9)


def test_serving_background_thread():
    """submit() from the client side while the scheduler runs on its own
    daemon thread (the production mode for NVR Qwen summaries)."""
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2).start()
    try:
        rs = [eng.submit(p, max_new=4)
              for p in ([1, 2, 3], [4, 5], [6, 7, 8, 9])]
        outs = [r.wait(30) for r in rs]
    finally:
        eng.close()
    for p, o in zip([[1, 2, 3], [4, 5], [6, 7, 8, 9]], outs):
        assert o == _solo(params, cfg, p, 4)
