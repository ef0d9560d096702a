"""Speculative decoding INSIDE the continuous-batching engine: device-side
prompt-lookup drafts + (G+1)-token verify windows, 1..G+1 tokens per decode
dispatch (serving/engine.py spec_lookup=G, llm._make_spec_serving_fns).

The exactness bar is the same as test_serving.py: every greedy request's
output must EXACTLY equal its solo generation — drafting/acceptance may only
change how many dispatches it takes, never a single token. The solo
prompt-lookup analogue is models/llm.Transformer.generate:1283-1299
(reference speculative behavior: greedy-exact or nothing)."""
import numpy as np

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


def test_spec_staggered_matches_solo():
    """Staggered admission with spec windows on: every request exact vs
    solo, including a multi-chunk prompt interleaving prefill with other
    rows' verify windows."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2, spec_lookup=3)
    r1 = eng.submit([1, 2, 3, 4, 5], max_new=8)
    for _ in range(3):
        eng.step()
    long_prompt = list(range(1, 41))
    r2 = eng.submit(long_prompt, max_new=6)
    eng.step()
    r3 = eng.submit([9, 8, 7], max_new=5)
    eng.run_until_idle()
    assert r1.wait(1) == _solo(params, cfg, [1, 2, 3, 4, 5], 8)
    assert r2.wait(1) == _solo(params, cfg, long_prompt, 6)
    assert r3.wait(1) == _solo(params, cfg, [9, 8, 7], 5)


def test_spec_accepts_drafts_on_periodic_output():
    """Acceptance actually happens (not just exactness-by-single-token):
    tiny random models collapse into periodic greedy cycles, which the
    bigram lookup drafts correctly — so the engine must emit more tokens
    than it spends decode dispatches. sync_lag=0/fetch_every=1 so
    decode_steps counts no pipeline-junk steps."""
    cfg = tiny_cfg(max_context=160)
    params = llm.init_params(cfg, seed=4)
    solo = _solo(params, cfg, [1, 2, 3], 48)
    # precondition for the assertion: the solo output develops repetition
    # a bigram lookup can exploit (true for this seed; guard regressions)
    assert len(set(zip(solo, solo[1:]))) < len(solo) - 4, \
        "fixture lost its periodicity — pick another seed"
    eng = ServingEngine(params, cfg, n_slots=1, spec_lookup=4,
                        sync_lag=0, fetch_every=1)
    r = eng.submit([1, 2, 3], max_new=48)
    eng.run_until_idle()
    assert r.wait(1) == solo
    assert eng.stats["decode_steps"] < len(solo), \
        f'no acceptance: {eng.stats["decode_steps"]} steps for {len(solo)}'
    assert eng.stats["spec_emitted"] == len(solo)


def test_spec_eos_mid_window():
    """EOS discovered inside a verify window truncates the request there —
    accepted draft tokens past EOS are dropped, and the freed slot's next
    occupant is unaffected by the junk the device consumed past the stop."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    probe = _solo(params, cfg, [1, 2, 3], 6)
    eos = probe[2]
    eng = ServingEngine(params, cfg, n_slots=1, spec_lookup=4)
    r1 = eng.submit([1, 2, 3], max_new=12, eos_id=eos)
    r2 = eng.submit([7, 1, 7, 1], max_new=4)
    eng.run_until_idle()
    want = _solo(params, cfg, [1, 2, 3], 12, eos_id=eos)
    assert r1.wait(1) == want and r1.tokens[-1] == eos
    assert r2.wait(1) == _solo(params, cfg, [7, 1, 7, 1], 4)


def test_spec_lag_and_fetch_invariance():
    """sync_lag / fetch_every are throughput knobs: outputs are identical
    across settings (junk windows past retirement never leak)."""
    cfg = tiny_cfg(max_context=128)
    params = llm.init_params(cfg, seed=5)
    outs = []
    for lag, fe in [(0, 1), (2, 1), (6, 4)]:
        eng = ServingEngine(params, cfg, n_slots=2, spec_lookup=3,
                            sync_lag=lag, fetch_every=fe)
        rs = [eng.submit([1, 2, 3, 4], max_new=10),
              eng.submit([9, 8], max_new=10)]
        eng.run_until_idle()
        outs.append([r.wait(1) for r in rs])
    assert outs[0] == outs[1] == outs[2]


def test_spec_prefix_reuse():
    """A follow-up request extending prompt+reply reuses the retired
    slot's cache rows under spec decoding (the device ids/pos bookkeeping
    stays consistent with host history tracking)."""
    cfg = tiny_cfg(max_context=160)
    params = llm.init_params(cfg, seed=4)
    p1 = list(range(1, 40))                   # > 1 chunk
    eng = ServingEngine(params, cfg, n_slots=1, spec_lookup=3)
    r1 = eng.submit(p1, max_new=6)
    eng.run_until_idle()
    follow = p1 + r1.wait(1) + [11, 12]
    r2 = eng.submit(follow, max_new=6)
    eng.run_until_idle()
    assert r2.wait(1) == _solo(params, cfg, follow, 6)
    assert eng.stats["reused_tokens"] >= llm.CHUNK


def test_spec_mixed_temperature():
    """temperature>0 rows run un-speculated (1 sampled token per window)
    next to greedy rows; the greedy row stays exact, the stochastic row
    produces valid tokens of the requested length."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2, spec_lookup=3)
    rg = eng.submit([1, 2, 3, 4, 5], max_new=8)
    rt = eng.submit([5, 4, 3], max_new=8, temperature=1.0)
    eng.run_until_idle()
    assert rg.wait(1) == _solo(params, cfg, [1, 2, 3, 4, 5], 8)
    toks = rt.wait(1)
    assert len(toks) == 8 and all(0 <= t < cfg.vocab_size for t in toks)


def test_spec_kv_quant():
    """int8 KV cache composes with spec windows (quantize-on-write of the
    whole window, identical rows at identical positions)."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    oracle = llm.generate_batch(params, cfg, [[1, 2, 3, 4, 5]], max_new=6,
                                kv_quant=True)[0]
    eng = ServingEngine(params, cfg, n_slots=2, kv_quant=True,
                        spec_lookup=3)
    r = eng.submit([1, 2, 3, 4, 5], max_new=6)
    eng.run_until_idle()
    assert r.wait(1) == oracle


def test_spec_mla():
    """MLA latent-cache stacks through spec verify windows."""
    cfg = tiny_cfg(kv_lora_rank=16, q_lora_rank=0, rope_dim=4,
                   head_dim=12, v_head_dim=8, n_kv_heads=4, max_context=96)
    params = llm.init_params(cfg, seed=6)
    eng = ServingEngine(params, cfg, n_slots=2, spec_lookup=3)
    r1 = eng.submit([1, 2, 3, 4], max_new=6)
    eng.step()
    r2 = eng.submit([6, 5], max_new=5)
    eng.run_until_idle()
    assert r1.wait(1) == _solo(params, cfg, [1, 2, 3, 4], 6)
    assert r2.wait(1) == _solo(params, cfg, [6, 5], 5)


def test_spec_batched_prefill_and_cancel():
    """Admission bursts take the batched multi-slot prefill path under
    spec mode (aux ids/pos updated per-row); cancelling one mid-flight
    request leaves the others exact."""
    cfg = tiny_cfg(max_context=160)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=3, spec_lookup=3)
    prompts = [list(range(1, 40)), list(range(2, 36)), [7, 8, 9, 10]]
    rs = [eng.submit(p, max_new=6) for p in prompts]
    eng.step()                               # one batched prefill tick
    assert eng.stats["prefill_batched_steps"] >= 1
    eng.cancel(rs[1])
    eng.run_until_idle()
    assert rs[0].wait(1) == _solo(params, cfg, prompts[0], 6)
    assert rs[2].wait(1) == _solo(params, cfg, prompts[2], 6)
    assert rs[1].done


def test_spec_disabled_for_ssm_and_pallas():
    """spec_lookup silently disables on SSM hybrids (rejected drafts can't
    roll back a recurrence) and under the T=1 Pallas decode kernel, same
    convention as prefix_cache; outputs stay exact either way."""
    ssm = llm.SSMConfig(conv_kernel=3, state_size=8, group_count=2,
                        time_step_rank=4, inner_size=32)
    cfg = tiny_cfg(ssm=ssm, full_attention_interval=2, qk_norm=8)
    params = llm.init_params(cfg, seed=7)
    eng = ServingEngine(params, cfg, n_slots=1, spec_lookup=4)
    assert eng.spec == 0
    r = eng.submit([1, 2, 3], max_new=5)
    eng.run_until_idle()
    assert r.wait(1) == _solo(params, cfg, [1, 2, 3], 5)


def test_spec_max_new_mid_window():
    """max_new reached inside a verify window truncates exactly (extra
    accepted tokens dropped), matching the solo prefix."""
    cfg = tiny_cfg(max_context=160)
    params = llm.init_params(cfg, seed=4)
    full = _solo(params, cfg, [1, 2, 3], 40)
    eng = ServingEngine(params, cfg, n_slots=1, spec_lookup=4)
    r = eng.submit([1, 2, 3], max_new=17)
    eng.run_until_idle()
    assert r.wait(1) == full[:17]
