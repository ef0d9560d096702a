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


def test_serving_ssm_batched_prefill():
    """SSM/hybrid stacks now take the BATCHED multi-slot prefill path
    (T=1 scan with per-token row gating inside one program) — a burst of
    admissions advances in shared dispatches, every output still exact
    vs solo, and a second wave through the same slots proves the fresh
    recurrent-state reset composes with the batched path."""
    ssm = llm.SSMConfig(conv_kernel=3, state_size=8, group_count=2,
                        time_step_rank=4, inner_size=32)
    cfg = tiny_cfg(ssm=ssm, full_attention_interval=2, qk_norm=8)
    params = llm.init_params(cfg, seed=7)
    eng = ServingEngine(params, cfg, n_slots=3)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [2, 7, 6, 5]]
    rs = [eng.submit(p, max_new=5) for p in prompts]   # admitted together
    eng.run_until_idle()
    assert eng.stats["prefill_batched_steps"] > 0
    for r, p in zip(rs, prompts):
        assert r.wait(1) == _solo(params, cfg, p, 5)
    rs2 = [eng.submit(list(reversed(p)), max_new=4) for p in prompts]
    eng.run_until_idle()
    for r, p in zip(rs2, prompts):
        assert r.wait(1) == _solo(params, cfg, list(reversed(p)), 4)


def test_serving_moe():
    """MoE stacks through the engine: per-token expert gather works at
    per-slot positions, outputs exact vs solo."""
    cfg = tiny_cfg(num_experts=4, num_experts_per_tok=2,
                   norm_topk_prob=True, max_context=96)
    params = llm.init_params(cfg, seed=5)
    eng = ServingEngine(params, cfg, n_slots=2)
    r1 = eng.submit([1, 2, 3, 4], max_new=5)
    eng.step()
    r2 = eng.submit([6, 5], max_new=4)
    eng.run_until_idle()
    assert r1.wait(1) == _solo(params, cfg, [1, 2, 3, 4], 5)
    assert r2.wait(1) == _solo(params, cfg, [6, 5], 4)


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

    def run(lag, fetch=4):
        eng = ServingEngine(params, cfg, n_slots=2, sync_lag=lag,
                            fetch_every=fetch)
        rs = [eng.submit([1, 2, 3], max_new=6, eos_id=eos),
              eng.submit([5, 5], max_new=5),
              eng.submit([7, 1, 7, 1], max_new=4)]
        eng.run_until_idle()
        return [r.wait(1) for r in rs]

    # neither the lag window nor the batched-fetch granularity (tokens
    # ride home as [fetch_every, B] stacks) may change any output
    assert run(0) == run(4) == run(9) \
        == run(0, fetch=1) == run(4, fetch=7) == run(9, fetch=2)


def test_prefix_reuse_token_exact():
    """Requests sharing a long system preamble: the second skips its
    CHUNK-aligned shared prefix (fewer prefill chunks) yet produces
    exactly its solo greedy output — reused rows are bitwise what its own
    prefill would have written (same chunk boundaries, causal masking)."""
    cfg = tiny_cfg(max_context=160)
    params = llm.init_params(cfg, seed=4)
    pre = [(i * 7) % 60 + 1 for i in range(70)]      # 70-token preamble
    p1, p2 = pre + [9, 9], pre + [3, 5, 3]
    eng = ServingEngine(params, cfg, n_slots=1)
    r1 = eng.submit(p1, max_new=4)
    eng.run_until_idle()
    chunks_before = eng.stats["prefill_chunks"]
    r2 = eng.submit(p2, max_new=4)
    eng.run_until_idle()
    assert r1.wait(1) == _solo(params, cfg, p1, 4)
    assert r2.wait(1) == _solo(params, cfg, p2, 4)
    assert eng.stats["reused_tokens"] == 64          # 70 -> CHUNK-aligned
    # r2 prefilled only ceil((75-64)/32) = 1 chunk vs 3 from scratch
    assert eng.stats["prefill_chunks"] - chunks_before == 1


def test_prefix_reuse_includes_generated_tokens():
    """Conversation follow-up: prompt2 = prompt1 + reply1 + more. The
    reply's K/V rows (written while decoding) count as reusable history —
    the reference's get_start_pos semantics (utils/model.py:393-395)."""
    cfg = tiny_cfg(max_context=160)
    params = llm.init_params(cfg, seed=4)
    p1 = [(i * 5) % 60 + 1 for i in range(40)]
    eng = ServingEngine(params, cfg, n_slots=1)
    r1 = eng.submit(p1, max_new=8)
    eng.run_until_idle()
    p2 = p1 + r1.tokens + [7, 7, 7]                  # 40+8+3 = 51 tokens
    r2 = eng.submit(p2, max_new=4)
    eng.run_until_idle()
    assert r2.wait(1) == _solo(params, cfg, p2, 4)
    # lcp = 47 trusted rows (p1 + 7 of 8 generated) -> 32 CHUNK-aligned
    assert eng.stats["reused_tokens"] == 32


def test_prefix_reuse_survives_junk_steps():
    """Early-EOS retirement under sync_lag leaves junk decode steps
    scribbling at the PARK position — which must sit at the history
    length, beyond every reusable row. A later prefix-sharing request
    must still be exact."""
    cfg = tiny_cfg(max_context=160)
    params = llm.init_params(cfg, seed=4)
    pre = [(i * 3) % 60 + 1 for i in range(40)]
    probe = _solo(params, cfg, pre + [2], 6)
    eos = probe[1]                                   # retires early
    eng = ServingEngine(params, cfg, n_slots=2, sync_lag=6)
    r1 = eng.submit(pre + [2], max_new=6, eos_id=eos)
    r2 = eng.submit([5, 4, 3], max_new=8)            # keeps decode running
    eng.run_until_idle()
    r3 = eng.submit(pre + [8, 8], max_new=4)         # reuses slot 0's rows
    eng.run_until_idle()
    assert r1.wait(1) == _solo(params, cfg, pre + [2], 6, eos_id=eos)
    assert r3.wait(1) == _solo(params, cfg, pre + [8, 8], 4)
    assert eng.stats["reused_tokens"] == 32


def test_prefix_reuse_picks_matching_slot():
    """Admission prefers the free slot whose history matches: two
    histories exist, the follow-up must land on (and reuse) the right
    one rather than round-robin to slot 0."""
    cfg = tiny_cfg(max_context=160)
    params = llm.init_params(cfg, seed=4)
    pa = [(i * 7) % 60 + 1 for i in range(40)]
    pb = [(i * 11) % 60 + 1 for i in range(40)]
    eng = ServingEngine(params, cfg, n_slots=2)
    eng.submit(pa + [1], max_new=3)
    eng.submit(pb + [1], max_new=3)
    eng.run_until_idle()
    r = eng.submit(pb + [2, 2], max_new=4)
    eng.run_until_idle()
    assert r.wait(1) == _solo(params, cfg, pb + [2, 2], 4)
    assert eng.stats["reused_tokens"] == 32          # matched pb's slot


def test_prefix_reuse_disabled_for_ssm():
    """Recurrent state at the reuse boundary isn't position-addressed, so
    hybrids auto-disable reuse and keep the pos-0 park policy."""
    ssm = llm.SSMConfig(conv_kernel=3, state_size=8, group_count=2,
                        time_step_rank=4, inner_size=32)
    cfg = tiny_cfg(ssm=ssm, full_attention_interval=2, qk_norm=8,
                   max_context=160)
    params = llm.init_params(cfg, seed=7)
    eng = ServingEngine(params, cfg, n_slots=1)
    assert not eng.prefix_cache
    pre = [(i * 7) % 60 + 1 for i in range(40)]
    r1 = eng.submit(pre + [1], max_new=3)
    r2 = eng.submit(pre + [2], max_new=3)
    eng.run_until_idle()
    assert r1.wait(1) == _solo(params, cfg, pre + [1], 3)
    assert r2.wait(1) == _solo(params, cfg, pre + [2], 3)
    assert eng.stats["reused_tokens"] == 0


def test_cancel_waiting_and_running():
    """cancel(): a waiting request drops immediately; a running one
    retires at the next tick and frees its slot for later requests,
    which remain exact."""
    cfg = tiny_cfg(max_context=160)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=1)
    r1 = eng.submit([1, 2, 3], max_new=30)
    for _ in range(2):
        eng.step()
    r2 = eng.submit([4, 5], max_new=4)       # queued: slot busy
    eng.cancel(r2)
    assert r2.done and r2.tokens == []
    eng.cancel(r1)
    eng.run_until_idle()
    assert r1.done and len(r1.tokens) < 30
    r3 = eng.submit([7, 8, 9], max_new=4)
    eng.run_until_idle()
    assert r3.wait(1) == _solo(params, cfg, [7, 8, 9], 4)


def test_cancel_midprefill_history_capped():
    """Cancelling during a multi-chunk prefill leaves history only for
    rows the cursor actually wrote — a prefix-sharing successor reuses
    exactly those and recomputes the rest (and stays exact)."""
    cfg = tiny_cfg(max_context=160)
    params = llm.init_params(cfg, seed=4)
    pre = [(i * 7) % 60 + 1 for i in range(70)]
    eng = ServingEngine(params, cfg, n_slots=1)
    r1 = eng.submit(pre + [1], max_new=4)
    eng.step()                               # exactly one 32-token chunk
    eng.cancel(r1)
    eng.step()                               # tick processes the cancel
    assert r1.done
    r2 = eng.submit(pre + [2], max_new=4)
    eng.run_until_idle()
    assert r2.wait(1) == _solo(params, cfg, pre + [2], 4)
    assert eng.stats["reused_tokens"] == 32  # only the written chunk


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


def test_serving_metrics_published():
    """Driving the engine mirrors occupancy + throughput into the shared
    runtime.metrics registry (what /metrics serves, JSON or Prometheus)."""
    from clearcam_tpu.runtime import metrics

    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2)
    r = eng.submit([1, 2, 3], max_new=4)
    eng.run_until_idle()
    assert r.wait(1) == _solo(params, cfg, [1, 2, 3], 4)

    g = metrics.snapshot()["gauges"]
    assert g["serving.slots_free"] == 2 and g["serving.slots_live"] == 0
    assert g["serving.waiting"] == 0
    assert g["serving.decode_steps"] >= 4
    assert g["serving.prefill_tokens"] >= 3


def test_batched_prefill_exact_and_used():
    """Simultaneous admission fills every slot: prefill advances them all
    per tick via ONE prefill_many dispatch (stats prove the batched graph
    ran), outputs stay exactly solo — including ragged chunk tails and a
    row that is mid-DECODE while others batch-prefill (its cache must be
    untouched: write_mask)."""
    cfg = tiny_cfg(max_context=128)
    params = llm.init_params(cfg, seed=4)
    prompts = [[1, 2, 3], list(range(1, 40)), [9] * 7, [5, 6]]

    eng = ServingEngine(params, cfg, n_slots=3)
    r0 = eng.submit(prompts[0], max_new=8)
    for _ in range(3):
        eng.step()                       # r0 is decoding...
    rs = [eng.submit(p, max_new=6) for p in prompts[1:]]
    eng.run_until_idle()                 # ...while the rest batch-prefill
    assert eng.stats["prefill_batched_steps"] >= 1
    assert r0.wait(1) == _solo(params, cfg, prompts[0], 8)
    for p, r in zip(prompts[1:], rs):
        assert r.wait(1) == _solo(params, cfg, p, 6)

    # prefill_batch=False must give identical outputs (solo graph path)
    eng2 = ServingEngine(params, cfg, n_slots=3, prefill_batch=False)
    rs2 = [eng2.submit(p, max_new=6) for p in prompts[1:]]
    eng2.run_until_idle()
    assert eng2.stats["prefill_batched_steps"] == 0
    for r, r2 in zip(rs, rs2):
        assert r.wait(1) == r2.wait(1)


def test_batched_prefill_kv_quant_and_mla():
    """The write_mask path covers the int8-KV scale planes and the MLA
    latent cache too."""
    for kw, kv_quant in (({}, True),
                         (dict(kv_lora_rank=16, q_lora_rank=24, head_dim=12,
                               rope_dim=4, v_head_dim=12), False)):
        cfg = tiny_cfg(max_context=96, **kw)
        params = llm.init_params(cfg, seed=6)
        eng = ServingEngine(params, cfg, n_slots=3, kv_quant=kv_quant,
                            state_dtype=jnp.float32)
        prompts = [[1, 2, 3, 4], list(range(2, 36)), [7, 7, 7]]
        rs = [eng.submit(p, max_new=5) for p in prompts]
        eng.run_until_idle()
        assert eng.stats["prefill_batched_steps"] >= 1
        ref = ServingEngine(params, cfg, n_slots=1, kv_quant=kv_quant,
                            state_dtype=jnp.float32, prefill_batch=False)
        for p, r in zip(prompts, rs):
            q = ref.submit(p, max_new=5)
            ref.run_until_idle()
            assert r.wait(1) == q.wait(1)


def test_batched_prefill_with_prefix_reuse():
    """A reused (CHUNK-aligned) prefix shifts a row's start offset; the
    batched graph must still produce the exact continuation."""
    cfg = tiny_cfg(max_context=160)
    params = llm.init_params(cfg, seed=4)
    pre = [(i * 5) % 50 + 1 for i in range(40)]      # > one CHUNK
    eng = ServingEngine(params, cfg, n_slots=2)
    r1 = eng.submit(pre + [1], max_new=4)
    eng.run_until_idle()
    assert r1.wait(1) == _solo(params, cfg, pre + [1], 4)
    # both slots prefill together; slot of r1 reuses pre's first chunk(s)
    r2 = eng.submit(pre + [2], max_new=4)
    r3 = eng.submit([3, 3, 3], max_new=4)
    eng.run_until_idle()
    assert eng.stats["reused_tokens"] >= 32
    assert eng.stats["prefill_batched_steps"] >= 1
    assert r2.wait(1) == _solo(params, cfg, pre + [2], 4)
    assert r3.wait(1) == _solo(params, cfg, [3, 3, 3], 4)


def test_backpressure_and_deadlines():
    """Production load-shedding: max_waiting bounds the admission queue
    (QueueFull), a waiting request past its deadline is dropped, and a
    RUNNING request cut by its deadline retires with partial tokens and
    timed_out set — the slot is reclaimed for the next request."""
    import time as _t

    import pytest

    from clearcam_tpu.serving.engine import QueueFull

    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=1, max_waiting=1)
    r1 = eng.submit([1, 2, 3], max_new=8)
    eng.step()                                   # r1 admitted to the slot
    r2 = eng.submit([5, 5], max_new=4)           # fills the waiting queue
    with pytest.raises(QueueFull):
        eng.submit([7, 7], max_new=4)
    eng.run_until_idle()
    assert r1.wait(1) == _solo(params, cfg, [1, 2, 3], 8)
    assert r2.wait(1) == _solo(params, cfg, [5, 5], 4)

    # waiting request expires before a slot frees
    eng2 = ServingEngine(params, cfg, n_slots=1)
    ra = eng2.submit([1, 2, 3], max_new=10)
    rb = eng2.submit([5, 5], max_new=4, timeout_s=0.0)
    for _ in range(3):
        eng2.step()
    assert rb.done and rb.timed_out and rb.tokens == []
    assert eng2._deadlines == 0

    # running request cut mid-generation: partial tokens, slot reclaimed
    rc = eng2.submit([9, 8, 7], max_new=50, timeout_s=0.15)
    _t.sleep(0.2)
    eng2.run_until_idle()
    assert rc.done and rc.timed_out
    assert 0 < len(rc.tokens) < 50 or rc.tokens == []   # cut early
    assert eng2._deadlines == 0
    rd = eng2.submit([4, 4], max_new=4)                 # slot usable again
    eng2.run_until_idle()
    assert ra.wait(1) == _solo(params, cfg, [1, 2, 3], 10)
    assert rd.wait(1) == _solo(params, cfg, [4, 4], 4)


def test_flush_padding_single_arity():
    """Ragged final flushes pad the token stack to fetch_every so only ONE
    stack graph ever compiles (mid-serving arity churn was measured as
    multi-minute stalls through a remote-compile link)."""
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2, fetch_every=4)
    arities = set()
    orig = eng._stack
    eng._stack = lambda *ts: (arities.add(len(ts)), orig(*ts))[1]
    rs = [eng.submit([1, 2, 3], max_new=5),     # 5 % 4 != 0: ragged flush
          eng.submit([5, 5], max_new=3)]
    eng.run_until_idle()
    assert arities == {4}
    for p, r, n in zip([[1, 2, 3], [5, 5]], rs, [5, 3]):
        assert r.wait(1) == _solo(params, cfg, p, n)


def test_request_latency_marks():
    """TTFT/TPOT are recorded per request (client-observed: materialization
    time, not dispatch time) and folded into the serving.* gauges."""
    from clearcam_tpu.runtime import metrics
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=1)
    r = eng.submit([1, 2, 3, 4], max_new=6)
    eng.run_until_idle()
    r.wait(1)
    assert r.ttft_s is not None and r.ttft_s > 0
    assert r.tpot_s is not None and r.tpot_s >= 0
    snap = metrics.snapshot()
    assert snap["gauges"]["serving.ttft_ms"] > 0
    assert "serving.tpot_ms" in snap["gauges"]


def test_scheduler_death_fails_requests_loudly():
    """An unexpected step() exception must not hang waiters forever: the
    scheduler thread fails every in-flight and queued request
    (failed=True, partial tokens kept) and further submits raise."""
    import pytest

    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=1)

    def boom():
        raise RuntimeError("injected scheduler failure")

    eng.step = boom
    eng.start()
    r1 = eng.submit([1, 2, 3], max_new=4)
    r2 = eng.submit([4, 5], max_new=4)
    assert r1.wait(10) == [] and r1.failed
    assert r2.wait(10) == [] and r2.failed
    with pytest.raises(RuntimeError):
        eng.submit([1], max_new=1)
    eng.close()


def test_wider_chunk_matches_solo(monkeypatch):
    """CLEARCAM_CHUNK (llm.CHUNK) widens the prefill chunk for admission
    throughput (PERF.md "Prefill chunk width"); every request must stay
    exactly its solo generation at any width. The stock suite pins
    CHUNK=32 expectations (reuse alignment, tiny max_context), so this is
    the wider-width exactness net."""
    monkeypatch.setattr(llm, "CHUNK", 64)
    cfg = tiny_cfg(max_context=256)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2)
    long_prompt = list(range(1, 81))        # 80 tokens -> 2 chunks at 64
    r1 = eng.submit(long_prompt, max_new=8)
    eng.step()                              # r1 mid-prefill
    r2 = eng.submit([7, 6, 5], max_new=6)   # admission interleaves
    eng.run_until_idle()
    assert r1.wait(1) == _solo(params, cfg, long_prompt, 8)
    assert r2.wait(1) == _solo(params, cfg, [7, 6, 5], 6)
    eng.close()


def test_wide_engine_16_slots_matches_solo():
    """The production-recommended 16-slot config (PERF.md slot ladder,
    DEPLOY.md guidance): 20 concurrent requests through 16 slots — wider
    batched-prefill admission waves and slot reuse than the small-engine
    tests — each exactly its solo greedy output."""
    cfg = tiny_cfg(max_context=64)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=16)
    prompts = [[(7 * i + j) % 50 + 1 for j in range(3 + i % 5)]
               for i in range(20)]
    reqs = [eng.submit(p, max_new=5) for p in prompts]
    eng.run_until_idle()
    for p, r in zip(prompts, reqs):
        assert r.wait(1) == _solo(params, cfg, p, 5)


def test_long_prefill_does_not_stall_decodes():
    """Chunked-prefill fairness: while a long uncached prompt admits, live
    slots must keep decoding (alternating ticks) — the old prefill-first
    policy stalled every decode for the prompt's entire admission."""
    cfg = tiny_cfg(max_context=192)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2)

    r1 = eng.submit([1, 2, 3], max_new=40)
    for _ in range(12):                      # r1 live, several tokens deep
        eng.step()
    before = len(r1.tokens)
    long_prompt = list(range(1, 129))        # 128 tokens = 4 CHUNK=32 chunks
    r2 = eng.submit(long_prompt, max_new=2)
    # 6 ticks: alternation gives ~3 decode steps to r1 mid-admission
    for _ in range(6):
        eng.step()
    assert not r2.done                       # r2 still prefilling/lagged
    assert len(r1.tokens) > before, \
        "live decode starved during a long prompt's admission"
    eng.run_until_idle()
    assert r1.wait(1) == _solo(params, cfg, [1, 2, 3], 40)
    assert r2.wait(1) == _solo(params, cfg, long_prompt, 2)


def test_close_unblocks_waiters():
    """A graceful close() must complete every queued/in-flight request
    (failed=True, partial tokens kept) — clients blocked in wait() used to
    hang forever because only a CRASH failed them."""
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=1)       # driven inline
    live = eng.submit([1, 2, 3], max_new=50)          # ~50 ticks of work
    queued = eng.submit([4, 5], max_new=4)            # waits for the slot
    for _ in range(5):                                # live mid-generation
        eng.step()
    assert not live.done and not queued.done
    eng.close()
    assert live.wait(5) is not None and live.failed
    assert queued.wait(5) is not None and queued.failed
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="stopped"):
        eng.submit([1], max_new=1)
