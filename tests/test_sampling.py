"""Device-side sampling filters (llm.sample_filtered): top-p / top-k /
min-p over the temperature-scaled distribution, threaded through solo
generation, batched generation, the continuous-batching engine, and the
HTTP surfaces.

The reference samples with Gumbel-max temperature only (reference
utils/model.py:318-319); the filters are the standard serving-surface
extras every OpenAI-compatible client expects. The correctness spine:
(a) direct support tests on crafted logits — the sampled set must equal
the analytically filtered set; (b) top_k=1 at high temperature must be
token-exact with greedy (the filter collapses the distribution to the
argmax), which turns every greedy-exactness path into a filter test.
"""
import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from clearcam_tpu.models import llm
from clearcam_tpu.serving import ServingEngine

from test_llm import tiny_cfg


def _support(logits, samp, n=400, seed=0):
    """Set of token ids sample_filtered ever returns over n keys."""
    out = set()
    lg = jnp.asarray([logits], jnp.float32)
    sp = jnp.asarray(samp, jnp.float32)
    fn = jax.jit(llm.sample_filtered)
    for i in range(n):
        out.add(int(fn(lg, sp, jax.random.PRNGKey(seed + i))[0]))
    return out


def test_filter_support_top_k():
    # probs ~ softmax([4,3,2,1,0,-5...]): top_k=3 keeps ids {0,1,2} only
    logits = [4.0, 3.0, 2.0, 1.0, 0.0, -5.0, -5.0, -5.0]
    got = _support(logits, [1.0, 1.0, 3.0, 0.0])
    assert got == {0, 1, 2}


def test_filter_support_top_p():
    # probs [0.5, 0.3, 0.15, 0.05]: top_p=0.85 keeps the smallest prefix
    # with mass >= 0.85 = {0, 1, 2} (0.5+0.3 < 0.85 so id 2 is included)
    p = np.asarray([0.5, 0.3, 0.15, 0.05])
    logits = np.log(p).tolist()
    got = _support(logits, [1.0, 0.85, 0.0, 0.0])
    assert got == {0, 1, 2}
    # top_p=0.79: 0.5+0.3 >= 0.79 -> exactly {0, 1}
    assert _support(logits, [1.0, 0.79, 0.0, 0.0]) == {0, 1}


def test_filter_support_min_p():
    # min_p=0.4: keep probs >= 0.4 * 0.5 = 0.2 -> {0, 1}
    p = np.asarray([0.5, 0.3, 0.15, 0.05])
    got = _support(np.log(p).tolist(), [1.0, 1.0, 0.0, 0.4])
    assert got == {0, 1}


def test_filter_temperature_scaling_applies_first():
    """Filters act on the temperature-SCALED distribution (HF semantics):
    at high temperature the distribution flattens, so a fixed top_p keeps
    more tokens than at temperature 1."""
    p = np.asarray([0.5, 0.3, 0.15, 0.05])
    logits = np.log(p).tolist()
    cold = _support(logits, [1.0, 0.79, 0.0, 0.0])
    hot = _support(logits, [3.0, 0.79, 0.0, 0.0])
    assert cold == {0, 1} and len(hot) > len(cold)


def test_filter_per_row_batched():
    """[B, 4] per-row specs: each row filtered independently in one call."""
    p = np.asarray([0.5, 0.3, 0.15, 0.05])
    lg = jnp.asarray([np.log(p), np.log(p)], jnp.float32)
    samp = jnp.asarray([[1.0, 1.0, 1.0, 0.0],     # top_k=1 -> always 0
                        [1.0, 0.79, 0.0, 0.0]], jnp.float32)
    fn = jax.jit(llm.sample_filtered)
    seen0, seen1 = set(), set()
    for i in range(300):
        t = np.asarray(fn(lg, samp, jax.random.PRNGKey(i)))
        seen0.add(int(t[0]))
        seen1.add(int(t[1]))
    assert seen0 == {0} and seen1 == {0, 1}


def test_filters_off_matches_plain_gumbel():
    """The all-off packed spec reproduces sample_gumbel exactly (same key,
    same Gumbel draw, no filter branch perturbation)."""
    key = jax.random.PRNGKey(7)
    lg = jax.random.normal(key, (3, 64), jnp.float32) * 3
    for t in (0.0, 0.7, 1.3):
        a = llm.sample_gumbel(lg, jnp.float32(t), key)
        b = llm.sample_filtered(lg, llm.pack_samp(t), key)
        assert np.array_equal(np.asarray(a), np.asarray(b))


def _greedy(params, cfg, prompt, n):
    return [t for t in llm.Transformer(params, cfg, seed=0).generate(
        list(prompt), temperature=0.0, max_new=n)]


def test_generate_top_k1_is_greedy():
    """top_k=1 at temperature 5 must be token-exact with greedy — the
    strongest end-to-end filter check (any leak of non-max tokens or any
    filter-induced perturbation of the argmax breaks it)."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    want = _greedy(params, cfg, [1, 2, 3, 4], 10)
    m = llm.Transformer(params, cfg, seed=0)
    got = [t for t in m.generate([1, 2, 3, 4], temperature=5.0,
                                 max_new=10, top_k=1)]
    assert got == want


def test_generate_batch_top_k1_is_greedy():
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    prompts = [[1, 2, 3, 4], [9, 8]]
    want = llm.generate_batch(params, cfg, prompts, max_new=8)
    got = llm.generate_batch(params, cfg, prompts, max_new=8,
                             temperature=3.0, top_k=1)
    assert got == want


def test_serving_mixed_filters():
    """Engine rows carry per-request filters: a top_k=1/temp=4 row is
    exactly greedy while a plain greedy row and an unfiltered stochastic
    row run beside it."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=3)
    rk = eng.submit([1, 2, 3, 4], max_new=8, temperature=4.0, top_k=1)
    rg = eng.submit([9, 8, 7], max_new=6)
    rt = eng.submit([5, 5], max_new=6, temperature=1.0, top_p=0.9)
    eng.run_until_idle()
    assert rk.wait(1) == _greedy(params, cfg, [1, 2, 3, 4], 8)
    assert rg.wait(1) == _greedy(params, cfg, [9, 8, 7], 6)
    toks = rt.wait(1)
    assert len(toks) == 6 and all(0 <= t < cfg.vocab_size for t in toks)


def test_serving_spec_with_filters():
    """Under speculative serving, a filtered stochastic row runs
    un-speculated next to exact greedy rows (samp rides the spec graphs)."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2, spec_lookup=3)
    rg = eng.submit([1, 2, 3, 4], max_new=8)
    rk = eng.submit([9, 8], max_new=6, temperature=3.0, top_k=1)
    eng.run_until_idle()
    assert rg.wait(1) == _greedy(params, cfg, [1, 2, 3, 4], 8)
    # top_k=1 rows are deterministic but flagged stochastic (temp>0), so
    # they emit one token per window — still exactly the greedy sequence
    assert rk.wait(1) == _greedy(params, cfg, [9, 8], 6)


def test_http_openai_top_k1_matches_greedy():
    """/v1/completions carries the filters end to end."""
    from clearcam_tpu.serving import TextServing
    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore
    from test_http_generate import TinyTok, _post

    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2).start()
    gen = TextServing(eng, TinyTok())
    ctx = AppContext(KVStore(":memory:"), "/tmp/cc_samp_http", gen=gen)
    server = serve(ctx, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        body = {"prompt": "filters", "max_tokens": 8, "temperature": 0}
        with _post(f"{url}/v1/completions", body) as r:
            want = json.loads(r.read())["choices"][0]["text"]
        with _post(f"{url}/v1/completions",
                   {**body, "temperature": 5, "top_k": 1}) as r:
            got = json.loads(r.read())["choices"][0]["text"]
        assert got == want
    finally:
        server.shutdown()
        eng.close()


# ---------------------------------------------------------------------------
# sampling penalties (presence / frequency OpenAI-semantics over generated
# tokens; repetition HF-semantics over prompt+generated) — device-side over
# per-row token histograms
# ---------------------------------------------------------------------------

def _argmax_pen(logits, samp, cnt_p, cnt_o):
    """Greedy draw through the penalized sampler (temp 0)."""
    fn = jax.jit(llm.sample_filtered)
    return int(fn(jnp.asarray([logits], jnp.float32),
                  jnp.asarray(samp, jnp.float32),
                  jax.random.PRNGKey(0),
                  jnp.asarray([cnt_p], jnp.int32),
                  jnp.asarray([cnt_o], jnp.int32))[0])


def test_penalty_repetition_unit():
    # token 0 leads (2.0 vs 1.5) but was seen (prompt): rep=2 halves its
    # positive logit (1.0 < 1.5) -> argmax moves to token 1
    logits = [2.0, 1.5, 0.0, -1.0]
    samp = llm.pack_samp(0.0, repetition=2.0)
    assert _argmax_pen(logits, samp, [1, 0, 0, 0], [0, 0, 0, 0]) == 1
    # unseen tokens unaffected
    assert _argmax_pen(logits, samp, [0, 0, 0, 0], [0, 0, 0, 0]) == 0
    # negative-logit branch: seen token 3's -1.0 *2 -> -2.0 (further
    # suppressed, still not argmax); seen token 0 also halved -> 1 wins
    assert _argmax_pen(logits, samp, [1, 0, 0, 1], [0, 0, 0, 0]) == 1


def test_penalty_presence_frequency_output_only():
    """presence/frequency ignore PROMPT tokens (vLLM/OpenAI semantics);
    repetition counts them (HF semantics)."""
    logits = [2.0, 1.5, 0.0, -1.0]
    pres = llm.pack_samp(0.0, presence=1.0)
    # token 0 in the prompt histogram only: presence does nothing
    assert _argmax_pen(logits, pres, [3, 0, 0, 0], [0, 0, 0, 0]) == 0
    # token 0 generated once: 2.0 - 1.0 = 1.0 < 1.5 -> token 1
    assert _argmax_pen(logits, pres, [0, 0, 0, 0], [1, 0, 0, 0]) == 1
    # frequency scales with the count: one occurrence of 0.4 isn't enough,
    # two are (2.0 - 2*0.4 = 1.2 < 1.5)
    freq = llm.pack_samp(0.0, frequency=0.4)
    assert _argmax_pen(logits, freq, [0, 0, 0, 0], [1, 0, 0, 0]) == 0
    assert _argmax_pen(logits, freq, [0, 0, 0, 0], [2, 0, 0, 0]) == 1


def test_penalty_counts_none_is_off():
    """Without histograms the penalty columns are inert (solo step fns)."""
    logits = jnp.asarray([[2.0, 1.5, 0.0, -1.0]], jnp.float32)
    samp = llm.pack_samp(0.0, presence=5.0, frequency=5.0, repetition=9.0)
    got = int(llm.sample_filtered(logits, samp, jax.random.PRNGKey(0))[0])
    assert got == 0


def test_generate_batch_repetition_penalty_changes_greedy():
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    plain = llm.generate_batch(params, cfg, [[1, 2, 3, 4]], max_new=12)
    pen = llm.generate_batch(params, cfg, [[1, 2, 3, 4]], max_new=12,
                             repetition_penalty=1.8)
    assert pen != plain            # penalties exist to change greedy output
    # a huge presence penalty at temp 0 forbids re-emitting any token:
    # all 12 generated ids are distinct
    uniq = llm.generate_batch(params, cfg, [[1, 2, 3, 4]], max_new=12,
                              presence_penalty=1e9)[0]
    assert len(set(uniq)) == len(uniq)


def test_engine_penalties_match_generate_batch():
    """Engine rows with penalties reproduce generate_batch exactly (greedy
    + penalties is deterministic), while a plain greedy row is untouched."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    want_pen = llm.generate_batch(params, cfg, [[1, 2, 3, 4]], max_new=10,
                                  repetition_penalty=1.8,
                                  frequency_penalty=0.3)[0]
    eng = ServingEngine(params, cfg, n_slots=2)
    rp = eng.submit([1, 2, 3, 4], max_new=10, repetition_penalty=1.8,
                    frequency_penalty=0.3)
    rg = eng.submit([9, 8, 7], max_new=6)
    eng.run_until_idle()
    assert rp.wait(1) == want_pen
    assert rg.wait(1) == _greedy(params, cfg, [9, 8, 7], 6)


def test_engine_penalties_prefix_reuse():
    """counts_p covers a REUSED prefix the device never re-reads: a
    follow-up sharing CHUNK-aligned prompt history must penalize
    identically to a cold engine."""
    cfg = tiny_cfg(max_context=128)
    params = llm.init_params(cfg, seed=4)
    prompt = list(range(1, 41))                     # 40 > CHUNK tokens
    eng = ServingEngine(params, cfg, n_slots=1, prefix_cache=True)
    r1 = eng.submit(prompt, max_new=6)
    eng.run_until_idle(); r1.wait(1)
    r2 = eng.submit(prompt, max_new=10, repetition_penalty=1.8)
    eng.run_until_idle()
    assert eng.stats["reused_tokens"] > 0           # reuse actually happened
    want = llm.generate_batch(params, cfg, [prompt], max_new=10,
                              repetition_penalty=1.8)[0]
    assert r2.wait(1) == want


def test_engine_spec_penalties():
    """Under speculative serving a penalized row rides the stochastic
    (1 token/window) path and still matches generate_batch exactly."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    want = llm.generate_batch(params, cfg, [[1, 2, 3, 4]], max_new=10,
                              repetition_penalty=1.8)[0]
    eng = ServingEngine(params, cfg, n_slots=2, spec_lookup=3)
    rp = eng.submit([1, 2, 3, 4], max_new=10, repetition_penalty=1.8)
    rg = eng.submit([9, 8], max_new=6)
    eng.run_until_idle()
    assert rp.wait(1) == want
    assert rg.wait(1) == _greedy(params, cfg, [9, 8], 6)


def test_http_openai_penalties_passthrough():
    """presence_penalty rides /v1/completions to the engine."""
    from clearcam_tpu.serving import TextServing
    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore
    from test_http_generate import TinyTok, _post

    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2).start()
    gen = TextServing(eng, TinyTok())
    ctx = AppContext(KVStore(":memory:"), "/tmp/cc_pen_http", gen=gen)
    server = serve(ctx, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        # "hello world": greedy repeats (..., 17, 48, 47, 17, 48, 47) and
        # the penalized continuation diverges without an instant eos
        body = {"prompt": "hello world", "max_tokens": 10, "temperature": 0}
        with _post(f"{url}/v1/completions", body) as r:
            plain = json.loads(r.read())["choices"][0]["text"]
        with _post(f"{url}/v1/completions",
                   {**body, "repetition_penalty": 1.8}) as r:
            pen = json.loads(r.read())["choices"][0]["text"]
        ids = TinyTok().encode("hello world")
        want = llm.generate_batch(params, cfg, [ids], max_new=10, eos_id=0,
                                  repetition_penalty=1.8)[0]
        assert pen == TinyTok().decode(want) != plain
    finally:
        server.shutdown()
        eng.close()


# ---------------------------------------------------------------------------
# logit bias (OpenAI logit_bias: {token_id: additive bias}, applied after
# penalties, before temperature; samp col 7 flags rows that carry a bias)
# ---------------------------------------------------------------------------

def _argmax_bias(logits, bias, active=1.0):
    fn = jax.jit(llm.sample_filtered)
    samp = llm.pack_samp(0.0, bias_active=active)
    return int(fn(jnp.asarray([logits], jnp.float32), samp,
                  jax.random.PRNGKey(0),
                  bias=jnp.asarray([bias], jnp.float32))[0])


def test_logit_bias_unit():
    logits = [2.0, 1.5, 0.0, -1.0]
    # +3 on token 2 lifts it past the leader
    assert _argmax_bias(logits, [0.0, 0.0, 3.0, 0.0]) == 2
    # -100 on the leader forbids it
    assert _argmax_bias(logits, [-100.0, 0.0, 0.0, 0.0]) == 1
    # bias_active=0: the buffer is inert even when it carries values
    assert _argmax_bias(logits, [-100.0, 0.0, 3.0, 0.0], active=0.0) == 0


def test_logit_bias_per_row_masked():
    """[B] rows share one bias buffer; only rows flagged via samp col 7
    read their row (stale engine-slot rows must be inert)."""
    logits = jnp.asarray([[2.0, 1.5, 0.0, -1.0]] * 2, jnp.float32)
    bias = jnp.asarray([[-100.0, 0.0, 0.0, 0.0]] * 2, jnp.float32)
    samp = jnp.stack([llm.pack_samp(0.0, bias_active=1.0),
                      llm.pack_samp(0.0, bias_active=0.0)])
    got = jax.jit(llm.sample_filtered)(logits, samp, jax.random.PRNGKey(0),
                                       bias=bias)
    assert int(got[0]) == 1 and int(got[1]) == 0


def test_generate_batch_logit_bias():
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    plain = llm.generate_batch(params, cfg, [[1, 2, 3, 4]], max_new=10)[0]
    # +1000 on token 5 at temp 0 forces every step to emit 5
    forced = llm.generate_batch(params, cfg, [[1, 2, 3, 4]], max_new=10,
                                logit_bias={5: 1000.0})[0]
    assert forced == [5] * 10 != plain
    # a -inf-ish bias bans a token from the whole generation
    banned = llm.generate_batch(params, cfg, [[1, 2, 3, 4]], max_new=10,
                                logit_bias={plain[0]: -1e9})[0]
    assert plain[0] not in banned


def test_engine_logit_bias_matches_generate_batch():
    """Engine rows with logit_bias reproduce generate_batch exactly; a
    plain greedy row beside them is untouched, and the slot's stale bias
    row stays inert for the NEXT occupant."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    want = llm.generate_batch(params, cfg, [[1, 2, 3, 4]], max_new=10,
                              logit_bias={5: 1000.0})[0]
    eng = ServingEngine(params, cfg, n_slots=2)
    rb = eng.submit([1, 2, 3, 4], max_new=10, logit_bias={5: 1000.0})
    rg = eng.submit([9, 8, 7], max_new=6)
    eng.run_until_idle()
    assert rb.wait(1) == want == [5] * 10
    assert rg.wait(1) == _greedy(params, cfg, [9, 8, 7], 6)
    # slot reuse: the biased slot's next occupant must sample unbiased
    r2 = eng.submit([9, 8, 7], max_new=6)
    r3 = eng.submit([1, 2, 3], max_new=6)
    eng.run_until_idle()
    assert r2.wait(1) == _greedy(params, cfg, [9, 8, 7], 6)
    assert r3.wait(1) == _greedy(params, cfg, [1, 2, 3], 6)


def test_engine_spec_logit_bias():
    """Under speculative serving a biased row is flagged stochastic
    (1 token/window) and still matches generate_batch exactly."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    want = llm.generate_batch(params, cfg, [[1, 2, 3, 4]], max_new=10,
                              logit_bias={5: 1000.0})[0]
    eng = ServingEngine(params, cfg, n_slots=2, spec_lookup=3)
    rb = eng.submit([1, 2, 3, 4], max_new=10, logit_bias={5: 1000.0})
    rg = eng.submit([9, 8], max_new=6)
    eng.run_until_idle()
    assert rb.wait(1) == want
    assert rg.wait(1) == _greedy(params, cfg, [9, 8], 6)


def test_http_openai_logit_bias_and_n():
    """/v1/completions carries logit_bias (string token-id keys, OpenAI
    schema) and n>1 (each choice its own engine request)."""
    from clearcam_tpu.serving import TextServing
    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore
    from test_http_generate import TinyTok, _post

    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=4).start()
    gen = TextServing(eng, TinyTok())
    ctx = AppContext(KVStore(":memory:"), "/tmp/cc_bias_http", gen=gen)
    server = serve(ctx, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        body = {"prompt": "hello", "max_tokens": 8, "temperature": 0,
                "logit_bias": {"5": 1000.0}}
        with _post(f"{url}/v1/completions", body) as r:
            out = json.loads(r.read())
        assert out["choices"][0]["text"] == TinyTok().decode([5] * 8)
        # n=3 at temp 0: three identical choices, usage aggregates
        with _post(f"{url}/v1/completions",
                   {"prompt": "hello", "max_tokens": 6, "temperature": 0,
                    "n": 3}) as r:
            out = json.loads(r.read())
        texts = [c["text"] for c in out["choices"]]
        assert len(texts) == 3 and len(set(texts)) == 1
        assert [c["index"] for c in out["choices"]] == [0, 1, 2]
        assert out["usage"]["completion_tokens"] >= 3 * len(
            TinyTok().encode(texts[0])) // 2
        # streaming requires n=1
        try:
            _post(f"{url}/v1/completions",
                  {"prompt": "x", "max_tokens": 4, "n": 2, "stream": True})
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        eng.close()
