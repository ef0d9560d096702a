"""OpenAI completions ``echo`` + teacher-forcing scoring
(llm.make_score_fn): one compiled chunk graph scores any prompt —
max_tokens=0 + echo + logprobs is the lm-eval-harness loglikelihood
call. The reference has no scoring surface (utils/model.py only
samples); this is OpenAI serving parity."""
import json
import math
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from clearcam_tpu.models import llm
from clearcam_tpu.serving import ServingEngine

from test_llm import tiny_cfg


def test_make_score_fn_matches_full_forward():
    """Chunked scorer == unchunked score_logits at every position,
    including across a CHUNK boundary; top alts descending with the
    chosen-at-argmax invariant."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    rng = np.random.default_rng(0)
    toks = [int(t) for t in rng.integers(1, cfg.vocab_size, 40)]  # > CHUNK
    rows = llm.make_score_fn(cfg)(params, toks)
    assert len(rows) == len(toks) - 1
    for i in (1, 2, len(toks) // 2, llm.CHUNK, llm.CHUNK + 1,
              len(toks) - 1):
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(
            llm.score_logits(params, cfg, toks[:i]), jnp.float32)))
        chosen, alts = rows[i - 1]
        assert abs(chosen - lp[toks[i]]) < 1e-3, i
        assert alts[0][0] == int(np.argmax(lp))
        assert abs(alts[0][1] - lp.max()) < 1e-3
        ls = [v for _, v in alts]
        assert ls == sorted(ls, reverse=True)


def test_make_score_fn_ssm_hybrid():
    """SSM/hybrid stacks score via a T=1 scan inside the chunk graph
    (the recurrence cannot run a T-wide forward); oracle is token-by-
    token teacher forcing with the plain forward."""
    ssm = llm.SSMConfig(conv_kernel=3, state_size=8, group_count=2,
                        time_step_rank=4, inner_size=32)
    cfg = tiny_cfg(ssm=ssm, full_attention_interval=2, qk_norm=8,
                   max_context=64)
    params = llm.init_params(cfg, seed=7)
    toks = [int(t) for t in
            np.random.default_rng(0).integers(1, cfg.vocab_size, 40)]
    rows = llm.make_score_fn(cfg)(params, toks)
    freqs = jnp.asarray(llm.precompute_freqs(
        cfg.rope_dim, cfg.max_context, cfg.rope_theta))
    state = llm.init_state(cfg, batch=1)
    lps = []
    for t, tok in enumerate(toks):
        hidden, state = llm.forward(params, cfg, state,
                                    jnp.asarray([[tok]], jnp.int32), t,
                                    freqs)
        lg = llm.logits_at(params, cfg, hidden, jnp.int32(0))[0]
        lps.append(np.asarray(jax.nn.log_softmax(
            jnp.asarray(lg, jnp.float32))))
    for i in (1, 20, 33, len(toks) - 1):
        assert abs(rows[i - 1][0] - lps[i - 1][toks[i]]) < 1e-3, i


def test_http_scoring_and_echo():
    """max_tokens=0 + echo + logprobs scores the prompt (first entry
    null); echo + generation prepends prompt scores with shifted
    offsets; echo+stream and chat max_tokens=0 are rejected."""
    from clearcam_tpu.serving import TextServing
    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore
    from test_http_generate import TinyTok, _post

    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2).start()
    gen = TextServing(eng, TinyTok())
    ctx = AppContext(KVStore(":memory:"), "/tmp/cc_echo_http", gen=gen)
    server = serve(ctx, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        prompt = "hello scoring"
        ids = gen.encode_prompt(prompt, True)
        with _post(f"{url}/v1/completions",
                   {"prompt": prompt, "max_tokens": 0, "echo": True,
                    "logprobs": 2}) as r:
            out = json.loads(r.read())
        ch = out["choices"][0]
        assert ch["text"] == prompt
        lp = ch["logprobs"]
        assert len(lp["tokens"]) == len(ids)
        assert lp["token_logprobs"][0] is None
        assert lp["top_logprobs"][0] is None
        assert all(v <= 1e-6 for v in lp["token_logprobs"][1:])
        # cross-check one scored position against the library scorer
        want = gen.score_ids(ids)
        for got, (w, _) in zip(lp["token_logprobs"][1:], want):
            assert math.isclose(got, w, rel_tol=1e-5, abs_tol=1e-6)
        assert out["usage"]["completion_tokens"] == 0
        # echo + generation: prompt entries ride ahead, offsets shifted
        with _post(f"{url}/v1/completions",
                   {"prompt": prompt, "max_tokens": 4, "temperature": 0,
                    "echo": True, "logprobs": 1}) as r:
            out2 = json.loads(r.read())
        c2 = out2["choices"][0]
        assert c2["text"].startswith(prompt)
        lp2 = c2["logprobs"]
        n_gen = len(c2["text"]) - len(prompt)
        assert len(lp2["tokens"]) == len(ids) + n_gen  # TinyTok: 1 ch/tok
        assert lp2["text_offset"] == sorted(lp2["text_offset"])
        assert lp2["text_offset"][len(ids)] == len(prompt)
        assert lp2["token_logprobs"][0] is None
        assert all(v <= 1e-6 for v in lp2["token_logprobs"][1:])
        # plain echo without logprobs
        with _post(f"{url}/v1/completions",
                   {"prompt": prompt, "max_tokens": 3,
                    "temperature": 0, "echo": True}) as r:
            out3 = json.loads(r.read())
        assert out3["choices"][0]["text"].startswith(prompt)
        assert out3["choices"][0]["logprobs"] is None
        for bad in ({"prompt": prompt, "max_tokens": 2, "echo": True,
                     "stream": True},
                    {"prompt": prompt, "max_tokens": 0}):
            try:
                _post(f"{url}/v1/completions", bad)
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        server.shutdown()
        eng.close()
