"""OpenAI-style logprobs through the serving stack: the non-spec serving
graphs return a packed [chosen_lp, top-K lps, top-K ids] row per sample
(llm.sample_filtered_lp) over the post-penalty/bias PRE-temperature
distribution; the engine records rows for requests that ask
(submit(logprobs=k)); /v1/completions and /v1/chat/completions emit the
OpenAI payload shapes. The reference has no logprobs surface (it samples
and discards the distribution, utils/model.py:318-319) — this is
standard serving-surface parity with OpenAI-compatible servers."""
import json
import math
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from clearcam_tpu.models import llm
from clearcam_tpu.serving import ServingEngine

from test_llm import tiny_cfg


def test_sample_filtered_lp_unit():
    """Packed row: chosen lp == log_softmax at the sampled id; top-K
    descending; filters/temperature do NOT move the reported lp."""
    logits = [2.0, 1.5, 0.0, -1.0]
    lg = jnp.asarray([logits], jnp.float32)
    want = np.log(np.exp(logits) / np.exp(logits).sum())
    for samp in (llm.pack_samp(0.0),
                 llm.pack_samp(4.0, top_k=1),      # filtered draw
                 llm.pack_samp(0.5, top_p=0.9)):
        tok, row = jax.jit(llm.sample_filtered_lp)(
            lg, samp, jax.random.PRNGKey(0))
        t, r = int(tok[0]), np.asarray(row[0])
        assert r.shape == (1 + 2 * llm.LP_K,)        # FIXED row width:
        # toy vocabs pad (engine buffers assume the full layout)
        K = min(llm.LP_K, 4)                         # real alts
        assert abs(r[0] - want[t]) < 1e-5            # chosen lp
        top_lp = r[1:1 + K]
        top_id = r[1 + llm.LP_K:1 + llm.LP_K + K].astype(np.int64)
        assert list(top_lp) == sorted(top_lp, reverse=True)
        assert top_id[0] == 0 and abs(top_lp[0] - want[0]) < 1e-5
    # penalties DO move the reported distribution (post-penalty base)
    samp = llm.pack_samp(0.0, presence=1.0)
    _, row = jax.jit(llm.sample_filtered_lp)(
        lg, samp, jax.random.PRNGKey(0),
        jnp.zeros((1, 4), jnp.int32),
        jnp.asarray([[1, 0, 0, 0]], jnp.int32))
    pen = np.asarray([1.0, 1.5, 0.0, -1.0])         # token 0 penalized
    want_pen = pen - np.log(np.exp(pen).sum())
    assert abs(np.asarray(row[0])[1] - want_pen.max()) < 1e-5


def test_engine_logprobs_match_forward():
    """Engine-recorded rows: one per generated token; chosen id's lp
    matches a from-scratch log_softmax over the model's logits (greedy,
    no penalties => processed logits == raw logits)."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    prompt = [1, 2, 3, 4]
    eng = ServingEngine(params, cfg, n_slots=2)
    rl = eng.submit(prompt, max_new=6, logprobs=3)
    rg = eng.submit([9, 8, 7], max_new=6)            # no logprobs beside it
    eng.run_until_idle()
    toks = rl.wait(1)
    assert len(rl.lp) == len(toks) and rg.lp == []
    # reference logprobs: teacher-force the emitted sequence
    model = llm.Transformer(params, cfg, seed=0)
    want = [t for t in model.generate(prompt, temperature=0.0, max_new=6)]
    assert toks == want
    ids = prompt + toks
    for i, (chosen_lp, alts) in enumerate(rl.lp):
        logits = llm.score_logits(params, cfg, ids[:len(prompt) + i])
        lp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32))
        assert abs(chosen_lp - float(lp[toks[i]])) < 1e-3
        assert len(alts) == 3
        assert alts[0][0] == int(jnp.argmax(lp))
        assert abs(alts[0][1] - float(jnp.max(lp))) < 1e-3
        # descending, and the chosen greedy token IS the top alternative
        assert alts[0][1] >= alts[1][1] >= alts[2][1]
        assert alts[0][0] == toks[i]


def test_engine_logprobs_batched_prefill_and_validation():
    """Rows arrive under the batched multi-slot prefill path too (first
    token comes from prefill_many's first_lp); spec engines reject."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=3)
    rs = [eng.submit([1 + i, 2, 3], max_new=4, logprobs=2)
          for i in range(3)]                        # admitted together
    eng.run_until_idle()
    for r in rs:
        r.wait(1)
        assert len(r.lp) == len(r.tokens)
        assert all(lp <= 1e-6 for lp, _ in r.lp)
        assert all(len(a) == 2 for _, a in r.lp)
    assert eng.stats["prefill_batched_steps"] > 0
    spec = ServingEngine(params, cfg, n_slots=2, spec_lookup=3)
    try:
        spec.submit([1, 2], max_new=2, logprobs=1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    try:
        eng.submit([1, 2], max_new=2, logprobs=llm.LP_K + 1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_http_openai_logprobs():
    """Completions int param + chat logprobs/top_logprobs param; payload
    shapes per the OpenAI schema; stream+logprobs rejected."""
    from clearcam_tpu.serving import TextServing
    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore
    from test_http_generate import TinyTok, _post

    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2).start()
    gen = TextServing(eng, TinyTok())
    ctx = AppContext(KVStore(":memory:"), "/tmp/cc_lp_http", gen=gen)
    server = serve(ctx, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        body = {"prompt": "hello", "max_tokens": 6, "temperature": 0,
                "logprobs": 2}
        with _post(f"{url}/v1/completions", body) as r:
            out = json.loads(r.read())
        lp = out["choices"][0]["logprobs"]
        text = out["choices"][0]["text"]
        assert "".join(lp["tokens"]) == text
        n = len(lp["tokens"])
        assert len(lp["token_logprobs"]) == n == len(lp["top_logprobs"])
        assert lp["text_offset"][0] == 0 and len(lp["text_offset"]) == n
        assert all(v <= 1e-6 for v in lp["token_logprobs"])
        assert all(len(d) == 2 for d in lp["top_logprobs"])
        # greedy: the chosen token is the argmax => its lp is the max alt
        for s, v, d in zip(lp["tokens"], lp["token_logprobs"],
                           lp["top_logprobs"]):
            assert s in d and math.isclose(d[s], v, rel_tol=1e-5)
            assert v == max(d.values())
        # chat shape
        cbody = {"messages": [{"role": "user", "content": "hi"}],
                 "max_tokens": 4, "temperature": 0, "logprobs": True,
                 "top_logprobs": 2}
        with _post(f"{url}/v1/chat/completions", cbody) as r:
            out = json.loads(r.read())
        content = out["choices"][0]["logprobs"]["content"]
        msg = out["choices"][0]["message"]["content"]
        assert "".join(e["token"] for e in content) == msg
        for e in content:
            assert len(e["top_logprobs"]) == 2
            assert e["bytes"] == list(e["token"].encode())
            assert e["logprob"] <= 1e-6
        # streamed completions: chunk logprobs concatenate to the
        # non-streamed payload (absolute text_offsets)
        with _post(f"{url}/v1/completions",
                   {**body, "stream": True}) as r:
            events = [ln[6:] for ln in r.read().decode().split("\n")
                      if ln.startswith("data: ")]
        assert events[-1] == "[DONE]"
        chunks = [json.loads(e) for e in events[:-1]]
        got = {"tokens": [], "token_logprobs": [], "top_logprobs": [],
               "text_offset": []}
        for c in chunks:
            p = c["choices"][0]["logprobs"]
            if p:
                for k in got:
                    got[k] += p[k]
        assert got["tokens"] == lp["tokens"]
        assert got["text_offset"] == lp["text_offset"]
        assert np.allclose(got["token_logprobs"], lp["token_logprobs"])
        assert got["top_logprobs"] == lp["top_logprobs"]
        # streamed chat: per-chunk content entries concatenate too
        with _post(f"{url}/v1/chat/completions",
                   {**cbody, "stream": True}) as r:
            events = [ln[6:] for ln in r.read().decode().split("\n")
                      if ln.startswith("data: ")]
        sc = [json.loads(e) for e in events[:-1]]
        entries = []
        for c in sc:
            p = c["choices"][0].get("logprobs")
            if p:
                entries += p["content"]
        assert [e["token"] for e in entries] == \
            [e["token"] for e in content]
    finally:
        server.shutdown()
        eng.close()
