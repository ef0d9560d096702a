"""Per-request reproducible sampling (OpenAI ``seed``): row Gumbel noise
is keyed by (engine base seed, request seed, generated-token index) via
llm.serving_row_keys — independent of slot assignment, engine step count,
and batch companions. The reference has no seed surface (it samples from
an ambient key, utils/model.py:318-319); this is OpenAI serving parity.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from clearcam_tpu.models import llm
from clearcam_tpu.serving import ServingEngine

from test_llm import tiny_cfg


def test_row_keys_position_independent():
    """A row's draw depends on (seed, idx), not its batch position or
    companions: move the row, change the neighbours — same token."""
    rng = np.random.default_rng(0)
    row = rng.normal(0, 1, (1, 16)).astype(np.float32)
    base = jax.random.PRNGKey(0)
    samp = llm.pack_samp(1.0)

    def draw(batch, seeds, idx):
        rk = llm.serving_row_keys(base, jnp.asarray(seeds, jnp.int32),
                                  jnp.asarray(idx, jnp.int32))
        return np.asarray(llm.sample_filtered(
            jnp.asarray(batch), samp, None, row_keys=rk))

    a = draw(np.concatenate([row, rng.normal(0, 1, (2, 16))
                             .astype(np.float32)]), [7, 1, 2], [3, 0, 0])
    b = draw(np.concatenate([rng.normal(2, 1, (2, 16)).astype(np.float32),
                             row]), [9, 9, 7], [0, 0, 3])
    assert a[0] == b[2]
    # different seed or different idx -> (almost surely) a different
    # noise field; check over several steps that draws are not constant
    outs = {int(draw(row, [7], [i])[0]) for i in range(8)}
    outs |= {int(draw(row, [s], [3])[0]) for s in range(8)}
    assert len(outs) > 1


def test_engine_seeded_matches_generate_batch():
    """engine submit(seed=S) == generate_batch(seeds=[S]) token-for-token
    at equal batch width (CPU f32): the two stacks share one key scheme."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    prompt = [1, 2, 3, 4, 5]
    want = llm.generate_batch(params, cfg, [prompt], max_new=8,
                              temperature=0.9, seeds=[123])[0]
    eng = ServingEngine(params, cfg, n_slots=1)
    r = eng.submit(prompt, max_new=8, temperature=0.9, seed=123)
    eng.run_until_idle()
    assert r.wait(1) == want
    # a second engine, same seed, after unrelated traffic (different
    # steps AND a different slot) — same output
    eng2 = ServingEngine(params, cfg, n_slots=1)
    r0 = eng2.submit([9, 8, 7, 6], max_new=5)
    eng2.run_until_idle()
    r0.wait(1)
    r2 = eng2.submit(prompt, max_new=8, temperature=0.9, seed=123)
    eng2.run_until_idle()
    assert r2.wait(1) == want


def test_engine_seed_slot_and_step_invariance():
    """The same seeded request drawn on a busy engine (other slots live,
    later step numbers) equals its quiet-engine output; unseeded
    submissions draw fresh random seeds (recorded per request)."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    prompt = [2, 4, 6]
    eng = ServingEngine(params, cfg, n_slots=3)
    quiet = eng.submit(prompt, max_new=6, temperature=0.8, seed=77)
    eng.run_until_idle()
    want = quiet.wait(1)
    busy = ServingEngine(params, cfg, n_slots=3)
    others = [busy.submit([5, 5, 5 + i], max_new=10) for i in range(2)]
    seeded = busy.submit(prompt, max_new=6, temperature=0.8, seed=77)
    busy.run_until_idle()
    for o in others:
        o.wait(1)
    assert seeded.wait(1) == want
    # spec engines reject seed (like logprobs)
    spec = ServingEngine(params, cfg, n_slots=2, spec_lookup=3)
    try:
        spec.submit([1, 2], max_new=2, seed=1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_seed_64bit_and_reduction():
    """OpenAI seeds are 64-bit: a big seed must not OverflowError the
    scheduler's int32 slot buffer — it reduces mod 2^31, deterministically
    (seed and seed % 2^31 draw identically)."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=1)
    big = (1 << 33) + 12345
    r1 = eng.submit([1, 2, 3], max_new=6, temperature=0.9, seed=big)
    eng.run_until_idle()
    t1 = r1.wait(1)
    r2 = eng.submit([1, 2, 3], max_new=6, temperature=0.9,
                    seed=big % (1 << 31))
    eng.run_until_idle()
    assert r2.wait(1) == t1


def test_http_seed_n_choices_distinct():
    """n>1 + seed folds the choice index into each choice's seed: choice
    i of one call == choice 0 of a solo call with seed+i (reproducible
    AND distinct, not n bit-identical copies)."""
    from clearcam_tpu.serving import TextServing
    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore
    from test_http_generate import TinyTok, _post

    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2).start()
    gen = TextServing(eng, TinyTok())
    ctx = AppContext(KVStore(":memory:"), "/tmp/cc_seedn_http", gen=gen)
    server = serve(ctx, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        body = {"prompt": "fan out", "max_tokens": 6,
                "temperature": 0.9, "seed": 7}
        with _post(f"{url}/v1/completions", {**body, "n": 2}) as r:
            pair = json.loads(r.read())["choices"]
        texts = {}
        for s in (7, 8):
            with _post(f"{url}/v1/completions", {**body, "seed": s}) as r:
                texts[s] = json.loads(r.read())["choices"][0]["text"]
        assert pair[0]["text"] == texts[7]
        assert pair[1]["text"] == texts[8]
    finally:
        server.shutdown()
        eng.close()


def test_http_openai_seed():
    """/v1/completions with seed: two identical stochastic requests give
    identical text; response carries system_fingerprint."""
    from clearcam_tpu.serving import TextServing
    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore
    from test_http_generate import TinyTok, _post

    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2).start()
    gen = TextServing(eng, TinyTok())
    ctx = AppContext(KVStore(":memory:"), "/tmp/cc_seed_http", gen=gen)
    server = serve(ctx, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        body = {"prompt": "seed me", "max_tokens": 8, "temperature": 0.9,
                "seed": 42}
        outs = []
        for _ in range(2):
            with _post(f"{url}/v1/completions", body) as r:
                outs.append(json.loads(r.read()))
        assert outs[0]["choices"][0]["text"] == outs[1]["choices"][0]["text"]
        assert outs[0]["system_fingerprint"].startswith("fp_cc_")
    finally:
        server.shutdown()
        eng.close()


def test_system_fingerprint_tracks_batch_width_config():
    """system_fingerprint must change with any batch-width/numerics-
    affecting engine config (VERDICT r3 item 7): seeded draws are only
    comparable under an identical fingerprint (PARITY.md bf16 tiling
    caveat)."""
    from clearcam_tpu.serving import TextServing

    class FakeTok:
        def encode(self, s):
            return [1]

    cfg = tiny_cfg(max_context=32)
    params = llm.init_params(cfg, seed=0)

    def fp(**kw):
        return TextServing(ServingEngine(params, cfg, **kw), FakeTok()) \
            .fingerprint()

    base = fp(n_slots=2)
    assert base.startswith("fp_cc_")
    assert fp(n_slots=2) == base                      # stable per config
    assert fp(n_slots=4) != base                      # batch width
    assert fp(n_slots=2, state_dtype=jnp.bfloat16) != base   # KV dtype
    assert fp(n_slots=2, kv_quant=True,
              state_dtype=jnp.bfloat16) != base              # KV quant
    assert fp(n_slots=2, spec_lookup=3) != base              # spec decode
