"""Sequence-parallel LLM prefill parity vs the single-device forward."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from clearcam_tpu.models import llm
from clearcam_tpu.parallel.long_prefill import make_sharded_prefill


def tiny_cfg(**kw):
    base = dict(num_blocks=2, dim=32, hidden_dim=64, n_heads=4, n_kv_heads=2,
                norm_eps=1e-5, vocab_size=128, head_dim=8, rope_theta=1e4,
                rope_dim=8, v_head_dim=8, max_context=256)
    base.update(kw)
    return llm.TransformerConfig(**base)


def make_mesh():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))


def test_sharded_prefill_matches_single_device():
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=0)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 64)), jnp.int32)

    state = llm.init_state(cfg, batch=2)
    freqs = jnp.asarray(llm.precompute_freqs(cfg.rope_dim, cfg.max_context,
                                             cfg.rope_theta))
    ref_hidden, ref_state = llm.forward(params, cfg, state, tokens, 0, freqs)

    mesh = make_mesh()
    with mesh:
        hidden, kvs = make_sharded_prefill(mesh, cfg)(params, tokens)
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(ref_hidden),
                               rtol=3e-5, atol=3e-5)
    # per-layer K/V match the cache the single-device prefill wrote
    t = tokens.shape[1]
    for i, (k, v) in enumerate(kvs):
        # sharded layout [B, T, KvH, D] vs cache [B, KvH, S, D]
        np.testing.assert_allclose(
            np.asarray(k).transpose(0, 2, 1, 3),
            np.asarray(ref_state[i]["k"][:, :, :t]), rtol=3e-5, atol=3e-5,
            err_msg=f"layer {i} K")
        np.testing.assert_allclose(
            np.asarray(v).transpose(0, 2, 1, 3),
            np.asarray(ref_state[i]["v"][:, :, :t]), rtol=3e-5, atol=3e-5,
            err_msg=f"layer {i} V")


def test_sharded_prefill_same_next_token():
    """End goal: the sequence-parallel prefill picks the same next token."""
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=3)
    rng = np.random.default_rng(4)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 32)), jnp.int32)

    state = llm.init_state(cfg, batch=1)
    freqs = jnp.asarray(llm.precompute_freqs(cfg.rope_dim, cfg.max_context,
                                             cfg.rope_theta))
    ref_hidden, _ = llm.forward(params, cfg, state, tokens, 0, freqs)
    ref_tok = int(jnp.argmax(llm.logits_at(params, cfg, ref_hidden, 31), -1)[0])

    mesh = make_mesh()
    with mesh:
        hidden, _ = make_sharded_prefill(mesh, cfg)(params, tokens)
    tok = int(jnp.argmax(llm.logits_at(params, cfg, jnp.asarray(hidden), 31),
                         -1)[0])
    assert tok == ref_tok


def test_sharded_prefill_then_standard_decode():
    """Full long-prompt generation loop: sequence-parallel prefill ->
    materialize the decode cache -> the ordinary single-chip decode produces
    the SAME greedy continuation as an all-single-device run."""
    from clearcam_tpu.parallel.long_prefill import materialize_state

    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=7)
    rng = np.random.default_rng(8)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 32)), jnp.int32)
    freqs = jnp.asarray(llm.precompute_freqs(cfg.rope_dim, cfg.max_context,
                                             cfg.rope_theta))

    def decode_n(state, first_tok, start, n=4):
        toks = [int(first_tok)]
        for j in range(n - 1):
            hidden, state = llm.forward(
                params, cfg, state, jnp.asarray([[toks[-1]]], jnp.int32),
                start + j, freqs)
            logits = llm.logits_at(params, cfg, hidden, 0)
            toks.append(int(jnp.argmax(logits, -1)[0]))
        return toks

    # reference: single-device prefill + decode
    st = llm.init_state(cfg, 1)
    hidden, st = llm.forward(params, cfg, st, prompt, 0, freqs)
    t0 = int(jnp.argmax(llm.logits_at(params, cfg, hidden, 31), -1)[0])
    ref = decode_n(st, t0, 32)

    # sequence-parallel prefill + materialized cache + same decode loop
    mesh = make_mesh()
    with mesh:
        hidden_sp, kvs = make_sharded_prefill(mesh, cfg)(params, prompt)
    st_sp = materialize_state(cfg, kvs, batch=1)
    t0_sp = int(jnp.argmax(
        llm.logits_at(params, cfg, jnp.asarray(hidden_sp), 31), -1)[0])
    got = decode_n(st_sp, t0_sp, 32)
    assert got == ref, (got, ref)


def test_rejects_recurrent_stacks():
    cfg = tiny_cfg(ssm=llm.SSMConfig(conv_kernel=4, state_size=8,
                                     group_count=2, time_step_rank=4,
                                     inner_size=32),
                   full_attention_interval=2)
    with pytest.raises(AssertionError, match="attention"):
        make_sharded_prefill(make_mesh(), cfg)
