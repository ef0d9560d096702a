"""Pipeline parallelism: GPipe schedule over a ("stage",) mesh — exact
parity with sequential stage application, gradients through the schedule,
and the LLM block-stack instantiation vs llm.forward."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clearcam_tpu.parallel import pipeline as pp


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return pp.make_pp_mesh(n)


def _mlp_stage(p, x):
    return jax.nn.silu(x @ p["w1"]) @ p["w2"]


def _mlp_params(key, n_stages, d=16, h=32):
    ks = jax.random.split(key, 2 * n_stages)
    stages = [{"w1": jax.random.normal(ks[2 * i], (d, h)) * 0.3,
               "w2": jax.random.normal(ks[2 * i + 1], (h, d)) * 0.3}
              for i in range(n_stages)]
    return stages, jax.tree.map(lambda *xs: jnp.stack(xs), *stages)


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (4, 1), (8, 3)])
def test_pipeline_matches_sequential(n_stages, n_micro):
    mesh = _mesh(n_stages)
    stages, stacked = _mlp_params(jax.random.PRNGKey(0), n_stages)
    x = jax.random.normal(jax.random.PRNGKey(1), (n_micro, 2, 16))

    out = pp.pipeline_apply(mesh, "stage", _mlp_stage, stacked, x)

    ref = x
    for sp in stages:
        ref = _mlp_stage(sp, ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_grad_through_schedule():
    """jax.grad differentiates through the scan+ppermute schedule: pipelined
    gradients equal sequential ones (no hand-written backward needed)."""
    n_stages, n_micro = 4, 3
    mesh = _mesh(n_stages)
    stages, stacked = _mlp_params(jax.random.PRNGKey(2), n_stages)
    x = jax.random.normal(jax.random.PRNGKey(3), (n_micro, 2, 16))

    def loss_pp(p):
        return jnp.sum(pp.pipeline_apply(mesh, "stage", _mlp_stage, p, x) ** 2)

    def loss_seq(ps):
        y = x
        for sp in ps:
            y = _mlp_stage(sp, y)
        return jnp.sum(y ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq = jax.grad(loss_seq)(stages)
    g_seq = jax.tree.map(lambda *xs: jnp.stack(xs), *g_seq)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), g_pp, g_seq)


def test_pp_llm_prefill_matches_forward():
    """The stage-sharded LLM prefill equals the single-device llm.forward
    hidden states (4 stages x 1 block, dense attention)."""
    from clearcam_tpu.models import llm

    mesh = _mesh(4)
    cfg = llm.TransformerConfig(
        num_blocks=4, dim=32, hidden_dim=64, n_heads=4, n_kv_heads=2,
        norm_eps=1e-5, vocab_size=64, head_dim=8, rope_theta=1e4, rope_dim=8,
        v_head_dim=8, max_context=16)
    params = llm.init_params(cfg, seed=0)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, (4, 16)), jnp.int32)

    h_pp = pp.pp_llm_prefill(mesh, "stage", params, cfg, tokens, n_micro=2)

    freqs = jnp.asarray(llm.precompute_freqs(cfg.rope_dim, cfg.max_context,
                                             cfg.rope_theta))
    state = llm.init_state(cfg, batch=4)
    h_ref, _ = llm.forward(params, cfg, state, tokens, 0, freqs)
    np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref),
                               rtol=1e-4, atol=1e-5)


def test_stack_llm_stage_params_layout():
    from clearcam_tpu.models import llm

    cfg = llm.TransformerConfig(
        num_blocks=4, dim=32, hidden_dim=64, n_heads=4, n_kv_heads=2,
        norm_eps=1e-5, vocab_size=64, head_dim=8, rope_theta=1e4, rope_dim=8,
        v_head_dim=8, max_context=16)
    params = llm.init_params(cfg, seed=1)
    st = pp.stack_llm_stage_params(params, cfg, 2)
    # 2 stages x 2 relative blocks; stage 1's blk.0 == absolute blk.2
    assert st["blk.0.attn_q.weight"].shape[0] == 2
    np.testing.assert_array_equal(np.asarray(st["blk.0.attn_q.weight"][1]),
                                  np.asarray(params["blk.2.attn_q.weight"]))
    np.testing.assert_array_equal(np.asarray(st["blk.1.attn_q.weight"][0]),
                                  np.asarray(params["blk.1.attn_q.weight"]))


def _mse(pred, tgt):
    return jnp.mean((pred - tgt) ** 2)


@pytest.mark.parametrize("n_stages,n_micro", [(4, 6), (4, 1), (8, 3)])
def test_1f1b_matches_sequential_grads(n_stages, n_micro):
    """1F1B-scheduled training step: loss AND per-stage grads equal the
    sequential computation (backward reordering changes only the
    accumulation order)."""
    mesh = _mesh(n_stages)
    stages, stacked = _mlp_params(jax.random.PRNGKey(4), n_stages)
    x = jax.random.normal(jax.random.PRNGKey(5), (n_micro, 2, 16))
    y = jax.random.normal(jax.random.PRNGKey(6), (n_micro, 2, 16))

    loss, grads = pp.pipeline_train_step_1f1b(
        mesh, "stage", _mlp_stage, _mse, stacked, x, y)

    def loss_seq(ps):
        h = x
        for sp in ps:
            h = _mlp_stage(sp, h)
        return jnp.mean(jax.vmap(_mse)(h, y))

    ref_loss, ref_g = jax.value_and_grad(loss_seq)(stages)
    ref_g = jax.tree.map(lambda *xs: jnp.stack(xs), *ref_g)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    # atol covers f32 accumulation-order noise (1F1B sums microbatch grads
    # in a different order than the sequential oracle)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-4), grads, ref_g)


def test_1f1b_matches_gpipe_autodiff():
    """Both training schedules agree with each other (and hence with the
    sequential oracle) on the same inputs."""
    n_stages, n_micro = 4, 5
    mesh = _mesh(n_stages)
    _, stacked = _mlp_params(jax.random.PRNGKey(7), n_stages)
    x = jax.random.normal(jax.random.PRNGKey(8), (n_micro, 2, 16))
    y = jax.random.normal(jax.random.PRNGKey(9), (n_micro, 2, 16))
    l1, g1 = pp.pipeline_train_step_1f1b(
        mesh, "stage", _mlp_stage, _mse, stacked, x, y)
    l2, g2 = pp.pipeline_train_step_gpipe(
        mesh, "stage", _mlp_stage, _mse, stacked, x, y)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), g1, g2)


def test_1f1b_activation_memory_is_bounded():
    """The 1F1B scan carry stores a 2S-1-deep input ring — NOT M
    activations: growing M must not grow the carry (the GPipe autodiff
    path, by contrast, saves all M+S-1 forward carries for backward)."""
    n_stages = 4
    mesh = _mesh(n_stages)
    _, stacked = _mlp_params(jax.random.PRNGKey(0), n_stages)

    def carry_bytes(n_micro):
        x = jnp.zeros((n_micro, 2, 16))
        y = jnp.zeros((n_micro, 2, 16))
        jaxpr = jax.make_jaxpr(
            lambda p: pp.pipeline_train_step_1f1b(
                mesh, "stage", _mlp_stage, _mse, p, x, y))(stacked)
        # largest scan-carried buffer in the jaxpr ~ the input ring
        sizes = [np.prod(v.aval.shape) * v.aval.dtype.itemsize
                 for eqn in jaxpr.jaxpr.eqns for v in eqn.invars
                 if hasattr(v, "aval") and v.aval.shape]
        return max(sizes)

    assert carry_bytes(32) == carry_bytes(4), \
        "activation storage must be independent of microbatch count"


def test_pp_llm_train_step_matches_sequential():
    """Pipelined LLM block-stack training (1F1B): loss + grads equal the
    sequential forward + jax.grad over the same stage decomposition."""
    from clearcam_tpu.models import llm
    from clearcam_tpu.nn import functional as F

    n_stages, n_micro, T = 4, 2, 8
    mesh = _mesh(n_stages)
    cfg = llm.TransformerConfig(
        num_blocks=4, dim=32, hidden_dim=64, n_heads=4, n_kv_heads=2,
        norm_eps=1e-5, vocab_size=64, head_dim=8, rope_theta=10000.0,
        rope_dim=8, v_head_dim=8, max_context=T)
    params = llm.init_params(cfg, seed=1)
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (4, T), 0, cfg.vocab_size)
    targets = jax.random.randint(jax.random.PRNGKey(1), (4, T), 0,
                                 cfg.vocab_size)

    loss, grads = pp.pp_llm_train_step(mesh, "stage", params, cfg, tokens,
                                       targets, n_micro)

    stacked = pp.stack_llm_stage_params(params, cfg, n_stages)
    stage_fn = pp.make_llm_stage_fn(cfg, n_stages, T)

    def seq_loss(stk):
        x = F.embedding(params["token_embd.weight"], tokens) \
            .astype(jnp.float32)
        x = x.reshape(n_micro, 4 // n_micro, T, -1)
        for s in range(n_stages):
            sp = jax.tree.map(lambda a, s=s: a[s], stk)
            x = jax.vmap(lambda mb: stage_fn(sp, mb))(x)
        h = F.rms_norm(x, params["output_norm.weight"], cfg.norm_eps)
        logits = F.linear(h, params["output.weight"])
        logp = jax.nn.log_softmax(logits, -1)
        tgt = targets.reshape(n_micro, 4 // n_micro, T)
        return -jnp.mean(jnp.take_along_axis(logp, tgt[..., None], -1))

    ref_loss, ref_g = jax.value_and_grad(seq_loss)(stacked)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-4), grads, ref_g)


def test_pp_llm_train_step_under_jit():
    """The supported jit usage — params as arguments of the jitted wrapper
    — must trace and run (head weights flow as tracers, not baked
    constants; CLAUDE.md closure rule)."""
    from clearcam_tpu.models import llm

    n_stages, T = 4, 8
    mesh = _mesh(n_stages)
    cfg = llm.TransformerConfig(
        num_blocks=4, dim=32, hidden_dim=64, n_heads=4, n_kv_heads=2,
        norm_eps=1e-5, vocab_size=64, head_dim=8, rope_theta=10000.0,
        rope_dim=8, v_head_dim=8, max_context=T)
    params = llm.init_params(cfg, seed=2)
    tokens = jnp.zeros((2, T), jnp.int32)
    targets = jnp.ones((2, T), jnp.int32)

    step = jax.jit(lambda p, x, y: pp.pp_llm_train_step(
        mesh, "stage", p, cfg, x, y, n_micro=2))
    loss, grads = step(params, tokens, targets)
    assert np.isfinite(float(loss))
    ref_loss, _ = pp.pp_llm_train_step(mesh, "stage", params, cfg, tokens,
                                       targets, n_micro=2)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
