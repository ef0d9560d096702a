"""Pipeline parallelism (GPipe schedule) over a mesh axis.

The reference is a single-accelerator system (SURVEY §2.3 — no DP/TP/PP
anywhere); pipeline parallelism is the TPU-native scale-out for models whose
layer stack exceeds one chip's HBM. Design:

  * stages hold contiguous block ranges; stage s's params live only on
    device s of the `stage` mesh axis (leading-axis sharded stack)
  * activations hop stage -> stage over ICI via `ppermute` inside ONE jitted
    `shard_map` program — no host round trips between stages
  * microbatches keep every stage busy outside the fill/drain bubble:
    M microbatches over S stages run in M + S - 1 ticks (GPipe), bubble
    fraction (S-1)/(M+S-1)
  * the whole schedule is a `lax.scan`, so `jax.grad` differentiates through
    it (ppermute's transpose is the reverse ppermute) — pipelined training
    steps need no hand-written backward schedule

`pipeline_apply` is generic over a stage function; `make_llm_stage_fn` +
`stack_llm_stage_params` instantiate it for the dense-attention LLM prefill
(long-prompt forward with the layer stack sharded across chips).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(mesh: Mesh, axis: str, stage_fn, stacked_params, x):
    """Run S pipeline stages over microbatches.

    stage_fn(stage_params, mb) -> mb' (shape-preserving)
    stacked_params: pytree with leading stage axis [S, ...] (sharded over
    `axis`); x: [M, ...] microbatches (replicated).
    Returns [M, ...] = stage_{S-1}(...stage_0(x)...), replicated.
    """
    s_n = mesh.shape[axis]
    m_n = x.shape[0]

    def per_device(p_local, x_full):
        p_local = jax.tree.map(lambda a: a[0], p_local)   # [1,...] -> [...]
        stage = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % s_n) for i in range(s_n)]

        def step(carry, t):
            buf, outs = carry
            # stage 0 ingests microbatch t; others take the ppermute buffer
            inp = jnp.where(stage == 0, x_full[jnp.clip(t, 0, m_n - 1)], buf)
            y = stage_fn(p_local, inp)
            # stage s is working on microbatch t - s; only [0, M) are real
            mb = t - stage
            mb_c = jnp.clip(mb, 0, m_n - 1)
            emit = (stage == s_n - 1) & (mb >= 0) & (mb < m_n)
            outs = outs.at[mb_c].set(jnp.where(emit, y, outs[mb_c]))
            buf = jax.lax.ppermute(y, axis, perm)
            return (buf, outs), None

        # the carry varies per stage (ppermute output) — mark the zero init
        # as stage-varying or scan rejects the carry type
        init = jax.tree.map(
            lambda a: jax.lax.pcast(a, (axis,), to="varying"),
            (jnp.zeros_like(x_full[0]), jnp.zeros_like(x_full)))
        (_, outs), _ = jax.lax.scan(step, init,
                                    jnp.arange(m_n + s_n - 1))
        # outputs accumulated on the last stage only -> replicate
        return jax.lax.psum(jnp.where(stage == s_n - 1, outs, 0.0), axis)

    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(P(axis), P()), out_specs=P())
    return fn(stacked_params, x)


# ---------------------------------------------------------------------------
# training schedules: GPipe (autodiff) and 1F1B (hand-scheduled backward)
# ---------------------------------------------------------------------------

def pipeline_train_step_gpipe(mesh: Mesh, axis: str, stage_fn, loss_fn,
                              stacked_params, x, y):
    """Reference training step: jax.grad straight through pipeline_apply's
    scan. Simple and exact, but the scan saves EVERY forward carry for the
    backward pass — per-stage activation memory grows with the microbatch
    count M (plus stage_fn internals unless remat'd). Loss is the mean of
    loss_fn(stage_out[m], y[m]) over microbatches."""
    def total_loss(p):
        out = pipeline_apply(mesh, axis, stage_fn, p, x)
        return jnp.mean(jax.vmap(loss_fn)(out, y))

    return jax.value_and_grad(total_loss)(stacked_params)


def pipeline_train_step_1f1b(mesh: Mesh, axis: str, stage_fn, loss_fn,
                             stacked_params, x, y):
    """1F1B-scheduled pipelined training step: loss + per-stage grads.

    Why not just grad-of-GPipe (above): its backward replays the whole
    forward scan, so every stage holds all M microbatch activations. Here
    each global tick runs ONE forward phase and ONE backward phase per
    stage (the 1F1B steady state), backward of microbatch m on stage s is
    scheduled 2(S-1)-s phases after its forward, and the stage stores only
    its INPUTS in a ring of 2S-1 slots — the backward phase recomputes the
    stage forward under jax.vjp (rematerialization), so in-flight
    activation memory is O(S), independent of M.

    Exactness: grads equal the sequential computation (tests) — 1F1B
    reorders microbatch backwards but grad accumulation is a sum.

    stage_fn(p_stage, mb) -> mb' shape-preserving; loss_fn(pred, tgt) ->
    scalar (per microbatch; total = mean). x, y: [M, ...] replicated.
    Returns (loss, grads) with grads shaped like stacked_params ([S,...]
    sharded over `axis` — each device holds its own stage's grads).
    """
    s_n = mesh.shape[axis]
    m_n = x.shape[0]
    w_n = 2 * s_n - 1                     # ring depth ≥ max in-flight 2(S-1)+1
    n_ticks = m_n + 2 * (s_n - 1)

    def per_device(p_local, x_full, y_full):
        p_local = jax.tree.map(lambda a: a[0], p_local)
        stage = jax.lax.axis_index(axis)
        last = s_n - 1
        perm_f = [(i, (i + 1) % s_n) for i in range(s_n)]
        perm_b = [(i, (i - 1) % s_n) for i in range(s_n)]

        def step(carry, t):
            fwd_buf, bwd_buf, ring, grads, loss_sum = carry

            # ---- forward phase: stage s runs microbatch t - s ----
            mb_f = t - stage
            act_f = (mb_f >= 0) & (mb_f < m_n)
            inp = jnp.where(stage == 0, x_full[jnp.clip(mb_f, 0, m_n - 1)],
                            fwd_buf)
            ring = ring.at[t % w_n].set(jnp.where(act_f, inp, ring[t % w_n]))
            y_out = stage_fn(p_local, inp)
            fwd_buf = jax.lax.ppermute(y_out, axis, perm_f)

            # ---- backward phase: stage s runs microbatch t - 2(S-1) + s ----
            mb_b = t - 2 * (s_n - 1) + stage
            act_b = (mb_b >= 0) & (mb_b < m_n)
            mb_bc = jnp.clip(mb_b, 0, m_n - 1)
            # the stored input of that microbatch's forward (phase mb_b+s)
            inp_b = ring[(mb_bc + stage) % w_n]
            y_b, vjp_fn = jax.vjp(lambda p, i: stage_fn(p, i), p_local, inp_b)
            # last stage seeds from the loss; others from the ppermuted grad
            lval, loss_vjp = jax.vjp(
                lambda yy: loss_fn(yy, y_full[mb_bc]), y_b)
            one = jax.lax.pcast(jnp.float32(1.0), (axis,), to="varying")
            g_seed = jnp.where(stage == last, loss_vjp(one)[0], bwd_buf)
            g_p, g_x = vjp_fn(g_seed)
            grads = jax.tree.map(
                lambda acc, g: acc + jnp.where(act_b, g, 0.0), grads, g_p)
            loss_sum = loss_sum + jnp.where(act_b & (stage == last), lval, 0.0)
            bwd_buf = jax.lax.ppermute(jnp.where(act_b, g_x, 0.0), axis,
                                       perm_b)
            return (fwd_buf, bwd_buf, ring, grads, loss_sum), None

        mb_zero = jnp.zeros_like(x_full[0])
        # zeros derived from the replicated inputs must be marked
        # stage-varying for the scan carry; the grads init is derived from
        # p_local (spec P(axis)) and is varying already — pcast rejects a
        # varying->varying cast
        varying = jax.tree.map(
            lambda a: jax.lax.pcast(a, (axis,), to="varying"),
            (mb_zero, mb_zero,
             jnp.zeros((w_n,) + x_full.shape[1:], x_full.dtype),
             jnp.float32(0.0)))
        init = (varying[0], varying[1], varying[2],
                jax.tree.map(jnp.zeros_like, p_local), varying[3])
        (_, _, _, grads, loss_sum), _ = jax.lax.scan(
            step, init, jnp.arange(n_ticks))
        loss = jax.lax.psum(loss_sum, axis) / m_n
        grads = jax.tree.map(lambda g: (g / m_n)[None], grads)
        return loss, grads

    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(P(axis), P(), P()),
                   out_specs=(P(), P(axis)))
    return fn(stacked_params, x, y)


# ---------------------------------------------------------------------------
# LLM instantiation: layer stack sharded across stages (prefill forward)
# ---------------------------------------------------------------------------

def stack_llm_stage_params(params: dict, cfg, n_stages: int) -> dict:
    """Split blk.0..blk.{L-1} into n_stages contiguous ranges and stack each
    relative-block weight across stages: {"blk.{j}.{suffix}": [S, ...]}.
    Requires homogeneous blocks (dense attention; cfg.ssm None)."""
    assert cfg.ssm is None, "pipeline stages need homogeneous (attn) blocks"
    assert cfg.num_blocks % n_stages == 0, \
        f"{cfg.num_blocks} blocks not divisible into {n_stages} stages"
    per = cfg.num_blocks // n_stages
    stages = []
    for s in range(n_stages):
        d = {}
        for j in range(per):
            pre = f"blk.{s * per + j}."
            for k, v in params.items():
                if k.startswith(pre):
                    d[f"blk.{j}." + k[len(pre):]] = v
        stages.append(d)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stages)


def make_llm_stage_fn(cfg, n_stages: int, seq_len: int):
    """Stage function running cfg.num_blocks/n_stages dense-attention blocks
    on hidden states [mb, T, D] (prefill semantics: causal within the
    chunk, fresh cache per stage call — the cache pytree is internal)."""
    from ..models import llm

    per = cfg.num_blocks // n_stages
    sub = dataclasses.replace(cfg, num_blocks=per, max_context=seq_len)
    freqs = jnp.asarray(llm.precompute_freqs(cfg.rope_dim, seq_len,
                                             cfg.rope_theta))

    def stage_fn(p_stage, x):
        state = llm.init_state(sub, batch=x.shape[0])
        h, _ = llm.forward(p_stage, sub, state, None, 0, freqs,
                           hidden_override=x)
        return h

    return stage_fn


def pp_llm_prefill(mesh: Mesh, axis: str, params: dict, cfg,
                   tokens, n_micro: int):
    """Pipelined long-prompt prefill: tokens [B, T] with B % n_micro == 0.
    Embedding + final hidden states; the block stack is stage-sharded."""
    s_n = mesh.shape[axis]
    stacked = stack_llm_stage_params(params, cfg, s_n)
    stage_fn = make_llm_stage_fn(cfg, s_n, tokens.shape[-1])
    b, t = tokens.shape
    assert b % n_micro == 0
    from ..nn import functional as F
    x = F.embedding(params["token_embd.weight"], tokens).astype(jnp.float32)
    x = x.reshape(n_micro, b // n_micro, t, -1)
    h = pipeline_apply(mesh, axis, stage_fn, stacked, x)
    return h.reshape(b, t, -1)


def pp_llm_train_step(mesh: Mesh, axis: str, params: dict, cfg, tokens,
                      targets, n_micro: int, schedule: str = "1f1b"):
    """Pipelined LLM block-stack training step: next-token cross-entropy
    over [B, T] tokens with the layer stack stage-sharded.

    Trains the blk.* parameters (returned grads are stage-stacked, keyed
    like stack_llm_stage_params); the embedding table and output head are
    applied replicated and treated as frozen here — shard them with
    parallel/mesh dp/tp if they should train too. schedule: "1f1b"
    (memory-bounded backward, the default) or "gpipe" (autodiff).
    Returns (loss, grads).

    To jit, pass `params` (and tokens/targets) as ARGUMENTS of the jitted
    wrapper — e.g. jit(lambda p, x, y: pp_llm_train_step(mesh, ax, p, cfg,
    x, y, m)). The head weights the loss closes over are then tracers, not
    baked constants (CLAUDE.md "never close jitted fns over weight
    arrays"); tests/test_pipeline.py pins this usage.
    """
    s_n = mesh.shape[axis]
    stacked = stack_llm_stage_params(params, cfg, s_n)
    stage_fn = make_llm_stage_fn(cfg, s_n, tokens.shape[-1])
    b, t = tokens.shape
    assert b % n_micro == 0
    from ..nn import functional as F

    x = F.embedding(params["token_embd.weight"], tokens).astype(jnp.float32)
    x = x.reshape(n_micro, b // n_micro, t, -1)
    tgt = targets.reshape(n_micro, b // n_micro, t)
    w_norm = params["output_norm.weight"]
    w_out = params["output.weight"]
    eps = cfg.norm_eps

    def loss_fn(hidden, tgt_mb):
        h = F.rms_norm(hidden, w_norm, eps)
        logits = F.linear(h, w_out)
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.take_along_axis(logp, tgt_mb[..., None],
                                             -1)[..., 0])

    step = (pipeline_train_step_1f1b if schedule == "1f1b"
            else pipeline_train_step_gpipe)
    return step(mesh, axis, stage_fn, loss_fn, stacked, x, tgt)


def make_pp_mesh(n_devices: int | None = None) -> Mesh:
    """One-axis ("stage",) mesh over the available devices."""
    import numpy as np

    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("stage",))
