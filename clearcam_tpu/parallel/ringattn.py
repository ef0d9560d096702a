"""Ring attention: causal prefill attention with the sequence sharded
across chips.

SURVEY.md §5 notes the reference's long-context story is purely algorithmic
(chunked prefill, SSM/MLA blocks, 2000-token caps) and names cross-chip
sequence scaling as the TPU-native extension point. This implements it: each
chip holds T/n query/key/value tokens; K/V blocks rotate around the ring with
`ppermute` (one hop per step, riding ICI neighbor links) while a streaming
(flash-style) softmax accumulates partial attention — so attention memory per
chip is O(T/n) and the full [T, T] score matrix never materializes anywhere.

Use `ring_prefill(mesh, axis)` for a jitted shard_map-wrapped entry point, or
`ring_attention_shard` directly inside an existing shard_map region.

Exact (not approximate): matches single-device causal attention to float
tolerance — tested on the 8-virtual-device CPU mesh in
tests/test_ringattn.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ring_attention_shard(q, k, v, axis_name: str, causal: bool = True,
                         scale: float | None = None):
    """Per-shard body (call inside shard_map).

    q, k, v: [B, Tl, H, D] — this chip's sequence slice (Tl = T / n_shards;
    global token t of shard s sits at position s*Tl + t).
    -> [B, Tl, H, D] attention output for the local queries.
    """
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    b, tl, h, d = q.shape
    if k.shape[2] != h:                      # GQA: repeat kv heads
        rep = h // k.shape[2]
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    qf = q.astype(jnp.float32) * scale
    q_pos = my * tl + jnp.arange(tl)

    perm = [(j, (j + 1) % n) for j in range(n)]

    def step(i, carry):
        acc, m, l, kb, vb = carry
        src = (my - i) % n                       # owner of the held K/V block
        k_pos = src * tl + jnp.arange(tl)
        # scores [B, H, Tq, Tk]
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, kb.astype(jnp.float32))
        if causal:
            mask = k_pos[None, :] <= q_pos[:, None]          # [Tq, Tk]
            s = jnp.where(mask[None, None], s, -jnp.inf)
        m_new = jnp.maximum(m, s.max(-1, keepdims=True))
        # fully-masked rows keep m=-inf; exp(-inf - -inf) guards below
        m_safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
        p = jnp.exp(jnp.where(jnp.isneginf(s), -jnp.inf, s) - m_safe)
        alpha = jnp.exp(jnp.where(jnp.isneginf(m), -jnp.inf, m) - m_safe)
        l_new = l * alpha + p.sum(-1, keepdims=True)
        pv = jnp.einsum("bhqk,bkhd->bqhd", p, vb.astype(jnp.float32))
        acc_new = acc * alpha.transpose(0, 2, 1, 3) + pv
        # rotate K/V one hop around the ring (last rotation is redundant but
        # keeps the loop body uniform for the compiler)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return acc_new, m_new, l_new, kb, vb

    # pvary: fresh accumulators are "invariant" in shard_map's manual-axes
    # typing until they interact with per-shard data; mark them varying so
    # the fori_loop carry types line up
    init = (jax.lax.pvary(jnp.zeros((b, tl, h, d), jnp.float32), (axis_name,)),
            jax.lax.pvary(jnp.full((b, h, tl, 1), -jnp.inf, jnp.float32),
                          (axis_name,)),
            jax.lax.pvary(jnp.zeros((b, h, tl, 1), jnp.float32), (axis_name,)),
            k, v)
    acc, m, l, _, _ = jax.lax.fori_loop(0, n, step, init)
    out = acc / jnp.maximum(l.transpose(0, 2, 1, 3), 1e-20)
    return out.astype(q.dtype)


def ring_prefill(mesh: Mesh, axis: str = "data", causal: bool = True):
    """-> jitted fn(q, k, v) with the SEQUENCE dim sharded over `axis`:
    inputs/outputs [B, T, H, D] as global arrays, attention computed with
    O(T/n) memory per chip and ppermute ring communication."""
    from jax import shard_map

    spec = P(None, axis, None, None)
    body = functools.partial(ring_attention_shard, axis_name=axis,
                             causal=causal)
    fn = shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec)
    sharding = NamedSharding(mesh, spec)

    @jax.jit
    def run(q, k, v):
        q, k, v = (jax.lax.with_sharding_constraint(t, sharding)
                   for t in (q, k, v))
        return fn(q, k, v)

    return run
