"""Sequence-parallel LLM prefill: the whole transformer forward with the
PROMPT sharded across chips.

Builds on parallel/ringattn.py: each chip embeds and runs MLP/norms on its
T/n token slice (weights replicated — pure data-parallel over sequence), and
attention runs as a ppermute ring, so a prompt n times longer than one chip's
attention memory fits. RoPE uses global positions (shard s starts at s*T/n).

Scope: standard GQA attention stacks (cfg.block_kind == "attn" everywhere;
recurrent SSM blocks are inherently sequential over T and MLA's latent cache
is a different layout). Covers the Qwen3-dense family this framework serves.

Returns the final hidden states (sequence-sharded) plus every layer's K/V so
a caller can materialize a decode cache (all_gather over the axis) and
continue with the standard single-chip decode step.

Parity: equals models/llm.forward(start_pos=0) to float tolerance on the
8-virtual-device mesh — tests/test_long_prefill.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import llm
from ..nn import functional as F
from .ringattn import ring_attention_shard


def _attn_block_shard(p, pre, bc, x, pos0, freqs, axis):
    """GQA attention for one shard's tokens; global positions via pos0."""
    b, t, _ = x.shape
    hd, nh, nkv = bc.head_dim, bc.n_heads, bc.n_kv_heads
    q = F.linear(x, p[f"{pre}.attn_q.weight"], p.get(f"{pre}.attn_q.bias"))
    k = F.linear(x, p[f"{pre}.attn_k.weight"], p.get(f"{pre}.attn_k.bias"))
    v = F.linear(x, p[f"{pre}.attn_v.weight"], p.get(f"{pre}.attn_v.bias"))
    if bc.qk_norm and bc.qk_norm != hd:
        q = F.rms_norm(q, p[f"{pre}.attn_q_norm.weight"], bc.norm_eps)
        k = F.rms_norm(k, p[f"{pre}.attn_k_norm.weight"], bc.norm_eps)
    q = q.reshape(b, t, nh, hd)
    k = k.reshape(b, t, nkv, hd)
    v = v.reshape(b, t, nkv, hd)
    if bc.qk_norm == hd:
        q = F.rms_norm(q, p[f"{pre}.attn_q_norm.weight"], bc.norm_eps)
        k = F.rms_norm(k, p[f"{pre}.attn_k_norm.weight"], bc.norm_eps)
    fr = jax.lax.dynamic_slice_in_dim(freqs, pos0, t, 0)
    # apply_rope expects [B, H, T, D]
    def rope(z):
        zt = z.transpose(0, 2, 1, 3)
        zt = jnp.concatenate([llm.apply_rope(zt[..., :bc.rope_dim], fr),
                              zt[..., bc.rope_dim:]], -1)
        return zt.transpose(0, 2, 1, 3)
    q, k = rope(q), rope(k)
    out = ring_attention_shard(q.astype(jnp.float32), k.astype(jnp.float32),
                               v.astype(jnp.float32), axis)
    out = out.reshape(b, t, nh * hd).astype(x.dtype)
    return F.linear(out, p[f"{pre}.attn_output.weight"]), k, v


def _forward_shard(p, tokens, cfg, freqs, axis):
    """shard_map body: tokens [B, Tl] -> (hidden [B, Tl, D], kv per layer)."""
    tl = tokens.shape[1]
    pos0 = jax.lax.axis_index(axis) * tl
    x = F.embedding(p["token_embd.weight"], tokens).astype(jnp.float32)
    kvs = []
    for i in range(cfg.num_blocks):
        bc = cfg.block_cfg(i)
        pre = f"blk.{i}"
        h = F.rms_norm(x, p[f"{pre}.attn_norm.weight"], cfg.norm_eps)
        attn_out, k, v = _attn_block_shard(p, pre, bc, h, pos0, freqs, axis)
        x = x + attn_out
        x = x + llm._ffn(p, pre, bc, F.rms_norm(
            x, p[f"{pre}.ffn_norm.weight"], cfg.norm_eps))
        kvs.append((k, v))
    return x, kvs


def make_sharded_prefill(mesh: Mesh, cfg, axis: str = "data"):
    """-> jitted fn(params, tokens[B, T]) -> (hidden [B, T, D], kv list).

    T must divide by the mesh axis size. cfg must be attention-only."""
    from jax import shard_map

    assert all(cfg.block_kind(i) == "attn" for i in range(cfg.num_blocks)), \
        "sequence-parallel prefill supports standard attention stacks only"
    freqs = jnp.asarray(llm.precompute_freqs(cfg.rope_dim, cfg.max_context,
                                             cfg.rope_theta))
    tok_spec = P(None, axis)
    seq_spec = P(None, axis, None, None)
    fn = shard_map(
        lambda p, t: _forward_shard(p, t, cfg, freqs, axis),
        mesh=mesh,
        in_specs=(P(), tok_spec),
        out_specs=(P(None, axis, None), [(seq_spec, seq_spec)] * cfg.num_blocks))

    @jax.jit
    def run(params, tokens):
        tokens = jax.lax.with_sharding_constraint(
            tokens, NamedSharding(mesh, tok_spec))
        return fn(params, tokens)

    return run


def materialize_state(cfg, kvs, batch: int = 1, dtype=jnp.float32) -> list:
    """Sharded prefill K/V -> the standard decode cache pytree
    (llm.init_state layout, [B, KvH, max_context, D]): gather each layer's
    sequence-sharded K/V (jnp.asarray pulls the global array) and write it at
    positions [0, T). The usual single-chip decode loop continues from
    start_pos=T."""
    state = llm.init_state(cfg, batch, dtype)
    for i, (k, v) in enumerate(kvs):
        t = k.shape[1]
        state[i]["k"] = state[i]["k"].at[:, :, :t].set(
            jnp.asarray(k).astype(dtype).transpose(0, 2, 1, 3))
        state[i]["v"] = state[i]["v"].at[:, :, :t].set(
            jnp.asarray(v).astype(dtype).transpose(0, 2, 1, 3))
    return state
