"""GGUF-loading LLM runtime (dense / MoE / MLA / GatedDeltaNet-SSM blocks).

Capability mirror of the reference decoder (utils/model.py): GQA attention
with optional qk-norm and output gating, RoPE (half-split layout, with the
interleaved->half-split repack for llama/MLA checkpoints at load), MoE FFN
with optional shared expert + expert bias, DeepSeek-style MLA latent-KV
attention, Qwen3.5 GatedDeltaNet linear-attention blocks, Gumbel-max
sampling, chunked prefill, and token-prefix cache reuse.

TPU-native re-design: the KV/SSM caches are an explicit state pytree threaded
through pure jitted step functions (the reference mutates tinygrad buffers
via UOp.store). Two compiled programs exist per model — a fixed-CHUNK prefill
(ragged tail handled by masking + an explicit real-length scalar, replacing
the reference's UOp.variable binding, model.py:397-417) and a T=1 decode step.
All caches are static-shape [B, ..., max_context, ...]; attention masks are
built from iota comparisons (no data-dependent shapes).
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from pathlib import Path

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import functional as F

# Prefill chunk width. A prefill dispatch reads every weight once to advance
# one chunk, so at short chunks admission is weight-read-bound and wider
# chunks raise prefill tok/s nearly linearly (PERF.md "Prefill chunk width");
# the costs are coarser decode interleaving (one chunk's latency between
# decode steps while admitting, runtime/nvr co-tenancy) and coarser
# CHUNK-aligned prefix reuse. Graphs are shape-keyed on it: changing the
# value recompiles (persistent-cached per value).
CHUNK = int(os.environ.get("CLEARCAM_CHUNK", "32"))


@dataclass(frozen=True)
class SSMConfig:
    conv_kernel: int
    state_size: int
    group_count: int
    time_step_rank: int
    inner_size: int


@dataclass(frozen=True)
class TransformerConfig:
    num_blocks: int
    dim: int
    hidden_dim: int
    n_heads: int
    n_kv_heads: int
    norm_eps: float
    vocab_size: int
    head_dim: int
    rope_theta: float
    rope_dim: int
    v_head_dim: int
    max_context: int = 2048
    qk_norm: int = 0
    num_experts: int = 0
    num_experts_per_tok: int = 0
    norm_topk_prob: bool = False
    q_lora_rank: int = 0
    kv_lora_rank: int = 0
    shared_expert_dim: int = 0
    full_attention_interval: int = 0
    attn_output_gate: bool = False
    ssm: SSMConfig | None = None
    shared_expert_gate: bool = True
    leading_dense_blocks: int = 0
    dense_hidden_dim: int = 0
    routed_scaling_factor: float = 1.0
    qkv_bias: bool = False
    expert_bias: bool = False

    def block_kind(self, i: int) -> str:
        if self.ssm and (i + 1) % max(self.full_attention_interval, 1) != 0:
            return "ssm"
        if self.kv_lora_rank > 0:
            return "mla"
        return "attn"

    def block_cfg(self, i: int) -> "TransformerConfig":
        if i < self.leading_dense_blocks:
            return replace(self, num_experts=0, num_experts_per_tok=0,
                           shared_expert_dim=0,
                           hidden_dim=self.dense_hidden_dim or self.hidden_dim)
        return self


def precompute_freqs(dim: int, end: int, theta: float) -> np.ndarray:
    """[end, dim] = concat(cos, sin) of position*inv_freq (model.py:8-12)."""
    inv = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    ang = np.arange(end)[:, None] * inv[None, :]
    return np.concatenate([np.cos(ang), np.sin(ang)], -1).astype(np.float32)


def apply_rope(x, freqs):
    """Half-split RoPE on [B,H,T,D]; freqs [T, D] (cos||sin) shared across
    rows, or [B, T, D] per-row (continuous-batching decode, where every
    slot sits at its own position)."""
    d = x.shape[-1] // 2
    if freqs.ndim == 3:
        cos = freqs[:, None, :, :d]
        sin = freqs[:, None, :, d:]
    else:
        cos = freqs[None, None, :, :d]
        sin = freqs[None, None, :, d:]
    x1, x2 = x[..., :d], x[..., d:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _ffn(p, pre, cfg: TransformerConfig, x):
    """Dense or MoE feed-forward (model.py:100-121)."""
    if cfg.num_experts > 0 and f"{pre}.ffn_gate_exps.weight" in p:
        logits = F.linear(x, p[f"{pre}.ffn_gate_inp.weight"])
        if cfg.expert_bias:
            probs = jax.nn.sigmoid(logits)
            _, sel = jax.lax.top_k(probs + p[f"{pre}.exp_probs_b.bias"],
                                   cfg.num_experts_per_tok)
            probs = jnp.take_along_axis(probs, sel, -1)
            if cfg.norm_topk_prob:
                probs = probs / probs.sum(-1, keepdims=True)
        else:
            vals, sel = jax.lax.top_k(logits, cfg.num_experts_per_tok)
            probs = jax.nn.softmax(vals, -1) if cfg.norm_topk_prob else \
                jnp.take_along_axis(jax.nn.softmax(logits, -1), sel, -1)
        probs = probs * cfg.routed_scaling_factor
        wg = p[f"{pre}.ffn_gate_exps.weight"][sel]      # [B,T,k,hid,dim]
        wu = p[f"{pre}.ffn_up_exps.weight"][sel]
        wd = p[f"{pre}.ffn_down_exps.weight"][sel]
        h = x[..., None, :]                              # [B,T,1,dim]
        gate = jnp.einsum("btd,btkhd->btkh", x, wg)
        up = jnp.einsum("btd,btkhd->btkh", x, wu)
        down = jnp.einsum("btkh,btkdh->btkd", F.silu(gate) * up, wd)
        out = (down * probs[..., None]).sum(axis=2)
        if f"{pre}.ffn_gate_shexp.weight" in p:
            sh = F.linear(F.silu(F.linear(x, p[f"{pre}.ffn_gate_shexp.weight"]))
                          * F.linear(x, p[f"{pre}.ffn_up_shexp.weight"]),
                          p[f"{pre}.ffn_down_shexp.weight"])
            if f"{pre}.ffn_gate_inp_shexp.weight" in p:
                g = jax.nn.sigmoid((x * p[f"{pre}.ffn_gate_inp_shexp.weight"])
                                   .sum(-1, keepdims=True))
                sh = sh * g
            out = out + sh
        return out
    gate = F.linear(x, p[f"{pre}.ffn_gate.weight"])
    up = F.linear(x, p[f"{pre}.ffn_up.weight"])
    return F.linear(F.silu(gate) * up, p[f"{pre}.ffn_down.weight"])


def _attn_mask(start_pos, t, ctx, pad_start=None):
    """Causal lower-right mask [1|B, 1, T, ctx]: token row r (at absolute
    position start_pos+r) sees cache columns <= start_pos+r. pad_start [B]
    additionally hides columns < pad_start[b] — the left-pad junk of
    right-aligned batched prompts (RoPE scores depend only on relative
    position, so a per-row left shift is semantically free)."""
    rows = jnp.arange(t)[:, None]
    cols = jnp.arange(ctx)[None, :]
    if _pos_is_vector(start_pos):
        # per-row positions (continuous batching): [B, T, ctx] directly
        reach = start_pos[:, None, None] + rows
        m = jnp.where(cols <= reach, 0.0, -jnp.inf)[:, None]
        if pad_start is not None:
            hide = (cols[None] < pad_start[:, None, None]) & (cols != reach)
            m = m + jnp.where(hide, -jnp.inf, 0.0)[:, None]
        return m
    m = jnp.where(cols <= start_pos + rows, 0.0, -jnp.inf)[None, None]
    if pad_start is not None:
        # hide pad columns — EXCEPT from the pad positions' own queries
        # (a fully-masked row softmaxes to NaN, and that NaN would poison
        # the K/V written at pad positions and then every later score);
        # pad queries attend only themselves: finite garbage no real row
        # ever reads
        hide = (cols[None] < pad_start[:, None, None]) \
            & (cols != start_pos + rows)[None]
        m = m + jnp.where(hide, -jnp.inf, 0.0)[:, None]
    return m


def _kv_quantize(x):
    """[B,KvH,T,D] -> (int8 values, f32 scales [B,KvH,T]): symmetric
    per-token-per-head absmax quantization of new cache entries."""
    s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), -1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, s


def _pos_is_vector(start_pos) -> bool:
    """True when start_pos is a per-row [B] position vector (continuous-
    batching decode: every slot at its own absolute position, T == 1)."""
    return getattr(start_pos, "ndim", 0) == 1


def _cache_update(cache, new, start_pos, write_mask=None):
    """Write new [B, H, T, D] values (or [B, H, T] scales) into the cache
    at start_pos — a shared scalar position, or a per-row [B] vector
    (continuous batching; vmapped dynamic_update_slice lowers to one
    scatter; T may be a whole prefill chunk). write_mask [B] bool keeps
    masked rows' cache bytes bit-identical (batched multi-slot prefill:
    non-participating rows must not scribble — a clamped CHUNK-wide junk
    write could land BELOW a live row's cursor and corrupt attendable
    history, unlike decode's 1-wide park writes)."""
    if not _pos_is_vector(start_pos):
        assert write_mask is None
        idx = (0, 0, start_pos) + (0,) * (cache.ndim - 3)
        return jax.lax.dynamic_update_slice(cache, new.astype(cache.dtype), idx)

    if write_mask is None:
        def one(c, n, p):
            idx = (0, p) + (0,) * (c.ndim - 2)
            return jax.lax.dynamic_update_slice(c, n.astype(c.dtype), idx)
        return jax.vmap(one)(cache, new, start_pos)

    def one_masked(c, n, p, w):
        # read-modify-write of the T-wide window (tens of KB — noise next
        # to the weight reads): masked rows write back exactly what was
        # there, so the scatter is position-safe for every row
        idx = (0, p) + (0,) * (c.ndim - 2)
        old = jax.lax.dynamic_slice(c, idx, n.shape)
        return jax.lax.dynamic_update_slice(
            c, jnp.where(w, n.astype(c.dtype), old), idx)
    return jax.vmap(one_masked)(cache, new, start_pos, write_mask)


def _attention_block(p, pre, cfg: TransformerConfig, x, state, start_pos, freqs,
                     decode_attn=None, pad_start=None, write_mask=None):
    """Standard GQA attention with cache (model.py:153-190). decode_attn
    optionally replaces the T=1 attention math (Pallas prefix kernel).
    When the state carries per-token scales ("k_s"/"v_s"), the cache is
    int8-quantized on write (half the decode HBM traffic / double the
    context per byte vs bf16) and dequantized on read."""
    b, t, _ = x.shape
    hd, nh, nkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    q = F.linear(x, p[f"{pre}.attn_q.weight"], p.get(f"{pre}.attn_q.bias"))
    k = F.linear(x, p[f"{pre}.attn_k.weight"], p.get(f"{pre}.attn_k.bias"))
    v = F.linear(x, p[f"{pre}.attn_v.weight"], p.get(f"{pre}.attn_v.bias"))
    if cfg.qk_norm and cfg.qk_norm != hd:
        q = F.rms_norm(q, p[f"{pre}.attn_q_norm.weight"], cfg.norm_eps)
        k = F.rms_norm(k, p[f"{pre}.attn_k_norm.weight"], cfg.norm_eps)
    gate = None
    if cfg.attn_output_gate:
        qg = q.reshape(b, t, nh, 2, hd)
        q, gate = qg[:, :, :, 0], qg[:, :, :, 1].reshape(b, t, nh * hd)
        q = q.reshape(b, t, nh * hd)
    q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    if cfg.qk_norm == hd:
        q = F.rms_norm(q, p[f"{pre}.attn_q_norm.weight"], cfg.norm_eps)
        k = F.rms_norm(k, p[f"{pre}.attn_k_norm.weight"], cfg.norm_eps)
    # per-row positions: gather [B,T,D] rope rows at start_pos[b]+0..t-1
    # (T=1 decode and T=CHUNK batched prefill ride the same expression;
    # junk rows parked near the table end clamp harmlessly)
    fr = freqs[start_pos[:, None] + jnp.arange(t)] \
        if _pos_is_vector(start_pos) \
        else jax.lax.dynamic_slice_in_dim(freqs, start_pos, t, 0)
    q = jnp.concatenate([apply_rope(q[..., :cfg.rope_dim], fr),
                         q[..., cfg.rope_dim:]], -1)
    k = jnp.concatenate([apply_rope(k[..., :cfg.rope_dim], fr),
                         k[..., cfg.rope_dim:]], -1)

    if "k_s" in state:
        kq, ks = _kv_quantize(k)
        vq, vs = _kv_quantize(v)
        ck = _cache_update(state["k"], kq, start_pos, write_mask)
        cv = _cache_update(state["v"], vq, start_pos, write_mask)
        cks = _cache_update(state["k_s"], ks, start_pos, write_mask)
        cvs = _cache_update(state["v_s"], vs, start_pos, write_mask)
        new_state = {"k": ck, "k_s": cks, "v": cv, "v_s": cvs}
        # XLA-path dequant: fused by XLA into the attention einsums' operand
        # reads (measured ≈ −3% vs bf16 KV at 2B/ctx2048 — a materialized
        # bf16 copy would instead be slower than kv16; see PERF.md)
        ck_a = (ck * cks[..., None]).astype(jnp.bfloat16)
        cv_a = (cv * cvs[..., None]).astype(jnp.bfloat16)
    else:
        ck = _cache_update(state["k"], k, start_pos, write_mask)
        cv = _cache_update(state["v"], v, start_pos, write_mask)
        new_state = {"k": ck, "v": cv}
        ck_a, cv_a = ck, cv
    if decode_attn is not None and t == 1:
        out = decode_attn(q, new_state, start_pos, pad_start)
    else:
        # grouped-query einsum: no jnp.repeat (which materializes a rep-x
        # cache copy in HBM — at ctx 2048 that WAS the decode bottleneck)
        # and no f32 upcast of the cache (reads ride the cache dtype; the
        # MXU still accumulates f32 via preferred_element_type)
        rep = nh // nkv
        scale = cfg.head_dim ** -0.5
        qg = (q.astype(jnp.float32) * scale).reshape(b, nkv, rep, t, hd) \
            .astype(ck_a.dtype)
        scores = jnp.einsum("bgrtd,bgsd->bgrts", qg, ck_a,
                            preferred_element_type=jnp.float32)
        mask = _attn_mask(start_pos, t, cfg.max_context, pad_start)  # [*,1,T,S]
        probs = jax.nn.softmax(scores + mask[:, :, None], -1)
        out = jnp.einsum("bgrts,bgsd->bgrtd", probs.astype(cv_a.dtype), cv_a,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, nh, t, hd)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd).astype(x.dtype)
    if gate is not None:
        out = out * jax.nn.sigmoid(gate)
    return F.linear(out, p[f"{pre}.attn_output.weight"]), new_state


def _mla_block(p, pre, cfg: TransformerConfig, x, state, start_pos, freqs,
               pad_start=None, write_mask=None):
    """DeepSeek MLA latent-KV attention (model.py:192-238)."""
    b, t, _ = x.shape
    nope = cfg.head_dim - cfg.rope_dim
    if cfg.q_lora_rank > 0:
        qa = F.rms_norm(F.linear(x, p[f"{pre}.attn_q_a.weight"]),
                        p[f"{pre}.attn_q_a_norm.weight"], cfg.norm_eps)
        qp = F.linear(qa, p[f"{pre}.attn_q_b.weight"])
    else:
        qp = F.linear(x, p[f"{pre}.attn_q.weight"])
    q = qp.reshape(b, t, cfg.n_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    # per-row positions: gather [B,T,D] rope rows at start_pos[b]+0..t-1
    # (T=1 decode and T=CHUNK batched prefill ride the same expression;
    # junk rows parked near the table end clamp harmlessly)
    fr = freqs[start_pos[:, None] + jnp.arange(t)] \
        if _pos_is_vector(start_pos) \
        else jax.lax.dynamic_slice_in_dim(freqs, start_pos, t, 0)
    q_nope, q_rope = q[..., :nope], q[..., nope:]
    # project q into the latent space: [H, lora, nope]
    q_lat = jnp.einsum("bhtn,hln->bhtl", q_nope, p[f"{pre}.attn_k_b.weight"])
    q = jnp.concatenate([q_lat, apply_rope(q_rope, fr)], -1)

    kv_a = F.linear(x, p[f"{pre}.attn_kv_a_mqa.weight"])
    c_kv = F.rms_norm(kv_a[..., :cfg.kv_lora_rank],
                      p[f"{pre}.attn_kv_a_norm.weight"], cfg.norm_eps)
    k_rope = apply_rope(kv_a[..., cfg.kv_lora_rank:]
                        .reshape(b, t, 1, cfg.rope_dim).transpose(0, 2, 1, 3), fr)
    k_new = jnp.concatenate([c_kv[:, None], k_rope], -1)       # [B,1,T,lora+rope]
    if "kv_s" in state:
        # int8 latent cache: same per-token absmax scheme as the standard
        # blocks (the latent row is the K AND V, so one scale covers both)
        kq, ks = _kv_quantize(k_new)
        ck = _cache_update(state["kv"], kq, start_pos, write_mask)
        cks = _cache_update(state["kv_s"], ks, start_pos, write_mask)
        new_state = {"kv": ck, "kv_s": cks}
        k = ck.astype(jnp.float32) * cks[..., None]
    else:
        ck = _cache_update(state["kv"], k_new, start_pos, write_mask)
        new_state = {"kv": ck}
        k = ck.astype(jnp.float32)
    v = k[..., :cfg.kv_lora_rank]
    mask = _attn_mask(start_pos, t, cfg.max_context, pad_start)
    scores = jnp.einsum("bhtd,bqsd->bhts", q.astype(jnp.float32), k) \
        * (cfg.head_dim ** -0.5) + mask
    probs = jax.nn.softmax(scores, -1)
    ctx_lat = jnp.einsum("bhts,bqsl->bhtl", probs, v)
    out = jnp.einsum("bhtl,hvl->bhtv", ctx_lat, p[f"{pre}.attn_v_b.weight"])
    out = out.transpose(0, 2, 1, 3).reshape(b, t, -1).astype(x.dtype)
    return F.linear(out, p[f"{pre}.attn_output.weight"]), new_state


def _ssm_block(p, pre, cfg: TransformerConfig, x, state, start_pos, freqs,
               live=None):
    """GatedDeltaNet linear-attention step, T=1 (model.py:240-295).

    live [B] bool: rows whose state must NOT advance this step — the
    left-pad region of right-aligned batched generation (generate_batch).
    Unlike attention (where pad junk lands in never-attended cache slots),
    a recurrence would ingest the junk forever, so dead rows keep their
    previous conv window and recurrent state bit-exactly."""
    ssm = cfg.ssm
    b, t, _ = x.shape
    nk, nv = ssm.group_count, ssm.time_step_rank
    dk, dv = ssm.state_size, ssm.inner_size // nv
    conv_ch = ssm.inner_size + 2 * nk * dk
    q_dim = nk * dk

    out_gate = F.linear(x, p[f"{pre}.attn_gate.weight"]).reshape(b, 1, nv, dv)
    beta = jax.nn.sigmoid(F.linear(x, p[f"{pre}.ssm_beta.weight"])) \
        .reshape(b, nv, 1, 1)
    alpha_in = F.linear(x, p[f"{pre}.ssm_alpha.weight"]).astype(jnp.float32)
    alpha = jnp.exp((jax.nn.softplus(alpha_in + p[f"{pre}.ssm_dt.bias"])
                     * p[f"{pre}.ssm_a"]).reshape(b, nv, 1, 1))

    qkv = F.linear(x, p[f"{pre}.attn_qkv.weight"])               # [B,1,conv_ch]
    window = jnp.concatenate([state["conv"], qkv[:, 0][:, None]], 1) \
        if False else jnp.concatenate([state["conv"], qkv.reshape(b, 1, conv_ch)], 1)
    conv_out = F.silu((window * p[f"{pre}.ssm_conv1d.weight"].T[None]).sum(1))
    q, k, v = (conv_out[:, :q_dim], conv_out[:, q_dim:2 * q_dim],
               conv_out[:, 2 * q_dim:])

    def _norm(u):
        return u / jnp.sqrt((u ** 2).sum(-1, keepdims=True) + 1e-6)

    q = jnp.tile(_norm(q.reshape(b, nk, dk)), (1, nv // nk, 1)) * dk ** -0.5
    k = jnp.tile(_norm(k.reshape(b, nk, dk)), (1, nv // nk, 1))
    v = v.reshape(b, nv, dv)
    q, k, v = q[..., None], k[..., None], v[..., None]

    rec = state["rec"].astype(jnp.float32) * alpha
    rec = rec + ((v - rec @ k) * beta) @ k.transpose(0, 1, 3, 2)
    core = (rec @ q)[..., 0].reshape(b, 1, nv, dv)
    core = F.rms_norm(core, p[f"{pre}.ssm_norm.weight"], cfg.norm_eps)
    out = F.linear((core * F.silu(out_gate)).reshape(b, 1, -1).astype(x.dtype),
                   p[f"{pre}.ssm_out.weight"])
    new_state = {"conv": window[:, 1:].astype(state["conv"].dtype),
                 "rec": rec.astype(state["rec"].dtype)}
    if live is not None:
        new_state = {
            "conv": jnp.where(live[:, None, None], new_state["conv"],
                              state["conv"]),
            "rec": jnp.where(live[:, None, None, None], new_state["rec"],
                             state["rec"])}
    return out, new_state


# ---------------------------------------------------------------------------
# full model step
# ---------------------------------------------------------------------------

def init_state(cfg: TransformerConfig, batch: int = 1, dtype=jnp.float32,
               kv_quant: bool = False) -> list:
    """kv_quant: int8 KV cache with per-token-per-head f32 scales — half the
    decode HBM traffic and cache memory of bf16 (quarter of f32)."""
    state = []
    for i in range(cfg.num_blocks):
        kind = cfg.block_kind(i)
        if kind == "attn":
            shape = (batch, cfg.n_kv_heads, cfg.max_context, cfg.head_dim)
            if kv_quant:
                state.append({"k": jnp.zeros(shape, jnp.int8),
                              "k_s": jnp.zeros(shape[:3], jnp.float32),
                              "v": jnp.zeros(shape, jnp.int8),
                              "v_s": jnp.zeros(shape[:3], jnp.float32)})
                continue
            state.append({"k": jnp.zeros(shape, dtype),
                          "v": jnp.zeros(shape, dtype)})
        elif kind == "mla":
            shape = (batch, 1, cfg.max_context,
                     cfg.kv_lora_rank + cfg.rope_dim)
            if kv_quant:
                state.append({"kv": jnp.zeros(shape, jnp.int8),
                              "kv_s": jnp.zeros(shape[:3], jnp.float32)})
                continue
            state.append({"kv": jnp.zeros(shape, dtype)})
        else:
            ssm = cfg.ssm
            conv_ch = ssm.inner_size + 2 * ssm.group_count * ssm.state_size
            dv = ssm.inner_size // ssm.time_step_rank
            state.append({
                "conv": jnp.zeros((batch, ssm.conv_kernel - 1, conv_ch), dtype),
                "rec": jnp.zeros((batch, ssm.time_step_rank, dv, dv), dtype)})
    return state


def reset_recurrent(cfg: TransformerConfig, state: list) -> list:
    """Zero SSM states after a prefix-cache divergence (model.py:287-290)."""
    out = []
    for i, s in enumerate(state):
        if cfg.block_kind(i) == "ssm":
            out.append(jax.tree.map(jnp.zeros_like, s))
        else:
            out.append(s)
    return out


def forward(p: dict, cfg: TransformerConfig, state: list, tokens,
            start_pos, freqs, hidden_override=None, deepstack=None,
            decode_attn=None, pad_start=None, row_live=None,
            write_mask=None):
    """Core stack: embeds -> blocks -> final hidden states [B,T,D].

    hidden_override replaces the token embeddings (VLM image splice);
    deepstack is an optional {block_idx: [B,T,D] residual} add-in
    (qwen3vl.py:293-297); pad_start [B] masks each row's left-pad cache
    region (right-aligned batched generation). SSM blocks additionally
    need row_live [B] (T=1 steps only) so the recurrence skips pad rows —
    see _ssm_block. write_mask [B] keeps masked rows' caches bit-identical
    (batched multi-slot prefill; attention/MLA stacks only).
    """
    if hidden_override is not None:
        x = hidden_override
    else:
        x = F.embedding(p["token_embd.weight"], tokens).astype(jnp.float32)
    new_state = []
    for i in range(cfg.num_blocks):
        bc = cfg.block_cfg(i)
        pre = f"blk.{i}"
        kind = cfg.block_kind(i)
        h = F.rms_norm(x, p[f"{pre}.attn_norm.weight"], cfg.norm_eps)
        if kind == "attn":
            attn_out, st = _attention_block(p, pre, bc, h, state[i], start_pos,
                                            freqs, decode_attn=decode_attn,
                                            pad_start=pad_start,
                                            write_mask=write_mask)
        elif kind == "mla":
            attn_out, st = _mla_block(p, pre, bc, h, state[i], start_pos,
                                      freqs, pad_start=pad_start,
                                      write_mask=write_mask)
        else:  # kind == "ssm" (block_kind returns attn|mla|ssm only)
            assert write_mask is None or row_live is not None, \
                "a write-masked chunk forward cannot gate an SSM " \
                "recurrence — batched SSM prefill must scan T=1 steps " \
                "with row_live carrying the per-token mask (the serving " \
                "prefill_many SSM variant)"
            assert pad_start is None or row_live is not None, \
                "batched left-pad generation over SSM blocks needs row_live " \
                "(the recurrence would ingest the pad junk)"
            attn_out, st = _ssm_block(p, pre, bc, h, state[i], start_pos,
                                      freqs, live=row_live)
        x = x + attn_out
        x = x + _ffn(p, pre, bc, F.rms_norm(x, p[f"{pre}.ffn_norm.weight"],
                                            cfg.norm_eps))
        new_state.append(st)
        if deepstack is not None and i in deepstack:
            x = x + deepstack[i]
    return x, new_state


def logits_at(p: dict, cfg: TransformerConfig, hidden, index):
    h = jnp.take(hidden, index, axis=1)                  # [B, D] (traced index ok)
    h = F.rms_norm(h, p["output_norm.weight"], cfg.norm_eps)
    return F.linear(h, p["output.weight"])


def score_logits(params, cfg: TransformerConfig, tokens) -> jnp.ndarray:
    """Next-token logits ([V] f32) after teacher-forcing ``tokens`` in one
    full-sequence forward — the raw distribution serving logprobs report
    over (sample_filtered_lp, before any penalties/bias). Eval /
    verification helper (perplexity scoring, logprob cross-checks), not a
    serving path: unchunked, recompiles per length."""
    tokens = list(tokens)
    assert 0 < len(tokens) <= cfg.max_context
    state = init_state(cfg, batch=1)
    freqs = jnp.asarray(precompute_freqs(cfg.rope_dim, cfg.max_context,
                                         cfg.rope_theta))
    hidden, _ = forward(params, cfg, state,
                        jnp.asarray([tokens], jnp.int32), 0, freqs)
    return logits_at(params, cfg, hidden, len(tokens) - 1)[0]


def make_score_fn(cfg: TransformerConfig):
    """Chunked teacher-forcing scorer: ONE compiled graph (any prompt
    length <= max_context) computing, per position, the model's logprob
    of the actual next token plus the top-LP_K alternatives — the OpenAI
    completions ``echo`` / ``max_tokens=0`` surface (lm-eval-harness
    "loglikelihood" scoring; the reference has no scoring path at all —
    utils/model.py only samples). Unlike score_logits (one full-sequence
    forward per length -> a new compile per length), this walks the
    prompt CHUNK-wide with a KV cache, so a serving daemon can score
    arbitrary-length prompts online with zero new compiles.

    Returns ``score(params, tokens) -> [N-1] rows`` where row i-1 is
    (chosen_lp, [(alt_id, alt_lp) x LP_K]) scoring tokens[i] given
    tokens[:i] (the first token has no conditional — OpenAI reports it
    as null)."""
    freqs = jnp.asarray(precompute_freqs(cfg.rope_dim, cfg.max_context,
                                         cfg.rope_theta))
    K = min(LP_K, cfg.vocab_size)
    # scoring chunk: wider than the serving CHUNK — the walk is
    # dispatch/readback-bound, not compute-bound (measured on v5e, 2B:
    # 32-token chunks 380 tok/s vs 128-token 1.1k+ — PERF.md §Scoring).
    # SSM/hybrid stacks scan T=1 inside the chunk graph (the recurrence
    # cannot run a T-wide forward), so their chunk stays dispatch-cheap
    # anyway; attention stacks take one T=SC forward per chunk.
    SC = 128 if cfg.max_context % 128 == 0 else CHUNK

    def _rows_of(params, hidden, targets):
        h = F.rms_norm(hidden, params["output_norm.weight"], cfg.norm_eps)
        lp = jax.nn.log_softmax(
            F.linear(h, params["output.weight"]).astype(jnp.float32), -1)
        chosen = jnp.take_along_axis(lp, targets[..., None], -1)[..., 0]
        top_lp, top_id = jax.lax.top_k(lp, K)
        return chosen, top_lp, top_id

    if cfg.ssm is None:
        @jax.jit
        def chunk_lp(params, state, toks, start_pos, targets):
            hidden, state = forward(params, cfg, state, toks, start_pos,
                                    freqs)
            return *_rows_of(params, hidden, targets), state
    else:
        @jax.jit
        def chunk_lp(params, state, toks, start_pos, targets):
            def step(carry, tok_t):
                st, t = carry
                hidden, st = forward(params, cfg, st, tok_t[:, None],
                                     start_pos + t, freqs)
                return (st, t + 1), hidden[:, 0]

            (state, _), hiddens = jax.lax.scan(
                step, (state, jnp.int32(0)), toks.T)
            return *_rows_of(params, hiddens.transpose(1, 0, 2),
                             targets), state

    def score(params, tokens):
        toks = [int(t) for t in tokens]
        n = len(toks)
        n_chunks = -(-n // SC)
        assert n >= 1 and n_chunks * SC <= cfg.max_context, \
            "prompt (chunk-padded) must fit max_context"
        state = init_state(cfg, batch=1)
        padded = toks + [0] * (n_chunks * SC - n)
        rows = []
        for c in range(n_chunks):
            lo = c * SC
            tgt = (padded + [0])[lo + 1:lo + 1 + SC]
            chosen, tl, ti, state = chunk_lp(
                params, state,
                jnp.asarray([padded[lo:lo + SC]], jnp.int32), lo,
                jnp.asarray([tgt], jnp.int32))
            rows.append((chosen[0], tl[0], ti[0]))
        # materialize AFTER the whole walk is dispatched — the chunks
        # chain through state, so a per-chunk sync would serialize
        # dispatch against host round trips (costly through the tunnel)
        rows = [tuple(np.asarray(a) for a in r) for r in rows]
        out = []
        for i in range(1, n):
            c, o = divmod(i - 1, SC)
            ch, tl, ti = rows[c]
            out.append((float(ch[o]),
                        list(zip(ti[o].astype(np.int64).tolist(),
                                 tl[o].tolist()))))
        return out

    return score


def sample_gumbel(logits, temperature, key):
    """Gumbel-max sampling == softmax(logits/temp) draw (model.py:318-319).
    temperature: scalar, or [B] per-row (continuous batching — each slot
    keeps its request's own temperature)."""
    g = jax.random.gumbel(key, logits.shape, jnp.float32)
    t = jnp.asarray(temperature)
    if t.ndim == 1:
        t = t[:, None]
    return jnp.argmax(logits / jnp.maximum(t, 1e-12) + g, -1)


SAMP_W = 8      # packed sampling-spec row width (pack_samp columns)


def pack_samp(temperature=0.0, top_p=1.0, top_k=0, min_p=0.0,
              presence=0.0, frequency=0.0, repetition=1.0,
              bias_active=0.0):
    """Pack a sampling spec into the [8] f32 row the jitted samplers take:
    (temperature, top_p, top_k, min_p, presence, frequency, repetition,
    bias_active). Passed as a traced ARGUMENT so any per-request spec runs
    under one compiled graph. Everything-off = (t, 1.0, 0, 0, 0, 0, 1, 0)
    — the reference samples with temperature only (model.py:318-319); the
    filters, penalties and logit bias are standard serving-surface extras
    (OpenAI presence/frequency penalties + logit_bias, HF repetition
    penalty). bias_active flags whether the caller's [.., V] bias buffer
    row carries non-zeros (the flag lets the sampler skip reading the
    buffer entirely when no row uses it)."""
    return jnp.asarray([temperature, top_p, float(top_k), min_p,
                        presence, frequency, repetition, bias_active],
                       jnp.float32)


def _samp_of(t):
    """Normalize a sampler's spec argument: a 0-d temperature becomes the
    everything-off [8] row; packed [4] / [7] rows (earlier layouts) pad to
    [8] with the extras off; per-row [B, 4|7|8] rows pass through likewise
    (serving paths always pack — a bare [B] temps vector is NOT accepted
    there, it would be ambiguous with a packed row at B=4)."""
    t = jnp.asarray(t, jnp.float32)
    if t.ndim == 0:
        t = t[None]
        t = jnp.concatenate([t, jnp.asarray([1.0, 0.0, 0.0], jnp.float32)])
    if t.shape[-1] == 4:                          # pad: penalties off
        off = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                               t.shape[:-1] + (3,))
        t = jnp.concatenate([t, off], -1)
    if t.shape[-1] == 7:                          # pad: logit bias off
        t = jnp.concatenate(
            [t, jnp.zeros(t.shape[:-1] + (1,), jnp.float32)], -1)
    return t


def sample_filtered(logits, samp, key, counts_p=None, counts_o=None,
                    bias=None, row_keys=None, cmask=None):
    """Gumbel-max sampling with device-side penalties, logit bias, and
    top-p/k/min-p filters.

    bias: optional [*, V] f32 additive logit bias (OpenAI logit_bias,
    densified per row by the caller), applied after penalties and before
    temperature; rows flag participation via samp[..., 7] so the buffer
    is only read when some row uses it.

    samp: packed pack_samp row(s) — [7] shared across rows or [B, 7]
    per-row (continuous batching; [4] legacy rows pad penalties-off).
    Processor order matches HF/vLLM: penalties -> temperature -> filters.

    Penalties (need counts; silently off when counts are None):
    - repetition (samp[...,6], 1.0 = off): HF semantics — every token seen
      in prompt OR output (counts_p + counts_o > 0) has logit/r if
      positive else logit*r.
    - presence (samp[...,4], 0 = off) / frequency (samp[...,5], 0 = off):
      vLLM/OpenAI semantics — subtract presence*(count>0) +
      frequency*count over OUTPUT tokens only (counts_o).
    counts_p/counts_o: int32 [*, V] prompt / generated-token histograms
    aligned with logits' leading axes.

    Filters apply to the TEMPERATURE-SCALED distribution (the usual
    server semantics): top_k keeps the k highest logits (0 = off), top_p
    the smallest prefix of the sorted distribution with mass >= top_p
    (1.0 = off), min_p drops tokens with prob < min_p * max_prob (0 =
    off). Greedy rows (temp 0) are unaffected by any filter — the max
    always survives — but penalties DO change greedy output (their
    point), so penalty-carrying rows are excluded from exactness-tested
    greedy fast paths (spec windows). Penalty math and the filter sort
    each ride a lax.cond on "any active": the all-off steady state pays
    neither.

    Determinism note (measured on a real v5e): penalty division
    compresses logit gaps, manufacturing near-ties, and bf16 matmul
    tiling differs across batch shapes — so penalized greedy output is
    deterministic PER graph shape but may flip tokens between e.g. B=1
    generate_batch and a B=3 engine. Same-shape graphs agree
    token-for-token (engine == generate_batch at equal batch width);
    unpenalized greedy stays batch-shape-robust.
    """
    samp = _samp_of(samp)
    lg = _processed_logits(logits, samp, counts_p, counts_o, bias, cmask)
    return _draw(lg, samp, key, row_keys)


def _processed_logits(logits, samp, counts_p=None, counts_o=None, bias=None,
                      cmask=None):
    """Penalties + logit bias applied, f32 (``samp`` already normalized by
    _samp_of). This is the distribution logprobs report over — post
    penalties/bias, PRE temperature and filters (the standard serving
    logprob base: deterministic, independent of the sampled draw)."""
    lg = logits.astype(jnp.float32)
    pres, freq, rep = samp[..., 4], samp[..., 5], samp[..., 6]

    def col(x):  # align a per-row scalar against logits' last (vocab) axis
        return x[..., None] if x.ndim == lg.ndim - 1 else x

    if counts_o is not None:
        c_o = counts_o.astype(jnp.float32)
        c_all = c_o if counts_p is None \
            else c_o + counts_p.astype(jnp.float32)

        def penalized(x):
            r = col(rep)
            x = jnp.where(c_all > 0,
                          jnp.where(x > 0, x / r, x * r), x)
            return (x - col(freq) * c_o
                    - col(pres) * (c_o > 0).astype(jnp.float32))

        pen_on = jnp.any((pres != 0.0) | (freq != 0.0) | (rep != 1.0))
        lg = jax.lax.cond(pen_on, penalized, lambda x: x, lg)

    if bias is not None:
        has_bias = col(samp[..., 7])
        lg = jax.lax.cond(jnp.any(has_bias != 0.0),
                          lambda x: x + jnp.where(has_bias != 0.0, bias,
                                                  0.0),
                          lambda x: x, lg)
    if cmask is not None:
        # constrained decoding (serving/constrain.py): cmask flags tokens
        # the row's grammar state disallows — masked to the filters'
        # sentinel so both the draw and the reported logprob distribution
        # see the CONSTRAINED support (unconstrained rows pass all-False
        # masks: a bitwise no-op)
        lg = jnp.where(cmask, jnp.float32(jnp.finfo(jnp.float32).min), lg)
    return lg


def serving_row_keys(base_key, seeds, idx):
    """Per-row sampling keys: fold_in(fold_in(base_key, seed_b), idx_b).

    Each row's Gumbel noise depends ONLY on (engine base seed, the
    request's seed, the generated-token index) — independent of slot
    assignment, batch composition, and global step count. That is what
    makes submit(seed=)/OpenAI ``seed`` reproducible: the same seeded
    request re-submitted later, on another slot, beside other traffic,
    draws the same noise sequence (token equality additionally needs
    row-stable logits — exact on CPU f32; bf16 TPU matmul tiling keeps
    rows stable per graph shape, see sample_filtered's determinism
    note)."""
    return jax.vmap(lambda s, i: jax.random.fold_in(
        jax.random.fold_in(base_key, s), i))(
            jnp.asarray(seeds, jnp.int32), jnp.asarray(idx, jnp.int32))


def _draw(lg, samp, key, row_keys=None):
    """Temperature scale -> top-p/k/min-p filters -> Gumbel-max over
    _processed_logits output (``samp`` already _samp_of-normalized).
    row_keys: optional [B] per-row keys (serving_row_keys) — noise is
    then drawn per row, making each row's draw independent of its
    position in the batch; ``key`` is ignored."""
    t, top_p, top_k, min_p = (samp[..., 0], samp[..., 1],
                              samp[..., 2], samp[..., 3])

    def col(x):
        return x[..., None] if x.ndim == lg.ndim - 1 else x

    scaled = lg / jnp.maximum(col(t), 1e-12)
    neg = jnp.float32(jnp.finfo(jnp.float32).min)

    def filtered(x):
        s = jnp.flip(jnp.sort(x, -1), -1)                     # descending
        V = s.shape[-1]
        k = jnp.clip(col(top_k).astype(jnp.int32) - 1, 0, V - 1)
        kth = jnp.take_along_axis(s, jnp.broadcast_to(k, s.shape[:-1] + (1,)),
                                  -1)
        thr_k = jnp.where(col(top_k) > 0.5, kth, neg)
        p = jax.nn.softmax(s, -1)
        before = jnp.cumsum(p, -1) - p            # mass strictly above each
        keep = (before < col(top_p)).at[..., :1].set(True)
        n_keep = jnp.sum(keep.astype(jnp.int32), -1, keepdims=True)
        thr_p = jnp.take_along_axis(s, n_keep - 1, -1)
        thr_m = jnp.where(col(min_p) > 0.0,
                          s[..., :1] + jnp.log(jnp.maximum(col(min_p),
                                                           1e-12)), neg)
        thr = jnp.maximum(jnp.maximum(thr_k, thr_p), thr_m)
        return jnp.where(x >= thr, x, neg)

    active = jnp.any((top_p < 1.0) | (top_k > 0.5) | (min_p > 0.0))
    scaled = jax.lax.cond(active, filtered, lambda x: x, scaled)
    if row_keys is None:
        g = jax.random.gumbel(key, lg.shape, jnp.float32)
    else:
        g = jax.vmap(lambda k: jax.random.gumbel(k, lg.shape[1:],
                                                 jnp.float32))(row_keys)
    return jnp.argmax(scaled + g, -1)


LP_K = 8      # top-alternative count baked into logprob-carrying graphs


def sample_filtered_lp(logits, samp, key, counts_p=None, counts_o=None,
                       bias=None, k: int = LP_K, row_keys=None, cmask=None):
    """sample_filtered that also returns a packed logprob row per sample:
    [chosen_lp, top-k lps (desc), top-k ids (as f32)] -> [..., 1 + 2k].

    Logprobs are log_softmax over the POST-penalty/bias, PRE-temperature
    logits (_processed_logits) — the deterministic scoring base OpenAI
    clients expect; temperature and filters shape the draw, not the
    reported distribution. Cost per decode step is one log_softmax +
    top_k over [B, V] — noise next to the forward — so serving graphs
    compute it unconditionally (no per-request cond)."""
    samp = _samp_of(samp)
    lg = _processed_logits(logits, samp, counts_p, counts_o, bias, cmask)
    tok = _draw(lg, samp, key, row_keys)
    lp = jax.nn.log_softmax(lg, -1)
    kk = min(k, logits.shape[-1])    # toy vocabs < LP_K: fewer real alts
    top_lp, top_id = jax.lax.top_k(lp, kk)
    if kk < k:                       # pad to the FIXED [1+2k] row the
        # engine's buffers/parser assume (consumers clamp their requested
        # alt count to vocab_size, so padding is never surfaced)
        shp = top_lp.shape[:-1] + (k - kk,)
        top_lp = jnp.concatenate(
            [top_lp, jnp.full(shp, jnp.finfo(jnp.float32).min)], -1)
        top_id = jnp.concatenate(
            [top_id, jnp.zeros(shp, top_id.dtype)], -1)
    chosen = jnp.take_along_axis(lp, tok[..., None], -1)
    return tok, jnp.concatenate(
        [chosen, top_lp, top_id.astype(jnp.float32)], -1)


def _prefill_hidden(params, cfg: TransformerConfig, state, tokens, start_pos,
                    n_real, freqs, pad_start=None):
    """One CHUNK of prefill -> (pre-norm hidden [B, D] at token n_real-1,
    new state). Attention/MLA stacks run the whole chunk in one forward;
    SSM/hybrid stacks scan it token-by-token inside the same compiled
    program (the recurrence is T=1-only — the reference's per-token Python
    loop, model.py:398, compiled into one graph). Padded steps (t >= n_real)
    skip the state update so the recurrence stays clean; with pad_start,
    rows only advance once the global position clears their left pad."""
    if cfg.ssm is None:
        hidden, state = forward(params, cfg, state, tokens, start_pos, freqs,
                                pad_start=pad_start)
        return jnp.take(hidden, n_real - 1, axis=1), state

    def step(carry, tok_t):
        st, t = carry

        def live_step(st):
            rl = None if pad_start is None else (start_pos + t) >= pad_start
            hidden, st2 = forward(params, cfg, st, tok_t[:, None],
                                  start_pos + t, freqs, pad_start=pad_start,
                                  row_live=rl)
            return st2, hidden[:, 0]

        def dead(st):
            return st, jnp.zeros((tokens.shape[0], cfg.dim), jnp.float32)

        st, h = jax.lax.cond(t < n_real, live_step, dead, st)
        return (st, t + 1), h

    (state, _), hiddens = jax.lax.scan(step, (state, jnp.int32(0)), tokens.T)
    return jnp.take(hiddens, n_real - 1, axis=0), state


def make_step_fns(cfg: TransformerConfig, use_pallas_decode: bool = False,
                  interpret: bool = False, kv_quant: bool = False):
    """-> (prefill_fn, decode_fn), both jitted, taking params explicitly
    (closing over params would bake GBs of weights into the graph as
    constants and stall compilation).

    prefill(params, state, tokens[B,CHUNK], start_pos, n_real, temp, key)
        -> (token [B], new_state)   (logits taken at n_real-1)
    decode(params, state, token[B,1], start_pos, temp, key) -> (token, state)

    ``temp`` is a scalar temperature or a packed pack_samp() row
    (temperature, top_p, top_k, min_p).

    use_pallas_decode: route standard-attention blocks through the prefix-
    aware Pallas decode kernel (ops/decode_attention) — HBM reads scale with
    the live context instead of max_context. Batch-1, plain GQA blocks only.
    """
    freqs = jnp.asarray(precompute_freqs(cfg.rope_dim, cfg.max_context,
                                         cfg.rope_theta))

    @jax.jit
    def prefill(params, state, tokens, start_pos, n_real, temperature, key):
        hidden, state = _prefill_hidden(params, cfg, state, tokens,
                                        start_pos, n_real, freqs)
        hidden = F.rms_norm(hidden, params["output_norm.weight"], cfg.norm_eps)
        logits = F.linear(hidden, params["output.weight"])
        return sample_filtered(logits, temperature, key), state

    attn_impl = None
    if use_pallas_decode:
        from ..ops.decode_attention import (CHUNK as _DC, decode_attention,
                                            decode_attention_q8)
        assert cfg.max_context % _DC == 0, \
            f"use_pallas_decode needs max_context % {_DC} == 0"

        if kv_quant:
            def attn_impl(q, st, start_pos, pads=None):  # noqa: F811
                # q [1,H,1,D]; int8 caches [1,KvH,S,D] + scales [1,KvH,S]
                out = decode_attention_q8(
                    q[0, :, 0], st["k"][0], st["k_s"][0], st["v"][0],
                    st["v_s"][0], start_pos, interpret=interpret)
                return out[None, :, None]
        else:
            def attn_impl(q, st, start_pos, pads=None):  # noqa: F811
                # q [1,H,1,D]; caches [1,KvH,S,D] (S padded to the chunk size)
                out = decode_attention(q[0, :, 0], st["k"][0], st["v"][0],
                                       start_pos, interpret=interpret)
                return out[None, :, None]

    @jax.jit
    def decode(params, state, token, start_pos, temperature, key):
        hidden, state = forward(params, cfg, state, token, start_pos, freqs,
                                decode_attn=attn_impl)
        logits = logits_at(params, cfg, hidden, jnp.int32(0))
        return sample_filtered(logits, temperature, key), state

    return prefill, decode


def generate_batch(params, cfg: TransformerConfig, prompts: list,
                   max_new: int, temperature: float = 0.0, seed: int = 0,
                   eos_id: int | None = None, state_dtype=jnp.float32,
                   kv_quant: bool = False, use_pallas_decode: bool = False,
                   interpret: bool = False, top_p: float = 1.0,
                   top_k: int = 0, min_p: float = 0.0,
                   presence_penalty: float = 0.0,
                   frequency_penalty: float = 0.0,
                   repetition_penalty: float = 1.0,
                   logit_bias: dict | None = None,
                   seeds: list | None = None) -> list:
    """Batched generation: B prompts in ONE cache, ONE prefill/decode graph.

    seeds: optional per-row sampling seeds ([B] ints). When given, each
    row's Gumbel noise is keyed by (seed, base ``seed``, generated-token
    index) via serving_row_keys — the SAME scheme the continuous-batching
    engine uses for submit(seed=), so a seeded generate_batch row and a
    seeded engine request draw identical noise (token-exact on CPU f32 at
    equal batch width). When None, keys derive from a split chain as
    before (draws vary with position in the decode loop).

    Prompts are RIGHT-ALIGNED (left-padded to the longest) and each row's
    pad region is masked out of attention; RoPE scores depend only on
    relative position, so the per-row left shift does not change any row's
    math — each output equals that prompt's solo generation. Decode cost is
    amortized B ways (the single-stream path is weight-read-bound; see
    PERF.md). Attention/MLA stacks prefill CHUNK-wide; SSM/hybrid stacks
    scan the chunk token-by-token with per-row live masking (the recurrence
    must not ingest left-pad junk — see _ssm_block).

    Returns [B] lists of up to max_new token ids (truncated at eos_id).
    """
    b_n = len(prompts)
    assert min(len(p) for p in prompts) >= 1, \
        "empty prompt row: its first sample would come from a pad position"
    # The prefill below always writes a CHUNK-wide K/V slice at start_pos=pos;
    # if max_context were not CHUNK-aligned the final chunk's
    # dynamic_update_slice start would clamp and silently overwrite earlier
    # valid cache rows (ADVICE r2).
    assert cfg.max_context % CHUNK == 0, "max_context must be CHUNK-aligned"
    longest = max(len(p) for p in prompts)
    assert longest + max_new <= cfg.max_context, "prompts+max_new overflow ctx"
    pad = [longest - len(p) for p in prompts]
    rows = [[0] * d + list(p) for d, p in zip(pad, prompts)]
    pad_arr = jnp.asarray(pad, jnp.int32)
    freqs = jnp.asarray(precompute_freqs(cfg.rope_dim, cfg.max_context,
                                         cfg.rope_theta))

    attn_impl = None
    if use_pallas_decode:
        from ..ops.decode_attention import (CHUNK as _DC,
                                            decode_attention_batch,
                                            decode_attention_batch_q8)
        assert cfg.max_context % _DC == 0, \
            f"use_pallas_decode needs max_context % {_DC} == 0"
        assert cfg.ssm is None, "batched Pallas decode needs attn-only stacks"

        if kv_quant:
            def attn_impl(q, st, start_pos, pads):  # [B,H,1,D] -> [B,H,1,D]
                out = decode_attention_batch_q8(
                    q[:, :, 0], st["k"], st["k_s"], st["v"], st["v_s"],
                    start_pos, pads, interpret=interpret)
                return out[:, :, None]
        else:
            def attn_impl(q, st, start_pos, pads):  # [B,H,1,D] -> [B,H,1,D]
                out = decode_attention_batch(q[:, :, 0], st["k"], st["v"],
                                             start_pos, pads,
                                             interpret=interpret)
                return out[:, :, None]

    # static branch: the plain graphs stay bit-identical to before (no
    # histogram/bias buffers, no extra args — existing compile-cache keys);
    # any penalty or logit_bias switches both graphs to the extras variant
    pen = (presence_penalty != 0.0 or frequency_penalty != 0.0
           or repetition_penalty != 1.0)
    extras = pen or bool(logit_bias)
    per_row = seeds is not None
    if per_row:
        assert len(seeds) == b_n, "seeds must give one seed per prompt"

    def _sample(logits, temp, key, cnt_p=None, cnt_o=None, bias_=None):
        # per_row: ``key`` is a [B] serving_row_keys batch, not one key
        if per_row:
            return sample_filtered(logits, temp, None, cnt_p, cnt_o, bias_,
                                   row_keys=key)
        return sample_filtered(logits, temp, key, cnt_p, cnt_o, bias_)

    # pad_start rides as a traced ARGUMENT: baking it as a closure constant
    # would recompile both graphs for every new prompt-length profile
    @jax.jit
    def prefill(params_, state, tokens, start_pos, n_real, temp, key, pads,
                cnt_p=None, cnt_o=None, bias=None):
        hidden, state = _prefill_hidden(params_, cfg, state, tokens,
                                        start_pos, n_real, freqs,
                                        pad_start=pads)
        hidden = F.rms_norm(hidden, params_["output_norm.weight"],
                            cfg.norm_eps)
        logits = F.linear(hidden, params_["output.weight"])
        return _sample(logits, temp, key, cnt_p, cnt_o, bias), state

    all_live = jnp.ones((b_n,), bool)

    @jax.jit
    def decode(params_, state, token, start_pos, temp, key, pads):
        hidden, state = forward(params_, cfg, state, token, start_pos,
                                freqs, pad_start=pads, decode_attn=attn_impl,
                                row_live=all_live if cfg.ssm else None)
        logits = logits_at(params_, cfg, hidden, jnp.int32(0))
        return _sample(logits, temp, key), state

    @jax.jit
    def decode_ex(params_, state, cnt_o, token, start_pos, temp, key, pads,
                  cnt_p, bias):
        # consumed token joins the output histogram before sampling
        cnt_o = cnt_o.at[jnp.arange(b_n), token[:, 0]].add(1)
        hidden, state = forward(params_, cfg, state, token, start_pos,
                                freqs, pad_start=pads, decode_attn=attn_impl,
                                row_live=all_live if cfg.ssm else None)
        logits = logits_at(params_, cfg, hidden, jnp.int32(0))
        return (_sample(logits, temp, key, cnt_p, cnt_o, bias),
                state, cnt_o)

    state = init_state(cfg, batch=b_n, dtype=state_dtype, kv_quant=kv_quant)
    temp = pack_samp(temperature, top_p, top_k, min_p, presence_penalty,
                     frequency_penalty, repetition_penalty,
                     1.0 if logit_bias else 0.0)
    cnt_p = cnt_o = bias = None
    if extras:
        cnt_p = jnp.asarray(np.stack([np.bincount(
            np.asarray(p, np.int64), minlength=cfg.vocab_size)
            for p in prompts]), jnp.int32)
        cnt_o = jnp.zeros((b_n, cfg.vocab_size), jnp.int32)
        brow = np.zeros(cfg.vocab_size, np.float32)
        for t, v in (logit_bias or {}).items():
            brow[int(t)] = float(v)
        bias = jnp.broadcast_to(jnp.asarray(brow), (b_n, cfg.vocab_size))
    key = jax.random.PRNGKey(seed)
    if per_row:
        base0 = key
        seeds_arr = jnp.asarray(seeds, jnp.int32)

        def keys_at(i):
            return serving_row_keys(base0, seeds_arr,
                                    jnp.full((b_n,), i, jnp.int32))
    pos = 0
    tok = None
    while pos < longest:
        n = min(CHUNK, longest - pos)
        chunk = [r[pos:pos + n] + [0] * (CHUNK - n) for r in rows]
        if per_row:
            sub = keys_at(0)          # first sampled token has index 0
        else:
            key, sub = jax.random.split(key)
        args = (params, state, jnp.asarray(chunk, jnp.int32),
                pos, jnp.int32(n), temp, sub, pad_arr)
        tok, state = (prefill(*args, cnt_p, cnt_o, bias) if extras
                      else prefill(*args))
        pos += n

    out: list = [[] for _ in range(b_n)]
    done = [False] * b_n
    cur = np.asarray(tok)
    gi = 1                            # next decode produces token index 1
    for _ in range(max_new):
        for b in range(b_n):
            if not done[b]:
                out[b].append(int(cur[b]))
                if eos_id is not None and int(cur[b]) == eos_id:
                    done[b] = True
        if all(done) or pos >= cfg.max_context - 1:
            break
        if per_row:
            sub = keys_at(gi)
        else:
            key, sub = jax.random.split(key)
        if extras:
            tok, state, cnt_o = decode_ex(
                params, state, cnt_o, jnp.asarray(cur[:, None], jnp.int32),
                pos, temp, sub, pad_arr, cnt_p, bias)
        else:
            tok, state = decode(params, state,
                                jnp.asarray(cur[:, None], jnp.int32), pos,
                                temp, sub, pad_arr)
        pos += 1
        gi += 1
        cur = np.asarray(tok)
    return out


def make_serving_fns(cfg: TransformerConfig, use_pallas_decode: bool = False,
                     interpret: bool = False, spec_lookup: int = 0,
                     constraints: bool = False):
    """Continuous-batching serving graphs (serving/engine.py drives them).

    spec_lookup=G > 0 returns the SPECULATIVE graphs instead (device-side
    prompt-lookup drafting + (G+1)-token verify windows, 1..G+1 tokens per
    decode dispatch — see _make_spec_serving_fns; aux-threading signatures,
    attention/MLA stacks only, mutually exclusive with use_pallas_decode:
    the verify window is a T=G+1 prefill-shaped forward the T=1 decode
    kernel cannot serve).

    Unlike generate_batch (one right-aligned batch, all rows at one global
    position), every slot here sits at its OWN absolute position, so
    requests join and leave the batch at any time — the TPU-native
    equivalent of vLLM-style continuous batching, built on the same
    forward(): per-row positions ride as a [B] vector (scatter cache
    writes, per-row RoPE gather, per-row causal mask).

    Both graphs are built to cost ONE dispatch per scheduler tick through
    a high-latency link (the axon tunnel here; PCIe hosts win the same
    way, smaller): sampled tokens stay device-resident (first_tok buffer +
    prev_tok chaining), per-row PRNG keys are folded INSIDE the graph
    from (request seed, generated-token index) — serving_row_keys, the
    basis of submit(seed=) reproducibility —
    and all per-step host inputs ride in one packed [5, B] meta
    array; scalars are plain Python numbers (traced, not re-uploaded
    arrays).

    prefill_slot(params, state, first_tok[B], first_lp[B,1+2K],
                 tokens[1,CHUNK], slot,
                 start_pos, n_real, temp, seed, base_key, cnt_p, cnt_o)
        -> (first_tok' [B], state)
        advances ONE slot's request by one chunk (other slots' cache rows
        untouched — sliced out, computed at B=1, scattered back); the
        chunk's sampled token lands in first_tok[slot] ON DEVICE (only the
        final chunk's matters). Chunks interleave with decode_all steps,
        so admitting a long prompt never stalls running requests for more
        than one chunk's latency.
    decode_all(params, state, prev_tok[B], first_tok[B], meta[5,B] i32,
               samp[B,8], base_key, cnt_o, cnt_p, bias)
        -> (token [B], state, cnt_o', lp [B,1+2K])
        one token for every slot; meta rows are [pos, live, inject, seed,
        plen] — seed/plen feed serving_row_keys (per-request reproducible
        sampling: the row's Gumbel noise is keyed by (seed,
        generated-token index), never by slot or step). Row b
        consumes first_tok[b] where inject (a slot's FIRST decode after
        prefill) and prev_tok[b] otherwise (the previous step's device
        output, chained without materialization — serving/engine.py reads
        tokens host-side a few steps LATE, keeping the dispatch pipeline
        full). Row b writes its K/V at pos[b] and attends cols <= pos[b].
        The ENGINE owns the park policy for slots that are not decoding
        (their sampled token is discarded): free slots ride at pos 0 (junk
        at 0 is rewritten by any future occupant's own sequential writes
        before its causal mask can reach it) and mid-prefill slots ride at
        their prefill cursor (the next prefill chunk overwrites exactly
        that position). Low park positions keep the Pallas kernel's read
        bound (max_b pos) at the live maximum. live gates ONLY the SSM
        recurrence (a dead row's junk step must not advance recurrent
        state — attention caches are position-addressed so parking
        suffices, recurrences are not; a retired-but-undiscovered slot's
        junk recurrence is erased by the next occupant's first-chunk
        reset).

    prefill_many(params, state, first_tok, first_lp, tokens[B,CHUNK],
                 meta[4,B] i32 [start_pos, n_real, valid, seed],
                 samp[B,8], base_key, cnt_p, cnt_o,
                 bias) -> (first_tok' [B], first_lp' [B,1+2K], state)

    Every sampling argument (``temp`` / ``samp``) is packed per pack_samp:
    (temperature, top_p, top_k, min_p, presence, frequency, repetition) —
    [7] for the single-slot prefill, [B, 7] rows elsewhere (each slot
    keeps its request's own spec). cnt_p / cnt_o are the [B, V] i32
    penalty histograms (engine-owned; see ServingEngine): decode_all adds
    each live row's consumed token to cnt_o before sampling and returns
    the updated buffer; prefills only read.

    Logprobs (non-spec graphs only): every sample also produces a packed
    [1 + 2*LP_K] f32 row — [chosen_lp, top-K lps desc, top-K ids] — over
    the post-penalty/bias pre-temperature distribution
    (sample_filtered_lp). decode_all returns it as a 4th output ``lp``
    [B, 1+2K]; prefills maintain a ``first_lp`` [B, 1+2K] buffer beside
    first_tok (valid rows overwrite). Computed unconditionally: one
    log_softmax + top_k per step is noise next to the forward, and a
    single graph beats a per-request variant.
        advances EVERY mid-prefill slot by one chunk in a single dispatch
        — per-row start positions, one shared weight sweep instead of one
        per slot (chunks are weight-read-bound at CHUNK=32). meta rows
        are [start_pos, n_real, valid, seed]; valid rides into the cache
        writes as a write_mask so non-participating rows' caches stay
        bit-identical (a clamped CHUNK-wide park write could corrupt
        attendable rows — see _cache_update). Attention/MLA stacks run
        the chunk in one T=CHUNK forward; SSM/hybrid stacks scan it T=1
        inside the same program with valid & (t < n_real) gating the
        recurrence and cache writes per token. Each valid row's sampled
        token (from its n_real-1 hidden) lands in first_tok[row]; only
        rows finishing their prompt keep it (mid-prompt rows' later
        chunks overwrite).

    use_pallas_decode routes decode_all's standard-attention blocks through
    the per-row-position Pallas kernel (ops/decode_attention): HBM reads
    stop at max(pos)+1 instead of max_context — the win regime when live
    positions sit far below the cache length.

    constraints=True (serving/constrain.py — grammar-constrained decoding,
    e.g. OpenAI json_object): the three graphs take extra args and return
    an extra output —
        ctab   [S, V] int16  token-level transition table (shared; -1 =
                             token disallowed in that state)
        cinit  [B]  int32    per-slot admission-time start state (-1 =
                             request unconstrained); prefills derive the
                             first token's state from it each chunk, so
                             mid-prompt junk samples can't corrupt it
        cstate [B]  int32    per-slot live state, device-chained like
                             cnt_o: each graph masks disallowed logits
                             (one [B, V] gather) and advances the state
                             with the token it just sampled, returned as
                             the final output.
    constraints=False wraps the same compiled graphs with an inert [1, V]
    table and all-unconstrained rows — the mask is select(False, ., lg),
    bitwise identity, so unconstrained serving is unchanged token-for-
    token. Not composable with spec_lookup (a drafted window would need
    per-position grammar states inside the verify scan).
    """
    freqs = jnp.asarray(precompute_freqs(cfg.rope_dim, cfg.max_context,
                                         cfg.rope_theta))

    if spec_lookup:
        assert cfg.ssm is None, \
            "speculative serving needs attention/MLA-only stacks (a " \
            "rejected draft's recurrent-state update cannot be rolled back)"
        assert not use_pallas_decode, \
            "spec_lookup and use_pallas_decode are mutually exclusive"
        assert not constraints, \
            "constrained decoding and spec_lookup are mutually exclusive"
        return _make_spec_serving_fns(cfg, int(spec_lookup), freqs)

    def _con_mask(ctab, cst, extra_live=None):
        """Per-row constraint context: (disallow-mask [B, V], live-
        constrained flag [B], gathered transition rows [B, V])."""
        crow = jnp.take(ctab, jnp.maximum(cst, 0), 0)
        con = cst >= 0
        if extra_live is not None:
            con = con & extra_live
        return con[:, None] & (crow < 0), con, crow

    def _con_advance(con, crow, tok, cst):
        """State after emitting ``tok``: rows whose transition is somehow
        dead (unreachable with a byte-complete vocab) stay put instead of
        going unconstrained."""
        nxt = jnp.take_along_axis(
            crow, tok[..., None].astype(jnp.int32), -1)[..., 0] \
            .astype(jnp.int32)
        return jnp.where(con & (nxt >= 0), nxt, cst)

    attn_impl = None
    if use_pallas_decode:
        from ..ops.decode_attention import CHUNK as _DC
        from ..ops.decode_attention import decode_attention_batch
        assert cfg.max_context % _DC == 0, \
            f"use_pallas_decode needs max_context % {_DC} == 0"
        assert cfg.ssm is None, "Pallas serving decode needs attn-only stacks"

        def attn_impl(q, st, pos_vec, pads):  # [B,H,1,D] -> [B,H,1,D]
            out = decode_attention_batch(q[:, :, 0], st["k"], st["v"],
                                         pos_vec, pads, interpret=interpret)
            return out[:, :, None]

    # state is donated: the serving cache can be half of HBM (e.g. 7.5 GB
    # at 8 slots x ctx 8192 on a 2B model) and an undonated update
    # transiently doubles it — measured RESOURCE_EXHAUSTED at exactly that
    # size. first_tok/prev_tok are NOT donated: lagged pending records
    # (serving/engine.py) still hold references to earlier outputs.
    @functools.partial(jax.jit, donate_argnums=(1,))
    def prefill_slot_c(params, state, first_tok, first_lp, tokens, slot,
                       start_pos, n_real, temp, seed, base_key, cnt_p, cnt_o,
                       bias, ctab, cinit, cstate):
        st_b = [jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, 0), s)
            for s in state]
        if cfg.ssm is not None:
            # a new occupant must not inherit the retired request's
            # recurrent state (attention caches need no reset: positions
            # <= pos are always rewritten before they can be attended)
            fresh = start_pos == 0
            st_b = [jax.tree.map(
                lambda a: jnp.where(fresh, jnp.zeros_like(a), a), s)
                if cfg.block_kind(i) == "ssm" else s
                for i, s in enumerate(st_b)]
        hidden, st_b = _prefill_hidden(params, cfg, st_b, tokens, start_pos,
                                       n_real, freqs)
        hidden = F.rms_norm(hidden, params["output_norm.weight"],
                            cfg.norm_eps)
        # constraint context from the ADMISSION state, not cstate: every
        # chunk of this slot's prefill re-derives "state after the first
        # generated token" from cinit, so the junk tokens sampled by
        # mid-prompt chunks overwrite junk and the final chunk lands the
        # real value
        ci = jax.lax.dynamic_slice(cinit, (slot,), (1,))
        cmask, con, crow = _con_mask(ctab, ci)
        tok, lp = sample_filtered_lp(
            F.linear(hidden, params["output.weight"]),
            temp, None,
            jax.lax.dynamic_slice_in_dim(cnt_p, slot, 1, 0),
            jax.lax.dynamic_slice_in_dim(cnt_o, slot, 1, 0),
            jax.lax.dynamic_slice_in_dim(bias, slot, 1, 0),
            row_keys=serving_row_keys(          # first token: idx 0
                base_key, jnp.asarray([seed]), jnp.zeros((1,), jnp.int32)),
            cmask=cmask)
        cstate = jax.lax.dynamic_update_slice(
            cstate, _con_advance(con, crow, tok, ci), (slot,))
        state = [jax.tree.map(
            lambda full, part: jax.lax.dynamic_update_slice_in_dim(
                full, part.astype(full.dtype), slot, 0), s, sb)
            for s, sb in zip(state, st_b)]
        first_tok = jax.lax.dynamic_update_slice(
            first_tok, tok.astype(first_tok.dtype), (slot,))
        first_lp = jax.lax.dynamic_update_slice(first_lp, lp, (slot, 0))
        return first_tok, first_lp, state, cstate

    @functools.partial(jax.jit, donate_argnums=(1, 7))
    def decode_all_c(params, state, prev_tok, first_tok, meta, samp,
                     base_key, cnt_o, cnt_p, bias, ctab, cstate):
        pos, live = meta[0], meta[1] != 0
        token = jnp.where(meta[2] != 0, first_tok, prev_tok)[:, None]
        # the consumed token joins the row's output histogram BEFORE
        # sampling (penalties must see every generated token so far);
        # dead rows' junk tokens are gated out — their counts survive a
        # retire/lagged-discovery window and are reset at re-admission
        cnt_o = cnt_o.at[jnp.arange(token.shape[0]), token[:, 0]].add(
            live.astype(cnt_o.dtype))
        hidden, state = forward(
            params, cfg, state, token, pos, freqs, decode_attn=attn_impl,
            row_live=live if cfg.ssm is not None else None)
        logits = logits_at(params, cfg, hidden, jnp.int32(0))
        # generated-token index: this step produces token (pos - plen + 1)
        # of its row's request (prefill's first token was index 0) — the
        # key depends on (seed, index) only, never slot/step/companions
        cmask, con, crow = _con_mask(ctab, cstate, live)
        tok, lp = sample_filtered_lp(
            logits, samp, None, cnt_p, cnt_o, bias,
            row_keys=serving_row_keys(base_key, meta[3],
                                      pos - meta[4] + 1),
            cmask=cmask)
        cstate = _con_advance(con, crow, tok, cstate)
        return tok, state, cnt_o, lp, cstate

    if cfg.ssm is None:
        # Batched multi-slot prefill: one weight-read pass advances EVERY
        # mid-prefill slot by a chunk (per-row start positions; meta rows
        # are [start_pos, n_real, valid]). A serialized prefill_slot pass
        # reads all weights per slot per chunk — at 32-token chunks the
        # dispatch is weight-bound, so k admitted prompts cost k weight
        # sweeps where one would do; this graph restores the sweep-sharing
        # that makes chunked prefill cheap (measured: admission bursts are
        # the mixed-ladder bottleneck, PERF.md). valid gates cache writes
        # row-wise (write_mask) — invalid rows' caches stay bit-identical.
        @functools.partial(jax.jit, donate_argnums=(1,))
        def prefill_many_c(params, state, first_tok, first_lp, tokens, meta,
                           samp, base_key, cnt_p, cnt_o, bias, ctab, cinit,
                           cstate):
            starts, n_real, valid = meta[0], meta[1], meta[2] != 0
            hidden, state = forward(params, cfg, state, tokens, starts,
                                    freqs, write_mask=valid)
            h = jnp.take_along_axis(
                hidden, jnp.maximum(n_real - 1, 0)[:, None, None], 1)[:, 0]
            h = F.rms_norm(h, params["output_norm.weight"], cfg.norm_eps)
            cmask, con, crow = _con_mask(ctab, cinit, valid)
            tok, lp = sample_filtered_lp(
                F.linear(h, params["output.weight"]),
                samp, None, cnt_p, cnt_o, bias,
                row_keys=serving_row_keys(    # first token: idx 0 per row
                    base_key, meta[3], jnp.zeros_like(meta[3])),
                cmask=cmask)
            # fallback from cinit, gated on valid: a reused slot whose NEW
            # occupant is unconstrained (cinit=-1) must not keep the retired
            # request's cstate (it would grammar-mask a plain request);
            # invalid rows are live decoders elsewhere — keep theirs
            cstate = jnp.where(valid, _con_advance(con, crow, tok, cinit),
                               cstate)
            first_tok = jnp.where(valid, tok, first_tok) \
                .astype(first_tok.dtype)
            first_lp = jnp.where(valid[:, None], lp, first_lp)
            return first_tok, first_lp, state, cstate
    else:
        # SSM/hybrid batched prefill: the recurrence is T=1-only, so the
        # chunk is SCANNED token-by-token inside one compiled program
        # (mirrors _prefill_hidden), but with PER-ROW starts/lengths —
        # row_live = valid & (t < n_real) gates both the recurrent state
        # and the attention cache writes per token, so every admitted
        # prompt still advances a chunk in ONE weight-sweep-per-token
        # dispatch instead of one full sweep per slot per chunk (the
        # round-2 "attention/MLA only" gap). First-chunk rows (starts==0)
        # zero their recurrent state first — a new occupant must not
        # inherit the retired request's recurrence (same rule as
        # prefill_slot; prefix_cache is engine-disabled for SSM stacks,
        # so admissions always begin at 0).
        @functools.partial(jax.jit, donate_argnums=(1,))
        def prefill_many_c(params, state, first_tok, first_lp, tokens, meta,
                           samp, base_key, cnt_p, cnt_o, bias, ctab, cinit,
                           cstate):
            starts, n_real, valid = meta[0], meta[1], meta[2] != 0
            fresh = valid & (starts == 0)
            state = [jax.tree.map(
                lambda a: jnp.where(
                    fresh.reshape((-1,) + (1,) * (a.ndim - 1)),
                    jnp.zeros_like(a), a), s)
                if cfg.block_kind(i) == "ssm" else s
                for i, s in enumerate(state)]
            n_max = jnp.max(jnp.where(valid, n_real, 0))

            def step(carry, tok_t):
                st, t = carry

                def live_step(st):
                    live_t = valid & (t < n_real)
                    pos_t = jnp.minimum(starts + t, cfg.max_context - 1)
                    hidden, st2 = forward(params, cfg, st, tok_t[:, None],
                                          pos_t, freqs, row_live=live_t,
                                          write_mask=live_t)
                    return st2, hidden[:, 0]

                def dead(st):
                    return st, jnp.zeros((tokens.shape[0], cfg.dim),
                                         jnp.float32)

                st, h = jax.lax.cond(t < n_max, live_step, dead, st)
                return (st, t + 1), h

            (state, _), hiddens = jax.lax.scan(
                step, (state, jnp.int32(0)), tokens.T)
            h = jnp.take_along_axis(
                hiddens, jnp.maximum(n_real - 1, 0)[None, :, None], 0)[0]
            h = F.rms_norm(h, params["output_norm.weight"], cfg.norm_eps)
            cmask, con, crow = _con_mask(ctab, cinit, valid)
            tok, lp = sample_filtered_lp(
                F.linear(h, params["output.weight"]),
                samp, None, cnt_p, cnt_o, bias,
                row_keys=serving_row_keys(
                    base_key, meta[3], jnp.zeros_like(meta[3])),
                cmask=cmask)
            # same slot-reuse rule as the attention variant above
            cstate = jnp.where(valid, _con_advance(con, crow, tok, cinit),
                               cstate)
            first_tok = jnp.where(valid, tok, first_tok) \
                .astype(first_tok.dtype)
            first_lp = jnp.where(valid[:, None], lp, first_lp)
            return first_tok, first_lp, state, cstate

    if constraints:
        return prefill_slot_c, decode_all_c, prefill_many_c

    # legacy (unconstrained) surface: same compiled graphs fed an inert
    # [1, V] table and all-unconstrained rows — the mask is
    # select(False, ., logits), a bitwise no-op, so every existing
    # exactness property holds unchanged
    inert_tab = jnp.zeros((1, cfg.vocab_size), jnp.int16)
    uncon: dict[int, jnp.ndarray] = {}

    def _uncon(b):
        if b not in uncon:
            uncon[b] = jnp.full((b,), -1, jnp.int32)
        return uncon[b]

    def prefill_slot(params, state, first_tok, first_lp, tokens, slot,
                     start_pos, n_real, temp, seed, base_key, cnt_p, cnt_o,
                     bias):
        u = _uncon(first_tok.shape[0])
        ft, fl, st, _ = prefill_slot_c(
            params, state, first_tok, first_lp, tokens, slot, start_pos,
            n_real, temp, seed, base_key, cnt_p, cnt_o, bias,
            inert_tab, u, u)
        return ft, fl, st

    def decode_all(params, state, prev_tok, first_tok, meta, samp,
                   base_key, cnt_o, cnt_p, bias):
        tok, st, co, lp, _ = decode_all_c(
            params, state, prev_tok, first_tok, meta, samp, base_key,
            cnt_o, cnt_p, bias, inert_tab, _uncon(first_tok.shape[0]))
        return tok, st, co, lp

    def prefill_many(params, state, first_tok, first_lp, tokens, meta,
                     samp, base_key, cnt_p, cnt_o, bias):
        u = _uncon(first_tok.shape[0])
        ft, fl, st, _ = prefill_many_c(
            params, state, first_tok, first_lp, tokens, meta, samp,
            base_key, cnt_p, cnt_o, bias, inert_tab, u, u)
        return ft, fl, st

    return prefill_slot, decode_all, prefill_many


def init_serving_aux(cfg: TransformerConfig, batch: int) -> dict:
    """Device-resident serving bookkeeping for speculative continuous
    batching (make_serving_fns(spec_lookup=G)):

    - ``ids`` [B, S] int32: per-slot token history — ids[b, p] is the token
      CONSUMED at cache position p (the token whose K/V row p holds).
      Prefill chunks and verified decode windows both record here, so the
      device can draft from its own history without any host round trip
      (the engine reads sampled tokens ``sync_lag`` steps late — a
      host-side lookup like Transformer._lookup_draft would stall the
      dispatch pipeline it exists to keep full).
    - ``pos`` [B] int32: each slot's next write position. Set by prefill
      chunks (start + n_real), advanced by verified windows (data-
      dependent: accepted + 1) — positions must live on device because the
      host cannot know data-dependent advancement at dispatch time.
    - ``last`` [B] int32: each slot's most recent emitted token (the next
      window's first input), device-chained like the non-spec prev_tok.
    """
    return {"ids": jnp.zeros((batch, cfg.max_context), jnp.int32),
            "pos": jnp.zeros((batch,), jnp.int32),
            "last": jnp.zeros((batch,), jnp.int32)}


def _device_lookup_draft(ids, pos, x0, gamma: int):
    """Vectorized prompt-lookup drafting ON DEVICE: for each row, find the
    most recent earlier occurrence of the current tail bigram
    (ids[pos-1], x0) in the consumed history and propose the ``gamma``
    tokens that followed it (the device analogue of the host-side
    Transformer._lookup_draft; draft quality only affects speed — any
    draft is verified, so exactness never depends on it).

    ids [B, S], pos [B], x0 [B] -> [B, gamma] int32. Rows with no match
    draft ``x0`` repeated (verification then accepts >= 1 token as usual).
    """
    S = ids.shape[1]
    q0 = jnp.take_along_axis(ids, jnp.maximum(pos - 1, 0)[:, None], 1)[:, 0]
    hit = (ids[:, :-1] == q0[:, None]) & (ids[:, 1:] == x0[:, None])
    p_idx = jnp.arange(S - 1)[None]
    # p <= pos-3: the match must be strictly earlier than the tail bigram
    # itself AND its first continuation token (p+2) must be consumed
    # history, not junk beyond pos
    valid = hit & (p_idx <= (pos - 3)[:, None])
    m = jnp.max(jnp.where(valid, p_idx, -1), axis=1)       # most recent
    gidx = jnp.clip(m[:, None] + 2 + jnp.arange(gamma)[None], 0, S - 1)
    d = jnp.take_along_axis(ids, gidx, 1)
    return jnp.where((m >= 0)[:, None], d, x0[:, None]).astype(jnp.int32)


def _make_spec_serving_fns(cfg: TransformerConfig, G: int, freqs):
    """Speculative continuous-batching graphs (make_serving_fns with
    spec_lookup=G; serving/engine.py drives them).

    Every decode dispatch verifies a (G+1)-token window per LIVE slot —
    [current token, G device-drafted lookahead tokens] at per-row absolute
    positions — and advances each row by its accepted-prefix length + 1
    (1..G+1 tokens per dispatch). Decode is weight-read-bound at these
    batch sizes, so a window costs roughly one token's latency while
    emitting up to G+1 tokens on repetitive text (the solo prompt-lookup
    win, models/llm.Transformer.generate:1283-1299, lifted into
    continuous batching). Greedy rows only: temperature>0 rows force
    accept=0 and emit their 1 sampled token per dispatch, exactly the
    non-spec behavior.

    Exactness argument (same invariant the solo verify path relies on,
    make_verify_fn): within a window, position j's K/V holds token x_j,
    and the causal mask lets position j attend in-window only to
    x_0..x_j — exactly the true context for every ACCEPTED prefix
    position. Rejected positions' cache rows are junk, but the next
    window starts exactly at the first rejected position and is G+1 wide,
    so junk rows are overwritten before any later query can attend them.

    Unlike the non-spec graphs, non-live rows write NOTHING (write_mask
    rides the live mask into every cache update): a (G+1)-wide park write
    could not use the 1-wide-junk park argument, so parked slots' caches
    stay bit-identical instead — which also makes prefix-reuse history
    trivially safe across idle periods.

    Signatures (aux = init_serving_aux; state, aux and decode's cnt_o are
    donated; cnt_p/cnt_o are the [B, V] penalty histograms, see
    make_serving_fns):
      prefill_slot(params, state, aux, first_tok, tokens[1,CHUNK], slot,
                   start_pos, n_real, temp, step, base_key, cnt_p, cnt_o)
          -> (first_tok', state, aux)   # also records ids, sets pos[slot]
      decode_spec(params, state, aux, first_tok, meta[2,B] i32 [live,
                  inject], samp[B,7], step, base_key, cnt_o, cnt_p)
          -> (out [B, G+2] i32, state, aux, cnt_o')
          out[b, :G+1] = the window's emitted-token candidates y_0..y_G
          (y_j = greedy token after consuming position pos+j; y_0 is
          Gumbel-sampled where row b is stochastic: temperature > 0 OR
          any penalty active — penalties perturb the greedy argmax, so
          penalized rows cannot ride the pure-greedy window verification
          and emit 1 token per dispatch); out[b, G+1] = n_emit, the
          number of leading candidates actually emitted (accepted + 1).
          The engine materializes these LATE like non-spec tokens and
          truncates at eos/max_new host-side.
      prefill_many(params, state, aux, first_tok, tokens[B,CHUNK],
                   meta[3,B] i32 [start,n_real,valid], samp[B,7], step,
                   base_key, cnt_p, cnt_o) -> (first_tok', state, aux)
    """
    S = cfg.max_context

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def prefill_slot(params, state, aux, first_tok, tokens, slot, start_pos,
                     n_real, temp, step, base_key, cnt_p, cnt_o, bias):
        st_b = [jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, 0), s)
            for s in state]
        hidden, st_b = _prefill_hidden(params, cfg, st_b, tokens, start_pos,
                                       n_real, freqs)
        hidden = F.rms_norm(hidden, params["output_norm.weight"],
                            cfg.norm_eps)
        tok = sample_filtered(F.linear(hidden, params["output.weight"]),
                              temp, jax.random.fold_in(base_key, step),
                              jax.lax.dynamic_slice_in_dim(cnt_p, slot, 1, 0),
                              jax.lax.dynamic_slice_in_dim(cnt_o, slot, 1, 0),
                              jax.lax.dynamic_slice_in_dim(bias, slot, 1, 0))
        state = [jax.tree.map(
            lambda full, part: jax.lax.dynamic_update_slice_in_dim(
                full, part.astype(full.dtype), slot, 0), s, sb)
            for s, sb in zip(state, st_b)]
        first_tok = jax.lax.dynamic_update_slice(
            first_tok, tok.astype(first_tok.dtype), (slot,))
        # record the chunk's ids (pads beyond n_real are junk the draft
        # lookup never reads: its validity mask stops below pos) and park
        # the slot's write position at its prefill cursor
        ids = jax.lax.dynamic_update_slice(
            aux["ids"], tokens.astype(jnp.int32), (slot, start_pos))
        pos = aux["pos"].at[slot].set(
            (start_pos + n_real).astype(jnp.int32))
        return first_tok, state, {"ids": ids, "pos": pos,
                                  "last": aux["last"]}

    @functools.partial(jax.jit, donate_argnums=(1, 2, 8))
    def decode_spec(params, state, aux, first_tok, meta, samp, step,
                    base_key, cnt_o, cnt_p, bias):
        live = meta[0] != 0
        pos = jnp.minimum(aux["pos"], S - 1 - G)   # junk steps clamp; live
        x0 = jnp.where(meta[1] != 0, first_tok, aux["last"])  # rows never
        draft = _device_lookup_draft(aux["ids"], pos, x0, G)  # bind (engine
        xs = jnp.concatenate([x0[:, None], draft], 1)   # asserts capacity)
        hidden, state = forward(params, cfg, state, xs, pos, freqs,
                                write_mask=live)
        h = F.rms_norm(hidden, params["output_norm.weight"], cfg.norm_eps)
        logits = F.linear(h, params["output.weight"])        # [B, G+1, V]
        greedy = jnp.argmax(logits, -1).astype(jnp.int32)
        # penalty-carrying rows ride the stochastic path (1 token/window):
        # penalties change the greedy argmax, so the pure-greedy window
        # verification below would accept tokens the penalized sampler
        # never emits. x0 (the consumed token) joins the histogram before
        # sampling, exactly like the non-spec decode_all.
        cnt_o = cnt_o.at[jnp.arange(x0.shape[0]), x0].add(
            live.astype(cnt_o.dtype))
        sampled0 = sample_filtered(logits[:, 0], samp,
                                   jax.random.fold_in(base_key, step),
                                   cnt_p, cnt_o, bias)
        stochastic = ((samp[:, 0] > 0.0) | (samp[:, 4] != 0.0)
                      | (samp[:, 5] != 0.0) | (samp[:, 6] != 1.0)
                      | (samp[:, 7] != 0.0))
        y = greedy.at[:, 0].set(
            jnp.where(stochastic, sampled0.astype(jnp.int32), greedy[:, 0]))
        acc = (xs[:, 1:] == y[:, :-1]).astype(jnp.int32)
        n_match = jnp.where(stochastic, 0, jnp.sum(jnp.cumprod(acc, 1), 1))
        n_emit = jnp.where(live, n_match + 1, 0)
        # record the window's ids at [pos, pos+G]; entries beyond
        # pos+n_match are junk the NEXT window (starting there) overwrites
        ids2 = jax.vmap(lambda row, xr, p:
                        jax.lax.dynamic_update_slice(row, xr, (p,)))(
            aux["ids"], xs, pos)
        aux = {"ids": jnp.where(live[:, None], ids2, aux["ids"]),
               "pos": jnp.where(live, jnp.minimum(pos + n_match + 1,
                                                  S - 1 - G), aux["pos"]),
               "last": jnp.where(
                   live, jnp.take_along_axis(y, n_match[:, None], 1)[:, 0],
                   aux["last"])}
        out = jnp.concatenate([y, n_emit[:, None]], 1)       # [B, G+2]
        return out, state, aux, cnt_o

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def prefill_many(params, state, aux, first_tok, tokens, meta, samp,
                     step, base_key, cnt_p, cnt_o, bias):
        starts, n_real, valid = meta[0], meta[1], meta[2] != 0
        hidden, state = forward(params, cfg, state, tokens, starts,
                                freqs, write_mask=valid)
        h = jnp.take_along_axis(
            hidden, jnp.maximum(n_real - 1, 0)[:, None, None], 1)[:, 0]
        h = F.rms_norm(h, params["output_norm.weight"], cfg.norm_eps)
        tok = sample_filtered(F.linear(h, params["output.weight"]), samp,
                              jax.random.fold_in(base_key, step),
                              cnt_p, cnt_o, bias)
        first_tok = jnp.where(valid, tok, first_tok).astype(first_tok.dtype)
        ids2 = jax.vmap(lambda row, xr, p:
                        jax.lax.dynamic_update_slice(row, xr, (p,)))(
            aux["ids"], tokens.astype(jnp.int32), starts)
        aux = {"ids": jnp.where(valid[:, None], ids2, aux["ids"]),
               "pos": jnp.where(valid, (starts + n_real).astype(jnp.int32),
                                aux["pos"]),
               "last": aux["last"]}
        return first_tok, state, aux

    return prefill_slot, decode_spec, prefill_many


def make_slot_transform(fn):
    """Lift a B=1 state transform ``fn(state_b, *args) -> state_b`` onto ONE
    slot of a batched serving state (serving/engine.py custom prefill):
    the slot's rows are sliced out, transformed at B=1, and scattered back
    in a single jitted program. Used e.g. to run Qwen3-VL's vision-tower
    image prefill into one slot while other slots' caches are untouched
    (serving/vlm.py)."""
    @jax.jit
    def wrapped(state, slot, *args):
        st_b = [jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, 0), s)
            for s in state]
        st_b = fn(st_b, *args)
        return [jax.tree.map(
            lambda full, part: jax.lax.dynamic_update_slice_in_dim(
                full, part.astype(full.dtype), slot, 0), s, sb)
            for s, sb in zip(state, st_b)]
    return wrapped


def make_verify_fn(cfg: TransformerConfig):
    """Jitted speculative-decoding verifier: feed G candidate tokens in one
    pass and return the greedy token AFTER each position ([B,G]). The cache
    is written for all G positions; entries past the accepted prefix are
    junk the caller's position bookkeeping never attends to (the causal
    mask is position-based) and later steps overwrite."""
    freqs = jnp.asarray(precompute_freqs(cfg.rope_dim, cfg.max_context,
                                         cfg.rope_theta))

    @jax.jit
    def verify(params, state, tokens, start_pos):
        hidden, state = forward(params, cfg, state, tokens, start_pos, freqs)
        h = F.rms_norm(hidden, params["output_norm.weight"], cfg.norm_eps)
        logits = F.linear(h, params["output.weight"])        # [B,G,V]
        return jnp.argmax(logits, -1).astype(jnp.int32), state

    return verify


# ---------------------------------------------------------------------------
# config from GGUF metadata
# ---------------------------------------------------------------------------

def config_from_gguf(kv: dict, state_dict: dict,
                     max_context: int | None = None) -> TransformerConfig:
    """llama.cpp metadata conventions -> TransformerConfig
    (reference from_gguf, model.py:324-384)."""
    arch = kv["general.architecture"]
    mc = kv.get(f"{arch}.context_length", 4096)
    max_context = min(max_context, mc) if max_context else mc
    # cache length must be CHUNK-aligned (prefill writes CHUNK-wide slices;
    # an unaligned final chunk would clamp and corrupt earlier rows —
    # ADVICE r2). Round DOWN: rounding up would let generation run past the
    # model's declared (trained) context window, since generate()'s stop
    # bound is cfg.max_context.
    max_context = max(CHUNK, max_context // CHUNK * CHUNK)
    n_heads = kv[f"{arch}.attention.head_count"]
    n_kv = kv[f"{arch}.attention.head_count_kv"]
    if isinstance(n_kv, list):
        n_kv = max(n_kv)
    kv_lora = kv.get(f"{arch}.attention.kv_lora_rank", 0)
    head_dim = kv.get(f"{arch}.attention.key_length_mla",
                      kv.get(f"{arch}.attention.key_length",
                             kv[f"{arch}.embedding_length"] // n_heads))
    rope_dim = kv.get(f"{arch}.rope.dimension_count", head_dim)
    ssm = None
    if arch in ("qwen35", "qwen35moe"):
        ssm = SSMConfig(**{k: kv[f"{arch}.ssm.{k}"] for k in
                           ("conv_kernel", "state_size", "group_count",
                            "time_step_rank", "inner_size")})
    lead = kv.get(f"{arch}.leading_dense_block_count", 0)
    return TransformerConfig(
        num_blocks=kv[f"{arch}.block_count"] - kv.get(f"{arch}.nextn_predict_layers", 0),
        dim=kv[f"{arch}.embedding_length"],
        hidden_dim=kv.get(f"{arch}.expert_feed_forward_length",
                          kv.get(f"{arch}.feed_forward_length", 0)),
        n_heads=n_heads, n_kv_heads=n_kv,
        norm_eps=kv[f"{arch}.attention.layer_norm_rms_epsilon"],
        vocab_size=len(kv["tokenizer.ggml.tokens"]),
        head_dim=head_dim, rope_theta=kv[f"{arch}.rope.freq_base"],
        rope_dim=rope_dim,
        v_head_dim=kv.get(f"{arch}.attention.value_length_mla",
                          kv.get(f"{arch}.attention.value_length", head_dim)),
        max_context=max_context,
        qk_norm=(head_dim if ssm else
                 (state_dict["blk.0.attn_q_norm.weight"].shape[0]
                  if "blk.0.attn_q_norm.weight" in state_dict else 0)),
        num_experts=kv.get(f"{arch}.expert_count", 0),
        num_experts_per_tok=kv.get(f"{arch}.expert_used_count", 0),
        norm_topk_prob=kv.get(f"{arch}.expert_weights_norm",
                              arch in ("qwen3moe", "qwen35moe")),
        kv_lora_rank=kv_lora, q_lora_rank=kv.get(f"{arch}.attention.q_lora_rank", 0),
        leading_dense_blocks=lead,
        shared_expert_dim=kv.get(
            f"{arch}.expert_shared_feed_forward_length",
            kv.get(f"{arch}.expert_shared_count", 0)
            * kv.get(f"{arch}.expert_feed_forward_length", 0)),
        shared_expert_gate=f"blk.{lead}.ffn_gate_inp_shexp.weight" in state_dict,
        dense_hidden_dim=kv.get(f"{arch}.feed_forward_length", 0) if lead else 0,
        routed_scaling_factor=kv.get(f"{arch}.expert_weights_scale", 1.0),
        attn_output_gate=arch in ("qwen35", "qwen35moe"),
        ssm=ssm, full_attention_interval=kv.get(f"{arch}.full_attention_interval", 0),
        qkv_bias="blk.0.attn_q.bias" in state_dict,
        expert_bias=f"blk.{lead}.exp_probs_b.bias" in state_dict)


def convert_state_dict(sd: dict[str, np.ndarray], kv: dict,
                       dtype=jnp.bfloat16) -> dict:
    """GGUF tensors -> device params. Handles the llama/MLA RoPE repack
    (interleaved -> half-split, model.py:350-360) and renames
    post_attention_norm -> ffn_norm for qwen35/glm4moe."""
    arch = kv["general.architecture"]
    n_heads = kv[f"{arch}.attention.head_count"]
    n_kv = kv[f"{arch}.attention.head_count_kv"]
    kv_lora = kv.get(f"{arch}.attention.kv_lora_rank", 0)
    head_dim = kv.get(f"{arch}.attention.key_length_mla",
                      kv.get(f"{arch}.attention.key_length",
                             kv[f"{arch}.embedding_length"] // n_heads))
    rope_dim = kv.get(f"{arch}.rope.dimension_count", head_dim)

    sd = dict(sd)
    if arch in ("qwen35", "qwen35moe", "glm4moe"):
        sd = {k.replace("post_attention_norm", "ffn_norm"): v for k, v in sd.items()}
    if "output.weight" not in sd and "token_embd.weight" in sd:
        sd["output.weight"] = sd["token_embd.weight"]

    def half_split(w, n):
        w = w.reshape(n, w.shape[0] // n, -1)
        prefix = head_dim - rope_dim
        head = w[:, :prefix]
        tail = w[:, prefix:].reshape(n, -1, 2, w.shape[-1]) \
            .transpose(0, 2, 1, 3).reshape(n, -1, w.shape[-1])
        return np.concatenate([head, tail], 1).reshape(-1, w.shape[-1])

    out = {}
    for name, arr in sd.items():
        arr = np.asarray(arr)
        if (("attn_q.weight" in name or "attn_q_b.weight" in name)
                and (arch == "llama" or kv_lora)):
            arr = half_split(arr, n_heads)
        elif arch == "llama" and "attn_k.weight" in name:
            w = arr.reshape(n_kv, arr.shape[0] // n_kv, -1)
            arr = w.reshape(n_kv, -1, 2, w.shape[-1]).transpose(0, 2, 1, 3) \
                .reshape(arr.shape)
        elif kv_lora and "attn_kv_a_mqa.weight" in name:
            head = arr[:kv_lora]
            tail = arr[kv_lora:].reshape(-1, 2, arr.shape[-1]) \
                .transpose(1, 0, 2).reshape(-1, arr.shape[-1])
            arr = np.concatenate([head, tail], 0)
        out[name] = jnp.asarray(arr, dtype if arr.dtype != np.int32 else None)
    return out


def init_params(cfg: TransformerConfig, seed: int = 0, dtype=jnp.float32) -> dict:
    """Random GGUF-named params for tests/offline runs."""
    rng = np.random.default_rng(seed)
    p: dict[str, jnp.ndarray] = {}

    def t(key, *shape, scale=0.05):
        p[key] = jnp.asarray(rng.normal(0, scale, shape), dtype)

    def ones(key, *shape):
        p[key] = jnp.ones(shape, dtype)

    t("token_embd.weight", cfg.vocab_size, cfg.dim)
    ones("output_norm.weight", cfg.dim)
    t("output.weight", cfg.vocab_size, cfg.dim)
    for i in range(cfg.num_blocks):
        bc = cfg.block_cfg(i)
        pre = f"blk.{i}"
        ones(pre + ".attn_norm.weight", cfg.dim)
        ones(pre + ".ffn_norm.weight", cfg.dim)
        kind = cfg.block_kind(i)
        if kind == "attn":
            qd = bc.head_dim * bc.n_heads * (2 if bc.attn_output_gate else 1)
            t(pre + ".attn_q.weight", qd, bc.dim)
            t(pre + ".attn_k.weight", bc.head_dim * bc.n_kv_heads, bc.dim)
            t(pre + ".attn_v.weight", bc.head_dim * bc.n_kv_heads, bc.dim)
            t(pre + ".attn_output.weight", bc.dim, bc.head_dim * bc.n_heads)
            if bc.qkv_bias:
                for n in ("q", "k", "v"):
                    d = qd if n == "q" else bc.head_dim * bc.n_kv_heads
                    p[f"{pre}.attn_{n}.bias"] = jnp.zeros((d,), dtype)
            if bc.qk_norm:
                ones(pre + ".attn_q_norm.weight", bc.qk_norm)
                ones(pre + ".attn_k_norm.weight", bc.qk_norm)
        elif kind == "mla":
            nope = bc.head_dim - bc.rope_dim
            if bc.q_lora_rank > 0:
                t(pre + ".attn_q_a.weight", bc.q_lora_rank, bc.dim)
                ones(pre + ".attn_q_a_norm.weight", bc.q_lora_rank)
                t(pre + ".attn_q_b.weight", bc.n_heads * bc.head_dim, bc.q_lora_rank)
            else:
                t(pre + ".attn_q.weight", bc.n_heads * bc.head_dim, bc.dim)
            t(pre + ".attn_kv_a_mqa.weight", bc.kv_lora_rank + bc.rope_dim, bc.dim)
            ones(pre + ".attn_kv_a_norm.weight", bc.kv_lora_rank)
            t(pre + ".attn_k_b.weight", bc.n_heads, bc.kv_lora_rank, nope)
            t(pre + ".attn_v_b.weight", bc.n_heads, bc.v_head_dim, bc.kv_lora_rank)
            t(pre + ".attn_output.weight", bc.dim, bc.n_heads * bc.v_head_dim)
        else:
            ssm = bc.ssm
            conv_ch = ssm.inner_size + 2 * ssm.group_count * ssm.state_size
            dv = ssm.inner_size // ssm.time_step_rank
            t(pre + ".attn_qkv.weight", conv_ch, bc.dim)
            t(pre + ".attn_gate.weight", ssm.inner_size, bc.dim)
            t(pre + ".ssm_alpha.weight", ssm.time_step_rank, bc.dim)
            t(pre + ".ssm_beta.weight", ssm.time_step_rank, bc.dim)
            t(pre + ".ssm_conv1d.weight", conv_ch, ssm.conv_kernel)
            p[pre + ".ssm_dt.bias"] = jnp.zeros((ssm.time_step_rank,), dtype)
            p[pre + ".ssm_a"] = jnp.full((ssm.time_step_rank,), -0.1, dtype)
            ones(pre + ".ssm_norm.weight", dv)
            t(pre + ".ssm_out.weight", bc.dim, ssm.inner_size)
        if bc.num_experts > 0:
            t(pre + ".ffn_gate_inp.weight", bc.num_experts, bc.dim)
            t(pre + ".ffn_gate_exps.weight", bc.num_experts, bc.hidden_dim, bc.dim)
            t(pre + ".ffn_up_exps.weight", bc.num_experts, bc.hidden_dim, bc.dim)
            t(pre + ".ffn_down_exps.weight", bc.num_experts, bc.dim, bc.hidden_dim)
            if bc.expert_bias:
                p[pre + ".exp_probs_b.bias"] = jnp.zeros((bc.num_experts,), dtype)
            if bc.shared_expert_dim > 0:
                t(pre + ".ffn_gate_shexp.weight", bc.shared_expert_dim, bc.dim)
                t(pre + ".ffn_up_shexp.weight", bc.shared_expert_dim, bc.dim)
                t(pre + ".ffn_down_shexp.weight", bc.dim, bc.shared_expert_dim)
                if bc.shared_expert_gate:
                    t(pre + ".ffn_gate_inp_shexp.weight", bc.dim)
        else:
            t(pre + ".ffn_gate.weight", bc.hidden_dim, bc.dim)
            t(pre + ".ffn_up.weight", bc.hidden_dim, bc.dim)
            t(pre + ".ffn_down.weight", bc.dim, bc.hidden_dim)
    return p


# ---------------------------------------------------------------------------
# host-side generator
# ---------------------------------------------------------------------------

def quantize_params_int4(p: dict, min_dim: int = 256) -> dict:
    """Packed int4 (group-128 scales) variant of quantize_params_int8 —
    4x less weight HBM per decoded token; MoE expert stacks stay int8."""
    from ..ops.quant_matmul import QuantLinear, quantize_int4
    out = quantize_params_int8(p, min_dim)
    return {k: (quantize_int4(p[k]) if isinstance(v, QuantLinear) else v)
            for k, v in out.items()}


def quantize_params_int8(p: dict, min_dim: int = 256) -> dict:
    """Weight-only int8 quantization of every large dense matmul weight.

    Replaces 2D ``*.weight`` arrays (both dims >= min_dim) with QuantLinear
    pytrees that F.linear dispatches to the Pallas dequant-in-VMEM kernel,
    and 3D ``*_exps.weight`` MoE stacks with QuantExpert (the per-token
    expert gather reads int8 rows) — halving decode HBM traffic vs bf16.
    Skipped: ``token_embd.weight`` (consumed by gather, not matmul), 1D
    norms/biases, MLA 3D projections, and small matrices (routers, SSM
    gates) where quantization saves nothing and costs accuracy.

    Beyond-reference capability: the reference dequantizes GGUF tensors to
    float at load (utils/gguf.py:55-156) and serves fp16 matmuls.
    """
    from ..ops.quant_matmul import quantize_experts_int8, quantize_int8
    out = {}
    for k, v in p.items():
        if (k.endswith(".weight") and k != "token_embd.weight"
                and getattr(v, "ndim", 0) == 2 and min(v.shape) >= min_dim):
            out[k] = quantize_int8(v)
        elif k.endswith("_exps.weight") and getattr(v, "ndim", 0) == 3:
            # MoE expert stacks: the per-token gather then reads int8 rows
            out[k] = quantize_experts_int8(v)
        else:
            out[k] = v
    return out


class Transformer:
    """Stateful wrapper: chunked prefill + decode loop + prefix-cache reuse
    (reference Transformer.generate, model.py:393-417)."""

    def __init__(self, params: dict, cfg: TransformerConfig, seed: int = 0,
                 state_dtype=jnp.float32, kv_quant: bool = False,
                 use_pallas_decode: bool = False, spec_lookup: int = 0):
        """state_dtype=bfloat16 halves decode KV-cache HBM traffic (the
        dominant term at long context) at ~1e-2 logit tolerance; kv_quant
        halves it again (int8 cache + per-token scales). use_pallas_decode
        routes decode through the prefix-aware kernel so reads scale with
        the live context (ops/decode_attention). spec_lookup=G enables
        prompt-lookup speculative decoding for greedy generation: draft G
        tokens from n-gram matches in the context and verify them in ONE
        forward — decode steps per output token drop toward 1/(G+1) on
        repetitive text (summaries, code), exact greedy outputs."""
        self.params = params
        self.cfg = cfg
        self.state = init_state(cfg, dtype=state_dtype, kv_quant=kv_quant)
        self.prefill_fn, self.decode_fn = make_step_fns(
            cfg, use_pallas_decode=use_pallas_decode, kv_quant=kv_quant)
        self.spec_lookup = 0 if cfg.ssm else int(spec_lookup)
        self.verify_fn = make_verify_fn(cfg) if self.spec_lookup else None
        self._cached_tokens: list[int] = []
        self._key = jax.random.PRNGKey(seed)
        self.chunk = CHUNK  # SSM configs scan the chunk internally (see prefill)
        # generate()'s chunked prefill always writes a CHUNK-wide K/V slice;
        # an unaligned max_context would let the last chunk's
        # dynamic_update_slice start clamp and corrupt earlier cache rows
        # (ADVICE r2 — same guard as generate_batch).
        assert cfg.max_context % CHUNK == 0, "max_context must be CHUNK-aligned"

    @classmethod
    def from_gguf(cls, path: str | Path, max_context: int | None = None,
                  dtype=jnp.bfloat16, seed: int = 0, quantize: bool = False,
                  kv_quant: bool = False, spec_lookup: int = 0):
        """quantize=True re-quantizes the dense matmul weights to int8 at
        rest in HBM (see quantize_params_int8) after the GGUF dequant;
        kv_quant=True serves with an int8 KV cache; spec_lookup=G enables
        prompt-lookup speculative decoding (see __init__)."""
        from ..io import gguf
        kv, sd = gguf.load(path)
        cfg = config_from_gguf(kv, sd, max_context)
        params = convert_state_dict(sd, kv, dtype)
        if quantize:
            params = quantize_params_int8(params)
        return cls(params, cfg, seed, kv_quant=kv_quant,
                   spec_lookup=spec_lookup), kv

    def quantize_int8(self):
        """Switch this instance to the int8 weight-only serving path."""
        self.params = quantize_params_int8(self.params)
        return self

    def _split_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    @staticmethod
    def _lookup_draft(tokens: list[int], gamma: int,
                      max_ngram: int = 3) -> list | None:
        """Prompt-lookup draft: find the most recent earlier occurrence of
        the current tail n-gram (longest n first) and propose the gamma
        tokens that followed it. O(len) host-side scan, no draft model."""
        for n in range(max_ngram, 1, -1):
            if len(tokens) <= n:
                continue
            tail = tokens[-n:]
            for i in range(len(tokens) - n - 1, -1, -1):
                if tokens[i:i + n] == tail:
                    cont = tokens[i + n:i + n + gamma]
                    if cont:
                        return (cont + [cont[-1]] * (gamma - len(cont)))
        return None

    def reusable_prefix(self, tokens: list[int]) -> int:
        n = 0
        for a, b in zip(tokens[:-1], self._cached_tokens):
            if a != b:
                break
            n += 1
        if self.cfg.ssm and n != len(self._cached_tokens):
            return 0  # recurrent state cannot be partially reused
        return n

    def generate(self, tokens: list[int], temperature: float = 0.0,
                 cache_offset: int = 0, max_new: int | None = None,
                 top_p: float = 1.0, top_k: int = 0, min_p: float = 0.0):
        """Yields sampled token ids until max_context (caller checks eos).

        cache_offset: absolute cache position where the prompt begins —
        nonzero when earlier context (e.g. VLM image embeddings) already
        occupies the cache. Prefix-cache reuse applies only at offset 0.
        top_p/top_k/min_p filter the temperature-scaled distribution on
        device (sample_filtered); they never change greedy outputs.
        """
        cfg = self.cfg
        pos = 0  # tokens of the prompt already consumed
        if cache_offset == 0:
            pos = self.reusable_prefix(tokens)
            if pos < len(self._cached_tokens):
                self.state = reset_recurrent(cfg, self.state)
        tokens = list(tokens)
        prompt_len = len(tokens)
        temp = pack_samp(temperature, top_p, top_k, min_p)
        out_tok = None
        produced = 0
        while cache_offset + len(tokens) < cfg.max_context:
            if pos < prompt_len:  # (chunked) prefill
                n = min(self.chunk, prompt_len - pos)
                chunk = tokens[pos:pos + n] + [0] * (self.chunk - n)
                tok = jnp.asarray([chunk], jnp.int32)
                out_tok, self.state = self.prefill_fn(
                    self.params, self.state, tok, cache_offset + pos,
                    jnp.int32(n), temp, self._split_key())
                pos += n
                if pos < prompt_len:
                    continue
            else:
                g = self.spec_lookup
                draft = None
                if (g and temperature == 0.0
                        and cache_offset + pos + g + 1 < cfg.max_context):
                    draft = self._lookup_draft(tokens, g)
                if draft is not None:
                    # one verify pass over [current, d1..dG]: greedy_out[i]
                    # is the model's token after consuming position pos+i
                    feed = jnp.asarray([[tokens[-1]] + draft], jnp.int32)
                    toks, self.state = self.verify_fn(
                        self.params, self.state, feed, cache_offset + pos)
                    greedy_out = np.asarray(toks)[0]
                    a = 0
                    while a < g and int(greedy_out[a]) == draft[a]:
                        a += 1
                    new_toks = draft[:a] + [int(greedy_out[a])]
                    pos += a + 1
                else:
                    out_tok, self.state = self.decode_fn(
                        self.params, self.state,
                        jnp.asarray([[tokens[-1]]], jnp.int32),
                        cache_offset + pos, temp, self._split_key())
                    pos += 1
                    new_toks = [int(np.asarray(out_tok)[0])]
                for nxt in new_toks:
                    tokens.append(nxt)
                    if cache_offset == 0:
                        self._cached_tokens = tokens[:-1]
                    produced += 1
                    yield nxt
                    if max_new is not None and produced >= max_new:
                        return
                continue
            nxt = int(np.asarray(out_tok)[0])
            tokens.append(nxt)
            if cache_offset == 0:
                self._cached_tokens = tokens[:-1]
            produced += 1
            yield nxt
            if max_new is not None and produced >= max_new:
                return
