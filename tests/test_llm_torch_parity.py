"""LLM decoder cross-framework numeric parity.

Every vision tower already has an independent torch cross-implementation
(tests/test_torch_parity.py); this file gives the LLM runtime — the largest
subsystem — the same treatment. A from-scratch torch decoder (full-sequence
causal attention, HF-style rotate-half RoPE, per-token python MoE routing,
NON-absorbed MLA, explicit-loop GatedDeltaNet recurrence) runs the same flat
GGUF-named weights as clearcam_tpu.models.llm.forward; hidden states and
logits must agree to 1e-4. The torch side deliberately uses different
formulations (rotate-half vs half-split rope, repeat_interleave GQA vs the
grouped einsum, materialized per-head MLA K/V vs the latent-absorbed trick,
per-token loops vs scans) so shared-mistake blindness is minimized.

Reference behaviors mirrored: utils/model.py:153-190 (attention),
:100-121 (MoE), :192-238 (MLA), :240-295 (GatedDeltaNet).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from clearcam_tpu.models import llm  # noqa: E402


def tiny_cfg(**kw):
    base = dict(num_blocks=2, dim=32, hidden_dim=64, n_heads=4, n_kv_heads=2,
                norm_eps=1e-5, vocab_size=64, head_dim=8, rope_theta=10000.0,
                rope_dim=8, v_head_dim=8, max_context=64)
    base.update(kw)
    return llm.TransformerConfig(**base)


def tp(params):
    return {k: torch.from_numpy(np.array(v, np.float32, copy=True))
            for k, v in params.items()}


def rms(x, w, eps):
    return x * torch.rsqrt((x * x).mean(-1, keepdim=True) + eps) * w


def rope_cos_sin(pos, rope_dim, theta):
    inv = 1.0 / (theta ** (torch.arange(0, rope_dim, 2, dtype=torch.float64)
                           / rope_dim))
    ang = (pos.to(torch.float64)[:, None] * inv[None]).float()
    return torch.cos(ang), torch.sin(ang)


def rope_rotate_half(x, cos, sin):
    """HF-convention rotate-half; equals half-split rope on concat layout."""
    d = x.shape[-1] // 2
    rot = torch.cat([-x[..., d:], x[..., :d]], -1)
    return x * torch.cat([cos, cos], -1) + rot * torch.cat([sin, sin], -1)


# ---------------------------------------------------------------------------
# independent torch decoder (B=1, full-sequence causal; no KV cache)
# ---------------------------------------------------------------------------

def t_attention(p, pre, cfg, x, pos):
    """x [T, dim], pos [T] absolute positions -> [T, dim]."""
    T = x.shape[0]
    hd, nh, nkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    q = x @ p[f"{pre}.attn_q.weight"].T
    k = x @ p[f"{pre}.attn_k.weight"].T
    v = x @ p[f"{pre}.attn_v.weight"].T
    if f"{pre}.attn_q.bias" in p:
        q, k, v = (q + p[f"{pre}.attn_q.bias"], k + p[f"{pre}.attn_k.bias"],
                   v + p[f"{pre}.attn_v.bias"])
    gate = None
    if cfg.attn_output_gate:
        qg = q.view(T, nh, 2, hd)
        q, gate = qg[:, :, 0].reshape(T, nh * hd), qg[:, :, 1].reshape(T, -1)
    q = q.view(T, nh, hd).transpose(0, 1)          # [nh, T, hd]
    k = k.view(T, nkv, hd).transpose(0, 1)
    v = v.view(T, nkv, hd).transpose(0, 1)
    if cfg.qk_norm == hd:
        q = rms(q, p[f"{pre}.attn_q_norm.weight"], cfg.norm_eps)
        k = rms(k, p[f"{pre}.attn_k_norm.weight"], cfg.norm_eps)
    cos, sin = rope_cos_sin(pos, cfg.rope_dim, cfg.rope_theta)
    q = torch.cat([rope_rotate_half(q[..., :cfg.rope_dim], cos, sin),
                   q[..., cfg.rope_dim:]], -1)
    k = torch.cat([rope_rotate_half(k[..., :cfg.rope_dim], cos, sin),
                   k[..., cfg.rope_dim:]], -1)
    k = k.repeat_interleave(nh // nkv, dim=0)
    v = v.repeat_interleave(nh // nkv, dim=0)
    scores = q @ k.transpose(-1, -2) * hd ** -0.5
    mask = torch.full((T, T), float("-inf")).triu(1)
    out = tF.softmax(scores + mask, -1) @ v        # [nh, T, hd]
    out = out.transpose(0, 1).reshape(T, nh * hd)
    if gate is not None:
        out = out * torch.sigmoid(gate)
    return out @ p[f"{pre}.attn_output.weight"].T


def t_mla(p, pre, cfg, x, pos):
    """Non-absorbed MLA: materialize per-head K/V from the latent, then do
    plain per-head attention (the absorbed trick in models/llm.py must be
    numerically equivalent)."""
    T = x.shape[0]
    nope = cfg.head_dim - cfg.rope_dim
    if cfg.q_lora_rank > 0:
        qa = rms(x @ p[f"{pre}.attn_q_a.weight"].T,
                 p[f"{pre}.attn_q_a_norm.weight"], cfg.norm_eps)
        qp = qa @ p[f"{pre}.attn_q_b.weight"].T
    else:
        qp = x @ p[f"{pre}.attn_q.weight"].T
    q = qp.view(T, cfg.n_heads, cfg.head_dim).transpose(0, 1)  # [H,T,hd]
    cos, sin = rope_cos_sin(pos, cfg.rope_dim, cfg.rope_theta)
    q_nope, q_rope = q[..., :nope], rope_rotate_half(q[..., nope:], cos, sin)

    kv_a = x @ p[f"{pre}.attn_kv_a_mqa.weight"].T          # [T, lora+rope]
    c_kv = rms(kv_a[:, :cfg.kv_lora_rank],
               p[f"{pre}.attn_kv_a_norm.weight"], cfg.norm_eps)
    k_rope = rope_rotate_half(kv_a[:, cfg.kv_lora_rank:], cos, sin)
    mask = torch.full((T, T), float("-inf")).triu(1)
    outs = []
    for h in range(cfg.n_heads):
        k_nope = c_kv @ p[f"{pre}.attn_k_b.weight"][h]     # [T, nope]
        k = torch.cat([k_nope, k_rope], -1)                # [T, hd]
        qh = torch.cat([q_nope[h], q_rope[h]], -1)
        probs = tF.softmax(qh @ k.T * cfg.head_dim ** -0.5 + mask, -1)
        vh = c_kv @ p[f"{pre}.attn_v_b.weight"][h].T       # [T, v_hd]
        outs.append(probs @ vh)
    out = torch.stack(outs, 1).reshape(T, -1)
    return out @ p[f"{pre}.attn_output.weight"].T


def t_ffn(p, pre, cfg, x):
    if cfg.num_experts > 0 and f"{pre}.ffn_gate_exps.weight" in p:
        logits = x @ p[f"{pre}.ffn_gate_inp.weight"].T     # [T, E]
        out = torch.zeros_like(x)
        for ti in range(x.shape[0]):
            if cfg.expert_bias:
                pr = torch.sigmoid(logits[ti])
                sel = torch.topk(pr + p[f"{pre}.exp_probs_b.bias"],
                                 cfg.num_experts_per_tok).indices
                probs = pr[sel]
                if cfg.norm_topk_prob:
                    probs = probs / probs.sum()
            else:
                vals, sel = torch.topk(logits[ti], cfg.num_experts_per_tok)
                probs = tF.softmax(vals, -1) if cfg.norm_topk_prob \
                    else tF.softmax(logits[ti], -1)[sel]
            probs = probs * cfg.routed_scaling_factor
            for j, e in enumerate(sel.tolist()):
                g = tF.silu(p[f"{pre}.ffn_gate_exps.weight"][e] @ x[ti])
                u = p[f"{pre}.ffn_up_exps.weight"][e] @ x[ti]
                out[ti] += probs[j] * (p[f"{pre}.ffn_down_exps.weight"][e]
                                       @ (g * u))
        if f"{pre}.ffn_gate_shexp.weight" in p:
            sh = (tF.silu(x @ p[f"{pre}.ffn_gate_shexp.weight"].T)
                  * (x @ p[f"{pre}.ffn_up_shexp.weight"].T)) \
                @ p[f"{pre}.ffn_down_shexp.weight"].T
            if f"{pre}.ffn_gate_inp_shexp.weight" in p:
                sh = sh * torch.sigmoid(
                    (x * p[f"{pre}.ffn_gate_inp_shexp.weight"])
                    .sum(-1, keepdim=True))
            out = out + sh
        return out
    g = tF.silu(x @ p[f"{pre}.ffn_gate.weight"].T)
    u = x @ p[f"{pre}.ffn_up.weight"].T
    return (g * u) @ p[f"{pre}.ffn_down.weight"].T


class TorchSSM:
    """GatedDeltaNet recurrence, one token per call (model.py:240-295)."""

    def __init__(self, p, pre, cfg):
        self.p, self.pre, self.cfg = p, pre, cfg
        ssm = cfg.ssm
        self.nk, self.nv = ssm.group_count, ssm.time_step_rank
        self.dk, self.dv = ssm.state_size, ssm.inner_size // self.nv
        self.conv_ch = ssm.inner_size + 2 * self.nk * self.dk
        self.window = torch.zeros(ssm.conv_kernel - 1, self.conv_ch)
        self.rec = torch.zeros(self.nv, self.dv, self.dk)

    def __call__(self, x):  # x [dim] -> [dim]
        p, pre, cfg = self.p, self.pre, self.cfg
        nk, nv, dk, dv = self.nk, self.nv, self.dk, self.dv
        out_gate = (x @ p[f"{pre}.attn_gate.weight"].T).view(nv, dv)
        beta = torch.sigmoid(x @ p[f"{pre}.ssm_beta.weight"].T)      # [nv]
        alpha = torch.exp(tF.softplus(x @ p[f"{pre}.ssm_alpha.weight"].T
                                      + p[f"{pre}.ssm_dt.bias"])
                          * p[f"{pre}.ssm_a"])                        # [nv]
        qkv = x @ p[f"{pre}.attn_qkv.weight"].T                       # [conv_ch]
        win = torch.cat([self.window, qkv[None]], 0)   # [K, conv_ch]
        conv = tF.silu((win * p[f"{pre}.ssm_conv1d.weight"].T).sum(0))
        self.window = win[1:]
        qd = nk * dk
        q, k, v = conv[:qd], conv[qd:2 * qd], conv[2 * qd:]

        def l2(u):
            return u / torch.sqrt((u * u).sum(-1, keepdim=True) + 1e-6)

        q = l2(q.view(nk, dk)).repeat(nv // nk, 1) * dk ** -0.5       # [nv,dk]
        k = l2(k.view(nk, dk)).repeat(nv // nk, 1)
        v = v.view(nv, dv)
        rec = self.rec * alpha[:, None, None]
        kv = rec @ k[:, :, None]                                      # [nv,dv,1]
        rec = rec + ((v[:, :, None] - kv) * beta[:, None, None]) \
            @ k[:, None, :]
        self.rec = rec
        core = (rec @ q[:, :, None])[..., 0]                          # [nv,dv]
        core = rms(core, p[f"{pre}.ssm_norm.weight"], cfg.norm_eps)
        return (core * tF.silu(out_gate)).reshape(-1) \
            @ p[f"{pre}.ssm_out.weight"].T


def torch_forward(p, cfg, tokens):
    """Full-prompt forward -> (hidden [T, dim], next-token logits [V])."""
    pos = torch.arange(len(tokens))
    x = p["token_embd.weight"][torch.tensor(tokens)]
    for i in range(cfg.num_blocks):
        bc = cfg.block_cfg(i)
        pre = f"blk.{i}"
        h = rms(x, p[f"{pre}.attn_norm.weight"], cfg.norm_eps)
        if cfg.block_kind(i) == "mla":
            x = x + t_mla(p, pre, bc, h, pos)
        else:
            x = x + t_attention(p, pre, bc, h, pos)
        x = x + t_ffn(p, pre, bc,
                      rms(x, p[f"{pre}.ffn_norm.weight"], cfg.norm_eps))
    hn = rms(x[-1], p["output_norm.weight"], cfg.norm_eps)
    return x, hn @ p["output.weight"].T


def jax_forward(params, cfg, tokens):
    state = llm.init_state(cfg, batch=1)
    freqs = jnp.asarray(llm.precompute_freqs(cfg.rope_dim, cfg.max_context,
                                             cfg.rope_theta))
    hidden, state = llm.forward(params, cfg, state,
                                jnp.asarray([tokens], jnp.int32), 0, freqs)
    lg = llm.logits_at(params, cfg, hidden, len(tokens) - 1)
    return np.asarray(hidden[0]), np.asarray(lg[0]), state, freqs


PROMPT = [1, 5, 9, 13, 2, 7, 11]


def check(cfg, params, rtol=1e-4, atol=1e-5):
    ours_h, ours_lg, _, _ = jax_forward(params, cfg, PROMPT)
    ref_h, ref_lg = torch_forward(tp(params), cfg, PROMPT)
    np.testing.assert_allclose(ours_h, ref_h.numpy(), rtol=rtol, atol=atol)
    np.testing.assert_allclose(ours_lg, ref_lg.numpy(), rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_dense_gqa_parity():
    """Qwen3-style dense: GQA + per-head QK rms-norm + qkv bias + gated
    attention output (attn_output_gate doubles the q projection)."""
    cfg = tiny_cfg(qk_norm=8, qkv_bias=True, attn_output_gate=True)
    params = dict(llm.init_params(cfg, seed=11))
    rng = np.random.default_rng(7)
    for k in list(params):
        if k.endswith((".attn_q.bias", ".attn_k.bias", ".attn_v.bias")):
            params[k] = jnp.asarray(
                rng.normal(0, 0.05, params[k].shape), jnp.float32)
    check(cfg, params)


def test_dense_decode_step_parity():
    """Cache-path check: prefill T=7 then one T=1 decode at start_pos=7 must
    equal the torch full-sequence recompute over 8 tokens (validates cache
    writes, the lower-right causal mask, and decode RoPE positions)."""
    cfg = tiny_cfg(qk_norm=8)
    params = llm.init_params(cfg, seed=12)
    _, _, state, freqs = jax_forward(params, cfg, PROMPT)
    nxt = 3
    hidden, _ = llm.forward(params, cfg, state,
                            jnp.asarray([[nxt]], jnp.int32), len(PROMPT),
                            freqs)
    lg = np.asarray(llm.logits_at(params, cfg, hidden, 0)[0])
    ref_h, ref_lg = torch_forward(tp(params), cfg, PROMPT + [nxt])
    np.testing.assert_allclose(np.asarray(hidden[0, 0]), ref_h[-1].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(lg, ref_lg.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("style", ["qwen_moe", "deepseek_bias"])
def test_moe_parity(style):
    """MoE routing: Qwen-style softmax top-k + gated shared expert, and
    DeepSeek-V3-style sigmoid scoring with a routing bias term + leading
    dense block (block_cfg hidden override)."""
    if style == "qwen_moe":
        cfg = tiny_cfg(num_experts=4, num_experts_per_tok=2,
                       norm_topk_prob=True, shared_expert_dim=16)
    else:
        cfg = tiny_cfg(num_experts=4, num_experts_per_tok=2,
                       norm_topk_prob=True, expert_bias=True,
                       routed_scaling_factor=2.5, leading_dense_blocks=1,
                       dense_hidden_dim=48)
    params = dict(llm.init_params(cfg, seed=13))
    if style == "deepseek_bias":
        rng = np.random.default_rng(5)
        for k in list(params):
            if k.endswith(".exp_probs_b.bias"):
                params[k] = jnp.asarray(
                    rng.normal(0, 0.5, params[k].shape), jnp.float32)
    check(cfg, params)


def test_moe_softmax_all_then_gather_parity():
    """norm_topk_prob=False gathers from the FULL softmax (model.py:108)."""
    cfg = tiny_cfg(num_experts=4, num_experts_per_tok=2,
                   norm_topk_prob=False, shared_expert_dim=16,
                   shared_expert_gate=False)
    check(cfg, llm.init_params(cfg, seed=14))


def test_mla_parity():
    """Latent-absorbed MLA (ours) == materialized per-head K/V (torch)."""
    cfg = tiny_cfg(kv_lora_rank=16, q_lora_rank=24, head_dim=12, rope_dim=4,
                   v_head_dim=8)
    check(cfg, llm.init_params(cfg, seed=15))


def test_mla_no_qlora_parity():
    cfg = tiny_cfg(kv_lora_rank=16, q_lora_rank=0, head_dim=12, rope_dim=4,
                   v_head_dim=8)
    check(cfg, llm.init_params(cfg, seed=16))


def test_ssm_hybrid_parity():
    """GatedDeltaNet + attention hybrid, stepped token-by-token: the torch
    recurrence (explicit python loop, per-head matrix state) must match our
    T=1 forward at every step."""
    ssm = llm.SSMConfig(conv_kernel=3, state_size=8, group_count=2,
                        time_step_rank=4, inner_size=32)
    cfg = tiny_cfg(ssm=ssm, full_attention_interval=2, qk_norm=8)
    params = llm.init_params(cfg, seed=17)
    p = tp(params)
    freqs = jnp.asarray(llm.precompute_freqs(cfg.rope_dim, cfg.max_context,
                                             cfg.rope_theta))
    state = llm.init_state(cfg, batch=1)

    ssm_blocks = {i: TorchSSM(p, f"blk.{i}", cfg)
                  for i in range(cfg.num_blocks) if cfg.block_kind(i) == "ssm"}
    hist: list[int] = []
    for step, tok in enumerate(PROMPT):
        hidden, state = llm.forward(params, cfg, state,
                                    jnp.asarray([[tok]], jnp.int32), step,
                                    freqs)
        hist.append(tok)
        # torch: re-run attention blocks over the whole history, but advance
        # each SSM recurrence by exactly one step
        x = p["token_embd.weight"][torch.tensor(hist)]
        pos = torch.arange(len(hist))
        for i in range(cfg.num_blocks):
            pre = f"blk.{i}"
            h = rms(x, p[f"{pre}.attn_norm.weight"], cfg.norm_eps)
            if cfg.block_kind(i) == "ssm":
                a = torch.zeros_like(x)
                a[-1] = ssm_blocks[i](h[-1])
                # earlier rows only matter through the final row of the next
                # attention block, which re-reads full history — recompute
                # them with a throwaway recurrence replay
                replay = TorchSSM(p, pre, cfg)
                for r in range(len(hist) - 1):
                    a[r] = replay(h[r])
                x = x + a
            else:
                x = x + t_attention(p, pre, cfg, h, pos)
            x = x + t_ffn(p, pre, cfg,
                          rms(x, p[f"{pre}.ffn_norm.weight"], cfg.norm_eps))
        np.testing.assert_allclose(np.asarray(hidden[0, 0]), x[-1].numpy(),
                                   rtol=2e-4, atol=2e-5)
    lg = np.asarray(llm.logits_at(
        params, cfg,
        jnp.asarray(np.asarray(x[-1])[None, None]), 0)[0])
    hn = rms(x[-1], p["output_norm.weight"], cfg.norm_eps)
    np.testing.assert_allclose(lg, (hn @ p["output.weight"].T).numpy(),
                               rtol=2e-4, atol=2e-5)
