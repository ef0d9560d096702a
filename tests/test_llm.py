"""LLM runtime: chunked-prefill/cache correctness across block types, GGUF
roundtrip + dequant kernels."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from clearcam_tpu.io import gguf
from clearcam_tpu.models import llm


def tiny_cfg(**kw):
    base = dict(num_blocks=2, dim=32, hidden_dim=64, n_heads=4, n_kv_heads=2,
                norm_eps=1e-5, vocab_size=64, head_dim=8, rope_theta=10000.0,
                rope_dim=8, v_head_dim=8, max_context=64)
    base.update(kw)
    return llm.TransformerConfig(**base)


def greedy(model: llm.Transformer, prompt, n=4):
    out = []
    for tok in model.generate(list(prompt), temperature=0.0, max_new=n):
        out.append(tok)
    return out


def test_chunked_prefill_matches_tokenwise():
    """The fixed-CHUNK masked prefill must produce the same greedy tokens as
    processing the prompt token-by-token (validates cache writes + masks)."""
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=1)
    prompt = [1, 5, 9, 13, 2, 7, 11]

    fast = llm.Transformer(params, cfg, seed=0)
    fast.chunk = 4                      # exercise ragged chunking (4+3)
    out_fast = greedy(fast, prompt)

    slow = llm.Transformer(params, cfg, seed=0)
    slow.chunk = 1
    out_slow = greedy(slow, prompt)
    assert out_fast == out_slow


def test_prefix_cache_reuse():
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=1)
    m = llm.Transformer(params, cfg, seed=0)
    first = greedy(m, [1, 2, 3], n=2)
    # extended prompt sharing the prefix: reusable_prefix skips re-prefill
    toks = [1, 2, 3] + first + [4]
    assert m.reusable_prefix(toks) >= 3
    out = greedy(m, toks, n=2)
    # result must equal a fresh model fed the same prompt
    fresh = llm.Transformer(params, cfg, seed=0)
    assert out == greedy(fresh, toks, n=2)


def test_moe_block():
    cfg = tiny_cfg(num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
                   shared_expert_dim=16)
    params = llm.init_params(cfg, seed=2)
    m = llm.Transformer(params, cfg, seed=0)
    out = greedy(m, [1, 2, 3], n=3)
    assert len(out) == 3 and all(0 <= t < 64 for t in out)


def test_mla_block():
    cfg = tiny_cfg(kv_lora_rank=16, q_lora_rank=24, head_dim=12, rope_dim=4,
                   v_head_dim=8)
    params = llm.init_params(cfg, seed=3)
    m = llm.Transformer(params, cfg, seed=0)
    m.chunk = 4
    a = greedy(m, [1, 2, 3, 4, 5], n=3)
    slow = llm.Transformer(params, cfg, seed=0)
    slow.chunk = 1
    assert a == greedy(slow, [1, 2, 3, 4, 5], n=3)
    # int8 latent cache: same greedy tokens (quant noise << logit gaps)
    q = llm.Transformer(params, cfg, seed=0, kv_quant=True)
    assert q.state[0]["kv"].dtype == jnp.int8
    assert greedy(q, [1, 2, 3, 4, 5], n=3) == a


def test_ssm_block():
    ssm = llm.SSMConfig(conv_kernel=3, state_size=8, group_count=2,
                        time_step_rank=4, inner_size=32)
    cfg = tiny_cfg(ssm=ssm, full_attention_interval=2, qk_norm=8)
    params = llm.init_params(cfg, seed=4)
    assert cfg.block_kind(0) == "ssm" and cfg.block_kind(1) == "attn"
    m = llm.Transformer(params, cfg, seed=0)
    out = greedy(m, [1, 2, 3], n=3)
    assert len(out) == 3
    # the scan prefill (full chunk in one program) must match explicit
    # token-by-token prefill
    ref = llm.Transformer(params, cfg, seed=0)
    ref.chunk = 1
    assert greedy(ref, [1, 2, 3, 4, 5], n=3) == greedy(
        llm.Transformer(params, cfg, seed=0), [1, 2, 3, 4, 5], n=3)
    # prefix divergence resets recurrent state and still matches fresh run
    out2 = greedy(m, [9, 8, 7], n=2)
    fresh = llm.Transformer(params, cfg, seed=0)
    assert out2 == greedy(fresh, [9, 8, 7], n=2)


def test_temperature_sampling_varies():
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=1)
    m = llm.Transformer(params, cfg, seed=0)
    a = greedy(m, [1, 2], n=1)
    m2 = llm.Transformer(params, cfg, seed=0)
    for t in m2.generate([1, 2], temperature=0.0, max_new=1):
        assert [t] == a  # temp 0 deterministic regardless of rng


# ---------------------------------------------------------------------------
# GGUF
# ---------------------------------------------------------------------------

def test_gguf_roundtrip(tmp_path):
    kv = {"general.architecture": "qwen3", "qwen3.block_count": 2,
          "labels": ["a", "b"], "pi": 3.5, "flag": True}
    tensors = {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
               "h": np.ones((2, 2), np.float16)}
    path = tmp_path / "t.gguf"
    gguf.save(path, kv, tensors)
    kv2, t2 = gguf.load(path)
    assert kv2["general.architecture"] == "qwen3"
    assert kv2["labels"] == ["a", "b"] and kv2["flag"] is True
    np.testing.assert_array_equal(t2["w"], tensors["w"])
    assert t2["h"].dtype == np.float16


def test_dequant_q8_0():
    # hand-built block: d=0.5, q = -16..15
    d = np.array([0.5], np.float16).view(np.uint8)
    q = np.arange(-16, 16, dtype=np.int8).view(np.uint8)
    raw = np.concatenate([d, q])
    out = gguf.dequant(raw, 32, 8)
    np.testing.assert_allclose(out, np.arange(-16, 16) * 0.5)


def test_dequant_q4_0():
    # nibbles 0..15 in both halves, d=2 -> (q-8)*2
    d = np.array([2.0], np.float16).view(np.uint8)
    nib = np.arange(16, dtype=np.uint8)
    packed = (nib | (nib << 4)).astype(np.uint8)
    raw = np.concatenate([d, packed])
    out = gguf.dequant(raw, 32, 2)
    expected = np.concatenate([(np.arange(16) - 8) * 2.0] * 2)
    np.testing.assert_allclose(out, expected)


def test_dequant_q5_0():
    # all nibbles = 0, qh bits: element e has high bit e%2 -> value (q-16)*d
    d = np.array([1.0], np.float16).view(np.uint8)
    qh = np.frombuffer(np.uint32(0b10101010101010101010101010101010)
                       .tobytes(), np.uint8)
    qs = np.zeros(16, np.uint8)
    raw = np.concatenate([d, qh, qs])
    out = gguf.dequant(raw, 32, 6)
    expected = np.where(np.arange(32) % 2 == 1, 0.0, -16.0)
    np.testing.assert_allclose(out, expected)


def test_dequant_q6_k():
    # uniform: ql=0, qh=0 -> q=-32; scales=1, d=0.25 -> all -8
    blk = np.zeros(210, np.uint8)
    blk[192:208] = np.ones(16, np.int8).view(np.uint8)
    blk[208:210] = np.array([0.25], np.float16).view(np.uint8)
    out = gguf.dequant(blk, 256, 14)
    np.testing.assert_allclose(out, -8.0)


def test_config_from_gguf_qwen3():
    kv = {"general.architecture": "qwen3", "qwen3.block_count": 2,
          "qwen3.context_length": 128, "qwen3.embedding_length": 32,
          "qwen3.feed_forward_length": 64,
          "qwen3.attention.head_count": 4, "qwen3.attention.head_count_kv": 2,
          "qwen3.attention.layer_norm_rms_epsilon": 1e-6,
          "qwen3.rope.freq_base": 10000.0,
          "tokenizer.ggml.tokens": ["x"] * 64}
    sd = {"blk.0.attn_q_norm.weight": np.ones(8, np.float32)}
    cfg = llm.config_from_gguf(kv, sd, max_context=64)
    assert cfg.num_blocks == 2 and cfg.head_dim == 8 and cfg.qk_norm == 8
    assert cfg.max_context == 64


@pytest.mark.skipif(
    not (os.path.exists("/root/.axon_site")
         and os.environ.get("CLEARCAM_PALLAS_TPU_TEST")),
    reason="real-TPU Pallas check: set CLEARCAM_PALLAS_TPU_TEST=1 (claims a "
           "TPU session; verified passing 2026-08-16)")
def test_pallas_decode_matches_xla_on_tpu():
    """The decode kernel compiled for the REAL TPU (not interpret mode)
    produces the same greedy tokens as the XLA full-cache path."""
    import subprocess
    import sys

    code = (
        "from clearcam_tpu.models import llm\n"
        "cfg = llm.TransformerConfig(num_blocks=2, dim=256, hidden_dim=512,"
        " n_heads=4, n_kv_heads=2, norm_eps=1e-5, vocab_size=512,"
        " head_dim=128, rope_theta=1e4, rope_dim=128, v_head_dim=128,"
        " max_context=512)\n"
        "params = llm.init_params(cfg, seed=5)\n"
        "def greedy(t):\n"
        "    out = []\n"
        "    for tok in t.generate([1,2,3,4], temperature=0.0, max_new=8):\n"
        "        out.append(int(tok))\n"
        "        if len(out) >= 8: break\n"
        "    return out\n"
        "ref = llm.Transformer(params, cfg, seed=0)\n"
        "fast = llm.Transformer(params, cfg, seed=0)\n"
        "fast.prefill_fn, fast.decode_fn = llm.make_step_fns("
        "cfg, use_pallas_decode=True)\n"
        "assert greedy(ref) == greedy(fast)\n"
        "print('PALLAS OK')\n")
    env = dict(os.environ,
               PYTHONPATH="/root/repo:/root/.axon_site")
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=580)
    assert r.returncode == 0 and "PALLAS OK" in r.stdout, r.stdout + r.stderr


def test_pallas_decode_matches_xla():
    """Prefix-aware Pallas decode kernel (interpret mode) produces the same
    greedy tokens as the XLA full-cache path."""
    cfg = tiny_cfg(head_dim=128, rope_dim=128, v_head_dim=128, n_heads=4,
                   n_kv_heads=2, max_context=256)
    params = llm.init_params(cfg, seed=5)
    ref = llm.Transformer(params, cfg, seed=0)
    out_ref = greedy(ref, [1, 2, 3], n=3)

    fast = llm.Transformer(params, cfg, seed=0)
    fast.prefill_fn, fast.decode_fn = llm.make_step_fns(
        cfg, use_pallas_decode=True, interpret=True)
    assert greedy(fast, [1, 2, 3], n=3) == out_ref


def test_spec_lookup_draft_helper():
    toks = [5, 1, 2, 3, 9, 9, 1, 2]
    # tail [1,2] matched at index 1 -> continuation [3,9,9,1]
    assert llm.Transformer._lookup_draft(toks, 4) == [3, 9, 9, 1]
    # shorter continuation pads with its last token
    assert llm.Transformer._lookup_draft([7, 8, 3, 7, 8], 4) == [3, 7, 8, 8]
    assert llm.Transformer._lookup_draft([1, 2, 3], 4) is None


def test_spec_lookup_matches_plain_greedy():
    """Prompt-lookup speculative decoding yields EXACTLY the plain greedy
    tokens (acceptance is vs the verifier's own argmax) while taking fewer
    decode dispatches on repetitive context."""
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=2)
    prompt = [1, 2, 3, 4, 1, 2, 3, 4, 1, 2]
    ref = llm.Transformer(params, cfg, seed=0)
    out_ref = greedy(ref, prompt, n=10)

    spec = llm.Transformer(params, cfg, seed=0, spec_lookup=4)
    calls = {"decode": 0, "verify": 0}
    dec, ver = spec.decode_fn, spec.verify_fn
    spec.decode_fn = lambda *a: calls.__setitem__(
        "decode", calls["decode"] + 1) or dec(*a)
    spec.verify_fn = lambda *a: calls.__setitem__(
        "verify", calls["verify"] + 1) or ver(*a)
    assert greedy(spec, prompt, n=10) == out_ref
    # 10 tokens must not need 10 sequential steps on this repetitive stream
    assert calls["decode"] + calls["verify"] < 10, calls


def test_spec_lookup_disabled_for_ssm():
    """Recurrent state cannot rewind past rejected drafts — spec decoding
    must gate itself off for SSM configs."""
    ssm = llm.SSMConfig(conv_kernel=3, state_size=8, group_count=2,
                        time_step_rank=4, inner_size=32)
    cfg = tiny_cfg(ssm=ssm, full_attention_interval=2, qk_norm=8)
    params = llm.init_params(cfg, seed=1)
    m = llm.Transformer(params, cfg, seed=0, spec_lookup=4)
    assert m.spec_lookup == 0


def test_spec_lookup_composes_with_kv_quant():
    """Speculative verify writes the int8 cache through the same quantize-
    on-write branch — combined mode stays exactly greedy."""
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=2)
    prompt = [1, 2, 3, 4, 1, 2, 3, 4, 1, 2]
    ref = llm.Transformer(params, cfg, seed=0, kv_quant=True)
    spec = llm.Transformer(params, cfg, seed=0, kv_quant=True, spec_lookup=4)
    assert greedy(spec, prompt, n=8) == greedy(ref, prompt, n=8)


def test_generate_batch_matches_solo():
    """Right-aligned batched generation: each row's greedy output equals its
    solo generation (RoPE scores are relative, pad columns masked) — both
    for equal-length and ragged prompts."""
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=4)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [5, 5]]
    solo = [greedy(llm.Transformer(params, cfg, seed=0), p, n=6)
            for p in prompts]
    batched = llm.generate_batch(params, cfg, prompts, max_new=6)
    assert batched == solo


def test_generate_batch_pallas_decode_matches_xla():
    """Batched prefix-aware Pallas decode (per-row live windows over the
    left-pad layout, ops/decode_attention.decode_attention_batch) produces
    exactly the XLA batched path's greedy tokens — which themselves equal
    each row's solo generation (test above)."""
    cfg = tiny_cfg(head_dim=128, rope_dim=128, v_head_dim=128, n_heads=4,
                   n_kv_heads=2, max_context=512)
    params = llm.init_params(cfg, seed=6)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [5, 5]]  # ragged: distinct pads
    ref = llm.generate_batch(params, cfg, prompts, max_new=6,
                             state_dtype=jnp.bfloat16)
    fast = llm.generate_batch(params, cfg, prompts, max_new=6,
                              state_dtype=jnp.bfloat16,
                              use_pallas_decode=True, interpret=True)
    assert fast == ref


def test_decode_attention_batch_matches_dense():
    """Kernel-level check: batched kernel == masked dense attention for
    random per-row windows, including rows whose window starts mid-chunk."""
    import jax
    from clearcam_tpu.ops.decode_attention import decode_attention_batch
    rng = np.random.default_rng(0)
    b_n, h, kvh, s, d = 3, 4, 2, 512, 128
    q = jnp.asarray(rng.standard_normal((b_n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b_n, kvh, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b_n, kvh, s, d)), jnp.float32)
    pos, pads = 300, jnp.asarray([0, 37, 290], jnp.int32)
    out = np.asarray(decode_attention_batch(q, k, v, pos, pads,
                                            interpret=True))
    rep = h // kvh
    qg = np.asarray(q).reshape(b_n, kvh, rep, d) / np.sqrt(d)
    scores = np.einsum("bgrd,bgsd->bgrs", qg, np.asarray(k))
    cols = np.arange(s)[None, None, None, :]
    valid = (cols >= np.asarray(pads)[:, None, None, None]) & (cols <= pos)
    scores = np.where(valid, scores, -np.inf)
    p = jax.nn.softmax(jnp.asarray(scores), -1)
    want = np.einsum("bgrs,bgsd->bgrd", np.asarray(p),
                     np.asarray(v)).reshape(b_n, h, d)
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5)


def test_generate_batch_eos_and_mla():
    cfg = tiny_cfg(kv_lora_rank=16, q_lora_rank=24, head_dim=12, rope_dim=4,
                   v_head_dim=8)
    params = llm.init_params(cfg, seed=3)
    prompts = [[1, 2, 3], [4, 5]]
    solo = [greedy(llm.Transformer(params, cfg, seed=0), p, n=5)
            for p in prompts]
    out = llm.generate_batch(params, cfg, prompts, max_new=5)
    assert out == solo
    # eos truncates per row
    eos = solo[0][1]
    out = llm.generate_batch(params, cfg, prompts, max_new=5, eos_id=eos)
    assert out[0] == solo[0][:2]
    assert len(out[1]) <= 5


def test_kv_quant_state_and_greedy():
    """int8 KV cache (quantize-on-write, dequant-on-read) carries the right
    shapes/dtypes and greedy-decodes the same tokens as the f32 cache on a
    tiny config (quant noise ~0.4% per entry, far under the logit gaps)."""
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=3)
    q = llm.Transformer(params, cfg, seed=0, kv_quant=True)
    assert q.state[0]["k"].dtype == jnp.int8
    assert q.state[0]["k_s"].shape == (1, cfg.n_kv_heads, cfg.max_context)
    ref = llm.Transformer(params, cfg, seed=0)
    assert greedy(q, [1, 2, 3], n=4) == greedy(ref, [1, 2, 3], n=4)


def test_kv_quant_prefix_reuse():
    """Prefix-cache reuse stays exact with the quantized cache (re-used
    entries are the same int8 values either way)."""
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=3)
    m = llm.Transformer(params, cfg, seed=0, kv_quant=True)
    first = greedy(m, [1, 2, 3], n=2)
    toks = [1, 2, 3] + first + [4]
    out = greedy(m, toks, n=2)
    fresh = llm.Transformer(params, cfg, seed=0, kv_quant=True)
    assert out == greedy(fresh, toks, n=2)


def test_kv_quant_pallas_kernel_matches_dequant_reference():
    """decode_attention_q8 (interpret mode) == float attention over the
    explicitly dequantized cache prefix — validates the post-matmul
    score/probability dequant trick and the prefix masking."""
    from clearcam_tpu.ops.decode_attention import decode_attention_q8

    rng = np.random.default_rng(7)
    kvh, s, d, h, pos = 2, 512, 128, 4, 301
    k = rng.normal(size=(kvh, s, d)).astype(np.float32)
    v = rng.normal(size=(kvh, s, d)).astype(np.float32)
    ks = np.maximum(np.abs(k).max(-1), 1e-8) / 127.0
    vs = np.maximum(np.abs(v).max(-1), 1e-8) / 127.0
    kq = np.clip(np.round(k / ks[..., None]), -127, 127).astype(np.int8)
    vq = np.clip(np.round(v / vs[..., None]), -127, 127).astype(np.int8)
    q = rng.normal(size=(h, d)).astype(np.float32)

    out = np.asarray(decode_attention_q8(
        jnp.asarray(q), jnp.asarray(kq), jnp.asarray(ks), jnp.asarray(vq),
        jnp.asarray(vs), pos, interpret=True))

    kd = (kq * ks[..., None])[:, :pos + 1]
    vd = (vq * vs[..., None])[:, :pos + 1]
    q3 = q.reshape(kvh, h // kvh, d) / np.sqrt(d)
    scores = np.einsum("grd,gsd->grs", q3, kd)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("grs,gsd->grd", p, vd).reshape(h, d)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(
    not (os.path.exists("/root/.axon_site")
         and os.environ.get("CLEARCAM_PALLAS_TPU_TEST")),
    reason="real-TPU Pallas check: set CLEARCAM_PALLAS_TPU_TEST=1 (claims a "
           "TPU session)")
def test_kv_quant_pallas_decode_on_tpu():
    """The int8-KV decode kernel compiled for the REAL TPU (Mosaic rules are
    not covered by interpret mode) greedy-decodes like the XLA dequant path."""
    import subprocess
    import sys

    code = (
        "from clearcam_tpu.models import llm\n"
        "cfg = llm.TransformerConfig(num_blocks=2, dim=256, hidden_dim=512,"
        " n_heads=4, n_kv_heads=2, norm_eps=1e-5, vocab_size=512,"
        " head_dim=128, rope_theta=1e4, rope_dim=128, v_head_dim=128,"
        " max_context=512)\n"
        "params = llm.init_params(cfg, seed=5)\n"
        "def greedy(t):\n"
        "    out = []\n"
        "    for tok in t.generate([1,2,3,4], temperature=0.0, max_new=8):\n"
        "        out.append(int(tok))\n"
        "        if len(out) >= 8: break\n"
        "    return out\n"
        "ref = llm.Transformer(params, cfg, seed=0, kv_quant=True)\n"
        "fast = llm.Transformer(params, cfg, seed=0, kv_quant=True,"
        " use_pallas_decode=True)\n"
        "assert greedy(ref) == greedy(fast)\n"
        "print('KVQ8 OK')\n")
    env = dict(os.environ, PYTHONPATH="/root/repo:/root/.axon_site")
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=580)
    assert r.returncode == 0 and "KVQ8 OK" in r.stdout, r.stdout + r.stderr


def test_dequant_q4_k():
    """Hand-built Q4_K block: uniform q=5 nibbles, scales=2/mins=1, d=1,
    dmin=0.5 -> value = 1*2*5 - 0.5*1 = 9.5 everywhere."""
    blk = np.zeros(144, np.uint8)
    blk[0:2] = np.array([1.0], np.float16).view(np.uint8)     # d
    blk[2:4] = np.array([0.5], np.float16).view(np.uint8)     # dmin
    # k-quant 12-byte scale block: bytes 4-7 = sc[0..3] (6-bit), 8-11 =
    # mn[0..3] (6-bit), 12-15 pack the low nibbles of sc[4..7] | mn[4..7]<<4
    blk[4:8] = 2
    blk[8:12] = 1
    blk[12:16] = (2 & 0xF) | ((1 & 0xF) << 4)
    blk[16:144] = 5 | (5 << 4)                 # all nibbles = 5
    out = gguf.dequant(blk, 256, 12)
    np.testing.assert_allclose(out, 9.5)


def test_generate_batch_ssm_matches_solo():
    """Batched generation over a GatedDeltaNet/attention hybrid stack:
    per-row live masking keeps each row's recurrent state bit-identical to
    its solo prefill (left-pad junk never enters the recurrence)."""
    ssm = llm.SSMConfig(conv_kernel=3, state_size=8, group_count=2,
                        time_step_rank=4, inner_size=32)
    cfg = tiny_cfg(ssm=ssm, full_attention_interval=2, qk_norm=8)
    params = llm.init_params(cfg, seed=7)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [5, 5]]
    solo = [greedy(llm.Transformer(params, cfg, seed=0), p, n=5)
            for p in prompts]
    batched = llm.generate_batch(params, cfg, prompts, max_new=5)
    assert batched == solo


def test_generate_batch_ssm_pure_stack():
    """All-SSM stack (no attention interleave): same exactness."""
    ssm = llm.SSMConfig(conv_kernel=4, state_size=8, group_count=2,
                        time_step_rank=4, inner_size=32)
    cfg = tiny_cfg(ssm=ssm, full_attention_interval=10 ** 9, qk_norm=8)
    params = llm.init_params(cfg, seed=8)
    prompts = [[3, 1, 4, 1, 5, 9, 2], [2, 7]]
    solo = [greedy(llm.Transformer(params, cfg, seed=0), p, n=4)
            for p in prompts]
    assert llm.generate_batch(params, cfg, prompts, max_new=4) == solo


def test_generate_batch_pallas_q8_matches_xla():
    """Batched int8-KV Pallas decode == the XLA kv-quant batched path
    (same quantize-on-write cache, so tokens must agree exactly)."""
    cfg = tiny_cfg(head_dim=128, rope_dim=128, v_head_dim=128, n_heads=4,
                   n_kv_heads=2, max_context=512)
    params = llm.init_params(cfg, seed=9)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    ref = llm.generate_batch(params, cfg, prompts, max_new=5, kv_quant=True)
    fast = llm.generate_batch(params, cfg, prompts, max_new=5, kv_quant=True,
                              use_pallas_decode=True, interpret=True)
    assert fast == ref


@pytest.mark.skipif(
    not (os.path.exists("/root/.axon_site")
         and os.environ.get("CLEARCAM_PALLAS_TPU_TEST")),
    reason="real-TPU Pallas check: set CLEARCAM_PALLAS_TPU_TEST=1 (claims a "
           "TPU session)")
def test_generate_batch_pallas_on_tpu():
    """Batched prefix kernel compiled for the REAL TPU: generate_batch with
    use_pallas_decode must emit exactly the XLA batched path's tokens
    (ragged prompts — distinct per-row live windows)."""
    import subprocess
    import sys

    code = (
        "import jax.numpy as jnp\n"
        "from clearcam_tpu.models import llm\n"
        "cfg = llm.TransformerConfig(num_blocks=2, dim=256, hidden_dim=512,"
        " n_heads=4, n_kv_heads=2, norm_eps=1e-5, vocab_size=512,"
        " head_dim=128, rope_theta=1e4, rope_dim=128, v_head_dim=128,"
        " max_context=512)\n"
        "params = llm.init_params(cfg, seed=6)\n"
        "prompts = [[1,2,3,4,5],[9,8,7],[5,5]]\n"
        "ref = llm.generate_batch(params, cfg, prompts, max_new=6,"
        " state_dtype=jnp.bfloat16)\n"
        "fast = llm.generate_batch(params, cfg, prompts, max_new=6,"
        " state_dtype=jnp.bfloat16, use_pallas_decode=True)\n"
        "assert fast == ref, (fast, ref)\n"
        "print('BATCH PALLAS OK')\n")
    env = dict(os.environ,
               PYTHONPATH="/root/repo:/root/.axon_site")
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=580)
    assert r.returncode == 0 and "BATCH PALLAS OK" in r.stdout, \
        r.stdout + r.stderr
