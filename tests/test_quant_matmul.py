"""Weight-only int8 matmul kernel (ops/quant_matmul) + LLM integration.

Kernel correctness is pinned against the explicit dequantize-then-matmul
expression using the SAME quantized integers, so tolerances are matmul
reordering only, not quantization error. The end-to-end test runs a small
transformer twice — dense weights = dequantize(quantized) vs the
QuantLinear pallas path — and compares logits/tokens.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clearcam_tpu.models import llm
from clearcam_tpu.nn import functional as F
from clearcam_tpu.ops.quant_matmul import (GROUP, QuantLinear, QuantLinear4,
                                           quant_linear, quantize_int4,
                                           quantize_int8)


def _ref(x, ql: QuantLinear, b=None):
    y = jnp.matmul(jnp.asarray(x, jnp.float32), ql.dequantize().T)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


@pytest.mark.parametrize("rows", [1, 5, 16, 200])
@pytest.mark.parametrize("shape", [(384, 512), (1000, 1100)])
def test_kernel_matches_dequant_matmul(rows, shape):
    o, i = shape
    rng = np.random.default_rng(0)
    w = rng.normal(size=(o, i)).astype(np.float32)
    x = rng.normal(size=(rows, i)).astype(np.float32)
    ql = quantize_int8(w)
    got = quant_linear(jnp.asarray(x), ql, interpret=True)
    want = _ref(jnp.asarray(x), ql)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_leading_batch_dims_and_bias():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(300, 260)).astype(np.float32)
    x = rng.normal(size=(2, 3, 260)).astype(np.float32)
    b = rng.normal(size=(300,)).astype(np.float32)
    ql = quantize_int8(w)
    got = quant_linear(jnp.asarray(x), ql, jnp.asarray(b), interpret=True)
    want = _ref(jnp.asarray(x), ql, jnp.asarray(b))
    assert got.shape == (2, 3, 300)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_quantization_error_bounded():
    """Per-channel symmetric int8: elementwise error <= scale/2 per weight."""
    rng = np.random.default_rng(2)
    w = rng.normal(size=(64, 128)).astype(np.float32) * \
        rng.uniform(0.1, 10, size=(64, 1)).astype(np.float32)
    ql = quantize_int8(w)
    deq = np.asarray(ql.dequantize())
    scale = np.abs(w).max(1, keepdims=True) / 127.0
    assert (np.abs(deq - w) <= scale / 2 + 1e-7).all()


def test_f_linear_dispatch():
    """F.linear accepts QuantLinear in place of a dense weight."""
    rng = np.random.default_rng(3)
    w = rng.normal(size=(256, 256)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    ql = quantize_int8(w)
    np.testing.assert_allclose(np.asarray(F.linear(x, ql)),
                               np.asarray(_ref(x, ql)), rtol=1e-4, atol=1e-4)


def _tiny_cfg():
    # dim >= 256 so the attention/ffn matmuls cross the quantizer's min_dim
    return llm.TransformerConfig(
        num_blocks=2, dim=256, hidden_dim=512, n_heads=4, n_kv_heads=2,
        norm_eps=1e-5, vocab_size=512, head_dim=64, rope_theta=10000.0,
        rope_dim=64, v_head_dim=64, max_context=128)


def test_llm_decode_quantized_path():
    """Quantized decode == dense decode over dequantize(quantize(W))."""
    cfg = _tiny_cfg()
    params = llm.init_params(cfg, seed=0)
    qparams = llm.quantize_params_int8(params, min_dim=256)
    assert any(isinstance(v, QuantLinear) for v in qparams.values())
    assert not isinstance(qparams["token_embd.weight"], QuantLinear)
    dense = {k: (v.dequantize() if isinstance(v, QuantLinear) else v)
             for k, v in qparams.items()}

    prefill, decode = llm.make_step_fns(cfg)
    key = jax.random.PRNGKey(0)
    toks = jnp.asarray([[5, 7, 11, 13]], jnp.int32)

    outs = {}
    for name, p in [("dense", dense), ("quant", qparams)]:
        state = llm.init_state(cfg)
        tok, state = prefill(p, state, toks, 0, jnp.int32(4),
                             jnp.float32(0.0), key)
        tok2, _ = decode(p, state, tok[None], 4, jnp.float32(0.0), key)
        outs[name] = (int(tok[0]), int(tok2[0]))
    assert outs["dense"] == outs["quant"]


def test_quantize_skips_non_matmul_tensors():
    cfg = _tiny_cfg()
    params = llm.init_params(cfg, seed=1)
    q = llm.quantize_params_int8(params)
    for k, v in q.items():
        if isinstance(v, QuantLinear):
            assert k.endswith(".weight") and k != "token_embd.weight"
            assert min(v.shape) >= 256


@pytest.mark.parametrize("rows", [1, 40])
def test_int4_kernel_matches_dequant_matmul(rows):
    rng = np.random.default_rng(5)
    w = rng.normal(size=(300, 520)).astype(np.float32)
    x = rng.normal(size=(rows, 520)).astype(np.float32)
    ql = quantize_int4(w)
    got = quant_linear(jnp.asarray(x), ql, interpret=True)
    want = jnp.matmul(jnp.asarray(x), ql.dequantize().T)
    assert got.shape == (rows, 300)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_int4_pack_roundtrip_and_group_error():
    """Nibble packing is lossless over the quantized ints; per-group
    symmetric error is bounded by scale/2."""
    rng = np.random.default_rng(6)
    w = rng.normal(size=(256, 2 * GROUP)).astype(np.float32) * \
        rng.uniform(0.1, 10, size=(256, 1)).astype(np.float32)
    ql = quantize_int4(w)
    deq = np.asarray(ql.dequantize())
    g = w.reshape(256, -1, GROUP)
    scale = np.abs(g).max(2, keepdims=True) / 7.0
    assert (np.abs(deq.reshape(256, -1, GROUP) - g) <= scale / 2 + 1e-6).all()


def test_llm_decode_int4_path():
    cfg = _tiny_cfg()
    params = llm.init_params(cfg, seed=7)
    qparams = llm.quantize_params_int4(params)
    assert any(isinstance(v, QuantLinear4) for v in qparams.values())
    assert not any(isinstance(v, QuantLinear) for v in qparams.values())
    dense = {k: (v.dequantize() if hasattr(v, "dequantize") else v)
             for k, v in qparams.items()}
    prefill, decode = llm.make_step_fns(cfg)
    key = jax.random.PRNGKey(0)
    toks = jnp.asarray([[5, 7, 11, 13]], jnp.int32)
    outs = {}
    for name, p in [("dense", dense), ("quant", qparams)]:
        state = llm.init_state(cfg)
        tok, state = prefill(p, state, toks, 0, jnp.int32(4),
                             jnp.float32(0.0), key)
        tok2, _ = decode(p, state, tok[None], 4, jnp.float32(0.0), key)
        outs[name] = (int(tok[0]), int(tok2[0]))
    assert outs["dense"] == outs["quant"]


def test_llm_moe_quantized_path():
    """MoE decode with QuantExpert == dense decode over dequantized experts."""
    from clearcam_tpu.ops.quant_matmul import QuantExpert
    cfg = llm.TransformerConfig(
        num_blocks=2, dim=256, hidden_dim=288, n_heads=4, n_kv_heads=2,
        norm_eps=1e-5, vocab_size=512, head_dim=64, rope_theta=10000.0,
        rope_dim=64, v_head_dim=64, max_context=128, num_experts=4,
        num_experts_per_tok=2, norm_topk_prob=True)
    params = llm.init_params(cfg, seed=4)
    qparams = llm.quantize_params_int8(params)
    assert any(isinstance(v, QuantExpert) for v in qparams.values())
    dense = {k: (v.dequantize() if hasattr(v, "dequantize") else v)
             for k, v in qparams.items()}

    prefill, decode = llm.make_step_fns(cfg)
    key = jax.random.PRNGKey(0)
    toks = jnp.asarray([[5, 7, 11, 13]], jnp.int32)
    outs = {}
    for name, p in [("dense", dense), ("quant", qparams)]:
        state = llm.init_state(cfg)
        tok, state = prefill(p, state, toks, 0, jnp.int32(4),
                             jnp.float32(0.0), key)
        tok2, _ = decode(p, state, tok[None], 4, jnp.float32(0.0), key)
        outs[name] = (int(tok[0]), int(tok2[0]))
    assert outs["dense"] == outs["quant"]


def test_quantlinear_is_a_pytree():
    ql = quantize_int8(np.eye(256, dtype=np.float32))
    leaves = jax.tree_util.tree_leaves(ql)
    assert len(leaves) == 2
    rt = jax.tree_util.tree_map(lambda x: x, ql)
    assert isinstance(rt, QuantLinear) and rt.out_features == 256
