"""Mesh sharding on the 8-virtual-device CPU mesh: dp detect, dp x tp train
step, and ep-sharded MoE LLM prefill (GSPMD collectives)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from clearcam_tpu.models import llm, yolov9
from clearcam_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return pmesh.make_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.shape["data"] * mesh.shape["model"] == 8


def test_sharded_detect_matches_single_device(mesh):
    params = yolov9.init_params("t", seed=0)
    frames = np.random.default_rng(0).integers(
        0, 255, (mesh.shape["data"], 96, 128, 3), np.uint8)
    det, in_spec = pmesh.sharded_detect_fn(mesh, "t", res=64)
    sharded = np.asarray(det(pmesh.replicate(mesh, params),
                             jax.device_put(jnp.asarray(frames), in_spec)))
    single = np.asarray(yolov9.detect(params, jnp.asarray(frames),
                                      size="t", res=64))
    np.testing.assert_allclose(sharded, single, rtol=2e-3, atol=2e-3)


def test_train_step_runs_with_tp(mesh):
    params = pmesh.shard_params_tp(mesh, yolov9.init_params("t", seed=0))
    train_step, opt = pmesh.make_train_step("t", kind="detect")
    opt_state = opt.init(params)
    dp = mesh.shape["data"]
    frames = jax.device_put(
        jnp.asarray(np.random.default_rng(0).uniform(0, 1, (dp, 64, 64, 3)),
                    jnp.float32),
        NamedSharding(mesh, P("data")))
    gt_boxes = jax.device_put(
        jnp.tile(jnp.asarray([[[12.0, 12.0, 44.0, 44.0]]]), (dp, 1, 1)),
        NamedSharding(mesh, P("data")))
    gt_cls = jax.device_put(jnp.zeros((dp, 1), jnp.int32),
                            NamedSharding(mesh, P("data")))
    with mesh:
        p2, _, loss = train_step(params, opt_state, frames, gt_boxes, gt_cls)
    assert np.isfinite(float(loss))
    # weights actually updated
    k = "model.0.conv.weight"
    assert not np.allclose(np.asarray(p2[k]), np.asarray(params[k]))


def test_tp_serving_engine_matches_solo(mesh):
    """Tensor-parallel continuous batching: params tp-sharded + KV cache
    split over the KV-head axis, staggered requests — every request's
    greedy output equals its single-device solo generation."""
    cfg = llm.TransformerConfig(
        num_blocks=2, dim=32, hidden_dim=64, n_heads=4, n_kv_heads=2,
        norm_eps=1e-5, vocab_size=64, head_dim=8, rope_theta=1e4, rope_dim=8,
        v_head_dim=8, max_context=96)
    params = llm.init_params(cfg, seed=4)

    def solo(prompt, n):
        return [t for t in llm.Transformer(params, cfg, seed=0).generate(
            list(prompt), temperature=0.0, max_new=n)]

    eng = pmesh.serving_engine_tp(params, cfg, mesh, n_slots=2)
    # weights and cache really are split over the model axis
    assert eng.params["blk.0.attn_q.weight"].sharding.spec == P("model", None)
    if mesh.shape["model"] > 1:
        assert eng.state[0]["k"].sharding.spec == P(None, "model")
    r1 = eng.submit([1, 2, 3, 4, 5], max_new=6)
    for _ in range(2):
        eng.step()
    r2 = eng.submit([9, 8, 7], max_new=5)    # joins mid-flight
    eng.run_until_idle()
    assert r1.wait(1) == solo([1, 2, 3, 4, 5], 6)
    assert r2.wait(1) == solo([9, 8, 7], 5)


def test_moe_llm_ep_sharding_matches_single(mesh):
    cfg = llm.TransformerConfig(
        num_blocks=2, dim=32, hidden_dim=64, n_heads=4, n_kv_heads=2,
        norm_eps=1e-5, vocab_size=64, head_dim=8, rope_theta=1e4, rope_dim=8,
        v_head_dim=8, max_context=64, num_experts=8, num_experts_per_tok=2,
        norm_topk_prob=True)
    params = llm.init_params(cfg, seed=0)
    tokens = jnp.asarray([[1, 2, 3, 4] + [0] * 28], jnp.int32)
    key = jax.random.PRNGKey(0)

    # single device reference
    pre_ref, _ = llm.make_step_fns(cfg)
    tok_ref, _ = pre_ref(params, llm.init_state(cfg), tokens, 0, jnp.int32(4),
                         jnp.float32(0.0), key)

    sharded = pmesh.shard_llm_params(mesh, params)
    # expert banks really are split over the model axis
    ex = sharded["blk.0.ffn_gate_exps.weight"]
    assert ex.sharding.spec == P("model")
    pre = pmesh.sharded_llm_prefill(mesh, sharded, cfg)
    with mesh:
        tok, _ = pre(llm.init_state(cfg), tokens, 0, jnp.int32(4),
                     jnp.float32(0.0), key)
    assert int(tok[0]) == int(tok_ref[0])
