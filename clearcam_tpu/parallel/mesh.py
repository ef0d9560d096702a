"""Device-mesh scaling for the NVR pipeline.

The reference is single-accelerator (SURVEY.md §2.3); multi-chip scale-out is
new in this framework and follows the GSPMD recipe: build a Mesh, annotate
shardings with NamedSharding, and let XLA insert the collectives over ICI.

Axes:
  data   — camera streams / batch rows (pure data parallel: the NVR's natural
           scaling dimension; detections are per-frame independent)
  model  — tensor parallelism over output channels / hidden units for the big
           towers (CLIP ViT-L, LLM) and for training steps

`sharded_detect` shards the frame batch over `data` and replicates weights
(detect is activation-dominated). `train_step` demonstrates the full dp x tp
layout: batch over `data`, wide parameters split over `model`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None):
    """Build a (data, model) mesh over the first n devices."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    if data is None:
        # favor data parallelism; model axis gets the largest power-of-2 <= 2
        data = n if n % 2 else n // 2
        model = n // data
    else:
        model = n // data
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def shard_batch(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))


def replicate(mesh: Mesh, tree):
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_params_tp(mesh: Mesh, params: dict):
    """Shard conv/linear output channels over `model` where divisible.

    GSPMD then partitions every conv's filter dim and inserts all-gathers /
    reduce-scatters as needed — no hand-written collectives.
    """
    m = mesh.shape["model"]
    out = {}
    for k, v in params.items():
        if v.ndim >= 1 and v.shape[-1] % m == 0 and v.shape[-1] >= m * 8:
            spec = P(*([None] * (v.ndim - 1) + ["model"]))
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def sharded_detect_fn(mesh: Mesh, size: str = "t", res: int = 640, **kw):
    """jit a detect step with batch sharded over `data`, output likewise."""
    from ..models import yolov9

    in_spec = NamedSharding(mesh, P("data"))
    out_spec = NamedSharding(mesh, P("data"))

    @jax.jit
    def step(params, frames):
        out = yolov9.detect(params, frames, size=size, res=res, **kw)
        return jax.lax.with_sharding_constraint(out, out_spec)

    return step, in_spec


def shard_llm_params(mesh: Mesh, params: dict):
    """LLM sharding: MoE expert banks expert-parallel over `model` (each chip
    holds E/model experts; GSPMD turns the per-token expert gather into the
    all-to-all), attention/FFN projections tensor-parallel on the output dim,
    embeddings replicated."""
    m = mesh.shape["model"]
    out = {}
    for k, v in params.items():
        if ".ffn_gate_exps." in k or ".ffn_up_exps." in k or ".ffn_down_exps." in k:
            spec = P("model") if v.shape[0] % m == 0 else P()
        elif v.ndim == 2 and v.shape[0] % m == 0 and v.shape[0] >= m * 8 \
                and not k.startswith(("token_embd", "output")):
            spec = P("model", None)
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def shard_llm_state(mesh: Mesh, cfg, state: list) -> list:
    """Shard a decode/serving KV cache over the `model` axis: attention
    K/V (and their int8 scales) split on the KV-head dim when divisible —
    the cache is usually the largest live buffer in serving, so tp splits
    its HBM footprint alongside the weights. MLA latents (single shared
    head) and SSM states replicate."""
    m = mesh.shape["model"]
    out = []
    for i, s in enumerate(state):
        shard_heads = cfg.block_kind(i) == "attn" and cfg.n_kv_heads % m == 0

        def put(a, _sh=shard_heads):
            spec = (P(None, "model") if _sh and a.ndim >= 2
                    and a.shape[1] == cfg.n_kv_heads else P())
            return jax.device_put(a, NamedSharding(mesh, spec))

        out.append(jax.tree.map(put, s))
    return out


def serving_engine_tp(params: dict, cfg, mesh: Mesh, **engine_kw):
    """Tensor-parallel continuous-batching serving: one ServingEngine
    whose params are tp/ep-sharded (shard_llm_params) and whose KV cache
    is split over the KV-head axis (shard_llm_state). The engine's two
    graphs (prefill_slot / decode_all) GSPMD-partition over ICI — the
    scheduler is unchanged, only array placement differs. The TPU-native
    scale-out for serving models larger than one chip's HBM (reference
    has no analogue; its LLM is single-device, utils/model.py)."""
    from ..serving import ServingEngine
    eng = ServingEngine(shard_llm_params(mesh, params), cfg, **engine_kw)
    eng.state = shard_llm_state(mesh, cfg, eng.state)
    return eng


def sharded_llm_prefill(mesh: Mesh, params: dict, cfg):
    """Batch-dp + tp/ep jitted prefill step for the LLM."""
    from ..models import llm

    freqs = jnp.asarray(
        llm.precompute_freqs(cfg.rope_dim, cfg.max_context, cfg.rope_theta))

    @jax.jit
    def prefill(params_, state, tokens, start_pos, n_real, temperature, key):
        hidden, state = llm.forward(params_, cfg, state, tokens, start_pos, freqs)
        logits = llm.logits_at(params_, cfg, hidden, n_real - 1)
        return llm.sample_gumbel(logits, temperature, key), state

    return functools.partial(prefill, params)


# ---------------------------------------------------------------------------
# training step (dp x tp) — used by the multichip dryrun and for fine-tuning
# ---------------------------------------------------------------------------

def make_train_step(size: str = "t", lr: float = 1e-3, kind: str = "detect"):
    """A full optimizer step on YOLOv9.

    kind="detect": the real fine-tuning objective (TAL assignment + CIoU +
    BCE, models/yolo_loss.py) — step(params, opt_state, frames, gt_boxes,
    gt_cls). kind="distill": MSE against a target raw head tensor —
    step(params, opt_state, frames, targets). Params may carry any
    NamedSharding (tp over `model`); the batch rides `data`. XLA derives the
    collectives (psum for grads across data, all-gathers for tp) from the
    shardings.
    """
    from ..models import yolov9

    if kind == "detect":
        from ..models import yolo_loss
        return yolo_loss.make_finetune_step(size, lr)

    opt = optax.sgd(lr)

    def loss_fn(params, frames, targets):
        raw = yolov9.forward_raw(params, frames, size)
        return jnp.mean((raw - targets) ** 2)

    @jax.jit
    def train_step(params, opt_state, frames, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, frames, targets)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, opt
