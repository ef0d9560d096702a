"""Fused (flash) attention for ViT towers on TPU.

Why: the CLIP ViT-L/14 image tower's XLA attention materializes f32
[B,16,257,257] scores between the QK^T and PV matmuls — ~200 MB of HBM
round-trips per image across 24 layers, measured as the tower's single
biggest gap from speed-of-light (PERF.md "CLIP image tower", round-4
probe: attention stack 27-34% MFU vs the MLP stack's 58-65%). A flash
kernel keeps the online-softmax state in VMEM and never spills scores.

How: the stock Pallas TPU flash kernel (jax.experimental.pallas.ops.tpu.
flash_attention) requires the sequence length to divide its 128-wide
blocks; ViT-L/14 has T=257 (256 patches + cls). We pad Q/K/V to 384 and
mask the pads with SegmentIds (pad tokens live in segment 0, real tokens
in segment 1 — cross-segment pairs are masked inside the kernel), then
slice back to T. Numerics: the kernel's softmax/accumulation is f32, the
same as nn.functional.mha's preferred_element_type — agreement is
verified on the real chip by tests/test_vit_flash.py (cos > 1-1e-5 on
random towers) since Mosaic lowering differences can't be seen in CPU
interpret mode.

Reference behavior mirrored: models/objects.py:21-133 (the reference's
torch CLIP attention — torch materializes scores too; this is a
TPU-native improvement, not a translation).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BLOCK = 128


def use_flash() -> bool:
    """Kernel selection at TRACE time: XLA attention by DEFAULT everywhere;
    the Pallas flash kernel is opt-in via CLEARCAM_VIT_FLASH=1 (the env
    override is unconditional — only set it on TPU; the stock kernel has
    no interpret hook on CPU).

    Measured A/B on the real v5e (round 5, tools/clip_bench, ViT-L/14
    tower end-to-end, /tmp/clipflash.log): XLA 590/537/499 img/s at batch
    16/64/128 vs flash 301/268/261 — the kernel LOSES ~2x on this tower
    (T=257 pads to 384, head_dim 64 half-fills the MXU, and XLA's
    unfused attention overlaps its score traffic behind the MLP matmuls).
    Round 4 wired it default-on from a fused-attention ceiling estimate
    (PERF.md CLIP post-mortem) without this end-to-end A/B; the estimate
    does not survive contact with the actual kernel."""
    import os
    env = os.environ.get("CLEARCAM_VIT_FLASH", "")
    if env in ("0", "1"):
        return env == "1"
    return False


def mha_flash(q, k, v, sm_scale: float | None = None):
    """[B,H,T,D] q,k,v -> [B,H,T,D]; non-causal flash attention with
    T padded to a 128 multiple under the hood. Drop-in for F.mha(q,k,v)
    (no mask) on TPU."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    b, h, t, d = q.shape
    if sm_scale is None:
        sm_scale = float(1.0 / (d ** 0.5))
    tp = -(-t // _BLOCK) * _BLOCK
    pad = tp - t
    if pad:
        cfg = [(0, 0), (0, 0), (0, pad), (0, 0)]
        q, k, v = (jnp.pad(x, cfg) for x in (q, k, v))
    seg = (jnp.arange(tp) < t).astype(jnp.int32)[None].repeat(b, 0)
    blk = min(_BLOCK, tp)
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        # bwd blocks unused for inference but validated by the dataclass
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
        block_q_dq=blk)
    out = flash_attention(q, k, v, segment_ids=SegmentIds(q=seg, kv=seg),
                          causal=False, sm_scale=sm_scale,
                          block_sizes=sizes)
    return out[:, :, :t] if pad else out
