"""CLIP image-tower MFU post-mortem probe (stem_probe.py discipline).

Breaks ViT-L/14 into isolated jitted stages and times each with the
queue-drain pattern (inputs staged on device, N calls issued, only the
last read back — CLAUDE.md axon gotchas), so PERF.md's CLIP section can
say WHERE the time goes instead of one host-side img/s number:

  * stem: uint8 preprocess + patch conv + cls/pos (the non-MXU prologue)
  * attn: 24x (LN + fused-qkv MHA + residual) — includes the f32
    [B,16,257,257] score materialization
  * attn_bf16s: same with bf16 scores (halved score-buffer HBM traffic;
    numerics probe only, NOT the production path)
  * mlp: 24x (LN + 1024->4096 GELU MLP + residual) — pure MXU
  * full: the real encode_image

FLOP accounting: ViT-L/14 @224 is ~81 GMACs = **162 GFLOPs**/image
(2 x 304M params x 257 tokens; the oft-quoted "81 GFLOPs" is MACs —
PERF.md round-3 made exactly that 2x error when it called 593 img/s
~23% MFU). MFU here = images/s x 162e9 / 197e12 (v5e bf16 peak).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site \
        python -m clearcam_tpu.tools.clip_probe --batches 16,128
"""
from __future__ import annotations

import argparse
import functools
import json
import time

GF_PER_IMG = 162.0          # 2 * 304M * 257 (see module docstring)
PEAK_TF = 197.0             # v5e bf16


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,128")
    ap.add_argument("--steps", type=int, default=16)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import clip
    from ..nn import functional as F

    p = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                     clip.init_params(seed=0))

    def stem(p, pixels):
        x = (pixels.astype(jnp.bfloat16) / 255.0 - 0.5) / 0.5
        x = F.conv2d(x, p["visual_conv1.weight"], stride=clip.PATCH)
        b = x.shape[0]
        x = x.reshape(b, -1, clip.IMG_WIDTH)
        cls = jnp.broadcast_to(p["class_embedding"], (b, 1, clip.IMG_WIDTH))
        x = jnp.concatenate([cls, x], 1) + p["positional_embedding"]
        return F.layer_norm(x, p["ln_pre.weight"], p["ln_pre.bias"])

    def attn_stack(p, x, bf16_scores=False):
        def _mha(q, k, v):
            s = jnp.matmul(q, k.swapaxes(-1, -2),
                           preferred_element_type=jnp.float32) / np.sqrt(64)
            if bf16_scores:
                s = s.astype(jnp.bfloat16)
            pr = jax.nn.softmax(s, -1).astype(v.dtype)
            return jnp.matmul(pr, v, preferred_element_type=jnp.float32
                              ).astype(v.dtype)
        for i in range(clip.IMG_BLOCKS):
            pre = f"resblocks_img.{i}"
            h = F.layer_norm(x, p[pre + ".ln_1.weight"], p[pre + ".ln_1.bias"])
            qkv = F.linear(h, p[pre + ".in_proj_weight"],
                           p[pre + ".in_proj_bias"])
            q, k, v = (F.split_heads(t, clip.IMG_HEADS)
                       for t in jnp.split(qkv, 3, -1))
            o = F.linear(F.merge_heads(_mha(q, k, v)),
                         p[pre + ".out_proj_weight"],
                         p[pre + ".out_proj_bias"])
            x = x + o
        return x

    def mlp_stack(p, x):
        for i in range(clip.IMG_BLOCKS):
            pre = f"resblocks_img.{i}"
            h = F.layer_norm(x, p[pre + ".ln_2.weight"], p[pre + ".ln_2.bias"])
            h = jax.nn.gelu(F.linear_p(p, pre + ".mlp_c_fc", h),
                            approximate=False)
            x = x + F.linear_p(p, pre + ".mlp_c_proj", h)
        return x

    # every stage is reduced to ONE f32 scalar in-jit: a [B,257,1024]
    # activation output would ride the ~20 MB/s tunnel on the final sync
    # and pollute the per-call time by tens of ms (the first version of
    # this probe made exactly that mistake — same lesson as stem_probe's
    # "accidentally timed a 210 MB readback")
    def scalar(fn):
        return jax.jit(lambda p, x: fn(p, x).astype(jnp.float32).sum())

    stages = {
        "stem": scalar(stem),
        "attn": scalar(attn_stack),
        "attn_bf16s": scalar(functools.partial(attn_stack,
                                               bf16_scores=True)),
        "mlp": scalar(mlp_stack),
        "full": scalar(functools.partial(clip.encode_image, normalize=True,
                                         flash=False)),
        "full_flash": scalar(functools.partial(clip.encode_image,
                                               normalize=True, flash=True)),
    }
    # GF per image per stage (MACs x2): attn qkvo 2.16+scores/pv 0.27,
    # mlp 4.31, per block
    gf = {"stem": 0.31, "attn": 24 * 2.43, "attn_bf16s": 24 * 2.43,
          "mlp": 24 * 4.31, "full": GF_PER_IMG, "full_flash": GF_PER_IMG}

    print(f"# backend {jax.default_backend()}")
    rng = np.random.default_rng(0)
    for bs in (int(b) for b in args.batches.split(",")):
        pix = jax.device_put(jnp.asarray(
            rng.integers(0, 255, (bs, 224, 224, 3), np.uint8)))
        tok = jax.device_put(jnp.asarray(
            rng.normal(0, 1, (bs, 257, clip.IMG_WIDTH)), jnp.bfloat16))
        for name, fn in stages.items():
            x = pix if name in ("stem", "full") else tok
            np.asarray(fn(p, x))               # compile + true sync
            t0 = time.perf_counter()
            out = None
            for _ in range(args.steps):
                out = fn(p, x)
            np.asarray(out)
            dt = (time.perf_counter() - t0) / args.steps
            ips = bs / dt
            print(json.dumps({
                "batch": bs, "stage": name, "ms_per_call": round(dt * 1e3, 2),
                "images_per_s": round(ips, 1),
                "mfu_pct": round(ips * gf[name] / 1e3 / PEAK_TF * 100, 1)}))


if __name__ == "__main__":
    main()
