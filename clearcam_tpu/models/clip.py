"""OpenCLIP ViT-L/14 (laion2B) image + text towers, TPU-native.

Functional re-implementation of the reference's hand-rolled tinygrad CLIP
(models/objects.py:21-186): 24-block/1024-wide image tower (16 heads, 224px,
patch 14, cls token, 257 pos embeddings, final proj to 768) and
12-block/768-wide causal text tower (77 ctx, eot pooling, text_projection),
both emitting L2-normalized 768-d embeddings whose dot product is the search
score.

Layout: NHWC activations, flat param dict keyed like the published
`CLIP-ViT-L-14-laion2B-s32B-b82K.safetensors` (tinygrad attribute names, see
`convert_state_dict`). Both towers are pure functions — jit/vmap/shard as
needed; batched image embedding is the NVR's bulk workload.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import functional as F

IMG_WIDTH, IMG_BLOCKS, IMG_HEADS = 1024, 24, 16
TXT_WIDTH, TXT_BLOCKS, TXT_HEADS = 768, 12, 12
EMBED_DIM = 768
IMG_RES, PATCH = 224, 14
CTX = 77
VOCAB = 49408


def _use_flash() -> bool:
    """Image-tower attention kernel selection (ops/vit_attention.py: the
    flash kernel removes the f32 [B,16,257,257] score HBM round-trip the
    probe measured as the tower's biggest gap — PERF.md CLIP post-mortem)."""
    from ..ops.vit_attention import use_flash
    return use_flash()


def _attn(x, w_in, b_in, w_out, b_out, n_heads, mask=None, flash=False):
    """Fused-qkv multi-head attention on [B,L,D] (torch MHA layout:
    in_proj (3D,D), out_proj (D,D))."""
    qkv = F.linear(x, w_in, b_in)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (F.split_heads(t, n_heads) for t in (q, k, v))
    if flash and mask is None:
        from ..ops.vit_attention import mha_flash
        out = mha_flash(q, k, v)
    else:
        out = F.mha(q, k, v, mask=mask)
    return F.linear(F.merge_heads(out), w_out, b_out)


def encode_image(p: dict, pixels, normalize: bool = True,
                 flash: bool | None = None):
    """uint8/float RGB [B,224,224,3] -> L2-normalized [B,768].

    Preprocess parity with ObjectFinder.preprocess (objects.py:237-242):
    x/255, (x-0.5)/0.5 — fused here so the host ships raw bytes.
    flash: attention kernel override (None = auto, see _use_flash).
    """
    dtype = p["visual_conv1.weight"].dtype      # compute in the weights' dtype
    x = pixels.astype(dtype)
    x = (x / 255.0 - 0.5) / 0.5
    x = F.conv2d(x, p["visual_conv1.weight"], stride=PATCH)      # [B,16,16,1024]
    b = x.shape[0]
    x = x.reshape(b, -1, IMG_WIDTH)                               # [B,256,1024]
    cls = jnp.broadcast_to(p["class_embedding"], (b, 1, IMG_WIDTH))
    x = jnp.concatenate([cls, x], axis=1) + p["positional_embedding"]
    x = F.layer_norm(x, p["ln_pre.weight"], p["ln_pre.bias"])
    if flash is None:
        flash = _use_flash()
    n_blocks = 1 + max(int(k.split(".")[1]) for k in p if k.startswith("resblocks_img."))
    for i in range(n_blocks):
        pre = f"resblocks_img.{i}"
        h = F.layer_norm(x, p[pre + ".ln_1.weight"], p[pre + ".ln_1.bias"])
        x = x + _attn(h, p[pre + ".in_proj_weight"], p[pre + ".in_proj_bias"],
                      p[pre + ".out_proj_weight"], p[pre + ".out_proj_bias"],
                      IMG_HEADS, flash=flash)
        h = F.layer_norm(x, p[pre + ".ln_2.weight"], p[pre + ".ln_2.bias"])
        h = F.linear_p(p, pre + ".mlp_c_fc", h)
        h = jax.nn.gelu(h, approximate=False)
        x = x + F.linear_p(p, pre + ".mlp_c_proj", h)
    x = F.layer_norm(x, p["ln_post.weight"], p["ln_post.bias"])
    emb = x[:, 0, :] @ p["proj"]
    if normalize:
        emb = emb / (jnp.sqrt((emb ** 2).sum(-1, keepdims=True)) + 1e-8)
    return emb


def encode_text(p: dict, tokens, normalize: bool = True):
    """int32 [B,77] padded token ids -> L2-normalized [B,768]. Pools at the
    argmax token id (the eot position, objects.py:183-186)."""
    x = F.embedding(p["token_embedding.weight"], tokens)
    x = x + p["positional_embedding_text"]
    causal = jnp.triu(jnp.full((CTX, CTX), -jnp.inf, jnp.float32), 1)
    n_blocks = 1 + max(int(k.split(".")[1]) for k in p if k.startswith("resblocks."))
    for i in range(n_blocks):
        pre = f"resblocks.{i}"
        h = F.layer_norm(x, p[pre + ".ln_1.weight"], p[pre + ".ln_1.bias"])
        x = x + _attn(h, p[pre + ".in_proj_weight"], p[pre + ".in_proj_bias"],
                      p[pre + ".attn_out_proj_weight"],
                      p[pre + ".attn_out_proj_bias"], TXT_HEADS, mask=causal)
        h = F.layer_norm(x, p[pre + ".ln_2.weight"], p[pre + ".ln_2.bias"])
        h = F.linear_p(p, pre + ".mlp_c_fc", h)
        h = jax.nn.gelu(h, approximate=False)
        x = x + F.linear_p(p, pre + ".mlp_c_proj", h)
    x = F.layer_norm(x, p["ln_final.weight"], p["ln_final.bias"])
    eot = jnp.argmax(tokens, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    emb = pooled @ p["text_projection"]
    if normalize:
        emb = emb / jnp.sqrt((emb ** 2).sum(-1, keepdims=True))
    return emb


def convert_state_dict(sd: dict[str, np.ndarray], dtype=np.float32) -> dict:
    """Published safetensors -> our params (conv OIHW->HWIO; derived buffers
    like attn_mask skipped)."""
    out = {}
    for k, arr in sd.items():
        if k == "attn_mask" or k.endswith("attn_mask"):
            continue
        arr = np.asarray(arr, np.float32)
        if k == "visual_conv1.weight":
            arr = F.oihw_to_hwio(arr)
        out[k] = jnp.asarray(arr, dtype)
    return out


def init_params(seed: int = 0, dtype=np.float32,
                img_blocks: int = IMG_BLOCKS, txt_blocks: int = TXT_BLOCKS) -> dict:
    """Random params (tests / offline). Shapes match the checkpoint."""
    rng = np.random.default_rng(seed)
    p: dict[str, jnp.ndarray] = {}

    def t(key, *shape, scale=0.02):
        p[key] = jnp.asarray(rng.normal(0, scale, shape), dtype)

    def zeros(key, *shape):
        p[key] = jnp.zeros(shape, dtype)

    def ln(prefix, width):
        p[prefix + ".weight"] = jnp.ones((width,), dtype)
        zeros(prefix + ".bias", width)

    t("visual_conv1.weight", PATCH, PATCH, 3, IMG_WIDTH)
    t("class_embedding", IMG_WIDTH)
    t("positional_embedding", 257, IMG_WIDTH)
    ln("ln_pre", IMG_WIDTH); ln("ln_post", IMG_WIDTH)
    t("proj", IMG_WIDTH, EMBED_DIM)
    for i in range(img_blocks):
        pre = f"resblocks_img.{i}"
        ln(pre + ".ln_1", IMG_WIDTH); ln(pre + ".ln_2", IMG_WIDTH)
        t(pre + ".in_proj_weight", 3 * IMG_WIDTH, IMG_WIDTH)
        zeros(pre + ".in_proj_bias", 3 * IMG_WIDTH)
        t(pre + ".out_proj_weight", IMG_WIDTH, IMG_WIDTH)
        zeros(pre + ".out_proj_bias", IMG_WIDTH)
        t(pre + ".mlp_c_fc.weight", 4 * IMG_WIDTH, IMG_WIDTH)
        zeros(pre + ".mlp_c_fc.bias", 4 * IMG_WIDTH)
        t(pre + ".mlp_c_proj.weight", IMG_WIDTH, 4 * IMG_WIDTH)
        zeros(pre + ".mlp_c_proj.bias", IMG_WIDTH)
    t("token_embedding.weight", VOCAB, TXT_WIDTH)
    t("positional_embedding_text", CTX, TXT_WIDTH)
    t("text_projection", TXT_WIDTH, EMBED_DIM)
    ln("ln_final", TXT_WIDTH)
    for i in range(txt_blocks):
        pre = f"resblocks.{i}"
        ln(pre + ".ln_1", TXT_WIDTH); ln(pre + ".ln_2", TXT_WIDTH)
        t(pre + ".in_proj_weight", 3 * TXT_WIDTH, TXT_WIDTH)
        zeros(pre + ".in_proj_bias", 3 * TXT_WIDTH)
        t(pre + ".attn_out_proj_weight", TXT_WIDTH, TXT_WIDTH)
        zeros(pre + ".attn_out_proj_bias", TXT_WIDTH)
        t(pre + ".mlp_c_fc.weight", 3072, TXT_WIDTH)
        zeros(pre + ".mlp_c_fc.bias", 3072)
        t(pre + ".mlp_c_proj.weight", TXT_WIDTH, 3072)
        zeros(pre + ".mlp_c_proj.bias", TXT_WIDTH)
    return p
