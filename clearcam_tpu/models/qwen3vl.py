"""Qwen3-VL: ViT vision tower (mmproj GGUF) + deepstack-injected language
model, for AI event summaries.

Capability mirror of the reference (llm/qwen3vl.py): letterbox to a fixed
multiple-of-32 resolution, 16px patches with 2x2 spatial merge (one image =
H*W/32^2 tokens), bilinearly-interpolated learned position embeddings, 2D
rotary attention in the vision blocks, deepstack side-features added into the
matching language blocks during the image prefill, multi-image streaming
context with explicit resets, and a 2000-token context budget.

TPU-native design: the vision tower + image prefill is ONE jitted program per
resolution (static grid); the language model is the functional-state decoder
in models/llm.py (hidden_override + deepstack hooks in llm.forward).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import functional as F
from . import llm as llm_mod

TEMP = 0.7
MAX_CONTEXT = 2000


# ---------------------------------------------------------------------------
# static geometry helpers (numpy, trace-time)
# ---------------------------------------------------------------------------

def window_order(gh: int, gw: int, merge: int) -> np.ndarray:
    """Indices mapping row-major patch order -> 2x2-merge-window order."""
    idx = np.arange(gh * gw).reshape(gh, gw)
    idx = idx.reshape(gh // merge, merge, gw // merge, merge)
    return idx.transpose(0, 2, 1, 3).reshape(-1)


def position_ids(gh: int, gw: int, merge: int) -> np.ndarray:
    """[N,2] (h,w) positions in window order (qwen3vl.py:189-194)."""
    hh, ww = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    order = window_order(gh, gw, merge)
    return np.stack([hh.reshape(-1)[order], ww.reshape(-1)[order]], -1)


def bilinear_pos_weights(gh: int, gw: int, grid_side: int, merge: int):
    """(indices [4,N], weights [4,N]) to resample the learned pos-emb grid to
    (gh, gw), in window order (qwen3vl.py:154-187)."""
    hg = np.linspace(0, grid_side - 1, gh)
    wg = np.linspace(0, grid_side - 1, gw)
    hf, wf = hg.astype(int), wg.astype(int)
    hc = np.minimum(hf + 1, grid_side - 1)
    wc = np.minimum(wf + 1, grid_side - 1)
    ha, wa = hg - hf, wg - wf
    idx = np.stack([
        (hf[:, None] * grid_side + wf[None, :]).reshape(-1),
        (hf[:, None] * grid_side + wc[None, :]).reshape(-1),
        (hc[:, None] * grid_side + wf[None, :]).reshape(-1),
        (hc[:, None] * grid_side + wc[None, :]).reshape(-1)])
    wgt = np.stack([
        ((1 - ha)[:, None] * (1 - wa)[None, :]).reshape(-1),
        ((1 - ha)[:, None] * wa[None, :]).reshape(-1),
        (ha[:, None] * (1 - wa)[None, :]).reshape(-1),
        (ha[:, None] * wa[None, :]).reshape(-1)])
    order = window_order(gh, gw, merge)
    return idx[:, order], wgt[:, order].astype(np.float32)


def rotate_half(x):
    d = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d:], x[..., :d]], -1)


# ---------------------------------------------------------------------------
# vision tower
# ---------------------------------------------------------------------------

class VisionTower:
    """Functional ViT from mmproj GGUF metadata + tensors."""

    def __init__(self, kv: dict, params: dict, dtype=jnp.float32):
        self.merge = kv["clip.vision.spatial_merge_size"]
        self.patch = kv["clip.vision.patch_size"]
        self.mean = np.asarray(kv["clip.vision.image_mean"], np.float32)
        self.std = np.asarray(kv["clip.vision.image_std"], np.float32)
        self.n_heads = kv["clip.vision.attention.head_count"]
        self.width = kv["clip.vision.embedding_length"]
        self.merge_dim = kv["clip.vision.feed_forward_length"]
        self.n_blocks = kv["clip.vision.block_count"]
        deep = kv.get("clip.vision.is_deepstack_layers",
                      [False] * self.n_blocks)
        self.deepstack_idx = [i for i, v in enumerate(deep) if v]
        self.grid_side = int(round(
            np.sqrt(params["v.position_embd.weight"].shape[0])))
        self.p = {k: jnp.asarray(np.asarray(v), dtype) for k, v in params.items()}
        # stacked temporal patch filter: (O, C, 2, p, p) -> conv-ready
        w0 = np.asarray(params["v.patch_embd.weight"], np.float32)
        w1 = np.asarray(params["v.patch_embd.weight.1"], np.float32)
        w = np.stack([w0, w1], 2).reshape(w0.shape[0], -1)      # [O, C*2*p*p]
        self.p["_patch_proj"] = jnp.asarray(w.T, dtype)          # [C*2pp, O]

    def patchify(self, img):
        """float [H,W,3] RGB 0..255 -> ([N, C*2*p*p] rows in window order,
        (gh, gw))."""
        h, w = img.shape[:2]
        x = (img / 255.0 - self.mean) / self.std
        gh, gw = h // self.patch, w // self.patch
        m, pt = self.merge, self.patch
        x = x.transpose(2, 0, 1)                                  # [C,H,W]
        x = x.reshape(3, gh // m, m, pt, gw // m, m, pt)
        x = x.transpose(1, 4, 2, 5, 0, 3, 6)                      # gh/m,gw/m,m,m,C,p,p
        x = x[..., None, :, :]                                    # temporal dup
        x = jnp.broadcast_to(x, (*x.shape[:5], 2, pt, pt))
        return x.reshape(gh * gw, -1), (gh, gw)

    def __call__(self, img):
        return self.apply(self.p, img)

    def apply(self, p, img):
        """float [H,W,3] RGB -> (merged image embeds [N/4, lang_dim],
        deepstack features {vision_block_idx order: [N/4, lang_dim]}).
        Takes params explicitly so jitted callers don't bake weights in."""
        rows, (gh, gw) = self.patchify(img)
        x = rows @ p["_patch_proj"] + p["v.patch_embd.bias"]

        idx, wgt = bilinear_pos_weights(gh, gw, self.grid_side, self.merge)
        pos = (p["v.position_embd.weight"][idx] * wgt[:, :, None]).sum(0)
        x = x + pos

        pid = position_ids(gh, gw, self.merge)                    # [N,2]
        inv = 1.0 / (10000.0 ** (np.arange(0, 32, 2, dtype=np.float32) / 32))
        ang = (pid[:, :, None] * inv[None, None]).reshape(len(pid), -1)
        emb = np.concatenate([ang, ang], -1)
        cos = jnp.asarray(np.cos(emb), x.dtype)[:, None, :]
        sin = jnp.asarray(np.sin(emb), x.dtype)[:, None, :]

        deepstack = []
        for i in range(self.n_blocks):
            pre = f"v.blk.{i}"
            h = F.layer_norm_p(p, pre + ".ln1", x, eps=1e-6)
            qkv = F.linear(h, p[pre + ".attn_qkv.weight"],
                           p.get(pre + ".attn_qkv.bias"))
            q, k, v = qkv.reshape(x.shape[0], 3, self.n_heads, -1) \
                .transpose(1, 0, 2, 3)
            q = q * cos + rotate_half(q) * sin
            k = k * cos + rotate_half(k) * sin
            # XLA attention by default: the 640x640 grid is 1600 tokens and
            # the f32 [1,H,1600,1600] scores LOOK like ~164 MB of HBM traffic
            # per block, but measured (tools/vit_flash_ab.py, real v5e) XLA
            # still beats the Pallas flash kernel 1.55x here (2.3x at 448²)
            # — its score round-trips overlap behind the projection/MLP
            # matmuls. CLEARCAM_VIT_FLASH=1 opts into the kernel.
            from ..ops.vit_attention import mha_flash, use_flash
            _mha = mha_flash if use_flash() else F.mha
            out = _mha(q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
                       v.transpose(1, 0, 2)[None])
            out = out[0].transpose(1, 0, 2).reshape(x.shape[0], -1)
            x = x + F.linear(out, p[pre + ".attn_out.weight"],
                             p.get(pre + ".attn_out.bias"))
            h = F.layer_norm_p(p, pre + ".ln2", x, eps=1e-6)
            h = F.linear_p(p, pre + ".ffn_up", h)
            # tanh-approx GELU: the published checkpoints are trained
            # with gelu_pytorch_tanh (HF qwen3_vl config; the reference's
            # Tensor.gelu is the same tanh formula, qwen3vl.py:365)
            h = jax.nn.gelu(h, approximate=True)
            x = x + F.linear_p(p, pre + ".ffn_down", h)
            if i in self.deepstack_idx:
                # reference DeepstackLayer (qwen3vl.py:324-334): view to the
                # fc1 input width (2x2 window merge) -> fc1 -> gelu -> fc2;
                # the norm weights exist in the checkpoint but are NOT applied
                fc1_in = p[f"v.deepstack.{i}.fc1.weight"].shape[1]
                d = F.linear_p(p, f"v.deepstack.{i}.fc1",
                               x.reshape(-1, fc1_in))
                d = F.linear_p(p, f"v.deepstack.{i}.fc2",
                               jax.nn.gelu(d, approximate=True))
                deepstack.append(d)

        x = F.layer_norm_p(p, "v.post_ln", x, eps=1e-6)
        merged = x.reshape(-1, self.merge_dim)            # 2x2 window concat
        merged = F.linear_p(p, "mm.0", merged)
        merged = jax.nn.gelu(merged, approximate=True)
        merged = F.linear_p(p, "mm.2", merged)
        return merged, deepstack

    @staticmethod
    def init_random(n_blocks=2, width=64, heads=1, merge_dim=256,
                    lang_dim=32, grid_side=8, deepstack=(0,), seed=0):
        """Tiny synthetic tower + kv for tests."""
        rng = np.random.default_rng(seed)
        kv = {"clip.vision.spatial_merge_size": 2, "clip.vision.patch_size": 16,
              "clip.vision.image_mean": [0.5] * 3, "clip.vision.image_std": [0.5] * 3,
              "clip.vision.attention.head_count": heads,
              "clip.vision.embedding_length": width,
              "clip.vision.feed_forward_length": merge_dim,
              "clip.vision.block_count": n_blocks,
              "clip.vision.is_deepstack_layers": [i in deepstack
                                                  for i in range(n_blocks)]}
        t = lambda *s: rng.normal(0, 0.05, s).astype(np.float32)  # noqa: E731
        p = {"v.patch_embd.weight": t(width, 3, 16, 16),
             "v.patch_embd.weight.1": t(width, 3, 16, 16),
             "v.patch_embd.bias": np.zeros(width, np.float32),
             "v.position_embd.weight": t(grid_side * grid_side, width),
             "v.post_ln.weight": np.ones(width, np.float32),
             "v.post_ln.bias": np.zeros(width, np.float32),
             "mm.0.weight": t(lang_dim, merge_dim),
             "mm.0.bias": np.zeros(lang_dim, np.float32),
             "mm.2.weight": t(lang_dim, lang_dim),
             "mm.2.bias": np.zeros(lang_dim, np.float32)}
        for i in range(n_blocks):
            pre = f"v.blk.{i}"
            p[pre + ".ln1.weight"] = np.ones(width, np.float32)
            p[pre + ".ln1.bias"] = np.zeros(width, np.float32)
            p[pre + ".ln2.weight"] = np.ones(width, np.float32)
            p[pre + ".ln2.bias"] = np.zeros(width, np.float32)
            p[pre + ".attn_qkv.weight"] = t(3 * width, width)
            p[pre + ".attn_qkv.bias"] = np.zeros(3 * width, np.float32)
            p[pre + ".attn_out.weight"] = t(width, width)
            p[pre + ".attn_out.bias"] = np.zeros(width, np.float32)
            p[pre + ".ffn_up.weight"] = t(4 * width, width)
            p[pre + ".ffn_up.bias"] = np.zeros(4 * width, np.float32)
            p[pre + ".ffn_down.weight"] = t(width, 4 * width)
            p[pre + ".ffn_down.bias"] = np.zeros(width, np.float32)
        for i in deepstack:
            pre = f"v.deepstack.{i}"
            p[pre + ".norm.weight"] = np.ones(merge_dim, np.float32)
            p[pre + ".norm.bias"] = np.zeros(merge_dim, np.float32)
            p[pre + ".fc1.weight"] = t(merge_dim, merge_dim)
            p[pre + ".fc1.bias"] = np.zeros(merge_dim, np.float32)
            p[pre + ".fc2.weight"] = t(lang_dim, merge_dim)
            p[pre + ".fc2.bias"] = np.zeros(lang_dim, np.float32)
        return kv, p


# ---------------------------------------------------------------------------
# full VLM
# ---------------------------------------------------------------------------

class Qwen3VL:
    """VLM wrapper with the reference surface (qwen3vl.py:92-139):
    generate(prompt, image, reset), prewarm(), streaming multi-image context.
    """

    def __init__(self, size: str = "2B", res=(640, 640),
                 weights_dir: str | Path = "weights",
                 lang: llm_mod.Transformer | None = None, tok=None,
                 vision: VisionTower | None = None):
        import math
        self.res = tuple(int(math.ceil(r / 32) * 32) for r in res)
        self.toks_per_img = (self.res[0] * self.res[1]) // (32 * 32)
        self.max_context = MAX_CONTEXT
        weights_dir = Path(weights_dir)
        if lang is None:
            import os
            path = weights_dir / f"Qwen3VL-{size}-Instruct-F16.gguf"
            # CLEARCAM_KV_QUANT=int8: int8 KV cache (half the cache bytes of
            # bf16); CLEARCAM_SPEC_LOOKUP=G: prompt-lookup speculative
            # decoding (exact greedy outputs, fewer decode dispatches).
            # Both compose with the weight quant below.
            lang, kv = llm_mod.Transformer.from_gguf(
                path, self.max_context,
                kv_quant=os.environ.get("CLEARCAM_KV_QUANT") == "int8",
                spec_lookup=int(
                    os.environ.get("CLEARCAM_SPEC_LOOKUP", "0") or 0))
            # serve the language model quantized at rest in HBM (decode is
            # HBM-bound; see ops/quant_matmul): CLEARCAM_LLM_QUANT=int8|int4
            quant = os.environ.get("CLEARCAM_LLM_QUANT", "")
            if quant == "int8":
                lang.quantize_int8()
            elif quant == "int4":
                lang.params = llm_mod.quantize_params_int4(lang.params)
            from ..utils.llm_tokenizer import LLMTokenizer
            tok = LLMTokenizer.from_gguf_kv(kv)
        if vision is None:
            from ..io import gguf
            mk, mt = gguf.load(weights_dir / f"mmproj-Qwen3VL-{size}-Instruct-F16.gguf")
            vision = VisionTower(mk, mt)
        self.lang = lang
        self.tok = tok
        self.vision = vision
        self.start_pos = 0
        self._prefix = tok.encode("<|im_start|>user\n<|vision_start|>")
        self._suffix = tok.encode("<|vision_end|>\n<|im_end|>\n")
        self._freqs = jnp.asarray(llm_mod.precompute_freqs(
            lang.cfg.rope_dim, lang.cfg.max_context, lang.cfg.rope_theta))
        import functools
        self._image_prefill = functools.partial(
            jax.jit(self._image_prefill_impl), self.lang.params, self.vision.p)

    # -- image prefill ------------------------------------------------------

    def _image_prefill_impl(self, p, vp, state, img, start_pos):
        """Vision tower + language prefill with image embeds spliced between
        the vision markers and deepstack adds (qwen3vl.py:259-298). Model
        params (p: language, vp: vision) are jit arguments, not constants."""
        cfg = self.lang.cfg
        embeds, deep = self.vision.apply(vp, img)
        pre = jnp.asarray([self._prefix], jnp.int32)
        suf = jnp.asarray([self._suffix], jnp.int32)
        h_pre = F.embedding(p["token_embd.weight"], pre).astype(jnp.float32)
        h_suf = F.embedding(p["token_embd.weight"], suf).astype(jnp.float32)
        hidden = jnp.concatenate(
            [h_pre, embeds[None].astype(jnp.float32), h_suf], axis=1)
        npre, nimg = len(self._prefix), embeds.shape[0]
        deepstack = {}
        for j, lang_idx in enumerate(self.vision.deepstack_idx):
            d = jnp.zeros_like(hidden)
            d = d.at[:, npre:npre + nimg].set(deep[j][None].astype(jnp.float32))
            deepstack[lang_idx] = d
        _, state = llm_mod.forward(p, cfg, state, None, start_pos, self._freqs,
                                   hidden_override=hidden, deepstack=deepstack)
        return state

    def letterbox(self, image: np.ndarray) -> np.ndarray:
        """Host-side letterbox to self.res (qwen3vl.py:252-256 semantics);
        shared by feed_image and the serving adapter (serving/vlm.py)."""
        import cv2
        th, tw = self.res
        if image.shape[:2] == (th, tw):
            return image
        s = min(tw / image.shape[1], th / image.shape[0])
        r = cv2.resize(image, (int(image.shape[1] * s), int(image.shape[0] * s)))
        top = (th - r.shape[0]) // 2
        left = (tw - r.shape[1]) // 2
        canvas = np.zeros((th, tw, 3), image.dtype)
        canvas[top:top + r.shape[0], left:left + r.shape[1]] = r
        return canvas

    def feed_image(self, image: np.ndarray, reset: bool = False):
        """BGR-agnostic RGB uint8 frame; letterboxed to self.res on host."""
        if reset:
            self.start_pos = 0
            self.lang.state = llm_mod.init_state(self.lang.cfg)
            self.lang._cached_tokens = []
        image = self.letterbox(image)
        self.lang.state = self._image_prefill(
            self.lang.state, jnp.asarray(image, jnp.float32), self.start_pos)
        self.start_pos += self.toks_per_img + len(self._prefix) + len(self._suffix)

    # -- public surface -----------------------------------------------------

    def prewarm(self):
        dummy = np.zeros((*self.res, 3), np.uint8)
        self.feed_image(dummy, reset=True)
        for _ in self.lang.generate(self.tok.encode("warm"), temperature=TEMP,
                                    cache_offset=self.start_pos, max_new=1):
            pass
        self.start_pos = 0
        self.lang.state = llm_mod.init_state(self.lang.cfg)

    def generate(self, prompt: str | None = None, image: np.ndarray | None = None,
                 reset: bool = False, temperature: float = TEMP,
                 max_new: int | None = None) -> str | None:
        if reset and image is None:
            self.start_pos = 0
            self.lang.state = llm_mod.init_state(self.lang.cfg)
        if image is not None:
            self.feed_image(image, reset=reset)
        if prompt is None:
            return None
        toks = self.tok.encode("<|im_start|>user\n" + prompt
                               + "<|im_end|>\n<|im_start|>assistant\n")
        out = []
        for t in self.lang.generate(toks, temperature=temperature,
                                    cache_offset=self.start_pos, max_new=max_new):
            if self.tok.is_end(t):
                break
            out.append(t)
            if self.start_pos + len(toks) + len(out) >= self.max_context:
                break
        self.start_pos += len(toks) + len(out)
        return self.tok.decode(out)
