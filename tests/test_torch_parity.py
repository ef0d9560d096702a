"""Cross-framework numeric parity: run the same weights through independent
torch (CPU) reimplementations of the reference architectures and through our
JAX graphs; outputs must agree. This catches layout/padding/activation
mistakes that shape tests cannot (the tinygrad reference itself is not
installable here; torch reproduces the same module semantics the reference
mirrors)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from clearcam_tpu.models import clip, yolov9  # noqa: E402
from clearcam_tpu.nn import functional as F  # noqa: E402


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def hwio_to_oihw(w):
    return t(np.transpose(np.asarray(w), (3, 2, 0, 1)))


# ---------------------------------------------------------------------------
# primitive parity
# ---------------------------------------------------------------------------

def test_conv_silu_parity():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    w = rng.normal(size=(3, 3, 8, 12)).astype(np.float32) * 0.1
    b = rng.normal(size=(12,)).astype(np.float32)
    ours = np.asarray(F.silu(F.conv2d(jnp.asarray(x), jnp.asarray(w),
                                      jnp.asarray(b), stride=2, padding=1)))
    ref = tF.silu(tF.conv2d(t(x).permute(0, 3, 1, 2), hwio_to_oihw(w), t(b),
                            stride=2, padding=1)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("hw", [(1080, 1920), (720, 1280), (540, 960)])
def test_letterbox_resize_parity(hw):
    """letterbox must reproduce the reference's plain bilinear interpolate
    (utils/helpers.py:127-131: mode='linear', align_corners=False, NO
    antialias) — including the integer-downscale fast paths (1080p->640 is a
    pure k=3 pixel tap, 720p->640 a k=2 2x2 average)."""
    from clearcam_tpu.ops.image import letterbox, letterbox_plan
    h, w = hw
    rng = np.random.default_rng(3)
    f = rng.integers(0, 255, (2, h, w, 3), np.uint8)
    got = np.asarray(letterbox(jnp.asarray(f), 640))
    new_w, new_h, pl, pt, ow, oh, _ = letterbox_plan((h, w), 640)
    x = t(f[..., ::-1].astype(np.float32)).permute(0, 3, 1, 2) / 255.0
    x = tF.interpolate(x, size=(new_h, new_w), mode="bilinear",
                       align_corners=False)
    ref = tF.pad(x, (pl, ow - new_w - pl, pt, oh - new_h - pt)) \
        .permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_pool_parity():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 9, 9, 4)).astype(np.float32)
    ours = np.asarray(F.max_pool2d(jnp.asarray(x), 3, 2, 1))
    ref = tF.max_pool2d(t(x).permute(0, 3, 1, 2), 3, 2, 1) \
        .permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    ours = np.asarray(F.avg_pool2d(jnp.asarray(x), 2, 1, 0))
    ref = tF.avg_pool2d(t(x).permute(0, 3, 1, 2), 2, 1, 0) \
        .permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


# ---------------------------------------------------------------------------
# YOLOv9-t full forward vs torch reimplementation
# ---------------------------------------------------------------------------

def torch_conv(p, pre, x, s=1, pad=None, groups=1, act=True):
    w = hwio_to_oihw(p[pre + ".weight"])
    if pad is None:
        pad = w.shape[2] // 2
    b = t(p[pre + ".bias"]) if pre + ".bias" in p else None
    y = tF.conv2d(x, w, b, stride=s, padding=pad, groups=groups)
    return tF.silu(y) if act else y


def torch_repncsp(p, pre, x, n):
    x1 = torch_conv(p, pre + ".cv1.conv", x)
    for i in range(n):
        bp = f"{pre}.m.{i}"
        x1 = x1 + torch_conv(p, bp + ".cv2.conv", torch_conv(p, bp + ".cv1.conv", x1))
    x3 = torch_conv(p, pre + ".cv2.conv", x)
    return torch_conv(p, pre + ".cv3.conv", torch.cat([x1, x3], 1))


def torch_yolo_t(p, x):
    """Independent NCHW implementation of the t-graph (layers 0..22)."""
    def elan1(pre, x):
        y = torch_conv(p, pre + ".cv1.conv", x)
        c = y.shape[1] // 2
        y0, y1 = y[:, :c], y[:, c:]
        y2 = torch_conv(p, pre + ".cv2.conv", y1)
        y3 = torch_conv(p, pre + ".cv3.conv", y2)
        return torch_conv(p, pre + ".cv4.conv", torch.cat([y0, y1, y2, y3], 1))

    def repelan(pre, x, n):
        y = torch_conv(p, pre + ".cv1.conv", x)
        c = y.shape[1] // 2
        y0, y1 = y[:, :c], y[:, c:]
        y2 = torch_conv(p, pre + ".cv2.1.conv", torch_repncsp(p, pre + ".cv2.0", y1, n))
        y3 = torch_conv(p, pre + ".cv3.1.conv", torch_repncsp(p, pre + ".cv3.0", y2, n))
        return torch_conv(p, pre + ".cv4.conv", torch.cat([y0, y1, y2, y3], 1))

    def aconv(pre, x):
        x = tF.avg_pool2d(x, 2, 1, 0, count_include_pad=True)
        return torch_conv(p, pre + ".cv1.conv", x, s=2, pad=1)

    def sppelan(pre, x):
        y = [torch_conv(p, pre + ".cv1.conv", x)]
        for _ in range(3):
            y.append(tF.max_pool2d(y[-1], 5, 1, 2))
        return torch_conv(p, pre + ".cv5.conv", torch.cat(y, 1))

    y = {}
    x = torch_conv(p, "model.0.conv", x, s=2, pad=1)
    x = torch_conv(p, "model.1.conv", x, s=2, pad=1)
    y[2] = x = elan1("model.2", x)
    x = aconv("model.3", x)
    y[4] = x = repelan("model.4", x, 3)
    x = aconv("model.5", x)
    y[6] = x = repelan("model.6", x, 3)
    x = aconv("model.7", x)
    x = repelan("model.8", x, 3)
    y[9] = x = sppelan("model.9", x)
    x = tF.interpolate(x, scale_factor=2, mode="nearest")
    x = torch.cat([x, y[6]], 1)
    y[12] = x = repelan("model.12", x, 3)
    x = tF.interpolate(x, scale_factor=2, mode="nearest")
    x = torch.cat([x, y[4]], 1)
    y[15] = x = repelan("model.15", x, 3)
    x = aconv("model.16", y[15])
    x = torch.cat([x, y[12]], 1)
    y[18] = x = repelan("model.18", x, 3)
    x = aconv("model.19", x)
    x = torch.cat([x, y[9]], 1)
    y[21] = repelan("model.21", x, 3)

    outs = []
    for i, src in enumerate((15, 18, 21)):
        f = y[src]
        bb = torch_conv(p, f"model.22.cv2.{i}.0.conv", f)
        bb = torch_conv(p, f"model.22.cv2.{i}.1.conv", bb, groups=4)
        bb = torch_conv(p, f"model.22.cv2.{i}.2", bb, act=False, pad=0, groups=4)
        cc = torch_conv(p, f"model.22.cv3.{i}.0.conv", f)
        cc = torch_conv(p, f"model.22.cv3.{i}.1.conv", cc)
        cc = torch_conv(p, f"model.22.cv3.{i}.2", cc, act=False, pad=0)
        o = torch.cat([bb, cc], 1)
        outs.append(o.flatten(2))
    cat = torch.cat(outs, 2)                       # [B, 144, N]
    box, cls = cat[:, :64], cat[:, 64:]
    b, _, n = box.shape
    dist = box.reshape(b, 4, 16, n).softmax(2)
    w = t(p["model.22.dfl.conv.weight"]).reshape(1, 1, 16, 1)
    dist = (dist * w).sum(2)                       # [B, 4, N]
    return dist, torch.sigmoid(cls)


@pytest.mark.parametrize("res", [128])
def test_yolov9_t_full_forward_parity(res):
    params = yolov9.init_params("t", seed=7)
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (1, res, res, 3)).astype(np.float32)

    ours = np.asarray(yolov9.forward_raw(params, jnp.asarray(img), "t"))
    p_np = {k: np.asarray(v) for k, v in params.items()}
    with torch.no_grad():
        dist, cls = torch_yolo_t(p_np, t(img).permute(0, 3, 1, 2))

    # compare the DFL distances + class probabilities (anchors/strides are
    # applied after; dist2bbox is exercised by unit tests elsewhere)
    from clearcam_tpu.models.yolov9 import _make_anchors
    shapes = [(res // s, res // s) for s in (8, 16, 32)]
    anchors, strides = _make_anchors(shapes)
    np.testing.assert_allclose(ours[0, :, 4:], cls[0].T.numpy(),
                               rtol=2e-3, atol=2e-4)
    d = dist[0].T.numpy()
    # rebuild boxes from the torch distances and compare end to end
    x1y1 = anchors - d[:, :2]
    x2y2 = anchors + d[:, 2:]
    c = (x1y1 + x2y2) / 2 * strides[:, None]
    s_wh = (x2y2 - x1y1) * strides[:, None]
    np.testing.assert_allclose(ours[0, :, :2], c, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours[0, :, 2:4], s_wh, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# CLIP attention block vs torch MHA
# ---------------------------------------------------------------------------

def test_clip_text_tower_parity():
    p = clip.init_params(seed=3, img_blocks=1, txt_blocks=2)
    toks = np.zeros((1, 77), np.int32)
    toks[0, :5] = [49406, 10, 20, 30, 49407]
    ours = np.asarray(clip.encode_text(p, jnp.asarray(toks)))

    pn = {k: np.asarray(v) for k, v in p.items()}
    x = t(pn["token_embedding.weight"])[torch.from_numpy(toks.astype(np.int64))]
    x = x + t(pn["positional_embedding_text"])
    mask = torch.full((77, 77), float("-inf")).triu(1)
    with torch.no_grad():
        for i in range(2):
            pre = f"resblocks.{i}"
            h = tF.layer_norm(x, (768,), t(pn[pre + ".ln_1.weight"]),
                              t(pn[pre + ".ln_1.bias"]))
            attn, _ = torch.nn.functional.multi_head_attention_forward(
                h.transpose(0, 1), h.transpose(0, 1), h.transpose(0, 1),
                768, 12, t(pn[pre + ".in_proj_weight"]),
                t(pn[pre + ".in_proj_bias"]),
                None, None, False, 0.0,
                t(pn[pre + ".attn_out_proj_weight"]),
                t(pn[pre + ".attn_out_proj_bias"]),
                need_weights=False, attn_mask=mask)
            x = x + attn.transpose(0, 1)
            h = tF.layer_norm(x, (768,), t(pn[pre + ".ln_2.weight"]),
                              t(pn[pre + ".ln_2.bias"]))
            h = tF.linear(h, t(pn[pre + ".mlp_c_fc.weight"]),
                          t(pn[pre + ".mlp_c_fc.bias"]))
            h = tF.gelu(h)
            h = tF.linear(h, t(pn[pre + ".mlp_c_proj.weight"]),
                          t(pn[pre + ".mlp_c_proj.bias"]))
            x = x + h
        x = tF.layer_norm(x, (768,), t(pn["ln_final.weight"]),
                          t(pn["ln_final.bias"]))
        pooled = x[0, toks[0].argmax()]
        ref = pooled @ t(pn["text_projection"])
        ref = (ref / ref.norm()).numpy()
    np.testing.assert_allclose(ours[0], ref, rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# BlazeFace backbone + AdaFace block vs torch
# ---------------------------------------------------------------------------

def _torch_blazeface_forward(pn, x):
    """Reference-structured torch forward (models/blazeface.py:90-137):
    returns (raw regressors [1,896,16], classifier logits [1,896,1])."""
    from clearcam_tpu.models import blazeface

    def conv(pre, x, s=1, pad=0, groups=1):
        return tF.conv2d(x, hwio_to_oihw(pn[pre + ".weight"]),
                         t(pn[pre + ".bias"]), stride=s, padding=pad,
                         groups=groups)

    with torch.no_grad():
        h = tF.pad(t(x).permute(0, 3, 1, 2), (1, 2, 1, 2))
        h = tF.relu(conv("conv_tiny", h, s=2))
        for i in range(31):
            s_, cin, cout = blazeface._block_dims(i)
            if s_ == 2:
                b = tF.pad(h, (0, 2, 0, 2))
                h2 = conv(f"backbone_tiny.{i}.conv0_tiny", b, s=2, groups=cin)
                h = tF.max_pool2d(h, 2, 2)
            else:
                h2 = conv(f"backbone_tiny.{i}.conv0_tiny", h, pad=1, groups=cin)
            h2 = conv(f"backbone_tiny.{i}.conv1_tiny", h2)
            if cout > cin:
                h = tF.pad(h, (0, 0, 0, 0, 0, cout - cin))
            h = tF.relu(h + h2)
        fin = tF.pad(h, (0, 2, 0, 2))
        fin = conv("final.conv0_tiny", fin, s=2, groups=96)
        fin = tF.relu(conv("final.conv1_tiny", fin))
        c1 = conv("classifier_8_tiny", h).permute(0, 2, 3, 1).reshape(1, -1, 1)
        c2 = conv("classifier_16_tiny", fin).permute(0, 2, 3, 1).reshape(1, -1, 1)
        r1 = conv("regressor_8_tiny", h).permute(0, 2, 3, 1).reshape(1, -1, 16)
        r2 = conv("regressor_16_tiny", fin).permute(0, 2, 3, 1).reshape(1, -1, 16)
        ref_r = torch.cat([r1, r2], 1).numpy()
        ref_c = torch.cat([c1, c2], 1).numpy()
    return ref_r, ref_c


def test_blazeface_forward_parity():
    from clearcam_tpu.models import blazeface
    p = blazeface.init_params(seed=9)
    pn = {k: np.asarray(v) for k, v in p.items()}
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 256, 256, 3)).astype(np.float32)

    ours_r, ours_c = blazeface.forward(p, jnp.asarray(x))
    ref_r, ref_c = _torch_blazeface_forward(pn, x)
    # random unnormalized weights blow activations up to ~1e4 through 31
    # residual ReLU blocks; conv accumulation order then costs ~1% relative.
    # A layout/padding bug would mismatch everywhere at order-1 error.
    np.testing.assert_allclose(np.asarray(ours_r), ref_r, rtol=3e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(ours_c), ref_c, rtol=3e-2, atol=1e-2)


def test_blazeface_real_weight_parity():
    """Forward parity under the PUBLISHED checkpoint the reference ships
    in-repo (models/blazeface.safetensors, loaded at blazeface.py:137).
    Real trained weights keep activations bounded, so tolerances tighten
    ~300x vs the synthetic test above — and real weights exercise the actual
    key-name conversion + OIHW->HWIO transpose on every tensor."""
    from clearcam_tpu.models import blazeface
    from clearcam_tpu.tools.parity import resolve_fixture, synthetic_face

    ckpt = resolve_fixture("blazeface.safetensors")
    if ckpt is None:
        pytest.skip("blazeface.safetensors not in weights/ or snapshot")
    from clearcam_tpu.io import safetensors as st
    p = blazeface.convert_state_dict(st.load(ckpt))
    pn = {k: np.asarray(v) for k, v in p.items()}
    x = (synthetic_face().astype(np.float32) / 127.5 - 1.0)[None]

    ours_r, ours_c = blazeface.forward(p, jnp.asarray(x))
    ref_r, ref_c = _torch_blazeface_forward(pn, x)
    np.testing.assert_allclose(np.asarray(ours_r), ref_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_c), ref_c, rtol=1e-4, atol=1e-4)


def _torch_adaface_forward(pn, faces, blocks):
    """Reference-structured torch IR-50 forward (models/adaface.py:24-100):
    uint8 RGB [B,112,112,3] -> L2-normalized [B,512] embedding."""

    def bn(pre, x):
        return tF.batch_norm(x, t(pn[pre + ".running_mean"]),
                             t(pn[pre + ".running_var"]),
                             t(pn[pre + ".weight"]), t(pn[pre + ".bias"]),
                             False, 0.0, 1e-5)

    def prelu(x, w):
        return tF.prelu(x, t(w))

    with torch.no_grad():
        x = (t(faces.astype(np.float32)).permute(0, 3, 1, 2) / 255 - 0.5) / 0.5
        x = tF.conv2d(x, hwio_to_oihw(pn["conv0.weight"]), padding=1)
        x = prelu(bn("bn0", x), pn["prelu_weight"])
        for i, (cin, depth, stride) in enumerate(blocks):
            pre = f"body.{i}"
            if depth == cin:
                sc = tF.max_pool2d(x, 1, stride) if stride > 1 else x
            else:
                sc = tF.conv2d(x, hwio_to_oihw(pn[pre + ".shortcut_layer0.weight"]),
                               stride=stride)
                sc = bn(pre + ".shortcut_layer1", sc)
            h = bn(pre + ".res_layer0", x)
            h = tF.conv2d(h, hwio_to_oihw(pn[pre + ".conv_layer0.weight"]), padding=1)
            h = prelu(bn(pre + ".res_layer1", h), pn[pre + ".prelu_weight"])
            h = tF.conv2d(h, hwio_to_oihw(pn[pre + ".conv_layer1.weight"]),
                          stride=stride, padding=1)
            x = bn(pre + ".res_layer2", h) + sc
        x = bn("bn", x)
        x = x.flatten(1)                    # NCHW flatten = channel-major
        x = tF.linear(x, t(pn["linear.weight"]), t(pn["linear.bias"]))
        x = (x - t(pn["bn2.running_mean"])) / torch.sqrt(
            t(pn["bn2.running_var"]) + 1e-5)
        return (x / x.norm(dim=-1, keepdim=True)).numpy()


def test_adaface_block_parity():
    from clearcam_tpu.models import adaface
    p = adaface.init_params(seed=11, blocks=adaface.BLOCKS_MINI)
    pn = {k: np.asarray(v) for k, v in p.items()}
    rng = np.random.default_rng(5)
    faces = rng.integers(0, 255, (1, 112, 112, 3)).astype(np.uint8)
    ours = np.asarray(adaface.embed(p, jnp.asarray(faces)))
    ref = _torch_adaface_forward(pn, faces, adaface.BLOCKS_MINI)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


def test_adaface_ir50_full_forward_parity():
    """The FULL 24-block IR-50 stack (reference models/adaface.py:63:
    `sizes`), batch 2 — every residual unit, both shortcut kinds, all four
    stage transitions, flatten order, affine-free bn2, final normalize.
    He-initialized weights with unit BN stats keep activations bounded
    through the residual chain, so the normalized embedding agrees to 1e-4:
    a transposed filter, wrong PReLU slope, or off-by-one stride anywhere in
    the 50 layers mismatches at order 1."""
    from clearcam_tpu.models import adaface
    p = adaface.init_params(seed=3)                      # full BLOCKS
    pn = {k: np.asarray(v) for k, v in p.items()}
    rng = np.random.default_rng(6)
    faces = rng.integers(0, 255, (2, 112, 112, 3)).astype(np.uint8)
    ours = np.asarray(adaface.embed(p, jnp.asarray(faces)))
    ref = _torch_adaface_forward(pn, faces, adaface.BLOCKS)
    assert ours.shape == ref.shape == (2, 512)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_clip_image_tower_parity():
    p = clip.init_params(seed=5, img_blocks=2, txt_blocks=1)
    rng = np.random.default_rng(6)
    pixels = rng.integers(0, 255, (1, 224, 224, 3)).astype(np.uint8)
    ours = np.asarray(clip.encode_image(p, jnp.asarray(pixels)))

    pn = {k: np.asarray(v) for k, v in p.items()}
    with torch.no_grad():
        x = (t(pixels.astype(np.float32)).permute(0, 3, 1, 2) / 255 - 0.5) / 0.5
        x = tF.conv2d(x, hwio_to_oihw(pn["visual_conv1.weight"]), stride=14)
        x = x.flatten(2).transpose(1, 2)                    # [1,256,1024]
        cls = t(pn["class_embedding"]).expand(1, 1, -1)
        x = torch.cat([cls, x], 1) + t(pn["positional_embedding"])
        x = tF.layer_norm(x, (1024,), t(pn["ln_pre.weight"]), t(pn["ln_pre.bias"]))
        for i in range(2):
            pre = f"resblocks_img.{i}"
            h = tF.layer_norm(x, (1024,), t(pn[pre + ".ln_1.weight"]),
                              t(pn[pre + ".ln_1.bias"]))
            attn, _ = torch.nn.functional.multi_head_attention_forward(
                h.transpose(0, 1), h.transpose(0, 1), h.transpose(0, 1),
                1024, 16, t(pn[pre + ".in_proj_weight"]),
                t(pn[pre + ".in_proj_bias"]), None, None, False, 0.0,
                t(pn[pre + ".out_proj_weight"]), t(pn[pre + ".out_proj_bias"]),
                need_weights=False)
            x = x + attn.transpose(0, 1)
            h = tF.layer_norm(x, (1024,), t(pn[pre + ".ln_2.weight"]),
                              t(pn[pre + ".ln_2.bias"]))
            h = tF.linear(h, t(pn[pre + ".mlp_c_fc.weight"]),
                          t(pn[pre + ".mlp_c_fc.bias"]))
            h = tF.gelu(h)
            h = tF.linear(h, t(pn[pre + ".mlp_c_proj.weight"]),
                          t(pn[pre + ".mlp_c_proj.bias"]))
            x = x + h
        x = tF.layer_norm(x, (1024,), t(pn["ln_post.weight"]),
                          t(pn["ln_post.bias"]))
        emb = x[:, 0] @ t(pn["proj"])
        ref = (emb / (emb.norm(dim=-1, keepdim=True) + 1e-8)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


def test_qwen3vl_vision_tower_parity():
    """Qwen3-VL vision tower vs an independent torch forward structured
    after the reference (llm/qwen3vl.py:154-298 / HF qwen3_vl): patchify
    permute chain + temporal-dup conv embed, bilinear pos-emb resampling,
    window partition order, 2D rotary, SDPA blocks with tanh-GELU FFN,
    deepstack taps (fc1->gelu->fc2, norm present-but-unapplied), post_ln,
    2x2 merge + mm projector. Non-square grid (4x6 patches) catches h/w
    swaps; deepstack taps at two depths catch off-by-one layer indexing."""
    from clearcam_tpu.models.qwen3vl import VisionTower

    # head_dim must be 64: the 2D rotary embedding is 64-wide by
    # construction (16 freqs x 2 axes, duplicated — qwen3vl.py:247-251)
    kv, p = VisionTower.init_random(n_blocks=3, width=128, heads=2,
                                    merge_dim=512, lang_dim=32,
                                    grid_side=8, deepstack=(0, 2), seed=7)
    tower = VisionTower(kv, p)
    rng = np.random.default_rng(8)
    img = rng.uniform(0, 255, (64, 96, 3)).astype(np.float32)  # gh=4, gw=6
    ours_emb, ours_deep = tower(jnp.asarray(img))
    ours_emb = np.asarray(ours_emb)
    ours_deep = [np.asarray(d) for d in ours_deep]

    merge, patch, side = 2, 16, 8
    mean = torch.tensor(kv["clip.vision.image_mean"]).view(1, 3, 1, 1)
    std = torch.tensor(kv["clip.vision.image_std"]).view(1, 3, 1, 1)
    with torch.no_grad():
        x = t(img).permute(2, 0, 1)[None].float()
        x = (x / 255 - mean) / std
        gh, gw = 64 // patch, 96 // patch
        # reference prefill's pixel_values permute chain (qwen3vl.py:268-288)
        x = x.reshape(3, gh // merge, merge, patch, gw // merge, merge, patch)
        x = x.permute(1, 4, 2, 5, 0, 3, 6)
        px = x.unsqueeze(5).expand(-1, -1, -1, -1, -1, merge, -1, -1) \
            .reshape(gh * gw, 3 * merge * patch * patch)
        # stacked temporal conv (qwen3vl.py:226-231)
        w = torch.stack([t(p["v.patch_embd.weight"]),
                         t(p["v.patch_embd.weight.1"])], dim=2)
        w = w.reshape(w.shape[0], -1, patch, patch)
        h = tF.conv2d(px.reshape(-1, 6, patch, patch), w,
                      t(p["v.patch_embd.bias"]), stride=patch)
        h = h.view(h.shape[0], -1)
        # bilinear pos-emb resample + window reorder (qwen3vl.py:154-187)
        hg = torch.linspace(0, side - 1, gh)
        wg = torch.linspace(0, side - 1, gw)
        hf, wf = hg.int(), wg.int()
        hc, wc = (hf + 1).clamp(max=side - 1), (wf + 1).clamp(max=side - 1)
        ha, wa = hg - hf, wg - wf
        ci = torch.stack([
            (hf[:, None] * side + wf[None, :]).flatten(),
            (hf[:, None] * side + wc[None, :]).flatten(),
            (hc[:, None] * side + wf[None, :]).flatten(),
            (hc[:, None] * side + wc[None, :]).flatten()]).long()
        cw = torch.stack([
            ((1 - ha)[:, None] * (1 - wa)[None, :]).flatten(),
            ((1 - ha)[:, None] * wa[None, :]).flatten(),
            (ha[:, None] * (1 - wa)[None, :]).flatten(),
            (ha[:, None] * wa[None, :]).flatten()])
        hidx = torch.arange(gh).view(gh // merge, merge)
        widx = torch.arange(gw).view(gw // merge, merge)
        reorder = (hidx[:, :, None, None] * gw
                   + widx[None, None, :, :]).transpose(1, 2).flatten()
        pos = (t(p["v.position_embd.weight"])[ci[:, reorder]]
               * cw[:, reorder, None]).sum(0)
        h = h + pos
        # 2D rotary in window order (qwen3vl.py:189-194,247-251)
        hpos = torch.arange(gh)[:, None].expand(-1, gw) \
            .reshape(gh // merge, merge, gw // merge, merge) \
            .transpose(1, 2).flatten()
        wpos = torch.arange(gw)[None, :].expand(gh, -1) \
            .reshape(gh // merge, merge, gw // merge, merge) \
            .transpose(1, 2).flatten()
        pid = torch.stack([hpos, wpos], -1).float()
        inv = 1.0 / (10000.0 ** (torch.arange(0, 32, 2).float() / 32))
        rope = (pid.unsqueeze(-1) * inv).flatten(1)
        emb = torch.cat([rope, rope], -1)
        cos, sin = emb.cos()[:, None, :], emb.sin()[:, None, :]

        def rot(v):
            d = v.shape[-1] // 2
            return torch.cat([-v[..., d:], v[..., :d]], -1)

        deeps = []
        for i in range(3):
            pre = f"v.blk.{i}"
            n = tF.layer_norm(h, (128,), t(p[pre + ".ln1.weight"]),
                              t(p[pre + ".ln1.bias"]), eps=1e-6)
            qkv = tF.linear(n, t(p[pre + ".attn_qkv.weight"]),
                            t(p[pre + ".attn_qkv.bias"]))
            q, k, v = qkv.reshape(h.shape[0], 3, 2, -1).permute(1, 0, 2, 3)
            q = q * cos + rot(q) * sin
            k = k * cos + rot(k) * sin
            att = tF.scaled_dot_product_attention(
                q.transpose(0, 1)[None], k.transpose(0, 1)[None],
                v.transpose(0, 1)[None])
            att = att.transpose(1, 2).reshape(h.shape[0], -1)
            h = h + tF.linear(att, t(p[pre + ".attn_out.weight"]),
                              t(p[pre + ".attn_out.bias"]))
            n = tF.layer_norm(h, (128,), t(p[pre + ".ln2.weight"]),
                              t(p[pre + ".ln2.bias"]), eps=1e-6)
            n = tF.gelu(tF.linear(n, t(p[pre + ".ffn_up.weight"]),
                                  t(p[pre + ".ffn_up.bias"])),
                        approximate="tanh")
            h = h + tF.linear(n, t(p[pre + ".ffn_down.weight"]),
                              t(p[pre + ".ffn_down.bias"]))
            if i in (0, 2):
                d = h.view(-1, 512)          # norm exists but is NOT applied
                d = tF.gelu(tF.linear(d, t(p[f"v.deepstack.{i}.fc1.weight"]),
                                      t(p[f"v.deepstack.{i}.fc1.bias"])),
                            approximate="tanh")
                deeps.append(tF.linear(d, t(p[f"v.deepstack.{i}.fc2.weight"]),
                                       t(p[f"v.deepstack.{i}.fc2.bias"])))
        h = tF.layer_norm(h, (128,), t(p["v.post_ln.weight"]),
                          t(p["v.post_ln.bias"]), eps=1e-6)
        m = h.view(-1, 512)
        m = tF.gelu(tF.linear(m, t(p["mm.0.weight"]), t(p["mm.0.bias"])),
                    approximate="tanh")
        ref_emb = tF.linear(m, t(p["mm.2.weight"]),
                            t(p["mm.2.bias"])).numpy()
        ref_deep = [d.numpy() for d in deeps]

    assert ours_emb.shape == ref_emb.shape == (6, 32)  # (gh*gw/4, lang)
    np.testing.assert_allclose(ours_emb, ref_emb, rtol=1e-4, atol=1e-5)
    assert len(ours_deep) == len(ref_deep) == 2
    for od, rd in zip(ours_deep, ref_deep):
        np.testing.assert_allclose(od, rd, rtol=1e-4, atol=1e-5)
