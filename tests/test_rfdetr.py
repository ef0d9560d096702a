"""RF-DETR: 91->80 remap, DETR postprocess semantics, and the full
LW-DETR-style forward (windowed ViT + projector + deformable decoder)."""
import numpy as np
import pytest

import jax.numpy as jnp

from clearcam_tpu.models import rfdetr
from clearcam_tpu.models.rfdetr import (DETRDetector, RFDETR, RFDETRConfig,
                                        detr_postprocess, detr_to_yolo,
                                        remap_class_ids)

TINY = RFDETRConfig(resolution=64, patch_size=16, vit_dim=32, vit_depth=4,
                    vit_heads=2, num_windows=2, global_blocks=(1, 3),
                    out_blocks=(1, 3), d_model=32, num_queries=12,
                    dec_layers=2, sa_heads=4, ca_heads=4, ca_points=4,
                    mlp_ratio=2, projector_n=1)


def test_remap_known_ids():
    assert detr_to_yolo[1] == 0        # person
    assert detr_to_yolo[3] == 2        # car
    assert detr_to_yolo[90] == 79      # toothbrush
    assert 12 not in detr_to_yolo      # gap id (street sign) absent
    assert len(detr_to_yolo) == 80


def test_remap_vectorized_marks_gaps():
    out = np.asarray(remap_class_ids([1, 12, 3, 91]))
    assert out.tolist() == [0, -1, 2, -1]


def test_postprocess_decodes_and_thresholds():
    q = 5
    logits = np.full((1, q, 92), -10.0, np.float32)
    boxes = np.zeros((1, q, 4), np.float32)
    # query 0: confident person at center
    logits[0, 0, 1] = 10.0
    boxes[0, 0] = [0.5, 0.5, 0.2, 0.4]
    # query 1: confident background -> dropped
    logits[0, 1, 91] = 10.0
    # query 2: gap class id 12 -> dropped
    logits[0, 2, 12] = 10.0
    out = np.asarray(detr_postprocess(jnp.asarray(logits), jnp.asarray(boxes),
                                      (100, 200), conf_threshold=0.5))
    live = out[0][out[0][:, 4] > 0]
    assert live.shape[0] == 1
    x1, y1, x2, y2, score, cls = live[0]
    np.testing.assert_allclose([x1, y1, x2, y2], [80.0, 30.0, 120.0, 70.0],
                               rtol=1e-5)
    assert cls == 0 and score > 0.9


def test_postprocess_sigmoid_mode():
    """LW-DETR/RF-DETR score with per-class sigmoid (no background slot)."""
    logits = np.full((1, 3, 91), -10.0, np.float32)
    logits[0, 0, 1] = 4.0          # confident person
    boxes = np.zeros((1, 3, 4), np.float32)
    boxes[0, 0] = [0.5, 0.5, 0.2, 0.2]
    out = np.asarray(detr_postprocess(jnp.asarray(logits), jnp.asarray(boxes),
                                      (100, 100), conf_threshold=0.5,
                                      use_sigmoid=True))
    live = out[0][out[0][:, 4] > 0]
    assert live.shape[0] == 1 and live[0][5] == 0


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------

def test_windows_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8 * 8, 5)).astype(np.float32))
    w = rfdetr._to_windows(x, (8, 8), 2)
    assert w.shape == (2 * 4, 16, 5)
    back = rfdetr._from_windows(w, (8, 8), 2, 2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_bilinear_sample_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    vmap = rng.normal(size=(2, 6, 9, 4)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, (2, 25, 2)).astype(np.float32)  # incl. border
    ours = np.asarray(rfdetr.bilinear_sample(jnp.asarray(vmap),
                                             jnp.asarray(loc)))
    grid = torch.from_numpy(loc * 2 - 1).reshape(2, 25, 1, 2)
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(vmap).permute(0, 3, 1, 2), grid,
        mode="bilinear", padding_mode="zeros", align_corners=False)
    ref = ref.squeeze(-1).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_deformable_attention_matches_torch():
    """Independent torch expression of box-relative deformable attention."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as tF

    cfg = TINY
    p = rfdetr.init_params(cfg, seed=3)
    rng = np.random.default_rng(2)
    b, q, d = 2, cfg.num_queries, cfg.d_model
    hh = ww = cfg.resolution // cfg.patch_size
    query = rng.normal(size=(b, q, d)).astype(np.float32)
    vmap = rng.normal(size=(b, hh, ww, d)).astype(np.float32)
    refs = rng.uniform(0.2, 0.8, (b, q, 4)).astype(np.float32)
    pre = "decoder.layers.0.cross_attn"
    ours = np.asarray(rfdetr.deformable_attention(
        p, pre, jnp.asarray(query), jnp.asarray(vmap), jnp.asarray(refs), cfg))

    def lin(name, x):
        w = torch.from_numpy(np.asarray(p[name + ".weight"]))
        bb = torch.from_numpy(np.asarray(p[name + ".bias"]))
        return x @ w.T + bb

    tq = torch.from_numpy(query)
    heads, pts = cfg.ca_heads, cfg.ca_points
    dh = d // heads
    off = lin(pre + ".sampling_offsets", tq).reshape(b, q, heads, pts, 2)
    attn = lin(pre + ".attention_weights", tq).reshape(b, q, heads, pts)
    attn = attn.softmax(-1)
    val = lin(pre + ".value_proj",
              torch.from_numpy(vmap).reshape(b, hh * ww, d)) \
        .reshape(b, hh, ww, heads, dh)
    trefs = torch.from_numpy(refs)
    loc = trefs[:, :, None, None, :2] + \
        off / pts * trefs[:, :, None, None, 2:] * 0.5
    # sample with grid_sample per head
    out = torch.zeros(b, q, heads, dh)
    for m in range(heads):
        v = val[:, :, :, m].permute(0, 3, 1, 2)         # [b, dh, h, w]
        g = (loc[:, :, m] * 2 - 1)                      # [b, q, pts, 2]
        s = tF.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                           align_corners=False)         # [b, dh, q, pts]
        out[:, :, m] = (s * attn[:, :, m][:, None]).sum(-1).permute(0, 2, 1)
    ref_out = lin(pre + ".output_proj", out.reshape(b, q, d)).numpy()
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_full_forward_shapes_and_finiteness():
    cfg = TINY
    p = rfdetr.init_params(cfg, seed=0)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, cfg.resolution, cfg.resolution, 3))
                    .astype(np.float32))
    logits, boxes = rfdetr.forward(p, x, cfg)
    assert logits.shape == (2, cfg.num_queries, cfg.num_classes)
    assert boxes.shape == (2, cfg.num_queries, 4)
    assert np.isfinite(np.asarray(logits)).all()
    bx = np.asarray(boxes)
    assert (bx >= 0).all() and (bx <= 1).all()   # sigmoid-refined cxcywh


def test_rfdetr_wrapper_detect_and_track():
    det = RFDETR(TINY, conf_threshold=0.0)
    frame = np.zeros((96, 128, 3), np.uint8)
    rows = det(frame)
    assert rows.shape == (TINY.num_queries, 6)   # min(max_det, Q) rows
    # detect_many + tracker integration (run_mot.py detector swap surface)
    from clearcam_tpu.track.ocsort import OCSort
    trk = OCSort()
    outs = det.detect_many([frame, frame])
    assert len(outs) == 2
    trk.update(outs[0][:20], 0.0)


def test_convert_state_dict_strips_and_transposes():
    sd = {"model.backbone.patch_embed.weight": np.zeros((8, 3, 4, 4)),
          "module.class_head.weight": np.zeros((91, 32)),
          "model.dn_embed.weight": np.zeros((5, 5))}
    out = rfdetr.convert_state_dict(sd)
    assert out["backbone.patch_embed.weight"].shape == (4, 4, 3, 8)
    assert out["class_head.weight"].shape == (91, 32)
    assert not any("dn_" in k for k in out)


def test_detr_detector_plugs_into_tracker():
    from clearcam_tpu.track.ocsort import OCSort

    def fake_query(frames):
        b = frames.shape[0]
        logits = jnp.full((b, 3, 92), -10.0)
        logits = logits.at[:, 0, 1].set(10.0)
        boxes = jnp.zeros((b, 3, 4)).at[:, 0].set(
            jnp.asarray([0.5, 0.5, 0.3, 0.3]))
        return logits, boxes

    det = DETRDetector(fake_query, (240, 320))
    trk = OCSort()
    for _ in range(5):
        rows = det.detect_many([np.zeros((240, 320, 3), np.uint8)])[0]
        tracks = trk.update(rows, 0.25)
    assert tracks and int(tracks[0].class_id) == 0
