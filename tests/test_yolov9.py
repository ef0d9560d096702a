"""YOLOv9 structural + behavioral tests (synthetic weights; no network).

The reference's test strategy is golden-value regression on recorded outputs
(SURVEY.md §4); without its stripped fixtures we assert structure, shape and
the NMS/letterbox semantics that downstream parity depends on.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from clearcam_tpu.models import yolov9
from clearcam_tpu.ops import image as image_ops
from clearcam_tpu.ops.nms import batched_nms, yolo_postprocess


@pytest.mark.parametrize("size", ["t", "s"])
def test_forward_shapes(size):
    params = yolov9.init_params(size, seed=0)
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    out = yolov9.forward_raw(params, x, size)
    n = sum((320 // s) ** 2 for s in (8, 16, 32))
    assert out.shape == (1, n, 4 + yolov9.NUM_CLASSES)


def test_detect_end_to_end():
    params = yolov9.init_params("t", seed=0)
    frames = np.random.default_rng(0).integers(0, 255, (2, 480, 640, 3), np.uint8)
    out = yolov9.detect(params, jnp.asarray(frames), size="t", res=320)
    assert out.shape == (2, 300, 6)
    # boxes are clipped to source pixel space
    assert float(out[..., 0].min()) >= 0.0
    assert float(out[..., 2].max()) <= 640.0
    assert float(out[..., 3].max()) <= 480.0


def test_wrapper_single_frame():
    m = yolov9.YOLOv9("t", res=320)
    frame = np.zeros((240, 320, 3), np.uint8)
    out = m(jnp.asarray(frame))
    assert out.shape == (300, 6)


def test_letterbox_plan_matches_reference_geometry():
    # reference preprocess: r = min(res/h, res/w), pad to stride multiple
    # (detection/yolov9.py:390-404); for 1080p @ res 960 -> 960x544 + pads
    new_w, new_h, pl, pt, out_w, out_h, r = image_ops.letterbox_plan((1080, 1920), 960)
    assert (new_w, new_h) == (960, 540)
    assert out_w == 960
    assert out_h % 32 == 0 and out_h >= 540


def test_nms_suppresses_same_class_overlap():
    boxes = jnp.asarray([[[0, 0, 10, 10], [1, 1, 10, 10], [20, 20, 30, 30]]],
                        jnp.float32)
    scores = jnp.asarray([[0.9, 0.8, 0.7]])
    cls = jnp.asarray([[0, 0, 0]])
    out = batched_nms(boxes, scores, cls, max_det=3)
    kept = np.asarray(out[0, :, 4])
    assert kept[0] == pytest.approx(0.9)
    assert kept[1] == 0.0          # suppressed by box 0
    assert kept[2] == pytest.approx(0.7)


def test_nms_keeps_cross_class_overlap():
    boxes = jnp.asarray([[[0, 0, 10, 10], [1, 1, 10, 10]]], jnp.float32)
    scores = jnp.asarray([[0.9, 0.8]])
    cls = jnp.asarray([[0, 1]])
    out = batched_nms(boxes, scores, cls, max_det=2)
    assert float(out[0, 1, 4]) == pytest.approx(0.8)


def test_postprocess_confidence_cutoff():
    # one anchor above threshold, one below
    raw = np.zeros((1, 2, 84), np.float32)
    raw[0, 0, :4] = [50, 50, 10, 10]
    raw[0, 0, 4] = 0.9
    raw[0, 1, :4] = [100, 100, 10, 10]
    raw[0, 1, 5] = 0.1
    out = yolo_postprocess(jnp.asarray(raw), max_det=2)
    scores = np.asarray(out[0, :, 4])
    assert scores[0] == pytest.approx(0.9)
    assert scores[1] == 0.0


def test_nms_matches_naive_reference_randomized():
    """Property test: the batched triu-IoU NMS keeps exactly the boxes a
    naive sequential greedy NMS keeps, per class, over random scenes."""
    import numpy as np
    import jax.numpy as jnp
    from clearcam_tpu.ops.nms import yolo_postprocess

    rng = np.random.default_rng(0)
    for trial in range(5):
        n, nc = 80, 4
        cx = rng.uniform(50, 600, n)
        cy = rng.uniform(50, 400, n)
        w = rng.uniform(20, 120, n)
        h = rng.uniform(20, 120, n)
        probs = rng.uniform(0, 0.9, (n, nc)).astype(np.float32)
        raw = np.concatenate([np.stack([cx, cy, w, h], 1), probs],
                             1)[None].astype(np.float32)
        out = np.asarray(yolo_postprocess(jnp.asarray(raw), 300, 0.25, 0.45))[0]
        kept = {(round(float(r[0]), 2), round(float(r[1]), 2), int(r[5]))
                for r in out if r[4] > 0}

        # naive sequential oracle with the SAME semantics as the reference's
        # dense triu mask (yolov9.py:439-458): a box is suppressed if it
        # overlaps ANY higher-ranked same-class box, kept or not
        def iou(a, b):
            x1, y1 = max(a[0], b[0]), max(a[1], b[1])
            x2, y2 = min(a[2], b[2]), min(a[3], b[3])
            inter = max(0, x2 - x1) * max(0, y2 - y1)
            ua = (a[2]-a[0])*(a[3]-a[1]) + (b[2]-b[0])*(b[3]-b[1]) - inter
            return inter / ua if ua > 0 else 0.0
        expect = set()
        conf = probs.max(1).astype(np.float64)
        cls = probs.argmax(1)
        boxes = np.stack([cx - w/2, cy - h/2, cx + w/2, cy + h/2], 1)
        order = np.argsort(-conf)
        rank = {int(i): r for r, i in enumerate(order)}
        for i in range(n):
            if conf[i] < 0.25:
                continue
            suppressed = any(
                cls[j] == cls[i] and rank[j] < rank[i]
                and iou(boxes[i], boxes[j]) > 0.45
                for j in range(n) if conf[j] >= 0.25)
            if not suppressed:
                expect.add((round(float(np.float32(boxes[i][0])), 2),
                            round(float(np.float32(boxes[i][1])), 2),
                            int(cls[i])))
        assert kept == expect, f"trial {trial}: {kept ^ expect}"


def test_state_dict_roundtrip():
    # convert_state_dict normalizes tinygrad `.list.` names and OIHW layout
    sd = {
        "model.list.0.conv.weight": np.zeros((16, 3, 3, 3), np.float32),
        "model.list.0.conv.bias": np.zeros((16,), np.float32),
        "model.list.22.dfl.conv.weight": np.arange(16, np.float32).reshape(1, 16, 1, 1)
        if False else np.arange(16, dtype=np.float32).reshape(1, 16, 1, 1),
        "model.list.22.anchors": np.zeros((2, 10), np.float32),
    }
    p = yolov9.convert_state_dict(sd)
    assert p["model.0.conv.weight"].shape == (3, 3, 3, 16)
    assert p["model.22.dfl.conv.weight"].shape == (16,)
    assert "model.22.anchors" not in p


@pytest.mark.parametrize("size", ["m", "c", "e"])
def test_forward_shapes_large_variants(size):
    params = yolov9.init_params(size, seed=0)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    out = yolov9.forward_raw(params, x, size)
    n = sum((128 // s) ** 2 for s in (8, 16, 32))
    assert out.shape == (1, n, 4 + yolov9.NUM_CLASSES)
