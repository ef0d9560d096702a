"""Detection loss: TAL assignment sanity + synthetic overfit (loss decreases
and the model learns the box)."""
import numpy as np
import pytest

import jax.numpy as jnp

from clearcam_tpu.models import yolo_loss, yolov9


def test_assign_picks_anchors_inside_gt():
    n, nc = 64, 4
    anchors = np.stack(np.meshgrid(np.arange(8) * 8 + 4,
                                   np.arange(8) * 8 + 4), -1).reshape(-1, 2)
    pred = np.zeros((n, 4 + nc), np.float32)
    pred[:, 0:2] = anchors            # boxes centered on their anchors
    pred[:, 2:4] = 10.0
    pred[:, 4] = 0.5                  # some class-0 confidence
    gt = np.array([[8.0, 8.0, 32.0, 32.0]], np.float32)
    cls_t, box_t, fg = yolo_loss.assign(jnp.asarray(pred), jnp.asarray(gt),
                                        jnp.asarray([0]),
                                        jnp.asarray(anchors, jnp.float32))
    fg = np.asarray(fg)
    inside = ((anchors[:, 0] > 8) & (anchors[:, 0] < 32)
              & (anchors[:, 1] > 8) & (anchors[:, 1] < 32))
    assert fg.any()
    assert not fg[~inside].any()      # only anchors inside the GT box match
    assert np.asarray(box_t)[fg][0].tolist() == [8, 8, 32, 32]
    # padded GT (class -1) assigns nothing
    cls_t2, _, fg2 = yolo_loss.assign(jnp.asarray(pred), jnp.asarray(gt),
                                      jnp.asarray([-1]),
                                      jnp.asarray(anchors, jnp.float32))
    assert not np.asarray(fg2).any()


def test_overfit_single_box():
    """A few optimizer steps on one synthetic example reduce the loss."""
    size, res = "t", 64
    params = yolov9.init_params(size, seed=0)
    step, opt = yolo_loss.make_finetune_step(size, lr=3e-4, clip_norm=1.0)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    frame = rng.uniform(0, 1, (1, res, res, 3)).astype(np.float32)
    gt_boxes = jnp.asarray([[[16.0, 16.0, 48.0, 48.0]]])
    gt_cls = jnp.asarray([[2]])

    losses = []
    for _ in range(14):
        params, opt_state, loss = step(params, opt_state, jnp.asarray(frame),
                                       gt_boxes, gt_cls)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
