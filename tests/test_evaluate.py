"""mAP evaluator: exact AP values on constructed cases."""
import numpy as np
import pytest

from clearcam_tpu.tools.evaluate import (average_precision, evaluate,
                                         iou_matrix)


def test_iou_matrix_basics():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    m = iou_matrix(a, b)
    np.testing.assert_allclose(m[0], [1.0, 25 / 175, 0.0], atol=1e-6)


def test_perfect_detector_scores_1():
    gt = [(np.array([[10, 10, 50, 50], [60, 60, 90, 90]]),
           np.array([0.0, 1.0]))]
    preds = [np.array([[10, 10, 50, 50, 0.9, 0.0],
                       [60, 60, 90, 90, 0.8, 1.0]])]
    out = evaluate(preds, gt)
    assert out["mAP50"] == 1.0 and out["mAP50-95"] == 1.0


def test_misses_and_false_positives_lower_ap():
    gt = [(np.array([[10, 10, 50, 50], [100, 100, 150, 150]]),
           np.array([0.0, 0.0]))]
    # one perfect hit (higher conf) + one far false positive; one GT missed
    preds = [np.array([[10, 10, 50, 50, 0.9, 0.0],
                       [300, 300, 340, 340, 0.8, 0.0]])]
    out = evaluate(preds, gt)
    # recall tops out at 0.5 with precision 1 up to it: 101-pt AP ~ 0.5
    assert 0.45 <= out["mAP50"] <= 0.55


def test_localization_quality_separates_thresholds():
    """A sloppy box (IoU ~0.55 vs GT) counts at 0.5 but not at 0.75."""
    gt = [(np.array([[0, 0, 100, 100]]), np.array([0.0]))]
    preds = [np.array([[0, 0, 100, 72, 0.9, 0.0]])]   # IoU = 0.72
    out = evaluate(preds, gt)
    assert out["mAP50"] == 1.0
    assert out["mAP50-95"] < 0.6


def test_duplicate_detections_are_false_positives():
    gt = [(np.array([[0, 0, 100, 100]]), np.array([0.0]))]
    preds = [np.array([[0, 0, 100, 100, 0.9, 0.0],
                       [1, 1, 99, 99, 0.85, 0.0]])]   # dup -> FP
    out = evaluate(preds, gt)
    assert out["mAP50"] == 1.0   # dup ranks after the TP; precision env holds


def test_average_precision_edge_cases():
    assert average_precision([], [], 0) != average_precision([], [], 0)  # nan
    assert average_precision([], [], 3) == 0.0
    assert average_precision([0.9], [1.0], 1) == 1.0


def test_end_to_end_with_fake_detector(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from clearcam_tpu.tools.evaluate import load_gt
    from tests.test_finetune import make_dataset

    root = make_dataset(tmp_path, n=3, size=96)
    paths, gts = load_gt(root)
    assert len(paths) == 3 and gts[0][0].shape == (1, 4)
    # detector that returns the GT box exactly
    preds = [np.concatenate([g[0], np.full((1, 1), 0.9),
                             np.zeros((1, 1))], 1) for g in gts]
    assert evaluate(preds, gts)["mAP50-95"] == 1.0
