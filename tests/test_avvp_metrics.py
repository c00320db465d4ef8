"""Unit tests for the AVVP F1 metric suite (pure numpy, no jax)."""

import numpy as np

from avmoe_tpu.metrics.avvp import (
    AVVPEvaluator,
    event_level,
    extract_events,
    segment_level,
)


def grids(*pairs):
    g = np.zeros((25, 10), dtype=np.int64)
    for cls, lo, hi in pairs:
        g[cls, lo:hi] = 1
    return g


def test_extract_events():
    assert extract_events(np.array([0, 1, 1, 0, 1, 0, 0, 1, 1, 1])) == [(1, 3), (4, 5), (7, 10)]
    assert extract_events(np.zeros(10)) == []
    assert extract_events(np.ones(10)) == [(0, 10)]


def test_segment_level_perfect():
    gt = grids((3, 2, 7))
    f_a, f_v, f, f_av = segment_level(gt, gt, gt, gt, gt, gt)
    assert f_a == f_v == f == f_av == 1.0


def test_segment_level_all_true_negative():
    z = np.zeros((25, 10), dtype=np.int64)
    assert segment_level(z, z, z, z, z, z) == (1.0, 1.0, 1.0, 1.0)


def test_segment_level_partial():
    gt = grids((0, 0, 10))
    pred = grids((0, 0, 5))
    f_a, _, _, _ = segment_level(pred, gt, pred * gt, gt, gt, gt)
    # TP=5, FP=0, FN=5 -> F1 = 2*5/(10+5) = 2/3
    np.testing.assert_allclose(f_a, 2 / 3)


def test_event_level_iou_matching():
    gt = grids((0, 0, 4))
    pred_good = grids((0, 0, 3))   # IoU 3/4 >= 0.5 -> TP
    pred_bad = grids((0, 0, 1))    # IoU 1/4 < 0.5 -> FP + FN
    f_good, _, _, _ = event_level(pred_good, gt, pred_good, gt, gt, gt)
    f_bad, _, _, _ = event_level(pred_bad, gt, pred_bad, gt, gt, gt)
    assert f_good == 1.0
    assert f_bad == 0.0


def test_evaluator_end_to_end():
    ev = AVVPEvaluator()
    gt_a = grids((1, 0, 5))
    gt_v = grids((1, 2, 7))
    global_prob = np.zeros(25)
    global_prob[1] = 0.9
    a_frame = np.zeros((10, 25))
    a_frame[0:5, 1] = 0.8
    v_frame = np.zeros((10, 25))
    v_frame[2:7, 1] = 0.8
    ev.add_clip(global_prob, a_frame, v_frame, gt_a, gt_v)
    s = ev.summary()
    assert s["seg_a"] == 100.0
    assert s["seg_v"] == 100.0
    assert s["seg_av"] == 100.0  # overlap 2:5 predicted and gt
    assert 0 <= s["event_type_avg"] <= 100


def test_evaluator_weak_label_filter():
    """Frame probs above threshold are suppressed when the weak label is off."""
    ev = AVVPEvaluator()
    gt = np.zeros((25, 10), dtype=np.int64)
    global_prob = np.zeros(25)        # no events predicted at clip level
    frame = np.ones((10, 25))         # frame probs scream, but must be gated
    ev.add_clip(global_prob, frame, frame, gt, gt)
    assert ev.summary()["seg_a"] == 100.0  # all true negatives -> 1.0
