"""Unit tests for AVS metrics and losses (small shapes, CPU)."""

import jax.numpy as jnp
import numpy as np

from avmoe_tpu.losses.avs import f1_iou_bce_loss, f5_iou_bce_loss, masked_av_loss
from avmoe_tpu.metrics.avs import eval_fmeasure, mask_iou


def logits_of(mask, scale=20.0):
    return (np.asarray(mask, np.float32) * 2 - 1) * scale


def test_mask_iou_perfect():
    m = np.zeros((2, 16, 16), np.float32)
    m[:, 4:8, 4:8] = 1
    assert float(mask_iou(jnp.asarray(logits_of(m)), jnp.asarray(m))) > 0.99


def test_mask_iou_no_object():
    gt = np.zeros((1, 16, 16), np.float32)
    pred = logits_of(np.zeros((1, 16, 16), np.float32))
    # empty GT + empty prediction -> background IoU = 1
    assert float(mask_iou(jnp.asarray(pred), jnp.asarray(gt))) > 0.99


def test_mask_iou_half():
    gt = np.zeros((1, 16, 16), np.float32)
    gt[:, :, :8] = 1
    pred = np.zeros((1, 16, 16), np.float32)
    pred[:, :, :4] = 1
    iou = float(mask_iou(jnp.asarray(logits_of(pred)), jnp.asarray(gt)))
    np.testing.assert_allclose(iou, 0.5, atol=0.01)


def test_eval_fmeasure():
    gt = np.zeros((2, 16, 16), np.float32)
    gt[:, 2:10, 2:10] = 1
    f = float(eval_fmeasure(jnp.asarray(logits_of(gt)), jnp.asarray(gt)))
    assert f > 0.99
    # all-black gt images are skipped: one perfect + one empty -> still ~1
    gt2 = gt.copy()
    gt2[1] = 0
    f2 = float(eval_fmeasure(jnp.asarray(logits_of(gt)), jnp.asarray(gt2)))
    assert f2 > 0.5


def test_f1_f5_losses():
    T = 5
    gt_first = np.zeros((2, 16, 16), np.float32)
    gt_first[:, 4:8] = 1
    pred = np.tile(logits_of(gt_first)[:, None], (1, T, 1, 1)).reshape(2 * T, 16, 16)
    l1 = float(f1_iou_bce_loss(jnp.asarray(pred), jnp.asarray(gt_first), T))
    assert l1 < 0.01
    gt_all = np.tile(gt_first[:, None], (1, T, 1, 1)).reshape(2 * T, 16, 16)
    l5 = float(f5_iou_bce_loss(jnp.asarray(pred), jnp.asarray(gt_all)))
    assert l5 < 0.01


def test_masked_av_loss_runs():
    BT, H, W, C = 4, 8, 8, 16
    pred = jnp.asarray(np.random.RandomState(0).randn(BT, 32, 32).astype(np.float32))
    a = [jnp.asarray(np.random.RandomState(1).randn(2, 2, C).astype(np.float32))]
    v = [jnp.asarray(np.random.RandomState(2).randn(BT, H, W, C).astype(np.float32))]
    for kind in ("cosine", "euclidean", "kl"):
        val = float(masked_av_loss(pred, a, v, [0], kind=kind,
                                   closer=(kind != "cosine")))
        assert np.isfinite(val)
