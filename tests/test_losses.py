"""Loss-function sanity tests."""

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.losses.ave import ave_labels, ave_loss
from avmoe_tpu.losses.avvp import avvp_loss
from avmoe_tpu.losses.classification import (
    binary_cross_entropy,
    binary_cross_entropy_with_logits,
    cross_entropy_with_logits,
)
from avmoe_tpu.losses.contrastive import (
    contrastive_loss,
    info_nce_loss,
    mask_info_nce_loss,
)


def test_bce_matches_manual():
    logits = jnp.asarray([0.0, 2.0, -2.0])
    targets = jnp.asarray([0.0, 1.0, 0.0])
    manual = -(np.log(0.5) + np.log(1 / (1 + np.exp(-2))) + np.log(1 - 1 / (1 + np.exp(2)))) / 3
    np.testing.assert_allclose(
        float(binary_cross_entropy_with_logits(logits, targets)), manual, rtol=1e-5)


def test_ave_loss_perfect_prediction_is_low():
    labels = np.zeros((2, 3, 5), np.float32)
    labels[0, :, 2] = 1
    labels[1, :, 4] = 1  # all background
    bce, ev = ave_labels(jnp.asarray(labels))
    outputs = {
        "is_event_logits": (jnp.asarray(bce) * 2 - 1) * 20.0,
        "event_logits": jax.nn.one_hot(ev, 4) * 20.0,
        "av_score": jax.nn.one_hot(ev, 4) * 20.0,
    }
    loss, aux = ave_loss(outputs, jnp.asarray(labels))
    assert float(loss) < 0.01


def test_avvp_loss_runs():
    B, C = 2, 25
    out = {
        "global_prob": jnp.full((B, C), 0.5),
        "a_prob": jnp.full((B, C), 0.5),
        "v_prob": jnp.full((B, C), 0.5),
        "aud_cls_logits": jnp.eye(C) * 10,
        "vis_cls_logits": jnp.eye(C) * 10,
        "telemetry": {"lb_loss": jnp.zeros(())},
    }
    labels = jnp.zeros((B, C))
    loss, aux = avvp_loss(out, labels)
    assert np.isfinite(float(loss))
    assert float(aux["loss_cls_aud"]) < 0.01  # diagonal logits -> ~0 CE


def test_info_nce_prefers_aligned_pairs():
    rng = np.random.RandomState(0)
    q = rng.randn(2, 10, 8).astype(np.float32)
    aligned = info_nce_loss(jnp.asarray(q), jnp.asarray(q))
    shuffled = info_nce_loss(jnp.asarray(q), jnp.asarray(q[::-1].copy()))
    assert float(aligned) < float(shuffled)


def test_contrastive_loss_zero_for_same_positive():
    x = jnp.ones((4, 8))
    assert float(contrastive_loss(x, x, jnp.ones(4))) == 0.0
    # negatives at distance zero get full margin penalty
    assert float(contrastive_loss(x, x, jnp.zeros(4))) > 0.0


def test_mask_info_nce():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(6, 8).astype(np.float32))
    mask = jnp.eye(6)
    val = mask_info_nce_loss(q, q, mask)
    assert np.isfinite(float(val))
