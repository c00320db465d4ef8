"""Grouping-head semantics (AssignAttention, GroupingBlock, ModalityTrans)."""

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.heads.grouping import (
    AssignAttention,
    GroupingBlock,
    ModalityTrans,
    gumbel_softmax,
)


def test_gumbel_softmax_hard_is_onehot():
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 6).astype(np.float32))
    y = gumbel_softmax(jax.random.PRNGKey(0), logits, hard=True, axis=-1)
    arr = np.asarray(y)
    np.testing.assert_allclose(arr.sum(-1), 1.0, rtol=1e-5)
    assert ((arr == arr.max(-1, keepdims=True)) | (np.abs(arr) < 1)).all()
    # exactly one ~1 per row in forward value
    assert (np.isclose(arr, 1.0, atol=1e-4).sum(-1) == 1).all()


def test_assign_attention_soft():
    m = AssignAttention(dim=8)
    q = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8).astype(np.float32))
    k = jnp.asarray(np.random.RandomState(1).randn(2, 11, 8).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), q, k, return_attn=True)
    out, attn_dict = m.apply(v, q, k, return_attn=True)
    assert out.shape == (2, 5, 8)
    assert attn_dict["hard"].shape == (2, 5, 11)
    # assignment is softmax over GROUPS (axis=-2): columns sum to 1
    np.testing.assert_allclose(np.asarray(attn_dict["hard"]).sum(-2), 1.0, rtol=1e-4)
    assert (np.asarray(attn_dict["soft"]) >= 1.0).all()  # 1 + softmax


def test_grouping_block_shapes():
    m = GroupingBlock(dim=8, out_dim=8, num_heads=2, num_group_token=6,
                      num_output_group=4)
    x = jnp.ones((2, 10, 8))
    gt = jnp.ones((2, 6, 8))
    v = m.init(jax.random.PRNGKey(0), x, gt)
    out, _ = m.apply(v, x, gt)
    assert out.shape == (2, 4, 8)


def test_modality_trans_full():
    m = ModalityTrans(dim=8, depth=2, num_heads=2, num_group_tokens=5,
                      num_output_groups=5, use_han=True)
    x = jnp.ones((2, 10, 8))
    tok = jnp.zeros((5, 8))
    other = jnp.ones((2, 10, 8))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, tok, other, return_attn=True)
    out, attn, x_attn = m.apply(v, x, tok, other, return_attn=True)
    assert out.shape == (2, 5, 8)
    assert attn["soft"].shape[1] == 5
    # cross-modal style: batched group tokens
    out2, _, _ = m.apply(v, x, jnp.ones((2, 5, 8)), other, return_attn=True)
    assert out2.shape == (2, 5, 8)
