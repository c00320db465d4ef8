"""Parity of avmoe_tpu.losses.yb vs the reference's own YBLoss/YBLoss2
(AVMOE/AVE/criterion.py:70,328), run via tests/reference_harness.py.

These losses are dead code in the reference's main path, so parity here is a
completeness check: random probs/features/targets, both implementations,
rtol 1e-5 fp32.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_harness import REF_AVE, load_ref_file  # noqa: E402

from avmoe_tpu.losses.yb import yb_loss, yb_loss2  # noqa: E402


class _Opt:
    def __init__(self, **kw):
        self.__dict__.update(kw)


@pytest.fixture(scope="module")
def ref_criterion():
    return load_ref_file(f"{REF_AVE}/criterion.py", "ref_criterion")


def _multi_hot(rng, n, C, k=3):
    t = np.zeros((n, C), np.float32)
    for i in range(n):
        t[i, rng.choice(C, size=k, replace=False)] = 1.0
    return t


@pytest.mark.parametrize("exp", [False, True])
@pytest.mark.parametrize("pool", ["max", "mean"])
def test_yb_loss_matches_reference(ref_criterion, exp, pool):
    rng = np.random.default_rng(0 if exp else 1)
    n, B_main, S, C = 4, 8, 3, 25
    B_ext = B_main + n
    # strictly positive probs so the ref's x[x != 0] gather has the same
    # support as the vectorized mask
    all_prob = rng.uniform(0.05, 1.0, (B_ext, S, 2, C)).astype(np.float32)
    # unique indices (the ref loop overwrites on duplicates, order-dependent)
    audio_idx = rng.choice(B_main, size=n, replace=False)
    vis_idx = rng.choice(B_main, size=n, replace=False)
    target = np.zeros((B_main, C), np.float32)
    # make half the pairs disjoint, half overlapping
    for i in range(n):
        a, v = audio_idx[i], vis_idx[i]
        if i % 2 == 0:
            target[a, 2 * i] = 1.0
            target[v, 2 * i + 1] = 1.0 if v != a else target[v, 2 * i + 1]
        else:
            target[a, 20] = 1.0
            target[v, 20] = 1.0

    opt = _Opt(exp=exp, pos_pool=pool, neg_pool=pool)
    ref = ref_criterion.YBLoss()(
        torch.from_numpy(all_prob), torch.from_numpy(audio_idx),
        torch.from_numpy(vis_idx), torch.from_numpy(target), opt)
    ours = yb_loss(all_prob, audio_idx, vis_idx, target,
                   exp=exp, pos_pool=pool, neg_pool=pool)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("aug_type", ["vision", "audio"])
def test_yb_loss2_bce_flavors(ref_criterion, aug_type):
    rng = np.random.default_rng(2)
    n, B, C = 5, 8, 25
    prob_x2 = rng.uniform(0.05, 0.95, (n, C)).astype(np.float32)
    x1 = rng.normal(size=(n, 16)).astype(np.float32)
    sample_idx = rng.choice(B, size=n, replace=False)
    rand_idx = rng.choice(B, size=n, replace=False)
    target = _multi_hot(rng, B, C)

    opt = _Opt(aug_type=aug_type)
    ref = ref_criterion.YBLoss2()(
        torch.zeros(n, C), torch.from_numpy(prob_x2), None,
        torch.from_numpy(rand_idx), torch.from_numpy(sample_idx),
        torch.from_numpy(target), opt, torch.from_numpy(x1),
        torch.from_numpy(x1), None, None)
    ours = yb_loss2(aug_type, prob_x2=prob_x2, sample_idx=sample_idx,
                    target=target)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)


def test_yb_loss2_ada(ref_criterion):
    rng = np.random.default_rng(3)
    n, D, C = 6, 16, 25
    x1 = rng.normal(size=(n, D)).astype(np.float32)
    x2 = rng.normal(size=(n, D)).astype(np.float32)
    ta = _multi_hot(rng, n, C)
    tv = _multi_hot(rng, n, C)
    sample_idx = np.arange(n)
    rand_idx = np.arange(n)

    opt = _Opt(aug_type="ada", smooth=0.9, tmp=0.1)
    ref = ref_criterion.YBLoss2()(
        torch.zeros(n, C), torch.zeros(n, C), None,
        torch.from_numpy(rand_idx), torch.from_numpy(sample_idx),
        (torch.from_numpy(ta), torch.from_numpy(tv)), opt,
        torch.from_numpy(x1), torch.from_numpy(x2),
        torch.zeros(n, C), torch.zeros(n, C))
    ours = yb_loss2("ada", x1=x1, x2=x2, target_pair=(ta, tv),
                    smooth=0.9, tmp=0.1)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)


def test_yb_loss2_mimix(ref_criterion):
    rng = np.random.default_rng(4)
    n, B, D, C = 6, 8, 16, 25
    x1 = rng.normal(size=(n, D)).astype(np.float32)
    x2 = rng.normal(size=(n, D)).astype(np.float32)
    target = _multi_hot(rng, B, C)
    sample_idx = rng.choice(B, size=n, replace=False)
    rand_idx = rng.choice(B, size=n, replace=False)

    opt = _Opt(aug_type="mimix", tmp=0.1)
    ref = ref_criterion.YBLoss2()(
        torch.zeros(n, C), torch.zeros(n, C), None,
        torch.from_numpy(rand_idx), torch.from_numpy(sample_idx),
        torch.from_numpy(target), opt, torch.from_numpy(x1),
        torch.from_numpy(x2), None, None)
    ours = yb_loss2("mimix", x1=x1, x2=x2, target=target,
                    rand_idx=rand_idx, sample_idx=sample_idx, tmp=0.1)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)
