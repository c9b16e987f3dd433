"""Loss parity tests. Torch (CPU) acts as the oracle for semantics the
reference inherits from torch.nn.functional; pure-numpy oracles cover the
xView2-solution losses."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dahitra_tpu.losses import (
    ComboLoss,
    ce_dice,
    cross_entropy,
    dice_argmax,
    focal_loss,
    focal_loss_2d,
    jaccard_loss,
    levir_train_loss,
    lovasz_hinge,
    lovasz_sigmoid,
    multi_cross_entropy,
    soft_dice_loss,
    stable_bce,
    xbd_damage_loss,
)


def rand_logits_target(b=2, h=8, w=8, c=2, seed=0, with_ignore=False):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    target = rng.integers(0, c, size=(b, h, w)).astype(np.int64)
    if with_ignore:
        target[0, :2, :2] = 255
    return logits, target


def torch_ce(logits_nhwc, target, weight=None, ignore_index=255):
    lg = torch.tensor(logits_nhwc).permute(0, 3, 1, 2)
    tg = torch.tensor(target)
    w = torch.tensor(weight) if weight is not None else None
    return F.cross_entropy(lg, tg, weight=w, ignore_index=ignore_index).item()


@pytest.mark.parametrize("with_ignore", [False, True])
def test_cross_entropy_matches_torch(with_ignore):
    logits, target = rand_logits_target(with_ignore=with_ignore)
    ours = float(cross_entropy(jnp.array(logits), jnp.array(target)))
    ref = torch_ce(logits, target, weight=[1.0, 1.0])
    assert ours == pytest.approx(ref, rel=1e-5)


def test_multi_cross_entropy_matches_torch():
    logits, target = rand_logits_target(c=5, seed=3)
    ours = float(multi_cross_entropy(jnp.array(logits), jnp.array(target)))
    ref = torch_ce(logits, target, weight=[1.0, 5.0, 100.0, 90.0, 100.0])
    assert ours == pytest.approx(ref, rel=1e-5)


def test_focal_loss_matches_reference_math():
    """Oracle re-derives models/losses.py:176-196 with torch ops."""
    logits, target = rand_logits_target(c=2, seed=4)
    lg = torch.tensor(logits).permute(0, 3, 1, 2)
    tg = torch.tensor(target)
    p = F.softmax(lg, dim=1)
    logp = F.log_softmax(lg, dim=1)
    one_hot = torch.zeros_like(p).scatter_(1, tg.unsqueeze(1), 1.0) + 1e-6
    focal = -0.5 * (1.0 - p) ** 2.0 * logp
    ref = torch.einsum("bc...,bc...->b...", one_hot, focal).mean().item()
    ours = float(focal_loss(jnp.array(logits), jnp.array(target)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_dice_argmax_value_and_no_gradient():
    logits, target = rand_logits_target(seed=5)
    val = float(dice_argmax(jnp.array(logits), jnp.array(target)))
    # Oracle: smp binary dice on sigmoid(argmax), batch flattened.
    pred = 1.0 / (1.0 + np.exp(-(logits.argmax(-1).astype(np.float32))))
    t = target.astype(np.float32)
    inter = (pred * t).sum()
    dice = 2 * inter / max(pred.sum() + t.sum(), 1e-7)
    expected = (1 - dice) * (t.sum() > 0)
    assert val == pytest.approx(float(expected), rel=1e-5)

    # No gradient flows through the dice term (reference argmax quirk).
    import jax

    g = jax.grad(lambda lg: dice_argmax(lg, jnp.array(target)))(jnp.array(logits))
    assert float(jnp.abs(g).max()) == 0.0


def test_levir_train_loss_branches():
    logits, target = rand_logits_target(seed=6)
    multi = float(levir_train_loss(jnp.array(logits), jnp.array(target), batch_size=2))
    expected = float(dice_argmax(jnp.array(logits), jnp.array(target))) + float(
        focal_loss(jnp.array(logits), jnp.array(target))
    )
    assert multi == pytest.approx(expected, rel=1e-5)
    single = float(levir_train_loss(jnp.array(logits), jnp.array(target), batch_size=1))
    assert single == pytest.approx(torch_ce(logits, target, weight=[1.0, 1.0]), rel=1e-5)


def test_levir_train_loss_ignores_padded_255_rows():
    """Multi-device ragged-tail padding labels whole samples 255; the train
    loss must equal the loss of the unpadded batch (ADVICE r1: 255s inflated
    dice cardinality and diluted the focal mean)."""
    logits, target = rand_logits_target(seed=8)
    rng = np.random.default_rng(8)
    pad_logits = rng.normal(size=(1,) + logits.shape[1:]).astype(np.float32)
    logits_p = np.concatenate([logits, pad_logits], axis=0)
    target_p = np.concatenate(
        [target, np.full((1,) + target.shape[1:], 255, target.dtype)], axis=0)
    clean = float(levir_train_loss(jnp.array(logits), jnp.array(target), batch_size=2))
    padded = float(levir_train_loss(jnp.array(logits_p), jnp.array(target_p), batch_size=2))
    assert padded == pytest.approx(clean, rel=1e-5)


def test_focal_loss_xbd_matches_torch_oracle():
    """focal_loss_xBD (models/losses.py:243-264) — the reference function
    hardcodes .cuda() so the oracle re-states its math in torch CPU ops."""
    import torch

    from dahitra_tpu.losses.cd import focal_loss_xbd

    rng = np.random.default_rng(11)
    logits = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    target = rng.integers(0, 5, (2, 8, 8)).astype(np.int32)

    tl = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)).copy())
    tt = torch.from_numpy(target.astype(np.int64))

    def focal2d(o, t, gamma=2):
        o = torch.clamp(torch.sigmoid(o), 1e-8, 1 - 1e-8)
        t = torch.clamp(t, 1e-8, 1 - 1e-8)
        pt = (1 - t) * (1 - o) + t * o
        return (-(1 - pt) ** gamma * torch.log(pt)).mean()

    ref = sum(w * focal2d(tl[:, c], (tt == c).float()).item()
              for c, w in enumerate((0.01, 0.1, 2, 1.5, 2)))
    ours = float(focal_loss_xbd(jnp.array(logits), jnp.array(target)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_ce_dice_is_unweighted_ce_plus_dice():
    logits, target = rand_logits_target(seed=7)
    ours = float(ce_dice(jnp.array(logits), jnp.array(target)))
    expected = 0.5 * torch_ce(logits, target) + 0.5 * float(
        dice_argmax(jnp.array(logits), jnp.array(target))
    )
    assert ours == pytest.approx(expected, rel=1e-5)


# ---------------- xBD / xView2-solution losses ----------------


def test_stable_bce_matches_torch():
    rng = np.random.default_rng(8)
    x = rng.normal(size=(2, 16, 16)).astype(np.float32)
    t = (rng.random((2, 16, 16)) > 0.5).astype(np.float32)
    ref = F.binary_cross_entropy_with_logits(torch.tensor(x), torch.tensor(t)).item()
    ours = float(stable_bce(jnp.array(x), jnp.array(t)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_soft_dice_and_jaccard():
    rng = np.random.default_rng(9)
    p = rng.random((2, 8, 8)).astype(np.float32)
    t = (rng.random((2, 8, 8)) > 0.5).astype(np.float32)
    inter = (p * t).sum()
    ref_dice = 1 - (2 * inter + 1e-6) / (p.sum() + t.sum() + 1e-6)
    ref_jac = 1 - (inter + 1e-6) / (p.sum() + t.sum() - inter + 1e-6)
    assert float(soft_dice_loss(jnp.array(p), jnp.array(t))) == pytest.approx(
        float(ref_dice), rel=1e-5
    )
    assert float(jaccard_loss(jnp.array(p), jnp.array(t))) == pytest.approx(
        float(ref_jac), rel=1e-5
    )


def test_focal2d_with_ignore():
    rng = np.random.default_rng(10)
    p = rng.random((2, 8, 8)).astype(np.float32)
    t = (rng.random((2, 8, 8)) > 0.5).astype(np.float32)
    t[0, 0, :] = 255.0
    keep = t.ravel() != 255
    pc = np.clip(p.ravel()[keep], 1e-6, 1 - 1e-6)
    tc = np.clip(t.ravel()[keep], 1e-6, 1 - 1e-6)
    pt = (1 - tc) * (1 - pc) + tc * pc
    ref = float((-((1 - pt) ** 2) * np.log(pt)).mean())
    ours = float(focal_loss_2d(jnp.array(p), jnp.array(t)))
    assert ours == pytest.approx(ref, rel=1e-5)


def lovasz_grad_np(gt_sorted):
    gts = gt_sorted.sum()
    inter = gts - np.cumsum(gt_sorted)
    union = gts + np.cumsum(1 - gt_sorted)
    jac = 1 - inter / union
    out = jac.copy()
    out[1:] = jac[1:] - jac[:-1]
    return out


def test_lovasz_hinge_matches_numpy():
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 6, 6)).astype(np.float32)
    t = (rng.random((2, 6, 6)) > 0.5).astype(np.float32)
    signs = 2 * t.ravel() - 1
    errors = 1 - x.ravel() * signs
    order = np.argsort(-errors, kind="stable")
    grad = lovasz_grad_np(t.ravel()[order])
    ref = float(np.dot(np.maximum(errors[order], 0), grad))
    ours = float(lovasz_hinge(jnp.array(x), jnp.array(t)))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_lovasz_sigmoid_matches_numpy():
    rng = np.random.default_rng(12)
    p = rng.random((2, 6, 6)).astype(np.float32)
    t = (rng.random((2, 6, 6)) > 0.5).astype(np.float32)
    errors = np.abs(t.ravel() - p.ravel())
    order = np.argsort(-errors, kind="stable")
    grad = lovasz_grad_np(t.ravel()[order])
    ref = float(np.dot(np.maximum(errors[order], 0), grad))
    ours = float(lovasz_sigmoid(jnp.array(p), jnp.array(t)))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_combo_loss_weighted_sum():
    rng = np.random.default_rng(13)
    x = rng.normal(size=(2, 8, 8)).astype(np.float32)
    t = (rng.random((2, 8, 8)) > 0.5).astype(np.float32)
    combo = ComboLoss({"dice": 1.0, "focal": 8.0})
    probs = 1 / (1 + np.exp(-x))
    expected = float(soft_dice_loss(jnp.array(probs), jnp.array(t))) + 8.0 * float(
        focal_loss_2d(jnp.array(probs), jnp.array(t))
    )
    assert float(combo(jnp.array(x), jnp.array(t))) == pytest.approx(expected, rel=1e-5)


def test_xbd_damage_loss_runs_and_is_finite():
    rng = np.random.default_rng(14)
    logits = rng.normal(size=(2, 16, 16, 5)).astype(np.float32)
    masks = (rng.random((2, 16, 16, 5)) > 0.7).astype(np.float32)
    val = float(xbd_damage_loss(jnp.array(logits), jnp.array(masks)))
    assert np.isfinite(val) and val > 0
