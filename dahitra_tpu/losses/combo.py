"""xBD-stack segmentation losses (xView2-solution family), TPU-native.

Functional parity targets (reference, /root/reference/xBD_code/losses.py):
  * :14-45   soft_dice_loss / jaccard (per_image=False flattens the batch).
  * :70-80   StableBCELoss on logits.
  * :95-126  ComboLoss — weighted sum over named losses, sigmoid applied
    once for the members in ``expect_sigmoid``.
  * :129-226 Lovasz hinge / sigmoid. Torch filters ignore-labeled pixels
    (dynamic shape); here ignored pixels are masked by routing them to the
    tail of the descending sort with zero contribution, keeping shapes
    static for XLA.
  * :273-289 FocalLoss2d (gamma 2, eps 1e-6, ignore 255) on probabilities.
  * xBD_code/train.py:316,348-353 — the damage-training recipe:
    sum_i w_i * ComboLoss{dice:1, focal:8}(out[..., i], msk[..., i]),
    w = [0.05, 0.2, 0.8, 0.7, 0.4]; localization uses {dice:1, focal:10}
    (train_loc.py:310).

Inputs are channel-last: per-class calls take (B, H, W) logits/targets.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

EPS = 1e-6


def stable_bce(logits: jax.Array, target: jax.Array) -> jax.Array:
    x = logits.reshape(-1).astype(jnp.float32)
    t = target.reshape(-1).astype(jnp.float32)
    return jnp.mean(jnp.clip(x, 0, None) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))


def soft_dice_loss(probs: jax.Array, target: jax.Array, per_image: bool = False) -> jax.Array:
    b = probs.shape[0] if per_image else 1
    p = probs.reshape(b, -1).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.float32)
    inter = jnp.sum(p * t, axis=1)
    union = jnp.sum(p, axis=1) + jnp.sum(t, axis=1) + EPS
    return jnp.mean(1.0 - (2.0 * inter + EPS) / union)


def jaccard_loss(probs: jax.Array, target: jax.Array, per_image: bool = False) -> jax.Array:
    b = probs.shape[0] if per_image else 1
    p = probs.reshape(b, -1).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.float32)
    inter = jnp.sum(p * t, axis=1)
    union = jnp.sum(p, axis=1) + jnp.sum(t, axis=1) - inter + EPS
    return jnp.mean(1.0 - (inter + EPS) / union)


def focal_loss_2d(
    probs: jax.Array, target: jax.Array, gamma: float = 2.0, ignore_index: int = 255
) -> jax.Array:
    """Binary focal on probabilities with ignore masking (losses.py:273-289)."""
    p = probs.reshape(-1).astype(jnp.float32)
    t_raw = target.reshape(-1).astype(jnp.float32)
    keep = (t_raw != ignore_index).astype(jnp.float32)
    p = jnp.clip(p, EPS, 1.0 - EPS)
    t = jnp.clip(t_raw, EPS, 1.0 - EPS)
    pt = (1.0 - t) * (1.0 - p) + t * p
    per_px = -jnp.power(1.0 - pt, gamma) * jnp.log(pt)
    return jnp.sum(per_px * keep) / jnp.maximum(jnp.sum(keep), 1.0)


def _lovasz_grad(gt_sorted: jax.Array) -> jax.Array:
    """Gradient of the Lovasz extension w.r.t. sorted errors (losses.py:129-141)."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted, axis=0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=0)
    jaccard = 1.0 - intersection / union
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]], axis=0)


def _lovasz_hinge_flat(logits: jax.Array, labels: jax.Array, valid: jax.Array) -> jax.Array:
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    # Ignored pixels: error -> -inf (sorts last, relu kills the dot term),
    # label -> 0 (no effect on the prefix cumsums used by valid entries).
    errors = jnp.where(valid, errors, -1e9)
    labels = jnp.where(valid, labels, 0.0)
    order = jnp.argsort(-errors, axis=0)
    errors_sorted = jnp.take(errors, order)
    gt_sorted = jnp.take(labels, order)
    grad = _lovasz_grad(gt_sorted)
    return jnp.dot(jax.nn.relu(errors_sorted), jax.lax.stop_gradient(grad))


def lovasz_hinge(
    logits: jax.Array, target: jax.Array, per_image: bool = False, ignore_index: int = 255
) -> jax.Array:
    """Binary Lovasz hinge on logits (losses.py:144-177)."""
    b = logits.shape[0]
    lg = logits.reshape(b, -1).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.float32)
    valid = t != ignore_index
    if per_image:
        losses = jax.vmap(_lovasz_hinge_flat)(lg, t, valid)
        return jnp.mean(losses)
    return _lovasz_hinge_flat(lg.reshape(-1), t.reshape(-1), valid.reshape(-1))


def _lovasz_sigmoid_flat(probs: jax.Array, labels: jax.Array, valid: jax.Array) -> jax.Array:
    errors = jnp.abs(labels - probs)
    errors = jnp.where(valid, errors, -1e9)
    labels = jnp.where(valid, labels, 0.0)
    order = jnp.argsort(-errors, axis=0)
    errors_sorted = jnp.take(errors, order)
    fg_sorted = jnp.take(labels, order)
    grad = _lovasz_grad(fg_sorted)
    # Ignored entries sit at the tail with errors -1e9; clamp to 0 so they
    # contribute nothing (the torch reference drops them outright).
    return jnp.dot(jax.nn.relu(errors_sorted), jax.lax.stop_gradient(grad))


def lovasz_sigmoid(
    probs: jax.Array, target: jax.Array, per_image: bool = False, ignore_index: int = 255
) -> jax.Array:
    """Lovasz on probabilities (losses.py:195-225)."""
    b = probs.shape[0]
    p = probs.reshape(b, -1).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.float32)
    valid = t != ignore_index
    if per_image:
        losses = jax.vmap(_lovasz_sigmoid_flat)(p, t, valid)
        return jnp.mean(losses)
    return _lovasz_sigmoid_flat(p.reshape(-1), t.reshape(-1), valid.reshape(-1))


_EXPECT_SIGMOID = {"dice", "focal", "jaccard", "lovasz_sigmoid", "mask_bceavg"}


class ComboLoss:
    """Weighted sum of named segmentation losses (xBD_code/losses.py:95-126).

    ``weights`` maps loss names to scalar weights; sigmoid is applied once
    and shared by the members that expect probabilities.
    """

    def __init__(self, weights: Dict[str, float], per_image: bool = False):
        self.weights = dict(weights)
        self.per_image = per_image

    def __call__(self, logits: jax.Array, target: jax.Array) -> jax.Array:
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        total = jnp.float32(0.0)
        for name, w in self.weights.items():
            if not w:
                continue
            if name == "bce":
                val = stable_bce(logits, target)
            elif name == "dice":
                val = soft_dice_loss(probs, target, per_image=False)
            elif name == "jaccard":
                val = jaccard_loss(probs, target, per_image=False)
            elif name == "focal":
                val = focal_loss_2d(probs, target)
            elif name == "lovasz":
                val = lovasz_hinge(logits, target, per_image=self.per_image)
            elif name == "lovasz_sigmoid":
                val = lovasz_sigmoid(probs, target, per_image=self.per_image)
            elif name == "mask_bceavg":
                p = jnp.clip(probs.reshape(-1), EPS, 1.0 - EPS)
                t = target.reshape(-1).astype(jnp.float32)
                val = -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
            else:
                raise KeyError(f"unknown combo loss member: {name}")
            total = total + w * val
        return total


# The xBD damage-classification recipe (xBD_code/train.py:316,348-353).
XBD_CLASS_WEIGHTS = (0.05, 0.2, 0.8, 0.7, 0.4)


def xbd_damage_loss(logits: jax.Array, masks: jax.Array) -> jax.Array:
    """Per-channel ComboLoss{dice:1, focal:8}, channel-weighted.

    ``logits``/``masks``: (B, H, W, 5) channel-last.
    """
    seg = ComboLoss({"dice": 1.0, "focal": 8.0})
    total = jnp.float32(0.0)
    for i, w in enumerate(XBD_CLASS_WEIGHTS):
        total = total + w * seg(logits[..., i], masks[..., i])
    return total


def xbd_localization_loss(logits: jax.Array, mask: jax.Array) -> jax.Array:
    """ComboLoss{dice:1, focal:10} on the single loc channel (train_loc.py:310)."""
    seg = ComboLoss({"dice": 1.0, "focal": 10.0})
    return seg(logits[..., 0] if logits.ndim == 4 else logits, mask)


def _masks_to_class_target(masks: jax.Array) -> jax.Array:
    """Invert channel 0 then argmax over channels — the CE target used by
    the adaptation/GAN recipes (train_adapt.py:332-334, train_GAN.py:366-368)."""
    inv = masks.at[..., 0].set(1.0 - masks[..., 0])
    return jnp.argmax(inv, axis=-1)


def xbd_adapt_loss(logits: jax.Array, masks4: jax.Array) -> jax.Array:
    """Domain-adaptation loss (train_adapt.py:320-340): per-channel
    ComboLoss{dice:1, focal:8} weighted [0.1, 0.8, 2, 8] over the 4 merged
    channels + 5x weighted CE (weights [0.1, 0.5, 1.5, 1.5])."""
    from dahitra_tpu.losses.cd import cross_entropy

    seg = ComboLoss({"dice": 1.0, "focal": 8.0})
    w = (0.1, 0.8, 2.0, 8.0)
    loss = jnp.float32(0.0)
    for i, wi in enumerate(w):
        loss = loss + wi * seg(logits[..., i], masks4[..., i])
    target = _masks_to_class_target(masks4.astype(jnp.float32))
    loss = loss + 5.0 * cross_entropy(logits, target,
                                      weight=jnp.array([0.1, 0.5, 1.5, 1.5]))
    return loss


def bce_with_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    return stable_bce(logits, target)


def xbd_gan_generator_loss(logits: jax.Array, masks5: jax.Array,
                           disc_fake_logits: jax.Array,
                           effective_gan: bool = False) -> jax.Array:
    """GAN-trainer generator loss (train_GAN.py:364-377):
    seg ComboLoss{dice:1, focal:8} on the loc channel + 5x weighted CE
    (weights [0.1, 0.5, 1.5, 1.5, 1.5]) + 0.01 * BCE(D(pred), 1).

    Reference quirk: the adversarial term is computed on ``out.detach()``
    (train_GAN.py:374) so NO gradient reaches the generator from it; we
    replicate with stop_gradient unless ``effective_gan`` enables the
    intended path (the caller controls where disc_fake_logits came from).
    """
    from dahitra_tpu.losses.cd import cross_entropy

    seg = ComboLoss({"dice": 1.0, "focal": 8.0})
    loss = seg(logits[..., 0], masks5[..., 0])
    target = _masks_to_class_target(masks5.astype(jnp.float32))
    loss = loss + 5.0 * cross_entropy(
        logits, target, weight=jnp.array([0.1, 0.5, 1.5, 1.5, 1.5]))
    adv = bce_with_logits(disc_fake_logits, jnp.ones_like(disc_fake_logits))
    if not effective_gan:
        adv = jax.lax.stop_gradient(adv)
    return loss + 0.01 * adv


def dual_hrnet_loss(out: dict, masks5: jax.Array) -> jax.Array:
    """Dual-HRNet split loss (xBD_code/train_dual_hrnet.py:318-346).

    loc: ComboLoss{dice:1, focal:8} on ``argmax`` of the 2-class loc logits
    (train_dual_hrnet.py:336-337 — the argmax makes this term carry no
    gradient, replicated via stop_gradient; the training signal is the cls
    term). cls: 5x weighted CE (weights [0.1, 2, 1, 2]) vs the argmax of
    the damage mask channels. Both heads are upsampled to the mask
    resolution first with NEAREST interpolation (:333-334 —
    ``F.interpolate`` without a mode argument defaults to nearest).
    Verified numerically against the reference loss composition in
    tests/test_dual_hrnet.py.
    """
    from dahitra_tpu.losses.cd import cross_entropy

    h, w = masks5.shape[1], masks5.shape[2]
    loc = out["loc"].astype(jnp.float32)
    cls = out["cls"].astype(jnp.float32)
    loc = jax.image.resize(loc, (loc.shape[0], h, w, loc.shape[-1]), "nearest")
    cls = jax.image.resize(cls, (cls.shape[0], h, w, cls.shape[-1]), "nearest")

    loc_pred = jax.lax.stop_gradient(
        jnp.argmax(loc, axis=-1).astype(jnp.float32))
    seg = ComboLoss({"dice": 1.0, "focal": 8.0})
    loss_seg = seg(loc_pred, masks5[..., 0])

    true_bldg = jnp.argmax(masks5[..., 1:], axis=-1)
    loss_cls = 5.0 * cross_entropy(cls, true_bldg,
                                   weight=jnp.array([0.1, 2.0, 1.0, 2.0]))
    return loss_seg + loss_cls


def xbd_gan_discriminator_loss(real_logits: jax.Array,
                               fake_logits: jax.Array) -> jax.Array:
    """0.1 * (BCE(D(real), 1) + BCE(D(fake), 0)) / 2 (train_GAN.py:350-361)."""
    l1 = bce_with_logits(real_logits, jnp.ones_like(real_logits))
    l0 = bce_with_logits(fake_logits, jnp.zeros_like(fake_logits))
    return 0.1 * (l1 + l0) / 2.0
