"""Change-detection (LEVIR stack) losses, channel-last (NHWC) logits.

Functional parity targets (reference, /root/reference):
  * models/losses.py:9-26    cross_entropy — class weights [1,1], ignore 255,
    bilinear resize of logits to the target size.
  * models/losses.py:58-196  focal_loss — kornia-style softmax focal with the
    one-hot + 1e-6 epsilon quirk, alpha 0.5, gamma 2.
  * models/losses.py:333-339 diceloss — smp binary DiceLoss applied to
    ``sigmoid(argmax(logits))``. The argmax makes this term constant w.r.t.
    the parameters (zero gradient); the reference's training signal comes
    entirely from the focal term. We replicate the value under
    ``stop_gradient`` and document the quirk.
  * models/losses.py:283-301 multi_cross_entropy — weights [1,5,100,90,100].
  * models/losses.py:305-330 ce_dice — the reference builds a weight tensor
    but passes the (None) ``weight`` argument, so its CE is unweighted; we
    match that behavior.
  * models/trainer.py:254-261 levir_train_loss — dice+focal when batch>1,
    else weighted CE (the CLI --loss flag is ignored by the reference
    trainer; we preserve that contract behind ``levir_train_loss``).

All functions take ``logits`` of shape (B, H, W, C) and integer ``target``
of shape (B, H, W) (a trailing singleton channel is squeezed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _squeeze_target(target: jax.Array) -> jax.Array:
    if target.ndim == 4 and target.shape[-1] == 1:
        target = target[..., 0]
    return target.astype(jnp.int32)


def _maybe_resize_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Bilinear-resize logits to the target's spatial shape.

    The reference resizes with align_corners=True (models/losses.py:22);
    jax.image 'linear' uses half-pixel centers. The resize only triggers for
    multi-scale heads (ChangeFormer) where the training recipe tolerates the
    small interpolation difference.
    """
    th, tw = target.shape[1], target.shape[2]
    if logits.shape[1] != th or logits.shape[2] != tw:
        logits = jax.image.resize(
            logits, (logits.shape[0], th, tw, logits.shape[3]), method="linear"
        )
    return logits


def cross_entropy(
    logits: jax.Array,
    target: jax.Array,
    weight=None,
    ignore_index: int = 255,
) -> jax.Array:
    """Weighted softmax CE with ignore label (models/losses.py:9-26).

    Torch's weighted mean reduction divides by the sum of per-pixel class
    weights, which we match. Default weight is all-ones (the reference uses
    [1, 1]).
    """
    target = _squeeze_target(target)
    logits = _maybe_resize_logits(logits, target)
    n_class = logits.shape[-1]
    if weight is None:
        weight = jnp.ones((n_class,), jnp.float32)
    else:
        weight = jnp.asarray(weight, jnp.float32)

    valid = (target != ignore_index) & (target >= 0) & (target < n_class)
    tgt = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    w = weight[tgt] * valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def focal_loss(
    logits: jax.Array,
    target: jax.Array,
    alpha: float = 0.5,
    gamma: float = 2.0,
    ignore_index=None,
) -> jax.Array:
    """Kornia-style softmax focal loss (models/losses.py:106-196).

    Replicates the reference's one-hot construction which adds 1e-6 to every
    class entry (models/losses.py:104), so each pixel contributes a small
    term for every class, and the mean is over all pixels. ``ignore_index``
    (off by default — the reference has none) drops masked pixels from the
    mean; the multi-device loader pads ragged tails with label 255 and those
    pixels must not dilute the loss.
    """
    target = _squeeze_target(target)
    logits = logits.astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    if ignore_index is not None:
        valid = (target != ignore_index).astype(jnp.float32)
        tgt = jnp.where(target == ignore_index, 0, target)
        one_hot = jax.nn.one_hot(tgt, logits.shape[-1], dtype=jnp.float32) + 1e-6
        focal = -alpha * jnp.power(1.0 - p, gamma) * logp
        per_px = jnp.sum(one_hot * focal, axis=-1) * valid
        return jnp.sum(per_px) / jnp.maximum(jnp.sum(valid), 1.0)
    one_hot = jax.nn.one_hot(target, logits.shape[-1], dtype=jnp.float32) + 1e-6
    focal = -alpha * jnp.power(1.0 - p, gamma) * logp
    return jnp.mean(jnp.sum(one_hot * focal, axis=-1))


def dice_argmax(logits: jax.Array, target: jax.Array,
                ignore_index=None) -> jax.Array:
    """Binary dice on ``sigmoid(argmax(logits))`` (models/losses.py:333-339).

    smp.DiceLoss(mode='binary') defaults to from_logits=True, so the
    reference feeds argmax outputs {0,1} through a sigmoid -> {0.5, 0.731}.
    The argmax blocks gradients; we make that explicit with stop_gradient.
    smp zeroes the loss when the ground-truth channel is empty.
    ``ignore_index`` pixels (multi-device ragged-tail padding, label 255)
    are excluded from intersection and cardinality.
    """
    target_i = _squeeze_target(target)
    pred = jnp.argmax(logits, axis=-1).astype(jnp.float32)
    pred = jax.lax.stop_gradient(jax.nn.sigmoid(pred))
    if ignore_index is not None:
        valid = (target_i != ignore_index).astype(jnp.float32)
        pred = pred * valid
        target = target_i.astype(jnp.float32) * valid
    else:
        target = target_i.astype(jnp.float32)
    inter = jnp.sum(pred * target)
    card = jnp.sum(pred) + jnp.sum(target)
    dice = (2.0 * inter) / jnp.maximum(card, 1e-7)
    loss = 1.0 - dice
    nonempty = (jnp.sum(target) > 0).astype(jnp.float32)
    return loss * nonempty


def focal_loss_2d_sigmoid(logits: jax.Array, target: jax.Array,
                          gamma: float = 2.0) -> jax.Array:
    """focal_loss2D (models/losses.py:272-280): single-channel sigmoid focal
    where BOTH the probabilities and the {0,1} targets are clamped to
    [1e-8, 1-1e-8] (so a correct pixel still contributes ~0 loss but the
    target clamp is a faithful quirk)."""
    p = jnp.clip(jax.nn.sigmoid(logits.astype(jnp.float32)), 1e-8, 1.0 - 1e-8)
    t = jnp.clip(target.astype(jnp.float32), 1e-8, 1.0 - 1e-8)
    pt = (1.0 - t) * (1.0 - p) + t * p
    return jnp.mean(-((1.0 - pt) ** gamma) * jnp.log(pt))


XBD_FOCAL_WEIGHTS = (0.01, 0.1, 2.0, 1.5, 2.0)


def focal_loss_xbd(logits: jax.Array, target: jax.Array) -> jax.Array:
    """focal_loss_xBD (models/losses.py:243-264): per-class sigmoid focal
    over the 5 damage channels with hand weights [0.01, 0.1, 2, 1.5, 2].
    ``logits`` (B, H, W, 5) NHWC, ``target`` (B, H, W) int class ids."""
    target = _squeeze_target(target)
    loss = jnp.float32(0.0)
    for c, w in enumerate(XBD_FOCAL_WEIGHTS):
        loss = loss + w * focal_loss_2d_sigmoid(
            logits[..., c], (target == c).astype(jnp.float32))
    return loss


def multi_cross_entropy(logits: jax.Array, target: jax.Array) -> jax.Array:
    """5-class weighted CE, weights [1,5,100,90,100] (models/losses.py:283-301)."""
    return cross_entropy(logits, target, weight=jnp.array([1.0, 5.0, 100.0, 90.0, 100.0]))


def ce_dice(logits: jax.Array, target: jax.Array) -> jax.Array:
    """0.5*CE + 0.5*dice-on-argmax (models/losses.py:305-330).

    The reference constructs a [0.2, 0.8] weight tensor but passes the
    function's (None) ``weight`` through, so the CE is unweighted — matched.
    """
    return 0.5 * cross_entropy(logits, target) + 0.5 * dice_argmax(logits, target)


def levir_train_loss(logits: jax.Array, target: jax.Array, batch_size: int) -> jax.Array:
    """The loss the LEVIR trainer actually optimizes (models/trainer.py:254-261).

    dice(argmax) + focal for batch>1, else weighted CE. ``batch_size`` is
    static so the branch resolves at trace time. Label-255 pixels (the
    loader's ragged-tail padding on multi-device meshes) are masked out of
    every term; real LEVIR labels are {0, 1} so this is inert on the
    reference path.
    """
    if batch_size != 1:
        return (dice_argmax(logits, target, ignore_index=255)
                + focal_loss(logits, target, ignore_index=255))
    return cross_entropy(logits, target)
