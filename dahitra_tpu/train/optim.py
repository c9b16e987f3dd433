"""Optimizer and epoch-indexed LR schedules.

Parity targets (reference):
  * models/trainer.py:39-40 — AdamW(lr, betas=(0.9, 0.999), weight_decay=0.01)
    applied to ALL parameters (torch AdamW decays biases and norm affines
    too; we match rather than adopting the common JAX mask).
  * models/networks.py:22-49 — get_scheduler: 'linear' decays
    lr * (1 - epoch/(max_epochs+1)); 'step' multiplies by 0.1 every
    max_epochs//3 epochs; 'multistep' halves at fixed milestones. Schedules
    are epoch-indexed (constant within an epoch), matching torch's
    scheduler.step() placement (models/trainer.py:314).
  * xBD_code/train.py:439-441 — AdamW(lr 1e-4, wd 1e-6), MultiStepLR
    milestones gamma 0.6.
  * Gradient clipping: the LEVIR trainer calls clip_grad_norm_ AFTER
    optimizer.step() (models/trainer.py:307-308) — a no-op on the applied
    update, so the LEVIR path uses no clipping. The xBD scripts clip
    correctly before the step at max-norm 0.999 (xBD_code/train.py:373),
    exposed here via ``clip_norm``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import optax

LEVIR_MULTISTEP_MILESTONES = (2, 4, 7, 11, 15, 25, 35, 47, 60, 70, 90, 110,
                              130, 150, 170, 180, 190)
XBD_MULTISTEP_MILESTONES = (5, 11, 23, 29, 33, 47, 50, 60, 70, 90, 110, 130,
                            150, 170, 180, 190)


def epoch_lr(base_lr: float, epoch: int, policy: str, max_epochs: int,
             milestones: Sequence[int] = LEVIR_MULTISTEP_MILESTONES,
             gamma: float = 0.5, after_epoch_step: bool = False) -> float:
    """LR for a given epoch under the reference's policies.

    ``after_epoch_step`` selects the xBD call pattern
    ``scheduler.step(current_epoch)`` at epoch END (xBD_code/train.py:386,
    train_loc.py:228, train_adapt.py:358, train_GAN.py:392): torch's
    closed-form MultiStepLR then computes gamma^|{m <= epoch}| *for the
    following epoch*, so each drop takes effect one epoch AFTER its
    milestone. The LEVIR stack's no-arg ``scheduler.step()`` drops AT the
    milestone epoch (the default here).
    """
    if policy == "linear":
        return base_lr * (1.0 - epoch / float(max_epochs + 1))
    if policy == "step":
        step_size = max(max_epochs // 3, 1)
        return base_lr * (0.1 ** (epoch // step_size))
    if policy == "multistep":
        e = epoch - 1 if after_epoch_step else epoch
        n = sum(1 for m in milestones if e >= m)
        return base_lr * (gamma ** n)
    if policy == "constant":
        return base_lr
    raise NotImplementedError(f"learning rate policy [{policy}] is not implemented")


def poly_lr(base_lr: float, step: int, max_step: int,
            momentum: float = 0.9) -> float:
    """PolyOptimizer curve (misc/torchutils.py:361-392): lr scales by
    (1 - step/max_step)^0.9."""
    return base_lr * (1.0 - min(step, max_step) / float(max_step)) ** momentum


def sgdr_lr(base_lr: float, step: int, cycle_steps: int,
            min_lr_ratio: float = 0.0) -> float:
    """SGDR warm-restart cosine curve (misc/torchutils.py:430-466):
    cosine-anneals within each restart cycle."""
    import math

    t = (step % cycle_steps) / float(cycle_steps)
    lo = base_lr * min_lr_ratio
    return lo + 0.5 * (base_lr - lo) * (1.0 + math.cos(math.pi * t))


def make_optimizer(lr: float, weight_decay: float = 0.01,
                   b1: float = 0.9, b2: float = 0.999,
                   clip_norm: Optional[float] = None) -> optax.GradientTransformation:
    """AdamW with an injectable learning rate (set per epoch)."""
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=b1, b2=b2, weight_decay=weight_decay)
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Return a new optimizer-state pytree with the injected LR replaced.

    Works on a bare InjectHyperparamsState or one nested in an optax.chain
    tuple (the clip_norm case).
    """
    import jax.numpy as jnp

    def replace(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            hp = dict(s.hyperparams)
            hp["learning_rate"] = jnp.asarray(
                lr, dtype=jnp.result_type(hp["learning_rate"]))
            return s._replace(hyperparams=hp)
        return s

    if isinstance(opt_state, tuple) and not hasattr(opt_state, "hyperparams"):
        return type(opt_state)(replace(s) for s in opt_state)
    return replace(opt_state)


def current_learning_rate(opt_state) -> float:
    """Read back the injected learning rate (for logging)."""
    states = opt_state if (isinstance(opt_state, tuple)
                           and not hasattr(opt_state, "hyperparams")) else (opt_state,)
    for s in states:
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            return float(s.hyperparams["learning_rate"])
    raise ValueError("no injected learning_rate found in optimizer state")
