"""Domain-adaptation and GAN trainer tests."""
import argparse
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahitra_tpu.data.xbd import build_damage_masks, ida_color_normalize
from dahitra_tpu.losses.combo import (xbd_adapt_loss,
                                      xbd_gan_discriminator_loss,
                                      xbd_gan_generator_loss)


def test_merge_34_masks():
    rng = np.random.default_rng(0)
    loc = (rng.random((16, 16)) > 0.5).astype(np.uint8) * 255
    dmg = rng.integers(0, 5, (16, 16)).astype(np.uint8)
    msk, lbl = build_damage_masks(loc, dmg, train=True, merge_34=True)
    assert msk.shape == (16, 16, 4)
    # Channel 3 is the union of damage classes 3 and 4 (train_adapt.py:150-152).
    np.testing.assert_array_equal(msk[..., 3], ((dmg == 3) | (dmg == 4)).astype(np.int32))
    assert lbl.max() <= 2


def test_ida_color_normalize_stats_shift():
    rng = np.random.default_rng(1)
    img = rng.integers(60, 120, (64, 64, 3)).astype(np.uint8)
    out = ida_color_normalize(img)
    assert out.dtype == np.uint8
    # The transform maps the xBD mean [87.4, 96.4, 74.7] near the IdaBD mean.
    probe = ida_color_normalize(np.full((4, 4, 3), [87, 96, 75], np.uint8))
    np.testing.assert_allclose(probe.reshape(-1, 3).mean(0),
                               [75.0, 74.0, 56.0], atol=2)


def test_adapt_loss_finite_and_graded():
    rng = np.random.default_rng(2)
    logits = jnp.array(rng.normal(size=(1, 32, 32, 4)).astype(np.float32))
    masks = jnp.array((rng.random((1, 32, 32, 4)) > 0.7).astype(np.float32))
    val = float(xbd_adapt_loss(logits, masks))
    assert np.isfinite(val) and val > 0
    g = jax.grad(lambda lg: xbd_adapt_loss(lg, masks))(logits)
    assert float(jnp.abs(g).max()) > 0


def test_gan_generator_loss_detach_quirk():
    rng = np.random.default_rng(3)
    logits = jnp.array(rng.normal(size=(1, 16, 16, 5)).astype(np.float32))
    masks = jnp.array((rng.random((1, 16, 16, 5)) > 0.7).astype(np.float32))
    fake = jnp.array(rng.normal(size=(1, 1000)).astype(np.float32))
    v = float(xbd_gan_generator_loss(logits, masks, fake))
    assert np.isfinite(v)
    # The adversarial term is stop-gradiented by default: grads w.r.t. the
    # disc logits must be zero, matching train_GAN.py:374's detach.
    g = jax.grad(lambda f: xbd_gan_generator_loss(logits, masks, f))(fake)
    assert float(jnp.abs(g).max()) == 0.0
    g2 = jax.grad(lambda f: xbd_gan_generator_loss(
        logits, masks, f, effective_gan=True))(fake)
    assert float(jnp.abs(g2).max()) > 0.0


def test_gan_discriminator_loss():
    real = jnp.full((1, 10), 5.0)
    fake = jnp.full((1, 10), -5.0)
    good = float(xbd_gan_discriminator_loss(real, fake))
    bad = float(xbd_gan_discriminator_loss(fake, real))
    assert good < bad


def _tiny_arrays(n=2, s=32, channels=5, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "img_pre": rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
        "img_post": rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
        "msk": rng.integers(0, 2, (n, s, s, channels)).astype(np.uint8),
        "lbl_msk": rng.integers(0, channels - 1, (n, s, s)).astype(np.uint8),
    }


@pytest.mark.slow
def test_adapt_trainer_smoke(tmp_path):
    from dahitra_tpu.train.xbd_engine import XBDTrainer
    from dahitra_tpu.core.mesh import make_mesh

    args = argparse.Namespace(
        net_G="xbd_adapt_res34", img_size=32, batch_size=2, val_batch_size=2,
        lr=0.0, max_epochs=1, checkpoint_dir=str(tmp_path), bf16=False,
        seed=0, warm_start_from=None)
    arrays = _tiny_arrays(channels=4)
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    trainer = XBDTrainer(args, arrays, arrays, mesh=mesh, task="adapt")
    trainer.train_one_epoch(0)
    scores = trainer.evaluate_and_checkpoint(0)
    assert np.isfinite(scores["score"])
    # Adapt mode has 3 damage classes (train_adapt.py:284-287); the harmonic
    # F1 must average only those — a phantom 4th class would collapse it to
    # ~4e-6 and the score to ~0.3*dice.
    assert len(scores["class_f1"]) == 3
    assert scores["damage_f1"] > 1e-3


@pytest.mark.slow
def test_gan_trainer_smoke(tmp_path):
    from dahitra_tpu.train.xbd_engine import GANTrainer
    from dahitra_tpu.core.mesh import make_mesh

    args = argparse.Namespace(
        net_G="xbd_dahitra", img_size=32, batch_size=2, val_batch_size=2,
        lr=0.0, max_epochs=1, checkpoint_dir=str(tmp_path), bf16=False,
        seed=0, warm_start_from=None)
    arrays = _tiny_arrays(channels=5)
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    trainer = GANTrainer(args, arrays, arrays, mesh=mesh)
    trainer.train_one_epoch(0)
    scores = trainer.evaluate_and_checkpoint(0)
    assert np.isfinite(scores["score"])


@pytest.mark.slow
def test_gan_trainer_resumes_discriminator(tmp_path):
    """A killed GAN run resumes BOTH generator and discriminator states
    (the reference restarts D from scratch — train_GAN.py:300-310)."""
    from dahitra_tpu.train.xbd_engine import GANTrainer
    from dahitra_tpu.core.mesh import make_mesh
    import jax as _jax

    args = argparse.Namespace(
        net_G="xbd_dahitra", img_size=32, batch_size=2, val_batch_size=2,
        lr=0.0, max_epochs=1, checkpoint_dir=str(tmp_path), bf16=False,
        seed=0, warm_start_from=None)
    arrays = _tiny_arrays(channels=5)
    mesh = make_mesh(n_data=1, devices=_jax.devices()[:1])
    tr = GANTrainer(args, arrays, arrays, mesh=mesh)
    tr.train_one_epoch(0)
    tr.evaluate_and_checkpoint(0)
    import os as _os
    assert _os.path.exists(str(tmp_path / "best_ckpt_D"))
    d_params = _jax.tree.leaves(tr.d_state.params)

    tr2 = GANTrainer(args, arrays, arrays, mesh=mesh)  # fresh process sim
    assert int(tr2.d_state.step) == int(tr.d_state.step)
    for a, b in zip(d_params, _jax.tree.leaves(tr2.d_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
