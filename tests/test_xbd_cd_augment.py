"""On-device CDDataAugmentation_xBD ops (datasets/data_utils.py:115-248 —
dead code in the reference, provided opt-in; see module docstring)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahitra_tpu.data.xbd_cd_augment import (augment_pairs_xbd_cd, box_blur3,
                                             brightness, clahe, contrast,
                                             gauss_noise, photometric_tree,
                                             saturation, scale_random_crop)


def _img(seed=0, h=40, w=40):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3)).astype(np.float32)


def test_blend_ops_match_reference_numpy():
    """saturation/brightness/contrast vs xBD_code/utils.py:36-58 verbatim."""
    img = _img(1)
    alpha = 0.93

    w = np.asarray([0.114, 0.587, 0.299]).reshape((1, 1, 3))

    def blend(i1, i2):
        return np.clip(i1 * alpha + (1 - alpha) * i2, 0, 255).astype("uint8")

    gs = np.sum(w * img, axis=2, keepdims=True)
    np.testing.assert_array_equal(np.asarray(saturation(jnp.array(img), alpha)),
                                  blend(img, gs).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(brightness(jnp.array(img), alpha)),
                                  blend(img, np.zeros_like(img)).astype(np.float32))
    gs_c = np.repeat(gs.mean(), 3) * np.ones_like(img)
    np.testing.assert_array_equal(np.asarray(contrast(jnp.array(img), alpha)),
                                  blend(img, gs_c).astype(np.float32))


def test_box_blur_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = _img(2)
    ref = cv2.blur(img, (3, 3))
    np.testing.assert_allclose(np.asarray(box_blur3(jnp.array(img))), ref,
                               atol=1e-3)


def test_gauss_noise_statistics():
    """Noise is non-negative integer-valued with ~var mean shift before the
    min-subtraction (utils.py:17-24 semantics)."""
    img = jnp.zeros((32, 32, 3), jnp.float32)
    out = np.asarray(gauss_noise(img, jax.random.PRNGKey(0)))
    assert (out >= 0).all() and (out == np.floor(out)).all()
    assert 10 < out.mean() < 70  # shifted-by-min noise keeps a positive mean


def test_clahe_flat_image_identity_like():
    """A constant image has a degenerate histogram: CLAHE's clipped CDF maps
    the single occupied bin near 255 * F(v); check monotone behavior on a
    gradient instead, plus bounded output."""
    grad = np.tile(np.linspace(0, 255, 40, dtype=np.float32)[None, :, None],
                   (40, 1, 3))
    out = np.asarray(clahe(jnp.array(grad)))
    assert out.shape == grad.shape
    assert out.min() >= 0.0 and out.max() <= 255.0
    # equalization of an already-uniform gradient should stay near-linear:
    mid_row = out[20, :, 0]
    assert np.all(np.diff(mid_row) >= -1.0)  # monotone non-decreasing-ish


def test_scale_random_crop_shapes_and_label_integrity():
    a = _img(3)
    b = _img(4)
    lbl = (np.arange(1600).reshape(40, 40) % 2).astype(np.float32)
    (ao, bo), lo = scale_random_crop((jnp.array(a), jnp.array(b)),
                                     jnp.array(lbl), jax.random.PRNGKey(7))
    assert ao.shape == a.shape and bo.shape == b.shape
    assert set(np.unique(np.asarray(lo))).issubset({0.0, 1.0})


def test_photometric_tree_is_mostly_identity():
    """Fire probability ≈ 3e-4/image: across 64 keys virtually all outputs
    must equal the input exactly."""
    img = jnp.array(_img(5))
    same = 0
    for i in range(64):
        out = photometric_tree(img, jax.random.PRNGKey(i))
        same += int(np.array_equal(np.asarray(out), np.asarray(img)))
    assert same >= 60


def test_batched_entry_point_runs():
    rng = np.random.default_rng(6)
    a = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    lbl = rng.integers(0, 2, (2, 32, 32)).astype(np.uint8)
    ao, bo, lo = augment_pairs_xbd_cd(jnp.array(a), jnp.array(b),
                                      jnp.array(lbl), jax.random.PRNGKey(0))
    assert ao.shape == (2, 32, 32, 3) and lo.dtype == jnp.int32
