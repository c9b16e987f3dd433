"""Data-pipeline tests: augmentation semantics, loader, LEVIR fixture IO."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahitra_tpu.data.augment import augment_pairs, normalize_images
from dahitra_tpu.data.levir import crop_origin, load_levir_split
from dahitra_tpu.data.loader import BatchLoader

FIXTURE_ROOT = "/root/reference/data/LEVIR_CD"


def rand_batch(n=2, s=16, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
            rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
            rng.integers(0, 2, (n, s, s)).astype(np.uint8))


def test_eval_path_is_pure_normalize():
    a, b, l = rand_batch()
    oa, ob, ol = augment_pairs(jnp.array(a), jnp.array(b), jnp.array(l),
                               jax.random.PRNGKey(0), train=False)
    np.testing.assert_allclose(np.asarray(oa),
                               (a.astype(np.float32) / 255 - 0.5) / 0.5,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ol), l.astype(np.int32))
    assert np.asarray(oa).min() >= -1.0 and np.asarray(oa).max() <= 1.0


def test_train_aug_is_deterministic_under_key():
    a, b, l = rand_batch()
    out1 = augment_pairs(jnp.array(a), jnp.array(b), jnp.array(l),
                         jax.random.PRNGKey(7), train=True)
    out2 = augment_pairs(jnp.array(a), jnp.array(b), jnp.array(l),
                         jax.random.PRNGKey(7), train=True)
    for x, y in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_flips_are_pair_and_label_consistent():
    """With blur disabled, each output must be one of the 4 flip variants of
    the input, with A/B/label all flipped identically."""
    a, b, l = rand_batch(n=8)
    oa, ob, ol = augment_pairs(jnp.array(a), jnp.array(b), jnp.array(l),
                               jax.random.PRNGKey(3), train=True, blur=False)
    na = np.asarray(oa) * 0.5 + 0.5
    nl = np.asarray(ol)
    for i in range(8):
        base = a[i].astype(np.float32) / 255
        variants = {
            (False, False): (base, l[i]),
            (True, False): (base[:, ::-1], l[i][:, ::-1]),
            (False, True): (base[::-1], l[i][::-1]),
            (True, True): (base[::-1, ::-1], l[i][::-1, ::-1]),
        }
        matched = [key for key, (img, lab) in variants.items()
                   if np.allclose(na[i], img, atol=1e-6)
                   and np.array_equal(nl[i], lab)]
        assert matched, f"sample {i} matches no flip variant"


def test_blur_sigma_zero_is_identity():
    from dahitra_tpu.data.augment import _separable_blur

    rng = np.random.default_rng(0)
    img = jnp.array(rng.random((8, 8, 3)).astype(np.float32))
    out = _separable_blur(img, jnp.float32(1e-6))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_blur_matches_scipy_gaussian():
    from dahitra_tpu.data.augment import _separable_blur
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(1)
    img = rng.random((16, 16, 1)).astype(np.float32)
    sigma = 0.8
    ours = np.asarray(_separable_blur(jnp.array(img), jnp.float32(sigma)))[..., 0]
    ref = gaussian_filter(img[..., 0], sigma=sigma, mode="nearest", truncate=3.75)
    np.testing.assert_allclose(ours, ref, atol=5e-3)


def test_crop_origin_reference_semantics():
    # Crop only when img_size < width // 2 (data_utils.py:76-78).
    assert crop_origin(1024, 256) == (256, 256)
    assert crop_origin(256, 256) is None
    assert crop_origin(1024, 256, patch=5) == (256 * (5 // 4), 256 * (5 % 4))
    assert crop_origin(1024, 512) is None  # 512 >= 1024//2


@pytest.mark.skipif(not os.path.isdir(FIXTURE_ROOT), reason="fixture absent")
def test_load_levir_fixture():
    pairs = load_levir_split(FIXTURE_ROOT, "train", 256, "norm")
    assert len(pairs) == 4
    assert pairs.a.shape == (4, 256, 256, 3) and pairs.a.dtype == np.uint8
    assert set(np.unique(pairs.label)) <= {0, 1}  # //255 applied


@pytest.mark.skipif(not os.path.isdir(FIXTURE_ROOT), reason="fixture absent")
def test_load_levir_missing_labels_gated():
    """Label-less splits (the in-tree val fixture ships only A/B) must raise
    unless the caller opts into all-zero labels — evaluating fabricated
    labels yields confidently wrong metrics."""
    with pytest.raises(FileNotFoundError):
        load_levir_split(FIXTURE_ROOT, "val", 256, "norm")
    pairs = load_levir_split(FIXTURE_ROOT, "val", 256, "norm",
                             allow_missing_labels=True)
    assert (pairs.label == 0).all()


def test_loader_shuffle_and_tail():
    arrays = {"a": np.arange(10)[:, None], "label": np.arange(10)[:, None]}
    loader = BatchLoader(arrays, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert [len(b["a"]) for b in batches] == [4, 4, 2]
    seen = np.sort(np.concatenate([b["a"][:, 0] for b in batches]))
    np.testing.assert_array_equal(seen, np.arange(10))
    # Two epochs shuffle differently.
    order1 = np.concatenate([b["a"][:, 0] for b in batches])
    order2 = np.concatenate([b["a"][:, 0] for b in list(loader)])
    assert not np.array_equal(order1, order2)


def test_loader_pad_to_multiple_marks_ignore():
    arrays = {"a": np.arange(5)[:, None],
              "label": np.zeros((5, 2, 2), np.uint8)}
    loader = BatchLoader(arrays, batch_size=4, pad_to_multiple=4)
    batches = list(loader)
    assert [len(b["a"]) for b in batches] == [4, 4]
    assert (batches[1]["label"][1:] == 255).all()
    assert (batches[1]["label"][0] == 0).all()


def test_multi_upsample_policy():
    """xBDatasetMulti-style deterministic upsampling (CD_dataset.py:233-249)."""
    import os
    import pytest as _pytest
    from dahitra_tpu.data.xbd import scan_xbd_files, split_and_upsample

    root = "/root/reference/data/xbd/train"
    if not os.path.isdir(root):
        _pytest.skip("fixture absent")
    files = scan_xbd_files([root])
    tr, va = split_and_upsample(files, seed=0, policy="multi")
    # Duplicated indices appear for damaged files; split covers everything.
    assert len(tr) + len(va) >= len(files)


def test_poly_and_sgdr_curves():
    from dahitra_tpu.train.optim import poly_lr, sgdr_lr

    assert poly_lr(1.0, 0, 100) == 1.0
    assert poly_lr(1.0, 100, 100) == 0.0
    assert poly_lr(1.0, 50, 100) == pytest.approx(0.5 ** 0.9)
    assert sgdr_lr(1.0, 0, 10) == pytest.approx(1.0)
    assert sgdr_lr(1.0, 5, 10) == pytest.approx(0.5)
    # Warm restart: back to base at the cycle boundary.
    assert sgdr_lr(1.0, 10, 10) == pytest.approx(1.0)
