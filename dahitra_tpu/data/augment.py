"""On-device pair-consistent augmentation (jit-compiled, static shapes).

Parity target: datasets/data_utils.py:26-113 (CDDataAugmentation) with the
host->device boundary moved before augmentation: the loader ships raw uint8
crops; flips, blur, and normalization are one fused XLA program that runs
on TPU, vmapped over the batch with per-sample PRNG keys.

Semantics preserved from the reference's train path:
  * random hflip p=0.5, random vflip p=0.5, pair-consistent incl. label
    (data_utils.py:84-90).
  * Gaussian blur applied to the images on EVERY training sample — the
    reference gates on ``random.random() > 0`` which is always true
    (data_utils.py:99-102) — with radius ~ U[0,1). PIL's GaussianBlur is a
    3-pass box approximation; we use a 7-tap separable true Gaussian with
    sigma = radius (radius < 1 keeps the support inside 7 taps). Documented
    divergence: identical in expectation, different tails.
  * normalize: x/255 then (x-0.5)/0.5 -> [-1, 1] (data_utils.py:104-111).
  * rot90 augmentation exists in the reference but is disabled in every
    dataset config (with_random_rot defaults False) — implemented and off
    by default.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BLUR_TAPS = 7


def normalize_images(x: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 (.., 3) -> [-1, 1] float (torchvision ToTensor + Normalize(.5, .5))."""
    x = x.astype(dtype) / 255.0
    return (x - 0.5) / 0.5


def _gaussian_kernel(sigma: jax.Array) -> jax.Array:
    """7-tap normalized Gaussian; sigma -> 0 degenerates to identity."""
    half = _BLUR_TAPS // 2
    offs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    sig = jnp.maximum(sigma, 1e-4)
    w = jnp.exp(-0.5 * (offs / sig) ** 2)
    return w / jnp.sum(w)


def _separable_blur(img: jax.Array, sigma: jax.Array) -> jax.Array:
    """Depthwise separable Gaussian blur on one (H, W, C) image.

    Seven static shifted slices per axis, weighted and summed — XLA fuses
    the whole thing into one elementwise chain. Replicate-pad approximates
    PIL's edge handling.

    Each axis pass accumulates in fp32 (the kernel weights are fp32, so
    promotion does this for free) but STORES in the image dtype: under the
    bf16 training path the materialized inter-pass buffer is then half the
    bytes. bf16 storage loses ~2^-9 relative — less than the reference's
    own blur quantization (PIL GaussianBlur rounds to uint8 between passes,
    datasets/data_utils.py:99-102).
    """
    k = _gaussian_kernel(sigma)
    half = _BLUR_TAPS // 2
    h, w = img.shape[0], img.shape[1]
    x = jnp.pad(img, ((half, half), (0, 0), (0, 0)), mode="edge")
    acc = jnp.zeros(img.shape, jnp.float32)
    for i in range(_BLUR_TAPS):
        acc = acc + k[i] * x[i:i + h]
    x = jnp.pad(acc.astype(img.dtype), ((0, 0), (half, half), (0, 0)),
                mode="edge")
    acc = jnp.zeros(img.shape, jnp.float32)
    for i in range(_BLUR_TAPS):
        acc = acc + k[i] * x[:, i:i + w]
    return acc.astype(img.dtype)


def _augment_one(a, b, label, key, hflip, vflip, blur, rot, dtype):
    """Flips/rot run on the raw uint8 arrays (exact, 4x fewer bytes than
    fp32); the cast to the compute dtype happens only at the blur/normalize
    stage. Train-step cost of this stage measured 4.16 -> ~1 ms at b64
    (train_roofline.json 'aug')."""
    ka, kb, kc, kd = jax.random.split(key, 4)
    if hflip:
        do = jax.random.bernoulli(ka)
        a, b = (jnp.where(do, x[:, ::-1], x) for x in (a, b))
        label = jnp.where(do, label[:, ::-1], label)
    if vflip:
        do = jax.random.bernoulli(kb)
        a, b = (jnp.where(do, x[::-1], x) for x in (a, b))
        label = jnp.where(do, label[::-1], label)
    if rot:
        do = jax.random.bernoulli(kc)
        k90 = jax.random.randint(kc, (), 1, 4)
        rot_all = lambda x: jax.lax.switch(
            k90 - 1, [lambda t: jnp.rot90(t), lambda t: jnp.rot90(t, 2),
                      lambda t: jnp.rot90(t, 3)], x)
        a = jnp.where(do, rot_all(a), a)
        b = jnp.where(do, rot_all(b), b)
        label = jnp.where(do, rot_all(label[..., None])[..., 0], label)
    a = a.astype(dtype) / jnp.asarray(255.0, dtype)
    b = b.astype(dtype) / jnp.asarray(255.0, dtype)
    if blur:
        sigma = jax.random.uniform(kd)  # PIL radius ~ U[0,1)
        a = _separable_blur(a, sigma)
        b = _separable_blur(b, sigma)
    return a, b, label


@functools.partial(jax.jit, static_argnames=("train", "hflip", "vflip",
                                             "blur", "rot", "dtype"))
def augment_pairs(a_u8: jax.Array, b_u8: jax.Array, label_u8: jax.Array,
                  key: jax.Array, train: bool = True, hflip: bool = True,
                  vflip: bool = True, blur: bool = True, rot: bool = False,
                  dtype=jnp.float32):
    """Batch augmentation: (B,H,W,3) uint8 pairs + (B,H,W) labels ->
    normalized float images + int32 labels."""
    if train:
        keys = jax.random.split(key, a_u8.shape[0])
        a, b, label_u8 = jax.vmap(
            lambda aa, bb, ll, kk: _augment_one(aa, bb, ll, kk, hflip, vflip,
                                                blur, rot, dtype)
        )(a_u8, b_u8, label_u8, keys)
    else:
        a = a_u8.astype(dtype) / jnp.asarray(255.0, dtype)
        b = b_u8.astype(dtype) / jnp.asarray(255.0, dtype)
    label = label_u8.astype(jnp.int32)
    half = jnp.asarray(0.5, dtype)
    a = (a - half) / half
    b = (b - half) / half
    return a, b, label
