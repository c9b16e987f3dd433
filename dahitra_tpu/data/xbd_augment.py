"""On-device xBD augmentation (jit, static shapes).

Parity target: xBD_code/train.py:118-142 — with probability 0.3 a block of
pair-consistent ops applies: hflip (p 0.7), vflip (p 0.7), resized-crop
(p 0.7; crop origin (x, y) with x, y ~ U{0..200}, crop to the bottom-right
remainder, resize back to full size), ColorJitter (p 0.3; brightness/
contrast/saturation factors ~ U[0.8, 1.2], images only).

Divergences (documented): torchvision's ColorJitter applies the three ops
in random order with PIL enhance semantics; we apply brightness, contrast,
saturation in fixed order with the standard linear definitions. The
resized-crop uses half-pixel bilinear sampling (align_corners=False), nearest
for masks.

Input normalization is the xBD convention x/127 - 1
(xBD_code/utils.py:112-116), exposed as ``normalize_xbd``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def normalize_xbd(img_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    return img_u8.astype(dtype) / 127.0 - 1.0


def _bilinear_sample(img: jax.Array, rows: jax.Array, cols: jax.Array) -> jax.Array:
    """Sample (H, W, C) at fractional (rows, cols) grids with edge clamp."""
    h, w = img.shape[0], img.shape[1]
    r0 = jnp.clip(jnp.floor(rows).astype(jnp.int32), 0, h - 1)
    c0 = jnp.clip(jnp.floor(cols).astype(jnp.int32), 0, w - 1)
    r1 = jnp.clip(r0 + 1, 0, h - 1)
    c1 = jnp.clip(c0 + 1, 0, w - 1)
    fr = jnp.clip(rows - r0, 0.0, 1.0)[..., None]
    fc = jnp.clip(cols - c0, 0.0, 1.0)[..., None]
    top = img[r0, c0] * (1 - fc) + img[r0, c1] * fc
    bot = img[r1, c0] * (1 - fc) + img[r1, c1] * fc
    return top * (1 - fr) + bot * fr


def _nearest_sample(img: jax.Array, rows: jax.Array, cols: jax.Array) -> jax.Array:
    h, w = img.shape[0], img.shape[1]
    r = jnp.clip(jnp.round(rows).astype(jnp.int32), 0, h - 1)
    c = jnp.clip(jnp.round(cols).astype(jnp.int32), 0, w - 1)
    return img[r, c]


def _resized_crop_grid(h: int, w: int, x: jax.Array, y: jax.Array):
    """Half-pixel coordinate grid for cropping (x, y)->(h, w) then resizing
    back to (h, w). x, y are traced scalars (top, left)."""
    ch = h - x
    cw = w - y
    i = jnp.arange(h, dtype=jnp.float32)
    j = jnp.arange(w, dtype=jnp.float32)
    rows = x + (i + 0.5) * (ch / h) - 0.5
    cols = y + (j + 0.5) * (cw / w) - 0.5
    return jnp.meshgrid(rows, cols, indexing="ij")


def _color_jitter(img: jax.Array, key: jax.Array) -> jax.Array:
    """Brightness/contrast/saturation in [0.8, 1.2]; img in [0, 1]."""
    kb, kc, ks = jax.random.split(key, 3)
    b = jax.random.uniform(kb, (), minval=0.8, maxval=1.2)
    c = jax.random.uniform(kc, (), minval=0.8, maxval=1.2)
    s = jax.random.uniform(ks, (), minval=0.8, maxval=1.2)
    img = img * b
    mean = jnp.mean(img, axis=(0, 1, 2), keepdims=True)
    img = (img - mean) * c + mean
    gray = jnp.mean(img, axis=-1, keepdims=True)
    img = (img - gray) * s + gray
    return jnp.clip(img, 0.0, 1.0)


def _augment_one(pre, post, msk, lbl, key, elastic=False):
    (k_apply, k_h, k_v, k_rc, k_xy, k_cj, k_cjk,
     k_el_pre, k_el_post) = jax.random.split(key, 9)
    apply_block = jax.random.bernoulli(k_apply, 0.3)

    do_h = apply_block & jax.random.bernoulli(k_h, 0.7)
    do_v = apply_block & jax.random.bernoulli(k_v, 0.7)
    do_rc = apply_block & jax.random.bernoulli(k_rc, 0.7)
    do_cj = apply_block & jax.random.bernoulli(k_cj, 0.3)

    flip_w = lambda t: jnp.where(do_h, t[:, ::-1], t)
    flip_h = lambda t: jnp.where(do_v, t[::-1], t)
    pre, post, msk = (flip_h(flip_w(t)) for t in (pre, post, msk))
    lbl = flip_h(flip_w(lbl[..., None]))[..., 0]

    h, w = pre.shape[0], pre.shape[1]
    max_off = min(200, h // 4)
    xy = jax.random.randint(k_xy, (2,), 0, max_off + 1)
    x = jnp.where(do_rc, xy[0], 0).astype(jnp.float32)
    y = jnp.where(do_rc, xy[1], 0).astype(jnp.float32)
    rows, cols = _resized_crop_grid(h, w, x, y)
    pre = _bilinear_sample(pre, rows, cols)
    post = _bilinear_sample(post, rows, cols)
    msk = _nearest_sample(msk, rows, cols)
    lbl = _nearest_sample(lbl[..., None], rows, cols)[..., 0]

    cj = lambda img: jnp.where(do_cj, _color_jitter(img, k_cjk), img)
    pre, post = cj(pre), cj(post)

    if elastic:
        # UNet-transformer recipe only (train_unettransformer.py:247-253):
        # independent p~0.017 elastic jitter per date, images only, applied
        # after the photometric ops and OUTSIDE the p-0.3 block.
        from dahitra_tpu.data.xbd_cd_augment import elastic_gated
        pre = elastic_gated(pre, k_el_pre)
        post = elastic_gated(post, k_el_post)
    return pre, post, msk, lbl


@functools.partial(jax.jit, static_argnames=("train", "dtype", "elastic"))
def augment_xbd(pre_u8, post_u8, msk_u8, lbl_u8, key, train: bool = True,
                dtype=jnp.float32, elastic: bool = False):
    """(B,H,W,3) uint8 pre/post + (B,H,W,5) masks + (B,H,W) labels ->
    normalized 6-channel input + float masks + int labels."""
    pre = pre_u8.astype(jnp.float32) / 255.0
    post = post_u8.astype(jnp.float32) / 255.0
    msk = msk_u8.astype(jnp.float32)
    lbl = lbl_u8.astype(jnp.int32)
    if train:
        keys = jax.random.split(key, pre.shape[0])
        fn = functools.partial(_augment_one, elastic=elastic)
        pre, post, msk, lbl = jax.vmap(fn)(pre, post, msk, lbl, keys)
    # x/127 - 1 on the original 0..255 scale == (x255*255)/127 - 1.
    img6 = jnp.concatenate([pre, post], axis=-1) * (255.0 / 127.0) - 1.0
    return img6.astype(dtype), msk, lbl
