"""On-device CDDataAugmentation_xBD (datasets/data_utils.py:115-248).

Reachability note (verified against the reference tree): the class has ZERO
call sites — xBDataset instantiates the LEVIR ``CDDataAugmentation`` instead
(datasets/CD_dataset.py:149-156), and although it passes
``with_scale_random_crop=True``, that class's ``transform`` never reads the
flag (data_utils.py:35 vs :51-113). Every op here is therefore dead code in
the reference; we provide it as an OPT-IN stage for completeness, with the
reference's probability structure:

  * pair-consistent scale-random-crop: rescale by u ~ U[1, 1.2]
    (:189-202 pil_rescale + get_random_crop_box + pil_crop), then crop back
    to size at a random offset. Since scale >= 1 the pad-with-default
    branch of pil_crop can never fire. Divergence: bilinear sampling where
    PIL uses cubic for images (composed scale+crop as one gather keeps
    shapes static for XLA).
  * per-image photometric tree (:204-236): with p≈0.02 one of
    {CLAHE | gauss-noise | 3x3 box blur}, elif p≈0.02 one of
    {saturation | brightness | contrast} with alpha ~ U[0.9, 1.1], each
    inner pick itself gated at p 0.015 — the effective fire rate is ~3e-4
    per image, faithfully tiny.
  * CLAHE (xBD_code/utils.py:27-33: clipLimit 2, 5x5 tiles, on the LAB L
    channel): tile histograms via a one-hot contraction (MXU-friendly),
    clip+redistribute, per-pixel bilinear interpolation between the 4
    neighboring tile CDFs. Divergence: chroma is preserved by scaling RGB
    with the L gain instead of a full LAB round trip.

Also hosts ``elastic_transform`` — the UNet-transformer recipe's
iaa.ElasticTransformation(alpha=(0.25, 1.2), sigma=0.2) from
xBD_code/train_unettransformer.py:93,247-253 (the only reference
augmentation op living outside datasets/data_utils.py) — wired into
``augment_xbd`` behind the ``elastic`` flag.

All ops take float images (NHWC; 0..255 or 0..1 — elastic is
scale-invariant) and a PRNG key.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# cv2's RGB->LAB luminance weights (linear-light Rec.709 primaries).
_LUMA = jnp.array([0.212671, 0.715160, 0.072169], jnp.float32)


def _bilinear_sample(img, rows, cols):
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


def _nearest_sample(img, rows, cols):
    h, w = img.shape[0], img.shape[1]
    r = jnp.clip(jnp.round(rows).astype(jnp.int32), 0, h - 1)
    c = jnp.clip(jnp.round(cols).astype(jnp.int32), 0, w - 1)
    return img[r, c]


def scale_random_crop(imgs, label, key):
    """Pair-consistent rescale (u ~ U[1, 1.2]) + random crop back to size
    (data_utils.py:189-236 scale branch). ``imgs`` is a tuple of (H, W, C)
    float images; ``label`` (H, W)."""
    h, w = imgs[0].shape[0], imgs[0].shape[1]
    ks, kt, kl = jax.random.split(key, 3)
    scale = jax.random.uniform(ks, (), minval=1.0, maxval=1.2)
    hs = jnp.floor(h * scale)  # pil_rescale: int(round) ~ floor for our use
    ws = jnp.floor(w * scale)
    top = jax.random.uniform(kt, ()) * (hs - h)
    left = jax.random.uniform(kl, ()) * (ws - w)
    i = jnp.arange(h, dtype=jnp.float32)
    j = jnp.arange(w, dtype=jnp.float32)
    # output pixel (i, j) samples the source at ((top+i)/scale, ...)
    rows, cols = jnp.meshgrid((top + i) / scale, (left + j) / scale,
                              indexing="ij")
    out_imgs = tuple(_bilinear_sample(img, rows, cols) for img in imgs)
    out_label = _nearest_sample(label[..., None], rows, cols)[..., 0]
    return out_imgs, out_label


def box_blur3(img):
    """cv2.blur((3, 3)) with its default REFLECT_101 border."""
    x = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="reflect")
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (3, 3, 1), (1, 1, 1),
        ((0, 0), (0, 0), (0, 0))) / 9.0
    return out


def gauss_noise(img, key, var: float = 30.0):
    """xBD_code/utils.py:17-24: N(var, sqrt(var)) noise, shifted to be
    non-negative, TRUNCATED to integers (the uint8 cast), added, clipped."""
    g = var + jnp.sqrt(var) * jax.random.normal(key, img.shape[:2] + (3,))
    g = jnp.floor(g - jnp.min(g))
    return jnp.clip(img + g, 0.0, 255.0)


def _grayscale(img):
    # utils.py:39-41 uses weights [0.114, 0.587, 0.299] on RGB images —
    # BGR-ordered weights applied to RGB, replicated verbatim.
    w = jnp.array([0.114, 0.587, 0.299], jnp.float32)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def _blend(img1, img2, alpha):
    # uint8 cast truncates; inputs are non-negative so floor == trunc.
    return jnp.floor(jnp.clip(img1 * alpha + (1.0 - alpha) * img2,
                              0.0, 255.0))


def saturation(img, alpha):
    return _blend(img, _grayscale(img), alpha)


def brightness(img, alpha):
    return _blend(img, jnp.zeros_like(img), alpha)


def contrast(img, alpha):
    gs = jnp.full_like(img, jnp.mean(_grayscale(img)))
    return _blend(img, gs, alpha)


def clahe(img, clip_limit: float = 2.0, tiles: int = 5):
    """Clip-limited adaptive histogram equalization of the L channel.

    Tile histograms are built with a one-hot x tile-membership matmul (the
    TPU-friendly replacement for scatter-add), clipped at
    clip_limit * tile_area / 256 with uniform redistribution (cv2
    semantics), and each pixel's mapping bilinearly interpolates the 4
    neighboring tile CDFs. Chroma: RGB scaled by L_new/L_old."""
    h, w = img.shape[0], img.shape[1]
    lum = jnp.clip(img @ _LUMA, 0.0, 255.0)  # 0..255 L proxy
    lv = jnp.clip(lum.astype(jnp.int32), 0, 255)

    # tile index per pixel (cv2 pads to a multiple; we use proportional bins)
    ti = jnp.minimum((jnp.arange(h) * tiles) // h, tiles - 1)
    tj = jnp.minimum((jnp.arange(w) * tiles) // w, tiles - 1)
    tile_of = ti[:, None] * tiles + tj[None, :]               # (H, W)
    n_tiles = tiles * tiles

    onehot_tile = jax.nn.one_hot(tile_of.reshape(-1), n_tiles,
                                 dtype=jnp.float32)           # (HW, T)
    onehot_val = jax.nn.one_hot(lv.reshape(-1), 256, dtype=jnp.float32)
    hist = onehot_tile.T @ onehot_val                          # (T, 256)

    area = hist.sum(axis=1, keepdims=True)
    clip = jnp.maximum(clip_limit * area / 256.0, 1.0)
    excess = jnp.sum(jnp.maximum(hist - clip, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, clip) + excess / 256.0
    cdf = jnp.cumsum(hist, axis=1)
    # cv2 scales so the mapping spans 0..255 over the tile area.
    lut = jnp.clip(cdf / jnp.maximum(area, 1.0) * 255.0, 0.0, 255.0)

    # bilinear interpolation between the 4 neighboring tile LUTs
    tile_h = h / tiles
    tile_w = w / tiles
    fy = (jnp.arange(h) + 0.5) / tile_h - 0.5
    fx = (jnp.arange(w) + 0.5) / tile_w - 0.5
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, tiles - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, tiles - 1)
    y1 = jnp.clip(y0 + 1, 0, tiles - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles - 1)
    wy = jnp.clip(fy - y0, 0.0, 1.0)[:, None]
    wx = jnp.clip(fx - x0, 0.0, 1.0)[None, :]

    def look(yi, xi):
        t = yi[:, None] * tiles + xi[None, :]
        return lut[t, lv]

    new_l = ((1 - wy) * (1 - wx) * look(y0, x0)
             + (1 - wy) * wx * look(y0, x1)
             + wy * (1 - wx) * look(y1, x0)
             + wy * wx * look(y1, x1))
    gain = new_l / jnp.maximum(lum, 1.0)
    return jnp.clip(img * gain[..., None], 0.0, 255.0)


def _gaussian_smooth_const0(field, sigma: float):
    """scipy.ndimage.gaussian_filter(mode="constant", cval=0) on a (H, W)
    field — the smoothing the classic Simard/imgaug elastic recipe applies
    to its displacement noise. Separable correlation with the scipy kernel
    (radius = int(truncate*sigma + 0.5), truncate 4.0), zero padding."""
    radius = int(4.0 * sigma + 0.5)
    if radius < 1:
        return field
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)

    def smooth_axis(a, axis):
        a = jnp.moveaxis(a, axis, -1)
        n = a.shape[-1]
        ap = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(radius, radius)])
        out = sum(k[i] * ap[..., i:i + n] for i in range(2 * radius + 1))
        return jnp.moveaxis(out, -1, axis)

    return smooth_axis(smooth_axis(field, 0), 1)


def _bilinear_sample_cval0(img, rows, cols):
    """Bilinear gather with scipy map_coordinates(order=1, mode="constant",
    cval=0) border semantics: any coordinate outside [0, n-1] on either
    axis yields cval outright (scipy does NOT blend with cval)."""
    h, w = img.shape[0], img.shape[1]
    inside = ((rows >= 0) & (rows <= h - 1)
              & (cols >= 0) & (cols <= w - 1))[..., None]
    return jnp.where(inside, _bilinear_sample(img, rows, cols), 0.0)


def elastic_transform(img, key, alpha_range=(0.25, 1.2), sigma: float = 0.2):
    """iaa.ElasticTransformation(alpha=(0.25, 1.2), sigma=0.2) parity
    (xBD_code/train_unettransformer.py:93): per-axis displacement fields
    U(-1, 1), Gaussian-smoothed (constant-0 border) with the given sigma,
    scaled by alpha ~ U(alpha_range); the output at (y, x) samples the
    input at (y + dy, x + dx). Image-only — the reference never moves the
    masks (:249-253). Divergence: bilinear sampling where imgaug defaults
    to cubic — displacements are sub-pixel (alpha <= 1.2) so the
    interpolation-order difference is below the uint8 quantization the
    reference's pipeline applies right after."""
    h, w = img.shape[0], img.shape[1]
    ka, kx, ky = jax.random.split(key, 3)
    alpha = jax.random.uniform(ka, (), minval=alpha_range[0],
                               maxval=alpha_range[1])
    dx = _gaussian_smooth_const0(
        jax.random.uniform(kx, (h, w)) * 2.0 - 1.0, sigma) * alpha
    dy = _gaussian_smooth_const0(
        jax.random.uniform(ky, (h, w)) * 2.0 - 1.0, sigma) * alpha
    jj, ii = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    return _bilinear_sample_cval0(img, ii + dy, jj + dx)


def elastic_gated(img, key, threshold: float = 0.983):
    """The reference's per-date probability draw: apply elastic iff
    random() > 0.983 (train_unettransformer.py:247-253), independently per
    image. Always computed under jit; jnp.where selects."""
    kg, ke = jax.random.split(key)
    out = elastic_transform(img, ke)
    return jnp.where(jax.random.uniform(kg, ()) > threshold, out, img)


def photometric_tree(img, key):
    """The per-image probability tree (data_utils.py:204-226): sequential
    uniform draws with the reference's thresholds."""
    ks = jax.random.split(key, 10)
    r = [jax.random.uniform(k, ()) for k in ks[:8]]
    a_key = ks[8]
    noise_key = ks[9]  # independent of the r[2] gate draw
    alpha = 0.9 + jax.random.uniform(a_key, ()) * 0.2

    branch1 = r[0] > 0.98
    branch2 = (~branch1) & (r[4] > 0.98)
    pick_clahe = branch1 & (r[1] > 0.985)
    pick_noise = branch1 & (~(r[1] > 0.985)) & (r[2] > 0.985)
    pick_blur = branch1 & (~(r[1] > 0.985)) & (~(r[2] > 0.985)) & (r[3] > 0.985)
    pick_sat = branch2 & (r[5] > 0.985)
    pick_bri = branch2 & (~(r[5] > 0.985)) & (r[6] > 0.985)
    pick_con = branch2 & (~(r[5] > 0.985)) & (~(r[6] > 0.985)) & (r[7] > 0.985)

    out = jnp.where(pick_clahe, clahe(img), img)
    out = jnp.where(pick_noise, gauss_noise(img, noise_key), out)
    out = jnp.where(pick_blur, box_blur3(img), out)
    out = jnp.where(pick_sat, saturation(img, alpha), out)
    out = jnp.where(pick_bri, brightness(img, alpha), out)
    out = jnp.where(pick_con, contrast(img, alpha), out)
    return out


def _augment_one(a, b, label, key, with_scale_crop, with_photometric):
    k_sc, k_pa, k_pb = jax.random.split(key, 3)
    if with_scale_crop:
        (a, b), label = scale_random_crop((a, b), label, k_sc)
    if with_photometric:
        a = photometric_tree(a, k_pa)
        b = photometric_tree(b, k_pb)
    return a, b, label


@functools.partial(jax.jit,
                   static_argnames=("with_scale_crop", "with_photometric"))
def augment_pairs_xbd_cd(a_u8, b_u8, label_u8, key,
                         with_scale_crop: bool = True,
                         with_photometric: bool = True):
    """Batched opt-in CDDataAugmentation_xBD stage: (B, H, W, 3) uint8 pair
    + (B, H, W) labels -> augmented float images on the 0..255 scale +
    labels. Compose BEFORE augment_pairs' normalize step."""
    a = a_u8.astype(jnp.float32)
    b = b_u8.astype(jnp.float32)
    label = label_u8.astype(jnp.float32)
    keys = jax.random.split(key, a.shape[0])
    fn = functools.partial(_augment_one, with_scale_crop=with_scale_crop,
                           with_photometric=with_photometric)
    a, b, label = jax.vmap(fn)(a, b, label, keys)
    return a, b, label.astype(jnp.int32)
