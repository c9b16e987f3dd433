"""Hand-written VJP for the cross-attention TransformerDecoder stack.

Why this exists (measured on the v5e, b64 DAHiTra train step): XLA's
autodiff backward for the depth-8 decoder runs 3-4x its forward
(17.8 ms fwd+bwd vs 4.3 ms fwd at b128/n4096) because it
  * saves every fp32 intermediate the forward touches (LN outputs, dots,
    attn, GELU inputs - each a (B, N, 32) fp32 HBM round-trip), and
  * emits the per-batch weight-side reductions ``attn^T @ d_out`` /
    ``h^T @ d_dots`` as (32, n)x(n, 32) batched matmuls whose 32x32 output
    tiles use 1/16th of the MXU.

This custom_vjp reassociates the backward the way the forward already is
(nn/blocks.py CrossAttention small-memory path):
  * residuals are saved in the compute dtype (bf16): per layer only
    ``x_in`` plus per-token LN stats and tiny (B, hl, dim) tensors -
    the only n-sized save is the layer input, ~1/8th of the default's
    bytes (measured speed-neutral at b64 but ~3x less decoder
    activation memory - see the note in _layer_fwd);
  * everything else (LN x-hats, attn, x1, t, GELU) is recomputed inside
    the backward with the same ops/dtypes/order as the forward, so the
    values are bit-identical;
  * the two MXU-starved per-batch reductions are CONCATENATED into one
    (64, n)x(n, 64) matmul per layer (4x the per-tile utilization; the two
    off-diagonal blocks are discarded);
  * everything n-sized stays bf16; softmax/LN arithmetic upcasts locally
    to fp32 in registers.

Forward semantics are bit-identical in structure to the module path
(fp32 LayerNorm/softmax with the per-head-group max shift, dim**-0.5
scaling on the model dim, PreNorm2 shared LN for query and memory -
reference help_funcs.py:43-49,66-114,170-186); equality of values and
gradients against jax autodiff of the plain path is pinned by
tests/test_decoder_vjp.py.

Param layout: the stacked (depth, ...) dict of
``pallas.fused_decoder.pack_decoder_params``.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def _seg_matrix(heads: int, l: int) -> np.ndarray:
    """(hl, hl) 0/1 matrix: 1 iff lanes share a head group."""
    return np.kron(np.eye(heads, dtype=np.float32),
                   np.ones((l, l), np.float32))


# Group-softmax implementation choice (round-5). The reductions in the
# reference-faithful form are two of the priciest non-matmul ops in the
# stack (micro_decoder.json B-study: knocking out softmax saves 0.72 of
# 1.52 ms per b64/n2048/depth8 forward):
#   * max: reshape (b, n, heads, l) + reduce over l puts l=4 in the minor
#     dim — a lane relayout both ways on TPU;
#   * sum: dot_general with the (hl, hl) segment matrix — a 32-wide fp32
#     matmul at 1/16th MXU tile utilization.
# Modes, A/B'd on the v5e chip by benchmarks/bench_butterfly.py:
#   "segmatmul"  the original reshape-max + segment-matmul form;
#   "butterfly"  both reductions via lane butterflies (roll +-s, parity
#                select) — MEASURED NEGATIVE: jnp.roll on the lane axis
#                lowers to slice+concat relayouts and the b64 train step
#                regressed 808 -> 635 pairs/s. Kept for the record;
#   "noshift"    drop the max shift entirely: e = exp(min(dots, 80)),
#                denominator still via segment matmul. A softmax shift
#                only cancels in exact arithmetic anyway; with the +80
#                clamp fp32 exp cannot overflow (e^80 ~ 5.5e34 < fp32
#                max), values match the shifted form to ~1e-6 rel for
#                |dots| < 80, and divergent-logit states stay finite
#                (clamped groups saturate to a hard argmax instead of
#                producing inf/inf).
# Chip A/B (benchmarks/artifacts/butterfly_ab.json, b64/n4096/depth8):
# noshift fwd 1.39 vs segmatmul 2.89 ms (2.08x), fwd+bwd 3.32 vs 4.49 ms
# (1.36x); butterfly 0.4x (regression). Default = measured winner.
_SOFTMAX_MODE = "noshift"
_NOSHIFT_CLAMP = 80.0


def _group_reduce(x32: jax.Array, g: int, op) -> jax.Array:
    """Reduce disjoint lane groups of width g (power of two) along the last
    axis; every lane of a group ends up holding the group's reduction."""
    lane = np.arange(x32.shape[-1])
    s = 1
    while s < g:
        take_fwd = jnp.asarray((lane & s) == 0)
        x32 = op(x32, jnp.where(take_fwd, jnp.roll(x32, -s, axis=-1),
                                jnp.roll(x32, s, axis=-1)))
        s *= 2
    return x32


def _group_softmax(dots32: jax.Array, heads: int, l: int) -> jax.Array:
    """fp32 softmax over each head's l consecutive lanes; see
    _SOFTMAX_MODE above for the three forms."""
    b, n, hl = dots32.shape
    pow2 = l >= 2 and (l & (l - 1)) == 0
    if _SOFTMAX_MODE == "noshift":
        # Symmetric clamp: +80 keeps fp32 exp finite; -80 keeps a group
        # whose every logit is deeply negative from underflowing to a 0/0
        # denominator (e^-80 ~ 1.8e-35 is still a normal fp32). A group
        # entirely below the clamp degrades to uniform attention instead
        # of the shifted form's internal argmax — pathological states
        # only; tests/test_decoder_vjp.py pins finiteness there.
        e = jnp.exp(jnp.clip(dots32, -_NOSHIFT_CLAMP, _NOSHIFT_CLAMP))
    elif _SOFTMAX_MODE == "butterfly" and pow2:
        e = jnp.exp(dots32 - _group_reduce(dots32, l, jnp.maximum))
        return e / _group_reduce(e, l, jnp.add)
    else:
        mx = jnp.max(dots32.reshape(b, n, heads, l), axis=-1, keepdims=True)
        e = jnp.exp(dots32 - jnp.broadcast_to(
            mx, (b, n, heads, l)).reshape(b, n, hl))
    sseg = jnp.asarray(_seg_matrix(heads, l))
    denom = jax.lax.dot_general(e, sseg, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return e / denom


def _ln_stats(x32: jax.Array) -> Tuple[jax.Array, jax.Array]:
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return mu, jax.lax.rsqrt(var + 1e-5)


def _ln_apply(x32, mu, rsig, scale, bias):
    return (x32 - mu) * rsig * scale + bias


def _ln_bwd(dg32, x32, mu, rsig, scale):
    """Backward of y = xhat*scale+bias wrt x (fp32). Returns (dx, dscale,
    dbias) with dscale/dbias summed over all leading axes."""
    xhat = (x32 - mu) * rsig
    dxh = dg32 * scale
    dscale = jnp.sum(dg32 * xhat, axis=tuple(range(dg32.ndim - 1)))
    dbias = jnp.sum(dg32, axis=tuple(range(dg32.ndim - 1)))
    dx = rsig * (dxh - jnp.mean(dxh, axis=-1, keepdims=True)
                 - xhat * jnp.mean(dxh * xhat, axis=-1, keepdims=True))
    return dx, dscale, dbias


def _gelu(t32):
    return 0.5 * t32 * (1.0 + jax.lax.erf(t32 / np.sqrt(2.0)))


def _gelu_grad(t32):
    cdf = 0.5 * (1.0 + jax.lax.erf(t32 / np.sqrt(2.0)))
    pdf = jnp.exp(-0.5 * t32 * t32) / np.sqrt(2.0 * np.pi)
    return cdf + t32 * pdf


def _layer_fwd(x, m, p, d, heads, dtype, collect: bool):
    """One decoder layer. Returns (x2, residuals-or-None)."""
    b, n, dim = x.shape
    l = m.shape[-2]
    hl = heads * l
    scale = dim ** -0.5
    x32 = x.astype(jnp.float32)
    m32 = m.astype(jnp.float32)
    mu_x, rs_x = _ln_stats(x32)
    mu_m, rs_m = _ln_stats(m32)
    s1, b1_ = p["ln1_scale"][d], p["ln1_bias"][d]
    hn = _ln_apply(x32, mu_x, rs_x, s1, b1_).astype(dtype)
    mn = _ln_apply(m32, mu_m, rs_m, s1, b1_).astype(dtype)

    inner = p["wq"].shape[-1]
    hd = inner // heads
    wq_r = p["wq"][d].astype(dtype).reshape(dim, heads, hd)
    kh = (mn @ p["wk"][d].astype(dtype)).reshape(b, l, heads, hd)
    vh = (mn @ p["wv"][d].astype(dtype)).reshape(b, l, heads, hd)
    wo_r = p["wo"][d].astype(dtype).reshape(heads, hd, dim)
    a = jnp.einsum("chd,bjhd->bchj", wq_r, kh).reshape(b, dim, hl)
    z = jnp.einsum("bjhd,hdc->bhjc", vh, wo_r).reshape(b, hl, dim)

    dots = jnp.einsum("bnc,bcm->bnm", hn, a).astype(jnp.float32) * scale
    attn = _group_softmax(dots, heads, l).astype(dtype)

    x1 = x + attn @ z + p["bo"][d].astype(dtype)

    x132 = x1.astype(jnp.float32)
    mu1, rs1 = _ln_stats(x132)
    g = _ln_apply(x132, mu1, rs1, p["ln2_scale"][d],
                  p["ln2_bias"][d]).astype(dtype)
    t = g @ p["w1"][d].astype(dtype) + p["b1"][d].astype(dtype)
    hgelu = _gelu(t.astype(jnp.float32)).astype(dtype)
    x2 = x1 + hgelu @ p["w2"][d].astype(dtype) + p["b2"][d].astype(dtype)
    if not collect:
        return x2, None
    # Minimal save set: the ONLY n-sized residual is x_in. attn, x1 and t
    # are recomputed exactly in the backward (same ops, operand dtypes and
    # order as this forward, from x_in and the tiny per-batch a/z/kh/vh),
    # quartering the bytes SAVED vs the earlier {x_in, attn, x1, t} set.
    # Measured effect on the b64 train step: NEUTRAL (median 1.001x over 5
    # interleaved A/B rounds) — post-chunking the backward is no longer
    # save-bandwidth-bound — so this is kept for the ~3x smaller decoder
    # activation footprint (batch-size headroom), not for speed.
    res = dict(x_in=x, kh=kh, vh=vh, a=a, z=z,
               mu_x=mu_x, rs_x=rs_x, mu_m=mu_m, rs_m=rs_m, mu1=mu1, rs1=rs1)
    return x2, res


def _stack_fwd(x, m, p, depth, heads, dtype, collect):
    reses = []
    for d in range(depth):
        x, res = _layer_fwd(x, m, p, d, heads, dtype, collect)
        reses.append(res)
    return x, reses


def _layer_bwd(dy, dm_acc, res, m, p, d, heads, dtype):
    """Backward of one layer. dy: (b,n,dim) cotangent of x2 (dtype);
    dm_acc: running (b,l,dim) cotangent of m. Returns (dx, dm_acc, grads)."""
    x = res["x_in"]
    b, n, dim = x.shape
    l = m.shape[-2]
    hl = heads * l
    scale = dim ** -0.5
    inner = p["wq"].shape[-1]
    hd = inner // heads

    # ---- recompute the n-sized forward intermediates (attn, x1, t) from
    # x_in and the tiny saved per-batch tensors, with the same ops, operand
    # dtypes and order as _layer_fwd so the values are bit-identical ----
    x32 = x.astype(jnp.float32)
    mu_x, rs_x = res["mu_x"], res["rs_x"]
    s1, b1_ = p["ln1_scale"][d], p["ln1_bias"][d]
    hn = _ln_apply(x32, mu_x, rs_x, s1, b1_).astype(dtype)
    a, z = res["a"], res["z"]
    dots = jnp.einsum("bnc,bcm->bnm", hn, a).astype(jnp.float32) * scale
    attn = _group_softmax(dots, heads, l).astype(dtype)
    x1 = x + attn @ z + p["bo"][d].astype(dtype)

    # ---- FF backward ----
    x132 = x1.astype(jnp.float32)
    mu1, rs1 = res["mu1"], res["rs1"]
    s2 = p["ln2_scale"][d]
    g = _ln_apply(x132, mu1, rs1, s2, p["ln2_bias"][d]).astype(dtype)
    t = g @ p["w1"][d].astype(dtype) + p["b1"][d].astype(dtype)
    t32 = t.astype(jnp.float32)
    hgelu = _gelu(t32).astype(dtype)
    dff = dy
    dW2 = jnp.einsum("bnm,bnc->mc", hgelu, dff,
                     preferred_element_type=jnp.float32)
    db2 = jnp.sum(dff.astype(jnp.float32), axis=(0, 1))
    dhg = dff @ p["w2"][d].astype(dtype).T
    dt32 = dhg.astype(jnp.float32) * _gelu_grad(t32)
    dt = dt32.astype(dtype)
    dW1 = jnp.einsum("bnc,bnm->cm", g, dt,
                     preferred_element_type=jnp.float32)
    db1 = jnp.sum(dt32, axis=(0, 1))
    dg32 = (dt @ p["w1"][d].astype(dtype).T).astype(jnp.float32)
    dx1_ln, dls2, dlb2 = _ln_bwd(dg32, x132, mu1, rs1, s2)
    dx1 = dy + dx1_ln.astype(dtype)

    # ---- attention backward ----
    dao = dx1  # grad of attn_out (residual add)
    dbo = jnp.sum(dao.astype(jnp.float32), axis=(0, 1))

    dattn = jnp.einsum("bnc,bmc->bnm", dao, z)
    # group softmax backward in fp32 (attn was recomputed in `dtype`;
    # upcasting reproduces the fp32 softmax gradient to dtype rounding)
    a32 = attn.astype(jnp.float32)
    da32 = dattn.astype(jnp.float32)
    sseg = jnp.asarray(_seg_matrix(heads, l))
    srow = jax.lax.dot_general(a32 * da32, sseg, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dl = (a32 * (da32 - srow)) * scale
    dl_d = dl.astype(dtype)
    dhn = jnp.einsum("bnm,bcm->bnc", dl_d, a)

    # The two MXU-starved (.,n)x(n,.) per-batch reductions, fused into one
    # (2*dim, n)x(n, 2*hl... ) -> here (dim+hl side-by-side) matmul:
    #   P[b] = [hn | attn]^T @ [dl | dao]  with
    #   da = P[:dim, :hl],  dz = P[dim:, hl:]  (cross blocks discarded).
    lhs = jnp.concatenate([hn, attn], axis=-1)          # (b, n, dim+hl)
    rhs = jnp.concatenate([dl_d, dao], axis=-1)         # (b, n, hl+dim)
    P = jnp.einsum("bni,bnj->bij", lhs, rhs,
                   preferred_element_type=jnp.float32)
    da = P[:, :dim, :hl].astype(dtype)                  # (b, dim, hl)
    dz = P[:, dim:, hl:].astype(dtype)                  # (b, hl, dim)

    # tiny memory-side chains
    kh, vh = res["kh"], res["vh"]
    wq_r = p["wq"][d].astype(dtype).reshape(dim, heads, hd)
    wo_r = p["wo"][d].astype(dtype).reshape(heads, hd, dim)
    da_r = da.reshape(b, dim, heads, l)
    dz_r = dz.reshape(b, heads, l, dim)
    dkh = jnp.einsum("bchj,chd->bjhd", da_r, wq_r)
    dwq = jnp.einsum("bchj,bjhd->chd", da_r, kh).reshape(dim, inner)
    dvh = jnp.einsum("bhjc,hdc->bjhd", dz_r, wo_r)
    dwo = jnp.einsum("bhjc,bjhd->hdc", dz_r, vh).reshape(inner, dim)
    dmn = (dkh.reshape(b, l, inner) @ p["wk"][d].astype(dtype).T
           + dvh.reshape(b, l, inner) @ p["wv"][d].astype(dtype).T)
    mn = _ln_apply(m.astype(jnp.float32), res["mu_m"], res["rs_m"],
                   s1, b1_).astype(dtype)  # recompute (tiny: (b, l, dim))
    dwk = jnp.einsum("blc,blm->cm", mn, dkh.reshape(b, l, inner),
                     preferred_element_type=jnp.float32)
    dwv = jnp.einsum("blc,blm->cm", mn, dvh.reshape(b, l, inner),
                     preferred_element_type=jnp.float32)

    # LN1 backward: shared params between query and memory branches
    dhn32 = dhn.astype(jnp.float32)
    dx_ln, dls1x, dlb1x = _ln_bwd(dhn32, x32, mu_x, rs_x, s1)
    m32 = m.astype(jnp.float32)
    dmn32 = dmn.astype(jnp.float32)
    dm_ln, dls1m, dlb1m = _ln_bwd(dmn32, m32, res["mu_m"], res["rs_m"], s1)

    dx = dx1 + dx_ln.astype(dtype)
    dm_acc = dm_acc + dm_ln.astype(dm_acc.dtype)

    grads = {
        "ln1_scale": dls1x + dls1m, "ln1_bias": dlb1x + dlb1m,
        "wq": dwq.astype(jnp.float32), "wk": dwk, "wv": dwv,
        "wo": dwo.astype(jnp.float32), "bo": dbo,
        "ln2_scale": dls2, "ln2_bias": dlb2,
        "w1": dW1, "b1": db1, "w2": dW2, "b2": db2,
    }
    return dx, dm_acc, grads


# XLA's fused kernels for this stack fall off a cliff above ~2^18 rows
# (rows = batch * tokens; measured on the v5e at n=4096/dim=32/depth 8:
# per-64-batch fwd+bwd 5.8 -> 8.7 -> 14.2 ms at b64/b128/b256, forward
# alone 2.3 -> 8.6 -> 19.7). Splitting the token axis into independent
# sub-calls restores most of it: at b128 fwd 8.9 -> 4.8 ms, fwd+bwd
# 17.8 -> 13.3; at b256 fwd 19.7 -> 10.1, fwd+bwd 46.5 -> 32.4
# (interleaved same-process A/B). The split is EXACT: every decoder op is
# per-token over n (attention reads only the per-sample memory tokens),
# so slicing n is pure data parallelism, and unrolled slices let XLA
# schedule the chunks independently (a lax.map scan serializes the
# backward's weight-gradient accumulation and loses the win).
_CHUNK_TRIGGER_ROWS = 1 << 18
_CHUNK_TARGET_ROWS = 1 << 17


def decoder_stack_auto(x: jax.Array, m: jax.Array,
                       packed: Dict[str, jax.Array], depth: int, heads: int,
                       dtype,
                       trigger_rows: int = _CHUNK_TRIGGER_ROWS,
                       target_rows: int = _CHUNK_TARGET_ROWS) -> jax.Array:
    """decoder_stack, n-axis-chunked above the measured XLA size cliff."""
    b, n, _ = x.shape
    if b * n <= trigger_rows:
        return decoder_stack(x, m, packed, depth, heads, dtype)
    cn = max(1, target_rows // b)
    cn = max(128, cn // 128 * 128)  # lane-aligned chunks
    if cn >= n:
        return decoder_stack(x, m, packed, depth, heads, dtype)
    ys = [decoder_stack(x[:, i:i + cn], m, packed, depth, heads, dtype)
          for i in range(0, n, cn)]
    return jnp.concatenate(ys, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def decoder_stack(x: jax.Array, m: jax.Array, packed: Dict[str, jax.Array],
                  depth: int, heads: int, dtype) -> jax.Array:
    out, _ = _stack_fwd(x, m, packed, depth, heads, dtype, collect=False)
    return out


def _vjp_fwd(x, m, packed, depth, heads, dtype):
    out, reses = _stack_fwd(x, m, packed, depth, heads, dtype, collect=True)
    return out, (m, packed, reses)


def _vjp_bwd(depth, heads, dtype, saved, dy):
    m, packed, reses = saved
    dy = dy.astype(dtype)
    dm = jnp.zeros(m.shape, dtype)
    layer_grads = []
    for d in range(depth - 1, -1, -1):
        dy, dm, grads = _layer_bwd(dy, dm, reses[d], m, packed, d, heads,
                                   dtype)
        layer_grads.append(grads)
    layer_grads.reverse()
    dpacked = {k: jnp.stack([g[k] for g in layer_grads]).astype(
        packed[k].dtype) for k in layer_grads[0]}
    return dy, dm.astype(m.dtype), dpacked


decoder_stack.defvjp(_vjp_fwd, _vjp_bwd)
