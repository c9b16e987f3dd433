"""Pallas TPU kernel: the cross-attention decoder stack in FOLDED layout.

Round-5 VERDICT attack 1a, executed for real: a fused Pallas decoder with
its own backward. Two earlier Pallas forwards (fused_decoder.py v1/v2)
lost to XLA because every n-sized op ran on (TILE, 32) tiles — 32-wide
rows occupy 1/4 of the 128 vector lanes and 1/4 of the MXU's output
lanes, and the same padding inflates every VMEM/VREG touch 4x.

This kernel changes the LAYOUT instead of the schedule. With dim = 32,
F = 128 // dim = 4 consecutive pixel tokens are packed into one 128-lane
row (a free row-major reshape (n, 32) -> (n/4, 128)); every per-pixel
(32 x 32) contraction becomes a (nf, 128) @ (128, 128) matmul against a
kron(I_F, W) block-diagonal lift (micro_decoder.json: 102 useful TFLOP/s
vs 20 for the narrow form), and every elementwise op runs at full lane
occupancy. The XLA-level version of this rewrite (benchmarks/bench_folded)
measured 0.57x because XLA inserted relayouts between ops; inside one
kernel the folded layout is preserved end to end and the residual stream
never leaves VMEM across the whole depth-8 stack.

LayerNorm statistics and the per-head-group softmax denominator are
lane-group reductions. Both are computed on the MXU against 0/1 (or 1/g)
group matrices; fp32 operands are exactly split hi/lo into two bf16
matmuls (bf16 values are exact, the MXU accumulates in fp32), so the
statistics match the fp32 reference path to reorder-rounding.

Forward semantics mirror nn/decoder_vjp.py (_SOFTMAX_MODE = "noshift"
production form): bf16 matmul operands / fp32 accumulation, fp32 LN,
exp(clip(dots, +-80)) softmax, bf16 residual stream, PreNorm2 shared LN
between query and memory (reference help_funcs.py:43-49,66-114,170-186).
The memory-token side (LN(m), k/v heads, the reassociated per-sample
A = [Wq_h K_h^T]_h and Z = [V_h Wo_h]_h) is tiny (l = 4 tokens) and stays
in XLA; the kernel consumes per-sample kron-lifted A/Z.

Equality against decoder_vjp.decoder_stack is pinned by
tests/test_folded_decoder.py; the chip A/B lives in
benchmarks/bench_folded_kernel.py and the honest result (either way) in
docs/ARCHITECTURE.md's round-5 ledger.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Dtype = Any

_CLAMP = 80.0  # decoder_vjp._NOSHIFT_CLAMP


# ---------------------------------------------------------------------------
# XLA-side preparation: memory-token chains and kron lifts
# ---------------------------------------------------------------------------

def _ln_stats(x32):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return mu, jax.lax.rsqrt(var + 1e-5)


def _kron_lift(w: jax.Array, f: int) -> jax.Array:
    """kron(I_f, w) over the last two axes: (..., a, b) -> (..., f*a, f*b)."""
    eye = jnp.eye(f, dtype=w.dtype)
    lifted = jnp.einsum("pq,...ab->...paqb", eye, w)
    return lifted.reshape(w.shape[:-2] + (f * w.shape[-2], f * w.shape[-1]))


def _tile_vec(v: jax.Array, f: int) -> jax.Array:
    """(depth, d) -> (depth, 1, f*d): folded-lane broadcast of a per-dim
    vector, with a unit row axis so in-kernel reads stay 2-D."""
    return jnp.tile(v, (1,) * (v.ndim - 1) + (f,))[:, None, :]


def build_az(m: jax.Array, packed: Dict[str, jax.Array], depth: int,
             heads: int, dtype) -> Tuple[jax.Array, jax.Array]:
    """Per-layer, per-sample reassociated attention operands.

    Returns a: (depth, b, dim, hl) and z: (depth, b, hl, dim) in ``dtype``,
    the same tensors decoder_vjp._layer_fwd derives from the memory tokens
    (a = [Wq_h K_h^T]_h, z = [V_h Wo_h]_h).
    """
    b, l, dim = m.shape
    inner = packed["wq"].shape[-1]
    hd = inner // heads
    m32 = m.astype(jnp.float32)
    mu_m, rs_m = _ln_stats(m32)
    a_list, z_list = [], []
    for d in range(depth):
        s1, b1_ = packed["ln1_scale"][d], packed["ln1_bias"][d]
        mn = ((m32 - mu_m) * rs_m * s1 + b1_).astype(dtype)
        kh = (mn @ packed["wk"][d].astype(dtype)).reshape(b, l, heads, hd)
        vh = (mn @ packed["wv"][d].astype(dtype)).reshape(b, l, heads, hd)
        wq_r = packed["wq"][d].astype(dtype).reshape(dim, heads, hd)
        wo_r = packed["wo"][d].astype(dtype).reshape(heads, hd, dim)
        a = jnp.einsum("chd,bjhd->bchj", wq_r, kh).reshape(b, dim, heads * l)
        z = jnp.einsum("bjhd,hdc->bhjc", vh, wo_r).reshape(b, heads * l, dim)
        a_list.append(a)
        z_list.append(z)
    return jnp.stack(a_list), jnp.stack(z_list)


def _group_mats(dim: int, hl: int, f: int):
    """Static MXU group-reduction matrices for the folded layout.

    gd: (f*dim, f*dim) with 1/dim inside each dim-lane group — one matmul
        computes LayerNorm group means broadcast back to every lane.
    gl: (f*hl, f*hl) 0/1 inside each l-lane group — the softmax
        denominator segment-sum (decoder_vjp._seg_matrix, kron-lifted).
    """
    lane_d = np.arange(f * dim)
    gd = (lane_d[:, None] // dim == lane_d[None, :] // dim)
    gd = (gd / dim).astype(np.float32)
    return jnp.asarray(gd)


def _seg_mat_lifted(heads: int, l: int, f: int):
    hl = heads * l
    lane = np.arange(f * hl)
    same_group = lane[:, None] // l == lane[None, :] // l
    return jnp.asarray(same_group.astype(np.float32))


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------

def _mmb(a_bf16, b_bf16):
    return jnp.dot(a_bf16, b_bf16, preferred_element_type=jnp.float32)


def _mm_f32_exact(a32, b_bf16):
    """fp32-accurate (a32 @ b) via an exact hi/lo bf16 split of a32.

    bf16 numbers are exact fp32 values and the MXU accumulates in fp32, so
    hi+lo reproduces the fp32 sum to reorder-rounding at 2 bf16 matmuls —
    ~6x faster than an MXU fp32 matmul.
    """
    hi = a32.astype(jnp.bfloat16)
    lo = (a32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return _mmb(hi, b_bf16) + _mmb(lo, b_bf16)


def _erf(x):
    """A&S 7.1.26 rational erf (|err| < 1.5e-7): Mosaic has no erf."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(t32):
    return 0.5 * t32 * (1.0 + _erf(t32 * np.float32(1 / np.sqrt(2.0))))


def _ln_fwd_folded(x_bf16, gd_ref, scale_row, bias_row):
    """Folded-layout LayerNorm. x is bf16 (exact in fp32); returns
    (normalized bf16, mu, rsig) with fp32 statistics."""
    x32 = x_bf16.astype(jnp.float32)
    mu = _mmb(x_bf16, gd_ref[:])                 # exact: bf16 values
    sq = x32 * x32
    ms = _mm_f32_exact(sq, gd_ref[:])
    var = jnp.maximum(ms - mu * mu, 0.0)
    rs = jax.lax.rsqrt(var + 1e-5)
    y = ((x32 - mu) * rs * scale_row + bias_row).astype(jnp.bfloat16)
    return y, mu, rs


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, a_ref, z_ref, w1_ref, w2_ref,
                ln1s_ref, ln1b_ref, bo_ref, ln2s_ref, ln2b_ref,
                b1_ref, b2_ref, gd_ref, gl_ref,
                y_ref, xsave_ref, attnsave_ref,
                *, depth: int, dim: int, save: bool):
    scale = np.float32(dim ** -0.5)
    x = x_ref[0]                                  # (nf, 128) bf16
    for d in range(depth):
        if save:
            xsave_ref[d, 0] = x
        hn, _, _ = _ln_fwd_folded(x, gd_ref, ln1s_ref[d], ln1b_ref[d])
        # decoder_vjp's dots einsum has no preferred_element_type: XLA
        # rounds the fp32 accumulation to bf16, THEN upcasts and scales.
        # Reproduce that rounding so values track the production path.
        dots = (_mmb(hn, a_ref[d, 0]).astype(jnp.bfloat16)
                .astype(jnp.float32) * scale)     # (nf, f*hl) fp32
        e = jnp.exp(jnp.clip(dots, -_CLAMP, _CLAMP))
        den = _mm_f32_exact(e, gl_ref[:])
        attn = (e / den).astype(jnp.bfloat16)
        if save:
            attnsave_ref[d, 0] = attn
        x1 = x + _mmb(attn, z_ref[d, 0]).astype(jnp.bfloat16) + bo_ref[d]
        g, _, _ = _ln_fwd_folded(x1, gd_ref, ln2s_ref[d], ln2b_ref[d])
        t = _mmb(g, w1_ref[d]).astype(jnp.bfloat16) + b1_ref[d]
        hg = _gelu(t.astype(jnp.float32)).astype(jnp.bfloat16)
        x = x1 + _mmb(hg, w2_ref[d]).astype(jnp.bfloat16) + b2_ref[d]
    y_ref[0] = x


def _prep(x, m, packed, depth, heads):
    """Shared fwd/bwd XLA-side prep. Returns folded operands."""
    b, n, dim = x.shape
    l = m.shape[-2]
    hl = heads * l
    f = 128 // dim
    nf = n // f
    dt = jnp.bfloat16

    a, z = build_az(m, packed, depth, heads, dt)        # (D,b,dim,hl) ...
    a_f = _kron_lift(a, f)                              # (D,b,128,f*hl)
    z_f = _kron_lift(z, f)                              # (D,b,f*hl,128)
    w1_f = _kron_lift(packed["w1"].astype(dt), f)       # (D,128,f*mlp)
    w2_f = _kron_lift(packed["w2"].astype(dt), f)       # (D,f*mlp,128)
    vecs = dict(
        ln1s=_tile_vec(packed["ln1_scale"].astype(jnp.float32), f),
        ln1b=_tile_vec(packed["ln1_bias"].astype(jnp.float32), f),
        bo=_tile_vec(packed["bo"].astype(dt), f),
        ln2s=_tile_vec(packed["ln2_scale"].astype(jnp.float32), f),
        ln2b=_tile_vec(packed["ln2_bias"].astype(jnp.float32), f),
        b1=_tile_vec(packed["b1"].astype(dt), f),
        b2=_tile_vec(packed["b2"].astype(dt), f),
    )
    gd = _group_mats(dim, hl, f).astype(dt)             # exact 1/32
    gl = _seg_mat_lifted(heads, l, f).astype(dt)        # 0/1
    x_f = x.astype(dt).reshape(b, nf, 128)
    return x_f, a_f, z_f, w1_f, w2_f, vecs, gd, gl, (b, nf, f, hl)


def _full(arr):
    return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                        memory_space=pltpu.VMEM)


def folded_decoder_fwd(x: jax.Array, m: jax.Array,
                       packed: Dict[str, jax.Array], depth: int, heads: int,
                       save: bool = False, interpret: bool = False):
    """Forward pass. Returns (y, (xsave, attnsave)) when ``save`` — the
    stacked per-layer inputs and attention maps the backward consumes —
    else (y, None)."""
    b, n, dim = x.shape
    x_f, a_f, z_f, w1_f, w2_f, vecs, gd, gl, (b_, nf, f, hl) = _prep(
        x, m, packed, depth, heads)

    kernel = functools.partial(_fwd_kernel, depth=depth, dim=dim, save=save)
    dummy = (1, 1, 1, 1)
    out_shapes = (
        jax.ShapeDtypeStruct((b, nf, 128), jnp.bfloat16),
        jax.ShapeDtypeStruct((depth, b, nf, 128) if save else dummy,
                             jnp.bfloat16),
        jax.ShapeDtypeStruct((depth, b, nf, f * hl) if save else dummy,
                             jnp.bfloat16),
    )

    def save_spec(lanes):
        if not save:
            return pl.BlockSpec(dummy, lambda i: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((depth, 1, nf, lanes), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)

    y, xsave, attnsave = pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec((1, nf, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, 1, 128, f * hl), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, 1, f * hl, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            _full(w1_f), _full(w2_f),
            _full(vecs["ln1s"]), _full(vecs["ln1b"]), _full(vecs["bo"]),
            _full(vecs["ln2s"]), _full(vecs["ln2b"]),
            _full(vecs["b1"]), _full(vecs["b2"]),
            _full(gd), _full(gl),
        ],
        out_specs=(
            pl.BlockSpec((1, nf, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            save_spec(128),
            save_spec(f * hl),
        ),
        interpret=interpret,
    )(x_f, a_f, z_f, w1_f, w2_f, vecs["ln1s"], vecs["ln1b"], vecs["bo"],
      vecs["ln2s"], vecs["ln2b"], vecs["b1"], vecs["b2"], gd, gl)
    y = y.reshape(b, n, dim)
    return (y, (xsave, attnsave)) if save else (y, None)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _dot0(a, b):
    """a^T @ b contracting the row (pixel) axis, fp32 accumulation."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _gelu_grad(t32):
    cdf = 0.5 * (1.0 + _erf(t32 * np.float32(1 / np.sqrt(2.0))))
    pdf = jnp.exp(-0.5 * t32 * t32) * np.float32(1 / np.sqrt(2.0 * np.pi))
    return cdf + t32 * pdf


def _colsum(v32):
    return jnp.sum(v32, axis=0, keepdims=True)      # (1, 128) fp32


def _bwd_kernel(xsave_ref, attnsave_ref, dy_ref,
                a_ref, z_ref, at_ref, zt_ref,
                w1_ref, w1t_ref, w2t_ref,
                ln1s_ref, ln1b_ref, bo_ref, ln2s_ref, ln2b_ref, b1_ref,
                gd_ref, gl_ref,
                dx_ref, dak_ref, dzk_ref, dw1k_ref, dw2k_ref, dvec_ref,
                *, depth: int, dim: int):
    """Reverse pass over all layers for one sample, VMEM-resident.

    Mirrors nn/decoder_vjp._layer_bwd: recomputes LN stats / x1 / t / hg
    from the saved {x_in, attn} with the forward's exact ops, fuses the
    whole ~50-op per-layer chain, and accumulates weight-side reductions
    on the MXU. The kron off-diagonal blocks of the per-sample dA/dZ and
    the dW1/dW2 products are discarded OUTSIDE the kernel (lane slicing
    inside Mosaic would relayout). Lane-group means in the LN backward
    use single bf16 matmuls (~bf16-ulp noise on gradients, inside the
    suite's bf16 gtol), unlike the forward statistics which are exact.
    """
    scale = np.float32(dim ** -0.5)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1k_ref[...] = jnp.zeros_like(dw1k_ref)
        dw2k_ref[...] = jnp.zeros_like(dw2k_ref)
        dvec_ref[...] = jnp.zeros_like(dvec_ref)

    dy = dy_ref[0]                                   # (nf, 128) bf16
    for d in range(depth - 1, -1, -1):
        x = xsave_ref[d, 0]
        attn = attnsave_ref[d, 0]
        # ---- recompute (forward's exact ops) ----
        x32 = x.astype(jnp.float32)
        mu = _mmb(x, gd_ref[:])
        sq = x32 * x32
        ms = _mm_f32_exact(sq, gd_ref[:])
        rs = jax.lax.rsqrt(jnp.maximum(ms - mu * mu, 0.0) + 1e-5)
        xhat = (x32 - mu) * rs
        hn = (xhat * ln1s_ref[d] + ln1b_ref[d]).astype(jnp.bfloat16)
        x1 = x + _mmb(attn, z_ref[d, 0]).astype(jnp.bfloat16) + bo_ref[d]
        x132 = x1.astype(jnp.float32)
        mu1 = _mmb(x1, gd_ref[:])
        ms1 = _mm_f32_exact(x132 * x132, gd_ref[:])
        rs1 = jax.lax.rsqrt(jnp.maximum(ms1 - mu1 * mu1, 0.0) + 1e-5)
        xhat1 = (x132 - mu1) * rs1
        g = (xhat1 * ln2s_ref[d] + ln2b_ref[d]).astype(jnp.bfloat16)
        t = _mmb(g, w1_ref[d]).astype(jnp.bfloat16) + b1_ref[d]
        t32 = t.astype(jnp.float32)
        hg = _gelu(t32).astype(jnp.bfloat16)
        # ---- FF backward ----
        dff = dy
        dff32 = dff.astype(jnp.float32)
        dw2k_ref[d] += _dot0(hg, dff)
        dvec_ref[d, 6:7, :] += _colsum(dff32)                     # db2
        dhg = _mmb(dff, w2t_ref[d]).astype(jnp.bfloat16)
        dt32 = dhg.astype(jnp.float32) * _gelu_grad(t32)
        dt = dt32.astype(jnp.bfloat16)
        dw1k_ref[d] += _dot0(g, dt)
        dvec_ref[d, 5:6, :] += _colsum(dt32)                      # db1
        dg32 = _mmb(dt, w1t_ref[d]).astype(jnp.bfloat16).astype(jnp.float32)
        # ---- LN2 backward ----
        dxh2 = dg32 * ln2s_ref[d]
        dvec_ref[d, 3:4, :] += _colsum(dg32 * xhat1)              # dls2
        dvec_ref[d, 4:5, :] += _colsum(dg32)                      # dlb2
        mean_a = _mmb(dxh2.astype(jnp.bfloat16), gd_ref[:])
        mean_b = _mmb((dxh2 * xhat1).astype(jnp.bfloat16), gd_ref[:])
        dx1 = dy + (rs1 * (dxh2 - mean_a - xhat1 * mean_b)).astype(
            jnp.bfloat16)
        # ---- attention backward ----
        dx1_32 = dx1.astype(jnp.float32)
        dvec_ref[d, 2:3, :] += _colsum(dx1_32)                    # dbo
        attn32 = attn.astype(jnp.float32)
        da32 = (_mmb(dx1, zt_ref[d, 0]).astype(jnp.bfloat16)
                .astype(jnp.float32))
        srow = _mmb((attn32 * da32).astype(jnp.bfloat16), gl_ref[:])
        dl = (attn32 * (da32 - srow)) * scale
        dl_d = dl.astype(jnp.bfloat16)
        dhn = _mmb(dl_d, at_ref[d, 0]).astype(jnp.bfloat16)
        dak_ref[d, 0] = _dot0(hn, dl_d)                # (128, f*hl)
        dzk_ref[d, 0] = _dot0(attn, dx1)               # (f*hl, 128)
        # ---- LN1 backward ----
        dhn32 = dhn.astype(jnp.float32)
        dxh1 = dhn32 * ln1s_ref[d]
        dvec_ref[d, 0:1, :] += _colsum(dhn32 * xhat)              # dls1
        dvec_ref[d, 1:2, :] += _colsum(dhn32)                     # dlb1
        mean_c = _mmb(dxh1.astype(jnp.bfloat16), gd_ref[:])
        mean_d = _mmb((dxh1 * xhat).astype(jnp.bfloat16), gd_ref[:])
        dy = dx1 + (rs * (dxh1 - mean_c - xhat * mean_d)).astype(
            jnp.bfloat16)
    dx_ref[0] = dy


def _folded_bwd_call(xsave, attnsave, dy_f, a_f, z_f, at_f, zt_f,
                     w1_f, w1t_f, w2t_f, vecs, gd, gl, depth, dim, f, hl,
                     interpret=False):
    d_, b, nf, _ = xsave.shape
    kernel = functools.partial(_bwd_kernel, depth=depth, dim=dim)
    out_shapes = (
        jax.ShapeDtypeStruct((b, nf, 128), jnp.bfloat16),
        jax.ShapeDtypeStruct((depth, b, 128, f * hl), jnp.float32),
        jax.ShapeDtypeStruct((depth, b, f * hl, 128), jnp.float32),
        jax.ShapeDtypeStruct((depth, 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((depth, 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((depth, 7, 128), jnp.float32),
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec((depth, 1, nf, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, 1, nf, f * hl), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nf, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, 1, 128, f * hl), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, 1, f * hl, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, 1, f * hl, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, 1, 128, f * hl), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            _full(w1_f), _full(w1t_f), _full(w2t_f),
            _full(vecs["ln1s"]), _full(vecs["ln1b"]), _full(vecs["bo"]),
            _full(vecs["ln2s"]), _full(vecs["ln2b"]), _full(vecs["b1"]),
            _full(gd), _full(gl),
        ],
        out_specs=(
            pl.BlockSpec((1, nf, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, 1, 128, f * hl), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, 1, f * hl, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, 7, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xsave, attnsave, dy_f, a_f, z_f, at_f, zt_f, w1_f, w1t_f, w2t_f,
      vecs["ln1s"], vecs["ln1b"], vecs["bo"], vecs["ln2s"], vecs["ln2b"],
      vecs["b1"], gd, gl)


def _untile_vec(row128, f, dim):
    """(…, f*dim) lane-tiled partial sums -> (…, dim) true gradient."""
    return row128.reshape(row128.shape[:-1] + (f, dim)).sum(-2)


def _diag_blocks(kron_grad, f, a, b):
    """Sum the f diagonal (a, b) blocks of a (…, f*a, f*b) kron product."""
    r = kron_grad.reshape(kron_grad.shape[:-2] + (f, a, f, b))
    return jnp.einsum("...pipj->...ij", r)


_INTERPRET = False  # flipped by tests for CPU runs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def folded_decoder_stack(x: jax.Array, m: jax.Array,
                         packed: Dict[str, jax.Array], depth: int,
                         heads: int) -> jax.Array:
    y, _ = folded_decoder_fwd(x, m, packed, depth, heads, save=False,
                              interpret=_INTERPRET)
    return y


def _fds_fwd(x, m, packed, depth, heads):
    y, saves = folded_decoder_fwd(x, m, packed, depth, heads, save=True,
                                  interpret=_INTERPRET)
    return y, (m, packed, saves)


def _fds_bwd(depth, heads, res, dy):
    import dahitra_tpu.nn.decoder_vjp as dv

    m, packed, (xsave, attnsave) = res
    b, l, dim = m.shape
    hl = heads * l
    f = 128 // dim
    dt = jnp.bfloat16
    dy_f = dy.astype(dt).reshape(xsave.shape[1:])

    # Rebuild the folded operands (tiny; cheaper than saving them).
    a, z = build_az(m, packed, depth, heads, dt)
    a_f = _kron_lift(a, f)
    z_f = _kron_lift(z, f)
    at_f = _kron_lift(jnp.swapaxes(a, -1, -2), f)
    zt_f = _kron_lift(jnp.swapaxes(z, -1, -2), f)
    w1_f = _kron_lift(packed["w1"].astype(dt), f)
    w1t_f = _kron_lift(jnp.swapaxes(packed["w1"].astype(dt), -1, -2), f)
    w2t_f = _kron_lift(jnp.swapaxes(packed["w2"].astype(dt), -1, -2), f)
    vecs = dict(
        ln1s=_tile_vec(packed["ln1_scale"].astype(jnp.float32), f),
        ln1b=_tile_vec(packed["ln1_bias"].astype(jnp.float32), f),
        bo=_tile_vec(packed["bo"].astype(dt), f),
        ln2s=_tile_vec(packed["ln2_scale"].astype(jnp.float32), f),
        ln2b=_tile_vec(packed["ln2_bias"].astype(jnp.float32), f),
        b1=_tile_vec(packed["b1"].astype(dt), f),
    )
    gd = _group_mats(dim, hl, f).astype(dt)
    gl = _seg_mat_lifted(heads, l, f).astype(dt)

    dx_f, dak, dzk, dw1k, dw2k, dvec = _folded_bwd_call(
        xsave, attnsave, dy_f, a_f, z_f, at_f, zt_f, w1_f, w1t_f, w2t_f,
        vecs, gd, gl, depth, dim, f, hl, interpret=_INTERPRET)

    n = xsave.shape[2] * f
    dx = dx_f.reshape(b, n, dim)

    # Per-sample dA/dZ: sum of the f diagonal kron blocks.
    da = _diag_blocks(dak, f, dim, hl).astype(dt)      # (depth, b, dim, hl)
    dz = _diag_blocks(dzk, f, hl, dim).astype(dt)      # (depth, b, hl, dim)

    # ---- tiny memory-token chains (decoder_vjp._layer_bwd tail) ----
    inner = packed["wq"].shape[-1]
    hd = inner // heads
    m32 = m.astype(jnp.float32)
    mu_m, rs_m = _ln_stats(m32)
    dm = jnp.zeros(m.shape, dt)
    grads = {k: [] for k in ("wq", "wk", "wv", "wo", "ln1_scale",
                             "ln1_bias")}
    for d in range(depth):
        s1, b1_ = packed["ln1_scale"][d], packed["ln1_bias"][d]
        mn = ((m32 - mu_m) * rs_m * s1 + b1_).astype(dt)
        kh = (mn @ packed["wk"][d].astype(dt)).reshape(b, l, heads, hd)
        vh = (mn @ packed["wv"][d].astype(dt)).reshape(b, l, heads, hd)
        wq_r = packed["wq"][d].astype(dt).reshape(dim, heads, hd)
        wo_r = packed["wo"][d].astype(dt).reshape(heads, hd, dim)
        da_r = da[d].reshape(b, dim, heads, l)
        dz_r = dz[d].reshape(b, heads, l, dim)
        dkh = jnp.einsum("bchj,chd->bjhd", da_r, wq_r)
        dwq = jnp.einsum("bchj,bjhd->chd", da_r, kh).reshape(dim, inner)
        dvh = jnp.einsum("bhjc,hdc->bjhd", dz_r, wo_r)
        dwo = jnp.einsum("bhjc,bjhd->hdc", dz_r, vh).reshape(inner, dim)
        dmn = (dkh.reshape(b, l, inner) @ packed["wk"][d].astype(dt).T
               + dvh.reshape(b, l, inner) @ packed["wv"][d].astype(dt).T)
        dwk = jnp.einsum("blc,blm->cm", mn, dkh.reshape(b, l, inner),
                         preferred_element_type=jnp.float32)
        dwv = jnp.einsum("blc,blm->cm", mn, dvh.reshape(b, l, inner),
                         preferred_element_type=jnp.float32)
        dm_ln, dls1m, dlb1m = dv._ln_bwd(dmn.astype(jnp.float32), m32,
                                         mu_m, rs_m, s1)
        dm = dm + dm_ln.astype(dt)
        grads["wq"].append(dwq.astype(jnp.float32))
        grads["wk"].append(dwk)
        grads["wv"].append(dwv)
        grads["wo"].append(dwo.astype(jnp.float32))
        grads["ln1_scale"].append(dls1m)
        grads["ln1_bias"].append(dlb1m)

    dls1x = _untile_vec(dvec[:, 0], f, dim)
    dlb1x = _untile_vec(dvec[:, 1], f, dim)
    dpacked = {
        "ln1_scale": jnp.stack(grads["ln1_scale"]) + dls1x,
        "ln1_bias": jnp.stack(grads["ln1_bias"]) + dlb1x,
        "wq": jnp.stack(grads["wq"]), "wk": jnp.stack(grads["wk"]),
        "wv": jnp.stack(grads["wv"]), "wo": jnp.stack(grads["wo"]),
        "bo": _untile_vec(dvec[:, 2], f, dim),
        "ln2_scale": _untile_vec(dvec[:, 3], f, dim),
        "ln2_bias": _untile_vec(dvec[:, 4], f, dim),
        "w1": _diag_blocks(dw1k, f, dim, packed["w1"].shape[-1]),
        "b1": _untile_vec(dvec[:, 5], f, packed["b1"].shape[-1]),
        "w2": _diag_blocks(dw2k, f, packed["w2"].shape[-2], dim),
        "b2": _untile_vec(dvec[:, 6], f, dim),
    }
    dpacked = {k: v.astype(packed[k].dtype) for k, v in dpacked.items()}
    return dx, dm.astype(m.dtype), dpacked


folded_decoder_stack.defvjp(_fds_fwd, _fds_bwd)
