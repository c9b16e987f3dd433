"""Pallas TPU kernel: the whole cross-attention TransformerDecoder stack in
one fused pass.

DAHiTra's LEVIR hot spot is the depth-8 pixel-token decoder at 1/4 scale
(4096 queries x 32 dims attending to 4 semantic tokens, SURVEY.md §7). As
XLA ops this is ~50 small kernels per layer (LayerNorms, 5 tiny matmuls,
softmax, adds), each reading/writing the (B, 4096, 32) activation in HBM.
This kernel keeps a query row-tile resident in VMEM through ALL layers:

  grid = (B, N // TILE); per program:
    x_tile <- VMEM (TILE, 32)
    for d in range(depth):                      # static unroll
      q = LN_d(x) Wq_d; k,v = LN_d(m) Wk_d/Wv_d # PreNorm2: shared LN
      attn = softmax(q k^T * dim**-0.5)         # dim**-0.5 quirk preserved
      x += (attn v) Wout_d + bout_d
      x += W2_d gelu(W1_d LN2_d(x) + b1_d) + b2_d
    out_tile -> HBM once

All decoder weights for depth 8 total ~1 MB — they sit in VMEM untiled.
Numerics run in fp32 regardless of the input dtype (matching the flax
module's fp32 LayerNorm/softmax policy).

Semantics match dahitra_tpu.nn.blocks.TransformerDecoder exactly;
``pack_decoder_params`` repacks that module's param tree into the stacked
layout this kernel consumes. Verified by tests/test_pallas.py (interpret
mode vs the flax module) and benchmarked by benchmarks/bench_decoder.py.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_decoder_params(params: Dict, depth: int) -> Dict[str, jax.Array]:
    """Stack a flax TransformerDecoder param tree (attn_norm_i / attn_i /
    ff_norm_i / ff_i) along a leading depth axis."""
    def stack(fn):
        return jnp.stack([fn(i) for i in range(depth)])

    return {
        "ln1_scale": stack(lambda i: params[f"attn_norm_{i}"]["scale"]),
        "ln1_bias": stack(lambda i: params[f"attn_norm_{i}"]["bias"]),
        "wq": stack(lambda i: params[f"attn_{i}"]["to_q"]["kernel"]),
        "wk": stack(lambda i: params[f"attn_{i}"]["to_k"]["kernel"]),
        "wv": stack(lambda i: params[f"attn_{i}"]["to_v"]["kernel"]),
        "wo": stack(lambda i: params[f"attn_{i}"]["to_out"]["kernel"]),
        "bo": stack(lambda i: params[f"attn_{i}"]["to_out"]["bias"]),
        "ln2_scale": stack(lambda i: params[f"ff_norm_{i}"]["scale"]),
        "ln2_bias": stack(lambda i: params[f"ff_norm_{i}"]["bias"]),
        "w1": stack(lambda i: params[f"ff_{i}"]["fc1"]["kernel"]),
        "b1": stack(lambda i: params[f"ff_{i}"]["fc1"]["bias"]),
        "w2": stack(lambda i: params[f"ff_{i}"]["fc2"]["kernel"]),
        "b2": stack(lambda i: params[f"ff_{i}"]["fc2"]["bias"]),
    }


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf approximation (|err|<1.5e-7).

    Mosaic has no erf/erfc lowering; this keeps the kernel's GELU within
    fp32 parity tolerance of jax.nn.gelu(approximate=False).
    """
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return sign * y


def _gelu_exact(x):
    return x * 0.5 * (1.0 + _erf(x / np.sqrt(2.0).astype(np.float32)))


def _layer_norm(x, scale, bias):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias


def _make_mm(precise: bool):
    """Matmul policy: bf16 MXU operands + fp32 accumulation (the flax
    module's policy at dtype=bfloat16), or full fp32 when ``precise``."""
    op_dtype = jnp.float32 if precise else jnp.bfloat16

    def mm(a, b):
        return jnp.dot(a.astype(op_dtype), b.astype(op_dtype),
                       preferred_element_type=jnp.float32)

    return mm


def _decoder_kernel(x_ref, m_ref,
                    ln1s_ref, ln1b_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                    bo_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
                    b2_ref, out_ref, *, depth: int, heads: int, dim: int,
                    precise: bool):
    """Reassociated ("v2") kernel body.

    v1 ran the textbook per-head attention, producing (TILE, L) and
    (TILE, hd) tensors in a static head loop — L=4-wide lanes and 2*heads
    extra pixel-axis matmuls per layer; XLA beat it (see module docstring
    history). The small-memory reassociation used by
    nn.blocks.CrossAttention folds the head loop onto the WEIGHT side:

      Af = [Wq_h K_h^T]_h           (dim, heads*L)  - tiny, per layer
      Z  = [V_h Wout_h]_h           (heads*L, dim)  - tiny, per layer
      dots = LN(x) Af * dim**-0.5   (TILE, heads*L) - one full-lane matmul
      attn = per-L-group softmax    (row-max shift is constant per group,
                                     so each group's softmax is EXACT)
      x   += attn Z + b_out         (TILE, heads*L)@(heads*L, dim)

    Every pixel-axis op is now (TILE, 32)-shaped, the head loop touches
    only (dim, hd)x(hd, L) weight products, and the whole depth-8 stack
    still reads/writes the activation HBM exactly once.
    """
    _mm = _make_mm(precise)
    x = x_ref[0].astype(jnp.float32)          # (TILE, dim)
    m = m_ref[0].astype(jnp.float32)          # (L, dim)
    scale = dim ** -0.5                       # model-dim scaling quirk
    l = m.shape[0]
    hl = heads * l
    # Segment-sum matrix over each head's L token lanes: S[i,j] = 1 iff
    # lanes i, j belong to the same head group.
    row = jax.lax.broadcasted_iota(jnp.int32, (hl, hl), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hl, hl), 1)
    sseg = (row // l == col // l).astype(jnp.float32)

    for d in range(depth):                    # static unroll
        ln1s = ln1s_ref[d].astype(jnp.float32)
        ln1b = ln1b_ref[d].astype(jnp.float32)
        xn = _layer_norm(x, ln1s, ln1b)
        mn = _layer_norm(m, ln1s, ln1b)       # PreNorm2 shared LN

        k = _mm(mn, wk_ref[d])                            # (l, H*D)
        v = _mm(mn, wv_ref[d])
        hd = k.shape[-1] // heads
        af_cols, z_rows = [], []
        for h in range(heads):                # tiny weight-side products
            wqh = wq_ref[d][:, h * hd:(h + 1) * hd]       # (dim, hd)
            kh = k[:, h * hd:(h + 1) * hd]                # (l, hd)
            vh = v[:, h * hd:(h + 1) * hd]
            woh = wo_ref[d][h * hd:(h + 1) * hd, :]       # (hd, dim)
            af_cols.append(_mm(wqh, kh.T))                # (dim, l)
            z_rows.append(_mm(vh, woh))                   # (l, dim)
        af = jnp.concatenate(af_cols, axis=1)             # (dim, hl)
        zm = jnp.concatenate(z_rows, axis=0)              # (hl, dim)

        dots = _mm(xn, af) * scale                        # (n, hl) fp32
        # Max shift PER head group (static lane slices — Mosaic-friendly):
        # a full-row max keeps each group's softmax mathematically exact,
        # but a head whose logits sit >~88 below another head's max would
        # underflow its whole exp() row and divide 0/0.
        mx = jnp.concatenate(
            [jnp.broadcast_to(
                jnp.max(dots[:, h * l:(h + 1) * l], axis=-1, keepdims=True),
                (dots.shape[0], l)) for h in range(heads)], axis=1)
        e = jnp.exp(dots - mx)
        denom = jnp.dot(e, sseg, preferred_element_type=jnp.float32)
        attn = e / denom
        x = x + _mm(attn, zm) + bo_ref[d].astype(jnp.float32)

        xn2 = _layer_norm(x, ln2s_ref[d].astype(jnp.float32),
                          ln2b_ref[d].astype(jnp.float32))
        h = _mm(xn2, w1_ref[d]) + b1_ref[d].astype(jnp.float32)
        h = _gelu_exact(h)
        x = x + _mm(h, w2_ref[d]) + b2_ref[d].astype(jnp.float32)

    out_ref[0] = x.astype(out_ref.dtype)


def plain_decoder_stack(x: jax.Array, m: jax.Array,
                        packed: Dict[str, jax.Array], depth: int,
                        heads: int, dtype) -> jax.Array:
    """Pure-function replica of nn.blocks.TransformerDecoder's math from the
    packed param layout (fp32 LayerNorm/softmax, matmuls in ``dtype``).
    Used as the custom_vjp backward rule for the fused kernel — any
    mathematically-equal formulation yields the same gradients — and as an
    oracle in tests."""
    scale = x.shape[-1] ** -0.5

    def ln(t, s, b):
        tf = t.astype(jnp.float32)
        mu = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(tf * tf, axis=-1, keepdims=True)
                          - mu * mu, 0.0)
        return (tf - mu) * jax.lax.rsqrt(var + 1e-5) * s + b

    def heads_split(t):
        b, n, hd = t.shape
        return t.reshape(b, n, heads, hd // heads).transpose(0, 2, 1, 3)

    for d in range(depth):
        xn = ln(x, packed["ln1_scale"][d], packed["ln1_bias"][d]).astype(dtype)
        mn = ln(m, packed["ln1_scale"][d], packed["ln1_bias"][d]).astype(dtype)
        q = heads_split(xn @ packed["wq"][d].astype(dtype))
        k = heads_split(mn @ packed["wk"][d].astype(dtype))
        v = heads_split(mn @ packed["wv"][d].astype(dtype))
        dots = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.float32) * scale
        attn = jax.nn.softmax(dots, axis=-1).astype(dtype)
        ctx = jnp.einsum("bhij,bhjd->bhid", attn, v)
        bb, hh, nn_, dd = ctx.shape
        ctx = ctx.transpose(0, 2, 1, 3).reshape(bb, nn_, hh * dd)
        x = x + ctx @ packed["wo"][d].astype(dtype) + packed["bo"][d].astype(dtype)
        xn2 = ln(x, packed["ln2_scale"][d], packed["ln2_bias"][d]).astype(dtype)
        h = xn2 @ packed["w1"][d].astype(dtype) + packed["b1"][d].astype(dtype)
        h = jax.nn.gelu(h, approximate=False)
        x = x + h @ packed["w2"][d].astype(dtype) + packed["b2"][d].astype(dtype)
    return x


def make_fused_decoder(depth: int, heads: int, tile: int, dtype):
    """fused kernel forward + plain-stack backward, as one differentiable
    function (x, m, packed) -> decoded x."""

    precise = jnp.dtype(dtype) == jnp.float32

    @jax.custom_vjp
    def f(x, m, packed):
        return fused_transformer_decoder(x, m, packed, depth=depth,
                                         heads=heads, tile=tile,
                                         precise=precise)

    def fwd(x, m, packed):
        return f(x, m, packed), (x, m, packed)

    def bwd(res, g):
        x, m, packed = res
        _, vjp = jax.vjp(
            lambda a, b, p: plain_decoder_stack(a, b, p, depth, heads, dtype),
            x, m, packed)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def pick_tile(n: int) -> int | None:
    """Largest supported row tile dividing n (None = shape unsupported)."""
    for t in (512, 256, 128):
        if n % t == 0:
            return t
    return None


@functools.partial(jax.jit,
                   static_argnames=("depth", "heads", "tile", "precise"))
def fused_transformer_decoder(x: jax.Array, m: jax.Array,
                              packed: Dict[str, jax.Array],
                              depth: int, heads: int,
                              tile: int = 512,
                              precise: bool = False) -> jax.Array:
    """x: (B, N, dim) queries; m: (B, L, dim) memory tokens; returns the
    decoded (B, N, dim). N must be a multiple of ``tile``."""
    b, n, dim = x.shape
    assert n % tile == 0, f"N={n} not a multiple of tile={tile}"
    grid = (b, n // tile)

    w_spec = lambda arr: pl.BlockSpec(arr.shape, lambda i, j: (0,) * arr.ndim,
                                      memory_space=pltpu.VMEM)
    order = ("ln1_scale", "ln1_bias", "wq", "wk", "wv", "wo", "bo",
             "ln2_scale", "ln2_bias", "w1", "b1", "w2", "b2")
    kernel = functools.partial(_decoder_kernel, depth=depth, heads=heads,
                               dim=dim, precise=precise)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, dim), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m.shape[1], dim), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [w_spec(packed[k]) for k in order],
        out_specs=pl.BlockSpec((1, tile, dim), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )(x, m, *[packed[k] for k in order])
