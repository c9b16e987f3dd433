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
    _mm = _make_mm(precise)
    x = x_ref[0].astype(jnp.float32)          # (TILE, dim)
    m = m_ref[0].astype(jnp.float32)          # (L, dim)
    scale = dim ** -0.5                       # model-dim scaling quirk
    n = x.shape[0]
    l = m.shape[0]

    for d in range(depth):                    # static unroll
        ln1s = ln1s_ref[d].astype(jnp.float32)
        ln1b = ln1b_ref[d].astype(jnp.float32)
        xn = _layer_norm(x, ln1s, ln1b)
        mn = _layer_norm(m, ln1s, ln1b)       # PreNorm2 shared LN

        q = _mm(xn, wq_ref[d])                            # (n, H*D)
        k = _mm(mn, wk_ref[d])                            # (l, H*D)
        v = _mm(mn, wv_ref[d])

        # Static head loop: Mosaic's dot_general can't batch on a middle
        # dim ("batch dims pos must be 0"); per-head 2D dots instead.
        hd = q.shape[-1] // heads
        ctx_heads = []
        for h in range(heads):
            qh = q[:, h * hd:(h + 1) * hd]          # (n, hd)
            kh = k[:, h * hd:(h + 1) * hd]          # (l, hd)
            vh = v[:, h * hd:(h + 1) * hd]
            dots = _mm(qh, kh.T) * scale
            attn = jax.nn.softmax(dots, axis=-1)
            ctx_heads.append(_mm(attn, vh))
        ctx = jnp.concatenate(ctx_heads, axis=-1)
        x = x + _mm(ctx, wo_ref[d]) + bo_ref[d].astype(jnp.float32)

        xn2 = _layer_norm(x, ln2s_ref[d].astype(jnp.float32),
                          ln2b_ref[d].astype(jnp.float32))
        h = _mm(xn2, w1_ref[d]) + b1_ref[d].astype(jnp.float32)
        h = _gelu_exact(h)
        x = x + _mm(h, w2_ref[d]) + b2_ref[d].astype(jnp.float32)

    out_ref[0] = x.astype(out_ref.dtype)


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
