"""Pallas TPU kernel: fused semantic tokenizer.

The tokenizer (reference networks.py:312-319 / :1273-1280; flax module
``nn.blocks.SemanticTokenizer``) is a 1x1 conv to L per-pixel logits, a
softmax over the PIXEL axis, and an attention-weighted feature pool:

    logits = x @ W                  (B, N, L)   N = H*W pixels, L = 4
    attn   = softmax_N(logits)      column softmax over the long axis
    tokens = attn^T @ x             (B, L, C)

As XLA ops this reads the (B, N, C) feature map from HBM at least twice
(logits matmul, pooling einsum) plus the softmax round-trips on the (B, N, L)
logits. SURVEY §2.9 names it a fusion candidate; it runs 3x per DAHiTra
step (both dates stacked, three scales). This kernel does the whole chain in
ONE pass over x per batch row:

    grid = (B,); per program:
      x_blk <- VMEM (N, C)          256 KB bf16 at the deepest shape
      logits = x_blk @ W            fp32 accumulate
      attn   = exact softmax over rows (single block: no online rescaling)
      tokens = attn^T @ x_blk -> out (L, C)

Numerics: matmuls run on the MXU in the input dtype with fp32 accumulation;
the softmax is fp32 (matching the flax module, which upcasts logits).

A/B vs the XLA path is measured by benchmarks/bench_tokenizer.py
(output-chained differenced scans on the real chip; the verdict either way
is recorded in benchmarks/artifacts/tokenizer_ab.json and the module
docstring of whichever path wins stays the default). The kernel is
parity-tested in tests/test_pallas.py (interpret mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tokenizer_kernel(x_ref, w_ref, out_ref, *, precise: bool):
    # Logits live TRANSPOSED, (L, N): with N in the lane dim the fp32
    # softmax intermediates cost L_pad*N*4 bytes (a (N, L=4) layout pads
    # L to 128 lanes — 32x the VMEM, and the xBD 65536-pixel shape blew
    # the 16M scoped-vmem limit that way). The (L, N) orientation needs no
    # transpose: contract w's C against x's C directly.
    op_dtype = jnp.float32 if precise else jnp.bfloat16
    x = x_ref[0]                                   # (N, C)
    logits_t = jax.lax.dot_general(
        w_ref[...].astype(op_dtype), x.astype(op_dtype),
        (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # (L, N)
    mx = jnp.max(logits_t, axis=1, keepdims=True)  # per-token max over pixels
    e = jnp.exp(logits_t - mx)
    attn = (e / jnp.sum(e, axis=1, keepdims=True)).astype(op_dtype)
    tokens = jnp.dot(attn, x.astype(op_dtype),
                     preferred_element_type=jnp.float32)   # (L, C)
    out_ref[0] = tokens.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("precise",))
def fused_semantic_tokenizer(x: jax.Array, w: jax.Array,
                             precise: bool = False) -> jax.Array:
    """x: (B, N, C) features; w: (C, L) token-logit projection.
    Returns (B, L, C) semantic tokens. The whole N axis must fit one VMEM
    block (true for every DAHiTra shape: N <= 4096, C = 32)."""
    b, n, c = x.shape
    l = w.shape[1]
    return pl.pallas_call(
        functools.partial(_tokenizer_kernel, precise=precise),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, l), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x, w)
