"""Microbenchmark: Pallas fused decoder vs XLA at DAHiTra's deepest decoder
shape (trans_3: 4096 pixel tokens x 32 dims vs 4 semantic tokens, depth 8).

Measured on the v5e chip (2026-08) with the output-chained (hoist-proof)
loop below: XLA 7.3 ms vs Pallas 15.0 ms per batch-32 iteration. A NEGATIVE
result, recorded deliberately: at dim 32 / 4 keys the MXU is pad-dominated
and XLA's fusion of the tiny-matmul chain beats this kernel's per-head 2D
dots (Mosaic cannot batch dot_general on a middle dim, forcing the head
loop). The decoder is ~17% of DAHiTra's forward, so the framework keeps
the XLA path; the kernel remains as a verified, fully VMEM-resident
reference implementation of a multi-layer cross-attention stack
(dahitra_tpu/pallas/fused_decoder.py) for shapes where it can win
(larger dim / longer memory).

Run on the real chip; sync via np.asarray (block_until_ready under-blocks
on the tunnel). The loop chains each iteration's output into the next
input so XLA cannot hoist work out of the timing loop.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # runnable as python benchmarks/<x>.py

import time

import numpy as np

import jax
import jax.numpy as jnp

from dahitra_tpu.nn import TransformerDecoder
from dahitra_tpu.pallas.fused_decoder import (fused_transformer_decoder,
                                              pack_decoder_params)

B, N, L, DIM, DEPTH, HEADS = 32, 4096, 4, 32, 8, 8
REP = 16


def bench(fn, x0, m, label=""):
    """Chains the decoder output into the next iteration's input so XLA
    cannot hoist the computation out of the timing loop."""

    @jax.jit
    def loop(x, m):
        def body(c, _):
            return fn(c, m), None
        out, _ = jax.lax.scan(body, x, None, length=REP)
        return jnp.sum(out)

    np.asarray(loop(x0, m))
    t0 = time.time()
    np.asarray(loop(x0, m))
    dt = (time.time() - t0) / REP
    print(f"{label}: {dt * 1000:.2f} ms/iter")
    return dt


def main():
    plain = TransformerDecoder(dim=DIM, depth=DEPTH, heads=HEADS,
                               dim_head=64, mlp_dim=DIM, pallas=False,
                               dtype=jnp.bfloat16)
    fused_mod = TransformerDecoder(dim=DIM, depth=DEPTH, heads=HEADS,
                                   dim_head=64, mlp_dim=DIM, pallas=True,
                                   dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, DIM), jnp.bfloat16)
    m = jax.random.normal(jax.random.PRNGKey(1), (B, L, DIM), jnp.bfloat16)
    variables = jax.jit(plain.init)(key, x, m)
    packed = pack_decoder_params(variables["params"], DEPTH)

    t_xla = bench(lambda x, m: plain.apply(variables, x, m), x, m,
                  label=f"XLA plain     (B{B} N{N} d{DEPTH})")
    t_mod = bench(lambda x, m: fused_mod.apply(variables, x, m), x, m,
                  label=f"module pallas (B{B} N{N} d{DEPTH})")
    t_pl = bench(lambda x, m: fused_transformer_decoder(
        x, m, packed, depth=DEPTH, heads=HEADS, tile=512), x, m,
        label=f"Pallas direct (B{B} N{N} d{DEPTH})")
    print(f"speedup vs plain: module {t_xla / t_mod:.2f}x, "
          f"direct {t_xla / t_pl:.2f}x")


if __name__ == "__main__":
    main()
