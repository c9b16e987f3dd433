"""A/B of the three group-softmax forms in the decoder stack
(nn/decoder_vjp.py `_SOFTMAX_MODE`): segmatmul (reference-faithful
reshape-max + segment-matmul denominator), butterfly (both reductions via
lane rolls + parity selects), noshift (exp(min(dots, 80)) with no max
reduction at all — a softmax shift only cancels in exact arithmetic, and
the clamp keeps fp32 exp finite).

micro_decoder.json's B-study attributes ~0.72 of the 1.52 ms
b64/n2048/depth8 forward to the softmax block. First chip result
(2026-08-19): butterfly REGRESSED the b64 train step 808 -> 635 pairs/s
(jnp.roll on the lane axis lowers to slice+concat relayouts) — this A/B
records all three so the default is measurement-picked.

Measurement: output-chained scans (each iteration's result perturbs the
next input — hoist/DCE-proof) at two lengths, differenced so the ~30 ms
tunnel dispatch and D2H sync cancel. Toggle is decoder_vjp._SOFTMAX_MODE +
jax.clear_caches() (the flag is read at trace time).

Writes benchmarks/artifacts/butterfly_ab.json (honest either way).
Run on the real chip:  python benchmarks/bench_butterfly.py
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # runnable as python benchmarks/<x>.py

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import dahitra_tpu.nn.decoder_vjp as dv

ITERS_LO = 16
ITERS_HI = 80
REPEATS = 3
DEPTH, HEADS, L, DIM = 8, 8, 4, 32


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def _timed(jitted, *args):
    _sync(jitted(*args))
    best = np.inf
    for _ in range(REPEATS):
        t0 = time.time()
        out = jitted(*args)
        _sync(out)
        best = min(best, time.time() - t0)
    return best


def _params(key):
    ks = jax.random.split(key, 8)
    return {
        "ln1_scale": jnp.ones((DEPTH, DIM)),
        "ln1_bias": jnp.zeros((DEPTH, DIM)),
        "wq": jax.random.normal(ks[0], (DEPTH, DIM, HEADS * 64)) * 0.1,
        "wk": jax.random.normal(ks[1], (DEPTH, DIM, HEADS * 64)) * 0.1,
        "wv": jax.random.normal(ks[2], (DEPTH, DIM, HEADS * 64)) * 0.1,
        "wo": jax.random.normal(ks[3], (DEPTH, HEADS * 64, DIM)) * 0.1,
        "bo": jnp.zeros((DEPTH, DIM)),
        "ln2_scale": jnp.ones((DEPTH, DIM)),
        "ln2_bias": jnp.zeros((DEPTH, DIM)),
        "w1": jax.random.normal(ks[4], (DEPTH, DIM, DIM)) * 0.1,
        "b1": jnp.zeros((DEPTH, DIM)),
        "w2": jax.random.normal(ks[5], (DEPTH, DIM, DIM)) * 0.1,
        "b2": jnp.zeros((DEPTH, DIM)),
    }


def bench_fwd(b, n):
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, n, DIM), jnp.bfloat16)
    m = jax.random.normal(jax.random.PRNGKey(2), (b, L, DIM), jnp.bfloat16)
    p = _params(jax.random.PRNGKey(0))

    def make(iters):
        @jax.jit
        def run(x0, m, p):
            def body(x, _):
                y = dv.decoder_stack_auto(x, m, p, DEPTH, HEADS,
                                          jnp.bfloat16)
                return 0.998 * y + 1e-3 * x, None  # chain, keep bounded
            x, _ = jax.lax.scan(body, x0, None, length=iters)
            return jnp.sum(x.astype(jnp.float32))
        return run

    t_lo = _timed(make(ITERS_LO), x0, m, p)
    t_hi = _timed(make(ITERS_HI), x0, m, p)
    dt = t_hi - t_lo
    return dt / (ITERS_HI - ITERS_LO) if dt > 0 else float("nan")


def bench_fwd_bwd(b, n):
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, n, DIM), jnp.bfloat16)
    m = jax.random.normal(jax.random.PRNGKey(2), (b, L, DIM), jnp.bfloat16)
    p = _params(jax.random.PRNGKey(0))

    def loss(x, m, p):
        return jnp.sum(dv.decoder_stack_auto(
            x, m, p, DEPTH, HEADS, jnp.bfloat16).astype(jnp.float32))

    def make(iters):
        @jax.jit
        def run(x0, m, p):
            def body(x, _):
                g = jax.grad(loss)(x, m, p)
                # chain the gradient into the next input (hoist-proof)
                return x + (1e-6 * g).astype(x.dtype), None
            x, _ = jax.lax.scan(body, x0, None, length=iters)
            return jnp.sum(x.astype(jnp.float32))
        return run

    t_lo = _timed(make(ITERS_LO), x0, m, p)
    t_hi = _timed(make(ITERS_HI), x0, m, p)
    dt = t_hi - t_lo
    return dt / (ITERS_HI - ITERS_LO) if dt > 0 else float("nan")


def main():
    out = {}
    for b, n in ((64, 4096), (128, 4096)):
        res = {}
        for mode in ("segmatmul", "butterfly", "noshift"):
            dv._SOFTMAX_MODE = mode
            jax.clear_caches()
            res[f"fwd_{mode}_ms"] = round(1e3 * bench_fwd(b, n), 3)
            res[f"fwdbwd_{mode}_ms"] = round(1e3 * bench_fwd_bwd(b, n), 3)
        for mode in ("butterfly", "noshift"):
            res[f"fwd_{mode}_speedup_x"] = round(
                res["fwd_segmatmul_ms"] / res[f"fwd_{mode}_ms"], 3)
            res[f"fwdbwd_{mode}_speedup_x"] = round(
                res["fwdbwd_segmatmul_ms"] / res[f"fwdbwd_{mode}_ms"], 3)
        out[f"b{b}_n{n}"] = res
        print(f"b{b}: {json.dumps(res)}")
    dv._SOFTMAX_MODE = "segmatmul"

    print(json.dumps(out))
    if jax.devices()[0].platform == "cpu":
        print("cpu smoke run - artifact not written")
        return
    artifact = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                             "artifacts", "butterfly_ab.json")
    with open(artifact, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {artifact}")


if __name__ == "__main__":
    main()
