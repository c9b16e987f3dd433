"""Chip A/B: folded-layout Pallas decoder kernel vs the XLA noshift path.

VERDICT round-5 attack 1a executed for real (the earlier "folded decoder"
A/B, benchmarks/bench_folded.py, was the XLA-level rewrite — relayouts ate
the win; this one keeps the folded layout VMEM-resident inside one Pallas
kernel, see dahitra_tpu/pallas/folded_decoder.py).

Stages (gated so the forward can veto the backward build):
  fwd      folded kernel fwd vs decoder_stack_auto fwd
  fwdbwd   (once the bwd kernel exists) full custom_vjp vs the production
           decoder_stack_auto fwd+bwd

Production shapes: (b, n) in {(64, 4096), (128, 4096)} at depth 8 / heads 8
/ l 4 / dim 32 (trans_3), the step's dominant decoder cost. Differenced
output-chained scans, one process. Writes
benchmarks/artifacts/folded_kernel_ab.json (honest either way).
Run on the real chip:  python benchmarks/bench_folded_kernel.py
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import dahitra_tpu.nn.decoder_vjp as dv
from dahitra_tpu.pallas import folded_decoder as fd

ITERS_LO = 16
ITERS_HI = 48
REPEATS = 3
DEPTH, HEADS, DIM, L = 8, 8, 32, 4


def _params():
    rng = np.random.default_rng(0)
    inner = HEADS * 64

    def mk(shp, s=0.05):
        return jnp.asarray(rng.standard_normal(shp) * s, jnp.float32)

    return dict(
        ln1_scale=jnp.ones((DEPTH, DIM)) + mk((DEPTH, DIM)),
        ln1_bias=mk((DEPTH, DIM)),
        wq=mk((DEPTH, DIM, inner)), wk=mk((DEPTH, DIM, inner)),
        wv=mk((DEPTH, DIM, inner)), wo=mk((DEPTH, inner, DIM)),
        bo=mk((DEPTH, DIM)),
        ln2_scale=jnp.ones((DEPTH, DIM)) + mk((DEPTH, DIM)),
        ln2_bias=mk((DEPTH, DIM)),
        w1=mk((DEPTH, DIM, DIM)), b1=mk((DEPTH, DIM)),
        w2=mk((DEPTH, DIM, DIM)), b2=mk((DEPTH, DIM)),
    )


def _diff_ms(make_run, x, m, p):
    def scan_time(iters):
        run = make_run(iters)
        np.asarray(run(x, m, p)[0, 0, 0])
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.time()
            np.asarray(run(x, m, p)[0, 0, 0])
            best = min(best, time.time() - t0)
        return best

    lo = scan_time(ITERS_LO)
    hi = scan_time(ITERS_HI)
    return (hi - lo) / (ITERS_HI - ITERS_LO) * 1e3


def _chain_fwd(fn):
    def make(iters):
        @jax.jit
        def run(x, m, p):
            def body(c, _):
                y = fn(c, m, p)
                return x + (y * 1e-30).astype(x.dtype), None
            out, _ = jax.lax.scan(body, x, None, length=iters)
            return out
        return run
    return make


def _chain_fb(fn):
    def make(iters):
        @jax.jit
        def run(x, m, p):
            def body(c, _):
                g = jax.grad(lambda xx: jnp.sum(
                    fn(xx, m, p).astype(jnp.float32)))(c)
                return x + (g * 1e-30).astype(x.dtype), None
            out, _ = jax.lax.scan(body, x, None, length=iters)
            return out
        return run
    return make


def main():
    p = _params()
    out = {}
    have_bwd = hasattr(fd, "folded_decoder_stack")
    for b, n in ((64, 4096), (128, 4096)):
        x = jax.random.normal(jax.random.PRNGKey(1), (b, n, DIM),
                              jnp.bfloat16)
        m = jax.random.normal(jax.random.PRNGKey(2), (b, L, DIM),
                              jnp.bfloat16)

        def xla_fwd(x, m, p):
            return dv.decoder_stack_auto(x, m, p, DEPTH, HEADS, jnp.bfloat16)

        def ker_fwd(x, m, p):
            y, _ = fd.folded_decoder_fwd(x, m, p, DEPTH, HEADS, save=False)
            return y

        res = {
            "xla_fwd_ms": round(_diff_ms(_chain_fwd(xla_fwd), x, m, p), 3),
            "kernel_fwd_ms": round(_diff_ms(_chain_fwd(ker_fwd), x, m, p), 3),
        }
        res["fwd_speedup_x"] = round(res["xla_fwd_ms"]
                                     / max(res["kernel_fwd_ms"], 1e-9), 3)
        if have_bwd:
            def ker_stack(x, m, p):
                return fd.folded_decoder_stack(x, m, p, DEPTH, HEADS)

            res["xla_fwdbwd_ms"] = round(
                _diff_ms(_chain_fb(xla_fwd), x, m, p), 3)
            res["kernel_fwdbwd_ms"] = round(
                _diff_ms(_chain_fb(ker_stack), x, m, p), 3)
            res["fwdbwd_speedup_x"] = round(
                res["xla_fwdbwd_ms"] / max(res["kernel_fwdbwd_ms"], 1e-9), 3)
        out[f"b{b}_n{n}"] = res
        print(f"b{b}: {res}", flush=True)

    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "artifacts", "folded_kernel_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    print("wrote", path)


if __name__ == "__main__":
    main()
