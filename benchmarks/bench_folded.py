"""Prototype + A/B: lane-folded decoder stack forward (4 pixels per 128
lanes) vs the production decoder_stack_auto.

Motivation (micro_decoder.json A-study + VERDICT r5 item 1): every pixel-side
matmul in the decoder is (rows, 32) x (32, 32) — at most a quarter of the
MXU's 128 lanes on both the contraction and output sides, measured ~20
useful TFLOP/s. Folding 4 consecutive pixels into the minor dim makes every
matmul (rows/4, 128) x (128, 128) with block-diagonal kron-lifted weights:
4x the raw FLOPs but (if the MXU charges narrow matmuls as if padded) far
better utilization.

A previous round tried this at the XLA level and measured SLOWER (b128
model forward 49.6 -> 69.1 ms, docs/ARCHITECTURE.md) — but that was before
bf16 residuals and n-chunking, and it did the group softmax via
block-structured matmuls. This version differs:
  * softmax max AND sum via lane butterflies (no matmul, no relayout;
    groups of l=4 stay 4-consecutive-lane-aligned after folding);
  * LN segment stats via ONE bf16 matmul pair (mu, E[x^2]) against
    kron(I4, ones/32), one-pass variance;
  * everything bf16 except softmax/LN arithmetic (fp32 in registers).

Numerics vs decoder_stack: LN variance is one-pass E[x^2]-mu^2 from bf16
squares (vs two-pass fp32) and the softmax denominator sums in butterfly
order — both ~1e-3-relative effects on bf16 outputs; the CPU equivalence
check below runs both paths in bf16 and asserts a 2e-2 scale-normalized
match (the tolerance test_decoder_vjp.py uses between bf16 paths).

Run on the real chip:  python benchmarks/bench_folded.py
Writes benchmarks/artifacts/folded_ab.json (honest either way).
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # runnable as python benchmarks/<x>.py

import functools
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
FOLD = 4


def _kron_lift(w):
    """(c_in, c_out) -> block-diag (FOLD*c_in, FOLD*c_out)."""
    ci, co = w.shape
    eye = jnp.eye(FOLD, dtype=w.dtype)
    return jnp.einsum("ij,kl->ikjl", eye, w).reshape(FOLD * ci, FOLD * co)


def _kron_lift_b(a):
    """(b, c_in, c_out) -> (b, FOLD*c_in, FOLD*c_out) block-diag."""
    b, ci, co = a.shape
    eye = jnp.eye(FOLD, dtype=a.dtype)
    return jnp.einsum("ij,bkl->bikjl", eye, a).reshape(b, FOLD * ci,
                                                       FOLD * co)


def _seg_mean_mat(dim, dtype):
    """kron(I_FOLD, ones(dim,dim)/dim): xf @ M puts each 32-segment's mean
    in every lane of that segment. 1/32 is exact in bf16."""
    m = jnp.full((dim, dim), 1.0 / dim, dtype)
    return _kron_lift(m)


def folded_stack(x, m, p, depth, heads, dtype=jnp.bfloat16):
    """Forward-only folded decoder stack; math of dv._stack_fwd with
    4-pixel lane folding. x: (b, n, dim), n % FOLD == 0."""
    b, n, dim = x.shape
    l = m.shape[-2]
    hl = heads * l
    assert n % FOLD == 0 and hl == dim, (n, hl, dim)
    scale = dim ** -0.5
    inner = p["wq"].shape[-1]
    hd = inner // heads

    xf = x.reshape(b, n // FOLD, FOLD * dim)
    mavg = _seg_mean_mat(dim, dtype)

    def seg_stats(zf):
        """(mu, rsig) per 32-lane segment, broadcast across the segment."""
        z32 = zf.astype(jnp.float32)
        mu = (zf @ mavg).astype(jnp.float32)
        msq = ((zf * zf) @ mavg).astype(jnp.float32)
        var = jnp.maximum(msq - mu * mu, 0.0)
        return z32, mu, jax.lax.rsqrt(var + 1e-5)

    m32 = m.astype(jnp.float32)
    mu_m = jnp.mean(m32, axis=-1, keepdims=True)
    var_m = jnp.mean(jnp.square(m32 - mu_m), axis=-1, keepdims=True)
    rs_m = jax.lax.rsqrt(var_m + 1e-5)

    for d in range(depth):
        s1, b1_ = p["ln1_scale"][d], p["ln1_bias"][d]
        # memory-side (tiny, unfolded)
        mn = ((m32 - mu_m) * rs_m * s1 + b1_).astype(dtype)
        kh = (mn @ p["wk"][d].astype(dtype)).reshape(b, l, heads, hd)
        vh = (mn @ p["wv"][d].astype(dtype)).reshape(b, l, heads, hd)
        wq_r = p["wq"][d].astype(dtype).reshape(dim, heads, hd)
        wo_r = p["wo"][d].astype(dtype).reshape(heads, hd, dim)
        a = jnp.einsum("chd,bjhd->bchj", wq_r, kh).reshape(b, dim, hl)
        z = jnp.einsum("bjhd,hdc->bhjc", vh, wo_r).reshape(b, hl, dim)
        af = _kron_lift_b((a.astype(jnp.float32) * scale).astype(dtype))
        zf = _kron_lift_b(z)

        # query-side LN1 (folded)
        x32, mu, rsig = seg_stats(xf)
        hn = ((x32 - mu) * rsig * jnp.tile(s1, FOLD)
              + jnp.tile(b1_, FOLD)).astype(dtype)

        # noshift softmax (see decoder_vjp._SOFTMAX_MODE): no max reduce;
        # denominator via a bf16 128-wide segment matmul (groups of l=4
        # stay 4-lane-aligned after folding: kron(I_{FOLD*heads}, ones_l)).
        dots = jnp.einsum("brk,bkj->brj", hn, af,
                          preferred_element_type=jnp.float32)
        e = jnp.exp(jnp.minimum(dots, dv._NOSHIFT_CLAMP))
        e_d = e.astype(dtype)
        segf = _kron_lift(jnp.asarray(
            dv._seg_matrix(heads, l), dtype))
        denom = jax.lax.dot_general(e_d, segf, (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        attn = (e_d / denom.astype(jnp.float32)).astype(dtype)

        x1 = xf + jnp.einsum("brk,bkj->brj", attn, zf).astype(dtype) \
            + jnp.tile(p["bo"][d].astype(dtype), FOLD)

        # FF with LN2 (folded)
        x132, mu1, rs1 = seg_stats(x1)
        g = ((x132 - mu1) * rs1 * jnp.tile(p["ln2_scale"][d], FOLD)
             + jnp.tile(p["ln2_bias"][d], FOLD)).astype(dtype)
        t = g @ _kron_lift(p["w1"][d].astype(dtype)) \
            + jnp.tile(p["b1"][d].astype(dtype), FOLD)
        hg = (0.5 * t.astype(jnp.float32)
              * (1.0 + jax.lax.erf(t.astype(jnp.float32)
                                   / np.sqrt(2.0)))).astype(dtype)
        xf = x1 + hg @ _kron_lift(p["w2"][d].astype(dtype)) \
            + jnp.tile(p["b2"][d].astype(dtype), FOLD)

    return xf.reshape(b, n, dim)


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


def check_equivalence():
    b, n = 2, 256
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, DIM), jnp.bfloat16)
    m = jax.random.normal(jax.random.PRNGKey(2), (b, L, DIM), jnp.bfloat16)
    p = _params(jax.random.PRNGKey(0))
    ref = np.asarray(dv.decoder_stack(x, m, p, DEPTH, HEADS, jnp.bfloat16),
                     np.float32)
    got = np.asarray(folded_stack(x, m, p, DEPTH, HEADS, jnp.bfloat16),
                     np.float32)
    sc = max(np.abs(ref).max(), 1e-3)
    err = np.abs(got - ref).max() / sc
    print(f"equivalence max scale-normalized err: {err:.4f}")
    assert err < 2e-2, err
    return err


def bench_fwd(fn, b, n):
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, n, DIM), jnp.bfloat16)
    m = jax.random.normal(jax.random.PRNGKey(2), (b, L, DIM), jnp.bfloat16)
    p = _params(jax.random.PRNGKey(0))

    def make(iters):
        @jax.jit
        def run(x0, m, p):
            def body(x, _):
                y = fn(x, m, p, DEPTH, HEADS, jnp.bfloat16)
                return 0.998 * y + 1e-3 * x, None
            x, _ = jax.lax.scan(body, x0, None, length=iters)
            return jnp.sum(x.astype(jnp.float32))
        return run

    t_lo = _timed(make(ITERS_LO), x0, m, p)
    t_hi = _timed(make(ITERS_HI), x0, m, p)
    dt = t_hi - t_lo
    return dt / (ITERS_HI - ITERS_LO) if dt > 0 else float("nan")


def main():
    err = check_equivalence()
    out = {"equivalence_err": round(float(err), 5)}
    for b, n in ((64, 4096), (128, 4096)):
        auto_ms = 1e3 * bench_fwd(dv.decoder_stack_auto, b, n)
        fold_ms = 1e3 * bench_fwd(folded_stack, b, n)
        out[f"b{b}"] = {"auto_fwd_ms": round(auto_ms, 3),
                        "folded_fwd_ms": round(fold_ms, 3),
                        "speedup_x": round(auto_ms / fold_ms, 3)}
        print(f"b{b}: auto {auto_ms:.3f} ms  folded {fold_ms:.3f} ms "
              f"({auto_ms / fold_ms:.2f}x)")

    print(json.dumps(out))
    if jax.devices()[0].platform == "cpu":
        print("cpu smoke run - artifact not written")
        return
    artifact = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                             "artifacts", "folded_ab.json")
    with open(artifact, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {artifact}")


if __name__ == "__main__":
    main()
