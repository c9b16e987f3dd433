"""Microbenchmarks that decide the round-5 decoder attack.

The b64 DAHiTra train step spends ~40 of 82 ms in the transformer-difference
modules' backward (train_roofline.json, VERDICT r4 item 1). Every pixel-axis
matmul in the decoder stack is (rows, 32) x (32, 32) — the reference model's
dim=32 uses at most 32 of the MXU's 128 lanes on BOTH the contraction and
output sides. Whether that costs 1x, 4x, or 16x versus a 128-wide matmul is
a hardware question this script answers empirically, along with a part-split
of the decoder layer so the attack targets the real time sink:

  A. matmul shape study  - (R,32)x(32,32) vs the SAME math kron-folded to
     (R/4,128)x(128,128) vs a pure 128-wide matmul of equal useful FLOPs.
  B. decoder part split  - the depth-8 stack with parts knocked out
     (identity LN / no softmax / attention only / FF only); differences
     attribute the per-layer time to LN, attention-matmuls, softmax and FF.
  C. current production path - decoder_stack_auto fwd and fwd+bwd at the
     in-model shape (b64/b128, n 4096, depth 8, heads 8, l 4).

Everything runs inside jitted scans (ITERS >= 16) with a carry the body
feeds, per the tunnel measurement rules (.claude/skills/verify/SKILL.md).
Run on the real chip:  python benchmarks/micro_decoder.py
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

ITERS_LO = 16
ITERS_HI = 80  # differenced: (hi - lo) = 64 pure device iterations
REPEATS = 3


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


def _scan(fn, *consts):
    """Differenced-scan timer for fn(i, *consts)->array (or pytree).

    v1 of this file carried only out.reshape(-1)[0] and divided one scan's
    wall time by ITERS: XLA slice-propagated the body down to the one
    element (a (R,32)@(32,32) matmul probe collapsed to a dot product) and
    every variant read ~0.9 ms/iter = the ~30 ms tunnel dispatch / 32.
    Now the carry consumes FULL sums of every output leaf (no DCE), and two
    scan lengths are differenced so dispatch+D2H cancel (bench.py canary
    pattern). Returns seconds per inner iteration."""
    def make(iters):
        @jax.jit
        def run(*consts):
            def body(c, i):
                out = fn(i, *consts)
                s = sum(jnp.sum(t.astype(jnp.float32))
                        for t in jax.tree_util.tree_leaves(out))
                return (c + s) * 1e-30, None  # keep magnitude bounded
            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return out
        return run

    def measure():
        t_lo = _timed(make(ITERS_LO), *consts)
        t_hi = _timed(make(ITERS_HI), *consts)
        dt = t_hi - t_lo
        if dt <= 0:
            return float("nan")
        return dt / (ITERS_HI - ITERS_LO)
    return measure


# ---------------------------------------------------------------- A
def matmul_shape_study(rows=1 << 20):
    key = jax.random.PRNGKey(0)
    x32 = jax.random.normal(key, (rows, 32), jnp.bfloat16)
    w32 = jax.random.normal(key, (32, 32), jnp.bfloat16)
    xf = x32.reshape(rows // 4, 128)  # 4 pixels folded into lanes
    wf = jnp.asarray(np.kron(np.eye(4, dtype=np.float32),
                             np.asarray(w32, np.float32))).astype(jnp.bfloat16)
    x128 = jax.random.normal(key, (rows // 4, 128), jnp.bfloat16)
    w128 = jax.random.normal(key, (128, 128), jnp.bfloat16)

    out = {}
    # same useful math: rows*32*32*2 flops
    out["narrow_32x32_ms"] = 1e3 * _scan(
        lambda i, x, w: (x + i.astype(x.dtype) * 0) @ w, x32, w32)()
    out["folded_kron128_ms"] = 1e3 * _scan(
        lambda i, x, w: (x + i.astype(x.dtype) * 0) @ w, xf, wf)()
    # pure 128-wide matmul of the SAME total FLOPs as the kron-folded one
    # (rows/4 x 128 x 128 = rows*32*128): if this times like the folded one,
    # the MXU charges K=N=32 as if padded to 128.
    out["dense_128x128_ms"] = 1e3 * _scan(
        lambda i, x, w: (x + i.astype(x.dtype) * 0) @ w, x128, w128)()
    out["rows"] = rows
    out["useful_tflops_narrow"] = round(
        2 * rows * 32 * 32 / (out["narrow_32x32_ms"] / 1e3) / 1e12, 2)
    out["useful_tflops_folded"] = round(
        2 * rows * 32 * 32 / (out["folded_kron128_ms"] / 1e3) / 1e12, 2)
    out["raw_tflops_dense"] = round(
        2 * (rows // 4) * 128 * 128 / (out["dense_128x128_ms"] / 1e3) / 1e12,
        2)
    return out


# ---------------------------------------------------------------- B
def decoder_part_split(b=64, n=4096, depth=8, heads=8, l=4, dim=32):
    """Knockout study of one decoder stack (production math, from
    nn/decoder_vjp._stack_fwd's layer body) at the in-model chunked shape:
    the production path chunks n to keep b*n <= 2^17 rows."""
    from dahitra_tpu.nn.decoder_vjp import _seg_matrix

    cn = max(1, (1 << 17) // b)
    n = min(n, cn)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, n, dim), jnp.bfloat16)
    m = jax.random.normal(key, (b, heads * 0 + l, dim), jnp.bfloat16)
    ks = jax.random.split(key, 16)
    p = {
        "ln1_scale": jnp.ones((depth, dim)), "ln1_bias": jnp.zeros((depth, dim)),
        "wq": jax.random.normal(ks[0], (depth, dim, heads * 64)) * 0.1,
        "wk": jax.random.normal(ks[1], (depth, dim, heads * 64)) * 0.1,
        "wv": jax.random.normal(ks[2], (depth, dim, heads * 64)) * 0.1,
        "wo": jax.random.normal(ks[3], (depth, heads * 64, dim)) * 0.1,
        "bo": jnp.zeros((depth, dim)),
        "ln2_scale": jnp.ones((depth, dim)), "ln2_bias": jnp.zeros((depth, dim)),
        "w1": jax.random.normal(ks[4], (depth, dim, dim)) * 0.1,
        "b1": jnp.zeros((depth, dim)),
        "w2": jax.random.normal(ks[5], (depth, dim, dim)) * 0.1,
        "b2": jnp.zeros((depth, dim)),
    }
    dtype = jnp.bfloat16
    sseg = jnp.asarray(_seg_matrix(heads, l))
    hl = heads * l

    def stack(x, m, p, *, ln=True, softmax=True, attn_on=True, ff_on=True):
        scale = dim ** -0.5
        for d in range(depth):
            if ln:
                x32 = x.astype(jnp.float32)
                mu = jnp.mean(x32, -1, keepdims=True)
                rs = jax.lax.rsqrt(
                    jnp.mean(jnp.square(x32 - mu), -1, keepdims=True) + 1e-5)
                hn = ((x32 - mu) * rs * p["ln1_scale"][d]
                      + p["ln1_bias"][d]).astype(dtype)
                m32 = m.astype(jnp.float32)
                mum = jnp.mean(m32, -1, keepdims=True)
                rsm = jax.lax.rsqrt(
                    jnp.mean(jnp.square(m32 - mum), -1, keepdims=True) + 1e-5)
                mn = ((m32 - mum) * rsm * p["ln1_scale"][d]
                      + p["ln1_bias"][d]).astype(dtype)
            else:
                hn, mn = x, m
            if attn_on:
                inner = p["wq"].shape[-1]
                hd = inner // heads
                wq_r = p["wq"][d].astype(dtype).reshape(dim, heads, hd)
                kh = (mn @ p["wk"][d].astype(dtype)).reshape(
                    b, l, heads, hd)
                vh = (mn @ p["wv"][d].astype(dtype)).reshape(
                    b, l, heads, hd)
                wo_r = p["wo"][d].astype(dtype).reshape(heads, hd, dim)
                a = jnp.einsum("chd,bjhd->bchj", wq_r, kh).reshape(b, dim, hl)
                z = jnp.einsum("bjhd,hdc->bhjc", vh, wo_r).reshape(b, hl, dim)
                dots = jnp.einsum("bnc,bcm->bnm", hn, a)
                if softmax:
                    d32 = dots.astype(jnp.float32) * scale
                    mx = jnp.max(d32.reshape(b, n, heads, l), -1,
                                 keepdims=True)
                    e = jnp.exp(d32 - jnp.broadcast_to(
                        mx, (b, n, heads, l)).reshape(b, n, hl))
                    den = jax.lax.dot_general(
                        e, sseg, (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    attn = (e / den).astype(dtype)
                else:
                    attn = dots
                x = x + attn @ z + p["bo"][d].astype(dtype)
            if ff_on:
                if ln:
                    x32 = x.astype(jnp.float32)
                    mu1 = jnp.mean(x32, -1, keepdims=True)
                    rs1 = jax.lax.rsqrt(
                        jnp.mean(jnp.square(x32 - mu1), -1, keepdims=True)
                        + 1e-5)
                    g = ((x32 - mu1) * rs1 * p["ln2_scale"][d]
                         + p["ln2_bias"][d]).astype(dtype)
                else:
                    g = x
                t = g @ p["w1"][d].astype(dtype) + p["b1"][d].astype(dtype)
                h = jax.nn.gelu(t.astype(jnp.float32),
                                approximate=False).astype(dtype)
                x = x + h @ p["w2"][d].astype(dtype) + p["b2"][d].astype(dtype)
        return x

    variants = {
        "full": dict(),
        "no_ln": dict(ln=False),
        "no_softmax": dict(softmax=False),
        "attn_only": dict(ff_on=False),
        "ff_only": dict(attn_on=False),
    }
    out = {}
    for name, kw in variants.items():
        out[f"{name}_ms"] = round(1e3 * _scan(
            lambda i, x, m, p, _kw=kw: stack(
                x + i.astype(x.dtype) * 0, m, p, **_kw), x, m, p)(), 3)
    out["shape"] = {"b": b, "n_chunk": n, "depth": depth, "heads": heads,
                    "l": l}
    return out


# ---------------------------------------------------------------- C
def production_path(b=64, n=4096, depth=8, heads=8, l=4, dim=32):
    from dahitra_tpu.nn.decoder_vjp import decoder_stack_auto

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (b, n, dim), jnp.bfloat16)
    m = jax.random.normal(key, (b, l, dim), jnp.bfloat16)
    ks = jax.random.split(key, 8)
    p = {
        "ln1_scale": jnp.ones((depth, dim)), "ln1_bias": jnp.zeros((depth, dim)),
        "wq": jax.random.normal(ks[0], (depth, dim, heads * 64)) * 0.1,
        "wk": jax.random.normal(ks[1], (depth, dim, heads * 64)) * 0.1,
        "wv": jax.random.normal(ks[2], (depth, dim, heads * 64)) * 0.1,
        "wo": jax.random.normal(ks[3], (depth, heads * 64, dim)) * 0.1,
        "bo": jnp.zeros((depth, dim)),
        "ln2_scale": jnp.ones((depth, dim)), "ln2_bias": jnp.zeros((depth, dim)),
        "w1": jax.random.normal(ks[4], (depth, dim, dim)) * 0.1,
        "b1": jnp.zeros((depth, dim)),
        "w2": jax.random.normal(ks[5], (depth, dim, dim)) * 0.1,
        "b2": jnp.zeros((depth, dim)),
    }

    fwd_ms = 1e3 * _scan(
        lambda i, x, m, p: decoder_stack_auto(
            x + i.astype(x.dtype) * 0, m, p, depth, heads, jnp.bfloat16),
        x, m, p)()

    def loss(x, m, p):
        return jnp.sum(decoder_stack_auto(x, m, p, depth, heads,
                                          jnp.bfloat16).astype(jnp.float32))

    def fb(i, x, m, p):
        g = jax.grad(loss, argnums=(0, 2))(x + i.astype(x.dtype) * 0, m, p)
        return sum(jnp.sum(t.astype(jnp.float32))
                   for t in jax.tree_util.tree_leaves(g)).reshape(1)

    fwdbwd_ms = 1e3 * _scan(fb, x, m, p)()
    return {"fwd_ms": round(fwd_ms, 3), "fwd_bwd_ms": round(fwdbwd_ms, 3),
            "bwd_over_fwd": round((fwdbwd_ms - fwd_ms) / fwd_ms, 2),
            "shape": {"b": b, "n": n, "depth": depth, "heads": heads}}


def main():
    out = {
        "A_matmul_shapes": matmul_shape_study(),
        "B_part_split_b64": decoder_part_split(b=64),
        "C_production_b64": production_path(b=64),
        "C_production_b128": production_path(b=128),
    }
    print(json.dumps(out, indent=2))
    if jax.devices()[0].platform == "cpu":
        print("cpu smoke run - artifact not written")
        return
    artifact = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                             "artifacts", "micro_decoder.json")
    with open(artifact, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {artifact}")


if __name__ == "__main__":
    main()
