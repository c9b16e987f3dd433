"""A/B: Pallas fused semantic tokenizer vs the XLA path (VERDICT r4 item 7).

SURVEY §2.9 names the tokenizer (spatial-attention softmax + einsum,
reference networks.py:312-319) as a Pallas fusion candidate; it runs 3x per
DAHiTra step on the batch-stacked dates. This measures both implementations
at the three in-model shapes plus the xBD 1024px shape, with the
measurement rules of .claude/skills/verify/SKILL.md:

  * output-chained scans (each iteration's tokens perturb the next
    iteration's input) so XLA can neither hoist nor dead-code-eliminate;
  * two scan lengths differenced so the ~30 ms tunnel dispatch and the
    D2H sync cancel exactly.

Writes benchmarks/artifacts/tokenizer_ab.json (honest either way).
Run on the real chip:  python benchmarks/bench_tokenizer.py
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

from dahitra_tpu.pallas.fused_tokenizer import fused_semantic_tokenizer

ITERS_LO = 16
ITERS_HI = 80
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


def xla_tokenizer(x, w):
    """The production path: nn.blocks.SemanticTokenizer's math on a
    pre-flattened (B, N, C) input (the 1x1 conv is exactly x @ w)."""
    logits = x @ w.astype(x.dtype)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=1).astype(x.dtype)
    return jnp.einsum("bnl,bnc->blc", attn, x)


def xla_tokenizer_t(x, w):
    """Transposed XLA form: keep logits/attn as (B, L, N) so the softmax
    reduces over the LANE axis (n) instead of living in a 4-wide minor dim
    (3% lane occupancy). Same math, addition order of the softmax sum and
    pooling contraction unchanged (still over n)."""
    logits = jnp.einsum("cl,bnc->bln", w.astype(x.dtype), x)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=2).astype(x.dtype)
    return jnp.einsum("bln,bnc->blc", attn, x)


def bench_one(fn, b, n, c, l, dtype=jnp.bfloat16):
    """Differenced output-chained scan: tokens feed back into x so the body
    cannot be hoisted or sliced down."""
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (b, n, c), dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (c, l), jnp.float32) * 0.1

    def make(iters):
        @jax.jit
        def run(x0, w):
            def body(x, _):
                tokens = fn(x, w)                       # (b, l, c)
                # feed ALL tokens back: mean over l broadcasts into x
                x = x + 1e-6 * jnp.mean(tokens, axis=1, keepdims=True)
                return x, None
            x, _ = jax.lax.scan(body, x0, None, length=iters)
            return jnp.sum(x.astype(jnp.float32))
        return run

    t_lo = _timed(make(ITERS_LO), x0, w)
    t_hi = _timed(make(ITERS_HI), x0, w)
    dt = t_hi - t_lo
    return dt / (ITERS_HI - ITERS_LO) if dt > 0 else float("nan")


def main():
    shapes = {
        # (B, N, C): both dates stacked at bench.py's eval batch 128 ->
        # B = 256 rows through the tokenizer at each LEVIR scale.
        "levir_s3_b256": (256, 4096, 32),
        "levir_s4_b256": (256, 1024, 32),
        "levir_s5_b256": (256, 256, 32),
        # xBD 1024px tile, scale 3 = 256x256 pixels, batch 1 (both dates).
        "xbd_s3_b2": (2, 65536, 32),
    }
    l = 4
    out = {}
    for name, (b, n, c) in shapes.items():
        xla_ms = 1e3 * bench_one(xla_tokenizer, b, n, c, l)
        xlat_ms = 1e3 * bench_one(xla_tokenizer_t, b, n, c, l)
        pl_ms = 1e3 * bench_one(
            lambda x, w: fused_semantic_tokenizer(x, w), b, n, c, l)
        out[name] = {"xla_ms": round(xla_ms, 4),
                     "xla_transposed_ms": round(xlat_ms, 4),
                     "pallas_ms": round(pl_ms, 4),
                     "speedup_x": round(xla_ms / pl_ms, 2),
                     "speedup_transposed_x": round(xla_ms / xlat_ms, 2)}
        print(f"{name}: xla {xla_ms:.3f} ms  xla_t {xlat_ms:.3f} ms  "
              f"pallas {pl_ms:.3f} ms")

    # parity spot-check at one shape (fp32 tolerances; kernel accumulates
    # fp32 regardless of input dtype)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 1024, 32), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (32, 4), jnp.float32) * 0.1
    ref = xla_tokenizer(x, w)
    got = fused_semantic_tokenizer(x, w, precise=True)
    err = float(jnp.max(jnp.abs(ref - got)))
    out["parity_max_abs_err_fp32"] = err
    print(f"parity max|err| fp32: {err:.2e}")

    print(json.dumps(out))
    if jax.devices()[0].platform == "cpu":
        print("cpu smoke run - artifact not written")
        return
    artifact = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                             "artifacts", "tokenizer_ab.json")
    with open(artifact, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {artifact}")


if __name__ == "__main__":
    main()
