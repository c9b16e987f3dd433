"""Re-tune decoder_stack_auto's n-chunking under the noshift softmax.

The chunk trigger/target (decoder_vjp._CHUNK_TRIGGER_ROWS/_TARGET_ROWS)
were measured in the segmatmul era, where XLA's fused kernels fell off a
cliff above ~2^18 rows (docstring: b128 fwd 8.9 -> 4.8 ms with chunking).
The round-5 noshift rewrite removed the reshape-max relayout that likely
CAUSED that cliff, so the chunking heuristic may now be stale — the
in-model 2b date-decode at b64 runs as 4 sequential n-chunks.

This sweeps chunk target sizes (unchunked, 2^18, 2^17, 2^16 rows) for the
production shapes (b, n) in {(128, 4096), (64, 4096)} fwd and fwd+bwd,
one process, differenced scans. Writes benchmarks/artifacts/chunk_sweep.json.
Run on the real chip:  python benchmarks/chunk_sweep.py
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

# Persistent compile cache: chip compiles run over the axon tunnel and
# dominate wall time; the cache makes re-runs start in seconds.
jax.config.update("jax_compilation_cache_dir",
                  _os.environ.get("DAHITRA_CHIP_CACHE", "/tmp/jax_chip_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dahitra_tpu.nn.decoder_vjp as dv

ITERS_LO = 16
ITERS_HI = 48
REPEATS = 2
DEPTH, HEADS, DIM, L = 8, 8, 32, 4


def _params(key):
    ks = jax.random.split(key, 13)
    inner = HEADS * 64  # trans_3: dec_dim_head 64 (models/dahitra.py:216)
    shapes = dict(
        ln1_scale=(DEPTH, DIM), ln1_bias=(DEPTH, DIM),
        wq=(DEPTH, DIM, inner), wk=(DEPTH, DIM, inner),
        wv=(DEPTH, DIM, inner), wo=(DEPTH, inner, DIM),
        bo=(DEPTH, DIM),
        ln2_scale=(DEPTH, DIM), ln2_bias=(DEPTH, DIM),
        w1=(DEPTH, DIM, DIM), b1=(DEPTH, DIM),   # mlp_dim == dim == 32
        w2=(DEPTH, DIM, DIM), b2=(DEPTH, DIM),
    )
    p = {}
    for (name, shp), k in zip(shapes.items(), ks):
        if name.endswith("scale"):
            p[name] = jnp.ones(shp, jnp.float32)
        elif name.endswith(("bias", "bo", "b1", "b2")):
            p[name] = jnp.zeros(shp, jnp.float32)
        else:
            p[name] = jax.random.normal(k, shp, jnp.float32) * 0.05
    return p


def _scan_ms(fn, x, m, p, iters):
    @jax.jit
    def run(x, m, p):
        def body(c, _):
            y = fn(c, m, p)
            return x + (y * 1e-30).astype(x.dtype), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    def t():
        np.asarray(run(x, m, p)[0, 0, 0])
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.time()
            np.asarray(run(x, m, p)[0, 0, 0])
            best = min(best, time.time() - t0)
        return best

    return t()


def _diff_ms(fn, x, m, p):
    lo = _scan_ms(lambda *a: fn(*a), x, m, p, ITERS_LO)
    hi = _scan_ms(lambda *a: fn(*a), x, m, p, ITERS_HI)
    return (hi - lo) / (ITERS_HI - ITERS_LO) * 1e3


def main():
    key = jax.random.PRNGKey(0)
    p = _params(key)
    out = {}
    # b64 (2^18 rows) is already unchunked in production; only the 2b
    # date-decode shape (b128) is affected by the heuristic.
    for b, n in ((128, 4096),):
        x = jax.random.normal(jax.random.PRNGKey(1), (b, n, DIM),
                              jnp.bfloat16)
        m = jax.random.normal(jax.random.PRNGKey(2), (b, L, DIM),
                              jnp.bfloat16)
        res = {}
        for label, trig, targ in (
                ("unchunked", 1 << 62, 1 << 62),
                ("rows_2e17", 1 << 18, 1 << 17)):  # current production
            def fwd(x, m, p, _t=trig, _g=targ):
                return dv.decoder_stack_auto(x, m, p, DEPTH, HEADS,
                                             jnp.bfloat16, trigger_rows=_t,
                                             target_rows=_g)

            def fb(x, m, p, _f=fwd):
                g = jax.grad(lambda xx: jnp.sum(
                    _f(xx, m, p).astype(jnp.float32)))(x)
                return g

            res[label] = {
                "fwd_ms": round(_diff_ms(fwd, x, m, p), 3),
                "fwdbwd_ms": round(_diff_ms(
                    lambda x, m, p, _f=fb: _f(x, m, p), x, m, p), 3),
            }
            print(f"b{b} {label}: {res[label]}", flush=True)
        out[f"b{b}_n{n}"] = res

    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "artifacts", "chunk_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    print("wrote", path)


if __name__ == "__main__":
    main()
