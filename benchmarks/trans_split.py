"""trans_3 part-split: attribute the module's fwd/bwd cost to its parts.

Round-5 item 1 (VERDICT): train_roofline --fine pins trans_3 at ~19.6 ms
fwd+bwd (b64) while micro_decoder/chunk-sweep measurements account for only
~10.7 ms of decoder-stack time (decode_dates at 2b plus the final decode at
b). This harness times, in ONE process on the chip, cumulative prefixes of
TransDiffModule.__call__ (models/dahitra.py:121-143) so the residual can be
pinned to squeeze / tokenizer / encoder / conv_decode / decoder calls:

  squeeze        relu(conv1x1) on the 2b-stacked input
  tokens         squeeze + tokenizer + pos + joint transformer encode
  dates          tokens  + the per-date decoder pass (2b, n, 32)
  conv           dates   + |t2-t1| + conv_decode on cat(x1d, x2d)
  full           conv    + the final decoder pass (b, n, 32) == __call__

Each segment is timed forward-only and fwd+bwd (grad wrt params and both
inputs, outputs fully consumed), differenced-scan style as in
train_roofline. Writes benchmarks/artifacts/trans_split.json.
Run on the real chip:  python benchmarks/trans_split.py
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 64
IMG = 256
ITERS = 16
REPEATS = 3


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def _timed_scan(jitted, *args):
    _sync(jitted(*args))
    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        out = jitted(*args)
        _sync(out)
        times.append(time.time() - t0)
    return min(times) / ITERS, (max(times) - min(times)) / ITERS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--img", type=int, default=IMG)
    args_cli = ap.parse_args()
    batch, img = args_cli.batch, args_cli.img

    from dahitra_tpu.models import define_g

    model = define_g("newUNetTrans", dtype=jnp.bfloat16, img_size=img)
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((batch, img, img, 3), jnp.bfloat16)
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, False))(
        key, dummy, dummy)
    params = variables["params"]

    rng = np.random.default_rng(0)
    # trans_3 consumes the 1/4-scale trunk taps: (b, img/4, img/4, 64).
    shp = (batch, img // 4, img // 4, 64)
    x1 = jnp.asarray(rng.standard_normal(shp), jnp.bfloat16)
    x2 = jnp.asarray(rng.standard_normal(shp), jnp.bfloat16)
    _sync((x1, x2))

    # Cumulative prefixes of TransDiffModule.__call__ — each returns every
    # live intermediate so nothing the prefix computes is dead code.
    def seg_squeeze(m, u, v):
        t = m.trans_3
        import flax.linen as nn
        return nn.relu(t.conv_squeeze(jnp.concatenate([u, v], axis=0)))

    def seg_tokens(m, u, v):
        t = m.trans_3
        b = u.shape[0]
        import flax.linen as nn
        x12 = nn.relu(t.conv_squeeze(jnp.concatenate([u, v], axis=0)))
        t12 = t.tokenizer(x12)
        tokens = jnp.concatenate([t12[:b], t12[b:]], axis=1)
        if t.with_pos:
            tokens = tokens + t.pos_embedding
        return x12, t.transformer(tokens)

    def seg_dates(m, u, v):
        t = m.trans_3
        b = u.shape[0]
        import flax.linen as nn
        x12 = nn.relu(t.conv_squeeze(jnp.concatenate([u, v], axis=0)))
        t12 = t.tokenizer(x12)
        tokens = jnp.concatenate([t12[:b], t12[b:]], axis=1)
        if t.with_pos:
            tokens = tokens + t.pos_embedding
        tokens = t.transformer(tokens)
        t1, t2 = jnp.split(tokens, 2, axis=1)
        xd = t._decode(x12, jnp.concatenate([t1, t2], axis=0))
        return xd, t1, t2

    def seg_conv(m, u, v):
        t = m.trans_3
        b = u.shape[0]
        import flax.linen as nn
        x12 = nn.relu(t.conv_squeeze(jnp.concatenate([u, v], axis=0)))
        t12 = t.tokenizer(x12)
        tokens = jnp.concatenate([t12[:b], t12[b:]], axis=1)
        if t.with_pos:
            tokens = tokens + t.pos_embedding
        tokens = t.transformer(tokens)
        t1, t2 = jnp.split(tokens, 2, axis=1)
        xd = t._decode(x12, jnp.concatenate([t1, t2], axis=0))
        diff_token = jnp.abs(t2 - t1)
        diff_x = t.conv_decode(jnp.concatenate([xd[:b], xd[b:]], axis=-1))
        return diff_x, diff_token

    def seg_full(m, u, v):
        return m.trans_3(u, v)

    segs = dict(squeeze=seg_squeeze, tokens=seg_tokens, dates=seg_dates,
                conv=seg_conv, full=seg_full)

    out = {"config": {"batch": batch, "img": img, "iters": ITERS},
           "fwd_ms": {}, "fwdbwd_ms": {}, "spread_ms": {}}

    for name, seg in segs.items():
        def fwd_loss(p, u, v, _seg=seg):
            o = model.apply({"params": p,
                             "batch_stats": variables["batch_stats"]},
                            u, v, method=_seg)
            return sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree_util.tree_leaves(o))

        @jax.jit
        def scan_fwd(p, u, v, _f=fwd_loss):
            def body(c, i):
                s = _f(p, u + c.astype(jnp.bfloat16) * 0, v)
                return s * 1e-30, None
            o, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return o

        @jax.jit
        def scan_fb(p, u, v, _f=fwd_loss):
            def body(c, i):
                g = jax.grad(_f, argnums=(0, 1, 2))(
                    p, u + c.astype(jnp.bfloat16) * 0, v)
                s = sum(jnp.sum(t.astype(jnp.float32))
                        for t in jax.tree_util.tree_leaves(g))
                return s * 1e-30, None
            o, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return o

        t, sp = _timed_scan(scan_fwd, params, x1, x2)
        out["fwd_ms"][name] = round(t * 1e3, 3)
        out["spread_ms"][name + "_fwd"] = round(sp * 1e3, 3)
        t, sp = _timed_scan(scan_fb, params, x1, x2)
        out["fwdbwd_ms"][name] = round(t * 1e3, 3)
        out["spread_ms"][name + "_fb"] = round(sp * 1e3, 3)
        print(name, "fwd", out["fwd_ms"][name], "fwdbwd",
              out["fwdbwd_ms"][name], flush=True)

    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "artifacts", "trans_split.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    print("wrote", path)


if __name__ == "__main__":
    main()
