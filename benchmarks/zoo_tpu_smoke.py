"""Compile + forward every registry model once on the real TPU chip.

The CPU test suite pins numerics (19+ torch-oracle parity tests); this
script validates the other half — that every zoo model actually compiles
and runs on the hardware target (layouts, pools, resizes, n-chunked
decoders) — and reports per-key compile+run time and output finiteness.

    python benchmarks/zoo_tpu_smoke.py [keys...]   # default: all keys

Keys whose architecture pins a resolution (bottleneck-transformer dims
hardcode 256px) run at 256; everything else runs at 64 to keep the sweep
fast. Exit code 1 if any key fails or yields non-finite output.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # runnable as python benchmarks/<x>.py

import os
import sys
import time
import traceback

import numpy as np

import jax

if os.environ.get("DAHITRA_SMOKE_CPU"):
    # Signature/convention sweep without a chip (the env pins the TPU
    # platform via sitecustomize, so the config update is required).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from dahitra_tpu.models import available_models, define_g

SIZE_256 = {"unet_coupled_trans_256", "unet_coupled_two_trans_256",
            "xbd_unet_change_transformer", "xbd_unet_change_transformer_bit"}
# Call convention per key. Loc models take one 3-ch pre-image with a
# (x, train) signature (zoo/models.py:491-563); Res34_Unet_Single's stem
# is a fresh Conv2d(4, 64) (zoo/models.py:342-345); the remaining xBD /
# dual_hrnet keys take one 6-ch pre|post tensor via (x6, x2=None, train);
# LEVIR keys take a (pre, post, train) pair.
SINGLE_INPUT_CH = {"xbd_res34_loc": 3, "xbd_seresnext50_loc": 3,
                   "xbd_senet154_loc": 3, "xbd_dpn92_loc": 3,
                   "xbd_res34_single": 4}


def six_channel(key: str) -> bool:
    return (key.startswith("xbd_") or key.startswith("dual_hrnet")) \
        and key not in SINGLE_INPUT_CH


def main(argv=None) -> int:
    keys = (argv or sys.argv[1:]) or sorted(available_models())
    ok, bad = [], []
    per_key = {}
    for key in keys:
        s = 256 if key in SIZE_256 else 64
        try:
            model = define_g(key, dtype=jnp.bfloat16, img_size=s)
            k = jax.random.PRNGKey(0)
            t0 = time.time()
            if key in SINGLE_INPUT_CH:
                x = jnp.zeros((2, s, s, SINGLE_INPUT_CH[key]), jnp.bfloat16)
                v = jax.jit(lambda kk, xx: model.init(kk, xx, False))(k, x)
                out = jax.jit(lambda vv, xx: model.apply(vv, xx, False))(v, x)
            elif six_channel(key):
                x = jnp.zeros((2, s, s, 6), jnp.bfloat16)
                v = jax.jit(lambda kk, xx: model.init(kk, xx, None, False))(k, x)
                out = jax.jit(
                    lambda vv, xx: model.apply(vv, xx, None, False))(v, x)
            else:
                a = jnp.zeros((2, s, s, 3), jnp.bfloat16)
                v = jax.jit(
                    lambda kk, aa, bb: model.init(kk, aa, bb, False))(k, a, a)
                out = jax.jit(
                    lambda vv, aa, bb: model.apply(vv, aa, bb, False))(v, a, a)
            leaves = jax.tree_util.tree_leaves(out)
            finite = all(bool(np.isfinite(np.asarray(l, np.float32)).all())
                         for l in leaves)
            dt = time.time() - t0
            tag = "OK  " if finite else "BAD "
            print(f"{tag} {key:42s} {s}px out{getattr(leaves[-1], 'shape', ())}"
                  f" finite={finite} {dt:5.1f}s", flush=True)
            (ok if finite else bad).append(key)
            per_key[key] = {"px": s, "compile_fwd_s": round(dt, 2),
                            "finite": finite}
        except Exception as e:
            print(f"FAIL {key:42s} {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            traceback.print_exc(limit=2)
            bad.append(key)
            per_key[key] = {"px": s, "error": f"{type(e).__name__}: "
                                              f"{str(e)[:160]}"}
    print(f"\n{len(ok)} ok, {len(bad)} bad: {bad}")
    # Committed artifact for full (all-keys) chip sweeps; partial reruns
    # merge into the existing file so a tail rerun doesn't drop entries.
    if not os.environ.get("DAHITRA_SMOKE_CPU"):
        import json

        artifact = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                 "artifacts", "zoo_smoke.json")
        _os.makedirs(_os.path.dirname(artifact), exist_ok=True)
        merged = {}
        if _os.path.exists(artifact):
            with open(artifact) as f:
                merged = json.load(f)
        merged.update(per_key)
        merged["_platform"] = jax.devices()[0].platform
        with open(artifact, "w") as f:
            json.dump(merged, f, indent=2, sort_keys=True)
        print(f"wrote {artifact}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
