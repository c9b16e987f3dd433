"""Cross-process A/B: XLA scoped-VMEM limit for the b64 train epoch scan.

``--xla_tpu_scoped_vmem_limit_kib`` bounds the VMEM XLA's fusion passes may
assume for any one fused computation; raising it can let XLA form larger
fusions (fewer HBM round-trips between the decoder's 32-wide elementwise
chains) at the risk of worse double-buffering. It is a PROCESS-GLOBAL flag
consumed at backend init, so this A/B cannot be interleaved in one process
like the others (ledger rule) — instead each setting runs in its own
subprocess and reports the bench.py chip-speed canary measured in the SAME
process, and the parent normalizes step times by the canary ratio so
tunnel/chip drift between processes is separated from the flag's effect.

Run on the real chip:  python benchmarks/ab_vmem.py
Writes benchmarks/artifacts/vmem_ab.json (honest either way).
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import json
import subprocess
import time

# None = stock flags (the v5e default limit; XLA's own default is what the
# production bench runs with, so it is the control arm).
SETTINGS = (None, 65536, 131072)
TRAIN_BATCH = 64
REPEATS = 4


def _worker():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from benchmarks.ab_stacked import build_trainer

    sys_path = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    _sys.path.insert(0, sys_path)
    import bench as bench_mod

    canary_tflops, canary_t_lo = bench_mod.bench_canary()

    tr = build_trainer()
    tr._stage_train()
    n_batches = tr._staged_n // TRAIN_BATCH
    perm = jnp.asarray(tr._epoch_perm(0, n_batches, TRAIN_BATCH))
    keys = jax.random.split(jax.random.PRNGKey(0), n_batches)
    a_f, b_f, l_f = tr._staged_train

    st, losses, _ = tr._train_epoch_scan(tr.state, a_f, b_f, l_f, perm, keys)
    np.asarray(losses)
    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        st, losses, _ = tr._train_epoch_scan(st, a_f, b_f, l_f, perm, keys)
        np.asarray(losses)
        times.append(time.time() - t0)
    dt = min(times)
    print(json.dumps({
        "train_ms_per_step": 1e3 * dt / n_batches,
        "train_pairs_per_s": n_batches * TRAIN_BATCH / dt,
        "spread_ms": 1e3 * (max(times) - min(times)) / n_batches,
        "canary_tflops": canary_tflops,
        "canary_dispatch_floor_s": canary_t_lo,
    }))


def main():
    here = _os.path.abspath(__file__)
    results = {}
    for kib in SETTINGS:
        env = dict(_os.environ)
        flags = env.get("XLA_FLAGS", "")
        if kib is not None:
            flags = (flags + f" --xla_tpu_scoped_vmem_limit_kib={kib}").strip()
        env["XLA_FLAGS"] = flags
        label = "default" if kib is None else f"{kib}kib"
        print(f"# worker {label} ...", file=_sys.stderr)
        out = subprocess.run(
            [_sys.executable, here, "--worker"], env=env,
            capture_output=True, text=True, timeout=1500)
        if out.returncode != 0:
            print(out.stderr[-2000:], file=_sys.stderr)
            results[label] = {"error": out.returncode}
            continue
        results[label] = json.loads(out.stdout.strip().splitlines()[-1])
        print(f"#   {results[label]}", file=_sys.stderr)

    base = results.get("default", {})
    if "train_ms_per_step" in base and base.get("canary_tflops"):
        for label, r in results.items():
            if "train_ms_per_step" not in r or not r.get("canary_tflops"):
                continue
            # Normalize: scale this arm's time by (its canary speed /
            # control canary speed) so a slower-tunnel process isn't
            # mistaken for a slower flag setting.
            drift = r["canary_tflops"] / base["canary_tflops"]
            r["train_ms_per_step_canary_norm"] = r["train_ms_per_step"] * drift
            r["speedup_vs_default_norm"] = (
                base["train_ms_per_step"] / r["train_ms_per_step_canary_norm"])

    art = _os.path.join(_os.path.dirname(here), "artifacts", "vmem_ab.json")
    with open(art, "w") as f:
        json.dump({"config": {"train_batch": TRAIN_BATCH,
                              "repeats": REPEATS,
                              "settings": [s or "default" for s in SETTINGS]},
                   "results": results}, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    if "--worker" in _sys.argv:
        _worker()
    else:
        main()
