"""One-process A/B: lax.scan unroll factor for the b64 train epoch scan.

profile_ops.json attributes ~3.7 ms/step of the 66.6 ms b64 train step to
the while loop's SELF time (loop bookkeeping + inter-iteration bubbles, not
body ops). ``lax.scan(unroll=k)`` stitches k bodies per while iteration,
amortizing that overhead. Also takes a b128 scaling point at the winning
unroll. Interleaved in one process (tunneled-chip drift rule).

Run on the real chip:  python benchmarks/ab_unroll.py
Writes benchmarks/artifacts/unroll_ab.json.
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

from benchmarks.ab_stacked import build_trainer, IMG, TRAIN_STEPS

TRAIN_BATCH = 64
UNROLLS = (1, 2, 4)
REPEATS = 5


def main():
    tr = build_trainer()
    tr._stage_train()
    n_batches = tr._staged_n // TRAIN_BATCH
    perm = jnp.asarray(tr._epoch_perm(0, n_batches, TRAIN_BATCH))
    keys = jax.random.split(jax.random.PRNGKey(0), n_batches)
    a_f, b_f, l_f = tr._staged_train

    def make_epoch(unroll):
        def epoch(state, a_full, b_full, l_full, perm, keys):
            def body(st, xs):
                idx, key = xs
                a = tr._gather_batch(a_full, idx)
                b = tr._gather_batch(b_full, idx)
                l = tr._gather_batch(l_full, idx)
                st, loss, cm = tr._train_step_impl(st, a, b, l, key)
                return st, (loss, cm)
            state, (losses, cms) = jax.lax.scan(body, state, (perm, keys),
                                                unroll=unroll)
            return state, losses, jnp.sum(cms, axis=0)
        return jax.jit(epoch, donate_argnums=(0,))

    runs = {u: make_epoch(u) for u in UNROLLS}
    states = {u: jax.tree_util.tree_map(jnp.copy, tr.state) for u in UNROLLS}
    times = {u: [] for u in UNROLLS}
    for u in UNROLLS:
        t0 = time.time()
        st, losses, _ = runs[u](states[u], a_f, b_f, l_f, perm, keys)
        np.asarray(losses)
        states[u] = st
        print(f"# compiled unroll={u} ({time.time() - t0:.0f}s)",
              file=_sys.stderr)
    for r in range(REPEATS):
        for u in UNROLLS:
            t0 = time.time()
            st, losses, _ = runs[u](states[u], a_f, b_f, l_f, perm, keys)
            np.asarray(losses)
            times[u].append(time.time() - t0)
            states[u] = st
        print(f"# round {r + 1}/{REPEATS}", file=_sys.stderr)

    n_train = n_batches * TRAIN_BATCH
    out = {"config": {"train_batch": TRAIN_BATCH, "train_steps": TRAIN_STEPS,
                      "img": IMG, "repeats": REPEATS},
           "train_pairs_per_s": {}, "train_ms_per_step": {}, "spread_ms": {}}
    for u in UNROLLS:
        tt = min(times[u])
        out["train_pairs_per_s"][f"unroll{u}"] = round(n_train / tt, 1)
        out["train_ms_per_step"][f"unroll{u}"] = round(
            1e3 * tt / n_batches, 2)
        out["spread_ms"][f"unroll{u}"] = round(
            1e3 * (max(times[u]) - tt) / n_batches, 2)
    art = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        "artifacts", "unroll_ab.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
