"""One-process interleaved A/B of the round-5 DAHiTraUNet rewrites:

  stacked_heads  [date1; date2] stays batch-stacked through the trans
                 modules + batch-grouped conv_layer2_0 (no split/re-concat)
  s2d_stem       space-to-depth 4x4 rewrite of the 7x7/s2 stem conv

Both knobs are exact rewrites (oracle + unit tests pin parity), so the ONLY
question is speed. The tunneled chip drifts ~2x between processes — this
harness measures all four knob combinations in ONE process, round-robin
interleaved (each repeat visits every variant), on:

  * the FULL b64 train epoch scan (bench.py bench_train body verbatim:
    aug + fwd + bwd + AdamW + CM, donated state), and
  * the b128 eval epoch scan (bench.py bench_eval body verbatim).

Run on the real chip:  python benchmarks/ab_stacked.py
Writes benchmarks/artifacts/stacked_ab.json (honest either way).
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import json
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

IMG = 256
TRAIN_BATCH = 64
TRAIN_STEPS = 16
EVAL_BATCH = 128
EVAL_BATCHES = 8
REPEATS = 5

VARIANTS = {
    "stacked+s2d": (True, True),
    "stacked": (True, False),
    "s2d": (False, True),
    "neither(r4-form)": (False, False),
}


def build_trainer():
    from dahitra_tpu.core.mesh import make_mesh
    from dahitra_tpu.train.engine import CDTrainer

    rng = np.random.default_rng(1)
    n = TRAIN_BATCH * TRAIN_STEPS
    arrays = {
        "a": rng.integers(0, 255, (n, IMG, IMG, 3), dtype=np.uint8),
        "b": rng.integers(0, 255, (n, IMG, IMG, 3), dtype=np.uint8),
        "label": rng.integers(0, 2, (n, IMG, IMG)).astype(np.uint8),
    }
    td = tempfile.mkdtemp()
    args = argparse.Namespace(
        gpu_ids="0", project_name="ab", checkpoint_root=td, num_workers=0,
        dataset="CDDataset", data_name="LEVIR", batch_size=TRAIN_BATCH,
        split="train", split_val="val", img_size=IMG, n_class=2,
        net_G="newUNetTrans", loss="ce", optimizer="adamw", lr=1e-3,
        max_epochs=1, lr_policy="linear", lr_decay_iters=100, bf16=True,
        seed=0, scan_epoch=True, checkpoint_dir=td, vis_dir=td)
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    return CDTrainer(args, arrays, arrays, mesh=mesh)


def main():
    tr = build_trainer()
    tr._stage_train()
    n_batches = tr._staged_n // TRAIN_BATCH
    perm = jnp.asarray(tr._epoch_perm(0, n_batches, TRAIN_BATCH))
    keys = jax.random.split(jax.random.PRNGKey(0), n_batches)
    a_f, b_f, l_f = tr._staged_train
    base_model = tr.model

    rng = np.random.default_rng(0)
    shape = (EVAL_BATCHES, EVAL_BATCH, IMG, IMG)
    ea = jnp.asarray(rng.integers(0, 255, shape + (3,), dtype=np.uint8))
    eb = jnp.asarray(rng.integers(0, 255, shape + (3,), dtype=np.uint8))
    el = jnp.asarray(rng.integers(0, 2, shape).astype(np.uint8))

    from dahitra_tpu.data.augment import augment_pairs
    from dahitra_tpu.metrics.confusion import batch_confusion_matrix

    runs, states, evals = {}, {}, {}
    for name, (st_heads, s2d) in VARIANTS.items():
        tr.model = base_model.clone(stacked_heads=st_heads, s2d_stem=s2d)
        model = tr.model
        runs[name] = jax.jit(tr._train_epoch_scan_impl, donate_argnums=(0,))
        states[name] = jax.tree_util.tree_map(jnp.copy, tr.state)

        def eval_epoch(variables, a_all, b_all, l_all, model=model):
            def body(cm, xs):
                a, b, label = augment_pairs(*xs, jax.random.PRNGKey(0),
                                            train=False, dtype=jnp.bfloat16)
                logits = model.apply(variables, a, b, False)
                return cm + batch_confusion_matrix(
                    jnp.argmax(logits, -1), label, 2), None
            cm, _ = jax.lax.scan(body, jnp.zeros((2, 2), jnp.int32),
                                 (a_all, b_all, l_all))
            return cm
        evals[name] = jax.jit(eval_epoch)

    variables = {"params": tr.state.params,
                 "batch_stats": tr.state.batch_stats}

    # Warm every variant (compile), then interleave REPEATS rounds.
    train_times = {n: [] for n in VARIANTS}
    eval_times = {n: [] for n in VARIANTS}
    for name in VARIANTS:
        st, losses, _ = runs[name](states[name], a_f, b_f, l_f, perm, keys)
        np.asarray(losses)
        states[name] = st
        np.asarray(evals[name](variables, ea, eb, el))
        print(f"# compiled {name}", file=_sys.stderr)
    for r in range(REPEATS):
        for name in VARIANTS:
            t0 = time.time()
            st, losses, _ = runs[name](states[name], a_f, b_f, l_f,
                                       perm, keys)
            np.asarray(losses)
            train_times[name].append(time.time() - t0)
            states[name] = st
            t0 = time.time()
            np.asarray(evals[name](variables, ea, eb, el))
            eval_times[name].append(time.time() - t0)
        print(f"# round {r + 1}/{REPEATS}", file=_sys.stderr)

    out = {"config": {"train_batch": TRAIN_BATCH, "train_steps": TRAIN_STEPS,
                      "eval_batch": EVAL_BATCH, "eval_batches": EVAL_BATCHES,
                      "img": IMG, "repeats": REPEATS},
           "train_pairs_per_s": {}, "eval_pairs_per_s": {},
           "train_ms_per_step": {}, "spread_ms": {}}
    n_train = n_batches * TRAIN_BATCH
    n_eval = EVAL_BATCHES * EVAL_BATCH
    for name in VARIANTS:
        tt = min(train_times[name])
        et = min(eval_times[name])
        out["train_pairs_per_s"][name] = round(n_train / tt, 1)
        out["eval_pairs_per_s"][name] = round(n_eval / et, 1)
        out["train_ms_per_step"][name] = round(1e3 * tt / n_batches, 2)
        out["spread_ms"][name] = round(
            1e3 * (max(train_times[name]) - tt) / n_batches, 2)
    art = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        "artifacts", "stacked_ab.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
