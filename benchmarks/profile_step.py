"""Op-level profile of the b64 LEVIR train step (and optionally eval).

The roofline harnesses attribute the step to coarse segments by separate
measurement; this captures a REAL jax.profiler trace of the exact
bench.py epoch-scan program and aggregates per-HLO-op device self-time via
xprof's xplane converter, so fusion boundaries and op categories inside the
67 ms step are visible (BN stats passes, SelectAndScatter, conv wgrads,
decoder chains, ...).

Run on the real chip:
  python benchmarks/profile_step.py [--batch 64] [--eval]
Writes benchmarks/artifacts/profile_ops.json (top ops by self time) and
leaves the raw trace under /tmp/dahitra_profile for tensorboard.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import glob
import gzip
import json

import numpy as np

import jax
import jax.numpy as jnp

IMG = 256
TRAIN_STEPS = 16


def build_train_run(batch):
    import tempfile

    from dahitra_tpu.core.mesh import make_mesh
    from dahitra_tpu.train.engine import CDTrainer

    rng = np.random.default_rng(1)
    n = batch * TRAIN_STEPS
    arrays = {
        "a": rng.integers(0, 255, (n, IMG, IMG, 3), dtype=np.uint8),
        "b": rng.integers(0, 255, (n, IMG, IMG, 3), dtype=np.uint8),
        "label": rng.integers(0, 2, (n, IMG, IMG)).astype(np.uint8),
    }
    td = tempfile.mkdtemp()
    args = argparse.Namespace(
        gpu_ids="0", project_name="bench", checkpoint_root=td,
        num_workers=0, dataset="CDDataset", data_name="LEVIR",
        batch_size=batch, split="train", split_val="val",
        img_size=IMG, n_class=2, net_G="newUNetTrans", loss="ce",
        optimizer="adamw", lr=1e-3, max_epochs=1, lr_policy="linear",
        lr_decay_iters=100, bf16=True, seed=0, scan_epoch=True,
        checkpoint_dir=td, vis_dir=td)
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    tr = CDTrainer(args, arrays, arrays, mesh=mesh)
    tr._stage_train()
    n_batches = tr._staged_n // batch
    perm = jnp.asarray(tr._epoch_perm(0, n_batches, batch))
    keys = jax.random.split(jax.random.PRNGKey(0), n_batches)
    a_f, b_f, l_f = tr._staged_train
    state = tr.state

    def run(state):
        st, losses, cm = tr._train_epoch_scan(state, a_f, b_f, l_f,
                                              perm, keys)
        return st, losses

    return run, state, n_batches


def parse_xplane(logdir, out_path, n_steps):
    """Aggregate per-op device time from the captured xplane via xprof."""
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(
        _os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    path = paths[-1]
    data, _ = rtd.xspace_to_tool_data([path], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    try:
        table = json.loads(data)
    except Exception:
        # gviz csv fallback
        with open(out_path + ".raw", "w") as f:
            f.write(data)
        raise SystemExit("framework_op_stats not JSON; raw saved")
    return table


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--logdir", default="/tmp/dahitra_profile")
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()

    art = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        "artifacts", "profile_ops.json")
    if not args.parse_only:
        run, state, n_batches = build_train_run(args.batch)
        st, losses = run(state)          # compile + warm
        np.asarray(losses)
        with jax.profiler.trace(args.logdir):
            st, losses = run(st)
            np.asarray(losses)
        print(f"traced {n_batches} steps at b{args.batch}")
    table = parse_xplane(args.logdir, art, TRAIN_STEPS)
    with open(art, "w") as f:
        json.dump(table, f)
    print("wrote", art)


if __name__ == "__main__":
    main()
