"""xBD-workload benchmark: DAHiTra 5-class damage training at the
reference's native 1024x1024 tile size (xBD_code/train.py:67: crop_size
1024, batch_size 1 — a GPU memory limit, not a modeling choice), plus the
4-view flip-TTA prediction path of predict_test_cls.py.

The reference logs no xBD throughput; these numbers are recorded in
docs/ARCHITECTURE.md as the framework's native-workload capability.
Run on the real chip: python benchmarks/bench_xbd.py
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # runnable as python benchmarks/<x>.py

import argparse
import json
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

IMG = 1024
STEPS = 8


def _fwd_flops(batch: int) -> float:
    """Single-forward FLOPs of the damage model at (batch, IMG, IMG, 6)."""
    from dahitra_tpu.models import define_g

    model = define_g("xbd_dahitra", dtype=jnp.bfloat16, img_size=IMG)
    dummy = jnp.zeros((batch, IMG, IMG, 6), jnp.bfloat16)
    variables = jax.eval_shape(
        lambda k: model.init(k, dummy, None, False), jax.random.PRNGKey(0))
    try:
        an = (jax.jit(lambda v, x: model.apply(v, x, None, False))
              .lower(variables, dummy).compile().cost_analysis())
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_train(batch: int, scan: bool = False):
    """tiles/s of the full damage train step (aug+fwd+bwd+AdamW).

    ``scan=True`` measures the chunked one-dispatch lax.scan path
    (XBDTrainer._train_chunk_scan); False measures per-batch dispatches —
    the difference is the tunneled chip's ~30-50 ms RPC per dispatch, which
    dominates at the reference recipe's batch 1 (xBD_code/train.py:67)."""
    from dahitra_tpu.core.mesh import make_mesh
    from dahitra_tpu.train.xbd_engine import XBDTrainer

    rng = np.random.default_rng(0)
    n = batch * STEPS
    arrays = {
        "img_pre": rng.integers(0, 255, (n, IMG, IMG, 3), dtype=np.uint8),
        "img_post": rng.integers(0, 255, (n, IMG, IMG, 3), dtype=np.uint8),
        "msk": (rng.random((n, IMG, IMG, 5)) > 0.5).astype(np.uint8),
        "lbl_msk": rng.integers(0, 5, (n, IMG, IMG)).astype(np.uint8),
    }
    with tempfile.TemporaryDirectory() as td:
        args = argparse.Namespace(
            net_G="xbd_dahitra", img_size=IMG, batch_size=batch,
            val_batch_size=batch, lr=0.0, max_epochs=1, checkpoint_dir=td,
            bf16=True, seed=0, warm_start_from=None,
            scan_epoch=scan, scan_chunk_batches=STEPS)
        mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
        tr = XBDTrainer(args, arrays, arrays, mesh=mesh, task="damage")
        key = jax.random.PRNGKey(0)

        if scan:
            chunk = next(iter(tr._scan_chunks(0)))
            staged = tuple(jnp.asarray(c) for c in chunk)
            keys = jax.random.split(key, staged[0].shape[0])
            n_steps = staged[0].shape[0]

            def run(st):
                st, losses = tr._train_chunk_scan(st, *staged, keys)
                return st, losses
        else:
            batches = [tr._put(b) for b in tr.train_loader]
            n_steps = len(batches)

            def run(st):
                for i, d in enumerate(batches):
                    st, loss = tr._train_step(
                        st, d["img_pre"], d["img_post"], d["msk"],
                        d["lbl_msk"], jax.random.fold_in(key, i))
                return st, loss

        st, loss = run(tr.state)
        np.asarray(loss)
        ts = []
        for _ in range(3):
            t0 = time.time()
            st, loss = run(st)
            np.asarray(loss)
            ts.append(time.time() - t0)
    return n_steps * batch / min(ts), min(ts), n_steps


def bench_predict() -> float:
    """4-view flip-TTA inference of one tile pair, exactly as
    cli/xbd_predict.py jits it (predict_test_cls.py:69-91)."""
    from dahitra_tpu.cli.xbd_predict import tta_views, untta_mean
    from dahitra_tpu.data.xbd_augment import normalize_xbd
    from dahitra_tpu.models import define_g

    dtype = jnp.bfloat16
    model = define_g("xbd_dahitra", dtype=dtype, img_size=IMG)
    rng = np.random.default_rng(1)
    img6 = jnp.asarray(rng.integers(0, 255, (IMG, IMG, 6), dtype=np.uint8))
    dummy = jnp.zeros((4, IMG, IMG, 6), dtype)
    variables = jax.jit(lambda k: model.init(k, dummy, None, False))(
        jax.random.PRNGKey(0))

    @jax.jit
    def predict(variables, img6):
        views = tta_views(normalize_xbd(img6)).astype(dtype)
        logits = model.apply(variables, views, None, False)
        return untta_mean(jax.nn.sigmoid(logits.astype(jnp.float32)))

    np.asarray(predict(variables, img6))
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(predict(variables, img6))
        ts.append(time.time() - t0)
    return 1.0 / min(ts)


CHIP_BF16_TFLOPS = 197.0  # v5e spec peak bf16 (re-calibrated round 4)


def main():
    b1_loop, _, _ = bench_train(1, scan=False)
    b1_scan, dt1, n1 = bench_train(1, scan=True)
    b4_scan, dt4, n4 = bench_train(4, scan=True)
    fl1 = _fwd_flops(1)
    fl4 = _fwd_flops(4)
    # fwd + bwd ~ 3x fwd, the standard accounting (matches bench.py).
    t1 = 3.0 * fl1 * n1 / dt1 / 1e12 if fl1 else 0.0
    t4 = 3.0 * fl4 * n4 / dt4 / 1e12 if fl4 else 0.0
    out = {
        "xbd_dahitra_train_1024_b1_tiles_per_s": round(b1_loop, 3),
        "xbd_dahitra_train_1024_b1_scan_tiles_per_s": round(b1_scan, 3),
        "xbd_dahitra_train_1024_b4_scan_tiles_per_s": round(b4_scan, 3),
        "xbd_dahitra_train_1024_b1_scan_mfu_pct":
            round(100 * t1 / CHIP_BF16_TFLOPS, 2),
        "xbd_dahitra_train_1024_b4_scan_mfu_pct":
            round(100 * t4 / CHIP_BF16_TFLOPS, 2),
        "xbd_dahitra_tta_predict_1024_tiles_per_s": round(bench_predict(), 3),
    }
    print(json.dumps(out))
    # Committed artifact (VERDICT r3: bench outputs must not live only in
    # commit messages — without in-tree JSON the next round can't tell
    # regression from chip drift).
    artifact = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                             "artifacts", "xbd_bench.json")
    _os.makedirs(_os.path.dirname(artifact), exist_ok=True)
    with open(artifact, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {artifact}")


if __name__ == "__main__":
    main()
