"""xBD-workload benchmark: DAHiTra 5-class damage training at the
reference's native 1024x1024 tile size (xBD_code/train.py:67: crop_size
1024, batch_size 1 — a GPU memory limit, not a modeling choice), plus the
4-view flip-TTA prediction path of predict_test_cls.py.

The reference logs no xBD throughput; these numbers are recorded in
docs/ARCHITECTURE.md as the framework's native-workload capability.
Run on the real chip: python benchmarks/bench_xbd.py
"""
from __future__ import annotations

import argparse
import json
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

IMG = 1024
STEPS = 8


def bench_train(batch: int) -> float:
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
            bf16=True, seed=0, warm_start_from=None)
        mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
        tr = XBDTrainer(args, arrays, arrays, mesh=mesh, task="damage")

        batches = [tr._put(b) for b in tr.train_loader]
        key = jax.random.PRNGKey(0)
        st = tr.state

        def run(st):
            for i, d in enumerate(batches):
                st, loss = tr._train_step(
                    st, d["img_pre"], d["img_post"], d["msk"], d["lbl_msk"],
                    jax.random.fold_in(key, i))
            return st, loss

        st, loss = run(st)
        np.asarray(loss)
        ts = []
        for _ in range(3):
            t0 = time.time()
            st, loss = run(st)
            np.asarray(loss)
            ts.append(time.time() - t0)
    return len(batches) * batch / min(ts)


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


def main():
    out = {
        "xbd_dahitra_train_1024_b1_tiles_per_s": round(bench_train(1), 3),
        "xbd_dahitra_train_1024_b4_tiles_per_s": round(bench_train(4), 3),
        "xbd_dahitra_tta_predict_1024_tiles_per_s": round(bench_predict(), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
