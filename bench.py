"""Headline benchmark: LEVIR-CD throughput of the flagship DAHiTra model on
one TPU chip — evaluation AND training, with achieved-FLOP/s (MFU) readings.

Prints ONE JSON line. Required fields ({metric, value, unit, vs_baseline})
carry the eval headline; extra fields report the train-step metric and MFU:

  train_imps            image-pairs/s/chip through the one-dispatch
                        scan-epoch TRAIN step (fwd+bwd+AdamW+CM) at the
                        run_cd.sh recipe config (256px, batch 8, bf16)
  train_vs_baseline     vs the reference's 67.77 img/s log line — which is
                        its training-run throughput counter (BASELINE.md)
  eval_tflops/train_tflops  achieved TFLOP/s (XLA cost_analysis flops/time)
  eval_mfu_pct/train_mfu_pct  vs the v5e spec peak 197 TFLOP/s bf16
                        (re-calibrated round 4; older rounds used 135)

Pipeline measured (eval) = the framework's one-dispatch epoch evaluation
(CDEvaluator.eval_epoch_scan): uint8 set staged in HBM, one jitted lax.scan
of normalize -> DAHiTra bf16 forward -> argmax -> CM; one (2, 2) matrix
returns to host. The reference instead paid per-batch host transfers, numpy
bincounts, and a mandatory JPEG dump (models/evaluator.py:106-131).
Train = lax.scan of the full jitted train step (on-device augmentation,
dice+focal loss, backward, AdamW update, CM) with the TrainState as carry.
"""
from __future__ import annotations

import json
import subprocess
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_IMPS = 67.77
# MFU denominator: v5e peak bf16 matmul throughput. Earlier rounds used a
# "measured 135 TFLOP/s ceiling", but that calibration carried the tunnel's
# dispatch+D2H constants inside the timed region; the differenced canary
# below measures 185.6 TFLOP/s on the same chip (94% of the 197 spec peak),
# so MFU is now reported against the spec peak. Cross-round MFU comparisons
# must rescale older rounds by 135/197.
CHIP_BF16_TFLOPS = 197.0  # v5e spec peak, bf16
IMG = 256
EVAL_BATCH = 128  # larger eval batches amortize the 32-wide head ops
EVAL_BATCHES = 16
TRAIN_BATCH = 8  # run_cd.sh recipe batch size
TRAIN_STEPS = 32
REPEATS = 3

# Supervisor settings: a transient tunnel-relay blip must not zero a round's
# bench artifact (round 3 lost its BENCH to an rc=1 backend-init failure), so
# the __main__ path probes backend init in a THROWAWAY subprocess with
# backoff before running the measurement in a fresh process. Fresh processes
# matter: jax memoizes backend-init failures, so in-process retry can't heal.
PROBE_BACKOFFS_S = (0, 15, 30, 60, 120, 240)
INNER_ATTEMPTS = 2
_INNER_ENV = "DAHITRA_BENCH_INNER"


def _probe_backend_ok(timeout_s: float = 180.0) -> bool:
    """True iff a fresh python process can init the jax backend + run a op."""
    code = ("import jax, numpy as np; "
            "np.asarray(jax.numpy.ones((8, 8)) @ jax.numpy.ones((8, 8)))")
    try:
        rc = subprocess.run([sys.executable, "-c", code],
                            timeout=timeout_s, capture_output=True).returncode
        return rc == 0
    except subprocess.TimeoutExpired:
        return False


def supervise() -> int:
    """Probe backend init with backoff, then run the bench in a fresh
    process (retrying once more on failure). Returns the exit code."""
    import os

    for i, pause in enumerate(PROBE_BACKOFFS_S):
        if pause:
            print(f"# backend probe retry in {pause}s", file=sys.stderr)
            time.sleep(pause)
        if _probe_backend_ok():
            break
        print(f"# backend probe {i + 1}/{len(PROBE_BACKOFFS_S)} failed",
              file=sys.stderr)
    else:
        print(json.dumps({"metric": "levir_eval_throughput_dahitra_256px_bf16",
                          "value": 0.0, "unit": "image-pairs/sec/chip",
                          "vs_baseline": 0.0,
                          "error": "backend init failed after all retries"}))
        return 1
    env = dict(os.environ, **{_INNER_ENV: "1"})
    for attempt in range(INNER_ATTEMPTS):
        try:
            rc = subprocess.run([sys.executable, __file__], env=env,
                                timeout=3600).returncode
        except subprocess.TimeoutExpired:
            rc = -9  # relay died mid-run and the process hung
        if rc == 0:
            return 0
        print(f"# inner bench attempt {attempt + 1} rc={rc}", file=sys.stderr)
        time.sleep(30)
    print(json.dumps({"metric": "levir_eval_throughput_dahitra_256px_bf16",
                      "value": 0.0, "unit": "image-pairs/sec/chip",
                      "vs_baseline": 0.0,
                      "error": f"inner bench failed rc={rc}"}))
    return 1


def _timed(fn, *args):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # compile+sync
    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # tunnel-safe sync
        times.append(time.time() - t0)
    return min(times)


def _flops(fn, *args):
    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_eval(model, variables):
    from dahitra_tpu.data.augment import augment_pairs
    from dahitra_tpu.metrics.confusion import batch_confusion_matrix

    def eval_batch(variables, a_u8, b_u8, l_u8):
        a, b, label = augment_pairs(a_u8, b_u8, l_u8, jax.random.PRNGKey(0),
                                    train=False, dtype=jnp.bfloat16)
        logits = model.apply(variables, a, b, False)
        return batch_confusion_matrix(jnp.argmax(logits, -1), label, 2)

    @jax.jit
    def eval_epoch(variables, a_all, b_all, l_all):
        def body(cm, xs):
            return cm + eval_batch(variables, *xs), None

        cm, _ = jax.lax.scan(body, jnp.zeros((2, 2), jnp.int32),
                             (a_all, b_all, l_all))
        return cm

    rng = np.random.default_rng(0)
    shape = (EVAL_BATCHES, EVAL_BATCH, IMG, IMG)
    a_all = jnp.asarray(rng.integers(0, 255, shape + (3,), dtype=np.uint8))
    b_all = jnp.asarray(rng.integers(0, 255, shape + (3,), dtype=np.uint8))
    l_all = jnp.asarray(rng.integers(0, 2, shape).astype(np.uint8))
    jax.block_until_ready((a_all, b_all, l_all))

    dt = _timed(eval_epoch, variables, a_all, b_all, l_all)
    imps = EVAL_BATCHES * EVAL_BATCH / dt
    # cost_analysis of a lax.scan counts its body ONCE; take the
    # single-batch forward and scale by the batch count.
    fl = _flops(lambda v, a, b: model.apply(v, a, b, False),
                variables,
                jnp.zeros((EVAL_BATCH, IMG, IMG, 3), jnp.bfloat16),
                jnp.zeros((EVAL_BATCH, IMG, IMG, 3), jnp.bfloat16))
    return imps, fl * EVAL_BATCHES / dt / 1e12 if fl else 0.0


def bench_train(batch=TRAIN_BATCH):
    import argparse
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
    with tempfile.TemporaryDirectory() as td:
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

        # compile+warm (donated state: rebuild per call)
        st, losses = run(state)
        np.asarray(losses)
        times = []
        for _ in range(REPEATS):
            t0 = time.time()
            st, losses = run(st)
            np.asarray(losses)
            times.append(time.time() - t0)
        dt = min(times)
    imps = n_batches * batch / dt
    return imps, dt, n_batches


def bench_canary():
    """Fixed chip-speed canary: differenced scans of 2048^3 bf16 matmuls.

    The tunneled chip's effective throughput drifts ~2x between processes
    (docs/ARCHITECTURE.md round-3 note), so every BENCH_rN records this
    constant kernel's achieved TFLOP/s measured in the SAME process as the
    headline metrics. Cross-round comparisons divide by the canary ratio to
    separate framework regressions from chip/tunnel drift — within the SAME
    canary series only (``canary_version`` in the JSON; the r3 canary
    returned an 8 MB matrix and measured the tunnel, not the chip, so
    r3-vs-r4+ canary ratios are meaningless).

    Measurement design (round 4): time a 256-iter and a 1280-iter scan and
    difference them — the ~30 ms tunnel dispatch and the D2H sync cost are
    identical constants in both, so the difference is 1024 iterations of
    pure device compute. (The round-3 canary returned the full 2048^2
    matrix, so np.asarray dragged 8 MB through the ~45 MB/s tunnel every
    rep and it read 5 TFLOP/s on a healthy chip.) Scaling by ~1/sqrt(n)
    per iteration keeps magnitudes O(1) across 1280 bf16 matmuls.

    Returns (tflops, t_lo): ``t_lo`` is the short-scan wall time — almost
    entirely tunnel dispatch + D2H sync — kept in the JSON as the dispatch
    floor so tunnel-latency drift stays observable alongside the
    compute-only TFLOP/s reading.
    """
    n, lo, hi = 2048, 256, 1280

    def make(iters):
        @jax.jit
        def run(x):
            def body(c, _):
                return (c @ x) * 0.0221, None  # ~1/sqrt(2048)
            y, _ = jax.lax.scan(body, x, None, length=iters)
            return y[0, 0]  # scalar out: keep D2H off the timed path
        return run

    x = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    t_lo = _timed(make(lo), x)
    t_hi = _timed(make(hi), x)
    dt = t_hi - t_lo
    if dt <= 0:  # drift noise swamped the difference; don't report garbage
        return 0.0, t_lo
    return 2.0 * n * n * n * (hi - lo) / dt / 1e12, t_lo


def bench_xbd_train():
    """xBD damage-training tiles/s at the reference's native recipe
    (1024px tiles, batch 1 — xBD_code/train.py:67,310-388), via the same
    chunked-scan measurement as benchmarks/bench_xbd.py. BASELINE.json
    names "xBD tiles/sec" as a headline metric; this puts it in the
    driver-parsed JSON instead of only the queued artifact."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    import bench_xbd

    tiles_per_s, _, _ = bench_xbd.bench_train(1, scan=True)
    return tiles_per_s


def main():
    from dahitra_tpu.models import define_g

    canary_tflops, canary_t_lo = bench_canary()

    model = define_g("newUNetTrans", dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((EVAL_BATCH, IMG, IMG, 3), jnp.bfloat16)
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, False))(
        key, dummy, dummy)

    eval_imps, eval_tflops = bench_eval(model, variables)
    train_imps, train_dt, n_batches = bench_train()
    # TPU-native scaling points: the same recipe at batch 64 and 128 (the
    # reference's batch 8 was a GPU memory limit, not a modeling choice).
    # b128 measured ~6% over b64 (interleaved A/B) once the decoder stack
    # was n-chunked past XLA's size cliff; b256 exhausts HBM.
    train64_imps, train64_dt, nb64 = bench_train(64)
    train128_imps, train128_dt, nb128 = bench_train(128)

    # Train FLOPs: cost_analysis on the whole donated-scan is awkward;
    # approximate with 3x the single-forward flops (fwd + bwd ~ 2x fwd),
    # the standard accounting. Forward flops are exactly linear in batch,
    # so the b64/b128 points reuse the per-image figure.
    fwd_fl = _flops(lambda v, a, b: model.apply(v, a, b, False),
                    variables, dummy[:TRAIN_BATCH], dummy[:TRAIN_BATCH])
    fwd_fl_img = fwd_fl / TRAIN_BATCH if fwd_fl else 0.0
    train_tflops = (3.0 * fwd_fl * n_batches / train_dt / 1e12
                    if fwd_fl else 0.0)
    train64_tflops = 3.0 * fwd_fl_img * 64 * nb64 / train64_dt / 1e12
    train128_tflops = 3.0 * fwd_fl_img * 128 * nb128 / train128_dt / 1e12

    # xBD native-recipe throughput (1024px b1). A failure here (e.g. HBM
    # fragmentation after the LEVIR staging) must not zero the LEVIR
    # headline, so it degrades to 0.0 + an error note.
    try:
        xbd_tiles = bench_xbd_train()
        xbd_err = None
    except Exception as e:  # pragma: no cover - depends on chip state
        xbd_tiles, xbd_err = 0.0, f"{type(e).__name__}: {str(e)[:120]}"

    out = {
        "metric": "levir_eval_throughput_dahitra_256px_bf16",
        "value": round(eval_imps, 2),
        "unit": "image-pairs/sec/chip",
        "vs_baseline": round(eval_imps / BASELINE_IMPS, 2),
        "train_metric": "levir_train_throughput_dahitra_256px_b8_bf16",
        "train_imps": round(train_imps, 2),
        "train_vs_baseline": round(train_imps / BASELINE_IMPS, 2),
        "eval_tflops": round(eval_tflops, 2),
        "eval_mfu_pct": round(100 * eval_tflops / CHIP_BF16_TFLOPS, 2),
        "train_tflops": round(train_tflops, 2),
        "train_mfu_pct": round(100 * train_tflops / CHIP_BF16_TFLOPS, 2),
        "train_b64_imps": round(train64_imps, 2),
        "train_b64_vs_baseline": round(train64_imps / BASELINE_IMPS, 2),
        "train_b64_tflops": round(train64_tflops, 2),
        "train_b64_mfu_pct": round(
            100 * train64_tflops / CHIP_BF16_TFLOPS, 2),
        "train_b128_imps": round(train128_imps, 2),
        "train_b128_vs_baseline": round(train128_imps / BASELINE_IMPS, 2),
        "train_b128_tflops": round(train128_tflops, 2),
        "train_b128_mfu_pct": round(
            100 * train128_tflops / CHIP_BF16_TFLOPS, 2),
        "xbd_train_tiles_per_sec": round(xbd_tiles, 3),
        "mfu_denominator_tflops": CHIP_BF16_TFLOPS,
        "canary_tflops": round(canary_tflops, 2),
        "canary_pct_of_ceiling": round(
            100 * canary_tflops / CHIP_BF16_TFLOPS, 2),
        "canary_version": "r4-differenced-scan",
        "canary_dispatch_floor_s": round(canary_t_lo, 4),
    }
    if xbd_err:
        out["xbd_train_error"] = xbd_err
    print(json.dumps(out))


if __name__ == "__main__":
    import os

    if os.environ.get(_INNER_ENV):
        main()
    else:
        sys.exit(supervise())
