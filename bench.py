"""Headline benchmark: LEVIR-CD evaluation throughput of the flagship
DAHiTra model on one TPU chip.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's logged eval throughput of ~68 image-pairs/s
(`imps: 67.77`, checkpoints/CROP_.../log.txt on its 2022 GPU; BASELINE.md).

Pipeline measured = the framework's one-dispatch epoch evaluation
(CDEvaluator.eval_epoch_scan): the uint8 eval set is staged in HBM once
(LEVIR-scale splits fit easily in 16 GB), then a single jitted lax.scan
runs normalize -> DAHiTra bf16 forward -> argmax -> confusion-matrix
accumulation for every batch; one (2, 2) matrix returns to host. This is
the steady-state per-epoch eval cost during training; the reference instead
paid per-batch host transfers, numpy bincounts, and a mandatory JPEG dump
(models/evaluator.py:106-131).
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_IMPS = 67.77
BATCH = 32
IMG = 256
N_BATCHES = 32
REPEATS = 3


def main():
    from dahitra_tpu.data.augment import augment_pairs
    from dahitra_tpu.metrics.confusion import batch_confusion_matrix
    from dahitra_tpu.models import define_g

    model = define_g("newUNetTrans", dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((BATCH, IMG, IMG, 3), jnp.bfloat16)
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, False))(key, dummy, dummy)

    def eval_batch(variables, a_u8, b_u8, l_u8):
        a, b, label = augment_pairs(a_u8, b_u8, l_u8, jax.random.PRNGKey(0),
                                    train=False, dtype=jnp.bfloat16)
        logits = model.apply(variables, a, b, False)
        return batch_confusion_matrix(jnp.argmax(logits, -1), label, 2)

    @jax.jit
    def eval_epoch(variables, a_all, b_all, l_all):
        def body(cm, xs):
            return cm + eval_batch(variables, *xs), None

        init = jnp.zeros((2, 2), jnp.int32)
        cm, _ = jax.lax.scan(body, init, (a_all, b_all, l_all))
        return cm

    rng = np.random.default_rng(0)
    a_all = jnp.asarray(rng.integers(0, 255, (N_BATCHES, BATCH, IMG, IMG, 3),
                                     dtype=np.uint8))
    b_all = jnp.asarray(rng.integers(0, 255, (N_BATCHES, BATCH, IMG, IMG, 3),
                                     dtype=np.uint8))
    l_all = jnp.asarray(rng.integers(0, 2, (N_BATCHES, BATCH, IMG, IMG)
                                     ).astype(np.uint8))
    jax.block_until_ready((a_all, b_all, l_all))

    # Warmup / compile. NOTE: on the tunneled chip block_until_ready
    # returns before the device finishes; np.asarray forces a real sync.
    np.asarray(eval_epoch(variables, a_all, b_all, l_all))

    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        cm = np.asarray(eval_epoch(variables, a_all, b_all, l_all))
        times.append(time.time() - t0)
    dt = min(times)

    imps = N_BATCHES * BATCH / dt
    print(json.dumps({
        "metric": "levir_eval_throughput_dahitra_256px_bf16",
        "value": round(imps, 2),
        "unit": "image-pairs/sec/chip",
        "vs_baseline": round(imps / BASELINE_IMPS, 2),
    }))


if __name__ == "__main__":
    main()
