"""Headline benchmark: LEVIR-CD evaluation throughput of the flagship
DAHiTra model on one TPU chip.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's logged eval throughput of ~68 image-pairs/s
(`imps: 67.77`, checkpoints/CROP_.../log.txt on its 2022 GPU; BASELINE.md).
The measured pipeline mirrors the evaluator hot loop: host uint8 batch ->
device transfer -> normalize -> DAHiTra forward (bf16) -> argmax ->
confusion-matrix update, all jit-fused; D2H only for the final CM.
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
N_BATCHES = 16


def main():
    from dahitra_tpu.data.augment import augment_pairs
    from dahitra_tpu.metrics.confusion import batch_confusion_matrix
    from dahitra_tpu.models import define_g

    model = define_g("newUNetTrans", dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((BATCH, IMG, IMG, 3), jnp.bfloat16)
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, False))(key, dummy, dummy)

    @jax.jit
    def eval_step(variables, a_u8, b_u8, l_u8):
        a, b, label = augment_pairs(a_u8, b_u8, l_u8, jax.random.PRNGKey(0),
                                    train=False, dtype=jnp.bfloat16)
        logits = model.apply(variables, a, b, False)
        return batch_confusion_matrix(jnp.argmax(logits, -1), label, 2)

    rng = np.random.default_rng(0)
    batches = [
        (rng.integers(0, 255, (BATCH, IMG, IMG, 3), dtype=np.uint8),
         rng.integers(0, 255, (BATCH, IMG, IMG, 3), dtype=np.uint8),
         rng.integers(0, 2, (BATCH, IMG, IMG)).astype(np.uint8))
        for _ in range(4)
    ]

    # Warmup / compile.
    cm = eval_step(variables, *[jnp.asarray(x) for x in batches[0]])
    cm.block_until_ready()

    t0 = time.time()
    cms = []
    for i in range(N_BATCHES):
        a, b, l = batches[i % len(batches)]
        cms.append(eval_step(variables, jnp.asarray(a), jnp.asarray(b),
                             jnp.asarray(l)))
    total = sum(cms)
    total.block_until_ready()
    dt = time.time() - t0

    imps = N_BATCHES * BATCH / dt
    print(json.dumps({
        "metric": "levir_eval_throughput_dahitra_256px_bf16",
        "value": round(imps, 2),
        "unit": "image-pairs/sec/chip",
        "vs_baseline": round(imps / BASELINE_IMPS, 2),
    }))


if __name__ == "__main__":
    main()
