"""Eval-step roofline: per-segment timings of the DAHiTra LEVIR eval body.

VERDICT r4 item 3: the eval headline has been flat (r2 2994 -> r4 3002
pairs/s) while round-3 same-process A/Bs of the forward (62.2 -> 41.8 ms at
b128) projected 3600-3890. The projections normalized by an assumed "round-2
chip speed" that the round-4 canary (98.7% of ceiling while eval read 3002)
discredits, so one of the readings is wrong. This harness measures, in ONE
process on the real chip, the segments of the b128 bf16 eval body exactly as
bench.py times it (one lax.scan iteration = aug(eval) + forward + argmax +
CM), with the measurement rules that post-date the round-3 A/Bs:

  * every segment's FULL output is consumed into the carry (sum over all
    leaves) — benchmarks/micro_decoder.py v1 showed that carrying a single
    element lets XLA slice-propagate a probe down to nothing and every
    variant reads the ~30 ms tunnel dispatch floor;
  * two scan lengths are differenced (bench.py canary pattern) so the
    dispatch + D2H constants cancel exactly.

Segments:
  eval_body   aug + fwd + argmax + CM (the bench.py scan body)
  fwd         model forward alone (eval mode, running BN stats)
  trunk       forward_single on the batch-stacked [A;B] pair (eval path)
  trans_3/4/5 each transformer-difference module at its in-model shape
  head        top-down PhaseUpConv fusion + classifier
  aug         eval-mode normalize (//255-style uint8 -> bf16)
  cm          argmax + one-hot MXU confusion matrix

Writes benchmarks/artifacts/eval_roofline.json.
Run on the real chip:  python benchmarks/eval_roofline.py
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # runnable as python benchmarks/<x>.py

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 128  # bench.py EVAL_BATCH
IMG = 256
ITERS_LO = 4
ITERS_HI = 20  # differenced: 16 pure device iterations
REPEATS = 3
CHIP_BF16_TFLOPS = 197.0
CHIP_CONV_TFLOPS = 143.0
HBM_GBPS = 800.0


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def _timed(jitted, *args):
    _sync(jitted(*args))
    best = np.inf
    for _ in range(REPEATS):
        t0 = time.time()
        out = jitted(*args)
        _sync(out)
        best = min(best, time.time() - t0)
    return best


def _scan_timer(fn, *consts, iters_lo=None, iters_hi=None):
    """Differenced-scan seconds/iter of fn(i, *consts) with full-sum
    consumption of every output leaf."""
    lo = ITERS_LO if iters_lo is None else iters_lo
    hi = ITERS_HI if iters_hi is None else iters_hi

    def make(iters):
        @jax.jit
        def run(*consts):
            def body(c, i):
                out = fn(i, *consts)
                s = sum(jnp.sum(t.astype(jnp.float32))
                        for t in jax.tree_util.tree_leaves(out))
                return (c + s) * 1e-30, None
            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return out
        return run

    t_lo = _timed(make(lo), *consts)
    t_hi = _timed(make(hi), *consts)
    dt = t_hi - t_lo
    return dt / (hi - lo) if dt > 0 else float("nan")


def _cost(fn, *args):
    """(flops, io_floor_bytes) of the compiled fn — see train_roofline."""
    try:
        comp = jax.jit(fn).lower(*args).compile()
        an = comp.cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        ma = comp.memory_analysis()
        io = float(ma.argument_size_in_bytes + ma.output_size_in_bytes)
        return float(an.get("flops", 0.0)), io
    except Exception:
        return 0.0, 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--img", type=int, default=IMG)
    args_cli = ap.parse_args()
    batch, img = args_cli.batch, args_cli.img

    from dahitra_tpu.data.augment import augment_pairs
    from dahitra_tpu.metrics.confusion import batch_confusion_matrix
    from dahitra_tpu.models import define_g
    from dahitra_tpu.models.dahitra import DAHiTraUNet

    model = define_g("newUNetTrans", dtype=jnp.bfloat16, img_size=img)
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((batch, img, img, 3), jnp.bfloat16)
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, False))(
        key, dummy, dummy)

    rng = np.random.default_rng(0)
    a_u8 = jnp.asarray(rng.integers(0, 255, (batch, img, img, 3),
                                    dtype=np.uint8))
    b_u8 = jnp.asarray(rng.integers(0, 255, (batch, img, img, 3),
                                    dtype=np.uint8))
    l_u8 = jnp.asarray(rng.integers(0, 2, (batch, img, img)).astype(np.uint8))
    _sync((a_u8, b_u8, l_u8))

    segs, costs = {}, {}

    # All large arrays are threaded through as jit ARGUMENTS (device
    # buffers), never closure constants: a closed-over array is baked into
    # the HLO as a literal, and at b128 the head segment's skip tensor alone
    # is 512 MB — the serialized program then exceeds the remote-compile
    # tunnel's request-body limit (HTTP 413).

    # Full eval body — bench.py bench_eval's scan body verbatim.
    # NOTE: in eval mode augment_pairs ignores the PRNG key, so fold_in(.., i)
    # alone leaves the body loop-invariant and XLA hoists it out of the scan
    # (observed: differenced time ~0 -> NaN). Perturb the uint8 input by the
    # index so every iteration is live.
    # (The perturbation must route through a FLOAT multiply: an integer
    # i*0 constant-folds to 0 and the hoist happens anyway; bf16 i*0 is
    # not foldable because XLA cannot rule out inf/NaN in i.)
    def eval_body(i, variables, a_u8, b_u8, l_u8):
        a_i = a_u8 + (i.astype(jnp.bfloat16) * 0).astype(jnp.uint8)
        a, b, label = augment_pairs(a_i, b_u8, l_u8,
                                    jax.random.fold_in(
                                        jax.random.PRNGKey(0), i),
                                    train=False, dtype=jnp.bfloat16)
        logits = model.apply(variables, a, b, False)
        return batch_confusion_matrix(jnp.argmax(logits, -1), label, 2)
    segs["eval_body"] = _scan_timer(eval_body, variables, a_u8, b_u8, l_u8)
    costs["eval_body"] = _cost(
        lambda v, a, b, l: eval_body(jnp.int32(0), v, a, b, l),
        variables, a_u8, b_u8, l_u8)

    # Forward alone (inputs perturbed per iteration).
    a_bf = (a_u8.astype(jnp.bfloat16) / 255.0 - 0.5) / 0.5
    b_bf = (b_u8.astype(jnp.bfloat16) / 255.0 - 0.5) / 0.5

    def fwd(i, variables, a_bf, b_bf):
        return model.apply(variables, a_bf + i.astype(jnp.bfloat16) * 0,
                           b_bf, False)
    segs["fwd"] = _scan_timer(fwd, variables, a_bf, b_bf)
    costs["fwd"] = _cost(lambda v, a, b: fwd(jnp.int32(0), v, a, b),
                         variables, a_bf, b_bf)

    # Trunk (eval path: one batch-stacked [A;B] pass, running stats).
    def trunk(i, variables, a_bf, b_bf):
        return model.apply(
            variables,
            jnp.concatenate([a_bf + i.astype(jnp.bfloat16) * 0, b_bf], 0),
            False, False, method=DAHiTraUNet.forward_single)
    segs["trunk"] = _scan_timer(trunk, variables, a_bf, b_bf)
    costs["trunk"] = _cost(lambda v, a, b: trunk(jnp.int32(0), v, a, b),
                           variables, a_bf, b_bf)

    # Each transformer-difference module at its in-model shape.
    shapes = {
        "trans_3": (batch, img // 4, img // 4, 64),
        "trans_4": (batch, img // 8, img // 8, 128),
        "trans_5": (batch, img // 16, img // 16, 256),
    }
    for name, shp in shapes.items():
        x1 = jnp.asarray(rng.standard_normal(shp), jnp.bfloat16)
        x2 = jnp.asarray(rng.standard_normal(shp), jnp.bfloat16)

        def mod(i, variables, x1, x2, _name=name):
            return model.apply(
                variables, x1 + i.astype(jnp.bfloat16) * 0, x2,
                method=lambda m, u, v: getattr(m, _name)(u, v))
        segs[name] = _scan_timer(mod, variables, x1, x2)
        costs[name] = _cost(
            lambda v, u, w, _m=mod: _m(jnp.int32(0), v, u, w),
            variables, x1, x2)

    # Top-down head on pre-made trans outputs.
    out5 = jnp.asarray(rng.standard_normal(
        (batch, img // 16, img // 16, 32)), jnp.bfloat16)
    t4 = jnp.asarray(rng.standard_normal(
        (batch, img // 8, img // 8, 32)), jnp.bfloat16)
    t3 = jnp.asarray(rng.standard_normal(
        (batch, img // 4, img // 4, 32)), jnp.bfloat16)
    ab2 = jnp.asarray(rng.standard_normal(
        (batch, img // 2, img // 2, 128)), jnp.bfloat16)

    def head(i, variables, out5, t4, t3, ab2):
        from dahitra_tpu.nn.blocks import upsample_nearest as up

        def run(m, o5, t4, t3, ab2):
            o5 = up(o5, 2)
            o4 = m.conv_layer4(t4 + o5)
            o3 = m.conv_layer3(t3 + o4)
            o2 = m.conv_layer2_0(ab2, False)
            o2 = m.conv_layer2(o2 + o3)
            return m.classifier(o2)
        return model.apply(variables, out5 + i.astype(jnp.bfloat16) * 0,
                           t4, t3, ab2, method=run)
    segs["head"] = _scan_timer(head, variables, out5, t4, t3, ab2)
    costs["head"] = _cost(
        lambda v, o5, u4, u3, s2: head(jnp.int32(0), v, o5, u4, u3, s2),
        variables, out5, t4, t3, ab2)

    # Aug (eval normalize) and argmax+CM.
    def aug(i, _v, a_u8, b_u8, l_u8):
        # Same loop-invariance hazard as eval_body: perturb the input by i.
        return augment_pairs(
            a_u8 + (i.astype(jnp.bfloat16) * 0).astype(jnp.uint8), b_u8, l_u8,
                             jax.random.fold_in(jax.random.PRNGKey(0), i),
                             train=False, dtype=jnp.bfloat16)
    segs["aug"] = _scan_timer(aug, variables, a_u8, b_u8, l_u8)
    costs["aug"] = _cost(lambda v, a, b, l: aug(jnp.int32(0), v, a, b, l),
                         variables, a_u8, b_u8, l_u8)

    logits0 = jnp.asarray(rng.standard_normal((batch, img, img, 2)),
                          jnp.bfloat16)

    def cm(i, _v, logits0, l_u8):
        return batch_confusion_matrix(
            jnp.argmax(logits0 + i.astype(jnp.bfloat16) * 0, -1),
            l_u8.astype(jnp.int32), 2)
    segs["cm"] = _scan_timer(cm, variables, logits0, l_u8)
    costs["cm"] = _cost(lambda v, lg, l: cm(jnp.int32(0), v, lg, l),
                        variables, logits0, l_u8)

    def _bound(fl, io, t):
        compute_floor = fl / (CHIP_BF16_TFLOPS * 1e12)
        io_floor = io / (HBM_GBPS * 1e9)
        floor = max(compute_floor, io_floor)
        return {
            "measured_ms": round(1e3 * t, 3),
            "compute_floor_ms": round(1e3 * compute_floor, 3),
            "io_floor_ms": round(1e3 * io_floor, 3),
            "headroom_x": round(t / floor, 2) if floor > 0 else None,
        }

    parts_sum = sum(segs[k] for k in
                    ("trunk", "trans_3", "trans_4", "trans_5", "head"))
    out = {
        "config": {"batch": batch, "img": img, "dtype": "bfloat16",
                   "iters": [ITERS_LO, ITERS_HI]},
        "seconds_per_iter": {k: round(v, 5) for k, v in segs.items()},
        "derived": {
            "eval_pairs_per_s": round(batch / segs["eval_body"], 1),
            "fwd_pairs_per_s": round(batch / segs["fwd"], 1),
            "fwd_ms": round(1e3 * segs["fwd"], 2),
            "non_fwd_overhead_ms": round(
                1e3 * (segs["eval_body"] - segs["fwd"]), 2),
            "parts_sum_ms": round(1e3 * parts_sum, 2),
            "fwd_minus_parts_ms": round(1e3 * (segs["fwd"] - parts_sum), 2),
        },
        "bound_analysis": {k: _bound(costs[k][0], costs[k][1], segs[k])
                           for k in segs if costs.get(k, (0, 0))[0] > 0},
    }
    print(json.dumps(out, indent=2))
    if jax.devices()[0].platform == "cpu":
        print("cpu smoke run - artifact not written")
        return
    artifact = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                             "artifacts", "eval_roofline.json")
    with open(artifact, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {artifact}")


if __name__ == "__main__":
    main()
