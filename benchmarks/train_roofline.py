"""Train-step roofline: per-segment timings of the DAHiTra LEVIR train step.

VERDICT r3 item 2: eval has a written roofline (~430 GB/s HBM-bound,
docs/ARCHITECTURE.md) but the train step does not — train MFU (~26% at b64)
is roughly half of eval's and nothing states where the non-MXU time goes.
This harness measures, IN ONE PROCESS (the tunneled chip drifts ~2x between
processes) and inside fused jitted scans (standalone-op numbers mislead —
memory: tpu-tunnel-measurement), the segments of the b64 bf16 train step:

  full       the real train step (aug + fwd + bwd + AdamW + CM), state carry
  fwd        aug + loss forward only (train=True, BN stats mutated)
  fwd_bwd    aug + value_and_grad (grads consumed into the carry)
  adamw      optimizer update alone (fixed grads, perturbed per iteration)
  trunk_fwd  resnet trunk on the batch-stacked date pair (forward_single)
  trunk_bwd  grad of sum(trunk outputs) — trunk fwd+bwd incl. PairBatchNorm

Derived attribution printed at the end:
  backward_total = fwd_bwd - fwd
  trans+head fwd = fwd - trunk_fwd (minus aug, measured separately)
  trans+head bwd = backward_total - (trunk_bwd - trunk_fwd)
  step overhead  = full - fwd_bwd (AdamW + CM + bookkeeping)

Each segment also reports XLA cost_analysis flops and bytes so the
time can be placed against the re-calibrated MXU/conv and ~800 GB/s HBM
ceilings. Run on the real chip:  python benchmarks/train_roofline.py
Writes benchmarks/artifacts/train_roofline.json.
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
import optax

BATCH = 64
IMG = 256
ITERS = 16  # --iters overrides (CPU smoke uses 2)  # scan length: 30 ms dispatch floor -> <2 ms/iter bias
REPEATS = 3
# Re-calibrated round 4 (differenced-scan canary, docs/ARCHITECTURE.md):
# the chip reaches 185.6 TFLOP/s on 2048^3 bf16 matmuls (94% of the 197
# v5e spec peak) and 133-153 TFLOP/s on 3x3 convs at the model's hot
# shapes; the old "measured 135 matmul / 102 conv" figures carried the
# tunnel dispatch+D2H constants inside the timed region.
CHIP_BF16_TFLOPS = 197.0
CHIP_CONV_TFLOPS = 143.0  # midpoint of the measured 133-153 conv range
HBM_GBPS = 800.0  # v5e nominal


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def _timed_scan(jitted, *args):
    """min-of-REPEATS wall time of one jitted call (already a scan of
    ITERS); returns (seconds per inner iteration, spread) where spread is
    the max-min range over REPEATS — the noise bound for any value derived
    by differencing segments."""
    _sync(jitted(*args))  # compile + warm
    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        out = jitted(*args)
        _sync(out)
        times.append(time.time() - t0)
    return min(times) / ITERS, (max(times) - min(times)) / ITERS


def _cost(fn, *args):
    """(flops, hlo_bytes, io_floor_bytes) of the compiled fn.

    ``flops`` (cost_analysis) counts real executed FLOPs — trustworthy.
    ``hlo_bytes`` (cost_analysis 'bytes accessed') charges every HLO op's
    operands+results as HBM traffic and ignores fusion elision, so it
    OVER-counts real traffic (the v1 artifact divided it by time and
    reported >1 TB/s "achieved" against an 800 GB/s chip — an accounting
    bug, VERDICT r4). ``io_floor_bytes`` (memory_analysis argument+output
    sizes) is a true LOWER bound: every argument is read and every output
    written at least once. Real traffic lies in [io_floor, hlo_bytes]."""
    try:
        comp = jax.jit(fn).lower(*args).compile()
        an = comp.cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        ma = comp.memory_analysis()
        io = float(ma.argument_size_in_bytes + ma.output_size_in_bytes)
        return (float(an.get("flops", 0.0)),
                float(an.get("bytes accessed", 0.0)), io)
    except Exception:
        return 0.0, 0.0, 0.0


def main():
    global ITERS
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--img", type=int, default=IMG)
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--fine", action="store_true",
                    help="also time each trans module + head fwd/bwd")
    args_cli = ap.parse_args()
    batch = args_cli.batch
    img = args_cli.img
    ITERS = args_cli.iters

    from dahitra_tpu.data.augment import augment_pairs
    from dahitra_tpu.losses.cd import levir_train_loss
    from dahitra_tpu.metrics.confusion import batch_confusion_matrix
    from dahitra_tpu.models import define_g
    from dahitra_tpu.models.dahitra import DAHiTraUNet
    from dahitra_tpu.train.optim import make_optimizer

    model = define_g("newUNetTrans", dtype=jnp.bfloat16, img_size=img)
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((batch, img, img, 3), jnp.bfloat16)
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, False))(
        key, dummy, dummy)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = make_optimizer(1e-3)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    a_u8 = jnp.asarray(rng.integers(0, 255, (batch, img, img, 3),
                                    dtype=np.uint8))
    b_u8 = jnp.asarray(rng.integers(0, 255, (batch, img, img, 3),
                                    dtype=np.uint8))
    l_u8 = jnp.asarray(rng.integers(0, 2, (batch, img, img)).astype(np.uint8))
    _sync((a_u8, b_u8, l_u8))

    def loss_forward(params, batch_stats, key):
        a, b, label = augment_pairs(a_u8, b_u8, l_u8, key, train=True,
                                    dtype=jnp.bfloat16)
        logits, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, a, b, True,
            mutable=["batch_stats"])
        loss = levir_train_loss(logits.astype(jnp.float32), label, batch)
        return loss, (logits, label, mut["batch_stats"])

    # --- segment scans: carry chains a scalar into the key so XLA cannot
    # hoist the body out of the loop ---

    @jax.jit
    def scan_fwd(params, batch_stats):
        def body(c, i):
            loss, (_, _, bs) = loss_forward(
                params, batch_stats, jax.random.fold_in(
                    jax.random.PRNGKey(1), i + c.astype(jnp.int32)))
            return loss.astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return out

    @jax.jit
    def scan_fwd_bwd(params, batch_stats):
        def body(c, i):
            (loss, _), grads = jax.value_and_grad(
                loss_forward, has_aux=True)(
                    params, batch_stats, jax.random.fold_in(
                        jax.random.PRNGKey(1), i + c.astype(jnp.int32)))
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree_util.tree_leaves(grads))
            return loss.astype(jnp.float32) + 0.0 * gsum, None
        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return out

    grads0 = jax.jit(lambda p, bs: jax.grad(
        lambda pp: loss_forward(pp, bs, jax.random.PRNGKey(2))[0])(p))(
        params, batch_stats)
    _sync(grads0)

    @jax.jit
    def scan_adamw(params, opt_state):
        def body(carry, i):
            p, o = carry
            g = jax.tree_util.tree_map(
                lambda x: x * (1.0 + 1e-6 * i.astype(x.dtype)), grads0)
            upd, o = tx.update(g, o, p)
            p = optax.apply_updates(p, upd)
            return (p, o), None
        out, _ = jax.lax.scan(body, (params, opt_state), jnp.arange(ITERS))
        return out

    logits0 = jnp.zeros((batch, img, img, 2), jnp.bfloat16)

    @jax.jit
    def scan_cm(logits, label):
        def body(c, i):
            cm = batch_confusion_matrix(
                jnp.argmax(logits + i.astype(jnp.bfloat16) * 0, -1), label, 2)
            return c + cm, None
        out, _ = jax.lax.scan(body, jnp.zeros((2, 2), jnp.int32),
                              jnp.arange(ITERS))
        return out

    # trunk on the batch-stacked pair, the way the model runs it
    x_pair = jnp.zeros((batch, img, img, 3), jnp.bfloat16)

    def trunk_fwd(params, batch_stats, x1, x2):
        outs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.concatenate([x1, x2], 0), True, True,
            mutable=["batch_stats"], method=DAHiTraUNet.forward_single)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    @jax.jit
    def scan_trunk_fwd(params, batch_stats):
        def body(c, i):
            s = trunk_fwd(params, batch_stats,
                          x_pair + c * 0, x_pair + i.astype(jnp.bfloat16) * 0)
            return s.astype(jnp.bfloat16), None
        out, _ = jax.lax.scan(body, jnp.bfloat16(0), jnp.arange(ITERS))
        return out

    @jax.jit
    def scan_trunk_bwd(params, batch_stats):
        def body(c, i):
            g = jax.grad(trunk_fwd)(params, batch_stats, x_pair + c * 0,
                                    x_pair + i.astype(jnp.bfloat16) * 0)
            gs = sum(jnp.sum(x.astype(jnp.float32))
                     for x in jax.tree_util.tree_leaves(g))
            return gs.astype(jnp.bfloat16) * 0, None
        out, _ = jax.lax.scan(body, jnp.bfloat16(0), jnp.arange(ITERS))
        return out

    @jax.jit
    def scan_full(state):
        params, batch_stats, opt_state = state

        def body(carry, i):
            p, bs, o = carry
            (loss, (logits, label, new_bs)), grads = jax.value_and_grad(
                loss_forward, has_aux=True)(
                    p, bs, jax.random.fold_in(jax.random.PRNGKey(1), i))
            upd, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, upd)
            cm = batch_confusion_matrix(jnp.argmax(logits, -1), label, 2)
            return (p, new_bs, o), (loss, cm)
        state, (losses, cms) = jax.lax.scan(body, (params, batch_stats,
                                                   opt_state),
                                            jnp.arange(ITERS))
        return losses

    # --- fine segments: each transformer-difference module and the
    # top-down head, fwd and fwd+bwd, at their in-model shapes ---
    def _seg_scan(fn, *args):
        """Time fn(params, *args) inside an ITERS-scan (input perturbed per
        iteration so XLA cannot hoist the body)."""
        @jax.jit
        def scan(params):
            def body(c, i):
                out = fn(params, *[a + i.astype(a.dtype) * 0 for a in args])
                return (c + out.astype(jnp.float32)) * 0, None
            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return out
        return _timed_scan(scan, params)

    fine = {}
    if args_cli.fine:
        b = batch
        shapes = {  # in-model activation shapes at img 256 scale factors
            "trans_3": ((b, img // 4, img // 4, 64),) * 2,
            "trans_4": ((b, img // 8, img // 8, 128),) * 2,
            "trans_5": ((b, img // 16, img // 16, 256),) * 2,
        }
        for name, shp in shapes.items():
            x1 = jnp.zeros(shp[0], jnp.bfloat16)
            x2 = jnp.ones(shp[1], jnp.bfloat16)

            def mod_fwd(p, x1, x2, _name=name):
                out = model.apply(
                    {"params": p, "batch_stats": batch_stats}, x1, x2,
                    method=lambda m, x1, x2: getattr(m, _name)(x1, x2))
                return jnp.sum(out.astype(jnp.float32))

            fine[f"{name}_fwd"] = _seg_scan(mod_fwd, x1, x2)
            fine[f"{name}_fwdbwd"] = _seg_scan(
                lambda p, x1, x2, _f=mod_fwd: sum(
                    jnp.sum(g.astype(jnp.float32))
                    for g in jax.tree_util.tree_leaves(
                        jax.grad(_f)(p, x1, x2))), x1, x2)

        # Top-down head: upsample + PhaseUpConvs + TwoLayerConv + classifier
        # on pre-made trans outputs (networks.py:1321-1357 analog).
        out5 = jnp.zeros((b, img // 16, img // 16, 32), jnp.bfloat16)
        t4 = jnp.zeros((b, img // 8, img // 8, 32), jnp.bfloat16)
        t3 = jnp.zeros((b, img // 4, img // 4, 32), jnp.bfloat16)
        ab2 = jnp.zeros((b, img // 2, img // 2, 128), jnp.bfloat16)

        def head_fwd(p, out5, t4, t3, ab2):
            from dahitra_tpu.nn.blocks import upsample_nearest as up

            def run(m, out5, t4, t3, ab2):
                o5 = up(out5, 2)
                o4 = m.conv_layer4(t4 + o5)
                o3 = m.conv_layer3(t3 + o4)
                o2 = m.conv_layer2_0(ab2, True)
                o2 = m.conv_layer2(o2 + o3)
                return m.classifier(o2)
            out, _ = model.apply(
                {"params": p, "batch_stats": batch_stats},
                out5, t4, t3, ab2, method=run, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))

        fine["head_fwd"] = _seg_scan(head_fwd, out5, t4, t3, ab2)
        fine["head_fwdbwd"] = _seg_scan(
            lambda p, *a: sum(jnp.sum(g.astype(jnp.float32))
                              for g in jax.tree_util.tree_leaves(
                                  jax.grad(head_fwd)(p, *a))),
            out5, t4, t3, ab2)

        # Augmentation alone (uint8 -> bf16 train transform). ALL THREE
        # outputs are folded into the carry via full sums — consuming only
        # a[0,0,0] let XLA dead-code-eliminate the second image's blur/flip
        # chain and the whole label path (advisor r4, medium), making the
        # old reading a large under-measurement.
        @jax.jit
        def scan_aug(key0):
            def body(c, i):
                a, bb, lab = augment_pairs(a_u8, b_u8, l_u8,
                                           jax.random.fold_in(key0, i),
                                           train=True, dtype=jnp.bfloat16)
                s = (jnp.sum(a.astype(jnp.float32))
                     + jnp.sum(bb.astype(jnp.float32))
                     + jnp.sum(lab.astype(jnp.float32)))
                return (c + s) * 0, None
            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return out
        fine["aug"] = _timed_scan(scan_aug, jax.random.PRNGKey(3))

        # Loss alone (fp32 logits path) + its backward wrt logits.
        lg = jnp.zeros((b, img, img, 2), jnp.bfloat16)
        lbl = l_u8.astype(jnp.int32)

        def loss_only(p, lg):
            del p
            return levir_train_loss(lg.astype(jnp.float32), lbl, b)
        fine["loss_fwd"] = _seg_scan(loss_only, lg)
        fine["loss_fwdbwd"] = _seg_scan(
            lambda p, lg: jnp.sum(jax.grad(
                lambda g: loss_only(None, g))(lg).astype(jnp.float32)), lg)

    timed = {}
    timed["full"] = _timed_scan(scan_full, (params, batch_stats, opt_state))
    timed["fwd"] = _timed_scan(scan_fwd, params, batch_stats)
    timed["fwd_bwd"] = _timed_scan(scan_fwd_bwd, params, batch_stats)
    timed["adamw"] = _timed_scan(scan_adamw, params, opt_state)
    timed["cm"] = _timed_scan(scan_cm, logits0, l_u8.astype(jnp.int32))
    timed["trunk_fwd"] = _timed_scan(scan_trunk_fwd, params, batch_stats)
    timed["trunk_bwd"] = _timed_scan(scan_trunk_bwd, params, batch_stats)
    segs = {k: v[0] for k, v in timed.items()}
    spreads = {k: v[1] for k, v in timed.items()}

    fl_fwd, by_fwd, io_fwd = _cost(
        lambda p, b: loss_forward(p, b, jax.random.PRNGKey(1))[0],
        params, batch_stats)
    fl_fb, by_fb, io_fb = _cost(
        lambda p, b: jax.grad(
            lambda pp: loss_forward(pp, b, jax.random.PRNGKey(1))[0])(p),
        params, batch_stats)

    def _dms(x):
        """Differenced segment in ms, clamped at 0: min-of-REPEATS
        differencing noise exceeds the smallest segments (advisor r4), so a
        negative difference is noise, not a measurement."""
        return round(max(0.0, 1e3 * x), 2)

    def _bound(fl, io, t):
        """Roofline floors for one segment: the time it would take if the
        segment were purely MXU-bound (at the matmul ceiling — optimistic,
        convs cap lower) or purely HBM-bound at the argument+output I/O
        floor. headroom_x = measured / max(floor): >1 means time is spent
        beyond both proven floors (fusion-elided traffic, sub-128-lane
        matmuls, scheduling) — see docs/ARCHITECTURE.md round-5 note."""
        compute_floor = fl / (CHIP_BF16_TFLOPS * 1e12)
        io_floor = io / (HBM_GBPS * 1e9)
        floor = max(compute_floor, io_floor)
        return {
            "measured_ms": round(1e3 * t, 2),
            "compute_floor_ms": round(1e3 * compute_floor, 2),
            "io_floor_ms": round(1e3 * io_floor, 2),
            "headroom_x": round(t / floor, 2) if floor > 0 else None,
        }

    out = {
        "config": {"batch": batch, "img": img, "iters": ITERS,
                   "dtype": "bfloat16"},
        "seconds_per_iter": {k: round(v, 5) for k, v in segs.items()},
        "timing_spread_s": {k: round(v, 5) for k, v in spreads.items()},
        "derived_ms": {
            "backward_total": _dms(segs["fwd_bwd"] - segs["fwd"]),
            "trunk_bwd_only": _dms(segs["trunk_bwd"] - segs["trunk_fwd"]),
            "trans_head_fwd": _dms(segs["fwd"] - segs["trunk_fwd"]),
            "trans_head_bwd": _dms((segs["fwd_bwd"] - segs["fwd"])
                                   - (segs["trunk_bwd"] - segs["trunk_fwd"])),
            "step_overhead_adamw_cm": _dms(segs["full"] - segs["fwd_bwd"]),
        },
        "cost_analysis": {
            "fwd_tflops_achieved": round(fl_fwd / segs["fwd"] / 1e12, 2),
            "fwd_bwd_tflops_achieved": round(fl_fb / segs["fwd_bwd"] / 1e12,
                                             2),
            "mxu_ceiling_tflops": CHIP_BF16_TFLOPS,
            "conv_ceiling_tflops": CHIP_CONV_TFLOPS,
            "hbm_ceiling_gbps": HBM_GBPS,
        },
        # v2 byte model (VERDICT r4 item 2): v1 divided HLO 'bytes
        # accessed' by time and published >1 TB/s "achieved" on an
        # 800 GB/s chip. HLO bytes charge every op's operands+results and
        # ignore fusion elision — an upper MODEL of traffic, never a
        # bandwidth reading. The true lower bound (argument+output bytes,
        # each touched at least once) comes from XLA memory_analysis.
        "hbm_traffic": {
            "fwd": {"hlo_model_gb": round(by_fwd / 1e9, 3),
                    "io_floor_gb": round(io_fwd / 1e9, 3),
                    "io_floor_gbps": round(io_fwd / segs["fwd"] / 1e9, 1)},
            "fwd_bwd": {"hlo_model_gb": round(by_fb / 1e9, 3),
                        "io_floor_gb": round(io_fb / 1e9, 3),
                        "io_floor_gbps": round(io_fb / segs["fwd_bwd"] / 1e9,
                                               1)},
        },
        "bound_analysis": {
            "fwd": _bound(fl_fwd, io_fwd, segs["fwd"]),
            "fwd_bwd": _bound(fl_fb, io_fb, segs["fwd_bwd"]),
        },
        "train_imps": round(batch / segs["full"], 1),
    }
    if fine:
        fine_s = {k: v[0] for k, v in fine.items()}
        out["fine_seconds_per_iter"] = {k: round(v, 5)
                                        for k, v in fine_s.items()}
        out["fine_timing_spread_s"] = {k: round(v[1], 5)
                                       for k, v in fine.items()}
        out["fine_derived_ms"] = {
            f"{m}_bwd_only": _dms(fine_s[f"{m}_fwdbwd"] - fine_s[f"{m}_fwd"])
            for m in ("trans_3", "trans_4", "trans_5", "head", "loss")}
    print(json.dumps(out, indent=2))
    if jax.devices()[0].platform == "cpu":
        print("cpu smoke run — artifact not written")
        return
    artifact = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                             "artifacts", "train_roofline.json")
    _os.makedirs(_os.path.dirname(artifact), exist_ok=True)
    with open(artifact, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {artifact}")


if __name__ == "__main__":
    main()
