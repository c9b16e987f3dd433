"""PairBatchNorm: pair=False must equal flax nn.BatchNorm; pair=True on a
[date1; date2] stacked batch must equal two sequential per-date BN passes
(values AND updated running stats) — the exact semantics of the reference's
twin forward_single calls. Plus end-to-end: DAHiTraUNet's pair-BN train
step equals the two-pass form."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from dahitra_tpu.nn.resnet import PairBatchNorm


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape)
                       .astype(np.float32))


def test_pair_false_equals_flax_batchnorm():
    x = _rand((4, 6, 6, 8))
    pbn = PairBatchNorm()
    fbn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
    v = pbn.init(jax.random.PRNGKey(0), x, True)
    # same variable tree layout as flax BatchNorm
    vf = fbn.init(jax.random.PRNGKey(0), x, use_running_average=True)
    assert jax.tree.structure(v) == jax.tree.structure(vf)
    # non-trivial scale/bias/running stats
    v = {"params": {"scale": _rand((8,), 1) + 2.0, "bias": _rand((8,), 2)},
         "batch_stats": {"mean": _rand((8,), 3),
                         "var": jnp.abs(_rand((8,), 4)) + 0.5}}
    for ura in (True, False):
        y_p, mut_p = pbn.apply(v, x, ura, mutable=["batch_stats"])
        y_f, mut_f = fbn.apply(v, x, use_running_average=ura,
                               mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_f),
                                   rtol=1e-6, atol=1e-6)
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mut_p["batch_stats"][k]),
                np.asarray(mut_f["batch_stats"][k]), rtol=1e-6, atol=1e-6)


def test_pair_true_equals_two_sequential_passes():
    b = 3
    x1 = _rand((b, 5, 5, 4), 10)
    x2 = _rand((b, 5, 5, 4), 11) * 2.0 + 1.0
    v = {"params": {"scale": _rand((4,), 1) + 1.5, "bias": _rand((4,), 2)},
         "batch_stats": {"mean": _rand((4,), 3),
                         "var": jnp.abs(_rand((4,), 4)) + 0.3}}
    pbn = PairBatchNorm()

    y12, mut = pbn.apply(v, jnp.concatenate([x1, x2], axis=0), False,
                         True, mutable=["batch_stats"])

    # sequential reference: date1 pass then date2 pass
    y1, m1 = pbn.apply(v, x1, False, mutable=["batch_stats"])
    y2, m2 = pbn.apply({"params": v["params"],
                        "batch_stats": m1["batch_stats"]}, x2, False,
                       mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y12[:b]), np.asarray(y1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y12[b:]), np.asarray(y2),
                               rtol=1e-6, atol=1e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(mut["batch_stats"][k]),
                                   np.asarray(m2["batch_stats"][k]),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_dahitra_pair_train_step_equals_two_pass(tmp_path):
    """Full DAHiTra train forward+grad: pair-BN stacked path vs the
    two-pass path — same loss, same grads, same new batch_stats. The paths
    are selected via the model's ``pair_bn`` field (flipping the env var
    mid-process is ineffective: it is read once at import)."""
    from dahitra_tpu.models.dahitra import DAHiTraUNet
    from dahitra_tpu.losses.cd import levir_train_loss

    key = jax.random.PRNGKey(0)
    a = _rand((2, 64, 64, 3), 20)
    b = _rand((2, 64, 64, 3), 21)
    lbl = jnp.asarray(np.random.default_rng(5).integers(0, 2, (2, 64, 64)))
    models = {"pair": DAHiTraUNet(img_size=64, pair_bn=True),
              "twopass": DAHiTraUNet(img_size=64, pair_bn=False)}
    variables = jax.jit(
        lambda k: models["pair"].init({"params": k, "dropout": k}, a, b,
                                      True))(key)

    outs = {}
    for tag, model in models.items():
        def loss_fn(params, bs, model=model):
            logits, mut = model.apply(
                {"params": params, "batch_stats": bs}, a, b, True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return levir_train_loss(logits.astype(jnp.float32), lbl, 2), \
                mut["batch_stats"]

        (loss, new_bs), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(
                variables["params"], variables["batch_stats"])
        outs[tag] = (float(loss), new_bs, grads)
    assert outs["pair"][0] == pytest.approx(outs["twopass"][0], rel=1e-5)
    for ap, at in zip(jax.tree.leaves(outs["pair"][1]),
                      jax.tree.leaves(outs["twopass"][1])):
        np.testing.assert_allclose(np.asarray(ap), np.asarray(at),
                                   rtol=1e-4, atol=1e-5)
    for gp, gt in zip(jax.tree.leaves(outs["pair"][2]),
                      jax.tree.leaves(outs["twopass"][2])):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gt),
                                   rtol=5e-3, atol=2e-4)
