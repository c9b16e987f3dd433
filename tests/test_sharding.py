"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import argparse
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


@pytest.mark.slow
def test_data_parallel_train_step(tmp_path):
    """Full train step over an 8-way data-parallel mesh: gradients sync via
    GSPMD (no explicit collectives in model code)."""
    from dahitra_tpu.core.mesh import make_mesh, batch_sharding
    from dahitra_tpu.train.engine import CDTrainer
    from tests.test_train_smoke import make_args, synthetic_arrays

    mesh = make_mesh(n_data=8, n_space=1)
    args = make_args(tmp_path, batch_size=8, img_size=32, net_G="base_resnet18")
    arrays = synthetic_arrays(8, size=32)
    trainer = CDTrainer(args, arrays, arrays, mesh=mesh)

    d = trainer._put(arrays)
    # The batch really is sharded across devices.
    assert len(d["a"].sharding.device_set) == 8
    state0 = jax.tree.map(lambda x: np.asarray(x), trainer.state.params)
    trainer.state, loss, cm = trainer._train_step(
        trainer.state, d["a"], d["b"], d["label"], jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # Params changed and remain replicated.
    changed = jax.tree.map(
        lambda a, b: not np.allclose(a, np.asarray(b)), state0,
        trainer.state.params)
    assert any(jax.tree.leaves(changed))


@pytest.mark.slow
def test_dp_matches_single_device_loss(tmp_path):
    """The dp-sharded step computes the same loss as single-device (global
    BatchNorm means GSPMD reductions must be exact)."""
    from dahitra_tpu.core.mesh import make_mesh
    from dahitra_tpu.train.engine import CDTrainer
    from tests.test_train_smoke import make_args, synthetic_arrays

    arrays = synthetic_arrays(8, size=32)
    losses = []
    for n_data, devices in [(1, jax.devices()[:1]), (8, None)]:
        mesh = make_mesh(n_data=n_data, devices=devices)
        args = make_args(tmp_path, project_name=f"dp{n_data}", batch_size=8,
                         img_size=32, net_G="base_resnet18")
        trainer = CDTrainer(args, arrays, arrays, mesh=mesh)
        d = trainer._put(arrays)
        _, loss, _ = trainer._train_step(trainer.state, d["a"], d["b"],
                                         d["label"], jax.random.PRNGKey(0))
        losses.append(float(loss))
    assert losses[0] == pytest.approx(losses[1], rel=2e-3)


@pytest.mark.slow
def test_xbd_train_step_spatial_mesh(tmp_path):
    """The FULL XBDTrainer._train_step (on-device augmentation + ComboLoss +
    AdamW) on a 2x4 data x space mesh, loss equal to single-device — the
    1024px xBD scaling path, exercised end-to-end at small dims."""
    from dahitra_tpu.core.mesh import batch_sharding, make_mesh
    from dahitra_tpu.train.xbd_engine import XBDTrainer

    rng = np.random.default_rng(0)
    n, s = 4, 64
    arrays = {
        "img_pre": rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
        "img_post": rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
        "msk": rng.integers(0, 2, (n, s, s, 5)).astype(np.uint8),
        "lbl_msk": rng.integers(0, 4, (n, s, s)).astype(np.uint8),
    }
    losses = []
    for tag, (n_data, n_space, devices) in (
            ("single", (1, 1, jax.devices()[:1])),
            ("mesh", (2, 4, None))):
        mesh = make_mesh(n_data=n_data, n_space=n_space, devices=devices)
        args = argparse.Namespace(
            net_G="xbd_res34_double", img_size=s, batch_size=n,
            val_batch_size=n, lr=1e-4, max_epochs=1,
            checkpoint_dir=str(tmp_path / tag), bf16=False, seed=0,
            warm_start_from=None)
        os.makedirs(args.checkpoint_dir, exist_ok=True)
        trainer = XBDTrainer(args, arrays, arrays, mesh=mesh, task="damage")
        sh = batch_sharding(mesh, spatial=n_space > 1)
        d = {k: jax.device_put(v, sh) for k, v in arrays.items()}
        if tag == "mesh":
            assert len(d["img_pre"].sharding.device_set) == 8
        state, loss = trainer._train_step(
            trainer.state, d["img_pre"], d["img_post"], d["msk"],
            d["lbl_msk"], jax.random.PRNGKey(0))
        jax.block_until_ready(loss)
        losses.append(float(loss))
    assert losses[1] == pytest.approx(losses[0], rel=2e-3)


@pytest.mark.slow
def test_spatial_sharding_forward():
    """Shard image rows over the 'space' axis; XLA inserts conv halo
    exchanges automatically (the 1024px xBD scaling path)."""
    from dahitra_tpu.core.mesh import make_mesh, batch_sharding
    from dahitra_tpu.models import define_g

    mesh = make_mesh(n_data=2, n_space=4)
    model = define_g("base_resnet18")
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (2, 64, 64, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, False))(key, a, b)

    sh = batch_sharding(mesh, spatial=True)
    a_s = jax.device_put(a, sh)
    b_s = jax.device_put(b, sh)
    out_sharded = jax.jit(lambda v, x, y: model.apply(v, x, y))(variables, a_s, b_s)
    out_local = model.apply(variables, a, b)
    np.testing.assert_allclose(np.asarray(out_sharded), np.asarray(out_local),
                               rtol=2e-3, atol=2e-3)


def test_mesh_from_gpu_ids():
    """--gpu_ids maps to mesh devices like the reference's DataParallel id
    list (utils.py:98-107): '0'=1 device, '0,1'=2, bad/overflowing ids
    degrade to one device."""
    import jax

    from dahitra_tpu.core.mesh import mesh_from_gpu_ids

    assert mesh_from_gpu_ids("0").devices.size == 1
    assert mesh_from_gpu_ids("0,1").devices.size == 2
    assert mesh_from_gpu_ids("0,1,2,3").devices.size == 4
    assert mesh_from_gpu_ids("99").devices.size == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        mesh_from_gpu_ids("junk")  # malformed ids fail loudly
    m = mesh_from_gpu_ids("0,1,2,3", n_space=2)
    assert dict(zip(m.axis_names, m.devices.shape)) == {"data": 2, "space": 2}
    # Duplicate ordinals are de-duplicated (not an opaque mesh error), and
    # dropped/out-of-range selections warn on stdout.
    assert mesh_from_gpu_ids("0,0").devices.size == 1
    assert mesh_from_gpu_ids("1,1,0").devices.size == 2


def test_mesh_from_gpu_ids_warns_on_drops(capsys):
    from dahitra_tpu.core.mesh import mesh_from_gpu_ids

    mesh_from_gpu_ids("0,0")
    assert "duplicate" in capsys.readouterr().out
    mesh_from_gpu_ids("99")
    assert "out of range" in capsys.readouterr().out
    mesh_from_gpu_ids("0,1,2", n_space=2)
    assert "not divisible" in capsys.readouterr().out


@pytest.mark.slow
def test_xbd_validate_multidevice_matches_single(tmp_path):
    """XBDTrainer.validate() on the 8-device data mesh with a RAGGED val set
    (5 samples, batch 8 -> padded): scores equal the single-device run —
    pad filler must not pollute dice or the per-class tp/fp/fn."""
    from dahitra_tpu.core.mesh import make_mesh
    from dahitra_tpu.train.xbd_engine import XBDTrainer

    rng = np.random.default_rng(1)
    n, s = 5, 32
    arrays = {
        "img_pre": rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
        "img_post": rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
        "msk": rng.integers(0, 2, (n, s, s, 5)).astype(np.uint8),
        "lbl_msk": rng.integers(0, 4, (n, s, s)).astype(np.uint8),
    }
    scores = {}
    for tag, (n_data, devices) in (("single", (1, jax.devices()[:1])),
                                   ("mesh", (8, None))):
        mesh = make_mesh(n_data=n_data, n_space=1, devices=devices)
        args = argparse.Namespace(
            net_G="xbd_res34_double", img_size=s, batch_size=8,
            val_batch_size=8, lr=1e-4, max_epochs=1,
            checkpoint_dir=str(tmp_path / ("v" + tag)), bf16=False, seed=0,
            warm_start_from=None)
        os.makedirs(args.checkpoint_dir, exist_ok=True)
        tr = XBDTrainer(args, arrays, arrays, mesh=mesh, task="damage")
        scores[tag] = tr.validate()
    assert scores["mesh"]["score"] == pytest.approx(
        scores["single"]["score"], rel=2e-3)
    assert scores["mesh"]["dice_loc"] == pytest.approx(
        scores["single"]["dice_loc"], rel=2e-3)
    np.testing.assert_allclose(scores["mesh"]["class_f1"],
                               scores["single"]["class_f1"], rtol=2e-3)


@pytest.mark.slow
def test_xbd_scan_epoch_matches_loop(tmp_path):
    """The chunked scan epoch steps the same shuffled batches as a per-batch
    replay from the same initial state (losses match, params close)."""
    import jax.numpy as jnp
    from dahitra_tpu.core.mesh import make_mesh
    from dahitra_tpu.train.xbd_engine import XBDTrainer

    rng = np.random.default_rng(2)
    n, s = 8, 32
    arrays = {
        "img_pre": rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
        "img_post": rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
        "msk": rng.integers(0, 2, (n, s, s, 5)).astype(np.uint8),
        "lbl_msk": rng.integers(0, 4, (n, s, s)).astype(np.uint8),
    }
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])

    def mk(tag, **over):
        a = argparse.Namespace(
            net_G="xbd_res34_double", img_size=s, batch_size=2,
            val_batch_size=2, lr=1e-4, max_epochs=1,
            checkpoint_dir=str(tmp_path / tag), bf16=False, seed=0,
            warm_start_from=None, **over)
        os.makedirs(a.checkpoint_dir, exist_ok=True)
        return a

    tr = XBDTrainer(mk("scan", scan_epoch=True, scan_chunk_batches=2),
                    arrays, arrays, mesh=mesh, task="damage")
    key0 = tr.key
    tr.train_one_epoch(0)

    # Replay the same chunks per-batch from a fresh identical trainer.
    tr2 = XBDTrainer(mk("loop"), arrays, arrays, mesh=mesh, task="damage")
    tr2.key = key0
    losses = []
    from dahitra_tpu.train.optim import (XBD_MULTISTEP_MILESTONES, epoch_lr,
                                         set_learning_rate)
    lr = epoch_lr(tr2.base_lr, 0, "multistep", 1,
                  milestones=XBD_MULTISTEP_MILESTONES, gamma=0.6,
                  after_epoch_step=True)
    tr2.state = tr2.state.replace(
        opt_state=set_learning_rate(tr2.state.opt_state, lr))
    for chunk in tr2._scan_chunks(0):
        tr2.key, sub = jax.random.split(tr2.key)
        keys = jax.random.split(sub, chunk[0].shape[0])
        for i in range(chunk[0].shape[0]):
            tr2.state, loss = tr2._train_step(
                tr2.state, *(jnp.asarray(c[i]) for c in chunk), keys[i])
            losses.append(float(loss))
    assert len(losses) == 4
    # AdamW normalizes by sqrt(v): fusion-order fp32 noise can flip the
    # update sign where grads ~0, so per-element drift saturates at ~lr per
    # step — slightly more during bias-correction warmup (see
    # test_scan_epoch_equals_step_loop). Bound: 1.5 * steps * lr.
    for a, b in zip(jax.tree.leaves(tr.state.params),
                    jax.tree.leaves(tr2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1.5 * len(losses) * 1e-4)


@pytest.mark.slow
def test_scan_epoch_covers_all_shards_on_mixed_mesh(tmp_path):
    """Regression: on a data x space mesh the staged dataset shards over
    'data' only, so the sharded-shuffle math must use the data-axis size —
    using the TOTAL device count made each shard's local permutation range
    over half its rows (the other half was never sampled) on a 4x2 mesh."""
    from dahitra_tpu.core.mesh import make_mesh
    from dahitra_tpu.train.engine import CDTrainer
    from tests.test_train_smoke import make_args, synthetic_arrays

    mesh = make_mesh(n_data=4, n_space=2)
    args = make_args(tmp_path, batch_size=8, img_size=32,
                     net_G="base_resnet18")
    args.scan_epoch = True
    arrays = synthetic_arrays(32, size=32)
    tr = CDTrainer(args, arrays, arrays, mesh=mesh)
    tr._stage_train()
    assert tr.n_data == 4
    n_local = tr._staged_n // tr.n_data  # 8 rows per data shard
    n_batches = tr._staged_n // args.batch_size
    per_dev = args.batch_size // tr.n_data
    perm = tr._epoch_perm(0, n_batches, args.batch_size)
    assert perm.shape == (n_batches, args.batch_size)
    # Every data shard's column block must cover its FULL local range over
    # the epoch (4 batches x 2 per-device rows = all 8 local indices).
    for dshard in range(tr.n_data):
        block = perm[:, dshard * per_dev:(dshard + 1) * per_dev]
        assert sorted(block.ravel().tolist()) == list(range(n_local))
    # And the scan epoch actually executes on the mixed mesh.
    scores = tr.train_one_epoch(0)
    assert np.isfinite(scores["mf1"])
