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
