"""Fourth zoo wave: SE/DPN backbone UNets."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahitra_tpu.models import available_models, define_g

pytestmark = pytest.mark.slow  # zoo/engine compile-heavy


def test_se_dpn_registered():
    for key in ["xbd_seresnext50_loc", "xbd_seresnext50_double",
                "xbd_senet154_loc", "xbd_senet154_double",
                "xbd_dpn92_loc", "xbd_dpn92_double"]:
        assert key in available_models()


def test_seresnext_loc_shapes():
    m = define_g("xbd_seresnext50_loc")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = jax.jit(lambda k, x: m.init(k, x, False))(jax.random.PRNGKey(0), x)
    out = m.apply(v, x, False)
    assert out.shape == (1, 64, 64, 1)


def test_dpn92_double_shapes_and_sharing():
    m = define_g("xbd_dpn92_double")
    x6 = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 6))
    v = jax.jit(lambda k, x: m.init(k, x, None, False))(jax.random.PRNGKey(0), x6)
    out = m.apply(v, x6, None, False)
    assert out.shape == (1, 64, 64, 5)
    assert set(v["params"].keys()) == {"core", "res"}


def test_dpn92_stage_channels_match_reference():
    """Stage outputs must be 336/704/1552/2688 (pretrainedmodels dpn92,
    mirrored in Dpn92_Unet's encoder_filters, models.py:399)."""
    from dahitra_tpu.models.dpn_unet import DPN92Trunk

    m = DPN92Trunk()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = jax.jit(lambda k, x: m.init(k, x, False))(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x, False)
    assert [f.shape[-1] for f in feats] == [64, 336, 704, 1552, 2688]


def test_scse_doubles_channels():
    from dahitra_tpu.models.senet_unet import SCSEModule

    m = SCSEModule()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 32))
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == (1, 8, 8, 64)


def test_se_module_gates_between_zero_and_input():
    from dahitra_tpu.models.senet_unet import SEModule

    m = SEModule()
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 32)))
    v = m.init(jax.random.PRNGKey(1), x)
    out = np.asarray(m.apply(v, x))
    assert (out >= 0).all() and (out <= np.asarray(x) + 1e-6).all()
