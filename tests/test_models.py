"""Model-zoo shape/behavior tests (CPU, small inputs where possible)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahitra_tpu.models import BIT, DAHiTraUNet, ResNetCD, available_models, define_g

pytestmark = pytest.mark.slow  # zoo/engine compile-heavy


def init_and_run(model, shape=(1, 64, 64, 3), six_channel=False, train=False):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, shape)
    if six_channel:
        variables = model.init(key, a, None, train)
        out = model.apply(variables, a, None, train,
                          mutable=["batch_stats"] if train else False)
    else:
        b = jax.random.normal(jax.random.PRNGKey(1), shape)
        variables = model.init(key, a, b, train)
        out = model.apply(variables, a, b, train,
                          mutable=["batch_stats"] if train else False)
    if train:
        out = out[0]
    return out, variables


def test_registry_keys_match_reference():
    # define_G keys from models/networks.py:130-168 built so far.
    for key in ["base_resnet18", "base_transformer_pos_s4",
                "base_transformer_pos_s4_dd8", "base_transformer_pos_s4_dd8_o5",
                "base_transformer_pos_s4_dd8_dedim8",
                "base_transformer_pos_s4_dd8_t8_e2d4", "newUNetTrans"]:
        assert key in available_models()
    with pytest.raises(NotImplementedError):
        define_g("nope")


def test_resnet_cd_output_shape():
    model = define_g("base_resnet18")
    out, _ = init_and_run(model, (1, 64, 64, 3))
    assert out.shape == (1, 64, 64, 2)


def test_bit_output_shape_and_scales():
    model = BIT(output_nc=2, resnet_stages_num=4, enc_depth=1, dec_depth=8,
                decoder_pos_size=16)
    out, variables = init_and_run(model, (2, 64, 64, 3))
    assert out.shape == (2, 64, 64, 2)
    # Learned positional embedding for 2*token_len tokens of width 32.
    assert variables["params"]["pos_embedding"].shape == (1, 8, 32)


def test_bit_o5_output_channels():
    model = define_g("base_transformer_pos_s4_dd8_o5")
    # Full-size init is slow on CPU; check the classifier config instead.
    assert model.output_nc == 5


def test_dahitra_output_shape_and_pos_sizes():
    model = DAHiTraUNet(output_nc=2, img_size=64)
    out, variables = init_and_run(model, (1, 64, 64, 3))
    assert out.shape == (1, 64, 64, 2)
    p = variables["params"]
    # Decoder positional embeddings at 1/4, 1/8, 1/16 of img_size
    # (networks.py:1211-1215 scaled from the 256 baseline).
    assert p["trans_3"]["pos_embedding_decoder"].shape == (1, 16, 16, 32)
    assert p["trans_4"]["pos_embedding_decoder"].shape == (1, 8, 8, 32)
    assert p["trans_5"]["pos_embedding_decoder"].shape == (1, 4, 4, 32)
    # Token positional embeddings (1, 2L, 32).
    assert p["trans_3"]["pos_embedding"].shape == (1, 8, 32)
    # Decoder depths per scale: 8 (level 3), 4 (level 4), 4 (level 5)
    # (networks.py:1223-1232).
    assert "attn_7" in p["trans_3"]["decoder"]
    assert "attn_3" in p["trans_4"]["decoder"] and "attn_4" not in p["trans_4"]["decoder"]
    assert "attn_3" in p["trans_5"]["decoder"] and "attn_4" not in p["trans_5"]["decoder"]


def test_dahitra_six_channel_input():
    model = DAHiTraUNet(output_nc=5, input_nc=6, img_size=64)
    out, _ = init_and_run(model, (1, 64, 64, 6), six_channel=True)
    assert out.shape == (1, 64, 64, 5)


def test_dahitra_trunk_scales():
    """Verify the quirky 4-scale trunk returns 1/2, 1/4, 1/8, 1/16 features
    with 64/64/128/256 channels (networks.py:1118-1138)."""
    model = DAHiTraUNet(img_size=64)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (1, 64, 64, 3))
    variables = model.init(key, a, a)
    feats = model.apply(variables, a, False,
                        method=lambda m, x, train: m.forward_single(x, train))
    shapes = [f.shape for f in feats]
    assert shapes == [(1, 32, 32, 64), (1, 16, 16, 64), (1, 8, 8, 128),
                      (1, 4, 4, 256)]


def test_dahitra_gradients_flow_everywhere():
    model = DAHiTraUNet(output_nc=2, img_size=32)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (2, 32, 32, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    variables = model.init(key, a, b)

    def loss_fn(params):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]}, a, b)
        return jnp.mean(out ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    zero_leaves = [
        path for path, leaf in jax.tree_util.tree_leaves_with_path(grads)
        if float(jnp.abs(leaf).max()) == 0.0
    ]
    # Every parameter participates (the reference had silently-dead modules;
    # we require none).
    assert not zero_leaves, f"dead params: {zero_leaves[:5]}"


def test_dahitra_train_mode_updates_batch_stats():
    model = DAHiTraUNet(output_nc=2, img_size=32)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (2, 32, 32, 3))
    variables = model.init(key, a, a, True)
    out, mutated = model.apply(variables, a, a, True, mutable=["batch_stats"])
    before = variables["batch_stats"]["resnet"]["bn1"]["mean"]
    after = mutated["batch_stats"]["resnet"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_dahitra_stacked_heads_and_s2d_match_split_form():
    """The stacked-heads + s2d-stem rewrites (A/B knobs, default off —
    measured eval-negative, benchmarks/artifacts/stacked_ab.json) stay
    EXACT vs the split form in both train and eval mode: same params,
    same outputs to fp32 reassociation."""
    base = DAHiTraUNet(output_nc=2, img_size=32)
    fast = base.clone(stacked_heads=True, s2d_stem=True)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (2, 32, 32, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    variables = base.init(key, a, b)
    for train in (False, True):
        kw = dict(mutable=["batch_stats"]) if train else {}
        got = fast.apply(variables, a, b, train, **kw)
        want = base.apply(variables, a, b, train, **kw)
        if train:
            got, want = got[0], want[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
