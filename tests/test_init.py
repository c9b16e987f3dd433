"""Reference weight-init parity (models/networks.py:77-127 init_weights and
the xBD zoo ctor kaiming, xBD_code/zoo/models.py:638-646).

Oracle strategy: torch's initializers on same-shaped tensors give the target
distributions; we check our re-initialized flax leaves match them in
mean/std (distribution parity — exact values differ by PRNG).
"""
import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dahitra_tpu.nn.init import (_torch_fans, init_weights_variables,
                                 zoo_ctor_init_variables)


def _leaf(variables, *path):
    node = variables
    for p in path:
        node = node[p]
    return np.asarray(node)


@pytest.fixture(scope="module")
def bit_vars():
    """A small real model: BIT has convs, dense (attention), BN, LN and a
    learned positional embedding — every init category in one tree."""
    from dahitra_tpu.models import define_g

    model = define_g("base_transformer_pos_s4")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, False))(
        jax.random.PRNGKey(0), x, x)
    return variables


@pytest.mark.slow
def test_normal_init_stats_match_torch(bit_vars):
    out = init_weights_variables(bit_vars, jax.random.PRNGKey(1),
                                 "normal", 0.02)
    flat = jax.tree_util.tree_flatten_with_path(out["params"])[0]
    bn_mods = {tuple(str(p.key) for p in path)[:-1]
               for path, _ in jax.tree_util.tree_flatten_with_path(
                   out["batch_stats"])[0]}
    checked_kernel = checked_bn = checked_bias = 0
    for path, leaf in flat:
        names = tuple(str(p.key) for p in path)
        leaf = np.asarray(leaf)
        if names[:-1] in bn_mods:
            if names[-1] == "scale" and leaf.size >= 64:
                # torch: init.normal_(bn.weight, 1.0, 0.02)
                assert abs(leaf.mean() - 1.0) < 0.02
                assert abs(leaf.std() - 0.02) < 0.01
                checked_bn += 1
            elif names[-1] == "bias":
                assert (leaf == 0).all()
        elif names[-1] == "kernel" and leaf.ndim in (2, 4):
            if leaf.size >= 512:
                # torch: init.normal_(w, 0.0, 0.02) regardless of fan
                assert abs(leaf.mean()) < 0.01
                assert abs(leaf.std() - 0.02) < 0.005
                checked_kernel += 1
        elif names[-1] == "bias":
            assert (leaf == 0).all()
            checked_bias += 1
    assert checked_kernel > 5 and checked_bn > 2 and checked_bias > 2


@pytest.mark.slow
def test_pos_embedding_untouched(bit_vars):
    """nn.Parameter pos embeddings are not modules — init_weights leaves
    them at their randn values (networks.py:300-309)."""
    out = init_weights_variables(bit_vars, jax.random.PRNGKey(1),
                                 "normal", 0.02)
    flat_in = jax.tree_util.tree_flatten_with_path(bit_vars["params"])[0]
    flat_out = jax.tree_util.tree_flatten_with_path(out["params"])[0]
    found = False
    for (path, a), (_, b) in zip(flat_in, flat_out):
        names = tuple(str(p.key) for p in path)
        if any("pos" in n for n in names) and names[-1] not in (
                "kernel", "bias", "scale"):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            found = True
    assert found, "BIT should carry a learned pos embedding leaf"


def test_kaiming_and_xavier_stds():
    """std targets follow torch's fan conventions on a synthetic tree."""
    k = jax.random.PRNGKey(2)
    shape = (3, 3, 64, 128)
    variables = {"params": {"mod": {"kernel": jnp.zeros(shape), "bias":
                                    jnp.ones((128,))}}}
    fan_in, fan_out = _torch_fans(shape)
    assert (fan_in, fan_out) == (3 * 3 * 64, 3 * 3 * 128)

    out = init_weights_variables(variables, k, "kaiming", 0.02)
    w = _leaf(out["params"], "mod", "kernel")
    ref = torch.nn.init.kaiming_normal_(torch.empty(128, 64, 3, 3), a=0,
                                        mode="fan_in")
    assert abs(w.std() - ref.std().item()) < 0.002
    assert abs(w.std() - math.sqrt(2.0 / fan_in)) < 0.002

    out = init_weights_variables(variables, k, "xavier", 0.02)
    w = _leaf(out["params"], "mod", "kernel")
    ref = torch.nn.init.xavier_normal_(torch.empty(128, 64, 3, 3), gain=0.02)
    assert abs(w.std() - ref.std().item()) < 1e-4


def test_zoo_ctor_init_decoder_only():
    """conv6..conv10/res get kaiming(sqrt(2/fan_in)); encoder paths keep
    their original values (the reference inits before attaching the
    encoder)."""
    k = jax.random.PRNGKey(3)
    enc = 0.5 * jax.random.normal(jax.random.fold_in(k, 0), (3, 3, 16, 16))
    variables = {"params": {
        "resnet": {"layer1": {"kernel": enc}},
        "conv6": {"Conv_0": {"kernel": jnp.zeros((3, 3, 512, 320)),
                             "bias": jnp.ones((320,))}},
        "res": {"kernel": jnp.zeros((1, 1, 96, 5)), "bias": jnp.ones((5,))},
    }}
    out = zoo_ctor_init_variables(variables, k)
    np.testing.assert_array_equal(
        _leaf(out["params"], "resnet", "layer1", "kernel"), np.asarray(enc))
    w6 = _leaf(out["params"], "conv6", "Conv_0", "kernel")
    assert abs(w6.std() - math.sqrt(2.0 / (3 * 3 * 512))) < 2e-3
    assert (_leaf(out["params"], "conv6", "Conv_0", "bias") == 0).all()
    wr = _leaf(out["params"], "res", "kernel")
    assert abs(wr.std() - math.sqrt(2.0 / 96)) < 0.05  # small sample
    assert (_leaf(out["params"], "res", "bias") == 0).all()


def test_transpose_conv_fan():
    """torch ConvTranspose2d fan_in = out_ch * rf (weight dim 1)."""
    assert _torch_fans((4, 4, 64, 32), transpose=True)[0] == 32 * 16
    w = torch.empty(64, 32, 4, 4)  # torch CT weight (in, out, kh, kw)
    fi, _ = torch.nn.init._calculate_fan_in_and_fan_out(w)
    assert fi == 32 * 16
