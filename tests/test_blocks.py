"""NN block parity vs torch oracles (layout/padding/norm conventions)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import flax.linen as fnn

from dahitra_tpu.nn import (
    MultiHeadSelfAttention,
    CrossAttention,
    SemanticTokenizer,
    TransformerEncoder,
    max_pool_3x3_s2,
    upsample_bilinear,
    upsample_nearest,
)


def test_conv_7x7_s2_p3_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 33, 33, 3)).astype(np.float32)  # odd size on purpose
    w = rng.normal(size=(7, 7, 3, 8)).astype(np.float32) * 0.1

    conv = fnn.Conv(8, (7, 7), strides=2, padding=3, use_bias=False)
    params = {"params": {"kernel": jnp.array(w)}}
    ours = np.asarray(conv.apply(params, jnp.array(x)))

    tw = torch.tensor(w).permute(3, 2, 0, 1)  # HWIO -> OIHW
    ref = F.conv2d(torch.tensor(x).permute(0, 3, 1, 2), tw, stride=2, padding=3)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_maxpool_3x3_s2_p1_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    ours = np.asarray(max_pool_3x3_s2(jnp.array(x)))
    ref = F.max_pool2d(torch.tensor(x).permute(0, 3, 1, 2), 3, 2, 1)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_batchnorm_matches_torch_train_and_eval():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    gamma = rng.normal(size=(3,)).astype(np.float32)
    beta = rng.normal(size=(3,)).astype(np.float32)

    bn = fnn.BatchNorm(momentum=0.9, epsilon=1e-5)
    variables = {
        "params": {"scale": jnp.array(gamma), "bias": jnp.array(beta)},
        "batch_stats": {"mean": jnp.zeros(3), "var": jnp.ones(3)},
    }
    out_train, mutated = bn.apply(variables, jnp.array(x),
                                  use_running_average=False,
                                  mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(gamma))
        tbn.bias.copy_(torch.tensor(beta))
    tbn.train()
    ref_train = tbn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out_train), ref_train.detach().numpy(),
                               rtol=1e-4, atol=1e-4)
    # Running stats update: torch uses unbiased var for the running estimate.
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)

    tbn.eval()
    ref_eval = tbn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    out_eval = bn.apply(
        {"params": variables["params"],
         "batch_stats": mutated["batch_stats"]},
        jnp.array(x), use_running_average=True)
    np.testing.assert_allclose(np.asarray(out_eval), ref_eval.detach().numpy(),
                               rtol=1e-3, atol=1e-3)


def test_upsample_semantics_match_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 5, 5, 2)).astype(np.float32)
    ours_n = np.asarray(upsample_nearest(jnp.array(x), 2))
    ref_n = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2), scale_factor=2)
    np.testing.assert_allclose(ours_n, ref_n.permute(0, 2, 3, 1).numpy(), atol=1e-6)

    ours_b = np.asarray(upsample_bilinear(jnp.array(x), 4))
    ref_b = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2), scale_factor=4,
                          mode="bilinear", align_corners=False)
    np.testing.assert_allclose(ours_b, ref_b.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def torch_mhsa(x, wqkv, wout, bout, dim, heads, dim_head):
    """Oracle mirroring help_funcs.py:117-151 semantics."""
    import einops

    qkv = x @ wqkv.T
    q, k, v = qkv.chunk(3, dim=-1)
    q, k, v = (einops.rearrange(t, "b n (h d) -> b h n d", h=heads) for t in (q, k, v))
    dots = torch.einsum("bhid,bhjd->bhij", q, k) * dim ** -0.5
    attn = dots.softmax(dim=-1)
    out = torch.einsum("bhij,bhjd->bhid", attn, v)
    out = einops.rearrange(out, "b h n d -> b n (h d)")
    return out @ wout.T + bout


def test_mhsa_matches_reference_math():
    dim, heads, dim_head, n = 32, 8, 64, 8
    inner = heads * dim_head
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, n, dim)).astype(np.float32)
    wqkv = (rng.normal(size=(inner * 3, dim)) * 0.05).astype(np.float32)
    wout = (rng.normal(size=(dim, inner)) * 0.05).astype(np.float32)
    bout = rng.normal(size=(dim,)).astype(np.float32)

    mod = MultiHeadSelfAttention(dim=dim, heads=heads, dim_head=dim_head)
    params = {"params": {
        "to_qkv": {"kernel": jnp.array(wqkv.T)},
        "to_out": {"kernel": jnp.array(wout.T), "bias": jnp.array(bout)},
    }}
    ours = np.asarray(mod.apply(params, jnp.array(x)))
    ref = torch_mhsa(torch.tensor(x), torch.tensor(wqkv), torch.tensor(wout),
                     torch.tensor(bout), dim, heads, dim_head).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_cross_attention_no_softmax_mode():
    mod = CrossAttention(dim=16, heads=2, dim_head=8, softmax=False)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 6, 16))
    m = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16))
    params = mod.init(key, x, m)
    out = mod.apply(params, x, m)
    assert out.shape == (1, 6, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_semantic_tokenizer_math():
    """tokens = softmax-over-pixels(conv1x1 logits)^T @ features
    (networks.py:312-319)."""
    rng = np.random.default_rng(5)
    b, h, w, c, L = 2, 4, 4, 8, 3
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)
    wk = rng.normal(size=(1, 1, c, L)).astype(np.float32)

    mod = SemanticTokenizer(token_len=L)
    params = {"params": {"conv_token": {"kernel": jnp.array(wk)}}}
    tokens = np.asarray(mod.apply(params, jnp.array(x)))

    logits = (x.reshape(b, h * w, c) @ wk[0, 0])  # (b, n, L)
    att = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    expected = np.einsum("bnl,bnc->blc", att, x.reshape(b, h * w, c))
    np.testing.assert_allclose(tokens, expected, rtol=1e-4, atol=1e-5)
    assert tokens.shape == (b, L, c)


def test_decoder_shares_prenorm_layer_params():
    """PreNorm2 quirk: one LayerNorm per decoder layer normalizes both
    query and memory (help_funcs.py:43-49)."""
    from dahitra_tpu.nn import TransformerDecoder

    mod = TransformerDecoder(dim=16, depth=2, heads=2, dim_head=8, mlp_dim=16)
    x = jnp.zeros((1, 5, 16))
    m = jnp.zeros((1, 3, 16))
    params = mod.init(jax.random.PRNGKey(0), x, m)["params"]
    # Exactly one attn_norm per layer (not separate norms for x and m).
    assert set(k for k in params if k.startswith("attn_norm")) == {
        "attn_norm_0", "attn_norm_1"}


def test_transformer_encoder_shapes():
    mod = TransformerEncoder(dim=32, depth=2, heads=8, dim_head=64, mlp_dim=64)
    x = jnp.zeros((2, 8, 32))
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (2, 8, 32)


def test_phase_upconv_matches_upsample_conv():
    """PhaseUpConv is an exact rewrite of relu(conv3x3(nearest_up2(x)))
    (networks.py:1330-1351): fused phase-space path == naive path == a plain
    nn.Conv on the materialized upsample, for odd/even sizes and bias."""
    import flax.linen as nn

    from dahitra_tpu.nn.blocks import PhaseUpConv, upsample_nearest

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(24, (3, 3), padding=1, name="c")(upsample_nearest(x, 2))
            return nn.relu(y)

    for h, w in ((16, 16), (7, 9)):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, 13))
        mod = PhaseUpConv(24)
        v = mod.init(jax.random.PRNGKey(2), x)
        # make bias nonzero so its tiling is exercised
        v = {"params": {"kernel": v["params"]["kernel"],
                        "bias": jnp.arange(24, dtype=jnp.float32) * 0.1}}
        got = mod.apply(v, x)
        naive = PhaseUpConv(24, fused=False).apply(v, x)
        want = Ref().apply({"params": {"c": v["params"]}}, x)
        assert got.shape == (2, 2 * h, 2 * w, 24)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(naive), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_max_pool_3x3_s2_value_and_grad():
    """Pool forward == reduce_window semantics; gradient is finite and
    routes to window maxima (tie-free input)."""
    from dahitra_tpu.nn.blocks import max_pool_3x3_s2, max_pool_2x2

    rng = np.random.default_rng(0)
    # distinct values -> no ties -> both gradient conventions agree
    x = jnp.array(rng.permutation(2 * 9 * 7 * 3).reshape(2, 9, 7, 3)
                  .astype(np.float32))

    def rw(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))

    np.testing.assert_array_equal(np.asarray(max_pool_3x3_s2(x)),
                                  np.asarray(rw(x)))
    g = jax.grad(lambda t: jnp.sum(max_pool_3x3_s2(t) ** 2))(x)
    g_ref = jax.grad(lambda t: jnp.sum(rw(t) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-6)

    x2 = jnp.array(rng.permutation(2 * 8 * 8 * 3).reshape(2, 8, 8, 3)
                   .astype(np.float32))
    want = jax.lax.reduce_window(x2, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")
    np.testing.assert_array_equal(np.asarray(max_pool_2x2(x2)),
                                  np.asarray(want))


def test_max_pool_2x2_odd_dims_floor_like_torch():
    """torch F.max_pool2d(2,2) floors odd H/W (partial windows dropped)."""
    from dahitra_tpu.nn.blocks import max_pool_2x2

    rng = np.random.default_rng(3)
    x = jnp.array(rng.normal(size=(2, 9, 7, 3)).astype(np.float32))
    got = max_pool_2x2(x)
    assert got.shape == (2, 4, 3, 3)
    want = jax.lax.reduce_window(x[:, :8, :6, :], -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cross_attention_divergent_head_logits_finite():
    """The reassociated path's per-head max shift: one head's logits sitting
    ~200 below another head's must not underflow its softmax to 0/0=NaN."""
    dim, heads, dim_head, n_kv, n = 32, 2, 16, 4, 64
    mod = CrossAttention(dim=dim, heads=heads, dim_head=dim_head)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, n, dim))
    m = jax.random.normal(jax.random.PRNGKey(1), (1, n_kv, dim))
    params = mod.init(key, x, m)
    # Scale head 0's query projection so its logits dwarf head 1's.
    wq = np.asarray(params["params"]["to_q"]["kernel"]).copy()
    wq[:, : heads * dim_head // 2] *= 3000.0
    params = {"params": {**params["params"],
                         "to_q": {"kernel": jnp.asarray(wq)}}}
    out = mod.apply(params, x, m)
    assert np.isfinite(np.asarray(out)).all()
    # And it must agree with the standard per-head softmax formulation.
    q = (x @ wq).reshape(1, n, heads, dim_head).transpose(0, 2, 1, 3)
    k = np.asarray(m @ params["params"]["to_k"]["kernel"]).reshape(
        1, n_kv, heads, dim_head).transpose(0, 2, 1, 3)
    v = np.asarray(m @ params["params"]["to_v"]["kernel"]).reshape(
        1, n_kv, heads, dim_head).transpose(0, 2, 1, 3)
    dots = np.einsum("bhid,bhjd->bhij", np.asarray(q), k) * dim ** -0.5
    attn = jax.nn.softmax(jnp.asarray(dots), axis=-1)
    ctx = np.einsum("bhij,bhjd->bhid", np.asarray(attn), v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(1, n, heads * dim_head)
    want = (ctx @ np.asarray(params["params"]["to_out"]["kernel"])
            + np.asarray(params["params"]["to_out"]["bias"]))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=2e-3)


def test_stem_s2d_matches_plain_conv7x7():
    """ResNetTrunk's space-to-depth stem rewrite == the plain 7x7/s2/p3
    conv (resnet.py conv1), to fp32 reassociation. Odd input dims take the
    plain path (same module, so only shape coverage matters there)."""
    from dahitra_tpu.nn.resnet import ResNetTrunk, _STEM_TAPS

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    trunk = ResNetTrunk(backbone="resnet18", s2d_stem=True)
    v = trunk.init(jax.random.PRNGKey(0), x, False,
                   method=lambda m, a, t: m.stem_preact(a, t))
    k = jnp.asarray(v["params"]["conv1"]["kernel"])
    got = trunk.apply(v, x, method=ResNetTrunk._stem_conv)
    want = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # every 7x7 tap is mapped exactly once
    assert _STEM_TAPS.sum() == 7.0 and (_STEM_TAPS.sum(axis=(0, 1)) == 1).all()
