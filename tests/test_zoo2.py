"""Second model-zoo wave: ChangeFormerV6, siamese UNets, xBD variants."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import flax.linen as fnn

from dahitra_tpu.models import available_models, define_g

pytestmark = pytest.mark.slow  # zoo/engine compile-heavy


def test_new_registry_keys():
    for key in ["changeFormerV6", "siamUnet_conc", "siamUnet", "xbd_dahitra",
                "xbd_res34_loc", "xbd_res34_double", "xbd_bit"]:
        assert key in available_models()


def test_changeformer_v6_multiscale_outputs():
    model = define_g("changeFormerV6")
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (1, 64, 64, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, False))(key, a, b)
    outs = model.apply(variables, a, b, False)
    # [p4, p3, p2, p1, full] (ChangeFormer.py:1558-1611).
    assert len(outs) == 5
    assert [o.shape[1] for o in outs] == [2, 4, 8, 16, 64]
    assert all(o.shape[-1] == 2 for o in outs)


def test_changeformer_v6_train_mode_runs():
    model = define_g("changeFormerV6")
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (2, 64, 64, 3))
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, True))(key, a, a)
    outs, mut = model.apply(variables, a, a, True,
                            mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(3)})
    assert len(outs) == 5
    assert np.isfinite(np.asarray(outs[-1])).all()


def test_changeformer_encoder_stage_dims():
    from dahitra_tpu.models.changeformer import EncoderTransformerV3

    enc = EncoderTransformerV3()
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda k, x: enc.init(k, x, False))(
        jax.random.PRNGKey(0), x)
    outs = enc.apply(variables, x, False)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 320), (1, 2, 2, 512)]


def test_sr_attention_matches_manual_math():
    """sr_ratio=1 path vs a hand-rolled torch oracle (ChangeFormer.py:336-358)."""
    from dahitra_tpu.models.changeformer import SRAttention

    dim, heads = 16, 2
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 4, 4, dim)).astype(np.float32)
    wq = (rng.normal(size=(dim, dim)) * 0.1).astype(np.float32)
    bq = rng.normal(size=(dim,)).astype(np.float32) * 0.1
    wkv = (rng.normal(size=(2 * dim, dim)) * 0.1).astype(np.float32)
    bkv = rng.normal(size=(2 * dim,)).astype(np.float32) * 0.1
    wp = (rng.normal(size=(dim, dim)) * 0.1).astype(np.float32)
    bp = rng.normal(size=(dim,)).astype(np.float32) * 0.1

    mod = SRAttention(dim=dim, num_heads=heads, sr_ratio=1)
    params = {"params": {
        "q": {"kernel": jnp.array(wq.T), "bias": jnp.array(bq)},
        "kv": {"kernel": jnp.array(wkv.T), "bias": jnp.array(bkv)},
        "proj": {"kernel": jnp.array(wp.T), "bias": jnp.array(bp)},
    }}
    ours = np.asarray(mod.apply(params, jnp.array(x)))

    xt = torch.tensor(x.reshape(1, 16, dim))
    B, N, C = xt.shape
    hd = C // heads
    q = (xt @ torch.tensor(wq).T + torch.tensor(bq)).reshape(B, N, heads, hd).permute(0, 2, 1, 3)
    kv = (xt @ torch.tensor(wkv).T + torch.tensor(bkv)).reshape(B, N, 2, heads, hd).permute(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B, N, C)
    ref = (out @ torch.tensor(wp).T + torch.tensor(bp)).numpy().reshape(1, 4, 4, dim)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_upsample_conv_x2_matches_torch():
    from dahitra_tpu.models.changeformer import UpsampleConvX2

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 6, 6, 3)).astype(np.float32)
    w = (rng.normal(size=(4, 4, 5, 3)) * 0.1).astype(np.float32)  # H W O I
    b = rng.normal(size=(5,)).astype(np.float32)
    mod = UpsampleConvX2(5)
    params = {"params": {"conv": {"kernel": jnp.array(w), "bias": jnp.array(b)}}}
    ours = np.asarray(mod.apply(params, jnp.array(x)))
    tw = torch.tensor(w).permute(3, 2, 0, 1)  # I O H W
    ref = F.conv_transpose2d(torch.tensor(x).permute(0, 3, 1, 2), tw,
                             torch.tensor(b), stride=2, padding=1)
    assert ours.shape == (1, 12, 12, 5)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


def test_siam_unet_conc_outputs_log_probs():
    model = define_g("siamUnet_conc")
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (1, 32, 32, 3))
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, False))(key, a, a)
    out = model.apply(variables, a, a, False)
    assert out.shape == (1, 32, 32, 2)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, atol=1e-5)


def test_res34_double_shared_core():
    model = define_g("xbd_res34_double")
    key = jax.random.PRNGKey(0)
    x6 = jax.random.normal(key, (1, 64, 64, 6))
    variables = jax.jit(lambda k, x: model.init(k, x, None, False))(key, x6)
    out = model.apply(variables, x6, None, False)
    assert out.shape == (1, 64, 64, 5)
    # The trunk is shared across dates: only one 'core' subtree.
    assert set(variables["params"].keys()) == {"core", "res"}


def test_changeformer_v1_output_shape():
    model = define_g("changeFormer")
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (1, 64, 64, 3))
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, False))(key, a, a)
    out = model.apply(variables, a, a, False)
    # Full-resolution single logits map (ChangeFormer.py:657-674).
    assert out.shape == (1, 64, 64, 2)
