"""Pallas fused-decoder parity vs the flax TransformerDecoder (interpret
mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahitra_tpu.nn import TransformerDecoder
from dahitra_tpu.pallas.fused_decoder import (fused_transformer_decoder,

                                              pack_decoder_params)


pytestmark = pytest.mark.slow  # compile-heavy


@pytest.mark.parametrize("depth,heads,dim_head", [(2, 4, 64), (4, 8, 64)])
def test_fused_decoder_matches_flax(depth, heads, dim_head, monkeypatch):
    # Interpret mode: the kernel runs as pure JAX on CPU.
    from jax.experimental import pallas as pl
    import dahitra_tpu.pallas.fused_decoder as fd

    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(fd.pl, "pallas_call", interp_call)

    dim, n, l, b = 32, 256, 4, 2
    module = TransformerDecoder(dim=dim, depth=depth, heads=heads,
                                dim_head=dim_head, mlp_dim=dim)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, n, dim), jnp.float32)
    m = jax.random.normal(jax.random.PRNGKey(1), (b, l, dim), jnp.float32)
    variables = module.init(key, x, m)
    expected = module.apply(variables, x, m)

    packed = pack_decoder_params(variables["params"], depth)
    got = fused_transformer_decoder(x, m, packed, depth=depth, heads=heads,
                                    tile=128, precise=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_fused_decoder_bf16_inputs(monkeypatch):
    from jax.experimental import pallas as pl
    import dahitra_tpu.pallas.fused_decoder as fd

    orig = pl.pallas_call
    monkeypatch.setattr(
        fd.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    dim, depth, heads = 32, 2, 4
    module = TransformerDecoder(dim=dim, depth=depth, heads=heads,
                                dim_head=64, mlp_dim=dim)
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 128, dim), jnp.bfloat16)
    m = jax.random.normal(jax.random.PRNGKey(3), (1, 4, dim), jnp.bfloat16)
    variables = module.init(key, x.astype(jnp.float32), m.astype(jnp.float32))
    packed = pack_decoder_params(variables["params"], depth)
    got = fused_transformer_decoder(x, m, packed, depth=depth, heads=heads,
                                    tile=128)
    assert got.dtype == jnp.bfloat16
    expected = module.apply(variables, x.astype(jnp.float32),
                            m.astype(jnp.float32))
    # bf16 MXU operands vs the fp32 flax reference: loose tolerance.
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(expected), rtol=5e-2, atol=5e-2)


def test_decoder_module_pallas_path_matches_plain(monkeypatch):
    """TransformerDecoder(pallas=True) routes through the fused kernel and
    matches the plain module path; gradients flow via the custom_vjp
    plain-stack backward."""
    from jax.experimental import pallas as pl
    import dahitra_tpu.pallas.fused_decoder as fd

    orig = pl.pallas_call
    monkeypatch.setattr(
        fd.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    dim, n, l, b, depth, heads = 32, 256, 4, 2, 3, 8
    plain = TransformerDecoder(dim=dim, depth=depth, heads=heads,
                               dim_head=64, mlp_dim=dim, pallas=False)
    fused = TransformerDecoder(dim=dim, depth=depth, heads=heads,
                               dim_head=64, mlp_dim=dim, pallas=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, n, dim), jnp.float32)
    m = jax.random.normal(jax.random.PRNGKey(1), (b, l, dim), jnp.float32)
    variables = plain.init(key, x, m)

    want = plain.apply(variables, x, m)
    got = fused.apply(variables, x, m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # gradient equality between paths (custom_vjp bwd = plain stack)
    def loss(mod, xx):
        return jnp.sum(mod.apply(variables, xx, m) ** 2)

    g_plain = jax.grad(lambda xx: loss(plain, xx))(x)
    g_fused = jax.grad(lambda xx: loss(fused, xx))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_plain),
                               rtol=2e-3, atol=2e-3)


def test_decoder_module_pallas_gates_off_unsupported_shapes():
    """Non-tileable n / no-softmax / wide memories fall back to plain."""
    dec = TransformerDecoder(dim=32, depth=1, heads=8, dim_head=64,
                             mlp_dim=32, pallas=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 100, 32))  # 100 not tileable
    m = jax.random.normal(key, (1, 4, 32))
    v = dec.init(key, x, m)
    out = dec.apply(v, x, m)  # must not raise
    assert out.shape == x.shape


def test_fused_tokenizer_matches_xla(monkeypatch):
    """Fused semantic tokenizer (interpret mode) vs the production math."""
    from jax.experimental import pallas as pl
    import dahitra_tpu.pallas.fused_tokenizer as ft

    orig = pl.pallas_call
    monkeypatch.setattr(
        ft.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    b, n, c, l = 3, 512, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (b, n, c), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (c, l), jnp.float32) * 0.1

    logits = x @ w
    attn = jax.nn.softmax(logits, axis=1)
    expected = jnp.einsum("bnl,bnc->blc", attn, x)

    got = ft.fused_semantic_tokenizer(x, w, precise=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_fused_tokenizer_bf16(monkeypatch):
    from jax.experimental import pallas as pl
    import dahitra_tpu.pallas.fused_tokenizer as ft

    orig = pl.pallas_call
    monkeypatch.setattr(
        ft.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    b, n, c, l = 2, 256, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(2), (b, n, c), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(3), (c, l), jnp.float32) * 0.1

    logits = (x @ w.astype(jnp.bfloat16)).astype(jnp.float32)
    attn = jax.nn.softmax(logits, axis=1).astype(jnp.bfloat16)
    expected = jnp.einsum("bnl,bnc->blc", attn, x)

    got = ft.fused_semantic_tokenizer(x, w)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expected, np.float32),
        rtol=5e-2, atol=5e-2)
