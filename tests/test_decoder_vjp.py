"""decoder_vjp.decoder_stack: forward and hand-written backward must match
jax autodiff of the flax TransformerDecoder plain path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahitra_tpu.nn.blocks import TransformerDecoder
from dahitra_tpu.nn.decoder_vjp import decoder_stack
from dahitra_tpu.pallas.fused_decoder import pack_decoder_params


def _setup(dtype, b=2, n=64, dim=32, depth=3, heads=4, l=4, dim_head=16,
           seed=0):
    dec = TransformerDecoder(dim=dim, depth=depth, heads=heads,
                             dim_head=dim_head, mlp_dim=dim, dtype=dtype)
    key = jax.random.PRNGKey(seed)
    kx, km, kp = jax.random.split(key, 3)
    x = jax.random.normal(kx, (b, n, dim), dtype)
    m = jax.random.normal(km, (b, l, dim), dtype)
    params = dec.init(kp, x, m)
    packed = pack_decoder_params(params["params"], depth)
    return dec, params, packed, x, m


@pytest.mark.parametrize("dtype,ftol,gtol", [
    (jnp.float32, 1e-5, 1e-4),
    (jnp.bfloat16, 2e-2, 6e-2),
])
def test_forward_and_grads_match_autodiff(dtype, ftol, gtol):
    depth, heads = 3, 4
    dec, params, packed, x, m = _setup(dtype, depth=depth, heads=heads)

    out_ref = dec.apply(params, x, m)
    out_new = decoder_stack(x, m, packed, depth, heads, dtype)
    # Scale-normalized compare: in bf16 the module path reconstructs
    # w_out as to_out(eye)-b_out (one extra bf16 rounding vs using the
    # kernel directly), so outputs differ by a few ULPs after depth layers.
    sc_f = max(np.abs(np.asarray(out_ref, np.float32)).max(), 1e-3)
    np.testing.assert_allclose(np.asarray(out_new, np.float32) / sc_f,
                               np.asarray(out_ref, np.float32) / sc_f,
                               rtol=ftol, atol=ftol)

    # One scalar loss; compare grads wrt x, m and every packed param.
    def loss_ref(p, x_, m_):
        o = dec.apply(p, x_, m_)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    def loss_new(pk, x_, m_):
        o = decoder_stack(x_, m_, pk, depth, heads, dtype)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    gp_ref, gx_ref, gm_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        params, x, m)
    gp_new, gx_new, gm_new = jax.grad(loss_new, argnums=(0, 1, 2))(
        packed, x, m)

    def cmp(a, b, name):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        sc = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / sc, b / sc, rtol=gtol, atol=gtol,
                                   err_msg=name)

    cmp(gx_new, gx_ref, "dx")
    cmp(gm_new, gm_ref, "dm")
    gp_ref_packed = pack_decoder_params(gp_ref["params"], depth)
    for k in packed:
        cmp(gp_new[k], gp_ref_packed[k], k)


def test_divergent_head_logits_grads_finite():
    """Per-head max shift in fwd AND a finite softmax backward when one
    head's logits dwarf another's."""
    depth, heads = 2, 2
    dec, params, packed, x, m = _setup(jnp.float32, depth=depth, heads=heads,
                                       dim_head=16)
    packed = dict(packed)
    packed["wq"] = packed["wq"] * 2000.0

    def loss(pk, x_):
        return jnp.sum(decoder_stack(x_, m, pk, depth, heads, jnp.float32))

    val, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(packed, x)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves((gp, gx)):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("n", [256, 320])
def test_chunked_auto_matches_plain(n):
    """decoder_stack_auto's n-axis chunking is exact: values and gradients
    equal the single-call stack (thresholds shrunk so tiny CPU shapes
    chunk). n=256 splits evenly into two 128-token chunks; n=320 leaves a
    ragged 64-token tail chunk (the real-model shapes are 128-multiples,
    but the slicing must stay exact regardless)."""
    from dahitra_tpu.nn.decoder_vjp import decoder_stack_auto

    depth, heads = 3, 4
    dec, params, packed, x, m = _setup(jnp.float32, b=2, n=n, depth=depth,
                                       heads=heads)

    def loss_plain(x_, m_, pk):
        return jnp.mean(decoder_stack(x_, m_, pk, depth, heads,
                                      jnp.float32) ** 2)

    def loss_chunk(x_, m_, pk):
        o = decoder_stack_auto(x_, m_, pk, depth, heads, jnp.float32,
                               trigger_rows=256, target_rows=256)
        return jnp.mean(o ** 2)

    o_p = decoder_stack(x, m, packed, depth, heads, jnp.float32)
    o_c = decoder_stack_auto(x, m, packed, depth, heads, jnp.float32,
                             trigger_rows=256, target_rows=256)
    # b=2, n=256 -> 512 rows > 256 trigger; chunk = max(128, 256//2) = 128,
    # so two chunks actually run.
    np.testing.assert_allclose(np.asarray(o_c), np.asarray(o_p), rtol=1e-6,
                               atol=1e-6)

    gp = jax.grad(loss_plain, argnums=(0, 1, 2))(x, m, packed)
    gc = jax.grad(loss_chunk, argnums=(0, 1, 2))(x, m, packed)
    for a, b_ in zip(jax.tree_util.tree_leaves(gp),
                     jax.tree_util.tree_leaves(gc)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=1e-5,
                                   atol=1e-6)
