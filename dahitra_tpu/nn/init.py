"""Reference weight-initialization semantics (TPU-native replication).

Two init regimes exist in the reference:

* ``init_weights`` / ``init_net`` (models/networks.py:77-127): EVERY
  ``define_G`` model is post-initialized with ``init_type`` (default
  'normal', gain 0.02): Conv/Linear kernels ~ N(0, gain^2) (or
  xavier/kaiming/orthogonal), their biases = 0, BatchNorm2d scale ~
  N(1, gain^2) and bias = 0. LayerNorm modules and bare ``nn.Parameter``s
  (positional embeddings) are untouched. Because ``net.apply`` runs AFTER
  construction, this also overwrites pretrained trunks and the UNets' own
  ctor kaiming init — replicated faithfully here for the LEVIR stack
  (``init_weights_variables``).

* xBD zoo ``_initialize_weights`` (xBD_code/zoo/models.py:638-646 and the
  identical copies in every UNet class): called in the ctor BEFORE the
  torchvision encoder is attached, so kaiming_normal (a=0, fan_in ->
  std = sqrt(2/fan_in)) applies only to the decoder convs
  (conv6..conv10[_2]) and the ``res`` head; their biases are zeroed, BN
  scale/bias forced to 1/0 (the flax default already). Modules constructed
  after the encoder (ChannelAttention, SpatialAttention, transformer
  blocks) keep torch Conv defaults. Replicated as
  ``zoo_ctor_init_variables`` by matching those exact module names.

Torch fan conventions: for Conv2d, fan_in = in_ch * kh * kw; for
ConvTranspose2d torch computes fan_in from weight dim 1, i.e.
out_ch * kh * kw — matched via the module-name heuristic ("ConvTranspose"
in the flax path).
"""
from __future__ import annotations

import math
import re
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _torch_fans(shape: Tuple[int, ...], transpose: bool = False
                ) -> Tuple[int, int]:
    if len(shape) == 2:  # flax Dense kernel (in, out)
        return shape[0], shape[1]
    rf = int(np.prod(shape[:-2]))
    cin, cout = shape[-2], shape[-1]
    if transpose:
        return cout * rf, cin * rf
    return cin * rf, cout * rf


def _flatten_with_names(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)
    leaves = [(tuple(str(getattr(p, "key", p)) for p in path), leaf)
              for path, leaf in flat[0]]
    return leaves, flat[1]


def _bn_module_paths(variables) -> set:
    """Module paths that own batch statistics — exactly the BatchNorms."""
    bs = variables.get("batch_stats", {})
    leaves, _ = _flatten_with_names(bs)
    return {names[:-1] for names, _ in leaves}


def _orthogonal(key, shape, gain):
    """torch orthogonal_: flatten to (rows=out, cols=rest), QR, scale."""
    if len(shape) == 2:
        rows, cols = shape[1], shape[0]  # dense (in, out): out rows
    else:
        rows, cols = shape[-1], int(np.prod(shape[:-1]))
    mat = jax.nn.initializers.orthogonal(scale=gain, column_axis=-1)(
        key, (cols, rows), jnp.float32)
    if len(shape) == 2:
        return mat.reshape(shape)
    # (rf*cin, cout) -> (kh, kw, cin, cout)
    return mat.reshape(shape)


def init_weights_variables(variables: dict, key: jax.Array,
                           init_type: str = "normal",
                           init_gain: float = 0.02) -> dict:
    """The ``init_net`` post-init applied to every define_G model."""
    if init_type == "none":
        return variables
    bn_paths = _bn_module_paths(variables)
    leaves, treedef = _flatten_with_names(variables["params"])
    out = []
    for i, (names, leaf) in enumerate(leaves):
        k = jax.random.fold_in(key, i)
        mod, name = names[:-1], names[-1]
        v = leaf
        if mod in bn_paths:
            if name == "scale":
                v = 1.0 + init_gain * jax.random.normal(k, leaf.shape,
                                                        jnp.float32)
            elif name == "bias":
                v = jnp.zeros(leaf.shape, jnp.float32)
        elif name == "kernel" and leaf.ndim in (2, 4):
            transpose = any("ConvTranspose" in n for n in names)
            fan_in, fan_out = _torch_fans(leaf.shape, transpose)
            if init_type == "normal":
                v = init_gain * jax.random.normal(k, leaf.shape, jnp.float32)
            elif init_type == "xavier":
                std = init_gain * math.sqrt(2.0 / (fan_in + fan_out))
                v = std * jax.random.normal(k, leaf.shape, jnp.float32)
            elif init_type == "kaiming":
                std = math.sqrt(2.0 / fan_in)
                v = std * jax.random.normal(k, leaf.shape, jnp.float32)
            elif init_type == "orthogonal":
                v = _orthogonal(k, leaf.shape, init_gain)
            else:
                raise NotImplementedError(
                    f"initialization method [{init_type}] is not implemented")
        elif name == "bias" and leaf.ndim == 1:
            # Conv/Dense biases -> 0. LayerNorm biases are 0 already, so
            # sweeping them in is a no-op (torch leaves LN untouched).
            v = jnp.zeros(leaf.shape, jnp.float32)
        out.append(jnp.asarray(v, leaf.dtype))
    params = jax.tree_util.tree_unflatten(treedef, out)
    return {**variables, "params": params}


_ZOO_DECODER_RE = re.compile(r"^(conv(6|7|8|9|10)(_2)?|res)$")


def zoo_ctor_init_variables(variables: dict, key: jax.Array) -> dict:
    """The xBD zoo ctor kaiming init: decoder convs + res head only.

    A no-op for models without conv6..conv10/res modules (e.g. the xBD
    BASE_Transformer_UNet, which the reference leaves at torch defaults —
    model_transformer_encoding.py has no _initialize_weights).
    """
    leaves, treedef = _flatten_with_names(variables["params"])
    out = []
    for i, (names, leaf) in enumerate(leaves):
        v = leaf
        if any(_ZOO_DECODER_RE.match(n) for n in names):
            name = names[-1]
            if name == "kernel" and leaf.ndim in (2, 4):
                k = jax.random.fold_in(key, i)
                transpose = any("ConvTranspose" in n for n in names)
                fan_in, _ = _torch_fans(leaf.shape, transpose)
                std = math.sqrt(2.0 / fan_in)
                v = std * jax.random.normal(k, leaf.shape, jnp.float32)
            elif name == "bias" and leaf.ndim == 1:
                v = jnp.zeros(leaf.shape, jnp.float32)
        out.append(jnp.asarray(v, leaf.dtype))
    params = jax.tree_util.tree_unflatten(treedef, out)
    return {**variables, "params": params}
