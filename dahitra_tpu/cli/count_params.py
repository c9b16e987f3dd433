"""Trainable-parameter counter — the rebuild of get_epoch_data.py:14-24."""
from __future__ import annotations

from argparse import ArgumentParser

import jax
import jax.numpy as jnp

from dahitra_tpu.models.registry import define_g


def count(net_g: str, img_size: int = 64) -> int:
    model = define_g(net_g, img_size=img_size)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, img_size, img_size, 3))
    try:
        variables = jax.eval_shape(lambda: model.init(
            {"params": key, "dropout": key}, x, x, False))
    except TypeError:
        x6 = jnp.zeros((1, img_size, img_size, 6))
        variables = jax.eval_shape(lambda: model.init(
            {"params": key, "dropout": key}, x6, None, False))
    return sum(int(jnp.prod(jnp.array(p.shape)))
               for p in jax.tree.leaves(variables["params"]))


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("models", nargs="*",
                        default=["newUNetTrans", "base_transformer_pos_s4_dd8"])
    parser.add_argument("--img_size", default=64, type=int)
    args = parser.parse_args(argv)
    for name in args.models:
        try:
            n = count(name, args.img_size)
            print(f"{name}: {n:,} trainable parameters")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: failed ({e})")


if __name__ == "__main__":
    main()
