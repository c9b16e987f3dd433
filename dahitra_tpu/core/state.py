"""Train-state pytree: params + BN running stats + optimizer state.

Replaces the reference's mutable nn.Module/optimizer/scheduler triple
(models/trainer.py:29-47) with one functional pytree that jit donates
through the step function.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables: dict, tx: optax.GradientTransformation):
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return cls(
            step=jax.numpy.zeros((), jax.numpy.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
        )

    @property
    def model_variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v
