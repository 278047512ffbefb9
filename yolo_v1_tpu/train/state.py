"""Train state: params + BN batch stats + SGD(momentum) optimizer.

The reference trains with ``torch.optim.SGD(momentum=0.99)`` (train.py:84)
or optionally Adam (train.py:88); both are available here via optax with the
same semantics (optax's trace == torch's momentum buffer).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import core, struct


class TrainState(struct.PyTreeNode):
    """Functional train state (params, BN stats, optimizer state, step)."""

    step: jax.Array
    apply_fn: Callable = struct.field(pytree_node=False)
    params: core.FrozenDict[str, Any] = struct.field(pytree_node=True)
    batch_stats: core.FrozenDict[str, Any] = struct.field(pytree_node=True)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    opt_state: optax.OptState = struct.field(pytree_node=True)

    def apply_gradients(self, *, grads, batch_stats, **kwargs):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=batch_stats,
            opt_state=new_opt_state,
            **kwargs,
        )


def make_optimizer(
    schedule: Callable,
    optimizer: str = "sgd",
    momentum: float = 0.99,
    weight_decay: float = 0.0,
    adam_weight_decay: float = 1e-8,
) -> optax.GradientTransformation:
    """SGD(momentum=0.99) by default (train.py:84); 'adam' mirrors the
    reference's alternative (train.py:88, weight_decay=1e-8 as L2)."""
    if optimizer == "sgd":
        tx = optax.sgd(learning_rate=schedule, momentum=momentum)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
        return tx
    if optimizer == "adam":
        return optax.chain(
            optax.add_decayed_weights(adam_weight_decay),
            optax.adam(learning_rate=schedule),
        )
    raise ValueError(f"unknown optimizer {optimizer!r}")


def create_train_state(
    model,
    rng: jax.Array,
    input_shape: tuple[int, ...],
    tx: optax.GradientTransformation,
) -> TrainState:
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
        opt_state=tx.init(variables["params"]),
    )
