"""Model introspection — the analog of the reference's torchsummary call at
startup (`/root/reference/train.py:81`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def model_summary(model, input_shape: tuple[int, ...]) -> str:
    """Human-readable per-module parameter table + totals (flax tabulate)."""
    import flax.linen as nn

    return nn.tabulate(
        model,
        jax.random.PRNGKey(0),
        compute_flops=False,
        compute_vjp_flops=False,
        depth=1,
    )(jnp.zeros(input_shape, jnp.float32), train=False)


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def param_bytes(params) -> int:
    return sum(int(x.size * x.dtype.itemsize) for x in jax.tree.leaves(params))
