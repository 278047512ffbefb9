"""Reusable synthetic fixtures.

``make_eval_tensor`` is the reference's one reusable synthetic fixture
(`/root/reference/utils/utils.py:77-92`): a random sparse prediction grid
paired with a random binary-confidence target grid, used by the loss smoke
tests and the A/B loss harness (v1Loss.py:121-150, tensor_test.py:242-253).
Here it is deterministic via a jax PRNG key instead of global random state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def make_eval_tensor(
    key: Array,
    batch_size: int,
    S: int,
    B: int = 2,
    C: int = 20,
    pred_conf_density: float = 0.5,
    target_obj_density: float = 0.7,
) -> tuple[Array, Array]:
    """Random (pred, target) grid pair in the conf-first layout.

    Matches the reference fixture's structure: confidences are sparsely
    populated (pred with uniform values, target with exact 1.0 — the
    encoder's object marker), box slots are uniform random, class channels
    are zero (utils/utils.py:78-88).
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    shape = (batch_size, S, S, B)
    pred_conf = jnp.where(
        jax.random.uniform(k1, shape) < pred_conf_density,
        jax.random.uniform(k2, shape),
        0.0,
    )
    tgt_conf = jnp.where(
        jax.random.uniform(k3, shape) < target_obj_density, 1.0, 0.0
    )
    pred_boxes = jax.random.uniform(k4, (batch_size, S, S, 4 * B))
    tgt_boxes = jax.random.uniform(k5, (batch_size, S, S, 4 * B))
    cls = jnp.zeros((batch_size, S, S, C))
    pred = jnp.concatenate([pred_conf, pred_boxes, cls], axis=-1)
    target = jnp.concatenate([tgt_conf, tgt_boxes, cls], axis=-1)
    return pred, target
