"""Learning-rate schedule: per-iteration warmup + epoch-keyed steps.

Reproduces the reference policy (`/root/reference/train.py:22-32, 46-54`):

* ``warmming_up_policy``: LR starts at 0 and gains +1e-6 per iteration for
  the first 1000 iterations (reaching 1e-3);
* ``learning_rate_policy``: whenever the current epoch is a key of the
  adjust map, LR is pinned to the map value for that whole epoch, and stays
  there until the next key.  Reference map: {1: 1e-3, 75: 1e-4, 115: 1e-5}
  (train.py:46-54 — the conflict markers offer 115 vs 100; we default to
  115, the HEAD side, and the map is configurable anyway).

Expressed as a closed-form function of the global step so it jits cleanly
(the reference mutates a Python float every iteration).  During epoch 0 the
linear warmup applies; from the first mapped epoch onward the step values
apply.  (The reference would also keep incrementing an unmapped epoch's LR
while iter <= 1000; with the real dataset, warmup always completes inside
epoch 0 — 16,551 imgs / bs 16 > 1000 iters — so the closed form is
equivalent in practice.)
"""

from __future__ import annotations

from typing import Callable, Mapping

import jax.numpy as jnp

DEFAULT_LR_MAP: dict[int, float] = {1: 1e-3, 75: 1e-4, 115: 1e-5}


def make_lr_schedule(
    steps_per_epoch: int,
    warmup_increment: float = 1e-6,
    warmup_iters: int = 1000,
    epoch_lr_map: Mapping[int, float] | None = None,
) -> Callable:
    """Return ``lr(step) -> float`` implementing warmup + epoch steps."""
    if epoch_lr_map is None:
        epoch_lr_map = DEFAULT_LR_MAP
    keys = sorted(epoch_lr_map)
    boundaries = jnp.asarray(keys, jnp.int32)
    values = jnp.asarray([epoch_lr_map[k] for k in keys], jnp.float32)

    def schedule(step):
        step = jnp.asarray(step)
        epoch = step // steps_per_epoch
        # Reference increments before use: iteration 1 runs at 1e-6
        # (train.py:22-25 applied at train.py:158 with train_iter += 1 first).
        warm = jnp.minimum(step + 1, warmup_iters).astype(jnp.float32) * (
            warmup_increment
        )
        idx = jnp.sum(epoch >= boundaries) - 1
        stepped = values[jnp.clip(idx, 0, len(keys) - 1)]
        return jnp.where(epoch < boundaries[0], warm, stepped)

    return schedule
