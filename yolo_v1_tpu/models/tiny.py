"""TinyNet — a miniature detector for tests, CI, and schedule debugging.

Not in the reference (its smallest runnable net is ResNet-18); exists so the
full train/eval/checkpoint stack can be exercised end-to-end on CPU in
seconds.  Same contract as the real backbones: image [N, 16*S, 16*S, 3] ->
grid [N, S, S, B*5+C] through the shared sigmoid detection head.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from yolo_v1_tpu.models.common import DetectionHead, batch_norm, conv


class TinyNet(nn.Module):
    S: int = 7
    B: int = 2
    num_classes: int = 20
    width: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i in range(4):
            x = conv(self.width * (2**i), 3, 2, dtype=self.dtype, name=f"conv{i}")(x)
            x = batch_norm(train, name=f"bn{i}", dtype=self.dtype)(x)
            x = nn.relu(x)
        assert x.shape[1] == self.S and x.shape[2] == self.S, (
            f"TinyNet expects input of size 16*S; got spatial {x.shape[1:3]} "
            f"for S={self.S}"
        )
        return DetectionHead(
            self.B, self.num_classes, dtype=self.dtype, name="head"
        )(x, train)


def tiny(
    S: int = 7, B: int = 2, num_classes: int = 20, dtype=jnp.float32,
    remat: bool = False,
):
    if remat:
        raise ValueError("TinyNet is too small for remat to be meaningful")
    return TinyNet(S=S, B=B, num_classes=num_classes, dtype=dtype)
