"""Shared model building blocks (flax.linen, NHWC, mixed precision).

TPU-native conventions used across all backbones:

* NHWC activations (TPU conv layout) instead of the reference's NCHW — the
  reference has to ``permute(0,2,3,1)`` at the end
  (OriginResNet.py:189, OriginDenseNet.py:128); here the output is already
  [N, S, S, B*5+C].
* Convolutions run in ``dtype`` (bfloat16 by default at call sites) with
  float32 parameters; BatchNorm runs in float32 for stable statistics.
* The detection head mirrors the reference heads: 1x1 conv (no bias) to
  B*5+C channels, BatchNorm, sigmoid (OriginResNet.py:133-134, 186-189;
  OriginDenseNet.py:101-102, 124-128), with the sigmoid computed in float32.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def conv(
    features: int,
    kernel: int,
    stride: int = 1,
    groups: int = 1,
    dtype: Dtype = jnp.float32,
    name: str | None = None,
) -> nn.Conv:
    """Bias-free conv with 'same'-style explicit padding (torch semantics)."""
    pad = (kernel - 1) // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        feature_group_count=groups,
        use_bias=False,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def batch_norm(
    train: bool, name: str | None = None, dtype: Dtype = jnp.float32
) -> nn.BatchNorm:
    """BatchNorm matching torch defaults (eps 1e-5, running momentum 0.9).

    ``dtype`` sets the normalize-math precision (pass the model's compute
    dtype — bf16 normalization is ~25% faster end-to-end on v5e); the
    mean/var *statistics* are always computed in float32 regardless (flax
    forces float32 reductions), and scale/bias/running stats are stored
    float32.
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class DetectionHead(nn.Module):
    """YOLOv1 grid head: 1x1 conv -> BN -> sigmoid, output [N,S,S,B*5+C]."""

    B: int = 2
    num_classes: int = 20
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out_ch = self.B * 5 + self.num_classes
        x = conv(out_ch, 1, dtype=self.dtype, name="conv")(x)
        x = batch_norm(train, name="bn", dtype=self.dtype)(x)
        return nn.sigmoid(x.astype(jnp.float32))


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 max pool with pad 1 (reference stem pools)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
