"""DenseNet-BC backbones with YOLOv1 detection heads (flax.linen, NHWC).

Capability parity with `/root/reference/backbones/OriginDenseNet.py`:

* stem: 7x7/2 conv + BN + ReLU + 3x3/2 max pool (:76-81);
* dense blocks of BN-ReLU-1x1(bn_size*k)-BN-ReLU-3x3(k) layers with channel
  concatenation (:19-36), transitions of BN-ReLU-1x1(half)-avgpool2 between
  blocks (:47-54), final BN (:96);
* detection head: 1x1 conv to B*5+C + BN + sigmoid (:101-102, 124-128);
* **S == 7 uses a FIVE-block config (6,12,24,16,16)** — the extra block adds
  a fourth transition/pool, taking the map from 14x14 to 7x7; S == 14 uses
  the standard four-block config (:159-161).
* constructors densenet121/169/201/161.

Deliberate divergence: the reference hard-codes the head input to 1024
channels (:101), which crashes densenet161 (2208 features); here the head
consumes the actual feature width.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolo_v1_tpu.models.common import DetectionHead, batch_norm, conv, max_pool_3x3_s2

Dtype = Any


class DenseLayer(nn.Module):
    """BN-ReLU-1x1 bottleneck, BN-ReLU-3x3 growth; concatenates its input."""

    growth_rate: int
    bn_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = batch_norm(train, name="norm1", dtype=self.dtype)(x)
        out = nn.relu(out).astype(self.dtype)
        out = conv(self.bn_size * self.growth_rate, 1, dtype=self.dtype, name="conv1")(out)
        out = batch_norm(train, name="norm2", dtype=self.dtype)(out)
        out = nn.relu(out).astype(self.dtype)
        out = conv(self.growth_rate, 3, dtype=self.dtype, name="conv2")(out)
        return jnp.concatenate([x, out.astype(x.dtype)], axis=-1)


class Transition(nn.Module):
    """BN-ReLU-1x1(out) + 2x2 average pool (OriginDenseNet.py:47-54)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = batch_norm(train, name="norm", dtype=self.dtype)(x)
        x = nn.relu(x).astype(self.dtype)
        x = conv(self.features, 1, dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    """DenseNet detector: image [N,448,448,3] -> grid [N,S,S,B*5+C]."""

    block_config: Sequence[int]
    growth_rate: int = 32
    num_init_features: int = 64
    bn_size: int = 4
    B: int = 2
    num_classes: int = 20
    dtype: Dtype = jnp.bfloat16
    # jax.checkpoint each dense layer in the backward pass (memory saver).
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        layer_cls = (
            nn.remat(DenseLayer, static_argnums=(2,)) if self.remat else DenseLayer
        )
        x = x.astype(self.dtype)
        x = conv(self.num_init_features, 7, 2, dtype=self.dtype, name="conv0")(x)
        x = batch_norm(train, name="norm0", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            for j in range(num_layers):
                x = layer_cls(
                    self.growth_rate,
                    self.bn_size,
                    dtype=self.dtype,
                    name=f"block{i + 1}_layer{j + 1}",
                )(x, train)
            num_features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                num_features //= 2
                x = Transition(
                    num_features, dtype=self.dtype, name=f"transition{i + 1}"
                )(x, train)
        x = batch_norm(train, name="norm5", dtype=self.dtype)(x)
        x = nn.relu(x).astype(self.dtype)
        return DetectionHead(
            self.B, self.num_classes, dtype=self.dtype, name="head"
        )(x, train)


def _ctor(block_config_s14, growth_rate=32, num_init_features=64):
    def build(
        S: int = 7, B: int = 2, num_classes: int = 20, dtype=jnp.bfloat16,
        remat: bool = False,
    ):
        assert S in (7, 14), "S must be 7 or 14 (OriginDenseNet.py:155-157)"
        cfg = tuple(block_config_s14)
        if S == 7:
            # Five-block S=7 config (OriginDenseNet.py:159): append a block
            # repeating the last size, adding one more transition/pool.
            cfg = cfg + (cfg[-1],)
        return DenseNet(
            block_config=cfg,
            growth_rate=growth_rate,
            num_init_features=num_init_features,
            B=B,
            num_classes=num_classes,
            dtype=dtype,
            remat=remat,
        )

    return build


densenet121 = _ctor([6, 12, 24, 16])
densenet169 = _ctor([6, 12, 32, 32])
densenet201 = _ctor([6, 12, 48, 32])
densenet161 = _ctor([6, 12, 36, 24], growth_rate=48, num_init_features=96)
