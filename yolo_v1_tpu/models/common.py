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

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


# Optional matmul lowering for 1x1 convs (Conv1x1Dot below) — measured
# NEGATIVE in the full train step, default off.  Isolated on v5e at bs128
# (tools/conv1x1_probe.py, fwd+bwd) the dot formulation is 1.64x faster
# than conv_general_dilated on >=512-input-channel shapes (layer2-style
# 512->128 @56px: 39 -> 64 TF/s) and neutral on the bandwidth-bound early
# shapes; but the FULL bs128 train step regresses 216.6 -> 223.3 ms
# (591 -> 573 img/s): the reshape to [N*H*W, C] is a fusion boundary, so
# the residual adds / BN / relu that XLA folds into conv epilogues get
# materialized separately, costing more than the matmul saves.  Kept
# selectable for future layouts; params are identical so checkpoints are
# interchangeable either way.
CONV1X1_DOT = False


class Conv1x1Dot(nn.Conv):
    """A 1x1 bias-free conv computed as one [N*H*W, Cin] @ [Cin, F] matmul.

    Same parameter name/shape as ``nn.Conv`` (``kernel`` [1,1,Cin,F]), so
    checkpoints, the torch importer, and the int8 interceptor (which
    matches ``isinstance(m, nn.Conv)`` and re-lowers the op itself) all see
    an ordinary conv.  A stride just subsamples the input plane first —
    for a 1x1 window the two are exactly the same computation.  XLA lowers
    the dot (and its transposes in the backward pass) straight onto the
    MXU without the conv path's layout conversions.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert not self.use_bias and self.feature_group_count == 1
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (1, 1, x.shape[-1], self.features),
            self.param_dtype,
        )
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        s = self.strides
        sh, sw = s if isinstance(s, (tuple, list)) else (s or 1, s or 1)
        if sh != 1 or sw != 1:
            x = x[:, ::sh, ::sw, :]
        n, h, w, c = x.shape
        out = jnp.dot(x.reshape(n * h * w, c), kernel.reshape(c, -1))
        return out.reshape(n, h, w, self.features)


def conv(
    features: int,
    kernel: int,
    stride: int = 1,
    groups: int = 1,
    dtype: Dtype = jnp.float32,
    name: str | None = None,
) -> nn.Conv:
    """Bias-free conv with 'same'-style explicit padding (torch semantics).

    1x1 ungrouped convs use the ``Conv1x1Dot`` matmul lowering (see the
    ``CONV1X1_DOT`` note above)."""
    pad = (kernel - 1) // 2
    cls = Conv1x1Dot if (kernel == 1 and groups == 1 and CONV1X1_DOT) else nn.Conv
    return cls(
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


class BNScaleShift(nn.Module):
    """BatchNorm that RETURNS the per-channel affine ``(scale, shift)``
    instead of applying it — so a Pallas fused epilogue can apply the
    normalization together with the residual add + ReLU in one pass
    (``ops/pallas/fused_epilogue``; measured 2.4x over XLA's own fusion
    of the chain at the layer1 block-exit shape, tools/
    fused_epilogue_probe.py).

    Parameter/stat names and semantics match ``nn.BatchNorm`` exactly
    (params ``scale``/``bias``, batch_stats ``mean``/``var``, momentum
    0.9, eps 1e-5, f32 statistics) — checkpoints, the torch importer and
    the int8 interceptor see an identical tree, so ``epilogue_impl`` is a
    pure compute-path switch.  Gradients flow through the batch
    statistics like flax's composite BN (autodiff through the jnp
    mean/var; the fused kernel's custom VJP supplies the direct terms).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        C = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (C,),
            jnp.float32,
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (C,),
            jnp.float32,
        )
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        scale = gamma * jax.lax.rsqrt(var + self.epsilon)
        shift = beta - mean * scale
        return scale, shift


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
