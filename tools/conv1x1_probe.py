"""Micro-probe: is a 1x1 stride-1 conv faster as an explicit dot on TPU?

The bs128 step trace ranks backward 1x1 convs (layer1/layer2, 112px/56px
planes) as the largest single ops at ~13 TF/s — far under MXU capability.
This times fwd+bwd of one such conv in both formulations on the real chip:

  conv : lax.conv_general_dilated NHWC x HWIO (what nn.Conv lowers to)
  dot  : reshape [N*H*W, Cin] @ [Cin, Cout] (same math, pure matmul)

Usage (TPU): python tools/conv1x1_probe.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def time_fwdbwd(fn, x, w, iters: int = 10) -> float:
    loss = lambda x, w: jnp.sum(fn(x, w).astype(jnp.float32) ** 2)
    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t0 = time.perf_counter()
    out = g(x, w)
    np.asarray(out[1][:1, :1])
    log(f"  compile+first: {time.perf_counter() - t0:.1f}s")

    def chain(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = g(x, w)
            x_, w_ = o  # keep inputs static; chain on output fetch only
        np.asarray(o[1][:1, :1])
        return time.perf_counter() - t0

    t1 = min(chain(1) for _ in range(2))
    tn = min(chain(iters + 1) for _ in range(2))
    return (tn - t1) / iters


def conv_fn(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def dot_fn(x, w):
    N, H, W, C = x.shape
    out = jnp.dot(x.reshape(N * H * W, C), w.reshape(C, -1))
    return out.reshape(N, H, W, -1)


def stem_probe() -> None:
    """Stem space-to-depth probe (ROADMAP bound ~2.5%; VERDICT r2 item 2):
    the 7x7-stride-2 stem conv on 3-channel 448px input vs the equivalent
    4x4-stride-1 conv on a 2x2 space-to-depth plane (12 dense channels —
    1.3x the FLOPs but no 3->8 channel padding on the MXU contraction).
    Includes the s2d reshape in the timed program."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (128, 448, 448, 3)), jnp.bfloat16)
    w7 = jnp.asarray(rng.normal(0, 0.05, (7, 7, 3, 64)), jnp.bfloat16)
    w4 = jnp.asarray(rng.normal(0, 0.05, (4, 4, 12, 64)), jnp.bfloat16)

    def stem_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def stem_s2d(x, w):
        n, h, ww, c = x.shape
        x = x.reshape(n, h // 2, 2, ww // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, ww // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    tc = time_fwdbwd(stem_conv, x, w7)
    ts = time_fwdbwd(stem_s2d, x, w4)
    log(
        f"stem 448px bs128: conv7x7s2 {tc * 1e3:.2f}ms  "
        f"s2d+conv4x4 {ts * 1e3:.2f}ms  speedup x{tc / ts:.2f}"
    )


def main() -> None:
    rng = np.random.default_rng(0)
    cases = [
        ("layer1 conv1 112px 256->64", (128, 112, 112, 256), 64),
        ("layer2 conv1 56px 512->128", (128, 56, 56, 512), 128),
        ("layer1 conv3 112px 64->256", (128, 112, 112, 64), 256),
    ]
    for name, xshape, cout in cases:
        cin = xshape[-1]
        x = jnp.asarray(rng.normal(0, 1, xshape), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (1, 1, cin, cout)), jnp.bfloat16)
        flops = 2 * np.prod(xshape) * cout * 3  # fwd + dgrad + wgrad
        tc = time_fwdbwd(conv_fn, x, w)
        td = time_fwdbwd(dot_fn, x, w)
        log(
            f"{name}: conv {tc * 1e3:.2f}ms ({flops / tc / 1e12:.0f} TF/s)  "
            f"dot {td * 1e3:.2f}ms ({flops / td / 1e12:.0f} TF/s)  "
            f"speedup x{tc / td:.2f}"
        )


if __name__ == "__main__":
    if "--stem" in sys.argv:
        stem_probe()
    else:
        main()
