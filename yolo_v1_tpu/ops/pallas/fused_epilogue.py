"""Pallas fused residual-block epilogue: y = relu(x*scale + shift + res).

The round-4 roofline appendix (docs/DESIGN.md) attributes part of the
measured-step vs summed-floor gap to the residual/BN elementwise chain
being materialized as separate HBM round-trips, and names "fusing the
residual/BN chain into conv epilogues beyond what XLA chooses" as the one
unmeasured MFU lever.  This module is that measurement's kernel: the
bottleneck's post-conv elementwise tail (BN normalize-apply with
precomputed per-channel scale/shift, residual add, ReLU) as ONE Pallas
pass over the activation, with a custom VJP whose data-gradient pass is
likewise a single kernel (dx = dy * scale * relu_mask, dres = dy *
relu_mask; the per-channel scale/shift gradients are XLA reductions over
the kernel's mask output).

``tools/fused_epilogue_probe.py`` times this against XLA's own fusion of
the identical chain at the ResNet layer1 shape on hardware; the result —
positive or negative — is recorded in docs/DESIGN.md.  The training model
only adopts the kernel if the probe measures a real win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl

ROWS_BLK = 1024  # flattened pixels per grid step (cap; see _call_rows)
# Per-tensor VMEM budget per block: the kernel holds x/res/y (+dy in the
# backward) double-buffered, so blk*C elements must stay well under the
# 16 MB VMEM — 128K f32 elements (0.5 MB) per tensor keeps the worst case
# (4 tensors x 2 buffers) at 4 MB.  At C=2048 (ResNet layer4/5 exits)
# this caps blk at 64 rows; an uncapped 1024-row block was a measured
# remote-compile failure at bs128.
MAX_BLK_ELEMS = 128 * 1024


def _fwd_kernel(x_ref, r_ref, s_ref, b_ref, y_ref):
    x = x_ref[...].astype(jnp.float32)
    r = r_ref[...].astype(jnp.float32)
    y = jnp.maximum(x * s_ref[...] + b_ref[...] + r, 0.0)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(dy_ref, y_ref, s_ref, dx_ref, dr_ref):
    mask = (y_ref[...].astype(jnp.float32) > 0.0).astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32) * mask
    dx_ref[...] = (dy * s_ref[...]).astype(dx_ref.dtype)
    dr_ref[...] = dy.astype(dr_ref.dtype)


def _flatten(x: Array) -> tuple[Array, tuple]:
    shape = x.shape
    return x.reshape(-1, shape[-1]), shape


def _call_rows(kernel, outs, *ins, interpret: bool):
    """Run an elementwise row kernel over [P, C] tensors; [C]-shaped
    per-channel vectors broadcast as (1, C) blocks."""
    P, C = ins[0].shape
    # Mosaic requires the block's sublane dim divisible by 8 OR equal to
    # the array dim.  Largest 8-multiple divisor of P under the VMEM cap
    # (e.g. 64 for the C=2048 14x14 maps at bs128: 25088 = 64*392);
    # small/odd P (the bs-1 init shapes: 196, 49) fall back to one
    # whole-array block, which Mosaic accepts at any size that fits VMEM.
    blk = min(ROWS_BLK, P, max(8, MAX_BLK_ELEMS // C))
    blk -= blk % 8
    while blk >= 8 and P % blk:
        blk -= 8
    if blk < 8 or P % blk:
        if P * C > 8 * MAX_BLK_ELEMS:  # 4 MB f32: give a real error, not
            raise ValueError(          # a Mosaic VMEM failure downstream
                f"fused_epilogue: no tileable block for P={P}, C={C}"
            )
        blk = P
    specs = []
    for a in ins:
        if a.ndim == 1:
            specs.append(pl.BlockSpec((1, C), lambda i: (0, 0)))
        else:
            specs.append(pl.BlockSpec((blk, C), lambda i: (i, 0)))
    return pl.pallas_call(
        kernel,
        grid=(P // blk,),
        in_specs=specs,
        out_specs=[pl.BlockSpec((blk, C), lambda i: (i, 0)) for _ in outs],
        out_shape=[jax.ShapeDtypeStruct((P, C), d) for d in outs],
        interpret=interpret,
    )(*[a[None, :] if a.ndim == 1 else a for a in ins])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_epilogue(
    x: Array,  # [..., C] conv output (bf16 or f32)
    res: Array,  # [..., C] residual branch
    scale: Array,  # [C] f32 (BN gamma / sqrt(var+eps), precomputed)
    shift: Array,  # [C] f32 (BN beta - mean*scale)
    interpret: bool = False,
) -> Array:
    """relu(x*scale + shift + res) as one Pallas pass (f32 math, x's dtype
    out)."""
    xf, shape = _flatten(x)
    rf, _ = _flatten(res)
    (y,) = _call_rows(
        _fwd_kernel, [x.dtype], xf, rf, scale.astype(jnp.float32),
        shift.astype(jnp.float32), interpret=interpret,
    )
    return y.reshape(shape)


def _fwd(x, res, scale, shift, interpret):
    y = fused_epilogue(x, res, scale, shift, interpret)
    return y, (y, x, scale)


def _bwd(interpret, saved, dy):
    y, x, scale = saved
    yf, shape = _flatten(y)
    dyf, _ = _flatten(dy)
    dx, dres = _call_rows(
        _bwd_kernel, [x.dtype, x.dtype], dyf, yf,
        scale.astype(jnp.float32), interpret=interpret,
    )
    # Per-channel grads: dscale = sum(dy_masked * x), dshift = sum(dy_masked)
    # — XLA reductions (tiny outputs, fused with the mask recompute).
    mask = (yf > 0).astype(jnp.float32)
    dym = dyf.astype(jnp.float32) * mask
    dscale = jnp.sum(dym * _flatten(x)[0].astype(jnp.float32), axis=0)
    dshift = jnp.sum(dym, axis=0)
    return (
        dx.reshape(shape), dres.reshape(shape),
        dscale.astype(scale.dtype), dshift.astype(scale.dtype),
    )


fused_epilogue.defvjp(_fwd, _bwd)
