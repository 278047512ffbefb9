"""Pallas TPU kernel for the YOLOv1 responsible-box assignment.

Computes, in one fused VMEM pass per CHUNK of images, the two stop-gradient
tensors the loss needs (the outputs of the reference's per-object Python
loop, /root/reference/v1Loss.py:64-78):

  contain    [N, S, S, B]  — one-hot of the IoU-arg-max ("responsible") box
                             in every object cell, 0 elsewhere;
  iou_target [N, S, S, B]  — the realized IoU at the responsible slot (the
                             confidence regression target, v1Loss.py:90).

Box comparison uses the reference's shared-cell coordinate trick
(corners = center/S ± wh/2, no cell offset — it cancels inside one cell;
utils/utils.py:59-75).  Ties go to the first box slot like torch's max.

The kernel is BATCH-PARALLEL (chunk of images per grid program, like
ops/pallas/nms_kernel.py): a first one-image-per-program layout serializes
on the single tensor core — the same lesson the NMS kernel measured at 3.7x.

The assignment is used under ``stop_gradient`` (the loss's default), so the
kernel needs no VJP; ``losses.yolov1`` calls it with gradient-stopped
inputs when ``assignment_impl='pallas'``.

Measured (v5e, full train step, resnet50-S7 448px, marginal timing): the
kernel is performance-NEUTRAL end to end — the assignment is ~0.1% of a
train step's FLOPs and XLA already fuses the vectorized XLA version into
the surrounding loss computation.  Kept as a selectable implementation
(``--assignment_impl pallas``) and as the measured base for fused-loss
experiments; numbers in docs/DESIGN.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _assign_kernel(pred_ref, tgt_ref, contain_ref, iou_ref, *, S: int, B: int):
    """One chunk: pred/tgt [CH, S*S, B*5+C] -> contain/iou [CH, S*S, B]."""
    pred = pred_ref[...]  # [CH, cells, ch]
    tgt = tgt_ref[...]

    obj = jnp.where(tgt[:, :, 0:1] == 1.0, 1.0, 0.0)  # [CH, cells, 1]

    # GT corners (shared by all B slots; encoder duplicates the box).
    gcx = tgt[:, :, B : B + 1] / S
    gcy = tgt[:, :, B + 1 : B + 2] / S
    ghw = 0.5 * tgt[:, :, B + 2 : B + 3]
    ghh = 0.5 * tgt[:, :, B + 3 : B + 4]
    gx1, gy1, gx2, gy2 = gcx - ghw, gcy - ghh, gcx + ghw, gcy + ghh
    garea = (gx2 - gx1) * (gy2 - gy1)

    ious = []
    for b in range(B):
        o = B + 4 * b
        pcx = pred[:, :, o : o + 1] / S
        pcy = pred[:, :, o + 1 : o + 2] / S
        phw = 0.5 * pred[:, :, o + 2 : o + 3]
        phh = 0.5 * pred[:, :, o + 3 : o + 4]
        px1, py1, px2, py2 = pcx - phw, pcy - phh, pcx + phw, pcy + phh
        iw = jnp.maximum(jnp.minimum(px2, gx2) - jnp.maximum(px1, gx1), 0.0)
        ih = jnp.maximum(jnp.minimum(py2, gy2) - jnp.maximum(py1, gy1), 0.0)
        inter = iw * ih
        union = (px2 - px1) * (py2 - py1) + garea - inter
        ious.append(
            jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
        )
    iou_sb = jnp.concatenate(ious, axis=2)  # [CH, cells, B]

    best = jnp.max(iou_sb, axis=2, keepdims=True)  # [CH, cells, 1]
    is_best = jnp.where(iou_sb == best, 1.0, 0.0)  # ties -> several ones
    # First-slot tie-break (torch max semantics): slot b is responsible iff
    # it is best and no earlier slot is. Static unrolled prefix over the
    # tiny B axis (Mosaic has no cumsum).
    taken = jnp.zeros_like(is_best[:, :, 0:1])
    cols = []
    for b in range(B):
        this = is_best[:, :, b : b + 1] * (1.0 - taken)
        cols.append(this)
        taken = jnp.maximum(taken, this)
    resp = jnp.concatenate(cols, axis=2)

    contain_ref[...] = resp * obj
    iou_ref[...] = iou_sb * resp * obj


@functools.partial(
    jax.jit, static_argnames=("S", "B", "C", "interpret")
)
def pallas_assignment(
    pred: Array,
    target: Array,
    S: int,
    B: int = 2,
    C: int = 20,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """(contain, iou_target), each [N, S, S, B] — fused Pallas assignment."""
    N = pred.shape[0]
    ch = B * 5 + C
    cells = S * S
    pred2 = pred.reshape(N, cells, ch).astype(jnp.float32)
    tgt2 = target.reshape(N, cells, ch).astype(jnp.float32)

    # Chunk of images per program (sublane granule 8).  The ch->128-lane
    # padding dominates VMEM: at CH=64/S=7 (cells=49) the scoped allocation
    # measures 17.33 MB against the 16 MB limit (hardware Mosaic compile
    # error), so budget CH*cells <= 32*49 and clamp to the actual batch.
    if cells > 32 * 49 // 8:
        # The minimum sublane granule (CH=8) already blows the measured
        # 16 MB Mosaic VMEM budget (CH*cells <= 1568): at S=20, CH=8 holds
        # 3200 cell-rows ~ 2x budget.  Unreachable at S∈{7,14}; fail with a
        # pointer instead of a cryptic Mosaic compile error.
        raise ValueError(
            f"pallas assignment: S={S} ({cells} cells) exceeds the VMEM "
            "budget at the minimum 8-image chunk; use assignment_impl='xla'"
        )
    CH = max(8, (32 * 49 // cells) // 8 * 8)
    CH = min(CH, -(-N // 8) * 8)
    pad = (-N) % CH
    if pad:
        pred2 = jnp.concatenate(
            [pred2, jnp.zeros((pad, cells, ch), pred2.dtype)]
        )
        tgt2 = jnp.concatenate([tgt2, jnp.zeros((pad, cells, ch), tgt2.dtype)])
    NP = N + pad

    kernel = functools.partial(_assign_kernel, S=S, B=B)
    contain, iou_t = pl.pallas_call(
        kernel,
        grid=(NP // CH,),
        in_specs=[
            pl.BlockSpec((CH, cells, ch), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, cells, ch), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CH, cells, B), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, cells, B), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, cells, B), jnp.float32),
            jax.ShapeDtypeStruct((NP, cells, B), jnp.float32),
        ],
        interpret=interpret,
    )(pred2, tgt2)
    return (
        contain[:N].reshape(N, S, S, B),
        iou_t[:N].reshape(N, S, S, B),
    )
