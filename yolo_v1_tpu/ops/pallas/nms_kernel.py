"""Pallas TPU kernel for greedy NMS over a fixed candidate set.

Same contract and keep-set as ``yolo_v1_tpu.core.nms.nms_keep_mask`` (which
itself matches the reference greedy NMS, /root/reference/utils/utils.py:150-184):
candidates are processed in descending score order; a candidate is kept iff
it is valid and not suppressed by an earlier kept candidate with IoU above
the threshold.

Kernel layout (one grid program per image):

* candidates are pre-sorted by score on the XLA side (argsort is cheap and
  XLA's sort is excellent; re-implementing it in-kernel buys nothing);
* the kernel materializes the [K, K] IoU "suppression" matrix in VMEM with
  pure 2-D outer-product ops (K = S*S*B = 98 or 392 — a few hundred KB,
  far under the ~16 MB VMEM budget);
* the inherently sequential greedy scan is a ``fori_loop`` over rows whose
  state (keep / suppressed flags) lives in VMEM, so the loop never touches
  HBM.

On non-TPU backends pass ``interpret=True`` (tests do) to run the same
kernel through the Pallas interpreter.

Measured honestly (v5e, decode+NMS, S=14/K=392, batch 64): the XLA path
runs 1.65 ms/batch vs 4.90 ms for this kernel — ``vmap`` batches the
sequential scan ACROSS images while the kernel grid runs one image per
program, serializing the batch.  The XLA path is therefore the default
(``nms_impl='xla'``); this kernel stays as the verified-correct basis for
a future fused decode+NMS where keeping candidates in VMEM end-to-end can
pay for the serialization.  Either way NMS is ~1% of end-to-end serving
time (the 448px forward is ~45 ms/batch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(
    boxes_ref, valid_ref, keep_ref, supp_ref, mat_ref, *, iou_threshold: float
):
    """One image: boxes [1,K,4] sorted by descending score, valid [1,1,K].

    Dynamic per-row indexing inside the sequential scan must go through a
    Ref (TPU lowering has no value-level dynamic_slice), so the suppression
    matrix is staged into the ``mat_ref`` VMEM scratch first.
    """
    K = boxes_ref.shape[1]
    boxes = boxes_ref[0]  # [K, 4]
    x1 = boxes[:, 0:1]  # [K, 1]
    y1 = boxes[:, 1:2]
    x2 = boxes[:, 2:3]
    y2 = boxes[:, 3:4]

    # Pairwise intersection via outer max/min — all 2-D, VPU-friendly.
    iw = jnp.maximum(jnp.minimum(x2, x2.T) - jnp.maximum(x1, x1.T), 0.0)
    ih = jnp.maximum(jnp.minimum(y2, y2.T) - jnp.maximum(y1, y1.T), 0.0)
    inter = iw * ih  # [K, K]
    area = (x2 - x1) * (y2 - y1)  # [K, 1]
    union = area + area.T - inter
    iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)

    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    # mat[i, j] = 1: kept candidate i knocks out later candidate j.
    mat_ref[:] = jnp.where((iou > iou_threshold) & (col > row), 1.0, 0.0)

    valid_row = valid_ref[0]  # [1, K]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    # Sequential greedy scan.  Mosaic cannot dynamically index the lane
    # (minor) dimension, so per-candidate scalar reads use one-hot
    # reductions and the keep/suppressed rows are loop-carried values;
    # the only dynamic access is a sublane-dim row slice of the matrix.
    def body(i, carry):
        keep, supp = carry
        onehot = (lane == i).astype(jnp.float32)  # [1, K]
        v = jnp.sum(valid_row * onehot)
        s = jnp.sum(supp * onehot)
        is_kept = jnp.where((v > 0.0) & (s == 0.0), 1.0, 0.0)
        keep = keep + onehot * is_kept
        srow = mat_ref[pl.ds(i, 1), :]  # [1, K]
        supp = jnp.maximum(supp, srow * is_kept)
        return keep, supp

    keep, supp = jax.lax.fori_loop(
        0, K, body,
        (jnp.zeros((1, K), jnp.float32), jnp.zeros((1, K), jnp.float32)),
    )
    keep_ref[0] = keep
    supp_ref[0] = supp


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_nms_keep_mask(
    boxes: Array,
    scores: Array,
    valid: Array,
    iou_threshold: float = 0.5,
    interpret: bool = False,
) -> Array:
    """Batched greedy-NMS keep mask via the Pallas kernel.

    Args:
      boxes: [N, K, 4] corner boxes.
      scores: [N, K].
      valid: [N, K] bool.
    Returns:
      [N, K] bool keep mask (subset of valid), identical to
      ``core.nms.nms_keep_mask``.
    """
    N, K = scores.shape
    masked = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-masked, axis=-1)  # [N, K] descending
    sboxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    svalid = jnp.take_along_axis(valid, order, axis=1)

    kernel = functools.partial(_nms_kernel, iou_threshold=iou_threshold)
    keep_sorted = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, K, 4), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, K), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1, K), jnp.float32),  # keep
            jax.ShapeDtypeStruct((N, 1, K), jnp.float32),  # suppressed (scratch-ish)
        ],
        scratch_shapes=[pltpu.VMEM((K, K), jnp.float32)],
        interpret=interpret,
    )(
        sboxes.astype(jnp.float32),
        svalid.astype(jnp.float32)[:, None, :],
    )[0]
    keep_sorted = keep_sorted[:, 0, :] > 0.5  # [N, K]
    # Scatter back to original candidate order.
    inv = jax.vmap(lambda o: jnp.zeros((K,), jnp.int32).at[o].set(jnp.arange(K)))(
        order
    )
    return jnp.take_along_axis(keep_sorted, inv, axis=1)
