"""Pallas TPU kernel for greedy NMS over a fixed candidate set.

Same contract and keep-set as ``yolo_v1_tpu.core.nms.nms_keep_mask`` (which
itself matches the reference greedy NMS, /root/reference/utils/utils.py:150-184):
candidates are processed in descending score order; a candidate is kept iff
it is valid and not suppressed by an earlier kept candidate with IoU above
the threshold.

Kernel layout (one grid program per CHUNK of images):

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

The kernel is BATCH-PARALLEL: each grid program owns a CHUNK of images
(sized so the chunk's [CH, K, K] suppression scratch fits VMEM) and every
step of the sequential greedy scan updates all CH images at once — the
same across-batch vectorization ``vmap`` gives the XLA path, but with the
scan state and suppression matrix pinned in VMEM.

Measured on v5e (decode+NMS, S=14/K=392, batch 64): 1.34 ms/batch vs the
XLA path's 1.65 ms (a first one-image-per-program version measured 4.90 ms
— grid programs serialize on the single tensor core, so chunk-level batch
parallelism is what makes the kernel win).  NMS is ~1% of end-to-end
serving either way; select with ``nms_impl='pallas'``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def resolve_nms_impl(impl: str, mesh=None, K: int | None = None) -> str:
    """Resolve 'auto' to a concrete implementation.

    The kernels lower only through the Mosaic TPU pipeline ('tpu', or the
    tunneled 'axon' platform) and have no GSPMD partitioning rule, so 'auto'
    picks a Pallas kernel only for single-mesh TPU runs; everything else
    (CPU, GPU, mesh-sharded eval) takes the XLA path, which partitions and
    lowers everywhere.  Among the kernels, the v5e-measured crossover
    (DESIGN.md) is the candidate count: at K=98 the two-stage NMS kernel
    wins (0.45 vs fused 0.57 ms), at K=392 the sort-free fused decode+NMS
    kernel wins (1.01 vs 1.36 ms) — its selection scan amortizes the
    argsort+gathers it eliminates only once K is large.  'fused' selects
    the single-program decode+NMS kernel (ops/pallas/fused_decode_nms.py).
    """
    if impl == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        if not (on_tpu and mesh is None):
            return "xla"
        return "fused" if (K is not None and K >= 256) else "pallas"
    if impl in ("pallas", "fused") and mesh is not None:
        raise ValueError(
            f"nms_impl='{impl}' cannot be used with a mesh (the Mosaic "
            "custom call has no partitioning rule); use 'auto' or 'xla'"
        )
    return impl


def _nms_kernel(
    boxes_ref, valid_ref, keep_ref, mat_ref, *, iou_threshold: float
):
    """One chunk of CH images: boxes [CH,K,4] (each image sorted by
    descending score), valid [CH,K] -> keep/supp [CH,K].

    Dynamic per-step indexing inside the sequential scan must go through a
    Ref (TPU lowering has no value-level dynamic_slice), so the [CH,K,K]
    suppression tensor is staged into the ``mat_ref`` VMEM scratch first;
    per-candidate scalar reads use one-hot lane reductions (Mosaic cannot
    dynamically index the lane dimension).
    """
    CH, K = boxes_ref.shape[0], boxes_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)

    # Build the suppression matrix one image at a time so the only [*,K,K]
    # buffer alive is the scratch itself ([CH,K,K] VALUE temporaries would
    # blow the ~16MB VMEM budget at K=392); each [K,K] build is already
    # fully vector-parallel on the VPU.
    def build(n, _):
        boxes = boxes_ref[pl.ds(n, 1), :, :].reshape(K, 4)
        x1 = boxes[:, 0:1]  # [K, 1]
        y1 = boxes[:, 1:2]
        x2 = boxes[:, 2:3]
        y2 = boxes[:, 3:4]
        iw = jnp.maximum(jnp.minimum(x2, x2.T) - jnp.maximum(x1, x1.T), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, y2.T) - jnp.maximum(y1, y1.T), 0.0)
        inter = iw * ih  # [K, K]
        area = (x2 - x1) * (y2 - y1)  # [K, 1]
        union = area + area.T - inter
        iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
        # mat[n, i, j] = 1: kept candidate i knocks out later candidate j.
        mat_ref[pl.ds(n, 1), :, :] = jnp.where(
            (iou > iou_threshold) & (col > row), 1.0, 0.0
        ).reshape(1, K, K)
        return 0

    jax.lax.fori_loop(0, CH, build, 0)

    valid = valid_ref[...]  # [CH, K]
    lane = jax.lax.broadcasted_iota(jnp.int32, (CH, K), 1)

    def body(i, carry):
        keep, supp = carry  # [CH, K] each
        onehot = (lane == i).astype(jnp.float32)  # [CH, K]
        v = jnp.sum(valid * onehot, axis=1, keepdims=True)  # [CH, 1]
        s = jnp.sum(supp * onehot, axis=1, keepdims=True)
        is_kept = jnp.where((v > 0.0) & (s == 0.0), 1.0, 0.0)  # [CH, 1]
        keep = keep + onehot * is_kept
        srow = mat_ref[:, pl.ds(i, 1), :].reshape(CH, K)
        supp = jnp.maximum(supp, srow * is_kept)
        return keep, supp

    keep, _ = jax.lax.fori_loop(
        0, K, body,
        (jnp.zeros((CH, K), jnp.float32), jnp.zeros((CH, K), jnp.float32)),
    )
    keep_ref[...] = keep


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

    # Chunk size: the [CH, K, K] suppression scratch must fit VMEM next to
    # the per-image [K, K] build temporaries (~5 MB budget, f32), and the
    # sublane (CH) dimension of the 2-D blocks must be a multiple of 8.
    CH = ((5 * 2**20 // 4) // max(K * K, 1)) // 8 * 8
    if CH == 0:
        raise ValueError(
            f"K={K} candidates exceed the Pallas NMS kernel's VMEM budget "
            "(needs CH>=8 images of [K,K] scratch); use nms_impl='xla'"
        )
    # Clamp to the actual batch (rounded up to the 8-sublane granule) so a
    # small batch is not zero-padded to a larger chunk and scanned for free.
    CH = min(64, CH, -(-N // 8) * 8)
    pad = (-N) % CH
    if pad:
        sboxes = jnp.concatenate([sboxes, jnp.zeros((pad, K, 4), sboxes.dtype)])
        svalid = jnp.concatenate([svalid, jnp.zeros((pad, K), bool)])
    NP = N + pad

    kernel = functools.partial(_nms_kernel, iou_threshold=iou_threshold)
    keep_sorted = pl.pallas_call(
        kernel,
        grid=(NP // CH,),
        in_specs=[
            pl.BlockSpec((CH, K, 4), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, K), lambda n: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CH, K), lambda n: (n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP, K), jnp.float32),  # keep
        scratch_shapes=[pltpu.VMEM((CH, K, K), jnp.float32)],
        interpret=interpret,
    )(
        sboxes.astype(jnp.float32),
        svalid.astype(jnp.float32),
    )
    keep_sorted = keep_sorted[:N] > 0.5  # [N, K]
    # Scatter back to original candidate order.
    inv = jax.vmap(lambda o: jnp.zeros((K,), jnp.int32).at[o].set(jnp.arange(K)))(
        order
    )
    return jnp.take_along_axis(keep_sorted, inv, axis=1)
