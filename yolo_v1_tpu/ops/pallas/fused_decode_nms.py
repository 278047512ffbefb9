"""Fused decode+NMS Pallas TPU kernel: prediction grid in, keep mask out.

The serving path's post-network work is decode (grid -> K = S*S*B candidate
boxes/scores, `core/grid.decode_grid`, reference utils/utils.py:94-147) and
greedy NMS (reference utils/utils.py:150-184).  The two-stage XLA path
pays an argsort, two gathers and an inverse scatter around the sequential
scan (core/nms.py, ops/pallas/nms_kernel.py).  This kernel fuses BOTH
stages into one VMEM program and eliminates the sort entirely:

* decode runs in-kernel: per box-slot b, the cell-relative (x,y,w,h)
  channels become image-space corners with iota-derived cell offsets, and
  score/validity reproduce the reference's conf-floor / global-max-conf /
  score-threshold rules bit-for-bit (same f32 op order as decode_grid);
* instead of pre-sorting, each scan step SELECTS the best remaining
  candidate with a masked max + first-index tie-break (ties at equal f32
  scores resolve to the lower candidate index, exactly like the stable
  argsort of the two-stage path), then suppresses everything above the IoU
  threshold against it.  Greedy-NMS semantics are identical: suppressed
  candidates can never be selected, so the realized keep-order equals the
  sorted walk's.

Layout: the grid arrives transposed to [N, ch, cells] so the S*S cells ride
the TPU lane dimension; the B box-slots and the ch channels live on
sublanes where static indexing is free.  One grid program owns a CHUNK of
images (batch-parallel — one-image-per-program serializes on the single
tensor core, the round-1 NMS lesson).

The kernel returns only the keep mask; boxes/scores/classes for the host
come from the (fully fused, sort-free) XLA decode — recomputing those
elementwise values costs nothing next to the conv stack, while sharing the
kernel's would force extra VMEM outputs.

Select with ``nms_impl='fused'`` (eval/voc_map.make_detector); bit-exact
keep-set vs the two-stage path is pinned by tests/test_fused_decode_nms.py
at K=98 and K=392.  Measured numbers live in docs/DESIGN.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # > any candidate index; < f32 max (python float: inlined)


def _fused_kernel(
    grid_ref,
    keep_ref,
    *,
    S: int,
    B: int,
    C: int,
    conf_floor: float,
    score_threshold: float,
    iou_threshold: float,
):
    """One chunk: grid [CH, ch, cells] -> keep [CH, B, cells] (0/1 f32)."""
    CH, ch, cells = grid_ref.shape
    g = grid_ref[...].astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (CH, 1, cells), 2)
    colf = (lane % S).astype(jnp.float32)
    rowf = (lane // S).astype(jnp.float32)
    cell_sz = jnp.float32(1.0 / S)

    # Class scores: max prob over the C channels (sublane reduction).
    best_prob = jnp.max(g[:, 5 * B :, :], axis=1, keepdims=True)  # [CH,1,cells]

    # Global max confidence across BOTH slots and all cells (the reference's
    # argmax fallback mask, utils/utils.py:111-114).
    conf = g[:, 0:B, :]  # [CH, B, cells]
    gmax = jnp.max(conf, axis=(1, 2), keepdims=True)  # [CH,1,1]

    x1s, y1s, x2s, y2s, score_planes, valid_planes = [], [], [], [], [], []
    for b in range(B):
        o = B + 4 * b
        raw_x = g[:, o : o + 1, :]
        raw_y = g[:, o + 1 : o + 2, :]
        half_w = 0.5 * g[:, o + 2 : o + 3, :]
        half_h = 0.5 * g[:, o + 3 : o + 4, :]
        cx = raw_x * cell_sz + colf * cell_sz  # same op order as decode_grid
        cy = raw_y * cell_sz + rowf * cell_sz
        x1s.append(cx - half_w)
        y1s.append(cy - half_h)
        x2s.append(cx + half_w)
        y2s.append(cy + half_h)
        conf_b = g[:, b : b + 1, :]
        score_b = conf_b * best_prob
        valid_b = jnp.where(
            ((conf_b > conf_floor) | (conf_b == gmax))
            & (score_b > score_threshold),
            1.0,
            0.0,
        )
        score_planes.append(score_b)
        valid_planes.append(valid_b)

    x1 = jnp.concatenate(x1s, axis=1)  # [CH, B, cells]
    y1 = jnp.concatenate(y1s, axis=1)
    x2 = jnp.concatenate(x2s, axis=1)
    y2 = jnp.concatenate(y2s, axis=1)
    scores = jnp.concatenate(score_planes, axis=1)
    valid = jnp.concatenate(valid_planes, axis=1)
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    # Candidate order of the two-stage path: index k = cell*B + b.
    slot = jax.lax.broadcasted_iota(jnp.int32, (CH, B, cells), 1)
    cell_idx = jax.lax.broadcasted_iota(jnp.int32, (CH, B, cells), 2)
    cand_idx = (cell_idx * B + slot).astype(jnp.float32)

    K = B * cells

    def body(_, state):
        kept, dead = state  # f32 masks [CH, B, cells]
        avail = valid * (1.0 - dead)
        s = jnp.where(avail > 0.0, scores, -jnp.float32(jnp.inf))
        m = jnp.max(s, axis=(1, 2), keepdims=True)  # [CH,1,1]
        is_max = jnp.where((s == m) & (avail > 0.0), 1.0, 0.0)
        # First-index tie-break == stable argsort order of the XLA path.
        idx = jnp.min(
            jnp.where(is_max > 0.0, cand_idx, _BIG), axis=(1, 2), keepdims=True
        )
        sel = jnp.where((cand_idx == idx) & (idx < _BIG), 1.0, 0.0)

        # Selected box via one-hot reductions (no dynamic lane indexing).
        bx1 = jnp.sum(x1 * sel, axis=(1, 2), keepdims=True)
        by1 = jnp.sum(y1 * sel, axis=(1, 2), keepdims=True)
        bx2 = jnp.sum(x2 * sel, axis=(1, 2), keepdims=True)
        by2 = jnp.sum(y2 * sel, axis=(1, 2), keepdims=True)
        barea = jnp.sum(area * sel, axis=(1, 2), keepdims=True)

        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)

        # A no-selection step has a (0,0,0,0) box: inter = 0, iou = 0 — no
        # spurious suppression, so no extra guard is needed.
        suppress = jnp.where(iou > iou_threshold, 1.0, 0.0) * sel.max(
            axis=(1, 2), keepdims=True
        )
        kept = jnp.maximum(kept, sel)
        dead = jnp.maximum(dead, jnp.maximum(sel, suppress))
        return kept, dead

    zero = jnp.zeros((CH, B, cells), jnp.float32)
    kept, _ = jax.lax.fori_loop(0, K, body, (zero, zero))
    keep_ref[...] = kept


@functools.partial(
    jax.jit,
    static_argnames=(
        "S", "B", "C", "conf_floor", "score_threshold", "iou_threshold",
        "interpret",
    ),
)
def pallas_fused_decode_nms(
    pred: Array,
    *,
    S: int,
    B: int = 2,
    C: int = 20,
    conf_floor: float = 1e-4,
    score_threshold: float = 0.005,
    iou_threshold: float = 0.45,
    interpret: bool = False,
) -> Array:
    """[N, S, S, B*5+C] prediction grids -> [N, K] bool keep mask.

    The keep mask is bit-identical to
    ``vmap(nms_keep_mask)(vmap(decode_grid)(pred))`` of the two-stage path
    (same candidate order k = cell*B + b).
    """
    N = pred.shape[0]
    ch = B * 5 + C
    cells = S * S
    # Cells onto lanes, channels onto sublanes (static channel slices are
    # free there); one cheap XLA transpose replaces sort+gathers+scatter.
    grid_t = jnp.transpose(
        pred.reshape(N, cells, ch).astype(jnp.float32), (0, 2, 1)
    )

    CH = min(64, -(-N // 8) * 8)
    pad = (-N) % CH
    if pad:
        grid_t = jnp.concatenate(
            [grid_t, jnp.zeros((pad, ch, cells), grid_t.dtype)]
        )
    NP = N + pad

    kernel = functools.partial(
        _fused_kernel,
        S=S, B=B, C=C,
        conf_floor=conf_floor,
        score_threshold=score_threshold,
        iou_threshold=iou_threshold,
    )
    keep = pl.pallas_call(
        kernel,
        grid=(NP // CH,),
        in_specs=[
            pl.BlockSpec((CH, ch, cells), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CH, B, cells), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP, B, cells), jnp.float32),
        interpret=interpret,
    )(grid_t)
    # [N, B, cells] -> [N, K] in decode order (k = cell*B + b).
    return jnp.transpose(keep[:N], (0, 2, 1)).reshape(N, cells * B) > 0.5
