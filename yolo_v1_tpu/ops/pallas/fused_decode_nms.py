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

Layout: everything lives as 2-D [CH, cells] PLANES — one per channel and
per box slot — with the S*S cells on the TPU lane dimension and the chunk
of images on sublanes.  The B axis is statically unrolled into per-slot
plane lists and every reduction is lanes-only (axis=-1).  A first revision
used [CH, B, cells] tiles with axis=(1, 2) reductions; Mosaic SIGABRTed
compiling them on real hardware (interpret mode hid it) — the 2-D plane
form is the layout the batch-parallel NMS kernel already proved compiles
and wins.  One grid program owns a CHUNK of images (batch-parallel — a
one-image-per-program grid serializes on the single tensor core).

The kernel returns only the keep mask, as one [CH, B*cells] plane-major
block; boxes/scores/classes for the host come from the (fully fused,
sort-free) XLA decode — recomputing those elementwise values costs nothing
next to the conv stack, while sharing the kernel's would force extra VMEM
outputs.

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
    """One chunk: grid [CH, ch, cells] -> keep [CH, B*cells] (0/1 f32,
    plane-major: lanes [b*cells, (b+1)*cells) hold slot b's cells)."""
    CH, ch, cells = grid_ref.shape

    def plane(i):  # one [CH, cells] channel plane, f32
        return grid_ref[:, i, :].astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (CH, cells), 1)
    colf = (lane % S).astype(jnp.float32)
    rowf = (lane // S).astype(jnp.float32)
    cell_sz = jnp.float32(1.0 / S)

    # Class score: max prob over the C class planes (elementwise tree).
    best_prob = plane(5 * B)
    for c in range(1, C):
        best_prob = jnp.maximum(best_prob, plane(5 * B + c))

    # Global max confidence across BOTH slots and all cells (the reference's
    # argmax fallback mask, utils/utils.py:111-114): lanes-only reduction.
    conf = [plane(b) for b in range(B)]
    gmax_all = conf[0]
    for b in range(1, B):
        gmax_all = jnp.maximum(gmax_all, conf[b])
    gmax = jnp.max(gmax_all, axis=1, keepdims=True)  # [CH, 1]

    x1, y1, x2, y2, scores, valid, area = [], [], [], [], [], [], []
    for b in range(B):
        o = B + 4 * b
        raw_x, raw_y = plane(o), plane(o + 1)
        half_w, half_h = 0.5 * plane(o + 2), 0.5 * plane(o + 3)
        cx = raw_x * cell_sz + colf * cell_sz  # same op order as decode_grid
        cy = raw_y * cell_sz + rowf * cell_sz
        x1.append(cx - half_w)
        y1.append(cy - half_h)
        x2.append(cx + half_w)
        y2.append(cy + half_h)
        score_b = conf[b] * best_prob
        valid.append(
            jnp.where(
                ((conf[b] > conf_floor) | (conf[b] == gmax))
                & (score_b > score_threshold),
                1.0,
                0.0,
            )
        )
        scores.append(score_b)
        area.append(
            jnp.maximum(x2[b] - x1[b], 0.0) * jnp.maximum(y2[b] - y1[b], 0.0)
        )

    # Candidate order of the two-stage path: index k = cell*B + b.
    cand = [(lane * B + b).astype(jnp.float32) for b in range(B)]

    K = B * cells
    neg_inf = -jnp.float32(jnp.inf)

    def body(_, state):
        kept, dead = state  # tuples of B [CH, cells] f32 masks
        avail = [valid[b] * (1.0 - dead[b]) for b in range(B)]
        s = [jnp.where(avail[b] > 0.0, scores[b], neg_inf) for b in range(B)]
        s_all = s[0]
        for b in range(1, B):
            s_all = jnp.maximum(s_all, s[b])
        m = jnp.max(s_all, axis=1, keepdims=True)  # [CH, 1]
        # First-index tie-break == stable argsort order of the XLA path.
        idx_all = None
        for b in range(B):
            is_max_b = (s[b] == m) & (avail[b] > 0.0)
            cand_b = jnp.where(is_max_b, cand[b], _BIG)
            idx_all = cand_b if idx_all is None else jnp.minimum(idx_all, cand_b)
        idx = jnp.min(idx_all, axis=1, keepdims=True)  # [CH, 1]
        sel = [
            jnp.where((cand[b] == idx) & (idx < _BIG), 1.0, 0.0)
            for b in range(B)
        ]

        # Selected box via one-hot lane reductions (no dynamic indexing).
        def pick(planes):
            acc = jnp.zeros((CH, 1), jnp.float32)
            for b in range(B):
                acc = acc + jnp.sum(
                    planes[b] * sel[b], axis=1, keepdims=True
                )
            return acc  # [CH, 1]

        bx1, by1, bx2, by2 = pick(x1), pick(y1), pick(x2), pick(y2)
        barea = pick(area)
        any_sel = pick(sel)  # 1.0 where a candidate was selected, else 0.0

        new_kept, new_dead = [], []
        for b in range(B):
            iw = jnp.maximum(
                jnp.minimum(x2[b], bx2) - jnp.maximum(x1[b], bx1), 0.0
            )
            ih = jnp.maximum(
                jnp.minimum(y2[b], by2) - jnp.maximum(y1[b], by1), 0.0
            )
            inter = iw * ih
            union = area[b] + barea - inter
            iou = jnp.where(
                union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0
            )
            # A no-selection step has a (0,0,0,0) box: inter = 0, iou = 0 —
            # no spurious suppression, so no extra guard is needed.
            suppress = jnp.where(iou > iou_threshold, 1.0, 0.0) * any_sel
            new_kept.append(jnp.maximum(kept[b], sel[b]))
            new_dead.append(
                jnp.maximum(dead[b], jnp.maximum(sel[b], suppress))
            )
        return tuple(new_kept), tuple(new_dead)

    zeros = tuple(jnp.zeros((CH, cells), jnp.float32) for _ in range(B))
    kept, _ = jax.lax.fori_loop(0, K, body, (zeros, zeros))
    for b in range(B):  # static lane slices: plane-major output layout
        keep_ref[:, b * cells : (b + 1) * cells] = kept[b]


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
        out_specs=pl.BlockSpec((CH, B * cells), lambda n: (n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP, B * cells), jnp.float32),
        interpret=interpret,
    )(grid_t)
    # Plane-major [N, B*cells] -> [N, K] in decode order (k = cell*B + b).
    return (
        jnp.transpose(keep[:N].reshape(N, B, cells), (0, 2, 1)).reshape(
            N, cells * B
        )
        > 0.5
    )
