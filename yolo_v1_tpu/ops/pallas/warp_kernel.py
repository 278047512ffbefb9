"""Pallas banded row-resample kernel: the affine-warp hot loop on TPU.

Rebuilds the augmentation affine warp of the reference's imgaug pipeline
(reference YOLODataLoader.py:69-76, `iaa.Affine`) as a TPU kernel.  The
XLA formulations measured on v5e:

* per-pixel 4-corner row gather ('gather'): 225 ms / 32-image batch —
  latency-bound 12-byte gathers (round-2 XProf table, docs/DESIGN.md);
* two-pass banded gather ('band'): 206 ms / batch and ~0.5 GB/image temp
  HBM — XLA materializes layout-converted copies of the ~1 GB
  [rows, Wc*C] tap tensors (one conversion is a 192-iteration while loop
  writing 925 MB).

This kernel removes the giant intermediates entirely: one grid step per
image, the whole [448, 448*3] f32 plane lives in VMEM (2.4 MB of the
16 MB budget), and each 8-output-row block loads aligned [D8, lanes] tap
windows with dynamic sublane slices and combines them with on-the-fly
hat weights (max(0, 1-|p - tap|) is exactly the bilinear weight pair).
Tap-window starts are precomputed on the host side of the program into
SMEM (scalar-prefetch pattern) so the kernel never extracts scalars from
vectors.

**Column-chunked windows** (round 5): the tap-window height D must cover
the banded spread of p across the lanes it serves — cc_max*(W-1) over a
full 448-pixel row (D8=80 at the augment-config bounds), but only
cc_max*127 over a 128-pixel chunk (D8=40; tail chunk 64px, D8=32).  The
weight/multiply work is H * lanes * D, so chunking the row into 128-pixel
column chunks (lane offsets stay multiples of 128: 128px * 3ch = 384
lanes) halves the kernel's arithmetic at identical semantics — every
output element still sums exactly its two bilinear taps.  ``col_chunk=0``
restores the full-row window (the round-4 formulation) for A/B
measurement.

Semantics match ``data/device_augment._resample_axis0`` (exact 1-D
bilinear along axis 0 at positions affine in both indices; taps outside
[0, H-1] contribute zero) — both are exact, so outputs agree to f32
rounding, and the two-pass composition in ``warp_image_band_pallas``
matches ``_warp_image_band`` including its documented divergence from
single-pass bilinear under rotation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_BLK = 8  # output rows per inner iteration (sublane granule)


def _chunk_widths(W: int, col_chunk: int) -> list[int]:
    """Column-chunk pixel widths: full ``col_chunk`` chunks plus one tail.
    ``col_chunk`` must be a multiple of 128/gcd(C,128); with C=3 that is
    128, so every chunk's lane offset (width*3) is a multiple of 128 and
    Mosaic lowers the static lane slices without relayout."""
    if col_chunk <= 0 or col_chunk >= W:
        return [W]
    out = [col_chunk] * (W // col_chunk)
    if W % col_chunk:
        out.append(W % col_chunk)
    return out


def _resample_kernel(
    coef_ref,  # SMEM [1, 1, 4] f32: c_row, c_col, c_0, (pad)
    start_ref,  # SMEM [1, nc, HB] int32: aligned tap-window start per (chunk, block)
    src_ref,  # VMEM [1, H, WC] f32
    out_ref,  # VMEM [1, H, WC] f32
    *,
    widths: tuple[int, ...],  # chunk pixel widths
    d8s: tuple[int, ...],  # tap-window height per chunk
    C: int,
):
    H = src_ref.shape[1]
    c_row = coef_ref[0, 0, 0]
    c_col = coef_ref[0, 0, 1]
    c_0 = coef_ref[0, 0, 2]

    def blk(rb, _):
        lane0 = 0
        x0 = 0
        for ci, (Wc, D8) in enumerate(zip(widths, d8s)):
            WcC = Wc * C
            # Lane -> source-column coordinate within this chunk (the
            # flattened row is pixel-major: x0c0 x0c1 x0c2 x1c0 ...).
            xpix = (
                x0
                + jax.lax.broadcasted_iota(jnp.int32, (1, WcC), 1) // C
            ).astype(jnp.float32)
            tap_rel = jax.lax.broadcasted_iota(jnp.int32, (D8, 1), 0).astype(
                jnp.float32
            )
            # starts are built 8-aligned on the host side (base//8*8 with
            # D8 a multiple of 8); multiple_of tells Mosaic so the sublane
            # dynamic slice lowers.
            start = pl.multiple_of(start_ref[0, ci, rb], ROWS_BLK)
            sl = src_ref[0, pl.dslice(start, D8), lane0 : lane0 + WcC]
            tap = start.astype(jnp.float32) + tap_rel  # [D8, 1]
            rows = []
            for j in range(ROWS_BLK):
                r = (rb * ROWS_BLK + j).astype(jnp.float32)
                p = c_row * r + c_col * xpix + c_0  # [1, WcC]
                w = jnp.maximum(0.0, 1.0 - jnp.abs(p - tap))  # [D8, WcC]
                rows.append(jnp.sum(w * sl, axis=0, keepdims=True))
            out_ref[
                0, pl.dslice(rb * ROWS_BLK, ROWS_BLK), lane0 : lane0 + WcC
            ] = jnp.concatenate(rows, axis=0)
            lane0 += WcC
            x0 += Wc
        return 0

    jax.lax.fori_loop(0, H // ROWS_BLK, blk, 0, unroll=False)


def _window_rows(cc_max: float, cr_max: float, Wc: int) -> int:
    """Static tap-window height D8 for a Wc-pixel column chunk.

    Covers: the banded spread of p across the chunk (cc_max*(Wc-1)), the
    bilinear pair + floor slack (+3), the base drift across ROWS_BLK
    output rows (cr_max*(ROWS_BLK-1)), and up to 7 rows of downward
    8-alignment of the start; rounded up to the sublane granule.
    """
    D = int(np.ceil(cc_max * (Wc - 1))) + 3
    drift = int(np.ceil(cr_max * (ROWS_BLK - 1)))
    return -(-(D + drift + 8) // 8) * 8


@functools.partial(
    jax.jit,
    static_argnames=("cc_max", "cr_max", "C", "col_chunk", "interpret"),
)
def resample_axis0_pallas(
    src: Array,  # [N, H, W*C] f32, flattened pixel rows
    c_row: Array,  # [N] f32
    c_col: Array,  # [N] f32
    c_0: Array,  # [N] f32
    *,
    cc_max: float,
    cr_max: float,
    C: int = 3,
    col_chunk: int = 128,
    interpret: bool = False,
) -> Array:
    """Batched banded 1-D bilinear resample along axis 1 (source rows) at
    positions p(r, x) = c_row*r + c_col*x + c_0, per image.

    ``cc_max`` / ``cr_max`` are static upper bounds on |c_col| / |c_row|
    (derived from the augment config's parameter ranges) that size the
    tap windows; passing coefficients outside the bounds produces clipped
    (wrong) output, so callers assert them.  ``col_chunk``: pixel width of
    the per-window column chunks (0 = one full-row window; see module
    docstring for why chunking halves the arithmetic).
    """
    N, H, WC = src.shape
    W = WC // C
    widths = _chunk_widths(W, col_chunk)
    d8s = [_window_rows(cc_max, cr_max, Wc) for Wc in widths]
    if max(d8s) > H:
        raise ValueError(
            f"tap window D8={max(d8s)} exceeds H={H}; cc_max={cc_max} too "
            "large for the Pallas warp (use warp_impl='band')"
        )
    HB = H // ROWS_BLK
    nc = len(widths)
    coefs = jnp.stack(
        [c_row, c_col, c_0, jnp.zeros_like(c_0)], axis=1
    )[:, None, :]  # [N, 1, 4]
    # Aligned tap-window start per (image, chunk, row block), on the XLA
    # side: base(r) = floor(min_x p(r, x)) over the chunk's x-range is
    # monotonic in r within a block, so the block minimum is
    # min(base(r0), base(r0+7)).
    r0 = jnp.arange(HB, dtype=jnp.float32)[None, None, :] * ROWS_BLK
    x_lo = np.cumsum([0] + list(widths[:-1])).astype(np.float32)  # [nc]
    x_hi = x_lo + np.asarray(widths, np.float32) - 1.0
    cmin = jnp.minimum(
        c_col[:, None] * x_lo[None, :], c_col[:, None] * x_hi[None, :]
    )[..., None]  # [N, nc, 1]
    b_lo = c_row[:, None, None] * r0 + c_0[:, None, None] + cmin
    b_hi = (
        c_row[:, None, None] * (r0 + ROWS_BLK - 1)
        + c_0[:, None, None]
        + cmin
    )
    base = jnp.floor(jnp.minimum(b_lo, b_hi)).astype(jnp.int32)
    hi = jnp.asarray([H - d for d in d8s], jnp.int32)[None, :, None]
    starts = jnp.clip(base // 8 * 8, 0, hi)  # [N, nc, HB]

    kernel = functools.partial(
        _resample_kernel, widths=tuple(widths), d8s=tuple(d8s), C=C
    )
    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 4), lambda n: (n, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, nc, HB), lambda n: (n, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, H, WC), lambda n: (n, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, WC), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, WC), jnp.float32),
        interpret=interpret,
    )(coefs, starts, src)


def warp_image_band_pallas(
    imgs: Array,  # [N, H, W, C] f32
    rs: Array,  # [N, 2, 2] effective affine (identity when gated off)
    offset: Array,  # [N, 2]
    *,
    cc_a: float,
    cc_b: float,
    cr_max: float,
    col_chunk: int = 128,
    interpret: bool = False,
) -> Array:
    """Two-pass affine warp (same Catmull-Smith decomposition and
    coefficient algebra as ``data/device_augment._warp_image_band``),
    with each pass running the Pallas banded-resample kernel.

    ``cc_a``/``cc_b``/``cr_max`` are the static |coefficient| bounds for
    pass A's c_col, pass B's c_col, and both passes' c_row, derived from
    the augment-config parameter ranges by the caller.
    """
    N, H, W, C = imgs.shape
    a = jnp.linalg.inv(rs)  # [N, 2, 2]
    o = -jnp.einsum("nij,nj->ni", a, offset)  # [N, 2]
    cy_x = a[:, 1, 0] / a[:, 0, 0]
    cy_u = a[:, 1, 1] - a[:, 1, 0] * a[:, 0, 1] / a[:, 0, 0]
    cy_0 = o[:, 1] - a[:, 1, 0] / a[:, 0, 0] * o[:, 0]
    t = resample_axis0_pallas(
        imgs.reshape(N, H, W * C), cy_u, cy_x, cy_0,
        cc_max=cc_a, cr_max=cr_max, C=C, col_chunk=col_chunk,
        interpret=interpret,
    ).reshape(N, H, W, C)
    t = jnp.swapaxes(t, 1, 2)  # [N, W, H, C]
    out = resample_axis0_pallas(
        t.reshape(N, W, H * C), a[:, 0, 0], a[:, 0, 1], o[:, 0],
        cc_max=cc_b, cr_max=cr_max, C=C, col_chunk=col_chunk,
        interpret=interpret,
    ).reshape(N, W, H, C)
    return jnp.swapaxes(out, 1, 2)
