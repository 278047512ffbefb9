"""Pallas scalar-prefetch row gather: resident-dataset batch assembly.

The device-resident training feed assembles each batch by gathering ``idx``
rows from the HBM-resident uint8 dataset (``data/device_augment.
gather_augment_encode`` — the TPU-native replacement for the reference's
host-side per-sample loading, YOLODataLoader.py:58-88).  XLA lowers
``jnp.take`` of whole [448, 448, 3] uint8 rows to a generic gather that
measured **6.8 ms per 19 MB bs32 batch on v5e** (round-3 augment XProf
table, docs/DESIGN.md) — ~100x off DMA speed, 25% of the whole augment
program.

A row gather is just N block copies at addresses known before the kernel
runs, which is exactly the Pallas scalar-prefetch pattern: the index
vector is prefetched into SMEM, the source BlockSpec's index_map reads
``idx_ref[n]`` to pick the HBM block for grid step n, and the kernel body
is a single VMEM copy.  The copy is double-buffered by the Pallas
pipeline, so the whole gather runs at HBM bandwidth.

Indices are CLAMPED to [0, D-1] at the entry: the index_map drives raw
block DMA, so an out-of-range index would otherwise read undefined HBM
rows.  The clamp gives ``jnp.take(mode='clip')`` semantics on
adversarial indices and costs one [N] int32 elementwise op —
unmeasurable against N row DMAs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(idx_ref, src_ref, out_ref):
    del idx_ref  # consumed by the index_maps
    out_ref[...] = src_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(data: Array, idx: Array, *, interpret: bool = False):
    """``data[idx]`` along axis 0 as N double-buffered block copies.

    data: [D, ...] (>= 3 dims; trailing dims are flattened to a 2-D
    [rows, cols] plane per block — [448, 1344] for a 448px RGB image,
    631 KB of VMEM per buffer).  idx: [N] integer.  Returns [N, ...] with
    ``data``'s trailing shape and dtype.
    """
    if data.ndim < 3:
        # Rank-2 is NOT supported: a (1, cols) block fails Mosaic's
        # last-two-dims (8, 128)-divisibility rule (measured on hardware).
        # Callers with flat rows reshape to [D, 8, cols/8] instead — the
        # tile-exact resident layout (data/pipeline.py), whose XLA layout
        # has zero padding so the operand needs no whole-dataset copy
        # (two 9.93 GB-copy OOMs measured at VOC scale without it;
        # tools/gather_layout_probe.py).
        raise ValueError("gather_rows_pallas needs >= 3 dims")
    D, rows = data.shape[0], data.shape[1]
    cols = 1
    for s in data.shape[2:]:
        cols *= s
    flat = data.reshape(D, rows, cols)
    N = idx.shape[0]

    out = pl.pallas_call(
        _copy_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N,),
            in_specs=[
                pl.BlockSpec(
                    (1, rows, cols), lambda n, idx_ref: (idx_ref[n], 0, 0)
                )
            ],
            out_specs=pl.BlockSpec(
                (1, rows, cols), lambda n, idx_ref: (n, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((N, rows, cols), data.dtype),
        interpret=interpret,
    )(jnp.clip(idx.astype(jnp.int32), 0, D - 1), flat)
    return out.reshape((N,) + data.shape[1:])
