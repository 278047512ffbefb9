"""AOT memory-analysis probe: which resident-dataset layout avoids the
full-dataset input copy in the Pallas gather program?

The VOC-scale rehearsal OOMed twice: first on the kernel's internal rank-4
reshape (9.93 GB temp), then — after the flat [D, 448, 1344] upload — on a
copy OF THE INPUT ITSELF (`copy(images_all.1)`, same 9.93 GB): 1344 lanes
pad to 1408 in XLA's tiled layout and the program normalizes the operand
with a whole-array copy.  This probe AOT-compiles gather variants at the
REAL VOC shape (compile only — no 10 GB allocation) and prints each one's
temp-memory size, so the layout decision is measured, not guessed.

Run on the TPU path:
  python tools/gather_layout_probe.py [variant ...]
variants: r4 (rank-4 [D,H,W,3]), r3 (flat [D,H,W*3]),
          r3pad (lane-padded [D,H,1408] + post-slice), r2 (fully flat
          [D,H*W*3] — 602112 = 4704*128, no lane padding).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

D, H, W = 16896, 448, 448
N = 16


def probe(name: str, shape: tuple, fn) -> None:
    t0 = time.perf_counter()
    data = jax.ShapeDtypeStruct(shape, jnp.uint8)
    idx = jax.ShapeDtypeStruct((N,), jnp.int32)
    try:
        compiled = jax.jit(fn).lower(data, idx).compile()
        mem = compiled.memory_analysis()
        print(
            f"{name:6s} {str(shape):24s} temp "
            f"{mem.temp_size_in_bytes / 1e9:7.3f} GB, args "
            f"{mem.argument_size_in_bytes / 1e9:7.3f} GB "
            f"({time.perf_counter() - t0:.0f}s compile)",
            flush=True,
        )
    except Exception as e:
        print(f"{name:6s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def main() -> None:
    from yolo_v1_tpu.ops.pallas.gather_kernel import gather_rows_pallas
    from yolo_v1_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    variants = sys.argv[1:] or ["r3", "r3pad", "r2"]

    if "r4" in variants:
        probe("r4", (D, H, W, 3),
              lambda d, i: gather_rows_pallas(d, i))
    if "r3" in variants:
        probe("r3", (D, H, W * 3),
              lambda d, i: gather_rows_pallas(d, i))
    if "r3pad" in variants:
        probe("r3pad", (D, H, 1408),
              lambda d, i: gather_rows_pallas(d, i)[:, :, : W * 3])
    if "r2" in variants:
        probe("r2", (D, H * W * 3),
              lambda d, i: gather_rows_pallas(d, i))
    if "r38" in variants:
        # [D, 8, H*W*3/8]: sublanes exactly 8, lanes 75264 = 588*128 — no
        # padding in the XLA tiled layout at all, block = one full row.
        probe("r38", (D, 8, H * W * 3 // 8),
              lambda d, i: gather_rows_pallas(d, i))


if __name__ == "__main__":
    main()
