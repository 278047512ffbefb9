"""Hardware bit-exactness check for the Pallas row-gather kernel.

Run on the TPU path:  python tools/hw_gather_check.py
Compares gather_rows_pallas against jnp.take on-device for the image
dtype/rank (uint8 [D,448,448,3]) and a f32 box tensor, with repeated and
endpoint indices.  Interpret-mode tests pin the semantics; this pins the
Mosaic lowering (round-2 lesson: they can differ).
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax.numpy as jnp

    from yolo_v1_tpu.ops.pallas.gather_kernel import gather_rows_pallas
    from yolo_v1_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 255, (64, 448, 448, 3)).astype(np.uint8))
    idx = jnp.asarray(
        np.r_[rng.integers(0, 64, 28), [0, 63, 5, 5]].astype(np.int32)
    )
    got = np.asarray(gather_rows_pallas(data, idx))
    want = np.asarray(jnp.take(data, idx, axis=0))
    assert (got == want).all(), "uint8 image gather mismatch"
    print("uint8 [64,448,448,3] gather: bit-exact", file=sys.stderr)

    boxes = jnp.asarray(rng.uniform(0, 1, (64, 64, 4)).astype(np.float32))
    got = np.asarray(gather_rows_pallas(boxes, idx))
    want = np.asarray(jnp.take(boxes, idx, axis=0))
    assert (got == want).all(), "f32 box gather mismatch"
    print("f32 [64,64,4] gather: bit-exact", file=sys.stderr)
    print("OK")


if __name__ == "__main__":
    main()
