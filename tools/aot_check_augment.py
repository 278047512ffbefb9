"""AOT-compile the augment program against real Mosaic (verify recipe:
interpret-mode tests don't catch lowering failures) and print the compiled
memory analysis.  Run on the TPU path:  python tools/aot_check_augment.py
[batch] [size] [warp_impl].
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from yolo_v1_tpu.data.device_augment import (
    DeviceAugmentConfig, augment_and_encode_batch,
)


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 448
    impl = sys.argv[3] if len(sys.argv) > 3 else "auto"
    cfg = DeviceAugmentConfig(warp_impl=impl)
    M = 64

    fn = partial(augment_and_encode_batch, S=7, cfg=cfg)
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        jax.ShapeDtypeStruct((batch, size, size, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch, M, 4), jnp.float32),
        jax.ShapeDtypeStruct((batch, M), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
    )
    compiled = lowered.compile()
    dt = time.perf_counter() - t0
    mem = compiled.memory_analysis()
    print(
        f"OK impl={impl} bs={batch} size={size} compile={dt:.1f}s "
        f"temp={mem.temp_size_in_bytes / 1e9:.3f}GB "
        f"output={mem.output_size_in_bytes / 1e9:.3f}GB "
        f"argument={mem.argument_size_in_bytes / 1e9:.3f}GB",
        flush=True,
    )


if __name__ == "__main__":
    main()
