"""XProf device trace of the resident-feed augment program (round 3:
re-capture after the Pallas warp kernel replaced the row-gather warp).

Usage (TPU):  python tools/augment_trace.py [batch] [out_dir]
Parse:        python tools/step_trace.py --parse [out_dir] (same format)
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def capture(batch: int, out_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from yolo_v1_tpu.data.device_augment import (
        DeviceAugmentConfig, gather_augment_encode,
    )
    from yolo_v1_tpu.data.pipeline import MAX_BOXES
    from yolo_v1_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    n_data = 512
    rng = np.random.default_rng(0)
    images_all = jnp.asarray(  # flat resident layout (pipeline.py upload)
        rng.integers(0, 255, (n_data, 8, 448 * 448 * 3 // 8)).astype(np.uint8)
    )
    boxes_all = np.zeros((n_data, MAX_BOXES, 4), np.float32)
    boxes_all[:, 0] = [0.5, 0.5, 0.4, 0.4]
    boxes_all = jnp.asarray(boxes_all)
    labels_all = jnp.asarray(
        rng.integers(0, 20, (n_data, MAX_BOXES)).astype(np.int32)
    )
    counts_all = jnp.asarray(np.full((n_data,), 1, np.int32))
    cfg = DeviceAugmentConfig()
    key = jax.random.PRNGKey(0)
    idxs = [
        jnp.asarray(rng.permutation(n_data)[:batch].astype(np.int32))
        for _ in range(2)
    ]

    def feed(i):
        return gather_augment_encode(
            jax.random.fold_in(key, i), images_all, boxes_all, labels_all,
            counts_all, idxs[i % 2], S=7, cfg=cfg,
        )

    t0 = time.perf_counter()
    np.asarray(feed(0)[1][:1])
    log(f"compile+first: {time.perf_counter() - t0:.1f}s")

    jax.profiler.start_trace(out_dir)
    out = None
    for i in range(6):
        out = feed(i)
    np.asarray(out[1][:1])
    jax.profiler.stop_trace()
    log(f"trace written to {out_dir}")


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xprof_augment"
    capture(batch, out)
