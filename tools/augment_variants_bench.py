"""AOT-check + time augment-program variants (blur_impl x gather_impl) on
the TPU, one process (so later variants reuse the in-process dispatch
machinery; each distinct cfg is still its own remote compile).

Usage (TPU):  python tools/augment_variants_bench.py [batch] [variant ...]
  variant = blur:gather, e.g. band:take band_bf16:take band:pallas
  default sweep: band:take band_bf16:take shift:take band:pallas
                 band_bf16:pallas

For each variant: AOT lower+compile first (catches Mosaic failures without
wedging the chip), then marginal-timed feed chain (the bench.py pattern —
device->host fetch of real bytes, chain minus single dispatch).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from yolo_v1_tpu.data.device_augment import (
        DeviceAugmentConfig, gather_augment_encode,
    )
    from yolo_v1_tpu.data.pipeline import MAX_BOXES
    from yolo_v1_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = sys.argv[1:]
    batch = int(args[0]) if args and args[0].isdigit() else 32
    variants = [a for a in args if ":" in a] or [
        "band:take", "band_bf16:take", "shift:take", "band:pallas",
        "band_bf16:pallas",
    ]

    n_data = 512
    rng = np.random.default_rng(0)
    images_all = jnp.asarray(
        rng.integers(0, 255, (n_data, 448, 448, 3)).astype(np.uint8)
    )
    boxes_all = np.zeros((n_data, MAX_BOXES, 4), np.float32)
    boxes_all[:, 0] = [0.5, 0.5, 0.4, 0.4]
    boxes_all = jnp.asarray(boxes_all)
    labels_all = jnp.asarray(
        rng.integers(0, 20, (n_data, MAX_BOXES)).astype(np.int32)
    )
    counts_all = jnp.asarray(np.full((n_data,), 1, np.int32))
    key = jax.random.PRNGKey(0)
    idxs = [
        jnp.asarray(rng.permutation(n_data)[:batch].astype(np.int32))
        for _ in range(2)
    ]
    iters = 20

    results = {}
    for variant in variants:
        # blur:gather[:hsv[:warp_col_chunk]] — later fields optional.
        parts = variant.split(":")
        blur, gather = parts[0], parts[1]
        hsv = parts[2] if len(parts) > 2 else "algebraic"
        colchunk = int(parts[3]) if len(parts) > 3 else 128
        cfg = DeviceAugmentConfig(
            blur_impl=blur, gather_impl=gather, hsv_impl=hsv,
            warp_col_chunk=colchunk,
        )

        # AOT gate: real Mosaic lowering + temp-HBM analysis before any
        # on-chip execution.
        t0 = time.perf_counter()
        try:
            from functools import partial

            compiled = jax.jit(
                partial(gather_augment_encode, S=7, cfg=cfg)
            ).lower(
                jax.ShapeDtypeStruct((2,), jnp.uint32),
                images_all, boxes_all, labels_all, counts_all, idxs[0],
            ).compile()
            mem = compiled.memory_analysis()
            log(
                f"{variant}: AOT ok {time.perf_counter() - t0:.1f}s "
                f"temp={mem.temp_size_in_bytes / 1e9:.3f}GB"
            )
        except Exception as e:
            log(f"{variant}: AOT FAILED {type(e).__name__}: {e}")
            results[variant] = None
            continue

        def feed(i):
            return gather_augment_encode(
                jax.random.fold_in(key, i), images_all, boxes_all,
                labels_all, counts_all, idxs[i % 2], S=7, cfg=cfg,
            )

        t0 = time.perf_counter()
        np.asarray(feed(0)[1][:1])
        log(f"{variant}: first batch {time.perf_counter() - t0:.1f}s")

        def chain(n):
            t0 = time.perf_counter()
            out = None
            for i in range(n):
                out = feed(i)
            np.asarray(out[1][:1])
            return time.perf_counter() - t0

        t1 = min(chain(1) for _ in range(2))
        tn = min(chain(iters + 1) for _ in range(2))
        ms = (tn - t1) / iters * 1e3
        results[variant] = ms
        log(f"{variant}: {ms:.2f} ms/batch at bs{batch}")

    print({k: (round(v, 2) if v else None) for k, v in results.items()},
          flush=True)


if __name__ == "__main__":
    main()
