"""A/B the Pallas warp's column-chunked tap windows on hardware.

Round-4 XProf attributed 22.5 ms of the 56.5 ms bs128 augment program to
the Pallas warp (both passes), with full-row tap windows doing D8=80 taps
per output row when bilinear needs 2.  Column-chunking the windows
(ops/pallas/warp_kernel.py round 5) shrinks D8 to 40/32 per 128/64-pixel
chunk — nominally ~2.1x less VPU arithmetic.  This probe measures it:

  1. AOT lower+compile both variants (catches Mosaic lowering failures
     without wedging the chip — the round-2 lesson);
  2. hardware agreement check (f32-rounding tolerance — the compiled
     graphs associate p differently, see the interpret-mode chunk test);
  3. marginal-timed warp chain at the production shape per variant.

Usage (TPU):  python tools/warp_chunk_probe.py [batch] [chunk ...]
  default: batch 128, chunks 0 (full-row) and 128.
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
        DeviceAugmentConfig, _affine_params, _pallas_warp_bounds,
    )
    from yolo_v1_tpu.ops.pallas.warp_kernel import warp_image_band_pallas
    from yolo_v1_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = [a for a in sys.argv[1:]]
    batch = int(args[0]) if args else 128
    chunks = [int(a) for a in args[1:]] or [0, 128]

    cfg = DeviceAugmentConfig()
    cc_a, cc_b, cr_max = _pallas_warp_bounds(cfg)
    rng = np.random.default_rng(0)
    size = 448
    imgs = [
        jnp.asarray(rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32))
        for _ in range(2)
    ]
    rss, offs = [], []
    for i in range(batch):
        rs, off = _affine_params(jax.random.PRNGKey(i), size, cfg)
        rss.append(rs)
        offs.append(off)
    rs_b, off_b = jnp.stack(rss), jnp.stack(offs)

    fns, outs = {}, {}
    for ck in chunks:
        fn = jax.jit(
            lambda im, rs, off, _ck=ck: warp_image_band_pallas(
                im, rs, off, cc_a=cc_a, cc_b=cc_b, cr_max=cr_max,
                col_chunk=_ck,
            )
        )
        t0 = time.perf_counter()
        lowered = fn.lower(imgs[0], rs_b, off_b)
        compiled = lowered.compile()  # AOT: Mosaic failure lands HERE
        log(f"chunk={ck}: AOT compile ok ({time.perf_counter() - t0:.1f}s)")
        fns[ck] = fn
        outs[ck] = np.asarray(fn(imgs[0], rs_b, off_b)[:2])

    ref = outs[chunks[0]]
    for ck in chunks[1:]:
        err = np.abs(outs[ck] - ref).max()
        log(f"chunk={ck} vs chunk={chunks[0]}: max |diff| {err:.2e}")
        assert err < 1e-4, err

    for ck in chunks:
        fn = fns[ck]

        def chain(n):
            t0 = time.perf_counter()
            out = None
            for i in range(n):
                out = fn(imgs[i % 2], rs_b, off_b)
            np.asarray(out[:1])
            return time.perf_counter() - t0

        t1 = min(chain(1) for _ in range(2))
        tn = min(chain(11) for _ in range(2))
        ms = (tn - t1) / 10 * 1e3
        log(f"chunk={ck}: {ms:7.2f} ms/batch (both passes, bs{batch})")
    print("OK")


if __name__ == "__main__":
    main()
