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

    # Remote-compiled programs are NOT locally cached on the relay path
    # (each distinct jit = minutes), so every invocation should run as few
    # programs as possible: --skip-exact drops the bit-exact stage,
    # --impl take|pallas times one implementation, positional ints pick
    # batch sizes.  Run the stages as separate invocations.
    skip_exact = "--skip-exact" in sys.argv
    impls = ("take", "pallas")
    if "--impl" in sys.argv:
        impls = (sys.argv[sys.argv.index("--impl") + 1],)

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    if not skip_exact:
        data = jnp.asarray(
            rng.integers(0, 255, (64, 448, 448, 3)).astype(np.uint8)
        )
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

    # Marginal-timed perf: XLA take vs the Pallas row-copy at the real
    # resident-feed shapes (the round-3 XProf table charged jnp.take
    # 6.8 ms per bs32 batch, ~100x off DMA; auto flips to 'pallas' only on
    # a measured win here).
    import time

    import jax

    data = jnp.asarray(
        rng.integers(0, 255, (512, 448, 448, 3)).astype(np.uint8)
    )
    pos = [a for a in sys.argv[1:] if a.isdigit()]
    bss = tuple(int(a) for a in pos) if pos else (32, 128)
    # data must be an ARGUMENT of the jitted fns — a closure capture would
    # embed the 308 MB tensor as an HLO constant and the relay's remote
    # compile rejects the payload (HTTP 413, observed live).
    all_impls = {
        "take": lambda d, i: jnp.take(d, i, axis=0),
        "pallas": lambda d, i: gather_rows_pallas(d, i),
    }
    for bs in bss:
        idxs = [
            jnp.asarray(rng.permutation(512)[:bs].astype(np.int32))
            for _ in range(2)
        ]
        for name in impls:
            jfn = jax.jit(all_impls[name])
            np.asarray(jfn(data, idxs[0]))  # compile

            def chain(n):
                t0 = time.perf_counter()
                out = None
                for i in range(n):
                    out = jfn(data, idxs[i % 2])
                np.asarray(out[:1])
                return time.perf_counter() - t0

            t1 = min(chain(1) for _ in range(2))
            tn = min(chain(21) for _ in range(2))
            ms = (tn - t1) / 20 * 1e3
            gbps = bs * 448 * 448 * 3 / (ms / 1e3) / 1e9
            print(f"bs{bs} {name:6s}: {ms:6.2f} ms/batch ({gbps:5.1f} GB/s)",
                  file=sys.stderr)
    print("OK")


if __name__ == "__main__":
    main()
