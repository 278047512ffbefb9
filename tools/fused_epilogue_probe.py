"""Measure (don't declare) the fused-epilogue MFU lever — VERDICT r4 #4.

The round-4 roofline appendix bounds the resnet50 train step at 121.2 ms
(summed no-overlap floor) vs 216.5 ms measured, and attributes part of
the gap to the residual/BN elementwise chain; "fuse it into conv
epilogues beyond XLA's choices" was named but never measured.  This probe
measures it at the ResNet layer1 bottleneck-exit shape on hardware:

  A. conv1x1(64->256) alone                          (the MXU baseline)
  B. conv + XLA epilogue  relu(y*s + b + res)        (XLA's own fusion)
  C. conv + Pallas fused_epilogue                    (the custom kernel)
  D. epilogue alone: XLA vs Pallas                   (isolated chain)
  E. value_and_grad of mean(chain): XLA vs Pallas    (backward too)

If B-A ≈ D's cost, XLA did NOT fuse the chain into the conv and a custom
fused-block kernel has headroom ≈ D; if B ≈ A + ~0 and C >= B, the lever
is a measured negative and the round-4 claim closes.  Numbers go in
docs/DESIGN.md either way.

Run on the TPU path:  python tools/fused_epilogue_probe.py [bs]
(each variant is one small compiled program; ~minutes total through the
relay).  Timing: marginal chain (t21 - t1)/20 with a real output fetch —
block_until_ready lies through the relay (CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def step_mode(bs: int, impls) -> None:
    """FULL bs-`bs` resnet50-S7 train step with epilogue='xla' vs
    'pallas' — the measurement that decides the model default (the
    Conv1x1Dot precedent: isolated wins can invert inside the full
    step)."""
    import jax
    import jax.numpy as jnp

    from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig
    from yolo_v1_tpu.models.registry import build_model
    from yolo_v1_tpu.train.loop import jit_train_step
    from yolo_v1_tpu.train.schedule import make_lr_schedule
    from yolo_v1_tpu.train.state import create_train_state, make_optimizer
    from yolo_v1_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    tgt = np.zeros((bs, 7, 7, 30), np.float32)
    tgt[:, 3, 3, 0:2] = 1.0
    tgt[:, 3, 3, 2:10] = 0.5
    tgt[:, 3, 3, 13] = 1.0
    batches = [
        (jnp.asarray(rng.normal(0, 1, (bs, 448, 448, 3)).astype(np.float32)),
         jnp.asarray(tgt))
        for _ in range(2)
    ]
    for impl in impls:
        model = build_model(
            "resnet50", S=7, dtype=jnp.bfloat16, epilogue=impl
        )
        tx = make_optimizer(
            make_lr_schedule(100, 1e-6, 1000, {1: 1e-3}), "sgd", 0.99
        )
        state = create_train_state(
            model, jax.random.PRNGKey(0), (1, 448, 448, 3), tx
        )
        step = jit_train_step(YoloV1LossConfig(S=7), mesh=None)
        t0 = time.perf_counter()
        state, parts = step(state, *batches[0])
        loss0 = float(parts["total"])
        log(f"epilogue={impl}: compile+first {time.perf_counter() - t0:.1f}s "
            f"loss {loss0:.4f}")
        box = [state]

        def chain(n):
            t0 = time.perf_counter()
            st, parts = box[0], None
            for i in range(n):
                st, parts = step(st, *batches[i % 2])
            float(parts["total"])
            box[0] = st
            return time.perf_counter() - t0

        t1 = min(chain(1) for _ in range(2))
        tn = min(chain(16) for _ in range(2))
        ms = (tn - t1) / 15 * 1e3
        print(
            f"STEP epilogue={impl}: {ms:.2f} ms/step, "
            f"{bs / (ms / 1e3):.1f} img/s (bs{bs})"
        )
        del state, step, model, box
        import gc

        gc.collect()


def main() -> None:
    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    from yolo_v1_tpu.ops.pallas.fused_epilogue import fused_epilogue
    from yolo_v1_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    pos = [a for a in sys.argv[1:] if a.isdigit()]
    bs = int(pos[0]) if pos else 32
    only = [a for a in sys.argv[1:] if not a.isdigit()]
    H = W = 112
    Cin, Cout = 64, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (bs, H, W, Cin)).astype(np.float32)).astype(jnp.bfloat16)
    res = jnp.asarray(rng.normal(0, 1, (bs, H, W, Cout)).astype(np.float32)).astype(jnp.bfloat16)
    y0 = jnp.asarray(rng.normal(0, 1, (bs, H, W, Cout)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 0.05, (1, 1, Cin, Cout)).astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, Cout).astype(np.float32))
    shift = jnp.asarray(rng.normal(0, 0.1, Cout).astype(np.float32))

    # Pure-bf16 conv (f32 MXU accumulation is implicit on TPU): a mixed
    # f32 cotangent into the bf16 transposed conv is a dtype error in the
    # grad variants otherwise.
    conv = lambda x, k: jax.lax.conv_general_dilated(  # noqa: E731
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    def xla_epi(y, res, s, b):
        return jnp.maximum(
            y.astype(jnp.float32) * s + b + res.astype(jnp.float32), 0.0
        ).astype(y.dtype)

    variants = {
        "A_conv_alone": jax.jit(lambda x, k: conv(x, k)),
        "B_conv_xla_epi": jax.jit(
            lambda x, k, res, s, b: xla_epi(conv(x, k), res, s, b)
        ),
        "C_conv_pallas_epi": jax.jit(
            lambda x, k, res, s, b: fused_epilogue(conv(x, k), res, s, b)
        ),
        "D_epi_xla": jax.jit(lambda y, res, s, b: xla_epi(y, res, s, b)),
        "D_epi_pallas": jax.jit(
            lambda y, res, s, b: fused_epilogue(y, res, s, b)
        ),
        "E_grad_xla": jax.jit(
            jax.grad(
                lambda x, k, res, s, b: jnp.mean(
                    xla_epi(conv(x, k), res, s, b).astype(jnp.float32)
                )
            )
        ),
        "E_grad_pallas": jax.jit(
            jax.grad(
                lambda x, k, res, s, b: jnp.mean(
                    fused_epilogue(conv(x, k), res, s, b).astype(jnp.float32)
                )
            )
        ),
    }
    args = {
        "A_conv_alone": (x, k),
        "B_conv_xla_epi": (x, k, res, scale, shift),
        "C_conv_pallas_epi": (x, k, res, scale, shift),
        "D_epi_xla": (y0, res, scale, shift),
        "D_epi_pallas": (y0, res, scale, shift),
        "E_grad_xla": (x, k, res, scale, shift),
        "E_grad_pallas": (x, k, res, scale, shift),
    }

    if only:  # subset selection for incremental retries (slow relay)
        variants = {
            k: v for k, v in variants.items()
            if any(k.startswith(o) for o in only)
        }
    log(f"variants: {list(variants)} bs={bs}")

    if "B_conv_xla_epi" in variants and "C_conv_pallas_epi" in variants:
        # Correctness (cheap, same programs).
        b_out = np.asarray(variants["B_conv_xla_epi"](*args["B_conv_xla_epi"]), np.float32)
        c_out = np.asarray(variants["C_conv_pallas_epi"](*args["C_conv_pallas_epi"]), np.float32)
        err = np.abs(b_out - c_out).max()
        print(f"conv+epilogue XLA vs Pallas max |diff|: {err:.2e}", file=sys.stderr)
        assert err < 0.05, err  # bf16 out, f32 math both sides

    results = {}
    for name, fn in variants.items():
        a = args[name]
        out = fn(*a)
        np.asarray(jax.tree.leaves(out)[0][:1])  # compile + settle

        def chain(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = fn(*a)
            np.asarray(jax.tree.leaves(o)[0][:1])
            return time.perf_counter() - t0

        t1 = min(chain(1) for _ in range(2))
        tn = min(chain(21) for _ in range(2))
        ms = (tn - t1) / 20 * 1e3
        results[name] = ms
        print(f"{name:18s}: {ms:7.3f} ms  (bs{bs})", file=sys.stderr)

    g = results.get
    if g("A_conv_alone") and g("B_conv_xla_epi"):
        print(
            f"XLA epilogue cost attached to conv: "
            f"{g('B_conv_xla_epi') - g('A_conv_alone'):.3f} ms vs isolated "
            f"{g('D_epi_xla', float('nan')):.3f} ms; Pallas isolated "
            f"{g('D_epi_pallas', float('nan')):.3f} ms", file=sys.stderr,
        )
    if g("B_conv_xla_epi") and g("C_conv_pallas_epi"):
        print(
            "fused-epilogue delta (conv+epi, Pallas - XLA): "
            f"{g('C_conv_pallas_epi') - g('B_conv_xla_epi'):+.3f} ms"
        )
    if g("E_grad_xla") and g("E_grad_pallas"):
        print(
            f"grad delta: {g('E_grad_pallas') - g('E_grad_xla'):+.3f} ms"
        )


if __name__ == "__main__":
    if "--step" in sys.argv:
        pos = [a for a in sys.argv[1:] if a.isdigit()]
        impls = [a for a in sys.argv[1:] if a in ("xla", "pallas")] or [
            "xla", "pallas"
        ]
        step_mode(int(pos[0]) if pos else 128, impls)
    else:
        main()
