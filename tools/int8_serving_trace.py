"""int8 serving XProf breakdown + calibration-size sensitivity (VERDICT r2 #7).

Round 2 measured int8 serving at +25% over bf16 and named "fold the
dequant rescale into the conv epilogue" as the next lever (DESIGN.md int8
section).  Before building that fold, this tool measures its CEILING: an
XProf device trace of the quantized serving program (forward + decode +
NMS, the same jit `cli map --int8` runs), with every device op attributed
to conv (int8 MXU work) / elementwise (quantize, rescale, BN, relu — the
only time an epilogue fold could recover) / decode+NMS / other.

Also runs the calibration-size sensitivity study the round-2 verdict asked
for: per-conv isolated |f32 - int8| relative-L2 error (eval/quantize.py::
per_conv_quant_error) as a function of how many batches set the static
activation scales, on a TRAINED checkpoint with hard-tier synthetic images
(realistic activation distributions, not noise).

Usage (on the TPU):
  python tools/int8_serving_trace.py capture [batch] [out_dir]
  python tools/int8_serving_trace.py --parse [out_dir] [batch]
  python tools/int8_serving_trace.py --calib <run_dir> [n_batches...]
"""

from __future__ import annotations

import glob
import json
import sys
import time

import numpy as np

NSTEPS = 6  # profiled detector calls


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _build_quantized(batch: int):
    import jax
    import jax.numpy as jnp

    from yolo_v1_tpu.eval.quantize import calibrate, quantize_state
    from yolo_v1_tpu.eval.voc_map import make_detector
    from yolo_v1_tpu.models.registry import build_model
    from yolo_v1_tpu.train.state import TrainState
    from yolo_v1_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    model = build_model("resnet50", S=7, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = [
        jnp.asarray(rng.normal(0, 1, (batch, 448, 448, 3)), jnp.float32)
        for _ in range(2)
    ]
    variables = model.init(jax.random.PRNGKey(0), images[0][:1], train=False)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), apply_fn=model.apply,
        params=variables["params"], batch_stats=variables["batch_stats"],
        tx=None, opt_state=None,
    )
    qstate = quantize_state(
        state, calibrate(state, [np.asarray(x) for x in images])
    )
    detector = make_detector(S=7, score_threshold=0.005, nms_threshold=0.45)
    return detector, qstate, images


def capture(batch: int, out_dir: str) -> None:
    import jax

    detector, qstate, images = _build_quantized(batch)
    t0 = time.perf_counter()
    np.asarray(detector(qstate, images[0])[1])
    log(f"int8 compile+first: {time.perf_counter() - t0:.1f}s")

    jax.profiler.start_trace(out_dir)
    out = None
    for i in range(NSTEPS):
        out = detector(qstate, images[i % 2])
    np.asarray(out[1])
    jax.profiler.stop_trace()
    log(f"trace written to {out_dir}")


def parse(out_dir: str, batch: int, top: int = 30) -> None:
    """Attribute device self time: conv / elementwise / decode+NMS / other.

    The elementwise bucket (activation quantize round+clip, the per-channel
    dequant multiply, BN affine, relu, residual adds — XLA emits these as
    `fusion` ops around the `convolution` ops) is the CEILING of the
    rescale-into-epilogue lever: a perfect fold can recover at most this.
    """
    from xprof.convert import raw_to_tool_data as rtd

    files = glob.glob(f"{out_dir}/plugins/profile/*/*.xplane.pb")
    assert files, f"no xplane under {out_dir}"
    out, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    data = json.loads(out) if isinstance(out, (str, bytes)) else out
    if isinstance(data, dict):
        data = data.get("data", data)
    if isinstance(data, list) and data and "cols" in data[0]:
        table = data[0]
        cols = [c.get("id") or c.get("label") for c in table["cols"]]
        rows = [
            {cols[i]: (c or {}).get("v") for i, c in enumerate(r["c"])}
            for r in table["rows"]
        ]
    else:
        rows = data
    device = [
        r for r in rows
        if str(r.get("host_or_device", "")).lower().startswith("device")
    ]

    def bucket(name: str) -> str:
        low = name.lower()
        if "decode" in low or "nms" in low or "sort" in low or "top_k" in low:
            return "decode+nms"
        if "conv" in low:
            return "conv(int8)"
        if any(t in low for t in (
            "fusion", "round", "clip", "divide", "multiply", "add",
            "maximum", "select", "convert", "reduce", "subtract", "copy",
            "transpose", "reshape", "broadcast",
        )):
            return "elementwise"
        return "other"

    total_us = sum(float(r.get("total_self_time", 0) or 0) for r in device)
    print(
        f"total device self time: {total_us / 1e3 / NSTEPS:.2f} ms/batch "
        f"over {NSTEPS} calls ({len(device)} device ops), bs{batch} -> "
        f"{batch / (total_us / 1e6 / NSTEPS):.0f} img/s device-bound"
    )
    buckets: dict[str, float] = {}
    for r in device:
        b = bucket(str(r.get("operation", "")))
        buckets[b] = buckets.get(b, 0.0) + float(
            r.get("total_self_time", 0) or 0
        )
    for b, us in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"bucket {b:>11}: {us / 1e3 / NSTEPS:8.2f} ms/batch "
              f"({100 * us / total_us:5.1f}%)")
    device.sort(key=lambda r: -float(r.get("total_self_time", 0) or 0))
    print(f"top {top} ops (ms/batch):")
    for r in device[:top]:
        t = float(r.get("total_self_time", 0) or 0) / 1e3 / NSTEPS
        flops = float(r.get("measured_flop_rate", 0) or 0)
        print(
            f"{t:9.3f} ms  "
            f"{100 * float(r.get('total_self_time', 0) or 0) / total_us:5.1f}%  "
            f"{flops / 1e12:6.1f} TF/s  {r.get('operation')}"
        )


def calib_sensitivity(run_dir: str, sizes: list[int]) -> None:
    """Per-conv int8 error vs number of calibration batches, on a trained
    checkpoint with hard-tier synthetic images (data/synthetic.py streams).
    """
    import jax
    import jax.numpy as jnp

    from yolo_v1_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    from yolo_v1_tpu.data.synthetic import generate_image
    from yolo_v1_tpu.eval.quantize import calibrate, per_conv_quant_error
    from yolo_v1_tpu.models.registry import build_model
    from yolo_v1_tpu.train.checkpoint import CheckpointManager
    from yolo_v1_tpu.train.schedule import make_lr_schedule
    from yolo_v1_tpu.train.state import create_train_state, make_optimizer
    from yolo_v1_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    model = build_model("resnet50", S=7, dtype=jnp.bfloat16)
    tx = make_optimizer(make_lr_schedule(100, 1e-6, 1000, {1: 1e-3}), "sgd", 0.99)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 448, 448, 3), tx)
    state, epoch, _ = CheckpointManager(run_dir).restore(state, best=True)
    log(f"restored {run_dir} best (epoch {epoch})")

    bs, n_need = 8, max(sizes) + 1  # +1: held-out batch never calibrated on
    imgs = []
    for i in range(n_need * bs):
        rng = np.random.default_rng(np.random.SeedSequence([7, 3, i]))
        img, _ = generate_image(rng, 448, 20, hard=True)
        imgs.append(
            (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        )
    batches = [
        np.stack(imgs[i * bs:(i + 1) * bs]) for i in range(n_need)
    ]
    held_out = batches[-1]  # error always measured on the same final batch

    rows = []
    full_amax = None
    for n in sizes:
        amax = calibrate(state, batches[:n])
        if n == max(sizes):
            full_amax = amax
        errs = per_conv_quant_error(state, amax, held_out)
        vals = sorted(errs.values())
        worst = max(errs.items(), key=lambda kv: kv[1])
        rows.append((n, float(np.median(vals)), vals[-1], worst[0]))
        log(f"N={n:2d}: median rel-L2 {rows[-1][1]:.4f}  "
            f"max {rows[-1][2]:.4f} @ {worst[0]}")
    # Scale drift: how much each conv's amax at N=1 undershoots the
    # largest-N estimate (the failure mode single-batch calibration risks).
    amax1 = calibrate(state, batches[:1])
    drift = {
        k: full_amax[k] / max(amax1[k], 1e-12) for k in full_amax
    }
    dvals = sorted(drift.values())
    log(
        f"amax drift N=1 -> N={max(sizes)}: median x{np.median(dvals):.3f}, "
        f"max x{dvals[-1]:.3f} @ "
        f"{max(drift.items(), key=lambda kv: kv[1])[0]}"
    )
    print(json.dumps({
        "rows": [
            {"n_batches": n, "median_rel_l2": m, "max_rel_l2": x, "worst": w}
            for n, m, x, w in rows
        ],
        "amax_drift_median": float(np.median(dvals)),
        "amax_drift_max": float(dvals[-1]),
    }))


if __name__ == "__main__":
    if sys.argv[1:2] == ["--parse"]:
        parse(
            sys.argv[2] if len(sys.argv) > 2 else "/tmp/xprof_int8",
            int(sys.argv[3]) if len(sys.argv) > 3 else 128,
        )
    elif sys.argv[1:2] == ["--calib"]:
        run_dir = sys.argv[2]
        sizes = [int(s) for s in sys.argv[3:]] or [1, 2, 4, 8, 16]
        calib_sensitivity(run_dir, sizes)
    else:
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
        out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/xprof_int8"
        capture(batch, out)
