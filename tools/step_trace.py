"""Train-STEP XProf breakdown on hardware (VERDICT r2 item 2).

Round 2's device trace covered the input pipeline (augment ops) at bs32;
this tool traces the bare train step itself — no input pipeline, synthetic
device-resident batches — and prints the top device ops by self time plus
an fwd/bwd/optimizer attribution, the data DESIGN.md's step-breakdown
table is built from.

Usage (on the TPU):  python tools/step_trace.py [batch] [out_dir]
Then:                python tools/step_trace.py --parse [out_dir]
(Separate parse step so a relay hiccup during capture doesn't lose the
trace; parsing is pure host work.)
"""

from __future__ import annotations

import glob
import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def capture(batch: int, out_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig
    from yolo_v1_tpu.models.registry import build_model
    from yolo_v1_tpu.train.loop import jit_train_step
    from yolo_v1_tpu.train.schedule import make_lr_schedule
    from yolo_v1_tpu.train.state import create_train_state, make_optimizer
    from yolo_v1_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    S = 7
    model = build_model("resnet50", S=S, dtype=jnp.bfloat16)
    tx = make_optimizer(make_lr_schedule(100, 1e-6, 1000, {1: 1e-3}), "sgd", 0.99)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 448, 448, 3), tx
    )
    step = jit_train_step(YoloV1LossConfig(S=S), mesh=None)

    rng = np.random.default_rng(0)
    tgt = np.zeros((batch, S, S, 30), np.float32)
    tgt[:, 3, 3, 0:2] = 1.0
    tgt[:, 3, 3, 2:10] = 0.5
    tgt[:, 3, 3, 13] = 1.0
    batches = [
        (jnp.asarray(rng.normal(0, 1, (batch, 448, 448, 3)).astype(np.float32)),
         jnp.asarray(tgt))
        for _ in range(2)
    ]

    t0 = time.perf_counter()
    state, parts = step(state, *batches[0])
    float(parts["total"])
    log(f"compile+first: {time.perf_counter() - t0:.1f}s")

    jax.profiler.start_trace(out_dir)
    for i in range(6):
        state, parts = step(state, *batches[i % 2])
    float(parts["total"])
    jax.profiler.stop_trace()
    log(f"trace written to {out_dir}")


def parse(out_dir: str, top: int = 40, nsteps: int = 6) -> None:
    """Print per-op device self-times from the captured xplane.

    xprof's framework_op_stats is a LIST of gviz tables (with/without idle);
    normalize the first into dicts keyed by column id, keep Device rows,
    divide by the number of profiled steps, and attribute each op to a
    stage (fwd / bwd / BN / loss / optimizer) from its jit scope path.
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

    def stage_of(name: str) -> str:
        if "transpose(jvp" in name:
            return "bwd"
        if "/sgd/" in name or "apply_gradients" in name or "add_any" in name:
            return "optimizer"
        if "yolo_v1_loss" in name or "/loss" in name:
            return "loss"
        if "batch_norm" in name or "/bn" in name or "moving_" in name:
            return "bn-stats"
        if "jvp(ResNet" in name or "ResNet" in name or "conv" in name:
            return "fwd"
        return "other"

    total_us = sum(float(r.get("total_self_time", 0) or 0) for r in device)
    print(
        f"total device self time: {total_us / 1e3 / nsteps:.2f} ms/step "
        f"over {nsteps} steps ({len(device)} device ops)"
    )
    stages: dict[str, float] = {}
    for r in device:
        stages.setdefault(stage_of(str(r.get("operation", ""))), 0.0)
        stages[stage_of(str(r.get("operation", "")))] += float(
            r.get("total_self_time", 0) or 0
        )
    for s, us in sorted(stages.items(), key=lambda kv: -kv[1]):
        print(f"stage {s:>9}: {us / 1e3 / nsteps:8.2f} ms/step "
              f"({100 * us / total_us:5.1f}%)")
    device.sort(key=lambda r: -float(r.get("total_self_time", 0) or 0))
    print(f"top {top} ops (ms/step):")
    for r in device[:top]:
        t = float(r.get("total_self_time", 0) or 0) / 1e3 / nsteps
        flops = float(r.get("measured_flop_rate", 0) or 0)
        print(
            f"{t:9.3f} ms  {100 * float(r.get('total_self_time', 0) or 0) / total_us:5.1f}%  "
            f"{flops / 1e12:6.1f} TF/s  {r.get('operation')}"
        )


if __name__ == "__main__":
    if sys.argv[1:2] == ["--parse"]:
        parse(sys.argv[2] if len(sys.argv) > 2 else "/tmp/xprof_step")
    else:
        batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
        out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xprof_step"
        capture(batch, out)
