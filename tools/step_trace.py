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


def parse(out_dir: str, top: int = 40) -> None:
    """Print per-op device self-times from the captured xplane."""
    from xprof.convert import raw_to_tool_data as rtd

    files = glob.glob(f"{out_dir}/plugins/profile/*/*.xplane.pb")
    assert files, f"no xplane under {out_dir}"
    out, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    rows = json.loads(out) if isinstance(out, (str, bytes)) else out
    # framework_op_stats returns a list-of-dicts table (gviz json in some
    # versions); normalize both shapes.
    if isinstance(rows, dict) and "data" in rows:
        cols = [c["label"] for c in rows["cols"]]
        rows = [
            {cols[i]: (c or {}).get("v") for i, c in enumerate(r["c"])}
            for r in rows["rows"]
        ]
    device = [r for r in rows if str(r.get("host_or_device", "")).lower()
              .startswith("device") or "device" in str(r.get("Host/device", "")).lower()]
    if not device:
        device = rows
    key_time = next(
        (k for k in ("total_self_time_in_us", "self_time_us",
                     "Total self-time (us)", "avg_self_time_in_us")
         if device and k in device[0]),
        None,
    )
    key_name = next(
        (k for k in ("op_name", "Operation", "name") if device and k in device[0]),
        None,
    )
    log(f"columns: {list(device[0].keys()) if device else '??'}")
    device.sort(key=lambda r: -float(r.get(key_time, 0) or 0))
    total = sum(float(r.get(key_time, 0) or 0) for r in device)
    print(f"total device self time: {total / 1e3:.2f} ms over trace")
    for r in device[:top]:
        t = float(r.get(key_time, 0) or 0)
        print(f"{t / 1e3:9.3f} ms  {100 * t / total:5.1f}%  {r.get(key_name)}")


if __name__ == "__main__":
    if sys.argv[1:2] == ["--parse"]:
        parse(sys.argv[2] if len(sys.argv) > 2 else "/tmp/xprof_step")
    else:
        batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
        out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xprof_step"
        capture(batch, out)
