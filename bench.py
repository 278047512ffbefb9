"""Benchmark: batched inference + train-step throughput, flagship model.

Measures images/sec through the full serving path — ResNet-50-S7 bf16
forward + grid decode + NMS, all in one jit — on the default JAX device
(the real TPU chip under the driver), plus the full training step
(forward + YOLOv1 loss + backward + SGD + BN stats, one donated jit).
Baseline: the reference's recorded inference+eval loop throughput,
39.71 it/s at batch 1 on its CUDA GPU (BASELINE.md:
testCodes/resnet_result.txt "4861it [02:02, 39.71it/s]"); its logs record
no train-step timing, so the train number rides along as extra keys
(train_imgs_per_sec / train_ms_per_step, batch 128 — the measured knee of
the round-2 sweep: 563 @ bs32, 535 @ bs64, 592 @ bs128).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N,
   "train_imgs_per_sec": N, "train_ms_per_step": N}
Everything else goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_IPS = 39.71  # reference GPU inference it/s at bs=1


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from yolo_v1_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from yolo_v1_tpu.eval.voc_map import make_detector
    from yolo_v1_tpu.models.registry import build_model
    from yolo_v1_tpu.train.state import TrainState

    batch = 128  # throughput knee: 64 -> 2.5k, 128 -> 2.9k, 256 -> flat
    iters = 30
    dev = jax.devices()[0]
    log(f"device: {dev}, batch {batch}")

    model = build_model("resnet50", S=7, dtype=jnp.bfloat16)
    images = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (batch, 448, 448, 3)), jnp.float32
    )
    t0 = time.perf_counter()
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)
    log(f"init: {time.perf_counter() - t0:.1f}s")

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=None,
        opt_state=None,
    )
    detector = make_detector(S=7, score_threshold=0.005, nms_threshold=0.45)

    # Two distinct inputs so no layer of the stack can alias results.
    images2 = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (batch, 448, 448, 3)), jnp.float32
    )
    inputs = [images, images2]

    t0 = time.perf_counter()
    np.asarray(detector(state, images)[1])
    log(f"compile+first batch: {time.perf_counter() - t0:.1f}s")

    def run(n: int) -> float:
        """Dispatch n batches, fetch only the last result (device executes
        serially, so one final fetch syncs the chain).  block_until_ready is
        not trustworthy through tunneled-device relays — a host round-trip
        for real output data is."""
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = detector(state, inputs[i % 2])
        np.asarray(out[1])
        return time.perf_counter() - t0

    # Marginal per-batch time: subtract the single-batch time (which is
    # dominated by host<->device latency) from a long pipelined chain.
    t1 = min(run(1) for _ in range(2))
    tn = min(run(iters + 1) for _ in range(2))
    per_batch = (tn - t1) / iters
    ips = batch / per_batch
    log(
        f"t1={t1 * 1e3:.1f}ms t{iters + 1}={tn * 1e3:.1f}ms -> "
        f"{per_batch * 1e3:.2f}ms/batch, {ips:.1f} images/sec"
    )

    # int8 serving variant (W8A8 convs, eval/quantize.py): measured +25%
    # over bf16 at mAP parity (0.99839 vs 0.99842 on the synthetic run).
    from yolo_v1_tpu.eval.quantize import calibrate, quantize_state

    # Two varied calibration batches (round-2 used one — the scales were
    # hostage to a single draw).
    qstate = quantize_state(
        state, calibrate(state, [np.asarray(images), np.asarray(images2)])
    )
    t0 = time.perf_counter()
    np.asarray(detector(qstate, images)[1])
    log(f"int8 compile+first batch: {time.perf_counter() - t0:.1f}s")

    def run_q(n: int) -> float:
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = detector(qstate, inputs[i % 2])
        np.asarray(out[1])
        return time.perf_counter() - t0

    tq1 = min(run_q(1) for _ in range(2))
    tqn = min(run_q(iters + 1) for _ in range(2))
    int8_ips = batch / ((tqn - tq1) / iters)
    log(f"int8: {int8_ips:.1f} images/sec")

    # Release the serving phase's HBM (two 308 MB input batches, the bf16 +
    # int8 states and their compiled workspaces) before the train step
    # allocates bs-128 activations — measured to RESOURCE_EXHAUST otherwise.
    import gc

    del detector, qstate, state, variables, images, images2, inputs
    gc.collect()

    try:
        train_ips, train_ms = bench_train_step()
    except Exception as e:  # residual fragmentation: fall back to bs 64
        log(f"train bench at bs128 failed ({type(e).__name__}); retrying bs64")
        train_ips, train_ms = bench_train_step(batch=64)

    gc.collect()
    # Subprocess isolation: the serving + bs128 phases leave the 16 GB chip
    # fragmented enough to RESOURCE_EXHAUST the e2e stage's augment
    # intermediates (measured); a fresh process gets a clean HBM and its
    # programs come from the compilation cache.
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, __file__, "--e2e"],
            capture_output=True, text=True, timeout=3000,
        )
        log(out.stderr[-2000:])
        e2e = json.loads(out.stdout.strip().splitlines()[-1])
        e2e_ips, aug_ms = e2e["e2e_ips"], e2e["aug_ms"]
    except Exception as e:
        log(f"e2e train bench failed ({type(e).__name__}: {e}); omitting")
        e2e_ips, aug_ms = 0.0, 0.0

    print(
        json.dumps(
            {
                "metric": "resnet50_s7_bf16_batched_inference_448px",
                "value": round(ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(ips / BASELINE_IPS, 2),
                "int8_imgs_per_sec": round(int8_ips, 1),
                "int8_vs_baseline": round(int8_ips / BASELINE_IPS, 2),
                "train_imgs_per_sec": round(train_ips, 1),
                "train_ms_per_step": round(train_ms, 2),
                "train_e2e_imgs_per_sec": round(e2e_ips, 1),
                "augment_ms_per_batch": round(aug_ms, 2),
            }
        )
    )


def bench_train_step(batch: int = 128, iters: int = 15) -> tuple[float, float]:
    """Full train-step throughput (fwd+loss+bwd+SGD+BN), marginal timing."""
    import jax.numpy as jnp

    from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig
    from yolo_v1_tpu.models.registry import build_model
    from yolo_v1_tpu.train.loop import jit_train_step
    from yolo_v1_tpu.train.schedule import make_lr_schedule
    from yolo_v1_tpu.train.state import create_train_state, make_optimizer

    S = 7
    model = build_model("resnet50", S=S, dtype=jnp.bfloat16)
    tx = make_optimizer(make_lr_schedule(100, 1e-6, 1000, {1: 1e-3}), "sgd", 0.99)
    state = create_train_state(model, __import__("jax").random.PRNGKey(0),
                               (1, 448, 448, 3), tx)
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
    log(f"train compile+first: {time.perf_counter() - t0:.1f}s")

    state_box = [state]

    def chain(n: int) -> float:
        t0 = time.perf_counter()
        st, parts = state_box[0], None
        for i in range(n):
            st, parts = step(st, *batches[i % 2])
        float(parts["total"])  # sync through real output bytes
        state_box[0] = st
        return time.perf_counter() - t0

    t1 = min(chain(1) for _ in range(2))
    tn = min(chain(iters + 1) for _ in range(2))
    per = (tn - t1) / iters
    log(f"train: {per * 1e3:.2f}ms/step, {batch / per:.1f} images/sec")
    return batch / per, per * 1e3


def bench_train_e2e(
    batch: int = 32, n_data: int = 512, iters: int = 10
) -> tuple[float, float]:
    """END-TO-END training throughput: HBM-resident uint8 dataset ->
    gather + device augmentation (banded affine warp, pixel ops, HSV,
    blur) + normalize + target encode -> full train step, per batch.

    This is the number a real `cli train --device_resident` epoch runs at
    in steady state (the reference's YOLODataLoader.py:69-76 augmentation
    hot loop + train.py:144-209 step, fused on-device).  History: round 2
    realized 86 img/s (per-pixel gather warp, 244 ms/batch augment);
    round 3 measured 122 (banded XLA warp) then **377 img/s** with the
    Pallas row-resample warp kernel (augment 28 ms/batch — the default
    `warp_impl='auto'` picks it on TPU).  Also returns the augment
    program's own ms/batch.
    """
    import jax
    import jax.numpy as jnp

    from yolo_v1_tpu.data.device_augment import (
        DeviceAugmentConfig, gather_augment_encode,
    )
    from yolo_v1_tpu.data.pipeline import MAX_BOXES, epoch_plan
    from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig
    from yolo_v1_tpu.models.registry import build_model
    from yolo_v1_tpu.train.loop import jit_train_step
    from yolo_v1_tpu.train.schedule import make_lr_schedule
    from yolo_v1_tpu.train.state import create_train_state, make_optimizer

    S = 7
    rng = np.random.default_rng(0)
    images_all = jnp.asarray(
        rng.integers(0, 255, (n_data, 448, 448, 3)).astype(np.uint8)
    )
    boxes_all = np.zeros((n_data, MAX_BOXES, 4), np.float32)
    boxes_all[:, 0] = [0.5, 0.5, 0.4, 0.4]
    boxes_all[:, 1] = [0.25, 0.25, 0.2, 0.2]
    boxes_all = jnp.asarray(boxes_all)
    labels_all = jnp.asarray(
        rng.integers(0, 20, (n_data, MAX_BOXES)).astype(np.int32)
    )
    counts_all = jnp.asarray(np.full((n_data,), 2, np.int32))
    acfg = DeviceAugmentConfig()

    model = build_model("resnet50", S=S, dtype=jnp.bfloat16)
    tx = make_optimizer(make_lr_schedule(100, 1e-6, 1000, {1: 1e-3}), "sgd", 0.99)
    state = create_train_state(model, __import__("jax").random.PRNGKey(0),
                               (1, 448, 448, 3), tx)
    step = jit_train_step(YoloV1LossConfig(S=S), mesh=None)

    plan, _ = epoch_plan(0, 0, n_data, batch)
    plans = [jnp.asarray(plan[i % plan.shape[0]]) for i in range(2)]
    key = jax.random.PRNGKey(0)

    def feed(i):
        return gather_augment_encode(
            jax.random.fold_in(key, i), images_all, boxes_all, labels_all,
            counts_all, plans[i % 2], S=S, B=2, C=20, cfg=acfg,
        )

    t0 = time.perf_counter()
    imgs, tgts = feed(0)
    state, parts = step(state, imgs, tgts)
    float(parts["total"])
    log(f"e2e compile+first: {time.perf_counter() - t0:.1f}s")

    state_box = [state]

    def chain(n: int) -> float:
        t0 = time.perf_counter()
        st, parts = state_box[0], None
        for i in range(n):
            imgs, tgts = feed(i)
            st, parts = step(st, imgs, tgts)
        float(parts["total"])
        state_box[0] = st
        return time.perf_counter() - t0

    t1 = min(chain(1) for _ in range(2))
    tn = min(chain(iters + 1) for _ in range(2))
    per = (tn - t1) / iters
    log(f"e2e train: {per * 1e3:.2f}ms/batch, {batch / per:.1f} images/sec")

    # Augment program alone (the input-pipeline share of the e2e time).
    def aug_chain(n: int) -> float:
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = feed(i)
        np.asarray(out[1][:1])
        return time.perf_counter() - t0

    a1 = min(aug_chain(1) for _ in range(2))
    an = min(aug_chain(iters + 1) for _ in range(2))
    aug_ms = (an - a1) / iters * 1e3
    log(f"augment program: {aug_ms:.2f}ms/batch at bs{batch}")
    return batch / per, aug_ms


def wait_for_device(max_wait_s: float = 2700, probe_timeout_s: float = 240) -> bool:
    """Bounded availability gate for the tunneled TPU relay, which has
    measured multi-hour outages (docs/DESIGN.md; backend init then hangs
    ~4 min per attempt before erroring UNAVAILABLE).  Probes in a
    subprocess — an init failure must not poison this process's backend —
    until a tiny matmul answers or the budget is spent."""
    import subprocess

    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; x = jax.numpy.ones((256, 256)); "
                 "print(float((x @ x).sum()))"],
                capture_output=True, timeout=probe_timeout_s,
            )
            if r.returncode == 0:
                log(f"device probe ok ({time.perf_counter() - t0:.0f}s)")
                return True
        except subprocess.TimeoutExpired:
            pass
        log(f"device probe {attempt} failed ({time.perf_counter() - t0:.0f}s)")
        if time.monotonic() > deadline:
            return False
        time.sleep(30)


def _error_json(reason: str) -> None:
    """Always emit the ONE expected JSON line, honestly zeroed, so a relay
    outage at bench time records as an explicit error instead of a hang."""
    print(json.dumps({
        "metric": "resnet50_s7_bf16_batched_inference_448px",
        "value": 0.0,
        "unit": "images/sec",
        "vs_baseline": 0.0,
        "error": reason,
    }))


if __name__ == "__main__":
    if "--e2e" in sys.argv:
        ips, aug = bench_train_e2e()
        print(json.dumps({"e2e_ips": ips, "aug_ms": aug}))
    elif not wait_for_device():
        _error_json("tpu_relay_unavailable")
    else:
        try:
            main()
        except Exception as e:  # relay died mid-bench: still one JSON line
            log(f"bench failed: {type(e).__name__}: {e}")
            _error_json(f"{type(e).__name__}: {e}"[:200])
