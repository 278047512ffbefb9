"""Hardware measurement harness for the round-2 perf questions.

Answers, on the real TPU chip, with the marginal-timing methodology from
bench.py (dispatch a pipelined chain, sync by fetching real output bytes,
subtract the single-call time):

  1. train-step throughput, resnet50-S7 bf16, assignment_impl xla vs
     pallas, at several batch sizes         (VERDICT items 2 + 4);
  2. serving decode+NMS impl comparison, xla vs pallas vs fused, both
     isolated (post-network, grid -> keep) and end-to-end (VERDICT item 5).

Results append to RESULTS_PATH as JSON lines; stages already present are
skipped, so the script is re-runnable under a 10-minute timeout until all
stages are done.  Run:  python tools/hw_measure.py [stage-prefix ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

RESULTS_PATH = os.environ.get("HW_RESULTS", "/tmp/hw_r2_results.jsonl")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def done_stages() -> set[str]:
    if not os.path.exists(RESULTS_PATH):
        return set()
    with open(RESULTS_PATH) as f:
        return {json.loads(line)["stage"] for line in f if line.strip()}


def record(stage: str, **kw) -> None:
    with open(RESULTS_PATH, "a") as f:
        f.write(json.dumps({"stage": stage, **kw}) + "\n")
    log(f"RESULT {stage}: {kw}")


def marginal_time(run_one, run_chain, iters: int) -> float:
    """Per-call seconds: (chain(iters+1) - chain(1)) / iters, best of 2."""
    t1 = min(run_one() for _ in range(2))
    tn = min(run_chain() for _ in range(2))
    return (tn - t1) / iters


# ---------------------------------------------------------------- train step


def make_state(S: int, dtype, remat: bool = False):
    import jax

    from yolo_v1_tpu.models.registry import build_model
    from yolo_v1_tpu.train.schedule import make_lr_schedule
    from yolo_v1_tpu.train.state import create_train_state, make_optimizer

    kwargs = {"remat": True} if remat else {}
    model = build_model("resnet50", S=S, dtype=dtype, **kwargs)
    schedule = make_lr_schedule(100, 1e-6, 1000, {1: 1e-3})
    tx = make_optimizer(schedule, "sgd", 0.99)
    return create_train_state(
        model, jax.random.PRNGKey(0), (1, 448, 448, 3), tx
    )


def fake_batch(bs: int, S: int, seed: int):
    """Random images + a sparse target grid (2 object cells per image)."""
    rng = np.random.default_rng(seed)
    images = rng.normal(0, 1, (bs, 448, 448, 3)).astype(np.float32)
    tgt = np.zeros((bs, S, S, 30), np.float32)
    for n in range(bs):
        for _ in range(2):
            i, j = rng.integers(0, S, 2)
            cls = rng.integers(0, 20)
            tgt[n, i, j, 0:2] = 1.0
            tgt[n, i, j, 2:6] = [0.5, 0.5, 0.2, 0.3]
            tgt[n, i, j, 6:10] = [0.5, 0.5, 0.2, 0.3]
            tgt[n, i, j, 10 + cls] = 1.0
    return images, tgt


def stage_train(stage: str, bs: int, impl: str, remat: bool = False) -> None:
    import jax.numpy as jnp

    from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig
    from yolo_v1_tpu.train.loop import jit_train_step

    S = 7
    cfg = YoloV1LossConfig(S=S, B=2, C=20, assignment_impl=impl)
    step = jit_train_step(cfg, mesh=None)
    state = make_state(S, jnp.bfloat16, remat=remat)
    images, targets = fake_batch(bs, S, 0)
    images2, targets2 = fake_batch(bs, S, 1)
    batches = [(jnp.asarray(images), jnp.asarray(targets)),
               (jnp.asarray(images2), jnp.asarray(targets2))]

    t0 = time.perf_counter()
    state, parts = step(state, *batches[0])
    float(parts["total"])
    compile_s = time.perf_counter() - t0
    log(f"{stage}: compile+first {compile_s:.1f}s")

    iters = 20
    state_box = [state]

    def chain(n: int) -> float:
        t0 = time.perf_counter()
        st = state_box[0]
        parts = None
        for i in range(n):
            st, parts = step(st, *batches[i % 2])
        float(parts["total"])  # sync: fetch real output bytes
        state_box[0] = st
        return time.perf_counter() - t0

    per = marginal_time(lambda: chain(1), lambda: chain(iters + 1), iters)
    record(stage, bs=bs, impl=impl, ms_per_step=round(per * 1e3, 2),
           imgs_per_sec=round(bs / per, 1), compile_s=round(compile_s, 1))


# -------------------------------------------------------- decode+NMS kernels


def fake_grid(bs: int, S: int, seed: int):
    """Sigmoid-like prediction grids (uniform [0,1]) — worst-case NMS load."""
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (bs, S, S, 30)).astype(np.float32)


def make_post(impl: str, S: int):
    """Jitted grid -> (keep-mask fetchable array) for one nms impl."""
    import jax
    import jax.numpy as jnp

    from yolo_v1_tpu.core.grid import decode_grid
    from yolo_v1_tpu.core.nms import nms_keep_mask

    def post(pred):
        boxes, scores, classes, valid = jax.vmap(
            partial(decode_grid, S=S, B=2, C=20, score_threshold=0.005)
        )(pred)
        if impl == "fused":
            from yolo_v1_tpu.ops.pallas.fused_decode_nms import (
                pallas_fused_decode_nms,
            )

            keep = pallas_fused_decode_nms(
                pred, S=S, B=2, C=20,
                score_threshold=0.005, iou_threshold=0.45,
            )
        elif impl == "pallas":
            from yolo_v1_tpu.ops.pallas.nms_kernel import pallas_nms_keep_mask

            keep = pallas_nms_keep_mask(
                boxes, scores, valid, iou_threshold=0.45
            )
        else:
            keep = jax.vmap(partial(nms_keep_mask, iou_threshold=0.45))(
                boxes, scores, valid
            )
        return jnp.clip(boxes, 0.0, 1.0), scores, classes, keep

    return jax.jit(post)


def stage_post(stage: str, impl: str, S: int, bs: int) -> None:
    import jax.numpy as jnp

    post = make_post(impl, S)
    grids = [jnp.asarray(fake_grid(bs, S, s)) for s in (0, 1)]

    t0 = time.perf_counter()
    np.asarray(post(grids[0])[3])
    compile_s = time.perf_counter() - t0
    log(f"{stage}: compile+first {compile_s:.1f}s")

    iters = 40

    def chain(n: int) -> float:
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = post(grids[i % 2])
        np.asarray(out[3])
        return time.perf_counter() - t0

    per = marginal_time(lambda: chain(1), lambda: chain(iters + 1), iters)
    record(stage, impl=impl, S=S, bs=bs, K=S * S * 2,
           ms_per_batch=round(per * 1e3, 3), compile_s=round(compile_s, 1))


def stage_serve(stage: str, impl: str, bs: int, int8: bool = False) -> None:
    import jax.numpy as jnp

    from yolo_v1_tpu.eval.voc_map import make_detector

    S = 7
    detector = make_detector(S=S, score_threshold=0.005, nms_threshold=0.45,
                             nms_impl=impl)
    state = make_state(S, jnp.bfloat16)
    if int8:
        from yolo_v1_tpu.eval.quantize import calibrate, quantize_state

        calib = np.random.default_rng(7).normal(0, 1, (32, 448, 448, 3))
        state = quantize_state(
            state, calibrate(state, [calib.astype(np.float32)])
        )
    rng = np.random.default_rng(0)
    imgs = [
        jnp.asarray(rng.normal(0, 1, (bs, 448, 448, 3)).astype(np.float32))
        for _ in range(2)
    ]

    t0 = time.perf_counter()
    np.asarray(detector(state, imgs[0])[1])
    compile_s = time.perf_counter() - t0
    log(f"{stage}: compile+first {compile_s:.1f}s")

    iters = 30

    def chain(n: int) -> float:
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = detector(state, imgs[i % 2])
        np.asarray(out[1])
        return time.perf_counter() - t0

    per = marginal_time(lambda: chain(1), lambda: chain(iters + 1), iters)
    record(stage, impl=impl, bs=bs, ms_per_batch=round(per * 1e3, 2),
           imgs_per_sec=round(bs / per, 1), compile_s=round(compile_s, 1))


def stage_exact(stage: str, S: int, bs: int) -> None:
    """Hardware keep-set exactness: xla vs pallas vs fused on real Mosaic
    (interpret-mode tests validate semantics, not the lowered kernel)."""
    import jax.numpy as jnp

    posts = {impl: make_post(impl, S) for impl in ("xla", "pallas", "fused")}
    mismatches = {}
    for seed in range(3):
        grid = jnp.asarray(fake_grid(bs, S, seed))
        keeps = {
            impl: np.asarray(post(grid)[3]) for impl, post in posts.items()
        }
        for impl in ("pallas", "fused"):
            d = int((keeps[impl] != keeps["xla"]).sum())
            mismatches[impl] = mismatches.get(impl, 0) + d
    record(stage, S=S, bs=bs, K=S * S * 2, keep_mismatches=mismatches)


STAGES = {}
for _bs in (32, 64, 128):
    for _impl in ("xla", "pallas"):
        STAGES[f"train_{_impl}_bs{_bs}"] = partial(
            stage_train, f"train_{_impl}_bs{_bs}", _bs, _impl
        )
for _bs in (128, 256):
    STAGES[f"train_xla_bs{_bs}_remat"] = partial(
        stage_train, f"train_xla_bs{_bs}_remat", _bs, "xla", remat=True
    )
for _impl in ("xla", "pallas", "fused"):
    STAGES[f"post_{_impl}_s7_bs128"] = partial(
        stage_post, f"post_{_impl}_s7_bs128", _impl, 7, 128
    )
    STAGES[f"post_{_impl}_s14_bs64"] = partial(
        stage_post, f"post_{_impl}_s14_bs64", _impl, 14, 64
    )
    STAGES[f"serve_{_impl}_bs128"] = partial(
        stage_serve, f"serve_{_impl}_bs128", _impl, 128
    )
STAGES["serve_int8_bs128"] = partial(
    stage_serve, "serve_int8_bs128", "xla", 128, int8=True
)
STAGES["serve_int8_bs256"] = partial(
    stage_serve, "serve_int8_bs256", "xla", 256, int8=True
)
STAGES["exact_keep_s7"] = partial(stage_exact, "exact_keep_s7", 7, 64)
STAGES["exact_keep_s14"] = partial(stage_exact, "exact_keep_s14", 14, 32)


def main() -> None:
    import jax

    if os.environ.get("HW_FORCE_CPU"):  # smoke-test the harness off-TPU
        jax.config.update("jax_platforms", "cpu")

    from yolo_v1_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"device: {jax.devices()[0]}")

    prefixes = sys.argv[1:] or [""]
    done = done_stages()
    for name, fn in STAGES.items():
        if name in done:
            log(f"skip (done): {name}")
            continue
        if not any(name.startswith(p) for p in prefixes):
            continue
        log(f"=== {name}")
        try:
            fn()
        except Exception as e:  # e.g. OOM at a too-big batch: keep going
            record(name, error=f"{type(e).__name__}: {e}"[:300])
    log("all requested stages complete")


if __name__ == "__main__":
    main()
