"""Dataclass configuration replacing the reference's module-level constants
(`/root/reference/train.py:34-57`) and hardcoded name lists
(eval.py:58-62, run_voc_mAP.py:34-44)."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass
class ExperimentConfig:
    # model (train.py:40-42, 56-57)
    backbone: str = "resnet50"
    S: int = 14  # train.py:41
    B: int = 2
    num_classes: int = 20
    bf16: bool = True

    # loss (train.py:43-44)
    lambda_coord: float = 5.0
    lambda_noobj: float = 0.5
    # Scale lambda_noobj by (7/S)^2 so the per-image no-object MSE mass is
    # independent of the grid size.  Measured (docs/DESIGN.md "S=14: the
    # confidence-collapse finding", runs/synth_r50_s14*): the raw reference
    # recipe (S=14, lambda_noobj=0.5, train.py:41-44) drives the confidence
    # head to sigmoid ~1e-9 within ~4 epochs — a dead-gradient zone with
    # mAP exactly 0 forever — while the (7/S)^2 rebalance trains to
    # 0.987 mAP in 14 epochs.  At S=7 this is a no-op (factor 1.0); the
    # reference's own study file carries the weaker 7/S variant
    # (testCodes/xmLoss.py:40).  Set False for raw reference behavior.
    noobj_rebalance: bool = True
    # kernel/impl selectors: loss assignment 'xla'|'pallas'; eval NMS
    # 'auto' (measured v5e crossover: fused kernel at K>=256, two-stage
    # Pallas below, xla on CPU/mesh) |'xla'|'pallas' (batch-parallel NMS
    # kernel) |'fused' (single-program sort-free decode+NMS);
    # remat = jax.checkpoint on residual/dense blocks (memory saver)
    assignment_impl: str = "xla"
    nms_impl: str = "auto"
    # Device-augment program selectors (data/device_augment.py, used by the
    # --device_augment/--device_resident feed paths; each 'auto' resolves
    # per backend — see DeviceAugmentConfig): affine warp
    # 'auto'|'pallas'|'band'|'gather'; gaussian blur
    # 'auto'|'band'|'band_bf16'|'shift'; resident-dataset row gather
    # 'auto'|'take'|'pallas' (auto = the Pallas row-copy kernel on TPU:
    # 55x over XLA's gather at bs128, hardware bit-exact).
    warp_impl: str = "auto"
    blur_impl: str = "auto"
    gather_impl: str = "auto"
    remat: bool = False
    # ResNet-family block-exit implementation: 'xla' (reference
    # formulation) | 'pallas' (fused BN-apply+add+relu kernel,
    # ops/pallas/fused_epilogue — measured 2.4x over XLA's fusion of the
    # chain at the layer1 shape; step-level delta in DESIGN.md).
    # Unsupported backbones raise loudly, like remat.
    epilogue_impl: str = "xla"

    # optimization (train.py:37-39, 83-89; batch 16 for resnet train.py:68)
    optimizer: str = "sgd"
    momentum: float = 0.99
    batch_size: int = 16
    num_epochs: int = 200
    warmup_increment: float = 1e-6
    warmup_iters: int = 1000
    lr_adjust_map: dict = field(
        default_factory=lambda: {1: 1e-3, 75: 1e-4, 115: 1e-5}
    )

    # data (train.py:113-129)
    train_list: str = "datasets/train.txt"
    test_list: str = "datasets/2007_test.txt"
    image_size: int = 448
    num_workers: int = 4
    # Host loader workers: 'thread' (in-process; cv2 releases the GIL) or
    # 'process' (spawned worker processes — the reference's DataLoader
    # num_workers analog, train.py:119; wins on many-core hosts where the
    # host-augment numpy work caps thread scaling).
    worker_mode: str = "thread"
    seed: int = 0
    # True: flips/affine/pixel ops + normalize + encode run on device as one
    # jitted program (data/device_augment.py); False: host cv2/numpy
    # pipeline with the full op family incl. JPEG/blur (data/augment.py).
    device_augment: bool = False
    little_train: bool = False  # truncate to 64*8 samples (YOLODataLoader.py:85)
    # Cache decoded+resized uint8 images in host RAM after first touch
    # (VOC-scale data is ~9 GB; indispensable on core-starved hosts).
    cache_images: bool = False
    # Upload the whole uint8 dataset (train + eval) to device HBM once and
    # assemble batches on-chip (gather + augment + encode, one jit); per
    # step only a [bs] index vector crosses the host->device link.  Implies
    # the device_augment path; single-device only.
    device_resident: bool = False

    # Explicit device-mesh spec, e.g. 'replica=2,data=2,space=2' or
    # 'data=-1' (fill all devices).  Axes: 'replica' = DCN between pod
    # slices (gradient all-reduce only), 'data' = batch DP over ICI,
    # 'space' = image-height sharding (XLA inserts conv halo exchanges).
    # Empty = automatic 1-D data mesh over all devices when more than one
    # is visible (parallel/mesh.mesh_from_spec).  Multi-host runs also
    # need the jax.distributed env vars (JAX_COORDINATOR_ADDRESS,
    # JAX_NUM_PROCESSES, JAX_PROCESS_ID) — see parallel/mesh.
    mesh: str = ""

    # int8 post-training quantization of the serving forward (eval/map/
    # predict): conv weights per-channel + static activation scales from a
    # calibration pass over test images (eval/quantize.py).  v5e runs int8
    # matmuls at 2x the bf16 MXU rate.
    int8: bool = False
    # eval (train.py:127, utils/utils.py:405)
    little_val: int = 750
    eval_batch_size: int = 32
    score_threshold: float = 0.005
    nms_threshold: float = 0.45
    run_full_map_threshold: float = 0.585
    # Gate escape hatches (train/loop.FitConfig): the reference's strict-
    # improvement gate (train.py:194) can skip the full eval of a late best
    # epoch — full_eval_every N forces a full eval every N epochs (0=off);
    # full_eval_at_end runs one after the final epoch when its gate skipped.
    full_eval_every: int = 0
    full_eval_at_end: bool = True
    # Per-iteration loss logging window (train.py:175 logs every 5).  Each
    # log fetches device scalars = a pipeline flush; raise it on
    # high-dispatch-latency links (the dev relay) to keep steps pipelined.
    log_every: int = 5

    # Stall watchdog (train/watchdog.py): hard-exit 117 when no training
    # heartbeat (step / eval / checkpoint boundary) lands for this many
    # seconds — a wedged device op can block the process forever on relay
    # TPU paths; a supervisor then resumes from the last completed epoch
    # (tools/train_supervised.sh).  Must exceed the longest legitimate
    # gap: first-batch + first-eval remote compiles cost minutes, so use
    # ~900-1800 s on relay hardware.  0 = off.
    watchdog_timeout_s: float = 0.0

    # Capture a JAX/XProf device trace of steps 2-8 of the first epoch to
    # this directory (train/loop.fit's upgrade over the reference's
    # time.clock() lines, train.py:150-184).
    profile_dir: str = ""
    # output (train.py:91-93)
    save_dir: str = ""
    pretrained_torch: str = ""  # optional .pth to import (train.py:61-78)
    resume: bool = False
    # Keep the newest N per-epoch checkpoint copies (epoch_NNNN dirs) in
    # addition to latest/best; 0 = reference behavior (one rolling + best,
    # train.py:204-209).  Retention is pruned after every save.
    keep_checkpoints: int = 0

    def __post_init__(self):
        if self.assignment_impl not in ("xla", "pallas"):
            raise ValueError(
                f"assignment_impl must be 'xla' or 'pallas', got "
                f"{self.assignment_impl!r}"
            )
        if self.nms_impl not in ("auto", "xla", "pallas", "fused"):
            raise ValueError(
                f"nms_impl must be 'auto', 'xla', 'pallas' or 'fused', got "
                f"{self.nms_impl!r}"
            )
        if self.warp_impl not in ("auto", "band", "gather", "pallas"):
            raise ValueError(
                f"warp_impl must be 'auto', 'band', 'gather' or 'pallas', "
                f"got {self.warp_impl!r}"
            )
        if self.blur_impl not in ("auto", "band", "band_bf16", "shift"):
            raise ValueError(
                f"blur_impl must be 'auto', 'band', 'band_bf16' or 'shift', "
                f"got {self.blur_impl!r}"
            )
        if self.gather_impl not in ("auto", "take", "pallas"):
            raise ValueError(
                f"gather_impl must be 'auto', 'take' or 'pallas', "
                f"got {self.gather_impl!r}"
            )
        if self.epilogue_impl not in ("xla", "pallas"):
            raise ValueError(
                f"epilogue_impl must be 'xla' or 'pallas', got "
                f"{self.epilogue_impl!r}"
            )
        if self.worker_mode not in ("thread", "process"):
            raise ValueError(
                f"worker_mode must be 'thread' or 'process', got "
                f"{self.worker_mode!r}"
            )

    def resolved_lambda_noobj(self) -> float:
        """Effective no-object weight: lambda_noobj * (7/S)^2 when
        noobj_rebalance is on (exactly lambda_noobj at the reference's S=7).
        This is the trainer's single source of truth for the weight."""
        if self.noobj_rebalance:
            return self.lambda_noobj * (7.0 / self.S) ** 2
        return self.lambda_noobj

    def resolved_save_dir(self) -> str:
        if self.save_dir:
            return self.save_dir
        # Reference naming: '<backbone>_<opt>_cellSize<S>/' (train.py:91)
        return f"{self.backbone}_{self.optimizer}_cellSize{self.S}"

    @classmethod
    def from_args(cls, argv: list[str] | None = None) -> "ExperimentConfig":
        import argparse

        parser = argparse.ArgumentParser(description="yolo_v1_tpu")
        for f in dataclasses.fields(cls):
            if f.name == "lr_adjust_map":
                parser.add_argument(
                    "--lr_adjust_map",
                    type=str,
                    default="1:1e-3,75:1e-4,115:1e-5",
                    help="epoch:lr comma-separated",
                )
                continue
            kind = f.type if isinstance(f.type, type) else type(f.default)
            if kind is bool:
                parser.add_argument(
                    f"--{f.name}", type=lambda v: v.lower() in ("1", "true", "yes"),
                    default=f.default,
                )
            else:
                parser.add_argument(f"--{f.name}", type=kind, default=f.default)
        ns = parser.parse_args(argv)
        kwargs = vars(ns)
        lr_map = {}
        for pair in kwargs["lr_adjust_map"].split(","):
            k, v = pair.split(":")
            lr_map[int(k)] = float(v)
        kwargs["lr_adjust_map"] = lr_map
        return cls(**kwargs)
