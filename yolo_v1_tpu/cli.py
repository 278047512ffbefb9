"""Command-line entry points: train / map / visualize / prepare-data.

Replaces the reference's run-the-script-directly workflow:

* ``train``        <-> ``python train.py``       (/root/reference/train.py)
* ``map``          <-> ``python run_voc_mAP.py`` (standalone mAP on a ckpt)
* ``visualize``    <-> ``python eval.py``        (draw predictions)
* ``prepare-data`` <-> ``python testCodes/voc_label.py`` (XML -> labels)

Usage: ``python -m yolo_v1_tpu.cli <command> [--flag value ...]``
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from yolo_v1_tpu.configs.config import ExperimentConfig
from yolo_v1_tpu.data.pipeline import BatchLoader, PipelineConfig, YoloDataset
from yolo_v1_tpu.data.voc import prep_test_data
from yolo_v1_tpu.eval.voc_map import VocEvaluator
from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig
from yolo_v1_tpu.models.registry import build_model
from yolo_v1_tpu.parallel.mesh import make_mesh
from yolo_v1_tpu.train import checkpoint as ckpt
from yolo_v1_tpu.train.loop import FitConfig, fit
from yolo_v1_tpu.train.metrics import MetricWriter
from yolo_v1_tpu.train.schedule import make_lr_schedule
from yolo_v1_tpu.train.state import create_train_state, make_optimizer
from yolo_v1_tpu.utils.logging import create_logger


def _pipeline_config(cfg: ExperimentConfig) -> PipelineConfig:
    return PipelineConfig(
        image_size=cfg.image_size, S=cfg.S, B=cfg.B, C=cfg.num_classes,
        seed=cfg.seed, num_workers=cfg.num_workers,
        worker_mode=cfg.worker_mode, cache_images=cfg.cache_images,
    )


def _build_state(cfg: ExperimentConfig, steps_per_epoch: int, logger=None):
    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    # Pass remat/epilogue to any backbone; unsupported ones raise (never a
    # silent no-op that would later OOM without explanation).
    kwargs = {"remat": True} if cfg.remat else {}
    if cfg.epilogue_impl != "xla":
        kwargs["epilogue"] = cfg.epilogue_impl
    model = build_model(
        cfg.backbone, S=cfg.S, B=cfg.B, num_classes=cfg.num_classes,
        dtype=dtype, **kwargs,
    )
    schedule = make_lr_schedule(
        steps_per_epoch, cfg.warmup_increment, cfg.warmup_iters, cfg.lr_adjust_map
    )
    tx = make_optimizer(schedule, cfg.optimizer, cfg.momentum)
    state = create_train_state(
        model,
        jax.random.PRNGKey(cfg.seed),
        (1, cfg.image_size, cfg.image_size, 3),
        tx,
    )
    if cfg.pretrained_torch:
        arch = "densenet" if cfg.backbone.startswith("densenet") else "resnet"
        sd = ckpt.load_torch_file(cfg.pretrained_torch)
        params, stats, report = ckpt.import_torch_state_dict(
            sd, state.params, state.batch_stats, arch
        )
        state = state.replace(
            params=jax.tree.map(jnp.asarray, params),
            batch_stats=jax.tree.map(jnp.asarray, stats),
        )
        if logger:
            logger.info(
                "imported %d torch tensors (%d skipped)",
                len(report["copied"]),
                len(report["skipped_missing"]) + len(report["skipped_shape"]),
            )
    return state, model


def cmd_train(argv: list[str]) -> int:
    cfg = ExperimentConfig.from_args(argv)

    from yolo_v1_tpu.parallel.mesh import (
        dp_size, is_coordinator, maybe_distributed_init, mesh_from_spec,
    )

    # Distributed bootstrap FIRST: jax.distributed.initialize must precede
    # any JAX backend use, and the logger/metric writer below query the
    # process index to gate run-directory writes to the coordinator.
    dist = maybe_distributed_init()
    save_dir = cfg.resolved_save_dir()
    logger = create_logger(save_dir, "train")
    if dist:
        logger.info(
            "jax.distributed initialized: process %d/%d, %d global devices",
            jax.process_index(), jax.process_count(), len(jax.devices()),
        )
    # Run-dir writers are coordinator-only in multi-process runs: every
    # host computing into one shared metrics.csv/dashboard corrupts it.
    writer = (
        MetricWriter(save_dir, logger=logger, resume=cfg.resume)
        if is_coordinator()
        else None
    )
    pipe_cfg = _pipeline_config(cfg)

    mesh = None
    if cfg.mesh:
        # Explicit --mesh spec: replica (DCN) x data (ICI DP) x space
        # (image-height sharding).  Batch divisibility is the user's
        # contract here — awkward sizes still pad in the train loop, but
        # the resident feed draws batch/dp rows per shard and must divide.
        mesh = mesh_from_spec(cfg.mesh)
        dp = dp_size(mesh)
        if cfg.device_resident and cfg.batch_size % dp != 0:
            raise SystemExit(
                f"--mesh {cfg.mesh!r}: batch_size {cfg.batch_size} must be "
                f"divisible by the {dp}-way data-parallel split for "
                f"--device_resident (the resident plan draws batch/dp rows "
                f"per dataset shard)"
            )
        logger.info(
            "mesh %s over %d devices (%d-way DP)",
            dict(zip(mesh.axis_names, mesh.devices.shape)),
            mesh.devices.size, dp,
        )
    elif len(jax.devices()) > 1:
        # All devices, always: batches that don't divide the mesh are padded
        # with loss-masked rows (train/loop) or trimmed detector outputs
        # (eval), so no chip idles on awkward batch sizes.  The resident
        # loader shards the HBM dataset over the data axis
        # (pipeline.DeviceResidentLoader), so every feed path scales.
        n_mesh = len(jax.devices())
        if cfg.device_resident and cfg.batch_size % n_mesh != 0:
            # The resident plan draws batch/D rows per dataset shard, so the
            # mesh size must divide the batch — shrink to the largest
            # divisor instead of crashing (parity with the padded paths).
            from yolo_v1_tpu.parallel.mesh import largest_divisor_device_count

            n_mesh = largest_divisor_device_count(cfg.batch_size)
            logger.warning(
                "batch %d does not divide %d devices; resident mesh uses %d",
                cfg.batch_size, len(jax.devices()), n_mesh,
            )
        mesh = make_mesh(n_mesh)
        logger.info("data-parallel mesh over %d devices", n_mesh)

    if cfg.device_resident or cfg.device_augment:
        from yolo_v1_tpu.data.device_augment import DeviceAugmentConfig

        aug_cfg = DeviceAugmentConfig(
            warp_impl=cfg.warp_impl, blur_impl=cfg.blur_impl,
            gather_impl=cfg.gather_impl,
        )
    if cfg.device_resident:
        from yolo_v1_tpu.data.pipeline import DeviceResidentLoader

        train_ds = YoloDataset(
            cfg.train_list, train=False, config=pipe_cfg,
            little_train=cfg.little_train,
        )
        loader = DeviceResidentLoader(
            train_ds, cfg.batch_size, logger=logger, mesh=mesh,
            augment_config=aug_cfg,
        )
    elif cfg.device_augment:
        from yolo_v1_tpu.data.pipeline import DeviceAugmentedLoader

        train_ds = YoloDataset(
            cfg.train_list, train=False, config=pipe_cfg,
            little_train=cfg.little_train,
        )
        loader = DeviceAugmentedLoader(
            train_ds, cfg.batch_size, mesh=mesh, augment_config=aug_cfg
        )
    else:
        train_ds = YoloDataset(
            cfg.train_list, train=True, config=pipe_cfg,
            little_train=cfg.little_train,
        )
        loader = BatchLoader(train_ds, cfg.batch_size)
    logger.info("the dataset has %d images", len(train_ds))
    logger.info("the batch_size is %d", cfg.batch_size)

    evaluator = None
    if cfg.test_list:
        test_ds = YoloDataset(cfg.test_list, train=False, config=pipe_cfg)
        evaluator = VocEvaluator(
            test_ds,
            gt_full=prep_test_data(cfg.test_list),
            gt_little=prep_test_data(cfg.test_list, little_test=cfg.little_val),
            little_n=cfg.little_val,
            batch_size=cfg.eval_batch_size,
            score_threshold=cfg.score_threshold,
            nms_threshold=cfg.nms_threshold,
            nms_impl=cfg.nms_impl,
            mesh=mesh,
            device_cache=cfg.device_resident,
            logger=logger,
        )

    # Visible marker: on relay-attached TPUs the init + import below is a
    # multi-minute silent window (hundreds of initializer dispatches) —
    # the VOC-scale rehearsal measured ~16 min before the first epoch log.
    logger.info("building %s state (device init%s)...", cfg.backbone,
                " + torch import" if cfg.pretrained_torch else "")
    state, _ = _build_state(cfg, steps_per_epoch=max(len(loader), 1), logger=logger)
    manager = ckpt.CheckpointManager(
        save_dir, history_keep=cfg.keep_checkpoints
    )
    start_epoch = 0
    gates = {"best_map": 0.0, "last_little_map": 0.0}
    if cfg.resume and manager.exists():
        state, last_completed, gates = manager.restore(state)
        start_epoch = last_completed + 1
        logger.info(
            "resumed from epoch %d (best mAP %.5f)", start_epoch,
            gates["best_map"],
        )

    lambda_noobj = cfg.resolved_lambda_noobj()
    if lambda_noobj != cfg.lambda_noobj:
        logger.info(
            "noobj_rebalance: lambda_noobj %.4g -> %.4g ((7/S)^2 at S=%d; "
            "equalizes per-image no-object MSE mass across grid sizes)",
            cfg.lambda_noobj, lambda_noobj, cfg.S,
        )
    elif cfg.S > 7 and not cfg.noobj_rebalance:
        logger.warning(
            "S=%d with raw lambda_noobj=%.3g is a MEASURED confidence-"
            "collapse recipe (mAP stays 0.0; docs/DESIGN.md, "
            "runs/synth_r50_s14_collapse) — consider --noobj_rebalance true",
            cfg.S, cfg.lambda_noobj,
        )
    loss_cfg = YoloV1LossConfig(
        S=cfg.S, B=cfg.B, C=cfg.num_classes,
        lambda_coord=cfg.lambda_coord, lambda_noobj=lambda_noobj,
        assignment_impl=cfg.assignment_impl,
    )
    lr_schedule = make_lr_schedule(
        max(len(loader), 1), cfg.warmup_increment, cfg.warmup_iters,
        cfg.lr_adjust_map,
    )
    try:
        fit(
            state,
            loader.epoch,
            loss_cfg,
            mesh=mesh,
            config=FitConfig(
                num_epochs=cfg.num_epochs,
                run_full_map_threshold=cfg.run_full_map_threshold,
                log_every=cfg.log_every,
                watchdog_timeout_s=cfg.watchdog_timeout_s,
                full_eval_every=cfg.full_eval_every,
                full_eval_at_end=cfg.full_eval_at_end,
            ),
            evaluator=evaluator,
            checkpointer=manager,
            metric_writer=writer,
            logger=logger,
            start_epoch=start_epoch,
            profile_dir=cfg.profile_dir or None,
            initial_best_map=gates["best_map"],
            initial_last_little_map=gates["last_little_map"],
            lr_schedule=lr_schedule,
        )
    finally:
        # Drain any in-flight async checkpoint write, then worker-pool
        # hygiene: a process embedding the trainer (tests, a long-lived
        # service) must not leak executors.
        manager.wait()
        if hasattr(loader, "close"):
            loader.close()
        if evaluator is not None:
            evaluator.close()
    return 0


def _serving_mesh(cfg: ExperimentConfig, logger, label: str):
    """Shared serve/predict mesh policy: an explicit --mesh spec wins
    (batch must divide its DP split — the serving program has no padded
    rows to mask); otherwise auto data-parallel over every device whose
    count divides the batch.  Distributed init happens at each command's
    TOP (it must precede the state build / checkpoint restore), not here.
    """
    from yolo_v1_tpu.parallel.mesh import (
        dp_size, largest_divisor_device_count, mesh_from_spec,
    )

    if cfg.mesh:
        mesh = mesh_from_spec(cfg.mesh)
        dp = dp_size(mesh)
        if cfg.eval_batch_size % dp != 0:
            raise SystemExit(
                f"--mesh {cfg.mesh!r}: eval_batch_size "
                f"{cfg.eval_batch_size} must be divisible by the {dp}-way "
                f"data-parallel split"
            )
        logger.info(
            "%s mesh %s over %d devices", label,
            dict(zip(mesh.axis_names, mesh.devices.shape)), mesh.devices.size,
        )
        return mesh
    if len(jax.devices()) > 1:
        n_mesh = largest_divisor_device_count(cfg.eval_batch_size)
        if n_mesh > 1:
            logger.info(
                "data-parallel %s mesh over %d devices", label, n_mesh
            )
            return make_mesh(n_mesh)
    return None


def _quantize_for_serving(
    state, test_ds, logger, n_calib: int = 64, calib_batches: int = 8
):
    """int8-quantize the serving forward: calibrate activation scales over
    ``calib_batches`` varied batches of test images (a single batch was the
    round-2 weakness — one unlucky batch sets every scale), log the
    per-conv isolated |f32-int8| output error so a bad scale is visible
    BEFORE it costs mAP, then swap every conv for the W8A8 path (the shim
    state drives detector/evaluator/predictor unchanged)."""
    from yolo_v1_tpu.eval.quantize import (
        calibrate, per_conv_quant_error, quantize_state,
    )

    n = min(n_calib, len(test_ds))
    imgs = np.stack([test_ds.load_sample(i)[0] for i in range(n)])
    bs = max(1, n // min(calib_batches, n))
    # Full batches only: a ragged tail would be a second compiled shape
    # (minutes on a remote-compile TPU path).
    batches = [imgs[i : i + bs] for i in range(0, n - n % bs, bs)]
    amax = calibrate(state, batches)
    logger.info(
        "int8: calibrated %d convs over %d batches (%d images)",
        len(amax), len(batches), n,
    )
    errs = per_conv_quant_error(state, amax, imgs[: min(8, n)])
    worst = sorted(errs.items(), key=lambda kv: -kv[1])[:5]
    logger.info(
        "int8: per-conv rel-L2 error median %.4f max %.4f; worst: %s",
        float(np.median(list(errs.values()))), worst[0][1],
        ", ".join(f"{k}={v:.4f}" for k, v in worst),
    )
    return quantize_state(state, amax)


def cmd_map(argv: list[str]) -> int:
    """Standalone mAP over the full test list (run_voc_mAP.py parity)."""
    cfg = ExperimentConfig.from_args(argv)
    from yolo_v1_tpu.parallel.mesh import maybe_distributed_init

    maybe_distributed_init()  # must precede _build_state/restore
    save_dir = cfg.resolved_save_dir()
    logger = create_logger(save_dir, "map")
    pipe_cfg = _pipeline_config(cfg)
    test_ds = YoloDataset(cfg.test_list, train=False, config=pipe_cfg)
    state, _ = _build_state(cfg, steps_per_epoch=1, logger=logger)
    manager = ckpt.CheckpointManager(save_dir)
    if manager.exists(best=True):
        state, _, _ = manager.restore(state, best=True)
    elif manager.exists():
        state, _, _ = manager.restore(state)
    else:
        logger.warning("no checkpoint in %s; evaluating fresh weights", save_dir)
    if cfg.int8:
        state = _quantize_for_serving(state, test_ds, logger)
    # Same mesh policy as serve/predict (explicit --mesh wins; auto DP
    # over devices that divide the batch) — the evaluator pads eval
    # batches to the mesh and trims detections host-side.
    mesh = _serving_mesh(cfg, logger, "map")
    evaluator = VocEvaluator(
        test_ds,
        gt_full=prep_test_data(cfg.test_list),
        batch_size=cfg.eval_batch_size,
        score_threshold=cfg.score_threshold,
        nms_threshold=cfg.nms_threshold,
        nms_impl=cfg.nms_impl,
        mesh=mesh,
        logger=logger,
    )
    try:
        mAP = evaluator.full_map(state)
    finally:
        evaluator.close()
    print(f"mAP: {mAP:.6f}")
    return 0


def cmd_visualize(argv: list[str]) -> int:
    """Draw predictions on the first N test images (eval.py parity,
    headless: writes <save_dir>/vis/*.jpg)."""
    import cv2

    from yolo_v1_tpu.eval.visualize import draw_detections, save_visualization
    from yolo_v1_tpu.eval.voc_map import make_detector

    cfg = ExperimentConfig.from_args(argv)
    save_dir = cfg.resolved_save_dir()
    logger = create_logger(save_dir, "visualize")
    pipe_cfg = _pipeline_config(cfg)
    test_ds = YoloDataset(cfg.test_list, train=False, config=pipe_cfg)
    state, _ = _build_state(cfg, steps_per_epoch=1, logger=logger)
    manager = ckpt.CheckpointManager(save_dir)
    if manager.exists(best=True):
        state, _, _ = manager.restore(state, best=True)
    elif manager.exists():
        state, _, _ = manager.restore(state)
    if cfg.int8:  # render what the quantized serving path actually detects
        state = _quantize_for_serving(state, test_ds, logger)
    detector = make_detector(
        cfg.S, cfg.B, cfg.num_classes,
        score_threshold=0.1,  # eval.py:94 uses thresh .1 for visualization
        nms_threshold=cfg.nms_threshold,
        nms_impl=cfg.nms_impl,
    )
    n = min(32, len(test_ds))
    bs = min(cfg.eval_batch_size, n)
    for start in range(0, n, bs):
        idxs = list(range(start, min(start + bs, n)))
        batch = np.stack([test_ds.load_sample(i)[0] for i in idxs])
        if len(idxs) < bs:  # keep one compiled shape
            batch = np.concatenate(
                [batch, np.zeros_like(batch[:1]).repeat(bs - len(idxs), 0)]
            )
        boxes, scores, classes, keep = jax.tree.map(
            np.asarray, detector(state, jnp.asarray(batch))
        )
        for j, i in enumerate(idxs):
            raw, _, _ = test_ds.load_raw(i)
            k = keep[j]
            vis = draw_detections(raw, boxes[j][k], classes[j][k], scores[j][k])
            save_visualization(f"{save_dir}/vis/{i:04d}.jpg", vis)
    logger.info("wrote %d visualizations to %s/vis", n, save_dir)
    return 0


def cmd_predict(argv: list[str]) -> int:
    """Batch-serve a directory (or list file) of images: detections as JSON
    lines on stdout (the programmatic counterpart of `visualize`)."""
    import glob
    import json

    import cv2

    from yolo_v1_tpu.eval.predictor import Predictor

    # Separate the one extra flag from the shared config flags.
    inputs = None
    rest = []
    it = iter(argv)
    for a in it:
        if a == "--input":
            inputs = next(it, None)
        else:
            rest.append(a)
    if inputs is None:
        print("predict requires --input <dir-or-list-file>")
        return 2
    cfg = ExperimentConfig.from_args(rest)
    from yolo_v1_tpu.parallel.mesh import maybe_distributed_init

    maybe_distributed_init()  # must precede _build_state/restore
    save_dir = cfg.resolved_save_dir()
    logger = create_logger(save_dir, "predict")
    state, model = _build_state(cfg, steps_per_epoch=1, logger=logger)
    manager = ckpt.CheckpointManager(save_dir)
    if manager.exists(best=True):
        state, _, _ = manager.restore(state, best=True)
    elif manager.exists():
        state, _, _ = manager.restore(state)
    else:
        logger.warning(
            "no checkpoint in %s; predicting with fresh random weights",
            save_dir,
        )

    if os.path.isdir(inputs):
        files = sorted(
            glob.glob(os.path.join(inputs, "*.jpg"))
            + glob.glob(os.path.join(inputs, "*.png"))
        )
    else:
        from yolo_v1_tpu.data.voc import read_list_file

        files = read_list_file(inputs)
    if not files:
        print(f"no images under {inputs}")
        return 1

    apply_fn = None
    if cfg.int8:
        from yolo_v1_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
        from yolo_v1_tpu.eval.quantize import calibrate, quantize_state

        # Calibrate activation scales on the first input images themselves.
        calib = []
        for f in files[: min(64, len(files))]:
            img = cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB)
            img = cv2.resize(img, (cfg.image_size, cfg.image_size))
            calib.append(
                (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
            )
        stacked = np.stack(calib)
        bs = max(1, len(stacked) // min(8, len(stacked)))
        state = quantize_state(
            state,
            calibrate(
                state,
                [stacked[i : i + bs]
                 for i in range(0, len(stacked) - len(stacked) % bs, bs)],
            ),
        )
        logger.info("int8: serving quantized forward")
        apply_fn = state.apply_fn

    mesh = _serving_mesh(cfg, logger, "predict")
    predictor = Predictor(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        S=cfg.S, B=cfg.B, C=cfg.num_classes,
        score_threshold=cfg.score_threshold, nms_threshold=cfg.nms_threshold,
        nms_impl=cfg.nms_impl,
        apply_fn=apply_fn, mesh=mesh,
    )
    bs = cfg.eval_batch_size
    size = cfg.image_size
    for start in range(0, len(files), bs):
        chunk = files[start : start + bs]
        imgs = []
        for path in chunk:
            im = cv2.imread(path)
            if im is None:
                raise FileNotFoundError(path)
            im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
            imgs.append(cv2.resize(im, (size, size)))
        batch = np.stack(imgs)
        if len(chunk) < bs:  # single compiled shape
            batch = np.concatenate(
                [batch, np.zeros_like(batch[:1]).repeat(bs - len(chunk), 0)]
            )
        dets = predictor(batch)[: len(chunk)]
        for path, d in zip(chunk, dets):
            print(json.dumps({"image": path, "detections": d}))
    return 0


def cmd_serve(argv: list[str], block: bool = True):
    """HTTP serving daemon (eval/server.py): POST /predict with JPEG/PNG
    bytes -> JSON detections (normalized xyxy boxes); GET /healthz.
    Concurrent requests micro-batch onto the ONE compiled serving program
    (batch = --eval_batch_size, fill window = --max_wait_ms); --int8 true
    serves the W8A8 forward calibrated on --test_list images.  The
    production upgrade of the reference's script-loop serving
    (run_voc_mAP.py:74).  ``--artifact <dir>`` serves an exported
    StableHLO blob instead (cli export) — no model code or checkpoint at
    the serving host; batch/size come from the artifact's metadata.
    ``block=False`` returns the started server (tests)."""
    from yolo_v1_tpu.eval.predictor import Predictor
    from yolo_v1_tpu.eval.server import PredictionServer

    host, port, max_wait_ms, artifact, rest = "127.0.0.1", 8000, 2.0, "", []
    i = 0
    while i < len(argv):
        if argv[i] == "--port":
            port = int(argv[i + 1])
            i += 2
        elif argv[i] == "--host":
            host = argv[i + 1]
            i += 2
        elif argv[i] == "--max_wait_ms":
            max_wait_ms = float(argv[i + 1])
            i += 2
        elif argv[i] == "--artifact":
            artifact = argv[i + 1]
            i += 2
        else:
            rest.append(argv[i])
            i += 1
    cfg = ExperimentConfig.from_args(rest)
    from yolo_v1_tpu.parallel.mesh import maybe_distributed_init

    maybe_distributed_init()  # must precede _build_state/restore
    if artifact:
        from yolo_v1_tpu.eval.export import ArtifactPredictor

        logger = create_logger(artifact, "serve")
        predictor = ArtifactPredictor(artifact)
        predictor(np.zeros(  # warm the compile before accepting traffic
            (predictor.batch,) + (predictor.image_size,) * 2 + (3,), np.uint8
        ))
        server = PredictionServer(
            predictor, predictor.image_size, predictor.batch,
            host=host, port=port, max_wait_ms=max_wait_ms, logger=logger,
        )
        logger.info(
            "serving artifact %s on %s:%d (batch %d)",
            artifact, host, server.port, predictor.batch,
        )
        if not block:
            server.start()
            return server
        print(f"http://{host}:{server.port}", flush=True)
        server.serve_forever()
        return 0
    save_dir = cfg.resolved_save_dir()
    logger = create_logger(save_dir, "serve")
    state, model = _build_state(cfg, steps_per_epoch=1, logger=logger)
    manager = ckpt.CheckpointManager(save_dir)
    if manager.exists(best=True):
        state, _, _ = manager.restore(state, best=True)
    elif manager.exists():
        state, _, _ = manager.restore(state)
    else:
        logger.warning(
            "no checkpoint in %s; serving fresh random weights", save_dir
        )
    apply_fn = None
    if cfg.int8:
        if not cfg.test_list:
            logger.error("--int8 serving needs --test_list calibration images")
            return 2
        test_ds = YoloDataset(
            cfg.test_list, train=False, config=_pipeline_config(cfg)
        )
        state = _quantize_for_serving(state, test_ds, logger)
        apply_fn = state.apply_fn
    mesh = _serving_mesh(cfg, logger, "serving")
    predictor = Predictor(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        S=cfg.S, B=cfg.B, C=cfg.num_classes,
        score_threshold=cfg.score_threshold,
        nms_threshold=cfg.nms_threshold,
        nms_impl=cfg.nms_impl, apply_fn=apply_fn, mesh=mesh,
    )
    # Warm the compile BEFORE accepting traffic (first jit costs tens of
    # seconds locally, minutes over remote-compile TPU links).
    predictor(np.zeros(
        (cfg.eval_batch_size, cfg.image_size, cfg.image_size, 3), np.uint8
    ))
    server = PredictionServer(
        predictor, cfg.image_size, cfg.eval_batch_size,
        host=host, port=port, max_wait_ms=max_wait_ms, logger=logger,
    )
    logger.info(
        "serving on %s:%d (batch %d, wait %.1fms)",
        host, server.port, cfg.eval_batch_size, max_wait_ms,
    )
    if not block:
        server.start()
        return server
    print(f"http://{host}:{server.port}", flush=True)
    server.serve_forever()
    return 0


def cmd_export(argv: list[str]) -> int:
    """Write a portable serving artifact (eval/export.py): the fused
    uint8-in serving program with the best checkpoint's weights baked in,
    serialized as StableHLO for cpu+tpu.  Batch size = --eval_batch_size;
    thresholds from --score_threshold/--nms_threshold."""
    from yolo_v1_tpu.eval.export import export_serving, write_serving_artifact

    cfg = ExperimentConfig.from_args(argv)
    save_dir = cfg.resolved_save_dir()
    logger = create_logger(save_dir, "export")
    state, model = _build_state(cfg, steps_per_epoch=1, logger=logger)
    manager = ckpt.CheckpointManager(save_dir)
    if manager.exists(best=True):
        state, _, _ = manager.restore(state, best=True)
    elif manager.exists():
        state, _, _ = manager.restore(state)
    else:
        logger.warning(
            "no checkpoint in %s; exporting fresh random weights", save_dir
        )
    if cfg.nms_impl not in ("auto", "xla"):
        logger.warning(
            "nms_impl=%s uses backend-pinned Pallas custom calls; the "
            "artifact forces the portable XLA NMS instead", cfg.nms_impl,
        )
    apply_fn = None
    if cfg.int8:
        # W8A8 serving artifact: calibrate on test images, then export the
        # interceptor-quantized forward (int8 dots are portable StableHLO).
        if not cfg.test_list:
            logger.error("--int8 export needs --test_list calibration images")
            return 2
        test_ds = YoloDataset(
            cfg.test_list, train=False, config=_pipeline_config(cfg)
        )
        state = _quantize_for_serving(state, test_ds, logger)
        apply_fn = state.apply_fn
    blob, meta = export_serving(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        S=cfg.S, B=cfg.B, C=cfg.num_classes,
        batch=cfg.eval_batch_size, image_size=cfg.image_size,
        score_threshold=cfg.score_threshold,
        nms_threshold=cfg.nms_threshold,
        apply_fn=apply_fn,
    )
    meta["int8"] = bool(cfg.int8)
    path = write_serving_artifact(save_dir, blob, meta)
    logger.info("serving artifact: %s (%.1f MB)", path, len(blob) / 1e6)
    print(path)
    return 0


def cmd_export_torch(argv: list[str]) -> int:
    """Export the best checkpoint as a reference-layout torch .pth
    (checkpoint.export_torch_state_dict) so a model trained here drops
    straight into the reference's eval tools (eval.py:68,
    run_voc_mAP.py:68).  Keys default to the ``module.`` DataParallel
    prefix those tools expect; ``--module_prefix false`` writes bare keys.
    Output defaults to the reference's checkpoint naming
    ``<save_dir>/<backbone>_<opt>_S<S>_yolo.pth`` (train.py:204-209)."""
    out_path, prefix, rest = "", "module.", []
    i = 0
    while i < len(argv):
        if argv[i] == "--torch_out":
            out_path = argv[i + 1]
            i += 2
        elif argv[i] == "--module_prefix":
            prefix = "module." if argv[i + 1].lower() in ("1", "true", "yes") else ""
            i += 2
        else:
            rest.append(argv[i])
            i += 1
    cfg = ExperimentConfig.from_args(rest)
    fam = cfg.backbone
    if fam.startswith("densenet"):
        arch = "densenet"
    elif fam.startswith(("resnet", "resnext")):
        arch = "resnet"
    else:
        print(f"export-torch: no torch layout for backbone {fam!r}")
        return 2
    save_dir = cfg.resolved_save_dir()
    logger = create_logger(save_dir, "export_torch")
    state, _ = _build_state(cfg, steps_per_epoch=1, logger=logger)
    manager = ckpt.CheckpointManager(save_dir)
    if manager.exists(best=True):
        state, epoch, _ = manager.restore(state, best=True)
        logger.info("exporting best checkpoint (epoch %d)", epoch)
    elif manager.exists():
        state, epoch, _ = manager.restore(state)
        logger.info("exporting latest checkpoint (epoch %d)", epoch)
    else:
        logger.warning("no checkpoint in %s; exporting random init", save_dir)
    sd = ckpt.export_torch_state_dict(
        state.params, state.batch_stats, arch, prefix=prefix
    )
    out_path = out_path or os.path.join(
        save_dir, f"{cfg.backbone}_{cfg.optimizer}_S{cfg.S}_yolo.pth"
    )
    ckpt.save_torch_file(out_path, sd)
    logger.info("torch state dict: %s (%d tensors)", out_path, len(sd))
    print(out_path)
    return 0


def cmd_prepare_data(argv: list[str]) -> int:
    """VOCdevkit XML -> labels/*.txt + list files (voc_label.py parity)."""
    import argparse

    from yolo_v1_tpu.data.voc import convert_voc_annotations

    p = argparse.ArgumentParser()
    p.add_argument("--devkit_base", required=True)
    p.add_argument("--out_dir", default="datasets")
    ns = p.parse_args(argv)
    counts = convert_voc_annotations(ns.devkit_base, ns.out_dir)
    for name, n in counts.items():
        print(f"{name}: {n} images")
    return 0


def cmd_synth_data(argv: list[str]) -> int:
    """Generate a synthetic VOC-style dataset (training demos on boxes
    where the real VOC devkit cannot be mounted; data/synthetic.py)."""
    import argparse

    from yolo_v1_tpu.data.synthetic import generate_dataset

    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", required=True)
    p.add_argument("--n_train", type=int, default=4000)
    p.add_argument("--n_test", type=int, default=800)
    p.add_argument("--image_size", type=int, default=448)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--hard", type=lambda v: v.lower() in ("1", "true", "yes"),
        default=False,
        help="non-saturating tier: small objects, occlusion, confusable "
        "hues, dense distractors, degradations (data/synthetic.py)",
    )
    ns = p.parse_args(argv)
    counts = generate_dataset(
        ns.out_dir, n_train=ns.n_train, n_test=ns.n_test,
        image_size=ns.image_size, seed=ns.seed, hard=ns.hard,
    )
    for name, n in counts.items():
        print(f"{name}: {n} images")
    return 0


COMMANDS = {
    "train": cmd_train,
    "map": cmd_map,
    "visualize": cmd_visualize,
    "predict": cmd_predict,
    "serve": cmd_serve,
    "export": cmd_export,
    "export-torch": cmd_export_torch,
    "prepare-data": cmd_prepare_data,
    "synth-data": cmd_synth_data,
}


def main(argv: list[str] | None = None) -> int:
    from yolo_v1_tpu.utils.cache import enable_compilation_cache

    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in COMMANDS:
        print(f"usage: python -m yolo_v1_tpu.cli {{{'|'.join(COMMANDS)}}} [flags]")
        return 2
    enable_compilation_cache()
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
