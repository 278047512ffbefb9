"""Training loop: jitted, mesh-sharded train step + epoch orchestration.

TPU-native rebuild of the reference trainer (`/root/reference/train.py`):

* the whole optimization step (forward, loss, backward, SGD update, BN stat
  update) is ONE jitted function — the reference crosses the host/device
  boundary several times per iteration (H2D copies train.py:163-164,
  the loss's CPU mask building v1Loss.py:57-60, per-iteration logging);
* data parallelism comes from sharding annotations over a
  ``jax.sharding.Mesh`` — the pjit equivalent of ``nn.DataParallel``
  (train.py:80); XLA inserts the gradient all-reduce over ICI.  BatchNorm
  statistics are computed over the *global* batch under pjit (sync-BN); the
  reference computes per-replica stats — documented divergence, SURVEY.md §7;
* LR warmup + epoch steps are a closed-form optax schedule
  (train/schedule.py) instead of per-iteration Python mutation
  (train.py:22-32, 158-160);
* per-epoch validation with little-mAP gating of the full-test mAP mirrors
  train.py:186-202; checkpoint save (latest + best-mAP-gated) mirrors
  train.py:204-209 via Orbax, and resume is real (the reference's is a
  commented-out line, train.py:100).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig, yolo_v1_loss
from yolo_v1_tpu.parallel.mesh import (
    data_sharding, image_sharding, pad_to_multiple, put_global, replicated,
)
from yolo_v1_tpu.train.state import TrainState


def make_train_step(
    loss_config: YoloV1LossConfig, weighted: bool = False
) -> Callable[..., tuple[TrainState, dict]]:
    """Build the pure train-step function (un-jitted).

    With ``weighted=True`` the step takes an extra [N] per-image weight
    vector and masks those rows out of the loss — used when the batch is
    padded up to a multiple of the mesh size (parallel/mesh.pad_to_multiple)
    so awkward batch sizes still use every device.  Padded rows are
    wrap-around copies of real images; they do contribute to the sync-BN
    batch statistics (bounded skew of pad/batch duplicated samples — the
    analog of the reference's per-replica BN imbalance under
    ``nn.DataParallel``'s uneven scatter, train.py:80).
    """

    def train_step(
        state: TrainState,
        images: jax.Array,
        targets: jax.Array,
        weights: jax.Array | None = None,
    ):
        def loss_fn(params):
            pred, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            total, parts = yolo_v1_loss(pred, targets, loss_config, weights)
            return total, (parts, mutated["batch_stats"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (parts, new_stats)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return new_state, parts

    if weighted:
        return train_step
    return lambda state, images, targets: train_step(state, images, targets)


def jit_train_step(
    loss_config: YoloV1LossConfig,
    mesh: Mesh | None = None,
    weighted: bool = False,
) -> Callable:
    """Jit the train step; with a mesh, shard the batch over the 'data' axis
    and replicate the state (XLA then emits the DP gradient psum)."""
    step = make_train_step(loss_config, weighted=weighted)
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    # Images additionally shard their HEIGHT over 'space' when the mesh has
    # that axis (image_sharding; XLA SPMD inserts the conv halo exchanges) —
    # targets/weights have no spatial dim and stay batch-sharded.
    repl, data = replicated(mesh), data_sharding(mesh)
    shard_in = (repl, image_sharding(mesh), data) + ((data,) if weighted else ())
    return jax.jit(
        step,
        in_shardings=shard_in,
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_eval_forward(mesh: Mesh | None = None) -> Callable:
    """Jitted inference forward: images -> prediction grids (eval mode)."""

    def forward(state: TrainState, images: jax.Array) -> jax.Array:
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=False,
        )

    if mesh is None:
        return jax.jit(forward)
    return jax.jit(
        forward,
        in_shardings=(replicated(mesh), data_sharding(mesh)),
        out_shardings=data_sharding(mesh),
    )


@dataclass
class FitConfig:
    num_epochs: int = 200  # train.py:38
    log_every: int = 5  # train.py:175
    run_full_map_threshold: float = 0.585  # train.py:137 (HEAD side)
    save_every_epoch: bool = True
    # Escape hatches for the strict-improvement gate (train.py:194 requires
    # little mAP to beat the LAST little, so a late run of improvements can
    # end with its best epoch never fully evaluated — observed live at the
    # VOC-scale rehearsal's final epoch, train.log "full mAP skipped
    # (gate)" with the best-ever little).  Per-epoch gate semantics stay
    # reference-faithful; these only ADD evals:
    #   full_eval_every N  — force a full eval every N epochs (0 = off);
    #   full_eval_at_end   — one full eval after the last epoch when that
    #                        epoch's gate skipped it (default on).
    # Both feed the best-checkpoint logic like any gated eval.
    full_eval_every: int = 0
    full_eval_at_end: bool = True
    # Stall watchdog (train/watchdog.py): hard-exit STALL_EXIT_CODE when no
    # step/eval/checkpoint heartbeat lands for this many seconds, so a
    # supervisor can resume from the last completed epoch.  Must exceed the
    # longest legitimate gap (first-batch + first-eval remote compiles cost
    # minutes on relay TPU paths — use ~900-1800 s there).  0 = off.
    watchdog_timeout_s: float = 0.0


@dataclass
class FitResult:
    best_map: float = 0.0
    last_little_map: float = 0.0
    epoch_losses: list = field(default_factory=list)


def fit(
    state: TrainState,
    train_loader_fn: Callable[[int], Iterable],
    loss_config: YoloV1LossConfig,
    mesh: Mesh | None = None,
    config: FitConfig | None = None,
    evaluator: Any = None,
    checkpointer: Any = None,
    metric_writer: Any = None,
    logger: Any = None,
    start_epoch: int = 0,
    profile_dir: str | None = None,
    initial_best_map: float = 0.0,
    initial_last_little_map: float = 0.0,
    lr_schedule: Callable[[int], Any] | None = None,
) -> tuple[TrainState, FitResult]:
    """Epoch loop with validation gating and checkpointing (train.py:144-209).

    Args:
      state: initial (or resumed) train state.
      train_loader_fn: epoch index -> iterable of (images, targets) numpy
        batches (NHWC float32 / encoded grids).
      mesh: optional device mesh for data parallelism.
      evaluator: optional object with ``little_map(state) -> float`` and
        ``full_map(state) -> float`` (eval/voc_map.VocEvaluator).
      checkpointer: optional train/checkpoint.CheckpointManager.
      metric_writer: optional train/metrics.MetricWriter.
      profile_dir: when set, capture a JAX/XProf device trace of a few
        steps of the first epoch (the upgrade over the reference's
        time.clock() wall-clock lines, train.py:150-184).
    """
    config = config or FitConfig()
    if mesh is not None:
        # put_global: multi-process safe (each host uploads only its
        # addressable shards of the identical global batch).
        dat_sh, img_sh = data_sharding(mesh), image_sharding(mesh)
        put = lambda a: put_global(a, dat_sh)  # noqa: E731
        put_img = lambda a: put_global(a, img_sh)  # noqa: E731
    else:
        put = put_img = jnp.asarray
    # Resume restores the mAP gates too (persisted in the checkpoint), so a
    # post-resume epoch can never clobber a better 'best' checkpoint.
    result = FitResult(
        best_map=initial_best_map, last_little_map=initial_last_little_map
    )
    info = logger.info if logger else (lambda *a: None)
    return _fit_epochs(
        state, train_loader_fn, config, loss_config, mesh, put, result, info,
        evaluator, checkpointer, metric_writer, start_epoch, profile_dir,
        lr_schedule, put_img=put_img,
    )




def _emit_log_window(
    pending, epoch, config, metric_writer, lr_schedule, step0, info
) -> None:
    """Log one iteration window's loss parts (already-computed device
    scalars — see the delayed-window note at the call site) plus the live
    LR derived from the host-mirrored step counter."""
    it, parts = pending
    info(
        "Epoch [%d/%d], Iter [%d] loss: %.4f",
        epoch + 1, config.num_epochs, it, float(parts["total"]),
    )
    if metric_writer:
        metric_writer.plot_many(
            {
                "location loss": float(parts["location"]),
                "confidence loss": float(parts["confidence"]),
                "no object loss": float(parts["no_object"]),
                "classify loss": float(parts["classify"]),
            }
        )
        if lr_schedule is not None:
            # Reference plots the live LR every iteration (train.py:162);
            # one point per log window keeps the series without per-step
            # host syncs.  step0 + it mirrors state.step without a fetch.
            metric_writer.plot(
                "now learning rate", float(lr_schedule(step0 + it))
            )


def _fit_epochs(
    state, train_loader_fn, config, loss_config, mesh, put, result, info,
    evaluator, checkpointer, metric_writer, start_epoch, profile_dir,
    lr_schedule=None, put_img=None,
):
    if put_img is None:
        put_img = put
    profiling = False
    epoch = start_epoch
    completed_epoch = start_epoch - 1  # last epoch whose BATCHES all ran
    watchdog = None
    if config.watchdog_timeout_s > 0:
        from yolo_v1_tpu.train.watchdog import StallWatchdog

        watchdog = StallWatchdog(config.watchdog_timeout_s, log=info).start()
        info(
            "stall watchdog armed: %.0fs heartbeat timeout",
            config.watchdog_timeout_s,
        )
    beat = watchdog.beat if watchdog is not None else (lambda: None)
    # The step is built lazily at the first batch: only then do we know
    # whether the batch size divides the mesh (if not, batches are padded
    # and the loss row-masked so every device still gets work).
    step_fn = None
    mesh_n = mesh.devices.size if mesh is not None else 1
    padded = False
    last_epoch_ran_full = False
    try:
        for epoch in range(start_epoch, config.num_epochs):
            info("Starting epoch %d / %d", epoch + 1, config.num_epochs)
            epoch_start = time.perf_counter()
            losses, n_batches = [], 0
            # Host-mirrored step counter: reading int(state.step) inside the
            # loop would sync on the LAST dispatched step (a full pipeline
            # drain through the relay); at epoch start the pipe is empty, so
            # one fetch here is free and `step0 + i` tracks it exactly.
            step0 = int(state.step)
            pending = None  # previous log window's (iter, parts), see below
            for i, batch in enumerate(train_loader_fn(epoch)):
                # Loaders yield (images, targets) or — when rows are wrap-
                # padded to keep one compiled shape (epoch_plan) — a
                # (images, targets, weights) 3-tuple whose weight-0 rows are
                # masked out of the loss.
                images, targets = batch[0], batch[1]
                row_w = batch[2] if len(batch) == 3 else None
                if profile_dir and epoch == start_epoch:
                    if i == 2 and not profiling:
                        jax.profiler.start_trace(profile_dir)
                        profiling = True
                    elif i == 8 and profiling:
                        jax.profiler.stop_trace()
                        profiling = False
                        info("profiler trace written to %s", profile_dir)
                if step_fn is None:
                    padded = images.shape[0] % mesh_n != 0
                    step_fn = jit_train_step(
                        loss_config, mesh, weighted=padded or row_w is not None
                    )
                    if padded:
                        info(
                            "batch %d does not divide the %d-device mesh; "
                            "padding to %d with loss-masked rows",
                            images.shape[0], mesh_n,
                            images.shape[0] + (-images.shape[0]) % mesh_n,
                        )
                if padded:
                    images_p, n_real = pad_to_multiple(images, mesh_n)
                    targets_p, _ = pad_to_multiple(targets, mesh_n)
                    weights = (
                        np.arange(images_p.shape[0]) < n_real
                    ).astype(np.float32)
                    if row_w is not None:
                        weights[:n_real] *= np.asarray(row_w)
                    state, parts = step_fn(
                        state, put_img(images_p), put(targets_p), put(weights)
                    )
                elif row_w is not None:
                    state, parts = step_fn(
                        state, put_img(images), put(targets), put(row_w)
                    )
                else:
                    state, parts = step_fn(state, put_img(images), put(targets))
                # Keep losses as device scalars — fetching every step would
                # force a host sync per iteration and serialize dispatch.
                losses.append(parts["total"])
                n_batches += 1
                # One heartbeat per step: any host-side freeze (a wedged
                # device op blocks the next fetch/dispatch) stops these.
                beat()
                if (i + 1) % config.log_every == 0:
                    # DELAYED-WINDOW logging: emit the PREVIOUS window's
                    # scalars, whose device values finished computing while
                    # this window's steps were dispatched.  Fetching the
                    # just-dispatched step instead would drain the whole
                    # dispatch pipeline every window — measured to cap
                    # realized training at ~40% of the e2e bench rate
                    # through the relay.  The one-window lag only shifts
                    # which iteration each log line samples.
                    if pending is not None:
                        _emit_log_window(
                            pending, epoch, config, metric_writer,
                            lr_schedule, step0, info,
                        )
                    pending = (i + 1, parts)
            if pending is not None:  # flush the last window of the epoch
                _emit_log_window(
                    pending, epoch, config, metric_writer, lr_schedule,
                    step0, info,
                )
            if profiling:  # loader shorter than the trace window
                jax.profiler.stop_trace()
                profiling = False
            completed_epoch = epoch  # training done; eval/ckpt may follow
            epoch_loss = (
                float(np.mean(jax.device_get(losses))) if losses else 0.0
            )
            beat()  # epoch-loss fetch drained the dispatch pipeline
            result.epoch_losses.append(epoch_loss)
            if metric_writer:
                metric_writer.plot("train loss", epoch_loss)
                if lr_schedule is not None:  # short loaders miss log windows
                    metric_writer.plot(
                        "now learning rate", float(lr_schedule(int(state.step)))
                    )
            info(
                "Epoch %d finished, avg loss %.4f, %.1fs",
                epoch + 1, epoch_loss, time.perf_counter() - epoch_start,
            )

            # Persist 'latest' BEFORE the eval (async; drains during the
            # eval's compute): a crash inside the eval must not lose the
            # epoch that just trained — measured live when the first gated
            # full eval of the VOC-scale rehearsal OOMed and the resume
            # re-trained epoch 4 from scratch.  The reference saves only
            # after its eval (train.py:204-209) and loses the epoch the
            # same way.  Gate extras here lag one eval by construction;
            # the post-eval best-save below carries the fresh ones.
            if checkpointer is not None and config.save_every_epoch:
                # history=False: the post-eval refresh below writes the
                # epoch_NNNN history copy (once, with fresh gate extras) —
                # this save only protects 'latest' across the eval.
                checkpointer.save(
                    state, epoch=epoch, best=False,
                    extras={"best_map": result.best_map,
                            "last_little_map": result.last_little_map},
                    block=False, history=False,
                )

            # --- validation + gated full mAP (train.py:186-202) ---
            test_map = 0.0
            if evaluator is not None:
                little = evaluator.little_map(state)
                beat()
                ran_full = (
                    little > result.last_little_map
                    and little > config.run_full_map_threshold
                ) or (
                    config.full_eval_every > 0
                    and (epoch + 1) % config.full_eval_every == 0
                )
                last_epoch_ran_full = ran_full
                if ran_full:
                    test_map = evaluator.full_map(state)
                    beat()
                result.last_little_map = little
                if metric_writer:
                    # Epoch-indexed points so gate-skipped epochs leave a
                    # visible GAP in the "mAP" series instead of a 0.0 that
                    # mimics a training collapse.  The reference likewise
                    # only plots when the eval actually ran (train.py:200-201).
                    metric_writer.plot("little mAP", little, step=epoch)
                    if ran_full:
                        metric_writer.plot("mAP", test_map, step=epoch)
                    # Live detection-overlay panel (reference visual.py:35-40).
                    if hasattr(metric_writer, "img") and hasattr(
                        evaluator, "render_panel"
                    ):
                        metric_writer.img(
                            "detections", evaluator.render_panel(state)
                        )
                if ran_full:
                    info("little mAP %.5f, full mAP %.5f", little, test_map)
                else:
                    info("little mAP %.5f, full mAP skipped (gate)", little)

            # --- checkpointing (train.py:204-209) ---
            if checkpointer is not None:
                extras = {
                    "best_map": max(result.best_map, test_map),
                    "last_little_map": result.last_little_map,
                }
                if test_map > result.best_map:
                    result.best_map = test_map
                    info("new best test mAP %.5f", test_map)
                    checkpointer.save(state, epoch=epoch, best=True, extras=extras)
                if config.save_every_epoch and evaluator is not None:
                    # Refresh 'latest' with the post-eval gate extras (the
                    # pre-eval save above protected the epoch; this one
                    # keeps resume's gate state current).  Async: drains
                    # during the next epoch's compute.
                    checkpointer.save(
                        state, epoch=epoch, best=False, extras=extras,
                        block=False,
                    )
            if metric_writer and hasattr(metric_writer, "render_html"):
                metric_writer.render_html()
            beat()  # eval/checkpoint/render boundary completed
        # --- fit-end full eval (gate escape hatch) ---
        # The strict-improvement gate can skip the best epoch's full eval
        # when improvements land late; one unconditional full eval of the
        # final state closes that hole (FitConfig.full_eval_at_end).
        if (
            config.full_eval_at_end
            and evaluator is not None
            and completed_epoch >= start_epoch
            and not last_epoch_ran_full
        ):
            final_map = evaluator.full_map(state)
            beat()
            info("fit-end full mAP %.5f (gate escape hatch)", final_map)
            if metric_writer:
                metric_writer.plot("mAP", final_map, step=completed_epoch)
                if hasattr(metric_writer, "render_html"):
                    metric_writer.render_html()
            if final_map > result.best_map:
                result.best_map = final_map
                info("new best test mAP %.5f (fit-end eval)", final_map)
                if checkpointer is not None:
                    checkpointer.save(
                        state, epoch=completed_epoch, best=True,
                        extras={"best_map": result.best_map,
                                "last_little_map": result.last_little_map},
                    )
    except KeyboardInterrupt:
        # Graceful interruption: persist the in-flight state so --resume
        # works (the reference loses the whole epoch).
        if profiling:
            jax.profiler.stop_trace()
        if checkpointer is not None:
            # completed_epoch = last epoch whose batches all ran (an
            # interrupt during eval/checkpointing must not mark that epoch
            # as unfinished — resume would train its data twice and skew
            # the step-keyed LR schedule).
            info("interrupted; saving latest checkpoint (completed epoch %d)",
                 completed_epoch)
            try:
                checkpointer.save(
                    state, epoch=completed_epoch, best=False,
                    extras={"best_map": result.best_map,
                            "last_little_map": result.last_little_map},
                )
            except Exception as e:  # pragma: no cover - timing-dependent
                # The train step donates `state`; an interrupt landing inside
                # step_fn (inputs donated, output not yet rebound) leaves
                # `state` pointing at deleted buffers.  The previous epoch's
                # on-disk checkpoint is then the best recoverable state —
                # losing one epoch beats crashing out of the save handler.
                info("interrupt checkpoint failed (%s); last on-disk "
                     "checkpoint remains the resume point", e)
        raise
    finally:
        if watchdog is not None:
            watchdog.stop()
        if checkpointer is not None and hasattr(checkpointer, "wait"):
            # Drain any in-flight async save before returning — a caller
            # restoring immediately (tests, back-to-back resumes) must
            # never race the last epoch's write.
            try:
                checkpointer.wait()
            except Exception as e:  # pragma: no cover - disk-full etc.
                info("final checkpoint drain failed: %s", e)
    return state, result
