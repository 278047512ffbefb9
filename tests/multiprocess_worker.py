"""Worker for the two-process multi-host tests (test_parallel.py).

Each process owns 4 virtual CPU devices; jax.distributed.initialize joins
them into one 8-device global view (gloo collectives).  Two modes:

* ``step`` (default): the PRODUCTION train-step path — mesh_from_spec +
  jit_train_step + put_global (each process uploads only its addressable
  shards of the identical global batch) — printing per-step losses for
  the parent to compare across processes and against the single-process
  reference.
* ``fit <data_dir> <run_dir>``: the FULL production training loop —
  ``fit()`` with a real BatchLoader over a synthetic VOC tree, the real
  ``VocEvaluator`` little-eval each epoch, collective CheckpointManager
  saves (async pre-eval + post-eval refresh), coordinator-gated logger /
  MetricWriter — then a RESUME leg restoring from the shared checkpoint
  tree.  This is the multi-host version of what `cli train` runs.

Usage: python multiprocess_worker.py <process_id> <coordinator_port>
           [step | fit <data_dir> <run_dir>]
"""

import os
import sys

proc_id, port = int(sys.argv[1]), sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2,
    process_id=proc_id,
)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from yolo_v1_tpu.core.grid import encode_targets  # noqa: E402
from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig  # noqa: E402
from yolo_v1_tpu.models.registry import build_model  # noqa: E402
from yolo_v1_tpu.parallel.mesh import (  # noqa: E402
    data_sharding, image_sharding, mesh_from_spec, put_global,
)
from yolo_v1_tpu.train.loop import jit_train_step  # noqa: E402
from yolo_v1_tpu.train.state import (  # noqa: E402
    create_train_state, make_optimizer,
)


def make_fixture():
    rng = np.random.default_rng(1)
    images = rng.normal(0, 1, (8, 112, 112, 3)).astype(np.float32)
    boxes = np.tile(
        np.array([[0.5, 0.5, 0.4, 0.4]], np.float32), (8, 1)
    )[:, None]
    targets = np.asarray(encode_targets(
        boxes, np.full((8, 1), 3, np.int32), np.ones(8, np.int32), S=7
    ))
    return images, targets


def main() -> None:
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
    mesh = mesh_from_spec("data=8")
    model = build_model("tiny", S=7)
    tx = make_optimizer(lambda s: 1e-2, "sgd", momentum=0.9)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (8, 112, 112, 3), tx
    )
    images, targets = make_fixture()
    step = jit_train_step(YoloV1LossConfig(S=7), mesh)
    losses = []
    for _ in range(3):
        state, parts = step(
            state,
            put_global(images, image_sharding(mesh)),
            put_global(targets, data_sharding(mesh)),
        )
        losses.append(float(parts["total"]))
    print("LOSSES", " ".join(f"{x:.6f}" for x in losses), flush=True)

    # put_global must also RESHARD a jax.Array already placed under a
    # different sharding (the resident-loader-batch-through-put_img case on
    # a 'space' mesh): per-shard indexing would touch non-addressable
    # shards multi-process, so it goes through a compiled identity instead.
    from yolo_v1_tpu.parallel.mesh import replicated

    space_mesh = mesh_from_spec("data=4,space=2")
    placed = put_global(images, data_sharding(space_mesh))
    resharded = put_global(placed, image_sharding(space_mesh))
    assert resharded.sharding == image_sharding(space_mesh)
    # Fetch via a replicated copy (the sharded array itself spans the
    # other process's devices and is not fully addressable here).
    rep = jax.jit(lambda x: x, out_shardings=replicated(space_mesh))(
        resharded
    )
    import numpy as _np

    _np.testing.assert_array_equal(_np.asarray(rep), images)
    print("RESHARD_OK", flush=True)


def _build_fit_parts(data_dir: str, run_dir: str):
    """Everything cli.cmd_train builds, at test scale (shared by both the
    initial leg and the resume leg)."""
    from yolo_v1_tpu.data.pipeline import BatchLoader, PipelineConfig, YoloDataset
    from yolo_v1_tpu.data.voc import prep_test_data
    from yolo_v1_tpu.eval.voc_map import VocEvaluator
    from yolo_v1_tpu.parallel.mesh import is_coordinator
    from yolo_v1_tpu.train import checkpoint as ckpt
    from yolo_v1_tpu.train.metrics import MetricWriter
    from yolo_v1_tpu.utils.logging import create_logger

    pipe_cfg = PipelineConfig(image_size=112, S=7, B=2, C=20, seed=0, num_workers=2)
    train_list = os.path.join(data_dir, "train.txt")
    test_list = os.path.join(data_dir, "test.txt")
    # train=False: deterministic batches (no host-augment RNG) so the
    # single-process reference in the parent is directly comparable.
    train_ds = YoloDataset(train_list, train=False, config=pipe_cfg)
    loader = BatchLoader(train_ds, batch_size=8)
    mesh = mesh_from_spec("data=8")
    evaluator = VocEvaluator(
        YoloDataset(test_list, train=False, config=pipe_cfg),
        gt_full=prep_test_data(test_list),
        gt_little=prep_test_data(test_list, little_test=8),
        little_n=8, batch_size=8, mesh=mesh,
    )
    logger = create_logger(run_dir, "train")
    writer = MetricWriter(run_dir, logger=logger) if is_coordinator() else None
    manager = ckpt.CheckpointManager(run_dir, history_keep=2)
    model = build_model("tiny", S=7)
    tx = make_optimizer(lambda s: 1e-2, "sgd", momentum=0.9)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (8, 112, 112, 3), tx
    )
    return mesh, loader, evaluator, logger, writer, manager, state


def main_fit(data_dir: str, run_dir: str) -> None:
    """Two-process fit(): 2 epochs + checkpoint, then a resume leg."""
    from yolo_v1_tpu.train.loop import FitConfig, fit

    assert jax.process_count() == 2, jax.process_count()
    mesh, loader, evaluator, logger, writer, manager, state = _build_fit_parts(
        data_dir, run_dir
    )
    cfg = FitConfig(
        num_epochs=2, log_every=100, run_full_map_threshold=1.0,
        full_eval_at_end=False,
    )
    littles = []

    class SpyEval:  # record little-eval results for the parent to compare
        def little_map(self, s):
            m = evaluator.little_map(s)
            littles.append(m)
            return m

        def full_map(self, s):
            return evaluator.full_map(s)

    state, result = fit(
        state, loader.epoch, YoloV1LossConfig(S=7), mesh=mesh, config=cfg,
        evaluator=SpyEval(), checkpointer=manager, metric_writer=writer,
        logger=logger,
    )
    manager.wait()
    print(
        "FIT_LOSSES", " ".join(f"{x:.6f}" for x in result.epoch_losses),
        flush=True,
    )
    print("FIT_LITTLES", " ".join(f"{x:.6f}" for x in littles), flush=True)

    # --- resume leg: restore from the shared tree, one more epoch ---
    state2 = create_train_state(
        build_model("tiny", S=7), jax.random.PRNGKey(1), (8, 112, 112, 3),
        make_optimizer(lambda s: 1e-2, "sgd", momentum=0.9),
    )
    state2, last_completed, gates = manager.restore(state2)
    print("RESUME_FROM", last_completed, flush=True)
    cfg2 = FitConfig(
        num_epochs=3, log_every=100, run_full_map_threshold=1.0,
        full_eval_at_end=False,
    )
    state2, result2 = fit(
        state2, loader.epoch, YoloV1LossConfig(S=7), mesh=mesh, config=cfg2,
        evaluator=SpyEval(), checkpointer=manager, metric_writer=writer,
        logger=logger, start_epoch=last_completed + 1,
        initial_best_map=gates["best_map"],
        initial_last_little_map=gates["last_little_map"],
    )
    manager.wait()
    loader.close()
    evaluator.close()
    print(
        "RESUME_LOSSES", " ".join(f"{x:.6f}" for x in result2.epoch_losses),
        flush=True,
    )


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[3] == "fit":
        main_fit(sys.argv[4], sys.argv[5])
    else:
        main()
