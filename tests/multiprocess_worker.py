"""Worker for the two-process multi-host smoke test (test_parallel.py).

Each process owns 4 virtual CPU devices; jax.distributed.initialize joins
them into one 8-device global view (gloo collectives).  The worker runs
the PRODUCTION train-step path — mesh_from_spec + jit_train_step +
put_global (each process uploads only its addressable shards of the
identical global batch) — and prints its per-step losses for the parent
to compare across processes and against the single-process reference.

Usage: python multiprocess_worker.py <process_id> <coordinator_port>
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


if __name__ == "__main__":
    main()
