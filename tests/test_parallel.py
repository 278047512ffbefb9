"""Mesh/sharding tests + the graft-entry dryrun contract on the virtual
8-device CPU platform."""

import importlib.util
import os

import jax
import numpy as np
import pytest

from yolo_v1_tpu.parallel.mesh import (
    data_sharding, dp_size, image_sharding, make_mesh, mesh_from_spec,
    pad_to_multiple, replicated, shard_batch,
)


def test_make_mesh_single_axis():
    mesh = make_mesh(8)
    assert mesh.axis_names == ("data",)
    assert mesh.devices.shape == (8,)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(4)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    sx = shard_batch(mesh, x)
    assert sx.sharding.spec == data_sharding(mesh).spec
    np.testing.assert_array_equal(np.asarray(sx), x)


def test_pad_to_multiple():
    x = np.arange(10).reshape(5, 2)
    padded, n = pad_to_multiple(x, 4)
    assert padded.shape == (8, 2) and n == 5
    # wrap-around copies of REAL rows (never garbage/last-row repeats)
    np.testing.assert_array_equal(padded[5:], x[:3])
    same, n2 = pad_to_multiple(np.ones((8, 2)), 4)
    assert same.shape == (8, 2) and n2 == 8
    # device arrays stay on device (no numpy detour)
    import jax.numpy as jnp

    dx = jnp.asarray(x)
    dpadded, dn = pad_to_multiple(dx, 4)
    assert isinstance(dpadded, jax.Array) and dn == 5
    np.testing.assert_array_equal(np.asarray(dpadded), padded)


def test_replicated_spec():
    mesh = make_mesh(2)
    assert replicated(mesh).spec == jax.sharding.PartitionSpec()


def test_mesh_from_spec_full_hybrid():
    mesh = mesh_from_spec("replica=2,data=2,space=2")
    assert mesh.axis_names == ("replica", "data", "space")
    assert mesh.devices.shape == (2, 2, 2)
    assert dp_size(mesh) == 4


def test_mesh_from_spec_wildcard_fills_devices():
    mesh = mesh_from_spec("data=-1")
    assert mesh.devices.shape == (len(jax.devices()),)
    mesh2 = mesh_from_spec("data=-1,space=2")
    assert mesh2.devices.shape == (len(jax.devices()) // 2, 2)
    assert dp_size(mesh2) == len(jax.devices()) // 2


def test_mesh_from_spec_rejects_bad_specs():
    with pytest.raises(ValueError, match="unknown"):
        mesh_from_spec("model=2,data=4")
    with pytest.raises(ValueError, match="order"):
        mesh_from_spec("data=4,replica=2")  # replica is DCN: must lead
    with pytest.raises(ValueError, match="'data'"):
        mesh_from_spec("replica=2,space=2")
    with pytest.raises(ValueError, match="devices"):
        mesh_from_spec("data=16")  # only 8 virtual devices
    with pytest.raises(ValueError, match="twice"):
        mesh_from_spec("data=2,data=2")
    with pytest.raises(ValueError, match="wildcard"):
        mesh_from_spec("replica=-1,data=-1")
    with pytest.raises(ValueError, match="name=size"):
        mesh_from_spec("data")


def test_mesh_from_spec_warns_on_idle_devices():
    """A spec whose product doesn't divide the device count runs on a
    subset — allowed, but loudly (ADVICE r4: the docstring used to claim
    divisibility was enforced)."""
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mesh = mesh_from_spec("data=3")  # 8 virtual devices -> 5 idle
    assert mesh.devices.size == 3
    assert any("idle" in str(x.message) for x in w), [str(x.message) for x in w]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mesh_from_spec("data=4")  # divides: no warning
    assert not w


def test_image_sharding_adds_space_axis():
    from jax.sharding import PartitionSpec as P

    flat = mesh_from_spec("data=8")
    assert image_sharding(flat).spec == P("data")
    hybrid = mesh_from_spec("replica=2,data=2,space=2")
    assert image_sharding(hybrid).spec == P(("replica", "data"), "space")
    assert data_sharding(hybrid).spec == P(("replica", "data"))


def _load_graft():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_graft_entry_contract():
    mod = _load_graft()
    fn, args = mod.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (8, 7, 7, 30)


@pytest.mark.slow
def test_graft_dryrun_multichip():
    mod = _load_graft()
    mod.dryrun_multichip(8)  # asserts internally; conftest already forced cpu


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    """REAL multi-host smoke: two OS processes, 4 virtual CPU devices
    each, joined by jax.distributed.initialize (gloo collectives), running
    the production mesh_from_spec + jit_train_step + put_global path.
    Losses must be finite, decreasing, identical across processes, AND
    identical to the single-process 8-device run (this test's own
    environment) — per-host shard feeding changes nothing numerically."""
    import socket
    import subprocess
    import sys as _sys

    worker = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [_sys.executable, worker, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("LOSSES")]
        assert line, out
        losses.append([float(x) for x in line[0].split()[1:]])
        # put_global's jax.Array reshard branch (data->image sharding on a
        # 'space' mesh) verified inside the worker.
        assert "RESHARD_OK" in out, out
    assert losses[0] == losses[1]
    assert losses[0][-1] < losses[0][0]

    # Single-process reference on this test env's own 8-device mesh.
    from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig
    from yolo_v1_tpu.parallel.mesh import (
        data_sharding, image_sharding, mesh_from_spec, put_global,
    )
    from yolo_v1_tpu.train.loop import jit_train_step
    from yolo_v1_tpu.train.state import create_train_state, make_optimizer

    # Importing the worker would re-run distributed init; only reuse its
    # fixture builder by exec'ing that single function:
    src = open(worker).read()
    ns = {}
    exec(  # noqa: S102 - test-local, fixture code only
        src[src.index("def make_fixture"):src.index("def main")], ns
    )
    import numpy as _np

    ns["np"] = _np
    from yolo_v1_tpu.core.grid import encode_targets as _enc

    ns["encode_targets"] = _enc
    images, targets = ns["make_fixture"]()

    from yolo_v1_tpu.models.registry import build_model

    mesh = mesh_from_spec("data=8")
    model = build_model("tiny", S=7)
    tx = make_optimizer(lambda s: 1e-2, "sgd", momentum=0.9)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (8, 112, 112, 3), tx
    )
    step = jit_train_step(YoloV1LossConfig(S=7), mesh)
    ref = []
    for _ in range(3):
        state, parts = step(
            state,
            put_global(images, image_sharding(mesh)),
            put_global(targets, data_sharding(mesh)),
        )
        ref.append(float(parts["total"]))
    # Cross-process psum (gloo) reduces in a different order than the
    # single-process XLA collective — float32 agreement is ~1e-4 relative,
    # not bit-exact (measured 21.193609 vs 21.193710 on step 1).
    np.testing.assert_allclose(losses[0], ref, rtol=5e-4)


@pytest.mark.slow
def test_two_process_distributed_fit_checkpoint_resume(tmp_path):
    """REAL multi-host fit(): two processes drive the FULL production
    training loop under jax.distributed — BatchLoader feeding, the real
    VocEvaluator little-eval each epoch, collective CheckpointManager
    saves, coordinator-gated log/metrics — then RESUME from the shared
    checkpoint tree.  Asserts: losses and little-mAPs identical across
    processes and (to gloo tolerance) equal to a single-process run; ONE
    valid checkpoint tree; run-dir files written by process 0 only."""
    import socket
    import subprocess
    import sys as _sys

    from yolo_v1_tpu.data.synthetic import generate_dataset

    data_dir, run_dir = str(tmp_path / "data"), str(tmp_path / "run")
    generate_dataset(data_dir, n_train=16, n_test=8, image_size=112, seed=3)

    worker = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [_sys.executable, worker, str(i), str(port), "fit", data_dir,
             run_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs

    def parse(out, key):
        line = [ln for ln in out.splitlines() if ln.startswith(key + " ")]
        assert line, (key, out)
        return [float(x) for x in line[0].split()[1:]]

    # Identical across processes: the loop made the same decisions
    # everywhere (no divergent gate/checkpoint state).
    for key in ("FIT_LOSSES", "FIT_LITTLES", "RESUME_LOSSES"):
        assert parse(outs[0], key) == parse(outs[1], key), (key, outs)
    assert parse(outs[0], "RESUME_FROM") == [1.0]  # epochs 0-1 completed

    # ONE valid checkpoint tree on the shared path: epoch 2 is the latest
    # completed epoch after the resume leg; history keeps the newest two.
    from yolo_v1_tpu.models.registry import build_model
    from yolo_v1_tpu.train import checkpoint as ckpt
    from yolo_v1_tpu.train.state import create_train_state, make_optimizer

    st = create_train_state(
        build_model("tiny", S=7), jax.random.PRNGKey(0), (8, 112, 112, 3),
        make_optimizer(lambda s: 1e-2, "sgd", momentum=0.9),
    )
    restored, last_completed, gates = ckpt.CheckpointManager(run_dir).restore(st)
    assert last_completed == 2
    assert int(restored.step) == 6  # 3 epochs x 2 steps of batch 8 over 16
    hist = sorted(d for d in os.listdir(run_dir) if d.startswith("epoch_"))
    assert hist == ["epoch_0001", "epoch_0002"]

    # Run-dir hygiene: exactly one metrics.csv / train.log, written by the
    # coordinator (process 1's logger is stream-only, so no '[p1]' lines).
    assert os.path.exists(os.path.join(run_dir, "metrics.csv"))
    log = open(os.path.join(run_dir, "train.log")).read()
    assert "[p1]" not in log
    assert log.count("Starting epoch 1 /") == 1  # one writer, not two

    # Single-process reference: same data, same loop, same epochs.
    from yolo_v1_tpu.data.pipeline import (
        BatchLoader, PipelineConfig, YoloDataset,
    )
    from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig
    from yolo_v1_tpu.train.loop import FitConfig, fit

    pipe_cfg = PipelineConfig(
        image_size=112, S=7, B=2, C=20, seed=0, num_workers=2
    )
    loader = BatchLoader(
        YoloDataset(
            os.path.join(data_dir, "train.txt"), train=False, config=pipe_cfg
        ),
        batch_size=8,
    )
    state = create_train_state(
        build_model("tiny", S=7), jax.random.PRNGKey(0), (8, 112, 112, 3),
        make_optimizer(lambda s: 1e-2, "sgd", momentum=0.9),
    )
    state, result = fit(
        state, loader.epoch, YoloV1LossConfig(S=7),
        mesh=mesh_from_spec("data=8"),
        config=FitConfig(num_epochs=2, log_every=100),
    )
    loader.close()
    # Epoch 0 agrees to ~1e-4 (gloo vs XLA psum reduction order); epoch 1
    # compounds that difference through 2 momentum-0.9 SGD updates of a
    # tiny randomly-initialized net — measured 0.23% drift, so 1% bound.
    np.testing.assert_allclose(
        parse(outs[0], "FIT_LOSSES"), result.epoch_losses, rtol=1e-2
    )
