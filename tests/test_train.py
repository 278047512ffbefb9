"""Train-stack tests: LR schedule parity, jitted train step (single device
and 8-device mesh), loss-decreases smoke, fit() orchestration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_v1_tpu.core.grid import encode_targets
from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig
from yolo_v1_tpu.models.registry import build_model
from yolo_v1_tpu.parallel.mesh import make_mesh, shard_batch
from yolo_v1_tpu.train.loop import FitConfig, fit, jit_train_step
from yolo_v1_tpu.train.schedule import make_lr_schedule
from yolo_v1_tpu.train.state import create_train_state, make_optimizer


def ref_lr_trace(num_iters, steps_per_epoch, lr_map={1: 1e-3, 75: 1e-4, 115: 1e-5}):
    """Numpy port of the reference's mutable-LR policy
    (train.py:22-32, 158)."""
    lr = 0.0
    out = []
    it = 0
    epoch = 0
    while it < num_iters:
        for _ in range(steps_per_epoch):
            it += 1
            if it <= 1000:
                lr += 1e-6
            if epoch in lr_map:
                lr = lr_map[epoch]
            out.append(lr)
            if it >= num_iters:
                break
        epoch += 1
    return np.array(out)


def test_schedule_matches_reference_trace():
    steps_per_epoch = 1100  # warmup completes inside epoch 0, like VOC
    sched = make_lr_schedule(steps_per_epoch)
    n = steps_per_epoch * 3
    got = np.array([float(sched(i)) for i in range(0, n, 97)])
    want = ref_lr_trace(n, steps_per_epoch)[::97]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_schedule_late_epochs():
    spe = 100
    sched = make_lr_schedule(spe)
    assert float(sched(spe * 50)) == pytest.approx(1e-3)
    assert float(sched(spe * 80)) == pytest.approx(1e-4)
    assert float(sched(spe * 120)) == pytest.approx(1e-5)
    assert float(sched(0)) == pytest.approx(1e-6)
    assert float(sched(999)) == pytest.approx(1e-3)


def _tiny_setup(S=7, batch=8, lr=1e-2):
    model = build_model("tiny", S=S)
    tx = make_optimizer(lambda step: lr, "sgd", momentum=0.9)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (batch, 16 * S, 16 * S, 3), tx
    )
    rng = np.random.default_rng(1)
    images = rng.normal(0, 1, (batch, 16 * S, 16 * S, 3)).astype(np.float32)
    boxes = np.tile(np.array([[0.5, 0.5, 0.4, 0.4]], np.float32), (batch, 1))[:, None]
    labels = np.full((batch, 1), 3, np.int32)
    targets = np.asarray(
        encode_targets(boxes, labels, np.ones(batch, np.int32), S=S)
    )
    return state, images, targets


def test_train_step_single_device_loss_decreases():
    state, images, targets = _tiny_setup()
    step = jit_train_step(YoloV1LossConfig(S=7))
    losses = []
    for _ in range(10):
        state, parts = step(state, jnp.asarray(images), jnp.asarray(targets))
        losses.append(float(parts["total"]))
    assert losses[-1] < losses[0] * 0.8, losses
    assert int(state.step) == 10


def test_train_step_sharded_matches_single_device():
    """DP over the 8-device CPU mesh must give the same numbers as one
    device (same global batch, XLA inserts the all-reduce)."""
    mesh = make_mesh(8)
    state1, images, targets = _tiny_setup()
    state8, _, _ = _tiny_setup()

    step1 = jit_train_step(YoloV1LossConfig(S=7))
    step8 = jit_train_step(YoloV1LossConfig(S=7), mesh)

    im8, tg8 = shard_batch(mesh, images, targets)
    # One step: float reduction order differs across shardings and the
    # responsible-box argmax makes training chaotic over many steps, so
    # exact long-horizon agreement isn't expected — but a single update
    # must agree tightly.
    state1, parts1 = step1(state1, jnp.asarray(images), jnp.asarray(targets))
    state8, parts8 = step8(state8, im8, tg8)
    np.testing.assert_allclose(
        float(parts1["total"]), float(parts8["total"]), rtol=1e-4
    )
    p1 = jax.tree.leaves(state1.params)
    p8 = jax.tree.leaves(state8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_train_step_hybrid_replica_mesh_matches_single_device():
    """Multi-slice layout: batch sharded jointly over ('replica', 'data')
    (replica = the DCN axis between slices).  data_sharding resolves the
    joint spec transparently, so jit_train_step needs no changes — and one
    update must match the single-device numbers."""
    mesh = make_mesh(axis_names=("replica", "data"), shape=(2, 4))
    state1, images, targets = _tiny_setup()
    state8, _, _ = _tiny_setup()

    step1 = jit_train_step(YoloV1LossConfig(S=7))
    step8 = jit_train_step(YoloV1LossConfig(S=7), mesh)

    im8, tg8 = shard_batch(mesh, images, targets)
    assert im8.sharding.spec == jax.sharding.PartitionSpec(("replica", "data"))
    state1, parts1 = step1(state1, jnp.asarray(images), jnp.asarray(targets))
    state8, parts8 = step8(state8, im8, tg8)
    np.testing.assert_allclose(
        float(parts1["total"]), float(parts8["total"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree.leaves(state1.params), jax.tree.leaves(state8.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_train_step_data_space_sharded_matches_single_device():
    """2-D data x space mesh: image HEIGHT sharded over 'space' forces XLA
    SPMD to insert conv halo exchanges; the step must still reproduce the
    single-device update (halo-exchange correctness, not just finiteness)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yolo_v1_tpu.train.loop import make_train_step

    mesh = make_mesh(axis_names=("data", "space"), shape=(4, 2))
    state1, images, targets = _tiny_setup()
    state8, _, _ = _tiny_setup()

    step1 = jit_train_step(YoloV1LossConfig(S=7))
    repl = NamedSharding(mesh, P())
    img_sh = NamedSharding(mesh, P("data", "space"))
    tgt_sh = NamedSharding(mesh, P("data"))
    step8 = jax.jit(
        make_train_step(YoloV1LossConfig(S=7)),
        in_shardings=(repl, img_sh, tgt_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )

    im8 = jax.device_put(images, img_sh)
    tg8 = jax.device_put(targets, tgt_sh)
    state1, parts1 = step1(state1, jnp.asarray(images), jnp.asarray(targets))
    state8, parts8 = step8(state8, im8, tg8)
    np.testing.assert_allclose(
        float(parts1["total"]), float(parts8["total"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree.leaves(state1.params), jax.tree.leaves(state8.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fit_smoke(tmp_path):
    """fit() runs epochs, logs metrics, returns decreasing epoch losses."""
    from yolo_v1_tpu.train.metrics import MetricWriter

    state, images, targets = _tiny_setup()

    def loader(epoch):
        for _ in range(4):
            yield images, targets

    writer = MetricWriter(str(tmp_path))
    state, result = fit(
        state,
        loader,
        YoloV1LossConfig(S=7),
        config=FitConfig(num_epochs=3, log_every=2),
        metric_writer=writer,
    )
    assert len(result.epoch_losses) == 3
    assert result.epoch_losses[-1] < result.epoch_losses[0]
    assert "train loss" in writer.history
    assert len(writer.history["train loss"]) == 3
    writer.close()
    assert (tmp_path / "metrics.csv").exists()


def test_fit_weighted_batches_mask_padded_rows():
    """Loaders may yield (images, targets, weights) 3-tuples (epoch_plan
    wrap-padding); fit() must route the weights into the masked loss — a
    weight-0 duplicate row must produce the same update as down-weighting
    it would NOT."""
    from yolo_v1_tpu.train.loop import make_train_step

    state_a, images, targets = _tiny_setup(batch=8)
    state_b, _, _ = _tiny_setup(batch=8)

    # Reference: weighted step with explicit mask.
    w = np.array([1, 1, 1, 1, 1, 1, 0, 0], np.float32)
    step_w = jax.jit(make_train_step(YoloV1LossConfig(S=7), weighted=True))
    state_a, parts_a = step_w(
        state_a, jnp.asarray(images), jnp.asarray(targets), jnp.asarray(w)
    )

    # fit() with a 3-tuple loader must take the weighted path and match.
    def loader(epoch):
        yield images, targets, w

    state_b, result = fit(
        state_b, loader, YoloV1LossConfig(S=7),
        config=FitConfig(num_epochs=1, log_every=10),
    )
    assert result.epoch_losses[0] == pytest.approx(float(parts_a["total"]))
    for a, b in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_adam_optimizer_variant():
    state, images, targets = _tiny_setup()
    tx = make_optimizer(lambda s: 1e-3, "adam")
    state = state.replace(tx=tx, opt_state=tx.init(state.params))
    step = jit_train_step(YoloV1LossConfig(S=7))
    for _ in range(3):
        state, parts = step(state, jnp.asarray(images), jnp.asarray(targets))
    assert np.isfinite(float(parts["total"]))


def test_metric_writer_renders_dashboard(tmp_path):
    from yolo_v1_tpu.train.metrics import MetricWriter

    w = MetricWriter(str(tmp_path))
    for i in range(10):
        w.plot("train loss", 10.0 / (i + 1))
        w.plot("little mAP", i / 10.0)
    path = w.render_html()
    html = open(path).read()
    assert "train loss" in html and "polyline" in html
    w.close()


def test_model_summary_and_param_count():
    from yolo_v1_tpu.models.registry import build_model
    from yolo_v1_tpu.train.state import create_train_state, make_optimizer
    from yolo_v1_tpu.utils.summary import count_params, model_summary

    model = build_model("tiny", S=7)
    table = model_summary(model, (1, 112, 112, 3))
    assert "head" in table
    tx = make_optimizer(lambda s: 1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 112, 112, 3), tx)
    assert count_params(state.params) > 1000


def test_metric_writer_resumes_step_counters(tmp_path):
    from yolo_v1_tpu.train.metrics import MetricWriter

    w = MetricWriter(str(tmp_path))
    for i in range(3):
        w.plot("train loss", float(i))
    w.close()
    w2 = MetricWriter(str(tmp_path), resume=True)  # --resume relaunch
    w2.plot("train loss", 99.0)
    assert w2.history["train loss"][-1] == (3, 99.0)
    w2.close()
    import csv

    rows = [r for r in csv.reader(open(tmp_path / "metrics.csv"))][1:]
    keys = [(r[1], r[2]) for r in rows]
    assert len(keys) == len(set(keys))  # no duplicate (series, step)


def test_largest_divisor_device_count():
    from yolo_v1_tpu.parallel.mesh import largest_divisor_device_count

    assert largest_divisor_device_count(12, 8) == 6
    assert largest_divisor_device_count(16, 8) == 8
    assert largest_divisor_device_count(7, 8) == 7
    assert largest_divisor_device_count(5, 4) == 1


def test_weighted_step_with_ones_matches_unweighted():
    """weighted=True with all-ones weights is the identical computation."""
    state_a, images, targets = _tiny_setup()
    state_b, _, _ = _tiny_setup()
    step = jit_train_step(YoloV1LossConfig(S=7))
    step_w = jit_train_step(YoloV1LossConfig(S=7), weighted=True)
    state_a, parts_a = step(state_a, jnp.asarray(images), jnp.asarray(targets))
    state_b, parts_b = step_w(
        state_b, jnp.asarray(images), jnp.asarray(targets),
        jnp.ones((images.shape[0],), jnp.float32),
    )
    np.testing.assert_allclose(
        float(parts_a["total"]), float(parts_b["total"]), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fit_pads_nondividing_batch_over_mesh():
    """fit() with batch 12 on the 8-device mesh pads to 16, masks the 4
    wrap-around rows out of the loss, and still trains (loss finite and
    close to the single-device unpadded value — BN sees the duplicates, so
    agreement is approximate by design)."""
    mesh = make_mesh(8)
    state, images, targets = _tiny_setup(batch=12)
    state1, _, _ = _tiny_setup(batch=12)
    step1 = jit_train_step(YoloV1LossConfig(S=7))
    _, parts1 = step1(state1, jnp.asarray(images), jnp.asarray(targets))

    def loader(epoch):
        yield images, targets

    state, result = fit(
        state, loader, YoloV1LossConfig(S=7), mesh=mesh,
        config=FitConfig(num_epochs=1),
    )
    assert len(result.epoch_losses) == 1
    got, want = result.epoch_losses[0], float(parts1["total"])
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=0.05)


def test_fit_resume_keeps_best_map(tmp_path):
    """Resumed fit must not let a worse eval clobber the persisted best."""
    from yolo_v1_tpu.train import checkpoint as ckpt

    state, images, targets = _tiny_setup()

    class FakeEval:
        def __init__(self, little, full):
            self.little, self.full = little, full

        def little_map(self, s):
            return self.little

        def full_map(self, s):
            return self.full

    def loader(epoch):
        yield images, targets

    mgr = ckpt.CheckpointManager(str(tmp_path / "ck"))
    # First run: good model, best_map 0.6.
    state, result = fit(
        state, loader, YoloV1LossConfig(S=7),
        config=FitConfig(num_epochs=1, run_full_map_threshold=0.0),
        evaluator=FakeEval(0.7, 0.6), checkpointer=mgr,
    )
    best_step_before = mgr.restore(_tiny_setup()[0], best=True)[0].step
    # Resume: worse model (full eval 0.3) must NOT overwrite best.
    state2, last, gates = mgr.restore(_tiny_setup()[0])
    assert gates["best_map"] == 0.6
    state2, result2 = fit(
        state2, loader, YoloV1LossConfig(S=7),
        config=FitConfig(num_epochs=2, run_full_map_threshold=0.0),
        evaluator=FakeEval(0.9, 0.3), checkpointer=mgr,
        start_epoch=last + 1,
        initial_best_map=gates["best_map"],
        initial_last_little_map=gates["last_little_map"],
    )
    assert result2.best_map == 0.6
    best_after, e_best, ex = mgr.restore(_tiny_setup()[0], best=True)
    assert int(best_after.step) == int(best_step_before)


def test_gate_skipped_full_map_writes_no_point(tmp_path):
    """Epochs where the full-mAP gate does NOT pass must write NO point to
    the "mAP" series (the reference only plots when the eval ran,
    train.py:194-201) — a 0.0 point is indistinguishable from a real
    collapse on the dashboard.  Points that ARE written use the epoch as
    the x-index so the gap renders."""
    from yolo_v1_tpu.train.metrics import MetricWriter

    state, images, targets = _tiny_setup()

    class GatedEval:
        """little mAP passes the gate only on epoch 1 (values must also be
        strictly improving for the reference gate, train.py:194)."""

        def __init__(self):
            self.littles = iter([0.1, 0.7, 0.2])

        def little_map(self, s):
            return next(self.littles)

        def full_map(self, s):
            return 0.65

    def loader(epoch):
        yield images, targets

    writer = MetricWriter(str(tmp_path))
    fit(
        state, loader, YoloV1LossConfig(S=7),
        # full_eval_at_end=False pins the RAW reference gate semantics
        # (train.py:194-201); the escape hatches are tested separately.
        config=FitConfig(
            num_epochs=3, run_full_map_threshold=0.585,
            full_eval_at_end=False,
        ),
        evaluator=GatedEval(), metric_writer=writer,
    )
    # Only epoch 1 passed the gate: exactly one mAP point, at x=1, no 0.0s.
    assert writer.history["mAP"] == [(1, 0.65)]
    assert [p[0] for p in writer.history["little mAP"]] == [0, 1, 2]
    writer.close()


def test_full_eval_at_end_catches_late_best(tmp_path):
    """A final epoch whose strict-improvement gate skips the full eval
    (little fell vs the previous epoch) still gets ONE fit-end full eval,
    and a better result updates the best checkpoint — the VOC-scale
    rehearsal's epoch-40 hole (train.log 'full mAP skipped (gate)' on the
    best-ever little)."""
    from yolo_v1_tpu.train import checkpoint as ckpt
    from yolo_v1_tpu.train.metrics import MetricWriter

    state, images, targets = _tiny_setup()

    class LateBestEval:
        def __init__(self):
            self.littles = iter([0.8, 0.7])
            self.fulls = iter([0.5, 0.9])

        def little_map(self, s):
            return next(self.littles)

        def full_map(self, s):
            return next(self.fulls)

    def loader(epoch):
        yield images, targets

    writer = MetricWriter(str(tmp_path))
    mgr = ckpt.CheckpointManager(str(tmp_path / "ck"))
    state, result = fit(
        state, loader, YoloV1LossConfig(S=7),
        config=FitConfig(num_epochs=2, run_full_map_threshold=0.585),
        evaluator=LateBestEval(), checkpointer=mgr, metric_writer=writer,
    )
    # Epoch 0 gated-in (0.5); epoch 1 gate skipped but the fit-end eval ran
    # and its 0.9 became the new best.
    assert result.best_map == pytest.approx(0.9)
    assert writer.history["mAP"] == [(0, 0.5), (1, 0.9)]
    assert mgr.exists(best=True)
    _, _, extras = mgr.restore(_tiny_setup()[0], best=True)
    assert extras["best_map"] == pytest.approx(0.9)
    writer.close()


def test_full_eval_every_overrides_gate(tmp_path):
    """full_eval_every=N forces a full eval every N epochs even when the
    strict-improvement gate would skip (threshold 1.0 here, so the gate
    NEVER passes); no duplicate fit-end eval when the last epoch already
    ran full."""
    from yolo_v1_tpu.train.metrics import MetricWriter

    state, images, targets = _tiny_setup()
    calls = {"full": 0}

    class NeverGatedEval:
        def little_map(self, s):
            return 0.5

        def full_map(self, s):
            calls["full"] += 1
            return 0.4

    def loader(epoch):
        yield images, targets

    writer = MetricWriter(str(tmp_path))
    fit(
        state, loader, YoloV1LossConfig(S=7),
        config=FitConfig(
            num_epochs=4, run_full_map_threshold=1.0, full_eval_every=2,
        ),
        evaluator=NeverGatedEval(), metric_writer=writer,
    )
    # Forced at epochs 1 and 3 (1-indexed 2 and 4); epoch 3 ran full so the
    # fit-end hatch does not fire again.
    assert calls["full"] == 2
    assert [p[0] for p in writer.history["mAP"]] == [1, 3]
    writer.close()


def test_interrupt_during_eval_keeps_epoch_completed(tmp_path):
    """Ctrl-C while the evaluator runs must record the epoch as COMPLETED
    (its batches all ran) so resume doesn't train it twice."""
    from yolo_v1_tpu.train import checkpoint as ckpt

    state, images, targets = _tiny_setup()
    mgr = ckpt.CheckpointManager(str(tmp_path / "ck"))

    class InterruptingEval:
        def little_map(self, s):
            raise KeyboardInterrupt

        def full_map(self, s):
            return 0.0

    def loader(epoch):
        yield images, targets

    with pytest.raises(KeyboardInterrupt):
        fit(
            state, loader, YoloV1LossConfig(S=7),
            config=FitConfig(num_epochs=3),
            evaluator=InterruptingEval(), checkpointer=mgr,
        )
    _, last_completed, _ = mgr.restore(_tiny_setup()[0])
    assert last_completed == 0  # epoch 0's batches finished before the eval


def test_crash_during_eval_keeps_epoch_checkpoint(tmp_path):
    """A CRASH (not Ctrl-C) inside the evaluator must not lose the epoch
    that just trained: 'latest' is saved before the eval runs (measured
    live: the VOC-scale rehearsal's first gated full eval OOMed and the
    resume re-trained the epoch from scratch)."""
    from yolo_v1_tpu.train import checkpoint as ckpt

    state, images, targets = _tiny_setup()
    mgr = ckpt.CheckpointManager(str(tmp_path / "ck"))

    class CrashingEval:
        def little_map(self, s):
            raise RuntimeError("simulated RESOURCE_EXHAUSTED mid-eval")

        def full_map(self, s):
            return 0.0

    def loader(epoch):
        yield images, targets

    with pytest.raises(RuntimeError, match="mid-eval"):
        fit(
            state, loader, YoloV1LossConfig(S=7),
            config=FitConfig(num_epochs=3),
            evaluator=CrashingEval(), checkpointer=mgr,
        )
    mgr.wait()
    restored, last_completed, _ = mgr.restore(_tiny_setup()[0])
    assert last_completed == 0  # epoch 0 trained fully before the crash
    assert int(restored.step) == 1


def test_metric_writer_rotates_on_fresh_run(tmp_path):
    from yolo_v1_tpu.train.metrics import MetricWriter

    w = MetricWriter(str(tmp_path))
    w.plot("train loss", 1.0)
    w.close()
    w2 = MetricWriter(str(tmp_path))  # fresh run, no resume
    w2.plot("train loss", 2.0)
    assert w2.history["train loss"] == [(0, 2.0)]
    w2.close()
    assert (tmp_path / "metrics.1.csv").exists()


def test_metric_writer_image_panels(tmp_path):
    from yolo_v1_tpu.train.metrics import MetricWriter

    w = MetricWriter(str(tmp_path))
    img = np.zeros((32, 32, 3), np.uint8)
    img[:16] = 255
    w.img("detections", img)
    w.img("detections", img)
    w.plot("train loss", 1.0)
    html = open(w.render_html()).read()
    assert "panels/detections_00001.jpg" in html
    assert (tmp_path / "panels" / "detections_00000.jpg").exists()
    assert (tmp_path / "panels" / "detections_00001.jpg").exists()
    w.close()
