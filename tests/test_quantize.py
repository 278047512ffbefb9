"""int8 serving-path quantization tests (eval/quantize.py).

Mechanical exactness: with conv weights that are exact int8-scale
multiples and inputs on the activation-scale lattice, the int8 path must
reproduce the f32 conv bit-for-bit.  Fidelity: on a real (randomly
initialized) model the quantized logits must track f32 closely, and the
quantized state must drive the unchanged detector."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_v1_tpu.eval.quantize import calibrate, quantize_state
from yolo_v1_tpu.models.registry import build_model
from yolo_v1_tpu.train.state import TrainState


def _state(model):
    images = jnp.zeros((2, 112, 112, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=None,
        opt_state=None,
    )


def test_quantized_conv_exact_on_lattice():
    """Weights already on the int8 grid + inputs on the activation lattice
    -> quantization is lossless and the int8 path equals f32 exactly."""
    from flax import linen as nn

    class OneConv(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(
                8, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                name="conv",
            )(x)

    model = OneConv()
    x0 = jnp.zeros((1, 8, 8, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)
    rng = np.random.default_rng(0)
    # Integer weights with every output channel's max pinned at 127, so the
    # per-channel scale is exactly 1.0 and w quantizes losslessly.
    w = rng.integers(-127, 128, (3, 3, 4, 8)).astype(np.float32)
    w[0, 0, 0, :] = 127.0
    params = {"conv": {"kernel": jnp.asarray(w)}}
    state = TrainState(
        step=jnp.zeros((), jnp.int32), apply_fn=model.apply, params=params,
        batch_stats={}, tx=None, opt_state=None,
    )
    # Input amax 127 -> s_x = 1.0 -> integer inputs are exactly on-lattice.
    xi = rng.integers(-127, 128, (1, 8, 8, 4)).astype(np.float32)
    qstate = quantize_state(state, {"conv": 127.0})
    want = model.apply({"params": params, "batch_stats": {}}, jnp.asarray(xi))
    got = qstate.apply_fn(
        {"params": qstate.params, "batch_stats": {}}, jnp.asarray(xi)
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("name", ["tiny"])
def test_quantized_forward_tracks_f32(name):
    model = build_model(name, S=7)
    state = _state(model)
    rng = np.random.default_rng(1)
    images = jnp.asarray(
        rng.normal(0, 1, (2, 112, 112, 3)).astype(np.float32)
    )
    amax = calibrate(state, [images])
    assert amax and all(v > 0 for v in amax.values())
    qstate = quantize_state(state, amax)

    want = np.asarray(
        state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False,
        )
    )
    got = np.asarray(
        qstate.apply_fn(
            {"params": qstate.params, "batch_stats": qstate.batch_stats},
            images, train=False,
        )
    )
    assert got.shape == want.shape
    # Post-sigmoid grids: int8 rounding noise stays small and correlated.
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.995, corr
    assert np.abs(got - want).mean() < 0.02


def test_per_conv_quant_error_report():
    """The per-layer accounting: isolated rel-L2 error per conv on the f32
    forward's own activations.  Small everywhere on a sane calibration; the
    lattice conv from the exactness test reports ~0; a sabotaged scale is
    flagged on exactly the conv it belongs to."""
    from yolo_v1_tpu.eval.quantize import per_conv_quant_error

    model = build_model("tiny", S=7)
    state = _state(model)
    rng = np.random.default_rng(4)
    images = rng.normal(0, 1, (2, 112, 112, 3)).astype(np.float32)
    amax = calibrate(state, [images])
    errs = per_conv_quant_error(state, amax, images)
    assert set(errs) == set(amax)
    assert all(0 <= v < 0.1 for v in errs.values()), errs

    # Sabotage one conv's activation scale 100x: only that conv's isolated
    # error explodes (errors don't propagate — each conv gets f32 inputs).
    victim = sorted(amax)[len(amax) // 2]
    bad = dict(amax)
    bad[victim] = amax[victim] * 100.0
    errs_bad = per_conv_quant_error(state, bad, images)
    assert errs_bad[victim] > 0.3, errs_bad[victim]
    for k, v in errs_bad.items():
        if k != victim:
            assert v == pytest.approx(errs[k], abs=1e-5)


def test_quantized_state_drives_detector_and_evaluator():
    from yolo_v1_tpu.eval.voc_map import make_detector

    model = build_model("tiny", S=7)
    state = _state(model)
    images = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (2, 112, 112, 3)).astype(
            np.float32
        )
    )
    qstate = quantize_state(state, calibrate(state, [images]))
    detector = make_detector(S=7)
    boxes, scores, classes, keep = detector(qstate, images)
    assert boxes.shape == (2, 98, 4) and keep.dtype == jnp.bool_


@pytest.mark.slow
def test_quantized_resnet50_tracks_f32():
    """Full flagship architecture (stride-2 stem, bottlenecks, S==7 layer5,
    1x1 head) through the int8 path at reduced resolution."""
    model = build_model("resnet50", S=7, dtype=jnp.float32)
    images = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (2, 112, 112, 3)).astype(
            np.float32
        )
    )
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), apply_fn=model.apply,
        params=variables["params"], batch_stats=variables["batch_stats"],
        tx=None, opt_state=None,
    )
    qstate = quantize_state(state, calibrate(state, [images]))
    want = np.asarray(
        state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False,
        )
    )
    got = np.asarray(
        qstate.apply_fn(
            {"params": qstate.params, "batch_stats": qstate.batch_stats},
            images, train=False,
        )
    )
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.99, corr
