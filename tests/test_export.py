"""Serving-artifact export (eval/export.py + cli export): serialize the
fused serving program to StableHLO, deserialize, and get the exact same
detections back with no model code."""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_v1_tpu.eval.export import (
    export_serving, load_serving_artifact, write_serving_artifact,
)
from yolo_v1_tpu.models.registry import build_model


def test_export_round_trip_matches_predictor(rng, tmp_path):
    model = build_model("tiny", S=7)
    images = jnp.asarray(rng.normal(0, 1, (1, 112, 112, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), images, train=False)

    blob, meta = export_serving(
        model, variables, S=7, batch=4, image_size=112,
        score_threshold=0.0, platforms=("cpu",),
    )
    write_serving_artifact(str(tmp_path), blob, meta)
    assert meta["K"] == 7 * 7 * 2 and meta["batch"] == 4

    call, meta2 = load_serving_artifact(str(tmp_path))
    assert meta2 == meta
    u8 = rng.integers(0, 255, (4, 112, 112, 3)).astype(np.uint8)
    boxes, scores, classes, keep = jax.tree.map(np.asarray, call(u8))
    assert boxes.shape == (4, 98, 4) and keep.dtype == bool

    from yolo_v1_tpu.eval.predictor import Predictor

    ref = Predictor(
        model, variables, S=7, score_threshold=0.0, nms_impl="xla"
    )
    rb, rs, rc, rk = jax.tree.map(
        np.asarray, ref._predict(variables, jnp.asarray(u8))
    )
    # classes/keep are exact; boxes/scores agree to numeric tolerance (the
    # export pipeline fuses differently than the in-process jit — measured
    # max |d| ~3e-4 on scores, ~4e-5 on boxes).
    np.testing.assert_array_equal(classes, rc)
    np.testing.assert_array_equal(keep, rk)
    np.testing.assert_allclose(boxes, rb, atol=1e-3)
    np.testing.assert_allclose(scores, rs, atol=1e-3)


def test_cli_export_writes_artifact(tmp_path, capsys):
    from yolo_v1_tpu import cli

    save_dir = str(tmp_path / "exp")
    rc = cli.main(
        ["export", "--backbone", "tiny", "--S", "7", "--image_size", "112",
         "--eval_batch_size", "2", "--bf16", "false",
         "--save_dir", save_dir]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert out.endswith("serving.stablehlo")
    call, meta = load_serving_artifact(save_dir)
    assert meta["batch"] == 2 and meta["image_size"] == 112
    assert len(meta["class_names"]) == 20
    u8 = np.zeros((2, 112, 112, 3), np.uint8)
    outs = call(u8)
    assert np.asarray(outs[0]).shape == (2, 98, 4)


def test_cli_export_int8_artifact(voc_tree, tmp_path):
    """--int8 exports the interceptor-quantized forward (W8A8 dots are
    portable StableHLO); the artifact loads and serves."""
    from yolo_v1_tpu import cli

    list_file, _ = voc_tree
    save_dir = str(tmp_path / "exp8")
    rc = cli.main(
        ["export", "--backbone", "tiny", "--S", "7", "--image_size", "112",
         "--eval_batch_size", "2", "--bf16", "false", "--int8", "true",
         "--test_list", list_file, "--save_dir", save_dir]
    )
    assert rc == 0
    call, meta = load_serving_artifact(save_dir)
    assert meta["int8"] is True
    outs = call(np.zeros((2, 112, 112, 3), np.uint8))
    assert np.asarray(outs[0]).shape == (2, 98, 4)


def test_cli_export_torch_writes_pth(tmp_path, capsys):
    """export-torch writes a reference-layout .pth (module.-prefixed) from
    the run dir (random init when no checkpoint; the warning path) and
    refuses backbones with no torch layout."""
    import torch

    from yolo_v1_tpu import cli

    save_dir = str(tmp_path / "r18")
    rc = cli.main(
        ["export-torch", "--backbone", "resnet18", "--S", "14",
         "--bf16", "false", "--save_dir", save_dir,
         "--torch_out", str(tmp_path / "out.pth")]
    )
    assert rc == 0
    assert capsys.readouterr().out.strip().endswith("out.pth")
    sd = torch.load(str(tmp_path / "out.pth"), weights_only=True)
    assert all(k.startswith("module.") for k in sd)
    assert "module.layer6.weight" in sd  # detection head (OriginResNet.py:133)
    assert sd["module.conv1.weight"].shape == (64, 3, 7, 7)

    assert cli.main(
        ["export-torch", "--backbone", "tiny", "--S", "7",
         "--save_dir", str(tmp_path / "t")]
    ) == 2
