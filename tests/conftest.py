"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-chip sharding behavior is tested without TPUs via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4) — the analog of
testing multi-node without a cluster.  These env vars must be set before the
first ``import jax`` anywhere in the test process.
"""

import os

# The session environment presets JAX_PLATFORMS=axon (a tunneled real TPU
# chip) and its sitecustomize imports jax at interpreter startup, so setting
# the env var here is too late for jax's config default.  Backends are still
# uninitialized at this point, so jax.config.update works; XLA_FLAGS is read
# lazily when the CPU client is created, so setting it here is in time.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_voc_tree(root, n_images=8, image_size=112, n_classes=20, seed=0):
    """Synthetic VOC-style tree: JPEGImages/*.jpg + labels/*.txt + list file.

    Each image contains 1-3 solid colored rectangles; labels follow the
    'cls cx cy w h' normalized convention of the reference converter
    (testCodes/voc_label.py:13-24 output format).
    Returns (list_file_path, per_image_gt) where per_image_gt maps
    image_id -> [(cls, cx, cy, w, h)].
    """
    import cv2

    g = np.random.default_rng(seed)
    img_dir = root / "JPEGImages"
    lab_dir = root / "labels"
    img_dir.mkdir(parents=True, exist_ok=True)
    lab_dir.mkdir(parents=True, exist_ok=True)
    gt = {}
    lines = []
    for i in range(n_images):
        img = g.integers(0, 60, (image_size, image_size, 3), np.uint8)
        boxes = []
        # One box per quadrant so boxes never overlap enough for NMS to
        # suppress across objects (keeps oracle-mAP tests exact).
        quadrants = g.permutation(4)[: int(g.integers(1, 4))]
        for q in quadrants:
            cls = int(g.integers(0, n_classes))
            w, h = g.uniform(0.2, 0.38, 2)
            cx = (q % 2) * 0.5 + 0.25 + g.uniform(-0.04, 0.04)
            cy = (q // 2) * 0.5 + 0.25 + g.uniform(-0.04, 0.04)
            x1, y1 = int((cx - w / 2) * image_size), int((cy - h / 2) * image_size)
            x2, y2 = int((cx + w / 2) * image_size), int((cy + h / 2) * image_size)
            color = tuple(int(c) for c in g.integers(120, 255, 3))
            cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
            boxes.append((cls, float(cx), float(cy), float(w), float(h)))
        # Distinct marker block (survives JPEG) so tests can identify the
        # image from pixels alone (used by the oracle-model eval test).
        img[:8, :8] = 10 + (i * 220) // max(n_images - 1, 1)
        name = f"img{i:03d}"
        cv2.imwrite(str(img_dir / f"{name}.jpg"), img)
        with open(lab_dir / f"{name}.txt", "w") as f:
            for cls, cx, cy, w, h in boxes:
                f.write(f"{cls} {cx} {cy} {w} {h}\n")
        gt[name] = boxes
        lines.append(str(img_dir / f"{name}.jpg"))
    list_file = root / "list.txt"
    list_file.write_text("\n".join(lines) + "\n")
    return str(list_file), gt


@pytest.fixture
def voc_tree(tmp_path):
    return make_voc_tree(tmp_path)
