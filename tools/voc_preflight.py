"""Real-VOC preflight: validate a mounted VOCdevkit end-to-end, so the
moment the dataset becomes mountable the headline run (README.md:12 of the
reference: ResNet-50-S7, warmup recipe, VOC2007-test mAP 0.632) launches
with zero debugging.

Checks, in order (each prints PASS/FAIL; exit code 0 only if all pass):

1. **Layout** — VOCdevkit/VOC<year>/{Annotations,JPEGImages,ImageSets}
   present for every (year, set) the converter consumes; every image id in
   each ImageSets list resolves to a .jpg and an .xml.
2. **Conversion** — run ``convert_voc_annotations`` (the cli prepare-data
   path, reference testCodes/voc_label.py) and compare list cardinalities
   against the expected VOC counts (train.txt aggregate 16,551 = 07+12
   trainval, 2007_test.txt 4,952 — reference datasets/, SURVEY.md §6).
3. **Round-trip** — for a sample of images, re-parse the XML and verify
   the written labels reproduce the reference's ``(cx-1)/w`` center
   convention bit-for-bit, and that ``load_gt_boxes`` box counts match
   the XML object counts (difficult included, voc_label.py:38).
4. **Train smoke** — ``--smoke true``: N train steps of the configured
   backbone on converted data (loss finite and decreasing) plus one
   little-eval through the full VocEvaluator, i.e. every subsystem the
   real run touches.

Then prints the one-command headline launch.

Usage:
  python tools/voc_preflight.py --devkit_base /data/voc --out_dir datasets \
      [--smoke true] [--smoke_steps 20] [--backbone resnet50] \
      [--expect '{"train.txt": 16551, "2007_test.txt": 4952}']

Exercised against the synthetic devkit fixture in tests/test_voc_preflight.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from yolo_v1_tpu.data.voc import (  # noqa: E402
    DEFAULT_SETS, VOC_CLASSES, convert_box_to_yolo, convert_voc_annotations,
    load_gt_boxes, parse_label_file, read_list_file,
)

EXPECTED_VOC = {"train.txt": 16551, "2007_test.txt": 4952}


def _fail(msg: str) -> bool:
    print(f"FAIL  {msg}")
    return False


def _ok(msg: str) -> bool:
    print(f"PASS  {msg}")
    return True


def check_layout(devkit_base: str, sets=DEFAULT_SETS) -> tuple[bool, list]:
    """Check devkit structure; returns (ok, [(year, set)] actually present).
    Partial devkits (e.g. 2007-only) pass layout but will fail the
    cardinality check unless --expect is relaxed."""
    ok, present = True, []
    for year, image_set in sets:
        root = os.path.join(devkit_base, "VOCdevkit", f"VOC{year}")
        ids_file = os.path.join(root, "ImageSets", "Main", f"{image_set}.txt")
        if not os.path.exists(ids_file):
            print(f"      note: {year}/{image_set} absent ({ids_file})")
            continue
        ids = open(ids_file).read().split()
        missing_jpg = missing_xml = 0
        for i in ids:
            if not os.path.exists(os.path.join(root, "JPEGImages", i + ".jpg")):
                missing_jpg += 1
            if not os.path.exists(os.path.join(root, "Annotations", i + ".xml")):
                missing_xml += 1
        if missing_jpg or missing_xml:
            ok = _fail(
                f"layout {year}/{image_set}: {len(ids)} ids, "
                f"{missing_jpg} missing .jpg, {missing_xml} missing .xml"
            )
        else:
            _ok(f"layout {year}/{image_set}: {len(ids)} ids, all files present")
            present.append((year, image_set))
    if not present:
        ok = _fail(f"no VOCdevkit image sets found under {devkit_base}")
    return ok, present


def check_conversion(devkit_base: str, out_dir: str, expect: dict) -> bool:
    counts = convert_voc_annotations(devkit_base, out_dir)
    ok = True
    for name, n in counts.items():
        print(f"      converted {name}: {n} images")
    for name, want in expect.items():
        got = counts.get(name)
        if got is None:
            path = os.path.join(out_dir, name)
            got = len(read_list_file(path)) if os.path.exists(path) else None
        if got != want:
            ok = _fail(f"cardinality {name}: expected {want}, got {got}")
        else:
            _ok(f"cardinality {name}: {got}")
    return ok


def check_roundtrip(
    devkit_base: str, out_dir: str, list_name: str, sample: int = 64
) -> bool:
    """Labels on disk must reproduce the reference conversion formula from
    the XML, and load_gt_boxes must see every object."""
    list_path = os.path.join(out_dir, list_name)
    if not os.path.exists(list_path):
        return _fail(f"round-trip: no list file {list_path}")
    paths = read_list_file(list_path)
    step = max(1, len(paths) // sample)
    checked = 0
    for img_path in paths[::step][:sample]:
        xml_path = (
            img_path.replace("JPEGImages", "Annotations")
            .replace(".jpg", ".xml")
        )
        tree = ET.parse(xml_path)
        size = tree.find("size")
        w, h = float(size.find("width").text), float(size.find("height").text)
        want = []
        for obj in tree.iter("object"):
            cls = obj.find("name").text
            if cls not in VOC_CLASSES:
                continue
            b = obj.find("bndbox")
            want.append(
                (VOC_CLASSES.index(cls),)
                + convert_box_to_yolo(
                    (w, h),
                    tuple(
                        float(b.find(k).text)
                        for k in ("xmin", "xmax", "ymin", "ymax")
                    ),
                )
            )
        label_path = img_path.replace("JPEGImages", "labels").replace(
            "jpg", "txt"
        )
        boxes, labels = parse_label_file(label_path)
        if len(boxes) != len(want):
            return _fail(
                f"round-trip {img_path}: {len(want)} XML objects vs "
                f"{len(boxes)} label rows"
            )
        for (cls, cx, cy, bw, bh), row, lab in zip(want, boxes, labels):
            got = (int(lab), *[float(v) for v in row])
            if int(lab) != cls or any(
                abs(a - b) > 1e-5 for a, b in zip((cx, cy, bw, bh), row)
            ):
                return _fail(
                    f"round-trip {img_path}: XML {(cls, cx, cy, bw, bh)} "
                    f"vs label {got}"
                )
        if len(load_gt_boxes(img_path)) != len(want):
            return _fail(f"round-trip {img_path}: load_gt_boxes count mismatch")
        checked += 1
    return _ok(f"round-trip: {checked} images re-derived from XML exactly")


def check_train_smoke(
    train_list: str,
    test_list: str,
    backbone: str,
    steps: int,
    image_size: int,
    little_n: int = 32,
) -> bool:
    """N real train steps + one little-eval through the production stack."""
    import jax
    import numpy as np

    from yolo_v1_tpu.configs.config import ExperimentConfig
    from yolo_v1_tpu.data.pipeline import (
        BatchLoader, PipelineConfig, YoloDataset,
    )
    from yolo_v1_tpu.data.voc import prep_test_data
    from yolo_v1_tpu.eval.voc_map import VocEvaluator
    from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig
    from yolo_v1_tpu.models.registry import build_model
    from yolo_v1_tpu.train.loop import jit_train_step
    from yolo_v1_tpu.train.state import create_train_state, make_optimizer

    cfg = ExperimentConfig(backbone=backbone, S=7, image_size=image_size)
    pipe_cfg = PipelineConfig(image_size=image_size, S=7, num_workers=2)
    ds = YoloDataset(train_list, train=True, config=pipe_cfg)
    loader = BatchLoader(ds, batch_size=8)
    import jax.numpy as jnp

    model = build_model(
        backbone, S=7, dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, image_size, image_size, 3),
        make_optimizer(lambda s: 1e-3, "sgd", momentum=0.9),
    )
    step = jit_train_step(YoloV1LossConfig(S=7))
    losses = []
    it = iter(loader.epoch(0))
    for i in range(steps):
        try:
            images, targets = next(it)
        except StopIteration:
            it = iter(loader.epoch(i))
            images, targets = next(it)
        state, parts = step(state, jnp.asarray(images), jnp.asarray(targets))
        losses.append(float(parts["total"]))
    loader.close()
    if not all(np.isfinite(losses)):
        return _fail(f"train smoke: non-finite loss {losses}")
    if losses[-1] >= losses[0]:
        return _fail(
            f"train smoke: loss did not decrease over {steps} steps "
            f"({losses[0]:.3f} -> {losses[-1]:.3f})"
        )
    _ok(
        f"train smoke: {steps} steps, loss {losses[0]:.3f} -> "
        f"{losses[-1]:.3f}"
    )
    evaluator = VocEvaluator(
        YoloDataset(test_list, train=False, config=pipe_cfg),
        gt_full=prep_test_data(test_list),
        gt_little=prep_test_data(test_list, little_test=little_n),
        little_n=little_n, batch_size=8,
    )
    try:
        m = evaluator.little_map(state)
    finally:
        evaluator.close()
    if not np.isfinite(m) or not (0.0 <= m <= 1.0):
        return _fail(f"little-eval smoke: bad mAP {m}")
    return _ok(f"little-eval smoke: mAP {m:.4f} over {little_n} images")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--devkit_base", required=True)
    p.add_argument("--out_dir", default="datasets")
    p.add_argument(
        "--expect", default=json.dumps(EXPECTED_VOC),
        help="JSON {list_name: count}; default = real VOC cardinalities",
    )
    p.add_argument("--train_list", default="", help="default <out_dir>/train.txt")
    p.add_argument("--test_list", default="", help="default <out_dir>/2007_test.txt")
    p.add_argument(
        "--smoke", type=lambda v: v.lower() in ("1", "true", "yes"),
        default=True,
    )
    p.add_argument("--smoke_steps", type=int, default=20)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--image_size", type=int, default=448)
    ns = p.parse_args(argv)
    expect = json.loads(ns.expect)

    ok, _present = check_layout(ns.devkit_base)
    ok = check_conversion(ns.devkit_base, ns.out_dir, expect) and ok
    first_list = next(iter(expect), "train.txt")
    ok = check_roundtrip(ns.devkit_base, ns.out_dir, first_list) and ok
    train_list = ns.train_list or os.path.join(ns.out_dir, "train.txt")
    test_list = ns.test_list or os.path.join(ns.out_dir, "2007_test.txt")
    if ns.smoke and ok:
        ok = check_train_smoke(
            train_list, test_list, ns.backbone, ns.smoke_steps, ns.image_size
        ) and ok
    print()
    if ok:
        print("PREFLIGHT PASSED — headline launch:")
        print(
            f"  tools/train_supervised.sh --backbone resnet50 --S 7 "
            f"--batch_size 16 \\\n"
            f"      --train_list {train_list} --test_list {test_list} \\\n"
            f"      --pretrained_torch <imagenet_resnet50.pth> "
            f"--device_resident true \\\n"
            f"      --num_epochs 135 --save_dir runs/voc_r50_s7 "
            f"--keep_checkpoints 2 \\\n"
            f"      --watchdog_timeout_s 1500"
        )
        return 0
    print("PREFLIGHT FAILED — fix the items above before launching.")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
