"""Data pipeline tests over a synthetic VOC tree: parsing, loading,
augmentation box bookkeeping, batch loader determinism, target encoding."""

import numpy as np
import pytest

from yolo_v1_tpu.data.augment import AugmentConfig, augment_sample
from yolo_v1_tpu.data.pipeline import (
    BatchLoader, PipelineConfig, YoloDataset, collate,
)
from yolo_v1_tpu.data.voc import (
    image_id_of, label_path_for_image, load_gt_boxes, prep_test_data,
)


def cfg112():
    return PipelineConfig(image_size=112, S=7, num_workers=2)


def test_label_path_convention():
    assert (
        label_path_for_image("/d/JPEGImages/img001.jpg") == "/d/labels/img001.txt"
    )
    assert image_id_of("/d/JPEGImages/img001.jpg") == "img001"


def test_dataset_loads_and_normalizes(voc_tree):
    list_file, gt = voc_tree
    ds = YoloDataset(list_file, train=False, config=cfg112())
    assert len(ds) == 8
    img, boxes, labels = ds.load_sample(0)
    assert img.shape == (112, 112, 3)
    assert img.dtype == np.float32
    assert abs(img.mean()) < 3.0  # normalized scale
    name = image_id_of(ds.image_path(0))
    assert len(boxes) == len(gt[name])
    np.testing.assert_allclose(
        boxes, [list(b[1:]) for b in gt[name]], atol=1e-6
    )


def test_load_gt_boxes_pixel_convention(voc_tree):
    list_file, gt = voc_tree
    ds = YoloDataset(list_file, train=False, config=cfg112())
    path = ds.image_path(0)
    out = load_gt_boxes(path, img_size=(448, 448))
    name = image_id_of(path)
    for (label, x0, y0, x1, y1), (cls, cx, cy, w, h) in zip(out, gt[name]):
        assert label == cls
        assert x0 == int((cx - w / 2) * 448)
        assert y1 == int((cy + h / 2) * 448)


def test_prep_test_data_structure(voc_tree):
    list_file, gt = voc_tree
    target = prep_test_data(list_file)
    n_boxes = sum(len(v) for v in target.values())
    assert n_boxes == sum(len(v) for v in gt.values())
    for (img_id, cls_name), boxes in target.items():
        assert img_id.startswith("img")
        for b in boxes:
            assert len(b) == 4


def test_prep_test_data_little(voc_tree):
    list_file, gt = voc_tree
    little = prep_test_data(list_file, little_test=3)
    ids = {k[0] for k in little}
    assert ids <= {"img000", "img001", "img002"}


def test_augment_deterministic(voc_tree):
    list_file, _ = voc_tree
    ds = YoloDataset(list_file, train=True, config=cfg112())
    a = ds.load_sample(1, epoch=5)
    b = ds.load_sample(1, epoch=5)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    # Some other epoch must draw a different augmentation (any single epoch
    # can no-op with prob ~16%, so check a handful).
    assert any(
        not np.array_equal(a[0], ds.load_sample(1, epoch=e)[0])
        for e in range(6, 12)
    )


def test_augment_flip_boxes(rng):
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[0.25, 0.5, 0.2, 0.3]], np.float32)
    labels = np.array([2], np.int32)
    cfg = AugmentConfig(
        pixel_prob=0.0, flip_lr_prob=1.0, flip_ud_prob=0.0, affine_prob=0.0
    )
    _, out, out_labels = augment_sample(img, boxes, labels, rng, cfg)
    np.testing.assert_allclose(out[0], [0.75, 0.5, 0.2, 0.3], atol=1e-5)
    assert out_labels.tolist() == [2]


def test_augment_removes_translated_out_boxes(rng):
    img = np.zeros((64, 64, 3), np.uint8)
    # Box near the left edge; huge right-translation pushes it out.
    boxes = np.array([[0.05, 0.5, 0.08, 0.2]], np.float32)
    labels = np.array([1], np.int32)
    cfg = AugmentConfig(
        pixel_prob=0.0, flip_lr_prob=0.0, flip_ud_prob=0.0, affine_prob=1.0,
        scale_range=(1.0, 1.0), rotate_range=(0.0, 0.0),
        translate_range=(-0.5, -0.5),
    )
    _, out, out_labels = augment_sample(img, boxes, labels, rng, cfg)
    assert len(out) == 0 and len(out_labels) == 0


def test_augment_pixel_ops_run(rng):
    img = np.full((64, 64, 3), 128, np.uint8)
    boxes = np.array([[0.5, 0.5, 0.4, 0.4]], np.float32)
    labels = np.array([0], np.int32)
    cfg = AugmentConfig(pixel_prob=1.0, flip_lr_prob=0, flip_ud_prob=0,
                        affine_prob=0)
    for seed in range(10):
        g = np.random.default_rng(seed)
        out, b, l = augment_sample(img.copy(), boxes, labels, g, cfg)
        assert out.shape == img.shape and out.dtype == np.uint8
        np.testing.assert_allclose(b, boxes, atol=1e-6)  # pixel ops keep boxes


def test_batch_loader_yields_encoded(voc_tree):
    list_file, _ = voc_tree
    ds = YoloDataset(list_file, train=True, config=cfg112())
    loader = BatchLoader(ds, batch_size=4)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    images, targets = batches[0]
    assert images.shape == (4, 112, 112, 3)
    assert targets.shape == (4, 7, 7, 30)
    # Every image in the fixture has at least one object; augmentation can
    # occasionally clip all boxes away, so check most grids have an object.
    n_obj = sum((t[..., 0] == 1).any() for b in batches for t in b[1])
    assert n_obj >= 6


def test_process_workers_match_threads(voc_tree):
    """worker_mode='process' (spawned DataLoader-worker analog,
    train.py:119) yields bit-identical batches to the thread pool — sample
    RNG depends only on (seed, epoch, idx), never on worker identity."""
    list_file, _ = voc_tree
    cfg_t = PipelineConfig(image_size=112, S=7, num_workers=2)
    cfg_p = PipelineConfig(
        image_size=112, S=7, num_workers=2, worker_mode="process"
    )
    lt = BatchLoader(YoloDataset(list_file, train=True, config=cfg_t), 4)
    lp = BatchLoader(YoloDataset(list_file, train=True, config=cfg_p), 4)
    try:
        for (it, tt), (ip, tp) in zip(lt.epoch(1), lp.epoch(1)):
            np.testing.assert_array_equal(it, ip)
            np.testing.assert_array_equal(np.asarray(tt), np.asarray(tp))
    finally:
        lt.close()
        lp.close()


def test_worker_mode_validated(voc_tree):
    list_file, _ = voc_tree
    bad = PipelineConfig(image_size=112, worker_mode="fork")
    ds = YoloDataset(list_file, train=False, config=bad)
    with pytest.raises(ValueError, match="worker_mode"):
        BatchLoader(ds, batch_size=4)


def test_batch_loader_shuffles_by_epoch(voc_tree):
    list_file, _ = voc_tree
    ds = YoloDataset(list_file, train=False, config=cfg112())
    loader = BatchLoader(ds, batch_size=8, shuffle=True, encode=False)
    (im0, *_), = list(loader.epoch(0))
    (im1, *_), = list(loader.epoch(1))
    assert not np.array_equal(im0, im1)


def test_epoch_plan_global_coverage_and_tail_padding():
    from yolo_v1_tpu.data.pipeline import epoch_plan

    # drop_last=True: whole batches only, every index unique, deterministic
    idx, w = epoch_plan(0, 3, n=10, batch_size=4)
    assert idx.shape == (2, 4) and (w == 1.0).all()
    assert len(set(idx.ravel().tolist())) == 8
    idx2, _ = epoch_plan(0, 3, n=10, batch_size=4)
    np.testing.assert_array_equal(idx, idx2)
    assert not np.array_equal(idx, epoch_plan(0, 4, n=10, batch_size=4)[0])

    # drop_last=False: ONE batch shape, wrap-padded tail rows carry weight 0
    idx, w = epoch_plan(0, 0, n=10, batch_size=4, drop_last=False)
    assert idx.shape == (3, 4) and w.shape == (3, 4)
    assert sorted(idx.ravel()[w.ravel() == 1.0].tolist()) == list(range(10))
    assert w.sum() == 10.0 and (w[:2] == 1.0).all()


def test_epoch_plan_sharded_locality_and_coverage():
    from yolo_v1_tpu.data.pipeline import epoch_plan

    n, bs, shards = 16, 8, 4
    shard_len = 4
    idx, w = epoch_plan(0, 1, n, bs, shards=shards, shard_len=shard_len)
    q = bs // shards
    assert idx.shape == (2, 8) and (w == 1.0).all()
    # locality: column block j only holds indices from shard j's row block
    for j in range(shards):
        col = idx[:, j * q : (j + 1) * q]
        assert ((col >= j * shard_len) & (col < (j + 1) * shard_len)).all()
    # full coverage: every sample exactly once
    assert sorted(idx.ravel().tolist()) == list(range(16))
    # uneven shards with drop_last=False: wrap rows get weight 0, every
    # real sample appears with weight 1
    idx, w = epoch_plan(0, 1, 13, bs, shards=shards, shard_len=4,
                        drop_last=False)
    real = idx.ravel()[w.ravel() == 1.0]
    assert sorted(real.tolist()) == list(range(13))
    with pytest.raises(ValueError):
        epoch_plan(0, 0, 16, batch_size=6, shards=4)


def test_resident_loader_sharded_matches_unsharded_gather(tmp_path):
    """The mesh-sharded resident path (per-device local gather via
    shard_map) must produce BIT-IDENTICAL batches to a plain single-device
    gather_augment_encode over the same plan — augment keys fold in the
    GLOBAL dataset index, so placement cannot change the draw.  (Values
    match to float tolerance, not bitwise: the SPMD and single-device
    programs fuse differently, so ulp-level reassociation differs.)"""
    import jax
    import jax.numpy as jnp
    from tests.conftest import make_voc_tree
    from yolo_v1_tpu.data.device_augment import gather_augment_encode
    from yolo_v1_tpu.data.pipeline import (
        MAX_BOXES, DeviceResidentLoader, epoch_plan,
    )
    from yolo_v1_tpu.parallel.mesh import make_mesh

    list_file, _ = make_voc_tree(tmp_path, n_images=16)
    cfg = cfg112()
    ds = YoloDataset(list_file, train=False, config=cfg)
    mesh = make_mesh(8)
    loader = DeviceResidentLoader(ds, batch_size=8, mesh=mesh)
    assert loader._shards == 8 and loader._shard_len == 2
    assert len(loader) == 2

    # Unsharded reference: same resident tensors, same plan, same keys.
    images = np.stack([ds.load_raw(i)[0] for i in range(16)])
    boxes = np.zeros((16, MAX_BOXES, 4), np.float32)
    labels = np.zeros((16, MAX_BOXES), np.int32)
    counts = np.zeros((16,), np.int32)
    for i in range(16):
        _, b, l = ds.load_raw(i)
        boxes[i, : len(b)], labels[i, : len(l)], counts[i] = b, l, len(b)

    for epoch in (0, 2):
        plan, _ = epoch_plan(
            cfg.seed, epoch, 16, 8, shards=8, shard_len=2
        )
        got = list(loader.epoch(epoch))
        assert len(got) == 2
        for bi, (imgs_s, tgts_s) in enumerate(got):
            assert imgs_s.sharding.num_devices == 8
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(cfg.seed), epoch), bi
            )
            imgs_r, tgts_r = gather_augment_encode(
                key, jnp.asarray(images), jnp.asarray(boxes),
                jnp.asarray(labels), jnp.asarray(counts),
                jnp.asarray(plan[bi]),
                S=cfg.S, B=cfg.B, C=cfg.C, cfg=loader.augment_config,
            )
            np.testing.assert_allclose(
                np.asarray(imgs_s), np.asarray(imgs_r), atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(tgts_s), np.asarray(tgts_r), atol=1e-5
            )


def test_device_augmented_loader_mesh_matches_plain(voc_tree):
    """DeviceAugmentedLoader under a mesh (batch-sharded augment program)
    yields the same values as the single-device loader."""
    from yolo_v1_tpu.data.pipeline import DeviceAugmentedLoader
    from yolo_v1_tpu.parallel.mesh import make_mesh

    ds = YoloDataset(voc_tree[0], train=False, config=cfg112())
    plain = DeviceAugmentedLoader(ds, batch_size=8)
    meshed = DeviceAugmentedLoader(ds, batch_size=8, mesh=make_mesh(8))
    for (i1, t1), (i2, t2) in zip(plain.epoch(1), meshed.epoch(1)):
        assert i2.sharding.num_devices == 8
        np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)
    plain.close()
    meshed.close()


def test_loaders_drop_last_false_single_shape_weights(voc_tree):
    """drop_last=False wrap-pads the tail batch to ONE compiled shape and
    yields (images, targets, weights) 3-tuples; weight-1 rows cover the
    dataset exactly once per epoch."""
    from yolo_v1_tpu.data.pipeline import (
        DeviceAugmentedLoader, DeviceResidentLoader,
    )

    ds = YoloDataset(voc_tree[0], train=False, config=cfg112())
    for loader in (
        DeviceAugmentedLoader(ds, batch_size=3, drop_last=False),
        DeviceResidentLoader(ds, batch_size=3, drop_last=False),
    ):
        batches = list(loader.epoch(0))
        assert len(batches) == 3 == len(loader)
        total_w = 0.0
        for b in batches:
            assert len(b) == 3
            imgs, tgts, w = b
            assert imgs.shape[0] == 3 and w.shape == (3,)
            total_w += float(w.sum())
        assert total_w == 8.0
        if hasattr(loader, "close"):
            loader.close()


def test_collate_pads_and_truncates():
    samples = [
        (np.zeros((8, 8, 3), np.float32),
         np.full((70, 4), 0.5, np.float32), np.arange(70, dtype=np.int32)),
        (np.zeros((8, 8, 3), np.float32),
         np.zeros((0, 4), np.float32), np.zeros((0,), np.int32)),
    ]
    images, boxes, labels, counts = collate(samples, max_boxes=64)
    assert boxes.shape == (2, 64, 4)
    assert counts.tolist() == [64, 0]
