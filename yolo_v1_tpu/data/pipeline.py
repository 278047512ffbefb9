"""Input pipeline: list-file dataset, threaded prefetching batch loader,
on-the-fly target encoding.

Rebuilds the reference ``yoloDataset`` + torch ``DataLoader`` stack
(`/root/reference/utils/YOLODataLoader.py:11-230`, train.py:118-121) without
torch:

* list files of absolute image paths; labels resolved via the
  JPEGImages->labels convention (YOLODataLoader.py:94-106);
* per-sample: imread -> RGB -> resize 448 -> (train) augment with box
  transforms -> ImageNet normalization.  The reference feeds **BGR** images
  to ImageNet-normalization and pretrained RGB weights
  (cv2.imread at YOLODataLoader.py:161 is never channel-swapped) — we use
  RGB; divergence documented;
* target grids are encoded **batched on device** with the jitted
  ``core.grid.encode_targets`` instead of a per-sample Python loop
  (YOLODataLoader.py:200-230);
* worker parallelism: a thread pool decodes/augments samples concurrently
  and batches are prefetched one ahead (the reference uses 4 worker
  processes, train.py:119 — threads suffice here since cv2 releases the
  GIL).

``little_train=True`` truncates to 64*8 samples like YOLODataLoader.py:85-86.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator

import cv2
import numpy as np

from yolo_v1_tpu.core.grid import encode_targets
from yolo_v1_tpu.data.augment import AugmentConfig, augment_sample
from yolo_v1_tpu.data.voc import label_path_for_image, parse_label_file, read_list_file

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)  # train.py:108
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

MAX_BOXES = 64  # VOC images top out well below this


@dataclass
class PipelineConfig:
    image_size: int = 448
    S: int = 7
    B: int = 2
    C: int = 20
    augment: AugmentConfig = AugmentConfig()
    seed: int = 0
    num_workers: int = 4  # train.py:119
    # Keep decoded+resized uint8 images (and parsed labels) in RAM after
    # first touch.  VOC-scale data fits easily (16.5k x 448^2 x 3 = 9.3 GB)
    # and JPEG decode is the host bottleneck when cores are scarce.
    cache_images: bool = False


class YoloDataset:
    """Image+label dataset over a list file (YOLODataLoader.py:11-106)."""

    def __init__(
        self,
        list_file: str,
        train: bool,
        config: PipelineConfig | None = None,
        little_train: bool = False,
    ):
        self.config = config or PipelineConfig()
        self.train = train
        self.files = read_list_file(list_file)
        if little_train:
            self.files = self.files[: 64 * 8]  # YOLODataLoader.py:85-86
        # idx -> (uint8 image, boxes, labels); plain dict writes are atomic
        # under the GIL so the loader's thread pool needs no lock (a racing
        # double-load just wastes one decode).
        self._cache: dict | None = {} if self.config.cache_images else None

    def __len__(self) -> int:
        return len(self.files)

    def image_path(self, idx: int) -> str:
        return self.files[idx]

    def load_raw(self, idx: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """uint8 RGB image resized square + normalized cxcywh boxes + labels."""
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        cfg = self.config
        path = self.files[idx]
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (cfg.image_size, cfg.image_size))
        boxes, labels = parse_label_file(label_path_for_image(path))
        if self._cache is not None:
            self._cache[idx] = (img, boxes, labels)
        return self._cache[idx] if self._cache is not None else (img, boxes, labels)

    def load_sample(
        self, idx: int, epoch: int = 0
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """float32 normalized image + (possibly augmented) boxes/labels."""
        cfg = self.config
        img, boxes, labels = self.load_raw(idx)
        if self.train:
            rng = np.random.default_rng(
                np.random.SeedSequence([cfg.seed, epoch, idx])
            )
            img, boxes, labels = augment_sample(img, boxes, labels, rng, cfg.augment)
        img = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        return img, boxes, labels


def collate(
    samples: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    max_boxes: int = MAX_BOXES,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Stack samples into (images, padded boxes, padded labels, counts)."""
    n = len(samples)
    images = np.stack([s[0] for s in samples])
    boxes = np.zeros((n, max_boxes, 4), np.float32)
    labels = np.zeros((n, max_boxes), np.int32)
    counts = np.zeros((n,), np.int32)
    for i, (_, b, l) in enumerate(samples):
        k = min(len(b), max_boxes)
        boxes[i, :k] = b[:k]
        labels[i, :k] = l[:k]
        counts[i] = k
    return images, boxes, labels, counts


class DeviceAugmentedLoader:
    """Batch loader whose augmentation runs ON DEVICE (data/device_augment):
    workers only decode JPEG + resize; flips/affine/pixel ops, ImageNet
    normalization and target encoding are one jitted program per batch.

    Construct over a ``YoloDataset(train=False)`` (host augmentation off);
    randomness comes from (seed, epoch, batch) PRNG keys.
    """

    def __init__(
        self,
        dataset: "YoloDataset",
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        augment_config=None,
    ):
        from yolo_v1_tpu.data.device_augment import (
            DeviceAugmentConfig, augment_and_encode_batch,
        )

        assert not dataset.train, (
            "use a train=False dataset; augmentation happens on device"
        )
        self._augment = augment_and_encode_batch
        self.augment_config = augment_config or DeviceAugmentConfig()
        self._raw = BatchLoader(
            dataset, batch_size, shuffle=shuffle, drop_last=drop_last,
            encode=False, raw=True,
        )
        self.dataset = dataset

    def __len__(self) -> int:
        return len(self._raw)

    def epoch(self, epoch: int = 0):
        import jax

        cfg = self.dataset.config
        for bi, (images_u8, boxes, labels, counts) in enumerate(
            self._raw.epoch(epoch)
        ):
            key = jax.random.PRNGKey(cfg.seed)
            key = jax.random.fold_in(jax.random.fold_in(key, epoch), bi)
            yield self._augment(
                key, images_u8, boxes, labels, counts,
                S=cfg.S, B=cfg.B, C=cfg.C, cfg=self.augment_config,
            )


class DeviceResidentLoader:
    """Whole-dataset-in-HBM loader: decoded uint8 images + padded GT upload
    to the accelerator ONCE; per batch only a [bs] int32 index vector
    crosses the host->device link, and gather + augment + normalize +
    encode run as one jitted program
    (data/device_augment.gather_augment_encode).

    Rationale (measured on the dev relay, DESIGN.md): H2D runs ~20 MB/s, so
    a 19 MB uint8 batch costs ~1 s against a 57 ms train step; resident
    data drops the per-step feed to a few hundred index bytes.  The shape
    is equally right for production TPU hosts — VOC at 448px uint8 is
    ~9 GB, a fraction of one v5e's HBM, and host decode drops out of the
    throughput equation after epoch one.

    Single-device only (the dataset tensors live unsharded on the default
    device); pair with ``mesh=None``.  Construct over a
    ``YoloDataset(train=False)`` like DeviceAugmentedLoader.
    """

    def __init__(
        self,
        dataset: "YoloDataset",
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        augment_config=None,
        upload_chunk: int = 512,
        logger=None,
    ):
        import jax
        import jax.numpy as jnp

        from yolo_v1_tpu.data.device_augment import DeviceAugmentConfig

        assert not dataset.train, (
            "use a train=False dataset; augmentation happens on device"
        )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.augment_config = augment_config or DeviceAugmentConfig()

        n = len(dataset)
        cfg = dataset.config
        boxes = np.zeros((n, MAX_BOXES, 4), np.float32)
        labels = np.zeros((n, MAX_BOXES), np.int32)
        counts = np.zeros((n,), np.int32)
        parts = []
        for start in range(0, n, upload_chunk):
            m = min(upload_chunk, n - start)
            # Fresh buffer per chunk: device_put may transfer asynchronously
            # and jax's host-buffer semantics don't promise the numpy array
            # is consumed before the call returns — reusing one staging
            # buffer across chunks could corrupt in-flight uploads.
            chunk = np.empty(
                (m, cfg.image_size, cfg.image_size, 3), np.uint8
            )
            for i in range(m):
                img, b, l = dataset.load_raw(start + i)
                chunk[i] = img
                k = min(len(b), MAX_BOXES)
                boxes[start + i, :k] = b[:k]
                labels[start + i, :k] = l[:k]
                counts[start + i] = k
            parts.append(jax.device_put(chunk))
            if logger:
                logger.info(
                    "device-resident upload: %d / %d images", start + m, n
                )
        self._images = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        del parts
        self._boxes = jax.device_put(boxes)
        self._labels = jax.device_put(labels)
        self._counts = jax.device_put(counts)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0):
        import jax
        import jax.numpy as jnp

        from yolo_v1_tpu.data.device_augment import gather_augment_encode

        cfg = self.dataset.config
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([cfg.seed, epoch, 7919])
            ).shuffle(order)
        for bi in range(len(self)):
            idx = order[bi * self.batch_size : (bi + 1) * self.batch_size]
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(cfg.seed), epoch), bi
            )
            yield gather_augment_encode(
                key, self._images, self._boxes, self._labels, self._counts,
                jnp.asarray(idx, jnp.int32),
                S=cfg.S, B=cfg.B, C=cfg.C, cfg=self.augment_config,
            )


class BatchLoader:
    """Shuffling, prefetching batch iterator yielding (images, targets).

    Targets are encoded batched via the jitted device encoder — the analog
    of moving YOLODataLoader.encoder out of the worker hot loop.
    With ``raw=True`` yields (uint8 images, boxes, labels, counts) for the
    device-augmentation path (DeviceAugmentedLoader).
    """

    def __init__(
        self,
        dataset: YoloDataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        encode: bool = True,
        raw: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.encode = encode
        self.raw = raw
        self._pool = ThreadPoolExecutor(max_workers=dataset.config.num_workers)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator:
        cfg = self.dataset.config
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([cfg.seed, epoch, 7919])
            ).shuffle(order)
        nb = len(self)
        futures = None

        load = self.dataset.load_raw if self.raw else self.dataset.load_sample

        def submit(bi):
            idxs = order[bi * self.batch_size : (bi + 1) * self.batch_size]
            if self.raw:
                return [self._pool.submit(load, int(i)) for i in idxs]
            return [self._pool.submit(load, int(i), epoch) for i in idxs]

        for bi in range(nb):
            if futures is None:
                futures = submit(bi)
            ready = [f.result() for f in futures]
            futures = submit(bi + 1) if bi + 1 < nb else None
            images, boxes, labels, counts = collate(ready)
            if not self.encode:
                yield images, boxes, labels, counts
                continue
            # Keep the encoded grid on device — np.asarray here would force
            # a D2H copy that fit() immediately re-uploads.
            targets = encode_targets(
                boxes, labels, counts, S=cfg.S, B=cfg.B, C=cfg.C
            )
            yield images, targets
