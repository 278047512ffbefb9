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
* worker parallelism: ``num_workers`` decode/augment samples concurrently
  and batches are prefetched one ahead.  ``worker_mode='thread'`` (default)
  uses an in-process pool (cv2 releases the GIL); ``'process'`` spawns
  worker processes like the reference's 4 DataLoader workers (train.py:119)
  for many-core hosts where numpy augment work caps thread scaling.

``little_train=True`` truncates to 64*8 samples like YOLODataLoader.py:85-86.
"""

from __future__ import annotations

import multiprocessing
import os
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
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
    # 'thread' (default): one in-process pool — cv2 releases the GIL so
    # decode/resize scale across threads, and the numpy host-augment work
    # mostly does too.  'process': spawned worker processes, each holding
    # its own dataset handle — the analog of the reference's 4 DataLoader
    # worker PROCESSES (train.py:119); wins on many-core hosts where the
    # host-augment path's GIL-holding numpy slices cap thread scaling, at
    # the cost of pickling each ~600 KB decoded sample back over IPC.
    worker_mode: str = "thread"
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


# --- worker pools -----------------------------------------------------------
#
# Process workers each hold their own YoloDataset, built once by the pool
# initializer from the parent's (files, train, config) — no re-read of the
# list file, so little_train truncation and any path edits carry over.  The
# 'spawn' start method is deliberate: this process owns an accelerator
# runtime (grpc threads, locked mutexes), and fork()ing it risks wedged
# children; spawned workers re-import cleanly and never touch a device
# (backend init is lazy — they only run cv2/numpy).

_WORKER_DS: YoloDataset | None = None


def _worker_init(files: list[str], train: bool, config: PipelineConfig):
    global _WORKER_DS
    ds = YoloDataset.__new__(YoloDataset)
    ds.config = config
    ds.train = train
    ds.files = files
    ds._cache = {} if config.cache_images else None
    _WORKER_DS = ds


def _worker_load_raw(idx: int):
    return _WORKER_DS.load_raw(idx)


def _worker_load_sample(idx: int, epoch: int):
    return _WORKER_DS.load_sample(idx, epoch)


class WorkerPool:
    """num_workers-wide sample loader: threads in-process (default) or
    spawned worker processes (``PipelineConfig.worker_mode='process'``,
    the reference's DataLoader-worker analog, train.py:119).  Both modes
    return identical bytes for the same (idx, epoch) — sample RNG is a pure
    function of (seed, epoch, idx), never of worker identity."""

    def __init__(self, dataset: "YoloDataset"):
        cfg = dataset.config
        if cfg.worker_mode == "process":
            self._ex = ProcessPoolExecutor(
                max_workers=cfg.num_workers,
                mp_context=multiprocessing.get_context("spawn"),
                initializer=_worker_init,
                initargs=(dataset.files, dataset.train, cfg),
            )
            self._raw, self._sample = _worker_load_raw, _worker_load_sample
        elif cfg.worker_mode == "thread":
            self._ex = ThreadPoolExecutor(max_workers=cfg.num_workers)
            self._raw, self._sample = dataset.load_raw, dataset.load_sample
        else:
            raise ValueError(
                f"worker_mode must be 'thread' or 'process', got "
                f"{cfg.worker_mode!r}"
            )

    def submit_raw(self, idx: int):
        return self._ex.submit(self._raw, int(idx))

    def submit_sample(self, idx: int, epoch: int):
        return self._ex.submit(self._sample, int(idx), epoch)

    def shutdown(self):
        self._ex.shutdown(wait=False, cancel_futures=True)


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


def epoch_plan(
    seed: int,
    epoch: int,
    n: int,
    batch_size: int,
    shards: int = 1,
    shard_len: int | None = None,
    drop_last: bool = True,
    shuffle: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-epoch sampling plan: (global indices [nb, bs], weights [nb, bs]).

    ``shards == 1``: a global shuffle (the reference DataLoader's
    shuffle=True, train.py:119); with ``drop_last=False`` the tail batch is
    wrap-padded to the full batch size with weight-0 rows so every batch
    has ONE compiled shape (a short tail batch would cost a distinct jitted
    program — minutes on a remote-compile TPU path).

    ``shards > 1`` (mesh-sharded resident dataset): the dataset rows live
    in ``shards`` contiguous blocks of ``shard_len`` rows, one per
    data-parallel device; each device can only gather rows it holds, so
    every batch is composed of ``batch_size/shards`` rows drawn from EACH
    shard's independently shuffled pool (the standard sharded-input-
    pipeline design; the reference's DataParallel instead scatters a
    host-assembled batch, train.py:80).  The plan is a pure function of
    (seed, epoch, n, batch_size, shards), so a single-device run with the
    same ``shards`` value reproduces the sharded run's batches exactly.
    """
    ss = np.random.SeedSequence
    if shards == 1:
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(ss([seed, epoch, 7919])).shuffle(order)
        nb = n // batch_size if drop_last else -(-n // batch_size)
        total = nb * batch_size
        idx = np.resize(order, total).reshape(nb, batch_size)
        weights = (np.arange(total) < n).astype(np.float32).reshape(
            nb, batch_size
        )
        return idx.astype(np.int32), weights
    if batch_size % shards:
        raise ValueError(f"batch_size {batch_size} must divide over {shards} shards")
    if shard_len is None:
        shard_len = -(-n // shards)
    q = batch_size // shards
    pools, reals = [], []
    for j in range(shards):
        real_j = int(np.clip(n - j * shard_len, 0, shard_len))
        if real_j < 1:
            raise ValueError(
                f"shard {j} holds no real samples (n={n}, shards={shards})"
            )
        pool = j * shard_len + np.arange(real_j)
        if shuffle:
            np.random.default_rng(ss([seed, epoch, 7919, j])).shuffle(pool)
        pools.append(pool)
        reals.append(real_j)
    if drop_last:
        nb = min(r // q for r in reals)
        if nb == 0:
            raise ValueError(
                f"batch {batch_size} over {shards} shards needs >= {q} "
                f"samples per shard; smallest shard has {min(reals)}"
            )
    else:
        nb = max(-(-r // q) for r in reals)
    idx = np.zeros((nb, batch_size), np.int32)
    weights = np.zeros((nb, batch_size), np.float32)
    for j, (pool, real_j) in enumerate(zip(pools, reals)):
        take = np.resize(pool, nb * q).reshape(nb, q)
        w = (np.arange(nb * q) < real_j).astype(np.float32).reshape(nb, q)
        idx[:, j * q : (j + 1) * q] = take
        weights[:, j * q : (j + 1) * q] = w
    return idx, weights


class DeviceAugmentedLoader:
    """Batch loader whose augmentation runs ON DEVICE (data/device_augment):
    workers only decode JPEG + resize; flips/affine/pixel ops, ImageNet
    normalization and target encoding are one jitted program per batch.

    Construct over a ``YoloDataset(train=False)`` (host augmentation off).
    Sampling follows ``epoch_plan`` and per-sample augment keys fold in the
    GLOBAL dataset index, so batches are bit-identical to the resident
    loader's for the same plan.  With a ``mesh`` the uint8 batch is
    device_put batch-sharded before the augment program, so the (vmapped,
    sample-independent) augmentation runs data-parallel under XLA SPMD
    instead of serializing on the default device.

    With ``drop_last=False`` batches are wrap-padded to ONE compiled shape
    and the loader yields (images, targets, weights) 3-tuples whose
    weight-0 rows the trainer masks out of the loss (a short tail batch
    would cost a second jitted program — minutes on a remote-compile TPU
    path).
    """

    def __init__(
        self,
        dataset: "YoloDataset",
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        augment_config=None,
        mesh=None,
    ):
        from yolo_v1_tpu.data.device_augment import (
            DeviceAugmentConfig, augment_and_encode_batch,
        )

        assert not dataset.train, (
            "use a train=False dataset; augmentation happens on device"
        )
        self._augment = augment_and_encode_batch
        self.augment_config = augment_config or DeviceAugmentConfig()
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.mesh = mesh
        self._pool = WorkerPool(dataset)
        n = len(dataset)
        self._nb = n // batch_size if drop_last else -(-n // batch_size)
        self._weighted = (not drop_last) and (n % batch_size != 0)

    def __len__(self) -> int:
        return self._nb

    def close(self):
        self._pool.shutdown()

    def epoch(self, epoch: int = 0):
        import jax

        cfg = self.dataset.config
        plan, weights = epoch_plan(
            cfg.seed, epoch, len(self.dataset), self.batch_size,
            drop_last=self.drop_last, shuffle=self.shuffle,
        )
        put = None
        if self.mesh is not None:
            from yolo_v1_tpu.parallel.mesh import data_sharding

            sh = data_sharding(self.mesh)
            put = lambda a: jax.device_put(a, sh)

        def submit(bi):
            return [self._pool.submit_raw(i) for i in plan[bi]]

        futures = None
        for bi in range(self._nb):
            if futures is None:
                futures = submit(bi)
            ready = [f.result() for f in futures]
            futures = submit(bi + 1) if bi + 1 < self._nb else None
            images_u8, boxes, labels, counts = collate(ready)
            idx = plan[bi].astype(np.int32)
            if put is not None:
                images_u8, boxes, labels, counts, idx = (
                    put(images_u8), put(boxes), put(labels), put(counts),
                    put(idx),
                )
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(cfg.seed), epoch), bi
            )
            imgs, targets = self._augment(
                key, images_u8, boxes, labels, counts,
                S=cfg.S, B=cfg.B, C=cfg.C, cfg=self.augment_config,
                sample_ids=idx,
            )
            if self._weighted:
                yield imgs, targets, weights[bi]
            else:
                yield imgs, targets


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

    With a ``mesh`` the dataset is SHARDED over the data-parallel axes:
    device d holds a contiguous ``shard_len``-row block, every batch draws
    ``batch_size/D`` rows from EACH block (epoch_plan ``shards``), and
    gather+augment+encode run per-device with zero collective traffic
    (device_augment.sharded_gather_augment_encode) — the best feed path
    scales with the mesh instead of pinning everything to chip 0, and
    per-device HBM holds only 1/D of the dataset.  Augment keys fold in the
    global dataset index, so the draws are placement-invariant.

    With ``drop_last=False`` the plan wrap-pads to ONE compiled batch shape
    and the loader yields (images, targets, weights) 3-tuples (see
    DeviceAugmentedLoader).  Construct over a ``YoloDataset(train=False)``.
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
        mesh=None,
    ):
        import jax
        import jax.numpy as jnp

        from yolo_v1_tpu.data.device_augment import (
            DeviceAugmentConfig, dp_axes_of,
        )

        assert not dataset.train, (
            "use a train=False dataset; augmentation happens on device"
        )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.augment_config = augment_config or DeviceAugmentConfig()
        self.mesh = mesh

        n = len(dataset)
        cfg = dataset.config
        self._shards = (
            int(np.prod([mesh.shape[a] for a in dp_axes_of(mesh)]))
            if mesh is not None
            else 1
        )
        self._shard_len = -(-n // self._shards)
        # The weight pattern is epoch-independent (only the shuffle varies),
        # so one plan decides batch count and whether rows need masking.
        plan0, w0 = epoch_plan(
            cfg.seed, 0, n, batch_size, shards=self._shards,
            shard_len=self._shard_len, drop_last=drop_last, shuffle=shuffle,
        )
        self._nb = plan0.shape[0]
        self._weighted = bool((w0 == 0.0).any())

        boxes = np.zeros((n, MAX_BOXES, 4), np.float32)
        labels = np.zeros((n, MAX_BOXES), np.int32)
        counts = np.zeros((n,), np.int32)
        if mesh is not None:
            self._upload_sharded(dataset, boxes, labels, counts, logger)
            return
        # Single device: chunks are written into ONE preallocated device
        # buffer with a donated dynamic_update_slice, so peak HBM stays ~1x
        # the dataset (a concatenate of live chunk buffers would transiently
        # hold ~2x — at real-VOC scale, ~9 GB uint8, that transient would
        # RESOURCE_EXHAUST a 16 GB v5e).  The buffer is padded to a chunk
        # multiple so the updater compiles exactly once; the padded tail
        # rows are never indexed (batch indices are always < n).
        # TILE-EXACT FLAT [D, 8, H*W*3/8] resident layout.  Two measured
        # OOMs at VOC cardinality (16,551 448px rows, 9.96 GB) forced it
        # (round-4 rehearsal + tools/gather_layout_probe.py):
        #   * rank-4 [D,H,W,3]: the gather kernel's internal reshape is a
        #     TPU layout change -> 9.93 GB in-program temp;
        #   * [D,H,W*3]: 1344 lanes pad to 1408 in the XLA tiled layout
        #     and the program normalizes the INPUT with a 9.93 GB copy.
        # [D, 8, 75264] has sublanes exactly 8 and lanes 588*128 — zero
        # padding, zero copies (AOT temp = 0.000 GB at full VOC shape).
        # Gathered batches reshape back to [N,H,W,3] (device_augment.
        # _gather_images; square images only, which the pipeline enforces).
        row = cfg.image_size * cfg.image_size * 3
        assert row % 8 == 0, cfg.image_size
        n_pad = -(-n // upload_chunk) * upload_chunk
        images = jnp.zeros((n_pad, 8, row // 8), jnp.uint8)
        update = jax.jit(
            lambda buf, chunk, start: jax.lax.dynamic_update_slice(
                buf, chunk, (start, 0, 0)
            ),
            donate_argnums=(0,),
        )
        for start in range(0, n, upload_chunk):
            m = min(upload_chunk, n - start)
            # Fresh buffer per chunk: device_put may transfer asynchronously
            # and jax's host-buffer semantics don't promise the numpy array
            # is consumed before the call returns — reusing one staging
            # buffer across chunks could corrupt in-flight uploads.
            chunk = np.zeros((upload_chunk, 8, row // 8), np.uint8)
            for i in range(m):
                img, b, l = dataset.load_raw(start + i)
                chunk[i] = img.reshape(8, -1)
                k = min(len(b), MAX_BOXES)
                boxes[start + i, :k] = b[:k]
                labels[start + i, :k] = l[:k]
                counts[start + i] = k
            images = update(images, jax.device_put(chunk), start)
            if logger:
                logger.info(
                    "device-resident upload: %d / %d images", start + m, n
                )
        self._images = images
        self._boxes = jax.device_put(boxes)
        self._labels = jax.device_put(labels)
        self._counts = jax.device_put(counts)

    def _upload_sharded(self, dataset, boxes, labels, counts, logger):
        """Shard-contiguous upload: one host block per data-parallel device,
        assembled into global sharded arrays via make_array_from_callback —
        each device receives exactly its block (no cross-device transfer,
        no transient second copy)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from yolo_v1_tpu.data.device_augment import dp_axes_of

        n, cfg = len(dataset), dataset.config
        sl, shards = self._shard_len, self._shards
        n_pad = sl * shards
        dp = dp_axes_of(self.mesh)
        sharding = NamedSharding(self.mesh, P(dp if len(dp) > 1 else dp[0]))
        row = cfg.image_size * cfg.image_size * 3
        assert row % 8 == 0, cfg.image_size
        blocks = []
        for j in range(shards):
            # Same TILE-EXACT FLAT [*, 8, H*W*3/8] layout as the
            # single-device upload (see the OOM notes there).
            block = np.zeros((sl, 8, row // 8), np.uint8)
            for r in range(min(sl, n - j * sl)):
                g = j * sl + r
                img, b, l = dataset.load_raw(g)
                block[r] = img.reshape(8, -1)
                k = min(len(b), MAX_BOXES)
                boxes[g, :k] = b[:k]
                labels[g, :k] = l[:k]
                counts[g] = k
            blocks.append(block)
            if logger:
                logger.info(
                    "device-resident upload: shard %d / %d (%d rows)",
                    j + 1, shards, min(sl, max(0, n - j * sl)),
                )

        def cb(index):
            s = index[0]
            start = 0 if s.start is None else s.start
            assert start % sl == 0 and (s.stop or n_pad) - start == sl, index
            return blocks[start // sl]

        shape = (n_pad, 8, row // 8)
        self._images = jax.make_array_from_callback(shape, sharding, cb)
        pad = ((0, n_pad - n),) + ((0, 0),) * (boxes.ndim - 1)
        self._boxes = jax.device_put(np.pad(boxes, pad[:3]), sharding)
        self._labels = jax.device_put(np.pad(labels, pad[:2]), sharding)
        self._counts = jax.device_put(np.pad(counts, pad[:1]), sharding)

    def __len__(self) -> int:
        return self._nb

    def epoch(self, epoch: int = 0):
        import jax
        import jax.numpy as jnp

        from yolo_v1_tpu.data.device_augment import (
            gather_augment_encode, sharded_gather_augment_encode,
        )

        cfg = self.dataset.config
        plan, weights = epoch_plan(
            cfg.seed, epoch, len(self.dataset), self.batch_size,
            shards=self._shards, shard_len=self._shard_len,
            drop_last=self.drop_last, shuffle=self.shuffle,
        )
        if self.mesh is not None:
            from yolo_v1_tpu.parallel.mesh import data_sharding

            sh = data_sharding(self.mesh)
        for bi in range(self._nb):
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(cfg.seed), epoch), bi
            )
            if self.mesh is not None:
                idx = jax.device_put(plan[bi], sh)
                out = sharded_gather_augment_encode(
                    key, self._images, self._boxes, self._labels,
                    self._counts, idx,
                    mesh=self.mesh, shard_len=self._shard_len,
                    S=cfg.S, B=cfg.B, C=cfg.C, cfg=self.augment_config,
                )
            else:
                out = gather_augment_encode(
                    key, self._images, self._boxes, self._labels,
                    self._counts, jnp.asarray(plan[bi]),
                    S=cfg.S, B=cfg.B, C=cfg.C, cfg=self.augment_config,
                )
            if self._weighted:
                yield out[0], out[1], weights[bi]
            else:
                yield out


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
        self._pool = WorkerPool(dataset)

    def close(self):
        self._pool.shutdown()

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

        def submit(bi):
            idxs = order[bi * self.batch_size : (bi + 1) * self.batch_size]
            if self.raw:
                return [self._pool.submit_raw(i) for i in idxs]
            return [self._pool.submit_sample(i, epoch) for i in idxs]

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
