"""VOC mAP evaluation: batched on-device decode+NMS, host-side AP.

Rebuilds the reference mAP driver (`/root/reference/utils/utils.py:389-418`
+ run_voc_mAP.py) the TPU way: the reference runs ONE image at a time
through the net, then a Python triple-loop decode and list-based NMS per
image (utils/utils.py:402-405).  Here a whole batch goes through
forward -> vmapped decode -> vmapped NMS inside a single jit; only the
final (tiny) detection lists cross to the host, where AP runs in numpy.

Reference eval constants preserved: score threshold 0.005, NMS 0.45
(utils/utils.py:405), boxes clamped to [0,1] then scaled to 448 with
truncation (:406-407, :347-354), match IoU 0.5, continuous AP (:418).
The little-val(750)/full-test gating lives in train/loop.fit
(train.py:127-201).
"""

from __future__ import annotations

from collections import defaultdict
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolo_v1_tpu.core.ap import voc_eval
from yolo_v1_tpu.core.grid import decode_grid
from yolo_v1_tpu.core.nms import nms_keep_mask
from yolo_v1_tpu.data.voc import VOC_CLASSES, image_id_of
from yolo_v1_tpu.train.state import TrainState


def make_detector(
    S: int,
    B: int = 2,
    C: int = 20,
    score_threshold: float = 0.005,
    nms_threshold: float = 0.45,
    nms_impl: str = "auto",
    mesh=None,
    normalize_on_device: bool = False,
) -> Callable:
    """Jitted (state, images) -> (boxes, scores, classes, keep), all [N,K,...].

    Boxes come out clamped to [0,1] (utils/utils.py:406); scaling to pixels
    happens host-side.  ``nms_impl``: 'auto' picks by measured v5e
    crossover — two-stage Pallas NMS below K=256 (0.45 vs xla 0.52 ms at
    K=98), sort-free fused decode+NMS above (1.01 vs xla 1.59 ms at
    K=392), XLA on CPU/mesh — or force 'xla' / 'pallas' / 'fused'; all
    produce the identical greedy keep set.
    With ``mesh``, the image batch (and every per-candidate output) shards
    over the 'data' axis so eval scales across chips like training does.
    With ``normalize_on_device``, images arrive as raw uint8 RGB (4x fewer
    H2D bytes) and the ImageNet normalization runs on-chip in the same f32
    op order as the host pipeline — results are bit-identical.
    """
    from yolo_v1_tpu.ops.pallas.nms_kernel import resolve_nms_impl

    nms_impl = resolve_nms_impl(nms_impl, mesh, K=S * S * B)

    def detect(state: TrainState, images: jax.Array):
        if normalize_on_device:
            from yolo_v1_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

            images = (
                images.astype(jnp.float32) / 255.0 - jnp.asarray(IMAGENET_MEAN)
            ) / jnp.asarray(IMAGENET_STD)
        pred = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=False,
        )
        boxes, scores, classes, valid = jax.vmap(
            partial(decode_grid, S=S, B=B, C=C, score_threshold=score_threshold)
        )(pred)
        if nms_impl == "fused":
            # One Pallas program straight from the grid to the keep mask
            # (sort-free); the elementwise decode above still feeds the
            # box/score/class outputs the host consumes.
            from yolo_v1_tpu.ops.pallas.fused_decode_nms import (
                pallas_fused_decode_nms,
            )

            keep = pallas_fused_decode_nms(
                pred.astype(jnp.float32), S=S, B=B, C=C,
                score_threshold=score_threshold,
                iou_threshold=nms_threshold,
            )
        elif nms_impl == "pallas":
            from yolo_v1_tpu.ops.pallas.nms_kernel import pallas_nms_keep_mask

            keep = pallas_nms_keep_mask(
                boxes, scores, valid, iou_threshold=nms_threshold
            )
        else:
            keep = jax.vmap(partial(nms_keep_mask, iou_threshold=nms_threshold))(
                boxes, scores, valid
            )
        return jnp.clip(boxes, 0.0, 1.0), scores, classes, keep

    if mesh is None:
        return jax.jit(detect)
    from yolo_v1_tpu.parallel.mesh import data_sharding, replicated

    data = data_sharding(mesh)
    # Multi-process: replicate the (tiny) detection outputs so every host
    # can fetch them with np.asarray — a data-sharded output spanning other
    # hosts' devices is not addressable here.  The all-gather is a few KB
    # per batch over ICI; single-process keeps the zero-copy sharded form.
    out = replicated(mesh) if jax.process_count() > 1 else data
    return jax.jit(
        detect,
        in_shardings=(replicated(mesh), data),
        out_shardings=(out, out, out, out),
    )


def detections_to_preds(
    boxes: np.ndarray,
    scores: np.ndarray,
    classes: np.ndarray,
    keep: np.ndarray,
    image_ids: Sequence[str],
    preds: dict | None = None,
    class_names: Sequence[str] = VOC_CLASSES,
    image_size: int = 448,
) -> dict:
    """Accumulate device detections into the {class: [[id, conf, x1..y2]]}
    structure voc_eval consumes (utils/utils.py:410-411)."""
    if preds is None:
        preds = defaultdict(list)
    for i, img_id in enumerate(image_ids):
        for k in np.flatnonzero(keep[i]):
            b = (boxes[i, k] * image_size).astype(np.int64)  # trunc like int()
            preds[class_names[int(classes[i, k])]].append(
                [img_id, float(scores[i, k]), int(b[0]), int(b[1]), int(b[2]), int(b[3])]
            )
    return preds


class VocEvaluator:
    """little/full mAP evaluation over a test dataset (train.py:127-201)."""

    def __init__(
        self,
        dataset,  # data.pipeline.YoloDataset with train=False
        gt_full: dict,
        gt_little: dict | None = None,
        little_n: int = 750,  # train.py:127
        batch_size: int = 32,
        class_names: Sequence[str] = VOC_CLASSES,
        score_threshold: float = 0.005,
        nms_threshold: float = 0.45,
        nms_impl: str = "auto",
        match_iou: float = 0.5,
        use_07_metric: bool = False,  # reference default: continuous AP
        eval_image_size: int = 448,
        mesh=None,
        device_cache: bool = False,
        logger=None,
    ):
        self.dataset = dataset
        self.gt_full = gt_full
        self.gt_little = gt_little if gt_little is not None else gt_full
        self.little_n = little_n
        self.batch_size = batch_size
        self.class_names = class_names
        self.match_iou = match_iou
        self.use_07_metric = use_07_metric
        self.logger = logger
        cfg = dataset.config
        from concurrent.futures import ThreadPoolExecutor

        # TWO executors, deliberately: _load_batch runs on the one-slot
        # prefetch pool and fans its per-image load_raw calls out on the
        # inner pool.  A single shared pool deadlocks by starvation the
        # moment two batch loads are ever in flight (each outer task
        # blocks on inner futures queued behind the outer tasks) — hit
        # live once the device cache became partial: a cache hit orphans
        # the in-flight prefetch while submitting the next one.
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._inner_pool = ThreadPoolExecutor(
            max_workers=max(dataset.config.num_workers, 2)
        )
        self.mesh = mesh
        # With device_cache, every (padded) eval batch is uploaded ONCE and
        # reused across epochs — the test set is fixed, so after the first
        # eval the feed costs zero H2D bytes (the dev relay moves ~20 MB/s,
        # making the per-epoch 460 MB re-upload the eval bottleneck).  Under
        # a mesh the cached entries are batch-sharded device arrays, so the
        # cache composes with multi-chip eval unchanged.
        #
        # The cache is HBM-BOUNDED: alongside a device-resident VOC-scale
        # train set (9.96 GB) an unbounded full-eval cache (3 GB at 4,952
        # images) RESOURCE_EXHAUSTs the 16 GB chip mid-eval (measured live,
        # round-4 rehearsal epoch 5's first gated full eval).  New entries
        # are admitted only while the device reports enough free HBM
        # (reserve covers eval activations + the next train epoch), with a
        # fixed byte budget as the fallback when memory_stats is
        # unavailable; past the bound, batches stream per eval instead.
        self._device_cache: dict | None = {} if device_cache else None
        self._cache_bytes = 0
        self._cache_budget_fallback = 1 << 30  # 1 GiB if no memory_stats
        self._cache_reserve = 3 << 30  # keep >= 3 GiB HBM free
        self._cache_full_logged = False
        # The compiled batch shape must divide the mesh; round up and let
        # the host-side trim (below) drop the padded rows' detections.
        n_mesh = mesh.devices.size if mesh is not None else 1
        self._device_bs = -(-batch_size // n_mesh) * n_mesh
        # Feed raw uint8 and normalize on-chip: the eval loop is host-feed
        # bound (one f32 image is 2.4 MB vs 0.6 MB uint8) and the dataset is
        # train=False, so load_raw + on-device normalize reproduces
        # load_sample exactly.
        self.detector = make_detector(
            S=cfg.S, B=cfg.B, C=cfg.C,
            score_threshold=score_threshold, nms_threshold=nms_threshold,
            nms_impl=nms_impl, mesh=mesh, normalize_on_device=True,
        )
        # Predictions are scaled into the GT's pixel frame — always 448 in
        # the reference regardless of network input (utils/utils.py:356-387
        # builds GT at 448; bbox_un_norm :347 scales dets the same way).
        self.image_size = eval_image_size

    def _cache_admit(self, entry_bytes: int) -> bool:
        """Admit a new device-cache entry only while HBM headroom holds
        (see the bound rationale in __init__)."""
        free = None
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats and "bytes_limit" in stats:
                free = stats["bytes_limit"] - stats["bytes_in_use"]
        except Exception:
            pass
        if free is not None:
            ok = free - entry_bytes >= self._cache_reserve
        else:
            ok = self._cache_bytes + entry_bytes <= self._cache_budget_fallback
        if ok:
            self._cache_bytes += entry_bytes
        elif not self._cache_full_logged:
            self._cache_full_logged = True
            if self.logger:
                self.logger.info(
                    "eval device-cache bounded at %.2f GB (HBM headroom); "
                    "further batches stream per eval",
                    self._cache_bytes / 1e9,
                )
        return ok

    def _load_batch(self, start: int, n: int):
        idxs = list(range(start, min(start + self.batch_size, n)))
        futures = [
            self._inner_pool.submit(self.dataset.load_raw, i) for i in idxs
        ]
        images = np.stack([f.result()[0] for f in futures])  # uint8 RGB
        ids = [image_id_of(self.dataset.image_path(i)) for i in idxs]
        return images, ids

    def _run(self, state: TrainState, limit: int | None, gt: dict) -> float:
        n = len(self.dataset) if limit is None else min(limit, len(self.dataset))
        preds: dict = defaultdict(list)
        bs = self.batch_size
        # One-batch-ahead prefetch: decode/resize the next batch on the
        # worker pool while the device runs the current one (the reference's
        # eval loop is fully serial per image, utils/utils.py:394-405).
        # Skip the initial prefetch when batch 0 is already device-cached
        # (it would load bs images nobody consumes).
        pending = None
        if self._device_cache is None or (0, min(bs, n)) not in self._device_cache:
            pending = self._pool.submit(self._load_batch, 0, n)
        for start in range(0, n, bs):
            cache_key = (start, min(start + bs, n))
            if self._device_cache is not None and cache_key in self._device_cache:
                pending = None
                device_images, ids = self._device_cache[cache_key]
            else:
                if pending is None:
                    pending = self._pool.submit(self._load_batch, start, n)
                images, ids = pending.result()
                pending = None
                if images.shape[0] < self._device_bs:  # one compiled shape
                    pad = self._device_bs - images.shape[0]
                    images = np.concatenate(
                        [images, np.zeros_like(images[:1]).repeat(pad, 0)]
                    )
                if self.mesh is not None:
                    # put_global: multi-process safe (each host uploads
                    # only its addressable shards of the identical batch).
                    from yolo_v1_tpu.parallel.mesh import (
                        data_sharding, put_global,
                    )

                    device_images = put_global(
                        images, data_sharding(self.mesh)
                    )
                else:
                    device_images = jnp.asarray(images)
                if self._device_cache is not None and self._cache_admit(
                    device_images.size * device_images.dtype.itemsize
                ):
                    self._device_cache[cache_key] = (device_images, ids)
            if start + bs < n and (
                self._device_cache is None
                or (start + bs, min(start + 2 * bs, n))
                not in self._device_cache
            ):
                # Prefetch whenever the NEXT batch isn't already device-
                # cached — on the cold first eval pass the cache is empty,
                # and skipping prefetch there would serialize every decode
                # against the device (the load/compute overlap would only
                # kick in from epoch two).
                pending = self._pool.submit(self._load_batch, start + bs, n)
            boxes, scores, classes, keep = jax.tree.map(
                np.asarray, self.detector(state, device_images)
            )
            detections_to_preds(
                boxes[: len(ids)], scores[: len(ids)], classes[: len(ids)],
                keep[: len(ids)], ids, preds, self.class_names, self.image_size,
            )
        mAP, _ = voc_eval(
            preds, gt, self.class_names,
            iou_threshold=self.match_iou, use_07_metric=self.use_07_metric,
            logger=self.logger,
        )
        return mAP

    def close(self):
        """Shut down the decode worker pools (a long-lived process embedding
        many evaluators must not leak executors)."""
        self._pool.shutdown(wait=False, cancel_futures=True)
        self._inner_pool.shutdown(wait=False, cancel_futures=True)

    def little_map(self, state: TrainState) -> float:
        return self._run(state, self.little_n, self.gt_little)

    def full_map(self, state: TrainState) -> float:
        return self._run(state, None, self.gt_full)

    def render_panel(
        self, state: TrainState, n: int = 4, min_score: float = 0.1
    ):
        """Tile the first n test images with current detections drawn — the
        training-time visual feedback of the reference's visdom image panels
        (utils/visual.py:35-40; eval.py:94 uses the 0.1 display threshold).
        Reuses the evaluator's compiled detector shape (no extra program).
        """
        from yolo_v1_tpu.eval.visualize import draw_detections

        n = min(n, len(self.dataset), self.batch_size)
        images, _ = self._load_batch(0, n)
        if images.shape[0] < self._device_bs:
            pad = self._device_bs - images.shape[0]
            images = np.concatenate(
                [images, np.zeros_like(images[:1]).repeat(pad, 0)]
            )
        if self.mesh is not None:
            from yolo_v1_tpu.parallel.mesh import data_sharding, put_global

            device_images = put_global(images, data_sharding(self.mesh))
        else:
            device_images = jnp.asarray(images)
        boxes, scores, classes, keep = jax.tree.map(
            np.asarray, self.detector(state, device_images)
        )
        tiles = []
        for i in range(n):
            show = keep[i] & (scores[i] > min_score)
            tiles.append(
                draw_detections(
                    images[i], boxes[i][show], classes[i][show],
                    scores[i][show], class_names=self.class_names,
                )
            )
        cols = 2 if n > 1 else 1
        rows = -(-n // cols)
        h, w = tiles[0].shape[:2]
        panel = np.zeros((rows * h, cols * w, 3), np.uint8)
        for i, t in enumerate(tiles):
            r, c = divmod(i, cols)
            panel[r * h : (r + 1) * h, c * w : (c + 1) * w] = t
        return panel
