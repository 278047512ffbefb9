"""On-device batched augmentation — the whole train-input transform as one
jitted program.

The reference augments per-sample on CPU workers with imgaug
(`/root/reference/utils/YOLODataLoader.py:28-79`, SURVEY.md §3.1 'CPU hot
loop').  This module moves the same op families onto the accelerator:

  uint8 images [N,S*16?,..] --H2D--> (flip | affine-warp | pixel ops)
  -> ImageNet-normalize -> target-grid encode            [one jit, vmapped]

Families reproduced (probabilities mirror AugmentConfig / the imgaug policy):

* horizontal flip p=.5, vertical flip p=.125 with box mirroring (:66-67);
* 50%-gated affine (scale 0.8-1.2/axis, translate ±10%, rotate ±5°) as an
  inverse-mapped bilinear warp (jax.scipy.ndimage.map_coordinates) with the
  axis-aligned-hull box transform and out-of-image removal (:69-76, :172);
* 25%-gated pixel ops with the reference's SomeOf(1..3) draw (a uniform
  count of distinct ops per gated sample, ``someof_mask``): additive
  gaussian noise, elementwise add, global and elementwise multiply,
  dropout, salt&pepper replace, HSV saturation/value shift, gaussian blur
  (separable depthwise conv) and sharpen (unsharp-mask) (:34-64).  Only
  JPEG-compression artifacts stay host-only (bitstream codecs don't belong
  on a TPU) — the host pipeline (data/augment.py) keeps the full family.

Everything is fixed-shape and key-driven: sample k of batch n at epoch e is
reproducible from fold_in(key, e*N+n).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from yolo_v1_tpu.core.grid import encode_targets

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


@dataclass(frozen=True)
class DeviceAugmentConfig:
    flip_lr_prob: float = 0.5
    flip_ud_prob: float = 0.125
    affine_prob: float = 0.5
    scale_range: tuple[float, float] = (0.8, 1.2)
    translate_range: tuple[float, float] = (-0.1, 0.1)
    rotate_range: tuple[float, float] = (-5.0, 5.0)
    pixel_prob: float = 0.25
    noise_sigma_max: float = 0.1  # of full scale (imgaug 0.1*255)
    multiply_range: tuple[float, float] = (0.5, 1.5)
    dropout_rates: tuple[float, float] = (0.05, 0.2)
    replace_rate: float = 0.05
    hsv_shift: tuple[float, float] = (-10 / 255, 50 / 255)


# --- color space (values in [0,1]) ---


def rgb_to_hsv(rgb: Array) -> Array:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    safe = jnp.where(delta > 0, delta, 1.0)
    s = jnp.where(maxc > 0, delta / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: Array) -> Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    # Elementwise select chain instead of jnp.choose: choose lowers to a
    # per-pixel gather that measures 314 ms per 32-image batch on v5e; five
    # selects are ~3 ms.  Values are identical for i in [0, 5].
    def pick(opts):
        out = opts[5]
        for idx in range(4, -1, -1):
            out = jnp.where(i == idx, opts[idx], out)
        return out

    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# --- single-sample augment (vmapped) ---


def _affine_params(key: Array, size: int, cfg: DeviceAugmentConfig):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    sx = jax.random.uniform(k1, minval=cfg.scale_range[0], maxval=cfg.scale_range[1])
    sy = jax.random.uniform(k2, minval=cfg.scale_range[0], maxval=cfg.scale_range[1])
    tx = jax.random.uniform(
        k3, minval=cfg.translate_range[0], maxval=cfg.translate_range[1]
    ) * size
    ty = jax.random.uniform(
        k4, minval=cfg.translate_range[0], maxval=cfg.translate_range[1]
    ) * size
    theta = jnp.deg2rad(
        jax.random.uniform(
            k5, minval=cfg.rotate_range[0], maxval=cfg.rotate_range[1]
        )
    )
    c, s = jnp.cos(theta), jnp.sin(theta)
    rs = jnp.array([[c, -s], [s, c]]) @ jnp.array([[sx, 0.0], [0.0, sy]])
    center = size / 2.0
    offset = jnp.array([center + tx, center + ty]) - rs @ jnp.array(
        [center, center]
    )
    return rs, offset


def _warp_image(img: Array, rs: Array, offset: Array) -> Array:
    """Inverse-map bilinear warp: out(p) = img(A^-1 (p - offset)).

    Out-of-image taps contribute 0 (map_coordinates order=1/'constant'
    semantics).  Implemented as ONE row gather of the [H*W, C] flattened
    image over all 4 bilinear corners — gathering C-channel rows keeps the
    minor dimension contiguous, where a per-channel map_coordinates lowers
    to 3x4 scalar-element gathers (measured 4.4x slower end to end on v5e).
    """
    size = img.shape[0]
    inv = jnp.linalg.inv(rs)
    ys, xs = jnp.meshgrid(jnp.arange(size), jnp.arange(size), indexing="ij")
    pts = jnp.stack([xs.ravel(), ys.ravel()], axis=0).astype(jnp.float32)
    src = inv @ (pts - offset[:, None])  # [2, size*size] (x, y)
    sx, sy = src[0], src[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx, fy = sx - x0, sy - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)

    flat = img.reshape(size * size, -1)  # [P, C]
    idxs, weights = [], []
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        yi = y0i + dy
        yok = (yi >= 0) & (yi < size)
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            xi = x0i + dx
            ok = yok & (xi >= 0) & (xi < size)
            idxs.append(
                jnp.clip(yi, 0, size - 1) * size + jnp.clip(xi, 0, size - 1)
            )
            weights.append(jnp.where(ok, wy * wx, 0.0))
    taps = jnp.take(flat, jnp.concatenate(idxs), axis=0)  # [4P, C]
    taps = taps.reshape(4, size * size, -1)
    w = jnp.stack(weights)[:, :, None]  # [4, P, 1]
    return jnp.sum(taps * w, axis=0).reshape(size, size, -1)


def _transform_boxes_affine(xyxy: Array, rs: Array, offset: Array) -> Array:
    x1, y1, x2, y2 = xyxy[:, 0], xyxy[:, 1], xyxy[:, 2], xyxy[:, 3]
    corners = jnp.stack(
        [
            jnp.stack([x1, y1], -1), jnp.stack([x2, y1], -1),
            jnp.stack([x2, y2], -1), jnp.stack([x1, y2], -1),
        ],
        axis=1,
    )  # [M, 4, 2]
    warped = corners @ rs.T + offset
    return jnp.concatenate([warped.min(axis=1), warped.max(axis=1)], axis=-1)


def _gaussian_blur(img: Array, sigma: Array, radius: int = 11) -> Array:
    """Separable gaussian blur as two banded-matrix matmuls (HWC image).

    ``sigma`` may be traced (the band weights are built from a fixed taps
    grid); ``radius`` must cover ~3 sigma of the largest sigma used
    (default 11 covers the imgaug policy's sigma 3.5).  Borders use reflect
    semantics — zero padding would renormalize mass off-image and darken a
    radius-wide frame on every blurred sample.

    Why matmuls: a 1-channel depthwise conv runs on the TPU's VPU at
    terrible utilization; folding the taps into a [size, size] banded
    matrix turns each pass into a dense matmul the MXU eats (~1 GFLOP per
    448px image).  The band is built elementwise from an iota grid — the
    reflect fold adds the tap weight at |row - col| offsets mapped back
    into range, exactly matching a reflect-padded conv.
    """
    size = img.shape[0]
    assert img.shape[1] == size, "square images only"
    taps = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (taps / jnp.maximum(sigma, 1e-3)) ** 2)
    k = k / jnp.sum(k)

    src_i = jnp.arange(size)[None, :]  # source position (band column)
    band = jnp.zeros((size, size), jnp.float32)
    for t in range(-radius, radius + 1):
        # Source index u+t under reflect (mirror excluding the edge sample):
        # band[u, i] += k[t]  where  i == reflect(u + t).
        j = np.arange(size) + t
        j = np.where(j < 0, -j, j)
        j = np.where(j >= size, 2 * (size - 1) - j, j)
        band = band + k[t + radius] * (src_i == jnp.asarray(j)[:, None])
    # band[u, i]: weight of source row/col i in output u.
    x = jnp.einsum("uh,hwc->uwc", band, img)
    return jnp.einsum("vw,uwc->uvc", band, x)


def someof_mask(key: Array, n_ops: int, lo: int = 1, hi: int = 3) -> Array:
    """imgaug ``SomeOf((lo, hi))`` activation mask: a count n drawn uniformly
    from [lo, hi], then n DISTINCT ops chosen uniformly (the first n slots of
    a random permutation).  Matches the reference policy's draw exactly
    (YOLODataLoader.py:34) — ops apply in module order rather than imgaug's
    list order, which is the one (documented) divergence left."""
    k_n, k_perm = jax.random.split(key)
    n = jax.random.randint(k_n, (), lo, hi + 1)
    return jax.random.permutation(k_perm, n_ops) < n


def _pixel_ops(key: Array, img: Array, cfg: DeviceAugmentConfig) -> Array:
    """Gated pixel family on a [H,W,3] float image in [0,1]."""
    keys = jax.random.split(key, 15)
    gate = jax.random.uniform(keys[0]) < cfg.pixel_prob
    # SomeOf(1..3) of the 9 on-device ops (the reference draws over 10;
    # JPEG artifacts stay host-only).
    act = someof_mask(keys[1], 9)

    out = img
    # additive gaussian noise
    noise = jax.random.normal(keys[2], img.shape) * (
        jax.random.uniform(keys[3]) * cfg.noise_sigma_max
    )
    out = jnp.where(gate & act[0], out + noise, out)
    # elementwise add (imgaug AddElementwise(-50, 50))
    add = jax.random.uniform(keys[4], img.shape, minval=-50 / 255, maxval=50 / 255)
    out = jnp.where(gate & act[1], out + add, out)
    # global multiply
    m = jax.random.uniform(
        keys[5], minval=cfg.multiply_range[0], maxval=cfg.multiply_range[1]
    )
    out = jnp.where(gate & act[2], out * m, out)
    # elementwise multiply
    me = jax.random.uniform(
        keys[6], img.shape, minval=cfg.multiply_range[0],
        maxval=cfg.multiply_range[1],
    )
    out = jnp.where(gate & act[3], out * me, out)
    # dropout
    rate = jnp.where(
        jax.random.uniform(keys[7]) < 0.5, cfg.dropout_rates[0],
        cfg.dropout_rates[1],
    )
    drop = jax.random.uniform(keys[8], img.shape[:2]) < rate
    out = jnp.where(gate & act[4], out * (1.0 - drop[..., None]), out)
    # salt & pepper replace
    rep = jax.random.uniform(keys[9], img.shape[:2]) < cfg.replace_rate
    salt = (jax.random.uniform(keys[10], img.shape[:2]) < 0.5).astype(out.dtype)
    out = jnp.where(
        (gate & act[5]) & rep[..., None], salt[..., None], out
    )
    # HSV S or V shift
    which = jax.random.uniform(keys[11]) < 0.5
    delta = jax.random.uniform(
        keys[12], minval=cfg.hsv_shift[0], maxval=cfg.hsv_shift[1]
    )
    hsv = rgb_to_hsv(jnp.clip(out, 0.0, 1.0))
    hsv_s = hsv.at[..., 1].add(delta)
    hsv_v = hsv.at[..., 2].add(delta)
    shifted = hsv_to_rgb(jnp.clip(jnp.where(which, hsv_s, hsv_v), 0.0, 1.0))
    out = jnp.where(gate & act[6], shifted, out)
    # gaussian blur (imgaug GaussianBlur sigma 2-3.5, :40)
    sigma = jax.random.uniform(keys[13], minval=2.0, maxval=3.5)
    blurred = _gaussian_blur(jnp.clip(out, 0.0, 1.0), sigma)
    out = jnp.where(gate & act[7], blurred, out)
    # sharpen (imgaug Sharpen alpha .1-.8, :37) as unsharp mask
    alpha = jax.random.uniform(keys[14], minval=0.1, maxval=0.8)
    soft = _gaussian_blur(jnp.clip(out, 0.0, 1.0), jnp.float32(1.0), radius=3)
    out = jnp.where(gate & act[8], out + alpha * (out - soft), out)
    return jnp.clip(out, 0.0, 1.0)


def _augment_one(
    key: Array,
    img: Array,  # [H, W, 3] float in [0,1]
    boxes: Array,  # [M, 4] cxcywh normalized (padded)
    valid: Array,  # [M] bool
    cfg: DeviceAugmentConfig,
) -> tuple[Array, Array, Array]:
    size = img.shape[0]
    k_lr, k_ud, k_aff_gate, k_aff, k_pix = jax.random.split(key, 5)

    xyxy = jnp.concatenate(
        [boxes[:, :2] - 0.5 * boxes[:, 2:], boxes[:, :2] + 0.5 * boxes[:, 2:]],
        axis=1,
    ) * size

    flip_lr = jax.random.uniform(k_lr) < cfg.flip_lr_prob
    img = jnp.where(flip_lr, img[:, ::-1], img)
    xyxy = jnp.where(
        flip_lr,
        jnp.stack(
            [size - xyxy[:, 2], xyxy[:, 1], size - xyxy[:, 0], xyxy[:, 3]], -1
        ),
        xyxy,
    )
    flip_ud = jax.random.uniform(k_ud) < cfg.flip_ud_prob
    img = jnp.where(flip_ud, img[::-1], img)
    xyxy = jnp.where(
        flip_ud,
        jnp.stack(
            [xyxy[:, 0], size - xyxy[:, 3], xyxy[:, 2], size - xyxy[:, 1]], -1
        ),
        xyxy,
    )

    do_affine = jax.random.uniform(k_aff_gate) < cfg.affine_prob
    rs, offset = _affine_params(k_aff, size, cfg)
    img = jnp.where(do_affine, _warp_image(img, rs, offset), img)
    xyxy = jnp.where(do_affine, _transform_boxes_affine(xyxy, rs, offset), xyxy)

    img = _pixel_ops(k_pix, img, cfg)

    # Remove fully-outside boxes; clip the rest (YOLODataLoader.py:172).
    inside = (
        (xyxy[:, 2] > 0) & (xyxy[:, 3] > 0)
        & (xyxy[:, 0] < size) & (xyxy[:, 1] < size)
    )
    xyxy = jnp.clip(xyxy, 0.0, size)
    nonempty = (xyxy[:, 2] - xyxy[:, 0] > 1) & (xyxy[:, 3] - xyxy[:, 1] > 1)
    valid = valid & inside & nonempty

    out_boxes = jnp.concatenate(
        [(xyxy[:, :2] + xyxy[:, 2:]) / 2.0, xyxy[:, 2:] - xyxy[:, :2]],
        axis=1,
    ) / size
    return img, out_boxes, valid


@partial(jax.jit, static_argnames=("S", "B", "C", "cfg"))
def augment_and_encode_batch(
    key: Array,
    images_u8: Array,  # [N, H, W, 3] uint8 RGB
    boxes: Array,  # [N, M, 4] cxcywh normalized, padded
    labels: Array,  # [N, M]
    counts: Array,  # [N]
    S: int,
    B: int = 2,
    C: int = 20,
    cfg: DeviceAugmentConfig = DeviceAugmentConfig(),
) -> tuple[Array, Array]:
    """uint8 batch -> (normalized float images, encoded target grids),
    augmented, in ONE jitted program."""
    N, M = boxes.shape[0], boxes.shape[1]
    imgs = images_u8.astype(jnp.float32) / 255.0
    valid = jnp.arange(M)[None, :] < counts[:, None]
    keys = jax.random.split(key, N)
    imgs, aug_boxes, aug_valid = jax.vmap(
        partial(_augment_one, cfg=cfg)
    )(keys, imgs, boxes, valid)
    imgs = (imgs - IMAGENET_MEAN) / IMAGENET_STD

    # encode_targets takes counts; emulate an arbitrary validity mask by
    # zeroing invalid boxes (zero-sized boxes are dropped by the encoder).
    safe_boxes = jnp.where(aug_valid[..., None], aug_boxes, 0.0)
    targets = encode_targets(
        safe_boxes, labels, jnp.full((N,), M, jnp.int32), S=S, B=B, C=C
    )
    return imgs, targets


@partial(jax.jit, static_argnames=("S", "B", "C", "cfg"))
def gather_augment_encode(
    key: Array,
    images_all: Array,  # [D, H, W, 3] uint8, device-resident dataset
    boxes_all: Array,  # [D, M, 4]
    labels_all: Array,  # [D, M]
    counts_all: Array,  # [D]
    idx: Array,  # [N] int32 batch indices — the only per-step host input
    S: int,
    B: int = 2,
    C: int = 20,
    cfg: DeviceAugmentConfig = DeviceAugmentConfig(),
) -> tuple[Array, Array]:
    """Device-resident batch assembly: gather ``idx`` rows from the
    HBM-resident dataset tensors (an on-chip row gather — microseconds at
    HBM bandwidth), then augment + normalize + encode, one jitted program.
    Per step only the [N] index vector crosses the host->device link."""
    return augment_and_encode_batch(
        key,
        jnp.take(images_all, idx, axis=0),
        jnp.take(boxes_all, idx, axis=0),
        jnp.take(labels_all, idx, axis=0),
        jnp.take(counts_all, idx, axis=0),
        S=S, B=B, C=C, cfg=cfg,
    )
