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
    # Affine-warp implementation.  'pallas': the banded row-resample as a
    # TPU kernel (ops/pallas/warp_kernel.py) — whole image in VMEM per
    # grid step, no giant gather intermediates (0.08 GB temp HBM at bs32
    # vs the band warp's 16.4 GB unchunked).  'band': two-pass banded
    # row-resample in XLA — one gather of WIDE [warp_chunk*3] pixel rows
    # per (row, chunk, tap) instead of the per-pixel 4-corner gather,
    # which XProf measured at 225 ms per 32-image batch (~6x the largest
    # conv; 12-byte gather rows are latency-bound on TPU — docs/DESIGN.md
    # XProf table).  'gather': the original exact per-pixel bilinear warp
    # (kept as the semantic reference; the band warp matches it to ~1e-1
    # pixel-value tolerance under rotation and exactly when rotation is
    # 0; the pallas warp matches the band warp to f32 rounding).
    # 'auto' (default): 'pallas' on TPU, 'band' elsewhere (interpret-mode
    # Pallas on CPU is orders of magnitude slower than the XLA band).
    warp_impl: str = "auto"
    # Gaussian-blur implementation (see _gaussian_blur): 'band' f32 banded
    # matmul, 'band_bf16' bf16-operand matmul (f32 accumulation; error
    # < 1/255 — noise-level for a random augmentation op), 'shift'
    # reflect-pad + tap-weighted shifted slices on the VPU.  'auto':
    # 'band_bf16' on TPU (the f32 band matmul measured 8.3 ms/batch at
    # bs32, 30% of the whole augment program — docs/DESIGN.md), 'band'
    # elsewhere.
    blur_impl: str = "auto"
    # Resident-dataset row-gather implementation (gather_augment_encode):
    # 'take' jnp.take (XLA gather — superlinear collapse with batch size:
    # 4.2 ms at bs32 but 134.3 ms at bs128 on v5e, 0.6 GB/s), 'pallas'
    # scalar-prefetch row-copy kernel (ops/pallas/gather_kernel.py —
    # batch-flat 2.3-2.5 ms, hardware bit-exact).  'auto': 'pallas' on
    # TPU, 'take' elsewhere (interpret-mode Pallas on CPU is slow).
    gather_impl: str = "auto"
    warp_chunk: int = 64  # gather-row width (pixels); must divide the image
    # Pallas-warp column-chunk width (pixels): per-chunk tap windows cover
    # only the chunk's banded spread (D8 80 -> 40 at 448px), halving the
    # kernel arithmetic at identical bilinear semantics
    # (ops/pallas/warp_kernel.py).  0 = one full-row window (round-4
    # formulation, kept for A/B measurement).
    warp_col_chunk: int = 128
    # HSV S/V shift implementation: 'algebraic' shifts S or V directly on
    # RGB (identical math, no hue round-trip — see hsv_sv_shift);
    # 'roundtrip' keeps rgb_to_hsv/hsv_to_rgb for A/B measurement.
    hsv_impl: str = "algebraic"
    # Peak-HBM bound: augment at most this many images at once (lax.map
    # over sub-batches).  The band warp's gather intermediates cost
    # ~0.5 GB/image in XLA temp HBM (AOT memory_analysis: 16.4 GB at bs32
    # — layout-conversion copies of the [rows, Wc*C] tap tensors), so an
    # unchunked batch cannot share a 16 GB chip with the train step.
    # 0 disables chunking.
    batch_chunk: int = 8

    def __post_init__(self):
        if self.warp_impl not in ("auto", "band", "gather", "pallas"):
            raise ValueError(
                f"warp_impl must be 'auto', 'band', 'gather' or 'pallas', "
                f"got {self.warp_impl!r}"
            )
        if self.blur_impl not in ("auto", "band", "band_bf16", "shift"):
            raise ValueError(
                f"blur_impl must be 'auto', 'band', 'band_bf16' or 'shift', "
                f"got {self.blur_impl!r}"
            )
        if self.gather_impl not in ("auto", "take", "pallas"):
            raise ValueError(
                f"gather_impl must be 'auto', 'take' or 'pallas', "
                f"got {self.gather_impl!r}"
            )
        if self.hsv_impl not in ("algebraic", "roundtrip"):
            raise ValueError(
                f"hsv_impl must be 'algebraic' or 'roundtrip', "
                f"got {self.hsv_impl!r}"
            )


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


def hsv_sv_shift(x: Array, delta: Array, shift_v: Array) -> Array:
    """Shift HSV saturation OR value of an RGB image in [0,1] WITHOUT the
    hue round-trip — algebraically identical to
    ``hsv_to_rgb(shift(rgb_to_hsv(x)))`` for S/V-only shifts.

    Each channel of ``hsv_to_rgb`` is ``v * (1 - s*k_c)`` with ``k_c``
    determined by hue alone, so:

    * V-shift (v' = clip(v+d)):  c' = c * v'/v        (hue, sat fixed);
      v == 0 (black, h=s=0 by rgb_to_hsv convention) -> gray v'.
    * S-shift (s' = clip(s+d)):  c' = v - (s'/s)(v-c) (hue, val fixed);
      s == 0 (gray, h=0 convention) -> the reference formulas tint
      toward red: r'=v, g'=b'=v(1-s').

    ~6 elementwise ops replacing rgb_to_hsv's division/compare chains +
    hsv_to_rgb's 15-way selects — the augment program's pixel-op block is
    elementwise-bound on the VPU (round-4 XProf: ~12.7 ms/batch of
    clip/select chains at bs128).  Agreement with the round-trip is
    pinned to f32 rounding in test_device_augment.

    The channel max/min deliberately AVOID ``jnp.max(axis=-1)``: a
    3-element minor-axis reduce lowered to 11.7 ms/batch at bs128 on v5e
    (round-5 XProf — reduce_max + reduce_min were 24% of the whole
    augment program), while an elementwise maximum chain over the three
    channel slices fuses into the surrounding elementwise ops.
    """
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    v = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    s = jnp.where(v > 0, (v - minc) / jnp.where(v > 0, v, 1.0), 0.0)
    # value shift
    v2 = jnp.clip(v + delta, 0.0, 1.0)
    x_v = jnp.where(v > 0, x * (v2 / jnp.where(v > 0, v, 1.0)), v2)
    # saturation shift
    s2 = jnp.clip(s + delta, 0.0, 1.0)
    ratio = s2 / jnp.where(s > 0, s, 1.0)
    x_s = jnp.where(s > 0, v - ratio * (v - x), x)
    # s==0 tint-to-red convention (h=0): r'=v, g'=b'=v*(1-s2)
    gray_r = jnp.concatenate(
        [v, v * (1.0 - s2), v * (1.0 - s2)], axis=-1
    )
    x_s = jnp.where(s > 0, x_s, gray_r)
    return jnp.where(shift_v, x_v, x_s)


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


def _resample_axis0(
    src: Array, c_row: Array, c_col: Array, c_0: Array, D: int, Wc: int
) -> Array:
    """1-D bilinear resample along axis 0 at positions affine in BOTH
    indices: out[r, w, c] = lerp_axis0(src)[p(r, w), w, c] with
    p = c_row*r + c_col*w + c_0; taps outside [0, H-1] contribute zero
    (matching ``_warp_image``'s per-tap masking).

    TPU-shaped: per (output row, Wc-wide column chunk) the two integer
    neighbors of every in-chunk position lie inside a static D-tap band
    anchored at floor(min p); the band rows are fetched with ONE gather of
    [Wc*C]-wide rows (D · H · W/Wc descriptors per image instead of per-
    pixel descriptors) and combined with elementwise hat weights — max(0,
    1-|p - tap|) is exactly the bilinear weight pair.  D must satisfy
    D >= |c_col|*(Wc-1) + 3, which the caller derives statically from the
    augment-config parameter ranges.
    """
    H, W, C = src.shape
    nc = W // Wc
    r = jnp.arange(H, dtype=jnp.float32)
    w = jnp.arange(W, dtype=jnp.float32)
    p = c_row * r[:, None] + c_col * w[None, :] + c_0  # [H, W]
    p_c = p.reshape(H, nc, Wc)
    base = jnp.floor(jnp.min(p_c, axis=-1)).astype(jnp.int32)  # [H, nc]
    tap = base[..., None] + jnp.arange(D, dtype=jnp.int32)  # [H, nc, D]
    flat = src.reshape(H * nc, Wc * C)
    idx = jnp.clip(tap, 0, H - 1) * nc + jnp.arange(nc)[None, :, None]
    # Every big intermediate keeps the flattened [Wc*C]-wide pixel rows as
    # its MINOR dim: a [..., Wc, C] layout puts C=3 in the lane dim and TPU
    # pads 3 -> 128 lanes, which measured 16.4 GB temp HBM for this whole
    # program at bs32 (42x blowup, AOT memory_analysis) vs ~1.5 GB flat.
    taps = jnp.take(flat, idx.reshape(-1), axis=0)
    taps = taps.reshape(H, nc, D, Wc * C)
    tap_f = tap[..., None].astype(jnp.float32)  # [H, nc, D, 1]
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(p_c[:, :, None, :] - tap_f))
    wgt = wgt * ((tap[..., None] >= 0) & (tap[..., None] <= H - 1))
    # flat's element order within a row is pixel-major (w0: c0 c1 c2, w1:
    # ...), so the per-element weight is each per-pixel weight repeated C
    # consecutive times.
    wgt_wide = jnp.repeat(wgt, C, axis=-1)  # [H, nc, D, Wc*C]
    out = jnp.sum(taps * wgt_wide, axis=2)  # [H, nc, Wc*C]
    return out.reshape(H, W, C)


def _pallas_warp_bounds(
    cfg: DeviceAugmentConfig,
) -> tuple[float, float, float]:
    """Static |coefficient| bounds for the Pallas warp kernel, from the
    config's parameter ranges.  With a = inv(R(θ) S(sx,sy)) =
    [[cosθ/sx, sinθ/sx], [-sinθ/sy, cosθ/sy]]:

    * pass A c_col = a10/a00 = -tanθ·sx/sy     → |·| ≤ tanθ·smax/smin
    * pass B c_col = a01 = sinθ/sx             → |·| ≤ sinθ/smin
    * pass A c_row = a11 - a10·a01/a00 = 1/(cosθ·sy), pass B c_row =
      a00 = cosθ/sx                            → |·| ≤ 1/(cosθ·smin)

    The gate-folded identity params (c_row=1) are within the c_row bound.
    """
    theta = np.deg2rad(
        max(abs(cfg.rotate_range[0]), abs(cfg.rotate_range[1]))
    )
    smin, smax = cfg.scale_range
    cc_a = float(np.tan(theta) * smax / smin)
    cc_b = float(np.sin(theta) / smin)
    cr_max = float(1.0 / (np.cos(theta) * smin))
    return cc_a, cc_b, cr_max


def _band_taps(cfg: DeviceAugmentConfig, Wc: int) -> tuple[int, int]:
    """Static per-pass tap counts covering the config's parameter ranges."""
    theta = np.deg2rad(
        max(abs(cfg.rotate_range[0]), abs(cfg.rotate_range[1]))
    )
    smin, smax = cfg.scale_range
    # inv(R(theta) @ S(sx, sy)) = [[cos/sx, sin/sx], [-sin/sy, cos/sy]]
    cc_a = np.tan(theta) * smax / smin  # pass A: |a10/a00| <= tan * sx/sy
    cc_b = np.sin(theta) / smin  # pass B: |a01| <= sin/sx
    d_a = int(np.ceil(cc_a * (Wc - 1))) + 3
    d_b = int(np.ceil(cc_b * (Wc - 1))) + 3
    return d_a, d_b


def _warp_image_band(
    img: Array, rs: Array, offset: Array, cfg: DeviceAugmentConfig
) -> Array:
    """Two-pass inverse-mapped affine warp (Catmull-Smith decomposition).

    The inverse map src = A (dst - offset) = a*dst + o factors into a
    vertical 1-D resample t(u, x) = img(Y(u, x), x) followed by a
    horizontal one out(u, v) = t(u, X(u, v)), with
      X(u, v) = a00*v + a01*u + o_x                       (exact), and
      Y(u, x) = (a10/a00)*x + (a11 - a10*a01/a00)*u + (o_y - a10/a00*o_x)
    so that Y(u, X(u, v)) == sy(u, v) exactly on the pass-B sample points.
    Each pass is ``_resample_axis0`` (pass B on the transpose, keeping the
    gathered rows wide).  Not bit-identical to single-pass bilinear under
    rotation (the two vertical taps of a horizontal pair sample Y at
    x0/x0+1 rather than at the exact sx — an O(|a10/a00|) sub-pixel shift);
    identical when rotation is zero, and exact identity at identity params.
    """
    size = img.shape[0]
    Wc = cfg.warp_chunk
    while size % Wc:
        Wc -= 1
    d_a, d_b = _band_taps(cfg, Wc)
    a = jnp.linalg.inv(rs)
    o = -a @ offset
    cy_x = a[1, 0] / a[0, 0]
    cy_u = a[1, 1] - a[1, 0] * a[0, 1] / a[0, 0]
    cy_0 = o[1] - a[1, 0] / a[0, 0] * o[0]
    t = _resample_axis0(img, cy_u, cy_x, cy_0, d_a, Wc)
    t = jnp.swapaxes(t, 0, 1)
    out = _resample_axis0(t, a[0, 0], a[0, 1], o[0], d_b, Wc)
    return jnp.swapaxes(out, 0, 1)


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


def _blur_taps(sigma: Array, radius: int) -> Array:
    """Normalized gaussian tap weights over a fixed [-radius, radius] grid
    (``sigma`` may be traced)."""
    taps = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (taps / jnp.maximum(sigma, 1e-3)) ** 2)
    return k / jnp.sum(k)


def _gaussian_blur(
    img: Array, sigma: Array, radius: int = 11, impl: str = "band"
) -> Array:
    """Separable gaussian blur of an HWC image; ``sigma`` may be traced;
    ``radius`` must cover ~3 sigma of the largest sigma used (default 11
    covers the imgaug policy's sigma 3.5).  Borders use reflect semantics —
    zero padding would renormalize mass off-image and darken a radius-wide
    frame on every blurred sample.

    Implementations (all the same math, summation order/precision differ):

    * ``band``: two banded-matrix matmuls in f32.  A 1-channel depthwise
      conv runs on the TPU's VPU at terrible utilization; folding the taps
      into a [size, size] banded matrix turns each pass into a dense matmul
      the MXU eats (~1 GFLOP per 448px image) — but f32 matmuls run the
      MXU at 1/8 rate and the band is 95% zeros.
    * ``band_bf16``: the same matmuls with bf16 operands (f32 MXU
      accumulation).  ~8x the f32 MXU rate; worst-case error ~bf16 eps of
      the pixel value (<1/255) — noise-level for an op that is itself a
      random augmentation.
    * ``shift``: reflect-pad then a tap-weighted sum of 2*radius+1 shifted
      slices per axis on the VPU — work scales with the radius (23 or 7
      taps) instead of the dense 448-wide contraction, and no [size, size]
      per-image band tensors are built.
    """
    if impl == "shift":
        return _gaussian_blur_shift(img, sigma, radius)
    size = img.shape[0]
    assert img.shape[1] == size, "square images only"
    k = _blur_taps(sigma, radius)

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
    if impl == "band_bf16":
        band = band.astype(jnp.bfloat16)
        x = jnp.einsum(
            "uh,hwc->uwc", band, img.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return jnp.einsum(
            "vw,uwc->uvc", band, x.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    x = jnp.einsum("uh,hwc->uwc", band, img)
    return jnp.einsum("vw,uwc->uvc", band, x)


def _gaussian_blur_shift(img: Array, sigma: Array, radius: int = 11) -> Array:
    """Shift-add separable blur: reflect-pad each axis, then accumulate
    tap-weighted static slices (the fused-elementwise formulation of the
    same reflect conv the band matrix encodes)."""
    size = img.shape[0]
    assert img.shape[1] == size, "square images only"
    k = _blur_taps(sigma, radius)
    p = jnp.pad(img, ((radius, radius), (0, 0), (0, 0)), mode="reflect")
    x = jnp.zeros_like(img)
    for t in range(2 * radius + 1):
        x = x + k[t] * jax.lax.slice_in_dim(p, t, t + size, axis=0)
    p = jnp.pad(x, ((0, 0), (radius, radius), (0, 0)), mode="reflect")
    out = jnp.zeros_like(img)
    for t in range(2 * radius + 1):
        out = out + k[t] * jax.lax.slice_in_dim(p, t, t + size, axis=1)
    return out


def someof_mask(key: Array, n_ops: int, lo: int = 1, hi: int = 3) -> Array:
    """imgaug ``SomeOf((lo, hi))`` activation mask: a count n drawn uniformly
    from [lo, hi], then n DISTINCT ops chosen uniformly (the first n slots of
    a random permutation).  Matches the reference policy's draw exactly
    (YOLODataLoader.py:34) — ops apply in module order rather than imgaug's
    list order, which is the one (documented) divergence left."""
    k_n, k_perm = jax.random.split(key)
    n = jax.random.randint(k_n, (), lo, hi + 1)
    return jax.random.permutation(k_perm, n_ops) < n


def _resolve_blur_impl(impl: str) -> str:
    """'auto' -> 'band_bf16' on TPU (8x MXU rate over the f32 band, error
    < 1/255 — see _gaussian_blur), 'band' elsewhere."""
    if impl == "auto":
        return (
            "band_bf16"
            if jax.default_backend() in ("tpu", "axon")
            else "band"
        )
    return impl


def _resolve_gather_impl(impl: str) -> str:
    """'auto' -> 'pallas' on TPU, 'take' elsewhere.  Measured on v5e
    (tools/hw_gather_check.py, round 4, 512-row 448px uint8 dataset):
    XLA's whole-row gather collapses superlinearly with the batch —
    4.2 ms at bs32 but **134.3 ms at bs128 (0.6 GB/s)**, where it was
    67.7% of the entire bs128 augment program (XProf) — while the Pallas
    scalar-prefetch row copy runs 2.3 / 2.5 ms (batch-size flat, 31.5
    GB/s), bit-exact on hardware for the uint8 image and f32 box shapes."""
    if impl == "auto":
        return (
            "pallas" if jax.default_backend() in ("tpu", "axon") else "take"
        )
    return impl


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
    # HSV S or V shift.  'algebraic' (default) shifts S/V directly on the
    # RGB values — identical math to the hsv round-trip for S/V-only
    # shifts (see hsv_sv_shift) without the hue computation's
    # division/select chains; 'roundtrip' keeps the full conversion for
    # A/B measurement.
    which = jax.random.uniform(keys[11]) < 0.5  # True -> saturation shift
    delta = jax.random.uniform(
        keys[12], minval=cfg.hsv_shift[0], maxval=cfg.hsv_shift[1]
    )
    clipped = jnp.clip(out, 0.0, 1.0)
    if cfg.hsv_impl == "algebraic":
        shifted = hsv_sv_shift(clipped, delta, shift_v=~which)
    else:
        hsv = rgb_to_hsv(clipped)
        hsv_s = hsv.at[..., 1].add(delta)
        hsv_v = hsv.at[..., 2].add(delta)
        shifted = hsv_to_rgb(
            jnp.clip(jnp.where(which, hsv_s, hsv_v), 0.0, 1.0)
        )
    out = jnp.where(gate & act[6], shifted, out)
    # gaussian blur (imgaug GaussianBlur sigma 2-3.5, :40)
    blur_impl = _resolve_blur_impl(cfg.blur_impl)
    sigma = jax.random.uniform(keys[13], minval=2.0, maxval=3.5)
    blurred = _gaussian_blur(jnp.clip(out, 0.0, 1.0), sigma, impl=blur_impl)
    out = jnp.where(gate & act[7], blurred, out)
    # sharpen (imgaug Sharpen alpha .1-.8, :37) as unsharp mask
    alpha = jax.random.uniform(keys[14], minval=0.1, maxval=0.8)
    soft = _gaussian_blur(
        jnp.clip(out, 0.0, 1.0), jnp.float32(1.0), radius=3, impl=blur_impl
    )
    out = jnp.where(gate & act[8], out + alpha * (out - soft), out)
    return jnp.clip(out, 0.0, 1.0)


def _augment_pre(
    key: Array,
    img: Array,  # [H, W, 3] float in [0,1]
    boxes: Array,  # [M, 4] cxcywh normalized (padded)
    cfg: DeviceAugmentConfig,
):
    """Flips + affine draw + box transform — everything before the image
    warp.  Returns the flipped image, gate-folded warp params (identity
    when the affine gate is off — both band and Pallas resamples are
    bit-exact at identity), transformed pixel-space xyxy boxes, and the
    pixel-ops key for ``_augment_post``."""
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
    rs_eff = jnp.where(do_affine, rs, jnp.eye(2))
    off_eff = jnp.where(do_affine, offset, jnp.zeros(2))
    xyxy = jnp.where(do_affine, _transform_boxes_affine(xyxy, rs, offset), xyxy)
    return img, rs_eff, off_eff, do_affine, xyxy, k_pix


def _augment_post(
    k_pix: Array,
    img: Array,  # [H, W, 3] warped
    xyxy: Array,  # [M, 4] pixel-space
    valid: Array,  # [M] bool
    cfg: DeviceAugmentConfig,
) -> tuple[Array, Array, Array]:
    """Pixel ops + box cleanup — everything after the image warp."""
    size = img.shape[0]
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


def _augment_one(
    key: Array,
    img: Array,  # [H, W, 3] float in [0,1]
    boxes: Array,  # [M, 4] cxcywh normalized (padded)
    valid: Array,  # [M] bool
    cfg: DeviceAugmentConfig,
) -> tuple[Array, Array, Array]:
    """Per-sample augment for the vmapped ('band'/'gather') warp impls; the
    'pallas' impl runs the warp at batch level between the same pre/post
    stages (see ``augment_and_encode_batch``)."""
    img, rs_eff, off_eff, do_affine, xyxy, k_pix = _augment_pre(
        key, img, boxes, cfg
    )
    if cfg.warp_impl != "gather":
        # 'pallas'/'auto' reach here only via the H % 8 / CPU fallback in
        # augment_and_encode_batch; band is the matching exact resample.
        # Gate folded into the params: the band resample is bit-exact at
        # identity (weight 1.0 on the integer tap), so ungated samples pass
        # through unchanged without a second full-image select.
        img = _warp_image_band(img, rs_eff, off_eff, cfg)
    else:
        img = jnp.where(
            do_affine, _warp_image(img, rs_eff, off_eff), img
        )
    return _augment_post(k_pix, img, xyxy, valid, cfg)


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
    sample_ids: Array | None = None,  # [N] global dataset indices
) -> tuple[Array, Array]:
    """uint8 batch -> (normalized float images, encoded target grids),
    augmented, in ONE jitted program.

    With ``sample_ids``, sample i's key is ``fold_in(key, sample_ids[i])``
    — a function of the GLOBAL dataset index, so the draw is invariant to
    batch position and to how the batch is sharded over a mesh (the
    sharded resident loader and the single-device loaders produce
    bit-identical batches for the same sampling order).  Without it, keys
    split positionally (key + batch slot).
    """
    N, M = boxes.shape[0], boxes.shape[1]
    imgs = images_u8.astype(jnp.float32) / 255.0
    valid = jnp.arange(M)[None, :] < counts[:, None]
    if sample_ids is None:
        keys = jax.random.split(key, N)
    else:
        keys = jax.vmap(partial(jax.random.fold_in, key))(sample_ids)
    impl = cfg.warp_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() in ("tpu", "axon") else "band"
    use_pallas = impl == "pallas" and imgs.shape[1] % 8 == 0
    if use_pallas:
        # Batch-level Pallas warp between the vmapped pre/post stages: the
        # whole image stays in VMEM per grid step, so there are no giant
        # gather intermediates and no batch chunking is needed (the band
        # warp's 16.4 GB temp at bs32 is 0.08 GB here, AOT
        # memory_analysis).  Falls back to 'band' when H isn't a sublane
        # multiple (same semantics, both exact 1-D bilinear).
        from yolo_v1_tpu.ops.pallas.warp_kernel import warp_image_band_pallas

        cc_a, cc_b, cr_max = _pallas_warp_bounds(cfg)
        interp = jax.default_backend() not in ("tpu", "axon")

        def aug(keys, imgs, boxes, valid):
            pre = jax.vmap(partial(_augment_pre, cfg=cfg))
            imgs, rs_eff, off_eff, _, xyxy, kpix = pre(keys, imgs, boxes)
            imgs = warp_image_band_pallas(
                imgs, rs_eff, off_eff,
                cc_a=cc_a, cc_b=cc_b, cr_max=cr_max,
                col_chunk=cfg.warp_col_chunk, interpret=interp,
            )
            post = jax.vmap(partial(_augment_post, cfg=cfg))
            return post(kpix, imgs, xyxy, valid)

    else:
        aug = jax.vmap(partial(_augment_one, cfg=cfg))
    bc = 0 if use_pallas else cfg.batch_chunk
    if bc and bc < N and N % bc == 0:
        # Serialize over sub-batches to bound the warp's temp HBM (see
        # DeviceAugmentConfig.batch_chunk); the augment program is
        # bandwidth-bound, so the serialization costs little.
        chunked = (
            imgs.reshape(N // bc, bc, *imgs.shape[1:]),
            keys.reshape(N // bc, bc, *keys.shape[1:]),
            boxes.reshape(N // bc, bc, M, 4),
            valid.reshape(N // bc, bc, M),
        )
        imgs, aug_boxes, aug_valid = jax.lax.map(
            lambda t: aug(t[1], t[0], t[2], t[3]), chunked
        )
        imgs = imgs.reshape(N, *imgs.shape[2:])
        aug_boxes = aug_boxes.reshape(N, M, 4)
        aug_valid = aug_valid.reshape(N, M)
    else:
        imgs, aug_boxes, aug_valid = aug(keys, imgs, boxes, valid)
    imgs = (imgs - IMAGENET_MEAN) / IMAGENET_STD

    # encode_targets takes counts; emulate an arbitrary validity mask by
    # zeroing invalid boxes (zero-sized boxes are dropped by the encoder).
    safe_boxes = jnp.where(aug_valid[..., None], aug_boxes, 0.0)
    targets = encode_targets(
        safe_boxes, labels, jnp.full((N,), M, jnp.int32), S=S, B=B, C=C
    )
    return imgs, targets


def _gather_images(images_all: Array, idx: Array, cfg) -> Array:
    """Row-gather the image tensor per ``cfg.gather_impl`` (see
    DeviceAugmentConfig; indices are loader-validated, in-range).

    ``images_all`` may be rank-4 ``[D, H, W, 3]`` or a FLAT rank-3 layout
    of SQUARE images — canonically the tile-exact ``[D, 8, H*W*3/8]``
    that DeviceResidentLoader uploads.  The flat layout matters at scale
    (two OOMs measured at VOC cardinality, 16,551 448px rows): a rank-4
    dataset costs a 9.93 GB in-program reshape copy, and a ``[D,H,W*3]``
    one costs the same as an input-normalization copy (1344 lanes pad to
    1408 in the XLA tiled layout).  ``[D, 8, 75264]`` has zero layout
    padding -> zero copies (AOT-verified, tools/gather_layout_probe.py).
    Only the gathered BATCH reshapes back to [N, H, W, 3] (H = W =
    sqrt(row/3))."""
    impl = _resolve_gather_impl(cfg.gather_impl)
    if impl == "pallas":
        from yolo_v1_tpu.ops.pallas.gather_kernel import gather_rows_pallas

        interp = jax.default_backend() not in ("tpu", "axon")
        out = gather_rows_pallas(images_all, idx, interpret=interp)
    else:
        out = jnp.take(images_all, idx, axis=0)
    if out.ndim == 3:  # flat resident layout (square images)
        n = out.shape[0]
        total = out.shape[1] * out.shape[2]
        hw = int(round((total // 3) ** 0.5))
        assert hw * hw * 3 == total, out.shape
        out = out.reshape(n, hw, hw, 3)
    return out


@partial(jax.jit, static_argnames=("S", "B", "C", "cfg"))
def gather_augment_encode(
    key: Array,
    images_all: Array,  # [D, H, W, 3] or flat [D, H, W*3] uint8 dataset
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
    HBM-resident dataset tensors, then augment + normalize + encode, one
    jitted program.  Per step only the [N] index vector crosses the
    host->device link.  Augment keys fold in the global dataset index (see
    ``augment_and_encode_batch``).

    The image gather runs per ``cfg.gather_impl``: XLA's whole-row uint8
    gather measured 6.8 ms per 19 MB bs32 batch (~100x off DMA speed);
    the Pallas scalar-prefetch row copy (ops/pallas/gather_kernel.py)
    replaces it with N double-buffered block DMAs.  The small per-sample
    tensors (boxes/labels/counts) stay on jnp.take either way."""
    return augment_and_encode_batch(
        key,
        _gather_images(images_all, idx, cfg),
        jnp.take(boxes_all, idx, axis=0),
        jnp.take(labels_all, idx, axis=0),
        jnp.take(counts_all, idx, axis=0),
        S=S, B=B, C=C, cfg=cfg,
        sample_ids=idx,
    )


def dp_axes_of(mesh) -> tuple[str, ...]:
    """The mesh axes a batch dimension shards over (parallel/mesh
    data_sharding's spec: jointly ('replica', 'data') on hybrid meshes)."""
    return tuple(a for a in ("replica", "data") if a in mesh.axis_names)


@partial(
    jax.jit,
    static_argnames=("mesh", "shard_len", "S", "B", "C", "cfg"),
)
def sharded_gather_augment_encode(
    key: Array,
    images_all: Array,  # [D_pad, H, W, 3] or flat [D_pad, H, W*3], sharded over dp axes
    boxes_all: Array,
    labels_all: Array,
    counts_all: Array,
    idx: Array,  # [N] GLOBAL indices, sharded over dp axes
    *,
    mesh,
    shard_len: int,
    S: int,
    B: int = 2,
    C: int = 20,
    cfg: DeviceAugmentConfig = DeviceAugmentConfig(),
) -> tuple[Array, Array]:
    """Mesh-sharded resident-batch assembly: each data-parallel device
    gathers ONLY from its local ``shard_len``-row block of the resident
    dataset and augments its batch slice locally — zero collective traffic
    in the input pipeline (a plain ``jnp.take`` on a sharded operand would
    make XLA SPMD all-gather the whole dataset).

    The caller guarantees (data/pipeline.epoch_plan with ``shards``) that
    every global index in device d's ``idx`` slice lies inside d's block
    ``[d*shard_len, (d+1)*shard_len)``.  Augment keys fold in the GLOBAL
    index, so the batch is bit-identical to an unsharded gather with the
    same plan (placement invariance; tested in test_pipeline).
    """
    from jax.sharding import PartitionSpec as P

    dp = dp_axes_of(mesh)
    spec = P(dp if len(dp) > 1 else dp[0])

    def local(key, imgs, bxs, lbs, cts, idx_g):
        shard = jax.lax.axis_index(dp[0])
        for a in dp[1:]:
            shard = shard * mesh.shape[a] + jax.lax.axis_index(a)
        li = idx_g - shard * shard_len
        return augment_and_encode_batch(
            key,
            _gather_images(imgs, li, cfg),
            jnp.take(bxs, li, axis=0),
            jnp.take(lbs, li, axis=0),
            jnp.take(cts, li, axis=0),
            S=S, B=B, C=C, cfg=cfg,
            sample_ids=idx_g,
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), spec, spec, spec, spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )(key, images_all, boxes_all, labels_all, counts_all, idx)
