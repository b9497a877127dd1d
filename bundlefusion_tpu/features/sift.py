"""Batched depth-aware SIFT for TPU.

From-scratch TPU-native re-design of the reference's modified SiftGPU
(``FriedLiver/Source/SiftGPU/`` — ``SiftGPU.cpp``, ``SiftPyramid.cpp``,
``ProgramCU.cu``; SURVEY.md §2.1 "SIFT detector/descriptor"): Gaussian/DoG
pyramid, 3x3x3 extremum detection, subpixel refinement, orientation
assignment, 128-D descriptors, and the depth lifting that makes keys 3D
(keys carry the depth needed by the 3D-3D sparse BA term).

TPU-first structure (nothing here is a CUDA translation):
  * The pyramid is a static, unrolled stack of separable blurs — XLA fuses the
    stencil chains; shapes per octave are static.
  * Extremum detection/refinement run *dense* over the DoG stack (pure VPU
    element-wise), then a single `top_k` per octave compacts candidates into
    the fixed key capacity — the mask-and-compact idiom that replaces SiftGPU's
    stream compaction.
  * Orientation histograms and descriptors are computed for all candidates at
    once from a fixed 16x16 resampled window around each key. The descriptor
    is one einsum: static spatial-bin weights [256, 16] x per-sample oriented
    magnitudes [K, 256, 8] -> [K, 128] — MXU work, not scattered atomics.
  * Scale selection uses a "tall image" flattening trick: the per-octave
    Gaussian stack [S, h, w] is addressed as [(S*h), w] with the key's scale
    index folded into the row coordinate, so per-key dynamic scale needs no
    dynamic indexing of arrays — just arithmetic on gather coordinates.

All outputs are fixed-capacity with validity masks (max_keys_per_image).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import BundlingConfig
from ..geometry.camera import CameraModel
from ..ops.preprocess import _shift2d, gaussian_filter


class SiftKeys(NamedTuple):
    """Fixed-capacity per-image keypoint set (rebuild of ``SIFTImageManager``'s
    per-image ``SIFTKeyPoint`` array [H])."""

    xy: jax.Array  # [K, 2] base-image pixel coords (x, y)
    sigma: jax.Array  # [K] scale in base-image pixels
    response: jax.Array  # [K] |DoG| response after refinement
    orientation: jax.Array  # [K] radians
    depth: jax.Array  # [K] associated depth (meters)
    p3d: jax.Array  # [K, 3] camera-space 3D position
    desc: jax.Array  # [K, 128] L2-normalized descriptor
    valid: jax.Array  # [K] bool

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


# ---------------------------------------------------------------------------
# Pyramid
# ---------------------------------------------------------------------------


def _build_octave(base: jax.Array, sigma0: float, num_scales: int) -> jax.Array:
    """Gaussian stack [S+3, h, w] for one octave from its base image (already
    at blur level sigma0)."""
    imgs = [base]
    prev_sigma = sigma0
    for s in range(1, num_scales + 3):
        target = sigma0 * (2.0 ** (s / num_scales))
        inc = math.sqrt(max(target**2 - prev_sigma**2, 1e-6))
        imgs.append(gaussian_filter(imgs[-1], inc))
        prev_sigma = target
    return jnp.stack(imgs, axis=0)


def _downsample2(x: jax.Array) -> jax.Array:
    return x[..., ::2, ::2]


# ---------------------------------------------------------------------------
# Extrema detection (dense) + candidate compaction
# ---------------------------------------------------------------------------


def _extremum_mask(dog: jax.Array, contrast_thresh: float, edge_thresh: float):
    """Dense detection over the DoG stack [D, h, w].

    Returns (mask, refined offsets, refined response) for interior levels
    1..D-2, each [D-2, h, w(, .)].
    """
    d = dog[1:-1]  # center levels
    lo = dog[:-2]
    hi = dog[2:]

    # 3x3x3 neighborhood extrema via SEPARABLE shifted max/min (12 elementwise
    # ops over the stack) instead of materializing 26 shifted copies — same
    # detection up to tie handling: `d == window_max` admits plateau ties the
    # strict version rejected, but ties below the contrast gate are masked and
    # texture ties collapse in the downstream top-k/key dedup.
    neg = jnp.float32(-jnp.inf)
    pos = jnp.float32(jnp.inf)

    def win3(x, op, fill):
        m = op(op(_shift2d(x, 0, -1, fill), x), _shift2d(x, 0, 1, fill))
        m = op(op(_shift2d(m, -1, 0, fill), m), _shift2d(m, 1, 0, fill))
        return m

    mx = win3(dog, jnp.maximum, neg)
    mn = win3(dog, jnp.minimum, pos)
    wmax = jnp.maximum(jnp.maximum(mx[:-2], mx[1:-1]), mx[2:])  # [D-2, h, w]
    wmin = jnp.minimum(jnp.minimum(mn[:-2], mn[1:-1]), mn[2:])
    is_max = d == wmax
    is_min = d == wmin
    mask = (is_max | is_min) & (jnp.abs(d) > 0.8 * contrast_thresh)

    # --- finite-difference gradient & Hessian in (x, y, s) ---
    dx = 0.5 * (_shift2d(d, 0, -1) - _shift2d(d, 0, 1))
    dy = 0.5 * (_shift2d(d, -1, 0) - _shift2d(d, 1, 0))
    ds = 0.5 * (hi - lo)
    dxx = _shift2d(d, 0, -1) + _shift2d(d, 0, 1) - 2 * d
    dyy = _shift2d(d, -1, 0) + _shift2d(d, 1, 0) - 2 * d
    dss = hi + lo - 2 * d
    dxy = 0.25 * (
        _shift2d(d, -1, -1) - _shift2d(d, -1, 1) - _shift2d(d, 1, -1) + _shift2d(d, 1, 1)
    )
    dxs = 0.25 * (
        (_shift2d(hi, 0, -1) - _shift2d(hi, 0, 1))
        - (_shift2d(lo, 0, -1) - _shift2d(lo, 0, 1))
    )
    dys = 0.25 * (
        (_shift2d(hi, -1, 0) - _shift2d(hi, 1, 0))
        - (_shift2d(lo, -1, 0) - _shift2d(lo, 1, 0))
    )

    # edge rejection on the 2x2 spatial Hessian
    tr = dxx + dyy
    det2 = dxx * dyy - dxy * dxy
    r = edge_thresh
    edge_ok = (det2 > 0) & (tr * tr * r < (r + 1) * (r + 1) * det2)

    # solve H @ offset = -g for the symmetric 3x3 (x, y, s) system per pixel.
    # Closed-form adjugate arithmetic (pure VPU elementwise) — batched
    # jnp.linalg.inv would run an LU per pixel, catastrophically slow on TPU.
    c00 = dyy * dss - dys * dys
    c01 = dxs * dys - dxy * dss
    c02 = dxy * dys - dxs * dyy
    c11 = dxx * dss - dxs * dxs
    c12 = dxy * dxs - dxx * dys
    c22 = dxx * dyy - dxy * dxy
    detH = dxx * c00 + dxy * c01 + dxs * c02
    ok_det = jnp.abs(detH) > 1e-12
    inv_det = jnp.where(ok_det, 1.0 / jnp.where(ok_det, detH, 1.0), 0.0)
    off_x = -(c00 * dx + c01 * dy + c02 * ds) * inv_det
    off_y = -(c01 * dx + c11 * dy + c12 * ds) * inv_det
    off_s = -(c02 * dx + c12 * dy + c22 * ds) * inv_det
    offset = jnp.stack([off_x, off_y, off_s], axis=-1)
    offset = jnp.clip(offset, -0.6, 0.6)
    refined = d + 0.5 * (dx * offset[..., 0] + dy * offset[..., 1] + ds * offset[..., 2])
    mask = mask & edge_ok & ok_det & (jnp.abs(refined) > contrast_thresh)
    return mask, offset, refined


# ---------------------------------------------------------------------------
# Orientation + descriptor from fixed resampled windows
# ---------------------------------------------------------------------------

_GRID = 16  # samples per axis for the key window
_NBINS_ORI = 36
_DESC_SPATIAL = 4
_DESC_ORI = 8


@functools.lru_cache(maxsize=None)
def _spatial_weights() -> tuple:
    """Static [256, 16] trilinear spatial-bin weights for the 16x16 descriptor
    grid over 4x4 bins (each bin covers 4x4 samples, bilinear overlap), plus
    the static Gaussian window [256]."""
    import numpy as np

    g = np.arange(_GRID) + 0.5  # sample centers in [0, 16)
    bin_coord = g / (_GRID / _DESC_SPATIAL) - 0.5  # in bin units
    w = np.zeros((_GRID, _DESC_SPATIAL), dtype=np.float32)
    for i, c in enumerate(bin_coord):
        b0 = int(np.floor(c))
        f = c - b0
        if 0 <= b0 < _DESC_SPATIAL:
            w[i, b0] = 1.0 - f
        if 0 <= b0 + 1 < _DESC_SPATIAL:
            w[i, b0 + 1] = f
    wy = w[:, None, :, None]  # [16, 1, 4, 1]
    wx = w[None, :, None, :]  # [1, 16, 1, 4]
    spatial = (wy * wx).reshape(_GRID * _GRID, _DESC_SPATIAL * _DESC_SPATIAL)
    # Gaussian window over the descriptor footprint
    c = (_GRID - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(_GRID), np.arange(_GRID), indexing="ij")
    r2 = ((yy - c) ** 2 + (xx - c) ** 2) / (0.5 * _GRID) ** 2
    gauss = np.exp(-r2 * 2.0).astype(np.float32).reshape(-1)
    # return numpy (NOT jnp): this function is lru_cached, and jnp constants
    # created during a trace would leak tracers across traces
    return spatial, gauss


def _window_coords(xy: jax.Array, sigma: jax.Array, theta: jax.Array, spacing_factor: float):
    """Rotated, scale-adaptive 16x16 sample grid around each key.

    Returns [K, 256, 2] (x, y) coordinates in octave pixels.
    """
    k = xy.shape[0]
    g = jnp.arange(_GRID, dtype=jnp.float32) - (_GRID - 1) / 2.0
    gy, gx = jnp.meshgrid(g, g, indexing="ij")
    grid = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)  # [256, 2]
    spacing = (sigma * spacing_factor)[:, None, None]  # [K,1,1]
    cos = jnp.cos(theta)[:, None]
    sin = jnp.sin(theta)[:, None]
    rx = grid[None, :, 0] * cos - grid[None, :, 1] * sin
    ry = grid[None, :, 0] * sin + grid[None, :, 1] * cos
    rot = jnp.stack([rx, ry], axis=-1)  # [K, 256, 2]
    return xy[:, None, :] + rot * spacing


_PATCH = 64  # per-key patch extent; covers the widest descriptor window


_BLK = 64  # column-block granularity of the patch gather
_PATCH_W = 2 * _BLK  # column extent of block-aligned patches


def _pack_grads(gx: jax.Array, gy: jax.Array) -> jax.Array:
    """Pack two gradient planes into ONE f32 plane of exact integers
    qx*4096 + qy (12 bits each, < 2^24): halves the patch-gather row count.
    Gradients of [0,1] intensity lie in [-0.5, 0.5]; 12-bit quantization
    (~2.4e-4 step) is far below SIFT's own 8-bit descriptor quantization."""
    qx = jnp.clip(jnp.round((gx + 0.5) * 4095.0), 0.0, 4095.0)
    qy = jnp.clip(jnp.round((gy + 0.5) * 4095.0), 0.0, 4095.0)
    return qx * 4096.0 + qy


def _unpack_grads(packed: jax.Array) -> tuple[jax.Array, jax.Array]:
    qx = jnp.floor(packed * (1.0 / 4096.0))
    qy = packed - qx * 4096.0
    inv = 1.0 / 4095.0
    return qx * inv - 0.5, qy * inv - 0.5


def _extract_patches(tall: jax.Array, x0a: jax.Array, row0: jax.Array) -> jax.Array:
    """Gather [K] patches [_PATCH, _PATCH_W] from the tall image in ONE
    batched gather of 64-wide column blocks.

    Gathers are slice-count-bound on TPU: a vmapped ``dynamic_slice`` lowers
    to a sequential per-key loop (measured ~38 ms/chunk at 640x480), and a
    row-blocked gather of K*P*2 thin 64-element rows still paid ~15 ms/chunk.
    Viewing the tall image as [Ht, nb, 64] column blocks makes each key's
    whole patch ONE contiguous (P, 2, 64) lax.gather slice — K slices total,
    ~2x faster, and the output needs no transpose (the minor [2, 64] -> [128]
    merge is a free reinterpretation). ``x0a`` must be 64-aligned with
    x0a//64 + 2 <= nb (the caller's clamp guarantees it).
    """
    ht, w = tall.shape
    nb = w // _BLK
    k = x0a.shape[0]
    t3 = tall.reshape(ht, nb, _BLK)
    starts = jnp.stack([row0, x0a // _BLK], axis=1)  # [K, 2]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    g = jax.lax.gather(
        t3, starts, dn, slice_sizes=(_PATCH, _PATCH_W // _BLK, _BLK), mode="clip"
    )  # [K, P, 2, 64]
    return g.reshape(k, _PATCH, _PATCH_W)


def _sample_in_patches(patches: jax.Array, lx: jax.Array, ly: jax.Array) -> jax.Array:
    """Bilinear sampling inside per-key patches as tent-weight contractions.

    patches [K, Pr, Pc]; lx/ly [K, S] patch-local float coords. Returns
    [K, S]. On TPU this is MXU work (two small matmuls per key) instead of 4S
    random gathers per key — the same separable-tent trick as
    ``preprocess.bilinear_sample_matmul``.

    Precision note: a bf16 variant of these contractions was tried and
    REVERTED — it saved ~nothing (the stage is bound elsewhere; the patch
    gather was the real cost, see ``_extract_patches``) and the ~0.4%
    gradient error measurably degraded small-image tracking (corrupt-chunk
    recovery ATE 2x over threshold).
    """
    pr = patches.shape[-2]
    pc = patches.shape[-1]
    ty = jnp.maximum(
        0.0, 1.0 - jnp.abs(ly[..., None] - jnp.arange(pr, dtype=patches.dtype))
    )  # [K, S, Pr]
    tx = jnp.maximum(
        0.0, 1.0 - jnp.abs(lx[..., None] - jnp.arange(pc, dtype=patches.dtype))
    )  # [K, S, Pc]
    tmp = jnp.einsum("ksp,kpq->ksq", ty, patches, precision="high")
    return jnp.einsum("ksq,ksq->ks", tmp, tx, precision="high")


def _gather_grads_patches(
    patches_x: jax.Array,  # [K, P, Pw] gx patches
    patches_y: jax.Array,  # [K, P, Pw] gy patches
    coords: jax.Array,  # [K, S, 2] octave coords
    x0: jax.Array,  # [K] patch origins (octave x, 32-aligned)
    y0: jax.Array,  # [K] patch origins (octave y, within-level)
    h: int,
    w: int,
):
    """Sample both gradient images at window coords. Returns (gx, gy, mask)."""
    x = coords[..., 0]
    y = coords[..., 1]
    inb = (x >= 0.0) & (x <= w - 1.001) & (y >= 0.0) & (y <= h - 1.001)
    lx = jnp.clip(x - x0[:, None].astype(x.dtype), 0.0, _PATCH_W - 1.001)
    ly = jnp.clip(y - y0[:, None].astype(y.dtype), 0.0, _PATCH - 1.001)
    # samples whose coords fall outside the extracted patch are masked anyway
    # (the patch covers the full window except for keys clamped at borders)
    in_patch = (
        (x - x0[:, None] >= 0)
        & (x - x0[:, None] < _PATCH_W - 1)
        & (y - y0[:, None] >= 0)
        & (y - y0[:, None] < _PATCH - 1)
    )
    gx = _sample_in_patches(patches_x, lx, ly)
    gy = _sample_in_patches(patches_y, lx, ly)
    return gx, gy, inb & in_patch


def _orientation_and_desc(
    g_tall: jax.Array,  # packed gradient plane (see _pack_grads)
    xy_oct: jax.Array,  # [K, 2] octave coords
    sigma_oct: jax.Array,  # [K] octave-scale sigma
    scale_idx: jax.Array,  # [K] int index into the gaussian stack rows
    h: int,
    w: int,
):
    """Dominant orientation then rotated 128-D descriptor for each key."""
    spatial, gauss_w = _spatial_weights()

    # --- one patch per key (reused by both windows): block-gather from the
    # packed tall gradient stack at (scale row, aligned window origin) ---
    xi = jnp.round(xy_oct[:, 0]).astype(jnp.int32)
    yi = jnp.round(xy_oct[:, 1]).astype(jnp.int32)
    x0 = jnp.clip(xi - _PATCH // 2, 0, max(w - _PATCH, 0))
    # align column origins down to the block grid (the patch's extra block of
    # coverage absorbs the shift)
    x0 = (x0 // _BLK) * _BLK
    y0 = jnp.clip(yi - _PATCH // 2, 0, max(h - _PATCH, 0))
    row0 = scale_idx * h + y0
    patches_x, patches_y = _unpack_grads(_extract_patches(g_tall, x0, row0))

    # --- orientation: unrotated window, 36-bin histogram ---
    coords = _window_coords(xy_oct, sigma_oct, jnp.zeros_like(sigma_oct), spacing_factor=0.4)
    gx, gy, m = _gather_grads_patches(patches_x, patches_y, coords, x0, y0, h, w)
    mag = jnp.sqrt(gx * gx + gy * gy) * m * gauss_w[None, :]
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]
    binf = (ang + jnp.pi) / (2 * jnp.pi) * _NBINS_ORI
    b0 = jnp.floor(binf)
    f = binf - b0
    b0i = b0.astype(jnp.int32) % _NBINS_ORI
    b1i = (b0i + 1) % _NBINS_ORI
    onehot0 = jax.nn.one_hot(b0i, _NBINS_ORI, dtype=mag.dtype)
    onehot1 = jax.nn.one_hot(b1i, _NBINS_ORI, dtype=mag.dtype)
    hist = jnp.einsum("ks,ksb->kb", mag * (1 - f), onehot0) + jnp.einsum(
        "ks,ksb->kb", mag * f, onehot1
    )
    # circular smoothing x2
    for _ in range(2):
        hist = (jnp.roll(hist, 1, axis=-1) + hist + jnp.roll(hist, -1, axis=-1)) / 3.0
    peak = jnp.argmax(hist, axis=-1)
    hp = jnp.take_along_axis(hist, peak[:, None], axis=-1)[:, 0]
    hl = jnp.take_along_axis(hist, ((peak - 1) % _NBINS_ORI)[:, None], axis=-1)[:, 0]
    hr = jnp.take_along_axis(hist, ((peak + 1) % _NBINS_ORI)[:, None], axis=-1)[:, 0]
    denom = hl - 2 * hp + hr
    interp = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (hl - hr) / denom, 0.0)
    theta = ((peak.astype(jnp.float32) + 0.5 + interp) / _NBINS_ORI) * 2 * jnp.pi - jnp.pi

    # --- descriptor: rotated window ---
    coords_d = _window_coords(xy_oct, sigma_oct, theta, spacing_factor=0.75)
    gx, gy, m = _gather_grads_patches(patches_x, patches_y, coords_d, x0, y0, h, w)
    mag = jnp.sqrt(gx * gx + gy * gy) * m * gauss_w[None, :]
    ang = jnp.arctan2(gy, gx) - theta[:, None]
    binf = (ang / (2 * jnp.pi)) * _DESC_ORI
    b0 = jnp.floor(binf)
    f = binf - b0
    b0i = b0.astype(jnp.int32) % _DESC_ORI
    b1i = (b0i + 1) % _DESC_ORI
    orient = jax.nn.one_hot(b0i, _DESC_ORI, dtype=mag.dtype) * (1 - f)[..., None] + jax.nn.one_hot(
        b1i, _DESC_ORI, dtype=mag.dtype
    ) * f[..., None]  # [K, 256, 8]
    weighted = orient * mag[..., None]  # [K, 256, 8]
    # THE descriptor contraction (MXU): [K, 256, 8] x [256, 16] -> [K, 16, 8]
    desc = jnp.einsum(
        "kso,sb->kbo", weighted, spatial, precision="high"
    ).reshape(-1, 128)
    # SIFT normalization: L2 -> clip 0.2 -> L2
    n1 = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-9)
    desc = jnp.clip(desc / n1, 0.0, 0.2)
    n2 = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-9)
    desc = desc / n2
    return theta, desc


# ---------------------------------------------------------------------------
# Full per-image detection
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("cam", "cfg")
)
def detect_and_describe(
    intensity: jax.Array,  # [H, W] float32
    depth: jax.Array,  # [H, W] float32 (0 invalid)
    cam: CameraModel,
    cfg: BundlingConfig,
) -> SiftKeys:
    """SIFT keypoints + descriptors + depth lifting for one frame.

    vmap over a leading frame axis for batched detection (the reference runs
    SiftGPU once per frame; here a whole chunk is one fused program).
    """
    num_scales = cfg.sift_scales_per_octave
    sigma0 = cfg.sift_sigma
    k_cap = cfg.max_keys_per_image

    # assumed base blur of the input image
    base = gaussian_filter(intensity, math.sqrt(sigma0**2 - 0.5**2))

    per_octave = []
    for o in range(cfg.sift_octaves):
        h, w = base.shape
        if h < 16 or w < 16:
            break
        gauss = _build_octave(base, sigma0, num_scales)  # [S+3, h, w]
        dog = gauss[1:] - gauss[:-1]  # [S+2, h, w]
        mask, offset, refined = _extremum_mask(
            dog, cfg.sift_contrast_thresh, cfg.sift_edge_thresh
        )
        # exclude borders
        border = 5
        by = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
        bx = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 2)
        mask = mask & (by >= border) & (by < h - border) & (bx >= border) & (bx < w - border)

        score = jnp.where(mask, jnp.abs(refined), -1.0)
        flat_score = score.reshape(-1)
        top_scores, top_idx = jax.lax.top_k(flat_score, k_cap)
        sel_valid = top_scores > 0.0
        d_hw = mask.shape[1] * mask.shape[2]
        s_idx = top_idx // d_hw
        yx = top_idx % d_hw
        y_idx = yx // w
        x_idx = yx % w
        off = offset.reshape(-1, 3)[top_idx]  # (dx, dy, ds)
        x_oct = x_idx.astype(jnp.float32) + off[:, 0]
        y_oct = y_idx.astype(jnp.float32) + off[:, 1]
        s_cont = s_idx.astype(jnp.float32) + 1.0 + off[:, 2]  # DoG level in stack units
        sigma_oct = sigma0 * (2.0 ** (s_cont / num_scales))

        # gradients of the gaussian stack for orientation/descriptor; use the
        # integer gaussian level nearest the key's scale
        g_stack = gauss[1 : num_scales + 1 + 1]  # levels 1..S+1 usable
        gxs = 0.5 * (_shift2d(g_stack, 0, -1) - _shift2d(g_stack, 0, 1))
        gys = 0.5 * (_shift2d(g_stack, -1, 0) - _shift2d(g_stack, 1, 0))
        # pack both gradient planes into one tall (halves the patch-gather
        # rows), pad _PATCH zero rows so gathers never run off the end, and
        # pad columns to a block multiple wide enough for the widest aligned
        # patch (x0 <= w - _PATCH aligned down, + _PATCH_W)
        wp = max(-(-(w + _BLK) // _BLK) * _BLK, _PATCH_W)
        g_tall = jnp.pad(
            _pack_grads(gxs, gys).reshape(-1, w), ((0, _PATCH), (0, wp - w))
        )
        scale_row = jnp.clip(jnp.round(s_cont - 1.0).astype(jnp.int32), 0, g_stack.shape[0] - 1)

        theta, desc = _orientation_and_desc(
            g_tall,
            jnp.stack([x_oct, y_oct], axis=-1), sigma_oct, scale_row, h, w,
        )

        factor = 2.0**o
        per_octave.append(
            dict(
                xy=jnp.stack([x_oct, y_oct], axis=-1) * factor,
                sigma=sigma_oct * factor,
                response=jnp.where(sel_valid, top_scores, -1.0),
                theta=theta,
                desc=desc,
                valid=sel_valid,
            )
        )
        base = _downsample2(gauss[num_scales])

    # --- merge octaves, keep global top-K ---
    cat = lambda f: jnp.concatenate([p[f] for p in per_octave], axis=0)
    all_resp = cat("response")
    top_resp, pick = jax.lax.top_k(all_resp, k_cap)
    xy = cat("xy")[pick]
    sigma = cat("sigma")[pick]
    theta = cat("theta")[pick]
    desc = cat("desc")[pick]
    valid = top_resp > 0.0

    # --- depth lifting (keys must have valid depth; reference SiftGPU carries
    # depth per key for the 3D-3D correspondence term) ---
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, cam.width - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, cam.height - 1)
    d = depth[yi, xi]
    # reject keys on depth discontinuities (silhouettes): nearest-pixel depth is
    # unreliable there and poisons the 3D-3D term
    d3_min = depth
    d3_max = depth
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            n = _shift2d(depth, dy, dx)
            d3_min = jnp.minimum(d3_min, jnp.where(n > 0, n, jnp.inf))
            d3_max = jnp.maximum(d3_max, n)
    # absolute threshold: oblique-but-continuous surfaces (floors at grazing
    # angle) have window ranges of ~0.1 m at low res; silhouette jumps are >>
    smooth = (d3_max[yi, xi] - d3_min[yi, xi]) < 0.25
    d_ok = (d > cfg.sift_depth_min) & (d < cfg.sift_depth_max) & smooth
    valid = valid & d_ok
    z = jnp.where(d_ok, d, 0.0)
    p3d = jnp.stack(
        [
            (xy[:, 0] - cam.cx) / cam.fx * z,
            (xy[:, 1] - cam.cy) / cam.fy * z,
            z,
        ],
        axis=-1,
    )
    return SiftKeys(
        xy=jnp.where(valid[:, None], xy, 0.0),
        sigma=jnp.where(valid, sigma, 0.0),
        response=jnp.where(valid, top_resp, 0.0),
        orientation=jnp.where(valid, theta, 0.0),
        depth=z * valid,
        p3d=jnp.where(valid[:, None], p3d, 0.0),
        desc=jnp.where(valid[:, None], desc, 0.0),
        valid=valid,
    )


def detect_batch(
    intensity: jax.Array,  # [N, H, W]
    depth: jax.Array,  # [N, H, W]
    cam: CameraModel,
    cfg: BundlingConfig,
) -> SiftKeys:
    """Batched detection over a frame stack; one compiled program per shape."""
    fn = jax.vmap(lambda i, d: detect_and_describe(i, d, cam, cfg))
    return fn(intensity, depth)
