"""Frame preprocessing: the TPU equivalent of the reference's GPU image ops.

Replaces ``FriedLiver/Source/CUDAImageUtil.h/.cu`` kernels (bilateral depth
filter, depth->camera-space points, normal estimation, color->intensity,
resampling, intensity gradients) driven by ``CUDAImageManager`` (SURVEY.md
§2.1 "Frame manager"). Everything is expressed as fused XLA ops over whole
frame *batches* — `vmap` over the frame axis replaces the per-pixel CUDA grid,
and XLA fuses the stencils into a handful of HBM passes.

All functions take [..., H, W] (or [..., H, W, C]) and broadcast over leading
axes. Invalid depth is encoded as 0; masks are carried implicitly by that
convention (matching the reference's MINF-for-invalid convention [M]).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import CameraModel, unproject


def _shift2d(x: jax.Array, dy: int, dx: int, fill: float = 0.0) -> jax.Array:
    """Shift the last two axes by (dy, dx), filling vacated pixels."""
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [
        (max(dy, 0), max(-dy, 0)),
        (max(dx, 0), max(-dx, 0)),
    ]
    xp = jnp.pad(x, pad, constant_values=fill)
    ys = max(-dy, 0)
    xs = max(-dx, 0)
    return jax.lax.slice(
        xp,
        [0] * (x.ndim - 2) + [ys, xs],
        list(x.shape[:-2]) + [ys + h, xs + w],
    )


def bilateral_filter_depth(
    depth: jax.Array,
    sigma_d: float = 2.0,
    sigma_r: float = 0.1,
    radius: int = 3,
) -> jax.Array:
    """Edge-preserving depth smoothing (CUDAImageUtil ``bilateralFilterFloatMap``).

    Zero/invalid depth contributes nothing and stays invalid. The window is a
    static (2r+1)^2 unrolled stencil — XLA fuses the whole thing into one pass.
    """
    valid = depth > 0.0
    acc = jnp.zeros_like(depth)
    wacc = jnp.zeros_like(depth)
    inv_2sd2 = 1.0 / (2.0 * sigma_d * sigma_d)
    inv_2sr2 = 1.0 / (2.0 * sigma_r * sigma_r)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            d_n = _shift2d(depth, dy, dx)
            v_n = d_n > 0.0
            w_spatial = jnp.exp(-(dy * dy + dx * dx) * inv_2sd2)
            diff = d_n - depth
            w_range = jnp.exp(-(diff * diff) * inv_2sr2)
            w = jnp.where(v_n & valid, w_spatial * w_range, 0.0)
            acc = acc + w * d_n
            wacc = wacc + w
    out = jnp.where(wacc > 1e-8, acc / jnp.maximum(wacc, 1e-8), 0.0)
    return jnp.where(valid, out, 0.0)


def gaussian_filter(x: jax.Array, sigma: float, radius: int | None = None) -> jax.Array:
    """Separable Gaussian blur over the last two axes (used by the SIFT pyramid
    and intensity smoothing; CUDAImageUtil ``gaussFilterFloatMap`` [M]).

    Implemented as two `lax.conv` passes (zero padding): one fused op per
    axis keeps the XLA graph small (the SIFT pyramid builds ~18 of these per
    frame) and maps onto the TPU's convolution path instead of a [2r+1]-term
    unrolled shift-add chain.
    """
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    h, w = x.shape[-2:]
    # banded Gaussian matrices: y = G_h @ x @ G_w^T. Single-channel convs use
    # ~1/128th of the MXU; these dense [H,H]/[W,W] matmuls use all of it and
    # give identical zero-padded-boundary math.
    gh = _gauss_band_matrix(h, sigma, radius, x.dtype)
    gw = _gauss_band_matrix(w, sigma, radius, x.dtype)
    # 3-pass bf16 ('high') matmuls: ~1e-6 relative error on blur weights,
    # half the MXU passes of the package-default f32-exact mode
    out = jnp.einsum("hk,...kw->...hw", gh, x, precision="high")
    out = jnp.einsum("...hw,kw->...hk", out, gw, precision="high")
    return out


@functools.lru_cache(maxsize=None)
def _gauss_band_np(n: int, sigma: float, radius: int):
    import numpy as np

    idx = np.arange(n)
    diff = idx[None, :] - idx[:, None]
    k = np.exp(-(np.arange(-radius, radius + 1) ** 2) / (2.0 * sigma * sigma))
    k = k / k.sum()
    g = np.where(np.abs(diff) <= radius, k[np.clip(diff + radius, 0, 2 * radius)], 0.0)
    return g.astype(np.float32)  # numpy: lru_cache must not hold traced values


def _gauss_band_matrix(n: int, sigma: float, radius: int, dtype) -> jax.Array:
    return jnp.asarray(_gauss_band_np(n, float(sigma), int(radius)), dtype=dtype)


def color_to_intensity(color: jax.Array) -> jax.Array:
    """[..., H, W, 3] RGB -> [..., H, W] luminance (``convertColorToIntensityFloat``)."""
    w = jnp.array([0.299, 0.587, 0.114], dtype=color.dtype)
    return jnp.einsum("...c,c->...", color, w)


def compute_normals(points: jax.Array) -> jax.Array:
    """Camera-space normals from the point map via central differences.

    [..., H, W, 3] -> [..., H, W, 3]; zero where neighbors are invalid.
    (CUDAImageUtil ``computeNormals``.) Normals point toward the camera
    (negative z hemisphere in camera space).
    """
    right = _shift2d(jnp.moveaxis(points, -1, -3), 0, -1)
    left = _shift2d(jnp.moveaxis(points, -1, -3), 0, 1)
    down = _shift2d(jnp.moveaxis(points, -1, -3), -1, 0)
    up = _shift2d(jnp.moveaxis(points, -1, -3), 1, 0)
    dx = jnp.moveaxis(right - left, -3, -1)
    dy = jnp.moveaxis(down - up, -3, -1)
    n = jnp.cross(dy, dx)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    valid = (
        (jnp.moveaxis(right, -3, -1)[..., 2] > 0)
        & (jnp.moveaxis(left, -3, -1)[..., 2] > 0)
        & (jnp.moveaxis(down, -3, -1)[..., 2] > 0)
        & (jnp.moveaxis(up, -3, -1)[..., 2] > 0)
        & (norm[..., 0] > 1e-9)
    )
    n = jnp.where(valid[..., None], n / jnp.maximum(norm, 1e-9), 0.0)
    # orient toward camera: camera looks along +z, so n.z must be negative
    flip = jnp.where(n[..., 2:3] > 0.0, -1.0, 1.0)
    return n * flip


def image_gradients(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Central-difference gradients (gx, gy) of [..., H, W] intensity."""
    gx = 0.5 * (_shift2d(x, 0, -1) - _shift2d(x, 0, 1))
    gy = 0.5 * (_shift2d(x, -1, 0) - _shift2d(x, 1, 0))
    return gx, gy


def downsample_depth(depth: jax.Array, factor_h: int, factor_w: int) -> jax.Array:
    """Valid-aware block-mean depth downsample (``resampleFloatMap`` analog).

    Averaging only valid pixels avoids bleeding the 0-invalid marker into
    depth values at boundaries.
    """
    *lead, h, w = depth.shape
    d = depth.reshape(*lead, h // factor_h, factor_h, w // factor_w, factor_w)
    valid = (d > 0.0).astype(depth.dtype)
    s = jnp.sum(d * valid, axis=(-3, -1))
    c = jnp.sum(valid, axis=(-3, -1))
    return jnp.where(c > 0, s / jnp.maximum(c, 1.0), 0.0)


def downsample_mean(x: jax.Array, factor_h: int, factor_w: int) -> jax.Array:
    """Plain block-mean downsample for intensity/color channels."""
    *lead, h, w = x.shape
    d = x.reshape(*lead, h // factor_h, factor_h, w // factor_w, factor_w)
    return jnp.mean(d, axis=(-3, -1))


class FrameCache(NamedTuple):
    """Downsampled per-frame geometry cache for dense BA & dense verification.

    The rebuild of ``CUDACache``/``CUDACachedFrame`` (SURVEY.md §2.1): one
    plain [N, h, w(, C)] array per field, trivially vmappable/shardable over
    the frame axis; the dense solver and the dense-verify filter gather from
    it with projective associations.
    """

    depth: jax.Array  # [N, h, w] float32 meters, 0 invalid
    points: jax.Array  # [N, h, w, 3] camera-space positions
    normals: jax.Array  # [N, h, w, 3]
    intensity: jax.Array  # [N, h, w] float32
    grad: jax.Array  # [N, h, w, 2] intensity gradients (gx, gy)

    @property
    def num_frames(self) -> int:
        return self.depth.shape[0]


class ProcessedFrames(NamedTuple):
    """Full-resolution per-frame products (the ``CUDAImageManager`` outputs)."""

    depth: jax.Array  # [N, H, W] filtered depth
    points: jax.Array  # [N, H, W, 3]
    normals: jax.Array  # [N, H, W, 3]
    intensity: jax.Array  # [N, H, W]
    color: jax.Array  # [N, H, W, 3] (pass-through for TSDF coloring)


@functools.partial(jax.jit, static_argnames=("cam", "cache_cam", "filter_depth"))
def preprocess_frames(
    depth_raw: jax.Array,  # [N, H, W]
    color: jax.Array,  # [N, H, W, 3]
    cam: CameraModel,
    cache_cam: CameraModel,
    sigma_d: float = 2.0,
    sigma_r: float = 0.1,
    filter_depth: bool = True,
) -> tuple[ProcessedFrames, FrameCache]:
    """One fused preprocessing step for a batch of frames.

    Produces the full-res products used by TSDF integration and SIFT, plus the
    downsampled FrameCache used by dense BA / dense verify. The entire batch
    is one XLA computation: the CUDA version's 6 kernel launches per frame
    fuse into a few HBM passes here.
    """
    intensity = color_to_intensity(color)
    return _preprocess_core(
        depth_raw, intensity, color, cam, cache_cam, sigma_d, sigma_r, filter_depth
    )


@functools.partial(jax.jit, static_argnames=("cam", "cache_cam", "filter_depth"))
def preprocess_frames_y(
    depth_raw: jax.Array,  # [N, H, W] f32 meters or uint16 mm wire
    y8: jax.Array,  # [N, H, W] uint8 luma wire (or f32 intensity)
    cam: CameraModel,
    cache_cam: CameraModel,
    sigma_d: float = 2.0,
    sigma_r: float = 0.1,
    filter_depth: bool = True,
) -> tuple[ProcessedFrames, FrameCache]:
    """`preprocess_frames` for the v2 wire: intensity arrives as a LUMA plane
    (uint8, computed host-side by framewire) instead of full RGB — the
    bundling pipeline consumes no color, so none is shipped to it. The
    returned ProcessedFrames.color is a zero placeholder (nothing in the
    chunk path reads it; TSDF coloring dequantizes the half-res color wire
    from the history ring instead)."""
    if depth_raw.dtype == jnp.uint16:
        depth_raw = depth_raw.astype(jnp.float32) * 1e-3
    intensity = (
        y8.astype(jnp.float32) * (1.0 / 255.0) if y8.dtype == jnp.uint8 else y8
    )
    # [N,1,1,3] placeholder: jit outputs are never DCE'd, and a full-size
    # zeros plane would cost a 40 MB HBM fill per chunk for a field nothing
    # in the chunk path reads
    color = jnp.zeros((intensity.shape[0], 1, 1, 3), jnp.float32)
    return _preprocess_core(
        depth_raw, intensity, color, cam, cache_cam, sigma_d, sigma_r, filter_depth
    )


def _preprocess_core(
    depth_raw, intensity, color, cam, cache_cam, sigma_d, sigma_r, filter_depth
):
    depth = jnp.where(
        (depth_raw > 0.0) & jnp.isfinite(depth_raw), depth_raw, 0.0
    )
    if filter_depth:
        depth = bilateral_filter_depth(depth, sigma_d, sigma_r)
    points = unproject(cam, depth)
    normals = compute_normals(points)

    fh = cam.height // cache_cam.height
    fw = cam.width // cache_cam.width
    assert fh >= 1 and fw >= 1, "cache resolution must divide the frame resolution"
    d_lo = downsample_depth(depth, fh, fw)
    p_lo = unproject(cache_cam, d_lo)
    n_lo = compute_normals(p_lo)
    i_lo = downsample_mean(intensity, fh, fw)
    # smooth intensity slightly before differentiating (photometric term stability)
    i_lo_s = gaussian_filter(i_lo, 0.8, radius=2)
    gx, gy = image_gradients(i_lo_s)
    cache = FrameCache(
        depth=d_lo,
        points=p_lo,
        normals=n_lo,
        intensity=i_lo_s,
        grad=jnp.stack([gx, gy], axis=-1),
    )
    return ProcessedFrames(depth, points, normals, intensity, color), cache


def bilinear_sample(img: jax.Array, uv: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Bilinear interpolation of [H, W(, C)] at uv [..., 2] (u=x, v=y).

    Returns (values [..., (C)], in-bounds mask [...]). The workhorse gather for
    projective data association (dense BA term + dense verify), replacing the
    reference's texture fetches.
    """
    h, w = img.shape[0], img.shape[1]
    u, v = uv[..., 0], uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    inb = (u0i >= 0) & (u0i < w - 1) & (v0i >= 0) & (v0i < h - 1)
    u0c = jnp.clip(u0i, 0, w - 2)
    v0c = jnp.clip(v0i, 0, h - 2)

    def gather(yy, xx):
        return img[yy, xx]

    x00 = gather(v0c, u0c)
    x01 = gather(v0c, u0c + 1)
    x10 = gather(v0c + 1, u0c)
    x11 = gather(v0c + 1, u0c + 1)
    if img.ndim == 3:
        du = du[..., None]
        dv = dv[..., None]
    val = (
        x00 * (1 - du) * (1 - dv)
        + x01 * du * (1 - dv)
        + x10 * (1 - du) * dv
        + x11 * du * dv
    )
    return val, inb


def bilinear_sample_matmul(img: jax.Array, uv: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Bilinear sampling of [H, W, C] at uv [D, 2] as two MXU matmuls.

    Mathematically identical to :func:`bilinear_sample` (with border clamp),
    but expressed as separable 1-D tent-weight contractions:

        val[d] = sum_h sum_w tent(v_d - h) tent(u_d - w) I[h, w]
               = (Tv @ I)[d] . Tu[d]      with Tv [D, H], Tu [D, W]

    On TPU this replaces a serialized dynamic gather with dense matmul work —
    the projective-association inner loop of the dense BA term and the dense
    verify filter are built on it (SURVEY.md §2.1 "BA kernels": 'projective
    data association ... via warp reductions' becomes MXU contractions).
    Cost: D*H*W MACs per channel — tiny against the MXU at cache resolutions.
    """
    h, w = img.shape[0], img.shape[1]
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    u = uv[..., 0]
    v = uv[..., 1]
    inb = (u >= 0.0) & (u < w - 1.0 + 1e-4) & (v >= 0.0) & (v < h - 1.0 + 1e-4)
    uc = jnp.clip(u, 0.0, w - 1.001)
    vc = jnp.clip(v, 0.0, h - 1.001)
    hh = jnp.arange(h, dtype=img.dtype)
    ww = jnp.arange(w, dtype=img.dtype)
    tv = jnp.maximum(0.0, 1.0 - jnp.abs(vc[:, None] - hh[None, :]))  # [D, H]
    tu = jnp.maximum(0.0, 1.0 - jnp.abs(uc[:, None] - ww[None, :]))  # [D, W]
    # 3-pass bf16 contraction: exact-enough (~1e-6 rel) for association
    # and verification at half the MXU passes of the f32-exact default
    tmp = jnp.einsum("dh,hwc->dwc", tv, img, precision="high")  # [D, W, C]
    val = jnp.einsum("dwc,dw->dc", tmp, tu, precision="high")  # [D, C]
    if squeeze:
        val = val[..., 0]
    return val, inb


def nearest_sample(img: jax.Array, uv: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Nearest-neighbor sample of [H, W(, C)] at uv [..., 2] -> (values, mask)."""
    h, w = img.shape[0], img.shape[1]
    ui = jnp.round(uv[..., 0]).astype(jnp.int32)
    vi = jnp.round(uv[..., 1]).astype(jnp.int32)
    inb = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
    uc = jnp.clip(ui, 0, w - 1)
    vc = jnp.clip(vi, 0, h - 1)
    return img[vc, uc], inb
