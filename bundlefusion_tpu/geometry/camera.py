"""Pinhole camera model.

Replaces the reference's ``DepthSensing/DepthCameraUtil.h :: DepthCameraData/
DepthCameraParams`` (intrinsics + depth<->camera transforms consumed by the
integrate and raycast kernels) and the intrinsics handling in ``RGBDSensor.h``.

Intrinsics are *static* (plain Python floats/ints, hashable): they are
per-sequence constants, so we bake them into each compiled XLA program as
immediates instead of threading them through as traced arrays — fewer traced
operands, and scalar folding happens at compile time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CameraModel(NamedTuple):
    """Static pinhole intrinsics; usable as a `jit` static argument."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    @staticmethod
    def create(fx, fy, cx, cy, width: int, height: int) -> "CameraModel":
        return CameraModel(float(fx), float(fy), float(cx), float(cy), int(width), int(height))

    def scaled(self, new_width: int, new_height: int) -> "CameraModel":
        """Intrinsics for a resampled image (reference: CUDAImageManager keeps
        intrinsics in sync when resampling to the integration resolution)."""
        sx = new_width / self.width
        sy = new_height / self.height
        return CameraModel(
            self.fx * sx, self.fy * sy, self.cx * sx, self.cy * sy, new_width, new_height
        )

    def matrix(self) -> jax.Array:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )


def unproject(cam: CameraModel, depth: jax.Array) -> jax.Array:
    """Depth image [..., H, W] -> camera-space points [..., H, W, 3].

    Invalid depth (<= 0 or non-finite) yields zero points; callers carry a mask.
    Mirrors ``CUDAImageUtil.cu :: convertDepthFloatToCameraSpaceFloat4`` [M].
    """
    h, w = depth.shape[-2], depth.shape[-1]
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    z = depth
    x = (u - cam.cx) / cam.fx * z
    y = (v - cam.cy) / cam.fy * z
    pts = jnp.stack([x, y, z], axis=-1)
    valid = jnp.isfinite(z) & (z > 0.0)
    return jnp.where(valid[..., None], pts, 0.0)


def project(cam: CameraModel, points: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Camera-space points [..., 3] -> pixel coords [..., 2] (u, v) and validity.

    Points behind the camera or outside the image are invalid. No rounding —
    callers bilinearly interpolate or floor as needed.
    """
    z = points[..., 2]
    valid = z > 1e-6
    zsafe = jnp.where(valid, z, 1.0)
    u = points[..., 0] / zsafe * cam.fx + cam.cx
    v = points[..., 1] / zsafe * cam.fy + cam.cy
    uv = jnp.stack([u, v], axis=-1)
    inside = (
        (u >= 0.0) & (u <= cam.width - 1.0) & (v >= 0.0) & (v <= cam.height - 1.0)
    )
    return uv, valid & inside
