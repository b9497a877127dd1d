"""Pinhole camera model as a JAX pytree.

Replaces the reference's ``DepthSensing/DepthCameraUtil.h :: DepthCameraData/
DepthCameraParams`` (intrinsics + depth<->camera transforms consumed by the
integrate and raycast kernels) and the intrinsics handling in ``RGBDSensor.h``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CameraModel(NamedTuple):
    """Pinhole intrinsics. All fields are scalars (float32) so the pytree is
    trivially shardable/broadcastable; width/height are static Python ints."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    width: int
    height: int

    @staticmethod
    def create(fx: float, fy: float, cx: float, cy: float, width: int, height: int) -> "CameraModel":
        f32 = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return CameraModel(f32(fx), f32(fy), f32(cx), f32(cy), int(width), int(height))

    def scaled(self, new_width: int, new_height: int) -> "CameraModel":
        """Intrinsics for a resampled image (reference: CUDAImageManager resampling
        to the integration/processing resolutions keeps intrinsics in sync)."""
        sx = new_width / self.width
        sy = new_height / self.height
        return CameraModel(
            self.fx * sx, self.fy * sy, self.cx * sx, self.cy * sy, new_width, new_height
        )

    def matrix(self) -> jax.Array:
        k = jnp.stack(
            [
                jnp.stack([self.fx, jnp.zeros_like(self.fx), self.cx]),
                jnp.stack([jnp.zeros_like(self.fy), self.fy, self.cy]),
                jnp.stack([jnp.zeros_like(self.fx), jnp.zeros_like(self.fx), jnp.ones_like(self.fx)]),
            ]
        )
        return k


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

    Points behind the camera are invalid. No rounding — callers bilinearly
    interpolate or floor as needed.
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
