"""Synthetic RGB-D sequence generator with exact ground-truth poses.

The reference is exercised on recorded ``.sens`` sequences (apt0/office...) that
are not redistributable; for unit/integration tests and benchmarks we instead
render depth+color from an analytic SDF scene by sphere tracing — giving every
oracle the reference never had: exact poses, exact geometry, exact photometry.
(SURVEY.md §7 "Minimum end-to-end slice".)

The scene is a textured room: floor + two walls + sphere + box, with a
high-frequency procedural albedo so SIFT finds corners and the photometric BA
term has gradients. Rendering is jitted JAX (runs on CPU for tests, TPU for
bench).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import CameraModel


class SyntheticSequence(NamedTuple):
    depth: np.ndarray  # [N, H, W] float32 meters (0 = invalid)
    color: np.ndarray  # [N, H, W, 3] float32 in [0, 1]
    poses: np.ndarray  # [N, 4, 4] float32 camera-to-world
    camera: CameraModel
    timestamps: np.ndarray  # [N] float64 seconds


def _host_render(render, poses: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Run the (vmapped, jitted) renderer on the CPU backend and return numpy.

    Rendering on the accelerator would require a large device->host readback
    of the finished frames; on this machine's tunneled TPU the FIRST such
    readback permanently drops the tunnel's host->device path out of its fast
    mode (measured: ~2 GB/s before any D2H, ~40 MB/s after — for the life of
    the process). Since synthetic data generation always precedes a pipeline
    run in the same process, rendering stays on CPU so the run that follows
    keeps full-speed uploads.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        depth, color = render(jnp.asarray(poses))
        return np.asarray(depth), np.asarray(color)


def scene_sdf(p: jax.Array) -> jax.Array:
    """Analytic signed distance of the test scene at world points [..., 3]."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    d_floor = y + 1.0  # floor at y = -1
    d_back = 3.5 - z  # back wall at z = 3.5
    d_left = x + 2.5  # left wall at x = -2.5
    sphere_c = jnp.array([0.6, -0.45, 2.2], dtype=p.dtype)
    d_sphere = jnp.linalg.norm(p - sphere_c, axis=-1) - 0.55
    box_c = jnp.array([-0.9, -0.65, 2.6], dtype=p.dtype)
    q = jnp.abs(p - box_c) - jnp.array([0.45, 0.35, 0.4], dtype=p.dtype)
    d_box = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1) + jnp.minimum(
        jnp.max(q, axis=-1), 0.0
    )
    return jnp.minimum(
        jnp.minimum(jnp.minimum(d_floor, d_back), d_left),
        jnp.minimum(d_sphere, d_box),
    )


def scene_normal(p: jax.Array) -> jax.Array:
    eps = 1e-3
    offs = jnp.eye(3, dtype=p.dtype) * eps
    n = jnp.stack(
        [scene_sdf(p + offs[i]) - scene_sdf(p - offs[i]) for i in range(3)], axis=-1
    )
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)


def scene_albedo(p: jax.Array) -> jax.Array:
    """Procedural high-frequency RGB albedo at world points [..., 3] -> [..., 3].

    Mix of quasi-random sinusoids: corner-rich, non-repeating locally, smooth
    enough for stable photometric gradients.
    """
    freqs = jnp.array(
        [
            [7.1, 3.3, 5.7],
            [2.9, 8.3, 4.1],
            [5.3, 2.1, 9.2],
            [11.3, 6.1, 3.7],
        ],
        dtype=p.dtype,
    )
    phases = jnp.array([0.3, 1.7, 2.9, 0.9], dtype=p.dtype)
    waves = jnp.sin(jnp.einsum("...i,ki->...k", p, freqs) * 2.3 + phases)  # [..., 4]
    # blocky checker components at two scales for strong, dense corners
    checker = (jnp.floor(p[..., 0] * 4.0) + jnp.floor(p[..., 1] * 4.0) + jnp.floor(p[..., 2] * 4.0)) % 2.0
    fine = (jnp.floor(p[..., 0] * 6.0 + 0.35) + jnp.floor(p[..., 1] * 6.0) + jnp.floor(p[..., 2] * 6.0 + 0.7)) % 2.0
    r = 0.45 + 0.15 * waves[..., 0] + 0.15 * checker + 0.12 * fine
    g = 0.45 + 0.15 * waves[..., 1] + 0.1 * waves[..., 3] + 0.12 * fine
    b = 0.45 + 0.15 * waves[..., 2] - 0.1 * checker + 0.12 * fine
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def render_frame(pose_c2w: jax.Array, width: int, height: int, intr: jax.Array):
    """Sphere-trace one frame. Returns (depth [H,W], color [H,W,3])."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    v = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    dirs_cam = jnp.stack(
        [(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)], axis=-1
    )
    R = pose_c2w[:3, :3]
    origin = pose_c2w[:3, 3]
    dirs = jnp.einsum("ij,hwj->hwi", R, dirs_cam)
    dir_norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs_n = dirs / dir_norm

    def step(_, carry):
        t, hit = carry
        p = origin + dirs_n * t[..., None]
        d = scene_sdf(p)
        hit = hit | (d < 1e-3)
        t = jnp.where(hit, t, t + jnp.maximum(d, 1e-3))
        return t, hit

    t0 = jnp.full((height, width), 0.05, dtype=jnp.float32)
    hit0 = jnp.zeros((height, width), dtype=bool)
    t, hit = jax.lax.fori_loop(0, 128, step, (t0, hit0))
    p = origin + dirs_n * t[..., None]
    # depth = z in camera frame (projective depth, like a real RGB-D sensor);
    # t is distance along the unit ray, dirs_cam has z == 1, so z = t / |dirs_cam|.
    z = t / dir_norm[..., 0]
    valid = hit & (z > 0.1) & (z < 8.0)
    depth = jnp.where(valid, z, 0.0)
    n = scene_normal(p)
    light = jnp.clip(-jnp.sum(n * dirs_n, axis=-1), 0.2, 1.0)
    color = scene_albedo(p) * light[..., None]
    color = jnp.where(valid[..., None], color, 0.0)
    return depth.astype(jnp.float32), color.astype(jnp.float32)


def corridor_sdf(p: jax.Array) -> jax.Array:
    """Multi-room scene: a long corridor along +x with protruding room
    dividers every 3 m and furniture spheres — camera paths along x leave the
    start far behind, exercising out-of-core streaming (BASELINE config 5)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    d_floor = y + 1.0
    d_ceil = 1.5 - y
    d_back = 3.0 - z  # far corridor wall
    d_front = z + 1.0  # near corridor wall (behind the camera path)
    # room dividers: thin walls at x = 1.5, 4.5, 7.5, ... with a doorway gap
    # for z in [0.4, 2.0] that the camera path (z = 1.2) passes through
    xm = jnp.mod(x, 3.0) - 1.5  # distance to nearest divider plane
    in_doorway = jnp.abs(z - 1.2) <= 0.8
    d_div = jnp.where(in_doorway, jnp.inf, jnp.abs(xm) - 0.08)
    # one furniture sphere per room, offset per room index
    room = jnp.floor((x + 1.5) / 3.0)
    sph_c = jnp.stack(
        [room * 3.0 + 0.8, jnp.full_like(room, -0.55), 1.9 + 0.4 * jnp.cos(room * 2.1)],
        axis=-1,
    )
    d_sph = jnp.linalg.norm(p - sph_c, axis=-1) - 0.45
    d = jnp.minimum(jnp.minimum(d_floor, d_ceil), jnp.minimum(d_back, d_front))
    return jnp.minimum(jnp.minimum(d, d_div), d_sph)


def corridor_path_poses(num_frames: int, x_span: float = 9.0, seed: int = 0) -> np.ndarray:
    """Camera walks down the corridor (translating +x), looking at the far
    wall, with gentle handheld jitter."""
    rng = np.random.default_rng(seed)
    jitter = rng.normal(scale=0.0015, size=(num_frames, 3)).cumsum(axis=0)
    poses = np.zeros((num_frames, 4, 4), dtype=np.float32)
    for i in range(num_frames):
        s = i / max(num_frames - 1, 1)
        eye = np.array([s * x_span, 0.0, 1.2]) + jitter[i]
        target = np.array([s * x_span + 0.5, -0.3, 2.7])
        fwd = target - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        poses[i, :3, 0] = right
        poses[i, :3, 1] = down
        poses[i, :3, 2] = fwd
        poses[i, :3, 3] = eye
        poses[i, 3, 3] = 1.0
    return poses


@functools.partial(jax.jit, static_argnums=(1, 2))
def _render_corridor_frame(pose_c2w: jax.Array, width: int, height: int, intr: jax.Array):
    # identical sphere tracer to render_frame but against corridor_sdf
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    v = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    dirs_cam = jnp.stack([(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)], axis=-1)
    R = pose_c2w[:3, :3]
    origin = pose_c2w[:3, 3]
    dirs = jnp.einsum("ij,hwj->hwi", R, dirs_cam)
    dir_norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs_n = dirs / dir_norm

    def step(_, carry):
        t, hit = carry
        p = origin + dirs_n * t[..., None]
        d = corridor_sdf(p)
        hit = hit | (d < 1e-3)
        t = jnp.where(hit, t, t + jnp.maximum(d, 1e-3))
        return t, hit

    t0 = jnp.full((height, width), 0.05, dtype=jnp.float32)
    t, hit = jax.lax.fori_loop(0, 160, step, (t0, jnp.zeros((height, width), bool)))
    p = origin + dirs_n * t[..., None]
    z = t / dir_norm[..., 0]
    valid = hit & (z > 0.1) & (z < 8.0)
    depth = jnp.where(valid, z, 0.0)
    eps = 1e-3
    offs = jnp.eye(3) * eps
    n = jnp.stack(
        [corridor_sdf(p + offs[i]) - corridor_sdf(p - offs[i]) for i in range(3)],
        axis=-1,
    )
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    light = jnp.clip(-jnp.sum(n * dirs_n, axis=-1), 0.2, 1.0)
    color = scene_albedo(p) * light[..., None]
    color = jnp.where(valid[..., None], color, 0.0)
    return depth.astype(jnp.float32), color.astype(jnp.float32)


def generate_corridor_sequence(
    num_frames: int,
    width: int = 64,
    height: int = 48,
    x_span: float = 9.0,
    seed: int = 0,
    out_and_back: bool = False,
) -> SyntheticSequence:
    """Multi-room sequence for streaming-scale tests/benchmarks. With
    ``out_and_back`` the camera walks to x_span and retraces its path — the
    return pass revisits outbound views (relocalization/revalidation cases)."""
    fx = 0.9 * width
    cam = CameraModel.create(fx, fx, (width - 1) / 2.0, (height - 1) / 2.0, width, height)
    if out_and_back:
        half = num_frames // 2 + 1
        p_out = corridor_path_poses(half, x_span=x_span, seed=seed)
        poses = np.concatenate([p_out, p_out[-2::-1]])[:num_frames]
    else:
        poses = corridor_path_poses(num_frames, x_span=x_span, seed=seed)
    intr = np.array([cam.fx, cam.fy, cam.cx, cam.cy], dtype=np.float32)
    render = jax.jit(jax.vmap(lambda T: _render_corridor_frame(T, width, height, intr)))
    depth, color = _host_render(render, poses)
    return SyntheticSequence(
        depth=depth,
        color=color,
        poses=poses,
        camera=cam,
        timestamps=np.arange(num_frames, dtype=np.float64) / 30.0,
    )


def apply_sensor_noise(
    seq: SyntheticSequence,
    seed: int = 0,
    axial: bool = True,
    lateral: bool = True,
    quantize: bool = True,
    edge_dropout: bool = True,
    exposure_drift: bool = True,
) -> SyntheticSequence:
    """Degrade a clean synthetic sequence with Kinect-v1-style sensor
    statistics (SURVEY.md §7 hard part 4 — SIFT/threshold fidelity must
    survive real-sensor noise, not just exact renders):

      * axial noise     sigma_z(z) = 1.2 mm + 1.9 mm * (z - 0.4)^2  (the
                        Khoshelham & Elberink 2012 empirical model)
      * lateral noise   ~0.8 px border jitter, applied by resampling depth at
                        randomly offset pixel coordinates
      * quantization    disparity rounding: z -> 1 / (round(K/z) / K) with
                        K = 360 (≈ 2.8 mm steps at 1 m, ~2.5 cm at 3 m)
      * edge dropout    pixels whose local depth contrast exceeds 10 cm are
                        invalidated (silhouette band), plus 0.5% speckle
      * exposure drift  slow per-frame global gain in [0.9, 1.1] (breaks
                        brightness-constancy the way auto-exposure does)
    """
    rng = np.random.default_rng(seed)
    depth = seq.depth.copy()
    color = seq.color.copy()
    n, h, w = depth.shape
    if lateral:
        du = rng.normal(scale=0.8, size=(n, h, w))
        dv = rng.normal(scale=0.8, size=(n, h, w))
        uu = np.clip(np.arange(w)[None, None, :] + du, 0, w - 1).astype(np.int32)
        vv = np.clip(np.arange(h)[None, :, None] + dv, 0, h - 1).astype(np.int32)
        depth = np.take_along_axis(
            depth.reshape(n, -1),
            (vv * w + uu).reshape(n, -1),
            axis=1,
        ).reshape(n, h, w)
    if axial:
        sigma = 0.0012 + 0.0019 * np.square(np.maximum(depth - 0.4, 0.0))
        depth = np.where(depth > 0, depth + rng.normal(size=depth.shape) * sigma, 0.0)
    if quantize:
        K = 360.0
        dq = np.round(K / np.maximum(depth, 1e-3))
        depth = np.where(depth > 0, K / np.maximum(dq, 1.0), 0.0)
    if edge_dropout:
        gx = np.abs(np.diff(depth, axis=2, prepend=depth[:, :, :1]))
        gy = np.abs(np.diff(depth, axis=1, prepend=depth[:, :1, :]))
        edge = (gx > 0.1) | (gy > 0.1)
        speckle = rng.random(depth.shape) < 0.005
        depth = np.where(edge | speckle, 0.0, depth)
    if exposure_drift:
        gain = 1.0 + 0.1 * np.sin(np.arange(n) * 0.21 + 0.5)
        color = np.clip(color * gain[:, None, None, None], 0.0, 1.0)
    return seq._replace(depth=depth.astype(np.float32), color=color.astype(np.float32))


def orbit_poses(num_frames: int, radius: float = 0.35, seed: int = 0) -> np.ndarray:
    """Smooth camera trajectory: slow lateral arc + small rotation, looking at
    the scene center — representative of handheld scanning motion."""
    rng = np.random.default_rng(seed)
    jitter = rng.normal(scale=0.002, size=(num_frames, 3)).cumsum(axis=0)
    poses = np.zeros((num_frames, 4, 4), dtype=np.float32)
    target = np.array([0.0, -0.4, 2.4])
    for i in range(num_frames):
        ang = (i / max(num_frames - 1, 1) - 0.5) * 0.9  # ~±26 deg arc
        eye = np.array(
            [radius * np.sin(ang), 0.15 * np.sin(ang * 2.3), -0.3 * np.cos(ang) + 0.3]
        ) + jitter[i] * np.array([1.0, 0.5, 1.0])
        fwd = target - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])  # camera y points down (image convention)
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        poses[i, :3, 0] = right
        poses[i, :3, 1] = down
        poses[i, :3, 2] = fwd
        poses[i, :3, 3] = eye
        poses[i, 3, 3] = 1.0
    return poses


def generate_sequence(
    num_frames: int,
    width: int = 64,
    height: int = 48,
    seed: int = 0,
    radius: float = 0.35,
) -> SyntheticSequence:
    """Render a full synthetic RGB-D sequence with ground-truth poses."""
    fx = 0.9 * width
    cam = CameraModel.create(fx, fx, (width - 1) / 2.0, (height - 1) / 2.0, width, height)
    poses = orbit_poses(num_frames, radius=radius, seed=seed)
    intr = np.array([cam.fx, cam.fy, cam.cx, cam.cy], dtype=np.float32)
    render = jax.jit(jax.vmap(lambda T: render_frame(T, width, height, intr)), static_argnums=())
    depth, color = _host_render(render, poses)
    return SyntheticSequence(
        depth=depth,
        color=color,
        poses=poses,
        camera=cam,
        timestamps=np.arange(num_frames, dtype=np.float64) / 30.0,
    )
