"""Trajectory manager: re-integration scheduling.

Rebuild of ``TrajectoryManager.h/.cpp`` (SURVEY.md §2.1, §3.4 — the paper's
on-the-fly re-integration): per frame, track the pose it was *integrated* with
vs. the *currently optimized* pose; after each optimization, the frames whose
pose moved most are de-integrated (old pose) and re-integrated (new pose)
under a per-step budget, and frames invalidated after the fact are purely
de-integrated.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3

# frame states
NOT_INTEGRATED = 0
INTEGRATED = 1


class TrajectoryState(NamedTuple):
    integrated_pose: jax.Array  # [F, 4, 4] pose each frame was last fused with
    integrated: jax.Array  # [F] bool
    opt_pose: jax.Array  # [F, 4, 4] current optimized pose
    opt_valid: jax.Array  # [F] bool — frame currently part of a valid chunk


def make_trajectory(max_frames: int) -> TrajectoryState:
    # integrated_pose and opt_pose must be DISTINCT buffers: the pipeline's
    # fused programs donate the whole state, and donating one buffer through
    # two leaves is an XLA error ("donate the same buffer twice")
    eye = jnp.broadcast_to(jnp.eye(4), (max_frames, 4, 4))
    return TrajectoryState(
        integrated_pose=eye + 0.0,
        integrated=jnp.zeros(max_frames, bool),
        opt_pose=eye + 0.0,
        opt_valid=jnp.zeros(max_frames, bool),
    )


@jax.jit
def update_optimized(
    ts: TrajectoryState,
    frame_ids: jax.Array,  # [B] int32
    poses: jax.Array,  # [B, 4, 4]
    valid: jax.Array,  # [B] bool
) -> TrajectoryState:
    return ts._replace(
        opt_pose=ts.opt_pose.at[frame_ids].set(poses),
        opt_valid=ts.opt_valid.at[frame_ids].set(valid),
    )


class ReintPlan(NamedTuple):
    """Budgeted work lists for the fusion thread (SURVEY.md §3.2 reintegrate())."""

    frames: jax.Array  # [budget] int32 — frame ids to touch
    deint_mask: jax.Array  # [budget] bool — de-integrate at integrated_pose
    reint_mask: jax.Array  # [budget] bool — (re-)integrate at opt_pose
    max_delta: jax.Array  # float32 — largest pending pose delta (for logging)


@functools.partial(jax.jit, static_argnames=("budget", "rot_thresh", "trans_thresh"))
def plan_reintegration(
    ts: TrajectoryState,
    budget: int,
    rot_thresh: float = 0.008,
    trans_thresh: float = 0.004,
    exclude_from: jax.Array | None = None,
    ring_frame: jax.Array | None = None,
) -> ReintPlan:
    """Pick the `budget` frames most in need of fusion work. Three classes,
    by priority:

      1. *invalidated*: integrated but no longer part of a valid chunk —
         de-integrate only (reference: TrajectoryManager's invalidated list);
      2. *missing*: part of a valid chunk but not integrated — integrate only.
         This is how frames of a chunk **revalidated** after relocalization
         (SURVEY.md §0 item 4) get their geometry back, within the same
         budgeted mechanism;
      3. *moved*: integrated with a pose that has since drifted past the
         thresholds — de-integrate at the old pose, re-integrate at the new,
         worst drift first. Delta metric = rotation angle + translation norm,
         as in the reference [M].

    ``ring_frame`` (the device history ring's residency map, slot = id % R):
    when given, every ring-RESIDENT candidate outranks every spilled one —
    spilled picks would be masked by the fuse step anyway (deferred to the
    finalize service), so letting them consume the budget starves in-ring
    frames that could be corrected right now (VERDICT r2 weak #4). The
    finalize-side service planner omits it: there the host uploads whatever
    the plan asks for, so residency must NOT bias priority.

    Scores are tiered class bases + the (clamped) pose delta; bases stay
    small enough that f32 resolution preserves worst-drift-first ordering
    within the moved class.
    """
    ang, dist = se3.pose_distance(ts.integrated_pose, ts.opt_pose)
    delta = ang + dist
    moved = ts.integrated & ts.opt_valid & (
        (ang > rot_thresh) | (dist > trans_thresh)
    )
    invalidated = ts.integrated & ~ts.opt_valid
    missing = ~ts.integrated & ts.opt_valid
    if exclude_from is not None:
        # planning runs BEFORE the current chunk's frames integrate (the fused
        # plan+integrate program); frames at/after `exclude_from` are the new
        # ones — they are integrated explicitly, never via the plan
        allowed = jnp.arange(ts.integrated.shape[0]) < exclude_from
        moved = moved & allowed
        invalidated = invalidated & allowed
        missing = missing & allowed
    delta_c = jnp.minimum(delta, 1e3)
    score = jnp.where(
        invalidated,
        5e4,
        jnp.where(missing, 4e4, jnp.where(moved, 2e4 + delta_c, -jnp.inf)),
    )
    if ring_frame is not None:
        fids = jnp.arange(ts.integrated.shape[0])
        resident = ring_frame[fids % ring_frame.shape[0]] == fids
        spilled_score = jnp.where(
            invalidated,
            300.0,
            jnp.where(missing, 200.0, jnp.where(moved, jnp.minimum(delta_c, 99.0), -jnp.inf)),
        )
        score = jnp.where(resident, score, spilled_score)
    top, idx = jax.lax.top_k(score, budget)
    work = top > -jnp.inf
    return ReintPlan(
        frames=idx.astype(jnp.int32),
        deint_mask=work & ts.integrated[idx],
        reint_mask=work & ts.opt_valid[idx],
        max_delta=jnp.max(jnp.where(moved, delta, 0.0)),
    )


@jax.jit
def mark_integrated(
    ts: TrajectoryState, frame_id: jax.Array, pose: jax.Array
) -> TrajectoryState:
    return ts._replace(
        integrated_pose=ts.integrated_pose.at[frame_id].set(pose),
        integrated=ts.integrated.at[frame_id].set(True),
    )


@jax.jit
def mark_integrated_batch(
    ts: TrajectoryState, frame_ids: jax.Array, poses: jax.Array
) -> TrajectoryState:
    return ts._replace(
        integrated_pose=ts.integrated_pose.at[frame_ids].set(poses),
        integrated=ts.integrated.at[frame_ids].set(True),
    )


@jax.jit
def mark_deintegrated(ts: TrajectoryState, frame_id: jax.Array) -> TrajectoryState:
    return ts._replace(integrated=ts.integrated.at[frame_id].set(False))
