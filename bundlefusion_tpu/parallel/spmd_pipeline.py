"""End-to-end multi-sequence SPMD pipeline (BASELINE config 5).

`run_sequences_sharded` replays D sequences over a D-device mesh in lockstep:
every compute stage of the single-sequence pipeline — the fused chunk program
(preprocess/SIFT/match/filter/local BA), keyframe graph add/match/solve,
trajectory publish, and TSDF fuse/re-integrate — runs as ONE shard_map'd
program per chunk round, one sequence per device, with zero cross-device
traffic (pure DP over sequences; SURVEY.md §2.2 DP row). Host bookkeeping
(chunk validity, relocalization state machine, frame rings) is per-sequence
Python, exactly mirroring `bundle.pipeline.BundleFusion`.

The per-device programs are the same jitted functions the serial pipeline
runs, applied to one-sequence slices inside shard_map — so a D-sequence
sharded run produces the same results as D serial runs (equivalence-tested on
the simulated mesh).

Not supported in the sharded driver (yet): out-of-core streaming and stale-
keyframe revalidation — single-sequence features whose host logic has no
cross-sequence interaction; run those via the serial pipeline.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..bundle import chunk as chunk_mod
from ..bundle import global_graph, trajectory
from ..bundle.pipeline import _fuse_frames, _publish_all
from ..config import Config
from ..fusion import blocks, marching_cubes
from ..geometry import se3
from ..geometry.camera import CameraModel


def _shard1(mesh: Mesh, fn, axis: str = "seq"):
    """Wrap a single-sequence function so it runs once per device on that
    device's leading-axis slice of every argument. jit-wrapped so the traced
    program is compiled once and reused every chunk round."""

    def wrapped(*args):
        args1 = jax.tree.map(lambda x: x[0], args)
        out = fn(*args1)
        return jax.tree.map(lambda x: x[None], out)

    sm = shard_map(
        wrapped, mesh=mesh, in_specs=P(axis), out_specs=P(axis), check_vma=False
    )
    return jax.jit(sm)


@functools.partial(jax.jit, static_argnames=())
def _apply_relink(poses, valid, k_idx, best_prev, transforms, relink_mask):
    """Batched relocalization update: for sequences in relink_mask, place
    keyframe k from its best global match (pose_j @ inv(T_rel))."""
    d = poses.shape[0]
    rows = jnp.arange(d)
    pj = poses[rows, best_prev]  # [D, 4, 4]
    T = transforms[rows, best_prev]  # [D, 4, 4]
    pk = jnp.einsum("dij,djk->dik", pj, se3.mat_inverse(T))
    k = jnp.broadcast_to(k_idx, (d,))
    new_poses = poses.at[rows, k].set(jnp.where(relink_mask[:, None, None], pk, poses[rows, k]))
    new_valid = valid.at[rows, k].set(valid[rows, k] | relink_mask)
    return new_poses, new_valid


class ShardedOutputs(NamedTuple):
    poses: np.ndarray  # [D, F, 4, 4]
    valid: np.ndarray  # [D, F]
    num_keyframes: int
    tables: blocks.BlockTable  # stacked [D, ...]


def run_sequences_sharded(
    sequences,  # list of D SyntheticSequence-like (depth [F,H,W], color, camera)
    mesh: Mesh,
    config: Config | None = None,
    anchor_poses: np.ndarray | None = None,  # [D, 4, 4]
) -> ShardedOutputs:
    cfg = config or Config()
    cfg.validate()
    bc, ac = cfg.bundling, cfg.app
    d = mesh.devices.size
    assert len(sequences) == d, f"need {d} sequences for a {d}-device mesh"
    cam: CameraModel = sequences[0].camera
    for s in sequences:
        assert s.camera == cam, "sequences must share intrinsics"
    cache_cam = cam.scaled(bc.cache_width, bc.cache_height)
    S, chunk_frames = bc.submap_size, bc.chunk_size
    n_frames = min(s.depth.shape[0] for s in sequences)
    n_chunks = max(0, (n_frames - 1) // S)
    h, w = cam.height, cam.width

    stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)

    # --- stacked device state (one slice per device) ---
    graphs = stack([global_graph.make_graph(bc, bc.cache_height, bc.cache_width)] * d)
    tables = stack([blocks.make_table(ac.block_capacity)] * d)
    trajs = stack([trajectory.make_trajectory(bc.max_frames)] * d)
    upd_masks = jnp.zeros((d, bc.max_frames, ac.blocks_per_frame_cap), bool)
    ring_cap = min(bc.max_frames, ac.history_ring_frames)
    hist_d16 = jnp.zeros((d, ring_cap, h, w), jnp.uint16)
    hist_c8 = jnp.zeros((d, ring_cap, h, w, 3), jnp.uint8)
    max_chunks = bc.max_frames // S
    local_traj_dev = jnp.broadcast_to(jnp.eye(4), (d, max_chunks, chunk_frames, 4, 4))
    chunk_valid_dev = jnp.zeros((d, max_chunks), bool)

    anchors = (
        jnp.asarray(anchor_poses, jnp.float32)
        if anchor_poses is not None
        else jnp.broadcast_to(jnp.eye(4), (d, 4, 4))
    )

    # --- per-sequence host state ---
    chunk_valid_host = [[] for _ in range(d)]
    last_rel = [None] * d  # np [4,4] last chunk's end-relative pose
    tracking_lost = [False] * d
    ring_next = 0  # lockstep ring cursor (same slots on every device)

    # --- per-device programs (shard_map-wrapped singles) ---
    chunk_fn = _shard1(
        mesh,
        lambda dep, col: chunk_mod.process_chunk(
            dep, col, cam, cache_cam, bc,
            sigma_d=ac.depth_sigma_d, sigma_r=ac.depth_sigma_r,
            filter_depth=ac.depth_filter,
        ),
    )
    add_fn = _shard1(mesh, global_graph.add_keyframe)
    match_fn = _shard1(
        mesh, lambda g, k: global_graph.global_match(g, k, cache_cam, bc)
    )
    solve_fn = _shard1(
        mesh, lambda g: global_graph.global_solve(g, cache_cam, bc)
    )
    publish_fn = _shard1(
        mesh,
        lambda t, lt, cv, kp, kv: _publish_all(
            t, lt, cv, kp, kv, S, chunk_frames
        ),
    )
    fuse_fn = _shard1(
        mesh,
        lambda tab, tr, um, hd, hc, sl, fi, dv, rv: _fuse_frames(
            tab, tr, um, hd, hc, sl, fi, dv, rv, cam, ac
        ),
    )
    plan_fn = _shard1(
        mesh, lambda tr: trajectory.plan_reintegration(tr, ac.max_reintegrations_per_frame * S)
    )

    depth_all = np.stack([s.depth[:n_frames] for s in sequences])  # [D, F, H, W]
    color_all = np.stack([s.color[:n_frames] for s in sequences])
    d16_all = (np.clip(depth_all, 0.0, 65.0) * 1000.0).astype(np.uint16)
    c8_all = (np.clip(color_all, 0.0, 1.0) * 255.0).astype(np.uint8)

    num_keyframes = 0
    for c in range(n_chunks):
        first = c * S
        dep = jnp.asarray(d16_all[:, first : first + chunk_frames])
        col = jnp.asarray(c8_all[:, first : first + chunk_frames])
        res = chunk_fn(dep, col)  # batched ChunkResult [D, ...]
        cvalid = np.asarray(res.chunk_valid)
        ltraj = np.asarray(res.local_traj)

        # keyframe pose init per sequence (host logic mirrors BundleFusion)
        init_poses = np.zeros((d, 4, 4), np.float32)
        kf_valid = np.zeros(d, bool)
        kf_prev_valid = np.asarray(graphs.valid[:, c - 1]) if c > 0 else None
        prev_poses = np.asarray(graphs.poses[:, c - 1]) if c > 0 else None
        for i in range(d):
            if c == 0:
                init_poses[i] = np.asarray(anchors[i])
                kf_valid[i] = cvalid[i]
            elif kf_prev_valid[i] and cvalid[i] and not tracking_lost[i] and last_rel[i] is not None:
                init_poses[i] = prev_poses[i] @ last_rel[i]
                kf_valid[i] = True
            else:
                init_poses[i] = np.asarray(anchors[i])
                kf_valid[i] = False
            last_rel[i] = ltraj[i, -1]
        graphs = add_fn(
            graphs,
            jnp.full((d,), c, jnp.int32),
            res.keyframe_keys,
            res.keyframe_cache,
            jnp.asarray(init_poses),
            jnp.asarray(kf_valid & cvalid),
        )

        if c > 0:
            mres = match_fn(graphs, jnp.full((d,), c, jnp.int32))
            graphs = mres.graph
            any_valid = np.asarray(mres.any_valid)
            relink = jnp.asarray(any_valid & ~kf_valid & cvalid)
            poses_new, valid_new = _apply_relink(
                graphs.poses, graphs.valid, jnp.int32(c),
                mres.best_prev, mres.transforms, relink,
            )
            graphs = graphs._replace(poses=poses_new, valid=valid_new)
            for i in range(d):
                if bool(relink[i]):
                    kf_valid[i] = True
                    tracking_lost[i] = False
                elif cvalid[i] and not kf_valid[i]:
                    tracking_lost[i] = True
                elif cvalid[i] and kf_valid[i]:
                    tracking_lost[i] = False

        for i in range(d):
            chunk_valid_host[i].append(bool(cvalid[i]))
        local_traj_dev = local_traj_dev.at[:, c].set(res.local_traj)
        chunk_valid_dev = chunk_valid_dev.at[:, c].set(res.chunk_valid)
        num_keyframes = c + 1

        if num_keyframes > 1:
            graphs, _, _ = solve_fn(graphs)

        trajs = publish_fn(
            trajs, local_traj_dev, chunk_valid_dev, graphs.poses, graphs.valid
        )

        # stash wire frames in the lockstep ring + initial integration
        lo = 0 if c == 0 else 1
        new_ids = list(range(first + lo, first + chunk_frames))
        slots = [(ring_next + j) % ring_cap for j in range(len(new_ids))]
        ring_next += len(new_ids)
        sl = jnp.asarray(slots, jnp.int32)
        hist_d16 = hist_d16.at[:, sl].set(dep[:, lo:])
        hist_c8 = hist_c8.at[:, sl].set(col[:, lo:])
        fi = jnp.asarray(new_ids, jnp.int32)
        integrate_mask = jnp.asarray(cvalid & kf_valid)
        tables, trajs, upd_masks, _, _ = fuse_fn(
            tables,
            trajs,
            upd_masks,
            hist_d16,
            hist_c8,
            jnp.broadcast_to(sl, (d, len(new_ids))),
            jnp.broadcast_to(fi, (d, len(new_ids))),
            jnp.zeros((d, len(new_ids)), bool),
            jnp.broadcast_to(integrate_mask[:, None], (d, len(new_ids))),
        )

        # budgeted re-integration: per-device plans; the lockstep ring only
        # holds the most recent ring_cap frames, so planned frames outside it
        # are deferred (the serial driver's host FrameStore re-upload path is
        # a single-sequence feature)
        plan = plan_fn(trajs)
        frames_np = np.asarray(plan.frames)
        deint_np = np.asarray(plan.deint_mask)
        reint_np = np.asarray(plan.reint_mask)
        lo_frame = max(0, first + chunk_frames - ring_cap)
        in_ring = (frames_np >= lo_frame) & (frames_np < first + chunk_frames)
        deint_np = deint_np & in_ring
        reint_np = reint_np & in_ring
        if (deint_np | reint_np).any():
            slots_np = frames_np % ring_cap  # lockstep ring: slot = frame % cap
            tables, trajs, upd_masks, _, _ = fuse_fn(
                tables,
                trajs,
                upd_masks,
                hist_d16,
                hist_c8,
                jnp.asarray(slots_np, jnp.int32),
                jnp.asarray(frames_np, jnp.int32),
                jnp.asarray(deint_np),
                jnp.asarray(reint_np),
            )

    n_out = n_chunks * S + 1 if n_chunks else 0
    return ShardedOutputs(
        poses=np.asarray(trajs.opt_pose[:, :n_out]),
        valid=np.asarray(trajs.opt_valid[:, :n_out]),
        num_keyframes=num_keyframes,
        tables=tables,
    )


def extract_mesh_for(outputs: ShardedOutputs, seq_idx: int, cfg: Config):
    """Mesh one sequence's reconstruction from the stacked tables."""
    table = jax.tree.map(lambda x: x[seq_idx], outputs.tables)
    return marching_cubes.extract_mesh(table, cfg.app)
