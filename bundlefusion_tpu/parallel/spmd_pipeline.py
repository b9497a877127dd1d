"""End-to-end multi-sequence SPMD pipeline (BASELINE config 5).

`run_sequences_sharded` replays D sequences over a D-device mesh in lockstep:
every compute stage of the single-sequence pipeline — the fused chunk program
(preprocess/SIFT/match/filter/local BA), the keyframe-graph step
(add/match/relocalize + the tracking-lost state machine), global BA,
trajectory publish, and the fused plan+ring+de/re-integrate TSDF step — runs
as ONE shard_map'd program per chunk round, one sequence per device, with
zero cross-device traffic (pure DP over sequences; SURVEY.md §2.2 DP row).

The driver is READBACK-FREE in steady state, exactly like the serial
pipeline (bundle/pipeline.py): the per-device programs are the *same*
device-side state machines the serial pipeline dispatches (`_graph_step`,
`_plan_and_fuse`), applied to one-sequence slices inside shard_map — the host
loop only uploads frames and dispatches; chunk validity, relocalization,
re-integration plans and diagnostics all live on device until the final
fetch. On the tunneled-TPU transport (whose first device->host readback
permanently degrades uploads ~50x, BENCHMARKS.md) this keeps the config-5
product path on the fast upload mode for the whole run.

A D-sequence sharded run produces the same results as D serial runs
(equivalence-tested on the simulated mesh).

Not supported in the sharded driver (yet): out-of-core streaming,
stale-keyframe revalidation, and the finalize-time ring-spill service —
host-interactive single-sequence features with no cross-sequence
interaction; run those via the serial pipeline.
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
from ..bundle.pipeline import (
    RUNREC_WIDTH,
    _accum_gc,
    _graph_step,
    _plan_and_fuse,
    _publish_all,
    make_ctrl,
)
from ..config import Config
from ..fusion import blocks, marching_cubes
from ..geometry.camera import CameraModel
from ..io import framewire


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


class ShardedOutputs(NamedTuple):
    poses: np.ndarray  # [D, F, 4, 4]
    valid: np.ndarray  # [D, F]
    num_keyframes: int
    tables: blocks.BlockTable  # stacked [D, ...]
    runlogs: np.ndarray  # [D, C, RUNREC_WIDTH] per-sequence diagnostics rows


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
    budget = ac.max_reintegrations_per_frame * S

    stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)

    # --- stacked device state (one slice per device; mirrors BundleFusion) ---
    graphs = stack([global_graph.make_graph(bc, bc.cache_height, bc.cache_width)] * d)
    tables = stack([blocks.make_table(ac.block_capacity)] * d)
    trajs = stack([trajectory.make_trajectory(bc.max_frames)] * d)
    ctrls = stack([make_ctrl()] * d)
    upd_masks = jnp.zeros((d, bc.max_frames, ac.blocks_per_frame_cap), bool)
    upd_keys = jnp.full(
        (d, bc.max_frames, ac.blocks_per_frame_cap), int(blocks.INVALID_KEY),
        jnp.int32,
    )
    ring_cap = min(bc.max_frames, ac.history_ring_frames)
    hist_d16 = jnp.zeros((d, ring_cap, h, w), jnp.uint16)
    hist_c8 = jnp.zeros((d, ring_cap, h, w, 3), jnp.uint8)
    ring_frame = jnp.full((d, ring_cap), -1, jnp.int32)
    max_chunks = bc.max_frames // S
    local_traj_dev = jnp.broadcast_to(jnp.eye(4), (d, max_chunks, chunk_frames, 4, 4))
    chunk_valid_dev = jnp.zeros((d, max_chunks), bool)
    runlog_dev = jnp.zeros((d, max_chunks + 1, RUNREC_WIDTH), jnp.float32)
    gc_freed_total = jnp.zeros((d,), jnp.float32)
    blocks_updated = jnp.zeros((d,), jnp.float32)

    anchors = (
        jnp.asarray(anchor_poses, jnp.float32)
        if anchor_poses is not None
        else jnp.broadcast_to(jnp.eye(4), (d, 4, 4))
    )

    # --- per-device programs: the SAME device-side state machines the serial
    # pipeline runs, shard_map-wrapped over the sequence axis ---
    chunk_fn = _shard1(
        mesh,
        lambda dep, col: chunk_mod.process_chunk(
            dep, col, cam, cache_cam, bc,
            sigma_d=ac.depth_sigma_d, sigma_r=ac.depth_sigma_r,
            filter_depth=ac.depth_filter and not ac.integrate_filtered_depth,
        ),
    )

    def _graph(is_first):
        return _shard1(
            mesh,
            lambda g, ct, k, kk, kc, lt, cv, nk, nm, pv, ltd, cvd, an: _graph_step(
                g, ct, k, kk, kc, lt, cv, nk, nm, pv, ltd, cvd, an,
                cache_cam, bc, is_first,
            ),
        )

    graph_first_fn, graph_rest_fn = _graph(True), _graph(False)
    solve_fn = _shard1(mesh, lambda g: global_graph.global_solve(g, cache_cam, bc))
    publish_fn = _shard1(
        mesh,
        lambda t, lt, cv, kp, kv: _publish_all(t, lt, cv, kp, kv, S, chunk_frames),
    )
    pf_fn = _shard1(
        mesh,
        lambda tab, tr, um, uk, hd, hc, rf, rl, ci, si, dn, cn, ni, nv, im, ex, gf, bu: (
            _plan_and_fuse(
                tab, tr, um, uk, hd, hc, rf, rl, ci, si, dn, cn, ni, nv, im, ex,
                gf, bu, cam, ac, budget,
            )
        ),
    )
    gc_fn = _shard1(mesh, blocks.garbage_collect)
    accum_fn = _shard1(mesh, _accum_gc)

    # wire conversion shared with the serial push path (native C++ when built),
    # including the optional wire-level bilateral so device programs see
    # identical bytes
    def to_wire(i, f):
        d16, c8 = framewire.frame_to_wire(
            sequences[i].depth[f], sequences[i].color[f]
        )
        if ac.integrate_filtered_depth:
            d16 = framewire.bilateral_wire(d16, ac.depth_sigma_d, ac.depth_sigma_r)
        return d16, c8

    wires = [[to_wire(i, f) for f in range(n_frames)] for i in range(d)]
    d16_all = np.stack([np.stack([w16 for w16, _ in ws]) for ws in wires])
    c8_all = np.stack([np.stack([w8 for _, w8 in ws]) for ws in wires])

    for c in range(n_chunks):
        first = c * S
        dep = jnp.asarray(d16_all[:, first : first + chunk_frames])
        col = jnp.asarray(c8_all[:, first : first + chunk_frames])
        res = chunk_fn(dep, col)  # batched ChunkResult [D, ...]

        k_vec = jnp.full((d,), c, jnp.int32)
        gfn = graph_first_fn if c == 0 else graph_rest_fn
        (
            graphs, ctrls, integrate_mask, local_traj_dev, chunk_valid_dev,
            stats_in,
        ) = gfn(
            graphs, ctrls, k_vec, res.keyframe_keys, res.keyframe_cache,
            res.local_traj, res.chunk_valid, res.num_keys, res.num_matches,
            res.pair_valid, local_traj_dev, chunk_valid_dev, anchors,
        )

        if c > 0:
            graphs, _, _ = solve_fn(graphs)

        trajs = publish_fn(
            trajs, local_traj_dev, chunk_valid_dev, graphs.poses, graphs.valid
        )

        # fused plan + ring write + de/re-integrate + diagnostics row — one
        # program, plan consumed on device (a fixed new-frame width keeps this
        # a single compile; masked rows neither ring-write nor integrate)
        lo = 0 if c == 0 else 1
        new_ids = np.arange(first, first + chunk_frames, dtype=np.int32)
        new_valid = np.ones(chunk_frames, bool)
        new_valid[:lo] = False
        (
            tables, trajs, upd_masks, upd_keys, hist_d16, hist_c8, ring_frame,
            runlog_dev, blocks_updated,
        ) = pf_fn(
            tables, trajs, upd_masks, upd_keys, hist_d16, hist_c8, ring_frame,
            runlog_dev, k_vec, stats_in, dep, col,
            jnp.broadcast_to(jnp.asarray(new_ids), (d, chunk_frames)),
            jnp.broadcast_to(jnp.asarray(new_valid), (d, chunk_frames)),
            integrate_mask,
            jnp.full((d,), int(new_ids[lo]), jnp.int32),
            gc_freed_total, blocks_updated,
        )

        if ac.gc_every_chunks and (c + 1) % ac.gc_every_chunks == 0:
            tables, freed = gc_fn(tables)
            gc_freed_total = accum_fn(gc_freed_total, freed)

    # ---- the run's FIRST readbacks: everything fetched once, at the end ----
    n_out = n_chunks * S + 1 if n_chunks else 0
    return ShardedOutputs(
        poses=np.asarray(trajs.opt_pose[:, :n_out]),
        valid=np.asarray(trajs.opt_valid[:, :n_out]),
        num_keyframes=n_chunks,
        tables=tables,
        runlogs=np.asarray(runlog_dev[:, :n_chunks]),
    )


def extract_mesh_for(outputs: ShardedOutputs, seq_idx: int, cfg: Config):
    """Mesh one sequence's reconstruction from the stacked tables."""
    table = jax.tree.map(lambda x: x[seq_idx], outputs.tables)
    return marching_cubes.extract_mesh(table, cfg.app)
