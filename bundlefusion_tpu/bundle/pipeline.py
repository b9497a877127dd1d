"""The online BundleFusion pipeline: chunks -> keyframes -> global BA -> TSDF.

Rebuild of the application layer (``FriedLiver.cpp`` + ``DepthSensing.cpp`` +
``Bundler``/``OnlineBundler`` — SURVEY.md §2.1, §3.2/3.3): the reference runs
two threads over two GPUs (bundling vs. reconstruction) synchronized by
condition variables; offline replay needs none of that — one host loop drives
jitted chunk programs, the global keyframe graph, the trajectory manager and
TSDF de/re-integration in sequence, chunk-at-a-time (SURVEY.md §2.2 "PP").

Host responsibilities are orchestration-only: every compute stage is a
compiled XLA program with fixed shapes; the host keeps python ints (frame
counters, lost-tracking state machine) and the replay buffer.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..fusion import blocks, marching_cubes, raycast, tsdf
from ..geometry import se3
from ..geometry.camera import CameraModel
from ..utils.logging import RunLog
from ..utils.timing import TimingLog
from . import chunk as chunk_mod
from . import global_graph, trajectory


@functools.partial(jax.jit, static_argnames=("submap_size", "chunk_frames"))
def _publish_all(
    traj: trajectory.TrajectoryState,
    local_trajs: jax.Array,  # [Cmax, S+1, 4, 4]
    chunk_valid: jax.Array,  # [Cmax]
    kf_poses: jax.Array,  # [Kmax, 4, 4]
    kf_valid: jax.Array,  # [Kmax]
    submap_size: int,
    chunk_frames: int,
) -> trajectory.TrajectoryState:
    c_pub = min(local_trajs.shape[0], kf_poses.shape[0])
    lt = local_trajs[:c_pub]
    world = jnp.einsum("cij,csjk->csik", kf_poses[:c_pub], lt)
    valid = chunk_valid[:c_pub] & kf_valid[:c_pub]
    fids = (
        jnp.arange(c_pub)[:, None] * submap_size + jnp.arange(chunk_frames)[None, :]
    ).astype(jnp.int32)
    valid_e = jnp.repeat(valid, chunk_frames)
    traj = trajectory.update_optimized(
        traj, fids.reshape(-1), world.reshape(-1, 4, 4), valid_e
    )
    # Overlap frames appear in two chunk slots (last of c, first of c+1); the
    # scatter's last write wins, so an unprocessed/invalid neighbor chunk can
    # clobber a valid entry. Second pass: re-scatter only the valid entries
    # (invalid ones get an out-of-range id, which the scatter drops).
    fids_valid = jnp.where(valid_e, fids.reshape(-1), traj.opt_pose.shape[0])
    traj = trajectory.update_optimized(
        traj, fids_valid, world.reshape(-1, 4, 4), valid_e
    )
    return traj


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def _fuse_frames(
    table,
    traj: trajectory.TrajectoryState,
    upd_masks: jax.Array,  # [F, cap] bool — per-frame recorded update masks
    hist_d16: jax.Array,  # [R, H, W] uint16 depth (mm, wire format)
    hist_c8: jax.Array,  # [R, H, W, 3] uint8 color
    slots: jax.Array,  # [B] ring slots
    frame_ids: jax.Array,  # [B]
    deint_valid: jax.Array,  # [B] de-integrate at integrated_pose
    reint_valid: jax.Array,  # [B] (re-)integrate at opt_pose
    cam: CameraModel,
    cfg,
):
    """ONE fused device program for all TSDF pose maintenance: initial
    integration (deint_valid all-False), re-integration after pose drift, pure
    de-integration of invalidated frames, and integrate-only revalidation
    catch-up. Frames are dequantized from the wire-format ring on device; the
    dequantization is elementwise and deterministic, so a frame re-uploaded
    from the host FrameStore de-integrates bit-exactly. De-integration uses
    the update mask recorded at integrate time (tsdf.FuseDiag.upd_mask), so
    it subtracts exactly what was added even under allocation overflow.
    Returns (table, traj, upd_masks, FuseDiag)."""
    depth = hist_d16[slots].astype(jnp.float32) * 1e-3
    color = hist_c8[slots].astype(jnp.float32) * (1.0 / 255.0)
    old_poses = traj.integrated_pose[frame_ids]
    new_poses = traj.opt_pose[frame_ids]
    table = tsdf.deintegrate_batch(
        table, depth, color, old_poses, deint_valid, cam, cfg,
        upd_masks=upd_masks[frame_ids],
    )
    table, diag = tsdf.integrate_batch(
        table, depth, color, new_poses, reint_valid, cam, cfg
    )
    sentinel = traj.opt_pose.shape[0]  # out-of-range scatter ids are dropped
    deint_ids = jnp.where(deint_valid, frame_ids, sentinel)
    traj = traj._replace(integrated=traj.integrated.at[deint_ids].set(False))
    reint_ids = jnp.where(reint_valid, frame_ids, sentinel)
    traj = traj._replace(
        integrated_pose=traj.integrated_pose.at[reint_ids].set(new_poses),
        integrated=traj.integrated.at[reint_ids].set(True),
    )
    # measured block-update count (de-integration applies the recorded masks;
    # integration's applied mask comes back in diag) — the honest
    # voxel-updates metric, not a capacity-derived bound
    blocks_touched = (
        jnp.sum(upd_masks[frame_ids] & deint_valid[:, None])
        + jnp.sum(diag.upd_mask)
    ).astype(jnp.float32)
    upd_masks = upd_masks.at[reint_ids].set(diag.upd_mask)
    return table, traj, upd_masks, diag, blocks_touched


@jax.jit
def _quantize_depth16(depth: jax.Array) -> jax.Array:
    """float meters -> uint16 mm (wire format); the inverse of the fuse
    program's dequantization, used when integrating *filtered* depth."""
    return jnp.clip(jnp.round(depth * 1000.0), 0, 65535).astype(jnp.uint16)


class PipelineOutputs(NamedTuple):
    poses: np.ndarray  # [F, 4, 4] final optimized world poses
    valid: np.ndarray  # [F] bool
    num_keyframes: int
    tracking_lost_chunks: int


class BundleFusion:
    """Online globally-consistent RGB-D reconstruction (offline replay driver)."""

    def __init__(
        self,
        cam: CameraModel,
        config: Config | None = None,
        log_path: str | None = None,
        anchor_pose: np.ndarray | None = None,
        profile: bool = False,
        mesh=None,
    ):
        # mesh: optional jax.sharding.Mesh — when set, the global BA runs
        # multi-chip (sharded assembly + row-sharded PCG, parallel/sharded_ba)
        self.mesh = mesh
        # profile=True inserts a device sync after every stage so the timing
        # table attributes cost correctly; profile=False lets XLA queue the
        # whole chunk's programs back-to-back (async dispatch), which is the
        # production mode — only genuinely required host syncs remain.
        self.profile = profile
        self.config = config or Config()
        self.config.validate()
        bc = self.config.bundling
        ac = self.config.app
        self.cam = cam
        if cam.width % bc.cache_width or cam.height % bc.cache_height:
            raise ValueError(
                f"cache resolution {bc.cache_width}x{bc.cache_height} must divide "
                f"the frame resolution {cam.width}x{cam.height} "
                "(set bundling.cache_width/cache_height accordingly)"
            )
        self.cache_cam = cam.scaled(bc.cache_width, bc.cache_height)
        self.S = bc.submap_size
        self.chunk_frames = bc.chunk_size  # S + 1 with overlap

        self.table = blocks.make_table(ac.block_capacity)
        self.graph = global_graph.make_graph(bc, bc.cache_height, bc.cache_width)
        self.traj = trajectory.make_trajectory(bc.max_frames)

        self.num_frames = 0
        self.num_keyframes = 0
        self.chunk_count = 0
        # measured work counters (BASELINE metrics are counted, not derived):
        # device-side async accumulator of blocks actually updated by
        # integrate/de-integrate, and host count of executed GN iterations
        self.blocks_updated = jnp.float32(0.0)
        self.gn_iters_executed = 0
        self.tracking_lost = False
        self.lost_chunks = 0
        self.consecutive_invalid = 0
        # world pose anchoring the first keyframe (identity, or GT frame-0
        # pose when evaluating against ground truth)
        self.anchor = np.eye(4, dtype=np.float32) if anchor_pose is None else anchor_pose

        self._pending: list[tuple[np.ndarray, np.ndarray]] = []  # (depth, color)
        # Frame storage for de/re-integration (reference: TrajectoryManager +
        # CPU-resident integrate frames over the WHOLE sequence):
        #   * host FrameStore: every frame ever pushed, wire format (uint16 mm
        #     depth + uint8 color, ~1.5 MB/frame at 640x480) — the authority;
        #   * device ring: an LRU cache of the same wire data, so the common
        #     case (recent frames) re-integrates with zero host traffic, and
        #     any older frame is re-uploaded into the ring on demand.
        # Because both tiers hold identical wire bytes and the fuse program
        # dequantizes on device, de-integration stays bit-exact regardless of
        # which tier served the frame.
        self.history_cap = min(bc.max_frames, ac.history_ring_frames)
        if self.history_cap < bc.chunk_size:
            raise ValueError(
                f"history_ring_frames={ac.history_ring_frames} must hold at "
                f"least one chunk ({bc.chunk_size} frames)"
            )
        self._hist_d16 = jnp.zeros((self.history_cap, cam.height, cam.width), jnp.uint16)
        self._hist_c8 = jnp.zeros((self.history_cap, cam.height, cam.width, 3), jnp.uint8)
        self._hist_slot: dict[int, int] = {}  # frame_id -> ring slot
        self._slot_frame: dict[int, int] = {}  # ring slot -> frame_id
        self._hist_next = 0
        self._frame_store: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._ring_uploads_chunk = 0
        self._gc_jit = jax.jit(blocks.garbage_collect)
        # per-frame update-block masks recorded at integrate time; required
        # for exact de-integration under allocation overflow (tsdf.FuseDiag)
        self._upd_masks = jnp.zeros(
            (bc.max_frames, ac.blocks_per_frame_cap), bool
        )
        self._local_trajs: list[np.ndarray] = []  # per chunk [S+1, 4, 4] (host copy)
        self._chunk_valid: list[bool] = []
        # device-side fixed-capacity local-trajectory store: growing shapes
        # would recompile the publish program every chunk
        self.max_chunks = bc.max_frames // self.S
        self._local_traj_dev = jnp.broadcast_to(
            jnp.eye(4), (self.max_chunks, self.chunk_frames, 4, 4)
        )
        self._chunk_valid_dev = jnp.zeros(self.max_chunks, bool)

        # out-of-core streaming (CUDASceneRepChunkGrid analog; config-5 scale)
        from ..fusion.streaming import HostBlockStore

        self.block_store = HostBlockStore(chunk_blocks=ac.streaming_chunk_blocks)

        self.timing = TimingLog()
        self.runlog = RunLog(log_path)

    # ------------------------------------------------------------------
    # frame input
    # ------------------------------------------------------------------

    def push_frame(self, depth: np.ndarray, color: np.ndarray) -> None:
        """Feed one frame; chunks are processed as soon as complete.

        Frames are held (and shipped to the device) in the sensor's compact
        wire format — uint16 depth in mm, uint8 color — quartering the
        host->device traffic; the chunk program converts on device.
        """
        d16 = (np.clip(depth, 0.0, 65.0) * 1000.0).astype(np.uint16)
        c8 = (np.clip(color, 0.0, 1.0) * 255.0).astype(np.uint8)
        self._pending.append((d16, c8))
        self._maybe_process_chunk()

    def push_batch(self, depth: np.ndarray, color: np.ndarray, valid=None) -> None:
        for i in range(depth.shape[0]):
            if valid is None or valid[i]:
                self.push_frame(depth[i], color[i])

    def _maybe_process_chunk(self) -> None:
        # chunk c consumes frames [c*S, c*S + S]; overlap frame c*S is shared
        # with the previous chunk, so after chunk 0 each chunk needs S new ones
        while True:
            needed = self.chunk_frames if self.chunk_count == 0 else self.S
            if len(self._pending) < needed + (0 if self.chunk_count == 0 else 1):
                # keep the overlap frame at the head of pending
                return
            take = self._pending[: self.chunk_frames]
            if len(take) < self.chunk_frames:
                return
            depth = np.stack([t[0] for t in take])
            color = np.stack([t[1] for t in take])
            self._process_chunk(depth, color)
            # drop consumed frames, keep the overlap frame
            self._pending = self._pending[self.S :]

    # ------------------------------------------------------------------
    # core per-chunk step
    # ------------------------------------------------------------------

    def _process_chunk(self, depth: np.ndarray, color: np.ndarray) -> None:
        bc = self.config.bundling
        ac = self.config.app
        c = self.chunk_count
        first_frame = c * self.S
        k_idx = c  # one keyframe per chunk
        _t_chunk_start = __import__("time").perf_counter()

        with self.timing.stage("chunk_local"):
            d_wire = jnp.asarray(depth)
            c_wire = jnp.asarray(color)
            res = chunk_mod.process_chunk(
                d_wire,
                c_wire,
                self.cam,
                self.cache_cam,
                bc,
                sigma_d=ac.depth_sigma_d,
                sigma_r=ac.depth_sigma_r,
                filter_depth=ac.depth_filter,
            )
            jax.block_until_ready(res.local_traj)

        self.gn_iters_executed += bc.local_gn_iters * 2  # 2 solve+prune rounds
        chunk_valid = bool(res.chunk_valid)
        local_traj = np.asarray(res.local_traj)
        self._local_trajs.append(local_traj)
        self._local_traj_dev = self._local_traj_dev.at[c].set(res.local_traj)

        # --- keyframe pose initialization (chain from previous keyframe) ---
        if k_idx == 0:
            init_pose = jnp.asarray(self.anchor)
            kf_valid = chunk_valid
        elif self._kf_valid(k_idx - 1) and chunk_valid and not self.tracking_lost:
            prev_pose = self.graph.poses[k_idx - 1]
            rel = jnp.asarray(self._local_trajs[k_idx - 1][-1])
            init_pose = prev_pose @ rel
            kf_valid = True
        else:
            init_pose = jnp.asarray(self.anchor)  # provisional; relocalization fixes it
            kf_valid = False

        with self.timing.stage("graph_add", block=(lambda: self.graph.poses) if self.profile else None):
            self.graph = global_graph.add_keyframe(
                self.graph,
                jnp.int32(k_idx),
                res.keyframe_keys,
                res.keyframe_cache,
                init_pose,
                jnp.asarray(kf_valid and chunk_valid),
            )

        # --- global matching: loop closure + relocalization ---
        relinked = False
        if k_idx > 0 and chunk_valid:
            with self.timing.stage("global_match"):
                mres = global_graph.global_match(
                    self.graph, jnp.int32(k_idx), self.cache_cam, bc
                )
                jax.block_until_ready(mres.any_valid)
            self.graph = mres.graph
            if bool(mres.any_valid) and not kf_valid:
                # relocalize: place the keyframe from its best global match
                j = int(mres.best_prev)
                T_rel = mres.transforms[j]  # j-cam -> new-cam
                pose = self.graph.poses[j] @ se3.mat_inverse(T_rel)
                self.graph = self.graph._replace(
                    poses=self.graph.poses.at[k_idx].set(pose),
                    valid=self.graph.valid.at[k_idx].set(True),
                )
                kf_valid = True
                relinked = True
            # (a chain-linked keyframe with no global match stays valid —
            # odometry mode; the reference likewise relies on later loop
            # closures rather than invalidating it)

        # --- tracking-lost state machine ---
        if chunk_valid and kf_valid:
            self.tracking_lost = False
            self.consecutive_invalid = 0
        else:
            self.consecutive_invalid += 1
            if self.consecutive_invalid >= bc.max_invalid_chunks_lost or not kf_valid:
                if chunk_valid and not kf_valid:
                    self.tracking_lost = True
            if self.tracking_lost or not chunk_valid:
                self.lost_chunks += 1
        reval = 0
        if relinked:
            self.tracking_lost = False
            self.consecutive_invalid = 0
            # relocalization succeeded: try to bring stale invalidated
            # keyframes back into the graph (reference revalidates frames
            # once the camera is found again, SURVEY.md §0 item 4); their
            # frames re-enter the TSDF via the trajectory manager's
            # integrate-only class on the next budgeted step
            with self.timing.stage("revalidate"):
                reval = self._revalidate_stale()

        # store LOCAL chunk validity only; keyframe validity comes live from
        # graph.valid at publish time, so a later revalidation of keyframe k
        # (relocalization) automatically revalidates its chunk's frames
        self._chunk_valid.append(chunk_valid)
        self._chunk_valid_dev = self._chunk_valid_dev.at[c].set(chunk_valid)
        integrate_now = chunk_valid and kf_valid
        self.num_keyframes = k_idx + 1

        # --- global BA ---
        if self.num_keyframes > 1:
            with self.timing.stage("global_solve", block=(lambda: self.graph.poses) if self.profile else None):
                if self.mesh is not None:
                    self.graph, removed = global_graph.global_solve_sharded(
                        self.graph, self.mesh, self.cache_cam, bc
                    )
                else:
                    self.graph, gstats, removed = global_graph.global_solve(
                        self.graph, self.cache_cam, bc
                    )
            self.gn_iters_executed += bc.global_gn_iters

        # --- publish optimized trajectory for all frames so far ---
        with self.timing.stage("publish", block=(lambda: self.traj.opt_pose) if self.profile else None):
            self._publish_trajectory()

        # --- stash the chunk's frames (wire format) in the device ring + the
        # host FrameStore, then integrate via the unified fuse program. The
        # ring and store hold the SAME bytes the fuse program dequantizes, so
        # a frame re-uploaded from the host years later de-integrates exactly.
        lo = 0 if c == 0 else 1
        new_local = np.arange(lo, self.chunk_frames)
        new_ids = [int(first_frame + i) for i in new_local]
        if ac.integrate_filtered_depth:
            d16_chunk = _quantize_depth16(res.frames.depth)
        else:
            d16_chunk = d_wire
        slots = self._ring_assign(new_ids)
        slots_a = jnp.asarray(slots, jnp.int32)
        self._hist_d16 = self._hist_d16.at[slots_a].set(d16_chunk[lo:])
        self._hist_c8 = self._hist_c8.at[slots_a].set(c_wire[lo:])
        self.num_frames = max(self.num_frames, new_ids[-1] + 1)
        # host authority copies (one depth download per chunk only when
        # integrating filtered depth; the raw path reuses the input arrays)
        d16_host = np.asarray(d16_chunk) if ac.integrate_filtered_depth else depth
        for i, f in zip(new_local, new_ids):
            self._frame_store[f] = (d16_host[i], color[i])

        diag = None
        if integrate_now:
            with self.timing.stage("integrate", block=(lambda: self.table.weight) if self.profile else None):
                self.table, self.traj, self._upd_masks, diag, nblk = _fuse_frames(
                    self.table,
                    self.traj,
                    self._upd_masks,
                    self._hist_d16,
                    self._hist_c8,
                    slots_a,
                    jnp.asarray(new_ids, jnp.int32),
                    jnp.zeros(len(new_ids), bool),
                    jnp.ones(len(new_ids), bool),
                    self.cam,
                    ac,
                )
                self.blocks_updated = self.blocks_updated + nblk

        # --- budgeted re-integration (the paper's key trick) ---
        with self.timing.stage("reint_plan_apply"):
            n_reint, reint_overflow = self._reintegrate(
                ac.max_reintegrations_per_frame * self.S
            )

        # --- TSDF garbage collection: after de-integration, fully unobserved
        # blocks return capacity to the pool (reference GCs per frame) ---
        freed = None
        if ac.gc_every_chunks and (c + 1) % ac.gc_every_chunks == 0:
            self.table, freed = self._gc_jit(self.table)

        # --- out-of-core streaming: evict far blocks / restore near ones
        # around the current camera (reference: interleaved with integration) ---
        active_blocks = int(self.table.num_active())
        if ac.streaming_enabled and integrate_now:
            from ..fusion import streaming

            cam_pos = np.asarray(self.graph.poses[k_idx])[:3, 3]
            n_in = n_out = 0
            with self.timing.stage("streaming"):
                if len(self.block_store):
                    self.table, n_in = streaming.stream_in(
                        self.table,
                        self.block_store,
                        cam_pos,
                        ac,
                        free_capacity=ac.block_capacity - active_blocks,
                    )
                    active_blocks += n_in
                # stream-out engages only past the occupancy watermark so
                # small scenes never pay host traffic
                if active_blocks > ac.streaming_watermark * ac.block_capacity:
                    self.table, n_out = streaming.stream_out(
                        self.table, self.block_store, cam_pos, ac
                    )
                    active_blocks -= n_out
            if n_in or n_out:
                self.runlog.log(chunk=c, stream_in=n_in, stream_out=n_out,
                                host_blocks=len(self.block_store))

        self.runlog.log(
            chunk=c,
            chunk_valid=chunk_valid,
            kf_valid=kf_valid,
            num_keys=np.asarray(res.num_keys).tolist(),
            filtered_matches=int(np.asarray(res.num_matches).sum()),
            pairs_valid=int(np.asarray(res.pair_valid).sum()),
            tracking_lost=self.tracking_lost,
            active_blocks=active_blocks,
            corr_cursor=int(self.graph.corr_cursor),
            alloc_overflow=int(diag.overflow) if diag is not None else 0,
            patch_overflow=int(diag.patch_overflow) if diag is not None else 0,
            reint_frames=n_reint,
            reint_overflow=reint_overflow,
            revalidated=reval,
            gc_freed=int(freed) if freed is not None else 0,
            ring_uploads=self._ring_uploads_chunk,
        )
        self._ring_uploads_chunk = 0
        self.timing.record("whole_chunk_step", __import__("time").perf_counter() - _t_chunk_start)
        self.chunk_count += 1

    # ------------------------------------------------------------------

    def _kf_valid(self, k: int) -> bool:
        return bool(self.graph.valid[k])

    def _revalidate_stale(self, max_per_event: int = 8) -> int:
        """Re-match stale invalidated keyframes against the whole valid graph
        and revalidate the ones that link (relocalization aftermath). Returns
        the number revalidated. Only keyframes whose chunk solved locally are
        candidates — a chunk that failed its own local solve has no trusted
        local trajectory to publish."""
        bc = self.config.bundling
        n_re = 0
        # iterate to a fixpoint: a chunk that links only through a just-
        # revalidated neighbor recovers in a later round (chains of stale
        # chunks unwind one hop per round)
        for _ in range(max(1, self.num_keyframes)):
            valid_np = np.asarray(self.graph.valid[: self.num_keyframes])
            stale = [
                k
                for k in range(self.num_keyframes)
                if not valid_np[k] and self._chunk_valid[k]
            ]
            progressed = 0
            for k in stale[:max_per_event]:
                mres = global_graph.global_match(
                    self.graph, jnp.int32(k), self.cache_cam, bc, against_all=True
                )
                self.graph = mres.graph
                if bool(mres.any_valid):
                    j = int(mres.best_prev)
                    T_rel = mres.transforms[j]  # j-cam -> k-cam
                    pose = self.graph.poses[j] @ se3.mat_inverse(T_rel)
                    self.graph = self.graph._replace(
                        poses=self.graph.poses.at[k].set(pose),
                        valid=self.graph.valid.at[k].set(True),
                    )
                    progressed += 1
            n_re += progressed
            if not progressed:
                break
        return n_re

    def _publish_trajectory(self) -> None:
        """complete trajectory = keyframe pose ∘ local relative pose.

        One fixed-shape jitted program over the full chunk capacity — inactive
        chunk slots are masked, so the shape (and thus the compilation) never
        changes as the sequence grows.
        """
        if not self._local_trajs:
            return
        self.traj = _publish_all(
            self.traj,
            self._local_traj_dev,
            self._chunk_valid_dev,
            self.graph.poses,
            self.graph.valid,
            self.S,
            self.chunk_frames,
        )

    # ------------------------------------------------------------------
    # frame ring (device LRU cache over the host FrameStore)
    # ------------------------------------------------------------------

    def _ring_assign(self, frame_ids: list[int], protect: tuple | list = ()) -> list[int]:
        """Map frames to ring slots, evicting round-robin. Slots holding
        frames in `protect` (or assigned during this call) are never evicted.
        O(1) per eviction via the slot->frame reverse map."""
        protected = {self._hist_slot[f] for f in protect if f in self._hist_slot}
        out = []
        for f in frame_ids:
            if f in self._hist_slot:
                s = self._hist_slot[f]
            else:
                for _ in range(self.history_cap + 1):
                    s = self._hist_next % self.history_cap
                    self._hist_next += 1
                    if s not in protected:
                        break
                else:
                    raise RuntimeError("frame ring exhausted by protected slots")
                old = self._slot_frame.pop(s, None)
                if old is not None:
                    del self._hist_slot[old]
                self._hist_slot[f] = s
                self._slot_frame[s] = f
            protected.add(s)
            out.append(s)
        return out

    def _ring_ensure(self, frame_ids: list[int]) -> list[int]:
        """Guarantee every frame is ring-resident, re-uploading spilled frames
        from the host FrameStore in one batched device write."""
        missing = [f for f in frame_ids if f not in self._hist_slot]
        if missing:
            slots = self._ring_assign(missing, protect=frame_ids)
            d = np.stack([self._frame_store[f][0] for f in missing])
            cc = np.stack([self._frame_store[f][1] for f in missing])
            sa = jnp.asarray(slots, jnp.int32)
            self._hist_d16 = self._hist_d16.at[sa].set(jnp.asarray(d))
            self._hist_c8 = self._hist_c8.at[sa].set(jnp.asarray(cc))
            self._ring_uploads_chunk += len(missing)
        return [self._hist_slot[f] for f in frame_ids]

    def _reintegrate(self, budget: int) -> tuple[int, int]:
        """Apply one budgeted de/re-integration step (SURVEY.md §3.4): plan on
        device, one host sync for the work list, re-upload any spilled frames
        into the ring, then ONE fused device program (gather + de-integrate +
        re-integrate + bookkeeping). Every planned frame is actionable — the
        host FrameStore holds the whole sequence, so re-integration has no
        history horizon. Returns (frames touched, alloc overflow)."""
        # the work list must fit the ring alongside nothing else (all planned
        # frames are ring-pinned during the fused program)
        budget = min(budget, self.history_cap)
        if budget <= 0:
            return 0, 0
        plan = trajectory.plan_reintegration(self.traj, budget)
        frames_np, deint_np, reint_np = jax.device_get(
            (plan.frames, plan.deint_mask, plan.reint_mask)
        )  # one host sync per chunk
        work = deint_np | reint_np
        if not work.any():
            return 0, 0
        ids = [int(f) for f in frames_np[work]]
        deint = [bool(x) for x in deint_np[work]]
        reint = [bool(x) for x in reint_np[work]]
        slots = self._ring_ensure(ids)
        pad = budget - len(ids)
        ids_p = np.array(ids + ids[:1] * pad, np.int32)
        slots_p = np.array(slots + slots[:1] * pad, np.int32)
        deint_p = np.array(deint + [False] * pad)
        reint_p = np.array(reint + [False] * pad)
        with self.timing.stage("reint_apply", block=(lambda: self.table.weight) if self.profile else None):
            self.table, self.traj, self._upd_masks, diag, nblk = _fuse_frames(
                self.table,
                self.traj,
                self._upd_masks,
                self._hist_d16,
                self._hist_c8,
                jnp.asarray(slots_p),
                jnp.asarray(ids_p),
                jnp.asarray(deint_p),
                jnp.asarray(reint_p),
                self.cam,
                self.config.app,
            )
            self.blocks_updated = self.blocks_updated + nblk
        return len(ids), int(diag.overflow)

    # ------------------------------------------------------------------
    # outputs
    # ------------------------------------------------------------------

    def flush(self) -> None:
        """Process any tail frames as a final (possibly short) chunk by
        repeating the last frame to fill the chunk capacity. After chunk 0,
        `_pending` always starts with the overlap frame (already processed),
        so >= 2 pending means there is at least one genuinely new frame."""
        if 2 <= len(self._pending) < self.chunk_frames:
            last = self._pending[-1]
            while len(self._pending) < self.chunk_frames:
                self._pending.append(last)
            self._maybe_process_chunk()
        # end-of-sequence recovery: one final revalidation sweep + enough
        # budgeted re-integration steps to drain the integrate-only backlog
        if self.num_keyframes > 1:
            if self._revalidate_stale():
                if self.mesh is not None:
                    self.graph, _ = global_graph.global_solve_sharded(
                        self.graph, self.mesh, self.cache_cam, self.config.bundling
                    )
                else:
                    self.graph, _, _ = global_graph.global_solve(
                        self.graph, self.cache_cam, self.config.bundling
                    )
                self._publish_trajectory()
                budget = self.config.app.max_reintegrations_per_frame * self.S
                for _ in range(max(1, self.num_keyframes)):
                    if self._reintegrate(budget)[0] == 0:
                        break

    def current_poses(self) -> tuple[np.ndarray, np.ndarray]:
        n = self.num_frames
        return (
            np.asarray(self.traj.opt_pose[:n]),
            np.asarray(self.traj.opt_valid[:n]),
        )

    def extract_mesh(self):
        """Mesh the whole scene. Streaming-aware, like the reference's MC
        variant that loops CPU-resident chunks: host-resident cold blocks are
        paged through a scratch table batch-by-batch (without disturbing the
        store), so the final mesh covers every room the camera visited, not
        just the blocks currently on the device. Blocks meshed in different
        batches can leave hairline cracks at their shared faces (the
        reference's chunked MC has the same property)."""
        ac = self.config.app
        mesh_parts = [marching_cubes.extract_mesh(self.table, ac)]
        if len(self.block_store):
            batch = 2048
            cap = ((batch + 127) // 128) * 128
            for keys, sdf, wgt, col in self.block_store.snapshot_batches(batch):
                t = blocks.make_table(cap)
                t, _ = blocks.allocate(t, jnp.asarray(keys))
                slots, found = blocks.lookup(t, jnp.asarray(keys))
                t = t._replace(
                    sdf=t.sdf.at[slots].set(jnp.asarray(sdf)),
                    weight=t.weight.at[slots].set(jnp.asarray(wgt)),
                    color=t.color.at[slots].set(jnp.asarray(col)),
                )
                mesh_parts.append(marching_cubes.extract_mesh(t, ac))
        if len(mesh_parts) == 1:
            return mesh_parts[0]
        verts, cols, faces, off = [], [], [], 0
        for v, c, f in mesh_parts:
            verts.append(v)
            cols.append(c)
            faces.append(f + off)
            off += len(v)
        return (
            np.concatenate(verts),
            np.concatenate(cols),
            np.concatenate(faces),
        )

    def render_preview(self, pose: np.ndarray, width: int = 0, height: int = 0):
        ac = self.config.app
        cam = self.cam if not width else self.cam.scaled(width, height)
        res = raycast.raycast(self.table, jnp.asarray(pose), cam, ac)
        return np.asarray(raycast.shade_preview(res))

    def outputs(self) -> PipelineOutputs:
        poses, valid = self.current_poses()
        return PipelineOutputs(
            poses=poses,
            valid=valid,
            num_keyframes=self.num_keyframes,
            tracking_lost_chunks=self.lost_chunks,
        )


def run_sequence(
    replayer,
    config: Config | None = None,
    anchor_pose: np.ndarray | None = None,
    log_path: str | None = None,
) -> tuple[BundleFusion, PipelineOutputs]:
    """Replay an entire sequence through the pipeline (the offline analog of
    the reference's main loop)."""
    bf = BundleFusion(replayer.camera, config, log_path=log_path, anchor_pose=anchor_pose)
    for batch in replayer:
        bf.push_batch(batch.depth, batch.color, batch.valid)
    bf.flush()
    return bf, bf.outputs()
