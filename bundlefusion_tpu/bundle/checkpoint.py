"""Checkpoint / resume for the whole pipeline state.

The reference has no mid-run persistence (SURVEY.md §5 "Checkpoint/resume" —
resume = replay the .sens from scratch). The rebuild's entire pipeline state
is a pytree plus a handful of host counters, so checkpointing is exact: save
every N chunks, restore, continue bit-for-bit (modulo the frame replay
buffer, which the caller re-feeds from the dataset).
"""

from __future__ import annotations

import json
import os
import pickle

import jax
import numpy as np

from .pipeline import BundleFusion


def save_checkpoint(bf: BundleFusion, path: str) -> None:
    """Serialize the full pipeline state to one file."""
    bf.sync()  # drain the async ingest stage: state must be coherent
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    device_state = {
        "table": jax.tree.map(np.asarray, bf.table),
        "graph": jax.tree.map(np.asarray, bf.graph),
        "traj": jax.tree.map(np.asarray, bf.traj),
        "ctrl": jax.tree.map(np.asarray, bf.ctrl),
        "hist_d16": np.asarray(bf._hist_d16),
        "hist_c8": np.asarray(bf._hist_c8),
        "ring_frame": np.asarray(bf._ring_frame),
        "upd_masks": np.asarray(bf._upd_masks),
        "upd_keys": np.asarray(bf._upd_keys),
        "local_traj_dev": np.asarray(bf._local_traj_dev),
        "chunk_valid_dev": np.asarray(bf._chunk_valid_dev),
        "runlog_dev": np.asarray(bf._runlog_dev),
    }
    host_state = {
        "num_frames": bf.num_frames,
        "num_keyframes": bf.num_keyframes,
        "chunk_count": bf.chunk_count,
        "next_fid": bf._next_fid,
        "anchor": bf.anchor,
        "frame_store": bf._frame_store,
        "config_json": bf.config.to_json(),
        "camera": tuple(bf.cam),
        "blocks_updated": float(bf.blocks_updated),
        "gc_freed_total": float(bf._gc_freed_total),
        "gn_iters_executed": bf.gn_iters_executed,
        "reloc_seen": bf._reloc_seen,
        "streaming_on": bf._streaming_on,
        "ring_uploads": bf._ring_uploads,
        "block_store": bf.block_store,
    }
    with open(path, "wb") as f:
        pickle.dump({"device": device_state, "host": host_state}, f)


def load_checkpoint(path: str) -> BundleFusion:
    """Restore a pipeline from a checkpoint; ready to keep consuming frames."""
    import jax.numpy as jnp

    from ..config import Config
    from ..geometry.camera import CameraModel

    with open(path, "rb") as f:
        data = pickle.load(f)
    host = data["host"]
    cfg = Config.from_json(host["config_json"])
    cam = CameraModel(*host["camera"])
    bf = BundleFusion(cam, cfg, anchor_pose=host["anchor"])
    dev = data["device"]
    bf.table = jax.tree.map(jnp.asarray, dev["table"])
    bf.graph = jax.tree.map(jnp.asarray, dev["graph"])
    bf.traj = jax.tree.map(jnp.asarray, dev["traj"])
    bf.ctrl = jax.tree.map(jnp.asarray, dev["ctrl"])
    bf.num_frames = host["num_frames"]
    bf.num_keyframes = host["num_keyframes"]
    bf.chunk_count = host["chunk_count"]
    bf._next_fid = host["next_fid"]
    bf._frame_store = host["frame_store"]
    bf._hist_d16 = jnp.asarray(dev["hist_d16"])
    bf._hist_c8 = jnp.asarray(dev["hist_c8"])
    bf._ring_frame = jnp.asarray(dev["ring_frame"])
    bf._upd_masks = jnp.asarray(dev["upd_masks"])
    if "upd_keys" in dev:
        bf._upd_keys = jnp.asarray(dev["upd_keys"])
    bf._local_traj_dev = jnp.asarray(dev["local_traj_dev"])
    bf._chunk_valid_dev = jnp.asarray(dev["chunk_valid_dev"])
    bf._runlog_dev = jnp.asarray(dev["runlog_dev"])
    bf.blocks_updated = jnp.float32(host.get("blocks_updated", 0.0))
    bf._gc_freed_total = jnp.float32(host.get("gc_freed_total", 0.0))
    bf.gn_iters_executed = host.get("gn_iters_executed", 0)
    bf._reloc_seen = host.get("reloc_seen", 0)
    bf._streaming_on = host.get("streaming_on", False)
    bf._ring_uploads = host.get("ring_uploads", 0)
    if host.get("block_store") is not None:
        bf.block_store = host["block_store"]
    return bf
