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
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    device_state = {
        "table": jax.tree.map(np.asarray, bf.table),
        "graph": jax.tree.map(np.asarray, bf.graph),
        "traj": jax.tree.map(np.asarray, bf.traj),
        "hist_d16": np.asarray(bf._hist_d16),
        "hist_c8": np.asarray(bf._hist_c8),
        "upd_masks": np.asarray(bf._upd_masks),
        "local_traj_dev": np.asarray(bf._local_traj_dev),
        "chunk_valid_dev": np.asarray(bf._chunk_valid_dev),
    }
    host_state = {
        "num_frames": bf.num_frames,
        "num_keyframes": bf.num_keyframes,
        "chunk_count": bf.chunk_count,
        "tracking_lost": bf.tracking_lost,
        "lost_chunks": bf.lost_chunks,
        "consecutive_invalid": bf.consecutive_invalid,
        "anchor": bf.anchor,
        "local_trajs": bf._local_trajs,
        "chunk_valid": bf._chunk_valid,
        "hist_slot": bf._hist_slot,
        "hist_next": bf._hist_next,
        "frame_store": bf._frame_store,
        "config_json": bf.config.to_json(),
        "camera": tuple(bf.cam),
        "blocks_updated": float(bf.blocks_updated),
        "gn_iters_executed": bf.gn_iters_executed,
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
    bf.num_frames = host["num_frames"]
    bf.num_keyframes = host["num_keyframes"]
    bf.chunk_count = host["chunk_count"]
    bf.tracking_lost = host["tracking_lost"]
    bf.lost_chunks = host["lost_chunks"]
    bf.consecutive_invalid = host["consecutive_invalid"]
    bf._local_trajs = host["local_trajs"]
    bf._chunk_valid = host["chunk_valid"]
    bf._hist_slot = host["hist_slot"]
    bf._slot_frame = {s: f for f, s in host["hist_slot"].items()}
    bf._hist_next = host["hist_next"]
    bf._frame_store = host["frame_store"]
    bf._hist_d16 = jnp.asarray(dev["hist_d16"])
    bf._hist_c8 = jnp.asarray(dev["hist_c8"])
    bf._upd_masks = jnp.asarray(dev["upd_masks"])
    bf._local_traj_dev = jnp.asarray(dev["local_traj_dev"])
    bf._chunk_valid_dev = jnp.asarray(dev["chunk_valid_dev"])
    bf.blocks_updated = jnp.float32(host.get("blocks_updated", 0.0))
    bf.gn_iters_executed = host.get("gn_iters_executed", 0)
    if host.get("block_store") is not None:
        bf.block_store = host["block_store"]
    return bf
