"""Offline matching harness — the rebuild of ``TestMatching.h/.cpp``.

The reference's developer tool re-runs match -> filter -> solve offline on
logged data to debug the trickiest stage (SURVEY.md §4). This CLI does the
same against any input source: pick two frames, run SIFT + matching + the
3-stage filter, print statistics, and dump overlay images.

    python tools/offline_matching.py --synthetic 8 --frames 0 5 --out /tmp/match
    python tools/offline_matching.py --sens scan.sens --frames 0 30 --out /tmp/match
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--sens")
    src.add_argument("--tum")
    src.add_argument("--synthetic", type=int)
    p.add_argument("--frames", type=int, nargs=2, default=[0, 1])
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--out", default="/tmp/offline_matching")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bundlefusion_tpu import visualization as viz
    from bundlefusion_tpu.config import BundlingConfig
    from bundlefusion_tpu.features import filters, matcher, sift
    from bundlefusion_tpu.geometry import se3
    from bundlefusion_tpu.io.replayer import SensSource, SyntheticSource, TumSource
    from bundlefusion_tpu.ops.preprocess import preprocess_frames

    if args.sens:
        source = SensSource(args.sens)
    elif args.tum:
        from bundlefusion_tpu.io.tum import load_tum_sequence

        source = TumSource(load_tum_sequence(args.tum))
    else:
        from bundlefusion_tpu.io.synthetic import generate_sequence

        source = SyntheticSource(
            generate_sequence(args.synthetic, width=args.width, height=args.height)
        )

    cam = source.camera
    cfg = BundlingConfig(
        cache_width=max(cam.width // 4, 8),
        cache_height=max(cam.height // 4, 8),
        verify_width=max(cam.width // 4, 8),
        verify_height=max(cam.height // 4, 8),
    )
    fa, fb = args.frames
    da, ca = source.get(fa)
    db, cb = source.get(fb)
    depth = jnp.asarray(np.stack([da, db]))
    color = jnp.asarray(np.stack([ca, cb]))
    cache_cam = cam.scaled(cfg.cache_width, cfg.cache_height)
    frames, cache = preprocess_frames(depth, color, cam, cache_cam)
    keys = sift.detect_batch(frames.intensity, frames.depth, cam, cfg)
    k0 = jax.tree.map(lambda x: x[0], keys)
    k1 = jax.tree.map(lambda x: x[1], keys)
    m = matcher.match_pair(k0, k1, cfg)
    pa = k0.p3d[m.idx_i]
    pb = k1.p3d[m.idx_j]
    c0 = jax.tree.map(lambda x: x[0], cache)
    c1 = jax.tree.map(lambda x: x[1], cache)
    res = filters.filter_pair(
        pa, pb, m, c0, c1, cache_cam, cfg, cfg.min_matches_local
    )
    ang = float(jnp.linalg.norm(se3.se3_log(res.transform)[:3]))

    os.makedirs(args.out, exist_ok=True)
    viz.save_keypoint_image(os.path.join(args.out, f"keys_{fa}.png"), ca, k0)
    viz.save_keypoint_image(os.path.join(args.out, f"keys_{fb}.png"), cb, k1)
    viz.save_match_image(os.path.join(args.out, "matches_raw.png"), ca, cb, k0, k1, m)
    viz.save_match_image(
        os.path.join(args.out, "matches_filtered.png"), ca, cb, k0, k1, res.matches
    )
    stats = {
        "keys_a": int(k0.valid.sum()),
        "keys_b": int(k1.valid.sum()),
        "raw_matches": int(m.count()),
        "filtered_matches": int(res.matches.count()),
        "pair_valid": bool(res.pair_valid),
        "inliers": int(res.inlier_count),
        "relative_rotation_rad": ang,
        "relative_translation_m": float(jnp.linalg.norm(res.transform[:3, 3])),
    }
    print(json.dumps(stats, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
