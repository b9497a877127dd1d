"""Per-stage device-time profiler for the chunk hot path on the real chip.

Times each sub-stage of ``process_chunk`` (preprocess, SIFT, match, filter,
local BA) and the fused TSDF step as separate jitted programs using pure
``block_until_ready`` waits (no readbacks — the tunnel's fast upload mode
survives). Run: ``python tools/profile_stages.py [width height]``.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def bench_fn(fn, args, reps=6, warm=2, vary=None):
    """Times fn over `reps` calls (block_until_ready on all outputs; no
    readbacks). `vary(args, i) -> args` perturbs the inputs per rep so a
    result-memoizing execution layer (the axon terminal caches pure
    executable+args repeats) cannot short-circuit the measurement."""
    import jax
    import jax.numpy as jnp

    if vary is None:

        def vary(a, i):
            # default perturbation: nudge float leaves by a rep-dependent
            # epsilon, flip the low bit of integer image leaves — enough to
            # change the args hash, far below any algorithmic threshold
            def leaf(x):
                if not hasattr(x, "dtype") or x.size > 20_000_000:
                    return x  # leave the multi-GB pools alone (args differ anyway)
                if jnp.issubdtype(x.dtype, jnp.floating):
                    return x + jnp.asarray(i * 1e-6, x.dtype)
                if x.dtype in (jnp.uint16, jnp.uint8) and x.ndim >= 2:
                    return x ^ jnp.asarray(i % 2, x.dtype)
                return x

            return jax.tree.map(leaf, a)

    variants = [vary(args, i) if vary else args for i in range(max(warm, reps))]
    for i in range(warm):
        out = fn(*variants[-1 - i])
    jax.block_until_ready((out, variants))
    t0 = time.perf_counter()
    out = None
    for i in range(reps):
        # keep only the newest output ref: the single device executes the
        # queue in order regardless, and dropping old refs frees multi-GB
        # results (holding 6 updated block tables OOMs the chip)
        out = fn(*variants[i])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from bundlefusion_tpu.bundle.chunk import _chunk_pairs, process_chunk
    from bundlefusion_tpu.config import AppConfig, BundlingConfig, Config
    from bundlefusion_tpu.features import filters, matcher, sift
    from bundlefusion_tpu.geometry.camera import CameraModel
    from bundlefusion_tpu.io.synthetic import generate_sequence
    from bundlefusion_tpu.ops.preprocess import preprocess_frames
    from bundlefusion_tpu.solver import gn, residuals

    w = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 480
    cfg = BundlingConfig(
        submap_size=10,
        max_num_images=128,
        max_keys_per_image=512,
        sift_octaves=3,
        cache_width=80,
        cache_height=60,
        verify_width=80,
        verify_height=60,
        verify_ok_fraction=0.45,
        verify_color_thresh=0.08,
    )
    s1 = cfg.submap_size + 1
    seq = generate_sequence(s1, width=w, height=h, radius=0.5)
    cam = seq.camera
    cache_cam = cam.scaled(cfg.cache_width, cfg.cache_height)

    # wire-format inputs, matching the product path
    d16 = jnp.asarray((seq.depth * 1000).astype(np.uint16))
    c8 = jnp.asarray((seq.color * 255).astype(np.uint8))

    # Force STRICT sync semantics: on the axon tunnel, block_until_ready is a
    # no-op (async handle only) until the process performs its first real
    # device->host readback; stage timings measured before that are dispatch
    # costs, not compute. One 4-byte readback here makes every later
    # block_until_ready a true wait (uploads degrade, but all profile inputs
    # are device-resident already).
    np.asarray(jnp.zeros(1) + 1)

    print(f"== {w}x{h}, chunk of {s1} frames ==", flush=True)

    # stage 1: preprocess
    @jax.jit
    def st_pre(d, c):
        f, cache = preprocess_frames(
            d.astype(jnp.float32) * 1e-3,
            c.astype(jnp.float32) / 255.0,
            cam,
            cache_cam,
            sigma_d=2.0,
            sigma_r=0.1,
            filter_depth=True,
        )
        return f, cache

    t = bench_fn(st_pre, (d16, c8))
    print(f"preprocess           {t*1e3:8.1f} ms", flush=True)
    frames, cache = st_pre(d16, c8)
    jax.block_until_ready(frames)

    # stage 2: SIFT
    @jax.jit
    def st_sift(intensity, depth):
        return sift.detect_batch(intensity, depth, cam, cfg)

    t = bench_fn(st_sift, (frames.intensity, frames.depth))
    print(f"sift                 {t*1e3:8.1f} ms", flush=True)
    keys = st_sift(frames.intensity, frames.depth)
    jax.block_until_ready(keys)

    pairs_a, pairs_b = _chunk_pairs(s1)

    # stage 3: matcher
    @jax.jit
    def st_match(keys):
        return matcher.match_all_pairs(keys, pairs_a, pairs_b, cfg)

    t = bench_fn(st_match, (keys,))
    print(f"match_all_pairs      {t*1e3:8.1f} ms", flush=True)
    m = st_match(keys)
    jax.block_until_ready(m)

    # stage 4: filters
    @jax.jit
    def st_filt(keys, m, cache):
        pa, pb = matcher.gather_match_points(keys, pairs_a, pairs_b, m)
        ca = jax.tree.map(lambda x: x[pairs_a], cache)
        cb = jax.tree.map(lambda x: x[pairs_b], cache)
        return filters.filter_pairs_batch(
            pa, pb, m, ca, cb, cache_cam, cfg, cfg.min_matches_local
        )

    t = bench_fn(st_filt, (keys, m, cache))
    print(f"filters              {t*1e3:8.1f} ms", flush=True)
    filt = st_filt(keys, m, cache)
    jax.block_until_ready(filt.pair_valid)

    # stage 5: local BA
    @jax.jit
    def st_ba(keys, filt, cache):
        fm = filt.matches
        p_m = fm.valid.shape[1]
        pa_f = keys.p3d[pairs_a[:, None], fm.idx_i]
        pb_f = keys.p3d[pairs_b[:, None], fm.idx_j]
        corrs = residuals.SparseCorrs(
            img_a=jnp.repeat(pairs_a, p_m),
            img_b=jnp.repeat(pairs_b, p_m),
            p_a=pa_f.reshape(-1, 3),
            p_b=pb_f.reshape(-1, 3),
            weight=(fm.valid & filt.pair_valid[:, None])
            .reshape(-1)
            .astype(jnp.float32),
        )
        if corrs.weight.shape[0] > cfg.max_residuals_local:
            score = jnp.where(corrs.weight > 0, -(fm.dist.reshape(-1)), -jnp.inf)
            _, keep = jax.lax.top_k(score, cfg.max_residuals_local)
            corrs = jax.tree.map(lambda x: x[keep], corrs)
            corrs = corrs._replace(
                weight=jnp.where(jnp.isfinite(score[keep]), corrs.weight, 0.0)
            )
        init = jnp.broadcast_to(jnp.eye(4), (s1, 4, 4))
        problem = gn.GNProblem(
            corrs=corrs,
            dense_pairs_a=pairs_a,
            dense_pairs_b=pairs_b,
            dense_pair_active=filt.pair_valid,
            free_mask=jnp.arange(s1) > 0,
        )
        solved, _, stats, _ = gn.solve_and_prune(
            init,
            problem,
            cache,
            cache_cam,
            cfg,
            gn_iters=cfg.local_gn_iters,
            pcg_iters=cfg.local_pcg_iters,
            use_dense=cfg.use_dense_local,
            prune_rounds=2,
        )
        return solved, stats.sparse_res_sum

    t = bench_fn(st_ba, (keys, filt, cache))
    print(f"local BA (GN+prune)  {t*1e3:8.1f} ms", flush=True)

    # full fused chunk program (the product path)
    def st_full(d, c):
        r = process_chunk(d, c, cam, cache_cam, cfg)
        return r.local_traj, r.chunk_valid, r.keyframe_keys.valid

    t = bench_fn(st_full, (d16, c8))
    print(f"process_chunk FULL   {t*1e3:8.1f} ms", flush=True)

    # ---- fusion side: fuse_batch internals at bench shapes ----
    from bundlefusion_tpu.config import AppConfig
    from bundlefusion_tpu.fusion import blocks, tsdf

    ac = AppConfig(
        input_width=w,
        input_height=h,
        integration_width=w,
        integration_height=h,
        voxel_size=0.01,
        truncation=0.04,
        block_capacity=int(os.environ.get("PROF_BLOCKS", 262144)),
        blocks_per_frame_cap=4096,
    )
    budget = ac.max_reintegrations_per_frame * cfg.submap_size
    B = s1 + budget  # fuse_batch row count in the product pipeline
    depths = jnp.asarray(np.tile(np.asarray(seq.depth), (B // s1 + 1, 1, 1))[:B])
    colors = jnp.asarray(np.tile(np.asarray(seq.color), (B // s1 + 1, 1, 1, 1))[:B])
    poses = jnp.asarray(np.tile(np.asarray(seq.poses), (B // s1 + 1, 1, 1))[:B])
    # ~half the budget rows active (typical steady state: all new + some reint)
    active = jnp.asarray(np.arange(B) < s1 + budget // 2)

    @jax.jit
    def st_updkeys(depths, poses, active):
        return tsdf._upd_keys_batch(depths, poses, active, cam, ac)

    t = bench_fn(st_updkeys, (depths, poses, active))
    print(f"upd_keys_batch[{B}]  {t*1e3:8.1f} ms", flush=True)
    upd_keys_all, _ = st_updkeys(depths, poses, active)
    jax.block_until_ready(upd_keys_all)

    # variant: scan + cond (skip inactive rows at runtime)
    @jax.jit
    def st_updkeys_scan(depths, poses, active):
        from bundlefusion_tpu.fusion.blocks import INVALID_KEY, dedup_keys_counted

        def row(_, inp):
            d, p, ok = inp

            def live(_):
                keys = tsdf.frame_alloc_keys(d, p, cam, ac)
                return dedup_keys_counted(keys, ac.blocks_per_frame_cap)

            def dead(_):
                return (
                    jnp.full((ac.blocks_per_frame_cap,), INVALID_KEY, jnp.int32),
                    jnp.int32(0),
                )

            return 0, jax.lax.cond(ok, live, dead, None)

        _, (keys, truncs) = jax.lax.scan(row, 0, (depths, poses, active))
        return keys, truncs

    t = bench_fn(st_updkeys_scan, (depths, poses, active))
    print(f"upd_keys scan+cond   {t*1e3:8.1f} ms", flush=True)

    # variant: alloc_stride 4 (vmap)
    import dataclasses

    ac4 = dataclasses.replace(ac, alloc_stride=4)

    @jax.jit
    def st_updkeys_s4(depths, poses, active):
        return tsdf._upd_keys_batch(depths, poses, active, cam, ac4)

    t = bench_fn(st_updkeys_s4, (depths, poses, active))
    print(f"upd_keys stride4     {t*1e3:8.1f} ms", flush=True)

    table = blocks.make_table(ac.block_capacity)

    @jax.jit
    def st_alloc(table, upd_keys_all):
        union, ovf = tsdf._union_counted(upd_keys_all, ac.blocks_per_frame_cap * 4)
        return blocks.allocate(table, union)

    t = bench_fn(st_alloc, (table, upd_keys_all))
    print(f"union+allocate       {t*1e3:8.1f} ms", flush=True)
    table, _ = st_alloc(table, upd_keys_all)
    jax.block_until_ready(table.weight)

    @jax.jit
    def st_scan(table, depths, colors, poses, active, keys_rows):
        cap = ac.blocks_per_frame_cap
        tbl, masks, povf = tsdf._fuse_rows_scan(
            table, depths, colors,
            jnp.arange(B, dtype=jnp.int32), poses, active, keys_rows,
            jnp.ones((B, cap), bool), jnp.ones(B, jnp.float32), cam, ac,
        )
        return tbl.weight, masks

    t = bench_fn(st_scan, (table, depths, colors, poses, active, upd_keys_all), reps=3)
    print(f"fuse scan[{B} rows]  {t*1e3:8.1f} ms ({B} rows, {s1 + budget // 2} active)", flush=True)

    # the full product fuse_batch (2B rows: deint+reint)
    def st_fuse(table, depths, colors, poses, active):
        cap = ac.blocks_per_frame_cap
        deint = active & (jnp.arange(B) >= s1)
        tbl, diag = tsdf.fuse_batch(
            table, depths, colors, poses, poses, deint, active,
            jnp.ones((B, cap), bool), cam, ac, upd_keys_rec=upd_keys_all,
        )
        return tbl.weight, diag.upd_mask

    t = bench_fn(st_fuse, (table, depths, colors, poses, active), reps=3)
    print(f"fuse_batch FULL      {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
