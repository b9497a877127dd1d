"""Multi-chip global bundle adjustment (SURVEY.md §2.2 "TP" / §5 long-context).

When the keyframe graph outgrows one chip, the normal-equation system is
distributed two ways, both expressed with `shard_map` + XLA collectives over
ICI:

  * **residual-parallel assembly** (DP over correspondences): each device
    scatters its correspondence shard into a local [6N, 6N] partial system;
    one `psum` makes it whole. This is the TPU analog of the reference's
    atomic global JtJ accumulation — except deterministic.
  * **row-sharded PCG** (TP over pose blocks): H lives row-sharded
    [6N/d, 6N]; each PCG matvec computes its row block locally and
    `all_gather`s the result; scalar reductions ride `psum`. The search
    vectors stay replicated (6N floats — tiny traffic vs. the matvec).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import BundlingConfig
from ..solver import residuals
from ..solver.system import assemble_system


def assemble_system_sharded(
    mesh: Mesh,
    num_images: int,
    corrs: residuals.SparseCorrs,  # leading axis shardable over 'seq'
    poses: jax.Array,  # [N, 4, 4] replicated
    free_mask: jax.Array,  # [N] replicated
    weight_sparse: float,
    axis: str = "seq",
):
    """Residual-parallel assembly: correspondence shards -> psum'd (H, b)."""

    def local_assemble(poses_l, corrs_l, free_l):
        JtJ, Jtr, _ = residuals.sparse_corr_blocks(poses_l, corrs_l, weight_sparse)
        H, b = assemble_system(
            num_images, corrs_l.img_a, corrs_l.img_b, JtJ, Jtr, free_l, damping=0.0
        )
        # each shard built gauge rows/damping-free partials; sum then re-apply
        H = jax.lax.psum(H, axis)
        b = jax.lax.psum(b, axis)
        # undo the per-shard identity added for fixed rows (added d times)
        d = jax.lax.psum(jnp.ones(()), axis)
        fm = jnp.repeat(free_l.astype(H.dtype), 6)
        H = H - jnp.diag((d - 1.0) * (1.0 - fm))
        return H, b

    fn = shard_map(
        local_assemble,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
    )
    return fn(poses, corrs, free_mask)


@functools.partial(jax.jit, static_argnames=("mesh", "num_iters", "axis"))
def pcg_solve_rowsharded(
    mesh: Mesh,
    H: jax.Array,  # [6N, 6N] (sharded or replicated; respec'd by shard_map)
    b: jax.Array,  # [6N]
    num_iters: int,
    axis: str = "seq",
) -> jax.Array:
    """Row-sharded Jacobi-PCG: matvec = local row block + all_gather."""

    def body_fn(H_blk, b_full):
        n = b_full.shape[0]
        rows = H_blk.shape[0]
        idx = jax.lax.axis_index(axis)
        row0 = idx * rows
        diag = jnp.diagonal(jax.lax.dynamic_slice(H_blk, (0, row0), (rows, rows)))
        diag_full = jax.lax.all_gather(diag, axis, tiled=True)
        Minv = jnp.where(jnp.abs(diag_full) > 1e-12, 1.0 / diag_full, 0.0)

        def matvec(p):
            Ap_blk = H_blk @ p
            return jax.lax.all_gather(Ap_blk, axis, tiled=True)

        x = jnp.zeros_like(b_full)
        r = b_full
        z = Minv * r
        p = z
        rz = jnp.dot(r, z)
        # unify varying-axis types: x and r descend from the replicated b,
        # while the loop writes them with device-varying values (via H_blk)
        x = jax.lax.pcast(x, axis, to="varying")
        r = jax.lax.pcast(r, axis, to="varying")

        def it(_, carry):
            x, r, p, rz = carry
            active = rz > 1e-10
            Ap = matvec(p)
            pAp = jnp.dot(p, Ap)
            alpha = jnp.where(active & (jnp.abs(pAp) > 1e-20), rz / pAp, 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = Minv * r
            rz_new = jnp.dot(r, z)
            beta = jnp.where(active & (rz > 1e-20), rz_new / rz, 0.0)
            p = jnp.where(active, z + beta * p, p)
            rz = jnp.where(active, rz_new, rz)
            return x, r, p, rz

        x, _, _, _ = jax.lax.fori_loop(0, num_iters, it, (x, r, p, rz))
        return x

    # the returned x is bitwise identical on every device (all devices run the
    # same reduction arithmetic on all_gathered operands) but carries a
    # 'varying' vma type; check_vma=False asserts the replication we know holds
    fn = shard_map(
        body_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(H, b)


def global_solve_sharded(
    mesh: Mesh,
    poses: jax.Array,  # [N, 4, 4]
    corrs: residuals.SparseCorrs,
    free_mask: jax.Array,
    cfg: BundlingConfig,
    gn_iters: int | None = None,
    pcg_iters: int | None = None,
    axis: str = "seq",
) -> jax.Array:
    """Sharded sparse global BA: DP assembly + TP PCG per GN iteration.

    The correspondence capacity must divide the mesh size; 6N must divide it
    too (pad N up if needed). Returns updated poses (replicated).
    """
    from ..geometry import se3

    n = poses.shape[0]
    gn_iters = gn_iters or cfg.global_gn_iters
    pcg_iters = pcg_iters or cfg.global_pcg_iters
    for _ in range(gn_iters):
        H, b = assemble_system_sharded(
            mesh, n, corrs, poses, free_mask, cfg.weight_sparse, axis
        )
        # re-apply damping once (assemble_sharded leaves it to the caller)
        diag = jnp.diagonal(H)
        H = H + jnp.diag(1e-6 * diag + 1e-8)
        x = pcg_solve_rowsharded(mesh, H, b, pcg_iters, axis)
        delta = x.reshape(n, 6)
        upd = se3.se3_exp(delta)
        new_poses = jnp.einsum("nij,njk->nik", upd, poses)
        poses = jnp.where(free_mask[:, None, None], new_poses, poses)
    return poses


def _pad_to_multiple(x: jax.Array, d: int) -> jax.Array:
    r = (-x.shape[0]) % d
    if r == 0:
        return x
    return jnp.concatenate([x, jnp.zeros((r,) + x.shape[1:], x.dtype)])


def solve_and_prune_sharded(
    mesh: Mesh,
    poses: jax.Array,  # [N, 4, 4]
    problem,  # gn.GNProblem
    caches,  # FrameCache [N, ...] (replicated) or None
    cache_cam,
    cfg: BundlingConfig,
    gn_iters: int,
    pcg_iters: int,
    use_dense: bool = True,
    prune_rounds: int = 1,
    axis: str = "seq",
):
    """The multi-chip counterpart of ``gn.solve_and_prune`` — the PRODUCT
    path the pipeline routes global BA through when a device mesh is
    configured, not a demo: sparse + dense terms, per-iteration dense weight
    ramp, and post-solve max-residual pruning.

    Sharding plan (SURVEY.md §2.2 TP row):
      * correspondences AND dense pairs are sharded over `axis`; each device
        builds its partial normal equations, one `psum` makes them whole
        (deterministic replacement of the reference's atomic accumulation);
      * PCG runs row-sharded with `all_gather` matvecs;
      * residual evaluation for pruning is replicated (tiny vs the solve).
    Returns (poses, problem, total_removed) like the serial path.
    """
    from ..geometry import se3
    from ..solver import gn as gn_mod

    d = mesh.devices.size
    n = poses.shape[0]
    corrs0 = problem.corrs
    corrs_p = jax.tree.map(lambda x: _pad_to_multiple(x, d), corrs0)
    dp_a = _pad_to_multiple(problem.dense_pairs_a, d)
    dp_b = _pad_to_multiple(problem.dense_pairs_b, d)
    dp_on = _pad_to_multiple(problem.dense_pair_active, d)
    r_real = corrs0.weight.shape[0]

    if cfg.dense_weight_ramp and gn_iters > 1:
        ramp = [(i + 1.0) / gn_iters for i in range(gn_iters)]
    else:
        ramp = [1.0] * gn_iters

    def local_system(poses_l, corrs_l, dpa_l, dpb_l, don_l, free_l, scale):
        JtJ, Jtr, _ = residuals.sparse_corr_blocks(poses_l, corrs_l, cfg.weight_sparse)
        idx_a, idx_b = corrs_l.img_a, corrs_l.img_b
        if use_dense and caches is not None:
            dJtJ, dJtr, _ = residuals.dense_pair_blocks(
                poses_l, dpa_l, dpb_l, don_l, caches, cache_cam, cfg,
                cfg.weight_dense_depth * scale, cfg.weight_dense_color * scale,
            )
            idx_a = jnp.concatenate([idx_a, dpa_l])
            idx_b = jnp.concatenate([idx_b, dpb_l])
            JtJ = jnp.concatenate([JtJ, dJtJ])
            Jtr = jnp.concatenate([Jtr, dJtr])
        H, b = assemble_system(n, idx_a, idx_b, JtJ, Jtr, free_l, damping=0.0)
        H = jax.lax.psum(H, axis)
        b = jax.lax.psum(b, axis)
        dd = jax.lax.psum(jnp.ones(()), axis)
        fm = jnp.repeat(free_l.astype(H.dtype), 6)
        H = H - jnp.diag((dd - 1.0) * (1.0 - fm))
        return H, b

    total_removed = jnp.int32(0)
    weight = corrs_p.weight
    for _ in range(prune_rounds):
        for scale in ramp:
            fn = shard_map(
                functools.partial(local_system, scale=scale),
                mesh=mesh,
                in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
                out_specs=(P(), P()),
            )
            H, b = fn(
                poses,
                corrs_p._replace(weight=weight),
                dp_a,
                dp_b,
                dp_on,
                problem.free_mask,
            )
            diag = jnp.diagonal(H)
            H = H + jnp.diag(1e-6 * diag + 1e-8)
            x = pcg_solve_rowsharded(mesh, H, b, pcg_iters, axis)
            delta = x.reshape(n, 6)
            upd = se3.se3_exp(delta)
            new_poses = jnp.einsum("nij,njk->nik", upd, poses)
            poses = jnp.where(problem.free_mask[:, None, None], new_poses, poses)
        # post-solve max-residual pruning (replicated — negligible cost)
        _, _, res_norms = residuals.sparse_residuals(
            poses, corrs_p._replace(weight=weight)
        )
        pruned, removed = gn_mod.prune_max_residuals(
            corrs_p._replace(weight=weight),
            res_norms,
            cfg.max_res_thresh,
            cfg.prune_iters,
        )
        weight = pruned.weight
        total_removed = total_removed + removed
    problem = problem._replace(
        corrs=corrs0._replace(weight=weight[:r_real])
    )
    return poses, problem, total_removed
