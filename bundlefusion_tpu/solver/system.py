"""Normal-equation assembly and PCG linear solver.

Rebuild of ``CUDASolverBundling/CUDASolverBundling.cpp`` (SolverState layout,
PCG vectors) and the PCG kernels in ``SolverBundling.cu`` (``PCGInit_Kernel*``,
``PCGStep_Kernel1/2/3``; SURVEY.md §2.1 "BA solver host wrapper"/"BA kernels").

TPU formulation: instead of a matrix-free PCG with per-residual atomics, the
per-pair 12x12 blocks (sparse + dense, from ``residuals.py``) are scattered
once into a dense [6N, 6N] system, and PCG runs with plain MXU matvecs. For
the reference's scales (11 local poses, <=512 keyframes -> 6N <= 3072) the
dense system is tiny by TPU standards, the matvec is one fused matmul, and
determinism is free. The sharded multi-chip variant (keyframe rows sharded,
psum-reduced matvec) lives in ``parallel/``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def assemble_system(
    num_images: int,
    pairs_a: jax.Array,  # [P]
    pairs_b: jax.Array,  # [P]
    JtJ_pairs: jax.Array,  # [P, 12, 12]
    Jtr_pairs: jax.Array,  # [P, 12]
    free_mask: jax.Array,  # [N] bool — False rows are gauge-fixed/invalid
    damping: float = 1e-6,
) -> tuple[jax.Array, jax.Array]:
    """Scatter per-pair blocks into (H [6N, 6N], b [6N]); apply gauge fixing.

    The four 6x6 sub-blocks of each pair block land at (a,a), (a,b), (b,a),
    (b,b). Scatter-adds are deterministic on XLA:TPU (no float atomics).
    """
    n = num_images
    Hb = jnp.zeros((n * n, 6, 6), dtype=JtJ_pairs.dtype)
    B = lambda i, j: JtJ_pairs[:, 6 * i : 6 * i + 6, 6 * j : 6 * j + 6]
    Hb = Hb.at[pairs_a * n + pairs_a].add(B(0, 0))
    Hb = Hb.at[pairs_a * n + pairs_b].add(B(0, 1))
    Hb = Hb.at[pairs_b * n + pairs_a].add(B(1, 0))
    Hb = Hb.at[pairs_b * n + pairs_b].add(B(1, 1))
    H = (
        Hb.reshape(n, n, 6, 6)
        .transpose(0, 2, 1, 3)
        .reshape(6 * n, 6 * n)
    )
    bv = jnp.zeros((n, 6), dtype=Jtr_pairs.dtype)
    bv = bv.at[pairs_a].add(Jtr_pairs[:, :6])
    bv = bv.at[pairs_b].add(Jtr_pairs[:, 6:])
    b = -bv.reshape(-1)  # GN solves H dx = -Jtr

    # gauge fixing + dead poses: zero their rows/cols, identity diagonal
    fm = jnp.repeat(free_mask.astype(H.dtype), 6)
    H = H * fm[:, None] * fm[None, :]
    H = H + jnp.diag(1.0 - fm)
    b = b * fm
    # Levenberg-style relative damping for rank-safety of weak blocks
    diag = jnp.diagonal(H)
    H = H + jnp.diag(damping * diag + 1e-8)
    return H, b


class PCGResult(NamedTuple):
    x: jax.Array  # [6N]
    iterations: jax.Array  # int32 (fixed = max iters; kept for logging parity)
    final_rz: jax.Array  # float32 residual quadratic norm


def pcg_solve(H: jax.Array, b: jax.Array, num_iters: int, tol: float = 1e-10) -> PCGResult:
    """Jacobi-preconditioned conjugate gradients with fixed iteration count.

    Mirrors the reference's fixed ``numLinIterations`` inner loop; converged
    systems keep iterating with masked (no-op) updates, which preserves static
    shapes and determinism.
    """
    diag = jnp.diagonal(H)
    Minv = jnp.where(jnp.abs(diag) > 1e-12, 1.0 / diag, 0.0)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = Minv * r0
    p0 = z0
    rz0 = jnp.dot(r0, z0)

    def body(_, carry):
        x, r, p, rz = carry
        active = rz > tol
        Ap = H @ p
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

    x, r, p, rz = jax.lax.fori_loop(0, num_iters, body, (x0, r0, p0, rz0))
    return PCGResult(x=x, iterations=jnp.int32(num_iters), final_rz=rz)
