"""GPU-style SIFT descriptor matching as one MXU matmul.

Rebuild of ``SiftGPU/SIFTImageManager`` + ``SiftMatchGPU`` all-pairs matching
(SURVEY.md §2.1 "Key/match store & GPU matcher"): per-pair descriptor
dot-products with ratio test and fixed-capacity match lists.

The TPU formulation: descriptors are L2-normalized, so
``dist^2 = 2 - 2 * sim`` with ``sim = desc_i @ desc_j.T`` — one [K,128]x[128,K]
matmul per pair (batched over pairs via vmap => one big einsum on the MXU).
Top-2 per row via `lax.top_k`, Lowe ratio + absolute distance tests, mutual
consistency check, then `top_k` compaction into the fixed per-pair match
capacity. Fully deterministic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import BundlingConfig
from .sift import SiftKeys


class PairMatches(NamedTuple):
    """Fixed-capacity matches for one (or a batch of) image pair(s).

    Mirrors the reference's per-pair raw/filtered match lists
    (``SIFTImageManager::ImagePairMatch``)."""

    idx_i: jax.Array  # [..., M] int32 key index in image i
    idx_j: jax.Array  # [..., M] int32 key index in image j
    dist: jax.Array  # [..., M] float32 descriptor distance
    valid: jax.Array  # [..., M] bool

    @property
    def capacity(self) -> int:
        return self.idx_i.shape[-1]

    def count(self) -> jax.Array:
        return jnp.sum(self.valid, axis=-1)


def match_pair(
    keys_i: SiftKeys,
    keys_j: SiftKeys,
    cfg: BundlingConfig,
) -> PairMatches:
    """Match two images' descriptor sets. All [K] shapes static.

    Note on precision: the similarity matmul is the throughput hot spot for
    global keyframe matching; descriptors are unit-norm with ~1e-2 scale
    entries, where bf16 MXU passes are accurate enough (error << the 0.8 ratio
    margin), so this op explicitly opts into bf16 inputs.
    """
    di = keys_i.desc.astype(jnp.bfloat16)
    dj = keys_j.desc.astype(jnp.bfloat16)
    sim = jnp.dot(di, dj.T, preferred_element_type=jnp.float32)  # [Ki, Kj]
    vi = keys_i.valid
    vj = keys_j.valid
    pairmask = vi[:, None] & vj[None, :]
    sim = jnp.where(pairmask, sim, -2.0)

    # top-2 nearest (max similarity = min distance). Two max/argmax passes
    # instead of lax.top_k(k=2): XLA lowers top_k through a full row sort on
    # TPU (~10x the cost of a reduction); argmax ties break to the lowest
    # index, exactly like top_k's stable order.
    best_j = jnp.argmax(sim, axis=1)  # [Ki]
    s1 = jnp.max(sim, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    s2 = jnp.max(jnp.where(cols == best_j[:, None], -2.0, sim), axis=1)
    d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s1, 0.0))
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s2, 0.0))

    ratio_ok = d1 < cfg.match_ratio_thresh * d2
    dist_ok = d1 < cfg.match_dist_thresh
    # mutual check: i must be the argmax row for its best j
    best_i_of_j = jnp.argmax(sim, axis=0)  # [Kj]
    krange = jnp.arange(sim.shape[0])
    mutual = best_i_of_j[best_j] == krange
    ok = vi & ratio_ok & dist_ok & mutual

    # compact into fixed capacity, best matches first
    score = jnp.where(ok, -d1, -jnp.inf)
    m = cfg.max_matches_per_pair_raw
    top_scores, sel = jax.lax.top_k(score, m)
    valid = jnp.isfinite(top_scores)
    return PairMatches(
        idx_i=jnp.where(valid, sel, 0).astype(jnp.int32),
        idx_j=jnp.where(valid, best_j[sel], 0).astype(jnp.int32),
        dist=jnp.where(valid, -top_scores, jnp.inf),
        valid=valid,
    )


def match_all_pairs(
    keys: SiftKeys,  # batched SiftKeys with leading axis [N]
    pairs_a: jax.Array,  # [P] int32 image indices
    pairs_b: jax.Array,  # [P] int32
    cfg: BundlingConfig,
) -> PairMatches:
    """Match a list of image pairs from one batched key set.

    Used both intra-chunk (all 55 pairs of an 11-frame chunk) and globally
    (new keyframe vs all previous keyframes). The gather + vmap turns the
    whole pair list into one batched einsum.
    """

    def one(a, b):
        ka = jax.tree.map(lambda x: x[a], keys)
        kb = jax.tree.map(lambda x: x[b], keys)
        return match_pair(ka, kb, cfg)

    return jax.vmap(one)(pairs_a, pairs_b)


def gather_match_points(
    keys: SiftKeys,  # batched [N]
    pairs_a: jax.Array,  # [P]
    pairs_b: jax.Array,  # [P]
    matches: PairMatches,  # batched [P, M]
) -> tuple[jax.Array, jax.Array]:
    """3D camera-space points of matched keys: ([P, M, 3] in frame a, same in b)."""
    pa = keys.p3d[pairs_a[:, None], matches.idx_i]  # [P, M, 3]
    pb = keys.p3d[pairs_b[:, None], matches.idx_j]
    return pa, pb
