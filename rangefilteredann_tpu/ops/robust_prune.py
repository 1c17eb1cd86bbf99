"""Vectorized RobustPrune (DiskANN edge selection).

TPU-native re-design of the reference's RobustPrune
(ref: ParlayANN/algorithms/vamana/index.h:61-108). The greedy scan is
inherently sequential in its *choices* (at most R of them), so we run a
fixed R-step fori_loop. All pairwise candidate distances are precomputed
as ONE batched [m, C, C] MXU matmul (Gram matrix); each greedy step is
then a single-row gather + VPU compare, so the candidate vectors are read
from HBM once instead of once per step.

All distances here are TRUE distances (L2: ||p-c||^2 including both norms;
MIPS: -p.c): the domination test alpha*d(p*, c) <= d(p, c) compares distances
with *different* reference points, so the shifted representation used by the
search path is not valid here.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .distances import MATMUL_PRECISION, mxu_operands
from .topk import EMPTY_ID


def _true_dists(vecs_a, norms_a, vecs_b, norms_b, metric):
    """d(a_i, b_i_c) for a [m, d] vs b [m, C, d] -> [m, C] true distances."""
    b_c, a_c, prec = mxu_operands(vecs_b, vecs_a)
    ip = jax.lax.dot_general(
        b_c,
        a_c[..., None],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    )[..., 0]
    if metric == "l2":
        return norms_a[:, None] + norms_b - 2.0 * ip
    return -ip


@functools.partial(jax.jit, static_argnames=("R", "metric", "norm_col"))
def robust_prune(
    data: jax.Array,  # [n, d_pad] global point store
    norms_sq: jax.Array,  # [n]
    slab_to_global: jax.Array,  # [m_slab] int32
    p_slab: jax.Array,  # [m] int32 slab ids of the nodes being pruned
    cand_slab: jax.Array,  # [m, C] int32 candidate slab ids, -1 = pad
    alpha: jax.Array,  # scalar f32
    R: int,
    metric: str,
    norm_col: "int | None" = None,  # REQUIRED when `data` carries a fused
    # ||x||^2 column (make_pointset always adds one) — point-vs-point dots
    # would otherwise include the norm-product term. Passed as
    # PointSet.norm_col;
    # norms come from the gathered rows themselves instead of extra
    # element-gathers. The "query" side of each dot zeroes that column so the
    # inner products stay uncontaminated.
) -> Tuple[jax.Array, jax.Array]:
    """Returns (out_ids [m, R] slab ids (-1 pad), out_dists [m, R] true d(p, out)).

    Candidate distances are computed here (one gather + matvec), so callers
    only supply ids; duplicates in the candidate list are fine — the first
    chosen copy alpha-dominates the rest at distance 0, exactly like the
    reference's behavior with repeated candidates.
    """
    m, C = cand_slab.shape
    m_slab = slab_to_global.shape[0]

    p_gid = slab_to_global[jnp.clip(p_slab, 0, m_slab - 1)]
    p_vec = data[p_gid]  # [m, d]

    valid = (cand_slab >= 0) & (cand_slab != p_slab[:, None])
    c_safe = jnp.clip(cand_slab, 0, m_slab - 1)
    c_gid = slab_to_global[c_safe]
    c_vecs = data[c_gid]  # [m, C, d]
    if norm_col is not None:
        p_norm = p_vec[:, norm_col]
        c_norms = c_vecs[..., norm_col]
        p_vec = p_vec.at[:, norm_col].set(0.0)  # query side of the dot
    else:
        p_norm = norms_sq[p_gid]
        c_norms = norms_sq[c_gid]

    d_pc = _true_dists(p_vec, p_norm, c_vecs, c_norms, metric)  # [m, C]
    d_pc = jnp.where(valid, d_pc, jnp.inf)
    ids = jnp.where(valid, cand_slab, EMPTY_ID)

    # Sort candidates by (dist, id) — the reference sorts by dist alone with an
    # unstable sort; the id tiebreak makes us deterministic.
    s_d, s_ids, s_pos = jax.lax.sort(
        (d_pc, ids, jax.lax.broadcasted_iota(jnp.int32, (m, C), 1)), num_keys=2
    )
    # Re-gather vectors in sorted order via the permutation.
    s_vecs = jnp.take_along_axis(c_vecs, s_pos[..., None], axis=1)
    s_norms = jnp.take_along_axis(c_norms, s_pos, axis=1)

    # Full pairwise candidate distance matrix D[m, i, j] = d(s_i, s_j) via one
    # batched MXU matmul — the greedy loop below then only gathers single rows
    # of D, so s_vecs is read from HBM once instead of R times.
    lhs = s_vecs
    if norm_col is not None:  # "query" side of the dot stays norm-free
        lhs = lhs.at[..., norm_col].set(0.0)
    rhs_c, lhs_c, prec = mxu_operands(s_vecs, lhs)
    gram = jax.lax.dot_general(
        lhs_c,
        rhs_c,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # [m, C, C]
    if metric == "l2":
        pair_d = s_norms[:, :, None] + s_norms[:, None, :] - 2.0 * gram
    else:
        pair_d = -gram

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (m, C), 1)

    def step(i, state):
        alive, out_ids, out_d = state
        any_alive = alive.any(axis=1)
        idx = jnp.argmax(alive, axis=1)  # first alive = nearest surviving
        chosen_id = jnp.take_along_axis(s_ids, idx[:, None], axis=1)[:, 0]
        chosen_d = jnp.take_along_axis(s_d, idx[:, None], axis=1)[:, 0]
        out_ids = out_ids.at[:, i].set(jnp.where(any_alive, chosen_id, -1))
        out_d = out_d.at[:, i].set(jnp.where(any_alive, chosen_d, jnp.inf))

        d_star = jnp.take_along_axis(pair_d, idx[:, None, None], axis=1)[:, 0]
        dominated = alpha * d_star <= s_d
        # the chosen element is consumed regardless of self-domination
        consumed = iota_c == idx[:, None]
        alive = alive & ~dominated & ~consumed & any_alive[:, None]
        return alive, out_ids, out_d

    alive0 = jnp.isfinite(s_d)
    out_ids0 = jnp.full((m, R), -1, dtype=jnp.int32)
    out_d0 = jnp.full((m, R), jnp.inf, dtype=jnp.float32)
    _, out_ids, out_d = jax.lax.fori_loop(0, R, step, (alive0, out_ids0, out_d0))
    return out_ids, out_d
