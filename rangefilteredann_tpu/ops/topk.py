"""Masked top-k helpers.

The reference sorts candidate lists and truncates (ref:
src/range_filter_tree.h:542-549, prefiltering.h:196-203). On TPU we use
jax.lax.top_k over negated distances, with +inf padding standing in for
"absent" — callers treat non-finite distances as empty slots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.inf
# NumPy (not jnp) scalar ON PURPOSE: a module-level DEVICE array is deleted
# by hard HBM resets (jax.live_arrays().delete(), tools/r3_night.scrub_device)
# and every later trace that embeds it dies with "Array has been deleted".
# A np.int32 embeds as a fresh constant per trace — identical semantics.
EMPTY_ID = np.int32(2**31 - 1)  # sorts after every real id


def masked_topk(dists: jax.Array, ids: jax.Array, k: int):
    """Per-row smallest-k by distance with (dist, id) tie order.

    dists: [..., C] float32 (+inf = invalid); ids: [..., C] int32.
    Returns (top_dists [..., k], top_ids [..., k]).
    Ties broken by smaller id, matching the reference's (dist, id) comparator
    (ref: beamSearch.h:59-61).
    """
    # lax.sort is lexicographic over multiple keys: (dist, id) ascending.
    sorted_d, sorted_i = jax.lax.sort((dists, ids), num_keys=2)
    return sorted_d[..., :k], sorted_i[..., :k]


def merge_topk(
    dists_a: jax.Array, ids_a: jax.Array, dists_b: jax.Array, ids_b: jax.Array, k: int
):
    """Merge two per-row candidate sets and keep the smallest k of the union."""
    d = jnp.concatenate([dists_a, dists_b], axis=-1)
    i = jnp.concatenate([ids_a, ids_b], axis=-1)
    return masked_topk(d, i, k)
