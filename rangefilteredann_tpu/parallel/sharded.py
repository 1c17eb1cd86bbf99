"""Multi-chip execution via jax.sharding + shard_map.

The reference is single-node shared-memory (SURVEY.md §2d): its only
parallelism is fork-join work stealing over queries and buckets. The TPU
scale-out story replaces that with SPMD over a device Mesh:

  * **Query sharding** (the common case): queries are embarrassingly
    parallel — shard the query batch across devices, replicate the point
    store + adjacency. No collectives until results are gathered.
  * **Index sharding** (for stores larger than one HBM): shard the
    label-sorted point store across devices on the row axis; brute-force
    scans compute per-device partial top-k and merge with an all_gather over
    ICI. (Graph rows can be sharded the same way by bucket; round 1 ships the
    brute-force variant, which is the memory-bound path that needs it first.)

Tested on a virtual CPU mesh (tests/conftest.py forces 8 host devices);
`__graft_entry__.dryrun_multichip` drives both shardings end to end.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.beam_search import batched_beam_search
from ..ops.distances import query_block_distances
from ..ops.topk import EMPTY_ID, masked_topk


def replicate_index(ps, graphs, mesh: Mesh) -> None:
    """Device_put an index's point store + slab graphs replicated over `mesh`
    (in place). Shared by every index class's .shard()."""
    repl = NamedSharding(mesh, P())
    ps.data = jax.device_put(ps.data, repl)
    ps.norms_sq = jax.device_put(ps.norms_sq, repl)
    for g in graphs:
        if g is not None:
            g.nbrs_dev = jax.device_put(g.nbrs_dev, repl)
            g.slab_to_global_dev = jax.device_put(g.slab_to_global_dev, repl)


def make_mesh(n_devices: Optional[int] = None, axis: str = "q") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_beam_search(
    mesh: Mesh,
    data, norms_sq, nbrs, slab_to_global,
    queries, starts,
    *, beam: int, k: int, cut, limit, metric: str,
    q_norms_sq=None,
):
    """Query-sharded batched beam search: queries split on the mesh axis,
    index replicated. The kernel is per-query SPMD, so XLA partitions the
    while_loop with zero collectives."""
    axis = mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    shard_q = NamedSharding(mesh, P(axis))
    data = jax.device_put(data, repl)
    norms_sq = jax.device_put(norms_sq, repl)
    nbrs = jax.device_put(nbrs, repl)
    slab_to_global = jax.device_put(slab_to_global, repl)
    queries = jax.device_put(queries, shard_q)
    starts = jax.device_put(starts, shard_q)
    if q_norms_sq is not None:
        q_norms_sq = jax.device_put(q_norms_sq, shard_q)
    return batched_beam_search(
        data, norms_sq, nbrs, slab_to_global, queries, starts,
        beam=beam, k=k, cut=cut, limit=limit, metric=metric,
        q_norms_sq=q_norms_sq,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "mesh", "axis")
)
def _sharded_scan_impl(data_sh, norms_sh, queries, starts, ends, row_offset, k, metric, mesh, axis):
    try:  # jax >= 0.8 moved shard_map out of experimental
        from jax import shard_map

        check_kwargs = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map

        check_kwargs = {"check_rep": False}

    def local_scan(data_local, norms_local, queries, starts, ends, row_offset):
        # each device scans its own row-shard of the point store
        idx = jax.lax.axis_index(axis)
        n_local = data_local.shape[0]
        base = row_offset + idx * n_local
        dists = query_block_distances(queries, data_local, norms_local, metric)
        col = base + jax.lax.broadcasted_iota(jnp.int32, dists.shape, 1)
        valid = (col >= starts[:, None]) & (col < ends[:, None])
        dists = jnp.where(valid, dists, jnp.inf)
        ids = jnp.where(valid, col, EMPTY_ID)
        d_loc, i_loc = masked_topk(dists, ids, k)
        # merge partial top-k across devices over ICI
        d_all = jax.lax.all_gather(d_loc, axis, axis=1).reshape(dists.shape[0], -1)
        i_all = jax.lax.all_gather(i_loc, axis, axis=1).reshape(dists.shape[0], -1)
        return masked_topk(d_all, i_all, k)

    return shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P(), P()),
        out_specs=(P(), P()),
        **check_kwargs,  # replication checking off (all_gather merge)
    )(data_sh, norms_sh, queries, starts, ends, row_offset)


def sharded_scan_bruteforce(
    mesh: Mesh, data, norms_sq, queries, starts, ends, k: int, metric: str
):
    """Index-sharded exact range scan: point rows split across devices, each
    device computes a local masked top-k, partials merged via all_gather.

    `data` rows must be a multiple of the mesh size (pad with rows whose
    column ids fall outside every window)."""
    axis = mesh.axis_names[0]
    shard_n = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    data = jax.device_put(data, shard_n)
    norms_sq = jax.device_put(norms_sq, shard_n)
    queries = jax.device_put(queries, repl)
    starts = jax.device_put(jnp.asarray(starts, jnp.int32), repl)
    ends = jax.device_put(jnp.asarray(ends, jnp.int32), repl)
    return _sharded_scan_impl(
        data, norms_sq, queries, starts, ends, jnp.int32(0), k, metric, mesh, axis
    )
