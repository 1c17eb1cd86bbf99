"""NumPy oracles re-stating the reference's algorithm semantics.

These are independent re-implementations of the *behavior* documented in
SURVEY.md §3 (beam search: ParlayANN/algorithms/utils/beamSearch.h:53-184;
RobustPrune: vamana/index.h:61-108), used as golden models for the TPU
kernels. The lossy hash filter is replaced by an exact seen-set (its limit
behavior), which matches the TPU kernel's exact frontier dedup when no cut
pruning is active.
"""

import numpy as np


def dist_fn(metric):
    if metric == "l2":
        return lambda q, x: float(np.dot(x - q, x - q))
    return lambda q, x: -float(np.dot(q, x))


def beam_search_oracle(
    query, nbrs, points, start, beam, k, cut, limit, metric, exclude=-1
):
    """Single-query greedy best-first search with exact visited set.

    Returns (frontier [(id, dist)...] sorted by (dist, id), visited list in
    visit order, dist_cmps).
    """
    d = dist_fn(metric)
    lt = lambda a, b: a[1] < b[1] or (a[1] == b[1] and a[0] < b[0])
    key = lambda e: (e[1], e[0])

    seen = {start}
    frontier = [(start, d(query, points[start]))]
    visited = []
    dist_cmps = 1
    while len(visited) < limit:
        unvisited = [e for e in frontier if e[0] not in {v[0] for v in visited}]
        if not unvisited:
            break
        cur = unvisited[0]
        visited.append(cur)
        cand = []
        for a in nbrs[cur[0]]:
            if a < 0 or a == exclude or a in seen:
                continue
            seen.add(a)
            dist = d(query, points[a])
            dist_cmps += 1
            cutoff = frontier[-1][1] if len(frontier) >= beam else np.inf
            if dist >= cutoff:
                continue
            cand.append((int(a), dist))
        merged = sorted(set(frontier) | set(cand), key=key)
        merged = merged[:beam]
        if k > 0 and len(merged) > k and metric == "l2":
            cutval = cut * merged[k][1]
            merged = [e for e in merged if e[1] < cutval]
        frontier = merged
    return frontier, visited, dist_cmps


def robust_prune_oracle(p, cand_with_dists, points, alpha, R, metric):
    """Reference RobustPrune (ref: vamana/index.h:61-108): sort candidates by
    distance to p, greedily keep nearest alive, kill alpha-dominated."""
    d = dist_fn(metric)
    cands = sorted(cand_with_dists, key=lambda e: e[1])
    cands = [[c, dist] for c, dist in cands]
    out = []
    i = 0
    while len(out) < R and i < len(cands):
        p_star = cands[i][0]
        i += 1
        if p_star == p or p_star == -1:
            continue
        out.append(p_star)
        for j in range(i, len(cands)):
            if cands[j][0] != -1:
                if alpha * d(points[p_star], points[cands[j][0]]) <= cands[j][1]:
                    cands[j][0] = -1
    return out


def random_graph(rng, n, r):
    """Random connected directed graph: ring + random extra edges, -1 padded."""
    nbrs = np.full((n, r), -1, dtype=np.int32)
    for i in range(n):
        extra = rng.choice(n, size=min(r - 1, n - 1), replace=False)
        extra = [int(e) for e in extra if e != i][: r - 1]
        row = [(i + 1) % n] + extra
        # unique, keep order
        seen, out = set(), []
        for e in row:
            if e not in seen:
                seen.add(e)
                out.append(e)
        nbrs[i, : len(out)] = out
    return nbrs
