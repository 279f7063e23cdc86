"""Batched Brandes betweenness centrality.

Parity with ``Applications/BetwCent.cpp:144-237``: process `batch` source
vertices at once — the forward sweep counts shortest paths per level with
a tall-skinny SpMM (``BetwCent.cpp:179-187``: "multi-source BFS = SpGEMM
with tall-skinny B"), the backward sweep accumulates dependencies with the
transposed product, level masks play the role of the reference's
`EWiseMult` fringe filtering.

All (K, n) state matrices live as per-chunk (K, n/g) ObjectRefs — the
driver never holds a full (K, n) array and syncs only a per-level
boolean; per-level math is chunk-local numpy, graph access is one fused
SpMM+step task round per level per direction. Requires the STRUCTURAL symmetric
engine (w=1) and its transpose-free use: the symmetric matrix is its own
transpose.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ..core.engine import SpmvEngine


def _bc_init(bounds, sources):
    s, e = bounds
    K = len(sources)
    sigma = np.zeros((K, e - s), dtype=np.float64)
    depth = np.full((K, e - s), -1, dtype=np.int64)
    fringe = np.zeros((K, e - s), dtype=np.float64)
    sel = (sources >= s) & (sources < e)
    ks = np.nonzero(sel)[0]
    loc = sources[sel] - s
    sigma[ks, loc] = 1.0
    depth[ks, loc] = 0
    fringe[ks, loc] = 1.0
    return sigma, depth, fringe


def _bc_forward(sigma, depth, prop, level):
    """Per chunk: mask newly-reached entries, advance sigma/depth; the
    4th output is the chunk's 'any new fringe' scalar (loop control)."""
    new_mask = (depth == -1) & (prop > 0)
    fringe = np.where(new_mask, prop, 0.0)
    depth = np.where(new_mask, level, depth)
    sigma = sigma + fringe
    return sigma, depth, fringe, bool(new_mask.any())


def _bc_coeff(depth, delta, sigma, level):
    at_level = depth == level
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(
            at_level, (1.0 + delta) / np.where(sigma == 0, 1, sigma), 0.0
        )


def _bc_backstep(depth, delta, sigma, back, level):
    prev_mask = depth == (level - 1)
    return delta + np.where(prev_mask, back * sigma, 0.0)


def _bc_forward_f(sigma, depth, prop, bounds, level):
    """spmm_apply_refs adapter: fused combine + forward step."""
    return _bc_forward(sigma, depth, prop, level)


def _bc_backstep_f(depth, delta, sigma, back, bounds, level):
    return _bc_backstep(depth, delta, sigma, back, level)


def _bc_final(delta, bounds, sources):
    """Zero each source's own dependency, reduce the K axis."""
    s, e = bounds
    d = delta.copy()
    sel = (sources >= s) & (sources < e)
    d[np.nonzero(sel)[0], sources[sel] - s] = 0.0
    return d.sum(axis=0)


def betweenness_centrality(
    engine: SpmvEngine,
    sources: np.ndarray,
    *,
    normalize: bool = False,
) -> np.ndarray:
    """Approximate BC from the given source batch (exact if sources = all
    vertices). Engine must hold the undirected structural graph."""
    import ray

    n = engine.n
    K = len(sources)
    sources = np.asarray(sources, dtype=np.int64)

    # forward: level-synchronous path counting, all state chunked
    sigma, depth, fringe = engine.map_chunks_n(
        partial(_bc_init, sources=sources), 3, with_bounds=True
    )
    level = 0
    num_levels = 0
    while True:
        level += 1
        sigma, depth, fringe, anynew = engine.spmm_apply_refs(
            fringe, K, "plus_times",
            partial(_bc_forward_f, level=level), 4, sigma, depth,
        )
        if not any(ray.get(anynew)):
            break
        num_levels = level

    # backward: dependency accumulation (Brandes)
    delta = engine.map_chunks(lambda s: np.zeros_like(s), sigma)
    for level in range(num_levels, 0, -1):
        coeff = engine.map_chunks(
            partial(_bc_coeff, level=level), depth, delta, sigma
        )
        # symmetric graph: A == A^T; combine + backstep fused
        delta = engine.spmm_apply_refs(
            coeff, K, "plus_times",
            partial(_bc_backstep_f, level=level), 1, depth, delta, sigma,
        )[0]
    bc_chunks = engine.map_chunks_i(
        partial(_bc_final, sources=sources), delta
    )
    bc = engine.unchunk(bc_chunks)
    if normalize and n > 2:
        bc /= (n - 1) * (n - 2)
    return bc


def brute_betweenness(U: np.ndarray, sources: np.ndarray) -> np.ndarray:
    """Reference Brandes (per-source BFS, dense adjacency) for tests."""
    from collections import deque

    n = U.shape[0]
    bc = np.zeros(n)
    for s in sources:
        sigma = np.zeros(n)
        dist = np.full(n, -1)
        sigma[s] = 1.0
        dist[s] = 0
        order = []
        dq = deque([int(s)])
        while dq:
            v = dq.popleft()
            order.append(v)
            for w in np.nonzero(U[:, v])[0]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    dq.append(int(w))
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = np.zeros(n)
        for w in reversed(order):
            for v in np.nonzero(U[:, w])[0]:
                if dist[v] == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
        delta[s] = 0.0
        bc += delta
    return bc
