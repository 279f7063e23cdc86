"""Batched Brandes betweenness centrality.

Parity with ``Applications/BetwCent.cpp:144-237``: process `batch` source
vertices at once — the forward sweep counts shortest paths per level with
a tall-skinny SpMM (``BetwCent.cpp:179-187``: "multi-source BFS = SpGEMM
with tall-skinny B"), the backward sweep accumulates dependencies with the
transposed product, level masks play the role of the reference's
`EWiseMult` fringe filtering.

All per-level math is batched numpy on (K, n) matrices; graph access goes
through the resident block engine (one `spmm` per level per direction).
Requires the STRUCTURAL symmetric engine (w=1) and its transpose-free use:
the symmetric matrix is its own transpose.
"""

from __future__ import annotations

import numpy as np

from ..core.engine import SpmvEngine


def betweenness_centrality(
    engine: SpmvEngine,
    sources: np.ndarray,
    *,
    normalize: bool = False,
) -> np.ndarray:
    """Approximate BC from the given source batch (exact if sources = all
    vertices). Engine must hold the undirected structural graph."""
    n = engine.n
    K = len(sources)
    bc = np.zeros(n, dtype=np.float64)

    # forward: level-synchronous path counting
    sigma = np.zeros((K, n), dtype=np.float64)
    depth = np.full((K, n), -1, dtype=np.int64)
    sigma[np.arange(K), sources] = 1.0
    depth[np.arange(K), sources] = 0
    fringes = []  # per level: (K, n) path-count contributions
    fringe = np.zeros((K, n), dtype=np.float64)
    fringe[np.arange(K), sources] = 1.0
    level = 0
    while fringe.any():
        level += 1
        prop = engine.spmm(fringe, "plus_times")  # paths reaching neighbors
        new_mask = (depth == -1) & (prop > 0)
        fringe = np.where(new_mask, prop, 0.0)
        depth[new_mask] = level
        sigma += fringe
        fringes.append(fringe.copy())

    # backward: dependency accumulation (Brandes)
    delta = np.zeros((K, n), dtype=np.float64)
    for level in range(len(fringes), 0, -1):
        at_level = depth == level
        with np.errstate(divide="ignore", invalid="ignore"):
            coeff = np.where(at_level, (1.0 + delta) / np.where(sigma == 0, 1, sigma), 0.0)
        back = engine.spmm(coeff, "plus_times")  # symmetric: A == A^T
        prev_mask = depth == (level - 1)
        delta += np.where(prev_mask, back * sigma, 0.0)
    for k in range(K):
        d = delta[k].copy()
        d[sources[k]] = 0.0
        bc += d
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
