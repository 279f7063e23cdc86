"""Auction-based maximum-weight matching (AWPM analog).

Parity target: `Applications/BipartiteMatchings` (auction-weight perfect
matching). Bertsekas forward auction over the bipartite view of the edge
table — persons = row indices (dst), objects = column indices (src),
value = w:

  repeat until no active person can bid:
    each active person computes its best and second-best object value
    v = w - price (per-block partials from the resident workers, merged
    by the driver);
    bids: price[best] rises to price[best] + (v1 - v2) + eps;
    each object accepts its highest bid (ties -> smaller person id),
    evicting the previous owner.

eps-complementary slackness at termination guarantees the assignment is
within n*eps of the maximum weight (Bertsekas 1988).
"""

from __future__ import annotations

import numpy as np

import ray

from ..core.engine import SpmvEngine
from .algorithms import _count_nonneg, _count_true


AUC_DENSE_MAX = 1 << 23  # below this, driver price/mate arrays are cheap

_EMPTY_I = np.empty(0, dtype=np.int64)


@ray.remote(num_cpus=0)
def _auc_row_merge(br, bounds, floor, active, *actor_outs):
    """Per person chunk: merge bid partials across workers (global
    best / second, same keys as the dense merge), retire quitters and
    edge-less bidders, route the kept bids to their object chunks.
    Returns g routed (obj_local, person_global, incr) slices, the
    updated active chunk, and the kept-bid count."""
    s, e = bounds[br]
    g = len(bounds)
    rows_all, v1_all, c1_all, v2_all = [], [], [], []
    for parts in actor_outs:
        for pbr, pbc, ur, bv, bcid, sv in parts:
            if pbr != br:
                continue
            rows_all.append(ur.astype(np.int64))
            v1_all.append(bv)
            c1_all.append(bcid.astype(np.int64) + bounds[pbc][0])
            v2_all.append(sv)
    active = active.copy()
    seen = np.zeros(e - s, dtype=bool)
    ur = _EMPTY_I
    gb_c1 = _EMPTY_I
    incr = np.empty(0, dtype=np.float64)
    if rows_all:
        rows = np.concatenate(rows_all)
        v1 = np.concatenate(v1_all)
        c1 = np.concatenate(c1_all)
        v2 = np.concatenate(v2_all)
        seen[rows] = True
        order = np.lexsort((c1, -v1, rows))
        rows, v1, c1, v2 = rows[order], v1[order], c1[order], v2[order]
        ur, starts = np.unique(rows, return_index=True)
        ends = np.append(starts[1:], len(rows))
        gb_v1 = v1[starts]
        gb_c1 = c1[starts]
        gb_v2 = np.full(len(ur), -np.inf)
        for k, (st, en) in enumerate(zip(starts, ends)):
            cand = v2[st:en].max()
            if en - st > 1:
                cand = max(cand, v1[st + 1 : en].max())
            gb_v2[k] = cand
        quit_mask = gb_v1 < floor
        active[ur[quit_mask]] = False
        keep = ~quit_mask
        ur, gb_v1, gb_c1, gb_v2 = (
            ur[keep], gb_v1[keep], gb_c1[keep], gb_v2[keep],
        )
        # raw profit margin; eps is added OBJECT-side in the same
        # float-op order as the dense path ((price + diff) + eps) so
        # the two plans stay bit-identical
        incr = gb_v1 - np.maximum(gb_v2, floor)
    active[active & ~seen] = False
    person_g = ur + s
    out = []
    for cs, ce in bounds:
        m = (gb_c1 >= cs) & (gb_c1 < ce)
        out.append((gb_c1[m] - cs, person_g[m], incr[m]))
    return (*out, active, int(len(ur)))


@ray.remote(num_cpus=0)
def _auc_accept(start, eps, price, o2p, *slices):
    """Per object chunk: accept the highest bid per object (tie ->
    smaller person id), evict previous owners, raise prices. Returns
    (price, o2p, winners_global, objs_global, evicted_global)."""
    parts = [t for t in slices if len(t[0])]
    if not parts:
        return price, o2p, _EMPTY_I, _EMPTY_I, _EMPTY_I
    obj = np.concatenate([t[0] for t in parts])
    per = np.concatenate([t[1] for t in parts])
    inc = np.concatenate([t[2] for t in parts])
    bid = price[obj] + inc + eps
    oorder = np.lexsort((per, -bid, obj))
    oc, ostarts = np.unique(obj[oorder], return_index=True)
    win_pos = oorder[ostarts]
    winners = per[win_pos]
    price = price.copy()
    o2p = o2p.copy()
    prev = o2p[oc]
    evicted = prev[prev >= 0]
    o2p[oc] = winners
    price[oc] = bid[win_pos]
    return price, o2p, winners, oc + start, evicted


@ray.remote(num_cpus=0)
def _auc_row_apply(bounds_i, p2o, active, *woe):
    """Per person chunk: apply this round's evictions (clear mate,
    reactivate) and wins (assign mate, deactivate). The two sets are
    disjoint — owners are inactive, so never bidders/winners."""
    s, e = bounds_i
    p2o = p2o.copy()
    active = active.copy()
    for k in range(0, len(woe), 3):
        winners, objs, evicted = woe[k], woe[k + 1], woe[k + 2]
        me = (evicted >= s) & (evicted < e)
        p2o[evicted[me] - s] = -1
        active[evicted[me] - s] = True
        mw = (winners >= s) & (winners < e)
        p2o[winners[mw] - s] = objs[mw]
        active[winners[mw] - s] = False
    return p2o, active


def _zeros_f8(bounds):
    s, e = bounds
    return np.zeros(e - s, dtype=np.float64)


def _negones_i8(bounds):
    s, e = bounds
    return np.full(e - s, -1, dtype=np.int64)


def _ones_bool(bounds):
    s, e = bounds
    return np.ones(e - s, dtype=bool)


def _auction_refs(engine: SpmvEngine, *, eps, floor, max_rounds):
    """Refs-only auction: price / p2o / o2p / active live as chunked
    ObjectRefs (the reference's FullyDistVec layout); the driver syncs
    only two scalars per round. Trace-identical to the dense path (all
    tie-breaks are value/col/person-deterministic)."""
    g = engine.g
    bounds = engine.bounds
    price = engine.map_chunks_i(_zeros_f8)
    p2o = engine.map_chunks_i(_negones_i8)
    o2p = engine.map_chunks_i(_negones_i8)
    active = engine.map_chunks_i(_ones_bool)
    rounds = 0
    while rounds < max_rounds:
        if sum(engine.chunk_scalars(_count_true, active)) == 0:
            break
        rounds += 1
        futs = [
            a.auction_bids_partial.remote(
                *[price[bc] for bc in bcs], *[active[br] for br in brs],
            )
            for a, brs, bcs in zip(engine.actors, engine.actor_brs,
                                   engine.actor_bcs)
        ]
        slices = []
        new_active = []
        kept_refs = []
        for br in range(g):
            r = _auc_row_merge.options(num_returns=g + 2).remote(
                br, bounds, floor, active[br], *futs
            )
            slices.append(r[:g])
            new_active.append(r[g])
            kept_refs.append(r[g + 1])
        active = new_active
        if sum(ray.get(kept_refs)) == 0:
            continue  # merge already retired quitters; loop re-checks
        woe = []
        new_price, new_o2p = [], []
        for k in range(g):
            r = _auc_accept.options(num_returns=5).remote(
                bounds[k][0], eps, price[k], o2p[k],
                *[slices[br][k] for br in range(g)],
            )
            new_price.append(r[0])
            new_o2p.append(r[1])
            woe += [r[2], r[3], r[4]]
        price, o2p = new_price, new_o2p
        applied = [
            _auc_row_apply.options(num_returns=2).remote(
                bounds[i], p2o[i], active[i], *woe
            )
            for i in range(g)
        ]
        p2o = [r[0] for r in applied]
        active = [r[1] for r in applied]
    assigned = sum(engine.chunk_scalars(_count_nonneg, p2o))
    return (
        engine.unchunk(p2o),
        engine.unchunk(price),
        {"rounds": rounds, "assigned": assigned},
    )


def auction_matching(
    engine: SpmvEngine,
    *,
    eps: float = 1e-3,
    floor: float = 0.0,
    max_rounds: int = 10_000,
) -> tuple[np.ndarray, np.ndarray, dict]:
    """Returns (person_to_object, price, info). Unassigned person = -1.
    ``engine`` holds the bipartite values (w) in its blocks.

    Above ``AUC_DENSE_MAX`` vertices the refs-only plan runs: all
    per-vertex state (price, mates, active) chunked in the object
    store — at n=10^9 the dense driver path would hold 32+ GB."""
    n = engine.n
    if n > AUC_DENSE_MAX:
        return _auction_refs(
            engine, eps=eps, floor=floor, max_rounds=max_rounds
        )
    g = engine.g
    price = np.zeros(n, dtype=np.float64)
    p2o = np.full(n, -1, dtype=np.int64)
    o2p = np.full(n, -1, dtype=np.int64)
    active = np.ones(n, dtype=bool)
    ls = engine.bounds
    rounds = 0
    while active.any() and rounds < max_rounds:
        rounds += 1
        bidders = active.copy()  # snapshot: who computed bids this round
        price_refs = engine.chunk(price)
        act_refs = [
            ray.put(np.ascontiguousarray(bidders[s:e])) for s, e in ls
        ]
        futs = [
            a.auction_bids_partial.remote(
                *[price_refs[bc] for bc in bcs],
                *[act_refs[br] for br in brs],
            )
            for a, brs, bcs in zip(engine.actors, engine.actor_brs,
                                   engine.actor_bcs)
        ]
        rows_all, v1_all, c1_all, v2_all = [], [], [], []
        for parts in ray.get(futs):
            for br, bc, ur, bv, bcid, sv in parts:
                rows_all.append(ur + ls[br][0])
                v1_all.append(bv)
                c1_all.append(bcid + ls[bc][0])
                v2_all.append(sv)
        if not rows_all:
            break
        rows = np.concatenate(rows_all)
        v1 = np.concatenate(v1_all)
        c1 = np.concatenate(c1_all)
        v2 = np.concatenate(v2_all)
        # merge partials per person: global best / second across workers
        # (col tie-break keeps the trace independent of partial order)
        order = np.lexsort((c1, -v1, rows))
        rows, v1, c1, v2 = rows[order], v1[order], c1[order], v2[order]
        ur, starts = np.unique(rows, return_index=True)
        ends = np.append(starts[1:], len(rows))
        gb_v1 = v1[starts]
        gb_c1 = c1[starts]
        # global second best: max of (this part's v2, other parts' v1)
        gb_v2 = np.full(len(ur), -np.inf)
        for k, (s, e) in enumerate(zip(starts, ends)):
            cand = v2[s:e].max()
            if e - s > 1:
                cand = max(cand, v1[s + 1 : e].max())
            gb_v2[k] = cand
        # profit floor: a person whose best net value sinks below `floor`
        # stops bidding (bounded prices => guaranteed termination; with
        # positive weights this yields the maximum-weight, not-necessarily-
        # perfect matching)
        quit_mask = gb_v1 < floor
        active[ur[quit_mask]] = False
        keep = ~quit_mask
        ur, gb_v1, gb_c1, gb_v2 = ur[keep], gb_v1[keep], gb_c1[keep], gb_v2[keep]
        if len(ur) == 0:
            break
        # bids
        bid_price = price[gb_c1] + (gb_v1 - np.maximum(gb_v2, floor)) + eps
        # objects accept the highest bid, tie -> smaller person id
        oorder = np.lexsort((ur, -bid_price, gb_c1))
        oc, ostarts = np.unique(gb_c1[oorder], return_index=True)
        win_pos = oorder[ostarts]
        winners = ur[win_pos]
        objs = gb_c1[win_pos]
        # evict previous owners, assign winners, raise prices
        prev = o2p[objs]
        for pv in prev[prev >= 0]:
            p2o[pv] = -1
            active[pv] = True
        p2o[winners] = objs
        o2p[objs] = winners
        price[objs] = bid_price[win_pos]
        active[winners] = False
        # a BIDDER that produced no partials has no edges at all; evicted
        # persons (activated after the snapshot) stay active
        seen = np.zeros(n, dtype=bool)
        seen[rows] = True
        active[bidders & ~seen] = False
    return p2o, price, {"rounds": rounds, "assigned": int((p2o >= 0).sum())}
