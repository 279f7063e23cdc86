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


def auction_matching(
    engine: SpmvEngine,
    *,
    eps: float = 1e-3,
    floor: float = 0.0,
    max_rounds: int = 10_000,
) -> tuple[np.ndarray, np.ndarray, dict]:
    """Returns (person_to_object, price, info). Unassigned person = -1.
    ``engine`` holds the bipartite values (w) in its blocks."""
    n = engine.n
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
        order = np.lexsort((-v1, rows))
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
