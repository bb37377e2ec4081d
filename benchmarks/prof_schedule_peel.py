"""Targeted depth-peeling for the lane schedule.

After an initial column-grouped first-fit, the aligned cost is
sum over (window, grange) of max block depth.  Peeling: for each
(w, grange), take the blocks at the max depth and try to empty their top
level by relocating entries into lower depths (with one-level chains);
if every max block sheds a level, the grange cost drops by 1 — repeat.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from bench import make_problem
from hprlp_tpu.ops.device_problem import build_device_problem
from hprlp_tpu.ops.lane_ell import LANES, WINDOW
from hprlp_tpu.ops.sparse import to_coo


class Block:
    __slots__ = ("ls", "cs", "rhos", "depth", "res", "lanes", "lb")

    def __init__(self, ls, cs, rhos):
        self.ls, self.cs, self.rhos = ls, cs, rhos
        n = len(ls)
        self.depth = np.zeros(n, np.int64)
        self.res = []    # per depth: dict rho -> col
        self.lanes = []  # per depth: set of lanes
        lmax = np.bincount(ls).max()
        pair = np.unique(rhos.astype(np.int64) * (1 << 40) + cs)
        rmax = np.bincount((pair >> 40).astype(np.int64)).max()
        self.lb = max(int(lmax), int(rmax))
        # column-grouped first-fit, descending fan-out
        _, inv, cnts = np.unique(cs, return_inverse=True,
                                 return_counts=True)
        for e in np.lexsort((ls, cs, -cnts[inv])):
            self._place_first_fit(e)

    def _fits(self, d, l, c, rho):
        if l in self.lanes[d]:
            return False
        got = self.res[d].get(rho)
        return got is None or got == c

    def _put(self, d, e):
        self.res[d][int(self.rhos[e])] = int(self.cs[e])
        self.lanes[d].add(int(self.ls[e]))
        self.depth[e] = d

    def _del(self, e):
        d = int(self.depth[e])
        self.lanes[d].discard(int(self.ls[e]))
        rho = int(self.rhos[e])
        # remove rho occupancy only if no other entry of this col+rho at d
        if not np.any((self.depth == d) & (self.rhos == rho)
                      & (np.arange(len(self.ls)) != e)):
            self.res[d].pop(rho, None)

    def _place_first_fit(self, e):
        l, c, rho = int(self.ls[e]), int(self.cs[e]), int(self.rhos[e])
        d = 0
        while True:
            if d == len(self.res):
                self.res.append({})
                self.lanes.append(set())
            if self._fits(d, l, c, rho):
                self._put(d, e)
                return
            d += 1

    def _try_move_down(self, e, dmax):
        """Try to place entry e into some depth < dmax, with a one-level
        relocation of a blocking star or lane entry."""
        l, c, rho = int(self.ls[e]), int(self.cs[e]), int(self.rhos[e])
        for d in range(dmax):
            if self._fits(d, l, c, rho):
                self._del(e)
                self._put(d, e)
                return True
        for d in range(dmax):
            lane_free = l not in self.lanes[d]
            got = self.res[d].get(rho)
            if lane_free and got is not None and got != c:
                # relocate the (rho, got) star at depth d
                idx = np.nonzero((self.depth == d) & (self.rhos == rho)
                                 & (self.cs == got))[0]
                lanes2 = [int(self.ls[i]) for i in idx]
                for d2 in range(dmax):
                    if d2 == d:
                        continue
                    g2 = self.res[d2].get(rho)
                    if (g2 in (None, got)) and all(
                            x not in self.lanes[d2] for x in lanes2):
                        for i in idx:
                            self._del(i)
                            self._put(d2, i)
                        self._put(d, e)
                        return True
            elif not lane_free:
                # relocate the lane blocker at depth d
                idx = np.nonzero((self.depth == d) & (self.ls == l))[0]
                if len(idx) != 1:
                    continue
                e2 = int(idx[0])
                c2, rho2 = int(self.cs[e2]), int(self.rhos[e2])
                if self.res[d].get(rho) not in (None, c):
                    continue
                for d2 in range(dmax):
                    if d2 == d:
                        continue
                    if self._fits(d2, l, c2, rho2):
                        self._del(e2)
                        self._put(d2, e2)
                        if self._fits(d, l, c, rho):
                            self._put(d, e)
                            return True
                        # undo
                        self._del(e2)
                        self._put(d, e2)
        return False

    def try_peel(self):
        """Attempt to empty the top depth.  Returns True on success."""
        D = len(self.res)
        if D <= self.lb:
            return False
        top = np.nonzero(self.depth == D - 1)[0]
        snapshot = (self.depth.copy(),
                    [dict(r) for r in self.res],
                    [set(s) for s in self.lanes])
        for e in top:
            if not self._try_move_down(int(e), D - 1):
                self.depth, self.res, self.lanes = snapshot
                return False
        self.res.pop()
        self.lanes.pop()
        return True


def main():
    problem = make_problem()
    lp, maps = build_device_problem(problem)

    for name, M in (("A", lp.A), ("AT", lp.AT)):
        rows_p, cols_p, _ = to_coo(M)
        g = rows_p // LANES
        l = (rows_p % LANES).astype(np.int64)
        w = cols_p // WINDOW
        rho = (cols_p % LANES).astype(np.int64)
        order = np.lexsort((l, g, w))
        gs, ls_, ws, cs, rhos = (g[order], l[order], w[order],
                                 cols_p[order], rho[order])
        brk = np.nonzero((np.diff(ws) != 0) | (np.diff(gs) != 0))[0] + 1
        bounds = np.concatenate([[0], brk, [len(order)]])
        GG = int(g.max()) + 1
        NW = int(w.max()) + 1

        t0 = time.time()
        blocks = {}
        for a, b in zip(bounds[:-1], bounds[1:]):
            blocks[(int(ws[a]), int(gs[a]))] = Block(
                ls_[a:b], cs[a:b], rhos[a:b])
        t_init = time.time() - t0

        def totals():
            dw = np.zeros((NW, GG), np.int64)
            lbw = np.zeros((NW, GG), np.int64)
            for (wi, gi), blk in blocks.items():
                dw[wi, gi] = len(blk.res)
                lbw[wi, gi] = blk.lb
            n_gr = -(-GG // LANES)
            pad = n_gr * LANES - GG

            def rm(x):
                x2 = np.hstack([x, np.zeros((NW, pad), np.int64)])
                return int(x2.reshape(NW, n_gr, LANES).max(axis=2).sum())
            return dw.sum(), rm(dw), lbw.sum(), rm(lbw)

        s0, r0, slb, rlb = totals()
        print(f"{name}: init sum={s0} range-max={r0} "
              f"(LB {slb}/{rlb}) [{t_init:.0f}s]")

        # Targeted peel, grange by grange.
        t0 = time.time()
        n_gr = -(-GG // LANES)
        for wi in range(NW):
            for gr in range(n_gr):
                members = [blocks[(wi, gi)]
                           for gi in range(gr * LANES,
                                           min((gr + 1) * LANES, GG))
                           if (wi, gi) in blocks]
                if not members:
                    continue
                while True:
                    D = max(len(b.res) for b in members)
                    tops = [b for b in members if len(b.res) == D]
                    if any(b.lb >= D for b in tops):
                        break
                    ok = all(b.try_peel() for b in tops)
                    if not ok:
                        break
        s1, r1, _, _ = totals()
        print(f"  peeled: sum={s1} range-max={r1} "
              f"[{time.time() - t0:.0f}s]")


if __name__ == "__main__":
    main()
