"""Pure-Python dict-based T-PPR oracle used to validate the dense on-device
index. Implements the SANTA recurrence and the pruned temporal-BFS query
directly from the algorithm definition (see SURVEY.md §2.1 and the reference
semantics at utils/util.py:473-576, :185-276); deliberately simple and slow."""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np

Key = Tuple[int, int, float]  # (edge_idx, neighbor, timestamp)


class TpprOracle:
    """dtype defaults to float32 so weights are bit-comparable with the dense
    on-device index (which keeps f32 state); pass np.float64 to study
    precision drift instead."""

    def __init__(self, n_nodes: int, k: int, alpha_list, beta_list, dtype=np.float32):
        self.n_nodes = n_nodes
        self.k = k
        self.dt = dtype
        self.alpha_list = [dtype(a) for a in alpha_list]
        self.beta_list = [dtype(b) for b in beta_list]
        self.n_tppr = len(self.alpha_list)
        self.reset()

    def reset(self):
        self.ppr: List[List[Dict[Key, float]]] = [
            [dict() for _ in range(self.n_nodes)] for _ in range(self.n_tppr)
        ]
        self.norm = [np.zeros(self.n_nodes, self.dt) for _ in range(self.n_tppr)]

    # -- one direction of the per-edge update: returns s1's new dict --------
    def _merged(self, m: int, s1: int, s2: int, ts: float, eidx: int) -> Dict[Key, float]:
        alpha, beta = self.alpha_list[m], self.beta_list[m]
        one = self.dt(1)
        norm, ppr = self.norm[m], self.ppr[m]
        if norm[s1] == 0:
            out: Dict[Key, float] = {}
            scale_s2 = one - alpha
        else:
            new_norm = norm[s1] * beta + beta
            scale_s1 = norm[s1] / new_norm * beta
            scale_s2 = beta / new_norm * (one - alpha)
            out = {key: val * scale_s1 for key, val in ppr[s1].items()}
        if norm[s2] != 0:
            for key, val in ppr[s2].items():
                out[key] = out.get(key, self.dt(0)) + val * scale_s2
        out[(eidx, s2, ts)] = scale_s2 * alpha if alpha != 0 else scale_s2
        if len(out) > self.k:
            # canonical tie-break matching the dense index: weight desc,
            # then eidx asc, then nbr asc
            items = sorted(out.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            out = dict(items[: self.k])
        return out

    def update(self, src: int, dst: int, ts: float, eidx: int):
        ts = self.dt(ts)
        for m in range(self.n_tppr):
            beta = self.beta_list[m]
            new_src = self._merged(m, src, dst, ts, eidx)
            if src != dst:
                new_dst = self._merged(m, dst, src, ts, eidx)
                self.ppr[m][dst] = new_dst
            self.ppr[m][src] = new_src
            self.norm[m][src] = self.norm[m][src] * beta + beta
            if src != dst:
                self.norm[m][dst] = self.norm[m][dst] * beta + beta

    def extract(self, node: int, t_q: float):
        """Return per-member (nbr, eidx, dt, w) arrays of shape [k], zero padded
        (empty slots: dt == t_q, matching the reference's zero-filled entry ts)."""
        out = []
        for m in range(self.n_tppr):
            nbr = np.zeros(self.k, np.int32)
            eidx = np.zeros(self.k, np.int32)
            ts = np.zeros(self.k, np.float32)
            w = np.zeros(self.k, np.float32)
            for j, (key, val) in enumerate(self.ppr[m][node].items()):
                eidx[j], nbr[j], ts[j] = key[0], key[1], key[2]
                w[j] = val
            out.append((nbr, eidx, np.float32(t_q) - ts, w))
        return out

    def topk_dict(self, m: int, node: int) -> Dict[Tuple[int, int], float]:
        """Canonical (eidx, nbr) → weight view for comparisons."""
        return {(k[0], k[1]): v for k, v in self.ppr[m][node].items()}


class PruningOracle:
    """Stateless pruned temporal-BFS top-k query (reference get_pruned_topk,
    util.py:185-276): bounded BFS of `depth` levels × `width` most-recent
    neighbors, geometric sibling decay, dict accumulation, final top-k."""

    def __init__(self, sources, destinations, timestamps, edge_idxs, n_nodes: int):
        # timestamps kept in f32 like the dense NeighborIndex arena
        adj: List[List[Tuple[float, int, int]]] = [[] for _ in range(n_nodes)]
        for s, d, t, e in zip(sources, destinations, timestamps, edge_idxs):
            adj[int(s)].append((np.float32(t), int(d), int(e)))
            adj[int(d)].append((np.float32(t), int(s), int(e)))
        self.adj = [sorted(a, key=lambda x: x[0]) for a in adj]

    def neighbors_before(self, node: int, cut: float):
        row = self.adj[node]
        out = [(t, n, e) for (t, n, e) in row if t < cut]
        return out

    def query(self, node: int, t_q: float, width: int, depth: int,
              alpha: float, beta: float, k: int):
        f = np.float32
        alpha, beta, one = f(alpha), f(beta), f(1)
        acc: Dict[Key, float] = {}
        frontier = [(node, f(t_q), one)]
        for dep in range(depth):
            nxt = []
            for (q_node, q_ts, q_w) in frontier:
                nbrs = self.neighbors_before(q_node, q_ts)
                n_ngh = len(nbrs)
                if n_ngh == 0:
                    continue
                norm = beta / (one - beta) * (one - beta ** f(n_ngh))
                w = q_w * (one - alpha) * beta / norm
                if alpha != 0 and dep == 0:
                    w = w * alpha
                for z in range(min(width, n_ngh)):
                    t, nb, e = nbrs[-(z + 1)]
                    key = (e, nb, t)
                    acc[key] = acc.get(key, f(0)) + w
                    nxt.append((nb, f(t), w))
                    w = w * beta
            if not nxt:
                break
            frontier = nxt

        nbr = np.zeros(k, np.int32)
        eidx = np.zeros(k, np.int32)
        dt = np.zeros(k, np.float32)
        wt = np.zeros(k, np.float32)
        # canonical tie-break matching the dense query: w desc, eidx asc, nbr asc
        items = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:k]
        for j, ((e, nb, t), val) in enumerate(items):
            nbr[j], eidx[j], dt[j], wt[j] = nb, e, f(t_q) - f(t), val
        dt[len(items):] = t_q
        return nbr, eidx, dt, wt
