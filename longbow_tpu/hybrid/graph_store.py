"""GraphRAG edge store: typed weighted edges + traversal + re-ranking.

reference: GraphStore (graph_store.go:11), GraphNavigator BFS/A*
strategies (graph_navigator.go:25,149), spreading-activation
RankWithGraph (docs/vectorsearch.md:266-279).
"""
from __future__ import annotations

import heapq
import threading
from collections import defaultdict, deque
from typing import Optional


class GraphStore:
    def __init__(self):
        self._adj: dict = defaultdict(list)   # from -> [(to, type, weight)]
        self._radj: dict = defaultdict(list)  # reverse adjacency
        self._edge_count = 0
        self._lock = threading.Lock()

    def add_edge(self, src, dst, edge_type: str = "", weight: float = 1.0):
        with self._lock:
            self._adj[src].append((dst, edge_type, weight))
            self._radj[dst].append((src, edge_type, weight))
            self._edge_count += 1

    def neighbors(self, node) -> list:
        return list(self._adj.get(node, ()))

    def stats(self) -> dict:
        return {
            "nodes": len(set(self._adj) | set(self._radj)),
            "edges": self._edge_count,
        }

    # -- traversal (reference: graph_navigator.go strategies) --

    def bfs_path(self, src, dst, max_hops: int = 3) -> Optional[list]:
        """Shortest path by hop count; None if unreachable."""
        if src == dst:
            return [src]
        seen = {src}
        q = deque([(src, [src])])
        while q:
            node, path = q.popleft()
            if len(path) > max_hops:
                continue
            for to, _, _ in self._adj.get(node, ()):
                if to in seen:
                    continue
                if to == dst:
                    return path + [to]
                seen.add(to)
                q.append((to, path + [to]))
        return None

    def traverse(self, src, max_hops: int = 3) -> list:
        """BFS frontier expansion -> list of (node, hops)."""
        out = []
        seen = {src}
        q = deque([(src, 0)])
        while q:
            node, hops = q.popleft()
            if hops >= max_hops:
                continue
            for to, _, _ in self._adj.get(node, ()):
                if to not in seen:
                    seen.add(to)
                    out.append((to, hops + 1))
                    q.append((to, hops + 1))
        return out

    def weighted_path(self, src, dst, max_hops: int = 6) -> Optional[list]:
        """Dijkstra on 1/weight costs (the A* strategy's degenerate
        form without coordinates, navigator_strategy_astar.go:11)."""
        pq = [(0.0, src, [src])]
        best = {src: 0.0}
        while pq:
            cost, node, path = heapq.heappop(pq)
            if node == dst:
                return path
            if len(path) > max_hops:
                continue
            for to, _, w in self._adj.get(node, ()):
                c = cost + 1.0 / max(w, 1e-9)
                if c < best.get(to, float("inf")):
                    best[to] = c
                    heapq.heappush(pq, (c, to, path + [to]))
        return None

    # -- spreading activation re-rank --

    def rank_with_graph(
        self,
        results: list[tuple],
        graph_alpha: float,
        hops: int = 2,
        decay: float = 0.5,
    ) -> list[tuple]:
        """Blend similarity with graph activation spread from the
        result set (reference: RankWithGraph,
        docs/vectorsearch.md:266-279). results: [(id, similarity)]."""
        if not results or graph_alpha <= 0.0:
            return results
        sim = dict(results)
        lo, hi = min(sim.values()), max(sim.values())
        span = (hi - lo) or 1.0
        act: dict = defaultdict(float)
        frontier = {d: (s - lo) / span for d, s in sim.items()}
        for _ in range(hops):
            nxt: dict = defaultdict(float)
            for node, energy in frontier.items():
                for to, _, w in self._adj.get(node, ()):
                    nxt[to] += energy * decay * w
            for n, e in nxt.items():
                act[n] += e
            frontier = nxt
        fused = []
        for d, s in results:
            norm = (s - lo) / span
            fused.append((d, (1 - graph_alpha) * norm + graph_alpha * act.get(d, 0.0)))
        fused.sort(key=lambda kv: -kv[1])
        return fused

    def export_state(self) -> dict:
        return {
            "edges": [
                (f, t, ty, w)
                for f, lst in self._adj.items()
                for (t, ty, w) in lst
            ]
        }

    @classmethod
    def import_state(cls, st: dict) -> "GraphStore":
        g = cls()
        for f, t, ty, w in st.get("edges", []):
            g.add_edge(f, t, ty, w)
        return g
