#!/usr/bin/env python3
"""Dev-only independent graph oracle (no Spark, no DuckDB recursion).

Computes, over the slice-1 edge list with the ingest dedup semantics
(distinct START_NODE ids; distinct (src,dst,roadId,cost) tuples with both
endpoints present; min cost per (src,dst)):

  1. Dijkstra 2022->2802: path node count, total cost, running costs.
  2. The Bellman-Ford hop bound H for source 2022: max over reachable v of
     the minimal hop count among minimum-cost paths (exact double math) —
     the number of chained relaxation steps the DuckDB oracle CTE needs.
  3. The same hop bound for the g7 200-source set (max over sources).
  4. Yen k=3 loopless shortest paths 2022->2802 (independent of the Scala
     kernel): per path node count, total cost, reduce-over-running-costs.

All arithmetic is IEEE double with the same left-fold order as the engine
kernels (dist(u) + cost), so the printed values are bit-comparable.
"""
import csv
import heapq
import sys
from decimal import Decimal, ROUND_HALF_UP

PATH = "/root/reference/Shenzhen_Edgelist_1.csv"
SRC, DST = "2022", "2802"


def load():
    rows = []
    with open(PATH, newline="") as f:
        for r in csv.DictReader(f):
            if not r["START_NODE"]:
                continue
            rows.append((r["START_NODE"], r["END_NODE"], r["EDGE"],
                         float(r["LENGTH"])))
    ids = {s for s, _, _, _ in rows}
    tuples = {(s, e, rid, c) for s, e, rid, c in rows
              if s in ids and e in ids}
    adj = {}
    for s, e, _, c in tuples:
        k = (s, e)
        if k not in adj or c < adj[k]:
            adj[k] = c
    out = {}
    for (s, e), c in adj.items():
        out.setdefault(s, []).append((e, c))
    return ids, out


def dijkstra(out, src, banned_nodes=frozenset(), banned_edges=frozenset()):
    dist, pred = {src: 0.0}, {}
    pq = [(0.0, src)]
    done = set()
    while pq:
        d, u = heapq.heappop(pq)
        if u in done or d > dist.get(u, float("inf")):
            continue
        done.add(u)
        for v, c in out.get(u, ()):
            if v in banned_nodes or (u, v) in banned_edges:
                continue
            nd = d + c
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                pred[v] = u
                heapq.heappush(pq, (nd, v))
    return dist, pred


def path_of(pred, src, dst):
    if dst not in pred and dst != src:
        return None
    p = [dst]
    while p[-1] != src:
        p.append(pred[p[-1]])
    return p[::-1]


def hop_bound(out, dist):
    """max over v of minimal hops among exact-double-optimal paths."""
    order = sorted(dist, key=lambda v: dist[v])
    hops = {}
    inc = {}
    for u, vs in out.items():
        for v, c in vs:
            inc.setdefault(v, []).append((u, c))
    for v in order:
        if dist[v] == 0.0:
            hops[v] = 0
            continue
        best = None
        for u, c in inc.get(v, ()):
            if u in dist and dist[u] + c == dist[v] and u in hops:
                h = hops[u] + 1
                if best is None or h < best:
                    best = h
        hops[v] = best if best is not None else 10 ** 9
    return max(hops.values())


def yen(out, src, dst, k):
    d0, p0 = dijkstra(out, src, dst)
    first = path_of(p0, src, dst)
    if first is None:
        return []
    accepted = [(first, d0)]
    cands = []
    seen = {tuple(first)}
    last_dev = 0
    while len(accepted) < k:
        prev, prev_dist = accepted[-1]
        for i in range(last_dev, len(prev) - 1):
            spur, root = prev[i], prev[: i + 1]
            root_cost = prev_dist[prev[i]]
            banned_e = {(spur, p[i + 1]) for p, _ in accepted
                        if len(p) > i + 1 and p[: i + 1] == root}
            banned_n = frozenset(root[:-1])
            dd, pp = dijkstra(out, spur, banned_n, frozenset(banned_e))
            sp = path_of(pp, spur, dst)
            if sp is not None:
                nodes = tuple(root[:-1] + sp)
                if nodes not in seen:
                    seen.add(nodes)
                    total = root_cost + dd[dst]
                    heapq.heappush(cands, (total, nodes, i, root_cost,
                                           tuple(dd[n] for n in sp)))
        if not cands:
            break
        total, nodes, dev, root_cost, spur_d = heapq.heappop(cands)
        prev_running = [accepted[-1][1][n] for n in nodes[:dev]]
        running = prev_running + [root_cost + x for x in spur_d]
        accepted.append((list(nodes), dict(zip(nodes, running))))
        last_dev = dev
        yield_path = (list(nodes), running)
        print("  yen accepted:", len(nodes), "nodes total", running[-1])
    return accepted


def r4(x):
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"),
                                           rounding=ROUND_HALF_UP))


def main():
    ids, out = load()
    print("nodes", len(ids))
    dist, pred = dijkstra(out, SRC)
    p = path_of(pred, SRC, DST)
    print("g2 path nodes:", len(p), "total:", repr(dist[DST]),
          "r4:", r4(dist[DST]))
    print("g4 reachable:", len(dist))
    print("hop bound (2022):", hop_bound(out, dist))

    hmax, missing = 0, 0
    for i in range(200):
        s = str(i * 17 + 1)
        if s not in ids:
            missing += 1
            continue
        d, _ = dijkstra(out, s)
        hmax = max(hmax, hop_bound(out, d))
    print("g7 sources present:", 200 - missing, "hop bound:", hmax)

    # Yen k=3 with the same Lawler restriction as the kernels
    print("yen k=3:")
    # re-run a clean yen that RETURNS running costs per accepted path
    d0, p0 = dijkstra(out, SRC)
    first = path_of(p0, SRC, DST)
    accepted = [(first, [d0[n] for n in first])]
    cands = []
    seen = {tuple(first)}
    last_dev = 0
    while len(accepted) < 3:
        prev, prev_run = accepted[-1]
        for i in range(last_dev, len(prev) - 1):
            spur, root = prev[i], prev[: i + 1]
            root_cost = prev_run[i]
            banned_e = {(spur, p[i + 1]) for p, _ in accepted
                        if len(p) > i + 1 and p[: i + 1] == root}
            banned_n = frozenset(root[:-1])
            dd, pp = dijkstra(out, spur, banned_n, frozenset(banned_e))
            sp = path_of(pp, spur, DST)
            if sp is not None:
                nodes = tuple(root[:-1] + sp)
                if nodes not in seen:
                    seen.add(nodes)
                    running = prev_run[:i] + [root_cost + dd[n] for n in sp]
                    heapq.heappush(cands,
                                   (running[-1], nodes, i, tuple(running)))
        if not cands:
            break
        total, nodes, dev, running = heapq.heappop(cands)
        accepted.append((list(nodes), list(running)))
        last_dev = dev
    for idx, (nodes, running) in enumerate(accepted):
        reduce_total = 0.0
        for x in running:
            reduce_total = reduce_total + x
        print(f"  path {idx}: n={len(nodes)} total={repr(running[-1])} "
              f"r4_total={r4(running[-1])} r4_reduce={r4(reduce_total)}")


if __name__ == "__main__":
    main()
