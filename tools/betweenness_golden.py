#!/usr/bin/env python3
"""Independent betweenness audit for slice 1 (same role as graph_golden.py):

  - exact Brandes over the ingest-equivalent edge set, restricted to the
    canonical g7/g15 source set (i*17+1 for i in 0..199, present only)
  - sigma as exact integers; dependency sums in MICRO fixed point with
    floor division -- the SAME recurrence the Spark kernel and the DuckDB
    oracle implement, so all three agree bit for bit:
        delta(v) = sum_w_in_succ(v)  (sigma_v * (MICRO + delta(w))) // sigma_w
        bc(v)    = sum_over_sources delta_s(v)   [v != s]
  - reports the max shortest-path-DAG depth (in edges) across all
    sources, which sizes the oracle's chained-CTE hop bound
"""
import csv, heapq
from collections import defaultdict

MICRO = 1_000_000

path = "/root/reference/Shenzhen_Edgelist_1.csv"
rows = list(csv.DictReader(open(path)))
rows = [r for r in rows if r["START_NODE"] not in (None, "")]
ids = set(r["START_NODE"] for r in rows)
# ingest-equivalent projection: exact-dup rows collapse, dangling END_NODE
# dropped, parallel edges -> min cost (the edgesCte semantics)
best = {}
seen_rows = set()
for r in rows:
    if r["END_NODE"] in ids:
        key = (r["START_NODE"], r["END_NODE"], r["EDGE"], r["LENGTH"])
        if key in seen_rows:
            continue
        seen_rows.add(key)
        e = (r["START_NODE"], r["END_NODE"])
        c = float(r["LENGTH"])
        if e not in best or c < best[e]:
            best[e] = c
edges = [(s, d, c) for (s, d), c in best.items()]
assert all(c > 0 for _, _, c in edges), "zero-cost edge would break the DAG"
adj = defaultdict(list)
for s, d, c in edges:
    adj[s].append((d, c))

sources = [str(i * 17 + 1) for i in range(200) if str(i * 17 + 1) in ids]
print(f"nodes={len(ids)} edges={len(edges)} sources={len(sources)}")

bc = defaultdict(int)
max_depth = 0
for src in sources:
    dist = {src: 0.0}
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, c in adj[u]:
            nd = d + c
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    # shortest-path DAG by exact double equality (the walkCte identity)
    dag = defaultdict(list)   # u -> [v]
    rdag = defaultdict(list)  # v -> [u]
    for u, v, c in edges:
        if u in dist and v in dist and dist[u] + c == dist[v]:
            dag[u].append(v)
            rdag[v].append(u)
    order = sorted(dist, key=lambda v: dist[v])  # topological for the DAG
    # exact integer sigma, forward
    sigma = {v: 0 for v in dist}
    sigma[src] = 1
    depth = {v: 0 for v in dist}
    for v in order:
        for u in rdag[v]:
            sigma[v] += sigma[u]
            depth[v] = max(depth[v], depth[u] + 1)
    max_depth = max(max_depth, max(depth.values()))
    # micro fixed-point dependency, backward
    delta = {v: 0 for v in dist}
    for v in reversed(order):
        acc = 0
        for w in dag[v]:
            acc += (sigma[v] * (MICRO + delta[w])) // sigma[w]
        delta[v] = acc
    for v in dist:
        if v != src:
            bc[v] += delta[v]

print(f"max_dag_depth={max_depth}")
nonzero = sorted(bc.items(), key=lambda kv: (-kv[1], kv[0]))
print(f"nodes_with_bc={sum(1 for v in bc.values() if v > 0)}")
print("top10:", nonzero[:10])
import json, os
out = {n: bc.get(n, 0) for n in ids}
with open(os.path.join(os.path.dirname(__file__), "goldens",
                       "betweenness_slice1.json"), "w") as f:
    json.dump(out, f)
print("golden written")
