#!/usr/bin/env python3
"""Independent SCC audit for slice 1 (same role as graph_golden.py):
   - exact SCCs via iterative Tarjan over the ingest-equivalent edge set
   - simulation of the FW/BW min-label partition-refinement algorithm to
     size the oracle's outer rounds and inner hop bounds
"""
import csv, sys
from collections import defaultdict

path = "/root/reference/Shenzhen_Edgelist_1.csv"
rows = list(csv.DictReader(open(path)))
rows = [r for r in rows if r["START_NODE"] not in (None, "",)]
ids = set(r["START_NODE"] for r in rows)
# dedup exact rows, drop dangling END_NODE, collapse parallel edges
edges = set()
for r in rows:
    if r["END_NODE"] in ids:
        edges.add((r["START_NODE"], r["END_NODE"]))
nodes = sorted(ids)
print(f"nodes={len(nodes)} edges={len(edges)}")

adj = defaultdict(list); radj = defaultdict(list)
for s, d in edges:
    adj[s].append(d); radj[d].append(s)

# iterative Tarjan
index = {}; low = {}; onstk = {}; stk = []; sccs = []
counter = [0]
for root in nodes:
    if root in index: continue
    work = [(root, 0)]
    while work:
        v, pi = work[-1]
        if pi == 0:
            index[v] = low[v] = counter[0]; counter[0] += 1
            stk.append(v); onstk[v] = True
        recurse = False
        nbrs = adj[v]
        for i in range(pi, len(nbrs)):
            w = nbrs[i]
            if w not in index:
                work[-1] = (v, i + 1); work.append((w, 0)); recurse = True; break
            elif onstk.get(w):
                low[v] = min(low[v], index[w])
        if recurse: continue
        if not recurse:
            work.pop()
            if work:
                p = work[-1][0]
                low[p] = min(low[p], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stk.pop(); onstk[w] = False; comp.append(w)
                    if w == v: break
                sccs.append(comp)

lab = {}
for comp in sccs:
    m = min(comp)
    for v in comp: lab[v] = m
sizes = sorted((len(c) for c in sccs), reverse=True)
print(f"sccs={len(sccs)} top_sizes={sizes[:8]} singletons={sum(1 for s in sizes if s==1)}")

# ---- refinement simulation: outer rounds + inner hop bounds ----
color = {v: "" for v in nodes}
outer = 0
inner_max = 0
while True:
    outer += 1
    # F: min fwd-reachable id within color class, chained until fixpoint
    def propagate(adjm):
        global inner_max
        f = {v: v for v in nodes}
        hops = 0
        changed = True
        while changed:
            changed = False; hops += 1
            nf = dict(f)
            for (s, d) in edges:
                if color[s] == color[d]:
                    if f[d] < nf[s]:   # pull min from successor
                        nf[s] = f[d]
            for v in nodes:
                if nf[v] != f[v]: changed = True
            f = nf
        inner_max = max(inner_max, hops)
        return f
    F = propagate(adj)
    # B: min over predecessors
    def propagate_b():
        global inner_max
        b = {v: v for v in nodes}
        hops = 0
        changed = True
        while changed:
            changed = False; hops += 1
            nb = dict(b)
            for (s, d) in edges:
                if color[s] == color[d]:
                    if b[s] < nb[d]:
                        nb[d] = b[s]
            for v in nodes:
                if nb[v] != b[v]: changed = True
            b = nb
        inner_max = max(inner_max, hops)
        return b
    B = propagate_b()
    newc = {v: F[v] + "|" + B[v] for v in nodes}
    if all(F[v] == B[v] for v in nodes):
        # converged: F is the SCC label
        ok = all(F[v] == lab[v] for v in nodes)
        print(f"refinement converged: outer={outer} inner_max_hops={inner_max} matches_tarjan={ok}")
        break
    color = newc
    if outer > 20:
        print("NO CONVERGENCE in 20 rounds"); sys.exit(1)
