#!/usr/bin/env python3
"""Independent audit for the g29 landmark-distance oracle.

For the canonical landmark set, computes per-landmark single-source
shortest paths on slice 1 in BOTH edge directions and reports the
maximum hop count of any hop-minimal optimal path — the bound H that
makes the DuckDB relaxation chain s0..sH (and its reverse twin) reach
the SSSP fixpoint. Also spot-checks the triangle-inequality estimator
against exact pair distances.

Usage: python3 tools/landmark_golden.py
"""
import csv
import heapq
from collections import defaultdict

SLICE = "/root/reference/Shenzhen_Edgelist_1.csv"
LANDMARKS = [str(i * 17 + 1) for i in range(40)]


def load():
    nodes = set()
    rows = []
    with open(SLICE, newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f):
            if not row["START_NODE"]:
                continue
            nodes.add(row["START_NODE"])
            rows.append(row)
    fwd = defaultdict(dict)
    for row in rows:
        s, d = row["START_NODE"], row["END_NODE"]
        if d not in nodes:
            continue
        c = float(row["LENGTH"])
        if d not in fwd[s] or c < fwd[s][d]:
            fwd[s][d] = c
    rev = defaultdict(dict)
    for s, ds in fwd.items():
        for d, c in ds.items():
            rev[d][s] = c
    return nodes, fwd, rev


def sssp_hops(adj, src):
    """dist + min hop count among optimal paths, per reached node."""
    dist = {src: 0.0}
    hops = {src: 0}
    pq = [(0.0, 0, src)]
    while pq:
        d, h, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        if d == dist[u] and h > hops[u]:
            continue
        for v, c in adj.get(u, {}).items():
            nd = d + c
            old = dist.get(v, float("inf"))
            if nd < old or (nd == old and h + 1 < hops.get(v, 1 << 30)):
                dist[v] = nd
                hops[v] = h + 1
                heapq.heappush(pq, (nd, h + 1, v))
    return dist, hops


def main():
    nodes, fwd, rev = load()
    lms = [l for l in LANDMARKS if l in nodes]
    print(f"nodes={len(nodes)} landmarks present={len(lms)}/{len(LANDMARKS)}")
    max_h = 0
    fdist, rdist = {}, {}
    for lm in lms:
        df, hf = sssp_hops(fwd, lm)
        dr, hr = sssp_hops(rev, lm)
        fdist[lm], rdist[lm] = df, dr
        max_h = max(max_h, max(hf.values()), max(hr.values()))
    print(f"max hop-minimal optimal-path hops (both directions): {max_h}")

    # estimator spot check: est(u,v) = min_L d(u,L)+d(L,v) >= d(u,v),
    # equality when some landmark lies on an optimal path
    srcs = [str(i * 31 + 2) for i in range(40) if str(i * 31 + 2) in nodes]
    dsts = [str(i * 43 + 3) for i in range(40) if str(i * 43 + 3) in nodes]
    print(f"query srcs present={len(srcs)} dsts present={len(dsts)}")
    n_pairs = n_exact = 0
    worst = 0.0
    for u in srcs[:10]:
        du, _ = sssp_hops(fwd, u)
        for v in dsts[:10]:
            if u == v:
                continue
            cands = [rdist[l].get(u, float("inf")) + fdist[l].get(v, float("inf"))
                     for l in lms]
            est = min(cands) if cands else float("inf")
            exact = du.get(v, float("inf"))
            if est == float("inf"):
                continue
            n_pairs += 1
            assert est >= exact - 1e-9, (u, v, est, exact)
            if exact > 0:
                worst = max(worst, est / exact)
            if abs(est - exact) < 1e-9:
                n_exact += 1
    print(f"sampled pairs={n_pairs} exact={n_exact} worst stretch={worst:.4f}")


if __name__ == "__main__":
    main()
