#!/usr/bin/env python3
"""Dev-only independent graph oracle (no Spark).

Computes, over the slice-1 edge list with the ingest dedup semantics
(distinct START_NODE ids; distinct (src,dst,roadId,cost) tuples with both
endpoints present; min cost per (src,dst)):

  1. Dijkstra 2022->2802: path node count, total cost, running costs.
  2. The Bellman-Ford hop bound H for source 2022: max over reachable v of
     the minimal hop count among minimum-cost paths (exact double math) —
     the number of chained relaxation steps the DuckDB oracle CTE needs.
  3. The same hop bound for the g7 200-source set (max over sources).
  4. A uniqueness audit of the 2022->2802 optimum: every node on the path
     must have exactly ONE in-edge satisfying dist(u) + cost == dist(v)
     in exact doubles — the premise that makes the oracle's backward-walk
     CTE emit one row per hop.
  5. Yen k=3 loopless shortest paths 2022->2802 (independent of the Scala
     kernel): per path node count, total cost, reduce-over-running-costs.
  6. With --duckdb-check: run the same chained-relaxation CTE the Graph
     oracles embed and bit-compare every distance against Dijkstra —
     reproduces the "bit-identical fixpoint" claim in queries/Graph.scala.

All arithmetic is IEEE double with the same left-fold order as the engine
kernels (dist(u) + cost), so the printed values are bit-comparable. r4()
rounds via Decimal(repr(x)) — the shortest decimal representation — which
is exactly what Spark's round()/BigDecimal.valueOf(double) rounds, so
frozen goldens agree with the engine's HALF_UP at the 4th decimal.
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


def incoming(out):
    inc = {}
    for u, vs in out.items():
        for v, c in vs:
            inc.setdefault(v, []).append((u, c))
    return inc


def hop_bound(out, dist):
    """max over v of minimal hops among exact-double-optimal paths."""
    order = sorted(dist, key=lambda v: dist[v])
    hops = {}
    inc = incoming(out)
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


def audit_path_uniqueness(out, dist, path):
    """Exactly one exact-double-optimal pred per non-source path node —
    the premise of the oracle's backward-walk CTE (one row per hop)."""
    inc = incoming(out)
    ambiguous = []
    for v in path[1:]:
        preds = [u for u, c in inc.get(v, ())
                 if u in dist and dist[u] + c == dist[v]]
        if len(preds) != 1:
            ambiguous.append((v, preds))
    return ambiguous


def r4(x):
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"),
                                           rounding=ROUND_HALF_UP))


def yen3(out, src, dst):
    """Yen k=3 with the same Lawler restriction as the engine kernels.
    Returns [(nodes, running_costs)] with engine-identical double folds."""
    d0, p0 = dijkstra(out, src)
    first = path_of(p0, src, dst)
    if first is None:
        return []
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
            sp = path_of(pp, spur, dst)
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
    return accepted


# Must match queries/Graph.scala Oracle.HopsSingle — main() asserts the
# measured hop bound fits under it, so drift fails loudly.
ORACLE_HOPS_SINGLE = 80


def duckdb_check(dist, hops=ORACLE_HOPS_SINGLE):
    """Re-run the Graph-oracle relaxation CTE (same step count as
    Oracle.HopsSingle) and bit-compare every distance — reproduces
    queries/Graph.scala's fixpoint claim."""
    import duckdb
    edges = f"""raw AS MATERIALIZED (
      SELECT * FROM read_csv('{PATH}', header=true,
        columns={{'XCoord':'DOUBLE','YCoord':'DOUBLE','START_NODE':'VARCHAR',
          'END_NODE':'VARCHAR','EDGE':'VARCHAR','LENGTH':'DOUBLE'}})
      WHERE START_NODE IS NOT NULL),
    ids AS MATERIALIZED (SELECT DISTINCT START_NODE FROM raw),
    edges AS MATERIALIZED (SELECT src, dst, min(cost) AS cost FROM (
      SELECT DISTINCT START_NODE AS src, END_NODE AS dst, EDGE, LENGTH AS cost
      FROM raw WHERE END_NODE IN (SELECT * FROM ids)) GROUP BY 1, 2)"""
    steps = [f"s0 AS MATERIALIZED (SELECT '{SRC}' AS node, "
             "CAST(0.0 AS DOUBLE) AS dist)"]
    for i in range(1, hops + 1):
        steps.append(f"""s{i} AS MATERIALIZED (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM s{i-1}
        UNION ALL
        SELECT e.dst AS node, s.dist + e.cost AS dist
        FROM s{i-1} s JOIN edges e ON s.node = e.src) GROUP BY 1)""")
    sql = f"WITH {edges},\n{','.join(steps)}\nSELECT node, dist FROM s{hops}"
    got = dict(duckdb.connect().execute(sql).fetchall())
    bad = [(k, got.get(k), dist[k]) for k in dist if got.get(k) != dist[k]]
    extra = set(got) - set(dist)
    print(f"duckdb-check: {len(dist)} nodes, bit-mismatches: {len(bad)}, "
          f"extra rows: {len(extra)}")
    if bad:
        print("  first mismatches:", bad[:5])
        sys.exit(1)


def main():
    ids, out = load()
    print("nodes", len(ids))
    dist, pred = dijkstra(out, SRC)
    p = path_of(pred, SRC, DST)
    print("g2 path nodes:", len(p), "total:", repr(dist[DST]),
          "r4:", r4(dist[DST]))
    print("g4 reachable:", len(dist))
    hb = hop_bound(out, dist)
    print("hop bound (2022):", hb)
    assert hb <= ORACLE_HOPS_SINGLE, (
        f"hop bound {hb} exceeds Oracle.HopsSingle={ORACLE_HOPS_SINGLE} — "
        "raise the constant in queries/Graph.scala AND here")

    amb = audit_path_uniqueness(out, dist, p)
    print("path pred-uniqueness: OK" if not amb
          else f"path pred-uniqueness: AMBIGUOUS at {amb}")

    hmax, missing = 0, 0
    for i in range(200):
        s = str(i * 17 + 1)
        if s not in ids:
            missing += 1
            continue
        d, _ = dijkstra(out, s)
        hmax = max(hmax, hop_bound(out, d))
    print("g7 sources present:", 200 - missing, "hop bound:", hmax)

    # WCC oracle bound (g10): the min-label relaxation chain needs
    # >= max over components of BFS-eccentricity(min-id member). Audited
    # here so Oracle.HopsWcc carries real provenance.
    und = {}
    for u, es in out.items():
        for v, _c in es:
            und.setdefault(u, set()).add(v)
            und.setdefault(v, set()).add(u)
    for n in ids:
        und.setdefault(n, set())
    seen, comps = set(), []
    for n in ids:
        if n in seen:
            continue
        comp, q = {n}, [n]
        seen.add(n)
        while q:
            u = q.pop()
            for v in und[u]:
                if v not in seen:
                    seen.add(v)
                    comp.add(v)
                    q.append(v)
        comps.append(comp)
    ecc_max = 0
    for comp in comps:
        src = min(comp)
        d = {src: 0}
        queue = [src]
        head = 0
        while head < len(queue):
            u = queue[head]
            head += 1
            for v in und[u]:
                if v not in d:
                    d[v] = d[u] + 1
                    queue.append(v)
        ecc_max = max(ecc_max, max(d.values()))
    print("wcc components:", len(comps),
          "max min-label eccentricity:", ecc_max)
    assert ecc_max <= 70, (
        f"WCC eccentricity {ecc_max} exceeds Oracle.HopsWcc=70 — "
        "raise the constant in queries/Graph.scala AND here")

    print("yen k=3:")
    for idx, (nodes, running) in enumerate(yen3(out, SRC, DST)):
        reduce_total = 0.0
        for x in running:
            reduce_total = reduce_total + x
        print(f"  path {idx}: n={len(nodes)} total={repr(running[-1])} "
              f"r4_total={r4(running[-1])} r4_reduce={r4(reduce_total)}")

    if "--duckdb-check" in sys.argv:
        duckdb_check(dist)


if __name__ == "__main__":
    main()
